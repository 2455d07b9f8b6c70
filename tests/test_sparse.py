"""Golden-value tests for the sparse engine vs NumPy oracles
(the reference validates ME the same way: tests/python/{quantization,
coordinate_manager,kernel_map,convolution}.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.sparse.conv import gather_conv
from roreg_tpu.sparse.kernel_map import build_pyramid, hypercube_offsets
from roreg_tpu.sparse.voxelize import voxelize


def _np_voxel_set(points, voxel):
    return set(map(tuple, np.unique(np.floor(points / voxel).astype(int), axis=0)))


def test_voxelize_matches_numpy(rng):
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    mask = np.ones(2000, dtype=bool)
    vg = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.1, 4096)
    ref = _np_voxel_set(pts, 0.1)
    assert int(vg.num_voxels) == len(ref)
    got = set(
        map(tuple, (np.asarray(vg.coords) + np.asarray(vg.origin))[np.asarray(vg.mask)])
    )
    assert got == ref


def test_voxelize_to_voxel_and_rep(rng):
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, dtype=bool)
    vg = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.2, 256)
    tv = np.asarray(vg.to_voxel)
    coords = np.asarray(vg.coords) + np.asarray(vg.origin)
    # each point maps to the voxel containing it
    expect = np.floor(pts / 0.2).astype(int)
    assert np.array_equal(coords[tv], expect)
    # representative point lies in its voxel and is the lowest original index
    rep = np.asarray(vg.rep_point)[np.asarray(vg.mask)]
    rc = np.floor(rep / 0.2).astype(int)
    assert np.array_equal(rc, coords[np.asarray(vg.mask)])
    for v in range(int(vg.num_voxels)):
        members = np.where(tv == v)[0]
        assert np.allclose(rep[v], pts[members.min()])


def test_voxelize_masked_points(rng):
    pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    mask = np.arange(300) < 150
    vg = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.15, 256)
    ref = _np_voxel_set(pts[:150], 0.15)
    assert int(vg.num_voxels) == len(ref)
    assert (np.asarray(vg.to_voxel)[150:] == -1).all()


def test_voxelize_capacity_overflow(rng):
    pts = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    mask = np.ones(1000, dtype=bool)
    vg = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.05, 64)  # too small
    assert int(vg.num_voxels) == 64
    assert int(np.asarray(vg.mask).sum()) == 64
    tv = np.asarray(vg.to_voxel)
    assert (tv < 64).all()


def test_voxelize_counts_out_of_extent_drops(rng):
    # a cloud spanning > 1024 voxels/axis (25.6 m at 2.5 cm): the far
    # points fall outside the packed-key extent and must be COUNTED, not
    # silently clipped (VoxelGrid.num_dropped)
    near = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    far = near + np.float32(40.0)  # 40 m away at voxel 0.025 -> out of extent
    pts = np.concatenate([near, far])
    mask = np.ones(len(pts), dtype=bool)
    vg = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.025, 1024)
    assert int(vg.num_dropped) == 200
    assert (np.asarray(vg.to_voxel)[200:] == -1).all()
    # in-extent cloud: nothing dropped
    vg2 = voxelize(jnp.asarray(near), jnp.asarray(mask[:200]), 0.025, 1024)
    assert int(vg2.num_dropped) == 0


def _brute_pyramid(points, voxel):
    """dict-based oracle for coordinates and kernel maps."""
    c0 = np.unique(np.floor(points / voxel).astype(int), axis=0)
    c0 = c0 - c0.min(axis=0)
    levels = [set(map(tuple, c0))]
    for l in range(1, 4):
        s = 2**l
        levels.append({tuple((np.array(c) // s) * s) for c in levels[-1]})
    return levels


def test_pyramid_levels_match_oracle(rng):
    pts = rng.uniform(0, 2, size=(3000, 3)).astype(np.float32)
    mask = np.ones(3000, dtype=bool)
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, (8192, 4096, 2048, 1024)
    )
    oracle = _brute_pyramid(pts, 0.05)
    for l in range(4):
        lvl = pyr.levels[l]
        got = set(map(tuple, np.asarray(lvl.coords)[np.asarray(lvl.mask)]))
        assert got == oracle[l], f"level {l}"


def test_kernel_maps_match_oracle(rng):
    pts = rng.uniform(0, 1, size=(800, 3)).astype(np.float32)
    mask = np.ones(800, dtype=bool)
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.asarray(mask), 0.1, (1024, 512, 256, 128),
        conv1_kernel_size=3,
    )
    off = hypercube_offsets(3)
    for l, (maps, step) in enumerate(zip(pyr.same, [1, 2, 4, 8])):
        lvl = pyr.levels[l]
        coords = np.asarray(lvl.coords)
        keyset = {tuple(c): i for i, c in enumerate(coords[np.asarray(lvl.mask)])}
        nbr = np.asarray(maps)
        for i in range(int(lvl.num)):
            for k, d in enumerate(off):
                q = tuple(coords[i] + d * step)
                expect = keyset.get(q, -1)
                assert nbr[i, k] == expect
    # down map level0 -> level1
    lvl0, lvl1 = pyr.levels[0], pyr.levels[1]
    key0 = {tuple(c): i for i, c in enumerate(np.asarray(lvl0.coords)[np.asarray(lvl0.mask)])}
    nbr = np.asarray(pyr.down[0])
    c1 = np.asarray(lvl1.coords)
    for i in range(int(lvl1.num)):
        for k, d in enumerate(off):
            assert nbr[i, k] == key0.get(tuple(c1[i] + d), -1)


def test_gather_conv_matches_oracle(rng):
    n, m, K, cin, cout = 50, 40, 27, 8, 16
    feats = rng.normal(size=(n, cin)).astype(np.float32)
    nbr = rng.integers(-1, n, size=(m, K)).astype(np.int32)
    w = rng.normal(size=(K, cin, cout)).astype(np.float32) * 0.1
    out = gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w))
    ref = np.zeros((m, cout), dtype=np.float32)
    for i in range(m):
        for k in range(K):
            if nbr[i, k] >= 0:
                ref[i] += feats[nbr[i, k]] @ w[k]
    assert np.abs(np.asarray(out) - ref).max() < 1e-3


def test_gather_conv_chunk_invariance(rng):
    feats = rng.normal(size=(30, 4)).astype(np.float32)
    nbr = rng.integers(-1, 30, size=(20, 27)).astype(np.int32)
    w = rng.normal(size=(27, 4, 8)).astype(np.float32)
    outs = [
        np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w), k_chunk=c))
        for c in (1, 9, 27, 5)
    ]
    for o in outs[1:]:
        assert np.allclose(outs[0], o, atol=1e-4)


def test_pack_unpack_occupancy_roundtrip(rng):
    from roreg_tpu.sparse.conv import unpack_occupancy
    from roreg_tpu.sparse.kernel_map import pack_occupancy

    for k in (27, 343, 32, 1):
        occ = rng.integers(0, 2, size=(37, k)).astype(bool)
        words = pack_occupancy(jnp.asarray(occ))
        assert words.dtype == jnp.uint32
        back = np.asarray(unpack_occupancy(words, k))
        assert np.array_equal(back, occ.astype(np.float32))


def test_occupancy_conv_equals_gather_conv_on_ones(rng):
    """OccupancyConv == SparseConv on an all-ones 1-channel input."""
    import jax

    from roreg_tpu.sparse.conv import OccupancyConv, gather_conv
    from roreg_tpu.sparse.kernel_map import pack_occupancy

    n, m, K, cout = 60, 50, 343, 32
    nbr = rng.integers(-1, n, size=(m, K)).astype(np.int32)
    w = (rng.normal(size=(K, 1, cout)) * 0.1).astype(np.float32)
    feats = np.ones((n, 1), np.float32)
    mask = rng.integers(0, 2, size=(m,)).astype(bool)

    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w)))
    ref = np.where(mask[:, None], ref, 0.0)

    mod = OccupancyConv(cout, K)
    words = pack_occupancy(jnp.asarray(nbr >= 0))
    vars_ = mod.init(jax.random.PRNGKey(0), words, jnp.asarray(mask))
    vars_ = {"params": {"kernel": jnp.asarray(w)}}
    out = np.asarray(mod.apply(vars_, words, jnp.asarray(mask)))
    assert np.abs(out - ref).max() < 1e-4


def test_occupancy_conv_weight_grads(rng):
    """Training still works through the occupancy matmul (weight grads equal
    the gather formulation's)."""
    import jax

    from roreg_tpu.sparse.conv import gather_conv, unpack_occupancy
    from roreg_tpu.sparse.kernel_map import pack_occupancy

    n, m, K, cout = 40, 30, 27, 8
    nbr = rng.integers(-1, n, size=(m, K)).astype(np.int32)
    w = (rng.normal(size=(K, 1, cout)) * 0.1).astype(np.float32)
    feats = jnp.ones((n, 1), jnp.float32)
    words = pack_occupancy(jnp.asarray(nbr >= 0))

    def loss_gather(w):
        return jnp.sum(gather_conv(feats, jnp.asarray(nbr), w) ** 2)

    def loss_occ(w):
        occ = unpack_occupancy(words, K)
        y = occ @ w.reshape(K, cout)
        return jnp.sum(y**2)

    g0 = np.asarray(jax.grad(loss_gather)(jnp.asarray(w)))
    g1 = np.asarray(jax.grad(loss_occ)(jnp.asarray(w)))
    assert np.abs(g0 - g1).max() < 1e-3


def _local_random_table(rng, n, m, K, band):
    """Random gather table with the sorted-row locality the window kernel
    assumes: nbr[i, k] within +-band of a monotone base."""
    base = np.linspace(0, n - 1, m).astype(np.int64)
    nbr = base[:, None] + rng.integers(-band, band, size=(m, K))
    keep = (nbr >= 0) & (nbr < n) & (rng.random((m, K)) > 0.2)
    return np.where(keep, nbr, -1).astype(np.int32)


def test_window_conv_matches_gather(rng):
    from roreg_tpu.sparse.window_conv import max_tile_spread, window_gather_conv

    n, m, K, c, cout = 3000, 2560, 27, 32, 64
    feats = rng.normal(size=(n, c)).astype(np.float32)
    nbr = _local_random_table(rng, n, m, K, 300)
    w = (rng.normal(size=(K, c, cout)) * 0.1).astype(np.float32)
    assert max_tile_spread(nbr) + 128 <= 1024
    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w)))
    out = np.asarray(
        window_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w),
            window=1024, compute_dtype=None, interpret=True,
        )
    )
    assert np.abs(out - ref).max() < 1e-4


def test_window_conv_small_source(rng):
    """n < window: the slab slice must stay in bounds via feats padding."""
    from roreg_tpu.sparse.window_conv import window_gather_conv

    n, m, K, c, cout = 200, 256, 27, 8, 16
    feats = rng.normal(size=(n, c)).astype(np.float32)
    nbr = _local_random_table(rng, n, m, K, 50)
    w = (rng.normal(size=(K, c, cout)) * 0.1).astype(np.float32)
    ref = np.asarray(gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w)))
    out = np.asarray(
        window_gather_conv(
            jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w),
            window=1024, compute_dtype=None, interpret=True,
        )
    )
    assert np.abs(out - ref).max() < 1e-4


def test_window_conv_vmap(rng):
    """The extractor vmaps the kernel over the rotation chunk axis."""
    import jax

    from roreg_tpu.sparse.window_conv import window_gather_conv

    B, n, m, K, c, cout = 3, 800, 640, 27, 16, 16
    feats = rng.normal(size=(B, n, c)).astype(np.float32)
    nbr = np.stack([_local_random_table(rng, n, m, K, 100) for _ in range(B)])
    w = (rng.normal(size=(K, c, cout)) * 0.1).astype(np.float32)
    out = jax.vmap(
        lambda f, t: window_gather_conv(
            f, t, jnp.asarray(w), window=512, compute_dtype=None, interpret=True
        )
    )(jnp.asarray(feats), jnp.asarray(nbr))
    for b in range(B):
        ref = np.asarray(
            gather_conv(jnp.asarray(feats[b]), jnp.asarray(nbr[b]), jnp.asarray(w))
        )
        assert np.abs(np.asarray(out[b]) - ref).max() < 1e-4


def test_max_tile_spread(rng):
    from roreg_tpu.sparse.window_conv import max_tile_spread

    nbr = np.full((256, 4), -1, np.int32)
    assert max_tile_spread(nbr) == 0
    nbr[0, 0] = 10
    nbr[127, 3] = 500
    nbr[128, 0] = 7
    assert max_tile_spread(nbr) == 490


def test_resunet_forward(rng):
    import jax
    from roreg_tpu.sparse.resunet import ResUNet

    pts = rng.uniform(0, 2, size=(2000, 3)).astype(np.float32)
    mask = np.ones(2000, dtype=bool)
    caps = (4096, 1024, 512, 256)
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, caps, conv1_kernel_size=3
    )
    feats = jnp.ones((caps[0], 1), dtype=jnp.float32)
    net = ResUNet(conv1_kernel_size=3)
    vars_ = net.init(jax.random.PRNGKey(0), feats, pyr, False)
    out = net.apply(vars_, feats, pyr, False)
    assert out.shape == (caps[0], 32)
    valid = np.asarray(pyr.levels[0].mask)
    o = np.asarray(out)
    assert np.isfinite(o[valid]).all()
    # normalized rows
    assert np.allclose(np.linalg.norm(o[valid], axis=1), 1.0, atol=1e-4)
    # pad rows zero
    assert np.abs(o[~valid]).max() == 0.0


def test_resunet_train_mode_updates_stats(rng):
    import jax
    from roreg_tpu.sparse.resunet import ResUNet

    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, dtype=bool)
    caps = (1024, 512, 256, 128)
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.asarray(mask), 0.05, caps, conv1_kernel_size=3
    )
    feats = jnp.ones((caps[0], 1), dtype=jnp.float32)
    net = ResUNet(conv1_kernel_size=3)
    vars_ = net.init(jax.random.PRNGKey(0), feats, pyr, True)
    out, updates = net.apply(
        vars_, feats, pyr, True, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(out)).all()
    # stats moved off their init values
    m = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(x)).max() > 0 for x in m)


def test_conv_up_parity_classes_match_naive(rng):
    """The 8-parity-class conv_up == the naive 27-tap masked im2col
    (kept as _UP_RIDX/_UP_VALID oracle)."""
    import jax.numpy as jnp

    from roreg_tpu.sparse import block as B

    bc, bf, ci, co = 12, 40, 8, 16
    feats = jnp.asarray(rng.normal(size=(bc, 64, ci)).astype(np.float32))
    utbl = jnp.asarray(
        rng.integers(-1, bc * 64, size=(bf, 27)).astype(np.int32)
    )
    mask = jnp.asarray(rng.random((bf, 64)) < 0.6)
    w = jnp.asarray(rng.normal(size=(27, ci, co)).astype(np.float32))

    got = np.asarray(B.conv_up(feats, utbl, w, mask))

    # naive oracle
    fc = np.asarray(feats).reshape(-1, ci)
    reg = fc[np.clip(np.asarray(utbl), 0, None)]
    reg = np.where(np.asarray(utbl)[..., None] >= 0, reg, 0.0)
    im = reg[:, B._UP_RIDX]
    im = np.where(B._UP_VALID[None, :, None], im, 0.0)
    im = im.reshape(bf * 64, 27 * ci)
    want = (im @ np.asarray(w).reshape(27 * ci, co)).reshape(bf, 64, co)
    want = np.where(np.asarray(mask)[..., None], want, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_hypercross_offsets_shape_and_content():
    """region_type=1 (src/kernel_region.hpp): origin + axis-aligned arms."""
    from roreg_tpu.sparse.kernel_map import hypercross_offsets, kernel_offsets

    off = hypercross_offsets(3)
    assert off.shape == (7, 3)
    assert (off == 0).all(axis=1).sum() == 1  # one origin
    # every non-origin offset lies on exactly one axis
    nz = (off != 0).sum(axis=1)
    assert set(nz.tolist()) == {0, 1}
    off5 = hypercross_offsets(5)
    assert off5.shape == (13, 3)
    assert np.abs(off5).max() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hypercross_offsets(4)
    # dispatch + custom regions
    assert kernel_offsets(3, "hypercube").shape == (27, 3)
    assert kernel_offsets(3, "hypercross").shape == (7, 3)
    custom = np.array([[0, 0, 0], [2, 0, 1]], np.int32)
    np.testing.assert_array_equal(
        kernel_offsets(3, "custom", custom), custom
    )
    with _pytest.raises(ValueError):
        kernel_offsets(3, "custom")
    with _pytest.raises(ValueError):
        kernel_offsets(3, "nope")


def test_hypercross_conv_matches_dense_oracle(rng):
    """A hypercross-region sparse conv == dense conv with a cross-masked
    kernel, on a dense-filled grid (the same oracle recipe as the
    hypercube kernel-map test)."""
    from roreg_tpu.sparse.kernel_map import (
        hypercross_offsets,
        neighbor_table,
    )

    # dense 5x5x5 voxel block => every cross neighbor inside the interior
    # exists; misses only at the boundary
    coords = hypercube_offsets(5) + 2  # coords in [0, 4]^3
    pts = (coords.astype(np.float32) + 0.5) * 0.1
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.asarray(np.ones(len(pts), bool)), 0.1,
        (256, 128, 64, 32), conv1_kernel_size=3,
    )
    lvl = pyr.levels[0]
    off = hypercross_offsets(3)
    nbr = np.asarray(neighbor_table(lvl, off, 1))

    cin, cout = 4, 6
    feats = rng.normal(size=(256, cin)).astype(np.float32)
    w = rng.normal(size=(len(off), cin, cout)).astype(np.float32) * 0.1
    out = np.asarray(
        gather_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w))
    )

    # oracle: walk the cross taps in coordinate space
    cmap = {tuple(c): i for i, c in enumerate(np.asarray(lvl.coords)
                                              [np.asarray(lvl.mask)])}
    n_valid = int(lvl.num)
    assert n_valid == 125
    lc = np.asarray(lvl.coords)
    for i in range(n_valid):
        ref = np.zeros(cout, np.float32)
        for k, d in enumerate(off):
            j = cmap.get(tuple(lc[i] + d), -1)
            assert nbr[i, k] == j  # table parity with the coord-space walk
            if j >= 0:
                ref += feats[j] @ w[k]
        assert np.abs(out[i] - ref).max() < 1e-3
