"""Block-dense engine: structural + numerical parity with the row-gather
engine (the differentiable reference implementation, itself oracle-tested
against NumPy in test_sparse.py). Covers VERDICT r1 'next' item #1: the
backbone fast path must produce verified outputs at real shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roreg_tpu.native.blockpyr import (
    alloc_block_buffers,
    build_block_pyramid_host,
    fill_block_pyramid_host,
)
from roreg_tpu.native.pyramid import build_pyramid_host
from roreg_tpu.sparse.block import (
    BLOCK,
    CELLS,
    BlockResUNet,
    unpack_cell_occupancy,
)
from roreg_tpu.sparse.resunet import ResUNet


def _cloud(n=800, seed=0, extent=1.2):
    rng = np.random.default_rng(seed)
    # bumpy surface (degenerate flat planes make weak tests)
    xy = rng.uniform(0, extent, size=(n, 2))
    z = 0.25 * np.sin(xy[:, 0] * 5) * np.cos(xy[:, 1] * 4) + 0.02 * rng.normal(
        size=n
    )
    return np.column_stack([xy, z]).astype(np.float32)


VS = 0.05
BCAPS = (256, 128, 64, 32)
GCAPS = (2048, 1024, 512, 256)


@pytest.mark.slow  # two full-net inits: ~40 s of CPU compile
def test_param_tree_matches_gather_resunet():
    pts = _cloud(200)
    bpyr = jax.tree_util.tree_map(
        jnp.asarray, build_block_pyramid_host(pts, VS, BCAPS)
    )
    gpyr = jax.tree_util.tree_map(jnp.asarray, build_pyramid_host(pts, VS, GCAPS))
    bvars = BlockResUNet().init(jax.random.PRNGKey(0), bpyr, False)
    gvars = ResUNet(in_channels=1).init(
        jax.random.PRNGKey(0), jnp.ones((GCAPS[0], 1)), gpyr, False
    )
    bs = jax.tree_util.tree_map(lambda x: x.shape, bvars)
    gs = jax.tree_util.tree_map(lambda x: x.shape, gvars)
    assert jax.tree_util.tree_structure(bs) == jax.tree_util.tree_structure(gs)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(lambda a, b: a == b, bs, gs))


def _match_rows(gpyr, bpyr):
    """Map each valid grid row -> flat block cell row via unit coords."""
    gc = np.asarray(gpyr.levels[0].coords)  # shifted unit coords
    gm = np.asarray(gpyr.levels[0].mask)
    l0c = np.asarray(bpyr.l0_coords).astype(np.int64)
    bkey = (l0c[:, 0] << 16) | (l0c[:, 1] << 8) | l0c[:, 2]
    rows = []
    for i in np.where(gm)[0]:
        u = gc[i]
        bq = (u[0] // BLOCK << 16) | (u[1] // BLOCK << 8) | (u[2] // BLOCK)
        hit = np.where(bkey == bq)[0]
        assert len(hit) >= 1
        cell = (u[0] % BLOCK) * 16 + (u[1] % BLOCK) * 4 + (u[2] % BLOCK)
        rows.append((i, int(hit[0]) * CELLS + int(cell)))
    return rows


def test_backbone_parity_with_gather_engine():
    pts = _cloud(800)
    gpyr = jax.tree_util.tree_map(jnp.asarray, build_pyramid_host(pts, VS, GCAPS))
    bpyr = jax.tree_util.tree_map(
        jnp.asarray, build_block_pyramid_host(pts, VS, BCAPS)
    )

    gnet = ResUNet(in_channels=1, compute_dtype=None)
    gvars = gnet.init(jax.random.PRNGKey(3), jnp.ones((GCAPS[0], 1)), gpyr, False)
    gfeats = np.asarray(
        gnet.apply(gvars, jnp.ones((GCAPS[0], 1)), gpyr, False)
    )

    bnet = BlockResUNet(compute_dtype=None)
    bfeats = np.asarray(bnet.apply(gvars, bpyr, False))

    rows = _match_rows(gpyr, bpyr)
    assert len(rows) > 300
    g = np.stack([gfeats[i] for i, _ in rows])
    b = np.stack([bfeats[j] for _, j in rows])
    np.testing.assert_allclose(g, b, atol=2e-4, rtol=1e-3)


def test_key_rows_match_device_knn():
    """Host-side keypoint->cell-row association == the device kNN over
    rep points (testset.py:168-171 semantics), modulo distance ties."""
    from roreg_tpu.native.blockpyr import alloc_block_buffers
    from roreg_tpu.native.blockpyr import fill_block_pyramid_host

    pts = _cloud(500, seed=5)
    keys = pts[::17][:24]
    gpyr = build_pyramid_host(pts, VS, GCAPS)
    buf = alloc_block_buffers(BCAPS)
    key_rows = np.full(len(keys), -2, np.int32)
    fill_block_pyramid_host(pts, VS, buf, keys=keys, key_rows=key_rows)
    assert (key_rows >= 0).all()

    # oracle: nearest grid rep point, mapped to the block flat row
    rows = dict(_match_rows(gpyr, buf))
    grep = np.asarray(gpyr.grid.rep_point)
    gmask = np.asarray(gpyr.levels[0].mask)
    occ = np.asarray(
        unpack_cell_occupancy(jnp.asarray(buf.levels[0].occ_words))
    ).reshape(-1)
    agree = 0
    for q, kr in zip(keys, key_rows):
        assert occ[kr], "key row must be an occupied cell"
        d = np.linalg.norm(grep - q, axis=-1) + np.where(gmask, 0, 1e9)
        expect = rows[int(d.argmin())]
        agree += int(expect == kr)
    assert agree >= len(keys) - 1  # ties may flip at most rarely


def test_occupancy_counts():
    pts = _cloud(700, seed=7)
    gpyr = build_pyramid_host(pts, VS, GCAPS)
    bpyr = build_block_pyramid_host(pts, VS, BCAPS)
    n_grid = int(np.asarray(gpyr.levels[0].mask).sum())
    occ = np.asarray(unpack_cell_occupancy(jnp.asarray(bpyr.levels[0].occ_words)))
    assert int(occ.sum()) == n_grid


def test_overflow_is_loud(capsys):
    pts = _cloud(2000, seed=1, extent=3.0)
    buf = alloc_block_buffers((8, 8, 8, 8))
    dropped = fill_block_pyramid_host(pts, VS, buf)
    assert dropped > 0
    err = capsys.readouterr().err
    # both builder paths (native C++ and numpy fallback) say "exceed ..."
    assert "exceed" in err


def test_native_extent_overflow_is_loud(capfd):
    """A cloud spanning more than 1024 level-0 voxels per axis must drop
    the out-of-extent units LOUDLY (pack_block is 8 bits/axis; silent key
    aliasing would corrupt the neighbor/occupancy tables)."""
    near = _cloud(300, seed=3)
    far = near + np.float32(80.0)  # 80 m at voxel 0.05 -> 1600 voxels away
    pts = np.concatenate([near, far])
    buf = alloc_block_buffers((512, 256, 128, 64))
    dropped = fill_block_pyramid_host(pts, VS, buf)
    assert dropped > 0
    err = capfd.readouterr().err
    assert "extent" in err


def test_key_rows_offsurface_ring_fallback():
    """Off-surface keypoint where the 5^3 ring's best candidate is farther
    than the 2-voxel out-of-ring lower bound: the builder must fall through
    to brute force and return the GLOBAL nearest rep point."""
    # cell (2,2,2) far corner: in-ring, ~4.3 voxels from the query
    p_ring = np.array([[0.149, 0.149, 0.149]], np.float32)
    # cell (3,0,0) near face: OUT of the 5^3 ring, ~2.5 voxels away
    p_out = np.array([[0.151, 0.025, 0.025]], np.float32)
    pts = np.concatenate([p_ring, p_out])
    q = np.array([[0.025, 0.025, 0.025]], np.float32)  # empty cell (0,0,0)
    buf = alloc_block_buffers(BCAPS)
    key_rows = np.full(1, -2, np.int32)
    fill_block_pyramid_host(pts, VS, buf, keys=q, key_rows=key_rows)
    occ = np.asarray(
        unpack_cell_occupancy(jnp.asarray(buf.levels[0].occ_words))
    ).reshape(-1)
    assert occ[key_rows[0]]
    # oracle: global argmin over the two points
    d = np.linalg.norm(pts - q, axis=-1)
    want = pts[d.argmin()]
    # resolve the chosen row back to a unit coordinate and check it's the
    # out-of-ring point's voxel
    l0c = np.asarray(buf.l0_coords).astype(np.int64)
    blk, cell = divmod(int(key_rows[0]), CELLS)
    u = l0c[blk] * BLOCK + np.array([cell // 16, (cell // 4) % 4, cell % 4])
    origin = np.asarray(buf.origin)
    got_vox = u + origin
    want_vox = np.floor(want / VS).astype(np.int64)
    assert (got_vox == want_vox).all()


@pytest.mark.slow  # two full-net compiles (~40 s)
def test_extractor_block_caps_fallback(capsys):
    """Right-sized block_caps that overflow on this cloud: the extractor
    must rebuild the chunk at block_caps_fallback and produce the same
    features as running the big caps directly (no dropped blocks)."""
    import dataclasses

    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.extractor import (
        extract_group_features_blocks,
        make_backbone,
    )

    pts = _cloud(600, seed=9)
    kps = pts[::29][:16]
    base = PipelineConfig(
        voxel_size=VS, group_size=12, capacities=GCAPS,
        block_caps=(32, 16, 8, 8),           # too small: forces overflow
        block_caps_fallback=BCAPS,           # roomy
        conv1_kernel_size=3, group_chunk=4, backbone_compute_dtype=None,
    )
    big = dataclasses.replace(
        base, block_caps=BCAPS, block_caps_fallback=None
    )
    import jax as _jax

    bpyr = jax.tree_util.tree_map(
        jnp.asarray, build_block_pyramid_host(pts, VS, BCAPS)
    )
    variables = BlockResUNet(
        conv1_kernel_size=3, compute_dtype=None
    ).init(_jax.random.PRNGKey(0), bpyr, False)

    out_fb = np.asarray(
        extract_group_features_blocks(variables, pts, kps, base)
    )
    err = capsys.readouterr().err
    assert "fallback" in err
    out_big = np.asarray(
        extract_group_features_blocks(variables, pts, kps, big)
    )
    np.testing.assert_allclose(out_fb, out_big, atol=1e-5, rtol=1e-4)


@pytest.mark.slow  # 12-rotation full extraction x2 engines (~50 s)
def test_extractor_parity_block_vs_hostmaps():
    """Full 12-rotation group-feature extraction: block engine ==
    host-map gather engine (testset.py semantics) on shared variables."""
    import dataclasses

    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.extractor import (
        extract_group_features_blocks,
        extract_group_features_hostmaps,
        make_backbone,
    )

    pts = _cloud(600, seed=2)
    kps = pts[::37][:12]
    cfg = PipelineConfig(
        voxel_size=VS,
        group_size=12,
        capacities=GCAPS,
        block_caps=BCAPS,
        conv1_kernel_size=5,
        group_chunk=4,
        backbone_compute_dtype=None,
        conv_window=None,
    )
    net = make_backbone(cfg)
    gpyr = jax.tree_util.tree_map(jnp.asarray, build_pyramid_host(pts, VS, GCAPS))
    gvars = net.init(jax.random.PRNGKey(0), jnp.ones((GCAPS[0], 1)), gpyr, False)

    a = np.asarray(extract_group_features_hostmaps(gvars, pts, kps, cfg))
    b = np.asarray(extract_group_features_blocks(gvars, pts, kps, cfg))
    assert a.shape == b.shape == (12, 12, 32)
    # rep-point quantization (1/256 voxel) can flip rare kNN ties; demand
    # near-total agreement and exactness where the lookup matched
    close = np.isclose(a, b, atol=5e-4).all(axis=-1)
    assert close.mean() > 0.97, close.mean()


def test_packed_payload_roundtrip():
    """alloc_block_buffers_packed views + device unpack_block_payload
    reproduce the exact tree (single-put transfer path)."""
    from roreg_tpu.native.blockpyr import alloc_block_buffers_packed
    from roreg_tpu.sparse.block import unpack_block_payload

    pts = _cloud(400, seed=9)
    payload, tree = alloc_block_buffers_packed(BCAPS, batch=2)
    from roreg_tpu.native.blockpyr import block_tree_slice

    fill_block_pyramid_host(pts, VS, block_tree_slice(tree, 0))
    fill_block_pyramid_host(pts[::2], VS, block_tree_slice(tree, 1))
    out = unpack_block_payload(jnp.asarray(payload), BCAPS, batch=2)
    for a, b in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(out)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_cloud():
    buf = alloc_block_buffers(BCAPS)
    dropped = fill_block_pyramid_host(np.zeros((0, 3), np.float32), VS, buf)
    assert dropped == 0
    assert not np.asarray(buf.levels[0].occ_words).any()


def test_native_block_builder_parity():
    """C++ build_block_pyramid == numpy builder, field by field (same
    sorted-key block order, same drop-largest overflow semantics)."""
    from roreg_tpu.native.blockpyr import fill_block_pyramid_numpy
    from roreg_tpu.native.lib import build_block_pyramid_native

    for seed, n, extent in ((0, 800, 1.2), (3, 2500, 2.0), (9, 60, 0.4)):
        pts = _cloud(n, seed=seed, extent=extent)
        keys = pts[:: max(n // 40, 1)]
        a = alloc_block_buffers(BCAPS)
        b = alloc_block_buffers(BCAPS)
        kr_a = np.empty(len(keys), np.int32)
        kr_b = np.empty(len(keys), np.int32)
        dn = build_block_pyramid_native(pts, VS, a, keys=keys, key_rows=kr_a)
        if dn is None:
            pytest.skip("native toolchain unavailable")
        dm = fill_block_pyramid_numpy(
            pts, VS, b, warn_overflow=False, keys=keys, key_rows=kr_b
        )
        assert dn == dm
        import jax

        for la, lb in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        ):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # ring search vs global brute force: distance ties may flip rows
        assert (kr_a == kr_b).mean() > 0.97


def test_native_block_builder_overflow_parity():
    from roreg_tpu.native.blockpyr import fill_block_pyramid_numpy
    from roreg_tpu.native.lib import build_block_pyramid_native

    pts = _cloud(3000, seed=1, extent=3.0)
    a = alloc_block_buffers((16, 8, 8, 8))
    b = alloc_block_buffers((16, 8, 8, 8))
    dn = build_block_pyramid_native(pts, VS, a)
    if dn is None:
        pytest.skip("native toolchain unavailable")
    dm = fill_block_pyramid_numpy(pts, VS, b, warn_overflow=False)
    assert dn == dm and dn > 0
    import jax

    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_extractor_rot_vmap_parity():
    """rot_vmap batching must be numerically identical to the sequential
    per-rotation map."""
    import dataclasses

    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.extractor import extract_group_features_blocks

    pts = _cloud(400, seed=11)
    kps = pts[::23][:8]
    base = PipelineConfig(
        voxel_size=VS, group_size=12, capacities=GCAPS, block_caps=BCAPS,
        conv1_kernel_size=3, group_chunk=4, backbone_compute_dtype=None,
    )
    bpyr = jax.tree_util.tree_map(
        jnp.asarray, build_block_pyramid_host(pts, VS, BCAPS)
    )
    variables = BlockResUNet(
        conv1_kernel_size=3, compute_dtype=None
    ).init(jax.random.PRNGKey(2), bpyr, False)
    out1 = np.asarray(extract_group_features_blocks(variables, pts, kps, base))
    out2 = np.asarray(extract_group_features_blocks(
        variables, pts, kps, dataclasses.replace(base, rot_vmap=2)
    ))
    np.testing.assert_allclose(out1, out2, atol=1e-5, rtol=1e-5)


def test_conv1_dense_gemm_matches_im2col_oracle():
    """The MXU-native dense-GEMM conv1 lowering must agree with the
    axis-factorized im2col oracle for every supported kernel size."""
    import roreg_tpu.sparse.block as B

    rng = np.random.default_rng(3)
    for ks in (3, 5, 7):
        bc = 48
        tbl = rng.integers(-1, bc, size=(bc, 27)).astype(np.int16)
        tbl[:, 13] = np.arange(bc)
        occ = (rng.random((bc, 64)) < 0.4).astype(np.float32)
        w = rng.normal(size=(ks**3, 1, 16)).astype(np.float32)
        mask = rng.random((bc, 64)) < 0.9
        dense = B.conv1_occupancy(
            jnp.asarray(occ), jnp.asarray(tbl), jnp.asarray(w),
            jnp.asarray(mask), kernel_size=ks,
        )
        oracle = B.conv1_occupancy_im2col(
            jnp.asarray(occ), jnp.asarray(tbl), jnp.asarray(w),
            jnp.asarray(mask), kernel_size=ks,
        )
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(oracle), atol=5e-5, rtol=1e-5
        )
