"""Host (C++) pyramid vs device pyramid: same voxel sets, same map
semantics, interchangeable in the backbone forward."""

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.native.pyramid import build_pyramid_host
from roreg_tpu.sparse.kernel_map import build_pyramid, hypercube_offsets
from roreg_tpu.sparse.resunet import ResUNet


def _coord_set(level, origin=None):
    c = np.asarray(level.coords)[np.asarray(level.mask)]
    return set(map(tuple, c))


def test_host_pyramid_matches_device(rng):
    pts = rng.uniform(0, 2, size=(3000, 3)).astype(np.float32)
    # random-uniform clouds barely shrink across levels; give every level
    # full headroom so no backend hits its (differing) overflow policy
    caps = (4096, 4096, 4096, 4096)
    dev = build_pyramid(
        jnp.asarray(pts), jnp.ones(3000, bool), 0.05, caps, conv1_kernel_size=3
    )
    host = build_pyramid_host(pts, 0.05, caps, conv1_kernel_size=3)
    for l in range(4):
        assert int(host.levels[l].num) == int(dev.levels[l].num), f"level {l}"
        assert _coord_set(host.levels[l]) == _coord_set(dev.levels[l])
    # map semantics: same neighbor *coordinates* regardless of row order
    off = hypercube_offsets(3)
    hc = np.asarray(host.levels[0].coords)
    hn = np.asarray(host.same[0])
    n0 = int(host.levels[0].num)
    lut = {tuple(c): i for i, c in enumerate(hc[:n0])}
    for i in range(0, n0, 57):
        for k, d in enumerate(off):
            expect = lut.get(tuple(hc[i] + d), -1)
            assert hn[i, k] == expect


def test_native_occupancy_matches_table(rng):
    """C++ neighbor_occupancy packs exactly the bits of neighbor_table >= 0."""
    from roreg_tpu.native.lib import neighbor_occupancy_host, neighbor_table_host

    coords = np.unique(rng.integers(0, 12, size=(400, 3)).astype(np.int32), axis=0)
    for ks in (3, 7):
        off = hypercube_offsets(ks)
        tbl = neighbor_table_host(coords, coords, off, 1)
        words = neighbor_occupancy_host(coords, coords, off, 1)
        k = len(off)
        got = (
            (words[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1
        ).reshape(len(coords), -1)[:, :k]
        assert np.array_equal(got.astype(bool), tbl >= 0)


def test_host_conv1_occ_matches_device(rng):
    pts = rng.uniform(0, 2, size=(2000, 3)).astype(np.float32)
    caps = (2048, 2048, 2048, 2048)
    dev = build_pyramid(
        jnp.asarray(pts), jnp.ones(2000, bool), 0.05, caps, conv1_kernel_size=3
    )
    host = build_pyramid_host(pts, 0.05, caps, conv1_kernel_size=3)
    n0 = int(host.levels[0].num)
    dev_coords = np.asarray(dev.levels[0].coords)
    lut = {tuple(c): i for i, c in enumerate(dev_coords[: int(dev.levels[0].num)])}
    hc = np.asarray(host.levels[0].coords)
    perm = np.array([lut[tuple(c)] for c in hc[:n0]])
    assert np.array_equal(
        np.asarray(host.conv1_occ)[:n0], np.asarray(dev.conv1_occ)[perm]
    )


def test_host_pyramid_rep_points(rng):
    pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
    host = build_pyramid_host(pts, 0.1, (1024, 512, 256, 128), 3)
    n0 = int(host.grid.num_voxels)
    rep = np.asarray(host.grid.rep_point)[:n0]
    rc = np.floor(rep / 0.1).astype(np.int32) - np.asarray(host.grid.origin)
    assert np.array_equal(rc, np.asarray(host.grid.coords)[:n0])


def test_backbone_same_output_on_host_maps(rng):
    """The jitted ResUNet produces identical features (up to row permutation)
    on host-built and device-built pyramids."""
    pts = rng.uniform(0, 2, size=(2000, 3)).astype(np.float32)
    caps = (2048, 2048, 2048, 2048)  # headroom: avoid overflow-policy diffs
    dev = build_pyramid(
        jnp.asarray(pts), jnp.ones(2000, bool), 0.05, caps, conv1_kernel_size=3
    )
    host = build_pyramid_host(pts, 0.05, caps, conv1_kernel_size=3)
    host_j = jax.tree_util.tree_map(jnp.asarray, host)
    net = ResUNet(conv1_kernel_size=3)
    feats = jnp.ones((caps[0], 1), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), feats, dev, False)
    out_dev = np.asarray(net.apply(v, feats, dev, False))
    out_host = np.asarray(net.apply(v, feats, host_j, False))
    # map host rows -> dev rows via coordinates
    n0 = int(host.levels[0].num)
    dev_coords = np.asarray(dev.levels[0].coords)
    lut = {tuple(c): i for i, c in enumerate(dev_coords[: int(dev.levels[0].num)])}
    hc = np.asarray(host.levels[0].coords)
    perm = np.array([lut[tuple(c)] for c in hc[:n0]])
    assert np.allclose(out_host[:n0], out_dev[perm], atol=2e-4)
