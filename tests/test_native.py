"""Native host library vs numpy oracles (and vs the device voxelizer)."""

import numpy as np
import pytest

from roreg_tpu.native.lib import (
    mutual_pairs_host,
    native_available,
    voxel_nn_host,
    voxelize_host,
)


def test_native_builds():
    assert native_available(), "g++ toolchain expected in this image"


def test_voxelize_host_matches_numpy(rng):
    pts = rng.uniform(-2, 2, size=(5000, 3)).astype(np.float32)
    to_voxel, rep, coords = voxelize_host(pts, 0.1)
    ref = np.unique(np.floor(pts / 0.1).astype(np.int32), axis=0)
    assert len(coords) == len(ref)
    assert set(map(tuple, coords)) == set(map(tuple, ref))
    # each point maps to its own voxel
    assert np.array_equal(coords[to_voxel], np.floor(pts / 0.1).astype(np.int32))
    # rep is first-appearance index of its voxel
    for v in range(0, len(rep), 97):
        members = np.where(to_voxel == v)[0]
        assert rep[v] == members.min()
    # first-appearance ordering: rep strictly increasing
    assert (np.diff(rep) > 0).all()


def test_voxel_nn_host(rng):
    pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
    to_voxel, rep, coords = voxelize_host(pts, 0.05)
    q = pts[rng.integers(0, 2000, 50)] + rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    idx = voxel_nn_host(pts, to_voxel, coords, 0.05, q, radius=0.05)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    brute = d.argmin(1)
    got = idx >= 0
    # wherever native found a neighbor, it is the true NN (within radius)
    bd = d[np.arange(50), brute]
    assert got.mean() > 0.9
    assert np.allclose(
        d[np.arange(50), np.where(got, idx, brute)][got], bd[got], atol=1e-6
    )


def test_mutual_pairs_host(rng):
    k1 = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    perm = rng.permutation(300)
    k0t = k1[perm] + rng.normal(size=(300, 3)).astype(np.float32) * 0.001
    pairs = mutual_pairs_host(k0t, k1, 0.01)
    assert len(pairs) > 280
    assert np.array_equal(pairs[:, 1], perm[pairs[:, 0]])


def test_mutual_pairs_threshold(rng):
    k0 = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    k1 = k0 + 10.0  # far away
    pairs = mutual_pairs_host(k0, k1, 0.2)
    assert len(pairs) == 0
