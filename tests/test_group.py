"""Property tests for the generated icosahedral group tables.

The reference ships these as opaque .npy blobs; we prove the same algebraic
properties the RoReg paper relies on (closure, Cayley consistency,
group-consistent neighborhoods => equivariant group conv gather).
"""

import numpy as np
import pytest

from roreg_tpu.core.group import get_group


@pytest.fixture(scope="module")
def G():
    return get_group(60)


def test_order_and_identity(G):
    assert G.rotations.shape == (60, 3, 3)
    assert np.abs(G.rotations[0] - np.eye(3)).max() < 1e-9


def test_valid_rotations(G):
    R = G.rotations
    eye = np.einsum("gij,gkj->gik", R, R)
    assert np.abs(eye - np.eye(3)).max() < 1e-9
    assert np.abs(np.linalg.det(R) - 1).max() < 1e-9


def test_closure_and_cayley_convention(G):
    R, C = G.rotations, G.cayley
    # cayley[i, j] = idx(R[j] @ R[i])  (the reference 60_60.npy convention)
    for i in range(0, 60, 7):
        for j in range(0, 60, 11):
            prod = R[j] @ R[i]
            assert np.abs(R[C[i, j]] - prod).max() < 1e-9


def test_cayley_latin_square(G):
    C = G.cayley
    for i in range(60):
        assert len(set(C[i].tolist())) == 60
        assert len(set(C[:, i].tolist())) == 60


def test_inverse(G):
    R, inv = G.rotations, G.inverse
    for g in range(60):
        assert np.abs(R[inv[g]] - R[g].T).max() < 1e-9


def test_angle_spectrum(G):
    tr = np.trace(G.rotations, axis1=1, axis2=2)
    ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
    vals, counts = np.unique(np.round(ang), return_counts=True)
    # icosahedral group conjugacy-class angles (matches the shipped table)
    assert vals.tolist() == [0.0, 72.0, 120.0, 144.0, 180.0]
    assert counts.tolist() == [1, 12, 20, 12, 15]


def test_nei13_structure(G):
    N = G.nei13
    assert N.shape == (60, 13)
    # self first
    assert np.array_equal(N[:, 0], np.arange(60))
    # group-consistency: N[g, k] = cayley[g, N[0, k]]
    assert np.array_equal(N, G.cayley[:, N[0]])
    # neighbors of g are at 72 degrees from g
    R = G.rotations
    for g in range(0, 60, 13):
        rel = np.einsum("ij,kjl->kil", R[g].T, R[N[g, 1:]])
        tr = np.trace(rel, axis1=1, axis2=2)
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        assert np.abs(ang - 72.0).max() < 1e-6


def test_group_conv_equivariance_gather(G):
    """The core equivariance: rotating the input by group element a permutes
    features by pi_a(g) = cayley[a, g]; the nei13 gather must commute with it.

    out[g] = sum_k w_k f[N[g, k]]; f'(g) = f(pi_a(g)) => out'(g) = out(pi_a(g)).
    """
    rng = np.random.default_rng(0)
    f = rng.normal(size=(60,))
    w = rng.normal(size=(13,))
    C, N = G.cayley, G.nei13

    def conv(feat):
        return (feat[N] * w[None, :]).sum(axis=1)

    for a in [1, 7, 33, 59]:
        pi = C[a]  # pi_a(g) = idx(R_g R_a) = C[a, g]
        f_rot = f[pi]
        lhs = conv(f_rot)
        rhs = conv(f)[pi]
        assert np.abs(lhs - rhs).max() < 1e-12


def test_matches_reference_tables_if_present():
    """Optional cross-check against the reference blobs (not required to pass
    ordering-wise — our canonical order differs — but the *sets* must match)."""
    import os

    ref_dir = "/root/reference/utils/group_related"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tables not available")
    ref_R = np.load(f"{ref_dir}/Rotation.npy")
    G = get_group(60)
    # Every reference rotation is one of ours, to the reference's own
    # precision (their tables are numerically generated and only accurate
    # to ~6e-5; ours are exact to float64 roundoff).
    d = ((ref_R[:, None] - G.rotations[None]) ** 2).sum(axis=(2, 3))
    assert d.min(axis=1).max() < 1e-6
    # bijection
    assert len(set(d.argmin(axis=1).tolist())) == 60
    # and the Cayley tables agree through that bijection
    ref_C = np.load(f"{ref_dir}/60_60.npy").astype(int)
    to_ours = d.argmin(axis=1)
    for i in range(0, 60, 7):
        for j in range(0, 60, 5):
            assert to_ours[ref_C[i, j]] == G.cayley[to_ours[i], to_ours[j]]


def test_smaller_groups():
    for size, ks in [(24, 7), (12, 9)]:
        g = get_group(size)
        assert g.rotations.shape[0] == size
        assert g.nei13.shape == (size, ks)
        assert np.array_equal(g.nei13, g.cayley[:, g.nei13[0]])
