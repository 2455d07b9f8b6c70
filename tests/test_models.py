"""Model-layer tests: the equivariance properties the RoReg paper proves
(Properties 1-3) verified numerically, plus Sinkhorn/matcher invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core.group import get_group
from roreg_tpu.models.et import EquivariantTransformer, align_by_index
from roreg_tpu.models.gf import GroupFeatNetwork, des_to_dr_index
from roreg_tpu.models.ops import group_correlation
from roreg_tpu.models.rd import RotationDetector
from roreg_tpu.models.rm import RotationCoherenceMatcher, extract_matches, sinkhorn_log


@pytest.fixture(scope="module")
def G():
    return get_group(60)


def _perm(G, a):
    """Input rotated by group element a => feature permutation pi_a(g)=C[a,g]."""
    return G.cayley[a]


def test_des_to_dr_index_recovers_rotation(G, rng):
    f = jnp.asarray(rng.normal(size=(8, 60, 32)).astype(np.float32))
    for a in [0, 5, 23, 59]:
        f_rot = f[:, _perm(G, a), :]
        idx = des_to_dr_index(f, f_rot, G.cayley)
        assert (np.asarray(idx) == a).all()


def test_group_correlation_peak_value(G, rng):
    f = jnp.asarray(rng.normal(size=(4, 60, 16)).astype(np.float32))
    a = 17
    cor = group_correlation(f, f[:, _perm(G, a), :], G.cayley)
    # peak equals the total feature energy
    energy = jnp.sum(f * f, axis=(1, 2))
    assert np.allclose(np.asarray(cor[:, a]), np.asarray(energy), rtol=1e-4)


def test_gf_equivariance(G, rng):
    net = GroupFeatNetwork(G)
    f = jnp.asarray(rng.normal(size=(6, 60, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), f, False)
    out = net.apply(params, f, False)
    for a in [3, 41]:
        p = _perm(G, a)
        out_rot = net.apply(params, f[:, p, :], False)
        # eqv permutes, inv is invariant
        assert np.allclose(
            np.asarray(out_rot["eqv"]), np.asarray(out["eqv"][:, p, :]), atol=1e-4
        )
        assert np.allclose(
            np.asarray(out_rot["inv"]), np.asarray(out["inv"]), atol=1e-4
        )


def test_gf_output_normalization(G, rng):
    net = GroupFeatNetwork(G)
    f = jnp.asarray(rng.normal(size=(4, 60, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(1), f, False)
    out = net.apply(params, f, False)
    assert np.allclose(np.linalg.norm(np.asarray(out["eqv"]), axis=-1), 1.0, atol=1e-3)
    assert np.allclose(np.linalg.norm(np.asarray(out["inv"]), axis=-1), 1.0, atol=1e-3)


def test_rd_invariance(G, rng):
    net = RotationDetector(G)
    f = jnp.asarray(rng.normal(size=(10, 60, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(2), f, False)
    s = net.apply(params, f, False)
    assert s.shape == (10,)
    for a in [9, 30]:
        s_rot = net.apply(params, f[:, _perm(G, a), :], False)
        assert np.allclose(np.asarray(s), np.asarray(s_rot), atol=1e-4)


def test_align_by_index(G, rng):
    f = jnp.asarray(rng.normal(size=(5, 60, 8)).astype(np.float32))
    idx = jnp.asarray([0, 3, 10, 30, 59])
    out = align_by_index(f, idx, G.cayley)
    for b in range(5):
        expect = np.asarray(f)[b][G.cayley[int(idx[b])]]
        assert np.allclose(np.asarray(out[b]), expect)


def test_et_forward(G, rng):
    net = EquivariantTransformer(G)
    B = 4
    feats = [
        jnp.asarray(rng.normal(size=(B, 60, 32)).astype(np.float32)) for _ in range(4)
    ]
    idx = jnp.asarray(rng.integers(0, 60, size=(B,)))
    vars_ = net.init(jax.random.PRNGKey(3), *feats, idx, False)
    q = net.apply(vars_, *feats, idx, False)
    assert q.shape == (B, 4)
    assert np.allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-4)


def test_sinkhorn_doubly_stochastic(rng):
    B, M, N = 2, 12, 10
    scores = jnp.asarray(rng.normal(size=(B, M, N)).astype(np.float32))
    mask_m = jnp.asarray(np.arange(M)[None, :] < np.array([[12], [8]])[:, 0:1])
    mask_n = jnp.asarray(np.arange(N)[None, :] < np.array([[10], [7]])[:, 0:1])
    Z = sinkhorn_log(scores, jnp.asarray(0.2), 200, mask_m, mask_n)
    P = np.exp(np.asarray(Z))
    for b in range(B):
        ms = int(np.asarray(mask_m[b]).sum())
        ns = int(np.asarray(mask_n[b]).sum())
        # row sums: valid rows -> 1; dustbin row -> ns
        rows = P[b].sum(axis=1)
        cols = P[b].sum(axis=0)
        assert np.allclose(rows[:ms], 1.0, atol=1e-3)
        assert np.allclose(rows[-1], ns, atol=1e-2)
        assert np.allclose(cols[:ns], 1.0, atol=1e-3)
        assert np.allclose(cols[-1], ms, atol=1e-2)
        # invalid rows/cols carry no mass
        if ms < M:
            assert P[b, ms:M].sum() < 1e-6
        if ns < N:
            assert P[b, :, ns:N].sum() < 1e-6


def test_extract_matches_mutual(rng):
    # identity-ish score matrix -> diagonal matches
    B, M, N = 1, 6, 6
    core = np.full((M, N), -5.0, np.float32)
    np.fill_diagonal(core, 5.0)
    scores_bin = np.full((B, M + 1, N + 1), -10.0, np.float32)
    scores_bin[0, :M, :N] = core
    m0, s0 = extract_matches(
        jnp.asarray(scores_bin), jnp.ones((B, M), bool), jnp.ones((B, N), bool)
    )
    assert np.array_equal(np.asarray(m0)[0], np.arange(M))


def test_rm_forward_and_mask_invariance(G, rng):
    B, M, N = 1, 24, 20
    net = RotationCoherenceMatcher(G, ks=(4, 4), sinkhorn_iters=20)
    f0 = rng.normal(size=(B, M, 60, 32)).astype(np.float32)
    f1 = rng.normal(size=(B, N, 60, 32)).astype(np.float32)
    k0 = rng.normal(size=(B, M, 3)).astype(np.float32)
    k1 = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    args = [jnp.asarray(x) for x in (f0, f1, k0, k1, mask0, mask1)]
    vars_ = net.init(jax.random.PRNGKey(4), *args)
    out = net.apply(vars_, *args)
    assert out["scores"].shape == (B, M + 1, N + 1)
    assert out["matches0"].shape == (B, M)
    assert np.isfinite(np.asarray(out["source_final"])).all()

    # padding invariance: append garbage pad rows, results on valid rows equal
    pad = 8
    f0p = np.concatenate([f0, rng.normal(size=(B, pad, 60, 32)).astype(np.float32)], 1)
    k0p = np.concatenate([k0, rng.normal(size=(B, pad, 3)).astype(np.float32)], 1)
    mask0p = np.concatenate([mask0, np.zeros((B, pad), bool)], 1)
    argsp = [jnp.asarray(x) for x in (f0p, f1, k0p, k1, mask0p, mask1)]
    outp = net.apply(vars_, *argsp)
    assert np.allclose(
        np.asarray(outp["matches0"])[:, :M], np.asarray(out["matches0"]), atol=0
    )
    assert np.allclose(
        np.asarray(outp["matching_scores0"])[:, :M],
        np.asarray(out["matching_scores0"]),
        atol=1e-3,
    )
    # pad rows never match
    assert (np.asarray(outp["matches0"])[:, M:] == -1).all()


def test_rm_blocked_knn_matches_unblocked(G, rng):
    """row_block kNN blocking (the long-context analog for keynum
    2500-5000) must be numerically identical to the single-GEMM path."""
    B, M, N = 1, 70, 50  # M deliberately NOT a multiple of the block
    f0 = rng.normal(size=(B, M, 60, 32)).astype(np.float32)
    f1 = rng.normal(size=(B, N, 60, 32)).astype(np.float32)
    k0 = rng.normal(size=(B, M, 3)).astype(np.float32)
    k1 = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    args = [jnp.asarray(x) for x in (f0, f1, k0, k1, mask0, mask1)]
    base = RotationCoherenceMatcher(G, ks=(4, 4), sinkhorn_iters=20)
    vars_ = base.init(jax.random.PRNGKey(7), *args)
    out = base.apply(vars_, *args)
    blocked = RotationCoherenceMatcher(
        G, ks=(4, 4), sinkhorn_iters=20, row_block=16
    )
    outb = blocked.apply(vars_, *args)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(outb["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(outb["scores"]),
        atol=1e-4, rtol=1e-4,
    )
    # aux_scores=False (eval mode) drops only the training-aux output
    lean = RotationCoherenceMatcher(
        G, ks=(4, 4), sinkhorn_iters=20, row_block=16, aux_scores=False
    )
    outl = lean.apply(vars_, *args)
    assert outl["scores_other"] is None
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(outl["matches0"])
    )


@pytest.mark.slow  # keynum-2500 RM forward (~minutes of CPU)
def test_rm_forward_at_keynum_2500(G, rng):
    """The protocol's larger keynum settings fit with blocking (VERDICT r2
    'next' #8): a full RM forward at 2500 keypoints on CPU."""
    B, M, N = 1, 2500, 2500
    f0 = rng.normal(size=(B, M, 60, 32)).astype(np.float32)
    f1 = rng.normal(size=(B, N, 60, 32)).astype(np.float32)
    k0 = rng.normal(size=(B, M, 3)).astype(np.float32)
    k1 = rng.normal(size=(B, N, 3)).astype(np.float32)
    mask0 = np.ones((B, M), bool)
    mask1 = np.ones((B, N), bool)
    args = [jnp.asarray(x) for x in (f0, f1, k0, k1, mask0, mask1)]
    net = RotationCoherenceMatcher(
        G, ks=(16, 8), sinkhorn_iters=25, row_block=512, aux_scores=False
    )
    small = [jnp.asarray(x[:, :32] if x.ndim > 2 else x[:, :32])
             for x in (f0, f1, k0, k1, mask0, mask1)]
    vars_ = net.init(jax.random.PRNGKey(8), *small)
    out = net.apply(vars_, *args)
    assert out["matches0"].shape == (B, M)
    assert np.isfinite(np.asarray(out["matching_scores0"])).all()


def test_rd_former_variant(G, rng):
    """Legacy RD_former sigmoid-MLP detector (RD_former/rot_detect.py:6-58):
    scores in (0,1), rotation-INVARIANT wrt a group rotation of the input
    is NOT expected (it scores the raw group signature); just shape+range
    + determinism."""
    from roreg_tpu.models.rd import RotationDetectorFormer

    net = RotationDetectorFormer(G)
    f = jnp.asarray(rng.normal(size=(10, 60, 32)).astype(np.float32))
    vars_ = net.init(jax.random.PRNGKey(9), f)
    s = np.asarray(net.apply(vars_, f))
    assert s.shape == (10,)
    assert ((s > 0) & (s < 1)).all()
    s2 = np.asarray(net.apply(vars_, f))
    np.testing.assert_array_equal(s, s2)
