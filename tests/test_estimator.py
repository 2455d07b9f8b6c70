"""RANSAC estimator tests: recovery of synthetic rigid transforms with
outliers — the property the reference only checks implicitly via benchmark
RR (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core import se3, so3
from roreg_tpu.core.group import get_group
from roreg_tpu.pipeline import estimator as est


@pytest.fixture(scope="module")
def G():
    return get_group(60)


def _synthetic_problem(key, n=200, outlier_frac=0.6, noise=0.005):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    R = so3.random_rotation(k1)
    t = jax.random.normal(k2, (3,))
    T_gt = se3.make_transform(R, t)
    keys1 = jax.random.uniform(k3, (n, 3)) * 3.0
    keys0 = se3.transform_points(keys1, T_gt)
    keys0 = keys0 + jax.random.normal(k4, (n, 3)) * noise
    n_out = int(n * outlier_frac)
    # corrupt the first n_out correspondences by permuting their keys0
    perm = jnp.roll(jnp.arange(n_out), 7)
    keys0 = keys0.at[:n_out].set(keys0[perm])
    inlier = jnp.arange(n) >= n_out
    return T_gt, keys0, keys1, inlier


def test_dr_index_synthetic(G, rng):
    f1 = jnp.asarray(rng.normal(size=(32, 60, 16)).astype(np.float32))
    for a in [0, 11, 47]:
        f0 = f1[:, G.cayley[a], :]  # cloud0 = R_a cloud1
        dr = est.dr_index(f0, f1, G.cayley)
        assert (np.asarray(dr) == a).all()


def test_local_transforms(G, rng):
    m = 16
    key = jax.random.PRNGKey(0)
    q = so3.quaternion_from_matrix(so3.random_rotation(key, (m,)))
    idx = jnp.asarray(rng.integers(0, 60, size=(m,)))
    keys1 = jnp.asarray(rng.normal(size=(m, 3)).astype(np.float32))
    R_res = so3.matrix_from_quaternion(q)
    R_full = jnp.einsum(
        "mij,mjk->mik", R_res, jnp.asarray(G.rotations, jnp.float32)[idx]
    )
    keys0 = jnp.einsum("mij,mj->mi", R_full, keys1) + 0.5
    T = est.local_transforms(q, idx, keys0, keys1, G.rotations)
    # each T maps its own key1 to key0 exactly
    moved = jnp.einsum("mij,mj->mi", T[:, :3, :3], keys1) + T[:, :3, 3]
    assert np.abs(np.asarray(moved - keys0)).max() < 1e-4


def test_score_hypotheses(rng):
    T_gt, keys0, keys1, inlier = _synthetic_problem(jax.random.PRNGKey(1))
    Ts = jnp.stack([T_gt, jnp.eye(4)])
    scores = jnp.ones((keys0.shape[0],))
    valid = jnp.ones((keys0.shape[0],), bool)
    ov = est.score_hypotheses(Ts, keys0, keys1, scores, valid, 0.05)
    assert ov[0] > 0.35  # ~40% inliers
    assert ov[0] > ov[1] * 3


def test_yohoo_ransac_recovers_transform():
    key = jax.random.PRNGKey(2)
    T_gt, keys0, keys1, inlier = _synthetic_problem(key)
    n = keys0.shape[0]
    # hypothesis per correspondence: inliers carry (noisy) gt, outliers junk
    T_hyp = jnp.tile(T_gt[None], (n, 1, 1))
    junk = se3.make_transform(
        so3.random_rotation(jax.random.PRNGKey(3), (n,)),
        jax.random.normal(jax.random.PRNGKey(4), (n, 3)) * 2,
    )
    T_hyp = jnp.where(inlier[:, None, None], T_hyp, junk)
    scores = jnp.ones((n,))
    valid = jnp.ones((n,), bool)
    T, ov = est.yohoo_ransac(
        jax.random.PRNGKey(5), T_hyp, valid, keys0, keys1, scores, valid,
        0.05, max_iter=100,
    )
    assert so3.relative_angle_deg(T[:3, :3], T_gt[:3, :3]) < 1.0
    assert jnp.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.05


def test_yohoc_ransac_recovers_transform(G):
    key = jax.random.PRNGKey(6)
    T_gt, keys0, keys1, inlier = _synthetic_problem(key, outlier_frac=0.5)
    n = keys0.shape[0]
    # inliers share the gt group index; outliers get random indices
    gt_idx = G.index_of(np.asarray(T_gt[:3, :3]))
    rnd = jax.random.randint(jax.random.PRNGKey(7), (n,), 0, 60)
    indices = jnp.where(inlier, gt_idx, rnd)
    scores = jnp.ones((n,))
    valid = jnp.ones((n,), bool)
    T, ov = est.yohoc_ransac(
        jax.random.PRNGKey(8), indices, keys0, keys1, scores, valid,
        0.05, max_iter=200,
    )
    assert so3.relative_angle_deg(T[:3, :3], T_gt[:3, :3]) < 1.5
    assert jnp.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.08


def test_yohoc_degenerate_all_distinct(G):
    """All indices distinct (<2 votes everywhere) — must not crash."""
    n = 60
    keys0 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 3)), jnp.float32)
    keys1 = keys0 + 0.01
    T, ov = est.yohoc_ransac(
        jax.random.PRNGKey(9), jnp.arange(60), keys0, keys1,
        jnp.ones((n,)), jnp.ones((n,), bool), 0.05, max_iter=50,
    )
    assert np.isfinite(np.asarray(T)).all()
    assert ov <= 0  # no valid hypothesis


def test_vote_probability(G):
    votes = jnp.zeros((60,), jnp.int32).at[3].set(50).at[7].set(3).at[9].set(1)
    p = est._vote_probability(votes)
    assert p[9] == 0  # < 2 votes
    assert p[3] > p[7] > 0
    assert abs(float(jnp.sum(p)) - 1.0) < 1e-5
    # reference quirk: exactly-2-vote buckets get zero weight because
    # n/100*(n/100-0.01)*(n/100-0.02) == 0 at n == 2 (estimator.py:125-127)
    votes2 = jnp.zeros((60,), jnp.int32).at[7].set(2).at[3].set(50)
    p2 = est._vote_probability(votes2)
    assert p2[7] == 0
