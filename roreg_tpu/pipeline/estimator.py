"""On-device vectorized RANSAC estimators (yohoo one-shot + yohoc voting).

Replaces the reference's CPU hot loops — the per-hypothesis python RANSAC
(test/estimator.py:390-443 ``yohoo_ransac``, :113-264 ``yohoc_ransac`` with
one forked process per scan pair) — with fixed-iteration batched hypothesis
scoring: every hypothesis transforms every matched keypoint in one
(H, M, 3) einsum, the weighted-inlier overlap is a masked reduction, and
the winner feeds two weighted-SVD refinement passes. TPU-ideal: top-1 over
a static hypothesis axis, no data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roreg_tpu.core import se3
from roreg_tpu.core.so3 import matrix_from_quaternion
from roreg_tpu.models.ops import group_correlation

__all__ = [
    "dr_index",
    "local_transforms",
    "score_hypotheses",
    "yohoo_ransac",
    "yohoc_ransac",
]

_NEG = -1e9


def dr_index(eqv0: jnp.ndarray, eqv1: jnp.ndarray, cayley: jnp.ndarray) -> jnp.ndarray:
    """Coarse group index per match (extractor_dr_index.Batch_Des2R_torch,
    test/estimator.py:85-89). Note the reference's operand order: the
    *permuted* operand is the id1 (before-rot) feature; the predicted index a
    satisfies cloud0 ~ R_a · cloud1, matching gt pts0 = R gt pts1 + t.

    eqv0/eqv1: (M, G, C) descriptor eqv features of matched keypoints
    (eqv0 from cloud id0, eqv1 from cloud id1).
    """
    cor = group_correlation(eqv1, eqv0, cayley)
    return jnp.argmax(cor, axis=-1)


def local_transforms(
    quaternions: jnp.ndarray,
    idx: jnp.ndarray,
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    rotations: jnp.ndarray,
) -> jnp.ndarray:
    """Per-correspondence rigid hypothesis (extractor_localtrans.Rt_pre,
    test/estimator.py:345-365): R = R_residual @ R_anchor, t = k0 - R k1."""
    R_res = matrix_from_quaternion(quaternions)  # (M, 3, 3)
    R_anchor = jnp.asarray(rotations, R_res.dtype)[idx]
    R = jnp.einsum("mij,mjk->mik", R_res, R_anchor)
    t = keys0 - jnp.einsum("mij,mj->mi", R, keys1)
    return se3.make_transform(R, t)


def score_hypotheses(
    T: jnp.ndarray,
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    inlier_dist: float,
) -> jnp.ndarray:
    """Weighted-inlier overlap of each hypothesis (overlap_cal,
    test/estimator.py:377-382): sum of matcher scores of inliers / #matches.

    T (H, 4, 4); keys (M, 3); returns (H,).
    """
    moved = jnp.einsum("hij,mj->hmi", T[:, :3, :3], keys1) + T[:, None, :3, 3]
    d2 = jnp.sum((keys0[None] - moved) ** 2, axis=-1)  # (H, M)
    inl = (d2 < inlier_dist * inlier_dist) & valid[None]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(inl, scores[None], 0.0), axis=-1) / denom


@functools.partial(jax.jit, static_argnames=("max_iter",))
def yohoo_ransac(
    key: jax.Array,
    T_hyp: jnp.ndarray,
    hyp_valid: jnp.ndarray,
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    inlier_dist: float,
    max_iter: int = 1000,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot estimation: every correspondence's own transform is a
    hypothesis; scan a random subset of <= max_iter, keep the best, refine
    twice (yohoo_ransac.ransac, test/estimator.py:390-443).

    Returns (T_best (4,4), best_overlap ()).
    """
    H = T_hyp.shape[0]
    perm = jax.random.permutation(key, H)
    take = perm[: min(max_iter, H)]
    Ts = T_hyp[take]
    tv = hyp_valid[take]
    ov = score_hypotheses(Ts, keys0, keys1, scores, valid, inlier_dist)
    ov = jnp.where(tv, ov, -1.0)
    best = jnp.argmax(ov)
    T_best = Ts[best]
    T_best = se3.refine_transform(
        keys0, keys1, T_best, scores, inlier_dist * 2.0, valid
    )
    T_best = se3.refine_transform(keys0, keys1, T_best, scores, inlier_dist, valid)
    return T_best, ov[best]


def _vote_probability(votes: jnp.ndarray) -> jnp.ndarray:
    """Cubic vote weighting (DR_statictic, test/estimator.py:119-137):
    buckets with < 2 votes get 0; else p ~ n/100 * (n/100-0.01) * (n/100-0.02)."""
    n = votes.astype(jnp.float32) / 100.0
    p = n * (n - 0.01) * (n - 0.02)
    p = jnp.where(votes >= 2, p, 0.0)
    total = jnp.sum(p)
    return jnp.where(total > 0, p / jnp.maximum(total, 1e-12), 0.0)


@functools.partial(jax.jit, static_argnames=("max_iter", "group_size"))
def yohoc_ransac(
    key: jax.Array,
    indices: jnp.ndarray,
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    inlier_dist: float,
    max_iter: int = 1000,
    group_size: int = 60,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Group-index-voting RANSAC (yohoc_ransac, test/estimator.py:113-264).

    Each iteration samples a group index from the cubic vote distribution,
    then 3 matches sharing that index (same local rotation => consistent
    triple), fits Kabsch, scores the weighted-inlier overlap. All
    ``max_iter`` iterations run as one batch; the reference forks one CPU
    process per scan pair instead.

    indices: (M,) coarse group index per match. Returns (T_best, overlap).
    """
    m = indices.shape[0]
    votes = jnp.zeros((group_size,), jnp.int32).at[
        jnp.where(valid, indices, group_size)
    ].add(1, mode="drop")
    prob = _vote_probability(votes)
    degenerate = jnp.sum(prob) < 1e-12

    k_bucket, k_members = jax.random.split(key)
    # categorical bucket choice per iteration (guard: uniform if degenerate)
    safe_prob = jnp.where(degenerate, jnp.ones_like(prob) / group_size, prob)
    buckets = jax.random.categorical(
        k_bucket, jnp.log(jnp.maximum(safe_prob, 1e-30)), shape=(max_iter,)
    )
    # 3 members of the chosen bucket per iteration via Gumbel top-k
    gumbel = jax.random.gumbel(k_members, (max_iter, m))
    member_ok = (indices[None, :] == buckets[:, None]) & valid[None, :]
    glogits = jnp.where(member_ok, gumbel, _NEG)
    _, triples = jax.lax.top_k(glogits, 3)  # (max_iter, 3)
    kps0 = keys0[triples]  # (max_iter, 3, 3)
    kps1 = keys1[triples]
    Ts = se3.three_points_to_transform(kps0, kps1)
    ov = score_hypotheses(Ts, keys0, keys1, scores, valid, inlier_dist)
    # iterations whose bucket had < 2 members are skipped by the reference
    enough = jnp.sum(member_ok, axis=-1) >= 2
    ov = jnp.where(enough & ~degenerate, ov, -1.0)
    best = jnp.argmax(ov)
    T_best = Ts[best]
    T_best = se3.refine_transform(
        keys0, keys1, T_best, scores, inlier_dist * 2.0, valid
    )
    T_best = se3.refine_transform(keys0, keys1, T_best, scores, inlier_dist, valid)
    return T_best, ov[best]
