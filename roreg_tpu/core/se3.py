"""SE(3) helpers: rigid transforms, (weighted) Kabsch, 3-point hypotheses.

JAX equivalents of the reference's numpy utilities: ``transform_points``
(utils/utils.py:38), ``SVDR``/``SVDR_w`` (utils/utils.py:218-241),
``Threepps2Tran`` (utils/utils.py:242, test/estimator.py:139), and the
weighted-inlier refinement ``refiner.Refine_trans`` (test/estimator.py:60-72)
— all batched/vmappable for on-device RANSAC.

Transforms are (4, 4) (or (..., 4, 4)); convention matches the reference:
``T @ [p; 1]``, i.e. points0 ≈ R @ points1 + t for gt pairs (dataset.py:27-30).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "transform_points",
    "make_transform",
    "kabsch_weighted",
    "three_points_to_transform",
    "refine_transform",
    "compose",
    "invert",
]


def transform_points(pts: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """(…, N, 3), (…, 4, 4) or (…, 3, 4) -> (…, N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3), (…, 3) -> homogeneous (…, 4, 4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def kabsch_weighted(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted rigid fit: find T with dst ≈ R @ src + t.

    Mirrors refiner.Rt_cal (test/estimator.py:44-58): weighted centroids,
    SVD of the weighted cross-covariance, no determinant reflection fix —
    but we do apply the proper-rotation correction (sign of det) since it
    strictly improves degenerate cases. (…, N, 3) inputs, weights (…, N).
    """
    w = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    c_src = jnp.einsum("...n,...ni->...i", w, src)
    c_dst = jnp.einsum("...n,...ni->...i", w, dst)
    src_c = src - c_src[..., None, :]
    dst_c = dst - c_dst[..., None, :]
    # H = dst_c^T diag(w) src_c; R = U V^T with H = U S V^T  (dst ≈ R src)
    H = jnp.einsum("...ni,...n,...nj->...ij", dst_c, w, src_c)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt)))
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )  # fix improper rotation
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src)
    return make_transform(R, t)


def three_points_to_transform(kps0: jnp.ndarray, kps1: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform from (…, 3, 3)-point triples: kps0 ≈ R kps1 + t.

    Equivalent of Threepps2Tran (test/estimator.py:139-148) returning (…,4,4).
    """
    w = jnp.ones(kps1.shape[:-1], dtype=kps1.dtype)
    return kabsch_weighted(kps1, kps0, w)


def refine_transform(
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    T: jnp.ndarray,
    scores: jnp.ndarray,
    inlier_dist: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One weighted-inlier refit (refiner.Refine_trans, test/estimator.py:60-72).

    Inliers of T get their matcher score as weight, outliers weight 0 —
    a masked formulation of the reference's index-select, fixed-shape for jit.
    """
    k1t = transform_points(keys1, T)
    d2 = jnp.sum((keys0 - k1t) ** 2, axis=-1)
    w = jnp.where(d2 < inlier_dist * inlier_dist, scores, 0.0)
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
    # degenerate guard: if no inliers survive, keep T by weighting all points
    no_inl = jnp.sum(w, axis=-1, keepdims=True) < 1e-12
    w = jnp.where(no_inl, jnp.ones_like(w) * 1e-6, w)
    T_new = kabsch_weighted(keys1, keys0, w)
    return jnp.where(no_inl[..., None], T, T_new)


def compose(T0: jnp.ndarray, T1: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...jk->...ik", T0, T1)


def invert(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))
