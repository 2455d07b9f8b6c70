"""Brute-force kNN on the MXU: tiled distance matmuls + top-k.

TPU-native replacement for the reference's chunked-cdist GPU matcher
(``utils/knn_search.py``: ``find_nn_gpu:26``, ``find_knn_gpu:68``,
``knn_module.KNN:165``). Distances are computed as
``|q|^2 + |r|^2 - 2 q·r`` so the dominant cost is one (M,3)x(3,N) — or in
feature space (M,F)x(F,N) — matmul that XLA tiles onto the MXU; queries are
processed in row tiles via ``lax.map`` to bound the (tile, N) score block.

All functions are masked: padded reference rows (``ref_mask`` False) never win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["knn", "nn", "mutual_nn"]

_BIG = jnp.float32(1e12)


def _pairwise_sqdist(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """(m, d), (n, d) -> (m, n) squared euclidean distances (MXU matmul)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)
    rr = jnp.sum(r * r, axis=-1, keepdims=True).T
    qr = jnp.dot(q, r.T, preferred_element_type=jnp.float32)
    return qq + rr - 2.0 * qr


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    ref_mask: jnp.ndarray | None = None,
    tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest refs for each query. Returns (dists (m,k), idx (m,k)).

    ``tile`` bounds peak memory at (tile, n) f32; the query axis is padded to
    a tile multiple and processed with lax.map (sequential, no batch dim blowup).
    """
    m, d = query.shape
    n = ref.shape[0]
    if ref_mask is None:
        ref_mask = jnp.ones((n,), dtype=bool)

    if k == 1:
        # Single fused pass: XLA fuses the (m, n) distance block into the
        # min/argmin reduce without materializing it, and min/argmin is what
        # the VPU wants — measured 0.1 ms at (5000, 32768) vs 220 ms for the
        # tiled lax.map + lax.top_k formulation this replaces.
        d2 = _pairwise_sqdist(query, ref)
        d2 = jnp.where(ref_mask[None, :], d2, _BIG)
        return (
            jnp.min(d2, axis=1, keepdims=True),
            jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32),
        )

    m_pad = ((m + tile - 1) // tile) * tile
    qp = jnp.pad(query, ((0, m_pad - m), (0, 0)))
    qt = qp.reshape(m_pad // tile, tile, d)

    def one_tile(qblk):
        d2 = _pairwise_sqdist(qblk, ref)
        d2 = jnp.where(ref_mask[None, :], d2, _BIG)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    dists, idxs = jax.lax.map(one_tile, qt)
    return (
        dists.reshape(m_pad, k)[:m],
        idxs.reshape(m_pad, k)[:m],
    )


def nn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray | None = None,
    tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest neighbor: (m,) dists and (m,) indices."""
    dd, ii = knn(query, ref, 1, ref_mask=ref_mask, tile=tile)
    return dd[:, 0], ii[:, 0]


@functools.partial(jax.jit, static_argnames=("tile",))
def mutual_nn(
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
    tile: int = 2048,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual nearest-neighbor matching in feature space.

    Fixed-shape equivalent of the reference's python mutual-NN loop
    (test/matcher.py:96-105): returns ``nn01`` (m,) — for each row of feats0
    its NN in feats1 — and ``is_mutual`` (m,) bool.
    """
    m, n = feats0.shape[0], feats1.shape[0]
    if mask0 is None:
        mask0 = jnp.ones((m,), dtype=bool)
    if mask1 is None:
        mask1 = jnp.ones((n,), dtype=bool)
    _, nn01 = knn(feats0, feats1, 1, ref_mask=mask1, tile=tile)
    _, nn10 = knn(feats1, feats0, 1, ref_mask=mask0, tile=tile)
    nn01 = nn01[:, 0]
    nn10 = nn10[:, 0]
    back = nn10[nn01]
    is_mutual = (back == jnp.arange(m)) & mask0 & mask1[nn01]
    return nn01, is_mutual
