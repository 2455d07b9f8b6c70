"""Sparse pooling / broadcast / pruning — the rest of ME's op surface.

FCGF itself only uses conv + BN + relu + cat, but MinkowskiEngine's
capability set (SURVEY §2.2: local/global/max/avg pooling
``src/*pool*.cu``, broadcast ``src/broadcast_*``, pruning
``src/pruning_*``) is part of the reference's native layer; these are the
masked static-shape equivalents so backbones beyond FCGF can be expressed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roreg_tpu.sparse.kernel_map import SparseLevel

__all__ = [
    "local_pool",
    "global_pool",
    "global_broadcast",
    "prune",
]

_NEG = -1e30


def local_pool(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    out_mask: jnp.ndarray,
    mode: str = "max",
) -> jnp.ndarray:
    """Strided/local pooling over a kernel map.

    feats (N, C); nbr (M, K) gather table (-1 = missing); mode max|avg.
    Equivalent to ME local_pooling_{cpu,gpu} on a precomputed map.
    """
    g = jnp.take(feats, jnp.clip(nbr, 0), axis=0)  # (M, K, C)
    ok = (nbr >= 0)[..., None]
    if mode == "max":
        g = jnp.where(ok, g, _NEG)
        out = jnp.max(g, axis=1)
        out = jnp.where(out <= _NEG / 2, 0.0, out)
    elif mode == "avg":
        g = jnp.where(ok, g, 0.0)
        cnt = jnp.clip(jnp.sum(ok, axis=1), 1)
        out = jnp.sum(g, axis=1) / cnt
    else:
        raise ValueError(mode)
    return jnp.where(out_mask[..., None], out, 0.0)


def global_pool(
    feats: jnp.ndarray, mask: jnp.ndarray, mode: str = "avg"
) -> jnp.ndarray:
    """Pool all valid voxels to one vector (ME global_pooling_*)."""
    if mode == "avg":
        w = mask.astype(feats.dtype)[:, None]
        return jnp.sum(feats * w, axis=0) / jnp.clip(jnp.sum(w), 1.0)
    if mode == "max":
        f = jnp.where(mask[:, None], feats, _NEG)
        out = jnp.max(f, axis=0)
        return jnp.where(out <= _NEG / 2, 0.0, out)
    if mode == "sum":
        return jnp.sum(jnp.where(mask[:, None], feats, 0.0), axis=0)
    raise ValueError(mode)


def global_broadcast(
    feats: jnp.ndarray,
    global_vec: jnp.ndarray,
    mask: jnp.ndarray,
    op: str = "add",
) -> jnp.ndarray:
    """Broadcast a per-cloud global vector back onto voxels
    (ME broadcast_{cpu,gpu}; used by global pool / instance norm)."""
    if op == "add":
        out = feats + global_vec[None, :]
    elif op == "mul":
        out = feats * global_vec[None, :]
    else:
        raise ValueError(op)
    return jnp.where(mask[..., None], out, 0.0)


def prune(level: SparseLevel, keep: jnp.ndarray) -> SparseLevel:
    """Drop coordinates by mask (ME pruning_*): rows stay in place, the
    validity mask shrinks — downstream masked ops ignore pruned rows.

    Keys are left untouched so they remain sorted; gather tables built
    *against* a pruned level must post-filter hits through ``level.mask``
    (the usual masked-op pattern in this package)."""
    new_mask = level.mask & keep
    return SparseLevel(
        keys=level.keys,
        coords=level.coords,
        mask=new_mask,
        num=jnp.sum(new_mask.astype(jnp.int32)),
    )
