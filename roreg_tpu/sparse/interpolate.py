"""Trilinear field interpolation over a sparse voxel level.

Functional equivalent of MinkowskiEngine's interpolation op (reference
``utils/MinkowskiEngine/src/interpolation_gpu.cu`` +
``MinkowskiInterpolation``): sample the sparse feature field at arbitrary
continuous coordinates. Each query blends the 8 surrounding voxel
features with trilinear weights; corners absent from the coordinate set
contribute zero (ME semantics — no renormalization). Unused by RoReg's
pipeline but part of the engine's capability surface.

TPU shape: corner lookups are 8 binary searches over the level's sorted
packed keys (the same ``lookup`` primitive as the kernel maps), the blend
is one masked weighted sum — fully jit/vmap-compatible and
differentiable through ``jnp.take``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roreg_tpu.sparse.kernel_map import lookup
from roreg_tpu.sparse.voxelize import SENTINEL, pack_keys

__all__ = ["interpolate"]

_CORNERS = [(i >> 2 & 1, i >> 1 & 1, i & 1) for i in range(8)]


@functools.partial(jax.jit, static_argnames=())
def interpolate(
    keys: jnp.ndarray,
    feats: jnp.ndarray,
    origin: jnp.ndarray,
    queries: jnp.ndarray,
    voxel_size: float | jnp.ndarray,
) -> jnp.ndarray:
    """Sample the sparse field at continuous world-space points.

    keys:    (M,) sorted packed voxel keys of the level (SENTINEL pads).
    feats:   (M, C) per-voxel features.
    origin:  (3,) int32 coordinate shift applied at voxelization
             (``VoxelGrid.origin``): stored coords = floor(p/vs) - origin.
    queries: (Q, 3) world-space points.
    Returns  (Q, C) interpolated features (zero where all corners absent).
    """
    # ME convention: voxel coordinate c sits at lattice position c (no
    # half-cell center shift) — interpolation_gpu.cu computes weights from
    # p/vs - floor(p/vs) directly.
    g = queries / voxel_size - origin.astype(queries.dtype)
    base = jnp.floor(g)
    frac = g - base  # in [0, 1)
    base = base.astype(jnp.int32)

    out = jnp.zeros((queries.shape[0], feats.shape[-1]), feats.dtype)
    for dx, dy, dz in _CORNERS:
        corner = base + jnp.asarray([dx, dy, dz], jnp.int32)
        ok = jnp.all((corner >= 0) & (corner < 1024), axis=-1)
        qk = jnp.where(ok, pack_keys(corner), SENTINEL)
        row = lookup(keys, qk)
        wx = frac[:, 0] if dx else 1.0 - frac[:, 0]
        wy = frac[:, 1] if dy else 1.0 - frac[:, 1]
        wz = frac[:, 2] if dz else 1.0 - frac[:, 2]
        w = jnp.where(row >= 0, wx * wy * wz, 0.0)
        f = jnp.take(feats, jnp.clip(row, 0), axis=0)
        out = out + w[:, None] * f
    return out
