"""Static-shape voxelization: the TPU-native sparse_quantize.

Replaces MinkowskiEngine's coordinate hashing/quantization layer
(reference ``utils/MinkowskiEngine/src/quantization.cpp``, used via
``ME.utils.sparse_quantize`` at ``backbone/fcgf/misc.py:87`` and
``testset.py:45``). Instead of a dynamic hash map, we pack integer voxel
coordinates into a single sortable int32 key and compact first occurrences
into a fixed ``capacity`` — everything jit-compatible, fully on device.

Grid extents are bounded to 2**AXIS_BITS voxels per axis (1024 by default —
25.6 m at 2.5 cm voxels, 150 m at ETH's 15 cm). Out-of-range points are
dropped into the invalid bucket and **counted**: ``VoxelGrid.num_dropped``
carries the number of valid input points that fell outside the extent, so
callers can surface the loss loudly (the host builders already do).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["VoxelGrid", "voxelize", "pack_keys", "AXIS_BITS"]

AXIS_BITS = 10  # 1024 voxels per axis
_EXTENT = 1 << AXIS_BITS
SENTINEL = jnp.int32(2**31 - 1)  # sorts after every valid key


def pack_keys(coords: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) non-negative int32 voxel coords -> (…,) sortable int32 key."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    return (x << (2 * AXIS_BITS)) | (y << AXIS_BITS) | z


class VoxelGrid(NamedTuple):
    """Compacted voxel set with static ``capacity`` rows.

    keys:        (C,) int32 sorted packed keys; SENTINEL pad rows.
    coords:      (C, 3) int32 shifted voxel coords (garbage on pad rows).
    mask:        (C,) bool valid-voxel mask.
    num_voxels:  () int32.
    to_voxel:    (N,) int32 voxel row of each input point (-1 for invalid pts).
    rep_point:   (C, 3) f32 representative point (lowest-index original point
                 per voxel — mirrors sparse_quantize(return_index) semantics).
    origin:      (3,) int32 coordinate shift that was applied (coords_true =
                 coords - origin is NOT needed downstream; kept for debugging).
    num_dropped: () int32 count of valid input points outside the
                 2**AXIS_BITS-voxel extent (dropped to the invalid bucket).
    """

    keys: jnp.ndarray
    coords: jnp.ndarray
    mask: jnp.ndarray
    num_voxels: jnp.ndarray
    to_voxel: jnp.ndarray
    rep_point: jnp.ndarray
    origin: jnp.ndarray
    num_dropped: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxelize(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    voxel_size: float,
    capacity: int,
) -> VoxelGrid:
    """Quantize (N, 3) points to a compacted voxel grid with static capacity.

    Voxel id = floor(p / voxel_size), matching the reference's
    ``coords = np.floor(xyz / voxel_size)`` (backbone/fcgf/misc.py:86).
    If more than ``capacity`` distinct voxels exist, the overflow voxels
    (largest keys) are dropped and their points map to -1.
    """
    n = points.shape[0]
    vcoords = jnp.floor(points / voxel_size).astype(jnp.int32)

    # shift to non-negative using the masked min
    big = jnp.int32(2**30)
    masked = jnp.where(point_mask[:, None], vcoords, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(origin == big, 0, origin)  # empty cloud guard
    shifted = vcoords - origin

    in_range = jnp.all((shifted >= 0) & (shifted < _EXTENT), axis=-1) & point_mask
    num_dropped = jnp.sum((point_mask & ~in_range).astype(jnp.int32))
    keys = jnp.where(in_range, pack_keys(shifted), SENTINEL)

    order = jnp.argsort(keys)
    sk = keys[order]
    valid = sk != SENTINEL
    isfirst = valid & jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    uidx = jnp.cumsum(isfirst.astype(jnp.int32)) - 1  # voxel row per sorted pos
    num = jnp.sum(isfirst.astype(jnp.int32))

    in_cap = valid & (uidx < capacity)
    safe_uidx = jnp.where(in_cap, uidx, capacity)  # overflow row (dropped)

    ukeys = jnp.full((capacity + 1,), SENTINEL, dtype=jnp.int32)
    ukeys = ukeys.at[safe_uidx].set(jnp.where(in_cap, sk, SENTINEL))

    # representative original point: lowest original index in each voxel
    orig_idx = order
    rep_idx = jnp.full((capacity + 1,), n, dtype=jnp.int32)
    rep_idx = rep_idx.at[safe_uidx].min(jnp.where(in_cap, orig_idx, n))
    rep_pt = jnp.pad(points, ((0, 1), (0, 0)))[rep_idx[:capacity]]

    to_voxel_sorted = jnp.where(in_cap, uidx, -1)
    to_voxel = jnp.zeros((n,), dtype=jnp.int32).at[order].set(to_voxel_sorted)

    ukeys = ukeys[:capacity]
    mask = ukeys != SENTINEL
    coords = jnp.stack(
        [
            (ukeys >> (2 * AXIS_BITS)) & (_EXTENT - 1),
            (ukeys >> AXIS_BITS) & (_EXTENT - 1),
            ukeys & (_EXTENT - 1),
        ],
        axis=-1,
    ).astype(jnp.int32)

    return VoxelGrid(
        keys=ukeys,
        coords=coords,
        mask=mask,
        num_voxels=jnp.minimum(num, capacity),
        to_voxel=to_voxel,
        rep_point=rep_pt,
        origin=origin,
        num_dropped=num_dropped,
    )
