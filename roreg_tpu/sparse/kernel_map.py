"""Kernel-map construction for sparse convolution on TPU.

The functional equivalent of MinkowskiEngine's CoordinateMapManager
(reference ``src/coordinate_map_manager.cpp``, kernel maps decl ``:418-439``)
— but instead of pointer-chasing hash maps we keep each level's packed keys
*sorted* and resolve every (output voxel, kernel offset) query with a
vectorized binary search (``jnp.searchsorted``), producing dense
``(C_out, K)`` gather tables with ``-1`` for misses. Static shapes, fully
jit-compatible, vmappable over the 60-rotation group axis.

Level semantics mirror ME's tensor-stride model (coordinate inheritance for
transposed convs, ``src/convolution_transpose_gpu.cu``):

* level ``l`` holds coords that are multiples of ``2**l`` (in voxel units);
* a stride-2 conv from level l produces coords ``c - (c mod 2**(l+1))`` —
  exactly the coords ME emits when striding a coordinate map;
* the transposed conv from level l+1 back to level l targets the *stored*
  level-l coordinate set (inheritance), with neighbor lookups
  ``c_coarse = c_fine + d * 2**l`` per kernel offset d.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.sparse.voxelize import SENTINEL, VoxelGrid, pack_keys, voxelize

__all__ = [
    "hypercube_offsets",
    "hypercross_offsets",
    "kernel_offsets",
    "neighbor_table",
    "lookup",
    "pack_occupancy",
    "occupancy_words",
    "SparseLevel",
    "SparsePyramid",
    "build_pyramid",
]


def occupancy_words(kernel_volume: int) -> int:
    """Number of uint32 words holding a packed K-bit occupancy row."""
    return (kernel_volume + 31) // 32


def pack_occupancy(occ: jnp.ndarray) -> jnp.ndarray:
    """(M, K) bool occupancy -> (M, ceil(K/32)) packed uint32 words
    (bit j of word w = offset 32*w + j)."""
    m, k = occ.shape
    w = occupancy_words(k)
    pad = w * 32 - k
    if pad:
        occ = jnp.pad(occ, ((0, 0), (0, pad)))
    bits = occ.reshape(m, w, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def hypercube_offsets(kernel_size: int) -> np.ndarray:
    """ME 'hypercube' kernel region: kernel_size**3 offsets, row-major order,
    centered for odd sizes (region_type=0, src/kernel_region.hpp)."""
    r = np.arange(kernel_size) - (kernel_size - 1) // 2
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3).astype(np.int32)


def hypercross_offsets(kernel_size: int) -> np.ndarray:
    """ME 'hypercross' kernel region (region_type=1,
    src/kernel_region.hpp): the origin plus up-to-±(kernel_size//2) steps
    along each axis independently — ``1 + 3 * (kernel_size - 1)`` offsets
    in 3-D instead of ``kernel_size**3``. Deterministic order: origin
    first, then per axis (x, y, z) the radii 1..kernel_size//2, minus
    before plus."""
    if kernel_size % 2 != 1 or kernel_size < 3:
        raise ValueError("hypercross needs an odd kernel_size >= 3")
    offs = [np.zeros(3, np.int32)]
    for axis in range(3):
        for r in range(1, kernel_size // 2 + 1):
            for sign in (-1, 1):
                o = np.zeros(3, np.int32)
                o[axis] = sign * r
                offs.append(o)
    return np.stack(offs).astype(np.int32)


def kernel_offsets(
    kernel_size: int,
    region_type: str = "hypercube",
    custom_offsets: np.ndarray | None = None,
) -> np.ndarray:
    """Kernel-region dispatch mirroring ME's region types
    (src/kernel_region.hpp): ``hypercube`` (0), ``hypercross`` (1) or
    ``custom`` (2, caller-supplied (K, 3) int offsets)."""
    if region_type == "hypercube":
        return hypercube_offsets(kernel_size)
    if region_type == "hypercross":
        return hypercross_offsets(kernel_size)
    if region_type == "custom":
        if custom_offsets is None:
            raise ValueError("custom region requires custom_offsets")
        off = np.asarray(custom_offsets, np.int32)
        if off.ndim != 2 or off.shape[1] != 3:
            raise ValueError("custom_offsets must be (K, 3)")
        return off
    raise ValueError(f"unknown region_type {region_type!r}")


def lookup(sorted_keys: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Binary-search each query key in sorted keys; -1 where absent."""
    idx = jnp.searchsorted(sorted_keys, query_keys)
    idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
    found = sorted_keys[idx] == query_keys
    return jnp.where(found & (query_keys != SENTINEL), idx, -1)


def _neighbor_table(
    src_keys: jnp.ndarray,
    dst_coords: jnp.ndarray,
    dst_mask: jnp.ndarray,
    offsets: jnp.ndarray,
    step: int,
) -> jnp.ndarray:
    """(C_dst, K) gather table: src row of (dst_coord + offset*step), -1 miss."""
    q = dst_coords[:, None, :] + offsets[None, :, :] * step  # (C, K, 3)
    ok = jnp.all((q >= 0) & (q < 1024), axis=-1) & dst_mask[:, None]
    qk = jnp.where(ok, pack_keys(q), SENTINEL)
    return lookup(src_keys, qk)


def neighbor_table(
    level: "SparseLevel",
    offsets: np.ndarray | jnp.ndarray,
    step: int = 1,
) -> jnp.ndarray:
    """Public same-level gather-table builder for an arbitrary kernel
    region: (C, K) source rows of ``coord + offset * step``, -1 for
    misses. Feed the result straight to ``sparse.conv.gather_conv`` —
    this is how hypercross/custom-region convolutions run (the FCGF
    pipeline itself only uses hypercube regions)."""
    return _neighbor_table(
        level.keys, level.coords, level.mask, jnp.asarray(offsets), step
    )


class SparseLevel(NamedTuple):
    keys: jnp.ndarray  # (C_l,) sorted packed coords (voxel units)
    coords: jnp.ndarray  # (C_l, 3)
    mask: jnp.ndarray  # (C_l,)
    num: jnp.ndarray  # ()


class SparsePyramid(NamedTuple):
    """Per-cloud coordinate pyramid + all kernel maps the UNet needs.

    levels:   tuple of SparseLevel, finest first.
    conv1_occ: (C_0, ceil(K1/32)) packed uint32 occupancy words of the
              level-0 first-conv kernel map. The first conv consumes an
              all-ones 1-channel input (FCGF semantics), so only neighbor
              *existence* matters — indices are never needed, and packed
              bits are 16x smaller on the host->device wire.
    same:     per level, (C_l, 27) same-level 3^3 map (for residual blocks).
    down:     per level l -> l+1, (C_{l+1}, 27) map into level l.
    up:       per level l+1 -> l, (C_l, 27) map into level l+1.
    grid:     the original VoxelGrid of level 0 (rep points, to_voxel, ...).
    """

    levels: tuple
    conv1_occ: jnp.ndarray
    same: tuple
    down: tuple
    up: tuple
    grid: VoxelGrid


def _downsample(level: SparseLevel, stride: int, capacity: int) -> SparseLevel:
    """Coords snapped to multiples of ``stride`` (ME stride map), compacted."""
    snapped = (level.coords // stride) * stride
    keys = jnp.where(level.mask, pack_keys(snapped), SENTINEL)
    sk = jnp.sort(keys)
    valid = sk != SENTINEL
    isfirst = valid & jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    uidx = jnp.cumsum(isfirst.astype(jnp.int32)) - 1
    num = jnp.sum(isfirst.astype(jnp.int32))
    in_cap = isfirst & (uidx < capacity)
    out = jnp.full((capacity + 1,), SENTINEL, dtype=jnp.int32)
    out = out.at[jnp.where(in_cap, uidx, capacity)].set(
        jnp.where(in_cap, sk, SENTINEL)
    )
    out = out[:capacity]
    mask = out != SENTINEL
    coords = jnp.stack(
        [(out >> 20) & 1023, (out >> 10) & 1023, out & 1023], axis=-1
    ).astype(jnp.int32)
    return SparseLevel(
        keys=out, coords=coords, mask=mask, num=jnp.minimum(num, capacity)
    )


@functools.partial(
    jax.jit, static_argnames=("capacities", "conv1_kernel_size", "num_levels")
)
def build_pyramid(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    voxel_size: float,
    capacities: tuple[int, ...],
    conv1_kernel_size: int = 7,
    num_levels: int = 4,
) -> SparsePyramid:
    """Voxelize a cloud and precompute every kernel map of the FCGF UNet.

    This runs once per (cloud, rotation); the network forward afterwards is
    pure gather/matmul. ``capacities`` are the static per-level row budgets.
    """
    assert len(capacities) == num_levels
    grid = voxelize(points, point_mask, voxel_size, capacities[0])
    lvl0 = SparseLevel(
        keys=grid.keys, coords=grid.coords, mask=grid.mask, num=grid.num_voxels
    )

    off3 = jnp.asarray(hypercube_offsets(3))
    offc1 = jnp.asarray(hypercube_offsets(conv1_kernel_size))

    levels = [lvl0]
    for l in range(1, num_levels):
        levels.append(_downsample(levels[-1], 2**l, capacities[l]))

    conv1_occ = pack_occupancy(
        _neighbor_table(lvl0.keys, lvl0.coords, lvl0.mask, offc1, 1) >= 0
    )
    same, down, up = [], [], []
    for l in range(num_levels):
        step = 2**l
        same.append(
            _neighbor_table(
                levels[l].keys, levels[l].coords, levels[l].mask, off3, step
            )
        )
    for l in range(num_levels - 1):
        step = 2**l
        # stride-2 conv: dst = level l+1, neighbors in level l at dst + d*step
        down.append(
            _neighbor_table(
                levels[l].keys, levels[l + 1].coords, levels[l + 1].mask, off3, step
            )
        )
        # transposed conv: dst = level l (inherited coords), src = level l+1,
        # src coord = dst + d*step  (generative conv transpose relation)
        up.append(
            _neighbor_table(
                levels[l + 1].keys, levels[l].coords, levels[l].mask, off3, step
            )
        )

    return SparsePyramid(
        levels=tuple(levels),
        conv1_occ=conv1_occ,
        same=tuple(same),
        down=tuple(down),
        up=tuple(up),
        grid=grid,
    )
