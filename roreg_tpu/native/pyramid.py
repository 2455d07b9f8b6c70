"""Host-side pyramid construction: the production extractor path.

MinkowskiEngine keeps its coordinate maps and kernel maps on the *host*
(C++ CoordinateMapManager) and sends only GEMM work to the accelerator; the
same split is optimal here — device-side sorting/searchsorted pyramids cost
~0.5 s + minutes of XLA compile per shape (measured), while this C++ path
builds all maps for one rotation in ~10 ms. The returned structure is a
:class:`roreg_tpu.sparse.kernel_map.SparsePyramid` with numpy arrays padded
to the static capacities, directly consumable by the jitted backbone.
"""

from __future__ import annotations

import numpy as np

from roreg_tpu.native.lib import (
    neighbor_occupancy_host,
    neighbor_table_host,
    unique_snapped_host,
    voxelize_host,
)
from roreg_tpu.sparse.kernel_map import (
    SparseLevel,
    SparsePyramid,
    hypercube_offsets,
    occupancy_words,
)
from roreg_tpu.sparse.voxelize import VoxelGrid

__all__ = ["build_pyramid_host", "alloc_pyramid_buffers", "fill_pyramid_host"]


def _pad_rows(x: np.ndarray, cap: int, fill=0):
    if x.shape[0] >= cap:
        return x[:cap]
    pad = np.full((cap - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad], 0)


def alloc_pyramid_buffers(
    capacities: tuple[int, ...],
    conv1_kernel_size: int,
    batch: int | None = None,
    num_levels: int = 4,
) -> SparsePyramid:
    """Preallocate a (optionally batched) SparsePyramid of numpy buffers.

    With ``batch``, every leaf gets a leading batch axis; fill each slot via
    ``fill_pyramid_host(pts, ..., out=tree_slice(buf, i))`` — this is how
    the extractor avoids re-allocating + np.stack-ing ~0.5 GB per rotation
    chunk.
    """

    def arr(shape, dtype, fill=0):
        s = (batch,) + shape if batch is not None else shape
        a = np.empty(s, dtype)
        a.fill(fill)
        return a

    caps = capacities
    k1 = conv1_kernel_size**3
    # int16 tables when every row index fits: halves host->device transfer
    idx_dt = np.int16 if max(caps) <= 32768 else np.int32
    levels = tuple(
        SparseLevel(
            keys=arr((caps[l],), np.int32, 2**31 - 1),
            coords=arr((caps[l], 3), np.int32),
            mask=arr((caps[l],), bool, False),
            num=arr((), np.int32),
        )
        for l in range(num_levels)
    )
    same = tuple(arr((caps[l], 27), idx_dt, -1) for l in range(num_levels))
    down = tuple(arr((caps[l + 1], 27), idx_dt, -1) for l in range(num_levels - 1))
    up = tuple(arr((caps[l], 27), idx_dt, -1) for l in range(num_levels - 1))
    conv1_occ = arr((caps[0], occupancy_words(k1)), np.uint32, 0)
    grid = VoxelGrid(
        keys=levels[0].keys,
        coords=levels[0].coords,
        mask=levels[0].mask,
        num_voxels=arr((), np.int32),
        to_voxel=arr((0,), np.int32),  # not tracked in batched mode
        rep_point=arr((caps[0], 3), np.float32),
        origin=arr((3,), np.int32),
        num_dropped=arr((), np.int32),
    )
    return SparsePyramid(
        levels=levels, conv1_occ=conv1_occ, same=same, down=down, up=up, grid=grid
    )


def tree_slice(buf: SparsePyramid, i: int) -> SparsePyramid:
    """Slice batched buffers to one slot as writable views (no copies).

    1-D leaves (the per-slot scalars like ``num``) become shape-(1,) views —
    plain ``x[i]`` would return a scalar copy and writes would be lost."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: x[i] if x.ndim > 1 else x[i : i + 1], buf
    )


def fill_pyramid_host(
    points: np.ndarray,
    voxel_size: float,
    out: SparsePyramid,
    conv1_kernel_size: int = 7,
    num_levels: int = 4,
) -> None:
    """Fill preallocated pyramid buffers in place (buffers must start in
    their pad state: keys=SENTINEL, tables=-1, mask=False)."""
    pts = np.ascontiguousarray(points, np.float32)
    to_voxel, rep, coords0 = voxelize_host(pts, voxel_size)
    # shift to non-negative like the device path (irrelevant to maps, keeps
    # coords comparable across backends)
    origin = coords0.min(axis=0) if len(coords0) else np.zeros(3, np.int32)
    coords0 = coords0 - origin

    off3 = hypercube_offsets(3)
    offc1 = hypercube_offsets(conv1_kernel_size)
    caps = tuple(out.levels[l].keys.shape[0] for l in range(num_levels))

    # Row order = sorted packed key (x-major, z fastest), matching the device
    # pyramid. Spatial sort order is what makes kernel-map neighbor indices
    # LOCAL (a 3^3 offset moves a row by ~one z-step / y-run / x-plane, not
    # arbitrarily) — the property the windowed conv kernels rely on. Hash
    # first-appearance order (ME sparse_quantize semantics) is kept only for
    # per-voxel representative-point selection.
    order0 = np.argsort(
        coords0[:, 0].astype(np.int64) * (1 << 20)
        + coords0[:, 1].astype(np.int64) * (1 << 10)
        + coords0[:, 2].astype(np.int64)
    )
    coords0 = coords0[order0]
    rep = rep[order0]

    level_coords = [coords0]
    for l in range(1, num_levels):
        c = unique_snapped_host(level_coords[-1], 2**l)
        k = (
            c[:, 0].astype(np.int64) * (1 << 20)
            + c[:, 1].astype(np.int64) * (1 << 10)
            + c[:, 2].astype(np.int64)
        )
        level_coords.append(c[np.argsort(k)])
    for l in range(num_levels):
        level_coords[l] = level_coords[l][: caps[l]]

    for l in range(num_levels):
        c = level_coords[l]
        step = 2**l
        n = len(c)
        lvl = out.levels[l]
        lvl.keys[:n] = (
            c[:, 0].astype(np.int64) * (1 << 20)
            + c[:, 1].astype(np.int64) * (1 << 10)
            + c[:, 2].astype(np.int64)
        ).astype(np.int32)
        lvl.coords[:n] = c
        lvl.mask[:n] = True
        lvl.mask[n:] = False  # clear stale rows on buffer reuse
        lvl.num[...] = n
        neighbor_table_host(c, c, off3, step, out=out.same[l])
        # stale table rows past n are NOT just cosmetic: window_starts_local
        # takes the min over all >=0 entries of a 128-row tile, so a stale
        # neighbor index from a previous fill can drag a tile's window start
        # (or its measured spread) arbitrarily far and silently zero valid
        # rows / spuriously fail the locality check
        out.same[l][n:] = -1
    neighbor_occupancy_host(
        level_coords[0], level_coords[0], offc1, 1, out=out.conv1_occ
    )
    for l in range(num_levels - 1):
        step = 2**l
        neighbor_table_host(
            level_coords[l], level_coords[l + 1], off3, step, out=out.down[l]
        )
        out.down[l][len(level_coords[l + 1]):] = -1
        neighbor_table_host(
            level_coords[l + 1], level_coords[l], off3, step, out=out.up[l]
        )
        out.up[l][len(level_coords[l]):] = -1

    n0 = len(level_coords[0])
    out.grid.rep_point[:n0] = pts[rep[:n0]]
    out.grid.num_voxels[...] = n0
    out.grid.origin[:] = origin


def build_pyramid_host(
    points: np.ndarray,
    voxel_size: float,
    capacities: tuple[int, ...],
    conv1_kernel_size: int = 7,
    num_levels: int = 4,
) -> SparsePyramid:
    """Voxelize + build every kernel map of the UNet on host (numpy out)."""
    buf = alloc_pyramid_buffers(capacities, conv1_kernel_size, None, num_levels)
    fill_pyramid_host(points, voxel_size, buf, conv1_kernel_size, num_levels)
    # attach to_voxel for single-cloud callers (train data paths); remap
    # first-appearance voxel ids to the sorted-key row order of the pyramid
    pts = np.ascontiguousarray(points, np.float32)
    to_voxel, _, coords0 = voxelize_host(pts, voxel_size)
    order0 = np.argsort(
        coords0[:, 0].astype(np.int64) * (1 << 20)
        + coords0[:, 1].astype(np.int64) * (1 << 10)
        + coords0[:, 2].astype(np.int64)
    )
    rank = np.empty(len(order0), np.int32)
    rank[order0] = np.arange(len(order0), dtype=np.int32)
    tv = rank[to_voxel]
    cap0 = capacities[0]
    tv = np.where(tv < cap0, tv, -1).astype(np.int32)
    return buf._replace(grid=buf.grid._replace(to_voxel=tv))
