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
    neighbor_table_host,
    unique_snapped_host,
    voxelize_host,
)
from roreg_tpu.sparse.kernel_map import SparseLevel, SparsePyramid, hypercube_offsets
from roreg_tpu.sparse.voxelize import VoxelGrid

__all__ = ["build_pyramid_host"]


def _pad_rows(x: np.ndarray, cap: int, fill=0):
    if x.shape[0] >= cap:
        return x[:cap]
    pad = np.full((cap - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad], 0)


def build_pyramid_host(
    points: np.ndarray,
    voxel_size: float,
    capacities: tuple[int, ...],
    conv1_kernel_size: int = 7,
    num_levels: int = 4,
) -> SparsePyramid:
    """Voxelize + build every kernel map of the UNet on host (numpy out)."""
    pts = np.ascontiguousarray(points, np.float32)
    to_voxel, rep, coords0 = voxelize_host(pts, voxel_size)
    # shift to non-negative like the device path (irrelevant to maps, keeps
    # coords comparable across backends)
    origin = coords0.min(axis=0) if len(coords0) else np.zeros(3, np.int32)
    coords0 = coords0 - origin

    off3 = hypercube_offsets(3)
    offc1 = hypercube_offsets(conv1_kernel_size)

    level_coords = [coords0]
    for l in range(1, num_levels):
        level_coords.append(unique_snapped_host(level_coords[-1], 2**l))

    caps = capacities
    levels, same, down, up = [], [], [], []
    nums = [min(len(c), caps[l]) for l, c in enumerate(level_coords)]
    for l in range(num_levels):
        c = level_coords[l][: nums[l]]
        level_coords[l] = c
    for l in range(num_levels):
        c = level_coords[l]
        step = 2**l
        levels.append(
            SparseLevel(
                keys=_pad_rows(
                    (c[:, 0].astype(np.int64) * (1 << 20)
                     + c[:, 1].astype(np.int64) * (1 << 10)
                     + c[:, 2].astype(np.int64)).astype(np.int32),
                    caps[l], 2**31 - 1,
                ),
                coords=_pad_rows(c, caps[l]),
                mask=_pad_rows(np.ones(len(c), bool), caps[l], False),
                num=np.int32(len(c)),
            )
        )
        nt = neighbor_table_host(c, c, off3, step)
        same.append(_pad_rows(nt, caps[l], -1))
    conv1 = _pad_rows(
        neighbor_table_host(level_coords[0], level_coords[0], offc1, 1),
        caps[0], -1,
    )
    for l in range(num_levels - 1):
        step = 2**l
        down.append(
            _pad_rows(
                neighbor_table_host(
                    level_coords[l], level_coords[l + 1], off3, step
                ),
                caps[l + 1], -1,
            )
        )
        up.append(
            _pad_rows(
                neighbor_table_host(
                    level_coords[l + 1], level_coords[l], off3, step
                ),
                caps[l], -1,
            )
        )

    n0 = len(level_coords[0])
    rep_pts = _pad_rows(pts[rep[:n0]], caps[0])
    tv = np.where(to_voxel < caps[0], to_voxel, -1).astype(np.int32)
    grid = VoxelGrid(
        keys=levels[0].keys,
        coords=levels[0].coords,
        mask=levels[0].mask,
        num_voxels=np.int32(n0),
        to_voxel=tv,
        rep_point=rep_pts,
        origin=origin.astype(np.int32),
    )
    return SparsePyramid(
        levels=tuple(levels),
        conv1=conv1,
        same=tuple(same),
        down=tuple(down),
        up=tuple(up),
        grid=grid,
    )
