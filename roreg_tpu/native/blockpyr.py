"""Host-side block-pyramid construction for the block-dense engine.

The coarse-grained analog of MinkowskiEngine's host CoordinateMapManager
(reference ``src/coordinate_map_manager.cpp``): instead of per-voxel
kernel maps (``(M, 27)`` row tables, the dominant host->device transfer
in round 1), we build per-*block* tables — 64x smaller — plus 64-bit
cell-occupancy words. Everything is vectorized numpy over packed block
keys (sorted + searchsorted); see ``roreg_tpu/sparse/block.py`` for the
device-side consumption geometry.

Payload per rotation at production scale (~2048 L0 blocks): ~0.9 MB
(vs ~10 MB of row tables) — the host->device wire stops being the
bottleneck, and no per-row neighbor hashing runs on the host at all.
"""

from __future__ import annotations

import sys

import numpy as np

from roreg_tpu.native.lib import voxelize_host
from roreg_tpu.sparse.block import BLOCK, CELLS, BlockLevelDev, BlockPyramidDev
from roreg_tpu.sparse.kernel_map import hypercube_offsets

__all__ = [
    "alloc_block_buffers",
    "alloc_block_buffers_packed",
    "alloc_block_buffers_packed_rows",
    "payload_spec",
    "fill_block_pyramid_host",
    "fill_block_pyramid_numpy",
    "build_block_pyramid_host",
    "block_tree_slice",
]


def _pack_blocks(bc: np.ndarray) -> np.ndarray:
    """(…, 3) block coords in [0, 256) -> sortable int32 key."""
    return (
        (bc[..., 0].astype(np.int32) << 16)
        | (bc[..., 1].astype(np.int32) << 8)
        | bc[..., 2].astype(np.int32)
    )


def _lookup_blocks(sorted_keys: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Rows of query block coords q (…, 3) in sorted_keys; -1 absent/OOB."""
    ok = np.all((q >= 0) & (q < 256), axis=-1)
    qk = _pack_blocks(np.clip(q, 0, 255))
    idx = np.searchsorted(sorted_keys, qk).clip(0, max(len(sorted_keys) - 1, 0))
    if len(sorted_keys) == 0:
        return np.full(q.shape[:-1], -1, np.int32)
    found = ok & (sorted_keys[idx] == qk)
    return np.where(found, idx, -1).astype(np.int32)


def alloc_block_buffers(
    block_caps: tuple[int, ...], batch: int | None = None, num_levels: int = 4
) -> BlockPyramidDev:
    """Preallocate (optionally batched) numpy block-pyramid buffers in
    their pad state (occ=0, tables=-1)."""

    def arr(shape, dtype, fill=0):
        s = (batch,) + shape if batch is not None else shape
        a = np.empty(s, dtype)
        a.fill(fill)
        return a

    caps = block_caps
    levels = tuple(
        BlockLevelDev(
            occ_words=arr((caps[l], 2), np.uint32),
            same_tbl=arr((caps[l], 27), np.int16, -1),
        )
        for l in range(num_levels)
    )
    down = tuple(arr((caps[l + 1], 27), np.int16, -1) for l in range(num_levels - 1))
    up = tuple(arr((caps[l], 27), np.int32, -1) for l in range(num_levels - 1))
    return BlockPyramidDev(
        levels=levels,
        down_tbl=down,
        up_tbl=up,
        l0_coords=arr((caps[0], 3), np.int16),
        origin=arr((3,), np.int32),
    )


def payload_spec(
    block_caps: tuple[int, ...], batch: int | None, num_levels: int = 4
):
    """Deterministic (name, shape, dtype, byte offset) layout of one packed
    block-pyramid payload. Offsets are 8-byte aligned; total size last."""
    caps = block_caps
    fields = []
    for l in range(num_levels):
        fields.append((f"occ{l}", (caps[l], 2), np.uint32))
        fields.append((f"same{l}", (caps[l], 27), np.int16))
    for l in range(num_levels - 1):
        fields.append((f"down{l}", (caps[l + 1], 27), np.int16))
    for l in range(num_levels - 1):
        fields.append((f"up{l}", (caps[l], 27), np.int32))
    fields.append(("l0_coords", (caps[0], 3), np.int16))
    fields.append(("origin", (3,), np.int32))
    spec, off = [], 0
    for name, shape, dt in fields:
        s = (batch,) + shape if batch is not None else shape
        nb = int(np.prod(s)) * np.dtype(dt).itemsize
        spec.append((name, s, np.dtype(dt), off))
        off += (nb + 7) // 8 * 8
    return spec, off


def _tree_from_fields(f, num_levels: int) -> BlockPyramidDev:
    return BlockPyramidDev(
        levels=tuple(
            BlockLevelDev(occ_words=f[f"occ{l}"], same_tbl=f[f"same{l}"])
            for l in range(num_levels)
        ),
        down_tbl=tuple(f[f"down{l}"] for l in range(num_levels - 1)),
        up_tbl=tuple(f[f"up{l}"] for l in range(num_levels - 1)),
        l0_coords=f["l0_coords"],
        origin=f["origin"],
    )


def alloc_block_buffers_packed(
    block_caps: tuple[int, ...], batch: int | None = None, num_levels: int = 4
):
    """-> (payload (total,) uint8, BlockPyramidDev of views INTO it).

    Filling the tree fills the payload; shipping the single payload array
    to the device replaces ~17 per-leaf host->device puts (each with ~4 ms
    per-transfer dispatch overhead) with one. Unpack on device with
    :func:`roreg_tpu.sparse.block.unpack_block_payload` (same spec).
    """
    spec, total = payload_spec(block_caps, batch, num_levels)
    payload = np.zeros(total, np.uint8)
    fields = {}
    for name, shape, dt, off in spec:
        v = np.frombuffer(
            payload.data, dtype=dt, count=int(np.prod(shape)), offset=off
        ).reshape(shape)
        fields[name] = v
    tree = _tree_from_fields(fields, num_levels)
    # pad state: tables -1
    for l in range(num_levels):
        tree.levels[l].same_tbl[:] = -1
    for l in range(num_levels - 1):
        tree.down_tbl[l][:] = -1
        tree.up_tbl[l][:] = -1
    return payload, tree


def alloc_block_buffers_packed_rows(
    block_caps: tuple[int, ...], batch: int, rows: int, num_levels: int = 4
):
    """-> (payload (rows, total) uint8, [BlockPyramidDev views per row]).

    ``rows`` chunk payloads laid out as rows of ONE contiguous array: the
    caller ships a whole cloud with a single host->device put and the
    chunk program dynamic-indexes its row (keeping the per-chunk unpack
    graph identical to the proven single-payload program — the batch=60
    whole-cloud unpack variant was measured to compile pathologically).
    """
    spec, total = payload_spec(block_caps, batch, num_levels)
    payload = np.zeros((rows, total), np.uint8)
    trees = []
    for r in range(rows):
        row = payload[r]
        fields = {}
        for name, shape, dt, off in spec:
            v = np.frombuffer(
                row.data, dtype=dt, count=int(np.prod(shape)), offset=off
            ).reshape(shape)
            fields[name] = v
        tree = _tree_from_fields(fields, num_levels)
        for l in range(num_levels):
            tree.levels[l].same_tbl[:] = -1
        for l in range(num_levels - 1):
            tree.down_tbl[l][:] = -1
            tree.up_tbl[l][:] = -1
        trees.append(tree)
    return payload, trees


def block_tree_slice(buf: BlockPyramidDev, i: int) -> BlockPyramidDev:
    """One batch slot as writable views (cf. native/pyramid.tree_slice)."""
    import jax

    return jax.tree_util.tree_map(lambda x: x[i], buf)


OFF3 = hypercube_offsets(3)  # 27 offsets, row-major, dx slowest
# region offsets for up tables: (i, j, k) in [0, 3)^3, same ordering
REGION3 = OFF3 + 1


def fill_block_pyramid_host(
    points: np.ndarray,
    voxel_size: float,
    out: BlockPyramidDev,
    num_levels: int = 4,
    warn_overflow: bool = True,
    keys: np.ndarray | None = None,
    key_rows: np.ndarray | None = None,
) -> int:
    """Fill preallocated buffers in place; returns total dropped blocks.
    When ``keys`` (K, 3) and ``key_rows`` (K,) int32 are given, also
    resolves each keypoint to the flat level-0 cell row of its nearest
    surviving voxel (testset.py:168-171 keypoint kNN, host-side).

    Dispatches to the C++ builder (voxelhash.cpp build_block_pyramid; one
    GIL-free call, ~11x the numpy path and thread-scalable) with the numpy
    implementation as the toolchain-free fallback and parity oracle
    (tests/test_block.py::test_native_block_builder_parity).

    Capacity overflow is LOUD (stderr warning + return count), never a
    silent truncation: dropped blocks are the largest packed keys, and
    every cross-reference (tables, key rows) treats them as absent.
    """
    pts = np.ascontiguousarray(points, np.float32)
    from roreg_tpu.native.lib import build_block_pyramid_native

    dropped_native = build_block_pyramid_native(
        pts, voxel_size, out, num_levels, keys=keys, key_rows=key_rows
    )
    if dropped_native is not None:
        if dropped_native and warn_overflow:
            print(
                f"[blockpyr] {dropped_native} blocks exceed level capacities "
                "— dropped (largest keys); raise block_caps",
                file=sys.stderr,
                flush=True,
            )
        return int(dropped_native)
    return fill_block_pyramid_numpy(
        pts, voxel_size, out, num_levels, warn_overflow,
        keys=keys, key_rows=key_rows,
    )


def fill_block_pyramid_numpy(
    points: np.ndarray,
    voxel_size: float,
    out: BlockPyramidDev,
    num_levels: int = 4,
    warn_overflow: bool = True,
    keys: np.ndarray | None = None,
    key_rows: np.ndarray | None = None,
) -> int:
    """Vectorized-numpy block-pyramid builder: the fallback + parity oracle
    for the C++ path (same drop-largest-keys overflow semantics)."""
    pts = np.ascontiguousarray(points, np.float32)
    to_voxel, rep, coords0 = voxelize_host(pts, voxel_size)
    if len(coords0) == 0:
        for l in range(num_levels):
            out.levels[l].occ_words[:] = 0
            out.levels[l].same_tbl[:] = -1
        for l in range(num_levels - 1):
            out.down_tbl[l][:] = -1
            out.up_tbl[l][:] = -1
        out.l0_coords[:] = 0
        out.origin[:] = 0
        if key_rows is not None:
            key_rows[:] = -1
        return 0
    origin = coords0.min(axis=0)
    units0 = coords0 - origin  # level-0 unit coords, non-negative

    caps = tuple(out.levels[l].occ_words.shape[0] for l in range(num_levels))
    dropped = 0

    # units can reach 1023 > 255, so level downsampling needs a wider pack
    def pack_units(u):
        return (
            (u[..., 0].astype(np.int64) << 20)
            | (u[..., 1].astype(np.int64) << 10)
            | u[..., 2].astype(np.int64)
        )

    def unpack_units(k):
        return np.stack(
            [(k >> 20) & 1023, (k >> 10) & 1023, k & 1023], axis=-1
        ).astype(np.int32)

    level_units = [units0]
    for l in range(1, num_levels):
        uk = np.unique(pack_units(level_units[-1] // 2))
        level_units.append(unpack_units(uk))

    block_keys = []  # kept (sorted) block keys per level
    block_coords = []
    for l in range(num_levels):
        u = level_units[l]
        bc = u // BLOCK
        ukeys = np.unique(_pack_blocks(bc))
        if len(ukeys) > caps[l]:
            dropped += len(ukeys) - caps[l]
            if warn_overflow:
                print(
                    f"[blockpyr] level {l}: {len(ukeys)} blocks exceed capacity "
                    f"{caps[l]} — dropping {len(ukeys) - caps[l]} "
                    "(largest keys); raise block_caps",
                    file=sys.stderr,
                    flush=True,
                )
            ukeys = ukeys[: caps[l]]
        n = len(ukeys)
        bcs = np.stack(
            [(ukeys >> 16) & 255, (ukeys >> 8) & 255, ukeys & 255], axis=-1
        ).astype(np.int32)
        block_keys.append(ukeys)
        block_coords.append(bcs)

        # cell occupancy
        occ = out.levels[l].occ_words
        occ[:] = 0
        row = _lookup_blocks(ukeys, bc)
        keep = row >= 0
        cell = u % BLOCK
        cidx = (cell[:, 0] * 16 + cell[:, 1] * 4 + cell[:, 2]).astype(np.int32)
        flat = row[keep] * 2 + (cidx[keep] >> 5)
        np.bitwise_or.at(
            occ.reshape(-1), flat, (np.uint32(1) << (cidx[keep] & 31)).astype(np.uint32)
        )

        # same-level block table: blocks at bc + delta
        q = bcs[:, None, :] + OFF3[None]
        tbl = _lookup_blocks(ukeys, q)
        out.levels[l].same_tbl[:n] = tbl.astype(np.int16)
        out.levels[l].same_tbl[n:] = -1

    for l in range(num_levels - 1):
        # down: dst blocks (level l+1) gather src blocks at 2B + delta
        q = 2 * block_coords[l + 1][:, None, :] + OFF3[None]
        tbl = _lookup_blocks(block_keys[l], q)
        nd = len(block_coords[l + 1])
        out.down_tbl[l][:nd] = tbl.astype(np.int16)
        out.down_tbl[l][nd:] = -1

        # up: fine blocks (level l) read the 3^3 coarse-unit region
        # w = 2b + (i,j,k); flat coarse cell row = blk*64 + cell
        w = 2 * block_coords[l][:, None, :] + REGION3[None]  # (Bf, 27, 3)
        cb = w // BLOCK
        cc = w % BLOCK
        crow = _lookup_blocks(block_keys[l + 1], cb)
        cell = cc[..., 0] * 16 + cc[..., 1] * 4 + cc[..., 2]
        flat = np.where(crow >= 0, crow * CELLS + cell, -1).astype(np.int32)
        nf = len(block_coords[l])
        out.up_tbl[l][:nf] = flat
        out.up_tbl[l][nf:] = -1

    out.l0_coords[: len(block_coords[0])] = block_coords[0].astype(np.int16)
    out.l0_coords[len(block_coords[0]):] = 0
    out.origin[:] = origin

    # keypoint -> flat level-0 cell row of the nearest surviving voxel's
    # representative point (host-side testset.py kNN)
    if keys is not None and key_rows is not None and len(keys):
        bc0 = units0 // BLOCK
        row0 = _lookup_blocks(block_keys[0], bc0)  # per-voxel block row
        cell0 = units0 % BLOCK
        cidx0 = (cell0[:, 0] * 16 + cell0[:, 1] * 4 + cell0[:, 2]).astype(np.int32)
        flat0 = np.where(row0 >= 0, row0 * CELLS + cidx0, -1)
        rep_pts = pts[rep]  # (n_vox, 3), aligned with flat0
        valid = flat0 >= 0
        vp = rep_pts[valid]
        vf = flat0[valid]
        ks = np.ascontiguousarray(keys, np.float32)
        # chunked brute force (the oracle path; C++ does ring search)
        for s in range(0, len(ks), 512):
            q = ks[s:s + 512]
            d = ((q[:, None] - vp[None]) ** 2).sum(-1)
            key_rows[s:s + 512] = vf[d.argmin(1)] if len(vp) else -1
    return dropped


def build_block_pyramid_host(
    points: np.ndarray,
    voxel_size: float,
    block_caps: tuple[int, ...],
    num_levels: int = 4,
) -> BlockPyramidDev:
    buf = alloc_block_buffers(block_caps, None, num_levels)
    fill_block_pyramid_host(points, voxel_size, buf, num_levels)
    return buf
