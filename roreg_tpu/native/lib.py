"""ctypes bindings + lazy build for the native host library.

The C++ side (voxelhash.cpp) is the analog of MinkowskiEngine's host
coordinate engine for our data pipeline; this module compiles it on first
use (g++ available in the image) and exposes numpy-typed wrappers. All
entry points degrade to numpy fallbacks when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "native_available",
    "voxelize_host",
    "voxel_nn_host",
    "mutual_pairs_host",
    "build_block_pyramid_native",
]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "voxelhash.cpp")
_SO = os.path.join(_HERE, "_voxelhash.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.voxelize_hash.restype = ctypes.c_int64
        lib.voxelize_hash.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, i32p, i32p, i32p,
        ]
        lib.voxel_nn.restype = None
        lib.voxel_nn.argtypes = [
            f32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_float,
            f32p, ctypes.c_int64, ctypes.c_float, i32p,
        ]
        lib.mutual_pairs.restype = ctypes.c_int64
        lib.mutual_pairs.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float, i32p,
        ]
        lib.unique_snapped.restype = ctypes.c_int64
        lib.unique_snapped.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32, i32p,
        ]
        lib.neighbor_table.restype = None
        lib.neighbor_table.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_int32, i32p,
        ]
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        lib.neighbor_table16.restype = None
        lib.neighbor_table16.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_int32, i16p,
        ]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.neighbor_occupancy.restype = None
        lib.neighbor_occupancy.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_int32, u32p,
        ]
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i16p_w = np.ctypeslib.ndpointer(np.int16, flags=("C_CONTIGUOUS", "WRITEABLE"))
        lib.build_block_pyramid.restype = ctypes.c_int64
        lib.build_block_pyramid.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, i64p, ctypes.c_int64,
            u32p, u32p, u32p, u32p,
            i16p_w, i16p_w, i16p_w, i16p_w,
            i16p_w, i16p_w, i16p_w,
            i32p, i32p, i32p,
            i16p_w, i32p,
            f32p, ctypes.c_int64, i32p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def voxelize_host(points: np.ndarray, voxel_size: float):
    """-> (to_voxel (n,), rep_index (n_vox,), vox_coords (n_vox, 3)).

    First-appearance ordering, matching ME sparse_quantize(return_index)
    semantics (backbone/fcgf/misc.py:87)."""
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    lib = _load()
    if lib is None:  # numpy fallback
        coords = np.floor(pts / voxel_size).astype(np.int32)
        _, first, inv = np.unique(
            coords, axis=0, return_index=True, return_inverse=True
        )
        order = np.argsort(first)
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        to_voxel = rank[inv].astype(np.int32)
        rep = first[order].astype(np.int32)
        return to_voxel, rep, coords[rep]
    to_voxel = np.empty(n, np.int32)
    rep = np.empty(n, np.int32)
    vc = np.empty((n, 3), np.int32)
    nv = lib.voxelize_hash(pts, n, voxel_size, to_voxel, rep, vc)
    return to_voxel, rep[:nv].copy(), vc[:nv].copy()


def voxel_nn_host(
    points: np.ndarray,
    to_voxel: np.ndarray,
    vox_coords: np.ndarray,
    voxel_size: float,
    queries: np.ndarray,
    radius: float,
) -> np.ndarray:
    """Nearest point index within radius for each query (-1 if none)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    qs = np.ascontiguousarray(queries, np.float32)
    if lib is None:
        d = ((qs[:, None] - pts[None]) ** 2).sum(-1)
        idx = d.argmin(1)
        best = d[np.arange(len(qs)), idx]
        return np.where(best < radius * radius, idx, -1).astype(np.int32)
    out = np.empty(len(qs), np.int32)
    lib.voxel_nn(
        pts, np.ascontiguousarray(to_voxel, np.int32), len(pts),
        np.ascontiguousarray(vox_coords, np.int32), len(vox_coords),
        voxel_size, qs, len(qs), radius, out,
    )
    return out


def unique_snapped_host(coords: np.ndarray, stride: int) -> np.ndarray:
    """Snap int coords to multiples of stride, dedupe (first appearance)."""
    c = np.ascontiguousarray(coords, np.int32)
    lib = _load()
    if lib is None:
        snapped = np.floor_divide(c, stride) * stride
        _, first = np.unique(snapped, axis=0, return_index=True)
        return snapped[np.sort(first)]
    out = np.empty_like(c)
    n = lib.unique_snapped(c, len(c), stride, out)
    return out[:n].copy()


def neighbor_table_host(
    src_coords: np.ndarray,
    dst_coords: np.ndarray,
    offsets: np.ndarray,
    step: int,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """(n_dst, K) gather table into src rows; -1 where absent.

    Pass a preallocated ``out`` with >= n_dst rows (extra rows must already
    be -1) to skip the padding copy — the hot path for pyramid builds."""
    sc = np.ascontiguousarray(src_coords, np.int32)
    dc = np.ascontiguousarray(dst_coords, np.int32)
    off = np.ascontiguousarray(offsets, np.int32)
    lib = _load()
    if lib is None:
        lut = {tuple(c): i for i, c in enumerate(sc)}
        res = np.full((len(dc), len(off)), -1, np.int32)
        for d in range(len(dc)):
            for j, o in enumerate(off):
                res[d, j] = lut.get(tuple(dc[d] + o * step), -1)
        if out is None:
            return res
        out[: len(dc)] = res
        return out
    if out is None:
        out = np.empty((len(dc), len(off)), np.int32)
    if out.dtype == np.int16:
        lib.neighbor_table16(sc, len(sc), dc, len(dc), off, len(off), step, out)
    else:
        lib.neighbor_table(sc, len(sc), dc, len(dc), off, len(off), step, out)
    return out


def neighbor_occupancy_host(
    src_coords: np.ndarray,
    dst_coords: np.ndarray,
    offsets: np.ndarray,
    step: int,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """(n_dst, ceil(K/32)) packed uint32 occupancy words: bit j of word w is
    set iff dst + offsets[32*w + j]*step exists in src. Rows beyond n_dst in
    a preallocated ``out`` are left untouched (mask conv outputs downstream).
    """
    sc = np.ascontiguousarray(src_coords, np.int32)
    dc = np.ascontiguousarray(dst_coords, np.int32)
    off = np.ascontiguousarray(offsets, np.int32)
    k = len(off)
    words = (k + 31) // 32
    lib = _load()
    if lib is None:  # numpy fallback via the table path
        tbl = neighbor_table_host(sc, dc, off, step)
        occ = (tbl >= 0).astype(np.uint8)
        occ = np.pad(occ, ((0, 0), (0, words * 32 - k)))
        packed = np.packbits(occ, axis=1, bitorder="little")
        res = packed.view(np.uint32) if packed.size else packed.astype(np.uint32).reshape(len(dc), words)
        res = res.reshape(len(dc), words)
        if out is None:
            return res
        out[: len(dc)] = res
        return out
    if out is None:
        out = np.zeros((len(dc), words), np.uint32)
    lib.neighbor_occupancy(sc, len(sc), dc, len(dc), off, k, step, out)
    return out


def mutual_pairs_host(
    keys0_t: np.ndarray, keys1: np.ndarray, thre: float
) -> np.ndarray:
    """Mutual-NN gt pairing (RM.py pairmatch): keys0_t already transformed
    into keys1's frame. -> (P, 2) int32 pairs."""
    lib = _load()
    k0 = np.ascontiguousarray(keys0_t, np.float32)
    k1 = np.ascontiguousarray(keys1, np.float32)
    if lib is None:
        d = np.sqrt(((k0[:, None] - k1[None]) ** 2).sum(-1))
        a01 = d.argmin(1)
        a10 = d.argmin(0)
        ii = np.arange(len(k0))
        ok = (a10[a01] == ii) & (d[ii, a01] < thre)
        return np.stack([ii[ok], a01[ok]], -1).astype(np.int32)
    out = np.empty((len(k0), 2), np.int32)
    np_ = lib.mutual_pairs(k0, len(k0), k1, len(k1), thre, out)
    return out[:np_].copy()


def build_block_pyramid_native(
    points, voxel_size, out, num_levels=4, keys=None, key_rows=None
):
    """Fill a preallocated BlockPyramidDev (numpy views, one batch slot)
    entirely in C++ (one GIL-free call), optionally also resolving
    keypoints to flat level-0 cell rows (the host-side testset.py kNN).
    Returns dropped block count, or None when the native library is
    unavailable (caller falls back to the numpy builder in
    native/blockpyr.py)."""
    lib = _load()
    if lib is None or num_levels != 4:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    caps = np.asarray(
        [out.levels[l].occ_words.shape[0] for l in range(4)], np.int64
    )
    if keys is None:
        keys = np.empty((0, 3), np.float32)
    keys = np.ascontiguousarray(keys, np.float32)
    if key_rows is None:
        key_rows = np.empty(len(keys), np.int32)
    return lib.build_block_pyramid(
        pts, len(pts), voxel_size, caps, 4,
        out.levels[0].occ_words, out.levels[1].occ_words,
        out.levels[2].occ_words, out.levels[3].occ_words,
        out.levels[0].same_tbl, out.levels[1].same_tbl,
        out.levels[2].same_tbl, out.levels[3].same_tbl,
        out.down_tbl[0], out.down_tbl[1], out.down_tbl[2],
        out.up_tbl[0], out.up_tbl[1], out.up_tbl[2],
        out.l0_coords, out.origin,
        keys, len(keys), key_rows,
    )
