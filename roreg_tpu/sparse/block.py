"""Block-dense sparse convolution engine: the TPU-native backbone fast path.

Why this exists
---------------
The reference's MinkowskiEngine executes sparse convs as per-row
gather->GEMM->scatter with CUDA kernels (``src/convolution_kernel.cu``).
On TPU, fine-grained row gathers run ~50x under HBM bandwidth (measured
~16 GB/s effective), and the round-1 alternative — turning gathers into
one-hot matmuls over a sorted-row window — inflates MXU work by
``window / C_out`` (30-60x the true conv FLOPs at production shapes).
Neither is speed-of-light.

The TPU-native answer is to *coarsen the gather granularity*: partition
each level's voxels into 4x4x4 micro-blocks and store features dense per
block, ``(B, 64, C)``. Then

* every gather moves whole blocks (>= 1 KB contiguous rows -> full HBM
  bandwidth), driven by tiny ``(B, 27)`` block-level kernel maps;
* every conv becomes a dense 3-D convolution over a gathered 12^3
  "superblock" — one ``lax.conv_general_dilated`` per layer, lowered
  straight onto the MXU;
* compute inflation is only ``1/occupancy-within-block`` (~3-4x for
  surface scans at 4^3), paid at ~full MXU utilization instead of the
  gather path's ~2% effective bandwidth.

Geometry of the four conv types (level-l unit coords u = voxel // 2^l;
block coord b = u // 4; d ranges over the 3^3 offsets):

* same-level 3^3: out cell u in [4b, 4b+3], reads u+d in [4b-1, 4b+4]
  — inside the 12-unit superblock of blocks b+delta at local 4+u_loc+d.
* strided down conv (dst level l+1): dst unit w, src unit 2w+d; dst
  block covers src units [8B-1, 8B+7] — superblock of src blocks
  2B+delta, local 4+2w_loc+d: a stride-2 VALID conv.
* transposed up conv (dst level l, src l+1): out[u] = sum_d
  src[(u+d)/2] where u+d is even — exactly an lhs_dilation=2 conv over
  the 3^3-coarse-unit region w in [2b, 2b+2] (gathered per fine block
  through a flat (B_f, 27) coarse-cell table).
* first conv 7^3 over FCGF's constant ones input: a dense conv of the
  0/1 occupancy superblock (reads [4u-3, 4u+6] subset of the 12^3).

Replaces (TPU-natively, not a port): reference
``utils/MinkowskiEngine/src/convolution_kernel.cu:115-290``,
``convolution_transpose_gpu.cu``, and the coordinate-manager kernel maps
``src/coordinate_map_manager.cpp:1446`` (the block tables here are the
coarse-grained analog, built host-side in ``native/blockpyr.py``).

The flax module :class:`BlockResUNet` mirrors :class:`~roreg_tpu.sparse.
resunet.ResUNet`'s parameter tree exactly (same names, same kernel
layouts), so one set of trained variables drives both engines — training
uses the differentiable row-gather engine, inference this one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from roreg_tpu.sparse.conv import MaskedBatchNorm
from roreg_tpu.sparse.resunet import RESUNET_VARIANTS

__all__ = [
    "BlockLevelDev",
    "BlockPyramidDev",
    "unpack_cell_occupancy",
    "unpack_block_payload",
    "gather_superblock",
    "BlockResUNet",
    "block_cell_centers",
]

BLOCK = 4  # cells per axis; 64 cells per block
CELLS = BLOCK**3


class BlockLevelDev(NamedTuple):
    """One level's device-side block structure.

    occ_words: (Bcap, 2) uint32 — 64-bit cell occupancy, bit c of the
               row = cell c (c = cx*16 + cy*4 + cz, x-major). Pad blocks
               are all-zero.
    same_tbl:  (Bcap, 27) int — block row of neighbor block b+delta
               (hypercube order), -1 where absent.
    """

    occ_words: jnp.ndarray
    same_tbl: jnp.ndarray


class BlockPyramidDev(NamedTuple):
    """Device payload for one rotation's block pyramid (host-built maps).

    levels:    per-level BlockLevelDev, finest first.
    down_tbl:  (Bcap_{l+1}, 27) src-level block rows at 2*B+delta.
    up_tbl:    (Bcap_l, 27) flat coarse cell rows (= blk*64 + cell) of
               the 3^3 coarse-unit region [2b, 2b+2]; -1 absent.
    l0_coords: (Bcap_0, 3) int16 level-0 block coords.
    origin:    (3,) int32 integer voxel coords of the grid origin.

    Keypoint -> voxel association happens HOST-side (the C++ builder's
    key_rows output): keypoint features are ``feats[key_rows]``, so no
    representative points or kNN live on device at all.
    """

    levels: tuple
    down_tbl: tuple
    up_tbl: tuple
    l0_coords: jnp.ndarray
    origin: jnp.ndarray


def unpack_block_payload(
    payload: jnp.ndarray,
    block_caps: tuple[int, ...],
    batch: int | None = None,
    num_levels: int = 4,
) -> BlockPyramidDev:
    """Device-side inverse of ``native/blockpyr.alloc_block_buffers_packed``:
    slice + bitcast the single uint8 payload back into the typed tree.
    Pure shape bookkeeping — XLA folds it into the consumers."""
    from roreg_tpu.native.blockpyr import _tree_from_fields, payload_spec

    spec, total = payload_spec(block_caps, batch, num_levels)
    assert payload.shape[-1] == total, (payload.shape, total)
    fields = {}
    for name, shape, dt, off in spec:
        n = int(np.prod(shape))
        isz = dt.itemsize
        raw = jax.lax.slice_in_dim(payload, off, off + n * isz, axis=-1)
        if isz > 1:
            raw = jax.lax.bitcast_convert_type(
                raw.reshape(raw.shape[:-1] + (n, isz)), jnp.dtype(dt)
            )
        fields[name] = raw.reshape(payload.shape[:-1] + shape)
    return _tree_from_fields(fields, num_levels)


def unpack_cell_occupancy(words: jnp.ndarray) -> jnp.ndarray:
    """(B, 2) uint32 words -> (B, 64) bool cell mask."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(words.shape[0], 64).astype(bool)


def gather_superblock(feats: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, C) block features + (B, 27) block table -> (B, 12, 12, 12, C).

    The 27 gathered blocks (hypercube order: dx slowest) tile a 12-unit
    cube; missing blocks (-1) contribute zeros. This is the engine's ONLY
    data-dependent memory move — 27 contiguous (64*C)-row reads per
    block, full HBM bandwidth.
    """
    b = tbl.shape[0]
    c = feats.shape[-1]
    g = jnp.take(feats, jnp.clip(tbl, 0).astype(jnp.int32), axis=0)
    g = jnp.where((tbl >= 0)[..., None, None], g, jnp.zeros((), g.dtype))
    # (B, 3,3,3 blocks, 4,4,4 cells, C) -> interleave to (B, 12,12,12, C)
    g = g.reshape(b, 3, 3, 3, BLOCK, BLOCK, BLOCK, c)
    g = g.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return g.reshape(b, 12, 12, 12, c)


def _halo_maps(ksize: int, scale: int):
    """Static index maps for cell-level halo gathering + im2col.

    ksize: conv kernel size per axis (3 for same/down/up, up to 9 for conv1).
    scale: out-cell stride in halo units (1 same, 2 down).
    The halo spans ``scale*(BLOCK-1) + ksize`` units per axis, always
    within the 27-neighbor block table (requires ksize <= 9 at scale 1).

    Returns (koff (span^3,), cell (span^3,), q (64*ksize^3,)):
    * halo position p reads source cell ``cell[p]`` of neighbor block
      ``koff[p]`` (hypercube order);
    * im2col entry (out-cell u, offset o) reads halo position
      ``q[u*ksize^3 + o]`` — offsets row-major, dx slowest, matching the
      ``hypercube_offsets`` kernel layout.
    """
    pad = (ksize - 1) // 2
    span = scale * (BLOCK - 1) + ksize
    a = np.arange(span) - pad  # absolute unit position rel. block start
    d = np.floor_divide(a, BLOCK)  # neighbor block offset per axis (-1/0/1)
    assert d.min() >= -1 and d.max() <= 1, "kernel exceeds 27-neighbor halo"
    c = a - d * BLOCK
    dx, dy, dz = np.meshgrid(d, d, d, indexing="ij")
    cx, cy, cz = np.meshgrid(c, c, c, indexing="ij")
    koff = ((dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)).reshape(-1).astype(np.int32)
    cell = (cx * 16 + cy * 4 + cz).reshape(-1).astype(np.int32)

    u = np.arange(BLOCK)
    o = np.arange(ksize)
    ux, ox = np.meshgrid(u, o, indexing="ij")  # (4, ksize)
    h = scale * ux + ox  # halo coordinate per (u, o) per axis
    kv = ksize**3
    q = (
        h[:, None, None, :, None, None] * span * span
        + h[None, :, None, None, :, None] * span
        + h[None, None, :, None, None, :]
    )  # (4,4,4, k,k,k)
    q = q.reshape(CELLS, kv).reshape(-1)
    return koff, cell, q.astype(np.int32)


_SAME_KOFF, _SAME_CELL, _SAME_Q = _halo_maps(3, 1)
_DOWN_KOFF, _DOWN_CELL, _DOWN_Q = _halo_maps(3, 2)
_CONV1_MAPS: dict = {}


def _conv1_maps(ksize: int):
    if ksize not in _CONV1_MAPS:
        _CONV1_MAPS[ksize] = _halo_maps(ksize, 1)
    return _CONV1_MAPS[ksize]


def _up_maps():
    """Static im2col maps for the transposed conv: out cell u reads coarse
    region cell (u+d)/2 (row-major 3^3 region) when u+d is even per axis.

    Returns (ridx (64*27,), valid (64*27,)).
    """
    u = np.arange(BLOCK)
    d = np.arange(3) - 1
    uu, dd = np.meshgrid(u, d, indexing="ij")  # (4, 3)
    s = uu + dd
    ok = (s % 2 == 0) & (s >= 0)
    r = np.where(ok, s // 2, 0)
    # compose axes: cells x-major, offsets row-major dx slowest
    ridx = (
        r[:, None, None, :, None, None] * 9
        + r[None, :, None, None, :, None] * 3
        + r[None, None, :, None, None, :]
    ).reshape(CELLS, 27)
    valid = (
        ok[:, None, None, :, None, None]
        & ok[None, :, None, None, :, None]
        & ok[None, None, :, None, None, :]
    ).reshape(CELLS, 27)
    return ridx.reshape(-1).astype(np.int32), valid.reshape(-1)


_UP_RIDX, _UP_VALID = _up_maps()  # naive-form maps, kept as the oracle


def _up_parity_classes():
    """Per-parity-class static maps for the transposed conv.

    For a fixed out-cell parity (u mod 2 per axis), the valid kernel
    offsets are fixed: even axis -> d = 0 (1 tap), odd axis -> d = ±1
    (2 taps). Grouping the 64 cells into the 8 parity classes (8 cells
    each) shrinks the im2col from 27 to 1–8 taps per cell — 216 total
    entries instead of 1728, an 8x cut of the dominant HBM traffic of
    conv_up (measured 10.2 ms at the 832→2880-block level, ~3/4 of it
    moving zeros).

    Returns a list of 8 tuples (cells (8,), wrows (K_c,), ridx (8, K_c)):
    cells = x-major cell ids of the class, wrows = kernel-offset rows of
    w (row-major, dx slowest), ridx = coarse region cell per (cell, tap).
    """
    classes = []
    for px in range(2):
        for py in range(2):
            for pz in range(2):
                pars = (px, py, pz)
                axis_d = [
                    [0] if p == 0 else [-1, 1] for p in pars
                ]  # valid d per axis
                axis_u = [
                    [u for u in range(BLOCK) if u % 2 == p] for p in pars
                ]
                cells = [
                    ux * 16 + uy * 4 + uz
                    for ux in axis_u[0]
                    for uy in axis_u[1]
                    for uz in axis_u[2]
                ]
                wrows = [
                    (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)
                    for dx in axis_d[0]
                    for dy in axis_d[1]
                    for dz in axis_d[2]
                ]
                ridx = []
                for c in cells:
                    ux, uy, uz = c // 16, (c // 4) % 4, c % 4
                    row = []
                    for dx in axis_d[0]:
                        for dy in axis_d[1]:
                            for dz in axis_d[2]:
                                rx = (ux + dx) // 2
                                ry = (uy + dy) // 2
                                rz = (uz + dz) // 2
                                row.append(rx * 9 + ry * 3 + rz)
                    ridx.append(row)
                classes.append(
                    (
                        np.asarray(cells, np.int32),
                        np.asarray(wrows, np.int32),
                        np.asarray(ridx, np.int32),
                    )
                )
    return classes


_UP_CLASSES = _up_parity_classes()
# inverse permutation: class-concatenated cell order -> x-major cell order
_UP_CELL_INV = np.argsort(
    np.concatenate([c for c, _, _ in _UP_CLASSES])
).astype(np.int32)


def _halo_gather(feats: jnp.ndarray, tbl: jnp.ndarray, koff, cell):
    """(B, 64, C) + (B, 27) block table -> (B, span^3, C) halo cells.

    The ONLY dynamic gather of the same/down convs: span^3 cell rows per
    block (216/729) instead of the 27*64=1728 a full-superblock gather
    moves — 8x (2.4x) less gather traffic, the TPU's weak op.
    """
    c = feats.shape[-1]
    ko = jnp.asarray(koff)
    ce = jnp.asarray(cell)
    blk = tbl.astype(jnp.int32)[:, ko]  # (B, span^3) neighbor block row
    rows = blk * CELLS + ce[None, :]
    g = jnp.take(feats.reshape(-1, c), jnp.clip(rows, 0), axis=0)
    return jnp.where((blk >= 0)[..., None], g, jnp.zeros((), g.dtype))


def _halo_dense_conv(feats, tbl, w, cell_mask, koff, cell, span, stride,
                     compute_dtype):
    """Shared body of conv_same/conv_down: halo-cell gather -> dense 3-D
    VALID conv of the (B, span, span, span, Cin) halo on the MXU.

    Measured on the v5e (scripts/profile_conv_variants.py): the dense-conv
    formulation compiles in seconds and runs ~4x faster than 27 slice-GEMMs
    and ~10x faster than a giant static im2col take; XLA's conv lowering
    is only pathological at Cin=1 (conv1 avoids it, see conv1_occupancy).
    """
    cin, cout = w.shape[1], w.shape[2]
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        w = w.astype(compute_dtype)
    halo = _halo_gather(feats, tbl, koff, cell)  # (B, span^3, C)
    h = halo.reshape(-1, span, span, span, cin)
    out = jax.lax.conv_general_dilated(
        h,
        w.reshape(3, 3, 3, cin, cout),
        (stride, stride, stride),
        "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )  # (B, 4, 4, 4, Cout)
    out = out.reshape(-1, CELLS, cout)
    return jnp.where(cell_mask[..., None], out, 0.0)


def conv_same(feats, tbl, w, cell_mask, compute_dtype=None):
    """Same-level 3^3 conv. feats (B,64,Cin), w (27,Cin,Cout) -> (B,64,Cout).

    out[u] = sum_d feats[u + d] @ w[d] over existing cells (ME gather-GEMM
    semantics: missing voxels contribute zero rows, outputs only on the
    dst set — feats rows at unoccupied cells are kept zero upstream).
    """
    return _halo_dense_conv(
        feats, tbl, w, cell_mask, _SAME_KOFF, _SAME_CELL, 6, 1, compute_dtype
    )


def conv_down(feats_src, down_tbl, w, dst_cell_mask, compute_dtype=None):
    """Stride-2 conv level l -> l+1. out[w] = sum_d src[2w + d] @ w[d].
    Halo region is 9^3 src units from the blocks at 2B+delta; stride-2
    VALID conv of the 9^3 halo yields the 4^3 dst cells."""
    return _halo_dense_conv(
        feats_src, down_tbl, w, dst_cell_mask,
        _DOWN_KOFF, _DOWN_CELL, 9, 2, compute_dtype,
    )


def conv_up(feats_coarse, up_tbl, w, dst_cell_mask, compute_dtype=None):
    """Transposed conv level l+1 -> l (coordinate-inheritance semantics,
    reference ``src/convolution_transpose_gpu.cu``): out[u] = sum over d
    with u+d even of coarse[(u+d)/2] @ w[d].

    Executed as 8 parity-class im2col GEMMs (_up_parity_classes): each
    out-cell parity has a FIXED set of 1–8 valid kernel taps, so the
    im2col holds 216 entries per block instead of the naive 64x27 = 1728
    (three quarters of which are structural zeros) — an 8x cut of this
    op's HBM traffic, its measured bottleneck. conv_general_dilated with
    lhs_dilation would express the same op but compiles pathologically
    on the remote-compile path; matmuls are the fast lane."""
    bf = up_tbl.shape[0]
    cin, cout = w.shape[1], w.shape[2]
    if compute_dtype is not None:
        feats_coarse = feats_coarse.astype(compute_dtype)
        w = w.astype(compute_dtype)
    fc = feats_coarse.reshape(-1, cin)
    reg = jnp.take(fc, jnp.clip(up_tbl, 0).astype(jnp.int32), axis=0)
    reg = jnp.where((up_tbl >= 0)[..., None], reg, jnp.zeros((), reg.dtype))
    outs = []
    for cells, wrows, ridx in _UP_CLASSES:
        k = len(wrows)
        im = jnp.take(reg, jnp.asarray(ridx.reshape(-1)), axis=1)
        im = im.reshape(bf * len(cells), k * cin)
        wc = w[jnp.asarray(wrows)].reshape(k * cin, cout)
        o = jnp.dot(im, wc, preferred_element_type=jnp.float32)
        outs.append(o.reshape(bf, len(cells), cout))
    out = jnp.concatenate(outs, axis=1)[:, jnp.asarray(_UP_CELL_INV)]
    return jnp.where(dst_cell_mask[..., None], out, 0.0)


_CONV1_DENSE_MAPS: dict = {}


def _conv1_dense_map(ksize: int) -> np.ndarray:
    """Static tap map for the dense-GEMM conv1 lowering.

    Returns tapidx (27, 64, 64) int32: ``tapidx[n, c, u]`` is the kernel
    row of ``w`` connecting source cell ``c`` of neighbor block ``n``
    (hypercube order) to output cell ``u`` (x-major), or ``ksize**3``
    (a zero row) when the offset falls outside the kernel support. Each
    (n, c, u) has at most one tap: the absolute source position is
    unique per (n, c), so the offset u->source is unique.
    """
    if ksize not in _CONV1_DENSE_MAPS:
        koff, cell, _ = _conv1_maps(ksize)
        span = BLOCK - 1 + ksize
        kv = ksize**3
        tap = np.full((27, CELLS, CELLS), kv, np.int32)
        s = np.arange(span)
        hx, hy, hz = (m.reshape(-1) for m in np.meshgrid(s, s, s, indexing="ij"))
        for u_flat in range(CELLS):
            x, y, z = u_flat // 16, (u_flat // 4) % 4, u_flat % 4
            i, j, k = hx - x, hy - y, hz - z
            ok = (
                (i >= 0) & (i < ksize)
                & (j >= 0) & (j < ksize)
                & (k >= 0) & (k < ksize)
            )
            t = i * ksize * ksize + j * ksize + k
            tap[koff[ok], cell[ok], u_flat] = t[ok]
        _CONV1_DENSE_MAPS[ksize] = tap
    return _CONV1_DENSE_MAPS[ksize]


def conv1_occupancy(occ, tbl, w, cell_mask, kernel_size=7, compute_dtype=None):
    """First conv over FCGF's all-ones input: occupancy in, dense GEMM out
    (reference ``backbone/fcgf/misc.py:70`` feeds ones, so only neighbor
    existence matters). w (K^3, 1, Cout).

    Cin=1 + binary input makes both XLA's dense-conv lowering (~10 min
    compiles) and a (B*64, K^3) im2col (126 MB materialized at bench
    caps — measured 4.2 ms/rotation, gather-bound) pathological. The
    MXU-native formulation instead folds the static conv structure into
    the weights: a (27*64, 64*Cout) matrix M with
    ``M[n*64+c, u*Cout+o] = w[tap(n,c,u), o]`` (zero where no tap) turns
    the whole conv into the single GEMM ``nbr (B, 27*64) @ M`` over the
    already-gathered neighbor occupancy. 5x the im2col FLOPs but ~5x
    less HBM traffic — conv1 drops to ~1 ms/rotation composed (measured
    via scripts/experiment_fold_ceilings.py; ceiling was 2.46).
    """
    ks = kernel_size
    assert ks <= 9, "kernel must fit the 27-neighbor halo"
    b = tbl.shape[0]
    cout = w.shape[2]
    cd = compute_dtype or jnp.float32
    occ_f = occ.astype(cd)
    wq = w.reshape(ks**3, cout)
    if compute_dtype is not None:
        wq = wq.astype(compute_dtype)
    tap = jnp.asarray(_conv1_dense_map(ks).reshape(-1))
    w_pad = jnp.concatenate([wq, jnp.zeros((1, cout), wq.dtype)], axis=0)
    m = jnp.take(w_pad, tap, axis=0).reshape(27 * CELLS, CELLS * cout)
    nbr = jnp.take(occ_f, jnp.clip(tbl, 0).astype(jnp.int32), axis=0)
    nbr = jnp.where((tbl >= 0)[..., None], nbr, jnp.zeros((), nbr.dtype))
    out = jnp.dot(
        nbr.reshape(b, 27 * CELLS), m, preferred_element_type=jnp.float32
    )
    out = out.reshape(b, CELLS, cout)
    return jnp.where(cell_mask[..., None], out, 0.0)


def conv1_occupancy_im2col(occ, tbl, w, cell_mask, kernel_size=7,
                           compute_dtype=None):
    """Axis-factorized im2col lowering of conv1, kept as the oracle for
    the dense-GEMM path (tests/test_block.py) and for ablation.
    """
    ks = kernel_size
    assert ks <= 9, "kernel must fit the 27-neighbor halo"
    b = tbl.shape[0]
    cout = w.shape[2]
    cd = compute_dtype or jnp.float32
    occ_f = occ.astype(cd)
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
    koff, cell, _ = _conv1_maps(ks)
    span = BLOCK - 1 + ks
    # halo occupancy (B, span^3): whole-block gather (27 rows of 64) then
    # one span^3-entry static take
    nbr = jnp.take(occ_f, jnp.clip(tbl, 0).astype(jnp.int32), axis=0)
    nbr = jnp.where((tbl >= 0)[..., None], nbr, jnp.zeros((), nbr.dtype))
    hidx = jnp.asarray(koff * 64 + cell)
    halo = jnp.take(nbr.reshape(b, 27 * CELLS), hidx, axis=1)
    # axis-factorized im2col: (B, span,span,span) -> (B, 4K,4K,4K)
    u = np.arange(BLOCK)
    o = np.arange(ks)
    idx1 = jnp.asarray((u[:, None] + o[None, :]).reshape(-1))  # (4K,)
    h = halo.reshape(b, span, span, span)
    h = jnp.take(h, idx1, axis=1)
    h = jnp.take(h, idx1, axis=2)
    h = jnp.take(h, idx1, axis=3)
    h = h.reshape(b, BLOCK, ks, BLOCK, ks, BLOCK, ks)
    h = h.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b * CELLS, ks**3)
    out = jnp.dot(h, w.reshape(ks**3, cout), preferred_element_type=jnp.float32)
    out = out.reshape(b, CELLS, cout)
    return jnp.where(cell_mask[..., None], out, 0.0)


def block_cell_centers(
    l0_coords: jnp.ndarray,
    origin: jnp.ndarray,
    voxel_size: float,
) -> jnp.ndarray:
    """(Bcap*64, 3) f32 voxel-center points of every level-0 cell (debug /
    visualization helper; keypoint association itself is host-side)."""
    bcap = l0_coords.shape[0]
    cell = jnp.arange(CELLS, dtype=jnp.int32)
    cell_off = jnp.stack([cell // 16, (cell // 4) % 4, cell % 4], axis=-1)
    units = l0_coords.astype(jnp.int32)[:, None, :] * BLOCK + cell_off[None]
    p = (
        units.astype(jnp.float32) + origin.astype(jnp.float32)[None, None] + 0.5
    ) * voxel_size
    return p.reshape(bcap * CELLS, 3)


class _BlockConv(nn.Module):
    """Param-compatible shell for SparseConv: param 'kernel' (27, Cin, Cout);
    `kind` picks the conv geometry."""

    out_channels: int
    kind: str  # "same" | "down" | "up"
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, feats, tbl, cell_mask):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (27, cin, self.out_channels),
        )
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        fn = {"same": conv_same, "down": conv_down, "up": conv_up}[self.kind]
        return fn(feats, tbl, w, cell_mask, compute_dtype=cd)


class _BlockBasicBlock(nn.Module):
    """Pre-norm residual block, parameter tree == resunet.BasicBlock."""

    channels: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, tbl, cell_mask, train: bool):
        y = _BlockConv(self.channels, "same", self.compute_dtype, name="conv1")(
            x, tbl, cell_mask
        )
        y = MaskedBatchNorm(name="norm1")(y, cell_mask, use_running_average=not train)
        y = nn.relu(y)
        y = _BlockConv(self.channels, "same", self.compute_dtype, name="conv2")(
            y, tbl, cell_mask
        )
        y = MaskedBatchNorm(name="norm2")(y, cell_mask, use_running_average=not train)
        y = nn.relu(y + x)
        return jnp.where(cell_mask[..., None], y, 0.0)


class _Conv1Occ(nn.Module):
    """Param-compatible shell for OccupancyConv ('kernel' (K^3, 1, Cout))."""

    out_channels: int
    kernel_size: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, occ, tbl, cell_mask):
        kv = self.kernel_size**3
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (kv, 1, self.out_channels),
        )
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        return conv1_occupancy(
            occ, tbl, w, cell_mask, kernel_size=self.kernel_size, compute_dtype=cd
        )


class BlockResUNet(nn.Module):
    """FCGF ResUNet on the block-dense engine.

    Identical parameter tree to :class:`roreg_tpu.sparse.resunet.ResUNet`
    (verified by ``tests/test_block.py``): variables trained with the
    row-gather engine drive this module unchanged. Features flow as
    (Bcap_l, 64, C); returns (Bcap_0 * 64, out_channels) L2-normalized
    rows (zero at unoccupied cells), aligned with
    the host-resolved keypoint cell rows for keypoint lookup.
    """

    variant: str = "ResUNetBN2C"
    out_channels: int = 32
    conv1_kernel_size: int = 7
    normalize_feature: bool = True
    bn_momentum: float = 0.05
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, pyr: BlockPyramidDev, train: bool = False):
        ch, tr, _ = RESUNET_VARIANTS[self.variant]
        occs = [unpack_cell_occupancy(lvl.occ_words) for lvl in pyr.levels]
        cd = self.compute_dtype

        def bn(name):
            return MaskedBatchNorm(momentum=self.bn_momentum, name=name)

        x = _Conv1Occ(ch[0], self.conv1_kernel_size, cd, name="conv1")(
            occs[0], pyr.levels[0].same_tbl, occs[0]
        )
        x = bn("norm1")(x, occs[0], use_running_average=not train)
        out_s1 = _BlockBasicBlock(ch[0], cd, name="block1")(
            x, pyr.levels[0].same_tbl, occs[0], train
        )
        x = nn.relu(out_s1)

        x = _BlockConv(ch[1], "down", cd, name="conv2")(x, pyr.down_tbl[0], occs[1])
        x = bn("norm2")(x, occs[1], use_running_average=not train)
        out_s2 = _BlockBasicBlock(ch[1], cd, name="block2")(
            x, pyr.levels[1].same_tbl, occs[1], train
        )
        x = nn.relu(out_s2)

        x = _BlockConv(ch[2], "down", cd, name="conv3")(x, pyr.down_tbl[1], occs[2])
        x = bn("norm3")(x, occs[2], use_running_average=not train)
        out_s4 = _BlockBasicBlock(ch[2], cd, name="block3")(
            x, pyr.levels[2].same_tbl, occs[2], train
        )
        x = nn.relu(out_s4)

        x = _BlockConv(ch[3], "down", cd, name="conv4")(x, pyr.down_tbl[2], occs[3])
        x = bn("norm4")(x, occs[3], use_running_average=not train)
        out_s8 = _BlockBasicBlock(ch[3], cd, name="block4")(
            x, pyr.levels[3].same_tbl, occs[3], train
        )
        x = nn.relu(out_s8)

        x = _BlockConv(tr[3], "up", cd, name="conv4_tr")(x, pyr.up_tbl[2], occs[2])
        x = bn("norm4_tr")(x, occs[2], use_running_average=not train)
        x = _BlockBasicBlock(tr[3], cd, name="block4_tr")(
            x, pyr.levels[2].same_tbl, occs[2], train
        )
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s4], axis=-1)
        x = _BlockConv(tr[2], "up", cd, name="conv3_tr")(x, pyr.up_tbl[1], occs[1])
        x = bn("norm3_tr")(x, occs[1], use_running_average=not train)
        x = _BlockBasicBlock(tr[2], cd, name="block3_tr")(
            x, pyr.levels[1].same_tbl, occs[1], train
        )
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s2], axis=-1)
        x = _BlockConv(tr[1], "up", cd, name="conv2_tr")(x, pyr.up_tbl[0], occs[0])
        x = bn("norm2_tr")(x, occs[0], use_running_average=not train)
        x = _BlockBasicBlock(tr[1], cd, name="block2_tr")(
            x, pyr.levels[0].same_tbl, occs[0], train
        )
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s1], axis=-1)
        x = nn.relu(nn.Dense(tr[0], use_bias=False, name="conv1_tr")(x))
        x = nn.Dense(self.out_channels, use_bias=True, name="final")(x)

        if self.normalize_feature:
            x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        x = jnp.where(occs[0][..., None], x, 0.0)
        return x.reshape(-1, self.out_channels)
