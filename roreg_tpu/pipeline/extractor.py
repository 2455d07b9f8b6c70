"""Backbone group-feature extraction: 60 rotations folded into one jit.

The reference streams the 60 group rotations of every cloud through a torch
DataLoader as independent jobs (testset.py:28-55, batch_size=4 of the 60,
16 worker processes) and glues results through .npy files. Here the whole
thing is one jitted function: rotate coords once, ``lax.map`` over rotation
chunks (each chunk: voxelize -> pyramid -> ResUNet -> keypoint kNN), emit
the (num_keypoints, G, 32) group feature on device. No disk, no host hops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roreg_tpu.core.group import get_group
from roreg_tpu.core.knn import nn as knn_nn
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.sparse.kernel_map import build_pyramid
from roreg_tpu.sparse.resunet import ResUNet

__all__ = [
    "make_backbone",
    "extract",
    "extract_group_features",
    "extract_group_features_hostmaps",
    "build_cloud_payloads",
    "dispatch_cloud_payloads",
]


def extract(backbone_variables, points, point_mask, keypoints, cfg):
    """Dispatch: block engine (production), host-map gather path, or the
    all-device path (jit-only contexts like the multichip dry run)."""
    if cfg.engine == "block" or cfg.host_maps:
        import numpy as np

        pts = np.asarray(points)
        if point_mask is not None:
            pts = pts[np.asarray(point_mask)]
        if cfg.engine == "block":
            return extract_group_features_blocks(
                backbone_variables, pts, np.asarray(keypoints), cfg
            )
        return extract_group_features_hostmaps(
            backbone_variables, pts, np.asarray(keypoints), cfg
        )
    return extract_group_features(
        backbone_variables, points, point_mask, keypoints, cfg
    )


def _effective_chunk(g: int, requested: int) -> int:
    """Largest divisor of the group size not exceeding the requested chunk."""
    c = min(requested, g)
    while g % c:
        c -= 1
    return c


def make_backbone(cfg: PipelineConfig):
    """FCGF model zoo dispatch (reference backbone/fcgf/__init__.py:16-30
    load_model): ResUNet{BN,IN}2* and SimpleNet* families by name."""
    from roreg_tpu.sparse.resunet import SIMPLENET_VARIANTS, SimpleNet

    if cfg.backbone_variant in SIMPLENET_VARIANTS:
        return SimpleNet(
            variant=cfg.backbone_variant,
            in_channels=1,
            out_channels=32,
            conv1_kernel_size=cfg.conv1_kernel_size,
            compute_dtype=cfg.backbone_compute_dtype,
        )
    return ResUNet(
        variant=cfg.backbone_variant,
        in_channels=1,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
        compute_dtype=cfg.backbone_compute_dtype,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_group_features(
    backbone_variables,
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    keypoints: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """(N, 3) cloud + (K, 3) keypoints -> (K, G, 32) backbone group features.

    Mirrors testset.py's Feature_extracting: for each group rotation g,
    voxelize R_g·points, run FCGF, then for each rotated keypoint take the
    feature of its nearest voxel representative point (knn at
    testset.py:168-171).
    """
    group = get_group(cfg.group_size)
    rots = jnp.asarray(group.rotations, dtype=points.dtype)  # (G, 3, 3)
    backbone = make_backbone(cfg)

    g = cfg.group_size
    chunk = _effective_chunk(g, cfg.group_chunk)
    rot_chunks = rots.reshape(g // chunk, chunk, 3, 3)

    def one_rotation(R):
        pts_r = points @ R.T
        pyr = build_pyramid(
            pts_r,
            point_mask,
            cfg.voxel_size,
            cfg.capacities,
            conv1_kernel_size=cfg.conv1_kernel_size,
        )
        feats_in = jnp.ones((cfg.capacities[0], 1), dtype=jnp.float32)
        feats = backbone.apply(backbone_variables, feats_in, pyr, False)
        keys_r = keypoints @ R.T
        _, idx = knn_nn(keys_r, pyr.grid.rep_point, ref_mask=pyr.grid.mask)
        return feats[idx]  # (K, 32)

    def one_chunk(Rs):
        return jax.vmap(one_rotation)(Rs)  # (chunk, K, 32)

    out = jax.lax.map(one_chunk, rot_chunks)  # (g/chunk, chunk, K, 32)
    out = out.reshape(g, keypoints.shape[0], 32)
    return jnp.transpose(out, (1, 0, 2))  # (K, G, 32)


@functools.partial(jax.jit, static_argnames=("cfg", "window"))
def _backbone_chunk(
    backbone_variables,
    pyr_stack,
    keys_rot: jnp.ndarray,
    cfg: PipelineConfig,
    window: int | None = None,
) -> jnp.ndarray:
    """Jitted per-chunk forward: vmap the backbone + keypoint kNN over a
    stacked chunk of host-built pyramids. keys_rot (chunk, K, 3).

    ``window`` selects the Pallas windowed-gather convs (TPU fast path);
    the host extractor passes it only after verifying the chunk's tables
    satisfy the locality bound (max_tile_spread + tile <= window).
    """
    backbone = ResUNet(
        variant=cfg.backbone_variant,
        in_channels=1,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
        compute_dtype=cfg.backbone_compute_dtype,
        conv_window=window,
    )
    feats_in = jnp.ones((cfg.capacities[0], 1), dtype=jnp.float32)

    def one(pyr, keys_r):
        feats = backbone.apply(backbone_variables, feats_in, pyr, False)
        _, idx = knn_nn(keys_r, pyr.grid.rep_point, ref_mask=pyr.grid.mask)
        return feats[idx]

    return jax.vmap(one)(pyr_stack, keys_rot)  # (chunk, K, 32)


def extract_group_features_hostmaps(
    backbone_variables,
    points,
    keypoints,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Production extractor: host (C++) coordinate/kernel-map construction,
    device conv compute. Same semantics as :func:`extract_group_features`
    (testset.py parity) at a fraction of the compile and map-build cost —
    the MinkowskiEngine split (host CoordinateMapManager, device GEMMs),
    done TPU-style. points/keypoints are host numpy arrays.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from roreg_tpu.native.pyramid import (
        alloc_pyramid_buffers,
        fill_pyramid_host,
        tree_slice,
    )

    group = get_group(cfg.group_size)
    rots = group.rotations.astype(np.float32)
    g = cfg.group_size
    chunk = _effective_chunk(g, cfg.group_chunk)

    pts = np.ascontiguousarray(points, np.float32)
    kps = np.ascontiguousarray(keypoints, np.float32)

    # double-buffered preallocated chunk pyramids: build chunk i+1 on host
    # threads (ctypes releases the GIL) while the device runs chunk i
    bufs = [
        alloc_pyramid_buffers(cfg.capacities, cfg.conv1_kernel_size, chunk)
        for _ in range(2)
    ]
    keys_bufs = [np.empty((chunk, kps.shape[0], 3), np.float32) for _ in range(2)]
    pool = ThreadPoolExecutor(max_workers=2)

    # the Pallas windowed convs require TPU (interpret-only elsewhere) and
    # per-chunk proof that every table respects the locality bound
    want_window = cfg.conv_window if jax.devices()[0].platform.startswith(
        "tpu"
    ) else None

    def chunk_window_ok(buf) -> bool:
        if want_window is None:
            return False
        from roreg_tpu.sparse.window_conv import max_tile_spread

        tables = list(buf.same) + list(buf.down) + list(buf.up)
        bound = want_window - 136  # tile(128) + sublane alignment slack(8)
        ok = all(max_tile_spread(np.asarray(t).reshape(-1, t.shape[-1]))
                 <= bound for t in tables)
        if not ok:
            import sys

            print(
                "[extract] chunk exceeds window locality bound -> gather path",
                file=sys.stderr, flush=True,
            )
        return ok

    def build_chunk(c0, slot):
        buf, kb = bufs[slot], keys_bufs[slot]

        def one(gi):
            R = rots[c0 + gi]
            fill_pyramid_host(
                pts @ R.T, cfg.voxel_size, tree_slice(buf, gi),
                conv1_kernel_size=cfg.conv1_kernel_size,
            )
            kb[gi] = kps @ R.T

        list(pool.map(one, range(chunk)))
        return buf, kb, chunk_window_ok(buf)

    outs = []
    n_chunks = g // chunk
    pending = build_chunk(0, 0)
    for ci in range(n_chunks):
        buf, kb, win_ok = pending
        # jnp.array(copy=True): jnp.asarray may ALIAS the numpy buffer
        # (zero-copy on the CPU backend), and the double-buffered slot is
        # refilled while the device still reads it — explicit copies keep
        # the in-flight data immutable
        dev_pyr = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), buf)
        dev_keys = jnp.array(kb, copy=True)
        out = _backbone_chunk(
            backbone_variables, dev_pyr, dev_keys, cfg,
            window=want_window if win_ok else None,
        )
        if ci + 1 < n_chunks:
            pending = build_chunk((ci + 1) * chunk, (ci + 1) % 2)
        outs.append(out)
    pool.shutdown(wait=False)
    out = jnp.concatenate(outs, axis=0)  # (G, K, 32)
    return jnp.transpose(out, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("cfg", "chunk", "caps"))
def _backbone_chunk_blocks(
    backbone_variables,
    payload: jnp.ndarray,
    key_rows: jnp.ndarray,
    cfg: PipelineConfig,
    chunk: int,
    caps: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """Jitted per-chunk forward on the block-dense engine: unpack the
    uint8 payload into ``chunk`` rotations' block pyramids, run the
    BlockResUNet per rotation, read keypoint features at the host-resolved
    flat cell rows. key_rows (chunk, K) int32 -> (chunk, K, 32).

    Chunk-sized programs (group_chunk rotations per dispatch) are XLA's
    sweet spot for this network: a lax.map over all 60 rotations in one
    program was measured to compile pathologically (>45 min vs ~8 min
    for the chunk program). The extractor feeds this from DEVICE-side
    slices of one whole-cloud payload, so chunking costs no extra
    host->device transfers or host synchronization.

    ``caps`` overrides cfg.block_caps (the overflow-fallback program runs
    the same network at larger capacities)."""
    from roreg_tpu.sparse.block import BlockResUNet, unpack_block_payload

    net = BlockResUNet(
        variant=cfg.backbone_variant,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
        compute_dtype=cfg.backbone_compute_dtype,
    )
    bpyr_stack = unpack_block_payload(
        payload, caps if caps is not None else cfg.block_caps, chunk
    )

    def one(args):
        bp, rows = args
        feats = net.apply(backbone_variables, bp, False)  # (Bcap0*64, 32)
        f = feats[jnp.clip(rows, 0)]
        return jnp.where((rows >= 0)[:, None], f, 0.0)

    rb = cfg.rot_vmap
    if rb <= 1 or chunk % rb:
        # sequential over the chunk's rotations
        return jax.lax.map(one, (bpyr_stack, key_rows))
    # batch rot_vmap rotations through every stage: amortizes the
    # per-kernel overheads that dominate this engine (see cfg.rot_vmap)
    grouped = jax.tree_util.tree_map(
        lambda x: x.reshape((chunk // rb, rb) + x.shape[1:]),
        (bpyr_stack, key_rows),
    )
    out = jax.lax.map(lambda args: jax.vmap(one)(args), grouped)
    return out.reshape((chunk,) + out.shape[2:])


_BUILD_POOL = None
# (device_array, host_buffer) pairs whose async host->device transfer may
# still be reading the host buffer; retired once the transfer lands.
# Guarded by _INFLIGHT_LOCK: describe() may be called from caller-side
# threads (pipelined clouds).
_INFLIGHT: list = []
import threading as _threading

_INFLIGHT_LOCK = _threading.Lock()


def _build_pool():
    global _BUILD_POOL
    if _BUILD_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _BUILD_POOL = ThreadPoolExecutor(max_workers=4)
    return _BUILD_POOL


def _put_async(host_arr):
    """Async host->device put that keeps the host buffer alive (and
    un-reused) until the transfer completes."""
    global _INFLIGHT
    dev = jax.device_put(host_arr)
    with _INFLIGHT_LOCK:
        _INFLIGHT = [(d, h) for (d, h) in _INFLIGHT if not d.is_ready()]
        _INFLIGHT.append((dev, host_arr))
    return dev


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk", "caps")
)
def _backbone_chunk_blocks_rows(
    backbone_variables,
    payload_rows: jnp.ndarray,
    key_rows: jnp.ndarray,
    ci: jnp.ndarray,
    cfg: PipelineConfig,
    chunk: int,
    caps: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """Chunk program over a whole-cloud payload stored as CHUNK ROWS:
    ``payload_rows`` (n_chunks, chunk_bytes) packs all rotations' block
    pyramids (ONE host->device put per cloud — resilient to
    high-dispatch-latency device links); ``ci`` is the TRACED chunk
    index, so one compiled program serves every chunk. The program first
    dynamic-indexes its row, then unpacks exactly like the per-chunk
    payload program — the batch=60 whole-cloud unpack variant was
    measured to compile pathologically (>20 min vs ~7)."""
    from roreg_tpu.sparse.block import BlockResUNet, unpack_block_payload

    net = BlockResUNet(
        variant=cfg.backbone_variant,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
        compute_dtype=cfg.backbone_compute_dtype,
    )
    payload = jax.lax.dynamic_index_in_dim(
        payload_rows, ci, axis=0, keepdims=False
    )
    rows_stack = jax.lax.dynamic_index_in_dim(
        key_rows, ci, axis=0, keepdims=False
    )
    bpyr_stack = unpack_block_payload(
        payload, caps if caps is not None else cfg.block_caps, chunk
    )

    def one(args):
        bp, rows = args
        feats = net.apply(backbone_variables, bp, False)  # (Bcap0*64, 32)
        f = feats[jnp.clip(rows, 0)]
        return jnp.where((rows >= 0)[:, None], f, 0.0)

    rb = cfg.rot_vmap
    if rb <= 1 or chunk % rb:
        return jax.lax.map(one, (bpyr_stack, rows_stack))
    grouped = jax.tree_util.tree_map(
        lambda x: x.reshape((chunk // rb, rb) + x.shape[1:]),
        (bpyr_stack, rows_stack),
    )
    out = jax.lax.map(lambda args: jax.vmap(one)(args), grouped)
    return out.reshape((chunk,) + out.shape[2:])


def build_cloud_payloads(points, keypoints, cfg: PipelineConfig, pool=None):
    """Host-only half of the block-engine extractor: build ALL g rotations'
    block tables + occupancy words (~1 MB/rotation, GIL-free C++ on a
    thread pool) into ONE whole-cloud packed payload, with the loud
    overflow->fallback-capacity rebuild. Returns
    ``(payload (n_chunks, chunk_bytes) uint8, key_rows (n_chunks, chunk,
    K) int32, caps)`` ready for :func:`dispatch_cloud_payloads`.

    Exposed separately so callers that amortize descriptor work (the
    reference amortizes it from disk caches, testset.py once per cloud)
    can run host table building off the device-critical path.
    """
    import numpy as np

    from roreg_tpu.native.blockpyr import (
        alloc_block_buffers_packed_rows,
        block_tree_slice,
        fill_block_pyramid_host,
    )

    group = get_group(cfg.group_size)
    rots = group.rotations.astype(np.float32)
    g = cfg.group_size
    chunk = _effective_chunk(g, cfg.group_chunk)
    n_chunks = g // chunk

    pts = np.ascontiguousarray(points, np.float32)
    kps = np.ascontiguousarray(keypoints, np.float32)
    if pool is None:
        pool = _build_pool()

    def build_cloud(caps):
        payload, trees = alloc_block_buffers_packed_rows(caps, chunk, n_chunks)
        kb = np.empty((n_chunks, chunk, kps.shape[0]), np.int32)

        def one(gi):
            ci, gj = divmod(gi, chunk)
            R = rots[gi]
            return fill_block_pyramid_host(
                pts @ R.T, cfg.voxel_size, block_tree_slice(trees[ci], gj),
                keys=kps @ R.T, key_rows=kb[ci, gj],
            )

        dropped = sum(pool.map(one, range(g)))
        return payload, kb, dropped

    caps = cfg.block_caps
    payload, kb, dropped = build_cloud(caps)
    if dropped and cfg.block_caps_fallback is not None:
        import sys

        print(
            f"[extract] cloud overflows block_caps {cfg.block_caps} "
            f"({dropped} blocks) -> rebuilding at fallback "
            f"{cfg.block_caps_fallback}",
            file=sys.stderr, flush=True,
        )
        caps = cfg.block_caps_fallback
        payload, kb, dropped = build_cloud(caps)
        if dropped:
            print(
                f"[extract] fallback capacities ALSO overflow "
                f"({dropped} blocks dropped) — results degrade",
                file=sys.stderr, flush=True,
            )
    return payload, kb, caps


def dispatch_cloud_payloads(
    backbone_variables, payload, key_rows, caps, cfg: PipelineConfig
) -> jnp.ndarray:
    """Device half of the block-engine extractor: ONE async host->device
    payload put per cloud + one row-chunk dispatch per chunk, all
    issued back-to-back from the calling thread (no host synchronization).
    -> (K, G, 32) lazily."""
    g = cfg.group_size
    chunk = _effective_chunk(g, cfg.group_chunk)
    caps_arg = None if caps == cfg.block_caps else caps
    dev_payload = _put_async(payload)
    dev_rows = _put_async(key_rows)
    import numpy as np

    outs = [
        # np.int32 scalar: rides the dispatch RPC (no separate device op),
        # and jit keys on dtype/shape so all chunks share ONE program
        _backbone_chunk_blocks_rows(
            backbone_variables, dev_payload, dev_rows, np.int32(ci),
            cfg, chunk, caps=caps_arg,
        )
        for ci in range(g // chunk)
    ]
    out = jnp.concatenate(outs, axis=0)  # (G, K, 32)
    return jnp.transpose(out, (1, 0, 2))


def extract_group_features_blocks(
    backbone_variables,
    points,
    keypoints,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Production extractor on the block-dense engine (sparse/block.py):
    host payload build (:func:`build_cloud_payloads`) + async device
    dispatch (:func:`dispatch_cloud_payloads`). Same semantics as
    :func:`extract_group_features` (testset.py parity: 60 rotations,
    keypoint nearest-voxel lookup).

    Whole-cloud build granularity (vs the round-2 interleaved loop) keeps
    the host off the critical path: no host synchronization between
    chunks, so callers can dispatch several clouds back-to-back and the
    device queue stays full while the host builds the next cloud —
    describe wall time ~= device compute time even on a contended 2-core
    host. Compute stays in chunk-sized programs: one lax.map over all 60
    rotations was measured to compile pathologically (>45 min vs ~8 min
    for the chunk program).
    """
    bufs, kbs, caps = build_cloud_payloads(points, keypoints, cfg)
    return dispatch_cloud_payloads(backbone_variables, bufs, kbs, caps, cfg)
