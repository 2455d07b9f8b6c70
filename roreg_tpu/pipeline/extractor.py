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


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"))
def _backbone_chunk_blocks(
    backbone_variables,
    payload: jnp.ndarray,
    key_rows: jnp.ndarray,
    cfg: PipelineConfig,
    chunk: int,
) -> jnp.ndarray:
    """Jitted per-chunk forward on the block-dense engine: unpack the
    single uint8 payload into per-rotation block pyramids, run the
    BlockResUNet per rotation, read keypoint features at the host-resolved
    flat cell rows. key_rows (chunk, K) int32 -> (chunk, K, 32)."""
    from roreg_tpu.sparse.block import BlockResUNet, unpack_block_payload

    net = BlockResUNet(
        variant=cfg.backbone_variant,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
        compute_dtype=cfg.backbone_compute_dtype,
    )
    bpyr_stack = unpack_block_payload(payload, cfg.block_caps, chunk)

    def one(args):
        bp, rows = args
        feats = net.apply(backbone_variables, bp, False)  # (Bcap0*64, 32)
        f = feats[jnp.clip(rows, 0)]
        return jnp.where((rows >= 0)[:, None], f, 0.0)

    # sequential over the chunk's rotations: one rotation's halo
    # intermediates peak at ~0.5 GB (L0, 64ch); vmapping the chunk would
    # multiply that by group_chunk and exhaust HBM
    return jax.lax.map(one, (bpyr_stack, key_rows))


def extract_group_features_blocks(
    backbone_variables,
    points,
    keypoints,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Production extractor on the block-dense engine (sparse/block.py):
    host builds ~1 MB/rotation of block tables + occupancy words, the
    device runs dense superblock convs on the MXU. Same semantics as
    :func:`extract_group_features` (testset.py parity: 60 rotations,
    keypoint nearest-voxel lookup). Double-buffered like the host-map
    path: chunk i+1's numpy build overlaps chunk i's device compute.
    """
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from roreg_tpu.native.blockpyr import (
        alloc_block_buffers_packed,
        block_tree_slice,
        fill_block_pyramid_host,
    )

    group = get_group(cfg.group_size)
    rots = group.rotations.astype(np.float32)
    g = cfg.group_size
    chunk = _effective_chunk(g, cfg.group_chunk)

    pts = np.ascontiguousarray(points, np.float32)
    kps = np.ascontiguousarray(keypoints, np.float32)

    # each slot: one contiguous uint8 payload + a typed view-tree into it;
    # shipping the payload is ONE host->device put per chunk. Keypoint ->
    # cell-row association happens inside the same C++ call, so only a
    # (chunk, K) int32 row array rides along.
    bufs = [alloc_block_buffers_packed(cfg.block_caps, chunk) for _ in range(2)]
    keys_bufs = [
        np.empty((chunk, kps.shape[0]), np.int32) for _ in range(2)
    ]
    pool = ThreadPoolExecutor(max_workers=4)

    def build_chunk(c0, slot):
        (payload, tree), kb = bufs[slot], keys_bufs[slot]

        def one(gi):
            R = rots[c0 + gi]
            fill_block_pyramid_host(
                pts @ R.T, cfg.voxel_size, block_tree_slice(tree, gi),
                keys=kps @ R.T, key_rows=kb[gi],
            )

        list(pool.map(one, range(chunk)))
        return payload, kb

    outs = []
    n_chunks = g // chunk
    pending = build_chunk(0, 0)
    for ci in range(n_chunks):
        payload, kb = pending
        # copy=True: keep in-flight device data immutable while the
        # double-buffered slot is refilled (zero-copy aliasing exists on
        # the CPU backend)
        dev_payload = jnp.array(payload, copy=True)
        dev_keys = jnp.array(kb, copy=True)
        outs.append(
            _backbone_chunk_blocks(
                backbone_variables, dev_payload, dev_keys, cfg, chunk
            )
        )
        if ci + 1 < n_chunks:
            pending = build_chunk((ci + 1) * chunk, (ci + 1) % 2)
    pool.shutdown(wait=False)
    out = jnp.concatenate(outs, axis=0)  # (G, K, 32)
    return jnp.transpose(out, (1, 0, 2))
