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

__all__ = ["make_backbone", "extract_group_features"]


def make_backbone(cfg: PipelineConfig) -> ResUNet:
    return ResUNet(
        variant=cfg.backbone_variant,
        in_channels=1,
        out_channels=32,
        conv1_kernel_size=cfg.conv1_kernel_size,
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
    chunk = cfg.group_chunk
    assert g % chunk == 0, "group_chunk must divide group size"
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
