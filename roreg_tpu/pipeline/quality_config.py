"""Canonical configs for the committed quality artifacts.

The weights under ``checkpoints_quality/`` are trained and evaluated under
exactly these configs; every consumer (scripts/validate_quality.py,
scripts/resume_full_chain.py, scripts/eval_full_chain.py, the
checkpoint-compatibility regression test) imports them from here so the
config can never silently desynchronize between training and evaluation
(round-3 advisor finding: hand-duplicated literals drifted).

Reference analog: the reference rides its backbone config inside the
checkpoint file itself (testset.py:127-146 ``checkpoint['config']``).
"""

from __future__ import annotations

from roreg_tpu.pipeline.config import PipelineConfig

__all__ = [
    "quality_small_config",
    "quality_full_config",
    "quality_scene_params",
]


def quality_small_config(group_size: int = 60) -> PipelineConfig:
    """CPU-tractable quality config (``validate_quality.py --small``):
    coarser voxels + smaller clouds shrink every compiled graph."""
    return PipelineConfig(
        voxel_size=0.05,
        group_size=group_size,
        capacities=(8192, 4096, 2048, 1024),
        block_caps=(1024, 512, 256, 128),
        conv1_kernel_size=5,
        group_chunk=6 if group_size == 60 else 4,
        num_keypoints=1024,
        keynum=1024,
        max_iter=1000,
        ransac_ird=0.1,
    )


def quality_full_config(group_size: int = 60) -> PipelineConfig:
    """Protocol-scale quality config (``validate_quality.py`` without
    ``--small``): 2.5 cm voxels, 20k-point clouds."""
    return PipelineConfig(
        voxel_size=0.025,
        group_size=group_size,
        capacities=(16384, 8192, 4096, 2048),
        conv1_kernel_size=5,
        group_chunk=6 if group_size == 60 else 4,
        num_keypoints=2048,
        keynum=2048,
        max_iter=1000,
        ransac_ird=0.07,
    )


def quality_scene_params(small: bool) -> tuple[int, float]:
    """(points_per_cloud, surface_extent) for the synthetic quality scenes.

    Density rationale: ~2.7 points per voxel (real-3DMatch-like) — at
    sparser occupancy the conv features see mostly sampling holes and
    hardest-contrastive training plateaus (round-3 root cause).
    """
    return (8000, 1.6) if small else (20000, 2.0)
