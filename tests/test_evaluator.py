"""Evaluator driver test: full dataset-group evaluation on a synthetic
scene (random-init nets, tetrahedral group) — checks orchestration,
pre.log writing, Predator-RR protocol wiring, results.log."""

import os

import jax
import numpy as np
import pytest

from roreg_tpu.data.synthetic import make_synthetic_scene
from roreg_tpu.eval.evaluator import Evaluator
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.registration import RegistrationPipeline


@pytest.mark.slow
def test_evaluator_run(tmp_path):
    rng = np.random.default_rng(11)
    root = str(tmp_path / "synthetic" / "scene0")
    ds = make_synthetic_scene(
        root, rng, num_clouds=3, points_per_cloud=5000, num_keypoints=256,
        overlap=0.8, max_angle_deg=25.0,
    )
    cfg = PipelineConfig(
        voxel_size=0.05, group_size=12,
        capacities=(4096, 2048, 1024, 512), conv1_kernel_size=3,
        group_chunk=4, num_keypoints=256, keynum=96,
        sinkhorn_iters=20, max_iter=64, bs_gf=128, bs_et=96,
    )
    pipe = RegistrationPipeline(cfg, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    ev = Evaluator(
        pipe,
        cache_dir=str(tmp_path / "cache"),
        results_log=str(tmp_path / "results.log"),
    )
    datasets = {"wholesetname": "synthetic", "scene0": ds}
    summary = ev.run(datasets, str(tmp_path / "out"))
    assert set(summary) >= {"fmr", "ir", "rr_pointdsc", "rr_predator", "pairs"}
    assert summary["pairs"] == 3
    assert os.path.exists(tmp_path / "results.log")
    # pre.log written and parseable
    from roreg_tpu.eval.benchmark import read_trajectory

    pre = tmp_path / "out" / "synthetic_scene0" / "pre.log"
    assert pre.exists()
    pairs, traj = read_trajectory(str(pre))
    assert traj.shape == (3, 4, 4)
    # descriptor cache hit on second describe
    before = os.path.getmtime(tmp_path / "cache" / "synthetic_scene0" / "0.npz")
    ev.describe_cloud(ds, "0")
    assert os.path.getmtime(tmp_path / "cache" / "synthetic_scene0" / "0.npz") == before
