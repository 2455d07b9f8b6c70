"""End-to-end pipeline smoke test on a synthetic scene (random-init nets).

Uses the tetrahedral (12-element) group variant — the appendix ablation
path — to keep CPU time sane; the 60-element path is exercised by the unit
tests and the TPU benchmark.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.data.synthetic import make_synthetic_scene
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.registration import RegistrationPipeline

# full end-to-end compiles (several minutes on a 2-core box): slow-gated so
# `pytest -m "not slow"` stays a sub-5-min quick gate
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        voxel_size=0.05,
        group_size=12,
        capacities=(4096, 2048, 1024, 512),
        conv1_kernel_size=3,
        group_chunk=4,
        num_keypoints=256,
        keynum=96,
        sinkhorn_iters=20,
        max_iter=64,
        bs_gf=128,
        bs_et=96,
    )


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = str(tmp_path_factory.mktemp("pipe") / "scene")
    return make_synthetic_scene(
        root, rng, num_clouds=2, points_per_cloud=6000, num_keypoints=256,
        overlap=0.8, max_angle_deg=30.0,
    )


@pytest.fixture(scope="module")
def pipe(cfg):
    p = RegistrationPipeline(cfg, {})
    p.init_variables(jax.random.PRNGKey(0))
    return p


def test_register_pair_runs(pipe, scene, cfg):
    pc0 = scene.get_pc(0).astype(np.float32)
    pc1 = scene.get_pc(1).astype(np.float32)
    k0 = scene.get_kps(0).astype(np.float32)
    k1 = scene.get_kps(1).astype(np.float32)
    out = pipe.register_pair(
        jax.random.PRNGKey(1),
        jnp.asarray(pc0), jnp.ones(len(pc0), bool), jnp.asarray(k0),
        jnp.asarray(pc1), jnp.ones(len(pc1), bool), jnp.asarray(k1),
    )
    T = np.asarray(out["transform"])
    assert T.shape == (4, 4)
    assert np.isfinite(T).all()
    R = T[:3, :3]
    assert np.abs(R @ R.T - np.eye(3)).max() < 1e-3  # valid rotation
    assert out["matches"].shape == (cfg.keynum, 2)
    assert np.isfinite(np.asarray(out["match_scores"])).all()


def test_register_pair_yohoc(pipe, scene, cfg):
    import dataclasses

    cfg_c = dataclasses.replace(cfg, estimator="yohoc")
    pipe_c = RegistrationPipeline(cfg_c, pipe.variables)
    pc0 = scene.get_pc(0).astype(np.float32)
    pc1 = scene.get_pc(1).astype(np.float32)
    k0 = scene.get_kps(0).astype(np.float32)
    k1 = scene.get_kps(1).astype(np.float32)
    out = pipe_c.register_pair(
        jax.random.PRNGKey(2),
        jnp.asarray(pc0), jnp.ones(len(pc0), bool), jnp.asarray(k0),
        jnp.asarray(pc1), jnp.ones(len(pc1), bool), jnp.asarray(k1),
    )
    assert np.isfinite(np.asarray(out["transform"])).all()


def test_register_pair_no_rd_no_rm(pipe, scene, cfg):
    import dataclasses

    cfg_m = dataclasses.replace(cfg, use_rd=False, use_rm=False)
    pipe_m = RegistrationPipeline(cfg_m, pipe.variables)
    pc0 = scene.get_pc(0).astype(np.float32)
    pc1 = scene.get_pc(1).astype(np.float32)
    k0 = scene.get_kps(0).astype(np.float32)
    k1 = scene.get_kps(1).astype(np.float32)
    out = pipe_m.register_pair(
        jax.random.PRNGKey(3),
        jnp.asarray(pc0), jnp.ones(len(pc0), bool), jnp.asarray(k0),
        jnp.asarray(pc1), jnp.ones(len(pc1), bool), jnp.asarray(k1),
    )
    assert np.isfinite(np.asarray(out["transform"])).all()
