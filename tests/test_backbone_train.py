"""Backbone (FCGF) hardest-contrastive training: loss properties and an
overfit smoke test on a synthetic fragment pair."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.data.synthetic import make_synthetic_scene
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.train.backbone import (
    backbone_pair_batches,
    hardest_contrastive_loss,
    make_backbone_train_step,
)


def test_hardest_contrastive_properties(rng):
    p, c = 64, 16
    f = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    mask = jnp.ones((p,), bool)
    # identical matched features: zero positive loss, negatives penalized
    loss_same, aux = hardest_contrastive_loss(f, f, mask)
    assert float(aux["pos_loss"]) < 1e-10
    # shuffled (wrong) correspondences cost more
    perm = np.roll(np.arange(p), 1)
    loss_bad, _ = hardest_contrastive_loss(f, f[perm], mask)
    assert float(loss_bad) > float(loss_same)
    # masked rows contribute nothing
    half = jnp.asarray(np.arange(p) < p // 2)
    l1, _ = hardest_contrastive_loss(f, f, half)
    f2 = f.at[p // 2 :].set(999.0)
    l2, _ = hardest_contrastive_loss(f2, f2, half)
    assert abs(float(l1) - float(l2)) < 1e-5


@pytest.mark.slow
def test_backbone_overfit_pair(tmp_path):
    rng = np.random.default_rng(3)
    root = str(tmp_path / "scene")
    scene = make_synthetic_scene(
        root, rng, num_clouds=2, points_per_cloud=4000, num_keypoints=128,
        overlap=0.85, max_angle_deg=20.0,
    )
    cfg = PipelineConfig(
        voxel_size=0.05, capacities=(4096, 2048, 1024, 512),
        conv1_kernel_size=3, backbone_compute_dtype=None,
    )
    init_fn, step_fn = make_backbone_train_step(cfg, lr=3e-2)
    it = backbone_pair_batches([scene], cfg, rng, max_pairs=256)
    batch = next(it)
    state = init_fn(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(12):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # positive distances should shrink on the overfit batch
    assert float(m["pos_dist"]) < 1.0
