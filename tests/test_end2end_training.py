"""End-to-end learnability: train backbone + GF briefly on synthetic
scenes; assert the quantities that must move for the pipeline to work.

Full registration success requires backbone training budgets beyond a CPU
unit test (untrained FCGF features are dominated by voxel-phase noise —
matching only becomes possible once the hardest-contrastive objective has
made features shift/rotation-robust). scripts/validate_quality.py runs the
full train->register round-trip on real hardware and records QUALITY.json;
here we verify the mechanisms:

* backbone training separates positive/negative feature distances;
* GF training drives the 60-way (here 12-way) rotation-index accuracy far
  above chance — the equivariance signal that powers DR voting and ET;
* descriptor matching on a *voxel-aligned* self-pair (where features must
  transfer) is near-perfect, proving the extraction/matching plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core.knn import mutual_nn
from roreg_tpu.data.synthetic import make_synthetic_scene, synthetic_surface
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.extractor import extract
from roreg_tpu.pipeline.registration import RegistrationPipeline, gf_apply
from roreg_tpu.train.backbone import backbone_pair_batches, make_backbone_train_step
from roreg_tpu.train.data import RotatedFeatureCache, gf_et_batches
from roreg_tpu.train.trainer import TrainConfig, make_train_step


@pytest.mark.slow
def test_training_learnability(tmp_path):
    rng = np.random.default_rng(5)
    cfg = PipelineConfig(
        voxel_size=0.06, group_size=12,
        capacities=(4096, 2048, 1024, 512), conv1_kernel_size=3,
        group_chunk=4, num_keypoints=512, keynum=512,
        backbone_compute_dtype=None,
    )
    scene = make_synthetic_scene(
        str(tmp_path / "s0"), rng, num_clouds=2, points_per_cloud=8000,
        num_keypoints=cfg.num_keypoints, overlap=0.85, max_angle_deg=25.0,
    )

    # ---- backbone: pos/neg separation must emerge ----
    bb_init, bb_step = make_backbone_train_step(cfg, lr=3e-2)
    bb_it = backbone_pair_batches([scene], cfg, rng, max_pairs=384)
    batch = next(bb_it)
    bb_state = bb_init(jax.random.PRNGKey(0), batch)
    seps = []
    for i in range(40):
        bb_state, bm = bb_step(bb_state, batch)
        seps.append(float(bm["neg_dist"]) - float(bm["pos_dist"]))
        if i % 2 == 1:
            batch = next(bb_it)
    assert np.isfinite(seps).all()
    assert np.mean(seps[-5:]) > np.mean(seps[:5]), (
        f"no pos/neg separation progress: {seps[:3]} -> {seps[-3:]}"
    )
    backbone_vars = {
        "params": bb_state["params"], "batch_stats": bb_state["batch_stats"]
    }

    # ---- GF: rotation-index accuracy far above chance (1/12) ----
    cache = RotatedFeatureCache(cfg, backbone_vars, rnum=2)
    gf_it = gf_et_batches(cache, [scene], batch_size=24, rng=rng,
                          pair_dist=cfg.voxel_size)
    tcfg = TrainConfig.defaults("gf", group_size=cfg.group_size, lr_init=3e-4)
    gf_init, gf_step, _ = make_train_step(tcfg)
    b = next(gf_it)
    gf_state = gf_init(jax.random.PRNGKey(1), b)
    accs = []
    for i in range(60):
        gf_state, gm = gf_step(gf_state, b)
        accs.append(float(gm["dr_acc"]))
        if i % 2 == 1:
            b = next(gf_it)
    assert np.mean(accs[-10:]) > 0.4, f"dr_acc stuck at {np.mean(accs[-10:])}"
    gf_vars = {
        "params": gf_state["params"], "batch_stats": gf_state["batch_stats"]
    }

    # ---- plumbing: voxel-aligned self-pair matches near-perfectly ----
    pc0 = synthetic_surface(rng, 8000).astype(np.float32)
    kp0 = pc0[rng.permutation(8000)[:cfg.num_keypoints]]
    shift = np.array([0.3, -0.24, 0.48], np.float32)  # voxel multiples
    bb0 = extract(backbone_vars, pc0, None, kp0, cfg)
    bb1 = extract(backbone_vars, pc0 + shift, None, kp0 + shift, cfg)
    gf0 = gf_apply(gf_vars, bb0, cfg)
    gf1 = gf_apply(gf_vars, bb1, cfg)
    inv0 = jnp.mean(gf0, axis=1)
    inv1 = jnp.mean(gf1, axis=1)
    nn01, mut = mutual_nn(inv0, inv1)
    correct = float(np.mean(np.asarray(nn01) == np.arange(cfg.num_keypoints)))
    # ties from keypoints sharing a voxel cap this below 1.0
    assert correct > 0.7, f"self-pair matching broken: {correct}"
