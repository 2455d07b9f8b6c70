"""End-to-end quality proof: train backbone + GF on synthetic scenes, then
register a pair via descriptor matching + group-vote RANSAC and verify the
recovered transform. This is the framework's analog of the reference's
"benchmark-as-integration-test" (SURVEY §4) on hermetic data.

Tetrahedral group + small capacities keep this CPU-feasible; the mechanism
(equivariant descriptors -> DR-index voting -> Kabsch) is identical at 60.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core.group import get_group
from roreg_tpu.core import se3, so3
from roreg_tpu.data.synthetic import make_synthetic_scene
from roreg_tpu.pipeline import estimator as est
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.extractor import extract
from roreg_tpu.pipeline.registration import gf_apply
from roreg_tpu.train.backbone import backbone_pair_batches, make_backbone_train_step
from roreg_tpu.train.data import RotatedFeatureCache, gf_et_batches
from roreg_tpu.train.trainer import TrainConfig, make_train_step
from roreg_tpu.core.knn import mutual_nn


@pytest.mark.slow
def test_train_then_register(tmp_path):
    rng = np.random.default_rng(5)
    cfg = PipelineConfig(
        voxel_size=0.06, group_size=12,
        capacities=(4096, 2048, 1024, 512), conv1_kernel_size=3,
        group_chunk=4, num_keypoints=1024, keynum=1024,
        max_iter=300, ransac_ird=0.1, backbone_compute_dtype=None,
    )
    scene = make_synthetic_scene(
        str(tmp_path / "s0"), rng, num_clouds=2, points_per_cloud=8000,
        num_keypoints=cfg.num_keypoints, overlap=0.85, max_angle_deg=25.0,
    )

    # ---- 1. backbone: brief hardest-contrastive training ----
    bb_init, bb_step = make_backbone_train_step(cfg, lr=3e-2)
    bb_it = backbone_pair_batches([scene], cfg, rng, max_pairs=384)
    batch = next(bb_it)
    bb_state = bb_init(jax.random.PRNGKey(0), batch)
    for i in range(50):
        bb_state, bm = bb_step(bb_state, batch)
        if i % 2 == 1:
            batch = next(bb_it)
    assert np.isfinite(float(bm["loss"]))
    backbone_vars = {
        "params": bb_state["params"], "batch_stats": bb_state["batch_stats"]
    }

    # ---- 2. GF: train the group-feature descriptor on pair batches ----
    cache = RotatedFeatureCache(cfg, backbone_vars, rnum=2)
    gf_it = gf_et_batches(cache, [scene], batch_size=24, rng=rng,
                          pair_dist=cfg.voxel_size)
    tcfg = TrainConfig.defaults("gf", group_size=cfg.group_size, lr_init=3e-4)
    gf_init, gf_step, _ = make_train_step(tcfg)
    b = next(gf_it)
    gf_state = gf_init(jax.random.PRNGKey(1), b)
    accs = []
    for i in range(80):
        gf_state, gm = gf_step(gf_state, b)
        accs.append(float(gm["dr_acc"]))
        if i % 2 == 1:
            b = next(gf_it)
    # rotation-index prediction should be learnable well above chance (1/12)
    assert np.mean(accs[-10:]) > 0.4, f"dr_acc stuck at {np.mean(accs[-10:])}"
    gf_vars = {
        "params": gf_state["params"], "batch_stats": gf_state["batch_stats"]
    }

    # ---- 3. register the pair: desc -> mutual match -> yohoc RANSAC ----
    group = get_group(cfg.group_size)
    T_gt = scene.get_transform("0", "1")
    descs = []
    for pc_id in ("0", "1"):
        pc = scene.get_pc(pc_id).astype(np.float32)
        kp = scene.get_kps(pc_id).astype(np.float32)
        bb = extract(backbone_vars, pc, None, kp, cfg)
        gf = gf_apply(gf_vars, bb, cfg)
        descs.append((gf, jnp.asarray(kp)))
    gf0, k0 = descs[0]
    gf1, k1 = descs[1]
    inv0 = jnp.mean(gf0, axis=1)
    inv1 = jnp.mean(gf1, axis=1)
    inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
    inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
    nn01, mut = mutual_nn(inv0, inv1)
    m0 = jnp.arange(cfg.num_keypoints)
    keys_m0, keys_m1 = k0[m0], k1[nn01]
    # inlier ratio of mutual matches under gt should beat random by a lot
    k1t = se3.transform_points(keys_m1, jnp.asarray(T_gt, jnp.float32))
    d = jnp.sqrt(jnp.sum((keys_m0 - k1t) ** 2, -1))
    ir = float(jnp.mean(jnp.where(mut, (d < 0.1).astype(jnp.float32), 0)))
    n_mut = float(jnp.mean(mut.astype(jnp.float32)))
    dr = est.dr_index(gf0[m0], gf1[nn01], group.cayley)
    T, ov = est.yohoc_ransac(
        jax.random.PRNGKey(2), dr, keys_m0, keys_m1,
        jnp.ones(cfg.num_keypoints), mut, cfg.ransac_ird,
        max_iter=cfg.max_iter, group_size=cfg.group_size,
    )
    rre = float(so3.relative_angle_deg(T[:3, :3], jnp.asarray(T_gt[:3, :3], jnp.float32)))
    rte = float(jnp.linalg.norm(T[:3, 3] - jnp.asarray(T_gt[:3, 3], jnp.float32)))
    print(f"mutual={n_mut:.2f} inlier_ratio={ir:.2f} rre={rre:.1f} rte={rte:.2f}")
    assert rre < 15.0 and rte < 0.3, (
        f"registration failed: rre={rre:.1f} rte={rte:.2f} "
        f"(mutual={n_mut:.2f}, ir={ir:.2f})"
    )
