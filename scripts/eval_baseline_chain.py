#!/usr/bin/env python
"""Eval-only baseline chain (backbone+GF -> mutual -> yohoc) from a
checkpoint dir, on validate_quality's held-out test scene.

Used for group-variant ablations when a full head-training run does not
fit the round budget: the baseline chain exercises the whole variant
path (group tables, rotation describe, GF group conv, dr_index voting,
yohoc RANSAC) end-to-end. Mirrors scripts/validate_quality.py:181-226.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/eval_baseline_chain.py --group_size 24 \
        --ckdir checkpoints_g24 --merge_key ablation_g24
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group_size", type=int, default=24)
    ap.add_argument("--ckdir", default=os.path.join(REPO, "checkpoints_g24"))
    ap.add_argument("--merge_key", default="ablation_g24",
                    help="key to write inside QUALITY.json")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from roreg_tpu.core import se3, so3
    from roreg_tpu.core.group import get_group
    from roreg_tpu.core.knn import mutual_nn
    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.pipeline import estimator as est
    from roreg_tpu.pipeline.extractor import extract
    from roreg_tpu.pipeline.quality_config import (
        quality_scene_params,
        quality_small_config,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline, gf_apply
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    t0 = time.time()

    def log(m):
        print(f"[ablate +{time.time() - t0:.0f}s] {m}", flush=True)

    cfg = quality_small_config(args.group_size)
    ppc, extent = quality_scene_params(small=True)

    # replay validate_quality's exact rng(0) scene stream to reach the
    # same held-out test scene the checkpoints were validated against
    rng = np.random.default_rng(0)
    root = os.path.join(REPO, "data", "quality_scenes")
    for i in range(3):
        make_synthetic_scene(
            os.path.join(root, f"scene{i}"), rng, num_clouds=3,
            points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
            overlap=0.8, max_angle_deg=50.0, surface_extent=extent,
        )
    test_scene = make_synthetic_scene(
        os.path.join(root, "test"), rng, num_clouds=2,
        points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
        overlap=0.8, max_angle_deg=40.0, surface_extent=extent,
    )

    pipe = RegistrationPipeline(cfg, {})
    templates = pipe.init_variables(jax.random.PRNGKey(0))
    variables = load_pipeline_variables(args.ckdir, templates)
    if "backbone" not in variables or "gf" not in variables:
        raise SystemExit(f"need backbone+gf checkpoints in {args.ckdir}")
    backbone_vars, gf_vars = variables["backbone"], variables["gf"]
    log(f"checkpoints restored from {args.ckdir}: "
        f"{sorted(variables.keys())}")

    group = get_group(cfg.group_size)
    results = []
    for (id0, id1) in test_scene.pair_ids:
        T_gt = test_scene.get_transform(id0, id1)
        descs = {}
        for pc_id in (id0, id1):
            pc = test_scene.get_pc(pc_id).astype(np.float32)
            kp = test_scene.get_kps(pc_id).astype(np.float32)
            bb = extract(backbone_vars, pc, None, kp, cfg)
            gf = gf_apply(gf_vars, bb, cfg)
            descs[pc_id] = (gf, jnp.asarray(kp))
        gf0, k0 = descs[id0]
        gf1, k1 = descs[id1]
        inv0 = jnp.mean(gf0, axis=1)
        inv1 = jnp.mean(gf1, axis=1)
        inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
        inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
        nn01, mut = mutual_nn(inv0, inv1)
        keys_m0 = k0
        keys_m1 = k1[nn01]
        k1t = se3.transform_points(keys_m1, jnp.asarray(T_gt, jnp.float32))
        d = jnp.sqrt(jnp.sum((keys_m0 - k1t) ** 2, -1))
        mutf = mut.astype(jnp.float32)
        ir = float(
            jnp.sum(jnp.where(mut, (d < 0.1).astype(jnp.float32), 0))
            / jnp.clip(jnp.sum(mutf), 1)
        )
        dr = est.dr_index(gf0, gf1[nn01], group.cayley)
        T, _ = est.yohoc_ransac(
            jax.random.PRNGKey(2), dr, keys_m0, keys_m1,
            jnp.ones(cfg.keynum), mut, cfg.ransac_ird,
            max_iter=cfg.max_iter, group_size=cfg.group_size,
        )
        rre = float(so3.relative_angle_deg(
            T[:3, :3], jnp.asarray(T_gt[:3, :3], jnp.float32)))
        rte = float(jnp.linalg.norm(
            T[:3, 3] - jnp.asarray(T_gt[:3, 3], jnp.float32)))
        results.append({
            "pair": f"{id0}-{id1}",
            "mutual_rate": float(jnp.mean(mutf)),
            "inlier_ratio": ir,
            "rre_deg": rre,
            "rte_m": rte,
            "success": bool(rre < 15 and rte < 0.3),
        })
        log(f"pair {id0}-{id1}: ir={ir:.3f} rre={rre:.2f} rte={rte:.3f}")

    out = {
        "group_size": cfg.group_size,
        "pairs": results,
        "rr": float(np.mean([r["success"] for r in results])),
        "wall_s": round(time.time() - t0, 1),
        "note": args.note or (
            f"baseline chain (mutual+yohoc) at group {cfg.group_size} "
            f"from {os.path.basename(args.ckdir)}"
        ),
    }
    qpath = os.path.join(REPO, "QUALITY.json")
    try:
        with open(qpath) as f:
            q = json.load(f)
    except Exception:
        q = {}
    q[args.merge_key] = out
    with open(qpath, "w") as f:
        json.dump(q, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
