#!/usr/bin/env python
"""Quality validation round-trip on real hardware.

Trains the FCGF backbone (hardest-contrastive) and the GF descriptor on
synthetic scenes, then registers held-out fragment pairs with the
descriptor-matching + group-vote (yohoc) pipeline and reports FMR/IR/RR.
Writes results to QUALITY.json at the repo root.

This is the end-to-end proof that the training system produces working
descriptors — the reference's equivalent evidence is its 3DMatch benchmark
run with shipped checkpoints (which are stripped from the repo).

Usage: python scripts/validate_quality.py [--steps_bb 2000] [--steps_gf 800]
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
    ap.add_argument("--steps_bb", type=int, default=2000)
    ap.add_argument("--steps_gf", type=int, default=800)
    ap.add_argument("--steps_rm", type=int, default=300)
    ap.add_argument("--steps_et", type=int, default=400)
    ap.add_argument("--steps_rd", type=int, default=300)
    ap.add_argument("--group_size", type=int, default=60)
    ap.add_argument("--n_scenes", type=int, default=3,
                    help="high-overlap training scenes")
    ap.add_argument("--n_lo_scenes", type=int, default=0,
                    help="additional low-overlap training scenes (the eval "
                         "protocol's 3DLoMatch-analog split is a distribution "
                         "shift unless some are present)")
    ap.add_argument("--clouds", type=int, default=3,
                    help="clouds per training scene")
    ap.add_argument("--lo_overlap", type=float, default=0.5)
    ap.add_argument("--rnum", type=int, default=2,
                    help="random rotations per cloud in the GF/ET feature "
                         "cache (reference Rnum=2, GF_ET.py:117)")
    ap.add_argument("--save_every", type=int, default=0,
                    help="checkpoint each head every N steps (0 = end only)")
    ap.add_argument("--skip_full_chain", action="store_true",
                    help="only the backbone+GF mutual/yohoc baseline")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="reduced capacities/cloud sizes (CPU-tractable)")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    ap.add_argument("--ckdir", default=os.path.join(REPO, "checkpoints_quality"),
                    help="checkpoint output dir (use a non-default dir for "
                         "ablation/full-size runs so the committed small-config "
                         "checkpoints are never clobbered mid-run)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from roreg_tpu.core.group import get_group
    from roreg_tpu.core.knn import mutual_nn
    from roreg_tpu.core import se3, so3
    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.pipeline import estimator as est
    from roreg_tpu.pipeline.extractor import extract
    from roreg_tpu.pipeline.registration import RegistrationPipeline, gf_apply
    from roreg_tpu.train.backbone import (
        backbone_pair_batches,
        make_backbone_train_step,
    )
    from roreg_tpu.train.data import RotatedFeatureCache, gf_et_batches
    from roreg_tpu.train.trainer import TrainConfig, make_train_step

    t_start = time.time()

    def log(msg):
        print(f"[quality +{time.time() - t_start:.0f}s] {msg}", flush=True)

    # canonical quality configs, shared with resume_full_chain.py /
    # eval_full_chain.py / tests/test_checkpoint_compat.py so training and
    # evaluation can never silently desynchronize
    from roreg_tpu.pipeline.quality_config import (
        quality_full_config,
        quality_scene_params,
        quality_small_config,
    )

    cfg = (quality_small_config if args.small else quality_full_config)(
        args.group_size
    )
    ppc, extent = quality_scene_params(small=args.small)
    if not args.cpu:
        # fail fast-and-loud on a cold TPU describe compile (VERDICT #6)
        from roreg_tpu.utils.compile_guard import check_describe_signature

        check_describe_signature(
            cfg, os.path.join(REPO, ".jax_cache"), label="validate_quality"
        )

    rng = np.random.default_rng(0)
    scenes = []
    root = os.path.join(REPO, "data", "quality_scenes")
    for i in range(args.n_scenes + args.n_lo_scenes):
        ov = 0.8 if i < args.n_scenes else args.lo_overlap
        scenes.append(
            make_synthetic_scene(
                os.path.join(root, f"scene{i}"), rng,
                num_clouds=args.clouds,
                points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
                overlap=ov, max_angle_deg=50.0, surface_extent=extent,
            )
        )
    test_scene = make_synthetic_scene(
        os.path.join(root, "test"), rng, num_clouds=2,
        points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
        overlap=0.8, max_angle_deg=40.0, surface_extent=extent,
    )
    log("scenes built")

    # ---- backbone training (f32 compute: bf16 flattens the contrastive
    # distance gradients; inference still runs bf16 via cfg) ----
    import dataclasses

    cfg_train = dataclasses.replace(cfg, backbone_compute_dtype=None)
    # Adam: the SGD recipe needs FCGF's ~30k-step budget; Adam separates
    # pos/neg within a few hundred steps on these scenes
    bb_init, bb_step = make_backbone_train_step(
        cfg_train, lr=1e-3, optimizer="adam"
    )
    bb_it = backbone_pair_batches(scenes, cfg_train, rng, max_pairs=1024)
    batch = next(bb_it)
    state = bb_init(jax.random.PRNGKey(0), batch)
    for i in range(args.steps_bb):
        state, m = bb_step(state, batch)
        batch = next(bb_it)
        if (i + 1) % 200 == 0:
            log(
                f"backbone step {i+1}: loss {float(m['loss']):.4f} "
                f"pos {float(m['pos_dist']):.3f} neg {float(m['neg_dist']):.3f}"
            )
    backbone_vars = {
        "params": state["params"], "batch_stats": state["batch_stats"]
    }
    log("backbone trained")

    # ---- GF training ----
    cache = RotatedFeatureCache(cfg, backbone_vars, rnum=args.rnum)
    gf_it = gf_et_batches(cache, scenes, batch_size=32, rng=rng,
                          pair_dist=0.03)
    tcfg = TrainConfig.defaults("gf", group_size=cfg.group_size)
    gf_init, gf_step, _ = make_train_step(tcfg)
    b = next(gf_it)
    gf_state = gf_init(jax.random.PRNGKey(1), b)
    acc = 0.0
    from roreg_tpu.train.checkpoints import save_variables as _savev

    for i in range(args.steps_gf):
        gf_state, gm = gf_step(gf_state, b)
        b = next(gf_it)
        acc = 0.98 * acc + 0.02 * float(gm["dr_acc"])
        if (i + 1) % 100 == 0:
            log(f"GF step {i+1}: loss {float(gm['loss']):.4f} dr_acc~{acc:.3f}")
        if args.save_every and (i + 1) % args.save_every == 0:
            _savev(os.path.join(args.ckdir, "gf_variables"), {
                "params": gf_state["params"],
                "batch_stats": gf_state["batch_stats"],
            })
    gf_vars = {
        "params": gf_state["params"], "batch_stats": gf_state["batch_stats"]
    }
    log("GF trained")

    # ---- save checkpoints for reuse ----
    from roreg_tpu.train.checkpoints import save_variables

    ckdir = args.ckdir
    save_variables(os.path.join(ckdir, "backbone_variables"), backbone_vars)
    save_variables(os.path.join(ckdir, "gf_variables"), gf_vars)
    # config tag: evaluation scripts assert they restore under the same
    # config family (parameter shapes don't depend on voxel_size, so a
    # mismatched restore would otherwise succeed silently and produce
    # skewed numbers — round-4 advisor finding)
    with open(os.path.join(ckdir, "config_tag.json"), "w") as f:
        json.dump({
            "small": bool(args.small), "group_size": cfg.group_size,
            "voxel_size": cfg.voxel_size,
            # scene-stream knobs: eval scripts replay the same rng stream
            "n_scenes": args.n_scenes, "n_lo_scenes": args.n_lo_scenes,
            "clouds": args.clouds, "lo_overlap": args.lo_overlap,
        }, f)

    # ---- RM / ET / RD training + full-chain evaluation ----
    trained = {"backbone": backbone_vars, "gf": gf_vars}
    if not args.skip_full_chain:
        trained.update(
            _train_full_chain(args, cfg, scenes, backbone_vars, gf_vars, rng, log)
        )
        full_chain = _eval_chain(cfg, trained, test_scene, log)
    else:
        full_chain = None

    # ---- evaluate on the held-out pair (mutual + yohoc baseline) ----
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
        ir = float(jnp.sum(jnp.where(mut, (d < 0.1).astype(jnp.float32), 0))
                   / jnp.clip(jnp.sum(mutf), 1))
        dr = est.dr_index(gf0, gf1[nn01], group.cayley)
        T, ov = est.yohoc_ransac(
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
        "config": {
            "group_size": cfg.group_size, "steps_bb": args.steps_bb,
            "steps_gf": args.steps_gf, "steps_rm": args.steps_rm,
            "steps_et": args.steps_et, "steps_rd": args.steps_rd,
            "voxel_size": cfg.voxel_size,
            "n_scenes": args.n_scenes, "n_lo_scenes": args.n_lo_scenes,
            "clouds": args.clouds, "rnum": args.rnum,
        },
        "pairs": results,
        "rr": float(np.mean([r["success"] for r in results])),
        "full_chain": full_chain,
        "wall_s": round(time.time() - t_start, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    if not args.cpu:
        from roreg_tpu.utils.compile_guard import record_describe_signature

        record_describe_signature(
            cfg, os.path.join(REPO, ".jax_cache"), label="validate_quality"
        )
    print(json.dumps(out))


def _train_full_chain(args, cfg, scenes, backbone_vars, gf_vars, rng, log):
    """Train RM, ET and RD on the synthetic scenes (reference order:
    RM/ET need GF; RD's trainset is produced by a self-run of the
    pipeline, train/trainset/RD.py:61-73). Returns the variables dict."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roreg_tpu.pipeline.extractor import extract
    from roreg_tpu.pipeline.registration import RegistrationPipeline, gf_apply
    from roreg_tpu.train.data import (
        RotatedFeatureCache,
        gf_et_batches,
        rd_batches,
        rm_batches,
    )
    from roreg_tpu.train.trainer import TrainConfig, make_train_step

    # descriptor features per cloud from the trained GF
    gf_feats = {}
    for ds in scenes:
        for pc_id in ds.pc_ids:
            pc = ds.get_pc(pc_id).astype(np.float32)
            kp = ds.get_kps(pc_id).astype(np.float32)
            bb = extract(backbone_vars, pc, None, kp, cfg)
            gf_feats[(ds.name, pc_id)] = np.asarray(gf_apply(gf_vars, bb, cfg))
    log("per-cloud GF features extracted for RM/RD training")

    # ---- RM ----
    rm_it = rm_batches(
        gf_feats, scenes, rng, min_ps=256, max_ps=1024, capacity=1024,
        group_size=cfg.group_size,
    )
    tcfg = TrainConfig.defaults("rm", group_size=cfg.group_size)
    rm_init, rm_step, _ = make_train_step(tcfg)
    b = next(rm_it)
    rm_state = rm_init(jax.random.PRNGKey(3), b)
    from roreg_tpu.train.checkpoints import save_variables

    for i in range(args.steps_rm):
        rm_state, m = rm_step(rm_state, b)
        b = next(rm_it)
        if (i + 1) % 100 == 0:
            log(f"RM step {i + 1}: loss {float(m['loss']):.4f}")
        if args.save_every and (i + 1) % args.save_every == 0:
            save_variables(os.path.join(args.ckdir, "rm_variables"),
                           {"params": rm_state["params"]})
    rm_vars = {"params": rm_state["params"]}
    log("RM trained")

    ckdir = args.ckdir
    save_variables(os.path.join(ckdir, "rm_variables"), rm_vars)

    # ---- ET (frozen GF) ----
    cache = RotatedFeatureCache(cfg, backbone_vars, rnum=args.rnum)
    et_it = gf_et_batches(cache, scenes, batch_size=32, rng=rng, pair_dist=0.03)
    tcfg = TrainConfig.defaults("et", group_size=cfg.group_size)
    et_init, et_step, _ = make_train_step(tcfg, frozen={"gf": gf_vars})
    b = next(et_it)
    et_state = et_init(jax.random.PRNGKey(4), b)
    for i in range(args.steps_et):
        et_state, m = et_step(et_state, b)
        b = next(et_it)
        if (i + 1) % 100 == 0:
            log(f"ET step {i + 1}: loss {float(m['loss']):.4f}")
        if args.save_every and (i + 1) % args.save_every == 0:
            save_variables(os.path.join(args.ckdir, "et_variables"), {
                "params": et_state["params"],
                "batch_stats": et_state["batch_stats"],
            })
    et_vars = {
        "params": et_state["params"], "batch_stats": et_state["batch_stats"]
    }
    log("ET trained")
    save_variables(os.path.join(ckdir, "et_variables"), et_vars)

    # ---- RD (self-run pipeline supervision) ----
    from roreg_tpu.train.selfrun import build_rd_match_bank

    pipe = RegistrationPipeline(
        dataclasses.replace(cfg, use_rd=False, use_rm=False, estimator="yohoc"),
        {"backbone": backbone_vars, "gf": gf_vars, "rm": rm_vars,
         "et": et_vars, "rd": None},
    )
    # rd needs init for sampling path? selfrun uses gf/mutual only
    bank = build_rd_match_bank(pipe, scenes, seed=7)
    rd_it = rd_batches(bank, 128, rng)
    tcfg = TrainConfig.defaults("rd", group_size=cfg.group_size)
    rd_init, rd_step, _ = make_train_step(tcfg)
    b = next(rd_it)
    rd_state = rd_init(jax.random.PRNGKey(5), b)
    for i in range(args.steps_rd):
        rd_state, m = rd_step(rd_state, b)
        b = next(rd_it)
        if (i + 1) % 100 == 0:
            log(f"RD step {i + 1}: loss {float(m['loss']):.4f}")
        if args.save_every and (i + 1) % args.save_every == 0:
            save_variables(os.path.join(args.ckdir, "rd_variables"), {
                "params": rd_state["params"],
                "batch_stats": rd_state["batch_stats"],
            })
    rd_vars = {
        "params": rd_state["params"], "batch_stats": rd_state["batch_stats"]
    }
    log("RD trained")
    save_variables(os.path.join(ckdir, "rd_variables"), rd_vars)
    return {"rm": rm_vars, "et": et_vars, "rd": rd_vars}


def _eval_chain(cfg, variables, test_scene, log):
    """Evaluate the flagship chain (--RD --RM --ET yohoo, reference
    test/__init__.py:6-23) AND the descriptor-only baseline on the
    held-out scene via the production Evaluator."""
    import dataclasses

    from roreg_tpu.eval.evaluator import Evaluator
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    import numpy as np

    out = {}
    for name, flags in {
        "full_rd_rm_et_yohoo": dict(use_rd=True, use_rm=True, estimator="yohoo"),
        "mutual_yohoc": dict(use_rd=False, use_rm=False, estimator="yohoc"),
    }.items():
        ecfg = dataclasses.replace(
            cfg, keynum=min(1024, cfg.num_keypoints), **flags
        )
        pipe = RegistrationPipeline(ecfg, variables)
        ev = Evaluator(pipe)
        res = ev.process_scene(test_scene, seed=11)
        out[name] = {
            "rr": float(np.mean(res["rr"])),
            "fmr": float(np.mean(res["fmr"])),
            "ir": float(np.mean(res["ir"])),
            "rre": float(np.mean(res["rre"])) if res["rre"] else None,
            "rte": float(np.mean(res["rte"])) if res["rte"] else None,
        }
        log(f"chain '{name}': {out[name]}")
    out["pose_sync"] = _eval_pose_sync(cfg, variables, test_scene, log)
    return out


def _eval_pose_sync(cfg, variables, test_scene, log):
    """Measure the pose-graph synchronization's effect (VERDICT r2 'next'
    #5): take the scene's pairwise estimates, corrupt one with a gross
    error, and record RR with and without the cycle-consistent sync
    (eval/posegraph.py) overruling it."""
    import dataclasses

    import numpy as np

    from roreg_tpu.core import so3
    from roreg_tpu.eval.evaluator import Evaluator
    from roreg_tpu.eval.metrics import registration_errors
    from roreg_tpu.eval.posegraph import sync_scene
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    ecfg = dataclasses.replace(
        cfg, keynum=min(1024, cfg.num_keypoints),
        use_rd=False, use_rm=False, estimator="yohoc",
    )
    pipe = RegistrationPipeline(ecfg, variables)
    ev = Evaluator(pipe)
    res = ev.process_scene(test_scene, seed=13)
    pairs = res["pairs"]
    if len(pairs) < 3:
        log("pose_sync eval skipped: scene has < 3 pairs (no cycles)")
        return None

    def rr_of(transforms):
        ok = []
        for (id0, id1), T in zip(pairs, transforms):
            rre, rte = registration_errors(
                np.asarray(T), test_scene.get_transform(id0, id1)
            )
            ok.append(float(rre < ecfg.rr_rot_deg and rte < ecfg.rr_trans))
        return float(np.mean(ok))

    # inject one grossly wrong pairwise estimate (90 deg + 1 m off)
    bad = [np.asarray(T).copy() for T in res["transforms"]]
    corrupt = np.eye(4)
    corrupt[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    corrupt[:3, 3] = [1.0, 0, 0]
    bad[0] = corrupt @ bad[0]
    refined = sync_scene(pairs, bad, res["overlaps"])
    result = {
        "rr_raw": rr_of(res["transforms"]),
        "rr_corrupted": rr_of(bad),
        "rr_corrupted_synced": rr_of(refined),
    }
    log(f"pose_sync: {result}")
    return result


if __name__ == "__main__":
    main()
