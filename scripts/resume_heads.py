#!/usr/bin/env python
"""Resume head training (RM / ET / RD) from saved backbone+GF checkpoints,
one phase subset per process.

Why per-process phases: long single-process runs on a tunneled device can
hit host-RSS limits when the PJRT client retains transfer buffers (each
host->device put's source buffer stays resident for the process lifetime —
measured ~5-9 MB retained per transfer on this harness, gc-immune). A
full-config RM run transfers ~16 MB/step, so phases are split into
processes sized to the host's memory budget. On hardware without that
client behavior, scripts/validate_quality.py runs everything in one
process.

Scenes are re-read from the dataset dirs the training run wrote
(data/quality_scenes/scene*), with the stream parameters taken from the
checkpoint dir's config_tag.json.

Usage:
  python scripts/resume_heads.py --phases rm --steps_rm 5000 \
      --ckdir checkpoints_quality_full
  python scripts/resume_heads.py --phases et,rd --steps_et 8000 \
      --steps_rd 2500 --ckdir checkpoints_quality_full
  python scripts/resume_heads.py --phases eval \
      --ckdir checkpoints_quality_full --out /tmp/quality_full_r5.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="rm,et,rd,eval",
                    help="comma subset of rm,et,rd,eval — run in order")
    ap.add_argument("--steps_rm", type=int, default=5000)
    ap.add_argument("--rm_lr_decay_steps", type=int, default=None,
                    help="override RM lr decay horizon (the component "
                         "default, 10k steps at rate 0.8, barely decays "
                         "over a short-schedule run — pass ~steps_rm/3 "
                         "with rate 0.5 for a converged tail)")
    ap.add_argument("--rm_lr_decay_rate", type=float, default=None)
    ap.add_argument("--extra_lo", type=int, default=0,
                    help="synthesize N additional LOW-overlap scenes (seed "
                         "21, disjoint from both the training stream and "
                         "the seed-7 benchmark stream) and add them to the "
                         "RM training pool — the low-overlap splits are "
                         "where RM's matching is hardest")
    ap.add_argument("--extra_lo_overlap", type=float, default=0.45)
    ap.add_argument("--extra_clouds", type=int, default=3)
    ap.add_argument("--steps_et", type=int, default=8000)
    ap.add_argument("--steps_rd", type=int, default=2500)
    ap.add_argument("--rnum", type=int, default=2)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--ckdir",
                    default=os.path.join(REPO, "checkpoints_quality_full"))
    ap.add_argument("--scene_root",
                    default=os.path.join(REPO, "data", "quality_scenes"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None,
                    help="eval phase: write {config,pairs,rr,full_chain} JSON")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from roreg_tpu.data.dataset import ThreeDMatchDataset
    from roreg_tpu.pipeline.quality_config import (
        quality_full_config,
        quality_small_config,
    )
    from roreg_tpu.train.checkpoints import load_variables, save_variables
    from roreg_tpu.train.trainer import TrainConfig, make_train_step

    t0 = time.time()

    def log(msg):
        print(f"[resume +{time.time() - t0:.0f}s] {msg}", flush=True)

    def rss_gb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1048576
        return -1.0

    with open(os.path.join(args.ckdir, "config_tag.json")) as f:
        tag = json.load(f)
    cfg = (quality_small_config if tag["small"] else quality_full_config)(
        tag["group_size"]
    )
    phases = args.phases.split(",")

    # ---- scenes from disk (written by the validate_quality run) ----
    scenes = []
    for i in range(tag["n_scenes"] + tag.get("n_lo_scenes", 0)):
        ds = ThreeDMatchDataset(
            os.path.join(args.scene_root, f"scene{i}"), tag["clouds"]
        )
        ds.name = f"scene{i}"
        scenes.append(ds)
    log(f"{len(scenes)} scenes loaded from {args.scene_root}")

    # ---- restore backbone + GF (templates from module init) ----
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    pipe = RegistrationPipeline(cfg, {})
    templates = pipe.init_variables(jax.random.PRNGKey(0))
    backbone_vars = load_variables(
        os.path.join(args.ckdir, "backbone_variables"), templates["backbone"]
    )
    gf_vars = load_variables(
        os.path.join(args.ckdir, "gf_variables"), templates["gf"]
    )
    # commit restored trees to the compute device: orbax restores
    # CPU-committed arrays, and jit dispatches a program on the committed
    # device of its arguments — without this every describe silently runs
    # on the CPU backend (bench.py:151 / Evaluator.__post_init__ do the
    # same; measured as 30+ min/cloud vs 1.5 s on the chip)
    dev = jax.devices()[0]
    backbone_vars = jax.device_put(backbone_vars, dev)
    gf_vars = jax.device_put(gf_vars, dev)
    log(f"backbone/GF restored (committed to {dev})")

    from roreg_tpu.pipeline.extractor import extract
    from roreg_tpu.pipeline.registration import gf_apply
    from roreg_tpu.train.data import (
        RotatedFeatureCache,
        gf_et_batches,
        rd_batches,
        rm_batches,
    )

    rng = np.random.default_rng(1)

    if not args.cpu and jax.default_backend() == "cpu":
        raise SystemExit(
            "device backend is CPU but --cpu was not passed: a full-config "
            "run would silently take hours — aborting (is the accelerator "
            "available?)"
        )

    if "rm" in phases:
        if args.extra_lo:
            from roreg_tpu.data.synthetic import make_synthetic_scene
            from roreg_tpu.pipeline.quality_config import (
                quality_scene_params,
            )

            ppc, extent = quality_scene_params(small=tag["small"])
            rng_lo = np.random.default_rng(21)
            lo_root = os.path.join(REPO, "data", "quality_scenes_rmlo")
            for i in range(args.extra_lo):
                ds = make_synthetic_scene(
                    os.path.join(lo_root, f"rm_lo{i}"), rng_lo,
                    num_clouds=args.extra_clouds, points_per_cloud=ppc,
                    num_keypoints=cfg.num_keypoints,
                    overlap=args.extra_lo_overlap, max_angle_deg=50.0,
                    surface_extent=extent,
                )
                ds.name = f"rm_lo{i}"
                scenes.append(ds)
            log(f"{args.extra_lo} extra low-overlap RM scenes synthesized")
        gf_feats = {}
        for ds in scenes:
            for pc_id in ds.pc_ids:
                pc = ds.get_pc(pc_id).astype(np.float32)
                kp = ds.get_kps(pc_id).astype(np.float32)
                bb = extract(backbone_vars, pc, None, kp, cfg)
                gf_feats[(ds.name, pc_id)] = np.asarray(
                    gf_apply(gf_vars, bb, cfg)
                )
                log(f"GF feats {ds.name}/{pc_id} (rss {rss_gb():.1f} GB)")
        log(f"GF features extracted for RM (rss {rss_gb():.1f} GB)")

        rm_it = rm_batches(
            gf_feats, scenes, rng, min_ps=256, max_ps=1024, capacity=1024,
            group_size=cfg.group_size,
        )
        rm_kw = {}
        if args.rm_lr_decay_steps:
            rm_kw["lr_decay_steps"] = args.rm_lr_decay_steps
        if args.rm_lr_decay_rate:
            rm_kw["lr_decay_rate"] = args.rm_lr_decay_rate
        tcfg = TrainConfig.defaults("rm", group_size=cfg.group_size, **rm_kw)
        rm_init, rm_step, _ = make_train_step(tcfg)
        b = next(rm_it)
        rm_state = rm_init(jax.random.PRNGKey(3), b)
        for i in range(args.steps_rm):
            rm_state, m = rm_step(rm_state, b)
            b = next(rm_it)
            if (i + 1) % 200 == 0:
                log(f"RM step {i + 1}: loss {float(m['loss']):.4f} "
                    f"(rss {rss_gb():.1f} GB)")
            if args.save_every and (i + 1) % args.save_every == 0:
                save_variables(os.path.join(args.ckdir, "rm_variables"),
                               {"params": rm_state["params"]})
        save_variables(os.path.join(args.ckdir, "rm_variables"),
                       {"params": rm_state["params"]})
        log("RM trained + saved")

    if "et" in phases:
        cache = RotatedFeatureCache(cfg, backbone_vars, rnum=args.rnum)
        et_it = gf_et_batches(cache, scenes, batch_size=32, rng=rng,
                              pair_dist=0.03)
        tcfg = TrainConfig.defaults("et", group_size=cfg.group_size)
        et_init, et_step, _ = make_train_step(tcfg, frozen={"gf": gf_vars})
        b = next(et_it)
        et_state = et_init(jax.random.PRNGKey(4), b)
        for i in range(args.steps_et):
            et_state, m = et_step(et_state, b)
            b = next(et_it)
            if (i + 1) % 200 == 0:
                log(f"ET step {i + 1}: loss {float(m['loss']):.4f} "
                    f"(rss {rss_gb():.1f} GB)")
            if args.save_every and (i + 1) % args.save_every == 0:
                save_variables(os.path.join(args.ckdir, "et_variables"), {
                    "params": et_state["params"],
                    "batch_stats": et_state["batch_stats"],
                })
        save_variables(os.path.join(args.ckdir, "et_variables"), {
            "params": et_state["params"],
            "batch_stats": et_state["batch_stats"],
        })
        log("ET trained + saved")

    if "rd" in phases:
        from roreg_tpu.train.selfrun import build_rd_match_bank

        rm_vars = jax.device_put(load_variables(
            os.path.join(args.ckdir, "rm_variables"), templates["rm"]
        ), dev)
        et_vars = jax.device_put(load_variables(
            os.path.join(args.ckdir, "et_variables"), templates["et"]
        ), dev)
        pipe = RegistrationPipeline(
            dataclasses.replace(cfg, use_rd=False, use_rm=False,
                                estimator="yohoc"),
            {"backbone": backbone_vars, "gf": gf_vars, "rm": rm_vars,
             "et": et_vars, "rd": None},
        )
        bank = build_rd_match_bank(pipe, scenes, seed=7)
        log(f"RD match bank built (rss {rss_gb():.1f} GB)")
        rd_it = rd_batches(bank, 128, rng)
        tcfg = TrainConfig.defaults("rd", group_size=cfg.group_size)
        rd_init, rd_step, _ = make_train_step(tcfg)
        b = next(rd_it)
        rd_state = rd_init(jax.random.PRNGKey(5), b)
        for i in range(args.steps_rd):
            rd_state, m = rd_step(rd_state, b)
            b = next(rd_it)
            if (i + 1) % 200 == 0:
                log(f"RD step {i + 1}: loss {float(m['loss']):.4f}")
            if args.save_every and (i + 1) % args.save_every == 0:
                save_variables(os.path.join(args.ckdir, "rd_variables"), {
                    "params": rd_state["params"],
                    "batch_stats": rd_state["batch_stats"],
                })
        save_variables(os.path.join(args.ckdir, "rd_variables"), {
            "params": rd_state["params"],
            "batch_stats": rd_state["batch_stats"],
        })
        log("RD trained + saved")

    if "eval" in phases:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "vq", os.path.join(REPO, "scripts", "validate_quality.py")
        )
        vq = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(vq)

        variables = {"backbone": backbone_vars, "gf": gf_vars}
        for comp in ("rm", "et", "rd"):
            variables[comp] = load_variables(
                os.path.join(args.ckdir, f"{comp}_variables"),
                templates[comp],
            )
        test_scene = ThreeDMatchDataset(
            os.path.join(args.scene_root, "test"), 2
        )
        test_scene.name = "test"
        full_chain = vq._eval_chain(cfg, variables, test_scene, log)
        out = {
            "config": {
                "group_size": cfg.group_size, "voxel_size": cfg.voxel_size,
                "steps_rm": args.steps_rm, "steps_et": args.steps_et,
                "steps_rd": args.steps_rd,
                "note": "heads resumed per-phase (scripts/resume_heads.py) "
                        "from the validate_quality backbone/GF run",
            },
            "full_chain": full_chain,
            "wall_s": round(time.time() - t0, 1),
        }
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
