#!/usr/bin/env python
"""Protocol-shape quality benchmark (VERDICT r3 items 5/6/9).

Grows the quality evidence from one synthetic pair to the reference
protocol's shape: multiple scenes x many pairs, a low-overlap
(3DLoMatch-analog) split, a keynum sweep (Appendix Table 2 analog), all
run through ``Evaluator.run`` so the FMR/IR, RR_pointdsc,
RR_predator/gt.info, results.log and pre.log paths are exercised with the
trained ``checkpoints_quality/`` weights — plus the pose-graph-sync probe
on a >=3-pair scene (BASELINE.json pose-graph refinement clause).

Reference bar: test/evaluator.py:50-101 (FMR/IR/RR per scene) +
utils/RR_cal.py:321 (Predator-protocol RR) + RoReg_Appendix Tables 1-2.

Scenes are synthesized fresh (seed 7) — NOT the rng stream the
checkpoints were trained on, so every number here is held-out.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/quality_benchmark.py [--keynums 1024,500,250]
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


VARIANTS = {
    # the reference's Appendix Table 2 ablation structure: each added
    # component (+RD, +RM, +ET one-shot) should lift RR over the previous
    "mutual_yohoc": dict(use_rd=False, use_rm=False, estimator="yohoc"),
    "rd_yohoc": dict(use_rd=True, use_rm=False, estimator="yohoc"),
    "rd_rm_yohoc": dict(use_rd=True, use_rm=True, estimator="yohoc"),
    "full_rd_rm_et_yohoo": dict(use_rd=True, use_rm=True, estimator="yohoo"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group_size", type=int, default=60)
    ap.add_argument("--keynums", default="1024,500,250")
    ap.add_argument("--scenes", type=int, default=4,
                    help="scenes PER SPLIT (hi + lo overlap)")
    ap.add_argument("--clouds", type=int, default=7,
                    help="clouds per scene (all-pairs: 7 clouds = 21 "
                         "pairs/scene -> 168 held-out pairs at defaults)")
    ap.add_argument("--lo_overlap", type=float, default=0.45)
    ap.add_argument("--variants", default="all",
                    help="comma list of chain variants, or 'all' / 'full'")
    ap.add_argument("--full", action="store_true",
                    help="protocol-shape config (voxel 0.025, 20k-pt "
                         "clouds, quality_full_config) + the full-size "
                         "checkpoints; default is the small config")
    ap.add_argument("--ckdir", default=None,
                    help="checkpoint dir (default: checkpoints_quality, "
                         "or checkpoints_quality_full with --full)")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    ap.add_argument("--out_key", default="benchmark",
                    help="top-level QUALITY.json key to write under")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the TPU (default: CPU backend)")
    args = ap.parse_args()
    if args.ckdir is None:
        args.ckdir = os.path.join(
            REPO,
            "checkpoints_quality_full" if args.full else "checkpoints_quality",
        )

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.eval.evaluator import Evaluator
    from roreg_tpu.pipeline.quality_config import (
        quality_full_config,
        quality_scene_params,
        quality_small_config,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    t0 = time.time()

    def log(msg):
        print(f"[qbench +{time.time() - t0:.0f}s] {msg}", flush=True)

    cfg = (quality_full_config if args.full else quality_small_config)(
        args.group_size
    )
    ppc, extent = quality_scene_params(small=not args.full)

    # config-tag guard (round-4 advisor finding: parameter shapes don't
    # depend on voxel_size, so a small/full checkpoint mix-up restores
    # silently and produces skewed numbers)
    tag_path = os.path.join(args.ckdir, "config_tag.json")
    if os.path.exists(tag_path):
        with open(tag_path) as f:
            tag = json.load(f)
        if tag.get("small") == args.full:
            raise SystemExit(
                f"checkpoint config mismatch: {tag_path} says "
                f"small={tag.get('small')} but --full={args.full}"
            )

    # ---- held-out benchmark scenes (fresh seed, not the training stream) ----
    rng = np.random.default_rng(7)
    root = os.path.join(
        REPO, "data",
        "quality_bench_scenes_full" if args.full else "quality_bench_scenes",
    )
    hi, lo = {}, {}
    for i in range(args.scenes):
        ds = make_synthetic_scene(
            os.path.join(root, f"scene{i}"), rng, num_clouds=args.clouds,
            points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
            overlap=0.75, max_angle_deg=50.0, surface_extent=extent,
        )
        ds.name = f"scene{i}"
        hi[ds.name] = ds
    for i in range(args.scenes):
        ds = make_synthetic_scene(
            os.path.join(root, f"lo_scene{i}"), rng, num_clouds=args.clouds,
            points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
            overlap=args.lo_overlap, max_angle_deg=50.0,
            surface_extent=extent,
        )
        ds.name = f"lo_scene{i}"
        lo[ds.name] = ds
    n_hi = sum(len(d.pair_ids) for d in hi.values())
    n_lo = sum(len(d.pair_ids) for d in lo.values())
    log(f"scenes built: {len(hi)} hi-overlap ({n_hi} pairs), "
        f"{len(lo)} low-overlap ({n_lo} pairs)")

    # ---- trained weights ----
    pipe = RegistrationPipeline(cfg, {})
    templates = pipe.init_variables(jax.random.PRNGKey(0))
    variables = load_pipeline_variables(args.ckdir, templates)
    missing = [c for c in ("backbone", "gf", "rd", "rm", "et")
               if c not in variables]
    if missing:
        raise SystemExit(f"missing checkpoints: {missing}")
    log(f"checkpoints restored (all 5 components, {args.ckdir})")

    if args.variants == "all":
        variants = dict(VARIANTS)
    elif args.variants == "full":
        variants = {"full_rd_rm_et_yohoo": VARIANTS["full_rd_rm_et_yohoo"]}
    else:
        variants = {v: VARIANTS[v] for v in args.variants.split(",")}

    out_dir = os.path.join(REPO, "data", "quality_bench_out")
    results = {"splits": {}}
    keynums = [int(k) for k in args.keynums.split(",")]
    # device-resident descriptor store shared across every variant and
    # keynum (describe is sampling-independent): each cloud is described
    # exactly once for the whole sweep
    desc_store = {}

    for vname, vflags in variants.items():
        vres = {}
        for keynum in keynums:
            for split, group in (
                ("3dmatch_analog", hi), ("3dlomatch_analog", lo)
            ):
                cfg_k = dataclasses.replace(cfg, keynum=keynum, **vflags)
                p = RegistrationPipeline(cfg_k, variables)
                ev = Evaluator(
                    p,
                    results_log=os.path.join(out_dir, "results.log"),
                    desc_store=desc_store,
                )
                datasets = dict(group)
                datasets["wholesetname"] = split
                summary = ev.run(datasets, out_dir, seed=keynum)
                summary.pop("stage_times", None)
                vres[f"{split}@{keynum}"] = summary
                log(f"{vname} {split}@{keynum}: FMR {summary['fmr']:.3f} "
                    f"IR {summary['ir']:.3f} RR {summary['rr_pointdsc']:.3f} "
                    f"RR_pred {summary['rr_predator']} "
                    f"({summary['pairs_per_sec']:.2f} pairs/s)")
        results["splits"][vname] = vres

    # ---- pose-sync probe on a >=3-pair scene (validate_quality's probe) ----
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vq", os.path.join(REPO, "scripts", "validate_quality.py")
    )
    vq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vq)
    sync_scene = next(iter(hi.values()))
    results["pose_sync"] = vq._eval_pose_sync(cfg, variables, sync_scene, log)

    results["wall_s"] = round(time.time() - t0, 1)
    results["config"] = {
        "full_config": bool(args.full), "voxel_size": cfg.voxel_size,
        "group_size": args.group_size, "keynums": keynums,
        "scenes_per_split": args.scenes, "clouds": args.clouds,
        "pairs_per_split": n_hi,
        "lo_overlap": args.lo_overlap,
        "variants": list(variants),
        "ckdir": os.path.basename(args.ckdir),
        "note": "held-out synthetic protocol benchmark via Evaluator.run "
                "(scripts/quality_benchmark.py); chain-variant ablation "
                "(Appendix Table 2 structure)",
    }

    try:
        with open(args.out) as f:
            q = json.load(f)
    except Exception:
        q = {}
    q[args.out_key] = results
    with open(args.out, "w") as f:
        json.dump(q, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
