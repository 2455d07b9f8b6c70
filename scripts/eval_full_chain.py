#!/usr/bin/env python
"""Evaluate the FULL chain (RD+RM+ET yohoo, plus the mutual/yohoc
baseline and the pose-sync probe) from the saved checkpoints_quality/
weights, without any training. Regenerates the deterministic synthetic
scenes (same rng stream as validate_quality.py --small) and runs
validate_quality._eval_chain on the held-out test scene, merging the
result into QUALITY.json's ``full_chain`` field.

Reference bar: test/evaluator.py:103-145 (FMR/IR/RR out of the full
--RD --RM --ET yohoo chain)."""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group_size", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    ap.add_argument("--ckdir", default=os.path.join(REPO, "checkpoints_quality"))
    ap.add_argument("--full", action="store_true",
                    help="evaluate under quality_full_config (use with a "
                         "--ckdir trained at full size; the config tag is "
                         "checked either way)")
    ap.add_argument("--merge_key", default="full_chain",
                    help="QUALITY.json key to write the result under")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene

    t0 = time.time()

    def log(msg):
        print(f"[evalchain +{time.time() - t0:.0f}s] {msg}", flush=True)

    # the canonical config the checkpoints were trained under — shared
    # with validate_quality.py / resume_full_chain.py so it can never
    # silently desynchronize (round-3 advisor finding)
    from roreg_tpu.pipeline.quality_config import (
        quality_full_config,
        quality_scene_params,
        quality_small_config,
    )

    cfg = (quality_full_config if args.full else quality_small_config)(
        args.group_size
    )
    ppc, extent = quality_scene_params(small=not args.full)

    # parameter shapes don't depend on voxel_size/capacities, so restoring
    # a full-size-trained checkpoint under the small config would succeed
    # silently and produce skewed numbers (round-4 advisor finding) —
    # check the tag validate_quality.py saves alongside the weights
    tag_fn = os.path.join(args.ckdir, "config_tag.json")
    if os.path.exists(tag_fn):
        with open(tag_fn) as f:
            tag = json.load(f)
        if tag.get("voxel_size") != cfg.voxel_size or (
            tag.get("group_size") != cfg.group_size
        ):
            raise SystemExit(
                f"checkpoint config tag {tag} does not match the evaluation "
                f"config (voxel {cfg.voxel_size}, group {cfg.group_size}) — "
                "pass --full / --group_size to match the training run"
            )

    # same rng stream as validate_quality.main: N train scenes then test.
    # The scene-stream knobs ride in the config tag; default to the
    # historical 3 hi-overlap x 3-cloud layout when no tag exists.
    n_scenes = tag.get("n_scenes", 3) if os.path.exists(tag_fn) else 3
    n_lo = tag.get("n_lo_scenes", 0) if os.path.exists(tag_fn) else 0
    clouds = tag.get("clouds", 3) if os.path.exists(tag_fn) else 3
    lo_overlap = tag.get("lo_overlap", 0.5) if os.path.exists(tag_fn) else 0.5
    rng = np.random.default_rng(0)
    root = os.path.join(REPO, "data", "quality_scenes")
    for i in range(n_scenes + n_lo):
        make_synthetic_scene(
            os.path.join(root, f"scene{i}"), rng, num_clouds=clouds,
            points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
            overlap=0.8 if i < n_scenes else lo_overlap,
            max_angle_deg=50.0, surface_extent=extent,
        )
    test_scene = make_synthetic_scene(
        os.path.join(root, "test"), rng, num_clouds=2,
        points_per_cloud=ppc, num_keypoints=cfg.num_keypoints,
        overlap=0.8, max_angle_deg=40.0, surface_extent=extent,
    )
    test_scene.name = "test"
    log("scenes rebuilt (deterministic)")

    # template-checked restore through the repo helper: failures surface
    # as clear per-path shape mismatches instead of orbax topology errors
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    pipe = RegistrationPipeline(cfg, {})
    templates = pipe.init_variables(jax.random.PRNGKey(0))
    ckdir = args.ckdir
    variables = load_pipeline_variables(ckdir, templates)
    missing = [c for c in ("backbone", "gf", "rd", "rm", "et")
               if c not in variables]
    if missing:
        raise SystemExit(f"missing checkpoints for {missing} under {ckdir}")
    log("all five component checkpoints restored")

    spec = importlib.util.spec_from_file_location(
        "vq", os.path.join(REPO, "scripts", "validate_quality.py")
    )
    vq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vq)

    full_chain = vq._eval_chain(cfg, variables, test_scene, log)

    try:
        with open(args.out) as f:
            out = json.load(f)
    except Exception:
        out = {"config": {}, "pairs": [], "rr": None}
    out[args.merge_key] = full_chain
    # append provenance without destroying the existing config.note
    # (it documents how the baseline 'pairs' were produced)
    out[f"{args.merge_key}_note"] = (
        f"full chain evaluated from {os.path.basename(ckdir)}/ "
        "(scripts/eval_full_chain.py)"
    )
    out[f"{args.merge_key}_wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
