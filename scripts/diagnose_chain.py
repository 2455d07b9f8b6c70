#!/usr/bin/env python
"""Isolate which component breaks the full chain (RD / RM / ET / yohoo).

Round-4 triage: the resumed full-chain weights scored RR 0.0 while the
mutual+yohoc baseline scores RR 1.0 from the same backbone/GF. Evaluate
every intermediate chain on the held-out scene so the failing component
is identified by measurement, not guess:

  mutual_yohoc     — baseline (RD off, RM off, coarse estimator)
  mutual_yohoo     — adds ET one-shot estimation only
  rd_mutual_yohoc  — adds RD NMS sampling only
  rm_yohoc         — adds RM matching only
  full             — RD + RM + ET yohoo (the flagship)

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/diagnose_chain.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.eval.evaluator import Evaluator
    from roreg_tpu.pipeline.quality_config import (
        quality_scene_params,
        quality_small_config,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    t0 = time.time()

    def log(msg):
        print(f"[diag +{time.time() - t0:.0f}s] {msg}", flush=True)

    cfg = quality_small_config()
    ppc, extent = quality_scene_params(small=True)

    # same rng stream as validate_quality.main: 3 train scenes then test
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
    test_scene.name = "test"

    pipe0 = RegistrationPipeline(cfg, {})
    templates = pipe0.init_variables(jax.random.PRNGKey(0))
    variables = load_pipeline_variables(
        os.path.join(REPO, "checkpoints_quality"), templates
    )
    log("checkpoints restored")

    chains = {
        "mutual_yohoc": dict(use_rd=False, use_rm=False, estimator="yohoc"),
        "mutual_yohoo": dict(use_rd=False, use_rm=False, estimator="yohoo"),
        "rd_mutual_yohoc": dict(use_rd=True, use_rm=False, estimator="yohoc"),
        "rm_yohoc": dict(use_rd=False, use_rm=True, estimator="yohoc"),
        "full": dict(use_rd=True, use_rm=True, estimator="yohoo"),
    }
    out = {}
    for name, flags in chains.items():
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
        }
        log(f"{name}: {out[name]}")
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
