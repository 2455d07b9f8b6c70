#!/usr/bin/env python
"""Resume the RM/ET/RD full-chain training + evaluation from the saved
backbone/GF checkpoints (checkpoints_quality/), skipping the ~2.5 h
backbone+GF phases. Rewrites QUALITY.json with full_chain results on
success. Mirrors validate_quality._train_full_chain/_eval_chain."""

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
    ap.add_argument("--steps_rm", type=int, default=300)
    ap.add_argument("--steps_et", type=int, default=400)
    ap.add_argument("--steps_rd", type=int, default=300)
    ap.add_argument("--group_size", type=int, default=60)
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import orbax.checkpoint as ocp

    from roreg_tpu.data.dataset import ThreeDMatchDataset

    t0 = time.time()

    def log(msg):
        print(f"[resume +{time.time() - t0:.0f}s] {msg}", flush=True)

    from roreg_tpu.pipeline.quality_config import quality_small_config

    cfg = quality_small_config(args.group_size)
    ck = ocp.StandardCheckpointer()
    ckdir = os.path.join(REPO, "checkpoints_quality")
    backbone_vars = ck.restore(os.path.abspath(f"{ckdir}/backbone_variables"))
    gf_vars = ck.restore(os.path.abspath(f"{ckdir}/gf_variables"))
    log("backbone/GF checkpoints restored")

    root = os.path.join(REPO, "data", "quality_scenes")
    scenes = [
        ThreeDMatchDataset(os.path.join(root, f"scene{i}"), 3)
        for i in range(3)
    ]
    for i, s in enumerate(scenes):
        s.name = f"scene{i}"
    test_scene = ThreeDMatchDataset(os.path.join(root, "test"), 2)
    test_scene.name = "test"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vq", os.path.join(REPO, "scripts", "validate_quality.py")
    )
    vq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vq)

    rng = np.random.default_rng(1)
    trained = {"backbone": backbone_vars, "gf": gf_vars}
    trained.update(
        vq._train_full_chain(args, cfg, scenes, backbone_vars, gf_vars, rng, log)
    )
    full_chain = vq._eval_chain(cfg, trained, test_scene, log)

    # merge into the existing QUALITY.json (keeps the baseline numbers)
    try:
        with open(args.out) as f:
            out = json.load(f)
    except Exception:
        out = {"config": {}, "pairs": [], "rr": None}
    out["full_chain"] = full_chain
    out["config"]["note"] = (
        "baseline chain + full chain; RM/ET/RD resumed from checkpoints "
        "(scripts/resume_full_chain.py)"
    )
    out["full_chain_wall_s"] = round(time.time() - t0, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
