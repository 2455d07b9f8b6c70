#!/usr/bin/env python
"""Measure rot_vmap (rotations vmapped together per block-engine stage)
on the real chip at bench capacities — VERDICT r4 item 5.

History: round-3 measured rot_vmap=5 as a 1.7x pessimization, but that
was under the old 111 ms/rotation engine whose numbers were later
partially retracted as host-sync artifacts (docs/perf_ground_truth.md,
"Superseded claims"). This re-measures under the current engine
(dense-GEMM conv1, ~24 ms/rotation) with the production dispatch path
and readback-forced timing.

Run (TPU, single-tenant): python scripts/experiment_rot_vmap.py [--values 1,5]
Each value != 1 compiles a fresh chunk program (~8 min remote, cached).
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
    ap.add_argument("--values", default="1,5")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.extractor import (
        build_cloud_payloads,
        dispatch_cloud_payloads,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    t0 = time.time()

    def log(m):
        print(f"[rot_vmap +{time.time() - t0:.0f}s] {m}", flush=True)

    base = PipelineConfig(
        voxel_size=0.025,
        capacities=(32768, 16384, 8192, 4096),
        block_caps=(2880, 832, 240, 80),
        block_caps_fallback=(3072, 1024, 512, 256),
        conv1_kernel_size=7,
        group_chunk=10,
        num_keypoints=5000,
        keynum=1000,
    )  # == bench.py config
    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="roreg_rv_")
    scene = make_synthetic_scene(
        os.path.join(tmp, "scene"), rng, num_clouds=2,
        points_per_cloud=20000, num_keypoints=base.num_keypoints,
        overlap=0.75, max_angle_deg=40.0,
    )
    pc = scene.get_pc(0).astype(np.float32)
    kp = scene.get_kps(0).astype(np.float32)

    pipe = RegistrationPipeline(base, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    bb_vars = jax.device_put(pipe.variables["backbone"], jax.devices()[0])
    jax.block_until_ready(bb_vars)

    payload, key_rows, caps = build_cloud_payloads(pc, kp, base)
    log(f"payload built (caps={caps})")

    results = {}
    for rv in (int(v) for v in args.values.split(",")):
        cfg = dataclasses.replace(base, rot_vmap=rv)
        log(f"rot_vmap={rv}: compiling/warming...")
        tC = time.time()
        out = dispatch_cloud_payloads(bb_vars, payload, key_rows, caps, cfg)
        float(np.asarray(out.reshape(-1)[:1])[0])
        warm_s = time.time() - tC
        times = []
        for _ in range(args.reps):
            t1 = time.time()
            out = dispatch_cloud_payloads(bb_vars, payload, key_rows, caps, cfg)
            float(np.asarray(out.reshape(-1)[:1])[0])
            times.append(time.time() - t1)
        best = min(times)
        results[rv] = {
            "cloud_s": round(best, 3),
            "ms_per_rotation": round(best / cfg.group_size * 1e3, 2),
            "first_call_s": round(warm_s, 1),
        }
        log(f"rot_vmap={rv}: {best:.3f} s/cloud "
            f"({best / cfg.group_size * 1e3:.1f} ms/rotation), "
            f"reps={[round(t, 3) for t in times]}")

    print(json.dumps({"rot_vmap_sweep": results}))


if __name__ == "__main__":
    main()
