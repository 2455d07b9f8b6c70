#!/usr/bin/env python
"""Measure RD self-run label parity: mutual-at-defaults vs RM-routed.

VERDICT r3 item 10: the claim that the reference's RD trainset chain at
its defaults (keynum=5000, RD off => the 'matmul' mutual matcher over all
keypoints, train/trainset/RD.py:61-73 + test/matcher.py:44-109) and the
RM-routed variant produce equivalent supervision has only ever been an
equivalence ARGUMENT. This script measures it: build the RD match bank
through BOTH routes on the same held-out scene with the trained
checkpoints, compute the reference label (quaternion-space SE(3) distance,
dataops/dataloader.py:112-123) for every match, and report distribution
agreement. Appends the numbers to QUALITY.json under ``rd_label_parity``.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/rd_label_parity.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _labels_from_bank(bank):
    """Reference RD label per match (rdiff + tdiff/3) over a whole bank."""
    import numpy as np

    from roreg_tpu.train.data import _np_quat_from_matrix

    out = []
    for entry in bank:
        gt_q = _np_quat_from_matrix(entry["T_gt"][:3, :3])
        qs = np.stack(
            [_np_quat_from_matrix(t[:3, :3]) for t in entry["T_pre"]]
        )
        sgn = np.where((qs * gt_q).sum(-1, keepdims=True) < 0, -1.0, 1.0)
        rdiff = np.sqrt(((qs * sgn - gt_q) ** 2).sum(-1))
        tdiff = ((entry["T_pre"][:, :3, 3] - entry["T_gt"][:3, 3]) ** 2).sum(-1)
        out.append(rdiff + tdiff / 3.0)
    return np.concatenate(out)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.pipeline.quality_config import (
        quality_scene_params,
        quality_small_config,
    )
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables
    from roreg_tpu.train.selfrun import build_rd_match_bank

    t0 = time.time()

    def log(msg):
        print(f"[rdparity +{time.time() - t0:.0f}s] {msg}", flush=True)

    cfg = quality_small_config()
    ppc, extent = quality_scene_params(small=True)
    rng = np.random.default_rng(11)
    ds = make_synthetic_scene(
        os.path.join(REPO, "data", "quality_bench_scenes", "rd_parity"),
        rng, num_clouds=3, points_per_cloud=ppc,
        num_keypoints=cfg.num_keypoints, overlap=0.8, max_angle_deg=50.0,
        surface_extent=extent,
    )
    ds.name = "rd_parity"

    pipe_tpl = RegistrationPipeline(cfg, {})
    templates = pipe_tpl.init_variables(jax.random.PRNGKey(0))
    variables = load_pipeline_variables(
        os.path.join(REPO, "checkpoints_quality"), templates
    )
    log("checkpoints restored")

    stats = {}
    banks = {}
    for route, use_rm in (("mutual_defaults", False), ("rm_routed", True)):
        pipe = RegistrationPipeline(
            dataclasses.replace(
                cfg, use_rd=False, use_rm=use_rm, estimator="yohoc"
            ),
            dict(variables),
        )
        bank = build_rd_match_bank(pipe, [ds], seed=7)
        labels = _labels_from_bank(bank)
        banks[route] = labels
        # the RD loss consumes score-weighted labels; what matters for
        # supervision equivalence is the shape of the label distribution
        stats[route] = {
            "n_matches": int(labels.size),
            "mean": float(labels.mean()),
            "std": float(labels.std()),
            "median": float(np.median(labels)),
            "frac_good": float((labels < 0.3).mean()),  # ~<15 deg rot err
            "p10": float(np.percentile(labels, 10)),
            "p90": float(np.percentile(labels, 90)),
        }
        log(f"{route}: {stats[route]}")

    # distribution agreement: two-sample KS statistic (no scipy needed)
    a = np.sort(banks["mutual_defaults"])
    b = np.sort(banks["rm_routed"])
    grid = np.union1d(a, b)
    cdf_a = np.searchsorted(a, grid, side="right") / a.size
    cdf_b = np.searchsorted(b, grid, side="right") / b.size
    ks = float(np.abs(cdf_a - cdf_b).max())
    stats["ks_statistic"] = ks
    log(f"KS statistic between routes: {ks:.4f}")

    out_path = os.path.join(REPO, "QUALITY.json")
    try:
        with open(out_path) as f:
            q = json.load(f)
    except Exception:
        q = {}
    q["rd_label_parity"] = stats
    with open(out_path, "w") as f:
        json.dump(q, f, indent=2)
    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
