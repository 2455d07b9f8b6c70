"""Scene/dataset evaluator: orchestrates describe -> register over scenes,
computes FMR / IR / RR (PointDSC + Predator protocols), writes results.log.

Equivalent of reference ``test/evaluator.py`` (``yoho_evaluator``:13-145),
minus the .npy cache plumbing: per-cloud descriptors are computed once and
held in RAM (optionally spilled to an npz cache dir), pairs stream through
the jitted pipeline.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.data.dataset import ThreeDMatchDataset
from roreg_tpu.eval.benchmark import benchmark_scenes, write_trajectory
from roreg_tpu.eval.metrics import fmr_ir, registration_errors
from roreg_tpu.pipeline.registration import RegistrationPipeline

__all__ = ["Evaluator"]


@dataclass
class Evaluator:
    pipeline: RegistrationPipeline
    cache_dir: str | None = None  # optional npz spill dir for descriptors
    results_log: str | None = None

    def __post_init__(self):
        from roreg_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()

    def describe_cloud(self, ds: ThreeDMatchDataset, pc_id):
        """-> (bb (K,G,32), gf (K,G,32), det (K,)) with optional disk cache."""
        cache_fn = None
        if self.cache_dir:
            cache_fn = os.path.join(
                self.cache_dir, ds.name.replace("/", "_"), f"{pc_id}.npz"
            )
            if os.path.exists(cache_fn):
                z = np.load(cache_fn)
                return (
                    jnp.asarray(z["bb"]), jnp.asarray(z["gf"]),
                    jnp.asarray(z["det"]),
                )
        pc = jnp.asarray(ds.get_pc(pc_id).astype(np.float32))
        kp = jnp.asarray(ds.get_kps(pc_id).astype(np.float32))
        with self.timer.stage("describe"):
            bb, gf = self.pipeline.describe(pc, jnp.ones(pc.shape[0], bool), kp)
        with self.timer.stage("detect", block_on=None):
            det = self.pipeline.detect(gf, jnp.ones(kp.shape[0], bool))
        self.timer.block("describe_wait", (bb, gf, det))
        if cache_fn:
            os.makedirs(os.path.dirname(cache_fn), exist_ok=True)
            np.savez(
                cache_fn, bb=np.asarray(bb), gf=np.asarray(gf),
                det=np.asarray(det),
            )
        return bb, gf, det

    def process_scene(self, ds: ThreeDMatchDataset, seed: int = 0) -> dict:
        """Register every pair of a scene; returns per-scene results."""
        cfg = self.pipeline.cfg
        from roreg_tpu.pipeline.registration import register_pair_from_descriptors

        desc = {}
        for pc_id in ds.pc_ids:
            desc[pc_id] = self.describe_cloud(ds, pc_id)

        results = {"pairs": [], "transforms": [], "fmr": [], "ir": [],
                   "rr": [], "rre": [], "rte": []}
        for k, (id0, id1) in enumerate(ds.pair_ids):
            bb0, gf0, det0 = desc[id0]
            bb1, gf1, det1 = desc[id1]
            kp0 = jnp.asarray(ds.get_kps(id0).astype(np.float32))
            kp1 = jnp.asarray(ds.get_kps(id1).astype(np.float32))
            key = jax.random.PRNGKey(seed * 100003 + k)

            out = register_pair_from_descriptors(
                self.pipeline.variables, cfg, key,
                bb0, gf0, det0, kp0, bb1, gf1, det1, kp1,
            )
            T = out["transform"]
            self.timer.block("match_estimate", T)
            T_np = np.asarray(T)
            T_gt = ds.get_transform(id0, id1)
            keys_m0 = np.asarray(kp0[out["sample0"]][out["m0"]])
            keys_m1 = np.asarray(kp1[out["sample1"]][out["m1"]])
            fmr, ir = fmr_ir(
                keys_m0, keys_m1, np.asarray(out["est_valid"]),
                T_gt, cfg.tau_1, cfg.tau_2,
            )
            rre, rte = registration_errors(T_np, T_gt)
            ok = float(rre < cfg.rr_rot_deg and rte < cfg.rr_trans)
            results["pairs"].append((int(id0), int(id1)))
            results["transforms"].append(T_np)
            results["fmr"].append(fmr)
            results["ir"].append(ir)
            results["rr"].append(ok)
            if ok:
                results["rre"].append(rre)
                results["rte"].append(rte)
        return results

    def run(self, datasets: dict, out_dir: str, seed: int = 0) -> dict:
        """Evaluate a named dataset group; returns the summary dict and
        appends a results.log block (evaluator.py:131-145)."""
        os.makedirs(out_dir, exist_ok=True)
        fmrs, irs, rrs, rres, rtes = [], [], [], [], []
        scene_results = {}
        t0 = time.time()
        n_pairs = 0
        for name, ds in datasets.items():
            if not isinstance(ds, ThreeDMatchDataset):
                continue
            res = self.process_scene(ds, seed)
            n_pairs += len(res["pairs"])
            fmrs.append(np.mean(res["fmr"]))
            irs.append(np.mean(res["ir"]))
            rrs.append(np.mean(res["rr"]))
            rres.append(np.mean(res["rre"]) if res["rre"] else 180.0)
            rtes.append(np.mean(res["rte"]) if res["rte"] else 1.0)
            # write pre.log for the Predator protocol
            pre_dir = os.path.join(out_dir, ds.name.replace("/", "_"))
            os.makedirs(pre_dir, exist_ok=True)
            write_trajectory(
                res["pairs"], res["transforms"],
                os.path.join(pre_dir, "pre.log"), len(ds.pc_ids),
            )
            if os.path.exists(ds.gt_info):
                scene_results[name] = dict(
                    gt_log=ds.gt_log, gt_info=ds.gt_info,
                    est_pairs=np.asarray(res["pairs"]),
                    est_traj=np.stack(res["transforms"]),
                )
        elapsed = time.time() - t0
        rr_predator = None
        if scene_results:
            rr_predator, _ = benchmark_scenes(
                scene_results, err2=self.pipeline.cfg.tau_3,
                nonconsecutive=datasets.get("wholesetname") != "WHU-TLS",
            )
        summary = {
            "fmr": float(np.mean(fmrs)),
            "ir": float(np.mean(irs)),
            "rr_pointdsc": float(np.mean(rrs)),
            "rre": float(np.mean(rres)),
            "rte": float(np.mean(rtes)),
            "rr_predator": rr_predator,
            "pairs": n_pairs,
            "pairs_per_sec": n_pairs / max(elapsed, 1e-9),
            "stage_times": self.timer.summary(),
        }
        if self.results_log:
            cfg = self.pipeline.cfg
            name = datasets.get("wholesetname", "?")
            msg = (
                f"{name}-RD:{cfg.use_rd}-RM:{cfg.use_rm}-{cfg.estimator}-"
                f"{cfg.keynum}keys-{cfg.max_iter}iters\n"
                + "\n".join(f"{k}: {v}" for k, v in summary.items())
            )
            with open(self.results_log, "a") as f:
                f.write(msg + "\n")
        return summary
