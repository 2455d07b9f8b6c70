"""Evaluation CLI — the ``Test.py`` equivalent.

    python -m roreg_tpu.cli.test --testset 3dmatch --RD --RM --ET yohoo \
        --keynum 1000 --max_iter 1000 --origin_data_dir ./data/origin_data

Flags mirror reference ``Test.py:7-17`` / ``parses/parses_test.py``. With
``--testset synthetic`` a hermetic synthetic scene group is generated, so
the full pipeline can be evaluated without 3DMatch downloads.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def get_parser():
    p = argparse.ArgumentParser(description="roreg_tpu evaluation")
    p.add_argument("--testset", default="demo",
                   choices=["demo", "3dmatch", "3dLomatch", "ETH", "WHU-TLS",
                            "synthetic"])
    p.add_argument("--origin_data_dir", default="./data/origin_data")
    p.add_argument("--output_dir", default="./data/eval_output")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--RD", action="store_true", help="use rotation detector")
    p.add_argument("--RM", action="store_true", help="use rotation matcher")
    p.add_argument("--ET", default="yohoo", choices=["yohoo", "yohoc"])
    p.add_argument("--keynum", type=int, default=1000)
    p.add_argument("--max_iter", type=int, default=1000)
    # None = "apply the per-testset preset" (reference Test.py:7-17,
    # README.md:141-177: ETH / WHU-TLS run at voxel 0.15, ransac inlier
    # distance 0.5, tau_2 0.2, tau_3 0.5); explicit flags always win
    p.add_argument("--ransac_d", type=float, default=None)
    p.add_argument("--tau_1", type=float, default=0.05)
    p.add_argument("--tau_2", type=float, default=None)
    p.add_argument("--tau_3", type=float, default=None)
    p.add_argument("--voxel_size", type=float, default=None)
    p.add_argument("--group_size", type=int, default=60)
    p.add_argument("--random_init", action="store_true",
                   help="random weights (pipeline smoke/perf runs)")
    return p


# per-testset evaluation presets (reference Test.py:7-17, README.md:141-177);
# 3DMatch-family defaults fill whatever the preset leaves unset
_TESTSET_PRESETS = {
    "ETH": dict(voxel_size=0.15, ransac_d=0.5, tau_2=0.2, tau_3=0.5),
    "WHU-TLS": dict(voxel_size=0.15, ransac_d=0.5, tau_2=0.2, tau_3=0.5),
}
_GLOBAL_DEFAULTS = dict(voxel_size=0.025, ransac_d=0.1, tau_2=0.1, tau_3=0.2)


def apply_testset_presets(args):
    """Fill unset (None) eval flags from the testset's preset, then the
    3DMatch-family defaults. ``--testset ETH`` with no extra flags now
    reproduces the reference's documented ETH configuration."""
    preset = _TESTSET_PRESETS.get(args.testset, {})
    for k, v in _GLOBAL_DEFAULTS.items():
        if getattr(args, k) is None:
            setattr(args, k, preset.get(k, v))
    return args


def load_pipeline(args):
    import jax

    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    cfg = PipelineConfig(
        voxel_size=args.voxel_size,
        group_size=args.group_size,
        keynum=args.keynum,
        max_iter=args.max_iter,
        ransac_ird=args.ransac_d,
        use_rd=args.RD,
        use_rm=args.RM,
        estimator=args.ET,
        tau_1=args.tau_1,
        tau_2=args.tau_2,
        tau_3=args.tau_3,
    )
    pipe = RegistrationPipeline(cfg, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    if not args.random_init:
        loaded = load_pipeline_variables(args.checkpoint_dir, pipe.variables)
        pipe.variables.update(loaded)
    return pipe


def main(argv=None):
    args = apply_testset_presets(get_parser().parse_args(argv))
    from roreg_tpu.data.dataset import get_dataset_group
    from roreg_tpu.eval.evaluator import Evaluator

    if args.testset == "synthetic":
        import numpy as np

        from roreg_tpu.data.synthetic import make_synthetic_scene

        root = os.path.join(args.origin_data_dir, "synthetic", "scene0")
        if not os.path.exists(root):
            make_synthetic_scene(
                root, np.random.default_rng(0), num_clouds=4,
                points_per_cloud=20000, num_keypoints=5000,
            )
        from roreg_tpu.data.dataset import ThreeDMatchDataset

        ds = ThreeDMatchDataset(root, 4)
        ds.name = "synthetic/scene0"
        datasets = {"wholesetname": "synthetic", "scene0": ds}
    else:
        datasets = get_dataset_group(args.testset, args.origin_data_dir)

    pipe = load_pipeline(args)
    ev = Evaluator(
        pipe,
        cache_dir=os.path.join(args.output_dir, "desc_cache"),
        results_log=os.path.join(args.output_dir, "results.log"),
    )
    summary = ev.run(datasets, args.output_dir)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
