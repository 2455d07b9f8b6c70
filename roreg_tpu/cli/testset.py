"""Backbone group-feature pre-extraction CLI — the ``testset.py`` equivalent.

    python -m roreg_tpu.cli.testset --dataset 3dmatch --voxel_size 0.025 \
        --origin_data_dir ./data/origin_data --outdir ./data/eval_output

Extracts the (num_keypoints, G, 32) backbone group feature of every cloud
in the named dataset and stores it in the evaluator's descriptor cache
(npz per cloud) — so a later ``cli.test`` run skips extraction. The
reference streams this through a torch DataLoader into .npy caches
(testset.py:60-194); here it is the pipeline's describe path.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="demo")
    p.add_argument("--origin_data_dir", default="./data/origin_data")
    p.add_argument("--outdir", default="./data/eval_output")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--voxel_size", type=float, default=0.025)
    p.add_argument("--group_size", type=int, default=60)
    p.add_argument("--random_init", action="store_true")
    args = p.parse_args(argv)

    import jax

    from roreg_tpu.data.dataset import get_dataset_group
    from roreg_tpu.eval.evaluator import Evaluator
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    cfg = PipelineConfig(
        voxel_size=args.voxel_size, group_size=args.group_size
    )
    pipe = RegistrationPipeline(cfg, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    if not args.random_init:
        pipe.variables.update(
            load_pipeline_variables(args.checkpoint_dir, pipe.variables)
        )
    ev = Evaluator(pipe, cache_dir=os.path.join(args.outdir, "desc_cache"))
    datasets = get_dataset_group(args.dataset, args.origin_data_dir)
    n = 0
    for name, ds in datasets.items():
        if isinstance(ds, str):
            continue
        for pc_id in ds.pc_ids:
            ev.describe_cloud(ds, pc_id)
            n += 1
    print(f"extracted {n} clouds into {args.outdir}/desc_cache")


if __name__ == "__main__":
    main()
