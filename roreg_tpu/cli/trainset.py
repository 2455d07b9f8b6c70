"""Trainset pre-generation CLI — the ``trainset.py`` equivalent.

    python -m roreg_tpu.cli.trainset --component GF --num_batches 1000 \
        --out_dir ./data/trainset_cache

The framework's trainers synthesize batches on the fly (train/data.py), so
pre-generation is optional; this tool persists batches as .npz files for
environments where the backbone pass shouldn't run inside the training
loop (the reference materializes the same caches as pickled torch files,
train/trainset/*.py). Dispatch mirrors reference trainset.py:16-32.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--component", required=True, choices=["GF", "ET", "RM"])
    p.add_argument("--data_root", default="./data/origin_data")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--out_dir", default="./data/trainset_cache")
    p.add_argument("--num_batches", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--group_size", type=int, default=60)
    p.add_argument("--synthetic_scenes", type=int, default=4)
    p.add_argument("--voxel_size", type=float, default=0.025)
    # PCA-planarity keypoint filter for GF/ET (GF_ET.py:34-67); the
    # reference's --pca_thre (parses_train_gf.py:44), <=0 disables
    p.add_argument("--pca_thre", type=float, default=0.03)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from roreg_tpu.cli.train import _build_scenes
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables
    from roreg_tpu.train.data import RotatedFeatureCache, gf_et_batches, rm_batches

    comp = args.component.lower()
    pcfg = PipelineConfig(
        voxel_size=args.voxel_size, group_size=args.group_size,
        num_keypoints=1024,
    )
    pipe = RegistrationPipeline(pcfg, {})
    pipe.init_variables(jax.random.PRNGKey(args.seed))
    pipe.variables.update(
        load_pipeline_variables(args.checkpoint_dir, pipe.variables)
    )
    scenes = _build_scenes(args)
    rng = np.random.default_rng(args.seed + 1)

    out = os.path.join(args.out_dir, comp)
    os.makedirs(out, exist_ok=True)
    if comp in ("gf", "et"):
        cache = RotatedFeatureCache(pcfg, pipe.variables["backbone"])
        it = gf_et_batches(
            cache, scenes, args.batch_size, rng,
            pca_thre=args.pca_thre if args.pca_thre > 0 else None,
        )
    else:
        from roreg_tpu.pipeline.extractor import extract
        from roreg_tpu.pipeline.registration import gf_apply
        import jax.numpy as jnp

        gf_feats = {}
        for ds in scenes:
            for pc_id in ds.pc_ids:
                pc = ds.get_pc(pc_id).astype(np.float32)
                kp = ds.get_kps(pc_id).astype(np.float32)
                bb = extract(pipe.variables["backbone"], pc, None, kp, pcfg)
                gf_feats[(ds.name, pc_id)] = np.asarray(
                    gf_apply(pipe.variables["gf"], bb, pcfg)
                )
        it = rm_batches(gf_feats, scenes, rng, min_ps=256, max_ps=1024,
                        capacity=1024, group_size=args.group_size)

    for i in range(args.num_batches):
        batch = next(it)
        np.savez_compressed(
            os.path.join(out, f"{i}.npz"),
            **{k: np.asarray(v) for k, v in batch.items()},
        )
    print(json.dumps({"component": comp, "batches": args.num_batches,
                      "dir": out}))


if __name__ == "__main__":
    main()
