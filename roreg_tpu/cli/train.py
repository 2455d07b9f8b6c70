"""Training CLI — the ``Train.py`` equivalent.

    python -m roreg_tpu.cli.train --component GF --data_root ./data \
        --steps 100000 --checkpoint_dir ./checkpoints

Components: GF (descriptor), RD (detector), RM (matcher), ET (local
rotation). With ``--synthetic`` scenes are generated on the fly; with a
real 3DMatch-format ``--data_root`` the same generators read real scans.
Dispatch mirrors reference ``Train.py:16-41``.
"""

from __future__ import annotations

import argparse
import json
import os


def get_parser():
    p = argparse.ArgumentParser(description="roreg_tpu training")
    p.add_argument("--component", required=True,
                   choices=["GF", "RD", "RM", "ET", "backbone"])
    p.add_argument("--data_root", default="./data/origin_data")
    p.add_argument("--trainset", default="synthetic")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--val_interval", type=int, default=None,
                   help="steps between validation passes (default: "
                        "component's reference setting)")
    p.add_argument("--val_batches", type=int, default=4,
                   help="held-out batches for the best-checkpoint gate "
                        "(0 disables validation)")
    p.add_argument("--group_size", type=int, default=60)
    p.add_argument("--synthetic_scenes", type=int, default=4)
    p.add_argument("--voxel_size", type=float, default=0.025)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel over a device mesh (0 = single)")
    return p


def _build_scenes(args):
    import numpy as np

    from roreg_tpu.data.synthetic import make_synthetic_scene

    rng = np.random.default_rng(args.seed)
    scenes = []
    for i in range(args.synthetic_scenes):
        root = os.path.join(args.data_root, "synthetic_train", f"scene{i}")
        from roreg_tpu.data.dataset import ThreeDMatchDataset

        if os.path.exists(f"{root}/PointCloud/gt.log"):
            ds = ThreeDMatchDataset(root, 3)
        else:
            ds = make_synthetic_scene(
                root, rng, num_clouds=3, points_per_cloud=20000,
                num_keypoints=1024,
            )
        ds.name = f"synthetic_train/scene{i}"
        scenes.append(ds)
    return scenes


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    import numpy as np

    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables
    from roreg_tpu.train.data import (
        RotatedFeatureCache,
        gf_et_batches,
        rm_batches,
    )
    from roreg_tpu.train.trainer import TrainConfig, Trainer

    comp = args.component.lower()
    pcfg = PipelineConfig(
        voxel_size=args.voxel_size, group_size=args.group_size,
        num_keypoints=1024,
    )

    if comp == "backbone":
        from roreg_tpu.train.backbone import (
            backbone_pair_batches,
            make_backbone_train_step,
        )
        from roreg_tpu.train.checkpoints import save_variables

        scenes = _build_scenes(args)
        rng = np.random.default_rng(args.seed + 1)
        init_fn, step_fn = make_backbone_train_step(pcfg)
        it = backbone_pair_batches(scenes, pcfg, rng)
        batch = next(it)
        state = init_fn(jax.random.PRNGKey(args.seed), batch)
        steps = args.steps or 20000
        for i in range(steps):
            state, m = step_fn(state, batch)
            if (i + 1) % 200 == 0:
                print(f"step {i+1} loss {float(m['loss']):.4f} "
                      f"pos {float(m['pos_dist']):.3f} neg {float(m['neg_dist']):.3f}")
            batch = next(it)
        save_variables(
            os.path.join(args.checkpoint_dir, "backbone_variables"),
            {"params": state["params"], "batch_stats": state["batch_stats"]},
        )
        print(json.dumps({"final_step": steps}))
        return
    pipe = RegistrationPipeline(pcfg, {})
    pipe.init_variables(jax.random.PRNGKey(args.seed))
    pipe.variables.update(
        load_pipeline_variables(args.checkpoint_dir, pipe.variables)
    )

    scenes = _build_scenes(args)
    rng = np.random.default_rng(args.seed + 1)
    tcfg_kw = dict(group_size=args.group_size, model_dir=args.checkpoint_dir)
    if args.val_interval:
        tcfg_kw["val_interval"] = args.val_interval
    tcfg = TrainConfig.defaults(comp, **tcfg_kw)

    frozen = None
    if comp in ("gf", "et"):
        cache = RotatedFeatureCache(pcfg, pipe.variables["backbone"])
        data = gf_et_batches(cache, scenes, tcfg.batch_size, rng)
        if comp == "et":
            frozen = {"gf": pipe.variables["gf"]}
    elif comp == "rm":
        # descriptor features per cloud from the current GF weights
        from roreg_tpu.pipeline.extractor import extract as extract_group_features
        from roreg_tpu.pipeline.registration import gf_apply
        import jax.numpy as jnp

        gf_feats = {}
        for ds in scenes:
            for pc_id in ds.pc_ids:
                pc = jnp.asarray(ds.get_pc(pc_id).astype(np.float32))
                kp = jnp.asarray(ds.get_kps(pc_id).astype(np.float32))
                bb = extract_group_features(
                    pipe.variables["backbone"], pc,
                    jnp.ones(pc.shape[0], bool), kp, pcfg,
                )
                gf = gf_apply(pipe.variables["gf"], bb, pcfg)
                gf_feats[(ds.name, pc_id)] = np.asarray(gf)
        data = rm_batches(
            gf_feats, scenes, rng, min_ps=256, max_ps=1024, capacity=1024,
            group_size=args.group_size,
        )
    elif comp == "rd":
        from roreg_tpu.train.selfrun import build_rd_match_bank
        from roreg_tpu.train.data import rd_batches

        bank = build_rd_match_bank(pipe, scenes, seed=args.seed)
        data = rd_batches(bank, tcfg.batch_size, rng)
    else:
        raise ValueError(comp)

    # held-out batches drive the best-checkpoint gate (reference
    # train/trainer.py:127-152 name2val behavior)
    val_fn = None
    if args.val_batches:
        from roreg_tpu.train.validators import make_val_fn

        val_batches = [next(data) for _ in range(args.val_batches)]
        val_fn = make_val_fn(comp, args.group_size, val_batches, frozen=frozen)

    trainer = Trainer(tcfg, data, val_fn=val_fn, frozen=frozen)
    if args.n_devices:
        from roreg_tpu.dist.mesh import make_mesh, shard_train_step

        mesh = make_mesh(args.n_devices)
        trainer.step_fn = shard_train_step(trainer.step_fn, mesh)
    result = trainer.run(steps=args.steps)
    print(json.dumps({k: str(v) for k, v in result.items()}))
    return result


if __name__ == "__main__":
    main()
