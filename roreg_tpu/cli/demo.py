"""Demo CLI — the ``demo.py`` equivalent, hermetic.

Builds (or reuses) a synthetic two-cloud scene, runs the full pipeline on
the pair, prints predicted vs ground-truth transform and the registration
errors. The reference's demo shells out to testset.py + Test.py and
visualizes with open3d (demo.py:7-24); ours is a single in-process run.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./data/origin_data")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--keynum", type=int, default=250)
    p.add_argument("--group_size", type=int, default=60)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--out_png", default=None,
                   help="write a before/after registration rendering "
                        "(headless analog of utils_o3d.py "
                        "draw_registration_result)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roreg_tpu.data.dataset import ThreeDMatchDataset
    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.eval.metrics import registration_errors
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.registration import RegistrationPipeline
    from roreg_tpu.train.checkpoints import load_pipeline_variables

    root = os.path.join(args.data_root, "demo", "kitchen")
    if not os.path.exists(f"{root}/PointCloud/gt.log"):
        make_synthetic_scene(
            root, np.random.default_rng(0), num_clouds=2,
            points_per_cloud=20000, num_keypoints=5000,
        )
    ds = ThreeDMatchDataset(root, 2)

    cfg = PipelineConfig(keynum=args.keynum, group_size=args.group_size)
    pipe = RegistrationPipeline(cfg, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    if not args.random_init:
        pipe.variables.update(
            load_pipeline_variables(args.checkpoint_dir, pipe.variables)
        )

    pc0 = jnp.asarray(ds.get_pc(0).astype(np.float32))
    pc1 = jnp.asarray(ds.get_pc(1).astype(np.float32))
    k0 = jnp.asarray(ds.get_kps(0).astype(np.float32))
    k1 = jnp.asarray(ds.get_kps(1).astype(np.float32))
    out = pipe.register_pair(
        jax.random.PRNGKey(1),
        pc0, jnp.ones(pc0.shape[0], bool), k0,
        pc1, jnp.ones(pc1.shape[0], bool), k1,
    )
    T = np.asarray(out["transform"])
    T_gt = ds.get_transform("0", "1")
    rre, rte = registration_errors(T, T_gt)
    print("predicted transform:\n", np.round(T, 4))
    print("ground truth:\n", np.round(T_gt, 4))
    if args.out_png:
        from roreg_tpu.data.visualize import draw_registration

        # gt convention pts0 = T @ pts1: cloud 1 is the source
        draw_registration(np.asarray(pc1), np.asarray(pc0), T, args.out_png)
        print(f"registration rendering written to {args.out_png}")
    print(json.dumps({"rre_deg": rre, "rte_m": rte,
                      "success": bool(rre < 15 and rte < 0.3)}))


if __name__ == "__main__":
    main()
