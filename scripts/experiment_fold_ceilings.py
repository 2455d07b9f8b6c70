#!/usr/bin/env python
"""Measure the composed ceiling of the two remaining device levers
(docs/perf_ground_truth.md §levers): inference BN folding and a faster
conv1 occupancy kernel.

Rather than estimating from standalone op timings (which do NOT compose —
XLA fuses the elementwise chain into the conv epilogues), this times the
WHOLE BlockResUNet forward at bench caps in three variants inside
non-DCE-able in-jit scans:

  stock    — production forward
  nobn     — every MaskedBatchNorm replaced by masked identity
             (= a perfect BN fold: upper bound of lever 2's win)
  noconv1  — nobn + conv1 replaced by a scalar broadcast
             (= a zero-cost conv1 kernel: upper bound of lever 1's win)

If (stock - nobn) and (nobn - noconv1) are < ~1.5 ms/rotation, the levers
are not worth their program churn (each invalidates the committed compile
cache) and the doc's estimates get corrected.

Run: python scripts/experiment_fold_ceilings.py   (TPU, single-tenant)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import roreg_tpu.sparse.block as B
    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.native.blockpyr import build_block_pyramid_host
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.sparse.conv import MaskedBatchNorm

    print("devices:", jax.devices(), flush=True)
    cfg = PipelineConfig()  # bench caps / conv1_kernel_size=7 defaults

    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="roreg_ceil_")
    scene = make_synthetic_scene(
        os.path.join(tmp, "scene"), rng, num_clouds=1, points_per_cloud=20000,
        num_keypoints=cfg.num_keypoints, overlap=0.75, max_angle_deg=40.0,
    )
    pts = scene.get_pc(0).astype(np.float32)
    bpyr = jax.tree_util.tree_map(
        jnp.asarray,
        build_block_pyramid_host(pts, cfg.voxel_size, cfg.block_caps),
    )

    orig_bn_call = MaskedBatchNorm.__call__
    orig_conv1 = B.conv1_occupancy

    def masked_identity(self, x, mask, use_running_average=None):
        return jnp.where(mask[..., None], x, 0.0)

    def cheap_conv1(occ, tbl, w, cell_mask, kernel_size=7, compute_dtype=None):
        # data-dependent scalar broadcast: not constant-foldable, ~free
        dt = compute_dtype or jnp.float32
        s = jnp.mean(occ.astype(jnp.float32)).astype(dt)
        out = jnp.broadcast_to(s, (tbl.shape[0], 64, w.shape[-1]))
        return jnp.where(cell_mask[..., None], out, 0.0)

    def run_variant(name, patch_bn, patch_conv1):
        if patch_bn:
            MaskedBatchNorm.__call__ = masked_identity
        if patch_conv1:
            B.conv1_occupancy = cheap_conv1
        try:
            bnet = B.BlockResUNet(
                variant=cfg.backbone_variant,
                conv1_kernel_size=cfg.conv1_kernel_size,
                compute_dtype=cfg.backbone_compute_dtype,
            )
            gvars = jax.jit(bnet.init, static_argnums=(2,))(
                jax.random.PRNGKey(0), bpyr, False
            )

            def body(c, _):
                # carry-dependent weight perturbation: each iteration
                # depends on the last, so the scan body cannot be hoisted
                v = jax.tree_util.tree_map(
                    lambda w: w + c.astype(w.dtype) * 1e-12
                    if jnp.issubdtype(w.dtype, jnp.floating) else w,
                    gvars,
                )
                out = bnet.apply(v, bpyr, False)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9, None

            scan = jax.jit(
                lambda c0: jax.lax.scan(body, c0, None, length=N)[0]
            )
            t0 = time.perf_counter()
            r = scan(jnp.float32(0.0))
            float(r)
            print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s",
                  flush=True)
            # measure the fixed dispatch+readback overhead of this exact
            # call pattern (jit dispatch + scalar fetch through the
            # tunnel) with a trivial program, instead of assuming it
            tiny = jax.jit(lambda c0: c0 + 1.0)
            float(tiny(jnp.float32(0.0)))  # compile
            overhead = min(
                _timed(lambda: float(tiny(jnp.float32(0.0))))
                for _ in range(5)
            )
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = scan(jnp.float32(0.0))
                float(r)
                ts.append(time.perf_counter() - t0)
            ms = (min(ts) - overhead) / N * 1e3
            print(f"{name}: dispatch overhead {overhead * 1e3:.1f} ms "
                  "(measured, subtracted)", flush=True)
            print(f"{name}: {ms:.2f} ms/rotation (in-jit scan x{N})",
                  flush=True)
            return ms
        finally:
            MaskedBatchNorm.__call__ = orig_bn_call
            B.conv1_occupancy = orig_conv1

    stock = run_variant("stock", False, False)
    nobn = run_variant("nobn", True, False)
    noc1 = run_variant("noconv1", True, True)
    print(f"BN-fold ceiling:  {stock - nobn:+.2f} ms/rotation", flush=True)
    print(f"conv1 ceiling:    {nobn - noc1:+.2f} ms/rotation", flush=True)


if __name__ == "__main__":
    main()
