#!/usr/bin/env python
"""Profile the block-engine describe path on the real TPU.

Single-process (the axon tunnel is single-tenant); uses the persistent
compile cache. Timing forces a tiny host fetch — block_until_ready
through the tunnel returns early (round-1 operational learning).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    """Force completion: tiny device->host readback."""
    return np.asarray(x.reshape(-1)[:1])


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from roreg_tpu.data.synthetic import make_synthetic_scene
    from roreg_tpu.pipeline.config import PipelineConfig
    from roreg_tpu.pipeline.extractor import extract_group_features_blocks, make_backbone
    from roreg_tpu.native.blockpyr import build_block_pyramid_host

    print("devices:", jax.devices(), flush=True)

    cfg = PipelineConfig()
    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="roreg_prof_")
    scene = make_synthetic_scene(
        os.path.join(tmp, "scene"), rng, num_clouds=2, points_per_cloud=20000,
        num_keypoints=cfg.num_keypoints, overlap=0.75, max_angle_deg=40.0,
    )
    pts = scene.get_pc(0).astype(np.float32)
    kps = scene.get_kps(0).astype(np.float32)

    net = make_backbone(cfg)
    bpyr = jax.tree_util.tree_map(jnp.asarray, build_block_pyramid_host(pts, cfg.voxel_size, cfg.block_caps))
    # init variables with the BLOCK module (same tree as gather module)
    from roreg_tpu.sparse.block import BlockResUNet

    bnet = BlockResUNet(variant=cfg.backbone_variant, conv1_kernel_size=cfg.conv1_kernel_size)
    t0 = time.perf_counter()
    gvars = jax.jit(bnet.init, static_argnums=(2,))(jax.random.PRNGKey(0), bpyr, False)
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    # --- single-rotation forward timing (compile + steady) ---
    fwd = jax.jit(lambda v, p: bnet.apply(v, p, False))
    t0 = time.perf_counter()
    out = fwd(gvars, bpyr)
    fetch(out)
    print(f"single fwd compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(gvars, bpyr)
        fetch(out)
        print(f"single fwd steady: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # --- transfer timing: packed single-put payload (one chunk of 6) ---
    from roreg_tpu.native.blockpyr import alloc_block_buffers_packed

    payload, _ = alloc_block_buffers_packed(cfg.block_caps, 6)
    print(f"packed payload: {payload.nbytes/1e6:.1f} MB/chunk", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jnp.array(payload, copy=True)
        jax.block_until_ready(dev)
        fetch(dev[:8].astype(jnp.int32))
        print(f"packed transfer (6 rot): {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # --- full describe ---
    for it in range(3):
        t0 = time.perf_counter()
        gf = extract_group_features_blocks(gvars, pts, kps, cfg)
        fetch(gf)
        print(f"describe[{it}]: {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
