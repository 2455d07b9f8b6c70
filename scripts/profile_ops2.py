#!/usr/bin/env python
"""Loop-in-jit micro-bench: amortize the ~24 ms tunnel dispatch latency by
scanning N iterations of each op inside one compiled program."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 20


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from roreg_tpu.sparse import block as B

    rng = np.random.default_rng(0)

    def timeit(name, jfn, *args):
        out = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {(min(ts) - 0.024) / N * 1e3:.2f} ms/iter", flush=True)

    Bc, C = 3072, 32
    tbl = jnp.asarray(rng.integers(0, Bc, size=(Bc, 27)).astype(np.int16))
    mask = jnp.ones((Bc, 64), bool)

    def loop(fn, x0):
        def body(c, _):
            return fn(c), None
        return jax.jit(lambda x: jax.lax.scan(body, x, None, length=N)[0])

    # conv_same 32ch, output fed back
    w32 = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32))
    f32 = jnp.asarray(rng.normal(size=(Bc, 64, C)).astype(np.float32))
    fn = loop(lambda f: B.conv_same(f.astype(jnp.bfloat16), tbl, w32, mask,
                                    compute_dtype=jnp.bfloat16), f32)
    timeit(f"conv_same 3072 32->32 x{N}", fn, f32)

    C2 = 64
    w64 = jnp.asarray(rng.normal(size=(27, C2, C2)).astype(np.float32))
    f64 = jnp.asarray(rng.normal(size=(Bc, 64, C2)).astype(np.float32))
    fn = loop(lambda f: B.conv_same(f.astype(jnp.bfloat16), tbl, w64, mask,
                                    compute_dtype=jnp.bfloat16), f64)
    timeit(f"conv_same 3072 64->64 x{N}", fn, f64)

    # gather_superblock alone (center slice fed back)
    def gs(f):
        g = B.gather_superblock(f, tbl)
        return g[:, 4:8, 4:8, 4:8, :].reshape(Bc, 64, C2)
    fn = loop(gs, f64)
    timeit(f"gather_superblock 3072 C=64 x{N}", fn, f64)

    # pure matmul reference (square, fed back)
    K = 1728
    a = jnp.asarray(rng.normal(size=(Bc * 64, C2)).astype(np.float32)).astype(jnp.bfloat16)
    wmm = jnp.asarray(rng.normal(size=(C2, C2)).astype(np.float32)).astype(jnp.bfloat16)
    fn = loop(lambda x: jnp.dot(x, wmm, preferred_element_type=jnp.float32).astype(jnp.bfloat16), a)
    timeit(f"matmul (196k,64)@(64,64) x{N}", fn, a)

    big = jnp.asarray(rng.normal(size=(Bc * 64, K)).astype(np.float32)).astype(jnp.bfloat16)
    wbig = jnp.asarray(rng.normal(size=(K, C2)).astype(np.float32)).astype(jnp.bfloat16)
    def mm_big(x):
        out = jnp.dot(x, wbig, preferred_element_type=jnp.float32)  # (M, 64)
        return x + out.astype(jnp.bfloat16).mean() * 1e-30
    fn = loop(mm_big, big)
    timeit(f"matmul (196k,1728)@(1728,64) x{N}", fn, big)

    # full BlockResUNet forward (weights perturbed per iter to defeat CSE)
    from roreg_tpu.native.blockpyr import build_block_pyramid_host
    from roreg_tpu.data.synthetic import make_synthetic_scene
    import tempfile

    tmp = tempfile.mkdtemp()
    scene = make_synthetic_scene(os.path.join(tmp, "s"), rng, num_clouds=1,
                                 points_per_cloud=20000, num_keypoints=100)
    pts = scene.get_pc(0).astype(np.float32)
    bpyr = jax.tree_util.tree_map(
        jnp.asarray, build_block_pyramid_host(pts, 0.025, (3072, 1024, 512, 256))
    )
    net = B.BlockResUNet(compute_dtype="bfloat16")
    with jax.default_device(jax.devices("cpu")[0]):
        gvars = net.init(jax.random.PRNGKey(0), bpyr, False)
    gvars = jax.device_put(gvars, jax.devices()[0])

    def fwd_loop(v):
        def body(c, _):
            v2 = jax.tree_util.tree_map(lambda p: p + c * 1e-30, v["params"])
            out = net.apply({"params": v2, "batch_stats": v["batch_stats"]}, bpyr, False)
            return out.mean(), None
        return jax.lax.scan(body, jnp.float32(0), None, length=N)[0]

    fn = jax.jit(fwd_loop)
    timeit(f"BlockResUNet fwd x{N}", fn, gvars)


if __name__ == "__main__":
    main()
