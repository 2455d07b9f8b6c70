#!/usr/bin/env python
"""Micro-bench individual block-engine ops on the TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def timeit(name, fn, *args, n=5):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)

    Bc, C = 3072, 32
    feats = jnp.asarray(rng.normal(size=(Bc, 64, C)).astype(np.float32)).astype(jnp.bfloat16)
    tbl = jnp.asarray(rng.integers(0, Bc, size=(Bc, 27)).astype(np.int16))
    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32))
    mask = jnp.ones((Bc, 64), bool)

    gs = jax.jit(B.gather_superblock)
    timeit("gather_superblock B=3072 C=32", gs, feats, tbl)

    cs = jax.jit(lambda f, t, ww, m: B.conv_same(f, t, ww, m, compute_dtype=jnp.bfloat16))
    timeit("conv_same B=3072 32->32", cs, feats, tbl, w, mask)

    C2 = 64
    feats64 = jnp.asarray(rng.normal(size=(Bc, 64, C2)).astype(np.float32)).astype(jnp.bfloat16)
    w64 = jnp.asarray(rng.normal(size=(27, C2, C2)).astype(np.float32))
    timeit("conv_same B=3072 64->64", cs, feats64, tbl, w64, mask)

    # down conv: dst 1024 blocks reading src 3072
    Bd = 1024
    tbl_d = jnp.asarray(rng.integers(0, Bc, size=(Bd, 27)).astype(np.int16))
    mask_d = jnp.ones((Bd, 64), bool)
    wd = jnp.asarray(rng.normal(size=(27, C, C2)).astype(np.float32))
    cd = jax.jit(lambda f, t, ww, m: B.conv_down(f, t, ww, m, compute_dtype=jnp.bfloat16))
    timeit("conv_down 3072->1024 32->64", cd, feats, tbl_d, wd, mask_d)

    # up conv: fine 3072 reading coarse 1024
    up_tbl = jnp.asarray(rng.integers(0, Bd * 64, size=(Bc, 27)).astype(np.int32))
    fc = jnp.asarray(rng.normal(size=(Bd, 64, C2)).astype(np.float32)).astype(jnp.bfloat16)
    wu = jnp.asarray(rng.normal(size=(27, C2, C2)).astype(np.float32))
    cu = jax.jit(lambda f, t, ww, m: B.conv_up(f, t, ww, m, compute_dtype=jnp.bfloat16))
    timeit("conv_up 1024->3072 64->64", cu, fc, up_tbl, wu, mask)

    # conv1 occupancy 7^3
    occ = jnp.asarray(rng.random((Bc, 64)) < 0.3)
    w1 = jnp.asarray(rng.normal(size=(343, 1, 32)).astype(np.float32))
    c1 = jax.jit(lambda o, t, ww, m: B.conv1_occupancy(o, t, ww, m, compute_dtype=jnp.bfloat16))
    timeit("conv1_occ 7^3 B=3072", c1, occ, tbl, w1, mask)

    # plain matmul reference: the im2col GEMM cost of conv_same 64ch
    a = jnp.asarray(rng.normal(size=(Bc * 64, 27 * C2)).astype(np.float32)).astype(jnp.bfloat16)
    bm = jnp.asarray(rng.normal(size=(27 * C2, C2)).astype(np.float32)).astype(jnp.bfloat16)
    mm = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
    timeit("matmul (196k,1728)@(1728,64)", mm, a, bm)

    # MaskedBatchNorm-ish cost
    from roreg_tpu.sparse.conv import MaskedBatchNorm

    bn = MaskedBatchNorm()
    bnv = bn.init(jax.random.PRNGKey(0), feats64.astype(jnp.float32), mask, True)
    bnf = jax.jit(lambda v, x, m: bn.apply(v, x, m, use_running_average=True))
    timeit("masked_bn B=3072x64x64", bnf, bnv, feats64.astype(jnp.float32), mask)


if __name__ == "__main__":
    main()
