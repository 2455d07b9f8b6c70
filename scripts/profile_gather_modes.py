#!/usr/bin/env python
"""Microbenchmarks driving the block-conv redesign: which data-movement
formulation reaches HBM bandwidth on this TPU?

a) fine row gather: (B*64, C) rows at (B, 216) dynamic indices
b) block gather:    (B, 64, C) rows at (B, 27) dynamic indices
c) static im2col take on (B, 216, C) -> (B, 64*27, C)
d) plain GEMM (B*64, 27C) @ (27C, C)
e) fused halo conv (current conv_same) for reference
f) canonical dense 3-D conv (1, 104,104,104, 64) 3^3 — compile sanity
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x.reshape(-1)[:1])


def bench(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    fetch(fn(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: compile {comp:.1f}s steady {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, C = 3072, 64

    feats = jnp.asarray(rng.standard_normal((B, 64, C)), jnp.bfloat16)
    rows216 = jnp.asarray(rng.integers(0, B * 64, size=(B, 216)).astype(np.int32))
    tbl = jnp.asarray(rng.integers(0, B, size=(B, 27)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 216, size=(64 * 27,)).astype(np.int32))

    f = jax.jit(lambda x, r: jnp.take(x.reshape(-1, C), r, axis=0).sum(-1))
    bench("a) fine row gather 216/blk", f, feats, rows216)

    f = jax.jit(lambda x, t: jnp.take(x, t, axis=0).sum(-1))
    bench("b) block gather 27/blk", f, feats, tbl)

    halo = jnp.asarray(rng.standard_normal((B, 216, C)), jnp.bfloat16)
    f = jax.jit(lambda h: jnp.take(h, q, axis=1).sum(-1))
    bench("c) static im2col take", f, halo)

    im = jnp.asarray(rng.standard_normal((B * 64, 27 * C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27 * C, C)), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    bench("d) GEMM (196608,1728)x(1728,64)", f, im, w)

    # one-hot alternative for the halo gather: segment mapping as matmul
    # (B,216) indices -> dense (216, B*64)? too big; skip.

    # b2: block gather with take along flattened index computed via slab
    # (sorted-window) emulation: contiguous dynamic_slice windows
    f = jax.jit(
        lambda x: jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(x.reshape(-1, C), s, 512 * 64)
        )(jnp.arange(0, B * 64 - 512 * 64 + 1, (B - 512) * 64 // 23)[:24]).sum((1, 2))
    )
    bench("e) 24 contiguous 4MB slices", f, feats)

    # f) canonical dense conv compile sanity
    x = jnp.asarray(rng.standard_normal((1, 104, 104, 104, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)), jnp.bfloat16)
    f = jax.jit(
        lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
    )
    bench("f) dense conv 104^3 x 64ch 3^3", f, x, k)


if __name__ == "__main__":
    main()
