#!/usr/bin/env python
"""Gather-mode microbench v2: loop each op N times INSIDE one jit so the
~30 ms tunnel dispatch overhead amortizes; report per-iteration time."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IT = 20


def fetch(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, C = 3072, 64

    def bench(name, body, *args, bytes_moved=None):
        # body: (carry, *args) -> carry with same shape as carry0
        def looped(*a):
            def step(i, c):
                return body(c, *a)

            return jax.lax.fori_loop(0, N_IT, step, jnp.zeros((8, 128), jnp.float32))

        f = jax.jit(looped)
        t0 = time.perf_counter()
        fetch(f(*args))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(f(*args))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.030) / N_IT
        bw = f" ~{bytes_moved/per/1e9:.0f} GB/s" if bytes_moved else ""
        print(f"{name}: compile {comp:.1f}s per-iter {per*1e3:.2f} ms{bw}", flush=True)

    feats = jnp.asarray(rng.standard_normal((B, 64, C)), jnp.bfloat16)
    rows216 = jnp.asarray(rng.integers(0, B * 64, size=(B, 216)).astype(np.int32))
    tbl = jnp.asarray(rng.integers(0, B, size=(B, 27)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 216, size=(64 * 27,)).astype(np.int32))

    def red(x):
        return jnp.full((8, 128), x.sum(), jnp.float32)

    bench(
        "a) fine row gather 216/blk",
        lambda c, x, r: c + red(jnp.take(x.reshape(-1, C), r, axis=0) * c[0, 0]),
        feats, rows216, bytes_moved=B * 216 * C * 2,
    )
    bench(
        "b) block gather 27/blk",
        lambda c, x, t: c + red(jnp.take(x, t, axis=0) * c[0, 0]),
        feats, tbl, bytes_moved=B * 27 * 64 * C * 2,
    )
    halo = jnp.asarray(rng.standard_normal((B, 216, C)), jnp.bfloat16)
    bench(
        "c) static im2col take",
        lambda c, h: c + red(jnp.take(h, q, axis=1) * c[0, 0]),
        halo, bytes_moved=B * (216 + 1728) * C * 2,
    )
    im = jnp.asarray(rng.standard_normal((B * 64, 27 * C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27 * C, C)), jnp.bfloat16)
    bench(
        "d) GEMM (196608,1728)(1728,64)",
        lambda c, a, b: c + red(jnp.dot(
            a * c[0, 0], b, preferred_element_type=jnp.float32)[:8, :64]),
        im, w, bytes_moved=B * 64 * 27 * C * 2,
    )
    x4 = jnp.asarray(rng.standard_normal((1, 104, 104, 104, C)), jnp.bfloat16)
    k4 = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)), jnp.bfloat16)
    bench(
        "f) dense conv 104^3 64ch",
        lambda c, a, b: c + red(jax.lax.conv_general_dilated(
            a * c[0, 0].astype(a.dtype), b, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0, :2, :2, :2, :2]),
        x4, k4,
    )

    # g) current conv_same fused (halo gather + im2col + GEMM)
    from roreg_tpu.sparse.block import conv_same

    w27 = jnp.asarray(rng.standard_normal((27, C, C)), jnp.float32)
    mask = jnp.asarray(rng.random((B, 64)) < 0.5)
    tbl16 = tbl.astype(jnp.int16)
    bench(
        "g) conv_same fused",
        lambda c, x, t, m: c + red(conv_same(
            x * c[0, 0].astype(x.dtype), t, w27, m, jnp.bfloat16)[:8, :8, :32]),
        feats, tbl16, mask,
    )

    # h) conv1 path at production: occupancy halo 7^3
    from roreg_tpu.sparse.block import conv1_occupancy

    occ = jnp.asarray(rng.random((B, 64)) < 0.5)
    w343 = jnp.asarray(rng.standard_normal((343, 1, 32)), jnp.float32)
    bench(
        "h) conv1_occ 7^3",
        lambda c, o, t, m: c + red(conv1_occupancy(
            jnp.logical_and(o, c[0, 0] < 1e9), t, w343, m, 7, jnp.bfloat16
        )[:8, :8, :32]),
        occ, tbl16, occ,
    )


if __name__ == "__main__":
    main()
