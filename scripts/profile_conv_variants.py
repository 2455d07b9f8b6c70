#!/usr/bin/env python
"""Compare conv_same / conv1 formulations at production shape with in-jit
loops (tunnel overhead amortized). Decides the block-engine compute path.

A: current conv_same (halo row-gather + giant static im2col take + GEMM)
B: halo row-gather + 27 slice-GEMMs accumulated in f32
C: halo row-gather + one dense 3^3 VALID conv on (B,6,6,6,C)
D: conv1 as occupancy halo (B,1000) @ precomputed QW (1000, 64*32)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IT = 10


def fetch(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from roreg_tpu.sparse.block import (
        _SAME_KOFF, _SAME_CELL, _SAME_Q, _halo_gather, conv_same, _conv1_maps,
    )

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, C = 3072, 64
    CD = jnp.bfloat16

    feats = jnp.asarray(rng.standard_normal((B, 64, C)), jnp.bfloat16)
    tbl = jnp.asarray(rng.integers(-1, B, size=(B, 27)).astype(np.int16))
    w = jnp.asarray(rng.standard_normal((27, C, C)), jnp.float32)
    mask = jnp.asarray(rng.random((B, 64)) < 0.5)

    def bench(name, body, *args):
        def looped(*a):
            def step(i, c):
                out = body(c, *a)
                return c + out.sum().reshape(1, 1).astype(jnp.float32)

            return jax.lax.fori_loop(0, N_IT, step, jnp.zeros((1, 1), jnp.float32))

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
        print(f"{name}: compile {comp:.1f}s per-iter {per*1e3:.2f} ms", flush=True)

    # perturb feats by carry so the loop body can't be hoisted
    def pf(c, x):
        return x * (1.0 + 0.0 * c[0, 0]).astype(x.dtype)

    # --- A: current --- (skipped by default: ~10+ min compile)
    if os.environ.get("PROF_INCLUDE_A"):
        bench("A conv_same current",
              lambda c, x, t, m: conv_same(pf(c, x), t, w, m, CD), feats, tbl, mask)

    # --- B: 27 slice-GEMMs ---
    wb = w.astype(CD)

    def conv_b(x, t, m):
        halo = _halo_gather(x, t, _SAME_KOFF, _SAME_CELL)  # (B,216,C)
        h = halo.reshape(B, 6, 6, 6, C)
        acc = jnp.zeros((B * 64, C), jnp.float32)
        o = 0
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    sl = h[:, dx:dx + 4, dy:dy + 4, dz:dz + 4, :].reshape(-1, C)
                    acc = acc + jnp.dot(sl, wb[o], preferred_element_type=jnp.float32)
                    o += 1
        out = acc.reshape(B, 64, C)
        return jnp.where(m[..., None], out, 0.0)

    bench("B 27 slice-GEMMs",
          lambda c, x, t, m: conv_b(pf(c, x), t, m), feats, tbl, mask)

    # --- C: dense 3^3 VALID conv on halo ---
    wc = np.transpose(np.asarray(w, np.float32).reshape(3, 3, 3, C, C), (0, 1, 2, 3, 4))
    wc = jnp.asarray(wc, CD)  # (3,3,3,Cin,Cout) DHWIO

    def conv_c(x, t, m):
        halo = _halo_gather(x, t, _SAME_KOFF, _SAME_CELL)
        h = halo.reshape(B, 6, 6, 6, C)
        out = jax.lax.conv_general_dilated(
            h, wc, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )  # (B,4,4,4,C)
        out = out.reshape(B, 64, C)
        return jnp.where(m[..., None], out, 0.0)

    bench("C dense superblock conv",
          lambda c, x, t, m: conv_c(pf(c, x), t, m), feats, tbl, mask)

    # --- D: conv1 occupancy GEMM ---
    koff, cell, q = _conv1_maps(7)  # spans 10^3=1000
    span3 = 1000
    w1 = rng.standard_normal((343, 32)).astype(np.float32)
    QW = np.zeros((span3, 64, 32), np.float32)
    qm = np.asarray(q).reshape(64, 343)
    for u in range(64):
        np.add.at(QW[:, u, :], qm[u], w1)
    QWj = jnp.asarray(QW.reshape(span3, 64 * 32), CD)
    hidx = jnp.asarray(koff * 64 + cell)  # (1000,) static into 27*64
    occ = jnp.asarray((rng.random((B, 64)) < 0.5).astype(np.float32), CD)

    def conv1_d(o_, t, m):
        nbr = jnp.take(o_, jnp.clip(t, 0).astype(jnp.int32), axis=0)  # (B,27,64)
        nbr = jnp.where((t >= 0)[..., None], nbr, jnp.zeros((), nbr.dtype))
        halo = jnp.take(nbr.reshape(B, 27 * 64), hidx, axis=1)  # (B,1000)
        out = jnp.dot(halo, QWj, preferred_element_type=jnp.float32)
        return jnp.where(m[..., None], out.reshape(B, 64, 32), 0.0)

    bench("D conv1 occ-GEMM",
          lambda c, o_, t, m: conv1_d(pf(c, o_), t, m), occ, tbl, mask)


if __name__ == "__main__":
    main()
