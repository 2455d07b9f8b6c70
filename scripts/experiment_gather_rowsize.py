"""EXPERIMENT: XLA take-gather rate vs row size on the v5e.

The halo gather moves (B, 216) rows of C bf16 (128 B at C=64) at a
measured ~55 GB/s. If the per-row overhead dominates, gathering 4-cell
z-runs (rows of 4C = 512 B) should run substantially faster per byte,
enabling a cheap XLA-only conv_same rewrite: gather (B, 108) z-run rows
(2x volume) + static slice/concat to the dense (6,6,6,C) halo.
"""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

rng = np.random.default_rng(0)
B, C = 2880, 64


def bench(fn, *args, iters=20, label=""):
    @jax.jit
    def run(*a):
        def body(c, _):
            o = fn(a[0] + c * jnp.asarray(1e-30, a[0].dtype), *a[1:])
            return o.reshape(-1)[0].astype(a[0].dtype), None
        o, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=iters)
        return o

    o = run(*args); float(np.asarray(o.reshape(-1)[:1])[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(*args); float(np.asarray(o.reshape(-1)[:1])[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / iters
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


for nrows_per_blk, row_cells in ((216, 1), (108, 4), (54, 8), (27, 16)):
    n_src = B * 64 // row_cells
    feats = jnp.asarray(
        rng.standard_normal((n_src, row_cells * C)), jnp.bfloat16
    )
    idx = jnp.asarray(
        rng.integers(0, n_src, size=(B, nrows_per_blk)).astype(np.int32)
    )
    per = bench(
        lambda f, i: jnp.take(f, i, axis=0), feats, idx,
        label=f"take rows of {row_cells*C*2}B x {nrows_per_blk}/blk",
    )
    traffic = B * nrows_per_blk * row_cells * C * 2 * 2
    print(f"   -> {traffic/per/1e9:.0f} GB/s effective", flush=True)
print("done", flush=True)
