#!/usr/bin/env python
"""Bisect block-engine op compile/run times on the real TPU.

Compiles each conv type separately at production shapes, printing compile
and steady-state times — finds which op makes the full BlockResUNet
forward compile pathological.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x.reshape(-1)[:1])


def bench_one(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: compile+run {compile_s:.1f}s, steady {min(ts)*1e3:.1f} ms",
          flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from roreg_tpu.sparse import block as B

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    CD = jnp.bfloat16
    Bcap = 3072

    def mk(bcap, cin):
        feats = jnp.asarray(rng.standard_normal((bcap, 64, cin)), jnp.float32)
        tbl = jnp.asarray(
            rng.integers(-1, bcap, size=(bcap, 27)).astype(np.int16))
        mask = jnp.asarray(rng.random((bcap, 64)) < 0.3)
        return feats, tbl, mask

    # conv1 7^3 occupancy
    occ = jnp.asarray(rng.random((Bcap, 64)) < 0.3)
    tbl0 = jnp.asarray(rng.integers(-1, Bcap, size=(Bcap, 27)).astype(np.int16))
    w1 = jnp.asarray(rng.standard_normal((343, 1, 32)), jnp.float32)
    f = jax.jit(lambda o, t, w, m: B.conv1_occupancy(o, t, w, m, 7, CD))
    bench_one("conv1_occ 7^3 (3072 blk)", f, occ, tbl0, w1, occ)

    # same-level 3^3, 64ch
    feats, tbl, mask = mk(Bcap, 64)
    w = jnp.asarray(rng.standard_normal((27, 64, 64)), jnp.float32)
    f = jax.jit(lambda x, t, w, m: B.conv_same(x, t, w, m, CD))
    bench_one("conv_same 64ch (3072 blk)", f, feats, tbl, w, mask)

    # down conv 64->128 into 1024 blocks
    featsD, _, _ = mk(Bcap, 64)
    dtbl = jnp.asarray(rng.integers(-1, Bcap, size=(1024, 27)).astype(np.int16))
    dmask = jnp.asarray(rng.random((1024, 64)) < 0.3)
    wD = jnp.asarray(rng.standard_normal((27, 64, 128)), jnp.float32)
    f = jax.jit(lambda x, t, w, m: B.conv_down(x, t, w, m, CD))
    bench_one("conv_down 64->128 (3072->1024)", f, featsD, dtbl, wD, dmask)

    # up conv 128->64 into 3072 fine blocks
    featsC, _, _ = mk(1024, 128)
    utbl = jnp.asarray(
        rng.integers(-1, 1024 * 64, size=(Bcap, 27)).astype(np.int32))
    umask = jnp.asarray(rng.random((Bcap, 64)) < 0.3)
    wU = jnp.asarray(rng.standard_normal((27, 128, 64)), jnp.float32)
    f = jax.jit(lambda x, t, w, m: B.conv_up(x, t, w, m, CD))
    bench_one("conv_up 128->64 (1024->3072)", f, featsC, utbl, wU, umask)

    # masked batchnorm
    from roreg_tpu.sparse.conv import MaskedBatchNorm

    bn = MaskedBatchNorm()
    x = jnp.asarray(rng.standard_normal((Bcap, 64, 64)), jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x, mask, use_running_average=True)
    f = jax.jit(lambda v, x, m: bn.apply(v, x, m, use_running_average=True))
    bench_one("masked BN 64ch", f, v, x, mask)

    # occupancy unpack
    words = jnp.asarray(
        rng.integers(0, 2**32, size=(Bcap, 2), dtype=np.uint64).astype(np.uint32))
    f = jax.jit(B.unpack_cell_occupancy)
    bench_one("unpack occupancy", f, words)

    print("all ops ok", flush=True)


if __name__ == "__main__":
    main()
