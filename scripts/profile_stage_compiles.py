#!/usr/bin/env python
"""Bisect BlockResUNet compile time by stage: compile each UNet stage as
its own jit at production shapes and report compile seconds. Reveals
whether full-net compile blowup is one pathological stage or superlinear
growth in program size."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from roreg_tpu.sparse import block as B

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    CD = jnp.bfloat16
    caps = (3072, 1024, 512, 256)
    ch = (32, 64, 128, 256)
    tr = (64, 64, 64, 128)

    def mk_level(cap):
        occ = jnp.asarray(rng.random((cap, 64)) < 0.4)
        tbl = jnp.asarray(rng.integers(-1, cap, size=(cap, 27)).astype(np.int16))
        return occ, tbl

    levels = [mk_level(c) for c in caps]
    dtbls = [
        jnp.asarray(rng.integers(-1, caps[l], size=(caps[l + 1], 27)).astype(np.int16))
        for l in range(3)
    ]
    utbls = [
        jnp.asarray(
            rng.integers(-1, caps[l + 1] * 64, size=(caps[l], 27)).astype(np.int32))
        for l in range(3)
    ]

    from roreg_tpu.sparse.conv import MaskedBatchNorm

    bn = MaskedBatchNorm()

    def bench(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        fetch(f(*args))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(f(*args))
        run = time.perf_counter() - t0
        print(f"{name}: compile {comp:.1f}s run {run*1e3:.1f} ms", flush=True)

    def feats(cap, c):
        return jnp.asarray(rng.standard_normal((cap, 64, c)), jnp.bfloat16)

    def w(cin, cout):
        return jnp.asarray(rng.standard_normal((27, cin, cout)), jnp.float32)

    def bnv(cap, c):
        x = feats(cap, c)
        m = levels[0][0] if cap == caps[0] else jnp.ones((cap, 64), bool)
        return bn.init(jax.random.PRNGKey(0), x, m, use_running_average=True)

    # stage S0: conv1 + bn + basic block (2 convs + 2 bn) at L0
    occ0, tbl0 = levels[0]
    w1 = jnp.asarray(rng.standard_normal((343, 1, ch[0])), jnp.float32)
    ws = [w(ch[0], ch[0]), w(ch[0], ch[0])]
    v0 = bnv(caps[0], ch[0])

    def s0(occ, tbl):
        x = B.conv1_occupancy(occ, tbl, w1, occ, 7, CD)
        x = bn.apply(v0, x, occ, use_running_average=True)
        y = B.conv_same(x, tbl, ws[0], occ, CD)
        y = bn.apply(v0, y, occ, use_running_average=True)
        y = jax.nn.relu(y)
        y = B.conv_same(y, tbl, ws[1], occ, CD)
        y = bn.apply(v0, y, occ, use_running_average=True)
        y = jax.nn.relu(y + x)
        return jnp.where(occ[..., None], y, 0.0)

    bench("S0 conv1+block1 (L0 32ch)", s0, occ0, tbl0)

    # stage S1: down conv L0->L1 + block at 64ch
    occ1, tbl1 = levels[1]
    wd = w(ch[0], ch[1])
    wsame = [w(ch[1], ch[1]), w(ch[1], ch[1])]
    v1 = bnv(caps[1], ch[1])
    x0 = feats(caps[0], ch[0])

    def s1(x, dtbl, tbl, occ):
        y = B.conv_down(x, dtbl, wd, occ, CD)
        y = bn.apply(v1, y, occ, use_running_average=True)
        a = B.conv_same(y, tbl, wsame[0], occ, CD)
        a = bn.apply(v1, a, occ, use_running_average=True)
        a = jax.nn.relu(a)
        a = B.conv_same(a, tbl, wsame[1], occ, CD)
        a = bn.apply(v1, a, occ, use_running_average=True)
        return jnp.where(occ[..., None], jax.nn.relu(a + y), 0.0)

    bench("S1 down+block2 (L1 64ch)", s1, x0, dtbls[0], tbl1, occ1)

    # stage S2: L2 at 128ch
    occ2, tbl2 = levels[2]
    wd2 = w(ch[1], ch[2])
    ws2 = [w(ch[2], ch[2]), w(ch[2], ch[2])]
    v2 = bnv(caps[2], ch[2])
    x1 = feats(caps[1], ch[1])

    def s2(x, dtbl, tbl, occ):
        y = B.conv_down(x, dtbl, wd2, occ, CD)
        y = bn.apply(v2, y, occ, use_running_average=True)
        a = B.conv_same(y, tbl, ws2[0], occ, CD)
        a = bn.apply(v2, a, occ, use_running_average=True)
        a = jax.nn.relu(a)
        a = B.conv_same(a, tbl, ws2[1], occ, CD)
        a = bn.apply(v2, a, occ, use_running_average=True)
        return jnp.where(occ[..., None], jax.nn.relu(a + y), 0.0)

    bench("S2 down+block3 (L2 128ch)", s2, x1, dtbls[1], tbl2, occ2)

    # stage S3: L3 at 256ch
    occ3, tbl3 = levels[3]
    wd3 = w(ch[2], ch[3])
    ws3 = [w(ch[3], ch[3]), w(ch[3], ch[3])]
    v3 = bnv(caps[3], ch[3])
    x2 = feats(caps[2], ch[2])

    def s3(x, dtbl, tbl, occ):
        y = B.conv_down(x, dtbl, wd3, occ, CD)
        y = bn.apply(v3, y, occ, use_running_average=True)
        a = B.conv_same(y, tbl, ws3[0], occ, CD)
        a = bn.apply(v3, a, occ, use_running_average=True)
        a = jax.nn.relu(a)
        a = B.conv_same(a, tbl, ws3[1], occ, CD)
        a = bn.apply(v3, a, occ, use_running_average=True)
        return jnp.where(occ[..., None], jax.nn.relu(a + y), 0.0)

    bench("S3 down+block4 (L3 256ch)", s3, x2, dtbls[2], tbl3, occ3)

    # stage S4: up conv L3->L2 (tr) + block
    wu = w(ch[3], tr[3])
    wsu = [w(tr[3], tr[3]), w(tr[3], tr[3])]
    vu = bnv(caps[2], tr[3])
    x3 = feats(caps[3], ch[3])

    def s4(x, utbl, tbl, occ):
        y = B.conv_up(x, utbl, wu, occ, CD)
        y = bn.apply(vu, y, occ, use_running_average=True)
        a = B.conv_same(y, tbl, wsu[0], occ, CD)
        a = bn.apply(vu, a, occ, use_running_average=True)
        a = jax.nn.relu(a)
        a = B.conv_same(a, tbl, wsu[1], occ, CD)
        a = bn.apply(vu, a, occ, use_running_average=True)
        return jnp.where(occ[..., None], jax.nn.relu(a + y), 0.0)

    bench("S4 up+block4_tr (L2 64ch)", s4, x3, utbls[2], tbl2, occ2)

    # stage S5: concat + up L1->L0 + block at 64ch on L0 (the big one)
    wu0 = w(tr[2] + ch[1], tr[1])
    wsu0 = [w(tr[1], tr[1]), w(tr[1], tr[1])]
    vu0 = bnv(caps[0], tr[1])
    xc = feats(caps[1], tr[2] + ch[1])

    def s5(x, utbl, tbl, occ):
        y = B.conv_up(x, utbl, wu0, occ, CD)
        y = bn.apply(vu0, y, occ, use_running_average=True)
        a = B.conv_same(y, tbl, wsu0[0], occ, CD)
        a = bn.apply(vu0, a, occ, use_running_average=True)
        a = jax.nn.relu(a)
        a = B.conv_same(a, tbl, wsu0[1], occ, CD)
        a = bn.apply(vu0, a, occ, use_running_average=True)
        return jnp.where(occ[..., None], jax.nn.relu(a + y), 0.0)

    bench("S5 up+block2_tr (L0 64ch)", s5, xc, utbls[0], tbl0, occ0)

    # stage S6: final dense head at L0
    wf1 = jnp.asarray(rng.standard_normal((tr[1] + ch[0], tr[0])), jnp.float32)
    wf2 = jnp.asarray(rng.standard_normal((tr[0], 32)), jnp.float32)
    xf = feats(caps[0], tr[1] + ch[0])

    def s6(x, occ):
        y = jax.nn.relu(jnp.einsum("bkc,cd->bkd", x, wf1.astype(CD)))
        y = jnp.einsum("bkc,cd->bkd", y, wf2.astype(CD))
        y = y * jax.lax.rsqrt(jnp.sum(y * y, -1, keepdims=True) + 1e-12)
        return jnp.where(occ[..., None], y, 0.0)

    bench("S6 final head", s6, xf, occ0)

    # S5b: conv_up via lhs_dilation dense conv (vs current im2col GEMM)
    def up_dilated(x, utbl, occ):
        cin, cout = wu0.shape[1], wu0.shape[2]
        fc = x.reshape(-1, cin).astype(CD)
        reg = jnp.take(fc, jnp.clip(utbl, 0).astype(jnp.int32), axis=0)
        reg = jnp.where((utbl >= 0)[..., None], reg, jnp.zeros((), reg.dtype))
        reg = reg.reshape(-1, 3, 3, 3, cin)
        out = jax.lax.conv_general_dilated(
            reg, wu0.astype(CD).reshape(3, 3, 3, cin, cout),
            (1, 1, 1), ((1, 0), (1, 0), (1, 0)), lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(-1, 64, cout)
        return jnp.where(occ[..., None], out, 0.0)

    bench("S5b conv_up dilated-dense (L0, cin192)", up_dilated, xc, utbls[0], occ0)

    # S7: keypoint kNN at production shape
    from roreg_tpu.core.knn import nn as knn_nn

    rep = jnp.asarray(rng.standard_normal((caps[0] * 64, 3)), jnp.float32)
    keys = jnp.asarray(rng.standard_normal((5000, 3)), jnp.float32)
    occf = occ0.reshape(-1)

    def s7(k, r, m):
        _, idx = knn_nn(k, r, ref_mask=m)
        return idx.astype(jnp.float32)

    bench("S7 keypoint kNN 5000x196608", s7, keys, rep, occf)

    # S8: occupancy unpack + rep points
    l0c = jnp.asarray(rng.integers(0, 64, size=(caps[0], 3)).astype(np.int16))
    rf = jnp.asarray(rng.integers(0, 255, size=(caps[0], 64, 3)).astype(np.uint8))
    org = jnp.zeros((3,), jnp.int32)

    def s8(c, f):
        return B.block_rep_points(c, f, org, 0.025)

    bench("S8 rep points", s8, l0c, rf)


if __name__ == "__main__":
    main()
