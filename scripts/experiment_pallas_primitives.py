"""EXPERIMENT (round 3 cont.): Mosaic primitive costs for the fused
halo-conv kernel (docs/fused_halo_conv_design.md).

Measures, on the real chip, the in-kernel operations the v2 design
composes, so round 4 builds from numbers instead of guesses:

  P1  dot_general M-folding: (T,64,C)@(C,Cout) as one GEMM — does Mosaic
      fold the leading free dims into M (target: T=8 -> M=512 rate)?
  P2  tap-accumulation loop: 27 taps x 4 aligned 64-row slice GEMMs from
      a (T,576,C) scratch with f32 accumulation — the core of the
      aligned-slice formulation (16-row z-padding variant).
  P3  same loop from an 8-row-padded (T,288,C) scratch — operands at
      sublane offset 8 (half-tile): what do unaligned slices cost?
  P4  one-hot assembly GEMM: (48,144)@(T*144,C)-batched — the halo
      y/z-extension stage rate.
  P5  lane-concat: two (T*64,C) halves -> (T*64,2C) — the cost of
      pairing blocks in lanes after per-block DMAs.

Run: python scripts/experiment_pallas_primitives.py   (TPU, one tenant)
"""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CD = jnp.bfloat16
rng = np.random.default_rng(0)


def bench(fn, *args, iters=30, label=""):
    """Time fn under lax.scan with a tiny host fetch (tunnel rule)."""
    @jax.jit
    def run(*a):
        def body(c, _):
            o = fn(*(x + c * jnp.asarray(1e-30, x.dtype) if x.dtype == CD
                     else x for x in a))
            return o.reshape(-1)[0].astype(CD), None
        o, _ = jax.lax.scan(body, jnp.zeros((), CD), None, length=iters)
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


T, C, COUT = 8, 64, 64
NPAIR_GRID = 2880 // T  # L0 bench shape

# ---------- P1: dot_general M-folding --------------------------------
x1 = jnp.asarray(rng.standard_normal((NPAIR_GRID, T, 64, C)), CD)
w1 = jnp.asarray(rng.standard_normal((C, COUT)), CD)


def p1_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(CD)


p1 = pl.pallas_call(
    p1_kernel,
    out_shape=jax.ShapeDtypeStruct((NPAIR_GRID, T, 64, COUT), CD),
    grid=(NPAIR_GRID,),
    in_specs=[
        pl.BlockSpec((1, T, 64, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((C, COUT), lambda i: (0, 0)),
    ],
    out_specs=pl.BlockSpec((1, T, 64, COUT), lambda i: (i, 0, 0, 0)),
)
per = bench(p1, x1, w1, label="P1 dot_general (T,64,C)@(C,Cout) M-fold")
macs = NPAIR_GRID * T * 64 * C * COUT
print(f"   -> {macs*2/per/1e12:.1f} TFLOP/s effective", flush=True)

# ---------- P2/P3: tap loop over aligned (16-pad) vs 8-pad scratch ----
def tap_loop(pad):
    S = 6 * 6 * pad  # scratch rows per block

    def kernel(s_ref, w_ref, o_ref, acc):
        acc[...] = jnp.zeros_like(acc)
        for tap in range(27):
            dxyz = (tap // 9 - 1, (tap // 3) % 3 - 1, tap % 3 - 1)
            for ux in range(4):
                x = ux + dxyz[0] + 1
                off = (x * 6 + dxyz[1] + 1) * pad
                rows = 4 * pad
                a = s_ref[0, :, pl.ds(off, rows), :]  # (T, 4*pad, C)
                acc[:, ux] += jax.lax.dot_general(
                    a, w_ref[tap], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[0] = acc[...].astype(CD)

    s = jnp.asarray(rng.standard_normal((NPAIR_GRID, T, S, C)), CD)
    w = jnp.asarray(rng.standard_normal((27, C, COUT)), CD)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NPAIR_GRID, T, 4, 4 * pad, COUT), CD),
        grid=(NPAIR_GRID,),
        in_specs=[
            pl.BlockSpec((1, T, S, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((27, C, COUT), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, T, 4, 4 * pad, COUT), lambda i: (i, 0, 0, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((T, 4, 4 * pad, COUT), jnp.float32)],
    )
    return f, s, w


for pad, name in ((16, "P2 tap-loop 16-pad aligned"),
                  (8, "P3 tap-loop 8-pad half-tile")):
    try:
        f, s, w = tap_loop(pad)
        per = bench(f, s, w, iters=10, label=name)
        macs = NPAIR_GRID * 27 * 4 * T * 4 * pad * C * COUT
        print(f"   -> {macs*2/per/1e12:.1f} TFLOP/s effective "
              f"({per*1e3/ (2880):.4f} ms/blockx ... per-rotation at L0: "
              f"{per*1e3:.2f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001 — record what Mosaic rejects
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

# ---------- P4: one-hot assembly GEMM ---------------------------------
P = jnp.asarray((rng.random((48, 144)) < 0.25), CD)
src = jnp.asarray(rng.standard_normal((NPAIR_GRID, T, 144, C)), CD)


def p4_kernel(p_ref, s_ref, o_ref):
    # loop over T to keep C in lanes without a 4-D transpose
    for t in range(T):
        o_ref[0, t] = jax.lax.dot_general(
            p_ref[:], s_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(CD)


p4 = pl.pallas_call(
    p4_kernel,
    out_shape=jax.ShapeDtypeStruct((NPAIR_GRID, T, 48, C), CD),
    grid=(NPAIR_GRID,),
    in_specs=[
        pl.BlockSpec((48, 144), lambda i: (0, 0)),
        pl.BlockSpec((1, T, 144, C), lambda i: (i, 0, 0, 0)),
    ],
    out_specs=pl.BlockSpec((1, T, 48, C), lambda i: (i, 0, 0, 0)),
)
try:
    per = bench(p4, P, src, iters=10, label="P4 one-hot (48,144)@(T,144,C)")
    print(f"   -> per-rotation x6 z-planes: {per*6e3:.2f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"P4: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

# ---------- P5: lane-concat of two 64-lane halves ---------------------
a5 = jnp.asarray(rng.standard_normal((NPAIR_GRID, T * 64, C)), CD)
b5 = jnp.asarray(rng.standard_normal((NPAIR_GRID, T * 64, C)), CD)


def p5_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.concatenate([a_ref[:], b_ref[:]], axis=-1)


p5 = pl.pallas_call(
    p5_kernel,
    out_shape=jax.ShapeDtypeStruct((NPAIR_GRID, T * 64, 2 * C), CD),
    grid=(NPAIR_GRID,),
    in_specs=[
        pl.BlockSpec((1, T * 64, C), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, T * 64, C), lambda i: (i, 0, 0)),
    ],
    out_specs=pl.BlockSpec((1, T * 64, 2 * C), lambda i: (i, 0, 0)),
)
try:
    per = bench(p5, a5, b5, iters=10, label="P5 lane-concat 64+64 -> 128")
    traffic = NPAIR_GRID * T * 64 * 2 * C * 2 * 2
    print(f"   -> {traffic/per/1e9:.0f} GB/s effective", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"P5: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

print("done", flush=True)
