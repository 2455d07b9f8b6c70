"""Pair-parallel evaluation over a device mesh.

The reference parallelizes estimation by forking one CPU process per scan
pair (test/estimator.py:257-262); here the match+estimate stage is vmapped
over a pair axis and the batch is sharded across the mesh's ``data`` axis,
so N chips each register their own subset of pairs entirely on device.
Under ``jax.distributed`` the same function spans hosts (each host feeds
its local shard; scene metrics reduce over DCN once per scene).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.registration import pair_stage

__all__ = [
    "batched_pair_stage",
    "eval_pairs_sharded",
    "pair_batch_from_stacks",
    "pair_stacks_sharded",
]


@functools.partial(jax.jit, static_argnames=("cfg",))
def batched_pair_stage(
    variables, cfg: PipelineConfig, rngs, bb0, bb1, gf0, gf1, k0, k1
):
    """vmap of pair_stage over a leading pair axis.

    All inputs (B, keynum, ...) except rngs (B, 2) uint32 keys. Returns the
    stacked pair_stage dict (transform (B,4,4), overlap (B,), m0/m1 (B,M),
    est_valid (B,M), match_scores (B,M), ...) — everything the evaluator
    needs for FMR/IR/RR, so the batched path fully replaces the serial one
    (reference fork-per-pair Pool, test/estimator.py:257-262).
    """

    def one(rng, b0, b1, g0, g1, kk0, kk1):
        return pair_stage(variables, cfg, rng, b0, b1, g0, g1, kk0, kk1)

    return jax.vmap(one)(rngs, bb0, bb1, gf0, gf1, k0, k1)


def eval_pairs_sharded(
    mesh: Mesh, variables, cfg: PipelineConfig, rngs, bb0, bb1, gf0, gf1, k0, k1
):
    """Shard the pair axis over the mesh and run the batched stage.

    The pair count must be a multiple of the mesh size (pad with duplicate
    pairs and drop the tails host-side if needed).
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl)
    args = [
        jax.device_put(x, data) for x in (rngs, bb0, bb1, gf0, gf1, k0, k1)
    ]
    with mesh:
        out = batched_pair_stage(variables, cfg, *args)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "per_pair_sample"))
def pair_batch_from_stacks(
    variables,
    cfg: PipelineConfig,
    base_key,
    rngs,
    p0,
    p1,
    i0,
    i1,
    all_bb,
    all_gf,
    all_kp,
    *,
    per_pair_sample: bool = False,
):
    """Fused-gather batched pair stage over device-resident per-cloud
    descriptor stacks: ONE dispatch per batch, no host-side per-pair
    stacking or gathering.

    ``all_bb/all_gf/all_kp`` carry a leading cloud axis; ``(i0, i1)``
    (B,) index it per pair. ``(p0, p1)`` are the pair's cloud IDs, folded
    into the keypoint-sampling key so that pairs sharing a cloud draw
    independent random subsets — the reference's per-pair sampling
    semantics (test/matcher.py:174-180). With ``per_pair_sample`` the
    stacks hold FULL per-cloud descriptors and a random ``cfg.keynum``
    subset is drawn inside the program per (pair, side); without it the
    stacks are pre-sampled per cloud (the deterministic use_rd NMS path)
    and rows are gathered as-is.

    Returns per-pair transform/overlap plus the matched keypoint
    coordinates + estimate mask, i.e. everything FMR/IR/RR need, so the
    host never fetches full descriptor tensors.
    """

    def sample(i, pa, pb, side):
        kp = all_kp[i]
        r = jax.random.fold_in(base_key, pa)
        r = jax.random.fold_in(r, pb)
        r = jax.random.fold_in(r, side)
        noise = jax.random.uniform(r, (kp.shape[0],))
        idx = jax.lax.top_k(noise, cfg.keynum)[1]
        return all_bb[i][idx], all_gf[i][idx], kp[idx]

    def one(rng, pa, pb, ia, ib):
        if per_pair_sample:
            bb0, gf0, k0 = sample(ia, pa, pb, 0)
            bb1, gf1, k1 = sample(ib, pa, pb, 1)
        else:
            bb0, gf0, k0 = all_bb[ia], all_gf[ia], all_kp[ia]
            bb1, gf1, k1 = all_bb[ib], all_gf[ib], all_kp[ib]
        out = pair_stage(variables, cfg, rng, bb0, bb1, gf0, gf1, k0, k1)
        return {
            "transform": out["transform"],
            "overlap": out["overlap"],
            "keys_m0": k0[out["m0"]],
            "keys_m1": k1[out["m1"]],
            "est_valid": out["est_valid"],
        }

    return jax.vmap(one)(rngs, p0, p1, i0, i1)


def pair_stacks_sharded(
    mesh: Mesh,
    variables,
    cfg: PipelineConfig,
    base_key,
    rngs,
    p0,
    p1,
    i0,
    i1,
    all_bb,
    all_gf,
    all_kp,
    *,
    per_pair_sample: bool = False,
):
    """Sharded variant of :func:`pair_batch_from_stacks`: the descriptor
    stacks are replicated over the mesh (every chip holds the scene's
    clouds — tens of MB), the pair axis is sharded over ``data``, and each
    chip registers its own pair subset end-to-end on device."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl)
    base_key = jax.device_put(base_key, repl)
    stacks = [jax.device_put(x, repl) for x in (all_bb, all_gf, all_kp)]
    args = [jax.device_put(x, data) for x in (rngs, p0, p1, i0, i1)]
    with mesh:
        return pair_batch_from_stacks(
            variables, cfg, base_key, *args, *stacks,
            per_pair_sample=per_pair_sample,
        )
