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

__all__ = ["batched_pair_stage", "eval_pairs_sharded"]


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
