"""Device-mesh distribution: data-parallel training and pair-parallel eval.

The reference's parallelism surface (SURVEY.md §2.3) is a vestigial
``--multi_gpus`` flag, a fork-per-scan-pair multiprocessing Pool
(test/estimator.py:257-262) and NCCL DDP *examples* inside vendored ME.
Here distribution is first-class and TPU-native:

* one ``jax.sharding.Mesh`` with a ``data`` axis (pairs for eval, batch for
  training), optionally a ``group`` axis over the 60 rotations;
* training steps are jitted with ``NamedSharding`` annotations — batch
  sharded over ``data``, parameters replicated — letting XLA insert the
  gradient ``psum`` over ICI (no NCCL-style library to manage);
* eval shards scan pairs across devices the same way the reference forks
  processes, but with on-device RANSAC and zero host round-trips.

Multi-host: the same code runs under ``jax.distributed`` initialization —
the mesh then spans hosts, data loading feeds each host its local shard,
and scene-level metric aggregation crosses DCN once per scene.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_train_step"]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Shard every array's leading axis across the mesh data axis."""

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def shard_train_step(
    step_fn: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Wrap a (state, batch) -> (state, metrics) train step for the mesh.

    State is replicated; the batch's leading axis is sharded over ``axis``.
    XLA's SPMD partitioner turns the gradient reduction into an ICI psum.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def shardings_like(tree, sh):
        return jax.tree_util.tree_map(lambda _: sh, tree)

    @functools.wraps(step_fn)
    def wrapped(state, batch):
        state = jax.device_put(state, repl)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, data if (hasattr(x, "ndim") and x.ndim >= 1) else repl
            ),
            batch,
        )
        return step_fn(state, batch)

    return wrapped
