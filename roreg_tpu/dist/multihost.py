"""Multi-host execution helpers.

A pod slice (or several hosts with DCN) runs the exact same mesh code as
single-host: after ``initialize()``, ``jax.devices()`` spans all hosts,
``make_mesh()`` builds a global mesh, and the data-parallel train step /
pair-parallel eval from this package partition over it (gradient psum on
ICI; nothing host-aware in the model code).

Host responsibilities that remain local:
* data feeding — each host builds batches for its own device shard
  (``host_local_shard`` below picks this host's slice of a global list);
* scene-level aggregation — metric dicts are tiny; ``all_gather_metrics``
  moves them over DCN once per scene via ``jax.experimental.multihost_utils``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np

__all__ = ["initialize", "host_local_shard", "all_gather_metrics", "is_primary"]


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed. No-ops when env vars already configure it
    (TPU pods auto-configure) or when running single-process."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except Exception:
        # single-process / already initialized
        pass


def is_primary() -> bool:
    return jax.process_index() == 0


def host_local_shard(items: Sequence[Any]) -> list[Any]:
    """This host's contiguous slice of a global work list (scan pairs,
    clouds to describe, ...)."""
    n = jax.process_count()
    i = jax.process_index()
    per = (len(items) + n - 1) // n
    return list(items[i * per : (i + 1) * per])


def all_gather_metrics(local: dict[str, float]) -> dict[str, list[float]]:
    """Gather each host's scalar metrics to every host (DCN, once per call)."""
    if jax.process_count() == 1:
        return {k: [v] for k, v in local.items()}
    from jax.experimental import multihost_utils

    keys = sorted(local.keys())
    vec = np.asarray([local[k] for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(vec)
    return {k: gathered[:, i].tolist() for i, k in enumerate(keys)}
