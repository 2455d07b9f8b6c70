"""Multi-chip sharding tests on the virtual 8-device CPU mesh — the
TPU-world answer to testing multi-node without a cluster (SURVEY.md §4)."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core.group import get_group
from roreg_tpu.dist.mesh import make_mesh, replicate, shard_batch, shard_train_step
from roreg_tpu.train.trainer import TrainConfig, make_train_step

GS = 12


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def _gf_batch(b):
    rng = np.random.default_rng(0)
    group = get_group(GS)
    f0 = rng.normal(size=(b, GS, 32)).astype(np.float32)
    idx = rng.integers(0, GS, size=b)
    f1 = np.stack([f0[i][group.cayley[idx[i]]] for i in range(b)])
    return {
        "feats0": jnp.asarray(f0),
        "feats1": jnp.asarray(f1),
        "true_idx": jnp.asarray(idx),
    }


def test_sharded_train_step_matches_single_device():
    cfg = TrainConfig.defaults("gf", group_size=GS, batch_size=16)
    init_fn, step_fn, _ = make_train_step(cfg)
    batch = _gf_batch(16)
    state = init_fn(jax.random.PRNGKey(0), batch)
    _, m_single = step_fn(state, batch)

    mesh = make_mesh(8)
    sharded = shard_train_step(step_fn, mesh)
    with mesh:
        state2 = init_fn(jax.random.PRNGKey(0), batch)
        _, m_sharded = sharded(state2, batch)
    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-3


def test_shard_batch_layout():
    mesh = make_mesh(8)
    batch = _gf_batch(16)
    sb = shard_batch(mesh, batch)
    # leading axis sharded into 8 pieces of 2
    sh = sb["feats0"].sharding
    assert sh.is_fully_replicated is False


def test_graft_entry_dryrun():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_forward():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (512, 60, 32)
    assert np.isfinite(np.asarray(out)).all()
