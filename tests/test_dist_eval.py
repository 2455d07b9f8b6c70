"""Pair-parallel eval sharding on the virtual 8-device mesh: results match
the single-device pair_stage, pairs are actually distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.dist.eval import batched_pair_stage, eval_pairs_sharded
from roreg_tpu.dist.mesh import make_mesh
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.registration import RegistrationPipeline, pair_stage

GS = 12


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        group_size=GS, keynum=32, capacities=(512, 256, 128, 64),
        conv1_kernel_size=3, sinkhorn_iters=10, max_iter=32,
        use_rm=False, estimator="yohoc", bs_et=32,
    )
    pipe = RegistrationPipeline(cfg, {})
    pipe.init_variables(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, K = 8, cfg.keynum
    bb0 = jnp.asarray(rng.normal(size=(B, K, GS, 32)).astype(np.float32))
    bb1 = jnp.asarray(rng.normal(size=(B, K, GS, 32)).astype(np.float32))
    gf0 = jnp.asarray(rng.normal(size=(B, K, GS, 32)).astype(np.float32))
    gf1 = jnp.asarray(rng.normal(size=(B, K, GS, 32)).astype(np.float32))
    k0 = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    rngs = jax.random.split(jax.random.PRNGKey(7), B)
    return cfg, pipe.variables, (rngs, bb0, bb1, gf0, gf1, k0, k1)


def test_batched_matches_single(setup):
    cfg, variables, args = setup
    out = batched_pair_stage(variables, cfg, *args)
    rngs, bb0, bb1, gf0, gf1, k0, k1 = args
    out0 = pair_stage(
        variables, cfg, rngs[0], bb0[0], bb1[0], gf0[0], gf1[0], k0[0], k1[0]
    )
    assert np.allclose(
        np.asarray(out["transform"][0]), np.asarray(out0["transform"]), atol=1e-4
    )
    for key in ("m0", "m1", "est_valid", "match_scores"):
        assert np.allclose(
            np.asarray(out[key][0]), np.asarray(out0[key]), atol=1e-5
        ), key


def test_sharded_matches_batched(setup):
    cfg, variables, args = setup
    ref = batched_pair_stage(variables, cfg, *args)
    mesh = make_mesh(8)
    out = eval_pairs_sharded(mesh, variables, cfg, *args)
    assert np.allclose(
        np.asarray(out["transform"]), np.asarray(ref["transform"]), atol=1e-3
    )
    assert out["transform"].shape == (8, 4, 4)
