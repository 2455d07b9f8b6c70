"""Per-pair keypoint sampling parity (reference test/matcher.py:174-180).

Without RD, the random keynum subset must be drawn per (pair, side) — two
pairs sharing a cloud draw INDEPENDENT subsets — and reproducibly for a
given seed. The draw now happens INSIDE the fused batched pair program
(dist/eval.pair_batch_from_stacks), so this exercises the real jitted
sampling code with a stubbed pair_stage (no network compiles) and observes
the sampled ids through the matched-keypoint coordinates the evaluator
feeds to FMR/IR.
"""

import jax.numpy as jnp
import numpy as np

from roreg_tpu.eval.evaluator import Evaluator
from roreg_tpu.pipeline.config import PipelineConfig


class _StubPipeline:
    def __init__(self, cfg):
        self.cfg = cfg
        self.variables = {}


class _StubScene:
    name = "stub"
    pc_ids = (0, 1, 2)
    pair_ids = ((0, 1), (0, 2))  # both pairs share cloud 0

    def get_kps(self, pc_id):
        # first coordinate IS the keypoint index -> sampled ids observable
        idx = np.arange(64, dtype=np.float32)[:, None]
        rng = np.random.default_rng(pc_id)
        rest = rng.uniform(0, 1, size=(64, 2)).astype(np.float32)
        return np.concatenate([idx, rest], 1)

    def get_transform(self, id0, id1):
        return np.eye(4)


def _fake_pair_stage(variables, cfg, rng, bb0, bb1, gf0, gf1, k0, k1):
    M = k0.shape[0]
    return {
        "transform": jnp.eye(4),
        "overlap": jnp.zeros(()),
        "m0": jnp.arange(M),
        "m1": jnp.arange(M),
        "est_valid": jnp.zeros((M,), bool),
    }


def _run_scene(seed):
    cfg = PipelineConfig(use_rd=False, use_rm=False, keynum=16,
                         eval_pair_batch=2)
    ev = Evaluator.__new__(Evaluator)  # skip dataclass init (no device put)
    ev.pipeline = _StubPipeline(cfg)
    ev.mesh = None
    ev.cache_dir = None
    ev.desc_store = None
    from roreg_tpu.utils.profiling import StageTimer

    ev.timer = StageTimer()

    def describe_cloud(ds, pc_id):
        return (jnp.zeros((64, 2, 4)), jnp.zeros((64, 2, 4)), jnp.zeros(64))

    ev.describe_cloud = describe_cloud

    captured = []  # (keys_m0, keys_m1) per pair, host-side

    import roreg_tpu.eval.evaluator as eval_mod
    import roreg_tpu.dist.eval as dist_eval

    orig_stage = dist_eval.pair_stage
    orig_fmr = eval_mod.fmr_ir

    def spy_fmr_ir(km0, km1, ev_mask, T_gt, t1, t2):
        captured.append((np.asarray(km0), np.asarray(km1)))
        return 0.0, 0.0

    dist_eval.pair_stage = _fake_pair_stage
    eval_mod.fmr_ir = spy_fmr_ir
    dist_eval.pair_batch_from_stacks.clear_cache()
    try:
        ev.process_scene(_StubScene(), seed=seed)
    finally:
        dist_eval.pair_stage = orig_stage
        eval_mod.fmr_ir = orig_fmr
        dist_eval.pair_batch_from_stacks.clear_cache()
    assert len(captured) == 2
    # sampled keypoint ids of cloud 0 as seen by pair (0,1) and pair (0,2)
    ids_pair01 = np.sort(captured[0][0][:, 0].astype(int))
    ids_pair02 = np.sort(captured[1][0][:, 0].astype(int))
    return ids_pair01, ids_pair02


def test_per_pair_draws_are_independent_and_reproducible():
    a01, a02 = _run_scene(seed=3)
    assert not np.array_equal(a01, a02), (
        "pairs sharing cloud 0 must draw independent random subsets"
    )
    b01, b02 = _run_scene(seed=3)
    np.testing.assert_array_equal(a01, b01)
    np.testing.assert_array_equal(a02, b02)
    c01, _ = _run_scene(seed=4)
    assert not np.array_equal(a01, c01), "different seed -> different draw"
