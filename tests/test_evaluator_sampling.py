"""Per-pair keypoint sampling parity (reference test/matcher.py:174-180).

Without RD, the random keynum subset must be drawn per (pair, side) — two
pairs sharing a cloud draw INDEPENDENT subsets — and reproducibly for a
given seed. Exercised with a stubbed pipeline (no network compiles) so the
semantics are pinned in the quick gate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.eval.evaluator import Evaluator
from roreg_tpu.pipeline.config import PipelineConfig


class _StubPipeline:
    """Minimal pipeline: descriptors ARE keypoint indices, so the sampled
    subset is directly observable in the pair-stage inputs."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.variables = {}

    def sample_keypoints(self, keys, det_scores, kp_mask, rng):
        noise = jax.random.uniform(rng, (keys.shape[0],))
        prio = jnp.where(kp_mask, noise, -1.0)
        _, idx = jax.lax.top_k(prio, self.cfg.keynum)
        return idx


class _StubScene:
    name = "stub"
    pc_ids = (0, 1, 2)
    pair_ids = ((0, 1), (0, 2))  # both pairs share cloud 0

    def get_kps(self, pc_id):
        rng = np.random.default_rng(pc_id)
        return rng.uniform(0, 1, size=(64, 3)).astype(np.float32)

    def get_transform(self, id0, id1):
        return np.eye(4)


def _run_scene(seed):
    cfg = PipelineConfig(use_rd=False, use_rm=False, keynum=16,
                         eval_pair_batch=2)
    pipe = _StubPipeline(cfg)
    ev = Evaluator.__new__(Evaluator)  # skip dataclass init (no timer need)
    ev.pipeline = pipe
    ev.mesh = None
    ev.cache_dir = None
    from roreg_tpu.utils.profiling import StageTimer

    ev.timer = StageTimer()

    # descriptors encode the keypoint index -> sampled ids observable
    def describe_cloud(ds, pc_id):
        idx = jnp.arange(64, dtype=jnp.float32)
        bb = idx[:, None, None] * jnp.ones((1, 2, 4))
        gf = bb + 1000 * (1 + list(_StubScene.pc_ids).index(pc_id))
        det = jnp.zeros(64)
        return bb, gf, det

    ev.describe_cloud = describe_cloud

    captured = []

    def fake_pair_stage(variables, cfg, rngs, bb0, bb1, gf0, gf1, k0, k1):
        captured.append((np.asarray(bb0), np.asarray(bb1)))
        B, M = bb0.shape[0], k0.shape[1]
        return {
            "transform": jnp.tile(jnp.eye(4), (B, 1, 1)),
            "overlap": jnp.zeros(B),
            "m0": jnp.zeros((B, M), jnp.int32),
            "m1": jnp.zeros((B, M), jnp.int32),
            "est_valid": jnp.zeros((B, M), bool),
        }

    import roreg_tpu.dist.eval as dist_eval

    orig = dist_eval.batched_pair_stage
    dist_eval.batched_pair_stage = fake_pair_stage
    try:
        ev.process_scene(_StubScene(), seed=seed)
    finally:
        dist_eval.batched_pair_stage = orig
    (bb0, _), = captured  # one batch of 2 pairs
    # sampled keypoint ids of cloud 0 as seen by pair (0,1) and pair (0,2)
    ids_pair01 = np.sort(bb0[0, :, 0, 0].astype(int))
    ids_pair02 = np.sort(bb0[1, :, 0, 0].astype(int))
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
