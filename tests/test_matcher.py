"""Matcher-stage unit tests: rank normalization, NMS sampling semantics,
mutual matching, top-match subsetting (test/matcher.py + detector.py:43-46
parity properties)."""

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.pipeline.matcher import (
    mutual_match,
    nms_sample,
    rank_normalize,
    top_match_subset,
)


def test_rank_normalize(rng):
    s = rng.normal(size=(100,)).astype(np.float32)
    mask = np.ones(100, bool)
    r = np.asarray(rank_normalize(jnp.asarray(s), jnp.asarray(mask)))
    # ranks in [0, 1), distinct, order-preserving
    assert r.min() == 0.0 and r.max() < 1.0
    assert len(np.unique(r)) == 100
    assert np.array_equal(np.argsort(r), np.argsort(s, kind="stable"))


def test_rank_normalize_masked(rng):
    s = rng.normal(size=(50,)).astype(np.float32)
    mask = np.arange(50) < 30
    r = np.asarray(rank_normalize(jnp.asarray(s), jnp.asarray(mask)))
    assert (r[30:] == -1).all()
    valid = r[:30]
    assert valid.min() == 0.0 and valid.max() < 1.0
    assert len(np.unique(valid)) == 30


def test_nms_sample_suppresses_neighbors(rng):
    # two clusters; in each, only the best-scoring point should survive NMS
    c0 = rng.normal(size=(10, 3)).astype(np.float32) * 0.01
    c1 = rng.normal(size=(10, 3)).astype(np.float32) * 0.01 + 5.0
    far = rng.normal(size=(30, 3)).astype(np.float32) * 0.01 + np.arange(30)[:, None] * 10 + 50
    keys = np.concatenate([c0, c1, far]).astype(np.float32)
    scores = rng.permutation(50).astype(np.float32) / 50
    idx = np.asarray(
        nms_sample(jnp.asarray(keys), jnp.asarray(scores),
                   jnp.ones(50, bool), 32, k=5)
    )
    assert len(idx) == 32
    assert len(set(idx.tolist())) == 32  # exact count, no duplicates
    # the top-scoring point of each tight cluster must be selected
    top0 = np.argmax(scores[:10])
    top1 = 10 + np.argmax(scores[10:20])
    assert top0 in idx and top1 in idx
    # NMS survivors are preferred: the best of cluster 0 ranks before any
    # suppressed member of cluster 0 that was topped up
    prio = {v: i for i, v in enumerate(idx.tolist())}
    sup0 = [i for i in range(10) if i != top0 and i in prio]
    assert all(prio[top0] < prio[s] for s in sup0)


def test_nms_sample_masked(rng):
    keys = rng.normal(size=(40, 3)).astype(np.float32) * 10
    scores = rng.random(40).astype(np.float32)
    mask = np.arange(40) < 20
    idx = np.asarray(
        nms_sample(jnp.asarray(keys), jnp.asarray(scores),
                   jnp.asarray(mask), 16, k=3)
    )
    assert (idx < 20).all()


def test_top_match_subset_fraction():
    scores = jnp.asarray(np.arange(100, dtype=np.float32))
    valid = jnp.ones(100, bool)
    m = np.asarray(top_match_subset(scores, valid, 0.5, 100))
    assert m.sum() == 50
    assert m[50:].all() and not m[:50].any()


def test_top_match_subset_use_all_sentinel():
    """match_n in [0.999, 1) means USE ALL valid matches (reference
    --match_n help: '0.99 to use all'; estimator.py:188-193 encodes it as
    argsort[-int(0.999):] == [-0:] == everything). The round-3 regression
    mapped 0.999 to int()==0 and silenced every RM-chain estimate."""
    scores = jnp.asarray(np.arange(100, dtype=np.float32))
    valid = jnp.asarray(np.arange(100) % 2 == 0)
    m = np.asarray(top_match_subset(scores, valid, 0.999, 100))
    assert (m == np.asarray(valid)).all()  # exactly the valid set


def test_top_match_subset_count():
    scores = jnp.asarray(np.arange(100, dtype=np.float32))
    valid = jnp.ones(100, bool)
    m = np.asarray(top_match_subset(scores, valid, 30, 100))
    assert m.sum() == 30
    assert m[70:].all()


def test_top_match_subset_min_10():
    scores = jnp.asarray(np.arange(20, dtype=np.float32))
    valid = jnp.ones(20, bool)
    # fraction so small the reference clamps to >= 10 (estimator.py:190)
    m = np.asarray(top_match_subset(scores, valid, 0.01, 20))
    assert m.sum() == 10


def test_mutual_match_group_mean(rng):
    # build group features whose means identify points
    base = rng.normal(size=(50, 32)).astype(np.float32)
    f0 = np.repeat(base[:, None, :], 12, axis=1)
    perm = rng.permutation(50)
    f1 = f0[perm] + rng.normal(size=f0.shape).astype(np.float32) * 0.01
    nn01, mut = mutual_match(
        jnp.asarray(f0), jnp.asarray(f1), jnp.ones(50, bool), jnp.ones(50, bool)
    )
    ok = np.asarray(mut)
    assert ok.mean() > 0.9
    inv_perm = np.argsort(perm)
    assert np.array_equal(np.asarray(nn01)[ok], inv_perm[ok])
