"""Keypoint sampling (rank-normalize + spatial NMS) and matching.

Masked fixed-shape equivalents of reference ``test/detector.py:43-46``
(rank normalization), ``test/matcher.py`` ``NMS_sample:11-42``,
``mutual:44-109`` and the ``yoho_mat`` RM-matcher driver ``:152-210``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roreg_tpu.core.knn import knn, mutual_nn

__all__ = ["rank_normalize", "nms_sample", "mutual_match", "top_match_subset"]

_BIG = 1e9


def rank_normalize(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """scores -> ranks/n in [0, 1): detector.py:44-46. Pad rows get -1.

    Side effect the pipeline relies on: rank-normalized scores are all
    distinct, so NMS comparisons have no ties.
    """
    n = scores.shape[0]
    s = jnp.where(mask, scores, -_BIG)
    order = jnp.argsort(s)
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(jnp.arange(n, dtype=jnp.float32))
    nvalid = jnp.sum(mask)
    # valid entries occupy the top ranks; rebase so the worst valid rank is 0
    r = ranks - (n - nvalid)
    return jnp.where(mask, r / jnp.maximum(nvalid, 1), -1.0)


@functools.partial(jax.jit, static_argnames=("num", "k"))
def nms_sample(
    keys: jnp.ndarray,
    scores: jnp.ndarray,
    mask: jnp.ndarray,
    num: int,
    k: int = 5,
) -> jnp.ndarray:
    """Spatial non-max suppression + top-up to exactly ``num`` indices.

    NMS_sample.sample (test/matcher.py:18-42): keep points whose score is the
    max of their k-NN neighborhood; if too many, keep the best ``num``; if too
    few, fill with the best suppressed points. Padded rows never selected
    (provided the cloud has >= num valid keypoints, as in the 3DMatch setup).
    Returns (num,) indices.
    """
    s = jnp.where(mask, scores, -_BIG)
    _, nbr = knn(keys, keys, k, ref_mask=mask)
    nei_max = jnp.max(s[nbr], axis=-1)
    keep = (s >= nei_max) & mask
    # priority: NMS survivors first (by score), then the rest by score
    prio = jnp.where(keep, s + _BIG, s)
    _, idx = jax.lax.top_k(prio, num)
    return idx


@functools.partial(jax.jit, static_argnames=())
def mutual_match(feats0: jnp.ndarray, feats1: jnp.ndarray,
                 mask0: jnp.ndarray, mask1: jnp.ndarray):
    """Group-mean invariant features -> mutual NN matches.

    Equivalent of test/matcher.py:62-105: features are the group means,
    L2-normalized with the same +1e-5 guard, matched by mutual NN.
    Returns (nn01 (M,), is_mutual (M,)).
    """
    inv0 = jnp.mean(feats0, axis=1)
    inv1 = jnp.mean(feats1, axis=1)
    inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
    inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
    return mutual_nn(inv0, inv1, mask0=mask0, mask1=mask1)


def top_match_subset(scores: jnp.ndarray, valid: jnp.ndarray, match_n: float,
                     keynum: int) -> jnp.ndarray:
    """RM top-match selection mask (test/estimator.py:188-198): keep the
    best ``match_n`` fraction (min 10) of valid matches by score; values
    in [0.999, 1) mean "use all" (the reference encodes this via
    ``argsort(scores)[-int(0.999):]`` == ``[-0:]`` == everything, per the
    ``--match_n`` help text "0.99 to use all"); values >= 1 are a top-n
    count. Round-3 regression: 0.999 hit the count branch as int(0.999)=0
    and silenced EVERY RM-chain estimate."""
    nvalid = jnp.sum(valid)
    if match_n >= 1.0:
        num = jnp.minimum(jnp.asarray(int(match_n), jnp.int32), nvalid)
    elif match_n >= 0.999:
        num = nvalid  # "use all" sentinel
    else:
        num = jnp.minimum(
            jnp.maximum((nvalid * match_n).astype(jnp.int32), 10), nvalid
        )
    s = jnp.where(valid, scores, -_BIG)
    order = jnp.argsort(-s)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(s.shape[0]))
    return valid & (rank < num)
