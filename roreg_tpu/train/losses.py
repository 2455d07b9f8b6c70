"""Training losses for the four learned components.

JAX equivalents of reference ``train/loss.py``:

* ``gf_loss``  — Batch_hard_Rindex_loss (:20-50): batch-hard margin
  contrastive on invariant descriptors (log-softmax distances, margin 0.3,
  weight 5) + cross-entropy on the 60-way rotation-index correlation.
* ``rd_loss``  — RD_loss (:53-72): mean-normalized scores weighting SE(3)
  quaternion+translation errors.
* ``rm_loss``  — RM_loss (:75-109): OT negative-log-likelihood at gt pairs
  and dustbins + per-layer softmax-product auxiliary loss.
* ``et_loss``  — L2_loss (:122-132): sum-reduction MSE on the residual
  quaternion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roreg_tpu.models.ops import group_correlation

__all__ = ["gf_loss", "rd_loss", "rm_loss", "et_loss", "name2loss"]


def gf_loss(
    inv0: jnp.ndarray,
    inv1: jnp.ndarray,
    eqv0: jnp.ndarray,
    eqv1: jnp.ndarray,
    true_idx: jnp.ndarray,
    cayley: jnp.ndarray,
    margin: float = 0.3,
    metric_weight: float = 5.0,
) -> tuple[jnp.ndarray, dict]:
    """inv* (B, 32) invariant descriptors of matched pairs; eqv* (B, G, 32)
    descriptor eqv features; true_idx (B,) gt group index."""
    b = inv0.shape[0]
    dist = jnp.sum((inv0[:, None, :] - inv1[None, :, :]) ** 2, axis=-1)  # (B, B)
    logp = jax.nn.log_softmax(dist, axis=1)
    loss_true = jnp.diagonal(logp)
    loss_false = jnp.min(logp + jnp.eye(b), axis=1)
    metric = jnp.mean(jnp.clip(loss_true - loss_false + margin, 0.0, None))

    score = group_correlation(eqv0, eqv1, cayley)  # (B, G)
    ce = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(score, axis=-1), true_idx[:, None], axis=1
        )
    )
    pred = jnp.argmax(score, axis=-1)
    acc = jnp.mean((pred == true_idx).astype(jnp.float32))
    return metric_weight * metric + ce, {
        "metric_loss": metric, "ce_loss": ce, "dr_acc": acc
    }


def rd_loss(scores: jnp.ndarray, rdiffs: jnp.ndarray) -> jnp.ndarray:
    """scores (2B,) for the two sides of each match, rdiffs (B,) SE(3)
    error labels (quaternion distance + tdiff/3, dataloader.py:112-123)."""
    b = rdiffs.shape[0]
    s = scores[:b] + scores[b:]
    s = s / jnp.clip(jnp.mean(s), 1e-12)
    return jnp.mean(s * rdiffs)


def rm_loss(
    scores_bin: jnp.ndarray,
    scores_other: jnp.ndarray,
    pairs: jnp.ndarray,
    pair_mask: jnp.ndarray,
    unpair0_mask: jnp.ndarray,
    unpair1_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    """Batched OT loss (B=1 in practice, like the reference).

    scores_bin (B, M+1, N+1) log-OT output; scores_other (B, M, N, L) aux
    softmax products; pairs (B, P, 2) gt correspondence indices with
    pair_mask (B, P); unpair*_mask (B, M)/(B, N) flag gt-unmatched points.
    """
    eps = 1e-5
    L = scores_other.shape[-1]

    def per_batch(sb, so, prs, pm, u0, u1):
        at = sb[prs[:, 0], prs[:, 1]]
        denom_p = jnp.clip(jnp.sum(pm), 1.0)
        ploss = jnp.sum(jnp.where(pm, -at, 0.0)) / denom_p
        u0loss = jnp.sum(jnp.where(u0, -sb[:-1, -1], 0.0)) / jnp.clip(
            jnp.sum(u0), 1.0
        )
        u1loss = jnp.sum(jnp.where(u1, -sb[-1, :-1], 0.0)) / jnp.clip(
            jnp.sum(u1), 1.0
        )
        ot = ploss + u0loss + u1loss
        aux = 0.0
        for l in range(L):
            sl = so[:, :, l]
            at_l = sl[prs[:, 0], prs[:, 1]]
            aux += jnp.sum(jnp.where(pm, -jnp.log(at_l + eps), 0.0)) / denom_p
        return ot, aux

    ot, aux = jax.vmap(per_batch)(
        scores_bin, scores_other, pairs, pair_mask, unpair0_mask, unpair1_mask
    )
    ot = jnp.sum(ot)
    aux = jnp.sum(aux)
    return aux + L * ot, {"ot_loss": ot, "aux_loss": aux}


def et_loss(q_pred: jnp.ndarray, q_gt: jnp.ndarray) -> jnp.ndarray:
    """Sum-reduction MSE on quaternions (L2_loss, train/loss.py:122-132)."""
    return jnp.sum((q_pred - q_gt) ** 2)


name2loss = {"gf": gf_loss, "rd": rd_loss, "rm": rm_loss, "et": et_loss}
