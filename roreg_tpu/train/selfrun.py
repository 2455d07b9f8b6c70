"""Self-run pipeline to generate RD supervision.

Equivalent of reference ``train/trainset/RD.py`` (:24-73): run the
*inference* pipeline over the training pairs; the predicted per-match
transforms, compared with gt, become the rotation-guided detector's
training labels.

The reference chain is testset.py -> extractorI (GF) -> matcher
``matmul`` -> extractor_dr_index -> extractor_localtrans (ET). At the RD
trainset defaults (``parses_train_rd.py:45`` keynum=5000, RD off) the
``matmul`` matcher (test/matcher.py:44-109) shuffles all 5000 keypoints
(i.e. keeps them all) and mutual-NNs the group-mean (inv) GF features —
exactly the default path below. When the pipeline config enables RM
(``cfg.use_rm``), matching instead routes through the configured
attention+Sinkhorn matcher on a per-pair random keynum subset, so RD
labels come from the same match distribution the deployed pipeline
produces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.core.group import get_group
from roreg_tpu.core.knn import mutual_nn
from roreg_tpu.pipeline import estimator as est
from roreg_tpu.pipeline.extractor import extract as extract_group_feats
from roreg_tpu.pipeline.registration import et_apply, gf_apply

__all__ = ["build_rd_match_bank"]


def _match_mutual(gf0, gf1):
    """Reference 'matmul' matcher at defaults: mutual NN over inv feats."""
    inv0 = jnp.mean(gf0, axis=1)
    inv1 = jnp.mean(gf1, axis=1)
    inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
    inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
    nn01, mut = mutual_nn(inv0, inv1)
    m0 = np.where(np.asarray(mut))[0]
    m1 = np.asarray(nn01)[m0]
    return m0, m1


def _match_rm(pipe, rng_np, gf0, gf1, kp0, kp1):
    """Configured-chain matching: per-pair random keynum subset (no RD
    scores exist while RD's trainset is being built) + the RM
    attention+Sinkhorn matcher. Returns match indices into the FULL
    keypoint arrays."""
    from roreg_tpu.models.rm import RotationCoherenceMatcher

    cfg = pipe.cfg
    group = get_group(cfg.group_size)
    n0, n1 = kp0.shape[0], kp1.shape[0]
    s0 = rng_np.permutation(n0)[: min(cfg.keynum, n0)]
    s1 = rng_np.permutation(n1)[: min(cfg.keynum, n1)]
    net = RotationCoherenceMatcher(
        group,
        coor_norm_step=cfg.coor_norm_step,
        sinkhorn_iters=cfg.sinkhorn_iters,
    )
    out = net.apply(
        pipe.variables["rm"],
        gf1[s1][None], gf0[s0][None], kp1[s1][None], kp0[s0][None],
        jnp.ones((1, len(s1)), bool), jnp.ones((1, len(s0)), bool),
    )
    matches0 = np.asarray(out["matches0"][0])
    keep = matches0 >= 0
    m0 = s0[matches0[keep]]
    m1 = s1[np.where(keep)[0]]
    return m0, m1


def build_rd_match_bank(pipe, scenes, seed: int = 0) -> list[dict]:
    cfg = pipe.cfg
    group = get_group(cfg.group_size)
    use_rm = bool(cfg.use_rm) and pipe.variables.get("rm") is not None
    rng_np = np.random.default_rng(seed)
    bank = []
    for ds in scenes:
        desc = {}
        for pc_id in ds.pc_ids:
            pc = jnp.asarray(ds.get_pc(pc_id).astype(np.float32))
            kp = jnp.asarray(ds.get_kps(pc_id).astype(np.float32))
            bb = extract_group_feats(
                pipe.variables["backbone"], pc, jnp.ones(pc.shape[0], bool),
                kp, cfg,
            )
            gf = gf_apply(pipe.variables["gf"], bb, cfg)
            desc[pc_id] = (bb, gf, kp)
        for (id0, id1) in ds.pair_ids:
            bb0, gf0, kp0 = desc[id0]
            bb1, gf1, kp1 = desc[id1]
            if use_rm:
                m0, m1 = _match_rm(pipe, rng_np, gf0, gf1, kp0, kp1)
            else:
                m0, m1 = _match_mutual(gf0, gf1)
            if len(m0) < 8:
                continue
            dr = est.dr_index(gf0[m0], gf1[m1], group.cayley)
            quats = et_apply(
                pipe.variables["et"], bb0[m0], bb1[m1], gf0[m0], gf1[m1],
                dr, cfg,
            )
            T_pre = est.local_transforms(
                quats, dr, kp0[m0], kp1[m1], group.rotations
            )
            bank.append(
                {
                    "feats0": np.asarray(gf0[m0]),
                    "feats1": np.asarray(gf1[m1]),
                    "T_pre": np.asarray(T_pre),
                    "T_gt": ds.get_transform(id0, id1),
                }
            )
    if not bank:
        raise RuntimeError("self-run produced no match banks (too few matches)")
    return bank
