"""Self-run pipeline to generate RD supervision.

Equivalent of reference ``train/trainset/RD.py`` (:24-73): run the
*inference* pipeline (descriptor -> mutual match -> coarse index -> ET local
transform) over the training pairs; the predicted per-match transforms,
compared with gt, become the rotation-guided detector's training labels.
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


def build_rd_match_bank(pipe, scenes, seed: int = 0) -> list[dict]:
    cfg = pipe.cfg
    group = get_group(cfg.group_size)
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
            inv0 = jnp.mean(gf0, axis=1)
            inv1 = jnp.mean(gf1, axis=1)
            inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
            inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
            nn01, mut = mutual_nn(inv0, inv1)
            m0 = np.where(np.asarray(mut))[0]
            if len(m0) < 8:
                continue
            m1 = np.asarray(nn01)[m0]
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
