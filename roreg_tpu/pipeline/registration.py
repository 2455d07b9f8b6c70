"""End-to-end pair registration: extract -> describe -> detect -> match ->
estimate, as a chain of jitted stages over static-capacity arrays.

This is the TPU replacement for the reference's file-cache-glued stage
scripts (test/extractor.py -> detector.py -> matcher.py -> estimator.py,
orchestrated by test/evaluator.py:39-48): stage outputs stay on device, a
scan pair goes in and a rigid transform comes out.

Side convention follows the reference throughout: gt satisfies
``pts0 = R @ pts1 + t`` (dataops/dataset.py:27-30); the RM matcher and the
ET estimator both consume (cloud1 = before-rot, cloud0 = after-rot) in the
reference's swapped order (test/matcher.py:192-199, estimator.py:310-330).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from roreg_tpu.core.group import get_group
from roreg_tpu.models.et import EquivariantTransformer
from roreg_tpu.models.gf import GroupFeatNetwork
from roreg_tpu.models.rd import RotationDetector
from roreg_tpu.models.rm import RotationCoherenceMatcher
from roreg_tpu.pipeline import estimator as est
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.extractor import extract_group_features, make_backbone
from roreg_tpu.pipeline.matcher import (
    mutual_match,
    nms_sample,
    rank_normalize,
    top_match_subset,
)

__all__ = ["RegistrationPipeline", "gf_apply", "rd_apply", "describe_tail"]


# --------------------------------------------------------------------------
# stage functions (pure, jitted, cfg static)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def gf_apply(gf_vars, group_feats: jnp.ndarray, cfg: PipelineConfig) -> jnp.ndarray:
    """(K, G, 32) backbone group feats -> (K, G, 32) RoReg-Desc eqv feats,
    chunked like the reference's bs_GF batching (test/extractor.py:44-58)."""
    group = get_group(cfg.group_size)
    net = GroupFeatNetwork(group)
    k = group_feats.shape[0]
    bs = min(cfg.bs_gf, k)
    pad = (-k) % bs
    x = jnp.pad(group_feats, ((0, pad), (0, 0), (0, 0)))
    chunks = x.reshape(-1, bs, *x.shape[1:])
    out = jax.lax.map(lambda c: net.apply(gf_vars, c, False)["eqv"], chunks)
    return out.reshape(-1, *x.shape[1:])[:k]


@functools.partial(jax.jit, static_argnames=("cfg",))
def rd_apply(rd_vars, eqv: jnp.ndarray, mask: jnp.ndarray, cfg: PipelineConfig):
    """Saliency scores, rank-normalized to [0,1) (test/detector.py:43-46)."""
    group = get_group(cfg.group_size)
    net = RotationDetector(group)
    scores = net.apply(rd_vars, eqv, False)
    return rank_normalize(scores, mask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rm_apply(
    rm_vars,
    eqv0: jnp.ndarray,
    eqv1: jnp.ndarray,
    keys0: jnp.ndarray,
    keys1: jnp.ndarray,
    cfg: PipelineConfig,
):
    """RM matcher on sampled keypoint sets, with the reference's side swap
    (source = cloud1 features, test/matcher.py:192-199).

    Returns matches (M, 2) int32 indices *within the sampled sets*
    [idx_in_0, idx_in_1], match validity (M,), scores (M,).
    """
    group = get_group(cfg.group_size)
    net = RotationCoherenceMatcher(
        group,
        coor_norm_step=cfg.coor_norm_step,
        sinkhorn_iters=cfg.sinkhorn_iters,
    )
    m = eqv1.shape[0]
    out = net.apply(
        rm_vars,
        eqv1[None],  # source = cloud1 (before rot)
        eqv0[None],
        keys1[None],
        keys0[None],
        jnp.ones((1, eqv1.shape[0]), bool),
        jnp.ones((1, eqv0.shape[0]), bool),
    )
    matches0 = out["matches0"][0]  # (M,) index into cloud0 samples, -1 invalid
    scores = out["matching_scores0"][0]
    valid = matches0 >= 0
    pair = jnp.stack([jnp.where(valid, matches0, 0), jnp.arange(m)], axis=-1)
    return pair.astype(jnp.int32), valid, scores


@functools.partial(jax.jit, static_argnames=("cfg",))
def et_apply(
    et_vars,
    bb0_m: jnp.ndarray,
    bb1_m: jnp.ndarray,
    gf0_m: jnp.ndarray,
    gf1_m: jnp.ndarray,
    idx: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Residual quaternions for matched pairs, with the reference's side
    exchange (before_eqv0 = cloud1 features; estimator.py:310-318)."""
    group = get_group(cfg.group_size)
    net = EquivariantTransformer(group)
    m = bb0_m.shape[0]
    bs = min(cfg.bs_et, m)
    pad = (-m) % bs

    def pad0(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    args = [pad0(x) for x in (bb1_m, bb0_m, gf1_m, gf0_m)]
    idx_p = jnp.pad(idx, (0, pad))
    chunks = [x.reshape(-1, bs, *x.shape[1:]) for x in args]
    idx_c = idx_p.reshape(-1, bs)

    def one(c):
        b1, b0, g1, g0, ii = c
        return net.apply(et_vars, b1, b0, g1, g0, ii, False, True)

    q = jax.lax.map(one, (*chunks, idx_c))
    return q.reshape(-1, 4)[:m]


# --------------------------------------------------------------------------
# pipeline driver
# --------------------------------------------------------------------------


def pair_stage(
    variables: dict,
    cfg: PipelineConfig,
    rng: jax.Array,
    bb0_s, bb1_s, gf0_s, gf1_s, k0_s, k1_s,
):
    """Match + estimate on pre-sampled keypoint sets (keynum rows each).

    The post-sampling half of the pipeline as one pure function — reused by
    the single-pair driver and vmapped/sharded for pair-parallel eval
    (dist/eval.py). All shapes static in keynum.
    """
    group = get_group(cfg.group_size)
    if cfg.use_rm:
        rb = cfg.rm_row_block
        if rb is None and cfg.keynum > 1536:
            rb = 512  # blocked kNN: peak attention memory block x N, not M x N
        net = RotationCoherenceMatcher(
            group,
            coor_norm_step=cfg.coor_norm_step,
            sinkhorn_iters=cfg.sinkhorn_iters,
            row_block=rb,
            aux_scores=False,  # training-only aux maps; skip at eval
        )
        out = net.apply(
            variables["rm"],
            gf1_s[None], gf0_s[None], k1_s[None], k0_s[None],
            jnp.ones((1, gf1_s.shape[0]), bool),
            jnp.ones((1, gf0_s.shape[0]), bool),
        )
        matches0 = out["matches0"][0]
        mscores = out["matching_scores0"][0]
        mvalid = matches0 >= 0
        m0 = jnp.where(mvalid, matches0, 0)
        m1 = jnp.arange(gf1_s.shape[0])
        est_valid = top_match_subset(mscores, mvalid, cfg.match_n, cfg.keynum)
    else:
        inv0 = jnp.mean(gf0_s, axis=1)
        inv1 = jnp.mean(gf1_s, axis=1)
        inv0 = inv0 / (jnp.linalg.norm(inv0, axis=-1, keepdims=True) + 1e-5)
        inv1 = inv1 / (jnp.linalg.norm(inv1, axis=-1, keepdims=True) + 1e-5)
        from roreg_tpu.core.knn import mutual_nn as _mutual

        nn01, mut = _mutual(inv0, inv1)
        m0 = jnp.arange(cfg.keynum)
        m1 = nn01
        mvalid = mut
        mscores = jnp.ones((cfg.keynum,), jnp.float32)
        est_valid = mvalid

    keys_m0, keys_m1 = k0_s[m0], k1_s[m1]
    dr = est.dr_index(gf0_s[m0], gf1_s[m1], group.cayley)
    if cfg.estimator == "yohoo":
        net_et = EquivariantTransformer(group)
        quats = net_et.apply(
            variables["et"], bb1_s[m1], bb0_s[m0], gf1_s[m1], gf0_s[m0],
            dr, False, True,
        )
        T_hyp = est.local_transforms(quats, dr, keys_m0, keys_m1, group.rotations)
        T, overlap = est.yohoo_ransac(
            rng, T_hyp, est_valid, keys_m0, keys_m1, mscores, est_valid,
            cfg.ransac_ird, cfg.max_iter,
        )
    else:
        T, overlap = est.yohoc_ransac(
            rng, dr, keys_m0, keys_m1, mscores, est_valid,
            cfg.ransac_ird, cfg.max_iter, cfg.group_size,
        )
    return {
        "transform": T,
        "overlap": overlap,
        "m0": m0,
        "m1": m1,
        "match_valid": mvalid,
        "match_scores": mscores,
        "est_valid": est_valid,
        "dr_index": dr,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def describe_tail(
    variables,
    bb: jnp.ndarray,
    keypoints: jnp.ndarray,
    rng: jax.Array,
    cfg: PipelineConfig,
):
    """Backbone group feats -> (bb_s, gf_s, kp_s) sampled triples as ONE
    program: GF descriptor, RD saliency, NMS/random keypoint sampling and
    the three gathers fused. Over a high-latency device link every eager
    stage boundary is a dispatch round trip (measured up to ~1.7 s on a
    degraded link), so the per-cloud tail collapses ~6 dispatches into
    1."""
    gf = gf_apply(variables["gf"], bb, cfg)
    ones = jnp.ones(keypoints.shape[0], bool)
    if cfg.use_rd:
        det = rd_apply(variables["rd"], gf, ones, cfg)
        s = nms_sample(keypoints, det, ones, cfg.keynum, cfg.nms_k)
    else:
        noise = jax.random.uniform(rng, (keypoints.shape[0],))
        s = jax.lax.top_k(noise, cfg.keynum)[1]
    return bb[s], gf[s], keypoints[s]


@functools.partial(jax.jit, static_argnames=("cfg",))
def register_pair_from_descriptors(
    variables,
    cfg: PipelineConfig,
    rng: jax.Array,
    bb0, gf0, det0, kp0,
    bb1, gf1, det1, kp1,
):
    """One jit from full per-cloud descriptors to the transform: keypoint
    sampling (NMS or random), feature gathers, matching, estimation.

    Keeping this a single compiled program matters doubly when the device
    link has high dispatch latency: every eager indexing op between
    stages is a host round trip.
    det* may be None when cfg.use_rd is False.
    """
    from roreg_tpu.pipeline.matcher import nms_sample

    r_s0, r_s1, r_ransac = jax.random.split(rng, 3)
    ones0 = jnp.ones(kp0.shape[0], bool)
    ones1 = jnp.ones(kp1.shape[0], bool)
    if cfg.use_rd:
        s0 = nms_sample(kp0, det0, ones0, cfg.keynum, cfg.nms_k)
        s1 = nms_sample(kp1, det1, ones1, cfg.keynum, cfg.nms_k)
    else:
        s0 = jax.lax.top_k(jax.random.uniform(r_s0, (kp0.shape[0],)), cfg.keynum)[1]
        s1 = jax.lax.top_k(jax.random.uniform(r_s1, (kp1.shape[0],)), cfg.keynum)[1]
    out = pair_stage(
        variables, cfg, r_ransac,
        bb0[s0], bb1[s1], gf0[s0], gf1[s1], kp0[s0], kp1[s1],
    )
    out["sample0"] = s0
    out["sample1"] = s1
    return out


@dataclass
class RegistrationPipeline:
    """Holds trained variables for all five networks and runs pairs.

    variables: dict with keys 'backbone', 'gf', 'rd', 'rm', 'et'.
    """

    cfg: PipelineConfig
    variables: dict[str, Any]

    def init_variables(self, key: jax.Array) -> dict[str, Any]:
        """Random-init all networks (shapes from cfg).

        Runs on the CPU backend: initialization is shape bookkeeping, and
        compiling the full forward graphs on a (possibly remote) TPU just to
        sample initial weights costs minutes. Parameters move to the
        accelerator lazily on first use.
        """
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                return self._init_variables_impl(key)
        return self._init_variables_impl(key)

    def _init_variables_impl(self, key: jax.Array) -> dict[str, Any]:
        cfg = self.cfg
        group = get_group(cfg.group_size)
        ks = jax.random.split(key, 5)
        backbone = make_backbone(cfg)

        # init under jit: eager init dispatches hundreds of tiny ops, which
        # is pathological over a high-latency device link
        import numpy as np

        rng_np = np.random.default_rng(0)
        pts = jnp.asarray(rng_np.uniform(0, 2, (512, 3)).astype(np.float32))
        from roreg_tpu.native.pyramid import build_pyramid_host

        # parameter shapes are independent of the pyramid capacities, so
        # init traces TINY capacity graphs — compiling the init at the
        # production 32768-row caps costs tens of minutes on CPU backends
        caps_init = (512, 256, 128, 64)
        pyr = jax.tree_util.tree_map(
            jnp.asarray,
            build_pyramid_host(
                np.asarray(pts), cfg.voxel_size * 4, caps_init,
                conv1_kernel_size=cfg.conv1_kernel_size,
            ),
        )
        feats_in = jnp.ones((caps_init[0], 1), jnp.float32)
        v_bb = jax.jit(backbone.init, static_argnames=("train",))(
            ks[0], feats_in, pyr, train=False
        )
        g = cfg.group_size
        f = jnp.zeros((2, g, 32))
        v_gf = jax.jit(GroupFeatNetwork(group).init, static_argnums=(2,))(
            ks[1], f, False
        )
        v_rd = jax.jit(RotationDetector(group).init, static_argnums=(2,))(
            ks[2], f, False
        )
        v_rm = jax.jit(RotationCoherenceMatcher(group).init)(
            ks[3],
            jnp.zeros((1, 8, g, 32)),
            jnp.zeros((1, 8, g, 32)),
            jnp.zeros((1, 8, 3)),
            jnp.zeros((1, 8, 3)),
            jnp.ones((1, 8), bool),
            jnp.ones((1, 8), bool),
        )
        v_et = jax.jit(EquivariantTransformer(group).init, static_argnums=(6,))(
            ks[4], f, f, f, f, jnp.zeros((2,), jnp.int32), False
        )
        self.variables = {
            "backbone": v_bb, "gf": v_gf, "rd": v_rd, "rm": v_rm, "et": v_et
        }
        return self.variables

    # ---- stages ----

    def describe(self, points, point_mask, keypoints):
        """Cloud -> backbone group features -> descriptor eqv features.

        Engine dispatch (block / host-map gather / all-device) lives in
        :func:`roreg_tpu.pipeline.extractor.extract`.
        """
        from roreg_tpu.pipeline.extractor import extract

        bb = extract(
            self.variables["backbone"], points, point_mask, keypoints, self.cfg
        )
        gf = gf_apply(self.variables["gf"], bb, self.cfg)
        return bb, gf

    def detect(self, gf_eqv, kp_mask):
        return rd_apply(self.variables["rd"], gf_eqv, kp_mask, self.cfg)

    def sample_keypoints(self, keys, det_scores, kp_mask, rng):
        cfg = self.cfg
        if cfg.use_rd:
            return nms_sample(keys, det_scores, kp_mask, cfg.keynum, cfg.nms_k)
        # no detector: random keynum subset (test/matcher.py:174-180)
        noise = jax.random.uniform(rng, (keys.shape[0],))
        prio = jnp.where(kp_mask, noise, -1.0)
        _, idx = jax.lax.top_k(prio, cfg.keynum)
        return idx

    def register_pair(
        self,
        rng: jax.Array,
        points0, mask0, keys0,
        points1, mask1, keys1,
        kp_mask0=None, kp_mask1=None,
    ) -> dict:
        """Full pipeline on one scan pair. Returns transform + diagnostics."""
        cfg = self.cfg
        group = get_group(cfg.group_size)
        if kp_mask0 is None:
            kp_mask0 = jnp.ones((keys0.shape[0],), bool)
        if kp_mask1 is None:
            kp_mask1 = jnp.ones((keys1.shape[0],), bool)

        bb0, gf0 = self.describe(points0, mask0, keys0)
        bb1, gf1 = self.describe(points1, mask1, keys1)

        r_samp0, r_samp1, r_ransac = jax.random.split(rng, 3)
        if cfg.use_rd:
            det0 = self.detect(gf0, kp_mask0)
            det1 = self.detect(gf1, kp_mask1)
        else:
            det0 = det1 = None
        s0 = self.sample_keypoints(keys0, det0, kp_mask0, r_samp0)
        s1 = self.sample_keypoints(keys1, det1, kp_mask1, r_samp1)

        gf0_s, gf1_s = gf0[s0], gf1[s1]
        k0_s, k1_s = keys0[s0], keys1[s1]

        if cfg.use_rm:
            pair_in_s, mvalid, mscores = rm_apply(
                self.variables["rm"], gf0_s, gf1_s, k0_s, k1_s, cfg
            )
        else:
            ones = jnp.ones((cfg.keynum,), bool)
            nn01, mut = mutual_match(gf0_s, gf1_s, ones, ones)
            pair_in_s = jnp.stack(
                [jnp.arange(cfg.keynum), nn01], axis=-1
            ).astype(jnp.int32)
            mvalid, mscores = mut, jnp.ones((cfg.keynum,), jnp.float32)

        m0 = pair_in_s[:, 0]  # index into sample0
        m1 = pair_in_s[:, 1]
        keys_m0, keys_m1 = k0_s[m0], k1_s[m1]

        est_valid = mvalid
        if cfg.use_rm:
            est_valid = top_match_subset(mscores, mvalid, cfg.match_n, cfg.keynum)

        # coarse per-match group index
        dr = est.dr_index(gf0_s[m0], gf1_s[m1], group.cayley)

        if cfg.estimator == "yohoo":
            quats = et_apply(
                self.variables["et"], bb0[s0][m0], bb1[s1][m1],
                gf0_s[m0], gf1_s[m1], dr, cfg,
            )
            T_hyp = est.local_transforms(
                quats, dr, keys_m0, keys_m1, group.rotations
            )
            T, overlap = est.yohoo_ransac(
                r_ransac, T_hyp, est_valid, keys_m0, keys_m1,
                mscores, est_valid, cfg.ransac_ird, cfg.max_iter,
            )
        elif cfg.estimator == "yohoc":
            T, overlap = est.yohoc_ransac(
                r_ransac, dr, keys_m0, keys_m1, mscores, est_valid,
                cfg.ransac_ird, cfg.max_iter, cfg.group_size,
            )
        else:
            raise ValueError(f"unknown estimator {cfg.estimator}")

        return {
            "transform": T,
            "overlap": overlap,
            "matches": jnp.stack([s0[m0], s1[m1]], axis=-1),
            "match_valid": mvalid,
            "match_scores": mscores,
            "est_valid": est_valid,
            "dr_index": dr,
        }
