"""On-the-fly trainset synthesis for GF / ET / RM / RD.

The reference materializes ~250-300 GB of disk caches (rotated FCGF features,
30k pickled batch files — train/trainset/GF_ET.py:117-142, RM.py:172-215,
README.md:116-128). Here the same sample distributions are synthesized
on demand: per-cloud rotated group features are computed once on device and
kept in host RAM; batches are assembled with numpy and streamed to the
train step. Label conventions follow the reference exactly:

* GF/ET: feats0 = cloud0 under random R_i, feats1 = cloud1 under random R_j,
  label R = R_j @ gtR.T @ R_i.T (cloud1_rot = R · cloud0_rot frame-wise,
  GF_ET.py:186-192), true_idx = nearest group element, deltaR = R @ R_aᵀ.
* RM: sampled keypoint sets, gt mutual-NN pairs (< pps_thre), group-rotation
  augmentation on side 1 = permute the feature group axis by the Cayley row
  (RM.py:154-160), random translations.
* RD: per-match SE(3) error labels from the self-run pipeline's predicted
  transforms (quaternion distance + tdiff/3, dataops/dataloader.py:112-123).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.core.group import get_group
from roreg_tpu.data.dataset import ThreeDMatchDataset
from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.extractor import extract as extract_group_feats

__all__ = ["RotatedFeatureCache", "gf_et_batches", "rm_batches", "rd_batches"]


def _np_quat_from_matrix(R):
    from scipy.spatial.transform import Rotation as _R

    q = _R.from_matrix(R).as_quat()
    q = np.concatenate([[q[3]], q[:3]])
    return -q if q[0] < 0 else q


def _random_rotation_np(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    from scipy.spatial.transform import Rotation as _R

    return _R.from_quat(np.concatenate([q[1:], [q[0]]])).as_matrix()


@dataclass
class RotatedFeatureCache:
    """Per-cloud backbone group features under Rnum random rotations
    (the in-RAM equivalent of the reference's Rotated_Features cache)."""

    cfg: PipelineConfig
    backbone_vars: dict
    rnum: int = 2

    def __post_init__(self):
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def get(self, ds: ThreeDMatchDataset, pc_id, rng) -> tuple[np.ndarray, np.ndarray]:
        """-> (Rs (rnum, 3, 3), feats (rnum, K, G, 32))."""
        key = f"{ds.name}/{pc_id}"
        if key not in self._cache:
            pc = ds.get_pc(pc_id).astype(np.float32)
            kps = ds.get_kps(pc_id).astype(np.float32)
            Rs, feats = [], []
            for _ in range(self.rnum):
                R = _random_rotation_np(rng).astype(np.float32)
                f = extract_group_feats(
                    self.backbone_vars,
                    jnp.asarray(pc @ R.T),
                    jnp.ones((pc.shape[0],), bool),
                    jnp.asarray(kps @ R.T),
                    self.cfg,
                )
                Rs.append(R)
                feats.append(np.asarray(f))
            self._cache[key] = (np.stack(Rs), np.stack(feats))
        return self._cache[key]


def pca_planarity(pc: np.ndarray, keys: np.ndarray,
                  radius: float = 0.3) -> np.ndarray:
    """Per-keypoint surface variation: smallest PCA eigenvalue of the
    radius-neighborhood, normalized by the eigenvalue sum.

    The reference filters GF/ET training keypoints by a precomputed
    ``pca_0.3/{pc}.npy`` planarity score (train/trainset/GF_ET.py:34-67,
    ``Pcas[:, 0] > pca_thre`` with pca_thre=0.03): near-planar keypoints
    (score ~ 0, e.g. flat walls) are rotationally ambiguous and excluded
    from descriptor/rotation supervision. Those files ship with the
    reference's training data; here the score is computed on the fly.
    Keypoints with < 8 neighbors score 0 (dropped by any threshold).
    """
    from scipy.spatial import cKDTree

    tree = cKDTree(pc)
    out = np.zeros(len(keys), np.float32)
    neighborhoods = tree.query_ball_point(keys, r=radius)
    for i, idx in enumerate(neighborhoods):
        if len(idx) < 8:
            continue
        nb = pc[idx]
        nb = nb - nb.mean(0)
        cov = nb.T @ nb / len(nb)
        ev = np.linalg.eigvalsh(cov)  # ascending
        s = ev.sum()
        if s > 0:
            out[i] = ev[0] / s
    return out


def gf_et_batches(
    cache: RotatedFeatureCache,
    scenes: list[ThreeDMatchDataset],
    batch_size: int,
    rng: np.random.Generator,
    pair_dist: float = 0.02,
    pca_thre: float | None = 0.03,
    pca_radius: float = 0.3,
):
    """Infinite iterator of GF/ET training batches
    {feats0, feats1 (B,G,32), true_idx (B,), delta_r (B,4)}.

    ``pca_thre`` (reference default 0.03) drops near-planar keypoints
    before pairing (GF_ET.py PCA_keys_sample:34-67); None disables.
    """
    group = get_group(cache.cfg.group_size)
    rots = group.rotations

    # per-cloud keypoint admissibility under the PCA-planarity filter
    kp_ok: dict[str, np.ndarray] = {}

    def ok_mask(ds, pc_id):
        key = f"{ds.name}/{pc_id}"
        if key not in kp_ok:
            if pca_thre is None:
                kp_ok[key] = np.ones(len(ds.get_kps(pc_id)), bool)
            else:
                pcas = pca_planarity(
                    ds.get_pc(pc_id).astype(np.float32),
                    ds.get_kps(pc_id).astype(np.float32), pca_radius,
                )
                kp_ok[key] = pcas > pca_thre
        return kp_ok[key]

    # precompute gt keypoint pairs per scene pair (filtered keypoints only)
    pair_bank = []
    for ds in scenes:
        for (id0, id1) in ds.pair_ids:
            T = ds.get_transform(id0, id1)
            k0 = ds.get_kps(id0)
            k1 = ds.get_kps(id1)
            ok0 = ok_mask(ds, id0)
            ok1 = ok_mask(ds, id1)
            k1t = k1 @ T[:3, :3].T + T[:3, 3]
            d = np.sqrt(((k0[:, None] - k1t[None]) ** 2).sum(-1))
            i0 = d.argmin(1)
            keep = (d.min(1) < pair_dist) & ok0 & ok1[i0]
            pairs = np.stack([np.arange(len(k0)), i0], -1)[keep]
            if len(pairs) >= 10:
                pair_bank.append((ds, id0, id1, pairs))
    if not pair_bank:
        raise RuntimeError("no scene pair has >= 10 gt keypoint pairs")

    while True:
        ds, id0, id1, pairs = pair_bank[rng.integers(len(pair_bank))]
        gtR = ds.get_transform(id0, id1)[:3, :3]
        Rs0, F0 = cache.get(ds, id0, rng)
        Rs1, F1 = cache.get(ds, id1, rng)
        sel = pairs[rng.integers(len(pairs), size=batch_size)]
        ri = rng.integers(cache.rnum, size=batch_size)
        rj = rng.integers(cache.rnum, size=batch_size)
        feats0 = F0[ri, sel[:, 0]]  # (B, G, 32)
        feats1 = F1[rj, sel[:, 1]]
        R = np.einsum("bij,jk,blk->bil", Rs1[rj], gtR.T, Rs0[ri])  # Rj gtR^T Ri^T
        tr = np.einsum("gij,bij->bg", rots, R)
        true_idx = tr.argmax(-1)
        delta = np.einsum("bij,bkj->bik", R, rots[true_idx])
        delta_r = np.stack([_np_quat_from_matrix(m) for m in delta])
        yield {
            "feats0": jnp.asarray(feats0),
            "feats1": jnp.asarray(feats1),
            "true_idx": jnp.asarray(true_idx),
            "delta_r": jnp.asarray(delta_r.astype(np.float32)),
        }


def _pairmatch(keys0, keys1, R, t, thre):
    """gt mutual-NN pairing (RM.py pairmatch:131-152), with translation."""
    k0t = keys0 @ R.T + t
    d = np.sqrt(((k0t[:, None] - keys1[None]) ** 2).sum(-1))
    a01 = d.argmin(1)
    a10 = d.argmin(0)
    ii = np.arange(len(keys0))
    mutual = a10[a01] == ii
    ok = mutual & (d[ii, a01] < thre)
    pairs = np.stack([ii[ok], a01[ok]], -1)
    m0 = -np.ones(len(keys0), np.int64)
    m0[ii[ok]] = a01[ok]
    unpair0 = m0 == -1
    m1_matched = np.zeros(len(keys1), bool)
    m1_matched[a01[ok]] = True
    return pairs, unpair0, ~m1_matched, m0


def rm_batches(
    gf_feats: dict,
    scenes: list[ThreeDMatchDataset],
    rng: np.random.Generator,
    min_ps: int = 256,
    max_ps: int = 1538,
    pps_thre: float = 0.2,
    capacity: int | None = None,
    group_size: int = 60,
    max_pairs: int = 1024,
):
    """Infinite iterator of RM batches. ``gf_feats[(scene, pc_id)]`` holds the
    descriptor eqv features (K, G, 32) of each cloud's keypoints (the
    YOHO_Output_Group_feature equivalent).

    Side convention: source=cloud1(before rot), like training in the
    reference where feats0 in the batch is the 'before' side; we emit keys
    already in the matcher's expected order (feats0 = source side).
    """
    group = get_group(group_size)
    cap = capacity or max_ps
    pair_list = [(ds, p) for ds in scenes for p in ds.pair_ids]

    def pad_to(x, n, fill=0.0):
        pad = n - x.shape[0]
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)], 0
        )

    while True:
        ds, (id0, id1) = pair_list[rng.integers(len(pair_list))]
        T = ds.get_transform(id0, id1)
        # R from keys0 to keys1 frame: keys1 = R keys0 + t with
        # pts0 = gtR pts1 + gt_t  =>  R = gtR^T, t = -gtR^T gt_t
        Rg = T[:3, :3].T
        tg = -T[:3, :3].T @ T[:3, 3]
        k0 = ds.get_kps(id0)
        k1 = ds.get_kps(id1)
        f0 = gf_feats[(ds.name, id0)]
        f1 = gf_feats[(ds.name, id1)]
        n0 = int(rng.integers(min_ps, min(max_ps, len(k0)) + 1))
        n1 = int(rng.integers(min_ps, min(max_ps, len(k1)) + 1))
        s0 = rng.permutation(len(k0))[:n0]
        s1 = rng.permutation(len(k1))[:n1]
        keys0, feats0 = k0[s0], f0[s0]
        keys1, feats1 = k1[s1], f1[s1]
        pairs, unpair0, unpair1, m0 = _pairmatch(keys0, keys1, Rg, tg, pps_thre)
        # group-rotation augmentation on side 1: rotate keys, permute features
        aid = int(rng.integers(group_size))
        keys1 = keys1 @ group.rotations[aid].T
        feats1 = feats1[:, group.cayley[aid], :]
        # random translations
        keys0 = keys0 + (rng.random((1, 3)) - 0.5)
        keys1 = keys1 + (rng.random((1, 3)) - 0.5)
        npairs = min(len(pairs), max_pairs)
        if npairs == 0:
            continue
        yield {
            # matcher source side = keys0/feats0 of this construction
            "feats0": jnp.asarray(pad_to(feats0.astype(np.float32), cap))[None],
            "feats1": jnp.asarray(pad_to(feats1.astype(np.float32), cap))[None],
            "keys0": jnp.asarray(pad_to(keys0.astype(np.float32), cap))[None],
            "keys1": jnp.asarray(pad_to(keys1.astype(np.float32), cap))[None],
            "mask0": jnp.asarray(np.arange(cap) < n0)[None],
            "mask1": jnp.asarray(np.arange(cap) < n1)[None],
            "pairs": jnp.asarray(pad_to(pairs[:npairs].astype(np.int32), max_pairs))[None],
            "pair_mask": jnp.asarray(np.arange(max_pairs) < npairs)[None],
            "unpair0": jnp.asarray(pad_to(unpair0, cap, False))[None],
            "unpair1": jnp.asarray(pad_to(unpair1, cap, False))[None],
            "matches0": jnp.asarray(pad_to(m0, cap, -1))[None],
        }


def rd_batches(
    match_bank: list[dict],
    batch_size: int,
    rng: np.random.Generator,
):
    """Infinite iterator of RD batches from a bank of self-run pipeline
    results: each entry {feats0, feats1 (M, G, 32) descriptor features of
    matched pairs, T_pre (M, 4, 4) predicted per-match transforms,
    T_gt (4, 4)}. Labels per dataops/dataloader.py:112-123."""
    banks = []
    for entry in match_bank:
        gt_q = _np_quat_from_matrix(entry["T_gt"][:3, :3])
        qs = np.stack(
            [_np_quat_from_matrix(t[:3, :3]) for t in entry["T_pre"]]
        )
        # sign-align each quaternion with gt before distancing
        sgn = np.where((qs * gt_q).sum(-1, keepdims=True) < 0, -1.0, 1.0)
        rdiff = np.sqrt(((qs * sgn - gt_q) ** 2).sum(-1))
        tdiff = ((entry["T_pre"][:, :3, 3] - entry["T_gt"][:3, 3]) ** 2).sum(-1)
        labels = rdiff + tdiff / 3.0
        banks.append((entry["feats0"], entry["feats1"], labels))

    while True:
        f0, f1, labels = banks[rng.integers(len(banks))]
        sel = rng.integers(len(labels), size=batch_size)
        yield {
            "feats0": jnp.asarray(f0[sel].astype(np.float32)),
            "feats1": jnp.asarray(f1[sel].astype(np.float32)),
            "rdiffs": jnp.asarray(labels[sel].astype(np.float32)),
        }
