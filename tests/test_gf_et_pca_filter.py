"""GF/ET trainset keypoint filtering: batches must only draw from
keypoints that pass the PCA-planarity filter (GF_ET.py:34-67)."""

import numpy as np
import pytest

from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.train.data import gf_et_batches


class _StubCache:
    """RotatedFeatureCache stand-in: features encode the keypoint index."""

    def __init__(self, group_size=12, rnum=1):
        self.cfg = PipelineConfig(group_size=group_size)
        self.rnum = rnum

    def get(self, ds, pc_id, rng):
        kp = ds.get_kps(pc_id)
        Rs = np.eye(3, dtype=np.float32)[None]
        feats = np.broadcast_to(
            np.arange(len(kp), dtype=np.float32)[None, :, None, None],
            (1, len(kp), self.cfg.group_size, 32),
        ).copy()
        return Rs, feats


class _StubScene:
    """Half the keypoints sit on a flat plane (planarity ~0), half on a
    0.3-radius sphere (high surface variation). Identity pair gt."""

    name = "stub"
    pc_ids = (0, 1)
    pair_ids = ((0, 1),)

    def __init__(self):
        rng = np.random.default_rng(5)
        plane = np.column_stack([
            rng.uniform(0, 2, size=(3000, 2)), np.zeros(3000)
        ])
        v = rng.normal(size=(3000, 3))
        sphere = 0.3 * v / np.linalg.norm(v, axis=1, keepdims=True)
        sphere = sphere + np.array([5.0, 0, 0])  # disjoint region
        self._pc = np.concatenate([plane, sphere]).astype(np.float32)
        self._kp = np.concatenate(
            [plane[:32], sphere[:32]]
        ).astype(np.float32)

    def get_pc(self, pc_id):
        return self._pc

    def get_kps(self, pc_id):
        return self._kp

    def get_transform(self, id0, id1):
        return np.eye(4)


def test_planar_keypoints_excluded_from_batches():
    ds = _StubScene()
    cache = _StubCache()
    rng = np.random.default_rng(0)
    it = gf_et_batches(cache, [ds], batch_size=64, rng=rng,
                       pair_dist=0.01, pca_thre=0.03)
    for _ in range(3):
        b = next(it)
        ids = np.asarray(b["feats0"])[:, 0, 0]
        # planar keypoints are indices 0..31; all drawn ids must be >= 32
        assert (ids >= 32).all(), "planar keypoints leaked into a batch"

    # filter off: planar keypoints DO appear
    it2 = gf_et_batches(cache, [ds], batch_size=64, rng=rng,
                        pair_dist=0.01, pca_thre=None)
    seen = np.concatenate(
        [np.asarray(next(it2)["feats0"])[:, 0, 0] for _ in range(3)]
    )
    assert (seen < 32).any()
