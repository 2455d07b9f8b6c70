"""Data layer (PLY, 3DMatch directory format, synthetic scenes) and the
RR benchmark protocol."""

import os

import numpy as np
import pytest

from roreg_tpu.data.dataset import ThreeDMatchDataset, get_dataset_group
from roreg_tpu.data.ply import read_ply, write_ply
from roreg_tpu.data.synthetic import make_synthetic_scene
from roreg_tpu.eval.benchmark import (
    benchmark_scenes,
    compute_transformation_error,
    evaluate_registration,
    read_trajectory,
    read_trajectory_info,
    write_trajectory,
)
from roreg_tpu.eval.metrics import fmr_ir, registration_errors


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts)
    back = read_ply(p)
    assert np.allclose(back, pts, atol=1e-6)


def test_ply_ascii(tmp_path):
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1 2 3\n4 5 6\n"
        )
    pts = read_ply(p)
    assert np.allclose(pts, [[1, 2, 3], [4, 5, 6]])


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    rng = np.random.default_rng(42)
    root = str(tmp_path_factory.mktemp("scene") / "kitchen")
    return make_synthetic_scene(root, rng, num_clouds=3, points_per_cloud=4000,
                                num_keypoints=256)


def test_synthetic_scene_layout(scene):
    assert len(scene.pair_ids) == 3  # (0,1) (0,2) (1,2)
    assert scene.pc_ids == ["0", "1", "2"]
    pc = scene.get_pc(0)
    assert pc.shape == (4000, 3)
    kps = scene.get_kps(0)
    assert kps.shape == (256, 3)


def test_synthetic_gt_consistency(scene):
    """gt satisfies pts0 ~ T @ pts1 on the overlap region."""
    T = scene.get_transform("0", "1")
    pc0 = scene.get_pc(0)
    pc1 = scene.get_pc(1)
    moved = pc1 @ T[:3, :3].T + T[:3, 3]
    # nearest-neighbor distance from moved pc1 to pc0, for a sample
    sample = moved[::40]
    d = np.sqrt(((sample[:, None] - pc0[None, :]) ** 2).sum(-1)).min(1)
    # at least half the sampled points should be on the shared surface
    assert np.median(d) < 0.05


def test_gt_log_reread(scene):
    pairs, traj = read_trajectory(scene.gt_log)
    assert pairs.shape == (3, 3)
    assert traj.shape == (3, 4, 4)
    T = scene.get_transform("0", "1")
    assert np.allclose(traj[0], T, atol=1e-6)


def test_trajectory_info(scene):
    n_frag, cov = read_trajectory_info(scene.gt_info)
    assert n_frag == 3
    assert cov.shape == (3, 6, 6)


def test_transformation_error_zero_for_exact():
    info = np.eye(6) * 5000
    assert compute_transformation_error(np.eye(4), info) < 1e-12


def test_evaluate_registration_synthetic(scene, tmp_path):
    pairs, gt_traj = read_trajectory(scene.gt_log)
    n_frag, cov = read_trajectory_info(scene.gt_info)
    # perfect estimates -> all pairs with |i-j|>1 succeed
    est_pairs = np.asarray([[int(p[0]), int(p[1])] for p in pairs])
    prec, rec, flags, errors = evaluate_registration(
        n_frag, gt_traj.copy(), est_pairs, pairs, gt_traj, cov, err2=0.2
    )
    assert rec == 1.0 and prec == 1.0
    # corrupt the only non-consecutive pair (0,2)
    bad = gt_traj.copy()
    bad[1, :3, 3] += 1.0
    prec, rec, flags, errors = evaluate_registration(
        n_frag, bad, est_pairs, pairs, gt_traj, cov, err2=0.2
    )
    assert rec == 0.0


def test_benchmark_scenes_and_write(scene, tmp_path):
    pairs, gt_traj = read_trajectory(scene.gt_log)
    est_pairs = np.asarray([[int(p[0]), int(p[1])] for p in pairs])
    pre_log = str(tmp_path / "pre.log")
    write_trajectory(est_pairs, gt_traj, pre_log, 3)
    est_pairs2, est_traj2 = read_trajectory(pre_log)
    assert np.allclose(est_traj2, gt_traj, atol=1e-9)
    rr, per_scene = benchmark_scenes(
        {
            "kitchen": dict(
                gt_log=scene.gt_log, gt_info=scene.gt_info,
                est_pairs=est_pairs, est_traj=gt_traj,
            )
        }
    )
    assert rr == 1.0


def test_fmr_ir_and_reg_errors(scene):
    T = scene.get_transform("0", "1")
    k0 = scene.get_kps(0)[:100]
    k1 = (k0 - T[:3, 3]) @ T[:3, :3]  # exact correspondences inverted
    fmr, ir = fmr_ir(k0, k1, np.ones(100, bool), T)
    assert fmr == 1.0 and ir == 1.0
    rre, rte = registration_errors(T, T)
    assert rre < 0.01 and rte < 1e-9  # arccos-near-1 noise floor
    # junk matches
    fmr, ir = fmr_ir(k0, k1 + 5.0, np.ones(100, bool), T)
    assert fmr == 0.0 and ir == 0.0


def test_get_dataset_group_structure(tmp_path):
    # build a fake 'demo' tree via synthetic scene
    rng = np.random.default_rng(0)
    root = str(tmp_path / "demo" / "kitchen")
    make_synthetic_scene(root, rng, num_clouds=2, points_per_cloud=1000,
                         num_keypoints=64)
    group = get_dataset_group("demo", str(tmp_path))
    assert group["wholesetname"] == "demo"
    assert group["kitchen"].pair_ids == [("0", "1")]


def test_train_scene_groups():
    """Training dataset groups match the reference's layout
    (dataops/dataset.py:160-225): 54 scenes, station counts, valscenes."""
    from roreg_tpu.data.dataset import SCENE_LISTS, TRAIN_VAL_SCENES

    for name in ("3dm_train_rot", "3dmatch_train"):
        scenes, nums = SCENE_LISTS[name]
        assert len(scenes) == 54 and len(nums) == 54
        assert "bundlefusion-apt0" in scenes and nums[scenes.index(
            "bundlefusion-apt0")] == 85
        assert "rgbd-scenes-v2-scene_13" in scenes
    assert len(TRAIN_VAL_SCENES) == 6
    assert set(TRAIN_VAL_SCENES) <= set(SCENE_LISTS["3dmatch_train"][0])


def test_pca_planarity_filter(rng):
    """Surface-variation scores: flat plane ~0, sphere patch high, and
    the pairing respects the filter (train/trainset/GF_ET.py:34-67)."""
    from roreg_tpu.train.data import pca_planarity

    # flat plane -> sigma ~ 0
    plane = np.column_stack([
        rng.uniform(0, 2, size=(2000, 2)),
        np.zeros(2000),
    ]).astype(np.float32)
    s_plane = pca_planarity(plane, plane[:50], radius=0.3)
    assert (s_plane < 1e-4).all()

    # sphere surface (radius 0.3) -> strongly non-planar neighborhoods
    v = rng.normal(size=(4000, 3))
    sphere = (0.3 * v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
        np.float32
    )
    s_sphere = pca_planarity(sphere, sphere[:50], radius=0.3)
    assert (s_sphere > 0.03).mean() > 0.9

    # isolated points (< 8 neighbors) score 0
    lonely = np.eye(3, dtype=np.float32) * 100
    s_lone = pca_planarity(lonely, lonely, radius=0.3)
    assert (s_lone == 0).all()


def test_draw_registration(tmp_path, rng):
    from roreg_tpu.data.visualize import draw_registration_with_keys

    src = rng.normal(size=(500, 3)).astype(np.float32)
    T = np.eye(4)
    T[:3, 3] = [0.1, 0, 0]
    tgt = src @ T[:3, :3].T + T[:3, 3]
    out = str(tmp_path / "reg.png")
    draw_registration_with_keys(src, tgt, src[:20], T, out)
    import os

    assert os.path.getsize(out) > 10000


# --------------------------------------------------------------------------
# parity on REFERENCE-AUTHORED files: the reference bundles a real kitchen
# scene's gt.log + Keypoints txt (data/origin_data/demo/kitchen); parsing
# them through ThreeDMatchDataset pins the format conventions (tab/space
# separators, transform direction, 0-based keypoint indices —
# dataops/dataset.py:60-130) against files this repo did NOT write.
# The plys are stripped from the reference checkout, so deterministic
# stand-in clouds are synthesized for them.
# --------------------------------------------------------------------------

_REF_DEMO = "/root/reference/data/origin_data/demo/kitchen"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(_REF_DEMO, "PointCloud", "gt.log")),
    reason="reference demo files not present",
)
def test_reference_demo_files_parse(tmp_path):
    import shutil

    from roreg_tpu.data.ply import write_ply

    root = str(tmp_path / "kitchen")
    os.makedirs(os.path.join(root, "PointCloud"))
    shutil.copy(
        os.path.join(_REF_DEMO, "PointCloud", "gt.log"),
        os.path.join(root, "PointCloud", "gt.log"),
    )
    shutil.copytree(
        os.path.join(_REF_DEMO, "Keypoints"), os.path.join(root, "Keypoints")
    )
    # stand-in clouds: point i = (i, 2i, 3i) * 1e-5 so pc[idx] is checkable
    idxs = {}
    for k in range(2):
        idx = np.loadtxt(
            os.path.join(root, "Keypoints", f"cloud_bin_{k}Keypoints.txt")
        ).astype(np.int64)
        idxs[k] = idx
        n = int(idx.max()) + 1
        pts = (np.arange(n, dtype=np.float64)[:, None]
               * np.array([1.0, 2.0, 3.0]) * 1e-5).astype(np.float32)
        write_ply(os.path.join(root, "PointCloud", f"cloud_bin_{k}.ply"), pts)

    ds = ThreeDMatchDataset(root, 2)

    # pair ids + transform: hand-checked against the raw gt.log text
    # ("0\t 1\t 60" header, then 4 tab-separated rows)
    assert ds.pair_ids == [("0", "1")]
    T = ds.get_transform("0", "1")
    expected = np.array([
        [0.141, 0.989, 0.034, -2.247],
        [-0.903, 0.114, 0.414, -1.131],
        [0.405, -0.089, 0.910, 0.673],
        [0.000, 0.000, 0.000, 1.000],
    ])
    np.testing.assert_allclose(T, expected, atol=1e-12)

    # keypoint indices: first five of cloud 0 hand-checked from the txt
    np.testing.assert_array_equal(
        idxs[0][:5], [55310, 223930, 94754, 240603, 32459]
    )
    for k in range(2):
        kps = ds.get_kps(k)
        assert kps.shape == (5000, 3)
        # keys must be pc[idx] in file order (dataset.get_kps:109-117)
        np.testing.assert_allclose(
            kps[:, 0], idxs[k].astype(np.float32) * 1e-5, atol=1e-6
        )
