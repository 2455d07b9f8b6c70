"""Synthetic 3DMatch-format scene generation.

The reference's only fixtures are a bundled demo scene whose .ply blobs are
stripped (``.MISSING_LARGE_BLOBS``) and real 3DMatch downloads; for hermetic
tests and benchmarks we synthesize scenes in the exact directory layout:
structured surfaces (so sparse convs see realistic occupancy), overlapping
fragments with known rigid transforms, gt.log / gt.info, keypoint files.
"""

from __future__ import annotations

import os

import numpy as np

from roreg_tpu.data.dataset import ThreeDMatchDataset
from roreg_tpu.data.ply import write_ply

__all__ = ["synthetic_surface", "make_synthetic_scene"]


def _bumpy(rng: np.random.Generator, uv: np.ndarray, extent: float,
           n_bumps: int = 24, amp: float = 0.12) -> np.ndarray:
    """Random Gaussian-bump height field — gives every local patch distinct
    curvature (flat planes are degenerate for descriptor learning: all
    patches look identical, so contrastive hardest-negatives sit at zero)."""
    centers = rng.uniform(0, extent, size=(n_bumps, 2))
    amps = rng.normal(size=n_bumps) * amp
    sigmas = rng.uniform(0.1, 0.4, size=n_bumps)
    d2 = ((uv[:, None, :] - centers[None]) ** 2).sum(-1)
    return (amps[None] * np.exp(-d2 / (2 * sigmas[None] ** 2))).sum(-1)


def synthetic_surface(rng: np.random.Generator, n: int = 20000,
                      extent: float = 3.0) -> np.ndarray:
    """A room-like surface cloud: bumpy floor + bumpy walls + random
    ellipsoids/boxes — geometry with enough local distinctiveness for
    metric learning."""
    pts = []
    n_each = n // 6
    # floor with height bumps
    f = rng.uniform(0, extent, size=(n_each, 2))
    pts.append(np.stack([f[:, 0], f[:, 1], _bumpy(rng, f, extent)], -1))
    # two walls with depth bumps
    w = rng.uniform(0, extent, size=(n_each, 2))
    pts.append(np.stack([w[:, 0], _bumpy(rng, w, extent), w[:, 1] * 0.8], -1))
    w2 = rng.uniform(0, extent, size=(n_each, 2))
    pts.append(np.stack([_bumpy(rng, w2, extent), w2[:, 0], w2[:, 1] * 0.8], -1))
    # boxes
    for _ in range(2):
        c = rng.uniform(0.5, extent - 0.5, size=(3,))
        c[2] = 0.3
        s = rng.uniform(0.2, 0.6, size=(3,))
        face = rng.integers(0, 3, size=n_each)
        u = rng.uniform(-0.5, 0.5, size=(n_each, 3))
        u[np.arange(n_each), face] = np.sign(u[np.arange(n_each), face]) * 0.5
        pts.append(c + u * s)
    # ellipsoid blobs
    c = rng.uniform(0.5, extent - 0.5, size=(3,))
    c[2] = 0.4
    radii = rng.uniform(0.15, 0.45, size=3)
    dirs = rng.normal(size=(n_each, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts.append(c + dirs * radii)
    pts = np.concatenate(pts, 0)
    pts += rng.normal(size=pts.shape) * 0.003  # sensor noise
    return pts[rng.permutation(len(pts))[:n]]


def _random_rotation(rng: np.random.Generator, max_angle_deg: float = 180.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.radians(rng.uniform(0, max_angle_deg))
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def make_synthetic_scene(
    root: str,
    rng: np.random.Generator,
    num_clouds: int = 3,
    points_per_cloud: int = 20000,
    num_keypoints: int = 512,
    overlap: float = 0.7,
    max_angle_deg: float = 50.0,
    surface_extent: float = 3.0,
) -> ThreeDMatchDataset:
    """Build a scene: one base surface, fragments = overlapping crops moved
    into their own frames by random rigid transforms. gt convention matches
    the reference: pts0 = R @ pts1 + t for pair (i, j), i < j.

    ``surface_extent`` controls point density relative to the voxel size:
    real 3DMatch fragments carry several points per 2.5 cm voxel; a
    synthetic cloud must match that ratio (points_per_cloud over the
    surface area implied by the extent) or conv features see mostly
    sampling holes and metric learning plateaus.
    """
    os.makedirs(f"{root}/PointCloud", exist_ok=True)
    os.makedirs(f"{root}/Keypoints", exist_ok=True)
    base = synthetic_surface(
        rng, int(points_per_cloud / overlap * 1.5), extent=surface_extent
    )
    extent = base[:, 0].max() - base[:, 0].min()

    frames = []  # T_k: base -> cloud_k frame  (cloud_k = T_k(base crop))
    clouds = []
    for k in range(num_clouds):
        lo = k * (1 - overlap) * extent / max(num_clouds - 1, 1) * 0.5
        sel = base[(base[:, 0] >= lo) & (base[:, 0] <= lo + extent * overlap)]
        sel = sel[rng.permutation(len(sel))[:points_per_cloud]]
        R = _random_rotation(rng, max_angle_deg)
        t = rng.uniform(-1, 1, size=3)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        cloud = sel @ R.T + t
        frames.append(T)
        clouds.append(cloud)
        write_ply(f"{root}/PointCloud/cloud_bin_{k}.ply", cloud)
        kp = rng.permutation(len(cloud))[:num_keypoints]
        np.savetxt(f"{root}/Keypoints/cloud_bin_{k}Keypoints.txt", kp)

    # gt.log / gt.info for all pairs (i, j), i < j: pts_i = T_ij pts_j
    with open(f"{root}/PointCloud/gt.log", "w") as flog, open(
        f"{root}/PointCloud/gt.info", "w"
    ) as finfo:
        for i in range(num_clouds):
            for j in range(i + 1, num_clouds):
                T_ij = frames[i] @ np.linalg.inv(frames[j])
                flog.write(f"{i}\t{j}\t{num_clouds}\n")
                for r in range(4):
                    flog.write(
                        "\t".join(f"{T_ij[r, c]:.9f}" for c in range(4)) + "\n"
                    )
                finfo.write(f"{i}\t{j}\t{num_clouds}\n")
                info = np.eye(6) * points_per_cloud
                for r in range(6):
                    finfo.write(
                        "\t".join(f"{info[r, c]:.6f}" for c in range(6)) + "\n"
                    )

    ds = ThreeDMatchDataset(root, num_clouds, num_keypoints=num_keypoints)
    ds.name = f"synthetic/{os.path.basename(root)}"
    return ds
