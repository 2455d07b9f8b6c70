"""Pose-graph synchronization: recovers cycle-consistent transforms from
noisy pairwise estimates and overrules outlier edges (the scene-level
refinement the reference lacks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roreg_tpu.core.so3 import relative_angle_deg
from roreg_tpu.data.synthetic import _random_rotation
from roreg_tpu.eval.posegraph import refined_pairwise, sync_scene, synchronize


def _make_graph(rng, n=8, noise_deg=0.0, t_noise=0.0):
    """Absolute poses P_i (x_world = P_i x_i); T_ij = P_i^{-1} P_j."""
    Ps = []
    for _ in range(n):
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = _random_rotation(rng).astype(np.float32)
        P[:3, 3] = rng.normal(size=3).astype(np.float32)
        Ps.append(P)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    Ts = []
    for i, j in pairs:
        T = np.linalg.inv(Ps[i]) @ Ps[j]
        if noise_deg:
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            a = np.deg2rad(noise_deg) * rng.normal()
            K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]])
            Rn = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * K @ K
            T[:3, :3] = Rn @ T[:3, :3]
        if t_noise:
            T[:3, 3] += rng.normal(size=3) * t_noise
        Ts.append(T.astype(np.float32))
    return Ps, pairs, Ts


def _pair_errors(pairs, Ts_est, Ps):
    errs_r, errs_t = [], []
    for (i, j), T in zip(pairs, Ts_est):
        T_gt = np.linalg.inv(Ps[i]) @ Ps[j]
        errs_r.append(float(relative_angle_deg(
            jnp.asarray(T[:3, :3]), jnp.asarray(T_gt[:3, :3].astype(np.float32))
        )))
        errs_t.append(float(np.linalg.norm(T[:3, 3] - T_gt[:3, 3])))
    return np.asarray(errs_r), np.asarray(errs_t)


def test_exact_recovery():
    rng = np.random.default_rng(0)
    Ps, pairs, Ts = _make_graph(rng, n=6)
    out = sync_scene(pairs, Ts, np.ones(len(pairs)))
    er, et = _pair_errors(pairs, out, Ps)
    assert er.max() < 0.1, er.max()
    assert et.max() < 1e-3, et.max()


def test_noise_averaging_improves():
    rng = np.random.default_rng(1)
    Ps, pairs, Ts = _make_graph(rng, n=8, noise_deg=3.0, t_noise=0.05)
    er_raw, et_raw = _pair_errors(pairs, Ts, Ps)
    out = sync_scene(pairs, Ts, np.ones(len(pairs)))
    er, et = _pair_errors(pairs, out, Ps)
    assert er.mean() < 0.7 * er_raw.mean(), (er.mean(), er_raw.mean())
    assert et.mean() < 0.7 * et_raw.mean(), (et.mean(), et_raw.mean())


def test_outlier_edge_overruled():
    """One grossly wrong pairwise transform gets fixed by the consistent
    rest of the graph (low weight on the outlier)."""
    rng = np.random.default_rng(2)
    Ps, pairs, Ts = _make_graph(rng, n=7, noise_deg=1.0, t_noise=0.01)
    bad = 3
    Ts[bad] = np.eye(4, dtype=np.float32)  # nonsense estimate
    w = np.ones(len(pairs), np.float32)
    w[bad] = 0.05  # RANSAC overlap would be low for a wrong transform
    out = sync_scene(pairs, Ts, w)
    er, _ = _pair_errors(pairs, out, Ps)
    er_raw, _ = _pair_errors(pairs, Ts, Ps)
    assert er_raw[bad] > 30  # it was indeed broken
    assert er[bad] < 5.0, er[bad]


def test_full_weight_outlier_voted_down_by_irls():
    """The probe case that broke the single L2 pass: ONE corrupted edge
    carrying FULL confidence weight on a small (4-node) graph. The IRLS
    reweighting (synchronize_robust, now the sync_scene default) must
    vote it down from the cycle residuals alone; a plain chordal pass
    spreads the 90-degree error over every edge."""
    rng = np.random.default_rng(5)
    Ps, pairs, Ts = _make_graph(rng, n=4, noise_deg=1.0, t_noise=0.01)
    bad = 0
    corrupt = np.eye(4, dtype=np.float32)
    corrupt[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    corrupt[:3, 3] = [1.0, 0, 0]
    Ts[bad] = (corrupt @ Ts[bad]).astype(np.float32)
    w = np.ones(len(pairs), np.float32)  # full weight: detector fooled

    out = sync_scene(pairs, Ts, w)
    er, et = _pair_errors(pairs, out, Ps)
    er_raw, _ = _pair_errors(pairs, Ts, Ps)
    assert er_raw[bad] > 60  # it was indeed broken
    assert er.max() < 5.0, er
    assert et.max() < 0.1, et
