"""Registration quality metrics: FMR / IR and PointDSC-style RR / RRE / RTE.

Equivalents of ``yoho_evaluator.fmr_ir_scene`` (test/evaluator.py:50-81) and
``rr_scene`` (:83-101). Host-side numpy (these run per scan pair on tiny
arrays after the device pipeline).
"""

from __future__ import annotations

import numpy as np

__all__ = ["fmr_ir", "registration_errors", "rotation_error_deg"]


def rotation_error_deg(R0: np.ndarray, R1: np.ndarray) -> float:
    tr = float(np.einsum("ij,ij->", R0, R1))
    return float(np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))))


def fmr_ir(
    keys0_m: np.ndarray,
    keys1_m: np.ndarray,
    valid: np.ndarray,
    T_gt: np.ndarray,
    tau_1: float = 0.05,
    tau_2: float = 0.1,
) -> tuple[float, float]:
    """Inlier ratio of the matches under gt, and the FMR indicator.

    Matches the reference exactly: IR = mean(dist < tau_2) over kept matches,
    FMR contribution = 1 if IR > tau_1 (evaluator.py:60-80).
    """
    valid = valid.astype(bool)
    if valid.sum() == 0:
        return 0.0, 0.0
    k0 = keys0_m[valid]
    k1 = keys1_m[valid]
    k1t = k1 @ T_gt[:3, :3].T + T_gt[:3, 3]
    dist = np.sqrt(np.sum((k0 - k1t) ** 2, axis=-1))
    ir = float(np.mean(dist < tau_2))
    return (1.0 if ir > tau_1 else 0.0), ir


def registration_errors(
    T_pre: np.ndarray, T_gt: np.ndarray
) -> tuple[float, float]:
    """(rotation error deg, translation error m) — evaluator.py:88-94."""
    rre = rotation_error_deg(T_pre[:3, :3], T_gt[:3, :3])
    rte = float(np.linalg.norm(T_pre[:3, 3] - T_gt[:3, 3]))
    return rre, rte
