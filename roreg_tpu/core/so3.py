"""SO(3) math: quaternions, geodesic metrics, nearest-group-element labels.

Functional JAX equivalents of the reference's ``utils/r_eval.py``
(``quaternion_from_matrix:5``, ``matrix_from_quaternion:90``,
``compute_R_diff:108``) and of the ``R2DR_id``/``DeltaR`` label helpers
duplicated across ``dataops/dataloader.py`` and ``train/trainset/GF_ET.py:145-160``.
Everything is vectorized/jit-safe (no data-dependent branching).

Quaternion convention: (w, x, y, z), w >= 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "matrix_from_quaternion",
    "quaternion_from_matrix",
    "rotation_angle_deg",
    "relative_angle_deg",
    "quaternion_angle_deg",
    "nearest_group_index",
    "residual_quaternion",
    "random_rotation",
]


def matrix_from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz -> (…, 3, 3). Normalizes the input quaternion."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def quaternion_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) -> (…, 4) wxyz with w >= 0.

    Branchless Shepperd's method: compute all four candidate columns, select
    the numerically stable one by the largest diagonal combination (jit-safe,
    unlike the reference's eigen-decomposition path).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22  # 4w^2
    tx = 1.0 + m00 - m11 - m22  # 4x^2
    ty = 1.0 - m00 + m11 - m22  # 4y^2
    tz = 1.0 - m00 - m11 + m22  # 4z^2

    # candidate quaternions (unnormalized), one per dominant component
    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1)

    t = jnp.stack([tw, tx, ty, tz], axis=-1)
    case = jnp.argmax(t, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cases, 4)
    q = jnp.take_along_axis(cands, case[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q * sign


def rotation_angle_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation angle of (…, 3, 3) in degrees."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def relative_angle_deg(R0: jnp.ndarray, R1: jnp.ndarray) -> jnp.ndarray:
    """Angle between two rotations == reference compute_R_diff (r_eval.py:108)."""
    tr = jnp.einsum("...ij,...ij->...", R0, R1)
    return jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def quaternion_angle_deg(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Angular error between quaternions, matching train/val.py:82-89 semantics."""
    q0 = q0 / jnp.clip(jnp.linalg.norm(q0, axis=-1, keepdims=True), 1e-4)
    q1 = q1 / jnp.clip(jnp.linalg.norm(q1, axis=-1, keepdims=True), 1e-4)
    loss_q = jnp.clip(1.0 - jnp.sum(q0 * q1, axis=-1) ** 2, 1e-7, None)
    return jnp.degrees(jnp.arccos(jnp.clip(1.0 - 2.0 * loss_q, -1.0, 1.0)))


def nearest_group_index(R: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """argmin_g angle(R, R_g) for (…, 3, 3) against (G, 3, 3).

    O(G) contraction instead of the reference's python loop (dataloader.py
    ``R2DR_id``): max trace(R_g^T R) == min geodesic angle.
    """
    tr = jnp.einsum("gij,...ij->...g", rotations.astype(R.dtype), R)
    return jnp.argmax(tr, axis=-1)


def residual_quaternion(R: jnp.ndarray, idx: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """deltaR = R @ R_anchor^T as a quaternion (trainset/GF_ET.py:156-160)."""
    anchor = rotations.astype(R.dtype)[idx]
    delta = jnp.einsum("...ij,...kj->...ik", R, anchor)  # R @ anchor^T
    return quaternion_from_matrix(delta)


def random_rotation(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform random rotations (…, 3, 3) via normalized quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return matrix_from_quaternion(q)
