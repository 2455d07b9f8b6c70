import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.core import se3, so3
from roreg_tpu.core.group import get_group


def test_quaternion_roundtrip():
    key = jax.random.PRNGKey(0)
    R = so3.random_rotation(key, (128,))
    q = so3.quaternion_from_matrix(R)
    R2 = so3.matrix_from_quaternion(q)
    assert jnp.abs(R - R2).max() < 1e-5
    assert (q[:, 0] >= 0).all()


def test_quaternion_special_cases():
    # 180-degree rotations hit the non-dominant-w branches
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)]:
        ax = np.array(axis) / np.linalg.norm(axis)
        c, s = -1.0, 0.0
        R = (
            c * np.eye(3)
            + (1 - c) * np.outer(ax, ax)
            + s * np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
        )
        q = so3.quaternion_from_matrix(jnp.asarray(R))
        R2 = so3.matrix_from_quaternion(q)
        assert jnp.abs(jnp.asarray(R) - R2).max() < 1e-5


def test_relative_angle():
    key = jax.random.PRNGKey(1)
    R = so3.random_rotation(key, (16,))
    # arccos near 1 has a ~sqrt(eps) noise floor in f32 (~0.04 deg)
    assert jnp.abs(so3.relative_angle_deg(R, R)).max() < 0.1
    q0 = so3.quaternion_from_matrix(R)
    ang = so3.quaternion_angle_deg(q0, q0)
    assert jnp.abs(ang).max() < 0.2  # eps-clamped near zero


def test_nearest_group_index_and_residual():
    G = get_group(60)
    rots = jnp.asarray(G.rotations, dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    # exact group rotations map to themselves
    idx = so3.nearest_group_index(rots, rots)
    assert jnp.array_equal(idx, jnp.arange(60))
    # group rotation + small perturbation still maps correctly,
    # and residual quaternion recovers the perturbation
    small_q = jnp.array([0.999, 0.02, -0.015, 0.01])
    dR = so3.matrix_from_quaternion(small_q)
    R = jnp.einsum("ij,gjk->gik", dR, rots)  # R = dR @ R_g
    idx = so3.nearest_group_index(R, rots)
    assert jnp.array_equal(idx, jnp.arange(60))
    q_res = so3.residual_quaternion(R, idx, rots)
    q_ref = so3.quaternion_from_matrix(dR)
    assert jnp.abs(q_res - q_ref[None]).max() < 1e-4


def test_transform_points_and_kabsch():
    key = jax.random.PRNGKey(3)
    pts = jax.random.normal(key, (100, 3))
    R = so3.random_rotation(jax.random.PRNGKey(4))
    t = jnp.array([0.3, -1.2, 2.0])
    T = se3.make_transform(R, t)
    moved = se3.transform_points(pts, T)
    w = jnp.ones(100)
    T_fit = se3.kabsch_weighted(pts, moved, w)
    assert jnp.abs(T_fit - T).max() < 1e-4
    # inverse
    back = se3.transform_points(moved, se3.invert(T))
    assert jnp.abs(back - pts).max() < 1e-4


def test_three_points_to_transform():
    R = so3.random_rotation(jax.random.PRNGKey(5))
    t = jnp.array([1.0, 2.0, 3.0])
    T = se3.make_transform(R, t)
    k1 = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    k0 = se3.transform_points(k1, T)
    T_fit = se3.three_points_to_transform(k0, k1)
    assert jnp.abs(T_fit - T).max() < 1e-4


def test_refine_transform_rejects_outliers():
    key = jax.random.PRNGKey(6)
    pts1 = jax.random.normal(key, (200, 3))
    R = so3.random_rotation(jax.random.PRNGKey(7))
    t = jnp.array([0.1, 0.2, -0.3])
    T_gt = se3.make_transform(R, t)
    pts0 = se3.transform_points(pts1, T_gt)
    # corrupt 30% with large noise
    noise = jax.random.normal(jax.random.PRNGKey(8), (200, 3)) * 5.0
    bad = jnp.arange(200) < 60
    pts0_noisy = jnp.where(bad[:, None], pts0 + noise, pts0)
    T0 = se3.kabsch_weighted(pts1, pts0_noisy, jnp.ones(200))  # biased fit
    # two-stage coarse->fine refine, as the estimator does (estimator.py:438)
    T_ref = se3.refine_transform(pts0_noisy, pts1, T0, jnp.ones(200), 0.6)
    T_ref = se3.refine_transform(pts0_noisy, pts1, T_ref, jnp.ones(200), 0.3)
    err_before = so3.relative_angle_deg(T0[:3, :3], T_gt[:3, :3])
    err_after = so3.relative_angle_deg(T_ref[:3, :3], T_gt[:3, :3])
    assert err_after < err_before
    assert err_after < 0.5


def test_kabsch_reflection_guard():
    # coplanar + mirrored points must still give det(R) = +1
    pts1 = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
    pts0 = pts1 * jnp.array([1.0, -1.0, 1.0])  # a reflection
    T = se3.kabsch_weighted(pts1, pts0, jnp.ones(4))
    assert jnp.linalg.det(T[:3, :3]) > 0.99
