"""Backbone model zoo: every registered variant builds and runs forward
(reference backbone/fcgf/{resunet,simpleunet}.py model registry), plus
trilinear interpolation oracle tests (ME interpolation parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roreg_tpu.native.pyramid import build_pyramid_host
from roreg_tpu.sparse.resunet import (
    RESUNET_VARIANTS,
    SIMPLENET_VARIANTS,
    ResUNet,
    SimpleNet,
)

CAPS = (512, 256, 128, 64)
VS = 0.08


@pytest.fixture(scope="module")
def pyr():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1.2, size=(500, 3)).astype(np.float32)
    return jax.tree_util.tree_map(
        jnp.asarray, build_pyramid_host(pts, VS, CAPS, conv1_kernel_size=3)
    )


@pytest.mark.parametrize("name", ["ResUNetIN2C", "ResUNetBN2B"])
def test_resunet_variants(pyr, name):
    net = ResUNet(variant=name, conv1_kernel_size=3)
    fin = jnp.ones((CAPS[0], 1))
    v = net.init(jax.random.PRNGKey(0), fin, pyr, False)
    out = net.apply(v, fin, pyr, False)
    out = np.asarray(out)
    mask = np.asarray(pyr.levels[0].mask)
    assert np.isfinite(out).all()
    # valid rows L2-normalized, pad rows zero
    norms = np.linalg.norm(out[mask], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert np.abs(out[~mask]).max() == 0.0


@pytest.mark.parametrize("name", sorted(SIMPLENET_VARIANTS))
def test_simplenet_variants(pyr, name):
    net = SimpleNet(variant=name, conv1_kernel_size=3)
    fin = jnp.ones((CAPS[0], 1))
    v = net.init(jax.random.PRNGKey(0), fin, pyr, False)
    out = np.asarray(net.apply(v, fin, pyr, False))
    mask = np.asarray(pyr.levels[0].mask)
    assert np.isfinite(out).all()
    norms = np.linalg.norm(out[mask], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_instance_norm_masked():
    from roreg_tpu.sparse.conv import MaskedInstanceNorm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32) * 3 + 1)
    mask = jnp.asarray(np.arange(64) < 40)
    m = MaskedInstanceNorm()
    v = m.init(jax.random.PRNGKey(0), x, mask)
    y = np.asarray(m.apply(v, x, mask))
    # stats over valid rows only: mean ~0, var ~1 there; pads zero
    assert abs(y[:40].mean()) < 1e-5
    assert abs(y[:40].var() - 1.0) < 1e-2
    assert np.abs(y[40:]).max() == 0.0


def test_interpolate_oracle():
    """Trilinear sampling vs a NumPy oracle on a known linear field."""
    from roreg_tpu.sparse.interpolate import interpolate
    from roreg_tpu.sparse.voxelize import SENTINEL, pack_keys

    # full dense 6x6x6 voxel cube so every corner exists
    g = np.stack(np.meshgrid(*([np.arange(6)] * 3), indexing="ij"), -1)
    coords = g.reshape(-1, 3).astype(np.int32)
    keys = np.asarray(pack_keys(jnp.asarray(coords)))
    order = np.argsort(keys)
    keys = keys[order]
    # feature = linear function of the voxel coordinate -> interpolation
    # of a linear field is exact
    feats = (coords[order] @ np.array([[1.0], [2.0], [3.0]])).astype(np.float32)
    vs = 0.1
    origin = jnp.zeros(3, jnp.int32)
    q = np.array([[0.25, 0.31, 0.47], [0.1, 0.1, 0.1], [0.49, 0.01, 0.33]],
                 np.float32)
    out = np.asarray(
        interpolate(jnp.asarray(keys), jnp.asarray(feats), origin,
                    jnp.asarray(q), vs)
    )
    expect = (q / vs) @ np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[:, 0], expect, rtol=1e-5)

    # queries whose corners are all absent -> zero
    far = np.asarray(
        interpolate(jnp.asarray(keys), jnp.asarray(feats), origin,
                    jnp.asarray(np.array([[5.0, 5.0, 5.0]], np.float32)), vs)
    )
    assert far[0, 0] == 0.0
