import jax
import jax.numpy as jnp
import numpy as np

from roreg_tpu.core.knn import knn, mutual_nn, nn


def _brute(q, r, k):
    d = ((q[:, None] - r[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_matches_numpy(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    r = rng.normal(size=(500, 3)).astype(np.float32)
    d_ref, i_ref = _brute(q, r, 5)
    d, i = knn(jnp.asarray(q), jnp.asarray(r), 5, tile=128)
    assert np.allclose(np.asarray(d), d_ref, atol=1e-4)
    # indices can differ on exact ties; compare distances elementwise instead
    d_at = ((q[:, None] - r[np.asarray(i)]) ** 2).sum(-1)
    assert np.allclose(np.sort(d_at, 1), np.sort(d_ref, 1), atol=1e-4)


def test_knn_mask(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    r = rng.normal(size=(80, 3)).astype(np.float32)
    mask = np.zeros(80, dtype=bool)
    mask[:40] = True
    _, i = knn(jnp.asarray(q), jnp.asarray(r), 3, ref_mask=jnp.asarray(mask))
    assert (np.asarray(i) < 40).all()


def test_nn_identity(rng):
    r = rng.normal(size=(64, 3)).astype(np.float32)
    d, i = nn(jnp.asarray(r), jnp.asarray(r))
    assert np.array_equal(np.asarray(i), np.arange(64))
    assert np.asarray(d).max() < 1e-5


def test_mutual_nn(rng):
    f1 = rng.normal(size=(100, 32)).astype(np.float32)
    perm = rng.permutation(100)
    f0 = f1[perm] + rng.normal(size=(100, 32)).astype(np.float32) * 0.01
    nn01, mut = mutual_nn(jnp.asarray(f0), jnp.asarray(f1))
    assert np.asarray(mut).mean() > 0.95
    ok = np.asarray(mut)
    assert np.array_equal(np.asarray(nn01)[ok], perm[ok])


def test_mutual_nn_masked(rng):
    f0 = rng.normal(size=(60, 8)).astype(np.float32)
    f1 = f0 + 0.001
    m0 = np.arange(60) < 30
    nn01, mut = mutual_nn(
        jnp.asarray(f0), jnp.asarray(f1), mask0=jnp.asarray(m0), mask1=jnp.asarray(m0)
    )
    mut = np.asarray(mut)
    assert not mut[30:].any()
    assert mut[:30].mean() > 0.9
