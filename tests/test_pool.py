import jax.numpy as jnp
import numpy as np

from roreg_tpu.sparse.kernel_map import SparseLevel, build_pyramid
from roreg_tpu.sparse.pool import global_broadcast, global_pool, local_pool, prune


def test_local_pool_max_avg(rng):
    feats = rng.normal(size=(10, 4)).astype(np.float32)
    nbr = np.array([[0, 1, -1], [2, -1, -1], [-1, -1, -1]], np.int32)
    mask = np.array([True, True, True])
    mx = np.asarray(local_pool(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(mask), "max"))
    av = np.asarray(local_pool(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(mask), "avg"))
    assert np.allclose(mx[0], np.maximum(feats[0], feats[1]))
    assert np.allclose(av[0], (feats[0] + feats[1]) / 2)
    assert np.allclose(mx[1], feats[2])
    assert np.allclose(mx[2], 0.0)  # no neighbors


def test_global_pool_and_broadcast(rng):
    feats = rng.normal(size=(8, 3)).astype(np.float32)
    mask = np.array([True] * 5 + [False] * 3)
    g = np.asarray(global_pool(jnp.asarray(feats), jnp.asarray(mask), "avg"))
    assert np.allclose(g, feats[:5].mean(0), atol=1e-6)
    gm = np.asarray(global_pool(jnp.asarray(feats), jnp.asarray(mask), "max"))
    assert np.allclose(gm, feats[:5].max(0))
    out = np.asarray(
        global_broadcast(jnp.asarray(feats), jnp.asarray(g), jnp.asarray(mask))
    )
    assert np.allclose(out[:5], feats[:5] + g, atol=1e-6)
    assert np.allclose(out[5:], 0.0)


def test_prune(rng):
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    pyr = build_pyramid(
        jnp.asarray(pts), jnp.ones(500, bool), 0.1, (512, 256, 128, 64),
        conv1_kernel_size=3,
    )
    lvl = pyr.levels[0]
    keep = jnp.arange(512) % 2 == 0
    pruned = prune(lvl, keep)
    assert int(pruned.num) == int((np.asarray(lvl.mask) & np.asarray(keep)).sum())
    # keys untouched (still sorted)
    assert np.array_equal(np.asarray(pruned.keys), np.asarray(lvl.keys))
