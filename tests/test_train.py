"""Training system tests: losses, one-step optimization per component,
checkpoint save/restore roundtrip. Small group (12) for CPU speed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roreg_tpu.core.group import get_group
from roreg_tpu.train import losses as L
from roreg_tpu.train.trainer import TrainConfig, Trainer, make_train_step

GS = 12


@pytest.fixture(scope="module")
def G():
    return get_group(GS)


def _gf_batch(rng, b=8, g=GS):
    f0 = rng.normal(size=(b, g, 32)).astype(np.float32)
    group = get_group(g)
    idx = rng.integers(0, g, size=b)
    # feats1 = permuted feats0 + noise: learnable signal
    f1 = np.stack([f0[i][group.cayley[idx[i]]] for i in range(b)])
    f1 += rng.normal(size=f1.shape).astype(np.float32) * 0.1
    return {
        "feats0": jnp.asarray(f0),
        "feats1": jnp.asarray(f1),
        "true_idx": jnp.asarray(idx),
        "delta_r": jnp.asarray(
            np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, 1))
        ),
    }


def test_gf_loss_prefers_matching(G, rng):
    b, g = 6, GS
    idx = jnp.zeros((b,), jnp.int32)
    # perfectly matching pairs vs shuffled
    inv = jnp.asarray(rng.normal(size=(b, 32)).astype(np.float32))
    eqv = jnp.asarray(rng.normal(size=(b, g, 32)).astype(np.float32))
    loss_good, aux = L.gf_loss(inv, inv, eqv, eqv, idx, G.cayley)
    perm = jnp.asarray(np.roll(np.arange(b), 1))
    loss_bad, _ = L.gf_loss(inv, inv[perm], eqv, eqv[perm], idx, G.cayley)
    assert float(loss_good) < float(loss_bad)
    assert float(aux["dr_acc"]) == 1.0


def test_rd_loss_weighting():
    scores = jnp.asarray([10.0, 1.0, 10.0, 1.0])  # 2B with B=2
    rdiffs_good = jnp.asarray([0.0, 1.0])  # high score on low error
    rdiffs_bad = jnp.asarray([1.0, 0.0])
    assert float(L.rd_loss(scores, rdiffs_good)) < float(
        L.rd_loss(scores, rdiffs_bad)
    )


def test_et_loss():
    q = jnp.asarray([[1.0, 0, 0, 0]])
    assert float(L.et_loss(q, q)) == 0.0
    assert float(L.et_loss(q, q * 0)) == 1.0


def _one_step_decreases(component, batch_fn, steps=20, frozen=None):
    cfg = TrainConfig.defaults(component, group_size=GS, lr_init=1e-3)
    init_fn, step_fn, _ = make_train_step(cfg, frozen)
    rng = np.random.default_rng(0)
    batch = batch_fn(rng)
    state = init_fn(jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(steps):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one fixed batch must reduce the loss (allow BN churn early)
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    return losses


def test_gf_train_step():
    _one_step_decreases("gf", _gf_batch)


def test_rd_train_step():
    def batch_fn(rng, b=16):
        return {
            "feats0": jnp.asarray(rng.normal(size=(b, GS, 32)).astype(np.float32)),
            "feats1": jnp.asarray(rng.normal(size=(b, GS, 32)).astype(np.float32)),
            "rdiffs": jnp.asarray(rng.random(b).astype(np.float32)),
        }

    cfg = TrainConfig.defaults("rd", group_size=GS, lr_init=1e-3)
    init_fn, step_fn, _ = make_train_step(cfg)
    rng = np.random.default_rng(1)
    batch = batch_fn(rng)
    state = init_fn(jax.random.PRNGKey(0), batch)
    for _ in range(3):
        state, m = step_fn(state, batch)
        assert np.isfinite(float(m["loss"]))


def test_rm_train_step():
    def batch_fn(rng, m=24, n=20, p=8):
        pairs = np.stack([np.arange(p), np.arange(p)], -1)
        return {
            "feats0": jnp.asarray(rng.normal(size=(1, m, GS, 32)).astype(np.float32)),
            "feats1": jnp.asarray(rng.normal(size=(1, n, GS, 32)).astype(np.float32)),
            "keys0": jnp.asarray(rng.normal(size=(1, m, 3)).astype(np.float32)),
            "keys1": jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32)),
            "mask0": jnp.ones((1, m), bool),
            "mask1": jnp.ones((1, n), bool),
            "pairs": jnp.asarray(pairs[None].astype(np.int32)),
            "pair_mask": jnp.ones((1, p), bool),
            "unpair0": jnp.asarray((np.arange(m) >= p)[None]),
            "unpair1": jnp.asarray((np.arange(n) >= p)[None]),
        }

    _one_step_decreases("rm", batch_fn, steps=4)


def test_et_train_step():
    group = get_group(GS)
    from roreg_tpu.models.gf import GroupFeatNetwork

    gf_vars = GroupFeatNetwork(group).init(
        jax.random.PRNGKey(1), jnp.zeros((2, GS, 32)), False
    )
    _one_step_decreases("et", _gf_batch, steps=5, frozen={"gf": gf_vars})


def test_validation_gates_best_checkpoint(tmp_path):
    """make_val_fn + Trainer: validation runs at val_interval, the gate
    metric improves on a learnable fixed batch, and model_best is written
    (reference train/trainer.py:127-152 semantics)."""
    import os

    from roreg_tpu.train.validators import make_val_fn

    cfg = TrainConfig.defaults(
        "gf", group_size=GS, lr_init=1e-3,
        total_steps=8, val_interval=4, save_interval=100, log_interval=100,
        model_dir=str(tmp_path),
    )
    rng = np.random.default_rng(4)
    fixed = _gf_batch(rng, b=8)

    def it():
        while True:
            yield fixed

    val_fn = make_val_fn("gf", GS, [fixed])
    t = Trainer(cfg, it(), val_fn=val_fn)
    res = t.run()
    assert res["final_step"] == 8
    assert np.isfinite(t.best) and t.best >= 0.0
    assert os.path.exists(os.path.join(str(tmp_path), "GF", "model_best"))
    vals = [h for h in t.history if "val_whole_recall" in h]
    assert len(vals) == 2  # steps 4 and 8


def test_make_val_fn_all_components():
    """Each component's val_fn returns its gate metric on fresh states."""
    from roreg_tpu.train.validators import make_val_fn
    from roreg_tpu.train.trainer import name2metric

    rng = np.random.default_rng(5)
    group = get_group(GS)
    from roreg_tpu.models.gf import GroupFeatNetwork

    gf_vars = GroupFeatNetwork(group).init(
        jax.random.PRNGKey(1), jnp.zeros((2, GS, 32)), False
    )

    def rd_batch(rng, b=6):
        return {
            "feats0": jnp.asarray(rng.normal(size=(b, GS, 32)).astype(np.float32)),
            "feats1": jnp.asarray(rng.normal(size=(b, GS, 32)).astype(np.float32)),
            "rdiffs": jnp.asarray(rng.random(b).astype(np.float32)),
        }

    def rm_batch(rng, m=16, n=14, p=6):
        pairs = np.stack([np.arange(p), np.arange(p)], -1)
        return {
            "feats0": jnp.asarray(rng.normal(size=(1, m, GS, 32)).astype(np.float32)),
            "feats1": jnp.asarray(rng.normal(size=(1, n, GS, 32)).astype(np.float32)),
            "keys0": jnp.asarray(rng.normal(size=(1, m, 3)).astype(np.float32)),
            "keys1": jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32)),
            "mask0": jnp.ones((1, m), bool),
            "mask1": jnp.ones((1, n), bool),
            "pairs": jnp.asarray(pairs[None].astype(np.int32)),
            "pair_mask": jnp.ones((1, p), bool),
            "unpair0": jnp.asarray((np.arange(m) >= p)[None]),
            "unpair1": jnp.asarray((np.arange(n) >= p)[None]),
            "matches0": jnp.full((1, m), -1, jnp.int32).at[0, :p].set(
                jnp.arange(p)
            ),
        }

    cases = {
        "gf": (_gf_batch(rng), None),
        "rd": (rd_batch(rng), None),
        "rm": (rm_batch(rng), None),
        "et": (_gf_batch(rng), {"gf": gf_vars}),
    }
    for comp, (batch, frozen) in cases.items():
        cfg = TrainConfig.defaults(comp, group_size=GS)
        init_fn, _, eval_fwd = make_train_step(cfg, frozen)
        state = init_fn(jax.random.PRNGKey(0), batch)
        val_fn = make_val_fn(comp, GS, [batch], frozen=frozen)
        out = val_fn(state, eval_fwd)
        key = name2metric[comp][0]
        assert key in out and np.isfinite(out[key]), (comp, out)


def test_trainer_run_and_checkpoint(tmp_path):
    cfg = TrainConfig.defaults(
        "gf", group_size=GS, lr_init=1e-3,
        total_steps=6, val_interval=1000, save_interval=3, log_interval=2,
        model_dir=str(tmp_path),
    )
    rng = np.random.default_rng(2)

    def it():
        while True:
            yield _gf_batch(rng)

    t = Trainer(cfg, it())
    res = t.run()
    assert res["final_step"] == 6
    assert np.isfinite(res["last"]["loss"])
    # checkpoint exists and can be restored into a fresh trainer
    t2 = Trainer(cfg, it())
    batch = _gf_batch(np.random.default_rng(3))
    assert t2.restore(sample_batch=batch)
    assert int(t2.state["step"]) == 6
