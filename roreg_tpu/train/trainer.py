"""Step-based trainers for the four components (GF / RD / RM / ET).

Equivalent of reference ``train/trainer.py`` (generic loop :15-152,
subclasses :154-192): Adam + exponential LR decay, periodic validation with
best-checkpoint tracking by a per-component gate metric, step-accurate
resume — rebuilt on optax + orbax with fully jitted train steps (forward,
loss, grad, update, BatchNorm state in one compiled function).

Data-parallel scaling: every train step is written over a batch axis and
can be wrapped by ``roreg_tpu.dist.mesh.shard_batch_step`` to pjit across a
device mesh with gradient psum over ICI (the reference's vestigial
``--multi_gpus`` / MultiGPUWrapper, utils/utils.py:81-93, done properly).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core

from roreg_tpu.core.group import get_group
from roreg_tpu.models.et import EquivariantTransformer
from roreg_tpu.models.gf import GroupFeatNetwork
from roreg_tpu.models.rd import RotationDetector
from roreg_tpu.models.rm import RotationCoherenceMatcher
from roreg_tpu.train import losses as L

__all__ = [
    "TrainConfig", "Trainer", "make_train_step", "name2metric", "cpu_init_scope",
]


def cpu_init_scope():
    """Context manager pinning computation to the CPU backend — used for
    network/optimizer initialization, which is shape bookkeeping that would
    otherwise dispatch eagerly over a (possibly remote) accelerator."""
    import contextlib

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


@dataclass(frozen=True)
class TrainConfig:
    """Per-component hyperparameters; defaults are the reference's
    (parses/parses_train_{gf,rd,rm,et}.py)."""

    component: str = "gf"  # gf | rd | rm | et
    group_size: int = 60
    batch_size: int = 32
    lr_init: float = 1e-4
    lr_decay_rate: float = 0.5
    lr_decay_steps: int = 10000
    total_steps: int = 100000
    val_interval: int = 6000
    save_interval: int = 3000
    log_interval: int = 500
    model_dir: str = "checkpoints"

    @staticmethod
    def defaults(component: str, **kw) -> "TrainConfig":
        base = {
            "gf": dict(batch_size=32, lr_init=1e-4, lr_decay_rate=0.5),
            "rd": dict(batch_size=128, lr_init=1e-3, lr_decay_rate=0.8),
            "rm": dict(batch_size=1, lr_init=1e-3, lr_decay_rate=0.8),
            "et": dict(batch_size=32, lr_init=1e-3, lr_decay_rate=0.5),
        }[component]
        base.update(kw)
        return TrainConfig(component=component, **base)


# metric key and direction per component (trainer.py:154-181)
name2metric = {
    "gf": ("whole_recall", 1),
    "rd": ("val_recall", 1),
    "rm": ("pair_ok_rate", 1),
    "et": ("R_error", -1),
}


def _schedule(cfg: TrainConfig):
    return optax.exponential_decay(
        cfg.lr_init, cfg.lr_decay_steps, cfg.lr_decay_rate, staircase=False
    )


# --------------------------------------------------------------------------
# per-component jitted train steps
# --------------------------------------------------------------------------


def make_train_step(cfg: TrainConfig, frozen: dict | None = None) -> tuple:
    """Returns (init_fn(key, sample_batch) -> state,
    step_fn(state, batch) -> (state, metrics)).

    state = {params, batch_stats, opt_state, step}. ``frozen`` carries
    non-trained variables (e.g. the GF network inside ET training —
    the reference freezes PartI, eqv_trans.py:49-51).
    """
    group = get_group(cfg.group_size)
    cay = jnp.asarray(group.cayley)
    tx = optax.adam(_schedule(cfg))

    if cfg.component == "gf":
        net = GroupFeatNetwork(group)

        def fwd(params, bstats, batch, train):
            variables = {"params": params, "batch_stats": bstats}
            out0, m0 = net.apply(
                variables, batch["feats0"], train, mutable=["batch_stats"]
            )
            out1, m1 = net.apply(
                {"params": params, "batch_stats": m0["batch_stats"]},
                batch["feats1"], train, mutable=["batch_stats"],
            )
            loss, aux = L.gf_loss(
                out0["inv"], out1["inv"], out0["eqv"], out1["eqv"],
                batch["true_idx"], cay,
            )
            return loss, (m1["batch_stats"], aux)

        def init_fn(key, batch):
            variables = net.init(key, batch["feats0"], True)
            return _mk_state(variables, tx)

    elif cfg.component == "rd":
        net = RotationDetector(group)

        def fwd(params, bstats, batch, train):
            variables = {"params": params, "batch_stats": bstats}
            feats = jnp.concatenate([batch["feats0"], batch["feats1"]], axis=0)
            scores, m = net.apply(variables, feats, train, mutable=["batch_stats"])
            loss = L.rd_loss(scores, batch["rdiffs"])
            return loss, (m["batch_stats"], {"rd_loss": loss})

        def init_fn(key, batch):
            variables = net.init(key, batch["feats0"], True)
            return _mk_state(variables, tx)

    elif cfg.component == "rm":
        net = RotationCoherenceMatcher(group)

        def fwd(params, bstats, batch, train):
            variables = {"params": params}
            out = net.apply(
                variables,
                batch["feats0"], batch["feats1"],
                batch["keys0"], batch["keys1"],
                batch["mask0"], batch["mask1"],
            )
            loss, aux = L.rm_loss(
                out["scores"], out["scores_other"],
                batch["pairs"], batch["pair_mask"],
                batch["unpair0"], batch["unpair1"],
            )
            return loss, (bstats, aux)

        def init_fn(key, batch):
            variables = net.init(
                key,
                batch["feats0"], batch["feats1"],
                batch["keys0"], batch["keys1"],
                batch["mask0"], batch["mask1"],
            )
            return _mk_state(variables, tx)

    elif cfg.component == "et":
        net = EquivariantTransformer(group)
        gf_net = GroupFeatNetwork(group)
        assert frozen is not None and "gf" in frozen, "ET needs frozen GF vars"
        gf_vars = frozen["gf"]

        def fwd(params, bstats, batch, train):
            # frozen PartI: descriptor eqv features of both sides
            eqv0 = gf_net.apply(gf_vars, batch["feats0"], False)["eqv"]
            eqv1 = gf_net.apply(gf_vars, batch["feats1"], False)["eqv"]
            eqv0 = jax.lax.stop_gradient(eqv0)
            eqv1 = jax.lax.stop_gradient(eqv1)
            variables = {"params": params, "batch_stats": bstats}
            # training aligns by the TRUE index (eqv_trans.py:58-62)
            q, m = net.apply(
                variables,
                batch["feats0"], batch["feats1"], eqv0, eqv1,
                batch["true_idx"], train,
                False,  # no normalization in training (eqv_trans.py:70)
                mutable=["batch_stats"],
            )
            loss = L.et_loss(q, batch["delta_r"])
            return loss, (m["batch_stats"], {"et_loss": loss})

        def init_fn(key, batch):
            f = batch["feats0"]
            variables = net.init(
                key, f, f, f, f, batch["true_idx"], True, False
            )
            return _mk_state(variables, tx)

    else:
        raise ValueError(cfg.component)

    @jax.jit
    def step_fn(state, batch):
        def loss_fn(params):
            return fwd(params, state["batch_stats"], batch, True)

        (loss, (new_bstats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        metrics = {"loss": loss, **aux}
        return {
            "params": new_params,
            "batch_stats": new_bstats,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, metrics

    def _mk_state(variables, tx_):
        params = variables["params"]
        bstats = variables.get("batch_stats", flax_core.freeze({}))
        return {
            "params": params,
            "batch_stats": bstats,
            "opt_state": tx_.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    _raw_init = init_fn

    def init_on_cpu(key, batch):
        with cpu_init_scope():
            return _raw_init(key, batch)

    return init_on_cpu, step_fn, (lambda p, b, batch: fwd(p, b, batch, False))


# --------------------------------------------------------------------------
# trainer driver
# --------------------------------------------------------------------------


class Trainer:
    """Generic step-based training loop with best-checkpoint tracking."""

    def __init__(
        self,
        cfg: TrainConfig,
        data_iter: Iterator[dict],
        val_fn: Callable[[Any, Any], dict] | None = None,
        frozen: dict | None = None,
    ):
        self.cfg = cfg
        self.data_iter = data_iter
        self.val_fn = val_fn
        self.metric_key, self.greater = name2metric[cfg.component]
        self.best = -np.inf * self.greater if self.greater > 0 else np.inf
        self.init_fn, self.step_fn, self.eval_fwd = make_train_step(cfg, frozen)
        self.state = None
        self.history: list[dict] = []
        # scalar stream (tensorboardX Logger equivalent, utils/utils.py:200)
        from roreg_tpu.utils.metrics_log import ScalarLog

        self.scalar_log = ScalarLog(
            os.path.join(cfg.model_dir, cfg.component.upper(), "log")
        )

    def _ckpt_dir(self, best=False):
        name = "model_best" if best else "model"
        return os.path.join(self.cfg.model_dir, self.cfg.component.upper(), name)

    def save(self, best=False):
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_dir(best))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state, force=True)
        ckptr.wait_until_finished()

    def restore(self, best=False, sample_batch=None):
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_dir(best))
        if not os.path.exists(path):
            return False
        if self.state is None:
            assert sample_batch is not None
            self.state = self.init_fn(jax.random.PRNGKey(0), sample_batch)
        ckptr = ocp.StandardCheckpointer()
        self.state = ckptr.restore(path, self.state)
        return True

    def run(self, steps: int | None = None, resume: bool = True) -> dict:
        cfg = self.cfg
        steps = steps or cfg.total_steps
        batch = next(self.data_iter)
        if self.state is None:
            self.state = self.init_fn(jax.random.PRNGKey(0), batch)
            if resume:
                self.restore(sample_batch=batch)
        start = int(self.state["step"])
        last_metrics = {}
        for i in range(start, steps):
            self.state, metrics = self.step_fn(self.state, batch)
            if (i + 1) % cfg.log_interval == 0:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                self.history.append({"step": i + 1, **last_metrics})
                self.scalar_log.write(i + 1, last_metrics, split="train")
            if self.val_fn is not None and (i + 1) % cfg.val_interval == 0:
                val = self.val_fn(self.state, self.eval_fwd)
                v = val[self.metric_key]
                if self.greater * v >= self.greater * self.best:
                    self.best = v
                    self.save(best=True)
                self.history.append({
                    "step": i + 1,
                    **{f"val_{k}": float(x) for k, x in val.items()
                       if np.ndim(x) == 0},
                })
                self.scalar_log.write(i + 1, val, split="val")
            if (i + 1) % cfg.save_interval == 0:
                self.save(best=False)
            if i + 1 < steps:
                batch = next(self.data_iter)
        return {"final_step": steps, "best": self.best, "last": last_metrics}
