"""Checkpoint glue between trainers and the inference pipeline.

The reference loads per-component ``model_best.pth`` files at inference
(test/extractor.py:22-30, detector.py:19-24, matcher.py:121-129,
estimator.py:284-291); here the trainers save orbax checkpoints under
``<dir>/<COMPONENT>/model_best`` and this module assembles the pipeline's
``variables`` dict from whichever components exist (missing ones keep
their passed-in template values — e.g. random init for smoke runs).
"""

from __future__ import annotations

import os
from typing import Any

import jax

__all__ = ["save_variables", "load_variables", "load_pipeline_variables"]

_COMPONENTS = ("backbone", "gf", "rd", "rm", "et")


def save_variables(path: str, variables: Any) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()


def load_variables(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def _train_state_to_variables(state: dict) -> dict:
    out = {"params": state["params"]}
    bs = state.get("batch_stats")
    if bs is not None and jax.tree_util.tree_leaves(bs):
        out["batch_stats"] = bs
    return out


def load_pipeline_variables(
    checkpoint_dir: str, templates: dict[str, Any]
) -> dict[str, Any]:
    """Restore each component's best train state into pipeline variables.

    Accepts two layouts: ``<dir>/<COMP>/model_best`` (a Trainer state) or
    ``<dir>/<comp>_variables`` (raw variables saved by save_variables).
    """
    out = {}
    for comp in _COMPONENTS:
        tpl = templates.get(comp)
        if tpl is None:
            continue
        raw = os.path.join(checkpoint_dir, f"{comp}_variables")
        best = os.path.join(checkpoint_dir, comp.upper(), "model_best")
        if os.path.exists(raw):
            out[comp] = load_variables(raw, tpl)
        elif os.path.exists(best):
            # restore with a state-shaped template built from the variables
            state_tpl = {
                "params": tpl["params"],
                "batch_stats": tpl.get("batch_stats", {}),
            }
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(
                os.path.abspath(best), state_tpl, partial_restore=True
            )
            out[comp] = _train_state_to_variables(restored)
    return out
