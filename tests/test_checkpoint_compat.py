"""Checkpoint-compatibility regression test (VERDICT r3 item 3).

Every checkpoint directory committed under ``checkpoints_quality/`` must
restore against the CURRENT module definitions at the canonical quality
config — this is exactly the test that would have caught round 3's stale
ET/RD weights (saved under an older 9-neighbor group adjacency while the
models moved to K=13).

The check compares orbax array metadata against template shapes first
(fast, and failure names the offending parameter path), then performs a
real restore so dtype/layout issues surface too.
"""

from __future__ import annotations

import os

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_DIR = os.path.join(REPO, "checkpoints_quality")

COMPONENTS = ("backbone", "gf", "rd", "rm", "et")


@pytest.fixture(scope="module")
def quality_templates():
    from roreg_tpu.pipeline.quality_config import quality_small_config
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    pipe = RegistrationPipeline(quality_small_config(), {})
    return pipe.init_variables(jax.random.PRNGKey(0))


@pytest.mark.parametrize("comp", COMPONENTS)
def test_committed_checkpoint_restores_at_head(comp, quality_templates):
    path = os.path.join(CKPT_DIR, f"{comp}_variables")
    if not os.path.isdir(path):
        pytest.skip(f"no committed checkpoint for {comp}")

    _check_restore(path, quality_templates[comp], comp, "checkpoints_quality")


@pytest.mark.parametrize("comp", COMPONENTS)
def test_full_size_checkpoint_restores_at_head(comp):
    """Same audit for the protocol-scale run's checkpoints
    (``checkpoints_quality_full/``, voxel 0.025 / keynum 2048 config)."""
    path = os.path.join(REPO, "checkpoints_quality_full", f"{comp}_variables")
    if not os.path.isdir(path):
        pytest.skip(f"no committed full-size checkpoint for {comp}")

    from roreg_tpu.pipeline.quality_config import quality_full_config
    from roreg_tpu.pipeline.registration import RegistrationPipeline

    pipe = RegistrationPipeline(quality_full_config(), {})
    templates = pipe.init_variables(jax.random.PRNGKey(0))
    _check_restore(path, templates[comp], comp, "checkpoints_quality_full")


def _check_restore(path, template, comp, label):

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()

    # shape audit with per-path reporting
    meta = ckptr.metadata(os.path.abspath(path))
    meta_tree = getattr(meta, "item_metadata", meta)
    tpl_leaves = dict(
        (jax.tree_util.keystr(p), l.shape)
        for p, l in jax.tree_util.tree_leaves_with_path(template)
    )
    meta_leaves = dict(
        (jax.tree_util.keystr(p), tuple(l.shape))
        for p, l in jax.tree_util.tree_leaves_with_path(meta_tree)
    )
    problems = []
    for k, shape in tpl_leaves.items():
        if k not in meta_leaves:
            problems.append(f"missing in checkpoint: {k} {shape}")
        elif tuple(meta_leaves[k]) != tuple(shape):
            problems.append(
                f"shape mismatch at {k}: checkpoint {meta_leaves[k]} "
                f"vs model {tuple(shape)}"
            )
    for k in meta_leaves:
        if k not in tpl_leaves:
            problems.append(f"extra in checkpoint: {k} {meta_leaves[k]}")
    assert not problems, (
        f"{label}/{comp}_variables is incompatible with the "
        f"current {comp} module definition:\n  " + "\n  ".join(problems)
    )

    # real restore (catches dtype/layout issues the shape audit can't)
    restored = ckptr.restore(os.path.abspath(path), template)
    n = len(jax.tree_util.tree_leaves(restored))
    assert n == len(jax.tree_util.tree_leaves(template))
