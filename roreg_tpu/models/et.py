"""ET — equivariant local-transformation (residual quaternion) estimator.

Equivalent of ``ET_train``/``ET_test`` (reference network/eqv_trans.py:7-138):
given the backbone-pair and descriptor-pair group features of a putative
correspondence, with the source side aligned through the predicted coarse
group index (permutation by the Cayley row), an SO(3) conv stack
128 -> 256 -> residual(256/512/256) followed by an MLP head regresses the
*residual quaternion* on top of the anchor rotation, so each single
correspondence yields a full rotation hypothesis (one-shot RANSAC).

Note: the reference applies its FC head to every group element but reads
only element 0 (eqv_trans.py:64-67 — ``feats_inv[:, :, 0, 0]``); we compute
the head on the g=0 slice directly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from roreg_tpu.core.group import IcosahedralGroup
from roreg_tpu.models.ops import CombConv, ResidualCombConv

__all__ = ["EquivariantTransformer", "align_by_index"]


def align_by_index(
    feats: jnp.ndarray, idx: jnp.ndarray, cayley: jnp.ndarray
) -> jnp.ndarray:
    """Permute the group axis by the Cayley row of ``idx``:
    out[b, g] = feats[b, cayley[idx_b, g]] (eqv_trans.py:60-62,126-128)."""
    perm = jnp.asarray(cayley)[idx]  # (B, G)
    return jnp.take_along_axis(feats, perm[..., None], axis=-2)


class EquivariantTransformer(nn.Module):
    group: IcosahedralGroup
    width: int = 256
    head_dims: tuple[int, ...] = (512, 128)

    @nn.compact
    def __call__(
        self,
        before0: jnp.ndarray,
        before1: jnp.ndarray,
        after0: jnp.ndarray,
        after1: jnp.ndarray,
        idx: jnp.ndarray,
        train: bool = False,
        normalize: bool = True,
    ) -> jnp.ndarray:
        """(B, G, 32) x4 + (B,) group index -> (B, 4) quaternion.

        ``before*`` are backbone (FCGF) group features, ``after*`` the
        GF/RoReg-Desc outputs; side 0 is aligned through ``idx``.
        """
        nei = self.group.nei13
        cay = self.group.cayley
        b0 = align_by_index(before0, idx, cay)
        a0 = align_by_index(after0, idx, cay)
        x = jnp.concatenate([b0, before1, a0, after1], axis=-1)  # (B, G, 128)
        x = CombConv(self.width, nei, name="conv_init")(x, train)
        x = ResidualCombConv(self.width * 2, self.width, nei, name="res0")(x, train)
        h = x[..., 0, :]  # group element 0 (identity) slice
        for i, d in enumerate(self.head_dims):
            h = nn.Dense(d, name=f"fc{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"fc_bn{i}"
            )(h)
            h = nn.relu(h)
        q = nn.Dense(4, name="fc_out")(h)
        if normalize:
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        return q
