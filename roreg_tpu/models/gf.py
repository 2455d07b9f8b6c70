"""GF — the group-feature / RoReg-Desc network.

Equivalent of ``Group_feat_network`` + ``GF_train``/``GF_test``
(reference network/group_feat.py:7-88): an SO(3) conv stack
32 -> 256 -> residual(256/512/256) -> 32 with an input residual, producing

* ``eqv`` (B, G, 32): rotation-equivariant descriptor, L2-normalized over
  channels per group element;
* ``inv`` (B, 32): group-mean invariant descriptor, L2-normalized.

``des_to_dr_index`` is the Des2DR 60x60 correlation argmax
(group_feat.py:55-58) predicting the relative group rotation between two
group features.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from roreg_tpu.core.group import IcosahedralGroup
from roreg_tpu.models.ops import CombConv, GroupConv, ResidualCombConv, group_correlation

__all__ = ["GroupFeatNetwork", "des_to_dr_index", "GFOutput"]


def des_to_dr_index(
    eqv0: jnp.ndarray, eqv1: jnp.ndarray, cayley: jnp.ndarray
) -> jnp.ndarray:
    """argmax_a sum_g <eqv0[cayley[a, g]], eqv1[g]> — predicted group index a
    such that cloud1 ~ R_a · cloud0 (in the group frame)."""
    cor = group_correlation(eqv0, eqv1, cayley)
    return jnp.argmax(cor, axis=-1)


GFOutput = dict


class GroupFeatNetwork(nn.Module):
    """SO(3) group conv stack; features are (B, G, C) channels-last."""

    group: IcosahedralGroup
    channels: int = 32
    width: int = 256

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> GFOutput:
        nei = self.group.nei13
        x = GroupConv(self.width, nei, name="conv_in")(feats)
        x = ResidualCombConv(self.width * 2, self.width, nei, name="res0")(x, train)
        x = CombConv(self.channels, nei, name="conv_out")(x, train)
        eqv = x + feats
        inv = jnp.mean(eqv, axis=-2)
        eqv = eqv / jnp.clip(jnp.linalg.norm(eqv, axis=-1, keepdims=True), 1e-4)
        inv = inv / jnp.clip(jnp.linalg.norm(inv, axis=-1, keepdims=True), 1e-4)
        return {"eqv": eqv, "inv": inv}
