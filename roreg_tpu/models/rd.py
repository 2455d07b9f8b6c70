"""RD — rotation-guided keypoint detector.

Equivalent of ``detector_eqv`` / ``detector_eqv_test``
(reference network/rot_detect.py:8-55): a small SO(3) residual conv
32 -> 64 -> 16, channel L2-norm, then the saliency score =
std over the 60 rotation-correlation values of the feature with its own
group-permuted copies. Keypoints whose group feature varies strongly under
rotation are geometrically distinctive (the paper's rotation guidance).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from roreg_tpu.core.group import IcosahedralGroup
from roreg_tpu.models.ops import ResidualCombConv, group_correlation

__all__ = ["RotationDetector", "RotationDetectorFormer"]


class RotationDetector(nn.Module):
    group: IcosahedralGroup
    mid_dim: int = 64
    out_dim: int = 16

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, G, 32) group features -> (B,) saliency scores."""
        nei = self.group.nei13
        x = ResidualCombConv(self.mid_dim, self.out_dim, nei, name="enc")(feats, train)
        x = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        cor = group_correlation(x, x, self.group.cayley)  # (B, G)
        # unbiased std over the G self-correlations (torch.std default)
        mean = jnp.mean(cor, axis=-1, keepdims=True)
        var = jnp.sum((cor - mean) ** 2, axis=-1) / (cor.shape[-1] - 1)
        return jnp.sqrt(var)


class RotationDetectorFormer(nn.Module):
    """Legacy sigmoid-MLP detector variant (the reference's shipped
    ``RD_former`` checkpoint, checkpoints/FCGF/RD_former/rot_detect.py:6-58):
    SO(3) residual conv 32 -> (64) -> 1 channel, then the 60 group values
    are treated as channels of a 1x1-conv MLP 60 -> 32 -> 1 + sigmoid."""

    group: IcosahedralGroup
    mid_dim: int = 64

    @nn.compact
    def __call__(self, feats: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, G, 32) group features -> (B,) sigmoid saliency scores."""
        nei = self.group.nei13
        x = ResidualCombConv(self.mid_dim, 1, nei, name="enc")(feats, train)
        x = x[..., 0]  # (B, G): one channel per group element
        h = nn.Dense(32, name="score0")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="score_bn"
        )(h)
        h = nn.relu(h)
        s = nn.Dense(1, name="score1")(h)[..., 0]
        return nn.sigmoid(s)
