"""SO(3) group-convolution primitives (channels-last, MXU-shaped).

Equivalents of the reference's ``Comb_Conv`` / ``Residual_Comb_Conv``
(network/ops.py:11-63), re-laid-out for TPU: features are ``(B, G, C)``
(group axis second, channels last), the 13-neighbor gather happens on the
G axis, and the (1, 13) torch Conv2d becomes a single
``(B*G, 13*C) @ (13*C, C_out)`` MXU matmul.

BatchNorm note: the reference normalizes the *gathered* (B, C, 60, 13)
tensor; because every group element appears in exactly 13 neighborhoods,
batch statistics over the gathered tensor equal statistics over the
ungathered (B, G, C) tensor, so ``gather(BN(x)) == BN_ref(gather(x))`` —
we apply BN pre-gather (cheaper by 13x).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["so3_gather", "GroupConv", "CombConv", "ResidualCombConv", "group_correlation"]


def so3_gather(x: jnp.ndarray, nei: jnp.ndarray) -> jnp.ndarray:
    """(…, G, C), (G, K) -> (…, G, K, C) neighborhood gather on the G axis."""
    return jnp.take(x, nei, axis=-2)


class GroupConv(nn.Module):
    """Plain group conv: gather 13 neighbors, contract with (K*C_in, C_out)."""

    out_dim: int
    nei: jnp.ndarray  # (G, K) static neighbor table

    @nn.compact
    def __call__(self, x):
        g, k = self.nei.shape
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (k * cin, self.out_dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        h = so3_gather(x, jnp.asarray(self.nei))  # (..., G, K, C)
        h = h.reshape(h.shape[:-2] + (k * cin,))
        return jnp.dot(h, w, preferred_element_type=jnp.float32) + b


class CombConv(nn.Module):
    """BN -> ReLU -> group conv (reference Comb_Conv, network/ops.py:11-20)."""

    out_dim: int
    nei: jnp.ndarray

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=None, name="bn",
        )(x)
        h = nn.relu(h)
        return GroupConv(self.out_dim, self.nei, name="conv")(h)


class ResidualCombConv(nn.Module):
    """Pre-activation residual SO(3) conv (Residual_Comb_Conv, ops.py:22-63)."""

    mid_dim: int
    out_dim: int
    nei: jnp.ndarray

    @nn.compact
    def __call__(self, x, train: bool):
        h = CombConv(self.mid_dim, self.nei, name="in")(x, train)
        h = CombConv(self.out_dim, self.nei, name="out")(h, train)
        if x.shape[-1] != self.out_dim:
            sc = CombConv(self.out_dim, self.nei, name="short_cut")(x, train)
        else:
            sc = x
        return h + sc


_CORR_ONEHOT: dict = {}


def _corr_onehot(cayley) -> jnp.ndarray:
    """(A, G, G) one-hot W[a, g, h] = 1 iff h == cayley[a, g]."""
    import numpy as _np

    c_np = _np.asarray(cayley)
    key = (c_np.shape, hash(c_np.tobytes()))
    if key not in _CORR_ONEHOT:
        c = c_np
        A, G = c.shape
        w = _np.zeros((A, G, G), _np.float32)
        w[_np.arange(A)[:, None], _np.arange(G)[None, :], c] = 1.0
        # cache the NUMPY constant — caching a jnp array created inside a
        # jit trace would leak a tracer into later traces
        _CORR_ONEHOT[key] = w
    return jnp.asarray(_CORR_ONEHOT[key])


def group_correlation(
    permuted: jnp.ndarray, fixed: jnp.ndarray, cayley: jnp.ndarray
) -> jnp.ndarray:
    """cor[…, a] = sum_{g,c} permuted[…, cayley[a, g], c] * fixed[…, g, c].

    The 60x60 rotation-index correlation used by Des2DR
    (network/group_feat.py:55-58), Batch_Des2R (test/estimator.py:85-89)
    and the GF eqv loss (train/loss.py:26-31).

    Computed WITHOUT materializing the gathered (…, A, G, C) tensor
    (230 MB at 1000 keypoints x 60^2 x 32): first the per-item gram
    matrix S[…, g, h] = <fixed[…, g, :], permuted[…, h, :]> (one MXU
    batch-GEMM, (…, G, G)), then the permutation sum as a contraction
    with a static (A, G, G) one-hot — ~20x less HBM traffic, same math.
    """
    S = jnp.einsum("...gc,...hc->...gh", fixed, permuted)
    return jnp.einsum("...gh,agh->...a", S, _corr_onehot(cayley))
