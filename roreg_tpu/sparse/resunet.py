"""FCGF ResUNet backbone on the TPU sparse engine.

Architecture parity with the reference's shipped backbone ``ResUNetBN2C``
(backbone/fcgf/resunet.py:10-193, variants :196-246): channels
[32, 64, 128, 256], TR channels [64, 64, 64, 128], BasicBlockBN residual
blocks (backbone/fcgf/residual_block.py:9-61), skip concatenations, and a
final L2 feature normalization (resunet.py:186-192). The forward consumes a
precomputed :class:`SparsePyramid`, so the whole network is gather + GEMM —
no coordinate management inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from roreg_tpu.sparse.conv import (
    MaskedBatchNorm,
    MaskedInstanceNorm,
    OccupancyConv,
    SparseConv,
)
from roreg_tpu.sparse.kernel_map import SparsePyramid

__all__ = ["ResUNet", "SimpleNet", "RESUNET_VARIANTS", "SIMPLENET_VARIANTS"]

# name -> (CHANNELS[1:], TR_CHANNELS[1:], block_norm)
# (reference backbone/fcgf/resunet.py:196-246; the IN variants keep BN on
# the outer norms and use instance norm INSIDE the residual blocks —
# BLOCK_NORM_TYPE='IN', NORM_TYPE='BN')
RESUNET_VARIANTS = {
    "ResUNetBN2": ([32, 64, 128, 256], [32, 64, 64, 128], "BN"),
    "ResUNetBN2B": ([32, 64, 128, 256], [64, 64, 64, 64], "BN"),
    "ResUNetBN2C": ([32, 64, 128, 256], [64, 64, 64, 128], "BN"),
    "ResUNetBN2D": ([32, 64, 128, 256], [64, 64, 128, 128], "BN"),
    "ResUNetBN2E": ([128, 128, 128, 256], [64, 128, 128, 128], "BN"),
    "ResUNetIN2": ([32, 64, 128, 256], [32, 64, 64, 128], "IN"),
    "ResUNetIN2B": ([32, 64, 128, 256], [64, 64, 64, 64], "IN"),
    "ResUNetIN2C": ([32, 64, 128, 256], [64, 64, 64, 128], "IN"),
    "ResUNetIN2D": ([32, 64, 128, 256], [64, 64, 128, 128], "IN"),
    "ResUNetIN2E": ([128, 128, 128, 256], [64, 128, 128, 128], "IN"),
}

# name -> (CHANNELS[1:], TR_CHANNELS[1:], norm, levels)
# (reference backbone/fcgf/simpleunet.py:8-150 SimpleNet* 3-level family,
# :152-340 SimpleNet2/3 deeper families; no residual blocks, norm applies
# to every conv including conv1)
SIMPLENET_VARIANTS = {
    "SimpleNetBN": ([32, 64, 128], [32, 32, 64], "BN", 3),
    "SimpleNetIN": ([32, 64, 128], [32, 32, 64], "IN", 3),
    "SimpleNetBNE": ([16, 32, 32], [16, 16, 32], "BN", 3),
    "SimpleNetINE": ([16, 32, 32], [16, 16, 32], "IN", 3),
    "SimpleNetBN2": ([32, 64, 128, 256], [32, 32, 64, 64], "BN", 4),
    "SimpleNetIN2": ([32, 64, 128, 256], [32, 32, 64, 64], "IN", 4),
}


def _norm(kind: str, name: str, bn_momentum: float = 0.05):
    if kind == "BN":
        return MaskedBatchNorm(momentum=bn_momentum, name=name)
    if kind == "IN":
        return MaskedInstanceNorm(name=name)
    raise ValueError(kind)


class BasicBlock(nn.Module):
    """Pre-norm residual block == BasicBlockBN/IN (residual_block.py:9-61)."""

    channels: int
    compute_dtype: str | None = None
    window: int | None = None
    norm: str = "BN"

    @nn.compact
    def __call__(self, x, nbr, mask, train: bool):
        y = SparseConv(self.channels, nbr.shape[1], name="conv1",
                       compute_dtype=self.compute_dtype, window=self.window)(x, nbr, mask)
        y = _norm(self.norm, "norm1")(y, mask, use_running_average=not train)
        y = nn.relu(y)
        y = SparseConv(self.channels, nbr.shape[1], name="conv2",
                       compute_dtype=self.compute_dtype, window=self.window)(y, nbr, mask)
        y = _norm(self.norm, "norm2")(y, mask, use_running_average=not train)
        y = nn.relu(y + x)
        return jnp.where(mask[..., None], y, 0.0)


class SimpleNet(nn.Module):
    """FCGF SimpleNet family: plain (no residual blocks) 3- or 4-level
    UNet with pre-relu skip concats (reference
    ``backbone/fcgf/simpleunet.py:8-150`` SimpleNet{BN,IN,BNE,INE},
    ``:152-``` SimpleNet2 4-level). The chosen norm applies to EVERY conv
    including conv1 (unlike ResUNet, where blocks may use IN but outer
    norms stay BN). Consumes the same SparsePyramid; only ``levels`` of
    its levels are used."""

    variant: str = "SimpleNetBN"
    in_channels: int = 1
    out_channels: int = 32
    conv1_kernel_size: int = 7
    normalize_feature: bool = True
    bn_momentum: float = 0.05
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, pyr: SparsePyramid, train: bool = False):
        ch, tr, norm, nlev = SIMPLENET_VARIANTS[self.variant]
        masks = [lvl.mask for lvl in pyr.levels]
        kv1 = self.conv1_kernel_size**3
        cd = self.compute_dtype

        def nm(name):
            return _norm(norm, name, self.bn_momentum)

        assert self.in_channels == 1, "FCGF backbone uses 1-channel ones input"
        skips = []
        x = OccupancyConv(ch[0], kv1, name="conv1", compute_dtype=cd)(
            pyr.conv1_occ, masks[0]
        )
        x = nm("norm1")(x, masks[0], use_running_average=not train)
        skips.append(x)  # pre-relu skip (simpleunet.py forward)
        x = nn.relu(x)
        for l in range(1, nlev):
            x = SparseConv(ch[l], 27, name=f"conv{l + 1}", compute_dtype=cd)(
                x, pyr.down[l - 1], masks[l]
            )
            x = nm(f"norm{l + 1}")(x, masks[l], use_running_average=not train)
            skips.append(x)
            x = nn.relu(x)
        for l in range(nlev - 1, 0, -1):
            x = SparseConv(tr[l], 27, name=f"conv{l + 1}_tr", compute_dtype=cd)(
                x, pyr.up[l - 1], masks[l - 1]
            )
            x = nm(f"norm{l + 1}_tr")(x, masks[l - 1], use_running_average=not train)
            x = nn.relu(x)
            x = jnp.concatenate([x, skips[l - 1]], axis=-1)
        x = SparseConv(tr[0], 27, name="conv1_tr", compute_dtype=cd)(
            x, pyr.same[0], masks[0]
        )
        x = nm("norm1_tr")(x, masks[0], use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dense(self.out_channels, use_bias=True, name="final")(x)
        if self.normalize_feature:
            import jax

            x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        return jnp.where(masks[0][..., None], x, 0.0)


class ResUNet(nn.Module):
    """4-level sparse ResUNet; `variant` selects the FCGF channel plan."""

    variant: str = "ResUNetBN2C"
    in_channels: int = 1
    out_channels: int = 32
    conv1_kernel_size: int = 7
    normalize_feature: bool = True
    bn_momentum: float = 0.05
    compute_dtype: str | None = None  # "bfloat16" halves conv HBM traffic
    # Pallas windowed-gather convs (inference fast path); None = XLA gather
    conv_window: int | None = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, pyr: SparsePyramid, train: bool = False):
        ch, tr, blknorm = RESUNET_VARIANTS[self.variant]
        masks = [lvl.mask for lvl in pyr.levels]
        kv1 = self.conv1_kernel_size**3

        def bn(name):
            return MaskedBatchNorm(momentum=self.bn_momentum, name=name)

        # ---------------- encoder ----------------
        # conv1 consumes FCGF's constant all-ones 1-channel input
        # (reference backbone/fcgf/misc.py:70): occupancy matmul, no gather.
        # `feats` is accepted for API stability but its values are, by FCGF
        # construction, all ones on valid rows.
        assert self.in_channels == 1, "FCGF backbone uses 1-channel ones input"
        x = OccupancyConv(ch[0], kv1, name="conv1", compute_dtype=self.compute_dtype)(pyr.conv1_occ, masks[0])
        x = bn("norm1")(x, masks[0], use_running_average=not train)
        out_s1 = BasicBlock(ch[0], self.compute_dtype, self.conv_window, blknorm, name="block1")(x, pyr.same[0], masks[0], train)
        x = nn.relu(out_s1)

        x = SparseConv(ch[1], 27, name="conv2", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[0], masks[1])
        x = bn("norm2")(x, masks[1], use_running_average=not train)
        out_s2 = BasicBlock(ch[1], self.compute_dtype, self.conv_window, blknorm, name="block2")(x, pyr.same[1], masks[1], train)
        x = nn.relu(out_s2)

        x = SparseConv(ch[2], 27, name="conv3", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[1], masks[2])
        x = bn("norm3")(x, masks[2], use_running_average=not train)
        out_s4 = BasicBlock(ch[2], self.compute_dtype, self.conv_window, blknorm, name="block3")(x, pyr.same[2], masks[2], train)
        x = nn.relu(out_s4)

        x = SparseConv(ch[3], 27, name="conv4", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[2], masks[3])
        x = bn("norm4")(x, masks[3], use_running_average=not train)
        out_s8 = BasicBlock(ch[3], self.compute_dtype, self.conv_window, blknorm, name="block4")(x, pyr.same[3], masks[3], train)
        x = nn.relu(out_s8)

        # ---------------- decoder ----------------
        x = SparseConv(tr[3], 27, name="conv4_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[2], masks[2])
        x = bn("norm4_tr")(x, masks[2], use_running_average=not train)
        x = BasicBlock(tr[3], self.compute_dtype, self.conv_window, blknorm, name="block4_tr")(x, pyr.same[2], masks[2], train)
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s4], axis=-1)
        x = SparseConv(tr[2], 27, name="conv3_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[1], masks[1])
        x = bn("norm3_tr")(x, masks[1], use_running_average=not train)
        x = BasicBlock(tr[2], self.compute_dtype, self.conv_window, blknorm, name="block3_tr")(x, pyr.same[1], masks[1], train)
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s2], axis=-1)
        x = SparseConv(tr[1], 27, name="conv2_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[0], masks[0])
        x = bn("norm2_tr")(x, masks[0], use_running_average=not train)
        x = BasicBlock(tr[1], self.compute_dtype, self.conv_window, blknorm, name="block2_tr")(x, pyr.same[0], masks[0], train)
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s1], axis=-1)
        # kernel-1 convs are plain dense matmuls
        x = nn.relu(nn.Dense(tr[0], use_bias=False, name="conv1_tr")(x))
        x = nn.Dense(self.out_channels, use_bias=True, name="final")(x)

        if self.normalize_feature:
            # eps inside the sqrt: jnp.linalg.norm has a NaN gradient at the
            # all-zero pad rows, which poisons backbone training
            import jax

            x = x * jax.lax.rsqrt(
                jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12
            )
        return jnp.where(masks[0][..., None], x, 0.0)
