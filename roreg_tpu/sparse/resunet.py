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

from roreg_tpu.sparse.conv import MaskedBatchNorm, OccupancyConv, SparseConv
from roreg_tpu.sparse.kernel_map import SparsePyramid

__all__ = ["ResUNet", "RESUNET_VARIANTS"]

# name -> (CHANNELS[1:], TR_CHANNELS[1:], block_norm)
RESUNET_VARIANTS = {
    "ResUNetBN2": ([32, 64, 128, 256], [32, 64, 64, 128], "BN"),
    "ResUNetBN2B": ([32, 64, 128, 256], [64, 64, 64, 64], "BN"),
    "ResUNetBN2C": ([32, 64, 128, 256], [64, 64, 64, 128], "BN"),
    "ResUNetBN2D": ([32, 64, 128, 256], [64, 64, 128, 128], "BN"),
    "ResUNetBN2E": ([128, 128, 128, 256], [64, 128, 128, 128], "BN"),
}


class BasicBlock(nn.Module):
    """Pre-norm residual block == BasicBlockBN (residual_block.py:9-61)."""

    channels: int
    compute_dtype: str | None = None
    window: int | None = None

    @nn.compact
    def __call__(self, x, nbr, mask, train: bool):
        y = SparseConv(self.channels, nbr.shape[1], name="conv1",
                       compute_dtype=self.compute_dtype, window=self.window)(x, nbr, mask)
        y = MaskedBatchNorm(name="norm1")(y, mask, use_running_average=not train)
        y = nn.relu(y)
        y = SparseConv(self.channels, nbr.shape[1], name="conv2",
                       compute_dtype=self.compute_dtype, window=self.window)(y, nbr, mask)
        y = MaskedBatchNorm(name="norm2")(y, mask, use_running_average=not train)
        y = nn.relu(y + x)
        return jnp.where(mask[..., None], y, 0.0)


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
        ch, tr, _ = RESUNET_VARIANTS[self.variant]
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
        out_s1 = BasicBlock(ch[0], self.compute_dtype, self.conv_window, name="block1")(x, pyr.same[0], masks[0], train)
        x = nn.relu(out_s1)

        x = SparseConv(ch[1], 27, name="conv2", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[0], masks[1])
        x = bn("norm2")(x, masks[1], use_running_average=not train)
        out_s2 = BasicBlock(ch[1], self.compute_dtype, self.conv_window, name="block2")(x, pyr.same[1], masks[1], train)
        x = nn.relu(out_s2)

        x = SparseConv(ch[2], 27, name="conv3", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[1], masks[2])
        x = bn("norm3")(x, masks[2], use_running_average=not train)
        out_s4 = BasicBlock(ch[2], self.compute_dtype, self.conv_window, name="block3")(x, pyr.same[2], masks[2], train)
        x = nn.relu(out_s4)

        x = SparseConv(ch[3], 27, name="conv4", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.down[2], masks[3])
        x = bn("norm4")(x, masks[3], use_running_average=not train)
        out_s8 = BasicBlock(ch[3], self.compute_dtype, self.conv_window, name="block4")(x, pyr.same[3], masks[3], train)
        x = nn.relu(out_s8)

        # ---------------- decoder ----------------
        x = SparseConv(tr[3], 27, name="conv4_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[2], masks[2])
        x = bn("norm4_tr")(x, masks[2], use_running_average=not train)
        x = BasicBlock(tr[3], self.compute_dtype, self.conv_window, name="block4_tr")(x, pyr.same[2], masks[2], train)
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s4], axis=-1)
        x = SparseConv(tr[2], 27, name="conv3_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[1], masks[1])
        x = bn("norm3_tr")(x, masks[1], use_running_average=not train)
        x = BasicBlock(tr[2], self.compute_dtype, self.conv_window, name="block3_tr")(x, pyr.same[1], masks[1], train)
        x = nn.relu(x)

        x = jnp.concatenate([x, out_s2], axis=-1)
        x = SparseConv(tr[1], 27, name="conv2_tr", compute_dtype=self.compute_dtype, window=self.conv_window)(x, pyr.up[0], masks[0])
        x = bn("norm2_tr")(x, masks[0], use_running_average=not train)
        x = BasicBlock(tr[1], self.compute_dtype, self.conv_window, name="block2_tr")(x, pyr.same[0], masks[0], train)
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
