"""Sparse convolution = gather -> MXU GEMM -> accumulate, plus masked norm.

The compute core replacing ME's gather-GEMM-scatter kernels
(reference ``src/convolution_kernel.cu:115-290``). On TPU the roles invert:
the *kernel map is already dense* (built by kernel_map.py), so each kernel
offset chunk becomes one big ``(C, chunk*C_in) @ (chunk*C_in, C_out)``
matmul that XLA tiles onto the MXU. A ``lax.scan`` over offset chunks bounds
the gathered-activation working set.

Gradients flow through ``jnp.take`` (scatter-add in the VJP), so the same
code path serves training — no hand-written backward needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "gather_conv",
    "unpack_occupancy",
    "MaskedBatchNorm",
    "MaskedInstanceNorm",
    "SparseConv",
    "OccupancyConv",
]


def unpack_occupancy(words: jnp.ndarray, kernel_volume: int) -> jnp.ndarray:
    """(M, ceil(K/32)) packed uint32 occupancy words -> (M, K) float 0/1.

    Bit j of word w (little-endian within the word) is kernel offset
    32*w + j. Elementwise shifts/ands — VPU work, no gathers.
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(words.shape[0], -1)[:, :kernel_volume].astype(jnp.float32)


def gather_conv(
    feats: jnp.ndarray,
    nbr: jnp.ndarray,
    weights: jnp.ndarray,
    k_chunk: int = 9,
    compute_dtype=None,
) -> jnp.ndarray:
    """out[i] = sum_k feats[nbr[i, k]] @ weights[k], with -1 entries skipped.

    feats:   (N, C_in)   source level features
    nbr:     (M, K)      gather table (-1 = no neighbor)
    weights: (K, C_in, C_out)
    Returns  (M, C_out).
    """
    m, k = nbr.shape
    nbr = nbr.astype(jnp.int32)  # tables may arrive int16 (transfer saving)
    cin = feats.shape[-1]
    cout = weights.shape[-1]
    if weights.shape[0] != k:
        raise ValueError(
            f"kernel volume mismatch: weights {weights.shape[0]} vs map {k}"
        )
    pad = (-k) % k_chunk
    if pad:
        nbr = jnp.pad(nbr, ((0, 0), (0, pad)), constant_values=-1)
        weights = jnp.pad(weights, ((0, pad), (0, 0), (0, 0)))
        k += pad
    nbr_c = nbr.reshape(m, k // k_chunk, k_chunk).transpose(1, 0, 2)
    w_c = weights.reshape(k // k_chunk, k_chunk * cin, cout)
    if compute_dtype is not None:
        # bf16 gather+MXU with f32 accumulation: halves the HBM traffic of
        # the gathered activations (the conv's bottleneck on TPU)
        feats = feats.astype(compute_dtype)
        w_c = w_c.astype(compute_dtype)

    def body(acc, inp):
        nb, w = inp  # (M, k_chunk), (k_chunk*C_in, C_out)
        g = jnp.take(feats, jnp.clip(nb, 0), axis=0)  # (M, k_chunk, C_in)
        g = jnp.where((nb >= 0)[..., None], g, jnp.zeros((), g.dtype))
        acc = acc + jnp.dot(
            g.reshape(m, -1), w, preferred_element_type=jnp.float32
        )
        return acc, None

    init = jnp.zeros((m, cout), dtype=jnp.float32)
    out, _ = jax.lax.scan(body, init, (nbr_c, w_c))
    return out


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid voxel rows only (pad rows excluded from stats).

    Equivalent to ME.MinkowskiBatchNorm (MinkowskiNormalization.py:51) on the
    compacted feature matrix; running stats follow torch's momentum convention
    (new = (1-m)*old + m*batch) with momentum 0.05 as in the FCGF backbone
    instantiation (testset.py:152).
    """

    momentum: float = 0.05
    epsilon: float = 1e-5
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask.astype(x.dtype).reshape(-1)
            xf = x.reshape(-1, c)
            denom = jnp.clip(jnp.sum(w), 1.0)
            mean = jnp.sum(xf * w[:, None], axis=0) / denom
            var = jnp.sum(((xf - mean) ** 2) * w[:, None], axis=0) / denom
            if not self.is_initializing():
                ra_mean.value = (
                    1 - self.momentum
                ) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class MaskedInstanceNorm(nn.Module):
    """Instance norm over a sparse tensor's valid rows, per channel.

    Equivalent of ME.MinkowskiInstanceNorm (reference
    ``backbone/fcgf/common.py:7``): each batch item (here: one cloud per
    forward) is normalized over ALL its voxels per channel — no running
    stats, train == eval. Pad rows are excluded from the statistics and
    zeroed in the output.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool | None = None):
        # signature-compatible with MaskedBatchNorm; IN has no run avg
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        w = mask.astype(x.dtype).reshape(-1)
        xf = x.reshape(-1, c)
        denom = jnp.clip(jnp.sum(w), 1.0)
        mean = jnp.sum(xf * w[:, None], axis=0) / denom
        var = jnp.sum(((xf - mean) ** 2) * w[:, None], axis=0) / denom
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class OccupancyConv(nn.Module):
    """First sparse conv over an all-ones 1-channel input, as one MXU matmul.

    FCGF feeds the backbone a constant 1-vector feature per voxel (reference
    ``backbone/fcgf/misc.py:70``, ``testset.py:154``), so the first conv's
    gather is redundant: out[i] = sum_k occ[i, k] * W[k], i.e. a single
    ``(M, K) @ (K, C_out)`` product of the 0/1 occupancy matrix with the
    flattened kernel. The occupancy rides as packed uint32 words (16x less
    host->device traffic than the (M, K) int16 index table the generic path
    would need for a 7^3 kernel), unpacked on the VPU.

    Exactly equals ``SparseConv(C_out, K)(ones, table, mask)``; the weight
    param keeps the generic ``(K, 1, C_out)`` shape so checkpoints stay
    interchangeable with the gather formulation.
    """

    out_channels: int
    kernel_volume: int
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, occ_words, out_mask):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, 1, self.out_channels),
        )
        occ = unpack_occupancy(occ_words, self.kernel_volume)
        w2 = w.reshape(self.kernel_volume, self.out_channels)
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            occ, w2 = occ.astype(cd), w2.astype(cd)  # 0/1 exact in bf16
        y = jnp.dot(occ, w2, preferred_element_type=jnp.float32)
        return jnp.where(out_mask[..., None], y, 0.0)


class SparseConv(nn.Module):
    """One sparse conv layer over a precomputed gather table.

    ``window`` selects the Pallas windowed-gather kernel
    (:func:`roreg_tpu.sparse.window_conv.window_gather_conv`) — the fast
    inference path, valid when every 128-row output tile's neighbors span
    fewer than ``window`` sorted source rows (callers check via
    ``max_tile_spread``). ``window=None`` (default) is the generic
    XLA gather path, differentiable, used for training.
    """

    out_channels: int
    kernel_volume: int
    use_bias: bool = False
    k_chunk: int = 9
    compute_dtype: str | None = None  # e.g. "bfloat16" for inference
    window: int | None = None

    @nn.compact
    def __call__(self, feats, nbr, out_mask):
        cin = feats.shape[-1]
        # Kaiming-style fan-in init over the whole receptive field, matching
        # ME's kernel init scale.
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.kernel_volume, cin, self.out_channels),
        )
        cd = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if self.window is not None:
            from roreg_tpu.sparse.window_conv import window_gather_conv

            y = window_gather_conv(
                feats, nbr, w, window=self.window, compute_dtype=cd
            )
        else:
            y = gather_conv(feats, nbr, w, self.k_chunk, compute_dtype=cd)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b
        return jnp.where(out_mask[..., None], y, 0.0)
