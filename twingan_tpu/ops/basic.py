"""Elementary pure-function ops for the PGGAN family of models.

All image tensors are NHWC. Every function is dtype-polymorphic and traceable
under jit; randomness is threaded through explicit PRNG keys.

Reference behavior (cited for parity, re-designed for TPU):
- leaky_relu:        /root/reference/util_misc.py:68-86 (alpha=0.2 default).
- pixel_norm:        /root/reference/nets/pggan_utils.py:330-331.
- equalized lr:      /root/reference/nets/pggan_utils.py:236-254 (He-constant
                     runtime input scaling; weights are init N(0,1)).
- minibatch_stddev:  /root/reference/nets/pggan_utils.py:353-366.
- gdrop:             /root/reference/libs/gdrop.py:20-38.
- up/downsample:     /root/reference/nets/pggan_utils.py:349-350 and the
                     tf.nn.avg_pool 2x2 calls in nets/pggan.py:274,306,436.
- num_channels:      /root/reference/nets/pggan_utils.py:369-372.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def leaky_relu(x: jax.Array, alpha: float = 0.2) -> jax.Array:
    """Leaky ReLU, max(alpha*x, x). The default activation of every conv/fc."""
    return jnp.maximum(x * jnp.asarray(alpha, x.dtype), x)


def pixel_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Pixelwise feature-vector normalization over the channel axis (PGGAN)."""
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * lax.rsqrt(ms + jnp.asarray(eps, x.dtype))


def equalized_lr_scale(fan_in: int, kernel_size: int = 1) -> float:
    """He-init constant applied at runtime for equalized learning rate.

    With weights drawn from N(0, 1), multiplying the layer *input* by
    sqrt(2 / (fan_in * k^2)) is equivalent to He-scaled weights while keeping
    per-parameter learning rates uniform.
    """
    return math.sqrt(2.0 / (fan_in * kernel_size * kernel_size))


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample of an NHWC tensor.

    Implemented with reshape+broadcast instead of gather so XLA lowers it to
    a cheap layout change that fuses with the following conv.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool (VALID), NHWC.

    Reshape+mean instead of reduce_window: reverse-differentiable and lowers
    to a pure layout/reduce pair that XLA fuses with neighbors.
    """
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


# The PGGAN MS-SSIM/eval code uses the same 2x2 box filter; alias it.
box_downsample_2x = avg_pool_2x


def minibatch_stddev(
    x: jax.Array, eps: float | None = None, num_groups: int = 1
) -> jax.Array:
    """Concatenate the across-minibatch stddev as one constant feature map.

    Matches the reference: stddev over the batch axis per (h, w, c) location,
    then the mean of those stddevs becomes a single scalar tiled to
    [batch, H, W, 1] and concatenated on channels. The reference tiles to a
    hard-coded 4x4 because it is only used on the 4x4 discriminator block; we
    tile to the actual spatial shape.

    ``num_groups > 1`` splits the batch into contiguous equal groups and
    computes one stddev scalar per group. This exists for the fused
    discriminator step: concatenating the real/prime/cycle sub-batches into
    one forward with groups aligned to the sub-batch boundaries reproduces
    the reference's per-pass stddev exactly (each graph copy in
    /root/reference/twingan.py:367-381 sees only its own batch).
    """
    if eps is None:
        eps = 1e-8 if x.dtype == jnp.float32 else 1e-6
    b, h, w, _ = x.shape
    if num_groups <= 1:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
        std = jnp.sqrt(var + jnp.asarray(eps, x.dtype))
        scalar = jnp.mean(std)
        tiled = jnp.full((b, h, w, 1), scalar, dtype=x.dtype)
        return jnp.concatenate([x, tiled], axis=-1)
    if b % num_groups:
        raise ValueError(f"batch {b} not divisible by num_groups {num_groups}")
    xg = x.reshape(num_groups, b // num_groups, h, w, x.shape[-1])
    mean = jnp.mean(xg, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=1, keepdims=True)
    std = jnp.sqrt(var + jnp.asarray(eps, x.dtype))
    scalar = jnp.mean(std, axis=(1, 2, 3, 4))  # [num_groups]
    tiled = jnp.broadcast_to(
        scalar[:, None, None, None, None], (num_groups, b // num_groups, h, w, 1)
    ).reshape(b, h, w, 1).astype(x.dtype)
    return jnp.concatenate([x, tiled], axis=-1)


def gdrop(
    key: jax.Array, x: jax.Array, strength: jax.Array | float, mode: str = "prop"
) -> jax.Array:
    """Generalized multiplicative noise dropout from PGGAN.

    'prop' mode: x * (1 + strength*sqrt(C)*N(0,1)) with noise broadcast over
    (batch, channel) — one sample per (example, channel) pair.
    """
    if mode != "prop":
        raise ValueError(f"unsupported gdrop mode: {mode}")
    b, _, _, c = x.shape
    coef = jnp.asarray(strength, x.dtype) * jnp.asarray(math.sqrt(c), x.dtype)
    rnd = jax.random.normal(key, (b, 1, 1, c), dtype=x.dtype)
    return x * (rnd * coef + jnp.asarray(1, x.dtype))


def local_response_norm(
    x: jax.Array,
    depth_radius: int = 5,
    bias: float = 1.0,
    alpha: float = 1.0,
    beta: float = 0.5,
) -> jax.Array:
    """tf.nn.lrn semantics over the channel (last) axis of NHWC input:
    out_i = x_i / (bias + alpha * sum_{j in [i-r, i+r]} x_j^2) ** beta
    (reference nets/cifarnet.py:68,71 uses r=4, alpha=0.001/9, beta=0.75)."""
    sq = jnp.square(x)
    padded = jnp.pad(
        sq, [(0, 0)] * (x.ndim - 1) + [(depth_radius, depth_radius)]
    )
    csum = jnp.cumsum(padded, axis=-1)
    csum = jnp.pad(csum, [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    window = 2 * depth_radius + 1
    # windowed sum over channels via cumsum difference
    sums = lax.slice_in_dim(csum, window, csum.shape[-1], axis=-1) - lax.slice_in_dim(
        csum, 0, csum.shape[-1] - window, axis=-1
    )
    return x / jnp.power(bias + alpha * sums, beta)


def blend(new: jax.Array, old: jax.Array, alpha: jax.Array | float) -> jax.Array:
    """Fade-in blend used during PGGAN growth: new*alpha + (1-alpha)*old."""
    alpha = jnp.asarray(alpha, new.dtype)
    return new * alpha + (1 - alpha) * old


def num_channels(stage: int, max_channels: int) -> int:
    """PGGAN channel schedule: min(1024 / 2**stage, max_channels)."""
    return int(min(1024 // (2**stage), max_channels))


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Differentiable bilinear resize of an NHWC tensor."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method="bilinear")
