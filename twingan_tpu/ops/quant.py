"""W8A8 int8 convolution primitives for the inference/serving path.

The 256px translate benchmark is HBM-bandwidth-bound (76 FLOP/byte vs the
v5e's ~240 machine balance, docs/PERFORMANCE.md): every large activation
crossing HBM in bf16 costs 2 bytes/element. Quantizing the conv data path
to int8 halves that, and the v5e MXU's int8 throughput is ~2x its bf16
peak (394 vs 197 TOPS) — both roofline bounds halve, so the model's
speed-of-light roughly doubles.

Design choices, deliberately TPU-first:

- STATIC per-tensor activation scales, calibrated offline (models/layers
  EqConv ``quantize='calib'`` records running abs-max into the ``quant``
  flax collection). A dynamic (per-batch) scale depends on the WHOLE
  producer tensor, so the int8 cast cannot fuse into the producer's
  epilogue — the tensor crosses HBM once in bf16 for the abs-max, again
  for the quantize: a net bandwidth LOSS. With a static scale the entire
  dequant -> bias -> norm-affine -> leaky -> quantize chain is elementwise
  with constant coefficients and XLA fuses it into one epilogue; each
  large tensor crosses HBM exactly once, in int8.
- Per-OUTPUT-CHANNEL weight scales, computed from the fp32 master weights
  at trace time (weights are tiny next to activations; the per-channel
  dequant is a [F]-broadcast multiply fused into the same epilogue).
- int32 accumulation via ``preferred_element_type`` (exact: a 3x3x512
  int8 MAC chain peaks at ~7.4e7, far inside int32).
- The fused nearest-up2+conv path quantizes the PRE-upsample tensor and
  runs the same input-dilated int8 conv (ops/fused_scale.py 'dilated'
  algebra is dtype-agnostic), so quantization makes the fused path
  cheaper still.

No reference counterpart (the reference serves fp32 TF frozen graphs,
/root/reference/inference/image_translation_infer.py); this is a
TPU-serving feature beyond parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Symmetric int8: representable range [-127, 127] (keep -128 unused so the
# scale math is symmetric).
QMAX = 127.0


def act_scale(a_max: jax.Array) -> jax.Array:
    """Calibrated abs-max -> multiplicative scale (fp32 scalar)."""
    return jnp.maximum(a_max.astype(jnp.float32), 1e-8) / QMAX


def quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    """fp/bf16 tensor -> int8 with a static scale. Pure elementwise with
    constant coefficients: fuses into the producer epilogue."""
    q = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(q, -QMAX, QMAX).astype(jnp.int8)


def weight_quant(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp32 [..., O] kernel -> (int8 kernel, fp32 per-out-channel scale)."""
    a_max = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    s = jnp.maximum(a_max, 1e-8) / QMAX
    wq = jnp.clip(jnp.round(w / s), -QMAX, QMAX).astype(jnp.int8)
    return wq, s


def conv_i8(
    xq: jax.Array,
    wq: jax.Array,
    strides: tuple[int, int] = (1, 1),
    padding="SAME",
    lhs_dilation: tuple[int, int] | None = None,
) -> jax.Array:
    """int8 x int8 -> int32 NHWC conv on the MXU."""
    return lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
