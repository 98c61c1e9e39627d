"""Fused nearest-2x-upsample + 3x3 conv (PGGAN "fused scale", TPU form).

Every generator stage above 4x4 in the reference runs
``conv3x3(nearest_up2(x))`` (/root/reference/nets/pggan.py:69-83 via
pggan_utils.upsample :349-350). Materializing the 2x tensor costs an extra
HBM write+read of the largest activation in the block — significant because
the top-resolution blocks are bandwidth-bound (docs/PERFORMANCE.md roofline
section). Both fused forms below compute the IDENTICAL function without
materializing the upsampled tensor:

- ``dilated``: nearest_up2 is a convolution of the zero-stuffed (stride-2
  scattered) input with ones(2,2), so by associativity of convolution
  ``conv3x3 o nearest_up2 == conv4x4(lhs_dilation=2)`` with the 3x3 kernel
  pre-convolved with ones(2,2). This is the classic PGGAN fused upscale
  expressed as one XLA input-dilated conv.
- ``parity``: each output-pixel parity (a, b) in {0,1}^2 reads a fixed 2x2
  window of x with a collapsed 2x2 kernel; one conv producing 4*F channels
  followed by a space interleave. 2.25x fewer MACs than the unfused form.

Exactness (same zero-padding semantics as SAME conv on the upsampled
tensor) is asserted by tests/test_fused_scale.py for values and gradients.
Which form is faster is hardware-dependent; tools/exp_fused_upscale.py
measures on the real chip and models/config.PGGANConfig.fused_scale gates
use in the generator (checkpoint-compatible: the stored 3x3 kernel is
unchanged, only the compute is rewritten).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from twingan_tpu.ops.basic import upsample_nearest_2x

_DN = ("NHWC", "HWIO", "NHWC")

IMPLS = ("reference", "dilated", "parity")


def up2_conv_kernel(w: jax.Array) -> jax.Array:
    """[3,3,I,O] kernel -> [4,4,I,O] kernel V = W (*) ones(2,2).

    V is the kernel of the input-dilated conv equivalent to
    conv3x3(nearest_up2(x)): nearest upsample equals convolving the
    zero-stuffed input with ones(2,2), and convolution is associative.
    """
    assert w.shape[:2] == (3, 3), w.shape
    v = jnp.zeros((4, 4) + w.shape[2:], w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            v = v.at[a : a + 3, b : b + 3].add(w)
    return v


def _parity_kernel(w: jax.Array) -> jax.Array:
    """[3,3,I,O] -> [2,2,I,4O]: collapsed kernels for output parities
    (a, b) in row-major order ((0,0),(0,1),(1,0),(1,1)).

    Output row 2i+a of conv3x3(up2(x)) reads x rows floor((a+u-1)/2)+i for
    kernel row u: parity a=0 reads rows (i-1, i) with weights
    (W[0], W[1]+W[2]); a=1 reads (i, i+1) with (W[0]+W[1], W[2]); columns
    collapse identically.
    """
    assert w.shape[:2] == (3, 3), w.shape
    rows = {
        0: jnp.stack([w[0], w[1] + w[2]]),          # x-row offsets (-1, 0)
        1: jnp.stack([w[0] + w[1], w[2]]),          # x-row offsets (0, +1)
    }
    parts = []
    for a in (0, 1):
        r = rows[a]                                  # [2, 3, I, O]
        for b in (0, 1):
            if b == 0:
                k = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
            else:
                k = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
            parts.append(k)                          # [2, 2, I, O]
    return jnp.concatenate(parts, axis=-1)           # [2, 2, I, 4O]


def up2_conv(x: jax.Array, w: jax.Array, impl: str = "dilated") -> jax.Array:
    """conv3x3-SAME(nearest_up2(x), w) without materializing the 2x tensor.

    x: [B, H, W, I] NHWC; w: [3, 3, I, O]. Returns [B, 2H, 2W, O].
    impl: 'reference' (unfused, the definition), 'dilated', or 'parity' —
    all bit-identical in exact arithmetic.
    """
    if impl == "reference":
        return lax.conv_general_dilated(
            upsample_nearest_2x(x), w, (1, 1), "SAME", dimension_numbers=_DN
        )
    if impl == "dilated":
        # Zero-stuffed x has extent 2H-1; output m taps stuffed indices
        # m-2 .. m+1 (y[m] = sum_u V[u] z[m+u-2]), so pad (2, 2) per
        # spatial dim for 2H outputs.
        return lax.conv_general_dilated(
            x,
            up2_conv_kernel(w),
            (1, 1),
            ((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=_DN,
        )
    if impl == "parity":
        b_, h, w_, _ = x.shape
        o = w.shape[-1]
        # One 2x2 conv with pad 1: out[t] covers x rows (t-1, t), so parity
        # a slices rows [a : a+H] (a=0 reads (i-1, i); a=1 reads (i, i+1)).
        full = lax.conv_general_dilated(
            x, _parity_kernel(w), (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN
        )  # [B, H+1, W+1, 4O]
        y00 = full[:, :h, :w_, 0 * o : 1 * o]
        y01 = full[:, :h, 1:, 1 * o : 2 * o]
        y10 = full[:, 1:, :w_, 2 * o : 3 * o]
        y11 = full[:, 1:, 1:, 3 * o : 4 * o]
        y = jnp.stack([y00, y01, y10, y11], axis=3)   # [B, H, W, 4, O]
        y = y.reshape(b_, h, w_, 2, 2, o)
        y = y.transpose(0, 1, 3, 2, 4, 5)             # [B, H, 2, W, 2, O]
        return y.reshape(b_, 2 * h, 2 * w_, o)
    raise ValueError(f"unknown up2_conv impl {impl!r}; one of {IMPLS}")
