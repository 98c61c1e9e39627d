"""Perf experiments for the low-channel top-resolution convs (VERDICT item 8).

The 256px generator/encoder blocks run 3x3 convs with 16 channels — an MXU
lane utilization of 16/128. Two candidate fixes, measured against the XLA
baseline (conv + bias + leaky-relu + pixel-norm, which XLA fuses into the
conv epilogue on its own):

1. ``pallas``: a fused direct-conv kernel (9 shifted [HW,Cin]x[Cin,Cout]
   matmuls accumulated in VMEM, epilogue fused in-register).
2. ``padded``: zero-pad the channel dim to 64/128 so the MXU tiles fill,
   then slice back — 8x the FLOPs for (possibly) the same wall time.

Results are recorded in docs/PERFORMANCE.md; negative results count.

    python tools/exp_fused_conv.py [--batch 8] [--hw 256] [--ch 16]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

OFFSETS = [(dy, dx) for dy in range(3) for dx in range(3)]


def epilogue(y, bias):
    y = y + bias
    y = jnp.maximum(0.2 * y, y)
    ms = jnp.mean(jnp.square(y), axis=-1, keepdims=True)
    return y * lax.rsqrt(ms + 1e-6)


def xla_block(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return epilogue(y, b).astype(x.dtype)


def xla_padded_block(x, w, b, pad_to: int):
    cin, cout = w.shape[2], w.shape[3]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - cin)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad_to - cin), (0, pad_to - cout)))
    bp = jnp.pad(b, (0, pad_to - cout))
    y = lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # Zero output channels corrupt pixel-norm's channel mean — slice first.
    y = y[..., :cout]
    return epilogue(y, b).astype(x.dtype)


ROW_TILE = 8  # rows per program; acc = (8*W, Cout) f32 stays in VMEM


def _fused_kernel(x_ref, w_ref, b_ref, o_ref):
    """One (image, row-tile) per program. x is a halo-duplicated tile
    [1, T+2, W+2, Cin] bf16; w is [9, Cin, Cout] f32; accumulate f32."""
    h, w_dim = o_ref.shape[1], o_ref.shape[2]
    cin = x_ref.shape[3]
    cout = o_ref.shape[3]
    x = x_ref[0]
    acc = jnp.zeros((h * w_dim, cout), jnp.float32)
    for i, (dy, dx) in enumerate(OFFSETS):
        patch = x[dy : dy + h, dx : dx + w_dim, :].reshape(h * w_dim, cin)
        acc += jnp.dot(patch.astype(jnp.float32), w_ref[i],
                       preferred_element_type=jnp.float32)
    y = epilogue(acc, b_ref[:])
    o_ref[0] = y.reshape(h, w_dim, cout).astype(o_ref.dtype)


def pallas_block(x, w, b):
    bsz, h, wd, cin = x.shape
    cout = w.shape[3]
    t = min(ROW_TILE, h)
    n_tiles = h // t
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
    # Halo-duplicated row tiles: [B*T_n, t+2, W+2, Cin]. BlockSpec windows
    # cannot overlap, so the 1-row halos are materialized host-side (an
    # HBM gather XLA fuses into the pad).
    tiles = jnp.stack(
        [xp[:, i * t : i * t + t + 2] for i in range(n_tiles)], axis=1
    ).reshape(bsz * n_tiles, t + 2, wd + 2, cin)
    w9 = w.reshape(9, cin, cout).astype(jnp.float32)
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz * n_tiles, t, wd, cout), x.dtype),
        grid=(bsz * n_tiles,),
        in_specs=[
            pl.BlockSpec((1, t + 2, wd + 2, cin), lambda bi: (bi, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi: (0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi: (0,)),
        ],
        out_specs=pl.BlockSpec((1, t, wd, cout), lambda bi: (bi, 0, 0, 0)),
        interpret=jax.default_backend() != "tpu",
    )(tiles, w9, b)
    return out.reshape(bsz, h, wd, cout)


SCAN_REPS = 50  # apply the block 50x inside one jit so the ~50ms tunnel
                # dispatch latency doesn't mask sub-ms kernel differences


def bench(fn, args, iters=8):
    x, w, b = args

    def scanned(x, w, b):
        def body(y, _):
            return fn(y, w, b), None
        y, _ = lax.scan(body, x, None, length=SCAN_REPS)
        return y

    sfn = jax.jit(scanned)
    float(jnp.sum(sfn(x, w, b)))  # compile + flush
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(sfn(x, w, b)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / SCAN_REPS


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--ch", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args(argv)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.hw, args.hw, args.ch).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, args.ch, args.ch).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(args.ch).astype(np.float32) * 0.1)

    variants = {
        "xla": jax.jit(xla_block),
        "pallas_fused": jax.jit(pallas_block),
        "xla_padded_64": jax.jit(functools.partial(xla_padded_block, pad_to=64)),
        "xla_padded_128": jax.jit(functools.partial(xla_padded_block, pad_to=128)),
    }
    ref = np.asarray(variants["xla"](x, w, b).astype(jnp.float32))
    results = {}
    for name, fn in variants.items():
        out = np.asarray(fn(x, w, b).astype(jnp.float32))
        err = float(np.max(np.abs(out - ref)))
        t = bench(fn, (x, w, b), args.iters)
        results[name] = {"ms": round(t * 1e3, 3), "max_abs_err_vs_xla": round(err, 5)}
        print(name, results[name])
    print(json.dumps({"batch": args.batch, "hw": args.hw, "ch": args.ch, **results}))


if __name__ == "__main__":
    main()
