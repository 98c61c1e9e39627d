"""Measure fused nearest-up2+conv (ops/fused_scale.py) on the real chip.

Two measurements, all on the headline 256px translate path (the same
model/protocol as bench.py):

1. end-to-end: imgs/sec with fused_scale off / dilated / parity;
2. microbench: one upsample+conv0 block at 256px (the top-resolution,
   bandwidth-bound block the roofline section of docs/PERFORMANCE.md
   identifies) for each impl.

Positive or negative, the result goes in docs/PERFORMANCE.md; the
production default (PGGANConfig.fused_scale) follows the measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _median_time(fn, inputs):
    times = []
    for x in inputs:
        t0 = time.perf_counter()
        float(fn(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def end_to_end(batch, chunk, iters):
    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.models.pggan import Encoder, Generator

    base = dict(
        resolution=256, max_channels=256, norm_type="batch_norm",
        equalized_lr=True, do_pixel_norm=True, num_domains=2, dtype="bfloat16",
    )
    plain = PGGANConfig(**base)
    enc = Encoder(plain)
    images1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    enc_vars = enc.init(jax.random.PRNGKey(0), images1, domain=0)
    code, skips = enc.apply(enc_vars, images1, domain=0)
    gen_vars = Generator(plain).init(
        jax.random.PRNGKey(1), code, domain=1, unet_skips=skips
    )

    inputs = [
        jnp.asarray(
            np.random.RandomState(i + 1).rand(chunk, batch, 256, 256, 3).astype(np.float32)
        )
        for i in range(iters)
    ]
    results = {}
    for variant in ("off", "dilated", "parity"):
        cfg = plain if variant == "off" else PGGANConfig(
            fused_scale=True, fused_scale_impl=variant, **base
        )
        gen = Generator(cfg)

        @jax.jit
        def translate_chunk(enc_vars, gen_vars, stacked, _gen=gen):
            def body(acc, im):
                code, skips = enc.apply(enc_vars, im, domain=0)
                out, _ = _gen.apply(gen_vars, code, domain=1, unet_skips=skips)
                return acc + jnp.sum(jnp.clip(out.astype(jnp.float32), 0, 1)), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
            return total

        fn = lambda x: translate_chunk(enc_vars, gen_vars, x)
        float(fn(inputs[0]))  # compile + flush
        t = _median_time(fn, inputs)
        results[variant] = round(chunk * batch / t, 1)
        print(f"[e2e] fused_scale={variant}: {results[variant]} imgs/sec", flush=True)
    return results


def microbench(batch, reps, iters):
    """One generator top block: up2(128px,32ch) + conv3x3->16ch at 256px."""
    import jax
    import jax.numpy as jnp

    from twingan_tpu.ops import fused_scale
    from twingan_tpu.ops.basic import leaky_relu

    ci, co, h = 32, 16, 128
    k = jnp.asarray(np.random.RandomState(0).randn(3, 3, ci, co), jnp.bfloat16)
    results = {}
    for impl in ("reference", "dilated", "parity"):

        @jax.jit
        def block(stacked, _impl=impl):
            def body(acc, x):
                y = leaky_relu(fused_scale.up2_conv(x, k, _impl))
                return acc + jnp.sum(y.astype(jnp.float32)), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
            return total

        inputs = [
            jnp.asarray(
                np.random.RandomState(i).randn(reps, batch, h, h, ci).astype(np.float32)
            ).astype(jnp.bfloat16)
            for i in range(iters)
        ]
        float(block(inputs[0]))
        t = _median_time(block, inputs)
        results[impl] = round(t / reps * 1e3, 3)
        print(f"[micro] {impl}: {results[impl]} ms/apply", flush=True)
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--micro_batch", type=int, default=8)
    p.add_argument("--micro_reps", type=int, default=50)
    p.add_argument("--skip_micro", action="store_true")
    args = p.parse_args(argv)

    out = {"e2e_imgs_per_sec": end_to_end(args.batch, args.chunk, args.iters)}
    if not args.skip_micro:
        out["micro_ms_per_apply"] = microbench(
            args.micro_batch, args.micro_reps, args.iters
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
