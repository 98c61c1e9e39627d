"""MFU / roofline accounting for the headline 256px translate benchmark.

Computes the model FLOPs per image from XLA's compiled cost analysis
(fallback: analytic conv-FLOP count over the PGGAN config), measures
throughput with the bench protocol, and reports achieved TFLOP/s against
the chip's bf16 peak (TPU v5e: 197 TFLOP/s).

    python tools/mfu.py [--batch 256] [--train]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_BF16 = 197e12


def conv_flops_analytic(cfg) -> float:
    """2*H*W*k^2*Cin*Cout per conv, summed over encoder+generator stages
    (the two 3x3 convs per block dominate; from_rgb/to_rgb 1x1 included)."""
    total = 0.0
    res = cfg.resolution
    max_stage = cfg.max_stage

    def conv(h, k, cin, cout):
        return 2.0 * h * h * k * k * cin * cout

    # Encoder: from_rgb at res, then per stage two 3x3 convs + halve.
    total += conv(res, 1, cfg.image_channels, cfg.channels(max_stage))
    h = res
    for stage in range(max_stage, 0, -1):
        cin = cfg.channels(stage)
        cout = cfg.channels(stage - 1)
        total += conv(h, 3, cin, cin) + conv(h, 3, cin, cout)
        h //= 2
    # Generator: mirrored upward + UNet concat doubling conv0 input.
    h = 4
    total += conv(4, 4, cfg.noise_dim, cfg.channels(0)) + conv(4, 3, cfg.channels(0), cfg.channels(0))
    for stage in range(1, max_stage + 1):
        h *= 2
        cin = cfg.channels(stage - 1) * 2  # UNet skip concat
        cout = cfg.channels(stage)
        total += conv(h, 3, cin, cout) + conv(h, 3, cout, cout)
    total += conv(res, 1, cfg.channels(max_stage), cfg.image_channels)
    return total


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.models.pggan import Encoder, Generator

    cfg = PGGANConfig(
        resolution=256, max_channels=256, norm_type="batch_norm",
        equalized_lr=True, do_pixel_norm=True, num_domains=2, dtype="bfloat16",
    )
    enc, gen = Encoder(cfg), Generator(cfg)
    batch = args.batch
    images = jnp.asarray(np.random.RandomState(0).rand(batch, 256, 256, 3).astype(np.float32))
    enc_vars = enc.init(jax.random.PRNGKey(0), images[:1], domain=0)
    code, skips = enc.apply(enc_vars, images[:1], domain=0)
    gen_vars = gen.init(jax.random.PRNGKey(1), code, domain=1, unet_skips=skips)

    def translate(enc_vars, gen_vars, images):
        code, skips = enc.apply(enc_vars, images, domain=0)
        out, _ = gen.apply(gen_vars, code, domain=1, unet_skips=skips)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    lowered = jax.jit(translate).lower(enc_vars, gen_vars, images)
    compiled = lowered.compile()
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable ({e}); using analytic count", file=sys.stderr)
    analytic = conv_flops_analytic(cfg) * batch
    if flops is None:
        flops = analytic
    flops_per_img = flops / batch

    # Bench protocol (see bench.py / CLAUDE.md): distinct inputs, scalar
    # fetch per iteration.
    fn = jax.jit(translate)
    inputs = [
        jnp.asarray(np.random.RandomState(i + 1).rand(batch, 256, 256, 3).astype(np.float32))
        for i in range(args.iters)
    ]
    float(jnp.sum(fn(enc_vars, gen_vars, inputs[0])))
    times = []
    for im in inputs:
        t0 = time.perf_counter()
        float(jnp.sum(fn(enc_vars, gen_vars, im)))
        times.append(time.perf_counter() - t0)
    imgs_per_sec = batch / float(np.median(times))
    achieved = imgs_per_sec * flops_per_img

    print(json.dumps({
        "flops_per_img_xla": round(flops_per_img / 1e9, 3),
        "flops_per_img_analytic_conv": round(analytic / batch / 1e9, 3),
        "unit_flops": "GFLOP/img",
        "imgs_per_sec": round(imgs_per_sec, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "peak_bf16_tflops": V5E_PEAK_BF16 / 1e12,
        "mfu": round(achieved / V5E_PEAK_BF16, 4),
    }))


if __name__ == "__main__":
    main()
