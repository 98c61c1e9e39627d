"""Bench roofline-attack experiments (VERDICT r4 item 8).

The headline 256px translate bench has sat at ~3600 imgs/s/chip (65% of
its 819 GB/s HBM roofline bound, docs/PERFORMANCE.md) for three rounds.
This script measures the candidate attacks one knob at a time, each as
one JSON line; winners graduate into bench.py.

Hypotheses, in expected-impact order:

1. Dispatch amortization: at 3600 imgs/s a chunk-4 x batch-256 dispatch
   is ~285 ms of device work, and the measurement protocol pays one
   ~50 ms tunnel round trip (scalar fetch) per dispatch — up to ~15% of
   wall time that is NOT device time. Larger scan chunks divide it away.
2. uint8 input staging + on-device dequant: the serving contract's input
   dtype (reference inference/image_translation_infer.py:61-77 feeds
   uint8 and scales on-graph), 4x less HBM for staged inputs — which is
   what makes chunk 16+ fit alongside params/activations.
3. bf16 output (skip the fp32 cast before clip): halves the final
   image-tensor write+read.
4. Batch shape: {128, 256, 512} x chunk at constant imgs/dispatch.

Run on the real chip:  python tools/exp_bench_attack.py [--variants ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PER_CHIP_TARGET = 5000.0 / 8.0


def build_translate(enc, gen, out_dtype):
    import jax
    import jax.numpy as jnp

    def translate(enc_vars, gen_vars, images):
        # uint8 staging: dequant on device, fused by XLA into the stem.
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        code, skips = enc.apply(enc_vars, images, domain=0)
        out, _ = gen.apply(gen_vars, code, domain=1, unet_skips=skips)
        if out_dtype == "float32":
            out = out.astype(jnp.float32)
        return jnp.clip(out, 0.0, 1.0)

    return translate


def run_variant(name: str, *, chunk: int, batch: int, stage_uint8: bool,
                out_dtype: str, int8: bool = False, iters: int = 5,
                hw: int = 256) -> dict:
    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.models.pggan import Encoder, Generator

    cfg = PGGANConfig(
        resolution=hw, max_channels=256, norm_type="batch_norm",
        equalized_lr=True, do_pixel_norm=True, num_domains=2,
        dtype="bfloat16",
        quantized_inference="calib" if int8 else "",
    )
    enc, gen = Encoder(cfg), Generator(cfg)
    probe = jnp.zeros((1, hw, hw, 3), jnp.float32)
    enc_vars = enc.init(jax.random.PRNGKey(0), probe, domain=0)
    code, skips = enc.apply(enc_vars, probe, domain=0)
    gen_vars = gen.init(jax.random.PRNGKey(1), code, domain=1, unet_skips=skips)
    if int8:
        # Calibrate the activation scales on a few batches, then swap to
        # the int8 modules (W8A8, ops/quant.py).
        @jax.jit
        def calib(ev, gv, im):
            (code, skips), eu = enc.apply(ev, im, domain=0, mutable=["quant"])
            _, gu = gen.apply(gv, code, domain=1, unet_skips=skips,
                              mutable=["quant"])
            return eu["quant"], gu["quant"]

        for i in range(2):
            im = jnp.asarray(
                np.random.RandomState(100 + i).rand(min(32, batch), hw, hw, 3)
                .astype(np.float32))
            eq, gq = calib(enc_vars, gen_vars, im)
            enc_vars = {**enc_vars, "quant": eq}
            gen_vars = {**gen_vars, "quant": gq}
        cfg8 = cfg.replace(quantized_inference="int8")
        enc, gen = Encoder(cfg8), Generator(cfg8)
    translate = build_translate(enc, gen, out_dtype)

    @jax.jit
    def translate_chunk(enc_vars, gen_vars, stacked):
        def body(acc, im):
            out = translate(enc_vars, gen_vars, im)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return total

    # Distinct input per timed dispatch + a real scalar fetch per dispatch
    # (axon block_until_ready is a no-op until the first host fetch).
    def make(i):
        r = np.random.RandomState(i + 1)
        if stage_uint8:
            a = r.randint(0, 256, size=(chunk, batch, hw, hw, 3)).astype(np.uint8)
        else:
            a = r.rand(chunk, batch, hw, hw, 3).astype(np.float32)
        return jnp.asarray(a)

    inputs = [make(i) for i in range(iters)]
    t0 = time.perf_counter()
    float(translate_chunk(enc_vars, gen_vars, inputs[0]))  # compile + flush
    compile_s = time.perf_counter() - t0
    times = []
    for im in inputs:
        t0 = time.perf_counter()
        float(translate_chunk(enc_vars, gen_vars, im))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    r = {
        "variant": name, "chunk": chunk, "batch": batch,
        "stage_uint8": stage_uint8, "out_dtype": out_dtype, "int8": int8,
        "imgs_per_sec": round(chunk * batch / med, 2),
        "vs_baseline": round(chunk * batch / med / PER_CHIP_TARGET, 3),
        "median_dispatch_s": round(med, 4),
        "all_s": [round(t, 4) for t in times],
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(r), flush=True)
    return r


VARIANTS = {
    # name: (chunk, batch, stage_uint8, out_dtype, int8)
    "base": (4, 256, False, "float32", False),
    "chunk16_u8": (16, 256, True, "float32", False),
    "chunk16_u8_bf16out": (16, 256, True, "bfloat16", False),
    "chunk8_b512_u8": (8, 512, True, "bfloat16", False),
    "chunk32_b128_u8": (32, 128, True, "bfloat16", False),
    "chunk32_b256_u8": (32, 256, True, "bfloat16", False),
    # W8A8 quantized serving path (ops/quant.py): halves both roofline
    # bounds; quality delta measured separately by tools/quant_quality.py.
    "int8_chunk16_u8": (16, 256, True, "bfloat16", True),
    "int8_chunk8_b512_u8": (8, 512, True, "bfloat16", True),
    "int8_base_shape": (4, 256, True, "bfloat16", True),
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", default="",
                   help="comma list (default: all, in table order)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--hw", type=int, default=256,
                   help="image size (small for CPU smoke)")
    p.add_argument("--platform", default="",
                   help="force a jax platform (cpu smoke; JAX_PLATFORMS env "
                   "alone is ignored under axon)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    names = [v for v in args.variants.split(",") if v] or list(VARIANTS)
    rows = []
    for n in names:
        chunk, batch, u8, od, int8 = VARIANTS[n]
        rows.append(run_variant(n, chunk=chunk, batch=batch, stage_uint8=u8,
                                out_dtype=od, int8=int8, iters=args.iters, hw=args.hw))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print("written:", args.out)


if __name__ == "__main__":
    main()
