"""Headline benchmark: 256px human->anime translation throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the north star is >= 5000 imgs/sec on a v4-8 (8 chips) for 256px
inference (BASELINE.md), i.e. 625 imgs/sec/chip; vs_baseline is measured
throughput / 625. The reference itself runs batch-1 sess.run inference
(/root/reference/inference/image_translation_infer.py:92) with no published
throughput number.
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 5000.0 / 8.0  # north-star imgs/sec/chip


def _watchdog(timeout_s: float = 1500.0) -> threading.Timer:
    """Fail fast with a diagnostic line if the TPU claim/compile hangs.

    The axon terminal can wedge (observed: jax.devices() blocking
    indefinitely on the chip claim). A hung bench is worse than a failed
    one for the driver contract, so a daemon timer hard-exits with one
    JSON line after generous compile headroom (~25 min >> the 30-400s
    worst-case tunnel compile)."""

    def fire():
        print(json.dumps({
            "metric": "256px_translate_imgs_per_sec_per_chip",
            "value": 0.0,
            "unit": "imgs/sec/chip",
            "vs_baseline": 0.0,
            "error": f"TPU unreachable: no result within {timeout_s:.0f}s "
                     "(axon terminal claim/compile hang)",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(timeout_s, fire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    watchdog = _watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "1500")))
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.models.pggan import Encoder, Generator

    cfg = PGGANConfig(
        resolution=256,
        max_channels=256,
        norm_type="batch_norm",
        equalized_lr=True,
        do_pixel_norm=True,
        num_domains=2,
        dtype="bfloat16",
    )
    enc, gen = Encoder(cfg), Generator(cfg)
    # Large batch amortizes the ~50ms per-dispatch tunnel latency.
    batch = 256
    images = jnp.asarray(np.random.RandomState(0).rand(batch, 256, 256, 3).astype(np.float32))
    enc_vars = enc.init(jax.random.PRNGKey(0), images[:1], domain=0)
    code, skips = enc.apply(enc_vars, images[:1], domain=0)
    gen_vars = gen.init(jax.random.PRNGKey(1), code, domain=1, unet_skips=skips)

    def translate(enc_vars, gen_vars, images):
        # uint8 staging + on-device dequant: the serving contract's input
        # dtype (reference image_translation_infer.py:61-77 feeds uint8
        # and scales on-graph). Output clipped in bf16 — the serving
        # output is a uint8 image, whose 1/255 quantization dwarfs bf16
        # noise. Both knobs measured one-at-a-time in
        # tools/exp_bench_attack.py (docs/bench_attack_r5.json).
        images = images.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        code, skips = enc.apply(enc_vars, images, domain=0)
        out, _ = gen.apply(gen_vars, code, domain=1, unet_skips=skips)
        return jnp.clip(out, 0.0, 1.0)

    # Measurement protocol: distinct input per translate, and a real host
    # fetch (scalar sum) per timed dispatch. On the axon backend
    # block_until_ready alone is a no-op until the first host fetch (lazy
    # dispatch batching), which over-reports throughput by ~300x. The ~50ms
    # per-dispatch tunnel round trip is amortized by scanning `chunk`
    # distinct batches inside ONE dispatch (each scan step really
    # computes: every batch is distinct and every output feeds the fetched
    # sum). chunk 4 -> 16 measured +9.4% (the round trip was ~15% of a
    # 0.29s dispatch); uint8 staging is what makes 16 x 256 x 256px fit.
    chunk = 16

    @jax.jit
    def translate_chunk(enc_vars, gen_vars, stacked):
        def body(acc, im):
            out = translate(enc_vars, gen_vars, im)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return total

    iters = 6
    inputs = [
        jnp.asarray(
            np.random.RandomState(i + 1)
            .randint(0, 256, size=(chunk, batch, 256, 256, 3))
            .astype(np.uint8)
        )
        for i in range(iters)
    ]
    float(translate_chunk(enc_vars, gen_vars, inputs[0]))  # compile + flush
    times = []
    for im in inputs:
        t0 = time.perf_counter()
        float(translate_chunk(enc_vars, gen_vars, im))
        times.append(time.perf_counter() - t0)
    imgs_per_sec = chunk * batch / float(np.median(times))

    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "256px_translate_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
