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
V5E_HBM_BW = 819e9  # bytes/sec
# Machine balance: ops/byte needed to be MXU-bound rather than HBM-bound.
V5E_BALANCE = V5E_PEAK_BF16 / V5E_HBM_BW  # ~240 FLOP/byte


def cost_entry(compiled):
    """XLA cost analysis dict for a compiled computation (or None)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return dict(ca)
    except Exception as e:
        print(f"cost_analysis unavailable ({e})", file=sys.stderr)
        return None


def roofline_fields(flops: float, bytes_accessed: float, dt: float) -> dict:
    """Achieved vs both rooflines. `bytes accessed` counts every operand +
    output of every HLO op post-fusion — an upper bound on true HBM traffic
    (it includes reads that hit in VMEM), so pct_hbm_roofline is
    conservative-high on arithmetic ops and ~exact on the bandwidth-bound
    ones that matter here."""
    intensity = flops / bytes_accessed
    achieved_bw = bytes_accessed / dt
    achieved_flops = flops / dt
    # Roofline-predicted time: max of the two resource lower bounds.
    t_bound = max(flops / V5E_PEAK_BF16, bytes_accessed / V5E_HBM_BW)
    return {
        "bytes_accessed_gb": round(bytes_accessed / 1e9, 3),
        "operational_intensity_flop_per_byte": round(intensity, 1),
        "machine_balance_flop_per_byte": round(V5E_BALANCE, 1),
        "achieved_hbm_gbps": round(achieved_bw / 1e9, 1),
        "peak_hbm_gbps": round(V5E_HBM_BW / 1e9, 1),
        "pct_hbm_roofline": round(achieved_bw / V5E_HBM_BW, 4),
        "mfu": round(achieved_flops / V5E_PEAK_BF16, 4),
        "pct_of_roofline_bound": round(t_bound / dt, 4),
        "bound_by": "mxu" if intensity > V5E_BALANCE else "hbm",
    }


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


def train_mfu(iters: int, batch: int = 3) -> None:
    """MFU for the TwinGAN 256px training round (default batch 3 = the
    reference schedule, DRAGAN + UNet — the docs/PERFORMANCE.md headline
    train config; --train_batch overrides). FLOPs
    come from XLA's compiled cost analysis of scan_rounds (fwd + bwd + both
    optimizers), throughput from the bench protocol."""
    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    res, n_rounds = 256, 10
    cfg = TwinGANConfig(
        model=PGGANConfig(resolution=res, max_channels=256, num_domains=2,
                          equalized_lr=True, norm_type="batch_norm", dtype="bfloat16"),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
        use_unet=True,
    )
    trainer = TwinGANTrainer(cfg)
    rng = np.random.RandomState(0)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def stacked(seed):
        r = np.random.RandomState(seed)
        return {
            k: jnp.asarray(
                r.rand(n_rounds, cfg.n_critic, batch, res, res, 3).astype(np.float32))
            for k in ("source", "target")
        }

    fn = type(trainer).scan_rounds.__wrapped__  # the unjitted method
    lowered = jax.jit(fn, static_argnums=0, donate_argnums=1).lower(
        trainer, state, stacked(0), jax.random.PRNGKey(1))
    ca = cost_entry(lowered.compile())
    flops = float(ca.get("flops", 0.0)) or None if ca else None
    bytes_accessed = float(ca.get("bytes accessed", 0.0)) or None if ca else None

    n_steps = n_rounds * cfg.n_critic
    # Pre-stage all inputs on device OUTSIDE the timed region (the ~50 MB/s
    # tunnel would otherwise dominate the measurement).
    inputs = [stacked(2 + i) for i in range(iters)]
    state, m = trainer.scan_rounds(state, stacked(1), jax.random.PRNGKey(1))
    float(m["generator_loss"][-1])  # compile + flush (also flushes transfers)
    for inp in inputs:
        float(jnp.sum(inp["source"][0, 0]))
    times = []
    for inp in inputs:
        t0 = time.perf_counter()
        state, m = trainer.scan_rounds(state, inp, jax.random.PRNGKey(1))
        float(m["generator_loss"][-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    steps_per_sec = n_steps / dt
    out = {
        "config": f"twingan_{res}px_b{batch}_dragan_unet",
        "steps_per_sec": round(steps_per_sec, 2),
        "imgs_per_sec": round(steps_per_sec * batch, 1),
    }
    if flops:
        achieved = flops / dt
        out.update({
            "flops_per_step": round(flops / n_steps / 1e9, 2),
            "unit_flops": "GFLOP/step",
            "achieved_tflops": round(achieved / 1e12, 2),
            "peak_bf16_tflops": V5E_PEAK_BF16 / 1e12,
            "mfu": round(achieved / V5E_PEAK_BF16, 4),
        })
        if bytes_accessed:
            out.update(roofline_fields(flops, bytes_accessed, dt))
    print(json.dumps(out))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256,
                   help="inference batch (ignored with --train)")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--train", action="store_true",
                   help="measure the TwinGAN 256px training round instead")
    p.add_argument("--train_batch", type=int, default=3,
                   help="training batch for --train (3 = the reference "
                   "schedule; >8 OOMs one chip with DRAGAN at 256px)")
    args = p.parse_args(argv)

    if args.train:
        train_mfu(args.iters, batch=args.train_batch)
        return

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
    ca = cost_entry(compiled)
    flops = float(ca.get("flops", 0.0)) or None if ca else None
    bytes_accessed = float(ca.get("bytes accessed", 0.0)) or None if ca else None
    analytic = conv_flops_analytic(cfg) * batch
    if flops is None:
        flops = analytic
    flops_per_img = flops / batch

    # Bench protocol (see bench.py / CLAUDE.md): distinct inputs, scalar
    # fetch per timed dispatch; a scan over `chunk` distinct batches inside
    # one dispatch amortizes the ~50ms tunnel latency so the number reflects
    # device throughput, matching bench.py.
    chunk = 4

    @jax.jit
    def translate_chunk(enc_vars, gen_vars, stacked):
        def body(acc, im):
            return acc + jnp.sum(translate(enc_vars, gen_vars, im)), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return total

    inputs = [
        jnp.asarray(np.random.RandomState(i + 1)
                    .rand(chunk, batch, 256, 256, 3).astype(np.float32))
        for i in range(args.iters)
    ]
    float(translate_chunk(enc_vars, gen_vars, inputs[0]))
    times = []
    for im in inputs:
        t0 = time.perf_counter()
        float(translate_chunk(enc_vars, gen_vars, im))
        times.append(time.perf_counter() - t0)
    dt_per_batch = float(np.median(times)) / chunk
    imgs_per_sec = batch / dt_per_batch
    achieved = imgs_per_sec * flops_per_img

    out = {
        "flops_per_img_xla": round(flops_per_img / 1e9, 3),
        "flops_per_img_analytic_conv": round(analytic / batch / 1e9, 3),
        "unit_flops": "GFLOP/img",
        "imgs_per_sec": round(imgs_per_sec, 2),
        "achieved_tflops": round(achieved / 1e12, 2),
        "peak_bf16_tflops": V5E_PEAK_BF16 / 1e12,
        "mfu": round(achieved / V5E_PEAK_BF16, 4),
    }
    if bytes_accessed:
        # cost_analysis covers ONE batch of `translate`; dt matched per batch.
        out.update(roofline_fields(flops, bytes_accessed, dt_per_batch))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
