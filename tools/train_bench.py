"""Training-throughput benchmark (complements the inference bench.py).

Measures steps/sec (reference semantics: one step = one G or D update) for
the PGGAN and TwinGAN trainers at given resolutions using the on-device
scan loop. Reference baseline: ~40 steps/sec for PGGAN+DRAGAN at 4x4
batch 16 on a Titan V (BASELINE.md).

    python tools/train_bench.py [--resolutions 4,64,256] [--program both]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Self-locating: the repo root on sys.path without PYTHONPATH (which shadows
# modules the axon jax plugin imports).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_pggan(res: int, batch: int, n_rounds: int) -> dict:
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig

    cfg = GanTrainerConfig(
        model=PGGANConfig(resolution=res, max_channels=256, equalized_lr=True,
                          norm_type="batch_norm", dtype="bfloat16"),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
    )
    trainer = GanTrainer(cfg)
    return _run(trainer, {"target"}, res, batch, n_rounds, f"pggan_dragan_{res}px")


def bench_twingan(res: int, batch: int, n_rounds: int,
                  norm_type: str = "batch_norm", fuse: str = "auto",
                  remat: bool = False) -> dict:
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    cfg = TwinGANConfig(
        model=PGGANConfig(resolution=res, max_channels=256, num_domains=2,
                          equalized_lr=True, norm_type=norm_type, dtype="bfloat16"),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
        use_unet=True,
        fuse_passes={"auto": None, "on": True, "off": False}[fuse],
        remat=remat,
    )
    trainer = TwinGANTrainer(cfg)
    tag = f"twingan_{res}px" + ("_fused" if cfg.fuse else "") + ("_remat" if remat else "")
    return _run(trainer, {"source", "target"}, res, batch, n_rounds, tag)


def bench_stretch512(batch: int, n_rounds: int, sa_hw: int = 256) -> dict:
    """512px stretch config (docs/training.md 512 recipe): self-attention
    moved up to sa_hw (N = sa_hw^2 spatial positions — 65536 at 256, the
    regime where the einsum path OOMs and the Pallas flash forward+backward
    kernels carry the train step), spectral norm everywhere, hinge loss."""
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig

    cfg = GanTrainerConfig(
        model=PGGANConfig(
            resolution=512, max_channels=256, equalized_lr=True,
            norm_type="batch_norm", dtype="bfloat16",
            do_self_attention=True, self_attention_hw=sa_hw,
            spectral_norm=True, spectral_norm_in_non_discriminator=True,
        ),
        loss=GanLossConfig(architecture="hinge"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
    )
    trainer = GanTrainer(cfg)
    return _run(trainer, {"target"}, 512, batch, n_rounds,
                f"stretch512_sa{sa_hw}_hinge_sn")


def _run(trainer, keys, res, batch, n_rounds, name) -> dict:
    rng = np.random.RandomState(0)
    stacked = {
        k: jnp.asarray(rng.rand(n_rounds, trainer.cfg.n_critic, batch, res, res, 3).astype(np.float32))
        for k in keys
    }
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    state, m = trainer.scan_rounds(state, stacked, jax.random.PRNGKey(1))
    float(m["generator_loss"][-1])
    compile_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, m = trainer.scan_rounds(state, stacked, jax.random.PRNGKey(2))
    float(m["generator_loss"][-1])
    dt = time.perf_counter() - t0
    n_steps = n_rounds * trainer.cfg.n_critic
    return {
        "metric": f"{name}_train_steps_per_sec",
        "value": round(n_steps / dt, 2),
        "unit": "steps/sec",
        "batch": batch,
        "imgs_per_sec": round(n_steps * batch / dt, 1),
        "compile_sec": round(compile_time, 1),
    }


def main(argv=None) -> None:
    from twingan_tpu.runner.stage_runner import PGGAN_BATCH_SCHEDULE, TWINGAN_BATCH_SCHEDULE

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--resolutions", default="4,64")
    p.add_argument("--program", default="both",
                   choices=["pggan", "twingan", "both", "stretch512"])
    p.add_argument("--rounds", type=int, default=0, help="rounds per measurement (0 = auto)")
    p.add_argument("--batch", type=int, default=0,
                   help="override the reference batch schedule (twingan only)")
    p.add_argument("--norm_type", default="batch_norm",
                   help="twingan norm (instance_norm = the quality-run config)")
    p.add_argument("--fuse", default="auto", choices=["auto", "on", "off"],
                   help="fuse_passes (twingan only)")
    p.add_argument("--remat", action="store_true", help="per-pass jax.checkpoint")
    args = p.parse_args(argv)
    if args.program == "stretch512":
        print(json.dumps(bench_stretch512(
            TWINGAN_BATCH_SCHEDULE.get(512, 2), args.rounds or 3)))
        return
    for res in [int(r) for r in args.resolutions.split(",")]:
        n_rounds = args.rounds or max(5, 2048 // res)
        if args.program in ("pggan", "both"):
            print(json.dumps(bench_pggan(res, PGGAN_BATCH_SCHEDULE.get(res, 8), n_rounds)))
        if args.program in ("twingan", "both"):
            print(json.dumps(bench_twingan(
                res, args.batch or TWINGAN_BATCH_SCHEDULE.get(res, 4), n_rounds,
                norm_type=args.norm_type, fuse=args.fuse, remat=args.remat)))


if __name__ == "__main__":
    main()
