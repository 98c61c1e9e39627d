"""Compiled-memory evidence for --remat (per-pass gradient checkpointing).

TwinGANConfig.remat / GanTrainerConfig.remat wrap each of the per-step module
applies in jax.checkpoint (train/state.py apply_model). This tool lowers the
same train step with remat off/on and reports XLA's buffer-assignment stats
(compiled.memory_analysis()): temp_size is the activation/workspace heap the
step needs beyond its arguments.

BACKEND CAVEAT (measured, 2026-08-18): on the XLA *CPU* backend this metric
does not credit rematerialization — even a textbook 30-block tanh-chain
jax.grad shows temp GROWING under jax.checkpoint (1.02 -> 1.51 GB), because
the CPU runtime's sequential buffer assignment keeps recompute clusters and
their consumers live together. Numbers from this tool are only meaningful on
the TPU backend (remat exists to trade HBM for FLOPs under the fusion-happy
TPU scheduler). Run it without JAX_PLATFORMS overrides on the chip.

    python tools/exp_remat_memory.py --res 256 --batch 8 --loss dragan

Semantics (losses/params identical with remat on/off) are covered by
tests/test_remat.py; this tool is the capacity side of the story.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(args) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig

    rows = []
    for remat in (False, True):
        model = PGGANConfig(
            resolution=args.res, max_channels=args.max_channels,
            num_domains=2 if args.trainer == "twingan" else 1,
            norm_type="instance_norm", equalized_lr=True, dtype=args.dtype,
        )
        loss = GanLossConfig(architecture=args.loss)
        opt = OptimizerConfig(learning_rate=1e-4)
        if args.trainer == "twingan":
            from twingan_tpu.train.twingan_trainer import (
                TwinGANConfig, TwinGANTrainer,
            )

            cfg = TwinGANConfig(model=model, loss=loss, opt=opt,
                                batch_size=args.batch, use_unet=True,
                                remat=remat)
            trainer = TwinGANTrainer(cfg)
            keys = ("source", "target")
        else:
            from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig

            cfg = GanTrainerConfig(model=model, loss=loss, opt=opt,
                                   batch_size=args.batch, remat=remat)
            trainer = GanTrainer(cfg)
            keys = ("target",)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = {k: jax.ShapeDtypeStruct(
            (args.batch, args.res, args.res, 3), jnp.float32) for k in keys}
        for step_name in ("_g_step", "_d_step"):
            f = jax.jit(getattr(trainer, step_name))
            ma = f.lower(state, batch, jax.random.PRNGKey(1)).compile().memory_analysis()
            rows.append({
                "remat": remat,
                "step": step_name,
                "temp_gb": round(ma.temp_size_in_bytes / 1e9, 4),
                "args_gb": round(ma.argument_size_in_bytes / 1e9, 4),
                "backend": jax.devices()[0].platform,
            })
            print(json.dumps(rows[-1]))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trainer", default="twingan", choices=["twingan", "gan"])
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_channels", type=int, default=256)
    p.add_argument("--loss", default="dragan",
                   choices=["gan", "dragan", "wgan", "wgan_gp", "hinge"])
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    rows = measure(args)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
