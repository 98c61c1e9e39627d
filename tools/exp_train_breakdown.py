"""Training-round time breakdown at 256px (round 2 follow-up to tools/mfu.py).

The 256px TwinGAN training round measures ~10x slower than its HBM-roofline
bound (tools/mfu.py --train: 8.9 GB/step 'bytes accessed' -> 11 ms bound vs
~103 ms measured at batch 8). This tool attributes the gap by timing the
same scan_rounds protocol across one-knob-at-a-time variants:

- loss architecture (dragan's double-backward GP vs plain gan),
- norm type (instance_norm's data-dependent reductions vs batch_norm/none),
- UNet skips on/off,
- batch size (MXU/VPU occupancy),
- TwinGAN (4 G passes + 6 D passes/round; twingan_trainer.py) vs the plain
  GanTrainer (1 G + 1 D pass/step) as the pass-count axis.

Each variant is its own jit compile (30-400 s through the axon tunnel), so
variants are selectable:

    python tools/exp_train_breakdown.py --variants base,gan_loss,batch32
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    # name: overrides {trainer, batch, res, loss, norm, unet}
    "base": {},
    "gan_loss": {"loss": "gan"},
    "hinge_loss": {"loss": "hinge"},
    "batch_norm": {"norm": "batch_norm"},
    "no_norm": {"norm": "none"},
    "no_unet": {"unet": False},
    "batch16": {"batch": 16, "n_rounds": 5},
    "batch32": {"batch": 32, "n_rounds": 3},
    "gan_trainer": {"trainer": "gan"},
    "gan_trainer_b32": {"trainer": "gan", "batch": 32, "n_rounds": 5},
    "res128": {"res": 128, "n_rounds": 20},
    # remat (per-pass jax.checkpoint): measures the recompute FLOPs cost;
    # pair with tools/exp_remat_memory.py for the HBM side.
    "remat": {"remat": True},
    "remat_b16": {"remat": True, "batch": 16, "n_rounds": 5},
    # correctness smoke (CPU-runnable): tiny shapes, both trainers
    "smoke": {"res": 16, "batch": 2, "n_rounds": 2},
    "smoke_gan": {"trainer": "gan", "res": 16, "batch": 2, "n_rounds": 2},
}


def run_variant(name: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig

    ov = VARIANTS[name]
    batch = ov.get("batch", 8)
    res = ov.get("res", 256)
    n_rounds = ov.get("n_rounds", 10)
    model = PGGANConfig(
        resolution=res, max_channels=256, num_domains=2, equalized_lr=True,
        norm_type=ov.get("norm", "instance_norm"), dtype="bfloat16")
    loss = GanLossConfig(architecture=ov.get("loss", "dragan"))
    opt = OptimizerConfig(learning_rate=1e-4)

    if ov.get("trainer", "twingan") == "twingan":
        from twingan_tpu.train.twingan_trainer import (
            TwinGANConfig, TwinGANTrainer,
        )

        cfg = TwinGANConfig(model=model, loss=loss, opt=opt, batch_size=batch,
                            use_unet=ov.get("unet", True),
                            remat=ov.get("remat", False))
        trainer = TwinGANTrainer(cfg)
        keys = ("source", "target")
    else:
        from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig

        cfg = GanTrainerConfig(model=model.replace(num_domains=1), loss=loss,
                               opt=opt, batch_size=batch,
                               remat=ov.get("remat", False))
        trainer = GanTrainer(cfg)
        keys = ("target",)  # generator input falls back to noise

    state = trainer.init_state(jax.random.PRNGKey(0))

    def stacked(seed):
        r = np.random.RandomState(seed)
        return {
            k: jnp.asarray(
                r.rand(n_rounds, cfg.n_critic, batch, res, res, 3)
                .astype(np.float32))
            for k in keys
        }

    n_steps = n_rounds * cfg.n_critic
    t0 = time.perf_counter()
    state, m = trainer.scan_rounds(state, stacked(1), jax.random.PRNGKey(1))
    float(m["generator_loss"][-1])
    compile_s = time.perf_counter() - t0
    inputs = [stacked(2 + i) for i in range(iters)]
    for inp in inputs:  # flush EVERY key's transfer before timing
        for k in keys:
            float(jnp.sum(inp[k][0, 0]))
    times = []
    for inp in inputs:
        t0 = time.perf_counter()
        state, m = trainer.scan_rounds(state, inp, jax.random.PRNGKey(1))
        float(m["generator_loss"][-1])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "variant": name,
        "config": f"{ov.get('trainer', 'twingan')}_{res}px_b{batch}_"
                  f"{ov.get('loss', 'dragan')}_{ov.get('norm', 'instance_norm')}"
                  f"{'' if ov.get('unet', True) else '_nounet'}"
                  f"{'_remat' if ov.get('remat') else ''}",
        "ms_per_step": round(dt / n_steps * 1e3, 2),
        "imgs_per_sec": round(n_steps * batch / dt, 1),
        "compile_s": round(compile_s, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", default="base,gan_loss,no_unet,batch_norm")
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args(argv)
    names = [n.strip() for n in args.variants.split(",")]
    if len(names) > 1:
        # One subprocess per variant: the axon client pins every
        # host->device payload for process lifetime (~GBs per variant at
        # 256px), so in-process looping would leak host RSS and degrade
        # later variants' measurements (CLAUDE.md environment gotcha).
        import subprocess

        for name in names:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--variants", name, "--iters", str(args.iters)],
                check=True)
        return
    print(json.dumps(run_variant(names[0], args.iters)), flush=True)


if __name__ == "__main__":
    main()
