"""Controlled end-to-end training-rate matrix (VERDICT r3 items 3+7).

Measures the FULL StageRunner path (input pipeline + jitted G/D rounds +
metrics cadence) for one stage per cell, varying exactly one knob at a
time: {streaming, device-resident} x {fuse_passes on/off} x {remat on/off}
x batch, at a fixed resolution. Every cell is its own OS process (the axon
TPU client leaks every host->device payload for process lifetime) and its
own fresh jit compile; the reported number is the median rounds/s over the
steady-state tail of the stage, same convention as tools/stage_rates.py.

This replaces the confounded same-run A/B in docs/PERFORMANCE.md (which
mixed growing-vs-stabilize stages and background-CPU contention): here
every cell trains the SAME stabilize stage from the same seed on the same
dataset, so the only difference between two rows is the labeled knob.
Reference anchor for the end-to-end semantics: the reference's training
loop measured imgs/s at 256px on a Titan V
(/root/reference/image_generation.py:587-662, docs/training.md:40).

    python tools/rate_matrix.py --res 256 --steps 600 \
        --cells resident:on:1:16,resident:on:1:8,resident:off:1:16,\
    resident:on:0:16,stream:on:1:16,stream:on:1:8
    python tools/rate_matrix.py --res 128 --steps 800 \
        --cells resident:auto:1:8,stream:auto:1:8   # item-7 A/B
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE_LINE = re.compile(
    r"\[stage (\S+)\] step (\d+)/(\d+) g=\S+ d=\S+ ([\d.]+) rounds/s")


def run_cell(args, cell: str, log_path: str) -> dict:
    """One subprocess = one (input, fuse, remat, batch) cell."""
    inp, fuse, remat, batch = cell.split(":")
    t0 = time.time()
    with open(log_path, "wb") as f:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_cell", cell,
             "--res", str(args.res), "--steps", str(args.steps),
             "--work", args.work, "--platform", args.platform],
            stdout=f, stderr=subprocess.STDOUT).returncode
    wall = time.time() - t0
    rates, total = [], 0
    for line in open(log_path, errors="replace"):
        m = RATE_LINE.match(line.strip())
        if m:
            total = int(m.group(3))
            if int(m.group(2)) > args.skip_steps:
                rates.append(float(m.group(4)))
    med = statistics.median(rates) if rates else 0.0
    row = {"input": inp, "fuse": fuse, "remat": int(remat), "batch": int(batch),
           "median_rounds_per_sec": round(med, 2),
           "imgs_per_sec": round(med * int(batch), 1),
           "steps": total, "wall_sec": round(wall, 1), "rc": rc,
           "rate_samples": len(rates)}
    print("cell done:", json.dumps(row), flush=True)
    return row


def cell_main(args) -> None:
    inp, fuse, remat, batch = args._cell.split(":")
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.stage_runner import RunConfig, StageRunner
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig

    dom = os.path.join(args.work, "domains")
    if not os.path.exists(os.path.join(dom, "rec_a")):
        import make_demo_domains

        make_demo_domains.main(["--out", dom, "--n", "600",
                                "--hw", str(args.res), "--seed", "0"])

    # The quality-run trainer config (tools/quality_curves.py): instance
    # norm (per-sample statistics => fuse_passes is semantics-preserving),
    # UNet skips, strong cycle weight.
    trainer_cfg = TwinGANConfig(
        model=PGGANConfig(
            resolution=args.res, max_channels=128, norm_type="instance_norm",
            equalized_lr=True, do_pixel_norm=True, num_domains=2,
            dtype="bfloat16"),
        loss=GanLossConfig(architecture="gan"),
        opt=OptimizerConfig(learning_rate=2e-4),
        batch_size=int(batch),
        use_unet=True,
        l_cyc_weight=5.0,
        l_content_weight=0.1,
        fuse_passes={"auto": None, "on": True, "off": False}[fuse],
        remat=bool(int(remat)),
    )
    run_cfg = RunConfig(
        program="twingan",
        train_dir=os.path.join(
            args.work, f"cell_{inp}_{fuse}_{remat}_{batch}"),
        start_hw=args.res, max_hw=args.res,
        num_images_per_resolution=args.steps * int(batch),
        batch_schedule={args.res: int(batch)},
        dataset_dir=os.path.join(dom, "rec_a"),
        target_dataset_dir=os.path.join(dom, "rec_b"),
        trainer=trainer_cfg,
        log_every_n_steps=50,
        save_every_n_steps=10 ** 9,      # rates only; no checkpoint traffic
        log_image_every_n_iter=0,
        rounds_per_scan=25,
        num_devices=1,
        seed=0,
        device_resident_gb=4.0 if inp == "resident" else 0.0,
    )
    StageRunner(run_cfg).run()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--skip_steps", type=int, default=200,
                   help="median over rate samples past this step only")
    p.add_argument("--cells",
                   default="resident:on:1:16,resident:on:1:8,"
                           "resident:off:1:16,resident:on:0:16,"
                           "stream:on:1:16,stream:on:1:8",
                   help="input:fuse:remat:batch[,...]")
    p.add_argument("--work", default="/tmp/rate_matrix")
    p.add_argument("--out", default="",
                   help="write <out>.json + <out>.md (e.g. docs/rate_matrix_256)")
    p.add_argument("--platform", default="")
    p.add_argument("--_cell", default="", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args._cell:
        cell_main(args)
        return

    os.makedirs(args.work, exist_ok=True)
    rows = []
    for cell in args.cells.split(","):
        cell = cell.strip()
        log = os.path.join(args.work,
                           f"cell_{cell.replace(':', '_')}_{args.res}.log")
        rows.append(run_cell(args, cell, log))
        if args.out:       # bank incrementally: a crash keeps finished cells
            write_out(args, rows)
    if args.out:
        write_out(args, rows)
        print("written:", args.out + ".md")


def write_out(args, rows):
    with open(args.out + ".json", "w") as f:
        json.dump({"res": args.res, "steps": args.steps, "rows": rows}, f,
                  indent=1)
    md = [f"# End-to-end StageRunner rates at {args.res}px (stabilize stage, "
          f"{args.steps} steps/cell, median past step {args.skip_steps})",
          "",
          "| input path | fuse_passes | remat | batch | median rounds/s | imgs/s |",
          "|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['input']} | {r['fuse']} | {r['remat']} | "
                  f"{r['batch']} | {r['median_rounds_per_sec']} | "
                  f"{r['imgs_per_sec']} |")
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
