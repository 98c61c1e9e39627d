"""Real-TFRecord vs synthetic input-path throughput (VERDICT round 1 item 9).

Round 1 measured the real-data path ~10x slower than synthetic at small
resolutions (single-threaded host decode on this 1-core host). The fix is
the decoded-sample cache that promotes to contiguous per-key arrays after
the first epoch (data/pipeline.py TFRecordSource); this tool publishes the
measured gap: TwinGAN 32px via the StageRunner, identical configs, real
TFRecords vs SyntheticSource.

    python tools/input_path_bench.py [--steps 6000]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(work: str, use_synthetic: bool, steps: int, batch: int,
             dom: str) -> dict:
    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.stage_runner import RunConfig, StageRunner
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig

    trainer_cfg = TwinGANConfig(
        model=PGGANConfig(resolution=32, max_channels=128,
                          norm_type="instance_norm", equalized_lr=True,
                          num_domains=2, dtype="bfloat16"),
        loss=GanLossConfig(architecture="dragan"),
        opt=OptimizerConfig(learning_rate=1e-4),
        batch_size=batch,
        use_unet=True,
    )
    cfg = RunConfig(
        program="twingan",
        train_dir=os.path.join(work, "synth" if use_synthetic else "real"),
        start_hw=32,
        max_hw=32,
        num_images_per_resolution=steps * batch,
        batch_schedule={32: batch},
        dataset_dir="" if use_synthetic else os.path.join(dom, "rec_a"),
        target_dataset_dir="" if use_synthetic else os.path.join(dom, "rec_b"),
        use_synthetic_data=use_synthetic,
        trainer=trainer_cfg,
        log_every_n_steps=2000,
        save_every_n_steps=10**9,
        log_image_every_n_iter=0,
        rounds_per_scan=25,
        num_devices=1,
        seed=0,
    )
    t0 = time.time()
    runner = StageRunner(cfg)
    summary = runner.run()
    info = summary["32"]
    info["total_wall_sec"] = round(time.time() - t0, 1)
    # Steady-state rate: the last logged window (excludes jit compile and,
    # for real data, the one-time first-epoch decode that fills the uint8
    # sample cache).
    rates = [r["rounds_per_sec"] for r in runner.metrics_log
             if r.get("stage") == "32"]
    info["steady_rounds_per_sec"] = rates[-1] if rates else info["rounds_per_sec"]
    return info


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="/tmp/input_path_bench")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=400, help="images per domain")
    args = p.parse_args(argv)

    dom = os.path.join(args.work, "domains")
    if not os.path.exists(os.path.join(dom, "rec_a")):
        import make_demo_domains

        make_demo_domains.main(
            ["--out", dom, "--n", str(args.n), "--hw", "32", "--seed", "0"]
        )
    for sub in ("real", "synth"):
        shutil.rmtree(os.path.join(args.work, sub), ignore_errors=True)

    real = run_once(args.work, False, args.steps, args.batch, dom)
    synth = run_once(args.work, True, args.steps, args.batch, dom)
    ratio = synth["rounds_per_sec"] / max(real["rounds_per_sec"], 1e-9)
    steady_ratio = synth["steady_rounds_per_sec"] / max(
        real["steady_rounds_per_sec"], 1e-9)
    print(json.dumps({
        "config": f"twingan_32px_b{args.batch}_dragan_unet_scan25",
        "real_tfrecord_rounds_per_sec": real["rounds_per_sec"],
        "synthetic_rounds_per_sec": synth["rounds_per_sec"],
        "synthetic_over_real": round(ratio, 2),
        "real_steady_rounds_per_sec": real["steady_rounds_per_sec"],
        "synthetic_steady_rounds_per_sec": synth["steady_rounds_per_sec"],
        "synthetic_over_real_steady": round(steady_ratio, 2),
    }))


if __name__ == "__main__":
    main()
