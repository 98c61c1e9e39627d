"""Real-photograph TwinGAN demonstration (VERDICT round-2 item 5).

The reference's entire use-case is human-face -> anime-face translation
(/root/reference/README.md:14-22), trained on ~200k real faces. The only
real images in this offline environment are the reference demo set: 10
cropped human faces (`demo/inference_input/cropped/`) and 13 anime faces
(`demo/inference_output/anime/`). 23 images cannot produce a general model
— this run exists to SHOW the real-photograph path end-to-end: the
converter -> TFRecord -> progressive-stage pipeline ingesting real PNGs of
varying sizes, heavy augmentation (random crop ratio 0.8 + per-image
flips) stretching the tiny dataset, and a translation gallery on the real
faces. The honest quality statement lives in docs/PERFORMANCE.md.

    python tools/real_faces_run.py --work runs/real_faces --max_hw 64

Stages re-exec per process by default (axon host-leak mitigation, same as
quality_curves.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HUMAN_DIR = "/root/reference/demo/inference_input/cropped"
ANIME_DIR = "/root/reference/demo/inference_output/anime"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", default="runs/real_faces")
    p.add_argument("--human_dir", default=HUMAN_DIR)
    p.add_argument("--anime_dir", default=ANIME_DIR)
    p.add_argument("--start_hw", type=int, default=4)
    p.add_argument("--max_hw", type=int, default=64)
    p.add_argument("--images", type=int, default=24000,
                   help="images shown per stage (~epochs x 10 source faces)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--save_every", type=int, default=1500)
    p.add_argument("--rounds_per_scan", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--isolate_stages", type=int, default=1)
    p.add_argument("--platform", default="",
                   help="force a jax platform (cpu smoke; the JAX_PLATFORMS "
                   "env var alone is ignored under axon)")
    p.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.isolate_stages and not args._worker:
        import subprocess

        base = list(argv if argv is not None else sys.argv[1:])
        while True:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *base, "--_worker"]
            ).returncode
            if rc == 0:
                return
            if rc != 3:
                raise SystemExit(rc)

    t0 = time.time()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    rec_h = os.path.join(args.work, "rec_human")
    rec_a = os.path.join(args.work, "rec_anime")
    from twingan_tpu.data.converters import convert_image_folder

    for src, out in ((args.human_dir, rec_h), (args.anime_dir, rec_a)):
        if not os.path.isdir(out):
            n = convert_image_folder(src, out, num_shards=1)
            print(f"converted {src} -> {out}: {n} records")

    from twingan_tpu.models.config import PGGANConfig
    from twingan_tpu.runner.stage_runner import RunConfig, StageRunner
    from twingan_tpu.train.losses import GanLossConfig
    from twingan_tpu.train.optimizers import OptimizerConfig
    from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

    trainer_cfg = TwinGANConfig(
        model=PGGANConfig(
            resolution=args.start_hw, max_channels=128,
            norm_type="instance_norm", equalized_lr=True, do_pixel_norm=True,
            num_domains=2, dtype="bfloat16",
        ),
        loss=GanLossConfig(architecture="gan"),
        opt=OptimizerConfig(learning_rate=2e-4),
        batch_size=args.batch,
        use_unet=True,
        l_cyc_weight=5.0,
        l_content_weight=0.1,
    )
    run_cfg = RunConfig(
        program="twingan",
        train_dir=os.path.join(args.work, "train"),
        start_hw=args.start_hw,
        max_hw=args.max_hw,
        num_images_per_resolution=args.images,
        batch_schedule={r: args.batch for r in (4, 8, 16, 32, 64, 128)},
        dataset_dir=rec_h,
        target_dataset_dir=rec_a,
        do_random_cropping=True,
        trainer=trainer_cfg,
        log_every_n_steps=200,
        save_every_n_steps=args.save_every,
        log_image_every_n_iter=0,
        keep_checkpoints=20,
        rounds_per_scan=args.rounds_per_scan,
        num_devices=1,
        seed=args.seed,
        max_stages_per_run=1 if args.isolate_stages else 0,
    )
    summary = StageRunner(run_cfg).run()
    if summary.pop("_incomplete", False):
        print("stage complete, more remain:", json.dumps(summary))
        raise SystemExit(3)
    print("training complete:", json.dumps(summary))

    # ------- gallery: every real human face -> anime, plus cycle back -----
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from twingan_tpu.data.preprocess import host_resize_uint8
    from twingan_tpu.runner.checkpoint import CheckpointManager
    from twingan_tpu.utils.image_io import save_image_grid

    res = args.max_hw
    tcfg = trainer_cfg.replace(
        model=trainer_cfg.model.replace(resolution=res, is_growing=False))
    trainer = TwinGANTrainer(tcfg)
    cm = CheckpointManager(os.path.join(run_cfg.train_dir, str(res)))
    state = cm.restore(trainer.init_state(jax.random.PRNGKey(0)))

    from twingan_tpu.data.converters import list_images

    paths = list_images(args.human_dir)
    srcs = np.stack([
        host_resize_uint8(
            np.asarray(Image.open(p).convert("RGB")), "PAD", res,
            rng=np.random.RandomState(0),
        )
        for p in paths
    ]).astype(np.float32) / 255.0
    out = np.asarray(
        trainer.translate(state, jnp.asarray(srcs), "s2t").astype(jnp.float32))
    back = np.asarray(
        trainer.translate(state, jnp.asarray(out), "t2s").astype(jnp.float32))
    grid = np.concatenate([
        np.concatenate(list(srcs), axis=1),
        np.concatenate(list(out), axis=1),
        np.concatenate(list(back), axis=1),
    ], axis=0)
    gallery = os.path.join(args.work, "real_faces_gallery.png")
    save_image_grid(gallery, grid[None])
    stats = {
        "n_human": len(paths),
        "images_per_stage": args.images,
        "wall_sec": round(time.time() - t0, 1),
        "summary": summary,
    }
    with open(os.path.join(args.work, "real_faces_run.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print("written:", gallery)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
