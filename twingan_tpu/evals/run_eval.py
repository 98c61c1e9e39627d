"""Evaluation CLI: the is_training=False branches of the reference's
GeneralModel.main dispatcher (model_inheritor.py:1132-1279).

Modes (--mode):
- loss        streaming means of every TwinGAN loss over eval batches
- swd         sliced Wasserstein protocol on real vs translated images
- msssim      MS-SSIM between source-translated and target sets (and the
              identity-fidelity gate: translate(s) vs s cycle quality)
- fid         Fréchet distance on inception pool features, real vs
              translated (random-init features offline: relative metric)
- inception_score  reference do_custom_eval IS protocol
              (image_generation.py:818-861); --classifier_path supplies
              real logits from a trained classifier
- eval_debug  HTML gallery of sources / translations / cycles
- output      embedding CSV dump (encoded content per image)

    python -m twingan_tpu.evals.run_eval --mode=swd \
        --model_path=/trained --dataset_dir=... --target_dataset_dir=... \
        --eval_dir=/tmp/eval [--num_images=8192]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu.data.datasets import get_dataset
from twingan_tpu.data.pipeline import SyntheticSource, TFRecordSource, UnpairedSource
from twingan_tpu.data.preprocess import PreprocessConfig
from twingan_tpu.data.tfrecord import list_shards
from twingan_tpu.evals.gallery import write_embeddings_csv, write_html_gallery
from twingan_tpu.evals.metrics import msssim_eval, pairwise_msssim, swd_eval
from twingan_tpu.infer.translate import ImageInferer


def build_batches(args, hw: int):
    """Yields {source, target} float batches at hw."""
    if args.use_synthetic_data or not args.dataset_dir:
        src = SyntheticSource(args.batch_size, hw, seed=args.seed, keys=("source", "target"))
        it = iter(src)
        while True:
            yield next(it)
    else:
        pp = PreprocessConfig(output_hw=hw, resize_mode=args.resize_mode, is_training=False)
        a = TFRecordSource(get_dataset(args.dataset_name),
                           list_shards(args.dataset_dir, args.dataset_split_name),
                           pp, args.batch_size, seed=args.seed, repeat=True)
        b = TFRecordSource(get_dataset(args.target_dataset_name),
                           list_shards(args.target_dataset_dir or args.dataset_dir,
                                       args.dataset_split_name),
                           pp, args.batch_size, seed=args.seed + 1, repeat=True)
        yield from iter(UnpairedSource(a, b))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", required=True,
                   choices=["loss", "swd", "msssim", "fid", "inception_score",
                            "eval_debug", "output"])
    p.add_argument("--model_path", required=True)
    p.add_argument("--classifier_path", default="",
                   help="trained ClassifierTrainer dir supplying real logits "
                        "for --mode=inception_score and real features for "
                        "--mode=fid (default: random-init InceptionV3, "
                        "relative metric); see tools/train_fid_classifier.py")
    p.add_argument("--eval_dir", default="/tmp/twingan_eval")
    p.add_argument("--dataset_name", default="image_only")
    p.add_argument("--dataset_dir", default="")
    p.add_argument("--target_dataset_name", default="image_only")
    p.add_argument("--target_dataset_dir", default="")
    p.add_argument("--dataset_split_name", default="train")
    p.add_argument("--use_synthetic_data", action="store_true")
    p.add_argument("--resize_mode", default="PAD")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_images", type=int, default=512)
    p.add_argument("--swd_num_images", type=int, default=8192)
    p.add_argument("--swd_save_images", action="store_true",
                   help="dump the generated SWD sample set under "
                        "eval_dir/swd_debug/<ts>/ (reference flag, "
                        "image_generation.py:158-161)")
    p.add_argument("--output_single_file_name", default="embeddings.csv")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    inferer = ImageInferer(args.model_path)
    hw = inferer.image_hw
    os.makedirs(args.eval_dir, exist_ok=True)
    translate = lambda x: np.asarray(
        inferer.trainer.translate(inferer.state, jnp.asarray(x), "s2t").astype(jnp.float32)
    )
    batches = build_batches(args, hw)

    if args.mode == "loss":
        from twingan_tpu.evals.metrics import streaming_loss_eval

        trainer, state = inferer.trainer, inferer.state

        def loss_fn(batch):
            # Non-donating eval step: metrics only, state untouched.
            metrics = trainer.eval_metrics(state, batch, jax.random.PRNGKey(0))
            return {k: v for k, v in metrics.items() if np.ndim(v) == 0}

        n = max(1, args.num_images // args.batch_size)
        results = streaming_loss_eval(loss_fn, batches, num_batches=n)
        out = os.path.join(args.eval_dir, "eval_losses.txt")
        with open(out, "w") as f:
            for k, v in sorted(results.items()):
                f.write(f"{k}\t{v:.6f}\n")
        print({k: round(v, 4) for k, v in results.items()})
        print("written:", out)

    elif args.mode == "swd":
        reals, fakes, n = [], [], 0
        for batch in batches:
            reals.append(np.asarray(batch["target"], np.float32))
            fakes.append(translate(batch["source"]))
            n += len(reals[-1])
            if n >= args.swd_num_images:
                break
        if args.swd_save_images:
            # Debug dump of the generated SWD sample set (reference
            # swd_save_images, image_generation.py:879-881: a timestamped
            # swd_debug/ dir of the fakes).
            import time as _time

            from twingan_tpu.utils.image_io import save_image_grid

            dbg = os.path.join(args.eval_dir, "swd_debug", str(int(_time.time())))
            os.makedirs(dbg, exist_ok=True)
            for bi, fb in enumerate(fakes):
                save_image_grid(os.path.join(dbg, f"batch_{bi}.png"), fb)
            print("swd debug images:", dbg)
        path = os.path.join(args.eval_dir, f"swd_eval_step_0_{n}_images.txt")
        table = swd_eval(jax.random.PRNGKey(args.seed), reals, fakes,
                         num_images=args.swd_num_images, save_path=path)
        if table is None:
            print("resolution < 16: SWD skipped (reference behavior)")
        else:
            print("SWD x1e3 per resolution:", table)
            print("written:", path)

    elif args.mode == "msssim":
        if hw < 16:
            # 5-level MS-SSIM box-downsamples 4x: hw//16 must be >= 1 (the
            # ssim window itself auto-shrinks, ops/msssim.py:72).
            print("resolution < 16: 5-level MS-SSIM does not fit; skipped")
            return
        fakes, sources, cycles, n = [], [], [], 0
        for batch in batches:
            src = np.asarray(batch["source"], np.float32)
            t_prime = translate(batch["source"])
            sources.append(src)
            fakes.append(t_prime)
            # Cycle fidelity: translate back t_prime -> source domain.
            cycles.append(np.asarray(
                inferer.trainer.translate(
                    inferer.state, jnp.asarray(t_prime), "t2s"
                ).astype(jnp.float32)))
            n += len(src)
            if n >= args.num_images:
                break
        diversity = msssim_eval(fakes)
        fidelity = pairwise_msssim(np.concatenate(cycles)[: args.num_images],
                                   np.concatenate(sources)[: args.num_images])
        print(f"translated-set MS-SSIM diversity (lower = more diverse): {diversity:.4f}")
        print(f"cycle fidelity MS-SSIM s vs s2t2s (higher = better): {fidelity:.4f}")

    elif args.mode == "fid":
        from twingan_tpu.evals.metrics import (
            classifier_features_fn,
            fid,
            inception_pool_features_fn,
        )

        if args.classifier_path:
            # Trained-feature FID (tools/train_fid_classifier.py):
            # absolute-comparable within this feature space.
            feats = classifier_features_fn(args.classifier_path)
            kind = "trained-classifier features"
        else:
            feats = inception_pool_features_fn(image_hw=hw, seed=args.seed)
            kind = "random-feature inception, relative metric"
        reals, fakes, n = [], [], 0
        for batch in batches:
            reals.append(np.asarray(batch["target"], np.float32))
            fakes.append(translate(batch["source"]))
            n += len(reals[-1])
            if n >= args.num_images:
                break
        score = fid(feats, reals, fakes)
        out = os.path.join(args.eval_dir, "fid.txt")
        with open(out, "w") as f:
            f.write(f"fid\t{score:.6f}\t{n} images\t{kind}\n")
        print(f"FID ({kind}): {score:.4f} over {n} images")
        print("written:", out)

    elif args.mode == "inception_score":
        # Reference do_custom_eval IS protocol (image_generation.py:818-861):
        # softmax logits over translated images, 10-split exp-KL. Without
        # fetchable pretrained weights the logits net is deterministically
        # random-init — a relative metric, like --mode=fid; point
        # --classifier_path at a ClassifierTrainer checkpoint for real
        # logits.
        from twingan_tpu.evals.metrics import inception_score

        if args.classifier_path:
            from twingan_tpu.runner.classifier_runner import load_trained_classifier

            trainer, state = load_trained_classifier(args.classifier_path)
            cls_hw = trainer.cfg.image_hw

            def logits_fn(images):
                # The classifier was trained at its own image_hw; GAN-
                # resolution inputs would break fixed-head nets (vgg/lenet
                # flatten dims) or silently score off-distribution.
                if images.shape[1] != cls_hw:
                    images = jax.image.resize(
                        images,
                        (images.shape[0], cls_hw, cls_hw, images.shape[-1]),
                        "bilinear")
                logits, _ = trainer.model.apply(
                    {"params": state.params, **state.model_state},
                    images, train=False)
                return logits
        else:
            # Random-init logits at the deep head collapse to a constant
            # (IS degenerates to exactly 1.0); use the same non-collapsing
            # Mixed_5b pooled features as FID, through a fixed random
            # linear head — a relative diversity measure.
            from twingan_tpu.evals.metrics import inception_pool_features_fn

            feats = inception_pool_features_fn(image_hw=hw, seed=args.seed)
            key = jax.random.PRNGKey(args.seed + 1)

            @jax.jit
            def logits_fn(images):
                f = feats(images)
                w = jax.random.normal(key, (f.shape[-1], 1000)) / jnp.sqrt(
                    jnp.float32(f.shape[-1]))
                return (f / (jnp.std(f) + 1e-6)) @ w

        fakes, n = [], 0
        for batch in batches:
            fakes.append(translate(batch["source"]))
            n += len(fakes[-1])
            if n >= args.num_images:
                break
        mean, std = inception_score(logits_fn, fakes)
        out = os.path.join(args.eval_dir, "inception_score.txt")
        with open(out, "w") as f:
            f.write(f"inception_score\t{mean:.6f}\t{std:.6f}\t{n} images\n")
        print(f"inception score: {mean:.4f} +/- {std:.4f} over {n} images"
              + ("" if args.classifier_path else " (random-init logits; relative)"))
        print("written:", out)

    elif args.mode == "eval_debug":
        batch = next(batches)
        items = {
            "sources": np.asarray(batch["source"], np.float32),
            "targets": np.asarray(batch["target"], np.float32),
            "t_prime": translate(batch["source"]),
        }
        path = write_html_gallery(os.path.join(args.eval_dir, "eval_debug"), items)
        print("written:", path)

    elif args.mode == "output":
        from twingan_tpu.train.state import apply_model
        from twingan_tpu.train.twingan_trainer import ENC

        trainer, state = inferer.trainer, inferer.state
        # Growing-stage checkpoints need the fade-in alpha (same contract
        # as translate(), twingan_trainer.py — the Encoder default alpha=0
        # would ignore the newly trained high-res block).
        alpha = trainer._alpha(state.step)
        written = 0
        path = os.path.join(args.eval_dir, args.output_single_file_name)
        for batch in batches:
            imgs = jnp.asarray(batch["source"])
            (code, _), _ = apply_model(
                trainer.enc, state.params[ENC], state.model_state[ENC], imgs,
                alpha=alpha, domain=0, train=False,
            )
            names = [f"img_{written + i}" for i in range(len(imgs))]
            write_embeddings_csv(path, names, np.asarray(code), append=written > 0)
            written += len(imgs)
            if written >= args.num_images:
                break
        print(f"wrote {written} embeddings to {path}")


if __name__ == "__main__":
    main()
