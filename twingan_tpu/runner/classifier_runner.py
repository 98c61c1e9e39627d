"""Image classifier training/eval CLI.

Reference parity: /root/reference/train_image_classifier.py main() — the
trainer that builds the illust2vec/inception taggers feeding TwinGAN
distillation. Modes: train (multi-label sigmoid), eval (AUC/precision/
recall), tags (write top-k tag files), gradcam (heatmap overlays).

    python -m twingan_tpu.runner.classifier_runner --mode=train \
        --model_name=illust2vec --dataset_name=danbooru_2_illust2vec \
        --dataset_dir=/data/records --train_dir=/trained_tagger \
        --num_classes=1539 --max_number_of_steps=100000
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu.data.datasets import get_dataset
from twingan_tpu.data.pipeline import TFRecordSource
from twingan_tpu.data.preprocess import PreprocessConfig
from twingan_tpu.data.preprocessing_factory import get_preprocessing
from twingan_tpu.data.tfrecord import list_shards
from twingan_tpu.runner.checkpoint import CheckpointManager, save_config_snapshot
from twingan_tpu.train.classifier_trainer import ClassifierConfig, ClassifierTrainer
from twingan_tpu.train.optimizers import OptimizerConfig
from twingan_tpu.utils.summary import SummaryWriter


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="train", choices=["train", "eval", "tags", "gradcam"])
    p.add_argument("--train_dir", required=True)
    p.add_argument("--model_name", default="illust2vec")
    p.add_argument("--num_classes", type=int, default=1539)
    p.add_argument("--labels_offset", type=int, default=0,
                   help="drop the first N label columns and shrink the "
                        "logits layer by N — evaluates vgg/resnet nets that "
                        "have no background class (reference labels_offset, "
                        "model_inheritor.py:213, train_image_classifier.py:73)")
    p.add_argument("--multi_label", default=True, type=lambda v: str(v).lower() in ("1", "true"))
    p.add_argument("--dataset_name", default="danbooru_2_illust2vec")
    p.add_argument("--dataset_dir", default="")
    p.add_argument("--dataset_split_name", default="train")
    p.add_argument("--use_synthetic_data", action="store_true")
    p.add_argument("--train_image_size", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_number_of_steps", type=int, default=10000)
    p.add_argument("--learning_rate", type=float, default=0.01)
    p.add_argument("--optimizer", default="rmsprop")
    p.add_argument("--weight_decay", type=float, default=0.00004,
                   help="coupled L2 weight decay (reference weight_decay "
                        "flag default)")
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--preprocessing_name", default="")
    p.add_argument("--log_every_n_steps", type=int, default=50)
    p.add_argument("--save_every_n_steps", type=int, default=1000)
    p.add_argument("--num_eval_batches", type=int, default=16)
    p.add_argument("--tags_id_lookup_file", default="")
    p.add_argument("--tag_threshold", type=float, default=0.25)
    # Reference process_mutually_exclusive_labels: a TSV mapping label id ->
    # tag group; only the best label per group is kept, and images missing
    # hair (group 2) or eye (group 3) color emit no tags.
    p.add_argument("--tags_group_file", default="")
    p.add_argument("--gradcam_layer", default="conv5")
    p.add_argument("--output_dir", default="")
    p.add_argument("--seed", type=int, default=0)
    return p


def make_batches(args, cfg: ClassifierConfig, training: bool):
    pp_name = args.preprocessing_name or args.model_name
    try:
        device_pp = get_preprocessing(pp_name, cfg.image_hw, is_training=training)
    except ValueError:
        device_pp = get_preprocessing("danbooru", cfg.image_hw, is_training=training)
    key = jax.random.PRNGKey(args.seed + (0 if training else 1))

    # The trained config's persisted offset wins (eval/tags on a train dir
    # must realign without re-passing the flag); the CLI flag covers train
    # mode and pre-offset configs.
    offset = getattr(cfg, "labels_offset", 0) or getattr(args, "labels_offset", 0)
    if args.use_synthetic_data or not args.dataset_dir:
        rng = np.random.RandomState(args.seed)
        while True:
            imgs = rng.rand(cfg.batch_size, cfg.image_hw, cfg.image_hw, 3).astype(np.float32)
            labels = (rng.rand(cfg.batch_size, cfg.num_classes) > 0.9).astype(np.float32)
            yield {"image": jnp.asarray(imgs), "labels": jnp.asarray(labels)}
    else:
        # The dataset carries the full vocabulary; the net sees
        # num_classes - labels_offset columns (reference semantics: the
        # one-hot width shrinks by the offset, model_inheritor.py:457).
        spec = get_dataset(args.dataset_name, num_classes=cfg.num_classes + offset,
                           vocab_file=args.tags_id_lookup_file or None)
        src = TFRecordSource(
            spec, list_shards(args.dataset_dir, args.dataset_split_name),
            PreprocessConfig(output_hw=cfg.image_hw, is_training=False),
            cfg.batch_size, seed=args.seed, repeat=training,
        )
        counter = 0
        for batch in iter(src):
            counter += 1
            imgs = device_pp(jax.random.fold_in(key, counter), jnp.asarray(batch["source"]))
            labels = batch.get("target", batch.get("conditional_labels"))
            if labels is None:
                continue
            labels = jnp.asarray(labels)
            if offset:
                labels = labels[..., offset:]
            yield {"image": imgs, "labels": labels}


def load_config_snapshot(train_dir: str) -> ClassifierConfig:
    """Rebuild the exact trained config from a train dir's config.json
    (esp. the optimizer, whose state shape must match the checkpoint)."""
    import dataclasses
    import json

    data = json.load(open(os.path.join(train_dir, "config.json")))
    opt = OptimizerConfig(**{k: v for k, v in data.pop("opt").items()
                             if k in {f.name for f in dataclasses.fields(OptimizerConfig)}})
    return ClassifierConfig(
        **{k: v for k, v in data.items()
           if k in {f.name for f in dataclasses.fields(ClassifierConfig)} and k != "opt"},
        opt=opt,
    )


def load_trained_classifier(train_dir: str):
    """(trainer, restored state) from a ClassifierTrainer train dir."""
    cfg = load_config_snapshot(train_dir)
    trainer = ClassifierTrainer(cfg)
    state = CheckpointManager(train_dir).restore(
        trainer.init_state(jax.random.PRNGKey(cfg.seed)))
    if state is None:
        raise FileNotFoundError(f"no checkpoint in {train_dir}")
    return trainer, state


def main(argv=None):
    args = build_parser().parse_args(argv)
    snapshot = os.path.join(args.train_dir, "config.json")
    if args.mode != "train" and os.path.exists(snapshot):
        cfg = load_config_snapshot(args.train_dir)
    else:
        cfg = ClassifierConfig(
            network=args.model_name,
            num_classes=args.num_classes - args.labels_offset,
            labels_offset=args.labels_offset,
            multi_label=args.multi_label,
            image_hw=args.train_image_size or 64,
            batch_size=args.batch_size,
            label_smoothing=args.label_smoothing,
            seed=args.seed,
            total_steps=args.max_number_of_steps,
            opt=OptimizerConfig(optimizer=args.optimizer, learning_rate=args.learning_rate,
                                weight_decay=args.weight_decay),
        )
    trainer = ClassifierTrainer(cfg)
    cm = CheckpointManager(args.train_dir)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    restored = cm.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed at step {int(state.step)}")
    elif args.mode != "train":
        # eval/tags/gradcam on random init would print plausible-looking
        # garbage; only train may legitimately start without a checkpoint.
        raise FileNotFoundError(
            f"--mode={args.mode} needs a trained checkpoint in "
            f"{args.train_dir}, found none")

    if args.mode == "train":
        save_config_snapshot(args.train_dir, cfg)
        writer = SummaryWriter(os.path.join(args.train_dir, "logs"))
        batches = make_batches(args, cfg, training=True)
        t0 = time.time()
        while int(state.step) < args.max_number_of_steps:
            state, metrics = trainer.train_step(state, next(batches))
            cur = int(state.step)
            if cur % args.log_every_n_steps == 0:
                rate = args.log_every_n_steps / max(time.time() - t0, 1e-9)
                t0 = time.time()
                print(f"step {cur}/{args.max_number_of_steps} "
                      f"loss={float(metrics['loss']):.4f} {rate:.1f} steps/s")
                writer.scalars(cur, {"loss": float(metrics["loss"]), "steps_per_sec": rate})
            if cur % args.save_every_n_steps == 0:
                cm.save(cur, state)
        cm.save(int(state.step), state)
        writer.close()

    elif args.mode == "eval":
        batches = make_batches(args, cfg, training=False)
        eval_batches = [jax.device_get(next(batches)) for _ in range(args.num_eval_batches)]
        metrics = trainer.evaluate(state, eval_batches)
        print({k: round(v, 4) for k, v in metrics.items()})

    elif args.mode == "tags":
        assert args.tags_id_lookup_file, "--tags_id_lookup_file required for tags mode"
        tag_names = [l.rstrip("\n") for l in open(args.tags_id_lookup_file, encoding="utf-8")]
        # With labels_offset, logit j was trained against vocabulary index
        # j+offset — drop the leading names so write_tags' tag_names[i]
        # lookup stays aligned.
        offset = getattr(cfg, "labels_offset", 0) or args.labels_offset
        if offset:
            tag_names = tag_names[offset:]
        out = args.output_dir or os.path.join(args.train_dir, "tags_out")
        os.makedirs(out, exist_ok=True)
        groups = None
        if args.tags_group_file:
            from twingan_tpu.utils.misc import get_tags_dict

            groups = get_tags_dict(args.tags_group_file, 0, 2)
        batches = make_batches(args, cfg, training=False)
        written = 0
        for _ in range(args.num_eval_batches):
            batch = next(batches)
            names = [f"img_{written + i}" for i in range(len(batch["image"]))]
            trainer.write_tags(
                state, np.asarray(batch["image"]), names, tag_names,
                os.path.join(out, "tags.txt"), threshold=args.tag_threshold,
                labels_id_to_group=groups,
            )
            written += len(names)
        print(f"wrote tags for {written} images to {out}/tags.txt")

    elif args.mode == "gradcam":
        from twingan_tpu.utils.image_io import save_image_grid

        out = args.output_dir or os.path.join(args.train_dir, "gradcam")
        batch = next(make_batches(args, cfg, training=False))
        imgs = jnp.clip(batch["image"], 0.0, 1.0)
        overlays = trainer.grad_cam_images(state, imgs, layer=args.gradcam_layer)
        save_image_grid(os.path.join(out, "gradcam.png"), overlays)
        print(f"wrote {os.path.join(out, 'gradcam.png')}")


if __name__ == "__main__":
    main()
