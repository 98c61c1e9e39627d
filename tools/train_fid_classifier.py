"""Train the FID/IS feature classifier for the synthetic translation domains.

Closes the "FID runs on a randomly-initialized InceptionV3" eval weakness
for the published quality runs: no pretrained inception weights are
fetchable offline, but the demo domains (tools/make_demo_domains.py) are
procedurally generated, so ground-truth attribute labels exist for free —
hue (3), center quadrant (4), radius bucket (3), domain (2) — 12 multi-label
bits that a small classifier learns to near-perfect AUC in minutes on CPU.
FID in its PreLogits feature space then measures exactly the semantics the
translation must preserve (color mapping, geometry, style), the same
pattern as the reference training its own illust2vec tagger in-repo to
score/condition anime models (/root/reference/train_image_classifier.py,
datasets/danbooru_2_illust2vec.py).

Trains on BOTH domains (and optionally mild noise augmentation) so the
features stay informative on translated images that interpolate the two.

    python tools/train_fid_classifier.py --out runs/fid_classifier
    python -m twingan_tpu.evals.run_eval --mode=fid \
        --classifier_path runs/fid_classifier ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_LABELS = 12  # hue(3) + quadrant(4) + radius bucket(3) + domain(2)


def params_to_labels(p: dict, hw: int) -> np.ndarray:
    lab = np.zeros(NUM_LABELS, np.float32)
    lab[p["hue"]] = 1.0
    quadrant = (1 if p["cx"] >= hw // 2 else 0) + 2 * (1 if p["cy"] >= hw // 2 else 0)
    lab[3 + quadrant] = 1.0
    lo, hi = hw // 8, hw // 3  # sample_params radius range
    bucket = min(2, int(3 * (p["rad"] - lo) / max(hi - lo, 1)))
    lab[7 + bucket] = 1.0
    # domain bit set by the caller (10 = domain a, 11 = domain b)
    return lab


def make_dataset(n: int, hw: int, seed: int):
    import make_demo_domains as gen

    rng = np.random.RandomState(seed)
    images, labels = [], []
    for _ in range(n):
        p = gen.sample_params(rng, hw)
        base = params_to_labels(p, hw)
        for dom_bit, draw in ((10, gen.draw_a), (11, gen.draw_b)):
            lab = base.copy()
            lab[dom_bit] = 1.0
            images.append(np.asarray(draw(p, hw), np.float32) / 255.0)
            labels.append(lab)
    return np.stack(images), np.stack(labels)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/fid_classifier")
    p.add_argument("--network", default="cifarnet")
    p.add_argument("--hw", type=int, default=32)
    p.add_argument("--n", type=int, default=1500, help="latent draws (x2 domains)")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="cpu",
                   help="cpu keeps this off the TPU (the feature net is tiny)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from twingan_tpu.runner.checkpoint import CheckpointManager, save_config_snapshot
    from twingan_tpu.train.classifier_trainer import ClassifierConfig, ClassifierTrainer
    from twingan_tpu.train.optimizers import OptimizerConfig

    images, labels = make_dataset(args.n, args.hw, args.seed)
    n_eval = max(64, len(images) // 10)
    train_x, train_y = images[:-n_eval], labels[:-n_eval]
    eval_x, eval_y = images[-n_eval:], labels[-n_eval:]

    cfg = ClassifierConfig(
        network=args.network, num_classes=NUM_LABELS, multi_label=True,
        image_hw=args.hw, batch_size=args.batch, seed=args.seed,
        total_steps=args.steps,
        opt=OptimizerConfig(optimizer="adam", learning_rate=args.lr),
    )
    trainer = ClassifierTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    rng = np.random.RandomState(args.seed + 1)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = rng.randint(0, len(train_x), args.batch)
        x = train_x[idx]
        # Mild noise/blur-free augmentation keeps the features robust on GAN
        # outputs (which are never pixel-perfect discs/rings).
        x = np.clip(x + rng.normal(0, 0.02, x.shape).astype(np.float32), 0, 1)
        state, m = trainer.train_step(
            state, {"image": jnp.asarray(x), "labels": jnp.asarray(train_y[idx])}
        )
        if step % 200 == 0 or step == args.steps:
            print(f"step {step}/{args.steps} loss={float(m['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")

    eval_batches = [
        {"image": eval_x[i:i + args.batch], "labels": eval_y[i:i + args.batch]}
        for i in range(0, len(eval_x), args.batch)
    ]
    metrics = trainer.evaluate(state, eval_batches)
    print("held-out:", {k: round(v, 4) for k, v in metrics.items()})

    os.makedirs(args.out, exist_ok=True)
    save_config_snapshot(args.out, cfg)
    CheckpointManager(args.out).save(int(state.step), state)

    # Feature-space sanity: same-distribution FID must sit far below every
    # cross-distribution FID. (No ordering is asserted between b~a and
    # b~noise: in a DISCRIMINATIVE feature space the other training domain
    # is pushed further from b than out-of-distribution noise, by design.)
    from twingan_tpu.evals.metrics import classifier_features_fn, fid

    feats = classifier_features_fn(args.out)
    b_mask = eval_y[:, 11] == 1.0
    b_imgs = eval_x[b_mask]
    a_imgs = eval_x[~b_mask]
    noise = rng.rand(len(b_imgs) // 2, args.hw, args.hw, 3).astype(np.float32)
    sanity = {
        "fid_b_vs_b": fid(feats, [b_imgs[: len(b_imgs) // 2]], [b_imgs[len(b_imgs) // 2:]]),
        "fid_b_vs_a": fid(feats, [b_imgs], [a_imgs]),
        "fid_b_vs_noise": fid(feats, [b_imgs], [noise]),
    }
    print("sanity:", {k: round(v, 3) for k, v in sanity.items()})
    ok = sanity["fid_b_vs_b"] * 3 < min(sanity["fid_b_vs_a"], sanity["fid_b_vs_noise"])
    with open(os.path.join(args.out, "train_report.json"), "w") as f:
        json.dump({"metrics": metrics, "sanity": sanity, "ordered": bool(ok),
                   "steps": args.steps, "hw": args.hw, "network": args.network},
                  f, indent=1)
    print("feature-space separation 3*b~b < min(b~a, b~noise):",
          "OK" if ok else "VIOLATED")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
