"""Evaluation metrics: SWD protocol, MS-SSIM gate, inception score,
streaming loss means.

Reference parity:
- SWD eval protocol (image_generation.py:867-941, docs/infer_and_eval.md:31):
  accumulate `num_images` real/fake pairs, compute sliced Wasserstein per
  Laplacian level down to 16px, report x1e3 with a per-resolution table text
  file ('res\\treal\\tfake' rows + Average), skip when res < 16.
- MS-SSIM (libs/ms_ssim.py API class): paired halves of a batch stream.
- Inception score (image_generation.py:818-861): exp(mean KL(p(y|x) ||
  p(y))) over `splits` splits, given any classifier logits fn.
- Streaming loss eval (model_inheritor.py:777-783,1211-1243): mean of every
  loss over eval batches.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu import ops


def swd_eval(
    key: jax.Array,
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    num_images: int = 8192,
    save_path: Optional[str] = None,
    step: int = 0,
) -> Optional[dict]:
    """Reference SWD protocol; returns {resolution: (real, fake)} x1e3."""
    reals, fakes, n = [], [], 0
    for r, f in zip(real_batches, fake_batches):
        reals.append(np.asarray(r, np.float32))
        fakes.append(np.asarray(f, np.float32))
        n += len(reals[-1])
        if n >= num_images:
            break
    real = np.concatenate(reals)[:num_images]
    fake = np.concatenate(fakes)[:num_images]
    res = real.shape[1]
    if res < 16:
        return None  # 'Not doing swd on small images.'
    scores = np.asarray(
        ops.sliced_wasserstein_distance(key, jnp.asarray(real), jnp.asarray(fake))
    ) * 1e3
    resolutions = []
    r = res
    while r >= 16:
        resolutions.append(r)
        r //= 2
    table = {hw: (float(scores[i][0]), float(scores[i][1])) for i, hw in enumerate(resolutions)}
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
        with open(save_path, "w") as f:
            f.write(f"swd sliced wasserstein score evaluated on {len(real)} images.\n")
            f.write("res\treal\tfake\n")
            for hw in resolutions:
                f.write(f"{hw}\t{table[hw][0]:f}\t{table[hw][1]:f}\n")
            avg = scores.mean(axis=0)
            f.write(f"Average\t{avg[0]:f}\t{avg[1]:f}\n")
    return table


def msssim_eval(batches: Iterable[np.ndarray], num_images: int = 0, max_val: float = 1.0) -> float:
    """Mean MS-SSIM over even/odd pairs within each batch (reference
    libs/ms_ssim.py API.feed: score(images[0::2], images[1::2]))."""
    total, count = 0.0, 0
    for batch in batches:
        batch = np.asarray(batch, np.float32)
        pairs = len(batch) // 2
        if pairs == 0:
            continue
        score = float(
            ops.msssim(jnp.asarray(batch[0 : 2 * pairs : 2]), jnp.asarray(batch[1 : 2 * pairs : 2]),
                       max_val=max_val)
        )
        total += score * pairs
        count += pairs
        if num_images and count * 2 >= num_images:
            break
    return total / max(count, 1)


def pairwise_msssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Direct MS-SSIM between two aligned sets (the fidelity gate)."""
    return float(ops.msssim(jnp.asarray(a), jnp.asarray(b), max_val=max_val))


def inception_score(
    logits_fn: Callable[[jax.Array], jax.Array],
    batches: Iterable[np.ndarray],
    splits: int = 10,
) -> tuple[float, float]:
    """exp(E KL(p(y|x) || p(y))) with the reference's split protocol."""
    preds = []
    for batch in batches:
        logits = np.asarray(logits_fn(jnp.asarray(batch)), np.float32)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        preds.append(e / e.sum(axis=-1, keepdims=True))
    preds = np.concatenate(preds)
    scores = []
    for i in range(splits):
        part = preds[i * len(preds) // splits : (i + 1) * len(preds) // splits]
        if len(part) == 0:
            continue
        kl = part * (np.log(part + 1e-12) - np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def streaming_loss_eval(
    loss_fn: Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]],
    batches: Iterable[Dict[str, np.ndarray]],
    num_batches: int = 0,
) -> Dict[str, float]:
    """Mean of every named loss over eval batches (slim streaming_mean)."""
    sums: Dict[str, float] = {}
    count = 0
    for i, batch in enumerate(batches):
        losses = loss_fn({k: jnp.asarray(v) for k, v in batch.items()})
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        if num_batches and i + 1 >= num_batches:
            break
    return {k: v / max(count, 1) for k, v in sums.items()}
