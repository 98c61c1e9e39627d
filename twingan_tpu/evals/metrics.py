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
    """Reference SWD protocol; returns {resolution: (real, fake)} x1e3.

    Axon-backend caveat: both accumulated sets transfer host->device as one
    fp32 payload each (the sorted-projection protocol needs the full set);
    at the reference's num_images=8192 / 256px that is ~6.4 GB per set,
    which the axon client pins for process lifetime (CLAUDE.md). Full-
    protocol SWD runs should therefore use a dedicated eval process (the
    run_eval CLI already is one); convergence-curve callers pass ~128
    images and are unaffected.
    """
    reals, fakes, n_r, n_f = [], [], 0, 0
    for r, f in zip(real_batches, fake_batches):
        reals.append(np.asarray(r, np.float32))
        fakes.append(np.asarray(f, np.float32))
        n_r += len(reals[-1])
        n_f += len(fakes[-1])
        # Stop only once BOTH sets are full: ragged/unequal batch sizes
        # otherwise leave one set short and the sorted-projection
        # difference below shape-errors mid-jit.
        if n_r >= num_images and n_f >= num_images:
            break
    if not reals or not fakes:
        return None
    n = min(n_r, n_f, num_images)
    real = np.concatenate(reals)[:n]
    fake = np.concatenate(fakes)[:n]
    res = real.shape[1]
    if res < 16:
        return None  # 'Not doing swd on small images.'
    if real.nbytes > 512 * 1024 * 1024:
        # Protocol scale (reference swd_num_images=8192): the one-jit path
        # would hold both sets + pyramids + all repeats in HBM at once.
        from twingan_tpu.ops.swd import sliced_wasserstein_distance_chunked

        scores = sliced_wasserstein_distance_chunked(key, real, fake) * 1e3
    else:
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
    if count == 0:
        # No pairs measured (e.g. batch_size=1 everywhere): 0.0 would read
        # as a perfect diversity score in the 'lower = more diverse' usage.
        return float("nan")
    return total / count


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


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between two Gaussians:
    |mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2))."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        # Regularize singular covariances (small sample counts).
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_statistics(
    features_fn: Callable[[jax.Array], jax.Array],
    batches: Iterable[np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """(mean, covariance) of feature activations over batches of images."""
    feats = []
    for batch in batches:
        f = np.asarray(features_fn(jnp.asarray(batch)), np.float32)
        feats.append(f.reshape(f.shape[0], -1))
    feats = np.concatenate(feats)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def fid(
    features_fn: Callable[[jax.Array], jax.Array],
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
) -> float:
    """Fréchet Inception Distance over ``features_fn`` activations.

    Extends the reference's inception-score protocol
    (image_generation.py:818-861) with the FID the BASELINE quality gate
    asks for ('≥10x train steps/sec at equal MS-SSIM/FID').
    """
    mu_r, sig_r = activation_statistics(features_fn, real_batches)
    mu_f, sig_f = activation_statistics(features_fn, fake_batches)
    return frechet_distance(mu_r, sig_r, mu_f, sig_f)


def inception_pool_features_fn(
    image_hw: int = 64, seed: int = 0, endpoint: str = "Mixed_5b"
) -> Callable[[jax.Array], jax.Array]:
    """Jitted images-[0,1] -> InceptionV3 pooled-feature extractor.

    No pretrained weights are fetchable in this offline environment, so the
    network is deterministically randomly initialized (fixed seed). FID over
    random features is a valid *relative* convergence metric; absolute
    values are not comparable to published FID numbers (documented in
    docs/PERFORMANCE.md). With random init the deep endpoints collapse
    (activation std ~4e-6 at PreLogits vs ~1e-2 at Mixed_5b), so the default
    endpoint is the first mixed block, spatially mean-pooled to [B, 256];
    pass endpoint='PreLogits' when real pretrained weights are imported.
    """
    from twingan_tpu.models.inception import InceptionV3

    net = InceptionV3(num_classes=1)
    init_hw = max(image_hw, 75)  # minimum hw that survives the stride stack
    variables = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, init_hw, init_hw, 3)), train=False
    )

    @jax.jit
    def features(images: jax.Array) -> jax.Array:
        images = images.astype(jnp.float32)
        if images.shape[1] != init_hw:
            images = ops.resize_bilinear(images, init_hw, init_hw)
        images = images * 2.0 - 1.0  # inception preprocessing range
        _, eps_ = net.apply(variables, images, train=False)
        feat = eps_[endpoint]
        if feat.ndim == 4:
            feat = jnp.mean(feat, axis=(1, 2))
        return feat.reshape(images.shape[0], -1)

    return features


def classifier_features_fn(
    classifier_dir: str, layer: str = "PreLogits"
) -> Callable[[jax.Array], jax.Array]:
    """Images-[0,1] -> feature extractor from a TRAINED ClassifierTrainer
    checkpoint dir (see tools/train_fid_classifier.py).

    The absolute-FID weakness of ``inception_pool_features_fn`` (random
    init, no pretrained weights fetchable offline) is closed for synthetic-
    domain runs by training a small classifier on labels derived from the
    domain generator's latent parameters (hue / quadrant / radius / domain)
    and scoring FID in ITS feature space — features that demonstrably encode
    the semantics the translation must preserve. Mirrors the reference's
    own pattern of scoring with a task-trained tagger
    (/root/reference/train_image_classifier.py docstring: the illust2vec
    tagger feeding eval/distillation is itself trained in-repo)."""
    from twingan_tpu.runner.classifier_runner import load_trained_classifier

    trainer, state = load_trained_classifier(classifier_dir)
    cls_hw = trainer.cfg.image_hw

    @jax.jit
    def features(images: jax.Array) -> jax.Array:
        images = images.astype(jnp.float32)
        if images.shape[1] != cls_hw:
            images = ops.resize_bilinear(images, cls_hw, cls_hw)
        _, eps_ = trainer.model.apply(
            {"params": state.params, **state.model_state}, images, train=False
        )
        feat = eps_[layer]
        if feat.ndim == 4:
            feat = jnp.mean(feat, axis=(1, 2))
        return feat.reshape(images.shape[0], -1)

    return features


def streaming_loss_eval(
    loss_fn: Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]],
    batches: Iterable[Dict[str, np.ndarray]],
    num_batches: int = 0,
) -> Dict[str, float]:
    """Mean of every named loss over eval batches (slim streaming_mean)."""
    sums: Dict[str, float] = {}
    count = 0
    for batch in batches:
        losses = loss_fn({k: jnp.asarray(v) for k, v in batch.items()})
        for k, v in losses.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        if num_batches and count >= num_batches:
            break
    return {k: v / max(count, 1) for k, v in sums.items()}
