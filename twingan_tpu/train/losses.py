"""GAN loss library: gan | dragan | wgan | wgan_gp | hinge.

Reference parity: /root/reference/image_generation.py:317-476.
- 'gan'/'dragan': sigmoid cross-entropy (G: fool loss vs ones; D: fake-vs-0
  + real-vs-1); dragan adds a gradient penalty on perturbed real images.
- 'wgan'/'wgan_gp': G: -mean(fake); D: mean(fake) - mean(real); optional
  drift penalty wd*mean(real^2); wgan_gp adds the interpolate GP.
- 'hinge': G: -mean(fake); D: mean(relu(1+fake)) + mean(relu(1-real)).

Gradient penalties use jax.grad through the discriminator closure (the
TPU-native replacement for tf.gradients double-backprop). Predictions are
cast to fp32 before any loss math, matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

ARCHITECTURES = ("gan", "dragan", "wgan", "wgan_gp", "hinge")


@dataclasses.dataclass(frozen=True)
class GanLossConfig:
    architecture: str = "dragan"
    gan_weight: float = 1.0
    gradient_penalty_lambda: float = 10.0
    wgan_drift_loss_weight: float = 0.0

    def __post_init__(self):
        if self.architecture not in ARCHITECTURES:
            raise ValueError(f"unsupported loss architecture {self.architecture!r}")


def _sigmoid_ce(logits: jax.Array, labels: float) -> jax.Array:
    """Mean sigmoid cross entropy vs a constant label (tf.losses semantics)."""
    z = logits.astype(jnp.float32)
    y = jnp.full_like(z, labels)
    # max(z,0) - z*y + log(1+exp(-|z|)) — numerically stable form.
    return jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))


def generator_gan_loss(cfg: GanLossConfig, fake_pred: jax.Array) -> jax.Array:
    """The 'fool the discriminator' term (weighted)."""
    fake_pred = fake_pred.astype(jnp.float32)
    if cfg.architecture in ("wgan", "wgan_gp", "hinge"):
        loss = -jnp.mean(fake_pred)
    else:  # gan / dragan: maximize log D(G(z)).
        loss = _sigmoid_ce(fake_pred, 1.0)
    return cfg.gan_weight * loss


def discriminator_gan_loss(
    cfg: GanLossConfig, fake_pred: jax.Array, real_pred: jax.Array
) -> dict[str, jax.Array]:
    """Real/fake discriminator terms (no gradient penalty — see
    ``gradient_penalty``). Returns a dict of named weighted sub-losses so the
    trainer can log them like the reference's loss collections."""
    fake_pred = fake_pred.astype(jnp.float32)
    real_pred = real_pred.astype(jnp.float32)
    losses: dict[str, jax.Array] = {}
    if cfg.architecture in ("wgan", "wgan_gp"):
        losses["discriminator_loss"] = cfg.gan_weight * (
            jnp.mean(fake_pred) - jnp.mean(real_pred)
        )
        if cfg.wgan_drift_loss_weight:
            losses["discriminator_drift_loss"] = cfg.wgan_drift_loss_weight * jnp.mean(
                jnp.square(real_pred)
            )
    elif cfg.architecture == "hinge":
        losses["discriminator_loss"] = cfg.gan_weight * (
            jnp.mean(jax.nn.relu(1 + fake_pred)) + jnp.mean(jax.nn.relu(1 - real_pred))
        )
    else:  # gan / dragan
        losses["discriminator_fake_loss"] = cfg.gan_weight * _sigmoid_ce(fake_pred, 0.0)
        losses["discriminator_real_loss"] = cfg.gan_weight * _sigmoid_ce(real_pred, 1.0)
    return losses


def perturbed_batch(key: jax.Array, x: jax.Array) -> jax.Array:
    """DRAGAN perturbation: x + 0.5 * std(x) * U(-1, 1), std over the whole
    minibatch. DELIBERATE DIVERGENCE from the reference
    (image_generation.py:442-447): it indexes tf.nn.moments(...)[1] — the
    VARIANCE — where the DRAGAN paper's radius uses the standard deviation;
    for [0,1] images var≈0.08 vs std≈0.29, so the reference perturbs ~3.6x
    less than intended. The paper's formulation is used here."""
    std = jnp.std(x)
    noise = jax.random.uniform(key, x.shape, x.dtype, -1.0, 1.0)
    return x + 0.5 * std * noise


def gradient_penalty(
    cfg: GanLossConfig,
    key: jax.Array,
    dis_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array | None,
) -> jax.Array:
    """Unified WGAN-GP / DRAGAN gradient penalty, weighted by lambda.

    - wgan_gp: interpolate between real and fake (fake required).
    - dragan: interpolate between real and a noise-perturbed real batch.
    ``dis_fn`` maps images -> predictions with discriminator params closed
    over (gradients flow to them through the double-backprop).
    """
    if cfg.architecture not in ("wgan_gp", "dragan"):
        return jnp.float32(0)
    k_alpha, k_perturb = jax.random.split(key)
    alpha_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(k_alpha, alpha_shape, jnp.float32)
    if cfg.architecture == "wgan_gp":
        assert fake is not None, "wgan_gp needs the generated batch"
        endpoint = fake.astype(jnp.float32)
    else:
        endpoint = perturbed_batch(k_perturb, real.astype(jnp.float32))
    real = real.astype(jnp.float32)
    interpolates = real + alpha * (endpoint - real)

    def pred_sum(images):
        return jnp.sum(dis_fn(images).astype(jnp.float32))

    grads = jax.grad(pred_sum)(interpolates)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads.astype(jnp.float32)),
                              axis=tuple(range(1, grads.ndim))) + 1e-12)
    return cfg.gradient_penalty_lambda * jnp.mean(jnp.square(slopes - 1.0))


def l1_loss(a: jax.Array, b: jax.Array, weight: float = 1.0) -> jax.Array:
    """tf.losses.absolute_difference (mean reduction)."""
    return weight * jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def cosine_distance_loss(expected: jax.Array, embedding: jax.Array, weight: float = 1.0) -> jax.Array:
    """tf.losses.cosine_distance on l2-normalized vectors (mean over batch)."""
    e = expected.astype(jnp.float32)
    m = embedding.astype(jnp.float32)
    e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-12)
    return weight * jnp.mean(1.0 - jnp.sum(e * m, axis=-1))
