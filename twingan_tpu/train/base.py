"""Shared GAN trainer base: schedules, jitted step wrappers, and the
on-device multi-round lax.scan loop.

The reference's train loop crosses Python<->C++ per session.run
(SURVEY.md section 3.1 'HOT LOOP'); the host-loop equivalent here pays one
dispatch per step through the TPU tunnel. ``scan_rounds`` compiles N
(G + (n_critic-1) D) rounds into one XLA while-loop over pre-staged batches,
so small-resolution PGGAN stages run at device speed instead of
dispatch speed.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from twingan_tpu import ops
from twingan_tpu.ops import renorm_clipping_schedule


class BaseGanTrainer:
    """Subclasses implement _g_step / _d_step (pure functions of
    (state, batch, rng)) and expose self.cfg with model/n_critic/growth
    fields."""

    # ------------------------------------------------------------------ #
    # Schedules shared by every trainer.
    # ------------------------------------------------------------------ #
    def _alpha(self, step: jax.Array) -> jax.Array:
        cfg = self.cfg
        if not cfg.model.is_growing:
            return jnp.float32(0)
        denom = max(cfg.max_steps - cfg.grow_start_step, 1)
        return (step - cfg.grow_start_step).astype(jnp.float32) / denom

    def _renorm_clip(self, step: jax.Array) -> Optional[dict]:
        if self.cfg.model.norm_type != "batch_renorm":
            return None
        return renorm_clipping_schedule(step)

    def growing_image(self, x: jax.Array, alpha: jax.Array) -> jax.Array:
        """Fade-in blend of the input with its low-res self
        (reference image_generation.get_growing_image :1001-1006)."""
        if not self.cfg.model.is_growing:
            return x
        low = ops.upsample_nearest_2x(ops.avg_pool_2x(x))
        return ops.blend(x, low, alpha)

    # ------------------------------------------------------------------ #
    # Jitted wrappers.
    # ------------------------------------------------------------------ #
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def g_step(self, state, batch, rng):
        return self._g_step(state, batch, rng)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def d_step(self, state, batch, rng):
        return self._d_step(state, batch, rng)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_metrics(self, state, batch, rng):
        """Loss metrics WITHOUT donating or mutating the state — for
        streaming eval (reference slim streaming loss means,
        model_inheritor.py:1211-1243). The updated state is discarded; no
        donation means the caller's state stays valid across batches."""
        _, metrics = self._g_step(state, batch, rng)
        return metrics

    def round_step(self, state, batches, rng: jax.Array):
        """One n-critic round, host-dispatched: G first, then n_critic-1 D
        updates (reference counter semantics, image_generation.py:640-651)."""
        state, metrics = self.g_step(state, batches[0], rng)
        metrics = dict(metrics)
        for i in range(1, self.cfg.n_critic):
            state, d_metrics = self.d_step(state, batches[i], rng)
            metrics.update(d_metrics)
        return state, metrics

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def scan_rounds(self, state, batches, rng: jax.Array):
        """N rounds fully on device. ``batches`` leaves are stacked
        [n_rounds, n_critic, batch, ...]; per-step PRNG keys derive from the
        advancing critic counter, identical to the host loop. Returns the
        final state and per-round stacked metrics."""
        n_critic = self.cfg.n_critic

        def body(state, round_batches):
            state, metrics = self._g_step(
                state, jax.tree_util.tree_map(lambda x: x[0], round_batches), rng
            )
            metrics = dict(metrics)
            for i in range(1, n_critic):
                state, d_metrics = self._d_step(
                    state, jax.tree_util.tree_map(lambda x: x[i], round_batches), rng
                )
                metrics.update(d_metrics)
            return state, metrics

        return jax.lax.scan(body, state, batches)
