"""Optimizer + learning-rate-schedule factory (optax).

Reference parity: /root/reference/model/model_inheritor.py:471-565 —
optimizers adadelta/adagrad/adam/ftrl/momentum/rmsprop/sgd with the GAN
defaults adam(beta1=0.5, beta2=0.99, eps=1e-8) lr=0.005, and schedules
fixed/exponential/polynomial. TTUR (separate discriminator LR,
image_generation.py:554-561) is built by constructing a second optimizer
with ``learning_rate=discriminator_learning_rate``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adam"
    learning_rate: float = 0.005
    # Schedules.
    learning_rate_decay_type: str = "fixed"  # fixed | exponential | polynomial
    learning_rate_decay_factor: float = 0.94
    decay_steps: int = 10000                # derived from num_epochs_per_decay
    end_learning_rate: float = 0.0001
    # Adam.
    adam_beta1: float = 0.5
    adam_beta2: float = 0.99
    opt_epsilon: float = 1e-8
    # Momentum / RMSProp.
    momentum: float = 0.9
    rmsprop_momentum: float = 0.9
    rmsprop_decay: float = 0.9
    # Adadelta / Adagrad (reference model_inheritor.py:128-133).
    adadelta_rho: float = 0.95
    adagrad_initial_accumulator_value: float = 0.1
    # FTRL (reference model_inheritor.py:146-157, tf.train.FtrlOptimizer).
    ftrl_learning_rate_power: float = -0.5
    ftrl_initial_accumulator_value: float = 0.1
    ftrl_l1: float = 0.0
    ftrl_l2: float = 0.0
    # L2 regularization (reference weight_decay flag; slim adds an l2 loss
    # term per variable, i.e. wd*param added to the gradient). Implemented
    # as optax.add_decayed_weights BEFORE the optimizer — identical coupled
    # semantics. 0 disables; reference classifier configs default to 4e-5.
    weight_decay: float = 0.0
    # Optional global-norm clip (not in the reference; off by default).
    clip_global_norm: float = 0.0
    # Freeze params whose tree path contains any of these substrings
    # (reference trainable_scopes filtering, model_inheritor.py:647-673;
    # empty tuple = train everything).
    frozen_scopes: tuple = ()

    def replace(self, **kw) -> "OptimizerConfig":
        return dataclasses.replace(self, **kw)


def build_schedule(cfg: OptimizerConfig, updates_per_step: int = 1) -> optax.Schedule:
    """``updates_per_step``: how many times this optimizer updates per
    GLOBAL step. The reference drives every LR schedule from the shared
    global step (model_inheritor.py:471-513; the TTUR d_optimizer is built
    with global_step too), while optax schedules count their own updates —
    a discriminator updating (n_critic-1) times per global step would decay
    (n_critic-1)x too fast. Stretching the step units by the ratio makes
    the optax count measure global steps exactly (the alternation is a
    fixed 1 G + (n_critic-1) D per round)."""
    r = max(1, updates_per_step)
    if cfg.learning_rate_decay_type == "fixed":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.learning_rate_decay_type == "exponential":
        return optax.exponential_decay(
            cfg.learning_rate, cfg.decay_steps * r, cfg.learning_rate_decay_factor, staircase=True
        )
    if cfg.learning_rate_decay_type == "polynomial":
        return optax.polynomial_schedule(
            cfg.learning_rate, cfg.end_learning_rate, power=1.0,
            transition_steps=cfg.decay_steps * r,
        )
    raise ValueError(f"unsupported decay type {cfg.learning_rate_decay_type!r}")


def build_optimizer(
    cfg: OptimizerConfig, updates_per_step: int = 1
) -> optax.GradientTransformation:
    schedule = build_schedule(cfg, updates_per_step)
    name = cfg.optimizer
    if name == "adam":
        tx = optax.adam(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.opt_epsilon)
    elif name == "sgd":
        tx = optax.sgd(schedule)
    elif name == "momentum":
        tx = optax.sgd(schedule, momentum=cfg.momentum)
    elif name == "rmsprop":
        tx = optax.rmsprop(
            schedule, decay=cfg.rmsprop_decay, eps=cfg.opt_epsilon, momentum=cfg.rmsprop_momentum
        )
    elif name == "adagrad":
        tx = optax.adagrad(
            schedule, initial_accumulator_value=cfg.adagrad_initial_accumulator_value
        )
    elif name == "adadelta":
        tx = optax.adadelta(schedule, rho=cfg.adadelta_rho, eps=cfg.opt_epsilon)
    elif name == "ftrl":
        tx = ftrl(
            schedule,
            learning_rate_power=cfg.ftrl_learning_rate_power,
            initial_accumulator_value=cfg.ftrl_initial_accumulator_value,
            l1=cfg.ftrl_l1,
            l2=cfg.ftrl_l2,
        )
    else:
        raise ValueError(f"unsupported optimizer {name!r}")
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    if cfg.clip_global_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_global_norm), tx)
    if cfg.frozen_scopes:
        tx = freeze_scopes(tx, tuple(cfg.frozen_scopes))
    return tx


class FtrlState(NamedTuple):
    count: jax.Array   # schedule step
    accum: optax.Updates
    linear: optax.Updates


def ftrl(
    learning_rate,
    learning_rate_power: float = -0.5,
    initial_accumulator_value: float = 0.1,
    l1: float = 0.0,
    l2: float = 0.0,
) -> optax.GradientTransformation:
    """FTRL-Proximal (McMahan et al. 2013) with tf.train.FtrlOptimizer
    semantics (reference optimizer factory, model_inheritor.py:543-549).

    optax has no FTRL. FTRL is a follow-the-leader method: the new weight is
    a closed-form function of the accumulated (linear, accum) state, so the
    emitted optax update is ``w_new - w``. Per-leaf math mirrors TF's
    ApplyFtrl kernel (p = -learning_rate_power):

        accum' = accum + g^2
        linear' = linear + g - (accum'^p - accum^p) / lr * w
        w' = (sign(linear') * l1 - linear') / (accum'^p / lr + 2 * l2)
             if |linear'| > l1 else 0
    """
    p = -learning_rate_power
    schedule = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init_fn(params):
        return FtrlState(
            count=jnp.zeros([], jnp.int32),
            accum=jax.tree_util.tree_map(
                lambda w: jnp.full_like(w, initial_accumulator_value), params
            ),
            linear=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params to be passed to update()")
        lr = schedule(state.count)

        def leaf(g, a, lin, w):
            g = g.astype(w.dtype)
            a_new = a + g * g
            sigma = (a_new**p - a**p) / lr
            lin_new = lin + g - sigma * w
            quad = a_new**p / lr + 2.0 * l2
            w_new = jnp.where(
                jnp.abs(lin_new) > l1,
                (jnp.sign(lin_new) * l1 - lin_new) / quad,
                jnp.zeros_like(w),
            )
            return w_new - w, a_new, lin_new

        out = jax.tree_util.tree_map(leaf, grads, state.accum, state.linear, params)
        updates = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda o: isinstance(o, tuple))
        accum = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda o: isinstance(o, tuple))
        linear = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda o: isinstance(o, tuple))
        return updates, FtrlState(count=state.count + 1, accum=accum, linear=linear)

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_scopes(tx: optax.GradientTransformation, scopes: tuple) -> optax.GradientTransformation:
    """Zero the final updates for every param whose path contains one of
    ``scopes`` (placed after the optimizer so frozen params never move)."""
    import jax

    def frozen_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda k, _: any(scope in jax.tree_util.keystr(k) for scope in scopes),
            params,
        )

    return optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
