"""Functional normalization cores: batch norm, instance norm, batch renorm.

These are the stateless math kernels; parameter/state management (per-domain
param banks, conditional beta/gamma from style embeddings) lives in the Flax
layers (twingan_tpu/models/layers.py).

Reference parity:
- batch norm moments over NHW + moving-average update:
  /root/reference/libs/batch_norm.py:396-470,289-319.
- batch renorm r/d corrections with unbiased (weight-debiased) EMAs:
  /root/reference/libs/batch_norm.py:329-393 (momentum 0.99).
- renorm clip schedule over the global step:
  /root/reference/nets/pggan_utils.py:43-47,207-223.
- instance norm per-sample HW moments: /root/reference/libs/instance_norm.py.

TPU notes: when an ``axis_name`` is given, batch moments are averaged across
the data-parallel mesh axis with ``lax.pmean`` (synced batch norm). The
reference computes per-GPU moments independently; sync is a config switch
(SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax import lax

# Piecewise-constant batch renorm clipping schedule (global step restarts at 0
# each PGGAN stage).
RENORM_BOUNDARIES = (10000, 20000, 30000)
RENORM_RMAX = (1.1, 1.5, 2.0, 4.0)
RENORM_RMIN = (0.9, 0.66, 0.5, 0.25)
RENORM_DMAX = (0.1, 0.3, 0.5, 1.0)


def renorm_clipping_schedule(step: jax.Array) -> dict[str, jax.Array]:
    """Piecewise-constant rmax/rmin/dmax as functions of the (traced) step."""
    # tf.train.piecewise_constant semantics: values[i] while step <= boundaries[i].
    idx = jnp.searchsorted(jnp.asarray(RENORM_BOUNDARIES), step, side="left")

    def pick(values):
        return jnp.asarray(values, jnp.float32)[idx]

    return {"rmax": pick(RENORM_RMAX), "rmin": pick(RENORM_RMIN), "dmax": pick(RENORM_DMAX)}


def moments(
    x: jax.Array, axes: tuple[int, ...], axis_name: str | None = None
) -> tuple[jax.Array, jax.Array]:
    """Mean/variance over ``axes`` (optionally synced over a mesh axis).

    Uses the E[x^2] - E[x]^2 form so the cross-device sync is a single fused
    pmean over stacked (mean, mean_sq) rather than two round trips.
    """
    mean = jnp.mean(x, axis=axes)
    mean_sq = jnp.mean(jnp.square(x), axis=axes)
    if axis_name is not None:
        mean, mean_sq = lax.pmean((mean, mean_sq), axis_name=axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0)
    return mean, var


def normalize(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    gamma: jax.Array | None,
    beta: jax.Array | None,
    eps: float = 1e-3,
) -> jax.Array:
    """y = (x - mean) * rsqrt(var + eps) * gamma + beta, broadcast on channels."""
    inv = lax.rsqrt(var + jnp.asarray(eps, var.dtype))
    y = (x - mean) * inv
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def batch_renorm_correction(
    batch_mean: jax.Array,
    batch_var: jax.Array,
    state: Mapping[str, jax.Array],
    clipping: Mapping[str, jax.Array],
    momentum: float = 0.99,
    eps: float = 1e-3,
) -> tuple[jax.Array, jax.Array, dict[str, jax.Array]]:
    """Batch-renorm r/d corrections plus updated renorm state.

    ``state`` holds float32: renorm_mean, renorm_mean_weight (scalar),
    renorm_stddev, renorm_stddev_weight (scalar). The EMAs are kept biased and
    debiased by dividing by the weight EMA, matching the reference exactly.

    Returns (r, d, new_state); r/d already stop-gradiented. The renormalized
    output is ``normalize(x, batch_mean, batch_var) * r + d`` folded into
    gamma/beta by the caller.
    """
    mean = batch_mean.astype(jnp.float32)
    stddev = jnp.sqrt(batch_var.astype(jnp.float32) + eps)

    # Average moments "as if initialized with this batch's moments".
    mixed_mean = state["renorm_mean"] + (1.0 - state["renorm_mean_weight"]) * mean
    mixed_stddev = state["renorm_stddev"] + (1.0 - state["renorm_stddev_weight"]) * stddev

    r = stddev / mixed_stddev
    d = (mean - mixed_mean) / mixed_stddev
    r = jnp.clip(r, clipping["rmin"], clipping["rmax"])
    d = jnp.clip(d, -clipping["dmax"], clipping["dmax"])
    r = lax.stop_gradient(r)
    d = lax.stop_gradient(d)

    decay = momentum
    new_state = {
        "renorm_mean": state["renorm_mean"] * decay + mean * (1 - decay),
        "renorm_mean_weight": state["renorm_mean_weight"] * decay + (1 - decay),
        "renorm_stddev": state["renorm_stddev"] * decay + stddev * (1 - decay),
        "renorm_stddev_weight": state["renorm_stddev_weight"] * decay + (1 - decay),
    }
    return r, d, new_state


def renorm_moving_moments(
    state: Mapping[str, jax.Array], eps: float = 1e-3
) -> tuple[jax.Array, jax.Array]:
    """The unbiased mean/variance implied by the renorm state (for the moving
    average update: new_variance = new_stddev**2 - eps, reference :390-391)."""
    new_mean = state["renorm_mean"] / state["renorm_mean_weight"]
    new_stddev = state["renorm_stddev"] / state["renorm_stddev_weight"]
    new_var = jnp.square(new_stddev) - eps
    return new_mean, new_var


def update_moving(
    moving: jax.Array, value: jax.Array, decay: float
) -> jax.Array:
    """assign_moving_average without zero-debias: m <- m*decay + v*(1-decay)."""
    return moving * decay + value.astype(moving.dtype) * (1 - decay)


def instance_moments(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-sample spatial moments for instance norm (NHWC -> [B,1,1,C])."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    return mean, var


def tree_any_nan(tree: Any) -> jax.Array:
    """True if any leaf contains a non-finite value (debug/failure detection;
    the runner's NaN-recovery probes losses directly, this is the pytree
    form for ad-hoc state inspection)."""
    flags = [
        jnp.any(~jnp.isfinite(l))
        for l in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    ]
    if not flags:
        return jnp.asarray(False)
    return jnp.any(jnp.stack(flags))
