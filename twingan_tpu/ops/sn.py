"""Spectral normalization via power iteration (functional core).

Reference parity: /root/reference/libs/sn.py:38-101. The reference keeps a
persistent ``u`` vector per weight and runs one power iteration on every
forward pass (updating ``u`` in place even at inference — warned about at
sn.py:80-82). Here the iteration is explicit state: the layer passes the old
``u`` in and receives the new one, updated once per optimization step, which
is the mathematically intended behavior.

Gradient semantics match the reference (sn.py:86-89): the power-iteration
vectors u/v are gradient-stopped, but sigma = v'Wu is computed on the LIVE
weight, so d(W/sigma)/dW carries the -(v'Wu)·W/sigma^2 term of the Miyato
spectral-norm formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def _l2norm(v: jax.Array) -> jax.Array:
    return v * lax.rsqrt(jnp.sum(jnp.square(v)) + _EPS)


def power_iteration(
    w_mat: jax.Array, u: jax.Array, num_iters: int = 1
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One (or more) rounds of power iteration on a [in, out] matrix.

    Returns (sigma, new_u, v). u and v are gradient-stopped and sigma = v'Wu
    is evaluated on the live ``w_mat`` so gradients flow through the
    normalization — the envelope gradient of the spectral norm (Danskin).
    DELIBERATE DIVERGENCE from the reference (libs/sn.py:62-89): there the
    power-iteration chain itself is differentiable (no stop_gradient on
    u/v), adding iteration-path terms to dW that vanish at the fixed point;
    the stopped form is the standard Miyato formulation.
    """
    w_stop = lax.stop_gradient(w_mat)
    v = None
    for _ in range(num_iters):
        v = _l2norm(u @ w_stop.T)  # [in]
        u = _l2norm(v @ w_stop)  # [out]
    u = lax.stop_gradient(u)
    v = lax.stop_gradient(v)
    sigma = jnp.einsum("i,io,o->", v, w_mat, u)
    return sigma, u, v


def spectral_normalize(
    w: jax.Array, u: jax.Array, num_iters: int = 1, update: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Normalize an arbitrary-rank weight by its largest singular value.

    ``w`` is reshaped to [prod(leading dims), out_channels] like the
    reference. ``u`` has shape [out_channels]. Returns (w / sigma, new_u);
    new_u equals u when update=False (inference).
    """
    out_ch = w.shape[-1]
    w_mat = w.reshape(-1, out_ch)
    sigma, new_u, _ = power_iteration(w_mat.astype(jnp.float32), u, num_iters)
    w_sn = w / jnp.maximum(sigma, _EPS).astype(w.dtype)
    return w_sn, (new_u if update else u)
