"""Train state pytree + module application helpers.

The reference keeps global_step / n_critic_counter / gdrop_strength / loss-EMA
as TF1 graph variables (image_generation.py:563-651); here they are explicit
fields of one flax.struct dataclass that flows through the jitted steps.

``params`` and ``model_state`` are dicts keyed by network name ('generator',
'discriminator', 'encoder_content', ...) — the functional replacement for the
reference's variable scopes: generator-side optimization takes grads w.r.t.
exactly the generator-side subtrees (model_inheritor _get_variables_to_train).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct
import optax


@flax.struct.dataclass
class GanTrainState:
    step: jax.Array                      # global step: increments on G updates
    critic_step: jax.Array               # total micro-steps (G + D)
    params: Dict[str, Any]               # per-network param trees
    model_state: Dict[str, Any]          # per-network {batch_stats, spectral}
    gen_opt_state: optax.OptState
    dis_opt_state: optax.OptState
    gdrop_strength: jax.Array
    gen_loss_ema: jax.Array
    # Optional Polyak average of the generator-side params, used at eval
    # (reference moving-average variable restore, model_inheritor.py:1150).
    gen_ema_params: Any = None


def apply_model(
    module: nn.Module,
    params: Any,
    model_state: Dict[str, Any],
    *args,
    train: bool = False,
    update_state: bool = False,
    rngs: Optional[dict] = None,
    remat: bool = False,
    **kwargs,
):
    """Apply a Flax module with explicit state threading.

    Returns (outputs, new_model_state). With update_state=False the state is
    returned unchanged (e.g. the discriminator's forward inside a generator
    step must not advance batch stats or spectral-norm power iterations —
    matching the reference's scope-filtered update ops,
    image_generation.py:626-629). Train-mode forwards still run with the
    collections writable (stock flax modules like nn.BatchNorm always write
    in train mode); the written state is simply discarded.

    remat=True wraps the apply in jax.checkpoint, so the backward pass
    recomputes this pass's activations instead of keeping them live — with
    TwinGAN's 4 generator + 6 discriminator passes per step this bounds
    peak memory to roughly one pass's activations (FLOPs-for-HBM trade;
    the reference has no equivalent — TF1 kept every pass's activations).
    Static (int/bool/str/None) kwargs stay out of the traced call so
    domain/bank selection and shape-affecting flags remain Python values.
    """
    variables = {"params": params, **model_state}
    mutable = list(model_state.keys()) if ((update_state or train) and model_state) else False
    if remat:
        static_kw = {
            k: v for k, v in kwargs.items()
            if v is None or isinstance(v, (bool, int, str))
        }
        traced_kw = {k: v for k, v in kwargs.items() if k not in static_kw}

        def _run(variables, rngs, args, traced_kw):
            return module.apply(
                variables, *args, train=train, rngs=rngs, mutable=mutable,
                **static_kw, **traced_kw,
            )

        out = jax.checkpoint(_run)(variables, rngs, tuple(args), traced_kw)
    else:
        out = module.apply(
            variables, *args, train=train, rngs=rngs, mutable=mutable, **kwargs
        )
    if mutable:
        out, new_state = out
        return out, (dict(new_state) if update_state else model_state)
    return out, model_state


def init_model(module: nn.Module, rng: jax.Array, *args, extra_rngs: Optional[dict] = None, **kwargs):
    """Initialize a module; returns (params, model_state)."""
    variables = module.init({"params": rng, **(extra_rngs or {})}, *args, **kwargs)
    variables = dict(variables)
    params = variables.pop("params")
    return params, {k: v for k, v in variables.items()}


def update_gdrop_state(
    state_ema: jax.Array,
    gen_loss: jax.Array,
    step: jax.Array,
    coef: float,
    lim: float,
    exp: float,
    ema_decay: float = 0.9,
) -> tuple[jax.Array, jax.Array]:
    """gdrop strength schedule (reference image_generation.py:563-585):
    after step 100, strength = coef * max(clip(loss,0,1) - lim, 0) ** exp.

    Strength is computed from the RAW clipped current loss — the reference
    creates a 0.9-decay EMA of it but never reads the average (its
    `ema.apply` op runs purely as a control dependency); the EMA is still
    maintained here as observability state, matching that quirk exactly.
    """
    cur = jnp.clip(gen_loss.astype(jnp.float32), 0.0, 1.0)
    new_ema = state_ema * ema_decay + cur * (1.0 - ema_decay)
    gdrop_coef = jnp.where(step > 100, coef, 0.0)
    strength = gdrop_coef * jnp.power(jnp.maximum(cur - lim, 0.0), exp)
    return new_ema, strength


def polyak_update(ema_params: Any, params: Any, decay: float) -> Any:
    """EMA of the generator-side params (tf.train.ExponentialMovingAverage)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )
