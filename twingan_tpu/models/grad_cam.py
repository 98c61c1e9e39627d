"""Grad-CAM class-activation heatmaps.

Reference parity: /root/reference/nets/grad_cam.py:23-102 — gradient of the
target logit w.r.t. a chosen conv end point, spatially-averaged gradient
weights, ReLU-ed weighted activation sum, normalized, bilinearly resized and
imposed on the input image.

JAX formulation: models in the zoo accept a ``probes`` dict adding a zero
tensor at each named end point; d(score)/d(probe) at probe=0 is exactly
d(score)/d(activations), so one jax.grad gives the CAM weights without model
surgery (the functional replacement for tf.gradients on a graph tensor).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def grad_cam(
    apply_fn: Callable[..., tuple[jax.Array, dict]],
    images: jax.Array,
    layer_name: str,
    class_index: Optional[jax.Array | int] = None,
) -> jax.Array:
    """Returns [B, H, W] heatmaps in [0, 1] at the input resolution.

    apply_fn(images, probes=...) -> (logits, end_points) and must expose
    ``layer_name`` as a [B, h, w, c] end point (all zoo models do).
    """
    # Shape only (no compute): the probe must match the end point's shape,
    # and the single real forward pass happens inside the grad below
    # (has_aux returns logits + activations from that same pass).
    acts_shape = jax.eval_shape(lambda im: apply_fn(im)[1][layer_name], images)
    if len(acts_shape.shape) != 4:
        raise ValueError(
            f"Grad-CAM needs a spatial [B,h,w,c] end point; {layer_name!r} "
            f"has shape {acts_shape.shape}. Pick a conv end point."
        )
    if class_index is not None:
        class_index = jnp.asarray(class_index)
        if class_index.ndim == 0:
            class_index = jnp.broadcast_to(class_index, (images.shape[0],))

    def score(probe):
        lg, eps_ = apply_fn(images, probes={layer_name: probe})
        idx = (jnp.argmax(lg, axis=-1) if class_index is None else class_index)
        picked = jnp.take_along_axis(lg, idx[:, None], axis=-1)
        return jnp.sum(picked), eps_[layer_name]

    grads, acts = jax.grad(score, has_aux=True)(
        jnp.zeros(acts_shape.shape, acts_shape.dtype))
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # [B,1,1,C]
    cam = jax.nn.relu(jnp.sum(weights * acts, axis=-1))  # [B,h,w]
    cam = cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-8)
    b = cam.shape[0]
    h, w = images.shape[1], images.shape[2]
    return jax.image.resize(cam, (b, h, w), method="bilinear")


def impose_mask_on_image(image: jax.Array, mask: jax.Array, alpha: float = 0.5) -> jax.Array:
    """Overlay a [H,W] heatmap on a [H,W,3] image (reference
    grad_cam.impose_mask_on_image): heat blend, clipped to [0,1]."""
    heat = jnp.stack([mask, jnp.zeros_like(mask), 1.0 - mask], axis=-1)
    return jnp.clip((1 - alpha) * image + alpha * heat, 0.0, 1.0)
