"""Sliced Wasserstein Distance (SWD) eval metric, fully on-device.

Reference parity: the reference calls tf.contrib.gan's
``sliced_wasserstein_distance(real, fake, patches_per_image=128,
random_sampling_count=4, random_projection_dim=128)`` and reports scores x1e3
per Laplacian-pyramid resolution from the training resolution down to 16
(/root/reference/image_generation.py:867-941, docs/infer_and_eval.md:31).

Algorithm (the PGGAN paper's protocol):
1. Build a Laplacian pyramid of both image sets, levels res, res/2, ..., 16.
2. At each level extract ``patches_per_image`` random 7x7xC patch descriptors.
3. Normalize descriptors by the per-channel mean/std of the whole set —
   EACH set independently (PGGAN's finalize_descriptors). Note: per-set
   normalization makes a global mean/scale shift between real and fake
   invisible to the metric (the paper's choice; tf.contrib.gan's port
   normalizes per patch, which has the same blind spot); scores here are
   self-consistent but not numerically interchangeable with contrib's.
4. Project onto ``random_projection_dim`` random unit directions, sort along
   the patch axis, take mean |sorted_a - sorted_b|; average over
   ``random_sampling_count`` independent samplings.
5. Report (real-vs-real-split, real-vs-fake) per level.

Everything is jittable; the sort dominates and maps to XLA's on-device sort.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# 5x5 binomial kernel for the gaussian pyramid, [1,4,6,4,1]/16 outer product.
_GAUSS_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0
_GAUSS_5X5 = np.outer(_GAUSS_1D, _GAUSS_1D).astype(np.float32)

PATCH_SIZE = 7


def _blur(x: jax.Array) -> jax.Array:
    c = x.shape[-1]
    k = jnp.broadcast_to(jnp.asarray(_GAUSS_5X5)[:, :, None, None], (5, 5, 1, c))
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _pyr_down(x: jax.Array) -> jax.Array:
    return _blur(x)[:, ::2, ::2, :]


def _pyr_up(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    up = jnp.zeros((b, h * 2, w * 2, c), x.dtype).at[:, ::2, ::2, :].set(x)
    return _blur(up) * 4.0


def laplacian_pyramid(x: jax.Array, min_res: int = 16) -> list[jax.Array]:
    """Levels from the input resolution down to ``min_res`` (the last level is
    the low-pass residual)."""
    levels = []
    cur = x.astype(jnp.float32)
    while cur.shape[1] > min_res:
        down = _pyr_down(cur)
        levels.append(cur - _pyr_up(down))
        cur = down
    levels.append(cur)
    return levels


def _extract_patches(key: jax.Array, level: jax.Array, patches_per_image: int) -> jax.Array:
    """[B, P, 7*7*C] random patch descriptors."""
    b, h, w, c = level.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b, patches_per_image), 0, h - PATCH_SIZE + 1)
    xs = jax.random.randint(kx, (b, patches_per_image), 0, w - PATCH_SIZE + 1)

    def one_patch(img, y, x):
        return lax.dynamic_slice(img, (y, x, 0), (PATCH_SIZE, PATCH_SIZE, c))

    patches = jax.vmap(jax.vmap(one_patch, in_axes=(None, 0, 0)), in_axes=(0, 0, 0))(
        level, ys, xs
    )  # [B, P, 7, 7, C]
    return patches


def _normalize_descriptors(patches: jax.Array) -> jax.Array:
    """Normalize by per-channel mean/std over the entire descriptor set, then
    flatten to [num_desc, 7*7*C]."""
    mean = jnp.mean(patches, axis=(0, 1, 2, 3), keepdims=True)
    std = jnp.std(patches, axis=(0, 1, 2, 3), keepdims=True) + 1e-8
    normed = (patches - mean) / std
    return normed.reshape(-1, PATCH_SIZE * PATCH_SIZE * patches.shape[-1])


def _sliced_distance(
    key: jax.Array, a: jax.Array, b: jax.Array, proj_dim: int, repeats: int
) -> jax.Array:
    dim = a.shape[-1]

    def one(key):
        dirs = jax.random.normal(key, (dim, proj_dim), jnp.float32)
        dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
        pa = jnp.sort(a @ dirs, axis=0)
        pb = jnp.sort(b @ dirs, axis=0)
        return jnp.mean(jnp.abs(pa - pb))

    return jnp.mean(jax.vmap(one)(jax.random.split(key, repeats)))


@functools.partial(
    jax.jit, static_argnames=("patches_per_image", "random_sampling_count", "random_projection_dim", "min_res")
)
def sliced_wasserstein_distance(
    key: jax.Array,
    real: jax.Array,
    fake: jax.Array,
    patches_per_image: int = 128,
    random_sampling_count: int = 4,
    random_projection_dim: int = 128,
    min_res: int = 16,
) -> jax.Array:
    """Returns [num_levels, 2]: (real-vs-real-split, real-vs-fake) per level.

    Multiply by 1e3 for PGGAN-paper scale. Requires input res >= 16 and an
    even real batch (split in half for the real-real baseline).
    """
    real_pyr = laplacian_pyramid(real, min_res)
    fake_pyr = laplacian_pyramid(fake, min_res)
    out = []
    for i, (rl, fl) in enumerate(zip(real_pyr, fake_pyr)):
        k_patch_r, k_patch_f, k_proj_rr, k_proj_rf = jax.random.split(
            jax.random.fold_in(key, i), 4
        )
        r_desc = _normalize_descriptors(_extract_patches(k_patch_r, rl, patches_per_image))
        f_desc = _normalize_descriptors(_extract_patches(k_patch_f, fl, patches_per_image))
        half = r_desc.shape[0] // 2
        d_real = _sliced_distance(
            k_proj_rr, r_desc[:half], r_desc[half : 2 * half], random_projection_dim, random_sampling_count
        )
        d_fake = _sliced_distance(k_proj_rf, r_desc, f_desc, random_projection_dim, random_sampling_count)
        out.append(jnp.stack([d_real, d_fake]))
    return jnp.stack(out)
