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


# --------------------------------------------------------------------------- #
# Protocol-scale chunked path (reference image_generation.py:867-941 runs the
# SWD protocol at swd_num_images=8192). The one-jit function above holds both
# full image sets, their pyramids and all sampling repeats live at once —
# ~6.4 GB/set of inputs alone at 8192x256px, past a v5e's HBM. This path
# streams images through descriptor extraction in bounded chunks and runs the
# projection/sort per level per repeat, keeping device residency to one
# level's descriptor set (~1.2 GB at protocol scale).
# --------------------------------------------------------------------------- #


@functools.partial(jax.jit, static_argnames=("patches_per_image", "min_res"))
def _chunk_descriptors(key, chunk, patches_per_image: int, min_res: int):
    """Raw (unnormalized) [B, P, 7, 7, C] patch descriptors per pyramid
    level for one image chunk. Normalization is deferred: the PGGAN
    protocol normalizes by the WHOLE set's per-channel moments."""
    return [
        _extract_patches(jax.random.fold_in(key, i), lvl, patches_per_image)
        for i, lvl in enumerate(laplacian_pyramid(chunk, min_res))
    ]


@jax.jit
def _projected_sorted(key, desc):
    """Project a [N, D] descriptor set onto 128 random unit directions and
    sort along N (one sampling repeat; fold the repeat index into `key`)."""
    dim = desc.shape[-1]
    dirs = jax.random.normal(key, (dim, 128), jnp.float32)
    dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
    return jnp.sort(desc @ dirs, axis=0)


def sliced_wasserstein_distance_chunked(
    key: jax.Array,
    real: "np.ndarray",
    fake: "np.ndarray",
    patches_per_image: int = 128,
    random_sampling_count: int = 4,
    min_res: int = 16,
    chunk: int = 256,
) -> "np.ndarray":
    """Same contract as sliced_wasserstein_distance ([num_levels, 2] scores)
    for sets too large to hold on device; host-side numpy in, numpy out.

    Device residency is bounded by max(one image chunk + its pyramid, one
    level's descriptors + one repeat's projections); everything else
    accumulates in host RAM as float32 numpy.
    """
    assert real.shape == fake.shape, (real.shape, fake.shape)
    n = real.shape[0]
    per_set_levels = {0: [], 1: []}
    for set_i, images in enumerate((real, fake)):
        kset = jax.random.fold_in(key, set_i)
        for lo in range(0, n, chunk):
            part = jnp.asarray(images[lo : lo + chunk], jnp.float32)
            levels = _chunk_descriptors(
                jax.random.fold_in(kset, lo), part, patches_per_image, min_res
            )
            for li, lvl in enumerate(levels):
                if len(per_set_levels[set_i]) <= li:
                    per_set_levels[set_i].append([])
                per_set_levels[set_i][li].append(np.asarray(lvl, np.float32))

    out = []
    for li, (r_parts, f_parts) in enumerate(
        zip(per_set_levels[0], per_set_levels[1])
    ):
        # Whole-set normalization (finalize_descriptors), then flatten.
        descs = []
        for parts in (r_parts, f_parts):
            p = np.concatenate(parts)  # [N, P, 7, 7, C]
            mean = p.mean(axis=(0, 1, 2, 3), keepdims=True)
            std = p.std(axis=(0, 1, 2, 3), keepdims=True) + 1e-8
            descs.append(
                ((p - mean) / std).reshape(-1, PATCH_SIZE * PATCH_SIZE * p.shape[-1])
            )
        r_desc, f_desc = descs
        half = len(r_desc) // 2
        # Upload each descriptor set once per level and reuse across
        # sampling repeats (the axon tunnel moves ~50 MB/s and pins every
        # payload; re-uploading ~600 MB per repeat would quadruple both).
        r_dev = jnp.asarray(r_desc)
        f_dev = jnp.asarray(f_desc)
        d_real = d_fake = 0.0
        for rep in range(random_sampling_count):
            k_rr, k_rf = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(key, 1000 + li), rep)
            )
            ra = _projected_sorted(k_rr, r_dev[:half])
            rb = _projected_sorted(k_rr, r_dev[half : 2 * half])
            d_real += float(jnp.mean(jnp.abs(ra - rb)))
            pa = _projected_sorted(k_rf, r_dev)
            pb = _projected_sorted(k_rf, f_dev)
            d_fake += float(jnp.mean(jnp.abs(pa - pb)))
        del r_dev, f_dev
        out.append([d_real / random_sampling_count, d_fake / random_sampling_count])
    return np.asarray(out, np.float32)
