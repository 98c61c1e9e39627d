"""Miscellaneous helpers (reference util_misc.py equivalents).

Only the pieces with meaning outside TF1 graph-land are re-implemented:
- safe_one_hot_encoding (:89-101): out-of-range labels -> all-zero rows;
- grayscale_to_heatmap (:104-128): blue->red colormap for debug images;
- get_random_patches (:131-160): random square patches from a batch;
- combine_dicts (:167-173): end-point namespacing;
- face-box geometry (:293-335): IoU + box containment used by the serving
  crop logic;
- find_boundary (:338-382): binary boundary search over a predicate.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import numpy as np

import jax
import jax.numpy as jnp


def safe_one_hot_encoding(labels: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    """One-hot with out-of-range labels mapping to all-zeros (the reference
    pads a zero row and reduce-maxes, util_misc.py:89-101)."""
    labels = jnp.asarray(labels)
    valid = (labels >= 0) & (labels < num_classes)
    hot = jax.nn.one_hot(jnp.where(valid, labels, 0), num_classes, dtype=dtype)
    return hot * valid.astype(dtype)[..., None]


def grayscale_to_heatmap(gray: jax.Array, is_bgr: bool = False) -> jax.Array:
    """[...,1] grayscale in [0,1] -> RGB jet heatmap (blue=low, red=high),
    the reference's exact piecewise formula (util_misc.py:114-128)."""
    g = jnp.clip(gray[..., 0] if gray.shape[-1] == 1 else gray, 0.0, 1.0)
    r = jnp.clip(jnp.minimum(4.0 * g - 1.5, -4.0 * g + 4.5), 0.0, 1.0)
    green = jnp.clip(jnp.minimum(4.0 * g - 0.5, -4.0 * g + 3.5), 0.0, 1.0)
    b = jnp.clip(jnp.minimum(4.0 * g + 0.5, -4.0 * g + 2.5), 0.0, 1.0)
    channels = [b, green, r] if is_bgr else [r, green, b]
    return jnp.stack(channels, axis=-1)


def get_random_patches(key: jax.Array, images: jax.Array, patch_hw: int, num_patches: int) -> jax.Array:
    """[N, patch_hw, patch_hw, C] random patches sampled uniformly from the
    batch (reference util_misc.py:131-160)."""
    b, h, w, c = images.shape
    kb, ky, kx = jax.random.split(key, 3)
    bi = jax.random.randint(kb, (num_patches,), 0, b)
    ys = jax.random.randint(ky, (num_patches,), 0, h - patch_hw + 1)
    xs = jax.random.randint(kx, (num_patches,), 0, w - patch_hw + 1)

    def one(i, y, x):
        return jax.lax.dynamic_slice(images[i], (y, x, 0), (patch_hw, patch_hw, c))

    return jax.vmap(one)(bi, ys, xs)


def combine_dicts(dict_of_dicts: Mapping[str, Mapping[str, object]]) -> Dict[str, object]:
    """{'gen': {'output': x}} -> {'gen_output': x} (end-point namespacing)."""
    out: Dict[str, object] = {}
    for prefix, sub in dict_of_dicts.items():
        for k, v in sub.items():
            out[f"{prefix}_{k}"] = v
    return out


def get_tags_dict(path: str, key_column_index=0, value_column_index=2) -> dict:
    """Tab-separated file -> {key column (or line number): value column (or
    whole line)} (reference util_misc.py:253-264)."""
    ret = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            whole = line.rstrip("\n")
            content = whole.split("\t")
            key = i if key_column_index is None else int(content[key_column_index])
            val = whole if value_column_index is None else content[value_column_index]
            ret[key] = val
    return ret


def process_anime_face_labels(labels, classification_threshold: float,
                              labels_id_to_group: dict) -> list:
    """Mutually-exclusive tag-group filter (reference util_misc.py:220-250):
    keep only the max-scoring label within each group; emit NOTHING unless
    both hair color (group '2') and eye color (group '3') clear the
    threshold — an anime-face tagger output must always name both."""
    ret = [0.0] * len(labels)
    group_vals: dict = {}
    for i, val in enumerate(labels):
        group = labels_id_to_group.get(i)
        if group is not None:
            group_vals.setdefault(group, []).append((i, float(val)))
    hair_color_missing = True
    eye_color_missing = True
    for group, vals in group_vals.items():
        idx, best = max(vals, key=lambda x: x[1])
        ret[idx] = best
        if group == "2" and best >= classification_threshold:
            hair_color_missing = False
        if group == "3" and best >= classification_threshold:
            eye_color_missing = False
    if hair_color_missing or eye_color_missing:
        return [0.0] * len(labels)
    return ret


def box_iou(a, b) -> float:
    """IoU of two (x0, y0, x1, y1) boxes."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ix = max(0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / union if union > 0 else 0.0


def box_contains(outer, inner) -> bool:
    return (outer[0] <= inner[0] and outer[1] <= inner[1]
            and outer[2] >= inner[2] and outer[3] >= inner[3])


def find_boundary(predicate: Callable[[int], bool], lo: int, hi: int) -> int:
    """Smallest x in [lo, hi] with predicate(x) True, assuming monotonicity
    (reference util_misc.py:338-382 binary search); hi+1 if none."""
    result = hi + 1
    while lo <= hi:
        mid = (lo + hi) // 2
        if predicate(mid):
            result = mid
            hi = mid - 1
        else:
            lo = mid + 1
    return result
