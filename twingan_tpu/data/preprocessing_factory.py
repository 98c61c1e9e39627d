"""Preprocessing factory: per-model train/eval preprocessing functions.

Reference parity: preprocessing/preprocessing_factory.py:32-99 name->module
map with danbooru as the GAN default and inception/vgg/cifarnet/lenet for
classifiers, plus the postprocessing map.

Each entry returns a jittable batched fn
``(key, images_float01 [B,H,W,C]) -> preprocessed batch`` at output_hw:
- danbooru:  the GAN path (data/preprocess.augment_batch).
- inception: central-crop 0.875 (eval) / random crop+flip+color (train),
             scaled to [-1, 1].
- vgg:       resize + central crop, RGB mean subtraction (x255 scale).
- cifarnet:  random crop + flip + per-image standardization (train).
- lenet:     grayscale + linear scaling to [-1, 1].
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from twingan_tpu.data.preprocess import (
    MEAN_IMAGE_SUBTRACTION_RGB,
    PreprocessConfig,
    _random_crop_batch,
    augment_batch,
    distort_color,
    postprocess_image,
)

# BGR means reversed to RGB (reference preprocessing_util / vgg, x255
# scale) — single source of truth lives in preprocess.py.
VGG_MEANS_RGB = MEAN_IMAGE_SUBTRACTION_RGB


def _resize(x, hw):
    return jax.image.resize(x, (x.shape[0], hw, hw, x.shape[-1]), "bilinear")


def _central_crop(x, fraction: float):
    h, w = x.shape[1], x.shape[2]
    ch, cw = int(h * fraction), int(w * fraction)
    oy, ox = (h - ch) // 2, (w - cw) // 2
    return x[:, oy : oy + ch, ox : ox + cw, :]


def danbooru(output_hw: int, is_training: bool = False, **kw) -> Callable:
    cfg = PreprocessConfig(output_hw=output_hw, is_training=is_training, **kw)

    def fn(key, images):
        return augment_batch(key, images, cfg)

    return fn


def inception(output_hw: int, is_training: bool = False, fast_mode: bool = True) -> Callable:
    def fn(key, images):
        x = images.astype(jnp.float32)
        if is_training:
            k_crop, k_flip, k_sel, k_col = jax.random.split(key, 4)
            crop_hw = max(1, int(x.shape[1] * 0.8))
            x = _random_crop_batch(k_crop, x, crop_hw)
            x = _resize(x, output_hw)
            flips = jax.random.uniform(k_flip, (x.shape[0], 1, 1, 1)) < 0.5
            x = jnp.where(flips, x[:, :, ::-1, :], x)
            ordering = jax.random.randint(k_sel, (), 0, 2 if fast_mode else 4)
            x = distort_color(k_col, x, ordering, fast_mode)
        else:
            x = _central_crop(x, 0.875)
            x = _resize(x, output_hw)
        return x * 2.0 - 1.0  # [-1, 1]

    return fn


def vgg(output_hw: int, is_training: bool = False, resize_side: int = 0) -> Callable:
    means = jnp.asarray(VGG_MEANS_RGB, jnp.float32)

    def fn(key, images):
        x = images.astype(jnp.float32) * 255.0
        side = resize_side or int(output_hw * 1.145)
        x = _resize(x, side)
        if is_training:
            k_crop, k_flip = jax.random.split(key)
            x = _random_crop_batch(k_crop, x, output_hw)
            flips = jax.random.uniform(k_flip, (x.shape[0], 1, 1, 1)) < 0.5
            x = jnp.where(flips, x[:, :, ::-1, :], x)
        else:
            oy = (side - output_hw) // 2
            x = x[:, oy : oy + output_hw, oy : oy + output_hw, :]
        return x - means

    return fn


def cifarnet(output_hw: int = 32, is_training: bool = False, padding: int = 4) -> Callable:
    def fn(key, images):
        x = images.astype(jnp.float32)
        if is_training:
            k_crop, k_flip = jax.random.split(key)
            x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
            x = _random_crop_batch(k_crop, x, output_hw)
            flips = jax.random.uniform(k_flip, (x.shape[0], 1, 1, 1)) < 0.5
            x = jnp.where(flips, x[:, :, ::-1, :], x)
        elif x.shape[1] != output_hw:
            x = _resize(x, output_hw)
        # Per-image standardization (tf.image.per_image_standardization).
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        std = jnp.std(x, axis=(1, 2, 3), keepdims=True)
        n = x.shape[1] * x.shape[2] * x.shape[3]
        return (x - mean) / jnp.maximum(std, 1.0 / jnp.sqrt(float(n)))

    return fn


def lenet(output_hw: int = 28, is_training: bool = False) -> Callable:
    def fn(key, images):
        x = images.astype(jnp.float32)
        if x.shape[-1] == 3:
            x = jnp.mean(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
        if x.shape[1] != output_hw:
            x = _resize(x, output_hw)
        return x * 2.0 - 1.0

    return fn


PREPROCESSORS = {
    "danbooru": danbooru,
    "inception": inception,
    "inception_v1": inception,
    "inception_v3": inception,
    "vgg": vgg,
    "vgg_16": vgg,
    "vgg_19": vgg,
    "vgg_a": vgg,
    "illust2vec": danbooru,
    "cifarnet": cifarnet,
    "lenet": lenet,
}

POSTPROCESSORS = {
    "danbooru": lambda x: postprocess_image(x, "rgb"),
    "inception": lambda x: jnp.clip((x + 1.0) / 2.0, 0.0, 1.0),
    "vgg": lambda x: jnp.clip((x + jnp.asarray(VGG_MEANS_RGB)) / 255.0, 0.0, 1.0),
}


def get_preprocessing(name: str, output_hw: int, is_training: bool = False, **kw) -> Callable:
    if name not in PREPROCESSORS:
        raise ValueError(f"unknown preprocessing {name!r}; known: {sorted(PREPROCESSORS)}")
    return PREPROCESSORS[name](output_hw, is_training=is_training, **kw)


def get_postprocessing(name: str) -> Callable:
    return POSTPROCESSORS.get(name, POSTPROCESSORS["danbooru"])
