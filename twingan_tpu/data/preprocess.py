"""Image preprocessing: host-side variable-size handling + device-side
(jit, batched) augmentation.

Reference parity: preprocessing/danbooru_preprocessing.py +
preprocessing_util.py. The split is TPU-first: anything that depends on the
variable input size (decode, pad/crop-to-square, resize) runs on the host per
image; everything fixed-shape (random crop, flip, color distortion, color
space) is one fused jitted function over the whole batch on device, so
augmented batches never round-trip to the host.

- resize modes NONE/PAD/CROP/RESHAPE/RANDOM_CROP(+AND_RESHAPE)
  (preprocessing_util.py:19-146);
- train path: optional random crop at ratio 0.8 (resize to hw/0.8 on host,
  crop back to hw on device), random horizontal flip with optionally shared
  randomness across paired inputs, 4-way color distortion (fast mode =
  brightness+saturation only), clip to [0,1]
  (danbooru_preprocessing.py:185-211,61-112);
- color spaces rgb/yiq/bgr/gray with exact YIQ matrices
  (preprocessing_util.py:148-169) and the postprocess inverse
  (danbooru_preprocessing.py:233-255).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
from PIL import Image as PILImage

import jax
import jax.numpy as jnp

RESIZE_MODES = ("NONE", "PAD", "CROP", "RESHAPE", "RANDOM_CROP", "RANDOM_CROP_AND_RESHAPE")

RGB_TO_YIQ = np.array(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]], np.float32
)
YIQ_TO_RGB = np.array(
    [[1, 0.956, 0.621], [1, -0.272, -0.647], [1, -1.106, 1.703]], np.float32
)
RANDOM_CROP_RATIO = 0.8
# Reference _MEAN_IMAGE_SUBTRACTION_BGR reversed to RGB order
# (danbooru_preprocessing.py:193-196): used for vgg19 feature extraction.
MEAN_IMAGE_SUBTRACTION_RGB = (123.68, 116.779, 103.939)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    output_hw: int = 64
    resize_mode: str = "PAD"
    color_space: str = "rgb"           # rgb | yiq | bgr | gray
    do_random_cropping: bool = False
    random_cropping_ratio: float = RANDOM_CROP_RATIO
    fast_mode: bool = True             # fast color distortion (no hue/contrast)
    is_training: bool = False
    shared_flip: bool = False          # pair-consistent flips
    initial_crop_hw: Optional[int] = None  # RANDOM_CROP_AND_RESHAPE
    # Reference subtract_mean (model_inheritor.py:243, danbooru_
    # preprocessing.py:193-196): keep the image on the 0-255 scale and
    # subtract the RGB channel means — the vgg19 input convention.
    subtract_mean: bool = False

    @property
    def host_hw(self) -> int:
        """The fixed hw the host resizes to; device crops back to output_hw."""
        if self.is_training and self.do_random_cropping:
            return int(self.output_hw / self.random_cropping_ratio)
        return self.output_hw


# ------------------------------------------------------------------ #
# Host side (per variable-size image, numpy/PIL)
# ------------------------------------------------------------------ #

def host_resize(img: np.ndarray, mode: str, new_hw: int, rng: Optional[np.random.RandomState] = None,
                initial_crop_hw: Optional[int] = None) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0,1] at (new_hw, new_hw)."""
    out = host_resize_uint8(img, mode, new_hw, rng=rng, initial_crop_hw=initial_crop_hw)
    return out.astype(np.float32) / 255.0


def host_resize_uint8(img: np.ndarray, mode: str, new_hw: int,
                      rng: Optional[np.random.RandomState] = None,
                      initial_crop_hw: Optional[int] = None) -> np.ndarray:
    """uint8 HWC -> uint8 HWC at (new_hw, new_hw).

    Same geometry as :func:`host_resize` (PIL already resizes in uint8),
    without the trailing [0,1] float conversion — callers that ship batches
    to the device keep them 1 byte/pixel (4x smaller host cache + transfer;
    the uint8 -> [0,1] conversion is fused into augment_batch on device,
    matching the reference order decode-uint8 -> convert_image_dtype,
    inference/image_translation_infer.py:55-58)."""
    assert mode in RESIZE_MODES, mode
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]

    def bilinear(arr, hw):
        pil = PILImage.fromarray(arr.astype(np.uint8).squeeze() if arr.shape[-1] == 1 else arr.astype(np.uint8))
        pil = pil.resize((hw, hw), PILImage.BILINEAR)
        out = np.asarray(pil, np.uint8)
        return out[:, :, None] if out.ndim == 2 else out

    if mode == "NONE":
        return np.asarray(img, np.uint8)
    if mode == "PAD":
        if h != w:
            size = max(h, w)
            oh, ow = (size - h) // 2, (size - w) // 2
            padded = np.zeros((size, size, img.shape[2]), img.dtype)
            padded[oh : oh + h, ow : ow + w] = img
            img = padded
        img = bilinear(img, new_hw)
    elif mode == "CROP":
        if h != w:
            size = min(h, w)
            oh, ow = (h - size) // 2, (w - size) // 2
            img = img[oh : oh + size, ow : ow + size]
        img = bilinear(img, new_hw)
    elif mode == "RESHAPE":
        img = bilinear(img, new_hw)
    elif mode in ("RANDOM_CROP", "RANDOM_CROP_AND_RESHAPE"):
        crop_hw = new_hw if mode == "RANDOM_CROP" else int(initial_crop_hw)
        rng = rng or np.random
        if min(h, w) < crop_hw:
            img = bilinear(img, crop_hw)
            h = w = crop_hw
        oh = int(rng.randint(0, h - crop_hw + 1))
        ow = int(rng.randint(0, w - crop_hw + 1))
        img = img[oh : oh + crop_hw, ow : ow + crop_hw]
        if mode == "RANDOM_CROP_AND_RESHAPE":
            img = bilinear(img, new_hw)
    return np.asarray(img, np.uint8)


# ------------------------------------------------------------------ #
# Device side (jit, batched)
# ------------------------------------------------------------------ #

def _rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# Deterministic color adjusters, semantics matched to the tf.image ops the
# reference's danbooru/inception preprocessing uses (cross-goldened against
# TF in tests/test_tf_parity.py). The _-prefixed wrappers sample the random
# factor per batch element like tf.image.random_* per example.


def adjust_brightness(x: jax.Array, delta) -> jax.Array:
    """tf.image.adjust_brightness: x + delta."""
    return x + delta


def adjust_saturation(x: jax.Array, factor) -> jax.Array:
    """tf.image.adjust_saturation: scale S in HSV space."""
    hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * factor, 0.0, 1.0))
    return _hsv_to_rgb(hsv)


def adjust_hue(x: jax.Array, delta) -> jax.Array:
    """tf.image.adjust_hue: rotate H in HSV space (mod 1)."""
    hsv = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return _hsv_to_rgb(hsv)


def adjust_contrast(x: jax.Array, factor) -> jax.Array:
    """tf.image.adjust_contrast: (x - mean_hw_per_channel) * factor + mean."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    return mean + factor * (x - mean)


def _brightness(key, x):
    delta = jax.random.uniform(key, (x.shape[0], 1, 1, 1), minval=-32.0 / 255.0, maxval=32.0 / 255.0)
    return adjust_brightness(x, delta)


def _saturation(key, x):
    f = jax.random.uniform(key, (x.shape[0], 1, 1), minval=0.5, maxval=1.5)
    return adjust_saturation(x, f)


def _hue(key, x):
    delta = jax.random.uniform(key, (x.shape[0], 1, 1), minval=-0.2, maxval=0.2)
    return adjust_hue(x, delta)


def _contrast(key, x):
    f = jax.random.uniform(key, (x.shape[0], 1, 1, 1), minval=0.5, maxval=1.5)
    return adjust_contrast(x, f)


def distort_color(key: jax.Array, x: jax.Array, ordering: jax.Array, fast_mode: bool = True) -> jax.Array:
    """4-way (2-way fast) random color distortion ordering, selected per batch
    like the reference's apply_with_random_selector."""
    keys = jax.random.split(key, 4)
    if fast_mode:
        def o0(x):
            return _saturation(keys[1], _brightness(keys[0], x))

        def o1(x):
            return _brightness(keys[1], _saturation(keys[0], x))

        branches = [o0, o1]
    else:
        def o0(x):
            return _contrast(keys[3], _hue(keys[2], _saturation(keys[1], _brightness(keys[0], x))))

        def o1(x):
            return _hue(keys[3], _contrast(keys[2], _brightness(keys[1], _saturation(keys[0], x))))

        def o2(x):
            return _saturation(keys[3], _brightness(keys[2], _hue(keys[1], _contrast(keys[0], x))))

        def o3(x):
            return _brightness(keys[3], _contrast(keys[2], _saturation(keys[1], _hue(keys[0], x))))

        branches = [o0, o1, o2, o3]
    x = jax.lax.switch(ordering % len(branches), branches, x)
    return jnp.clip(x, 0.0, 1.0)


def _random_crop_batch(key: jax.Array, x: jax.Array, out_hw: int) -> jax.Array:
    b, h, w, c = x.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h - out_hw + 1)
    xs = jax.random.randint(kx, (b,), 0, w - out_hw + 1)

    def crop(img, y, xo):
        return jax.lax.dynamic_slice(img, (y, xo, 0), (out_hw, out_hw, c))

    return jax.vmap(crop)(x, ys, xs)


def rgb_to_yiq(x: jax.Array) -> jax.Array:
    return x @ jnp.asarray(RGB_TO_YIQ).T


def yiq_to_rgb(x: jax.Array) -> jax.Array:
    return x @ jnp.asarray(YIQ_TO_RGB).T


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, images: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """Device-side tail of the train preprocessing path. ``images`` is the
    host-resized [B, host_hw, host_hw, C] batch — float in [0,1], or uint8
    (the bandwidth-saving transfer dtype; converted here on device)."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    k_crop, k_flip, k_sel, k_col = jax.random.split(key, 4)
    if cfg.is_training:
        if cfg.do_random_cropping and x.shape[1] > cfg.output_hw:
            x = _random_crop_batch(k_crop, x, cfg.output_hw)
        # Random horizontal flip; one coin for the whole batch when flips are
        # shared across paired inputs (the caller passes the same key for the
        # pair), otherwise one coin per image.
        if cfg.shared_flip:
            flip = jax.random.uniform(k_flip, ()) < 0.5
            x = jnp.where(flip, x[:, :, ::-1, :], x)
        else:
            flips = jax.random.uniform(k_flip, (x.shape[0], 1, 1, 1)) < 0.5
            x = jnp.where(flips, x[:, :, ::-1, :], x)
        if cfg.color_space != "gray" and x.shape[-1] == 3:
            # Reference distort_color draws ordering from num_cases=4 even
            # in fast_mode, where cases 1-3 all share the second branch —
            # a 25%/75% split, not a fair coin (inception_preprocessing
            # apply_with_random_selector + fast_mode branches).
            ordering = jax.random.randint(k_sel, (), 0, 4)
            if cfg.fast_mode:
                ordering = jnp.minimum(ordering, 1)
            x = distort_color(k_col, x, ordering, cfg.fast_mode)
    if x.shape[1] != cfg.output_hw:
        x = jax.image.resize(
            x, (x.shape[0], cfg.output_hw, cfg.output_hw, x.shape[-1]), "bilinear"
        )
    if cfg.subtract_mean and x.shape[-1] == 3:
        # Back to the 0-255 scale minus the RGB means (vgg19 convention,
        # danbooru_preprocessing.py:193-196). DELIBERATE ordering
        # divergence: the reference subtracts before flip/color distortion
        # (and so distorts 0-255-minus-mean data — arguably its bug); here
        # the subtraction runs last so the distortion math stays on the
        # [0,1] inputs it is defined for. Flips commute; eval-mode
        # (is_training=False) is bit-identical to the reference.
        x = x * 255.0 - jnp.asarray(MEAN_IMAGE_SUBTRACTION_RGB, x.dtype)
    if cfg.color_space == "yiq":
        x = rgb_to_yiq(x)
    elif cfg.color_space == "bgr":
        x = x[..., ::-1]
    elif cfg.color_space == "gray" and x.shape[-1] == 3:
        # Weighted SUM (tf.image.rgb_to_grayscale): the weights already
        # normalize to 1 — a mean would divide the luminance by 3.
        x = jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
    return x


def postprocess_image(
    x: jax.Array, color_space: str = "rgb", subtract_mean: bool = False
) -> jax.Array:
    """Inverse transform for display/saving (danbooru postprocess_image,
    danbooru_preprocessing.py:233-255: re-add the channel means and rescale
    to [0,1] when the forward path subtracted them)."""
    if color_space == "yiq":
        x = yiq_to_rgb(x)
    elif color_space == "bgr":
        x = x[..., ::-1]
    if subtract_mean and x.shape[-1] == 3:
        x = (x + jnp.asarray(MEAN_IMAGE_SUBTRACTION_RGB, x.dtype)) / 255.0
    if x.shape[-1] > 3:
        x = jnp.sum(x, axis=-1, keepdims=True)
    return jnp.clip(x, 0.0, 1.0)
