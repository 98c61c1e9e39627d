"""Image IO helpers.

Reference parity: util_io.py imread/imsave/save_float_image (:63-147) and the
training-time sample-grid mosaics (image_generation.do_extra_train_step_aux
:694-714 stacks batches into row-major grids before saving).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image as PILImage


def imread_rgb(path: str) -> np.ndarray:
    """uint8 HWC RGB (bw/rgba converted), like util_io.imread variants."""
    img = PILImage.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def imsave_float(path: str, img: np.ndarray, fast: bool = False) -> None:
    """Save a float image in [0,1] (clipped) as 8-bit.

    fast=True trades file size for encode latency (zlib level 1 instead of
    PIL's default 6; ~3-4x faster on 256px RGB) — used on the serving hot
    path where PNG encode is a measured per-request cost
    (docs/PERFORMANCE.md serving section)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    PILImage.fromarray(arr).save(path, compress_level=1 if fast else 6)


def save_image_grid(path: str, images: np.ndarray, columns: int | None = None) -> None:
    """[N,H,W,C] float batch -> one row-major mosaic PNG."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    if columns is None:
        columns = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / columns))
    grid = np.zeros((rows * h, columns * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, columns)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    imsave_float(path, grid)


def numpy_to_base64(image: np.ndarray, fmt: str = "PNG") -> str:
    """uint8 HWC image -> 'data:image/FMT;base64,...' data URI (reference
    interface_utils.numpu_to_base64 [sic], interface_utils.py:53-59)."""
    import base64
    import io

    buf = io.BytesIO()
    PILImage.fromarray(np.asarray(image, np.uint8)).save(buf, format=fmt)
    return f"data:image/{fmt};base64," + base64.b64encode(buf.getvalue()).decode()


def base64_to_numpy(data: str) -> np.ndarray:
    """Inverse of numpy_to_base64; accepts raw base64 or a data URI
    (reference interface_utils.base64_to_numpy, interface_utils.py:43-50)."""
    import base64
    import io

    if data.startswith("data:"):
        data = data.split(",", 1)[1]
    raw = base64.b64decode(data)
    # np.array (not asarray): PIL-backed arrays are read-only, and callers
    # feed these to the in-place drawing API (utils/visualization.py).
    return np.array(PILImage.open(io.BytesIO(raw)).convert("RGB"), np.uint8)


def stack_comparison(pairs: Sequence[np.ndarray]) -> np.ndarray:
    """Interleave equal-shape batches row-wise (source above output, the
    reference's source_t_prime combined dumps, twingan.py:666-678)."""
    stacked = np.concatenate([np.asarray(p)[None] for p in pairs], axis=0)  # [K,N,H,W,C]
    k, n, h, w, c = stacked.shape
    out = stacked.transpose(1, 0, 2, 3, 4).reshape(n, k * h, w, c)
    return out
