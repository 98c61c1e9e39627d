"""Utility helpers (reference util_io.py / util_misc.py equivalents)."""

from twingan_tpu.utils.image_io import imsave_float, save_image_grid, imread_rgb
