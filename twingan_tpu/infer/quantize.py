"""Post-training quantization of a trained TwinGAN stage (W8A8 serving).

Calibrates the `quant` collection (per-conv input abs-max, see
ops/quant.py + models/layers.EqConv) on representative source images and
returns the trainer/state pair that serves the int8 path. Flax creates
the quant variables on the first mutable apply, so checkpoints saved
before quantization existed calibrate in place.

No reference counterpart — the reference serves fp32 frozen graphs
(/root/reference/inference/image_translation_infer.py); this is the
TPU-serving feature beyond parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from twingan_tpu.train.state import GanTrainState
from twingan_tpu.train.twingan_trainer import (
    DOMAIN_S, DOMAIN_T, ENC, GEN, TwinGANTrainer,
)


def calibrate(
    trainer: TwinGANTrainer,
    state: GanTrainState,
    images: jax.Array,
    direction: str = "s2t",
    calib_batches: int = 2,
) -> Tuple[TwinGANTrainer, GanTrainState]:
    """fp-forward `images` through encoder+generator recording quant scales;
    returns (int8 trainer, state with the calibrated `quant` collections).

    The forward mirrors TwinGANTrainer.translate (same alpha schedule, same
    EMA params, same UNet threading) so the calibrated scales cover exactly
    the tensors the int8 serve path will see."""
    src_domain = DOMAIN_S if direction == "s2t" else DOMAIN_T
    out_domain = DOMAIN_T if direction == "s2t" else DOMAIN_S
    params = state.params
    if state.gen_ema_params is not None:
        params = {**params, **state.gen_ema_params}
    alpha = trainer._alpha(state.step)
    mcfg = trainer.cfg.model
    cal = TwinGANTrainer(trainer.cfg.replace(
        model=mcfg.replace(quantized_inference="calib")))
    ms = dict(state.model_state)
    n = images.shape[0]
    bs = max(1, n // max(1, calib_batches))
    for i in range(0, n, bs):
        batch = images[i:i + bs]
        (code, skips), upd_e = cal.enc.apply(
            {"params": params[ENC], **ms[ENC]}, batch, alpha=alpha,
            domain=src_domain, train=False, mutable=["quant"])
        ms[ENC] = {**ms[ENC], **upd_e}
        _, upd_g = cal.gen.apply(
            {"params": params[GEN], **ms[GEN]}, code, alpha=alpha,
            domain=out_domain,
            unet_skips=skips if trainer.cfg.use_unet else None,
            train=False, mutable=["quant"])
        ms[GEN] = {**ms[GEN], **upd_g}
    q8 = TwinGANTrainer(trainer.cfg.replace(
        model=mcfg.replace(quantized_inference="int8")))
    return q8, state.replace(model_state=ms)
