"""Inference + export (reference inference/image_translation_infer.py and
the SavedModel export branch of GeneralModel.main)."""

from twingan_tpu.infer.translate import ImageInferer
