"""Evaluation subsystem (reference eval branches of GeneralModel.main,
SWD/inception-score extra evals, eval-debug HTML galleries)."""

from twingan_tpu.evals.metrics import (
    swd_eval,
    msssim_eval,
    inception_score,
    streaming_loss_eval,
)
from twingan_tpu.evals.gallery import write_html_gallery, write_embeddings_csv
