"""Training summaries: TensorBoard event files + JSONL metrics log.

Reference parity: the TensorBoard scalar/image summaries threaded through
slim.learning.train (SURVEY.md section 5.5). Event files are written through
tf.summary when TensorFlow is importable (it is in this image); the JSONL
metrics stream always works and is what the stage runner also keeps
in memory.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items() if np.ndim(v) == 0})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if k not in ("step", "time"):
                        tf.summary.scalar(k, v, step=int(step))

    def images(self, step: int, name: str, batch: np.ndarray, max_images: int = 4) -> None:
        if self._tb is None:
            return
        import tensorflow as tf

        arr = np.clip(np.asarray(batch, np.float32), 0.0, 1.0)[:max_images]
        with self._tb.as_default():
            tf.summary.image(name, arr, step=int(step), max_outputs=max_images)

    def histograms(self, step: int, values: Mapping[str, np.ndarray]) -> None:
        """Histogram + zero-fraction sparsity per named tensor (reference
        end-point activation histogram/sparsity summaries,
        model_inheritor.py:721-726, and variable histograms :1057-1058)."""
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default():
            for k, v in values.items():
                arr = np.asarray(v, np.float32)
                tf.summary.histogram(k, arr, step=int(step))
                tf.summary.scalar(
                    f"{k}/zero_fraction", float(np.mean(arr == 0.0)), step=int(step)
                )

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
