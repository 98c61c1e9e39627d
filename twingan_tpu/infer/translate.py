"""Checkpoint-based image translation inference CLI.

Reference parity: /root/reference/inference/image_translation_infer.py.
Contract preserved exactly: uint8 image -> float [0,1] -> bilinear resize to
image_hw -> batch -> encoder(source domain) -> generator(target domain) ->
output * 255 saved as image (:52-61, :85-99). The reference rewires a frozen
graph's ``sources_ph``; here the model is rebuilt from the stage's
config.json + Orbax checkpoint, and the jitted translate closure plays the
role of the frozen graph (re-used across images; batch > 1 supported, unlike
the reference's batch-1 sess.run loop).

Usage:
    python -m twingan_tpu.infer.translate \
        --model_path=/trained/256 --image_hw=256 \
        --input_image_path=in.jpg --output_image_path=out.jpg \
        [--direction=s2t|t2s] [--batch_size=64]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Iterator, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from twingan_tpu.runner.checkpoint import CheckpointManager
from twingan_tpu.runner.config_io import find_latest_stage_dir, load_stage_config
from twingan_tpu.train.twingan_trainer import TwinGANTrainer, TwinGANConfig
from twingan_tpu.train.gan_trainer import GanTrainer
from twingan_tpu.utils.image_io import imread_rgb, imsave_float


class ImageInferer:
    """Loads a trained stage and translates images (reference ImageInferer)."""

    def __init__(self, model_path: str, image_hw: int = 0, direction: str = "s2t",
                 quantize: bool = False):
        stage_dir = model_path
        if not os.path.exists(os.path.join(stage_dir, "config.json")):
            stage_dir = find_latest_stage_dir(model_path)
        _, tcfg = load_stage_config(stage_dir)
        if not isinstance(tcfg, TwinGANConfig):
            raise ValueError("model_path does not contain a TwinGAN stage")
        self.cfg = tcfg
        self.direction = direction
        self.image_hw = image_hw or tcfg.model.resolution
        self.trainer = TwinGANTrainer(tcfg)
        state = self.trainer.init_state(jax.random.PRNGKey(0))
        restored = CheckpointManager(stage_dir).restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {stage_dir}")
        self.state = restored
        # W8A8 int8 serving (infer/quantize.py): scales self-calibrate on
        # the FIRST translated batch (live traffic is the representative
        # distribution a server has), then every batch serves int8.
        self._quant_pending = bool(quantize)

        # trainer.translate is already jitted (static trainer/direction);
        # an extra closure-jit would bake every param into a SECOND
        # compiled executable (duplicate HBM under the leaky axon client).
        self._translate = lambda images: self.trainer.translate(
            self.state, images, self.direction)

    def preprocess(self, image: np.ndarray) -> np.ndarray:
        """uint8 HWC -> float [0,1] resized to (image_hw, image_hw) — the
        reference's placeholder rewiring subgraph (:55-58). Delegates to
        data/preprocess.host_resize (RESHAPE mode) so geometry and the
        grayscale/2-D edge cases live in exactly one place."""
        from twingan_tpu.data.preprocess import host_resize

        return host_resize(image, "RESHAPE", self.image_hw)

    def infer_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        batch = np.stack([self.preprocess(im) for im in images])
        if self._quant_pending:
            from twingan_tpu.infer.quantize import calibrate

            self.trainer, self.state = calibrate(
                self.trainer, self.state, jnp.asarray(batch), self.direction)
            self._quant_pending = False
        out = self._translate(jnp.asarray(batch))
        return np.asarray(out.astype(jnp.float32))

    def infer(self, image_path: str, output_path: str, return_image: bool = False):
        img = imread_rgb(image_path)
        out = self.infer_batch([img])[0]
        imsave_float(output_path, out)
        return out if return_image else None


def _iter_images(path: str) -> Iterator[str]:
    if os.path.isdir(path):
        from twingan_tpu.data.converters import list_images

        yield from list_images(path)
    else:
        yield path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True, help="stage dir or train dir")
    p.add_argument("--image_hw", type=int, default=0)
    p.add_argument("--input_image_path", required=True, help="image file or folder")
    p.add_argument("--output_image_path", required=True, help="output file or folder")
    p.add_argument("--direction", default="s2t", choices=["s2t", "t2s"],
                   help="s2t == custom_generated_t_style_source")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--quantize", action="store_true",
                   help="serve the W8A8 int8 conv path (ops/quant.py); "
                   "scales self-calibrate on the first batch")
    args = p.parse_args(argv)

    inferer = ImageInferer(args.model_path, args.image_hw, args.direction,
                           quantize=args.quantize)
    paths = list(_iter_images(args.input_image_path))
    out_is_dir = os.path.isdir(args.input_image_path) or len(paths) > 1
    if out_is_dir:
        os.makedirs(args.output_image_path, exist_ok=True)

    def out_name(path: str) -> str:
        """Unique output name per input: the path relative to the input dir
        with separators flattened — basename alone would let a/x.jpg and
        b/x.jpg silently overwrite each other."""
        rel = os.path.relpath(path, args.input_image_path)
        return rel.replace(os.sep, "_")

    t0 = time.time()
    done = 0
    for i in range(0, len(paths), args.batch_size):
        chunk = paths[i : i + args.batch_size]
        imgs = [imread_rgb(p_) for p_ in chunk]
        if len(imgs) < args.batch_size and len(paths) > args.batch_size:
            # Pad the final partial chunk to the compiled batch shape — a
            # second shape means a second jit compile (30-400s through the
            # axon tunnel, CLAUDE.md: 'prefer few distinct shapes').
            imgs = imgs + [imgs[-1]] * (args.batch_size - len(imgs))
        outs = inferer.infer_batch(imgs)[: len(chunk)]
        for path, out in zip(chunk, outs):
            dst = (
                os.path.join(args.output_image_path, out_name(path))
                if out_is_dir
                else args.output_image_path
            )
            imsave_float(dst, out)
            done += 1
    dt = time.time() - t0
    print(f"translated {done} images in {dt:.2f}s ({done / max(dt, 1e-9):.1f} imgs/s)")


if __name__ == "__main__":
    main()
