"""Generate the two synthetic translation domains used by the learning smoke
(docs/PERFORMANCE.md): domain A = filled colored discs on dark background,
domain B = ring outlines on light background with a color mapping. Writes
image folders and TFRecord shards.

    python tools/make_demo_domains.py --out /tmp/domains --n 600
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image, ImageDraw


def sample_params(rng: np.random.RandomState, hw: int) -> dict:
    """One latent draw of the shared disc/ring geometry. The call order is
    load-bearing: a given (seed, hw) must keep producing the same images."""
    cx, cy = rng.randint(hw // 4, 3 * hw // 4, 2)
    rad = rng.randint(hw // 8, hw // 3)
    hue = rng.randint(0, 3)
    return {"cx": int(cx), "cy": int(cy), "rad": int(rad), "hue": int(hue)}


def draw_a(p: dict, hw: int) -> Image.Image:
    """Domain A: filled colored disc on dark background."""
    img = Image.new("RGB", (hw, hw), (20, 20, 30))
    d = ImageDraw.Draw(img)
    color = [(200, 60, 60), (60, 200, 60), (60, 60, 200)][p["hue"]]
    d.ellipse([p["cx"] - p["rad"], p["cy"] - p["rad"],
               p["cx"] + p["rad"], p["cy"] + p["rad"]], fill=color)
    return img


def draw_b(p: dict, hw: int) -> Image.Image:
    """Domain B: ring outline on light background with a hue mapping."""
    img = Image.new("RGB", (hw, hw), (235, 235, 225))
    d = ImageDraw.Draw(img)
    color_b = [(55, 195, 195), (195, 55, 195), (195, 195, 55)][p["hue"]]
    d.ellipse([p["cx"] - p["rad"], p["cy"] - p["rad"],
               p["cx"] + p["rad"], p["cy"] + p["rad"]],
              outline=color_b, width=4)
    return img


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/domains")
    p.add_argument("--n", type=int, default=600)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    for dom in ("a", "b"):
        os.makedirs(f"{args.out}/{dom}", exist_ok=True)
    hw = args.hw
    for i in range(args.n):
        params = sample_params(rng, hw)
        draw_a(params, hw).save(f"{args.out}/a/{i}.png")
        draw_b(params, hw).save(f"{args.out}/b/{i}.png")

    from twingan_tpu.data.converters import convert_image_folder

    na = convert_image_folder(f"{args.out}/a", f"{args.out}/rec_a", split="train", num_shards=2)
    nb = convert_image_folder(f"{args.out}/b", f"{args.out}/rec_b", split="train", num_shards=2)
    print(f"wrote {na}+{nb} records under {args.out}/rec_a and rec_b")


if __name__ == "__main__":
    main()
