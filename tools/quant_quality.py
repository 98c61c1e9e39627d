"""int8-vs-fp quality gate for the W8A8 serving path (ops/quant.py).

Loads a trained TwinGAN stage checkpoint, calibrates the quantized-
inference scales on a few real source batches, and reports how far the
int8 translate output is from the fp one — plus both paths' L1 vs the
paired ground truth when the synthetic demo domains supply it. This is
the serving analog of the reference's export fidelity gate
(/root/reference/twingan.py:777-805: compare pre/post-export outputs).

    python tools/quant_quality.py --model_path /tmp/qc256n/train/256 \
        --domains /tmp/qc256n/domains --n 64 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--domains", default="",
                   help="make_demo_domains output dir (a/<i>.png pairs); "
                   "generated at --model hw if missing and path is set")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--calib_batches", type=int, default=2)
    p.add_argument("--out", default="")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from twingan_tpu import ops
    from twingan_tpu.infer.quantize import calibrate
    from twingan_tpu.infer.translate import ImageInferer

    inferer = ImageInferer(args.model_path)
    trainer, state = inferer.trainer, inferer.state
    hw = inferer.image_hw

    # Eval sources (+ paired truth when the demo domains provide it).
    truth = None
    if args.domains:
        if not os.path.exists(os.path.join(args.domains, "a")):
            import make_demo_domains

            make_demo_domains.main(
                ["--out", args.domains, "--n", str(args.n), "--hw", str(hw),
                 "--seed", "0"])
        from PIL import Image

        def load(dom, n):
            return np.stack([
                np.asarray(
                    Image.open(f"{args.domains}/{dom}/{i}.png")
                    .resize((hw, hw), Image.BILINEAR), np.float32) / 255.0
                for i in range(n)])

        srcs = load("a", args.n)
        truth = jnp.asarray(load("b", args.n))
    else:
        srcs = np.random.RandomState(0).rand(args.n, hw, hw, 3).astype(np.float32)
    srcs = jnp.asarray(srcs)

    # fp reference output.
    out_fp = trainer.translate(state, srcs, "s2t").astype(jnp.float32)

    # Calibrate via the shared serving helper (infer/quantize.py): flax
    # creates the `quant` variables on the first mutable apply, so a
    # checkpoint saved without them calibrates in place.
    q8, state8 = calibrate(trainer, state, srcs, "s2t",
                           calib_batches=args.calib_batches)
    out_q8 = q8.translate(state8, srcs, "s2t").astype(jnp.float32)

    c_fp = jnp.clip(out_fp, 0.0, 1.0)
    c_q8 = jnp.clip(out_q8, 0.0, 1.0)
    r = {
        "model_path": args.model_path,
        "hw": hw,
        "n": args.n,
        "l1_int8_vs_fp": float(jnp.mean(jnp.abs(c_q8 - c_fp))),
        # 5-level MS-SSIM box-downsamples 16x: guard small stages
        # (run_eval.py msssim mode has the same floor).
        "msssim_int8_vs_fp": (float(jnp.mean(
            ops.msssim(c_q8, c_fp, max_val=1.0))) if hw >= 16 else None),
        "psnr_int8_vs_fp_db": float(
            -10.0 * jnp.log10(jnp.mean((c_q8 - c_fp) ** 2) + 1e-12)),
    }
    if truth is not None:
        r["l1_vs_truth_fp"] = float(jnp.mean(jnp.abs(c_fp - truth)))
        r["l1_vs_truth_int8"] = float(jnp.mean(jnp.abs(c_q8 - truth)))
    print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)
    return r


if __name__ == "__main__":
    main()
