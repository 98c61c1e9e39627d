"""Model export: portable serialized inference functions.

Reference parity: the do_export branch building a SavedModel with signature
PREDICT(inputs=sources_ph, outputs=custom_generated_t_style_source)
(/root/reference/twingan.py:777-805, model_inheritor.py:1191-1206).

Two formats:
- 'jax':        jax.export StableHLO artifact (+ params npz) — the native
                deployment unit for TPU serving.
- 'savedmodel': TF SavedModel via jax2tf with the reference's serving
                signature, for tensorflow-model-server parity. Only
                available when TensorFlow is importable.

Usage:
    python -m twingan_tpu.infer.export --model_path=... --output_dir=... \
        [--format=jax|savedmodel] [--image_hw=256] [--batch_size=1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def export_jax(inferer, output_dir: str, batch_size: int = 1) -> str:
    """Serialize the translate closure to StableHLO bytes via jax.export."""
    from jax import export as jax_export

    os.makedirs(output_dir, exist_ok=True)
    hw = inferer.image_hw

    def fn(images):
        return inferer.trainer.translate(inferer.state, images, inferer.direction)

    spec = jax.ShapeDtypeStruct((batch_size, hw, hw, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    path = os.path.join(output_dir, "translate.stablehlo")
    with open(path, "wb") as f:
        f.write(exported.serialize())
    # Companion params npz: the StableHLO artifact bakes the weights in as
    # constants (swapping checkpoints needs a re-export); the npz carries
    # the same variables in inspectable/portable form.
    import flax
    import numpy as np

    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(
            {"params": inferer.state.params,
             "model_state": inferer.state.model_state}
        ),
        sep="/",
    )
    np.savez(os.path.join(output_dir, "params.npz"),
             **{k: np.asarray(v) for k, v in flat.items()})
    return path


def load_jax(path: str):
    """Deserialize an exported translate fn; returns a callable."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def export_savedmodel(inferer, output_dir: str, batch_size: int = 0) -> str:
    """TF SavedModel with the reference's serving signature names."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    hw = inferer.image_hw

    def fn(images):
        return inferer.trainer.translate(inferer.state, images, inferer.direction)

    tf_fn = jax2tf.convert(fn, polymorphic_shapes=["(b, _, _, _)"] if not batch_size else None)
    module = tf.Module()
    module.f = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[
            tf.TensorSpec([batch_size or None, hw, hw, 3], tf.float32, name="sources_ph")
        ],
    )
    sig = module.f.get_concrete_function()
    tf.saved_model.save(
        module, output_dir, signatures={"serving_default": sig}
    )
    return output_dir


def main(argv=None) -> None:
    from twingan_tpu.infer.translate import ImageInferer

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--format", default="jax", choices=["jax", "savedmodel"])
    p.add_argument("--image_hw", type=int, default=0)
    p.add_argument("--direction", default="s2t", choices=["s2t", "t2s"])
    p.add_argument("--batch_size", type=int, default=1)
    args = p.parse_args(argv)

    inferer = ImageInferer(args.model_path, args.image_hw, args.direction)
    if args.format == "jax":
        path = export_jax(inferer, args.output_dir, args.batch_size)
    else:
        path = export_savedmodel(inferer, args.output_dir, args.batch_size)
    print(f"exported to {path}")


if __name__ == "__main__":
    main()
