"""TwinGAN-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised
image-to-image translation with progressively-growing GANs.

Re-implements the full capability surface of jerryli27/TwinGAN (TF1/TF-Slim)
as an idiomatic JAX framework:

- ``twingan_tpu.ops``      pure-function kernel library (pixel norm, equalized
  conv scaling, domain/conditional norms, spectral norm, self-attention,
  gdrop, minibatch stddev, MS-SSIM, SWD).
- ``twingan_tpu.models``   Flax PGGAN generator/discriminator/encoder (plus
  DCGAN/CycleGAN variants), stage-parameterized for progressive growth.
- ``twingan_tpu.train``    loss library (gan/dragan/wgan/wgan-gp/hinge),
  fused jitted train steps with n-critic alternation, optax optimizers.
- ``twingan_tpu.parallel`` device-mesh / shard_map data parallelism.
- ``twingan_tpu.data``     TFRecord codec + datasets + jit-compiled
  device-side preprocessing.
- ``twingan_tpu.runner``   progressive-growth stage orchestration with
  pytree checkpoint migration (Orbax).
- ``twingan_tpu.evals``    SWD / MS-SSIM / inception-score evaluation.
- ``twingan_tpu.infer``    checkpoint inference matching the reference's
  ``sources_ph`` -> styled-image contract.
- ``twingan_tpu.serve``    HTTP serving stack with face cropping.
"""

__version__ = "0.1.0"
