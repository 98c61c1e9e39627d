"""Flax model definitions (reference nets/ equivalents, TPU-first).

- layers.py: equalized-lr conv/dense, domain/conditional norms, spectral
  norm wrappers, self-attention — the building blocks (reference libs/ +
  nets/pggan_utils.py).
- pggan.py:  progressive-growing Generator / Discriminator / Encoder
  (reference nets/pggan.py), stage-parameterized.
- dcgan.py:  DCGAN generator/discriminator (reference nets/dcgan.py).
- cyclegan.py: CycleGAN resnet generator + patch discriminator
  (reference nets/cyclegan.py, nets/cyclegan_dis.py).
"""

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models import layers
from twingan_tpu.models.pggan import Generator, Discriminator, Encoder, EncoderClassifier
