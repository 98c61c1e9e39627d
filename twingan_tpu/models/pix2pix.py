"""pix2pix U-Net generator + PatchGAN discriminator in Flax.

Reference parity: /root/reference/nets/pix2pix.py (present in the zoo,
unused by the trainers). Standard pix2pix: 8-level encoder (conv k4 s2,
leaky-relu, batch norm except first), mirrored decoder (deconv k4 s2, relu,
batch norm, dropout on the first 3, skip concats), tanh output; 70x70
PatchGAN discriminator.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from twingan_tpu.ops import leaky_relu


class Pix2PixGenerator(nn.Module):
    base_filters: int = 64
    num_outputs: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        assert x.shape[1] == x.shape[2] and x.shape[1] >= 8
        if x.shape[1] & (x.shape[1] - 1):
            # Truncated log2 would desync encoder skip shapes from the
            # decoder and fail deep inside a concatenate.
            raise ValueError(f"pix2pix needs power-of-2 input, got {x.shape[1]}")
        levels = int(math.log2(x.shape[1]))
        eps: Dict[str, jax.Array] = {}
        skips = []
        net = x
        # Encoder.
        for i in range(levels):
            f = self.base_filters * min(2**i, 8)
            net = nn.Conv(f, (4, 4), strides=(2, 2), padding="SAME", name=f"enc{i}")(net)
            if i > 0:
                net = nn.BatchNorm(use_running_average=not train, name=f"enc{i}_bn")(net)
            net = leaky_relu(net)
            skips.append(net)
            eps[f"enc{i}"] = net
        # Decoder with skip connections.
        for i in range(levels - 1):
            f = self.base_filters * min(2 ** (levels - 2 - i), 8)
            net = nn.ConvTranspose(f, (4, 4), strides=(2, 2), padding="SAME", name=f"dec{i}")(net)
            net = nn.BatchNorm(use_running_average=not train, name=f"dec{i}_bn")(net)
            if i < 3 and train:
                net = nn.Dropout(0.5, deterministic=False)(net)
            net = jax.nn.relu(net)
            net = jnp.concatenate([net, skips[levels - 2 - i]], axis=-1)
            eps[f"dec{i}"] = net
        out = nn.ConvTranspose(self.num_outputs, (4, 4), strides=(2, 2), padding="SAME",
                               name="out")(net)
        out = jnp.tanh(out)
        eps["output"] = out
        return out, eps


class Pix2PixDiscriminator(nn.Module):
    """70x70 PatchGAN: 3 stride-2 convs + 1 stride-1 + 1x1 logits map."""

    base_filters: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        eps: Dict[str, jax.Array] = {}
        net = x
        for i, (f, s) in enumerate([(1, 2), (2, 2), (4, 2), (8, 1)]):
            net = nn.Conv(self.base_filters * f, (4, 4), strides=(s, s), padding="SAME",
                          name=f"conv{i}")(net)
            if i > 0:
                net = nn.BatchNorm(use_running_average=not train, name=f"conv{i}_bn")(net)
            net = leaky_relu(net)
            eps[f"conv{i}"] = net
        logits = nn.Conv(1, (4, 4), padding="SAME", name="logits")(net)
        eps["patch_logits"] = logits
        return logits.reshape(x.shape[0], -1).mean(axis=1, keepdims=True), eps
