"""DCGAN generator/discriminator in Flax.

Reference parity: /root/reference/nets/dcgan.py:39-200.
- Generator: [B, N] latent -> 1x1 -> deconv k4 s1 VALID (depth*2^(L-1)) ->
  stride-2 deconvs halving depth (batch norm + relu) -> final deconv without
  norm/activation -> 1x1 conv to image channels; L = log2(final_size)-1.
- Discriminator: stride-2 k4 leaky-relu convs doubling depth (batch norm on
  all but the first), then a 1x1 VALID conv to logits [B, 1].
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from twingan_tpu.ops import leaky_relu


class DCGANGenerator(nn.Module):
    depth: int = 64
    final_size: int = 32
    num_outputs: int = 3

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        assert z.ndim == 2, "DCGAN generator takes [batch, N] inputs"
        if self.final_size < 8 or self.final_size & (self.final_size - 1):
            raise ValueError("final_size must be a power of 2, >= 8")
        end_points: Dict[str, jax.Array] = {}
        num_layers = int(math.log2(self.final_size)) - 1
        net = z[:, None, None, :]

        def bn(x, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.999, name=name)(x)

        # First upscaling: 1x1 -> 4x4, stride 1 VALID.
        depth0 = self.depth * 2 ** (num_layers - 1)
        net = nn.ConvTranspose(depth0, (4, 4), strides=(1, 1), padding="VALID", name="deconv1")(net)
        net = jax.nn.relu(bn(net, "deconv1_bn"))
        end_points["deconv1"] = net
        for i in range(2, num_layers):
            depth_i = self.depth * 2 ** (num_layers - i)
            net = nn.ConvTranspose(depth_i, (4, 4), strides=(2, 2), padding="SAME", name=f"deconv{i}")(net)
            net = jax.nn.relu(bn(net, f"deconv{i}_bn"))
            end_points[f"deconv{i}"] = net
        net = nn.ConvTranspose(self.depth, (4, 4), strides=(2, 2), padding="SAME",
                               name=f"deconv{num_layers}")(net)
        end_points[f"deconv{num_layers}"] = net
        logits = nn.Conv(self.num_outputs, (1, 1), padding="VALID", name="logits")(net)
        end_points["logits"] = logits
        assert logits.shape[1] == self.final_size
        return logits, end_points


class DCGANDiscriminator(nn.Module):
    depth: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        assert x.ndim == 4 and x.shape[1] == x.shape[2]
        inp_size = x.shape[1]
        if inp_size & (inp_size - 1):
            # Reference _validate_image_inputs (nets/dcgan.py:26-34): a
            # non-power-of-2 size would end above 1x1 and the final reshape
            # would silently fold spatial positions into the batch dim.
            raise ValueError(f"DCGAN discriminator needs power-of-2 input, got {inp_size}")
        end_points: Dict[str, jax.Array] = {}
        net = x
        for i in range(int(math.log2(inp_size))):
            depth_i = self.depth * 2**i
            net = nn.Conv(depth_i, (4, 4), strides=(2, 2), padding="SAME", name=f"conv{i + 1}")(net)
            if i > 0:
                net = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                                   name=f"conv{i + 1}_bn")(net)
            net = leaky_relu(net)
            end_points[f"conv{i + 1}"] = net
        logits = nn.Conv(1, (1, 1), padding="VALID", name="logits_conv")(net)
        logits = logits.reshape(-1, 1)
        end_points["logits"] = logits
        return logits, end_points
