"""CycleGAN resnet generator + resnet discriminator in Flax.

Reference parity: /root/reference/nets/cyclegan.py:120-270 (generator) and
nets/cyclegan_dis.py:28-155 (discriminator). Instance norm + relu arg scope,
reflect-padded VALID convs, 7x7 input/output stages, stride-2 encoder,
``num_resnet_blocks`` residual blocks, deconv (or nn/bilinear upsample)
decoder, tanh output with optional linear slope; the discriminator shares
the encoder+resblock trunk and predicts via spatial mean -> FC(1).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn


def _reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class _InstanceNorm(nn.Module):
    epsilon: float = 0.001

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta


class _ConvIN(nn.Module):
    """conv (VALID, reflect-padded by caller) -> instance norm -> relu."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="VALID", name="conv")(x)
        if self.norm:
            y = _InstanceNorm(name="norm")(y)
        if self.act:
            y = jax.nn.relu(y)
        return y


def _trunk(x: jax.Array, num_filters: int, num_blocks: int, make):
    """Shared encoder + residual trunk of generator and discriminator."""
    end_points: Dict[str, jax.Array] = {}
    net = make("input_conv", num_filters, 7)(_reflect_pad(x, 3))
    end_points["encoder_0"] = net
    net = make("encoder_1", num_filters * 2, 3, stride=2)(_reflect_pad(net, 1))
    end_points["encoder_1"] = net
    net = make("encoder_2", num_filters * 4, 3, stride=2)(_reflect_pad(net, 1))
    end_points["encoder_2"] = net
    for block in range(num_blocks):
        res = make(f"block_{block}_conv0", num_filters * 4, 3)(_reflect_pad(net, 1))
        res = make(f"block_{block}_conv1", num_filters * 4, 3, act=False)(_reflect_pad(res, 1))
        net = net + res
        end_points[f"resnet_block_{block}"] = net
    return net, end_points


class CycleGANGenerator(nn.Module):
    num_filters: int = 64
    num_resnet_blocks: int = 6
    num_outputs: int = 3
    tanh_linear_slope: float = 0.0
    upsample_method: str = "conv2d_transpose"  # conv2d_transpose | nn_upsample_conv | bilinear_upsample_conv

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        assert x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0, (
            "input size must be divisible by 4 (two stride-2 stages)"
        )

        def make(name, features, kernel, stride=1, act=True):
            return _ConvIN(features, kernel, stride, act=act, name=name)

        net, end_points = _trunk(x, self.num_filters, self.num_resnet_blocks, make)

        def upsample(net, features, name):
            if self.upsample_method == "conv2d_transpose":
                # Reference parity quirk: layers.conv2d_transpose sits
                # OUTSIDE the [layers.conv2d] arg_scopes
                # (nets/cyclegan.py:57-63,106-108), so the default deconv
                # decoder gets relu but NO instance norm.
                y = nn.ConvTranspose(features, (3, 3), strides=(2, 2), padding="SAME",
                                     name=f"{name}_deconv")(net)
            else:
                method = "nearest" if self.upsample_method == "nn_upsample_conv" else "bilinear"
                b, h, w, c = net.shape
                y = jax.image.resize(net, (b, h * 2, w * 2, c), method)
                y = nn.Conv(features, (3, 3), padding="VALID", name=f"{name}_conv")(_reflect_pad(y, 1))
                y = _InstanceNorm(name=f"{name}_norm")(y)
            return jax.nn.relu(y)

        net = upsample(net, self.num_filters * 2, "decoder1")
        end_points["decoder1"] = net
        net = upsample(net, self.num_filters, "decoder2")
        end_points["decoder2"] = net

        logits = nn.Conv(self.num_outputs, (7, 7), padding="VALID", name="output_conv")(
            _reflect_pad(net, 3)
        )
        end_points["logits"] = logits
        out = jnp.tanh(logits) + logits * self.tanh_linear_slope
        end_points["predictions"] = out
        return out, end_points


class CycleGANDiscriminator(nn.Module):
    num_filters: int = 64
    num_resnet_blocks: int = 6

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> tuple[jax.Array, Dict]:
        def make(name, features, kernel, stride=1, act=True):
            return _ConvIN(features, kernel, stride, act=act, name=name)

        net, end_points = _trunk(x, self.num_filters, self.num_resnet_blocks, make)
        pooled = jnp.mean(net, axis=(1, 2))
        pred = nn.Dense(1, name="prediction")(pooled)
        end_points["prediction"] = pred
        return pred, end_points
