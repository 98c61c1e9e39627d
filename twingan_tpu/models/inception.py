"""Inception v1 (GoogLeNet) and v3 in Flax.

Reference parity: nets/inception_v1.py and nets/inception_v3.py (slim) —
used for inception-score evaluation and tagger training. Branch structures
and filter counts follow the slim definitions; every conv is
conv-batchnorm-relu ('conv2d with batch_norm arg scope').
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvBNRelu(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, strides=self.strides, padding=self.padding,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997, epsilon=0.001,
                         name="bn")(x)
        return jax.nn.relu(x)


def _max_pool(x, k=3, s=1, padding="SAME"):
    return nn.max_pool(x, (k, k), (s, s), padding)


def _avg_pool(x, k=3, s=1, padding="SAME"):
    return nn.avg_pool(x, (k, k), (s, s), padding)


class InceptionV1Block(nn.Module):
    """GoogLeNet mixed block: 1x1 | 1x1-3x3 | 1x1-5x5 | pool-1x1."""

    b0: int
    b1: Sequence[int]
    b2: Sequence[int]
    b3: int

    @nn.compact
    def __call__(self, x, train: bool):
        br0 = ConvBNRelu(self.b0, (1, 1), name="b0")(x, train)
        br1 = ConvBNRelu(self.b1[0], (1, 1), name="b1_0")(x, train)
        br1 = ConvBNRelu(self.b1[1], (3, 3), name="b1_1")(br1, train)
        br2 = ConvBNRelu(self.b2[0], (1, 1), name="b2_0")(x, train)
        br2 = ConvBNRelu(self.b2[1], (3, 3), name="b2_1")(br2, train)
        br3 = ConvBNRelu(self.b3, (1, 1), name="b3_1")(_max_pool(x), train)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class InceptionV1(nn.Module):
    num_classes: int = 1000
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, jax.Array] = {}
        net = ConvBNRelu(64, (7, 7), (2, 2), name="Conv2d_1a_7x7")(x, train)
        net = _max_pool(net, 3, 2)
        net = ConvBNRelu(64, (1, 1), name="Conv2d_2b_1x1")(net, train)
        net = ConvBNRelu(192, (3, 3), name="Conv2d_2c_3x3")(net, train)
        net = _max_pool(net, 3, 2)
        plan = [
            ("Mixed_3b", 64, (96, 128), (16, 32), 32),
            ("Mixed_3c", 128, (128, 192), (32, 96), 64),
            ("pool", 0, (), (), 0),
            ("Mixed_4b", 192, (96, 208), (16, 48), 64),
            ("Mixed_4c", 160, (112, 224), (24, 64), 64),
            ("Mixed_4d", 128, (128, 256), (24, 64), 64),
            ("Mixed_4e", 112, (144, 288), (32, 64), 64),
            ("Mixed_4f", 256, (160, 320), (32, 128), 128),
            ("pool2", 0, (), (), 0),
            ("Mixed_5b", 256, (160, 320), (32, 128), 128),
            ("Mixed_5c", 384, (192, 384), (48, 128), 128),
        ]
        for name, b0, b1, b2, b3 in plan:
            if name.startswith("pool"):
                net = _max_pool(net, 3, 2)
            else:
                net = InceptionV1Block(b0, b1, b2, b3, name=name)(net, train)
                if probes and name in probes:
                    net = net + probes[name]
                eps[name] = net
        net = jnp.mean(net, axis=(1, 2))
        eps["PreLogits"] = net
        logits = nn.Dense(self.num_classes, name="Logits")(net)
        eps["Logits"] = logits
        return logits, eps


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(64, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(48, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(64, (5, 5), name="b1_1")(b1, train)
        b2 = ConvBNRelu(64, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(96, (3, 3), name="b2_1")(b2, train)
        b2 = ConvBNRelu(96, (3, 3), name="b2_2")(b2, train)
        b3 = ConvBNRelu(self.pool_features, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionA(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(384, (3, 3), (2, 2), "VALID", name="b0")(x, train)
        b1 = ConvBNRelu(64, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(96, (3, 3), name="b1_1")(b1, train)
        b1 = ConvBNRelu(96, (3, 3), (2, 2), "VALID", name="b1_2")(b1, train)
        b2 = _max_pool(x, 3, 2, "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionB(nn.Module):
    c7: int  # 128/160/192

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.c7
        b0 = ConvBNRelu(192, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(c, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(c, (1, 7), name="b1_1")(b1, train)
        b1 = ConvBNRelu(192, (7, 1), name="b1_2")(b1, train)
        b2 = ConvBNRelu(c, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(c, (7, 1), name="b2_1")(b2, train)
        b2 = ConvBNRelu(c, (1, 7), name="b2_2")(b2, train)
        b2 = ConvBNRelu(c, (7, 1), name="b2_3")(b2, train)
        b2 = ConvBNRelu(192, (1, 7), name="b2_4")(b2, train)
        b3 = ConvBNRelu(192, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ReductionB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(192, (1, 1), name="b0_0")(x, train)
        b0 = ConvBNRelu(320, (3, 3), (2, 2), "VALID", name="b0_1")(b0, train)
        b1 = ConvBNRelu(192, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(192, (1, 7), name="b1_1")(b1, train)
        b1 = ConvBNRelu(192, (7, 1), name="b1_2")(b1, train)
        b1 = ConvBNRelu(192, (3, 3), (2, 2), "VALID", name="b1_3")(b1, train)
        b2 = _max_pool(x, 3, 2, "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(320, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(384, (1, 1), name="b1_0")(x, train)
        b1 = jnp.concatenate(
            [
                ConvBNRelu(384, (1, 3), name="b1_1a")(b1, train),
                ConvBNRelu(384, (3, 1), name="b1_1b")(b1, train),
            ],
            axis=-1,
        )
        b2 = ConvBNRelu(448, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(384, (3, 3), name="b2_1")(b2, train)
        b2 = jnp.concatenate(
            [
                ConvBNRelu(384, (1, 3), name="b2_2a")(b2, train),
                ConvBNRelu(384, (3, 1), name="b2_2b")(b2, train),
            ],
            axis=-1,
        )
        b3 = ConvBNRelu(192, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    default_image_size = 299

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, jax.Array] = {}
        net = ConvBNRelu(32, (3, 3), (2, 2), "VALID", name="Conv2d_1a_3x3")(x, train)
        net = ConvBNRelu(32, (3, 3), padding="VALID", name="Conv2d_2a_3x3")(net, train)
        net = ConvBNRelu(64, (3, 3), name="Conv2d_2b_3x3")(net, train)
        net = _max_pool(net, 3, 2, "VALID")
        net = ConvBNRelu(80, (1, 1), padding="VALID", name="Conv2d_3b_1x1")(net, train)
        net = ConvBNRelu(192, (3, 3), padding="VALID", name="Conv2d_4a_3x3")(net, train)
        net = _max_pool(net, 3, 2, "VALID")
        for name, pool_f in [("Mixed_5b", 32), ("Mixed_5c", 64), ("Mixed_5d", 64)]:
            net = InceptionA(pool_f, name=name)(net, train)
            if probes and name in probes:
                net = net + probes[name]
            eps[name] = net
        net = ReductionA(name="Mixed_6a")(net, train)
        eps["Mixed_6a"] = net
        for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            net = InceptionB(c7, name=name)(net, train)
            if probes and name in probes:
                net = net + probes[name]
            eps[name] = net
        net = ReductionB(name="Mixed_7a")(net, train)
        eps["Mixed_7a"] = net
        for name in ("Mixed_7b", "Mixed_7c"):
            net = InceptionC(name=name)(net, train)
            if probes and name in probes:
                net = net + probes[name]
            eps[name] = net
        net = jnp.mean(net, axis=(1, 2))
        eps["PreLogits"] = net
        logits = nn.Dense(self.num_classes, name="Logits")(net)
        eps["Logits"] = logits
        return logits, eps
