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


class InceptionV2Block(nn.Module):
    """v2 mixed block: 1x1 | 1x1-3x3 | 1x1-3x3-3x3 | pool-1x1."""

    b0: int
    b1: Sequence[int]
    b2: Sequence[int]
    b3: int
    pool: str = "avg"

    @nn.compact
    def __call__(self, x, train: bool):
        branches = []
        if self.b0:
            branches.append(ConvBNRelu(self.b0, (1, 1), name="b0")(x, train))
        br1 = ConvBNRelu(self.b1[0], (1, 1), name="b1_0")(x, train)
        branches.append(ConvBNRelu(self.b1[1], (3, 3), name="b1_1")(br1, train))
        br2 = ConvBNRelu(self.b2[0], (1, 1), name="b2_0")(x, train)
        br2 = ConvBNRelu(self.b2[1], (3, 3), name="b2_1")(br2, train)
        branches.append(ConvBNRelu(self.b2[1], (3, 3), name="b2_2")(br2, train))
        pooled = _avg_pool(x) if self.pool == "avg" else _max_pool(x)
        if self.b3:
            pooled = ConvBNRelu(self.b3, (1, 1), name="b3_1")(pooled, train)
        branches.append(pooled)
        return jnp.concatenate(branches, axis=-1)


class InceptionV2Reduction(nn.Module):
    b1: Sequence[int]
    b2: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool):
        br1 = ConvBNRelu(self.b1[0], (1, 1), name="b1_0")(x, train)
        br1 = ConvBNRelu(self.b1[1], (3, 3), (2, 2), name="b1_1")(br1, train)
        br2 = ConvBNRelu(self.b2[0], (1, 1), name="b2_0")(x, train)
        br2 = ConvBNRelu(self.b2[1], (3, 3), name="b2_1")(br2, train)
        br2 = ConvBNRelu(self.b2[1], (3, 3), (2, 2), name="b2_2")(br2, train)
        return jnp.concatenate([br1, br2, _max_pool(x, 3, 2)], axis=-1)


class InceptionV2(nn.Module):
    """reference nets/inception_v2.py: v1-shaped stack with double-3x3
    branches (slim filter tables)."""

    num_classes: int = 1000
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        # Stem: depthwise-separable 7x7/2, pool, 1x1, 3x3, pool.
        in_ch = x.shape[-1]
        x = nn.Conv(8 * in_ch, (7, 7), strides=(2, 2), feature_group_count=in_ch,
                    use_bias=False, name="Conv2d_1a_dw")(x)
        x = nn.Conv(64, (1, 1), use_bias=False, name="Conv2d_1a_pw")(x)
        x = jax.nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                                     epsilon=0.001, name="Conv2d_1a_bn")(x))
        x = _max_pool(x, 3, 2)
        x = ConvBNRelu(64, (1, 1), name="Conv2d_2b_1x1")(x, train)
        x = ConvBNRelu(192, (3, 3), name="Conv2d_2c_3x3")(x, train)
        x = _max_pool(x, 3, 2)
        plan = [
            ("Mixed_3b", dict(b0=64, b1=(64, 64), b2=(64, 96), b3=32)),
            ("Mixed_3c", dict(b0=64, b1=(64, 96), b2=(64, 96), b3=64)),
            ("Mixed_4a", "reduce_a"),
            ("Mixed_4b", dict(b0=224, b1=(64, 96), b2=(96, 128), b3=128)),
            ("Mixed_4c", dict(b0=192, b1=(96, 128), b2=(96, 128), b3=128)),
            ("Mixed_4d", dict(b0=160, b1=(128, 160), b2=(128, 160), b3=96)),
            ("Mixed_4e", dict(b0=96, b1=(128, 192), b2=(160, 192), b3=96)),
            ("Mixed_5a", "reduce_b"),
            ("Mixed_5b", dict(b0=352, b1=(192, 320), b2=(160, 224), b3=128)),
            ("Mixed_5c", dict(b0=352, b1=(192, 320), b2=(192, 224), b3=128, pool="max")),
        ]
        for name, spec in plan:
            if spec == "reduce_a":
                x = InceptionV2Reduction((128, 160), (64, 96), name=name)(x, train)
            elif spec == "reduce_b":
                x = InceptionV2Reduction((128, 192), (192, 256), name=name)(x, train)
            else:
                x = InceptionV2Block(**spec, name=name)(x, train)
            if probes and name in probes:
                x = x + probes[name]
            eps[name] = x
        x = jnp.mean(x, axis=(1, 2))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="Logits")(x)
        eps["Logits"] = logits
        return logits, eps


class _V4Stem(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBNRelu(32, (3, 3), (2, 2), "VALID", name="s0")(x, train)
        x = ConvBNRelu(32, (3, 3), padding="VALID", name="s1")(x, train)
        x = ConvBNRelu(64, (3, 3), name="s2")(x, train)
        a = _max_pool(x, 3, 2, "VALID")
        b = ConvBNRelu(96, (3, 3), (2, 2), "VALID", name="s3b")(x, train)
        x = jnp.concatenate([a, b], axis=-1)
        a = ConvBNRelu(64, (1, 1), name="s4a0")(x, train)
        a = ConvBNRelu(96, (3, 3), padding="VALID", name="s4a1")(a, train)
        b = ConvBNRelu(64, (1, 1), name="s4b0")(x, train)
        b = ConvBNRelu(64, (7, 1), name="s4b1")(b, train)
        b = ConvBNRelu(64, (1, 7), name="s4b2")(b, train)
        b = ConvBNRelu(96, (3, 3), padding="VALID", name="s4b3")(b, train)
        x = jnp.concatenate([a, b], axis=-1)
        a = ConvBNRelu(192, (3, 3), (2, 2), "VALID", name="s5a")(x, train)
        b = _max_pool(x, 3, 2, "VALID")
        return jnp.concatenate([a, b], axis=-1)


class _V4BlockA(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(96, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(64, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(96, (3, 3), name="b1_1")(b1, train)
        b2 = ConvBNRelu(64, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(96, (3, 3), name="b2_1")(b2, train)
        b2 = ConvBNRelu(96, (3, 3), name="b2_2")(b2, train)
        b3 = ConvBNRelu(96, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _V4BlockB(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(384, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(192, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(224, (1, 7), name="b1_1")(b1, train)
        b1 = ConvBNRelu(256, (7, 1), name="b1_2")(b1, train)
        b2 = ConvBNRelu(192, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(192, (7, 1), name="b2_1")(b2, train)
        b2 = ConvBNRelu(224, (1, 7), name="b2_2")(b2, train)
        b2 = ConvBNRelu(224, (7, 1), name="b2_3")(b2, train)
        b2 = ConvBNRelu(256, (1, 7), name="b2_4")(b2, train)
        b3 = ConvBNRelu(128, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _V4BlockC(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(256, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(384, (1, 1), name="b1_0")(x, train)
        b1 = jnp.concatenate([
            ConvBNRelu(256, (1, 3), name="b1_1a")(b1, train),
            ConvBNRelu(256, (3, 1), name="b1_1b")(b1, train),
        ], axis=-1)
        b2 = ConvBNRelu(384, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(448, (3, 1), name="b2_1")(b2, train)
        b2 = ConvBNRelu(512, (1, 3), name="b2_2")(b2, train)
        b2 = jnp.concatenate([
            ConvBNRelu(256, (1, 3), name="b2_3a")(b2, train),
            ConvBNRelu(256, (3, 1), name="b2_3b")(b2, train),
        ], axis=-1)
        b3 = ConvBNRelu(256, (1, 1), name="b3_1")(_avg_pool(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV4(nn.Module):
    """reference nets/inception_v4.py: stem + 4xA + redA + 7xB + redB + 3xC."""

    num_classes: int = 1000
    default_image_size = 299

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = _V4Stem(name="Stem")(x, train)
        for i in range(4):
            x = _V4BlockA(name=f"Mixed_5{chr(98 + i)}")(x, train)
        eps["Mixed_5e"] = x
        # Reduction A (k=192, l=224, m=256, n=384).
        a = ConvBNRelu(384, (3, 3), (2, 2), "VALID", name="RedA_b0")(x, train)
        b = ConvBNRelu(192, (1, 1), name="RedA_b1_0")(x, train)
        b = ConvBNRelu(224, (3, 3), name="RedA_b1_1")(b, train)
        b = ConvBNRelu(256, (3, 3), (2, 2), "VALID", name="RedA_b1_2")(b, train)
        x = jnp.concatenate([a, b, _max_pool(x, 3, 2, "VALID")], axis=-1)
        for i in range(7):
            x = _V4BlockB(name=f"Mixed_6{chr(98 + i)}")(x, train)
        if probes and "Mixed_6h" in probes:
            x = x + probes["Mixed_6h"]
        eps["Mixed_6h"] = x
        a = ConvBNRelu(192, (1, 1), name="RedB_b0_0")(x, train)
        a = ConvBNRelu(192, (3, 3), (2, 2), "VALID", name="RedB_b0_1")(a, train)
        b = ConvBNRelu(256, (1, 1), name="RedB_b1_0")(x, train)
        b = ConvBNRelu(256, (1, 7), name="RedB_b1_1")(b, train)
        b = ConvBNRelu(320, (7, 1), name="RedB_b1_2")(b, train)
        b = ConvBNRelu(320, (3, 3), (2, 2), "VALID", name="RedB_b1_3")(b, train)
        x = jnp.concatenate([a, b, _max_pool(x, 3, 2, "VALID")], axis=-1)
        for i in range(3):
            x = _V4BlockC(name=f"Mixed_7{chr(98 + i)}")(x, train)
        eps["Mixed_7d"] = x
        x = jnp.mean(x, axis=(1, 2))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="Logits")(x)
        eps["Logits"] = logits
        return logits, eps


class _ResBlock35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(32, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(32, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(32, (3, 3), name="b1_1")(b1, train)
        b2 = ConvBNRelu(32, (1, 1), name="b2_0")(x, train)
        b2 = ConvBNRelu(48, (3, 3), name="b2_1")(b2, train)
        b2 = ConvBNRelu(64, (3, 3), name="b2_2")(b2, train)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(mixed)
        return jax.nn.relu(x + self.scale * up)


class _ResBlock17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(192, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(128, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(160, (1, 7), name="b1_1")(b1, train)
        b1 = ConvBNRelu(192, (7, 1), name="b1_2")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(mixed)
        return jax.nn.relu(x + self.scale * up)


class _ResBlock8(nn.Module):
    scale: float = 0.20
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        b0 = ConvBNRelu(192, (1, 1), name="b0")(x, train)
        b1 = ConvBNRelu(192, (1, 1), name="b1_0")(x, train)
        b1 = ConvBNRelu(224, (1, 3), name="b1_1")(b1, train)
        b1 = ConvBNRelu(256, (3, 1), name="b1_2")(b1, train)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), name="up")(mixed)
        out = x + self.scale * up
        return jax.nn.relu(out) if self.activate else out


class InceptionResNetV2(nn.Module):
    """reference nets/inception_resnet_v2.py: stem + 10x block35 + redA +
    20x block17 + redB + 10x block8 + 1536 conv."""

    num_classes: int = 1000
    default_image_size = 299

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = ConvBNRelu(32, (3, 3), (2, 2), "VALID", name="Conv2d_1a")(x, train)
        x = ConvBNRelu(32, (3, 3), padding="VALID", name="Conv2d_2a")(x, train)
        x = ConvBNRelu(64, (3, 3), name="Conv2d_2b")(x, train)
        x = _max_pool(x, 3, 2, "VALID")
        x = ConvBNRelu(80, (1, 1), padding="VALID", name="Conv2d_3b")(x, train)
        x = ConvBNRelu(192, (3, 3), padding="VALID", name="Conv2d_4a")(x, train)
        x = _max_pool(x, 3, 2, "VALID")
        # Mixed_5b.
        b0 = ConvBNRelu(96, (1, 1), name="M5b_b0")(x, train)
        b1 = ConvBNRelu(48, (1, 1), name="M5b_b1_0")(x, train)
        b1 = ConvBNRelu(64, (5, 5), name="M5b_b1_1")(b1, train)
        b2 = ConvBNRelu(64, (1, 1), name="M5b_b2_0")(x, train)
        b2 = ConvBNRelu(96, (3, 3), name="M5b_b2_1")(b2, train)
        b2 = ConvBNRelu(96, (3, 3), name="M5b_b2_2")(b2, train)
        b3 = ConvBNRelu(64, (1, 1), name="M5b_b3_1")(_avg_pool(x), train)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        for i in range(10):
            x = _ResBlock35(name=f"block35_{i + 1}")(x, train)
        if probes and "block35" in probes:
            x = x + probes["block35"]
        eps["block35"] = x
        # Reduction A.
        a = ConvBNRelu(384, (3, 3), (2, 2), "VALID", name="RedA_b0")(x, train)
        b = ConvBNRelu(256, (1, 1), name="RedA_b1_0")(x, train)
        b = ConvBNRelu(256, (3, 3), name="RedA_b1_1")(b, train)
        b = ConvBNRelu(384, (3, 3), (2, 2), "VALID", name="RedA_b1_2")(b, train)
        x = jnp.concatenate([a, b, _max_pool(x, 3, 2, "VALID")], axis=-1)
        for i in range(20):
            x = _ResBlock17(name=f"block17_{i + 1}")(x, train)
        eps["block17"] = x
        # Reduction B.
        a = ConvBNRelu(256, (1, 1), name="RedB_b0_0")(x, train)
        a = ConvBNRelu(384, (3, 3), (2, 2), "VALID", name="RedB_b0_1")(a, train)
        b = ConvBNRelu(256, (1, 1), name="RedB_b1_0")(x, train)
        b = ConvBNRelu(288, (3, 3), (2, 2), "VALID", name="RedB_b1_1")(b, train)
        c = ConvBNRelu(256, (1, 1), name="RedB_b2_0")(x, train)
        c = ConvBNRelu(288, (3, 3), name="RedB_b2_1")(c, train)
        c = ConvBNRelu(320, (3, 3), (2, 2), "VALID", name="RedB_b2_2")(c, train)
        x = jnp.concatenate([a, b, c, _max_pool(x, 3, 2, "VALID")], axis=-1)
        for i in range(9):
            x = _ResBlock8(name=f"block8_{i + 1}")(x, train)
        x = _ResBlock8(scale=1.0, activate=False, name="block8_10")(x, train)
        x = ConvBNRelu(1536, (1, 1), name="Conv2d_7b")(x, train)
        eps["Conv2d_7b"] = x
        x = jnp.mean(x, axis=(1, 2))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="Logits")(x)
        eps["Logits"] = logits
        return logits, eps
