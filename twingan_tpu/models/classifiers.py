"""Classifier zoo + factory (reference nets/ TF-Slim zoo + nets_factory.py).

The reference carries a ~5.6k-LoC slim zoo used for three jobs: training the
illust2vec anime tagger whose embeddings feed TwinGAN distillation, inception
scoring, and generic classification (SURVEY.md section 2.2). This is a Flax
re-design sharing one conv-stack vocabulary:

- lenet, cifarnet, alexnet_v2          (small nets, exact layer counts)
- vgg_a / vgg_16 / vgg_19              (stage-configured conv stacks)
- illust2vec                           (VGG-variant anime tagger,
                                        reference nets/illust2vec.py)
- resnet_v1_50/101, resnet_v2_50/101   (bottleneck residual stacks,
                                        v2 = preactivation)
- mobilenet_v1                         (depthwise separable stack)

get_network_fn(name, num_classes) mirrors nets_factory: returns a callable
module with .default_image_size. Inception v1-v4 / inception-resnet-v2 live
in models/inception.py and NASNet mobile/large (with drop-path + aux head)
in models/nasnet.py; both register into this factory, so every reference
nets_factory name resolves (PLANNED is empty).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class _BN(nn.Module):
    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        if self.kind == "layer":
            return nn.LayerNorm(epsilon=1e-5)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.997, epsilon=1e-5)(x)


def _max_pool(x, window=2, stride=2, padding="VALID"):
    return nn.max_pool(x, (window, window), (stride, stride), padding)


def _ep(eps, probes, name, x):
    """Register an end point, adding the Grad-CAM probe when given (see
    models/grad_cam.py: d(score)/d(probe)|0 == d(score)/d(activations))."""
    if probes and name in probes:
        x = x + probes[name]
    eps[name] = x
    return x


class LeNet(nn.Module):
    """reference nets/lenet.py: 2 conv+pool, fc1024, logits."""

    num_classes: int = 10
    default_image_size = 28

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = _ep(eps, probes, "conv1", jax.nn.relu(nn.Conv(32, (5, 5), name="conv1")(x)))
        x = _max_pool(x)
        x = _ep(eps, probes, "conv2", jax.nn.relu(nn.Conv(64, (5, 5), name="conv2")(x)))
        x = _max_pool(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(1024, name="fc3")(x))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="fc4")(x)
        eps["Logits"] = logits
        return logits, eps


class CifarNet(nn.Module):
    """reference nets/cifarnet.py: 2x (conv+pool/lrn) with tf.nn.lrn
    parameters (r=4, bias=1, alpha=0.001/9, beta=0.75; :68,71), fc384,
    fc192."""

    num_classes: int = 10
    default_image_size = 32

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        from twingan_tpu.ops import local_response_norm

        def lrn(v):
            return local_response_norm(v, 4, bias=1.0, alpha=0.001 / 9.0, beta=0.75)

        eps: Dict[str, Any] = {}
        x = jax.nn.relu(nn.Conv(64, (5, 5), name="conv1")(x))
        x = _max_pool(x, 2, 2)
        x = lrn(x)
        x = _ep(eps, probes, "conv2", jax.nn.relu(nn.Conv(64, (5, 5), name="conv2")(x)))
        x = lrn(x)
        x = _max_pool(x, 2, 2)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(384, name="fc3")(x))
        x = jax.nn.relu(nn.Dense(192, name="fc4")(x))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="logits")(x)
        eps["Logits"] = logits
        return logits, eps


class AlexNetV2(nn.Module):
    """reference nets/alexnet.py (fully-convolutional head)."""

    num_classes: int = 1000
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = jax.nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding="VALID", name="conv1")(x))
        x = _max_pool(x, 3, 2)
        x = jax.nn.relu(nn.Conv(192, (5, 5), name="conv2")(x))
        x = _max_pool(x, 3, 2)
        x = jax.nn.relu(nn.Conv(384, (3, 3), name="conv3")(x))
        x = jax.nn.relu(nn.Conv(384, (3, 3), name="conv4")(x))
        x = jax.nn.relu(nn.Conv(256, (3, 3), name="conv5")(x))
        x = _ep(eps, probes, "conv5", x)
        x = _max_pool(x, 3, 2)
        x = jax.nn.relu(nn.Conv(4096, (5, 5), padding="VALID", name="fc6")(x))
        x = jax.nn.relu(nn.Conv(4096, (1, 1), name="fc7")(x))
        x = nn.Conv(self.num_classes, (1, 1), name="fc8")(x)
        logits = jnp.mean(x, axis=(1, 2))
        eps["Logits"] = logits
        return logits, eps


class OverFeat(nn.Module):
    """reference nets/overfeat.py: the accurate-model conv stack with a
    fully-convolutional fc head."""

    num_classes: int = 1000
    default_image_size = 231

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = jax.nn.relu(nn.Conv(64, (11, 11), strides=(4, 4), padding="VALID", name="conv1")(x))
        x = _max_pool(x, 2, 2)
        x = jax.nn.relu(nn.Conv(256, (5, 5), padding="VALID", name="conv2")(x))
        x = _max_pool(x, 2, 2)
        x = jax.nn.relu(nn.Conv(512, (3, 3), name="conv3")(x))
        x = jax.nn.relu(nn.Conv(1024, (3, 3), name="conv4")(x))
        x = _ep(eps, probes, "conv5", jax.nn.relu(nn.Conv(1024, (3, 3), name="conv5")(x)))
        x = _max_pool(x, 2, 2)
        x = jax.nn.relu(nn.Conv(3072, (6, 6), padding="VALID", name="fc6")(x))
        x = jax.nn.relu(nn.Conv(4096, (1, 1), name="fc7")(x))
        x = nn.Conv(self.num_classes, (1, 1), name="fc8")(x)
        logits = jnp.mean(x, axis=(1, 2))
        eps["Logits"] = logits
        return logits, eps


class VGG(nn.Module):
    """VGG family; stages = convs per block (reference nets/vgg.py).
    vgg_a=(1,1,2,2,2), vgg_16=(2,2,3,3,3), vgg_19=(2,2,4,4,4)."""

    num_classes: int = 1000
    stages: Sequence[int] = (2, 2, 3, 3, 3)
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        filters = (64, 128, 256, 512, 512)
        for b, (reps, f) in enumerate(zip(self.stages, filters), start=1):
            for r in range(1, reps + 1):
                x = jax.nn.relu(nn.Conv(f, (3, 3), name=f"conv{b}_{r}")(x))
            x = _ep(eps, probes, f"conv{b}", x)
            x = _max_pool(x)
        x = jax.nn.relu(nn.Conv(4096, (7, 7), padding="VALID", name="fc6")(x))
        x = jax.nn.relu(nn.Conv(4096, (1, 1), name="fc7")(x))
        eps["PreLogits"] = x
        x = nn.Conv(self.num_classes, (1, 1), name="fc8")(x)
        logits = jnp.mean(x, axis=(1, 2))
        eps["Logits"] = logits
        return logits, eps


class Illust2Vec(nn.Module):
    """VGG-variant anime tagger (reference nets/illust2vec.py): conv stack
    without the 4096 fc bottlenecks, ends in a 1539-way multi-label head; the
    pooled pre-logits are the distillation embedding."""

    num_classes: int = 1539
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        plan = [(64, 1), (128, 1), (256, 2), (512, 2), (512, 2), (1024, 3)]
        for b, (f, reps) in enumerate(plan, start=1):
            for r in range(1, reps + 1):
                x = jax.nn.relu(nn.Conv(f, (3, 3), name=f"conv{b}_{r}")(x))
            x = _ep(eps, probes, f"conv{b}", x)
            if b < len(plan):
                x = _max_pool(x)
        x = _ep(eps, probes, "conv6_3", x)
        x = jnp.mean(x, axis=(1, 2))
        eps["encode"] = x  # the distillation embedding
        logits = nn.Dense(self.num_classes, name="logits")(x)
        eps["Logits"] = logits
        return logits, eps


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1
    preact: bool = False  # v2
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool):
        f = self.features
        shortcut = x
        if self.preact:
            x = jax.nn.relu(_BN(self.norm, name="preact_bn")(x, train))
            pre = x
        y = nn.Conv(f, (1, 1), name="conv1", use_bias=False)(x)
        y = jax.nn.relu(_BN(self.norm, name="bn1")(y, train))
        y = nn.Conv(f, (3, 3), strides=(self.stride, self.stride), name="conv2", use_bias=False)(y)
        y = jax.nn.relu(_BN(self.norm, name="bn2")(y, train))
        y = nn.Conv(4 * f, (1, 1), name="conv3", use_bias=False)(y)
        if not self.preact:
            y = _BN(self.norm, name="bn3")(y, train)
        if shortcut.shape[-1] != 4 * f or self.stride != 1:
            src = pre if self.preact else shortcut
            shortcut = nn.Conv(4 * f, (1, 1), strides=(self.stride, self.stride),
                               name="shortcut", use_bias=False)(src)
            if not self.preact:
                shortcut = _BN(self.norm, name="shortcut_bn")(shortcut, train)
        out = shortcut + y
        if not self.preact:
            out = jax.nn.relu(out)
        return out


class ResNet(nn.Module):
    """resnet_v1/v2 {50, 101} (reference nets/resnet_v1.py, resnet_v2.py);
    norm='layer' gives resnet_v2_layernorm (reference
    nets/resnet_v2_layernorm.py)."""

    num_classes: int = 1000
    blocks: Sequence[int] = (3, 4, 6, 3)
    preact: bool = False
    norm: str = "batch"
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}
        x = nn.Conv(64, (7, 7), strides=(2, 2), name="conv1", use_bias=False)(x)
        if not self.preact:
            x = jax.nn.relu(_BN(self.norm, name="bn1")(x, train))
        x = _max_pool(x, 3, 2, padding="SAME")
        for stage, reps in enumerate(self.blocks):
            f = 64 * 2**stage
            for block in range(reps):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = _Bottleneck(f, stride, self.preact, self.norm, name=f"block{stage + 1}_{block + 1}")(x, train)
            x = _ep(eps, probes, f"block{stage + 1}", x)
        if self.preact:
            x = jax.nn.relu(_BN(self.norm, name="postnorm")(x, train))
        x = jnp.mean(x, axis=(1, 2))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="logits")(x)
        eps["Logits"] = logits
        return logits, eps


class MobileNetV1(nn.Module):
    """reference nets/mobilenet_v1.py depthwise-separable stack."""

    num_classes: int = 1000
    depth_multiplier: float = 1.0
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, Any] = {}

        def d(ch):
            return max(8, int(ch * self.depth_multiplier))

        def sep(x, ch, stride, name):
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (3, 3), strides=(stride, stride), feature_group_count=in_ch,
                        name=f"{name}_dw", use_bias=False)(x)
            x = jax.nn.relu6(_BN(name=f"{name}_dw_bn")(x, train))
            x = nn.Conv(d(ch), (1, 1), name=f"{name}_pw", use_bias=False)(x)
            return jax.nn.relu6(_BN(name=f"{name}_pw_bn")(x, train))

        x = nn.Conv(d(32), (3, 3), strides=(2, 2), name="conv0", use_bias=False)(x)
        x = jax.nn.relu6(_BN(name="conv0_bn")(x, train))
        plan = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2)] + [(512, 1)] * 5 + [
            (1024, 2), (1024, 1)]
        for i, (ch, stride) in enumerate(plan, start=1):
            x = sep(x, ch, stride, f"sep{i}")
        x = _ep(eps, probes, "conv13", x)
        x = jnp.mean(x, axis=(1, 2))
        eps["PreLogits"] = x
        logits = nn.Dense(self.num_classes, name="logits")(x)
        eps["Logits"] = logits
        return logits, eps


def _inception(name):
    from twingan_tpu.models import inception

    return getattr(inception, name)


def _nasnet(**kw):
    from twingan_tpu.models.nasnet import NASNet

    return NASNet(**kw)


NETWORKS: Dict[str, Callable[..., nn.Module]] = {
    "lenet": LeNet,
    "cifarnet": CifarNet,
    "alexnet_v2": AlexNetV2,
    "vgg_a": functools.partial(VGG, stages=(1, 1, 2, 2, 2)),
    "vgg_16": functools.partial(VGG, stages=(2, 2, 3, 3, 3)),
    "vgg_19": functools.partial(VGG, stages=(2, 2, 4, 4, 4)),
    "illust2vec": Illust2Vec,
    "resnet_v1_50": functools.partial(ResNet, blocks=(3, 4, 6, 3), preact=False),
    "resnet_v1_101": functools.partial(ResNet, blocks=(3, 4, 23, 3), preact=False),
    "resnet_v2_50": functools.partial(ResNet, blocks=(3, 4, 6, 3), preact=True),
    "resnet_v2_101": functools.partial(ResNet, blocks=(3, 4, 23, 3), preact=True),
    "mobilenet_v1": MobileNetV1,
    "inception_v1": lambda **kw: _inception("InceptionV1")(**kw),
    "inception_v2": lambda **kw: _inception("InceptionV2")(**kw),
    "inception_v3": lambda **kw: _inception("InceptionV3")(**kw),
    "inception_v4": lambda **kw: _inception("InceptionV4")(**kw),
    "inception_resnet_v2": lambda **kw: _inception("InceptionResNetV2")(**kw),
    "overfeat": OverFeat,
    # drop_path_keep_prob per reference hparams: mobile ImageNet trains
    # WITHOUT drop path (nasnet.py:98 keep_prob=1.0); large uses 0.7
    # (:69); the cifar config's 0.6 (:39) has no named factory entry.
    "nasnet_mobile": lambda **kw: _nasnet(num_cells=12, initial_filters=44,
                                          stem_filters=32, drop_path_keep_prob=1.0, **kw),
    "nasnet_large": lambda **kw: _nasnet(num_cells=18, initial_filters=168,
                                         stem_filters=96, drop_path_keep_prob=0.7, **kw),
    "resnet_v2_layernorm": functools.partial(ResNet, blocks=(3, 4, 6, 3), preact=True, norm="layer"),
}

# Every net the reference factory registers is now ported.
PLANNED = ()


def get_network_fn(name: str, num_classes: int, **kwargs) -> nn.Module:
    """nets_factory.get_network_fn equivalent: returns a Flax module."""
    if name in PLANNED:
        raise NotImplementedError(
            f"{name} is registered but not yet ported; available: {sorted(NETWORKS)}"
        )
    if name not in NETWORKS:
        raise ValueError(f"unknown network {name!r}; available: {sorted(NETWORKS)}")
    return NETWORKS[name](num_classes=num_classes, **kwargs)
