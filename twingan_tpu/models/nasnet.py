"""NASNet-A (mobile / large) in Flax — structural port.

Reference parity: nets/nasnet/nasnet.py + nasnet_utils.py (slim). The
NASNet-A cell structure (five branch-pairs of separable convs / pools over
the current and previous cell outputs, concatenated), the factorized
reduction for skip-shape matching, the stem, and the mobile/large stack
shapes (num_cells=12/18, penultimate filters 1056/4032) follow the
reference. Drop-path (nasnet_utils.py:401-427: per-op batchwise drop with
keep-prob scaled by layer ratio and training progress) and the auxiliary
head (nasnet.py:219-240: avgpool5x5/3 -> 1x1x128 -> bn -> relu -> conv768
-> bn -> relu -> fc, consumed at weight 0.4 by train_image_classifier.py:
115-116) are implemented; the time ramp is exposed as the ``progress``
call argument (global_step/total_steps in the reference).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn


def _drop_path(module: nn.Module, x: jax.Array, keep_prob) -> jax.Array:
    """nasnet_utils.drop_path: drop a whole sample's branch with prob
    1-keep_prob, rescaling survivors by 1/keep_prob."""
    rng = module.make_rng("drop_path")
    mask = jnp.floor(
        keep_prob + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype)
    )
    return x / keep_prob * mask


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
    (nasnet_utils factorized reduction, approximated by a strided squeeze).
    Ceil-division stride + SAME padding so odd sizes (299/331 inputs:
    83 -> 42) land exactly on the current cell's spatial size."""
    stride = -(-prev.shape[1] // cur_hw)  # ceil
    return _Squeeze(features, stride=max(stride, 1),
                    name=f"{name_parent}_fit{idx}")(prev, train)


class _NormalCell(nn.Module):
    """Exact NasNetANormalCell genotype (nasnet_utils.py:428-452):
    operations/hiddenstate_indices pairs over s0=h_prev(fit), s1=h(squeeze);
    used_hiddenstates=[1,0,...] keeps s1 + the five new states -> 6f out."""

    features: int
    use_drop_path: bool = False  # static gate (base keep_prob < 1 and train)

    @nn.compact
    def __call__(self, h, h_prev, train: bool, keep_prob=1.0):
        # keep_prob is layer/progress-adjusted by the parent and may be a
        # traced scalar (progress = step/total inside jit).
        f = self.features
        dp = (lambda v: _drop_path(self, v, keep_prob)) \
            if (train and self.use_drop_path) else (lambda v: v)
        h1 = _Squeeze(f, name="sq_h")(h, train)
        h0 = _fit(h_prev, h.shape[1], f, train, "prev")
        y1 = dp(_SepConv(f, 5, name="s1a")(h0, train)) + dp(_SepConv(f, 3, name="s1b")(h1, train))
        y2 = dp(_SepConv(f, 5, name="s2a")(h1, train)) + dp(_SepConv(f, 3, name="s2b")(h1, train))
        y3 = dp(nn.avg_pool(h0, (3, 3), (1, 1), "SAME")) + h1
        y4 = dp(nn.avg_pool(h1, (3, 3), (1, 1), "SAME")) + dp(nn.avg_pool(h1, (3, 3), (1, 1), "SAME"))
        y5 = dp(_SepConv(f, 3, name="s5a")(h0, train)) + h0
        return jnp.concatenate([h1, y1, y2, y3, y4, y5], axis=-1)


class _ReductionCell(nn.Module):
    """Exact NasNetAReductionCell genotype (nasnet_utils.py:455-478):
    indices [0,1,0,1,0,1,3,2,2,0]; stride 2 on s0/s1 inputs, stride 1 on
    new states; used_hiddenstates=[1,1,1,0,...] -> concat z2..z5 = 4f."""

    features: int
    use_drop_path: bool = False

    @nn.compact
    def __call__(self, h, h_prev, train: bool, keep_prob=1.0):
        f = self.features
        dp = (lambda v: _drop_path(self, v, keep_prob)) \
            if (train and self.use_drop_path) else (lambda v: v)
        h1 = _Squeeze(f, name="sq_h")(h, train)
        h0 = _fit(h_prev, h.shape[1], f, train, "prev")
        z1 = dp(_SepConv(f, 5, 2, name="r1a")(h0, train)) + dp(_SepConv(f, 7, 2, name="r1b")(h1, train))
        z2 = dp(nn.max_pool(h0, (3, 3), (2, 2), "SAME")) + dp(_SepConv(f, 7, 2, name="r2b")(h1, train))
        z3 = dp(nn.avg_pool(h0, (3, 3), (2, 2), "SAME")) + dp(_SepConv(f, 5, 2, name="r3b")(h1, train))
        z4 = z2 + dp(nn.avg_pool(z1, (3, 3), (1, 1), "SAME"))
        z5 = dp(_SepConv(f, 3, name="r5a")(z1, train)) + dp(nn.max_pool(h0, (3, 3), (2, 2), "SAME"))
        return jnp.concatenate([z2, z3, z4, z5], axis=-1)


class _AuxHead(nn.Module):
    """reference nasnet.py:219-240 auxiliary classifier head. Convs are
    linear and bias-free with relu only AFTER batch norm (the nasnet
    arg_scope, nasnet.py:142-144)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = jax.nn.relu(x)
        x = nn.avg_pool(x, (5, 5), (3, 3), "VALID")
        x = nn.Conv(128, (1, 1), use_bias=False, name="proj")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=0.001, name="aux_bn0")(x)
        x = jax.nn.relu(x)
        hw = (x.shape[1], x.shape[2])
        x = nn.Conv(768, hw, padding="VALID", use_bias=False, name="conv768")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=0.001, name="aux_bn1")(x)
        x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="fc")(x)


class NASNet(nn.Module):
    """NASNet-A stack: stem, then (N normal cells + reduction) x3."""

    num_classes: int = 1000
    num_cells: int = 12          # mobile: 12; large: 18
    initial_filters: int = 44    # mobile: 44; large: 168
    stem_filters: int = 32       # mobile: 32; large: 96
    drop_path_keep_prob: float = 1.0  # mobile train: 0.6; large train: 0.7
    use_aux_head: bool = True
    default_image_size = 224

    def _cell_keep_prob(self, cell_idx: int, progress):
        """Layer-ratio + training-progress schedule (nasnet_utils.py:
        401-427). ``progress`` = global_step / total_training_steps and may
        be a traced scalar; returns a (possibly traced) keep probability."""
        base = self.drop_path_keep_prob
        if base >= 1.0:
            return 1.0
        # Reference total: num_cells + 2 reduction cells + 2 imagenet stem
        # cells (nasnet.py:389-391); ``cell_idx`` here is the true cell
        # number (stem cells are 0/1, the first normal cell is 2,
        # nasnet.py:458-459).
        total = self.num_cells + 4
        layer_ratio = (cell_idx + 1) / total
        kp = 1.0 - layer_ratio * (1.0 - base)
        return 1.0 - jnp.clip(progress, 0.0, 1.0) * (1.0 - kp)

    @nn.compact
    def __call__(self, x, *, train: bool = False, probes=None,
                 progress: float = 1.0):
        eps: Dict[str, jax.Array] = {}
        x = nn.Conv(self.stem_filters, (3, 3), strides=(2, 2), use_bias=False,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=0.001, name="stem_bn")(x)
        f = self.initial_filters
        prev, cur = x, x
        use_dp = self.drop_path_keep_prob < 1.0
        # Two reduction stem cells (reference imagenet stem,
        # nasnet.py:256-266: filter_scaling 1/rate^2 then 1/rate ->
        # f//4 and f//2; they occupy true cell numbers 0 and 1).
        for i in range(2):
            nxt = _ReductionCell(
                f // (2 ** (2 - i)), use_drop_path=use_dp,
                name=f"stem_cell{i}")(
                cur, prev, train, keep_prob=self._cell_keep_prob(i, progress))
            prev, cur = cur, nxt
        per_stack = self.num_cells // 3
        cell_id = 2  # true cell number; stem cells took 0 and 1
        for stack in range(3):
            for _ in range(per_stack):
                nxt = _NormalCell(f, use_drop_path=use_dp, name=f"cell_{cell_id}")(
                    cur, prev, train,
                    keep_prob=self._cell_keep_prob(cell_id, progress))
                prev, cur = cur, nxt
                cell_id += 1
            # Aux head hangs off the cell just before the SECOND reduction
            # (reference aux_head_cell_idxes = reduction_indices[1] - 1,
            # nasnet.py:452-454,491-494).
            if (stack == 1 and self.use_aux_head and self.num_classes
                    and cur.shape[1] >= 5):  # needs the 5x5/3 pool to fit
                eps["AuxLogits"] = _AuxHead(
                    self.num_classes, name="aux_head")(cur, train)
            if stack < 2:
                f *= 2
                nxt = _ReductionCell(f, use_drop_path=use_dp, name=f"reduction_{stack}")(
                    cur, prev, train,
                    keep_prob=self._cell_keep_prob(cell_id, progress))
                prev, cur = cur, nxt
                cell_id += 1
            if probes and f"stack_{stack}" in probes:
                cur = cur + probes[f"stack_{stack}"]
            eps[f"stack_{stack}"] = cur
        cur = jax.nn.relu(cur)
        cur = jnp.mean(cur, axis=(1, 2))
        eps["PreLogits"] = cur
        logits = nn.Dense(self.num_classes, name="Logits")(cur)
        eps["Logits"] = logits
        return logits, eps
