"""Flax building blocks: equalized conv/dense, domain/conditional norms,
spectral norm, self-attention, residual shortcuts.

Reference parity (re-designed, not translated):
- conv/fc + arg-scope wiring:  /root/reference/nets/pggan_utils.py:54-127,
  236-254 (equalized lr), 316-327 (spectral norm routing). Slim semantics are
  preserved: bias only when no normalizer; normalizer before activation.
- domain norms ('_s'/'_t' postfix -> per-domain param banks with shared conv
  weights): /root/reference/libs/batch_norm.py:130,153,184,196 and
  libs/instance_norm.py. Here a single module owns one param/stat bank per
  domain and the call selects a bank with a static index.
- conditional norms (beta = FC(style), gamma = 1 + FC(style)):
  /root/reference/libs/batch_norm.py:34-38,129-174.
- batch renorm: /root/reference/libs/batch_norm.py:329-470 (see ops.norms).
- spectral norm: /root/reference/libs/sn.py (see ops.sn); ``u`` lives in the
  'spectral' variable collection, updated when that collection is mutable.
- self attention: /root/reference/libs/self_attention.py:24-70.

TPU notes: params are stored fp32; activations are computed in ``dtype``
(bf16 for the MXU). Norm moments are always taken in fp32. When
``sync_axis`` is set, batch-norm moments are pmean'd across the data mesh
axis (config switch; the reference's per-clone statistics correspond to
sync_axis=None).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from twingan_tpu import ops
from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.ops import fused_scale
from twingan_tpu.ops import norms as norms_ops
from twingan_tpu.ops import quant as quant_ops


@dataclasses.dataclass
class NormCtx:
    """Call-time context threaded through every block.

    domain selects the norm param bank (static python int); style is the
    optional conditional embedding [B, style_dim]; train toggles batch-stat
    collection; renorm_clip carries the scheduled rmax/rmin/dmax scalars.
    """

    domain: int = 0
    style: Optional[jax.Array] = None
    train: bool = False
    renorm_clip: Optional[dict] = None


def _dtype_of(cfg: PGGANConfig):
    return jnp.dtype(cfg.dtype)


class EqConv(nn.Module):
    """Conv2D with optional equalized-lr input scaling and spectral norm.

    Weights init N(0, 1) under equalized lr (runtime-scaled by
    sqrt(2/fan_in)), else N(0, init_stddev) — matching the reference's
    random_normal_initializer wiring.

    With ``scale_mode='up'`` the layer computes
    conv3x3(concat(nearest_up2(x), aux)) via ops.fused_scale.up2_conv —
    the identical function without materializing the 2x tensor; ``aux``
    (already at the upsampled resolution, e.g. UNet skips) gets the
    matching kernel channel slice as a plain SAME conv added in. The
    kernel parameter is the unchanged [3,3,in_total,F] tensor, so
    checkpoints are interchangeable with the unfused path.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    equalized_lr: bool = False
    spectral_norm: bool = False
    init_stddev: float = 0.02
    dtype: Any = jnp.float32
    scale_mode: Optional[str] = None  # None | 'up'
    fused_impl: str = "dilated"
    # W8A8 int8 inference (ops/quant.py): "" = off, "calib" = fp forward +
    # record input abs-max into the `quant` collection (mutable pass),
    # "int8" = quantized conv using the calibrated scales.
    quantize: str = ""

    @nn.compact
    def __call__(self, x: jax.Array, aux: Optional[jax.Array] = None) -> jax.Array:
        if self.scale_mode not in (None, "up"):
            raise ValueError(f"unknown scale_mode {self.scale_mode!r}")
        if self.quantize not in ("", "calib", "int8"):
            raise ValueError(f"unknown quantize mode {self.quantize!r}")
        if self.scale_mode is None:
            assert aux is None, "aux input requires scale_mode='up'"
        else:
            assert self.kernel_size == 3 and self.strides == 1 and self.padding == "SAME"
        in_ch = x.shape[-1] + (aux.shape[-1] if aux is not None else 0)
        k = self.kernel_size
        stddev = 1.0 if self.equalized_lr else self.init_stddev
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev), (k, k, in_ch, self.features), jnp.float32
        )
        if self.spectral_norm:
            u = self.variable(
                "spectral",
                "u",
                lambda rng, shape: _l2n(jax.random.normal(rng, shape, jnp.float32)),
                self.make_rng("params") if self.is_initializing() else None,
                (self.features,),
            )
            update = self.is_mutable_collection("spectral") and not self.is_initializing()
            kernel_n, new_u = ops.spectral_normalize(kernel, u.value, update=update)
            if update:
                u.value = new_u
            kernel = kernel_n
        if self.quantize:
            # Declare the calibration state in every quantize mode so init
            # builds the same variable tree for calib and int8 configs.
            a_max = self.variable(
                "quant", "a_max", lambda: jnp.zeros((2,), jnp.float32))
            if self.quantize == "int8" and not self.is_initializing():
                return self._int8_forward(x, aux, kernel, a_max.value)
            if (self.quantize == "calib"
                    and self.is_mutable_collection("quant")
                    and not self.is_initializing()):
                cur = jnp.stack([
                    jnp.max(jnp.abs(x)).astype(jnp.float32),
                    (jnp.max(jnp.abs(aux)).astype(jnp.float32)
                     if aux is not None else jnp.asarray(0.0, jnp.float32)),
                ])
                a_max.value = jnp.maximum(a_max.value, cur)
            # calib records scales on the side and falls through to the
            # exact fp path below.
        x = x.astype(self.dtype)
        if self.equalized_lr:
            # Equalized-lr scale uses the TOTAL fan-in (incl. aux channels),
            # exactly as the unfused concat path would.
            x = x * jnp.asarray(ops.equalized_lr_scale(in_ch, k), self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.scale_mode == "up":
            cx = x.shape[-1]
            y = fused_scale.up2_conv(x, kernel[:, :, :cx, :], self.fused_impl)
            if aux is not None:
                a = aux.astype(self.dtype)
                if self.equalized_lr:
                    a = a * jnp.asarray(ops.equalized_lr_scale(in_ch, k), self.dtype)
                y = y + jax.lax.conv_general_dilated(
                    a, kernel[:, :, cx:, :], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(self.strides, self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y

    def _int8_forward(
        self, x: jax.Array, aux: Optional[jax.Array], kernel: jax.Array,
        a_max: jax.Array,
    ) -> jax.Array:
        """W8A8 conv (ops/quant.py): static calibrated activation scale,
        per-out-channel weight scales, int32 accumulation. The quantize of
        x has constant coefficients, so XLA fuses it into the producer's
        epilogue — each large tensor crosses HBM once, in int8."""
        in_ch = x.shape[-1] + (aux.shape[-1] if aux is not None else 0)
        if self.equalized_lr:
            # Fold the eq-lr input scale into the fp32 master kernel:
            # conv(s*x, W) == conv(x, s*W), so the calibrated scale applies
            # to x exactly as recorded.
            kernel = kernel * ops.equalized_lr_scale(in_ch, self.kernel_size)
        dt = self.dtype
        s_x = quant_ops.act_scale(a_max[0])
        xq = quant_ops.quantize(x, s_x)
        if self.scale_mode == "up":
            cx = x.shape[-1]
            wq, s_w = quant_ops.weight_quant(
                fused_scale.up2_conv_kernel(kernel[:, :, :cx, :]))
            y = quant_ops.conv_i8(
                xq, wq, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2)
            ).astype(dt) * (s_x * s_w).astype(dt)
            if aux is not None:
                s_a = quant_ops.act_scale(a_max[1])
                aq = quant_ops.quantize(aux, s_a)
                wq2, s_w2 = quant_ops.weight_quant(kernel[:, :, cx:, :])
                y = y + quant_ops.conv_i8(aq, wq2).astype(dt) * (
                    s_a * s_w2).astype(dt)
        else:
            wq, s_w = quant_ops.weight_quant(kernel)
            y = quant_ops.conv_i8(
                xq, wq, (self.strides, self.strides), self.padding
            ).astype(dt) * (s_x * s_w).astype(dt)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class EqDense(nn.Module):
    """Dense with the same equalized-lr / spectral-norm treatment."""

    features: int
    use_bias: bool = True
    equalized_lr: bool = False
    spectral_norm: bool = False
    init_stddev: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        stddev = 1.0 if self.equalized_lr else self.init_stddev
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev), (in_ch, self.features), jnp.float32
        )
        if self.spectral_norm:
            u = self.variable(
                "spectral",
                "u",
                lambda rng, shape: _l2n(jax.random.normal(rng, shape, jnp.float32)),
                self.make_rng("params") if self.is_initializing() else None,
                (self.features,),
            )
            update = self.is_mutable_collection("spectral") and not self.is_initializing()
            kernel_n, new_u = ops.spectral_normalize(kernel, u.value, update=update)
            if update:
                u.value = new_u
            kernel = kernel_n
        x = x.astype(self.dtype)
        if self.equalized_lr:
            x = x * jnp.asarray(ops.equalized_lr_scale(in_ch, 1), self.dtype)
        y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _l2n(v):
    return v / (jnp.linalg.norm(v) + 1e-12)


class DomainNorm(nn.Module):
    """Normalization with per-domain parameter/statistic banks.

    kind: none | batch_norm | instance_norm | batch_renorm | layer_norm.
    All domains' params are created at init; a call uses bank ``ctx.domain``.
    With ``style_dim > 0`` beta/gamma come from per-domain FCs of ctx.style
    (gamma = 1 + FC(style), arXiv:1707.03017 as in the reference).
    """

    kind: str
    num_domains: int = 1
    style_dim: int = 0
    center: bool = True
    scale: bool = True
    sync_axis: Optional[str] = None
    # Per-device-statistics parity (SURVEY.md section 5.8): when > 1, batch
    # moments are computed per contiguous batch group (set to the mesh size
    # so each device shard normalizes with its own moments, exactly the
    # reference's per-clone batch norm). 0/1 = global-batch moments.
    num_groups: int = 0
    bn_decay: float = 0.999
    renorm_decay: float = 0.99
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, ctx: NormCtx) -> jax.Array:
        if self.kind == "none":
            return x
        c = x.shape[-1]
        conditional = self.style_dim > 0 and ctx.style is not None

        # --- Parameter banks (created for every domain; one selected). ---
        beta = gamma = None
        for d in range(self.num_domains):
            if conditional:
                bfk = self.param(
                    "beta_fc_kernel_%d" % d, nn.initializers.xavier_uniform(), (self.style_dim, c), jnp.float32
                )
                bfb = self.param("beta_fc_bias_%d" % d, nn.initializers.zeros, (c,), jnp.float32)
                gfk = self.param(
                    "gamma_fc_kernel_%d" % d, nn.initializers.xavier_uniform(), (self.style_dim, c), jnp.float32
                )
                gfb = self.param("gamma_fc_bias_%d" % d, nn.initializers.zeros, (c,), jnp.float32)
                if d == ctx.domain:
                    style = ctx.style.astype(jnp.float32)
                    if self.center:
                        beta = (style @ bfk + bfb)[:, None, None, :]
                    if self.scale:
                        gamma = 1.0 + (style @ gfk + gfb)[:, None, None, :]
            else:
                b = self.param("beta_%d" % d, nn.initializers.zeros, (c,), jnp.float32)
                g = self.param("gamma_%d" % d, nn.initializers.ones, (c,), jnp.float32)
                if d == ctx.domain:
                    beta = b if self.center else None
                    gamma = g if self.scale else None

        xf = x.astype(jnp.float32)

        if self.kind == "instance_norm":
            mean, var = norms_ops.instance_moments(xf)
            y = norms_ops.normalize(xf, mean, var, gamma, beta, eps=1e-6)
            return y.astype(x.dtype)

        if self.kind == "layer_norm":
            mean = jnp.mean(xf, axis=tuple(range(1, xf.ndim)), keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=tuple(range(1, xf.ndim)), keepdims=True)
            y = norms_ops.normalize(xf, mean, var, gamma, beta, eps=1e-6)
            return y.astype(x.dtype)

        # batch_norm / batch_renorm: per-domain moving statistics.
        renorm = self.kind == "batch_renorm"
        decay = self.renorm_decay if renorm else self.bn_decay
        eps = 1e-3
        stats = {}
        for d in range(self.num_domains):
            stats[d] = {
                "moving_mean": self.variable(
                    "batch_stats", "moving_mean_%d" % d, jnp.zeros, (c,), jnp.float32
                ),
                "moving_var": self.variable(
                    "batch_stats", "moving_var_%d" % d, jnp.ones, (c,), jnp.float32
                ),
            }
            if renorm:
                for name, shape in [
                    ("renorm_mean", (c,)),
                    ("renorm_mean_weight", ()),
                    ("renorm_stddev", (c,)),
                    ("renorm_stddev_weight", ()),
                ]:
                    stats[d][name] = self.variable(
                        "batch_stats", "%s_%d" % (name, d), jnp.zeros, shape, jnp.float32
                    )
        bank = stats[ctx.domain]

        if ctx.train:
            # One code path for grouped and global statistics: the global
            # case is exactly the grouped math at num_groups=1 (a [1, C]
            # group reduces to the full-batch moments). Per-group (g > 1)
            # is parity with the reference's per-clone moments — each GPU
            # clone normalizes with its own batch moments regardless of
            # norm type; sync_axis instead psum-syncs the g=1 moments
            # across devices (the improved 'synced BN' option).
            g = self.num_groups if (self.num_groups and self.num_groups > 1) else 1
            b = xf.shape[0]
            assert b % g == 0, (b, g)
            xg = xf.reshape(g, b // g, *xf.shape[1:])
            if g == 1 and self.sync_axis:
                mean, var = norms_ops.moments(xf, (0, 1, 2), axis_name=self.sync_axis)
                gmean, gvar = mean[None], var[None]
            else:
                gmean = jnp.mean(xg, axis=(1, 2, 3))            # [g, C]
                gvar = jnp.mean(
                    jnp.square(xg - gmean[:, None, None, None, :]), axis=(1, 2, 3)
                )
            clip = state = None
            if renorm:
                clip = ctx.renorm_clip or {
                    "rmax": norms_ops.RENORM_RMAX[-1],
                    "rmin": norms_ops.RENORM_RMIN[-1],
                    "dmax": norms_ops.RENORM_DMAX[-1],
                }
                state = {k: bank[k].value for k in
                         ("renorm_mean", "renorm_mean_weight",
                          "renorm_stddev", "renorm_stddev_weight")}
                # r/d per group against the shared renorm EMAs
                # ([g, C] broadcasts over the [C] state).
                r, d_corr, _ = norms_ops.batch_renorm_correction(
                    gmean, gvar, state, clip, momentum=self.renorm_decay, eps=eps
                )
                y = norms_ops.normalize(
                    xg, gmean[:, None, None, None, :],
                    gvar[:, None, None, None, :], None, None, eps=eps,
                )
                y = (y * r[:, None, None, None, :]
                     + d_corr[:, None, None, None, :]).reshape(xf.shape)
            else:
                y = norms_ops.normalize(
                    xg, gmean[:, None, None, None, :],
                    gvar[:, None, None, None, :], None, None, eps=eps,
                ).reshape(xf.shape)
            if gamma is not None:
                y = y * gamma
            if beta is not None:
                y = y + beta
            if self.is_mutable_collection("batch_stats") and not self.is_initializing():
                # Shared EMAs advance with the group-averaged moments (the
                # reference's clones each update the shared EMA; averaging
                # is the SPMD equivalent; at g=1 this is identity).
                m_mean = jnp.mean(gmean, axis=0)
                m_var = jnp.mean(gvar, axis=0)
                if renorm:
                    _, _, new_state = norms_ops.batch_renorm_correction(
                        m_mean, m_var, state, clip,
                        momentum=self.renorm_decay, eps=eps,
                    )
                    for k, v in new_state.items():
                        bank[k].value = v
                    # Moving mean/var track the debiased renorm moments.
                    m_mean, m_var = norms_ops.renorm_moving_moments(
                        new_state, eps=eps
                    )
                bank["moving_mean"].value = norms_ops.update_moving(
                    bank["moving_mean"].value, m_mean, decay
                )
                bank["moving_var"].value = norms_ops.update_moving(
                    bank["moving_var"].value, m_var, decay
                )
        else:
            y = norms_ops.normalize(
                xf, bank["moving_mean"].value, bank["moving_var"].value, gamma, beta, eps=eps
            )
        return y.astype(x.dtype)


def _activation(name: Optional[str]) -> Optional[Callable]:
    if name is None:
        return None
    if name == "leaky":
        return ops.leaky_relu
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    raise ValueError(name)


class ConvBlock(nn.Module):
    """conv -> norm -> activation with the reference's arg-scope defaults.

    discriminator=True selects the no-norm scope + spectral norm routing;
    norm=False forces a plain conv (resblock shortcuts, slim
    normalizer_fn=None override). Bias appears exactly when no norm runs.
    """

    cfg: PGGANConfig
    features: int
    kernel_size: int = 3
    padding: str = "SAME"
    activation: Optional[str] = "leaky"
    discriminator: bool = False
    norm: bool = True
    scale_mode: Optional[str] = None  # 'up' = fused nearest-up2 + conv

    @nn.compact
    def __call__(
        self, x: jax.Array, ctx: NormCtx, aux: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.cfg
        norm_kind = "none" if (self.discriminator or not self.norm) else cfg.norm_type
        use_sn = cfg.spectral_norm and (
            self.discriminator or cfg.spectral_norm_in_non_discriminator
        )
        y = EqConv(
            features=self.features,
            kernel_size=self.kernel_size,
            padding=self.padding,
            use_bias=(norm_kind == "none"),
            equalized_lr=cfg.equalized_lr,
            spectral_norm=use_sn,
            init_stddev=cfg.init_stddev,
            dtype=_dtype_of(cfg),
            scale_mode=self.scale_mode,
            fused_impl=cfg.fused_scale_impl,
            quantize=cfg.quantized_inference,
            name="conv",
        )(x, aux)
        if norm_kind != "none":
            y = DomainNorm(
                kind=norm_kind,
                num_domains=cfg.num_domains,
                style_dim=cfg.style_dim,
                sync_axis=cfg.sync_batch_norm_axis,
                num_groups=cfg.bn_num_groups,
                dtype=_dtype_of(cfg),
                name="norm",
            )(y, ctx)
        act = _activation(self.activation)
        if act is not None:
            y = act(y)
        return y


class ResBlockAdd(nn.Module):
    """Optional residual shortcut: identity when channels match, 1x1 plain
    conv otherwise (reference pggan_utils.py:334-342)."""

    cfg: PGGANConfig
    features: int
    discriminator: bool = False

    @nn.compact
    def __call__(self, inp: jax.Array, conv_out: jax.Array, ctx: NormCtx) -> jax.Array:
        if not self.cfg.use_res_block:
            return conv_out
        if inp.shape[-1] == self.features:
            shortcut = inp.astype(conv_out.dtype)
        else:
            shortcut = ConvBlock(
                self.cfg,
                self.features,
                kernel_size=1,
                activation=None,
                norm=False,
                discriminator=self.discriminator,
                name="shortcut",
            )(inp, ctx)
        return shortcut + conv_out


class SelfAttention(nn.Module):
    """SAGAN self-attention: f/g 1x1 convs (C/8, tanh), h 1x1 conv (C),
    y = gamma * softmax(f g^T) h + x with gamma init 0.

    The f/g/h convs sit inside the surrounding arg scope in the reference,
    so they receive the norm and (if enabled everywhere) spectral norm.
    """

    cfg: PGGANConfig
    discriminator: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ctx: NormCtx) -> jax.Array:
        b, h_, w_, c = x.shape
        c_bar = max(c // 8, 1)
        f = ConvBlock(self.cfg, c_bar, 1, activation="tanh",
                      discriminator=self.discriminator, name="sa_f")(x, ctx)
        g = ConvBlock(self.cfg, c_bar, 1, activation="tanh",
                      discriminator=self.discriminator, name="sa_g")(x, ctx)
        h = ConvBlock(self.cfg, c, 1, activation=None,
                      discriminator=self.discriminator, name="sa_h")(x, ctx)
        n = h_ * w_
        fr, gr, hr = f.reshape(b, n, c_bar), g.reshape(b, n, c_bar), h.reshape(b, n, c)
        mesh = None
        if self.cfg.attention_context_parallel:
            from twingan_tpu.parallel import current_mesh

            mesh = current_mesh()
            if mesh is not None and (mesh.size == 1 or n % mesh.size):
                mesh = None  # degenerate mesh / indivisible N: local path
        if mesh is not None:
            o = ops.sharded_attention_core(fr, gr, hr, mesh)
        else:
            o = ops.self_attention(fr, gr, hr)
        o = o.reshape(b, h_, w_, c)
        gamma = self.param("sa_gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * o + x
