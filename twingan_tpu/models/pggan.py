"""Progressively-growing GAN generator / discriminator / encoder in Flax.

Reference parity: /root/reference/nets/pggan.py (generator :93-211,
discriminator :217-376, encoder :382-541) and nets/pggan_utils.py. Stage
structure, fade-in blending, channel schedule, minibatch-stddev placement,
UNet skip lookup and the 4x4-block special cases are reproduced exactly;
the implementation is a stage-unrolled Flax module re-jitted per growth
stage instead of TF1 graph surgery.

Deliberate divergence: with ``use_larger_filter_at_rgb_layer``, the growing
stage's previous-resolution to_rgb uses kernel min(7, (hw/2)/2) — keyed by
the layer's OWN resolution so the weights shape-match the layer it shares a
name (and checkpoint entry) with. The reference literally uses min(7, hw/2)
for that layer (nets/pggan.py:173-178), which would shape-mismatch its own
cross-stage restore; TF-checkpoint import of such models must account for
this (see infer/import_tf.py).

Parameter naming is growth-stable: blocks/to_rgb/from_rgb layers are named by
their resolution (``block_8``, ``to_rgb_32`` ...), so doubling the resolution
adds new subtrees while every surviving layer keeps its name — checkpoint
migration between stages is a pytree intersection copy
(twingan_tpu/runner/migrate.py), replacing the reference's
``ignore_missing_vars`` name-matched restore (pggan_runner.py:136-146).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from twingan_tpu import ops
from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.layers import ConvBlock, EqDense, NormCtx, ResBlockAdd, SelfAttention


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EncoderSkips:
    """UNet skip features keyed by resolution.

    blocks[hw]: per-stage block output (pre-downsample), channels
    channels(log2(hw)-3) — what the generator expects at hw.
    interp[hw]: fade-in blended feature at hw (growing stages only); the
    generator prefers it when its channel count matches, mirroring the
    reference's 'encoder_block_interpolated_*' name lookup
    (pggan_utils.py:281-298).
    """

    blocks: Dict[int, jax.Array] = dataclasses.field(default_factory=dict)
    interp: Dict[int, jax.Array] = dataclasses.field(default_factory=dict)

    def lookup(self, hw: int, expected_ch: int) -> jax.Array:
        feat = self.interp.get(hw)
        if feat is not None and feat.shape[-1] == expected_ch:
            return feat
        feat = self.blocks.get(hw)
        if feat is None:
            raise ValueError(f"no UNet skip for resolution {hw}")
        return feat

    def tree_flatten(self):
        bk = sorted(self.blocks)
        ik = sorted(self.interp)
        leaves = [self.blocks[k] for k in bk] + [self.interp[k] for k in ik]
        return leaves, (tuple(bk), tuple(ik))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        bk, ik = aux
        blocks = dict(zip(bk, leaves[: len(bk)]))
        interp = dict(zip(ik, leaves[len(bk) :]))
        return cls(blocks=blocks, interp=interp)


def noise_shape(cfg: PGGANConfig, batch_size: int) -> tuple[int, int, int, int]:
    """Input noise shape [B,1,1,C1] (reference pggan.get_noise_shape)."""
    return (batch_size, 1, 1, cfg.noise_dim)


def _concat_cond_image(x: jax.Array, cond_image: Optional[jax.Array]) -> jax.Array:
    """Bilinear-resize a conditioning image/tensor to x's hw and concat
    (reference pggan_utils.maybe_concat_conditional_layer)."""
    if cond_image is None:
        return x
    resized = ops.resize_bilinear(cond_image, x.shape[1], x.shape[2]).astype(x.dtype)
    return jnp.concatenate([x, resized], axis=-1)


class Generator(nn.Module):
    """PGGAN generator. Input: [B,1,1,C] (or [B,C]) noise, or a [B,4,4,C]
    encoding for translation. Output: [B,res,res,image_channels]."""

    cfg: PGGANConfig

    @nn.compact
    def __call__(
        self,
        source: jax.Array,
        *,
        alpha: jax.Array | float = 0.0,
        domain: int = 0,
        style: Optional[jax.Array] = None,
        cond_image: Optional[jax.Array] = None,
        unet_skips: Optional[EncoderSkips] = None,
        train: bool = False,
        renorm_clip: Optional[dict] = None,
    ) -> tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.cfg
        ctx = NormCtx(domain=domain, style=style, train=train, renorm_clip=renorm_clip)
        end_points: Dict[str, jax.Array] = {}

        if source.ndim == 2:
            source = source[:, None, None, :]
        assert source.ndim == 4, "generator source must be 2D or 4D"
        if source.shape[1] == 1 and source.shape[2] == 1:
            # Pad to 7x7 so the k4 VALID conv lands on 4x4.
            source = jnp.pad(source, ((0, 0), (3, 3), (3, 3), (0, 0)))
        end_points["source"] = source

        net = source.astype(jnp.dtype(cfg.dtype))
        prev_rgb = None
        rgb_kernel = lambda hw: (min(7, hw // 2) if cfg.use_larger_filter_at_rgb_layer else 1)

        hw = 4
        for stage in range(cfg.max_stage + 1):
            hw = 2 ** (stage + 2)
            ch = cfg.channels(stage)
            if hw == 4:
                if source.shape[1] == 7:
                    net = ConvBlock(cfg, ch, kernel_size=4, padding="VALID", name="block_4_conv0")(net, ctx)
                else:
                    assert source.shape[1] == 4 and source.shape[2] == 4
                    net = ConvBlock(cfg, ch, kernel_size=3, name="block_4_conv0")(net, ctx)
                if cfg.do_pixel_norm:
                    net = ops.pixel_norm(net)
                net = _concat_cond_image(net, cond_image)
                net = ConvBlock(cfg, ch, kernel_size=3, name="block_4_conv1")(net, ctx)
                if cfg.do_pixel_norm:
                    net = ops.pixel_norm(net)
                end_points["block_4"] = net
            else:
                if stage == cfg.max_stage and cfg.is_growing:
                    # Previous-resolution to_rgb, upsampled; reuses the name
                    # (and thus the weights) of last stage's output layer.
                    prev_rgb = ConvBlock(
                        cfg, cfg.image_channels, kernel_size=rgb_kernel(hw // 2),
                        activation=None, name=f"to_rgb_{hw // 2}",
                    )(net, ctx)
                    prev_rgb = ops.upsample_nearest_2x(prev_rgb)
                    end_points[f"to_rgb_{hw // 2}"] = prev_rgb

                skip = None
                if unet_skips is not None and not (
                    cfg.unet_max_concat_hw and hw > cfg.unet_max_concat_hw
                ):
                    skip = unet_skips.lookup(hw, cfg.channels(stage - 1))
                # fused_scale computes conv0 on (nearest_up2(net) ++ cond ++
                # skip) without materializing the upsampled tensor — the
                # identical function (ops/fused_scale.py); the unfused path
                # is kept because use_res_block needs `inp` as its shortcut.
                if cfg.fused_scale and not cfg.use_res_block:
                    aux_parts = []
                    if cond_image is not None:
                        aux_parts.append(
                            ops.resize_bilinear(cond_image, hw, hw).astype(net.dtype)
                        )
                    if skip is not None:
                        aux_parts.append(skip.astype(net.dtype))
                    aux = jnp.concatenate(aux_parts, axis=-1) if aux_parts else None
                    inp = None
                    y = ConvBlock(cfg, ch, scale_mode="up",
                                  name=f"block_{hw}_conv0")(net, ctx, aux)
                else:
                    inp = ops.upsample_nearest_2x(net)
                    inp = _concat_cond_image(inp, cond_image)
                    if skip is not None:
                        inp = jnp.concatenate([inp, skip.astype(inp.dtype)], axis=-1)
                    y = ConvBlock(cfg, ch, name=f"block_{hw}_conv0")(inp, ctx)
                if cfg.do_pixel_norm:
                    y = ops.pixel_norm(y)
                y = ConvBlock(cfg, ch, name=f"block_{hw}_conv1")(y, ctx)
                if cfg.do_pixel_norm:
                    y = ops.pixel_norm(y)
                net = ResBlockAdd(cfg, ch, name=f"block_{hw}_res")(inp, y, ctx)
                end_points[f"block_{hw}"] = net

            if cfg.do_self_attention and hw == cfg.self_attention_hw:
                net = SelfAttention(cfg, name=f"self_attention_{hw}")(net, ctx)
                end_points[f"self_attention_{hw}"] = net

        rgb = ConvBlock(
            cfg, cfg.image_channels, kernel_size=rgb_kernel(hw), activation=None,
            name=f"to_rgb_{hw}",
        )(net, ctx)
        if cfg.is_growing:
            assert prev_rgb is not None
            out = ops.blend(rgb, prev_rgb, alpha)
        else:
            out = rgb
        end_points["output"] = out
        return out, end_points


class Discriminator(nn.Module):
    """PGGAN discriminator: from_rgb -> mirrored blocks with avg-pool
    downsampling -> minibatch stddev -> k3/k4 convs -> linear prediction."""

    cfg: PGGANConfig
    do_gdrop: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        alpha: jax.Array | float = 0.0,
        gdrop_strength: jax.Array | float = 0.0,
        cond_embed: Optional[jax.Array] = None,
        cond_image: Optional[jax.Array] = None,
        train: bool = False,
        stddev_groups: int = 1,
    ) -> tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.cfg
        ctx = NormCtx(train=train)
        end_points: Dict[str, jax.Array] = {}
        max_stage = cfg.max_stage
        mc = cfg.dis_max_channels

        x = _concat_cond_image(x, cond_image)
        src_hw = x.shape[1]
        assert src_hw == cfg.resolution, (src_hw, cfg.resolution)

        if self.do_gdrop and train:
            gdrop_count = [0]

            def maybe_gdrop(t):
                key = jax.random.fold_in(self.make_rng("gdrop"), gdrop_count[0])
                gdrop_count[0] += 1
                return ops.gdrop(key, t, gdrop_strength)
        else:
            maybe_gdrop = lambda t: t

        def dis_channels(stage):
            return cfg.channels(stage, discriminator=True)

        def from_rgb(t, features, name):
            y = ConvBlock(cfg, features, kernel_size=1, discriminator=True,
                          name=f"{name}_conv")(t, ctx)
            return ResBlockAdd(cfg, features, discriminator=True, name=f"{name}_res")(t, y, ctx)

        shrunk = None
        if cfg.is_growing:
            shrunk = ops.avg_pool_2x(x.astype(jnp.dtype(cfg.dtype)))
            shrunk = from_rgb(shrunk, dis_channels(max_stage - 1), f"from_rgb_{src_hw // 2}")
            end_points[f"from_rgb_{src_hw // 2}"] = shrunk

        net = from_rgb(x.astype(jnp.dtype(cfg.dtype)), dis_channels(max_stage), f"from_rgb_{src_hw}")
        end_points[f"from_rgb_{src_hw}"] = net

        for stage in range(max_stage, 0, -1):
            ch_out = dis_channels(stage - 1)
            cur_hw = src_hw >> (max_stage - stage)
            if cfg.do_self_attention and cur_hw == cfg.self_attention_hw:
                net = SelfAttention(cfg, discriminator=True, name=f"self_attention_{cur_hw}")(net, ctx)
                end_points[f"self_attention_{cur_hw}"] = net
            in_ch = net.shape[-1]
            y = ConvBlock(cfg, in_ch, discriminator=True,
                          name=f"block_{cur_hw}_conv0")(maybe_gdrop(net), ctx)
            y = ConvBlock(cfg, ch_out, discriminator=True,
                          name=f"block_{cur_hw}_conv1")(maybe_gdrop(y), ctx)
            net = ResBlockAdd(cfg, ch_out, discriminator=True, name=f"block_{cur_hw}_res")(net, y, ctx)
            end_points[f"block_{cur_hw}"] = net
            net = ops.avg_pool_2x(net)
            if stage == max_stage and cfg.is_growing:
                net = ops.blend(net, shrunk, alpha)
                end_points[f"interp_{cur_hw // 2}"] = net

        if cond_embed is not None:
            b, h_, w_, _ = net.shape
            tiled = jnp.broadcast_to(
                cond_embed[:, None, None, :].astype(net.dtype),
                (b, h_, w_, cond_embed.shape[-1]),
            )
            net = jnp.concatenate([net, tiled], axis=-1)

        net = ops.minibatch_stddev(net, num_groups=stddev_groups)
        net = ConvBlock(cfg, mc, kernel_size=3, discriminator=True,
                        name="before_fc_conv0")(maybe_gdrop(net), ctx)
        net = ConvBlock(cfg, mc, kernel_size=4, padding="VALID", discriminator=True,
                        name="before_fc_conv1")(maybe_gdrop(net), ctx)
        end_points["before_fc"] = net

        use_sn = cfg.spectral_norm
        pred = EqDense(
            1, equalized_lr=cfg.equalized_lr, spectral_norm=use_sn,
            init_stddev=cfg.init_stddev, dtype=jnp.dtype(cfg.dtype), name="prediction",
        )(net.reshape(net.shape[0], -1))
        end_points["prediction"] = pred
        return pred, end_points


class Encoder(nn.Module):
    """Discriminator-shaped encoder with generator norms; outputs the
    [B,4,4,C] 'before_classification' tensor plus UNet skip features."""

    cfg: PGGANConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        alpha: jax.Array | float = 0.0,
        domain: int = 0,
        style: Optional[jax.Array] = None,
        train: bool = False,
        renorm_clip: Optional[dict] = None,
        target_hw: Optional[int] = None,
    ) -> tuple[jax.Array, EncoderSkips]:
        cfg = self.cfg
        ctx = NormCtx(domain=domain, style=style, train=train, renorm_clip=renorm_clip)
        skips = EncoderSkips()
        max_stage = cfg.max_stage
        src_hw = x.shape[1]
        assert src_hw == cfg.resolution, (src_hw, cfg.resolution)

        def from_rgb(t, features, name):
            y = ConvBlock(cfg, features, kernel_size=1, name=f"{name}_conv")(t, ctx)
            if cfg.do_pixel_norm:
                y = ops.pixel_norm(y)
            return ResBlockAdd(cfg, features, name=f"{name}_res")(t, y, ctx)

        shrunk = None
        if cfg.is_growing:
            shrunk = ops.avg_pool_2x(x.astype(jnp.dtype(cfg.dtype)))
            shrunk = from_rgb(shrunk, cfg.channels(max_stage - 1), f"from_rgb_{src_hw // 2}")

        net = from_rgb(x.astype(jnp.dtype(cfg.dtype)), cfg.channels(max_stage), f"from_rgb_{src_hw}")

        for stage in range(max_stage, 0, -1):
            ch_out = cfg.channels(stage - 1)
            cur_hw = src_hw >> (max_stage - stage)
            if target_hw is not None and cur_hw < target_hw:
                break
            if cfg.do_self_attention and cur_hw == cfg.self_attention_hw:
                net = SelfAttention(cfg, name=f"self_attention_{cur_hw}")(net, ctx)
            in_ch = net.shape[-1]
            y = ConvBlock(cfg, in_ch, name=f"block_{cur_hw}_conv0")(net, ctx)
            if cfg.do_pixel_norm:
                y = ops.pixel_norm(y)
            y = ConvBlock(cfg, ch_out, kernel_size=3, name=f"block_{cur_hw}_conv1")(y, ctx)
            if cfg.do_pixel_norm:
                y = ops.pixel_norm(y)
            net = ResBlockAdd(cfg, ch_out, name=f"block_{cur_hw}_res")(net, y, ctx)
            skips.blocks[cur_hw] = net
            if target_hw is not None and cur_hw == target_hw:
                # Early exit must happen BEFORE the pool, or the returned
                # feature map would be target_hw/2.
                return net, skips
            net = ops.avg_pool_2x(net)
            if stage == max_stage and cfg.is_growing:
                net = ops.blend(net, shrunk, alpha)
                skips.interp[cur_hw // 2] = net

        return net, skips


class EncoderClassifier(nn.Module):
    """Classification head on top of the 4x4 encoding: k3 conv -> k4 VALID
    conv -> linear(output_dim). Used for style embeddings and distillation
    (reference pggan.encoder_classification :482-506)."""

    cfg: PGGANConfig
    output_dim: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        domain: int = 0,
        style: Optional[jax.Array] = None,
        train: bool = False,
        renorm_clip: Optional[dict] = None,
    ) -> jax.Array:
        cfg = self.cfg
        ctx = NormCtx(domain=domain, style=style, train=train, renorm_clip=renorm_clip)
        mc = cfg.max_channels
        net = ConvBlock(cfg, mc, kernel_size=3, name="before_fc_conv0")(x, ctx)
        net = ConvBlock(cfg, mc, kernel_size=4, padding="VALID", name="before_fc_conv1")(net, ctx)
        use_sn = cfg.spectral_norm and cfg.spectral_norm_in_non_discriminator
        return EqDense(
            self.output_dim, equalized_lr=cfg.equalized_lr, spectral_norm=use_sn,
            init_stddev=cfg.init_stddev, dtype=jnp.dtype(cfg.dtype), name="prediction",
        )(net.reshape(net.shape[0], -1))


class StyleEncoder(nn.Module):
    """Full encoder + classifier producing a style embedding
    (reference pggan.encoder :509-541)."""

    cfg: PGGANConfig
    output_dim: int

    @nn.compact
    def __call__(self, x, *, alpha=0.0, domain=0, train=False, renorm_clip=None):
        net, _ = Encoder(self.cfg, name="body")(
            x, alpha=alpha, domain=domain, train=train, renorm_clip=renorm_clip
        )
        return EncoderClassifier(self.cfg, self.output_dim, name="head")(
            net, domain=domain, train=train, renorm_clip=renorm_clip
        )
