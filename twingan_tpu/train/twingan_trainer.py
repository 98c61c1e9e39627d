"""TwinGAN trainer: unpaired cross-domain translation with one shared-weight
encoder + one shared-weight generator (per-domain norm banks) and two
discriminators.

Reference parity: /root/reference/twingan.py.
- Model build (_clone_fn :146-445): content encoder E with domain postfix
  '_s'/'_t' (here: domain index 0/1), optional style encoder (MUNIT-like),
  four generator passes
      s_prime = G_s(E_t(t)), t_prime = G_t(E_s(s)),
      s_cycle = G_s(E_s(s)), t_cycle = G_t(E_t(t)),
  re-encoding of primes, optional per-domain distillation heads, and six
  discriminator passes (real/prime/cycle x s/t).
- Losses (add_loss :451-521): L1 cycle (l_cyc_weight), GAN on cycle when
  res >= 64 (real/fake only), full GAN on prime (incl. gradient penalty),
  L1 content on 'before_classification' E(x) vs E(G(E(x))) crossing domains,
  L1 style vs the random style draw, cosine distillation vs precomputed
  embeddings (gated by distillation_start_hw).
- Optimization: generator side = encoders + generator scopes
  (:526-538); two discriminators on the D side; same n-critic alternation as
  the base trainer.

TPU design: one fused g_step / d_step each jit-compiled per growth stage;
the d_step stops gradients into the generator pass instead of rebuilding a
second graph copy.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from twingan_tpu import ops
from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.pggan import (
    Discriminator,
    Encoder,
    EncoderClassifier,
    Generator,
    StyleEncoder,
)
from twingan_tpu.train.base import BaseGanTrainer
from twingan_tpu.train.losses import (
    GanLossConfig,
    cosine_distance_loss,
    discriminator_gan_loss,
    generator_gan_loss,
    gradient_penalty,
    l1_loss,
)
from twingan_tpu.train.optimizers import OptimizerConfig, build_optimizer
from twingan_tpu.train.state import (
    GanTrainState,
    apply_model,
    init_model,
    polyak_update,
    update_gdrop_state,
)

ENC = "encoder_content"
ENC_STYLE = "encoder_style"
GEN = "generator"
DIS_S = "discriminator_s"
DIS_T = "discriminator_t"
DISTILL_S = "distill_s"
DISTILL_T = "distill_t"

DOMAIN_S = 0
DOMAIN_T = 1


@dataclasses.dataclass(frozen=True)
class TwinGANConfig:
    model: PGGANConfig = dataclasses.field(
        default_factory=lambda: PGGANConfig(num_domains=2)
    )
    loss: GanLossConfig = dataclasses.field(default_factory=GanLossConfig)
    opt: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    batch_size: int = 8
    n_critic: int = 2
    use_ttur: bool = False
    discriminator_learning_rate: float = 0.0004
    # gdrop.
    use_gdrop: bool = False
    gdrop_coef: float = 0.2
    gdrop_lim: float = 0.5
    gdrop_exp: float = 2.0
    # Growth schedule.
    grow_start_step: int = 0
    max_steps: int = 300000
    # TwinGAN-specific (reference twingan.py flags :39-88).
    l_cyc_weight: float = 1.0
    do_l_cyc_gan: bool = True
    l_content_weight: float = 0.1
    use_style_embedding: bool = False
    style_embed_size: int = 16
    use_unet: bool = False
    do_encoder_distillation: bool = False
    distillation_weight: float = 1.0
    distillation_start_hw: int = 16
    source_embed_dim: int = 0            # e.g. 512 for celeba_facenet
    target_embed_dim: int = 0
    # Polyak averaging of generator-side params for eval (0 disables).
    moving_average_decay: float = 0.0
    # Rematerialize each of the 4 G / 6 D passes in the backward
    # (jax.checkpoint): peak memory ~one pass's activations instead of all
    # ten; enables larger 256px batches under DRAGAN's double-backward.
    remat: bool = False
    # Concatenate same-weight passes into single module applies (the 4 G
    # passes -> 2, the per-domain real/prime/cycle D passes -> 1 each):
    # fewer, larger ops keep the MXU occupied at the reference's small
    # 256px batch sizes. Exactly equivalent for per-sample norms — the
    # discriminator is norm-free and minibatch-stddev uses groups aligned
    # to the sub-batch boundaries (ops.minibatch_stddev num_groups).
    # None = auto: on unless norm_type couples statistics across the batch
    # (batch_norm / batch_renorm*), where concatenation would mix the
    # prime/cycle moments the reference computes per pass.
    fuse_passes: Optional[bool] = None

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    @property
    def batch_coupled_norm(self) -> bool:
        return self.model.norm_type.startswith(("batch_norm", "batch_renorm"))

    @property
    def fuse(self) -> bool:
        if self.fuse_passes is None:
            return not self.batch_coupled_norm
        return self.fuse_passes

    def __post_init__(self):
        if self.model.num_domains != 2:
            raise ValueError("TwinGAN requires model.num_domains == 2")
        if self.use_style_embedding and self.model.style_dim != self.style_embed_size:
            raise ValueError(
                "model.style_dim must equal style_embed_size when "
                "use_style_embedding is on"
            )
        if self.fuse_passes and self.batch_coupled_norm:
            raise ValueError(
                "fuse_passes=True with a batch-coupled norm "
                f"({self.model.norm_type}) would mix the per-pass batch "
                "moments; use per-sample norms or fuse_passes=False"
            )


class TwinGANTrainer(BaseGanTrainer):
    def __init__(self, cfg: TwinGANConfig):
        self.cfg = cfg
        m = cfg.model
        self.enc = Encoder(m)
        self.gen = Generator(m)
        self.dis = {  # two discriminators, separate params, same architecture
            DIS_S: Discriminator(m, do_gdrop=cfg.use_gdrop),
            DIS_T: Discriminator(m, do_gdrop=cfg.use_gdrop),
        }
        self.enc_style = (
            StyleEncoder(m, output_dim=cfg.style_embed_size)
            if cfg.use_style_embedding
            else None
        )
        self.distill = {}
        if cfg.do_encoder_distillation:
            s_dim = cfg.source_embed_dim or cfg.target_embed_dim
            t_dim = cfg.target_embed_dim or cfg.source_embed_dim
            assert s_dim and t_dim, "distillation requires an embedding dim"
            # One head per domain, each applied with domain index 0 only —
            # a num_domains=2 config would create (and checkpoint) a second
            # norm bank per head that nothing ever uses.
            m1 = m.replace(num_domains=1)
            self.distill[DISTILL_S] = EncoderClassifier(m1, output_dim=s_dim)
            self.distill[DISTILL_T] = EncoderClassifier(m1, output_dim=t_dim)

        self.gen_tx = build_optimizer(cfg.opt)
        d_opt_cfg = (
            cfg.opt.replace(learning_rate=cfg.discriminator_learning_rate)
            if cfg.use_ttur
            else cfg.opt
        )
        # D updates (n_critic-1) times per global step; stretch its
        # schedule so decayed LRs track the global step (ref parity).
        self.dis_tx = build_optimizer(
            d_opt_cfg, updates_per_step=max(1, cfg.n_critic - 1))

    @property
    def generator_side_keys(self) -> tuple:
        keys = [ENC, GEN]
        if self.enc_style is not None:
            keys.append(ENC_STYLE)
        keys.extend(self.distill.keys())
        return tuple(keys)

    @property
    def discriminator_side_keys(self) -> tuple:
        return (DIS_S, DIS_T)

    # ------------------------------------------------------------------ #
    # Init
    # ------------------------------------------------------------------ #
    def init_state(self, rng: jax.Array) -> GanTrainState:
        cfg = self.cfg
        m = cfg.model
        keys = jax.random.split(rng, 8)
        img = jnp.zeros((cfg.batch_size, m.resolution, m.resolution, m.image_channels), jnp.float32)
        params: Dict[str, Any] = {}
        model_state: Dict[str, Any] = {}

        # DomainNorm creates every domain's param/stat bank at init, so one
        # init per module covers both domains.
        params[ENC], model_state[ENC] = init_model(self.enc, keys[0], img, domain=DOMAIN_S)

        code = jnp.zeros((cfg.batch_size, 4, 4, m.channels(0)), jnp.float32)
        style = jnp.zeros((cfg.batch_size, cfg.style_embed_size), jnp.float32) if cfg.use_style_embedding else None
        skips = None
        if cfg.use_unet:
            _, skips = self.enc.apply({"params": params[ENC], **model_state[ENC]}, img, domain=DOMAIN_S)
        params[GEN], model_state[GEN] = init_model(
            self.gen, keys[1], code, domain=DOMAIN_S, style=style, unet_skips=skips
        )

        for i, name in enumerate((DIS_S, DIS_T)):
            params[name], model_state[name] = init_model(
                self.dis[name], keys[2 + i], img, extra_rngs={"gdrop": keys[4]}
            )
        if self.enc_style is not None:
            params[ENC_STYLE], model_state[ENC_STYLE] = init_model(
                self.enc_style, keys[5], img, domain=DOMAIN_S
            )
        for i, (name, mod) in enumerate(self.distill.items()):
            params[name], model_state[name] = init_model(mod, keys[6 + i], code)

        gen_side = {k: params[k] for k in self.generator_side_keys}
        dis_side = {k: params[k] for k in self.discriminator_side_keys}
        gen_ema = (
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), gen_side)
            if cfg.moving_average_decay
            else None
        )
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            critic_step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            gen_ema_params=gen_ema,
            gen_opt_state=self.gen_tx.init(gen_side),
            dis_opt_state=self.dis_tx.init(dis_side),
            gdrop_strength=jnp.zeros((), jnp.float32),
            gen_loss_ema=jnp.zeros((), jnp.float32),
        )

    # ------------------------------------------------------------------ #
    # Forward
    # ------------------------------------------------------------------ #
    def _forward(
        self,
        params: Dict[str, Any],
        model_state: Dict[str, Any],
        sources: jax.Array,
        targets: jax.Array,
        alpha: jax.Array,
        clip: Optional[dict],
        rng: jax.Array,
        train: bool,
        update_gen_state: bool,
        light: bool = False,
    ):
        """The four-generator-pass TwinGAN forward. Returns (outs, new_state)
        where outs carries every tensor the losses need. ``light`` skips the
        prime re-encodes / style / distillation heads (discriminator steps
        only need the four generated images — the reference recomputes
        everything every step; we don't)."""
        cfg = self.cfg
        new_state = dict(model_state)
        k_style = jax.random.fold_in(rng, 7)

        def enc_apply(x, domain, update):
            out, st = apply_model(
                self.enc, params[ENC], new_state[ENC], x, alpha=alpha, domain=domain,
                train=train, update_state=update, renorm_clip=clip,
                remat=cfg.remat,
            )
            if update:
                new_state[ENC] = st
            return out

        def gen_apply(code, domain, style, skips, update):
            out, st = apply_model(
                self.gen, params[GEN], new_state[GEN], code, alpha=alpha, domain=domain,
                style=style, unet_skips=skips if cfg.use_unet else None,
                train=train, update_state=update, renorm_clip=clip,
                remat=cfg.remat,
            )
            if update:
                new_state[GEN] = st
            return out[0]  # (image, end_points) -> image

        def style_apply(x, domain, update):
            if self.enc_style is None:
                return None
            out, st = apply_model(
                self.enc_style, params[ENC_STYLE], new_state[ENC_STYLE], x, alpha=alpha,
                domain=domain, train=train, update_state=update, renorm_clip=clip,
                remat=cfg.remat,
            )
            if update:
                new_state[ENC_STYLE] = st
            return out

        u = update_gen_state
        enc_s, skips_s = enc_apply(sources, DOMAIN_S, u)
        enc_t, skips_t = enc_apply(targets, DOMAIN_T, u)
        style_s = style_apply(sources, DOMAIN_S, u)
        style_t = style_apply(targets, DOMAIN_T, u)
        random_style = (
            jax.random.normal(k_style, style_s.shape, style_s.dtype)
            if cfg.use_style_embedding
            else None
        )

        # Output naming: the prefix is the OUTPUT domain (twingan.py:240).
        if cfg.fuse:
            # One generator apply per OUTPUT domain over the concatenated
            # [prime; cycle] sub-batches — 2 applies instead of 4. Exact for
            # per-sample norms (guarded by TwinGANConfig.fuse).
            cat = lambda a, b: (
                None if a is None
                else jax.tree_util.tree_map(
                    lambda x, y: jnp.concatenate([x, y], axis=0), a, b)
            )
            out_s = gen_apply(
                cat(enc_t, enc_s), DOMAIN_S, cat(random_style, style_s),
                cat(skips_t, skips_s), u,
            )
            s_prime, s_cycle = jnp.split(out_s, 2, axis=0)
            out_t = gen_apply(
                cat(enc_s, enc_t), DOMAIN_T, cat(random_style, style_t),
                cat(skips_s, skips_t), u,
            )
            t_prime, t_cycle = jnp.split(out_t, 2, axis=0)
        else:
            s_prime = gen_apply(enc_t, DOMAIN_S, random_style, skips_t, u)
            s_cycle = gen_apply(enc_s, DOMAIN_S, style_s, skips_s, u)
            t_prime = gen_apply(enc_s, DOMAIN_T, random_style, skips_s, u)
            t_cycle = gen_apply(enc_t, DOMAIN_T, style_t, skips_t, u)

        # Re-encode primes for the content/style losses (no state updates:
        # the reference reuses the same norm update ops once per step).
        if light:
            enc_t_prime = enc_s_prime = style_s_prime = style_t_prime = None
        else:
            enc_t_prime, _ = enc_apply(t_prime, DOMAIN_T, False)
            enc_s_prime, _ = enc_apply(s_prime, DOMAIN_S, False)
            style_s_prime = style_apply(s_prime, DOMAIN_S, False)
            style_t_prime = style_apply(t_prime, DOMAIN_T, False)

        outs = dict(
            sources=sources, targets=targets,
            enc_s=enc_s, enc_t=enc_t,
            s_prime=s_prime, s_cycle=s_cycle, t_prime=t_prime, t_cycle=t_cycle,
            enc_s_prime=enc_s_prime, enc_t_prime=enc_t_prime,
            style_s=style_s, style_t=style_t, random_style=random_style,
            style_s_prime=style_s_prime, style_t_prime=style_t_prime,
        )

        # Distillation heads.
        if (not light) and cfg.do_encoder_distillation and cfg.model.resolution >= cfg.distillation_start_hw:
            def distill_apply(name, code):
                out, st = apply_model(
                    self.distill[name], params[name], new_state[name], code,
                    train=train, update_state=u, renorm_clip=clip,
                    remat=cfg.remat,
                )
                if u:
                    new_state[name] = st
                return out

            outs["distill_source"] = distill_apply(DISTILL_S, enc_s)
            outs["distill_target"] = distill_apply(DISTILL_T, enc_t)
            outs["distill_s_prime"] = distill_apply(DISTILL_S, enc_s_prime)
            outs["distill_t_prime"] = distill_apply(DISTILL_T, enc_t_prime)

        return outs, new_state

    def _dis_apply(self, name, dis_params, model_state, images, alpha,
                   gdrop_strength, k_gdrop, update, stddev_groups=1):
        out, st = apply_model(
            self.dis[name], dis_params[name], model_state[name], images, alpha=alpha,
            gdrop_strength=gdrop_strength, train=True, update_state=update,
            rngs={"gdrop": k_gdrop}, remat=self.cfg.remat,
            stddev_groups=stddev_groups,
        )
        return out[0], st  # (pred, end_points), state

    # ------------------------------------------------------------------ #
    # Losses
    # ------------------------------------------------------------------ #
    def _generator_losses(self, outs, preds, batch) -> Dict[str, jax.Array]:
        """All generator-side loss terms (twingan.py add_loss, G collection)."""
        cfg = self.cfg
        losses: Dict[str, jax.Array] = {}
        for domain, opposite in (("s", "t"), ("t", "s")):
            original = outs["sources" if domain == "s" else "targets"]
            cycle = outs[f"{domain}_cycle"]
            losses[f"l_cyc_{domain}"] = l1_loss(original, cycle, cfg.l_cyc_weight)
            if cfg.model.resolution >= 64 and cfg.do_l_cyc_gan:
                losses[f"generator_fool_loss_cycle_{domain}"] = generator_gan_loss(
                    cfg.loss, preds[f"dis_{domain}_cycle"]
                )
            losses[f"generator_fool_loss_prime_{domain}"] = generator_gan_loss(
                cfg.loss, preds[f"dis_{domain}_prime"]
            )
            if cfg.l_content_weight:
                # s_prime carries target content: E_s(sources) ~ E_t(t_prime).
                losses[f"l_{domain}_content"] = l1_loss(
                    outs[f"enc_{domain}"], outs[f"enc_{opposite}_prime"], cfg.l_content_weight
                )
                if cfg.use_style_embedding:
                    losses[f"l_{domain}_style"] = l1_loss(
                        outs["random_style"], outs[f"style_{domain}_prime"], cfg.l_content_weight
                    )
            if (
                cfg.do_encoder_distillation
                and cfg.model.resolution >= cfg.distillation_start_hw
            ):
                expected = batch.get(f"{'source' if domain == 's' else 'target'}_embedding")
                if expected is not None:
                    full = "source" if domain == "s" else "target"
                    losses[f"l_{full}_distillation"] = cosine_distance_loss(
                        expected, outs[f"distill_{full}"], cfg.distillation_weight
                    )
                    losses[f"l_{opposite}_prime_distillation"] = cosine_distance_loss(
                        expected, outs[f"distill_{opposite}_prime"], cfg.distillation_weight
                    )
        return losses

    # ------------------------------------------------------------------ #
    # Train steps
    # ------------------------------------------------------------------ #
    def _g_step(self, state: GanTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        cfg = self.cfg
        alpha = self._alpha(state.step)
        clip = self._renorm_clip(state.step)
        key = jax.random.fold_in(rng, state.critic_step)
        k_fwd, k_gdrop = jax.random.split(key)
        sources = self.growing_image(batch["source"].astype(jnp.float32), alpha)
        targets = self.growing_image(batch["target"].astype(jnp.float32), alpha)

        gen_keys = self.generator_side_keys

        def loss_fn(gen_side_params):
            params = {**state.params, **gen_side_params}
            outs, new_gen_state = self._forward(
                params, state.model_state, sources, targets, alpha, clip, k_fwd,
                train=True, update_gen_state=True,
            )
            preds = {}
            # Fresh gdrop noise per discriminator pass, matching the
            # reference's independent tf.random_normal per graph copy
            # (libs/gdrop.py used once per discriminator call).
            need_cycle = cfg.model.resolution >= 64 and cfg.do_l_cyc_gan
            for pi, (domain, dis_name) in enumerate((("s", DIS_S), ("t", DIS_T))):
                if cfg.fuse:
                    # One D apply over [prime; cycle] (cycle only when its
                    # GAN term is active); stddev groups keep per-pass stats.
                    kinds = ("prime", "cycle") if need_cycle else ("prime",)
                    imgs = jnp.concatenate(
                        [outs[f"{domain}_{k}"] for k in kinds], axis=0)
                    pred, _ = self._dis_apply(
                        dis_name, state.params, state.model_state, imgs, alpha,
                        state.gdrop_strength, jax.random.fold_in(k_gdrop, 2 * pi),
                        False, stddev_groups=len(kinds),
                    )
                    for k, p in zip(kinds, jnp.split(pred, len(kinds), axis=0)):
                        preds[f"dis_{domain}_{k}"] = p
                    continue
                for ki, kind in enumerate(("prime", "cycle")):
                    pred, _ = self._dis_apply(
                        dis_name, state.params, state.model_state,
                        outs[f"{domain}_{kind}"], alpha, state.gdrop_strength,
                        jax.random.fold_in(k_gdrop, 2 * pi + ki), False,
                    )
                    preds[f"dis_{domain}_{kind}"] = pred
            losses = self._generator_losses(outs, preds, batch)
            total = sum(losses.values())
            return total, (new_gen_state, losses)

        gen_side = {k: state.params[k] for k in gen_keys}
        (g_loss, (new_gen_state, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_side)
        updates, new_opt = self.gen_tx.update(grads, state.gen_opt_state, gen_side)
        new_gen_side = optax.apply_updates(gen_side, updates)

        new_ema, new_strength = update_gdrop_state(
            state.gen_loss_ema, g_loss, state.step, cfg.gdrop_coef, cfg.gdrop_lim, cfg.gdrop_exp
        )
        if not cfg.use_gdrop:
            new_strength = state.gdrop_strength
        new_model_state = dict(state.model_state)
        for k in gen_keys:
            new_model_state[k] = new_gen_state[k]
        new_ema_params = state.gen_ema_params
        if cfg.moving_average_decay:
            new_ema_params = polyak_update(
                state.gen_ema_params, new_gen_side, cfg.moving_average_decay
            )
        new_state = state.replace(
            step=state.step + 1,
            critic_step=state.critic_step + 1,
            params={**state.params, **new_gen_side},
            model_state=new_model_state,
            gen_opt_state=new_opt,
            gen_loss_ema=new_ema,
            gdrop_strength=new_strength,
            gen_ema_params=new_ema_params,
        )
        metrics = {"generator_loss": g_loss, "alpha": alpha, "gdrop_strength": new_strength,
                   "generator_grad_norm": optax.global_norm(grads), **losses}
        return new_state, metrics

    def _d_step(self, state: GanTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        cfg = self.cfg
        alpha = self._alpha(state.step)
        clip = self._renorm_clip(state.step)
        key = jax.random.fold_in(rng, state.critic_step)
        k_fwd, k_gdrop, k_gp_s, k_gp_t = jax.random.split(key, 4)
        sources = self.growing_image(batch["source"].astype(jnp.float32), alpha)
        targets = self.growing_image(batch["target"].astype(jnp.float32), alpha)

        outs, _ = self._forward(
            state.params, state.model_state, sources, targets, alpha, clip, k_fwd,
            train=True, update_gen_state=False, light=True,
        )
        fakes = {
            k: jax.lax.stop_gradient(outs[k])
            for k in ("s_prime", "s_cycle", "t_prime", "t_cycle")
        }

        def loss_fn(dis_side_params):
            losses: Dict[str, jax.Array] = {}
            new_dis_state = {}
            # Independent gdrop noise per discriminator pass (real / prime /
            # cycle / gradient-penalty), matching the reference's fresh
            # tf.random_normal per discriminator graph copy.
            need_cycle = cfg.model.resolution >= 64 and cfg.do_l_cyc_gan
            for base, (domain, dis_name, real, k_gp) in enumerate((
                ("s", DIS_S, sources, k_gp_s),
                ("t", DIS_T, targets, k_gp_t),
            )):
                fold = lambda i, b=base: jax.random.fold_in(k_gdrop, 4 * b + i)
                if cfg.fuse:
                    # One D apply over [real; prime; (cycle)] — sub-batch-
                    # aligned stddev groups make it exactly the per-pass
                    # math (reference's 3 graph copies, twingan.py:367-381).
                    parts = [real, fakes[f"{domain}_prime"]]
                    if need_cycle:
                        parts.append(fakes[f"{domain}_cycle"])
                    pred, st = self._dis_apply(
                        dis_name, dis_side_params, state.model_state,
                        jnp.concatenate(parts, axis=0), alpha,
                        state.gdrop_strength, fold(0), True,
                        stddev_groups=len(parts),
                    )
                    new_dis_state[dis_name] = st
                    split = jnp.split(pred, len(parts), axis=0)
                    real_pred, prime_pred = split[0], split[1]
                    cycle_pred = split[2] if need_cycle else None
                else:
                    real_pred, st = self._dis_apply(
                        dis_name, dis_side_params, state.model_state, real, alpha,
                        state.gdrop_strength, fold(0), True,
                    )
                    new_dis_state[dis_name] = st
                    prime_pred, _ = self._dis_apply(
                        dis_name, dis_side_params, state.model_state,
                        fakes[f"{domain}_prime"], alpha, state.gdrop_strength, fold(1), False,
                    )
                    cycle_pred = None
                    if need_cycle:
                        cycle_pred, _ = self._dis_apply(
                            dis_name, dis_side_params, state.model_state,
                            fakes[f"{domain}_cycle"], alpha, state.gdrop_strength, fold(2), False,
                        )
                for name, val in discriminator_gan_loss(cfg.loss, prime_pred, real_pred).items():
                    losses[f"{name}_prime_{domain}"] = val
                if need_cycle:
                    # only_real_fake_loss=True for the cycle term.
                    cyc = discriminator_gan_loss(cfg.loss, cycle_pred, real_pred)
                    for name in ("discriminator_loss", "discriminator_fake_loss", "discriminator_real_loss"):
                        if name in cyc:
                            losses[f"{name}_cycle_{domain}"] = cyc[name]

                def dis_fn(images, dis_name=dis_name, k=fold(3)):
                    pred, _ = self._dis_apply(
                        dis_name, dis_side_params, state.model_state, images, alpha,
                        state.gdrop_strength, k, False,
                    )
                    return pred

                losses[f"gradient_penalty_{domain}"] = gradient_penalty(
                    cfg.loss, k_gp, dis_fn, real, fakes[f"{domain}_prime"]
                )
            total = sum(losses.values())
            return total, (new_dis_state, losses)

        dis_side = {k: state.params[k] for k in self.discriminator_side_keys}
        (d_loss, (new_dis_state, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(dis_side)
        updates, new_opt = self.dis_tx.update(grads, state.dis_opt_state, dis_side)
        new_dis_side = optax.apply_updates(dis_side, updates)
        new_model_state = dict(state.model_state)
        for k in self.discriminator_side_keys:
            new_model_state[k] = new_dis_state[k]
        new_state = state.replace(
            critic_step=state.critic_step + 1,
            params={**state.params, **new_dis_side},
            model_state=new_model_state,
            dis_opt_state=new_opt,
        )
        metrics = {"discriminator_loss": d_loss,
                   "discriminator_grad_norm": optax.global_norm(grads), **losses}
        return new_state, metrics

    # ------------------------------------------------------------------ #
    # Inference (the reference's sources_ph / custom_generated_* contract)
    # ------------------------------------------------------------------ #
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def translate(
        self,
        state: GanTrainState,
        images: jax.Array,
        direction: str = "s2t",
        style: Optional[jax.Array] = None,
    ) -> jax.Array:
        """sources -> target domain (or the reverse). Equivalent to the
        reference outputs custom_generated_t_style_source / ..._s_... with
        inference-mode (moving-average) statistics. On a growing-stage
        config the fade-in alpha is derived from state.step like the
        training pass (the reference's placeholder path reuses the live
        alpha_grow tensor, image_generation.py:1016) — without it the newly
        trained high-res block would be ignored at eval."""
        assert direction in ("s2t", "t2s")
        src_domain = DOMAIN_S if direction == "s2t" else DOMAIN_T
        out_domain = DOMAIN_T if direction == "s2t" else DOMAIN_S
        alpha = self._alpha(state.step)
        params, model_state = state.params, state.model_state
        if state.gen_ema_params is not None:
            # Moving-average eval weights (reference model_inheritor.py:1150).
            params = {**params, **state.gen_ema_params}
        (code, skips), _ = apply_model(
            self.enc, params[ENC], model_state[ENC], images, alpha=alpha,
            domain=src_domain, train=False,
        )
        if self.cfg.use_style_embedding and style is None:
            style_out, _ = apply_model(
                self.enc_style, params[ENC_STYLE], model_state[ENC_STYLE], images,
                alpha=alpha, domain=src_domain, train=False,
            )
            style = style_out
        (img, _), _ = apply_model(
            self.gen, params[GEN], model_state[GEN], code, alpha=alpha,
            domain=out_domain, style=style,
            unet_skips=skips if self.cfg.use_unet else None, train=False,
        )
        return img
