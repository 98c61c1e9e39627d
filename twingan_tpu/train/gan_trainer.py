"""Plain image-generation GAN trainer (reference image_generation.py GanModel).

One trainer instance is bound to one growth stage (a static PGGANConfig); the
stage runner re-instantiates + re-jits per stage and migrates the state
pytree (the TPU replacement for TF1 graph rebuild + lenient restore).

Step structure: the reference ticks one `n_critic_counter` per session.run and
applies G when counter % n_critic == 0, else D — while *computing* both
gradient sets every step inside tf.cond (image_generation.py:587-662). Here
G-steps and D-steps are separate jitted functions, so each step computes only
the gradients it applies; `round_step` host-dispatches one G + (n_critic-1)
D jitted steps per round, and `scan_rounds` (train/base.py) is the fused
single-dispatch on-device loop for hot paths. Semantics preserved:
global step advances only on G updates; gdrop strength follows the
clipped current generator loss (reference image_generation.py:563-585).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.cyclegan import CycleGANDiscriminator, CycleGANGenerator
from twingan_tpu.models.pggan import Discriminator, Generator, noise_shape
from twingan_tpu.train.base import BaseGanTrainer
from twingan_tpu.train.losses import (
    GanLossConfig,
    discriminator_gan_loss,
    generator_gan_loss,
    gradient_penalty,
)
from twingan_tpu.train.optimizers import OptimizerConfig, build_optimizer
from twingan_tpu.train.state import (
    GanTrainState,
    apply_model,
    init_model,
    polyak_update,
    update_gdrop_state,
)

GEN = "generator"
DIS = "discriminator"


@dataclasses.dataclass(frozen=True)
class GanTrainerConfig:
    model: PGGANConfig = dataclasses.field(default_factory=PGGANConfig)
    loss: GanLossConfig = dataclasses.field(default_factory=GanLossConfig)
    opt: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    batch_size: int = 16
    n_critic: int = 2
    use_ttur: bool = False
    discriminator_learning_rate: float = 0.0004
    # gdrop (PGGAN discriminator noise, reference flags use_gdrop/gdrop_*).
    use_gdrop: bool = False
    gdrop_coef: float = 0.2
    gdrop_lim: float = 0.5
    gdrop_exp: float = 2.0
    # Fade-in schedule: alpha = (step - grow_start) / (max_steps - grow_start).
    grow_start_step: int = 0
    max_steps: int = 300000
    # Network selection (reference generator_network flag, pggan | cyclegan,
    # image_generation.py:214-227). dcgan is additionally selectable here —
    # the reference ships nets/dcgan.py but never wires it into a trainer;
    # BASELINE config #2 (DCGAN 64px on SVHN) needs it end-to-end.
    generator_network: str = "pggan"
    cyclegan_num_channels: int = 64
    dcgan_depth: int = 64
    dcgan_latent_dim: int = 64
    # Polyak averaging of generator params for eval (0 disables).
    moving_average_decay: float = 0.0
    # Rematerialize each G/D pass in the backward (jax.checkpoint): peak
    # memory drops to ~one pass's activations, enabling larger batches at
    # 256px+ under the GP double-backward; costs ~1 extra forward of FLOPs.
    remat: bool = False
    # Conditional generation from dataset labels (reference
    # use_conditional_labels, image_generation.py:1043-1049): the multi-hot
    # 'conditional_labels' batch item drives G's conditional norms (beta/
    # gamma from FCs of the label vector, libs/batch_norm.py:129-174) and is
    # embedded through a fixed random lookup -> concatenated into D's 4x4
    # block (nets/pggan.py:318-323). num_classes: e.g. 51 for anime_faces.
    use_conditional_labels: bool = False
    num_classes: int = 0
    conditional_embed_dim: int = 32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class GanTrainer(BaseGanTrainer):
    """Builds models/optimizers for one stage and exposes jitted steps."""

    def __init__(self, cfg: GanTrainerConfig):
        if cfg.use_conditional_labels:
            if cfg.generator_network != "pggan":
                raise ValueError("conditional labels require the pggan network")
            if cfg.num_classes <= 0:
                raise ValueError("use_conditional_labels requires num_classes > 0")
            if cfg.model.style_dim != cfg.num_classes:
                # Conditional norms consume the label vector directly
                # (reference feeds conditional_labels to the norm FCs,
                # image_generation.py:1046).
                cfg = cfg.replace(model=cfg.model.replace(style_dim=cfg.num_classes))
            # Fixed random embedding lookup for D, non-trainable like the
            # reference's one_hot_embedding_lookup_matrix
            # (model_inheritor.py:706-714); deterministic in the config so
            # restarts regenerate the same matrix without checkpointing it.
            self.cond_lookup = jax.random.uniform(
                jax.random.PRNGKey(cfg.num_classes * 1000003 + cfg.conditional_embed_dim),
                (cfg.num_classes, cfg.conditional_embed_dim), jnp.float32,
            )
        else:
            self.cond_lookup = None
        self.cfg = cfg
        self.is_pggan = cfg.generator_network == "pggan"
        if self.is_pggan:
            self.gen = Generator(cfg.model)
            self.dis = Discriminator(cfg.model, do_gdrop=cfg.use_gdrop)
        elif cfg.generator_network == "cyclegan":
            self.gen = CycleGANGenerator(
                num_filters=cfg.cyclegan_num_channels,
                num_outputs=cfg.model.image_channels,
            )
            self.dis = CycleGANDiscriminator(num_filters=cfg.cyclegan_num_channels)
        elif cfg.generator_network == "dcgan":
            from twingan_tpu.models.dcgan import DCGANDiscriminator, DCGANGenerator

            self.gen = DCGANGenerator(
                depth=cfg.dcgan_depth,
                final_size=cfg.model.resolution,
                num_outputs=cfg.model.image_channels,
            )
            self.dis = DCGANDiscriminator(depth=cfg.dcgan_depth)
        else:
            raise NotImplementedError(
                f"generator_network {cfg.generator_network!r} is not implemented"
            )
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

    # ------------------------------------------------------------------ #
    # Initialization
    # ------------------------------------------------------------------ #
    def init_state(self, rng: jax.Array) -> GanTrainState:
        cfg = self.cfg
        kg, kd, kn = jax.random.split(rng, 3)
        img = jnp.zeros(
            (cfg.batch_size, cfg.model.resolution, cfg.model.resolution, cfg.model.image_channels),
            jnp.float32,
        )
        if self.is_pggan:
            z = jnp.zeros(noise_shape(cfg.model, cfg.batch_size), jnp.float32)
            gen_kwargs, dis_kwargs = {}, {}
            if cfg.use_conditional_labels:
                gen_kwargs["style"] = jnp.zeros(
                    (cfg.batch_size, cfg.num_classes), jnp.float32
                )
                dis_kwargs["cond_embed"] = jnp.zeros(
                    (cfg.batch_size, cfg.conditional_embed_dim), jnp.float32
                )
            gen_params, gen_state = init_model(self.gen, kg, z, alpha=0.0, **gen_kwargs)
            dis_params, dis_state = init_model(
                self.dis, kd, img, alpha=0.0, extra_rngs={"gdrop": kn}, **dis_kwargs
            )
        elif cfg.generator_network == "dcgan":
            z = jnp.zeros((cfg.batch_size, cfg.dcgan_latent_dim), jnp.float32)
            gen_params, gen_state = init_model(self.gen, kg, z)
            dis_params, dis_state = init_model(self.dis, kd, img)
        else:
            gen_params, gen_state = init_model(self.gen, kg, img)
            dis_params, dis_state = init_model(self.dis, kd, img)
        params = {GEN: gen_params, DIS: dis_params}
        model_state = {GEN: gen_state, DIS: dis_state}
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            critic_step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            gen_opt_state=self.gen_tx.init(gen_params),
            dis_opt_state=self.dis_tx.init(dis_params),
            gdrop_strength=jnp.zeros((), jnp.float32),
            gen_loss_ema=jnp.zeros((), jnp.float32),
            gen_ema_params=(
                # Distinct buffers: the live params are donated by the steps.
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), gen_params)
                if cfg.moving_average_decay
                else None
            ),
        )

    # ------------------------------------------------------------------ #
    # Generic model application (pggan vs cyclegan call signatures)
    # ------------------------------------------------------------------ #
    def _apply_gen(self, params, model_state, gen_input, alpha, clip, train, update,
                   style=None):
        if self.is_pggan:
            return apply_model(
                self.gen, params, model_state, gen_input,
                alpha=alpha, train=train, update_state=update, renorm_clip=clip,
                style=style, remat=self.cfg.remat,
            )
        return apply_model(self.gen, params, model_state, gen_input,
                           train=train, update_state=update,
                           remat=self.cfg.remat)

    def _apply_dis(self, params, model_state, images, alpha, gdrop_strength,
                   k_gdrop, train, update, cond_embed=None):
        if self.is_pggan:
            return apply_model(
                self.dis, params, model_state, images,
                alpha=alpha, gdrop_strength=gdrop_strength, train=train,
                update_state=update, rngs={"gdrop": k_gdrop},
                cond_embed=cond_embed, remat=self.cfg.remat,
            )
        return apply_model(self.dis, params, model_state, images,
                           train=train, update_state=update,
                           remat=self.cfg.remat)

    def _cond(self, batch):
        """(label vector for G's conditional norms, embedding for D's 4x4
        concat) — or (None, None) when conditioning is off/absent."""
        if not self.cfg.use_conditional_labels:
            return None, None
        labels = batch.get("conditional_labels")
        if labels is None:
            # A model initialized with conditional norms/concat cannot run
            # without them (the param tree and D input widths differ) —
            # fail loudly instead of deep inside flax.
            raise ValueError(
                "use_conditional_labels=True but the batch has no "
                "'conditional_labels' item; check the dataset emits labels "
                "(text-tag datasets need a vocab_file)"
            )
        labels = jnp.asarray(labels)
        if labels.ndim == 2 and labels.shape[-1] != self.cfg.num_classes:
            raise ValueError(
                f"conditional_labels width {labels.shape[-1]} != "
                f"num_classes {self.cfg.num_classes}"
            )
        if labels.ndim == 1:
            # Integer class ids -> safe one-hot (reference util_misc.py:89).
            from twingan_tpu.utils.misc import safe_one_hot_encoding

            labels = safe_one_hot_encoding(labels, self.cfg.num_classes)
        labels = labels.astype(jnp.float32)
        return labels, labels @ self.cond_lookup

    def _gen_input(self, batch, key, batch_size):
        """The generator input: the dataset 'source' item when present
        (conditional generation / paired translation, reference
        image_generation.py:246), else fresh noise."""
        src = batch.get("source")
        if self.cfg.generator_network == "dcgan":
            # DCGAN takes [B, N] latents; image datasets emit source==target
            # (image_only schema), which must NOT be fed as the latent. A 2D
            # source (a dataset-provided latent/code) still passes through.
            if src is not None and src.ndim == 2:
                return src.astype(jnp.float32)
            return jax.random.normal(key, (batch_size, self.cfg.dcgan_latent_dim))
        if src is not None:
            return src.astype(jnp.float32)
        return jax.random.normal(key, noise_shape(self.cfg.model, batch_size))

    # ------------------------------------------------------------------ #
    # Train steps (jitted wrappers + scan loop in BaseGanTrainer)
    # ------------------------------------------------------------------ #
    def _g_step(self, state: GanTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        cfg = self.cfg
        alpha = self._alpha(state.step)
        clip = self._renorm_clip(state.step)
        k_noise, k_gdrop = jax.random.split(jax.random.fold_in(rng, state.critic_step))
        real = self.growing_image(batch["target"].astype(jnp.float32), alpha)
        z = self._gen_input(batch, k_noise, real.shape[0])
        cond_labels, cond_embed = self._cond(batch)

        def loss_fn(gen_params):
            (fake, _), new_gen_state = self._apply_gen(
                gen_params, state.model_state[GEN], z, alpha, clip, True, True,
                style=cond_labels,
            )
            (fake_pred, _), _ = self._apply_dis(
                state.params[DIS], state.model_state[DIS], fake, alpha,
                state.gdrop_strength, k_gdrop, True, False, cond_embed=cond_embed,
            )
            loss = generator_gan_loss(cfg.loss, fake_pred)
            if cfg.generator_network == "cyclegan":
                # Paired l1 term (reference add_loss :312-315).
                from twingan_tpu.train.losses import l1_loss

                loss = loss + l1_loss(real, fake)
            return loss, (new_gen_state, fake)

        (g_loss, (new_gen_state, fake)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params[GEN]
        )
        updates, new_opt = self.gen_tx.update(grads, state.gen_opt_state, state.params[GEN])
        new_gen_params = optax.apply_updates(state.params[GEN], updates)
        new_ema, new_strength = update_gdrop_state(
            state.gen_loss_ema, g_loss, state.step, cfg.gdrop_coef, cfg.gdrop_lim, cfg.gdrop_exp
        )
        if not cfg.use_gdrop:
            new_strength = state.gdrop_strength
        new_ema_params = state.gen_ema_params
        if cfg.moving_average_decay:
            new_ema_params = polyak_update(
                state.gen_ema_params, new_gen_params, cfg.moving_average_decay
            )
        new_state = state.replace(
            step=state.step + 1,
            critic_step=state.critic_step + 1,
            params={**state.params, GEN: new_gen_params},
            model_state={**state.model_state, GEN: new_gen_state},
            gen_opt_state=new_opt,
            gen_loss_ema=new_ema,
            gdrop_strength=new_strength,
            gen_ema_params=new_ema_params,
        )
        metrics = {"generator_loss": g_loss, "alpha": alpha, "gdrop_strength": new_strength,
                   # Reference logs per-clone gradient norms
                   # (deployment/model_deploy.py:506-530).
                   "generator_grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    def _d_step(self, state: GanTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        cfg = self.cfg
        alpha = self._alpha(state.step)
        clip = self._renorm_clip(state.step)
        key = jax.random.fold_in(rng, state.critic_step)
        k_noise, k_gdrop, k_gp = jax.random.split(key, 3)
        real = self.growing_image(batch["target"].astype(jnp.float32), alpha)
        z = self._gen_input(batch, k_noise, real.shape[0])
        cond_labels, cond_embed = self._cond(batch)

        # Generator forward without updates (reference: G update ops are
        # filtered out of D steps).
        (fake, _), _ = self._apply_gen(
            state.params[GEN], state.model_state[GEN], z, alpha, clip, True, False,
            style=cond_labels,
        )
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(dis_params):
            # Independent gdrop noise per discriminator pass (fake / real /
            # gradient-penalty), matching the reference's fresh
            # tf.random_normal per discriminator graph copy.
            (fake_pred, _), new_dis_state = self._apply_dis(
                dis_params, state.model_state[DIS], fake, alpha,
                state.gdrop_strength, jax.random.fold_in(k_gdrop, 0), True, True,
                cond_embed=cond_embed,
            )
            (real_pred, _), _ = self._apply_dis(
                dis_params, state.model_state[DIS], real, alpha,
                state.gdrop_strength, jax.random.fold_in(k_gdrop, 1), True, False,
                cond_embed=cond_embed,
            )
            losses = discriminator_gan_loss(cfg.loss, fake_pred, real_pred)

            def dis_fn(images):
                (pred, _), _ = self._apply_dis(
                    dis_params, state.model_state[DIS], images, alpha,
                    state.gdrop_strength, jax.random.fold_in(k_gdrop, 2), True, False,
                    cond_embed=cond_embed,
                )
                return pred

            gp = gradient_penalty(cfg.loss, k_gp, dis_fn, real, fake)
            losses["gradient_penalty"] = gp
            total = sum(losses.values())
            return total, (new_dis_state, losses, real_pred, fake_pred)

        (d_loss, (new_dis_state, losses, real_pred, fake_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params[DIS])
        updates, new_opt = self.dis_tx.update(grads, state.dis_opt_state, state.params[DIS])
        new_dis_params = optax.apply_updates(state.params[DIS], updates)
        new_state = state.replace(
            critic_step=state.critic_step + 1,
            params={**state.params, DIS: new_dis_params},
            model_state={**state.model_state, DIS: new_dis_state},
            dis_opt_state=new_opt,
        )
        metrics = {
            "discriminator_loss": d_loss,
            "real_pred_mean": jnp.mean(real_pred),
            "fake_pred_mean": jnp.mean(fake_pred),
            "discriminator_grad_norm": optax.global_norm(grads),
            **losses,
        }
        return new_state, metrics

    # ------------------------------------------------------------------ #
    # Sampling
    # ------------------------------------------------------------------ #
    @functools.partial(jax.jit, static_argnums=0)
    def sample(self, state: GanTrainState, z: jax.Array,
               labels: Optional[jax.Array] = None) -> jax.Array:
        """Inference-mode generation (moving statistics). ``z`` is noise for
        unconditional pggan, or the conditioning source otherwise
        (the reference's custom_input_ph path). ``labels`` is the multi-hot
        conditioning vector for conditional models (zeros if omitted)."""
        alpha = self._alpha(state.step)
        gen_params = (
            state.gen_ema_params if state.gen_ema_params is not None else state.params[GEN]
        )
        style = None
        if self.cfg.use_conditional_labels:
            style = (jnp.zeros((z.shape[0], self.cfg.num_classes), jnp.float32)
                     if labels is None else jnp.asarray(labels, jnp.float32))
        (img, _), _ = self._apply_gen(
            gen_params, state.model_state[GEN], z, alpha, None, False, False,
            style=style,
        )
        return img
