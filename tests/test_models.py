"""Shape/construction tests for the PGGAN model family.

Mirrors the reference's colocated shape-test style (SURVEY.md section 4) and
covers exactly what the reference left untested: every stage x growing flag,
norm variants, domain banks, UNet skips, spectral/attention options.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu.models import PGGANConfig, Generator, Discriminator, Encoder, EncoderClassifier
from twingan_tpu.models.pggan import StyleEncoder, noise_shape


def init_and_apply(model, *args, train=False, rngs=None, **kwargs):
    rngs = rngs or {}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs}, *args, train=train, **kwargs)
    mutable = [k for k in variables if k != "params"] if train else []
    out = model.apply(variables, *args, train=train, rngs=rngs,
                      mutable=mutable if mutable else False, **kwargs)
    if mutable:
        out = out[0]
    return out, variables


class TestGenerator:
    @pytest.mark.parametrize("res,growing", [(4, False), (8, True), (8, False), (32, True), (32, False)])
    def test_output_shape_from_noise(self, res, growing):
        cfg = PGGANConfig(resolution=res, is_growing=growing, max_channels=32)
        gen = Generator(cfg)
        z = jnp.ones(noise_shape(cfg, 2))
        (out, eps), _ = init_and_apply(gen, z, alpha=0.5)
        assert out.shape == (2, res, res, 3)

    def test_output_shape_from_encoding(self):
        cfg = PGGANConfig(resolution=16, max_channels=32)
        gen = Generator(cfg)
        enc = jnp.ones((2, 4, 4, 32))
        (out, _), _ = init_and_apply(gen, enc)
        assert out.shape == (2, 16, 16, 3)

    def test_2d_noise_accepted(self):
        cfg = PGGANConfig(resolution=8, max_channels=16)
        (out, _), _ = init_and_apply(Generator(cfg), jnp.ones((2, cfg.noise_dim)))
        assert out.shape == (2, 8, 8, 3)

    def test_growth_param_superset(self):
        # Growing a stage only ADDs named subtrees; shared layers keep names.
        cfg8 = PGGANConfig(resolution=8, max_channels=16)
        cfg16g = cfg8.replace(resolution=16, is_growing=True)
        _, v8 = init_and_apply(Generator(cfg8), jnp.ones(noise_shape(cfg8, 1)))
        _, v16 = init_and_apply(Generator(cfg16g), jnp.ones(noise_shape(cfg16g, 1)), alpha=0.3)
        p8 = set(jax.tree_util.tree_leaves_with_path(v8["params"], is_leaf=None) and
                 [jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(v8["params"])[0]])
        p16 = set(jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(v16["params"])[0])
        assert p8 <= p16
        # The new stage adds block_16 convs + to_rgb_16.
        assert any("block_16_conv0" in k for k in p16 - p8)
        assert any("to_rgb_16" in k for k in p16 - p8)

    def test_alpha_blend_continuity(self):
        # alpha=0 -> output equals upsampled previous-stage to_rgb path only.
        cfg = PGGANConfig(resolution=16, is_growing=True, max_channels=16)
        gen = Generator(cfg)
        z = jnp.asarray(np.random.RandomState(0).randn(*noise_shape(cfg, 2)).astype(np.float32))
        variables = gen.init(jax.random.PRNGKey(0), z, alpha=0.0)
        (o0, ep0) = gen.apply(variables, z, alpha=0.0)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(ep0["to_rgb_8"]), atol=1e-6)
        (o1, ep1) = gen.apply(variables, z, alpha=1.0)
        assert not np.allclose(np.asarray(o1), np.asarray(o0))

    def test_pixel_norm_and_eqlr_and_resblock(self):
        cfg = PGGANConfig(resolution=16, max_channels=16, do_pixel_norm=True,
                          equalized_lr=True, use_res_block=True, norm_type="none")
        (out, _), _ = init_and_apply(Generator(cfg), jnp.ones(noise_shape(cfg, 2)))
        assert out.shape == (2, 16, 16, 3)

    def test_self_attention_inserted(self):
        cfg = PGGANConfig(resolution=16, max_channels=16, do_self_attention=True,
                          self_attention_hw=8, norm_type="instance_norm")
        (out, _), variables = init_and_apply(Generator(cfg), jnp.ones(noise_shape(cfg, 2)))
        assert "self_attention_8" in variables["params"]
        assert out.shape == (2, 16, 16, 3)

    def test_domain_banks_share_convs(self):
        cfg = PGGANConfig(resolution=8, max_channels=16, num_domains=2)
        gen = Generator(cfg)
        z = jnp.asarray(np.random.RandomState(0).randn(*noise_shape(cfg, 2)).astype(np.float32))
        variables = gen.init(jax.random.PRNGKey(0), z, domain=0)
        # Same conv weights, different norm banks -> different outputs per domain.
        o0, _ = gen.apply(variables, z, domain=0)
        o1, _ = gen.apply(variables, z, domain=1)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-5)  # identical at init
        norm = variables["params"]["block_8_conv0"]["norm"]
        assert "beta_0" in norm and "beta_1" in norm

    def test_conditional_style_norm(self):
        cfg = PGGANConfig(resolution=8, max_channels=16, style_dim=4)
        gen = Generator(cfg)
        z = jnp.asarray(np.random.RandomState(0).randn(*noise_shape(cfg, 2)).astype(np.float32))
        s1 = jnp.ones((2, 4))
        s2 = -jnp.ones((2, 4))
        variables = gen.init(jax.random.PRNGKey(0), z, style=s1)
        o1, _ = gen.apply(variables, z, style=s1)
        o2, _ = gen.apply(variables, z, style=s2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestDiscriminator:
    @pytest.mark.parametrize("res,growing", [(4, False), (8, True), (16, False), (32, True)])
    def test_prediction_shape(self, res, growing):
        cfg = PGGANConfig(resolution=res, is_growing=growing, max_channels=32)
        (pred, eps), _ = init_and_apply(Discriminator(cfg), jnp.ones((2, res, res, 3)), alpha=0.5)
        assert pred.shape == (2, 1)
        assert eps["before_fc"].shape == (2, 1, 1, 32)

    def test_gdrop_path(self):
        cfg = PGGANConfig(resolution=8, max_channels=16)
        dis = Discriminator(cfg, do_gdrop=True)
        x = jnp.ones((2, 8, 8, 3))
        rngs = {"gdrop": jax.random.PRNGKey(1)}
        (pred, _), _ = init_and_apply(dis, x, train=True, rngs=rngs, gdrop_strength=0.5)
        assert pred.shape == (2, 1)

    def test_spectral_norm_state(self):
        cfg = PGGANConfig(resolution=8, max_channels=16, spectral_norm=True)
        dis = Discriminator(cfg)
        x = jnp.ones((2, 8, 8, 3))
        variables = dis.init(jax.random.PRNGKey(0), x)
        assert "spectral" in variables
        # u updates when mutable.
        (pred, _), new_state = dis.apply(variables, x, mutable=["spectral"])
        old = jax.tree_util.tree_leaves(variables["spectral"])
        new = jax.tree_util.tree_leaves(new_state["spectral"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_cond_embed_concat(self):
        cfg = PGGANConfig(resolution=8, max_channels=16)
        (pred, _), _ = init_and_apply(
            Discriminator(cfg), jnp.ones((2, 8, 8, 3)), cond_embed=jnp.ones((2, 10))
        )
        assert pred.shape == (2, 1)

    def test_minibatch_stddev_constant_images(self):
        # All-identical batch -> stddev feature ~0; mixed batch -> > 0.
        cfg = PGGANConfig(resolution=8, max_channels=16)
        dis = Discriminator(cfg)
        variables = dis.init(jax.random.PRNGKey(0), jnp.ones((4, 8, 8, 3)))
        same, _ = dis.apply(variables, jnp.ones((4, 8, 8, 3)))
        mixed, _ = dis.apply(
            variables, jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 3), jnp.float32)
        )
        assert same.shape == mixed.shape == (4, 1)


class TestEncoder:
    @pytest.mark.parametrize("res,growing", [(8, False), (16, True), (32, False)])
    def test_before_classification_is_4x4(self, res, growing):
        cfg = PGGANConfig(resolution=res, is_growing=growing, max_channels=32)
        (net, skips), _ = init_and_apply(Encoder(cfg), jnp.ones((2, res, res, 3)), alpha=0.5)
        assert net.shape == (2, 4, 4, 32)
        # Skip features exist at every block resolution 8..res.
        hw = 8
        while hw <= res:
            assert hw in skips.blocks, hw
            hw *= 2

    def test_unet_skip_channels_match_generator(self):
        res = 32
        cfg = PGGANConfig(resolution=res, max_channels=32)
        (net, skips), _ = init_and_apply(Encoder(cfg), jnp.ones((2, res, res, 3)))
        import math

        for hw, feat in skips.blocks.items():
            assert feat.shape[-1] == cfg.channels(int(math.log2(hw)) - 3)

    def test_generator_with_unet(self):
        res = 16
        cfg = PGGANConfig(resolution=res, max_channels=16)
        enc = Encoder(cfg)
        x = jnp.ones((2, res, res, 3))
        (code, skips), _ = init_and_apply(enc, x)
        gen = Generator(cfg)
        variables = gen.init(jax.random.PRNGKey(0), code, unet_skips=skips)
        out, _ = gen.apply(variables, code, unet_skips=skips)
        assert out.shape == (2, res, res, 3)

    def test_unet_max_concat_hw_cap(self):
        res = 16
        cfg = PGGANConfig(resolution=res, max_channels=16, unet_max_concat_hw=8)
        (code, skips), _ = init_and_apply(Encoder(cfg), jnp.ones((2, res, res, 3)))
        gen = Generator(cfg)
        variables = gen.init(jax.random.PRNGKey(0), code, unet_skips=skips)
        # conv0 at hw=16 sees no skip concat -> input channels = prev stage ch.
        k16 = variables["params"]["block_16_conv0"]["conv"]["kernel"]
        k8 = variables["params"]["block_8_conv0"]["conv"]["kernel"]
        assert k16.shape[2] == 16  # only upsampled channels
        assert k8.shape[2] == 16 + skips.blocks[8].shape[-1]

    def test_classifier_head(self):
        cfg = PGGANConfig(resolution=8, max_channels=16)
        (code, _), _ = init_and_apply(Encoder(cfg), jnp.ones((2, 8, 8, 3)))
        head = EncoderClassifier(cfg, output_dim=7)
        out, _ = init_and_apply(head, code)
        assert out.shape == (2, 7)

    def test_style_encoder(self):
        cfg = PGGANConfig(resolution=8, max_channels=16)
        out, _ = init_and_apply(StyleEncoder(cfg, output_dim=16), jnp.ones((2, 8, 8, 3)))
        assert out.shape == (2, 16)


class TestTrainMode:
    def test_batch_stats_update(self):
        cfg = PGGANConfig(resolution=8, max_channels=16, norm_type="batch_norm")
        gen = Generator(cfg)
        z = jnp.asarray(np.random.RandomState(0).randn(2, cfg.noise_dim).astype(np.float32)) * 3
        variables = gen.init(jax.random.PRNGKey(0), z)
        (out, _), updates = gen.apply(variables, z, train=True, mutable=["batch_stats"])
        old_stats = jax.tree_util.tree_leaves(variables["batch_stats"])
        new_stats = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old_stats, new_stats))

    def test_batch_renorm_runs(self):
        from twingan_tpu.ops import renorm_clipping_schedule

        cfg = PGGANConfig(resolution=8, max_channels=16, norm_type="batch_renorm")
        gen = Generator(cfg)
        z = jnp.ones((2, cfg.noise_dim))
        clip = {k: jnp.asarray(v) for k, v in
                renorm_clipping_schedule(jnp.asarray(0)).items()}
        variables = gen.init(jax.random.PRNGKey(0), z, renorm_clip=clip)
        (out, _), updates = gen.apply(
            variables, z, train=True, renorm_clip=clip, mutable=["batch_stats"]
        )
        assert out.shape == (2, 8, 8, 3)
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(updates["batch_stats"])[0]}
        assert any("renorm_mean_weight" in k for k in flat)

    def test_bf16_compute(self):
        cfg = PGGANConfig(resolution=8, max_channels=16, dtype="bfloat16", norm_type="instance_norm")
        gen = Generator(cfg)
        z = jnp.ones((2, cfg.noise_dim))
        variables = gen.init(jax.random.PRNGKey(0), z)
        out, _ = gen.apply(variables, z)
        assert out.dtype == jnp.bfloat16
        # Params stay fp32.
        assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"]))


class TestPerDeviceBNParity:
    def test_grouped_moments_match_independent_halves(self):
        """bn_num_groups=2 must normalize each half of the batch with its own
        moments — the per-clone BN semantics of the reference."""
        from twingan_tpu.models.layers import DomainNorm, NormCtx

        norm = DomainNorm(kind="batch_norm", num_groups=2)
        rng = np.random.RandomState(0)
        a = rng.randn(4, 4, 4, 3).astype(np.float32) * 2 + 5
        b = rng.randn(4, 4, 4, 3).astype(np.float32) * 0.5 - 3
        x = jnp.asarray(np.concatenate([a, b]))
        ctx = NormCtx(train=True)
        variables = norm.init(jax.random.PRNGKey(0), x, ctx)
        y, _ = norm.apply(variables, x, ctx, mutable=["batch_stats"])
        y = np.asarray(y)
        # Each half is independently whitened.
        for half in (y[:4], y[4:]):
            np.testing.assert_allclose(half.mean((0, 1, 2)), 0.0, atol=1e-3)
            np.testing.assert_allclose(half.std((0, 1, 2)), 1.0, atol=2e-2)
        # A global norm would NOT whiten each half separately.
        g = DomainNorm(kind="batch_norm", num_groups=0)
        gv = g.init(jax.random.PRNGKey(0), x, ctx)
        yg, _ = g.apply(gv, x, ctx, mutable=["batch_stats"])
        yg = np.asarray(yg)
        assert abs(yg[:4].mean()) > 0.1  # halves keep their offset globally

    def test_grouped_batch_renorm(self):
        """bn_num_groups must also apply to batch_renorm (per-clone renorm
        statistics; previously silently ignored — ADVICE round 1)."""
        from twingan_tpu.models.layers import DomainNorm, NormCtx

        norm = DomainNorm(kind="batch_renorm", num_groups=2)
        rng = np.random.RandomState(1)
        a = rng.randn(4, 4, 4, 3).astype(np.float32) * 2 + 5
        b = rng.randn(4, 4, 4, 3).astype(np.float32) * 0.5 - 3
        x = jnp.asarray(np.concatenate([a, b]))
        ctx = NormCtx(train=True)
        variables = norm.init(jax.random.PRNGKey(0), x, ctx)
        y, mut = norm.apply(variables, x, ctx, mutable=["batch_stats"])
        y = np.asarray(y)
        # On the first step r=1, d=0 (fresh EMAs), so each half is
        # independently whitened exactly like grouped batch_norm.
        for half in (y[:4], y[4:]):
            np.testing.assert_allclose(half.mean((0, 1, 2)), 0.0, atol=1e-3)
            np.testing.assert_allclose(half.std((0, 1, 2)), 1.0, atol=2e-2)
        # The shared renorm EMAs advanced (group-averaged moments).
        stats = mut["batch_stats"]
        assert float(stats["renorm_mean_weight_0"]) > 0.0
        expected_mean = 0.5 * (a.mean((0, 1, 2)) + b.mean((0, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(stats["renorm_mean_0"]) / float(stats["renorm_mean_weight_0"]),
            expected_mean, rtol=1e-4, atol=1e-5,
        )

    def test_trainer_runs_with_groups(self):
        from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
        from twingan_tpu.train.optimizers import OptimizerConfig

        cfg = GanTrainerConfig(
            model=PGGANConfig(resolution=8, max_channels=16, bn_num_groups=2),
            batch_size=4,
            opt=OptimizerConfig(learning_rate=1e-3),
        )
        trainer = GanTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, m = trainer.g_step(
            state, {"target": jnp.ones((4, 8, 8, 3))}, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(m["generator_loss"]))
