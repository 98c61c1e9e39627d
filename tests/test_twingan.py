"""TwinGAN trainer tests: the flagship dual-domain translation model.

Covers everything twingan.py's add_loss/_clone_fn does, none of which the
reference tested (SURVEY.md section 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.train.losses import GanLossConfig
from twingan_tpu.train.optimizers import OptimizerConfig
from twingan_tpu.train.twingan_trainer import (
    DIS_S,
    DIS_T,
    ENC,
    ENC_STYLE,
    GEN,
    TwinGANConfig,
    TwinGANTrainer,
)


def small_cfg(**kw):
    model_kw = dict(resolution=8, max_channels=16, num_domains=2)
    model_kw.update(kw.pop("model_kw", {}))
    defaults = dict(
        model=PGGANConfig(**model_kw),
        batch_size=4,
        opt=OptimizerConfig(learning_rate=1e-3),
        loss=GanLossConfig(architecture="dragan"),
    )
    defaults.update(kw)
    return TwinGANConfig(**defaults)


def batch(seed=0, n=4, res=8, embed_dim=0):
    rng = np.random.RandomState(seed)
    b = {
        "source": jnp.asarray(rng.rand(n, res, res, 3).astype(np.float32)),
        "target": jnp.asarray(rng.rand(n, res, res, 3).astype(np.float32)),
    }
    if embed_dim:
        b["source_embedding"] = jnp.asarray(rng.randn(n, embed_dim).astype(np.float32))
        b["target_embedding"] = jnp.asarray(rng.randn(n, embed_dim).astype(np.float32))
    return b


class TestTwinGANTrainer:
    def test_basic_round(self):
        cfg = small_cfg()
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert set(state.params) == {ENC, GEN, DIS_S, DIS_T}
        state, metrics = trainer.round_step(
            state, [batch(0), batch(1)], jax.random.PRNGKey(1)
        )
        assert int(state.step) == 1 and int(state.critic_step) == 2
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        # Cycle + prime fool + content losses present for both domains.
        for d in ("s", "t"):
            assert f"l_cyc_{d}" in metrics
            assert f"generator_fool_loss_prime_{d}" in metrics
            assert f"l_{d}_content" in metrics
            assert f"gradient_penalty_{d}" in metrics
        # At 8px there is no cycle GAN loss (res < 64 gate).
        assert "generator_fool_loss_cycle_s" not in metrics

    def test_g_step_updates_encoder_and_generator_only(self):
        trainer = TwinGANTrainer(small_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        before = {
            k: [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params[k])]
            for k in state.params
        }
        new_state, _ = trainer.g_step(state, batch(), jax.random.PRNGKey(1))
        for k in (ENC, GEN):
            after = jax.tree_util.tree_leaves(new_state.params[k])
            assert any(not np.allclose(a, b) for a, b in zip(before[k], after)), k
        for k in (DIS_S, DIS_T):
            after = jax.tree_util.tree_leaves(new_state.params[k])
            assert all(np.array_equal(a, b) for a, b in zip(before[k], after)), k

    def test_d_step_updates_both_discriminators_only(self):
        trainer = TwinGANTrainer(small_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        before = {
            k: [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params[k])]
            for k in state.params
        }
        new_state, _ = trainer.d_step(state, batch(), jax.random.PRNGKey(1))
        for k in (DIS_S, DIS_T):
            after = jax.tree_util.tree_leaves(new_state.params[k])
            assert any(not np.allclose(a, b) for a, b in zip(before[k], after)), k
        for k in (ENC, GEN):
            after = jax.tree_util.tree_leaves(new_state.params[k])
            assert all(np.array_equal(a, b) for a, b in zip(before[k], after)), k
        assert int(new_state.step) == 0

    def test_style_embedding_mode(self):
        cfg = small_cfg(
            use_style_embedding=True,
            style_embed_size=8,
            model_kw={"style_dim": 8},
        )
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert ENC_STYLE in state.params
        state, metrics = trainer.round_step(state, [batch(0), batch(1)], jax.random.PRNGKey(1))
        assert "l_s_style" in metrics and "l_t_style" in metrics
        assert np.isfinite(float(metrics["generator_loss"]))

    def test_unet_mode(self):
        cfg = small_cfg(use_unet=True)
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.g_step(state, batch(), jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["generator_loss"]))
        # UNet concat widens generator conv0 input channels beyond upsampled.
        k8 = state.params[GEN]["block_8_conv0"]["conv"]["kernel"]
        assert k8.shape[2] > 16

    def test_distillation_mode(self):
        cfg = small_cfg(
            do_encoder_distillation=True,
            distillation_start_hw=8,
            source_embed_dim=12,
            target_embed_dim=12,
        )
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.g_step(state, batch(embed_dim=12), jax.random.PRNGKey(1))
        assert "l_source_distillation" in metrics
        assert "l_t_prime_distillation" in metrics
        assert np.isfinite(float(metrics["generator_loss"]))

    def test_growing_round(self):
        cfg = small_cfg(
            model_kw={"resolution": 16, "is_growing": True},
            max_steps=100,
        )
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.round_step(
            state, [batch(0, res=16), batch(1, res=16)], jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["generator_loss"]))
        assert np.isfinite(float(metrics["discriminator_loss"]))

    def test_translate_both_directions(self):
        cfg = small_cfg()
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
        out_t = trainer.translate(state, imgs, "s2t")
        out_s = trainer.translate(state, imgs, "t2s")
        assert out_t.shape == out_s.shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out_t)).all()

    def test_domain_banks_diverge_after_training(self):
        # After a few rounds the s/t norm banks should differ (they receive
        # different gradients through the domain-selected passes).
        cfg = small_cfg()
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        for r in range(2):
            state, _ = trainer.round_step(state, [batch(2 * r), batch(2 * r + 1)], jax.random.PRNGKey(r))
        flat = {
            jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_flatten_with_path(state.params[GEN])[0]
        }
        beta0 = [v for k, v in flat.items() if k.endswith("['beta_0']")]
        beta1 = [v for k, v in flat.items() if k.endswith("['beta_1']")]
        assert beta0 and beta1
        assert any(not np.allclose(a, b) for a, b in zip(beta0, beta1))

    def test_shared_conv_weights_across_domains(self):
        # One generator: its conv kernels serve both domains (param tree has
        # a single kernel per layer, plus two norm banks).
        trainer = TwinGANTrainer(small_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        conv = state.params[GEN]["block_8_conv0"]
        assert "conv" in conv and "norm" in conv
        assert set(k for k in conv["norm"]) == {"beta_0", "beta_1", "gamma_0", "gamma_1"}

    def test_cycle_gan_gate_at_64(self):
        cfg = small_cfg(model_kw={"resolution": 64}, batch_size=2)
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, metrics = trainer.round_step(
            state, [batch(0, n=2, res=64), batch(1, n=2, res=64)], jax.random.PRNGKey(1)
        )
        assert "generator_fool_loss_cycle_s" in metrics
        assert "discriminator_fake_loss_cycle_t" in metrics


class TestTwinGANPolyak:
    def test_ema_used_by_translate(self):
        cfg = small_cfg(moving_average_decay=0.9)
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        assert state.gen_ema_params is not None
        for i in range(2):
            state, _ = trainer.g_step(state, batch(i), jax.random.PRNGKey(i))
        # EMA lags the live params.
        live = jax.tree_util.tree_leaves(state.params[GEN])
        ema = jax.tree_util.tree_leaves(state.gen_ema_params[GEN])
        assert any(not np.allclose(a, b) for a, b in zip(live, ema))
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
        out = trainer.translate(state, imgs, "s2t")
        assert np.isfinite(np.asarray(out)).all()


class TestFusedPasses:
    """fuse_passes concatenates same-weight passes into single applies; for
    per-sample norms this must be EXACTLY the unfused math (the D is
    norm-free and minibatch-stddev groups align with sub-batch boundaries).
    """

    def _trainers(self, res=8, **kw):
        model_kw = kw.pop("model_kw", {})
        model_kw.setdefault("norm_type", "instance_norm")
        model_kw.setdefault("resolution", res)
        cfgs = [
            small_cfg(fuse_passes=f, model_kw=dict(model_kw), **kw)
            for f in (False, True)
        ]
        return [TwinGANTrainer(c) for c in cfgs]

    def _assert_step_parity(self, res=8, n=4, **kw):
        un, fu = self._trainers(res=res, **kw)
        state0 = un.init_state(jax.random.PRNGKey(0))
        b = batch(0, n=n, res=res, embed_dim=kw.get("source_embed_dim", 0))
        rng = jax.random.PRNGKey(1)
        su, mu = un._g_step(state0, b, rng)
        sf, mf = fu._g_step(state0, b, rng)
        assert set(mu) == set(mf)
        for k in mu:
            np.testing.assert_allclose(
                np.asarray(mu[k]), np.asarray(mf[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"g metric {k}")
        for (ku, lu), (kf, lf) in zip(
            jax.tree_util.tree_flatten_with_path(su.params)[0][:],
            jax.tree_util.tree_flatten_with_path(sf.params)[0][:],
        ):
            assert jax.tree_util.keystr(ku) == jax.tree_util.keystr(kf)
            np.testing.assert_allclose(
                np.asarray(lu), np.asarray(lf), rtol=2e-4, atol=2e-5,
                err_msg=f"g param {jax.tree_util.keystr(ku)}")
        b2 = batch(1, n=n, res=res, embed_dim=kw.get("source_embed_dim", 0))
        du, mdu = un._d_step(su, b2, rng)
        df, mdf = fu._d_step(sf, b2, rng)
        assert set(mdu) == set(mdf)
        for k in mdu:
            np.testing.assert_allclose(
                np.asarray(mdu[k]), np.asarray(mdf[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"d metric {k}")

    def test_auto_resolution(self):
        # instance norm -> fused; batch-coupled norms -> unfused.
        assert small_cfg(model_kw={"norm_type": "instance_norm"}).fuse
        assert not small_cfg(model_kw={"norm_type": "batch_norm"}).fuse
        assert not small_cfg(model_kw={"norm_type": "batch_renorm"}).fuse
        with pytest.raises(ValueError):
            small_cfg(fuse_passes=True, model_kw={"norm_type": "batch_norm"})

    def test_parity_small_res(self):
        self._assert_step_parity(res=8)

    def test_parity_unet_growing(self):
        self._assert_step_parity(
            res=16, model_kw={"resolution": 16, "is_growing": True},
            use_unet=True, max_steps=100,
        )

    def test_parity_style_embedding(self):
        self._assert_step_parity(
            use_style_embedding=True, style_embed_size=8,
            model_kw={"style_dim": 8},
        )

    def test_parity_cycle_gan_at_64(self):
        # res >= 64 activates the cycle GAN terms: D applies fuse 3 passes.
        self._assert_step_parity(res=64, n=2, batch_size=2)

    def test_grouped_minibatch_stddev_matches_per_pass(self):
        from twingan_tpu import ops

        rng = np.random.RandomState(0)
        parts = [rng.rand(3, 4, 4, 5).astype(np.float32) for _ in range(3)]
        fused = np.asarray(
            ops.minibatch_stddev(jnp.asarray(np.concatenate(parts)), num_groups=3)
        )
        separate = np.concatenate(
            [np.asarray(ops.minibatch_stddev(jnp.asarray(p))) for p in parts]
        )
        np.testing.assert_allclose(fused, separate, rtol=1e-6, atol=1e-7)
