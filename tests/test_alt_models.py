"""DCGAN / CycleGAN shape tests (reference nets/dcgan_test.py and
nets/cyclegan_test.py equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu.models.cyclegan import CycleGANDiscriminator, CycleGANGenerator
from twingan_tpu.models.dcgan import DCGANDiscriminator, DCGANGenerator


class TestDCGAN:
    @pytest.mark.parametrize("final_size", [8, 16, 32])
    def test_generator_shapes(self, final_size):
        gen = DCGANGenerator(depth=8, final_size=final_size)
        z = jnp.ones((2, 10))
        variables = gen.init(jax.random.PRNGKey(0), z)
        (out, eps), _ = gen.apply(variables, z, train=True, mutable=["batch_stats"])
        assert out.shape == (2, final_size, final_size, 3)

    def test_generator_invalid_size(self):
        with pytest.raises(ValueError):
            DCGANGenerator(final_size=6).init(jax.random.PRNGKey(0), jnp.ones((2, 4)))

    @pytest.mark.parametrize("size", [8, 16, 32])
    def test_discriminator_shapes(self, size):
        dis = DCGANDiscriminator(depth=8)
        x = jnp.ones((2, size, size, 3))
        variables = dis.init(jax.random.PRNGKey(0), x)
        (pred, eps), _ = dis.apply(variables, x, train=True, mutable=["batch_stats"])
        assert pred.shape == (2, 1)
        # conv1 has no batch norm (reference normalizer_fn_ = None for i==0).
        assert "conv1_bn" not in variables["batch_stats"]
        assert "conv2_bn" in variables["batch_stats"]

    def test_train_smoke_with_gan_loss(self):
        from twingan_tpu.train.losses import GanLossConfig, discriminator_gan_loss, generator_gan_loss

        gen, dis = DCGANGenerator(depth=8, final_size=8), DCGANDiscriminator(depth=8)
        z = jnp.asarray(np.random.RandomState(0).randn(4, 16).astype(np.float32))
        real = jnp.asarray(np.random.RandomState(1).rand(4, 8, 8, 3).astype(np.float32))
        gv = gen.init(jax.random.PRNGKey(0), z)
        dv = dis.init(jax.random.PRNGKey(1), real)
        cfg = GanLossConfig(architecture="gan")

        def g_loss(params):
            fake, _ = gen.apply({**gv, "params": params}, z)
            pred, _ = dis.apply(dv, fake)
            return generator_gan_loss(cfg, pred)

        g = jax.grad(g_loss)(gv["params"])
        assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


class TestCycleGAN:
    def test_generator_preserves_shape(self):
        gen = CycleGANGenerator(num_filters=8, num_resnet_blocks=2)
        x = jnp.ones((2, 32, 32, 3))
        variables = gen.init(jax.random.PRNGKey(0), x)
        out, eps = gen.apply(variables, x)
        assert out.shape == (2, 32, 32, 3)
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-5  # tanh range (slope 0)
        assert "resnet_block_1" in eps

    def test_nonsquare_input(self):
        gen = CycleGANGenerator(num_filters=8, num_resnet_blocks=1)
        x = jnp.ones((1, 32, 64, 3))
        variables = gen.init(jax.random.PRNGKey(0), x)
        out, _ = gen.apply(variables, x)
        assert out.shape == (1, 32, 64, 3)

    @pytest.mark.parametrize("method", ["conv2d_transpose", "nn_upsample_conv", "bilinear_upsample_conv"])
    def test_upsample_methods(self, method):
        gen = CycleGANGenerator(num_filters=8, num_resnet_blocks=1, upsample_method=method)
        x = jnp.ones((1, 16, 16, 3))
        variables = gen.init(jax.random.PRNGKey(0), x)
        out, _ = gen.apply(variables, x)
        assert out.shape == (1, 16, 16, 3)

    def test_discriminator(self):
        dis = CycleGANDiscriminator(num_filters=8, num_resnet_blocks=2)
        x = jnp.ones((3, 32, 32, 3))
        variables = dis.init(jax.random.PRNGKey(0), x)
        pred, _ = dis.apply(variables, x)
        assert pred.shape == (3, 1)

    def test_tanh_linear_slope(self):
        gen = CycleGANGenerator(num_filters=8, num_resnet_blocks=1, tanh_linear_slope=0.5)
        x = jnp.ones((1, 16, 16, 3)) * 10
        variables = gen.init(jax.random.PRNGKey(0), x)
        out, eps = gen.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(out),
            np.tanh(np.asarray(eps["logits"])) + 0.5 * np.asarray(eps["logits"]),
            rtol=1e-5,
        )
