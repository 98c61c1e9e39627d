"""Exact-equivalence tests for the fused nearest-up2+conv3x3 path.

ops/fused_scale.py rewrites conv3x3(nearest_up2(x)) — the reference
generator's per-stage upsample+conv (/root/reference/nets/pggan.py:69-83)
— as one input-dilated conv ('dilated') or a parity-collapsed conv
('parity'). Values and gradients must match the unfused definition, and
the full Generator must produce the same output from the SAME parameters
with fused_scale on or off (checkpoint compatibility is structural: the
kernel tensor is unchanged).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.pggan import Encoder, Generator
from twingan_tpu.ops import fused_scale


@pytest.mark.parametrize("impl", ["dilated", "parity"])
@pytest.mark.parametrize("shape", [(2, 4, 4, 3, 8), (1, 8, 6, 5, 4), (2, 1, 1, 2, 2)])
def test_up2_conv_matches_reference(impl, shape):
    b, h, w, ci, co = shape
    rng = np.random.RandomState(hash((impl, shape)) % 2**31)
    x = jnp.asarray(rng.randn(b, h, w, ci), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
    ref = fused_scale.up2_conv(x, k, "reference")
    got = fused_scale.up2_conv(x, k, impl)
    assert got.shape == (b, 2 * h, 2 * w, co) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("impl", ["dilated", "parity"])
def test_up2_conv_gradients_match(impl):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    t = jnp.asarray(rng.randn(2, 16, 16, 6), jnp.float32)

    def loss(which):
        return lambda x, k: jnp.mean((fused_scale.up2_conv(x, k, which) - t) ** 2)

    gx_ref, gk_ref = jax.grad(loss("reference"), (0, 1))(x, k)
    gx, gk = jax.grad(loss(impl), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-5)


def test_up2_conv_kernel_is_box_convolved():
    k = jnp.asarray(np.random.RandomState(0).randn(3, 3, 2, 2), jnp.float32)
    v = fused_scale.up2_conv_kernel(k)
    assert v.shape == (4, 4, 2, 2)
    # V = W (*) ones(2,2): corner V[0,0] = W[0,0]; center V[1,1] sums the
    # four shifted copies that overlap there.
    np.testing.assert_allclose(np.asarray(v[0, 0]), np.asarray(k[0, 0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v[1, 1]),
        np.asarray(k[0, 0] + k[0, 1] + k[1, 0] + k[1, 1]),
        atol=1e-6,
    )


def _gen_cfg(impl, **kw):
    base = dict(
        resolution=16,
        max_channels=16,
        norm_type="instance_norm",
        equalized_lr=True,
        do_pixel_norm=True,
        num_domains=2,
        dtype="float32",
    )
    base.update(kw)
    return PGGANConfig(fused_scale=True, fused_scale_impl=impl, **base), PGGANConfig(**base)


@pytest.mark.parametrize("impl", ["dilated", "parity"])
@pytest.mark.parametrize("growing", [False, True])
def test_generator_same_params_same_output(impl, growing):
    fused_cfg, plain_cfg = _gen_cfg(impl, is_growing=growing)
    noise = jnp.asarray(np.random.RandomState(1).randn(2, 1, 1, 32), jnp.float32)
    variables = Generator(plain_cfg).init(
        jax.random.PRNGKey(0), noise, alpha=0.5, domain=1
    )
    out_plain, _ = Generator(plain_cfg).apply(variables, noise, alpha=0.5, domain=1)
    out_fused, _ = Generator(fused_cfg).apply(variables, noise, alpha=0.5, domain=1)
    assert out_fused.shape == out_plain.shape
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), rtol=1e-4, atol=1e-5
    )


def test_generator_fused_with_unet_and_cond_image():
    fused_cfg, plain_cfg = _gen_cfg("dilated")
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    cond = jnp.asarray(rng.rand(2, 16, 16, 1), jnp.float32)
    enc_vars = Encoder(plain_cfg).init(jax.random.PRNGKey(0), images, domain=0)
    code, skips = Encoder(plain_cfg).apply(enc_vars, images, domain=0)
    gen_vars = Generator(plain_cfg).init(
        jax.random.PRNGKey(1), code, domain=1, unet_skips=skips, cond_image=cond
    )
    out_plain, _ = Generator(plain_cfg).apply(
        gen_vars, code, domain=1, unet_skips=skips, cond_image=cond
    )
    out_fused, _ = Generator(fused_cfg).apply(
        gen_vars, code, domain=1, unet_skips=skips, cond_image=cond
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), rtol=1e-4, atol=1e-5
    )


def test_fused_init_param_tree_matches_plain():
    """fused_scale must not change the checkpoint layout: init under the
    fused config produces the identical param pytree (names AND shapes)."""
    fused_cfg, plain_cfg = _gen_cfg("parity")
    noise = jnp.zeros((1, 1, 1, 32), jnp.float32)
    p_plain = Generator(plain_cfg).init(jax.random.PRNGKey(0), noise)["params"]
    p_fused = Generator(fused_cfg).init(jax.random.PRNGKey(0), noise)["params"]
    flat_plain = jax.tree_util.tree_map(jnp.shape, p_plain)
    flat_fused = jax.tree_util.tree_map(jnp.shape, p_fused)
    assert flat_plain == flat_fused


def test_bad_impl_rejected():
    with pytest.raises(ValueError):
        fused_scale.up2_conv(jnp.zeros((1, 4, 4, 2)), jnp.zeros((3, 3, 2, 2)), "nope")
    with pytest.raises(ValueError):
        PGGANConfig(fused_scale_impl="nope")
