"""Golden-value unit tests for the ops library.

Where the reference has a closed form (pixel norm, minibatch stddev, gdrop
statistics, renorm corrections, spectral norm vs SVD, SSIM vs scipy), we
assert against independently computed values, not against the module itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu import ops


class TestBasic:
    def test_leaky_relu(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(ops.leaky_relu(x), [-0.2, 0.0, 2.0], atol=1e-7)

    def test_pixel_norm_unit_scale(self):
        x = np.random.RandomState(0).randn(2, 4, 4, 8).astype(np.float32)
        y = np.asarray(ops.pixel_norm(jnp.asarray(x)))
        expected = x / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(y, expected, rtol=1e-5)

    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = ops.upsample_nearest_2x(x)
        assert y.shape == (1, 4, 4, 1)
        np.testing.assert_array_equal(
            np.asarray(y[0, :, :, 0]),
            [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
        )

    def test_avg_pool_inverts_upsample(self):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ops.avg_pool_2x(ops.upsample_nearest_2x(x))), np.asarray(x), rtol=1e-6
        )

    def test_minibatch_stddev_constant_batch_is_zero(self):
        x = jnp.ones((4, 4, 4, 8), jnp.float32)
        y = ops.minibatch_stddev(x)
        assert y.shape == (4, 4, 4, 9)
        np.testing.assert_allclose(np.asarray(y[..., -1]), np.sqrt(1e-8), atol=1e-6)

    def test_minibatch_stddev_value(self):
        rng = np.random.RandomState(2)
        x = rng.randn(8, 4, 4, 3).astype(np.float32)
        y = np.asarray(ops.minibatch_stddev(jnp.asarray(x)))
        expected = np.mean(np.sqrt(np.var(x, axis=0) + 1e-8))
        np.testing.assert_allclose(y[..., -1], expected, rtol=1e-5)
        np.testing.assert_allclose(y[..., :3], x, rtol=1e-6)

    def test_gdrop_statistics(self):
        # E[gdrop(x)] = x, Var[gdrop(x)/x] = (strength*sqrt(C))^2.
        key = jax.random.PRNGKey(0)
        c, strength = 16, 0.3
        x = jnp.ones((4096, 1, 1, c), jnp.float32)
        y = np.asarray(ops.gdrop(key, x, strength))
        ratio = y.reshape(-1)
        np.testing.assert_allclose(ratio.mean(), 1.0, atol=0.02)
        np.testing.assert_allclose(ratio.std(), strength * np.sqrt(c), rtol=0.05)

    def test_gdrop_broadcast_pattern(self):
        # Noise must be constant over H, W but vary over batch and channel.
        key = jax.random.PRNGKey(1)
        x = jnp.ones((2, 4, 4, 3), jnp.float32)
        y = np.asarray(ops.gdrop(key, x, 1.0))
        assert np.allclose(y, y[:, :1, :1, :])  # constant over hw
        assert not np.allclose(y[0], y[1])  # varies over batch
        assert not np.allclose(y[..., 0], y[..., 1])  # varies over channel

    def test_blend(self):
        new, old = jnp.full((2,), 2.0), jnp.zeros((2,))
        np.testing.assert_allclose(np.asarray(ops.blend(new, old, 0.25)), 0.5)

    def test_num_channels_schedule(self):
        # Reference: min(1024/2**stage, max) -- pggan_utils.py:369-372.
        assert [ops.num_channels(s, 256) for s in range(7)] == [256, 256, 256, 128, 64, 32, 16]
        assert ops.num_channels(0, 1024) == 1024

    def test_equalized_lr_scale(self):
        assert ops.equalized_lr_scale(8, 3) == pytest.approx(np.sqrt(2.0 / (8 * 9)))


class TestNorms:
    def test_moments(self):
        x = np.random.RandomState(0).randn(4, 8, 8, 3).astype(np.float32)
        m, v = ops.moments(jnp.asarray(x), (0, 1, 2))
        np.testing.assert_allclose(np.asarray(m), x.mean((0, 1, 2)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), x.var((0, 1, 2)), atol=1e-5)

    def test_normalize_whitens(self):
        x = np.random.RandomState(1).randn(16, 8, 8, 3).astype(np.float32) * 5 + 2
        xj = jnp.asarray(x)
        m, v = ops.moments(xj, (0, 1, 2))
        y = np.asarray(ops.normalize(xj, m, v, None, None, eps=1e-6))
        np.testing.assert_allclose(y.mean((0, 1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(y.std((0, 1, 2)), 1.0, atol=1e-3)

    def test_renorm_schedule(self):
        for step, exp_rmax in [(0, 1.1), (10000, 1.1), (10001, 1.5), (25000, 2.0), (40000, 4.0)]:
            clip = ops.renorm_clipping_schedule(jnp.asarray(step))
            assert float(clip["rmax"]) == pytest.approx(exp_rmax), step

    def test_renorm_correction_first_step(self):
        # With zero-initialized state, mixed moments equal the batch moments,
        # so r=1, d=0 (before clipping even matters).
        c = 4
        state = {
            "renorm_mean": jnp.zeros((c,)),
            "renorm_mean_weight": jnp.zeros(()),
            "renorm_stddev": jnp.zeros((c,)),
            "renorm_stddev_weight": jnp.zeros(()),
        }
        mean = jnp.asarray(np.random.RandomState(0).randn(c).astype(np.float32))
        var = jnp.asarray(np.abs(np.random.RandomState(1).randn(c)).astype(np.float32))
        clip = {"rmax": 4.0, "rmin": 0.25, "dmax": 1.0}
        r, d, new_state = ops.batch_renorm_correction(mean, var, state, clip)
        np.testing.assert_allclose(np.asarray(r), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)
        # Debiased state reproduces the batch moments after one update.
        from twingan_tpu.ops import norms

        m2, v2 = norms.renorm_moving_moments(new_state)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(mean), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(var), rtol=1e-3, atol=1e-5)

    def test_synced_moments_match_global(self):
        # pmean-synced per-device moments == global moments.
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devs = jax.devices()
        mesh = Mesh(np.asarray(devs), ("data",))
        x = np.random.RandomState(3).randn(16, 4, 4, 3).astype(np.float32)

        def f(xs):
            m, v = ops.moments(xs, (0, 1, 2), axis_name="data")
            return m, v

        m, v = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=(P(), P()))
        )(x)
        np.testing.assert_allclose(np.asarray(m), x.mean((0, 1, 2)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), x.var((0, 1, 2)), atol=1e-5)


class TestSpectralNorm:
    def test_sigma_converges_to_largest_singular_value(self):
        rng = np.random.RandomState(0)
        w = rng.randn(64, 32).astype(np.float32)
        u = rng.randn(32).astype(np.float32)
        u = u / np.linalg.norm(u)
        w_sn, u_new = ops.spectral_normalize(jnp.asarray(w), jnp.asarray(u), num_iters=200)
        sv = np.linalg.svd(w, compute_uv=False)[0]
        np.testing.assert_allclose(np.linalg.svd(np.asarray(w_sn), compute_uv=False)[0], 1.0, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(w_sn), w / sv, rtol=1e-2)

    def test_conv_kernel_rank4(self):
        rng = np.random.RandomState(1)
        w = rng.randn(3, 3, 8, 16).astype(np.float32)
        u = rng.randn(16).astype(np.float32)
        w_sn, _ = ops.spectral_normalize(jnp.asarray(w), jnp.asarray(u), num_iters=30)
        sv = np.linalg.svd(w.reshape(-1, 16), compute_uv=False)[0]
        np.testing.assert_allclose(np.asarray(w_sn), w / sv, rtol=1e-2)

    def test_gradient_flows_through_sigma(self):
        """d(W/sigma)/dW must carry the -(v'Wu)·W/sigma^2 term (Miyato SN;
        reference libs/sn.py:86-89), not treat sigma as a constant. With
        converged u/v, d sigma = u_i v_j (Danskin), so the analytic gradient
        of sum(W/sigma) is 1/sigma - (sum(W)/sigma^2)·(v u^T) — check against
        finite differences of the full normalize-and-sum function."""
        rng = np.random.RandomState(3)
        w = rng.randn(12, 6).astype(np.float32)
        u0 = rng.randn(6)
        u0 = (u0 / np.linalg.norm(u0)).astype(np.float32)

        def loss(w):
            w_sn, _ = ops.spectral_normalize(
                jnp.asarray(w), jnp.asarray(u0), num_iters=100
            )
            return jnp.sum(w_sn)

        g = np.asarray(jax.grad(loss)(jnp.asarray(w)))
        U, S, Vt = np.linalg.svd(w.astype(np.float64))
        sigma = S[0]
        # Our convention: w_mat is [in, out]; v ~ U[:, 0], u ~ Vt[0]; the
        # outer product v u^T is invariant to the joint SVD sign flip.
        expected = 1.0 / sigma - (w.sum() / sigma**2) * np.outer(U[:, 0], Vt[0])
        np.testing.assert_allclose(g, expected, rtol=1e-3, atol=1e-4)
        # And it must differ from the constant-sigma gradient 1/sigma.
        assert not np.allclose(g, 1.0 / sigma, atol=1e-4)

    def test_no_update_keeps_u(self):
        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.randn(4, 4).astype(np.float32))
        u = jnp.asarray(rng.randn(4).astype(np.float32))
        _, u_out = ops.spectral_normalize(w, u, update=False)
        np.testing.assert_array_equal(np.asarray(u_out), np.asarray(u))


class TestAttention:
    def test_matches_naive_softmax(self):
        rng = np.random.RandomState(0)
        b, n, cb, c = 2, 16, 4, 8
        f = rng.randn(b, n, cb).astype(np.float32)
        g = rng.randn(b, n, cb).astype(np.float32)
        h = rng.randn(b, n, c).astype(np.float32)
        out = np.asarray(ops.attention.attention_core(*map(jnp.asarray, (f, g, h))))
        for bi in range(b):
            s = f[bi] @ g[bi].T
            beta = np.exp(s - s.max(-1, keepdims=True))
            beta /= beta.sum(-1, keepdims=True)
            np.testing.assert_allclose(out[bi], beta @ h[bi], rtol=1e-4, atol=1e-5)

    def test_flash_matches_einsum(self):
        rng = np.random.RandomState(1)
        b, n, cb, c = 2, 512, 8, 16
        f, g = rng.randn(b, n, cb).astype(np.float32), rng.randn(b, n, cb).astype(np.float32)
        h = rng.randn(b, n, c).astype(np.float32)
        ref = ops.attention.attention_core(*map(jnp.asarray, (f, g, h)))
        flash = ops.attention.flash_attention_core(
            jnp.asarray(f), jnp.asarray(g), jnp.asarray(h), 128, 128
        )
        np.testing.assert_allclose(np.asarray(flash), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_flash_gradients_match(self):
        rng = np.random.RandomState(2)
        b, n, cb, c = 1, 256, 4, 8
        f, g = rng.randn(b, n, cb).astype(np.float32), rng.randn(b, n, cb).astype(np.float32)
        h = rng.randn(b, n, c).astype(np.float32)

        def loss_einsum(f, g, h):
            return jnp.sum(ops.attention.attention_core(f, g, h) ** 2)

        def loss_flash(f, g, h):
            return jnp.sum(ops.attention.flash_attention_core(f, g, h, 128, 128) ** 2)

        ge = jax.grad(loss_einsum, argnums=(0, 1, 2))(*map(jnp.asarray, (f, g, h)))
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(*map(jnp.asarray, (f, g, h)))
        for a, b_ in zip(ge, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


class TestMsSsim:
    def _scipy_ssim(self, img1, img2):
        # Independent reference using scipy fftconvolve (same algorithm the
        # reference vendored from tensorflow/models).
        from scipy import signal

        size, sigma = 11, 1.5
        radius = size // 2
        x, y = np.mgrid[-radius : radius + 1, -radius : radius + 1]
        w = np.exp(-((x**2 + y**2) / (2.0 * sigma**2)))
        w /= w.sum()
        window = w.reshape(1, size, size, 1)
        mu1 = signal.fftconvolve(img1, window, mode="valid")
        mu2 = signal.fftconvolve(img2, window, mode="valid")
        s11 = signal.fftconvolve(img1 * img1, window, mode="valid") - mu1 * mu1
        s22 = signal.fftconvolve(img2 * img2, window, mode="valid") - mu2 * mu2
        s12 = signal.fftconvolve(img1 * img2, window, mode="valid") - mu1 * mu2
        c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        v1, v2 = 2 * s12 + c2, s11 + s22 + c2
        ssim = np.mean(((2 * mu1 * mu2 + c1) * v1) / ((mu1**2 + mu2**2 + c1) * v2), axis=(1, 2, 3))
        cs = np.mean(v1 / v2, axis=(1, 2, 3))
        return ssim, cs

    def test_ssim_identical_images(self):
        img = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32) * 255
        s, _ = ops.ssim(jnp.asarray(img), jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(s), 1.0, rtol=1e-5)

    def test_ssim_matches_scipy(self):
        rng = np.random.RandomState(1)
        img1 = rng.rand(2, 32, 32, 3).astype(np.float32) * 255
        img2 = np.clip(img1 + rng.randn(2, 32, 32, 3) * 20, 0, 255).astype(np.float32)
        s, cs = ops.ssim(jnp.asarray(img1), jnp.asarray(img2))
        s_ref, cs_ref = self._scipy_ssim(img1, img2)
        np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(cs), cs_ref, rtol=1e-4)

    def test_msssim_identical_is_one(self):
        img = np.random.RandomState(2).rand(2, 176, 176, 3).astype(np.float32) * 255
        score = ops.msssim(jnp.asarray(img), jnp.asarray(img))
        np.testing.assert_allclose(float(score), 1.0, rtol=1e-4)

    def test_msssim_noise_lowers_score(self):
        rng = np.random.RandomState(3)
        img1 = rng.rand(2, 176, 176, 3).astype(np.float32) * 255
        img2 = np.clip(img1 + rng.randn(*img1.shape) * 40, 0, 255).astype(np.float32)
        assert float(ops.msssim(jnp.asarray(img1), jnp.asarray(img2))) < 0.95
        unrelated = rng.rand(*img1.shape).astype(np.float32) * 255
        assert float(ops.msssim(jnp.asarray(img1), jnp.asarray(unrelated))) < 0.5


class TestSwd:
    def test_identical_sets_near_zero_fake_distance(self):
        rng = np.random.RandomState(0)
        imgs = rng.rand(16, 32, 32, 3).astype(np.float32)
        key = jax.random.PRNGKey(0)
        scores = np.asarray(
            ops.sliced_wasserstein_distance(key, jnp.asarray(imgs), jnp.asarray(imgs))
        )
        assert scores.shape == (2, 2)  # 32 -> [32, 16] levels
        # real-vs-fake on identical sets should be on par with the real-real
        # baseline (sampling noise only).
        assert (scores[:, 1] <= scores[:, 0] * 3 + 1e-3).all()

    def test_distribution_shift_increases_distance(self):
        rng = np.random.RandomState(1)
        real = rng.rand(16, 32, 32, 3).astype(np.float32)
        fake = rng.rand(16, 32, 32, 3).astype(np.float32) * 0.2 + 0.8
        key = jax.random.PRNGKey(1)
        same = np.asarray(ops.sliced_wasserstein_distance(key, jnp.asarray(real), jnp.asarray(real)))
        diff = np.asarray(ops.sliced_wasserstein_distance(key, jnp.asarray(real), jnp.asarray(fake)))
        assert diff[:, 1].mean() > same[:, 1].mean() * 1.5


class TestShardedAttention:
    def test_matches_full_attention(self):
        from twingan_tpu.parallel import create_mesh

        rng = np.random.RandomState(0)
        b, n, cb, c = 2, 64, 4, 8  # n divisible by 8 devices
        f = jnp.asarray(rng.randn(b, n, cb).astype(np.float32))
        g = jnp.asarray(rng.randn(b, n, cb).astype(np.float32))
        h = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        mesh = create_mesh(axis="seq")
        out = ops.attention.sharded_attention_core(f, g, h, mesh, axis="seq")
        ref = ops.attention.attention_core(f, g, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_gradients_match(self):
        from twingan_tpu.parallel import create_mesh

        rng = np.random.RandomState(1)
        b, n, cb, c = 1, 32, 4, 8
        f = jnp.asarray(rng.randn(b, n, cb).astype(np.float32))
        g = jnp.asarray(rng.randn(b, n, cb).astype(np.float32))
        h = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
        mesh = create_mesh(axis="seq")

        ref_grads = jax.grad(lambda *a: jnp.sum(ops.attention.attention_core(*a) ** 2),
                             argnums=(0, 1, 2))(f, g, h)
        sh_grads = jax.grad(
            lambda *a: jnp.sum(ops.attention.sharded_attention_core(*a, mesh, axis="seq") ** 2),
            argnums=(0, 1, 2),
        )(f, g, h)
        for a, b_ in zip(ref_grads, sh_grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5)


def test_swd_chunked_matches_one_jit_protocol():
    """The protocol-scale chunked SWD (ops/swd.py) must agree with the
    one-jit reference path within sampling noise: same pyramid, patch and
    normalization math, independent random patch draws (reference protocol
    image_generation.py:867-941 at swd_num_images=8192 forces chunking)."""
    from twingan_tpu.ops.swd import (
        sliced_wasserstein_distance, sliced_wasserstein_distance_chunked,
    )

    rng = np.random.RandomState(0)
    real = rng.rand(64, 32, 32, 3).astype(np.float32)
    fake = np.clip(real + rng.rand(64, 32, 32, 3) * 0.3, 0, 1).astype(np.float32)
    key = jax.random.PRNGKey(0)
    full = np.asarray(sliced_wasserstein_distance(key, jnp.asarray(real), jnp.asarray(fake)))
    chunked = sliced_wasserstein_distance_chunked(key, real, fake, chunk=16)
    assert full.shape == chunked.shape == (2, 2)
    # Same metric, different patch sampling: agree to ~15% relative.
    np.testing.assert_allclose(chunked, full, rtol=0.15)
