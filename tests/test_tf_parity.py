"""Op-level cross-goldens against TensorFlow.

The BASELINE fidelity gate (reference pretrained demo outputs) is blocked on
offline pretrained weights; these tests are the best available proxy
(VERDICT round 1 item 5): every op the TF checkpoint importer relies on is
asserted numerically equal to the TF op the reference built it from, on
random inputs, to fp32 tolerance.

Reference op anchors:
- batch norm moments/normalize: /root/reference/libs/batch_norm.py:396-470
- slim conv2d SAME + bias: /root/reference/libs/sn.py:171-260
- leaky relu: /root/reference/util_misc.py:68-86
- color distortion: /root/reference/preprocessing/danbooru_preprocessing.py:61-112
- YIQ transform: /root/reference/preprocessing/preprocessing_util.py:148-169
- bilinear resize: /root/reference/nets/pggan_utils.py:267-278 (tf.image.resize_bilinear)
- safe one-hot: /root/reference/util_misc.py:89-101
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from twingan_tpu import ops


def _rand(*shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * (hi - lo) + lo).astype(np.float32)


class TestNormParity:
    def test_batch_norm_matches_tf(self):
        x = _rand(4, 6, 6, 8, seed=1, lo=-2, hi=3)
        mean, var = ops.moments(jnp.asarray(x), (0, 1, 2))
        gamma = _rand(8, seed=2, lo=0.5, hi=1.5)
        beta = _rand(8, seed=3, lo=-0.5, hi=0.5)
        ours = ops.normalize(jnp.asarray(x), mean, var, jnp.asarray(gamma), jnp.asarray(beta), eps=1e-3)

        tf_mean, tf_var = tf.nn.moments(tf.constant(x), axes=[0, 1, 2])
        theirs = tf.nn.batch_normalization(tf.constant(x), tf_mean, tf_var, beta, gamma, 1e-3)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean), tf_mean.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), tf_var.numpy(), rtol=1e-4, atol=1e-5)

    def test_instance_norm_matches_tf(self):
        x = _rand(3, 5, 5, 4, seed=4, lo=-1, hi=1)
        from twingan_tpu.ops.norms import instance_moments
        mean, var = instance_moments(jnp.asarray(x))
        ours = ops.normalize(jnp.asarray(x), mean, var, None, None, eps=1e-6)
        tf_mean, tf_var = tf.nn.moments(tf.constant(x), axes=[1, 2], keepdims=True)
        theirs = (tf.constant(x) - tf_mean) * tf.math.rsqrt(tf_var + 1e-6)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


class TestConvParity:
    def test_conv_bias_matches_tf(self):
        """Our EqConv (equalized off) == tf.nn.conv2d SAME + bias_add with
        the identical HWIO kernel — the layout contract import_tf relies on."""
        from twingan_tpu.models.layers import EqConv

        x = _rand(2, 8, 8, 3, seed=5, lo=-1, hi=1)
        conv = EqConv(features=6, kernel_size=3)
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        kernel = np.asarray(variables["params"]["kernel"])
        bias = _rand(6, seed=6, lo=-0.2, hi=0.2)
        variables = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}}
        ours = conv.apply(variables, jnp.asarray(x))
        theirs = tf.nn.bias_add(
            tf.nn.conv2d(tf.constant(x), kernel, strides=1, padding="SAME"), bias
        )
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)

    def test_leaky_relu_matches_tf(self):
        x = _rand(64, seed=7, lo=-3, hi=3)
        np.testing.assert_allclose(
            np.asarray(ops.leaky_relu(jnp.asarray(x), 0.2)),
            tf.nn.leaky_relu(tf.constant(x), alpha=0.2).numpy(),
            rtol=1e-6,
        )

    def test_avg_pool_matches_tf(self):
        x = _rand(2, 8, 8, 4, seed=8)
        np.testing.assert_allclose(
            np.asarray(ops.avg_pool_2x(jnp.asarray(x))),
            tf.nn.avg_pool2d(tf.constant(x), 2, 2, "VALID").numpy(),
            rtol=1e-5, atol=1e-6,
        )

    def test_local_response_norm_matches_tf(self):
        # The reference cifarnet's exact lrn parameters (nets/cifarnet.py:68).
        x = _rand(2, 8, 8, 64, seed=11, lo=-2, hi=2)
        np.testing.assert_allclose(
            np.asarray(ops.local_response_norm(
                jnp.asarray(x), 4, bias=1.0, alpha=0.001 / 9.0, beta=0.75)),
            tf.nn.local_response_normalization(
                tf.constant(x), 4, bias=1.0, alpha=0.001 / 9.0, beta=0.75).numpy(),
            rtol=1e-5, atol=1e-6,
        )

    def test_resize_bilinear_matches_tf(self):
        x = _rand(2, 7, 7, 3, seed=9)
        ours = ops.resize_bilinear(jnp.asarray(x), 16, 16)
        theirs = tf.image.resize(tf.constant(x), (16, 16), method="bilinear")
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


class TestColorParity:
    def setup_method(self):
        self.x = _rand(2, 6, 6, 3, seed=10)

    def test_hsv_roundtrip_matches_tf(self):
        from twingan_tpu.data.preprocess import _hsv_to_rgb, _rgb_to_hsv

        hsv = _rgb_to_hsv(jnp.asarray(self.x))
        tf_hsv = tf.image.rgb_to_hsv(tf.constant(self.x))
        np.testing.assert_allclose(np.asarray(hsv), tf_hsv.numpy(), rtol=1e-4, atol=1e-5)
        back = _hsv_to_rgb(hsv)
        np.testing.assert_allclose(np.asarray(back), self.x, rtol=1e-4, atol=1e-5)

    def test_adjust_saturation_matches_tf(self):
        from twingan_tpu.data.preprocess import adjust_saturation

        for f in (0.5, 1.0, 1.4):
            ours = adjust_saturation(jnp.asarray(self.x), f)
            theirs = tf.image.adjust_saturation(tf.constant(self.x), f)
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-3
            )

    def test_adjust_hue_matches_tf(self):
        from twingan_tpu.data.preprocess import adjust_hue

        for d in (-0.15, 0.1):
            ours = adjust_hue(jnp.asarray(self.x), d)
            theirs = tf.image.adjust_hue(tf.constant(self.x), d)
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-3
            )

    def test_adjust_contrast_matches_tf(self):
        from twingan_tpu.data.preprocess import adjust_contrast

        ours = adjust_contrast(jnp.asarray(self.x), 1.3)
        theirs = tf.image.adjust_contrast(tf.constant(self.x), 1.3)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)

    def test_adjust_brightness_matches_tf(self):
        from twingan_tpu.data.preprocess import adjust_brightness

        ours = adjust_brightness(jnp.asarray(self.x), 0.1)
        theirs = tf.image.adjust_brightness(tf.constant(self.x), 0.1)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)

    def test_yiq_matches_tf(self):
        from twingan_tpu.data.preprocess import rgb_to_yiq

        ours = rgb_to_yiq(jnp.asarray(self.x))
        theirs = tf.image.rgb_to_yiq(tf.constant(self.x))
        # The reference's YIQ matrix (preprocessing_util.py:148-169) uses the
        # classic 3-decimal NTSC constants; TF uses higher-precision ones —
        # agreement is to ~6e-4 absolute by construction.
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-2, atol=1e-3)


class TestMiscParity:
    def test_safe_one_hot_matches_reference_semantics(self):
        """util_misc.py:89-101: out-of-range labels one-hot to all-zeros via
        the zero-row-concat + reduce_max trick."""
        from twingan_tpu.utils.misc import safe_one_hot_encoding

        labels = np.asarray([0, 3, 7, -1, 4], np.int64)  # 7 and -1 out of range
        ours = np.asarray(safe_one_hot_encoding(jnp.asarray(labels), 5))
        hot = tf.one_hot(labels, 5, on_value=tf.constant(1, tf.int64),
                         off_value=tf.constant(0, tf.int64))
        # Replicates the reference trick exactly (per-row here since the
        # reference reduces a single example's tag list).
        np.testing.assert_array_equal(ours, hot.numpy().astype(np.float32))

    def test_msssim_close_to_tf(self):
        """Protocol check vs tf.image.ssim_multiscale (same Wang weights,
        11/1.5 gaussian). Downsampling differs slightly (reference 2x2 box
        'reflect' conv vs TF avg_pool), so tolerance is loose."""
        rng = np.random.RandomState(11)
        base = rng.rand(1, 96, 96, 3).astype(np.float32)
        # Smooth the noise so SSIM is in a sensitive range.
        from scipy.ndimage import gaussian_filter

        a = gaussian_filter(base, (0, 2, 2, 0)).astype(np.float32) * 255
        b = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 10, 0, 255)
        ours = float(ops.msssim(jnp.asarray(a), jnp.asarray(b), max_val=255.0, levels=3))
        theirs = float(tf.reduce_mean(tf.image.ssim_multiscale(
            tf.constant(a), tf.constant(b), 255.0,
            power_factors=(0.0448, 0.2856, 0.3001),
        )))
        assert abs(ours - theirs) < 0.03, (ours, theirs)


class TestImporterStrictness:
    def test_unmapped_in_scope_raises_strict(self, tmp_path):
        """A model variable under a mapped network scope that the name map
        cannot place must fail a strict import instead of silently staying
        fresh-initialized (ADVICE round 1)."""
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
        from twingan_tpu.train.optimizers import OptimizerConfig

        import tensorflow.compat.v1 as tf1

        with tf1.Graph().as_default():
            v = tf1.get_variable("generator/mystery_scope/weights", shape=(2, 2))
            saver = tf1.train.Saver(var_list={"generator/mystery_scope/weights": v})
            with tf1.Session() as sess:
                sess.run(tf1.global_variables_initializer())
                path = saver.save(sess, str(tmp_path / "m") + "/model.ckpt")

        trainer = GanTrainer(GanTrainerConfig(
            model=PGGANConfig(resolution=8, max_channels=16),
            batch_size=2, opt=OptimizerConfig(learning_rate=1e-3),
        ))
        state = trainer.init_state(jax.random.PRNGKey(0))
        _, report = import_tf_checkpoint(path, state)
        assert report["unmapped_in_scope"] == ["generator/mystery_scope/weights"]
        with pytest.raises(ValueError):
            import_tf_checkpoint(path, state, strict=True)

    def test_spectral_u_reshape_roundtrip(self, tmp_path):
        """TF keeps u as [1, out] (libs/sn.py:56); it must land in our [out]
        spectral slot."""
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.train.gan_trainer import GanTrainer, GanTrainerConfig
        from twingan_tpu.train.optimizers import OptimizerConfig

        trainer = GanTrainer(GanTrainerConfig(
            model=PGGANConfig(resolution=8, max_channels=16, spectral_norm=True),
            batch_size=2, opt=OptimizerConfig(learning_rate=1e-3),
        ))
        state = trainer.init_state(jax.random.PRNGKey(0))
        spect = state.model_state["discriminator"]["spectral"]
        out_dim = np.shape(spect["block_8_conv0"]["conv"]["u"])[0]
        marker = np.linspace(0.1, 0.9, out_dim).astype(np.float32)[None, :]

        import tensorflow.compat.v1 as tf1

        name = "discriminator/block_8x8x16/Conv/u"
        with tf1.Graph().as_default():
            v = tf1.get_variable(name, initializer=tf1.constant(marker))
            saver = tf1.train.Saver(var_list={name: v})
            with tf1.Session() as sess:
                sess.run(tf1.global_variables_initializer())
                path = saver.save(sess, str(tmp_path / "u") + "/model.ckpt")

        new_state, report = import_tf_checkpoint(path, state)
        assert report["mapped"] == [name]
        np.testing.assert_allclose(
            np.asarray(new_state.model_state["discriminator"]["spectral"]
                       ["block_8_conv0"]["conv"]["u"]),
            marker[0],
        )


class TestFtrlParity:
    """Our FTRL-Proximal vs TF's (reference optimizer factory uses
    tf.train.FtrlOptimizer, model_inheritor.py:543-549; tf.keras Ftrl with
    beta=0 and no l2-shrinkage implements the same ApplyFtrl kernel)."""

    def _trajectories(self, l1, l2, power=-0.5, steps=6):
        import optax
        from twingan_tpu.train.optimizers import ftrl

        lr, init_acc = 0.05, 0.1
        w0 = _rand(7, seed=11, lo=-1, hi=1)
        grads = [_rand(7, seed=20 + i, lo=-1, hi=1) for i in range(steps)]

        tx = ftrl(lr, learning_rate_power=power,
                  initial_accumulator_value=init_acc, l1=l1, l2=l2)
        params = {"w": jnp.asarray(w0)}
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            params = optax.apply_updates(params, upd)

        var = tf.Variable(w0)
        opt = tf.keras.optimizers.Ftrl(
            learning_rate=lr, learning_rate_power=power,
            initial_accumulator_value=init_acc,
            l1_regularization_strength=l1, l2_regularization_strength=l2,
        )
        for g in grads:
            opt.apply_gradients([(tf.constant(g), var)])
        return np.asarray(params["w"]), var.numpy()

    def test_plain(self):
        ours, theirs = self._trajectories(l1=0.0, l2=0.0)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_l1_l2(self):
        ours, theirs = self._trajectories(l1=0.02, l2=0.05)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_other_power(self):
        ours, theirs = self._trajectories(l1=0.01, l2=0.0, power=-0.7)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _save_tf1_ckpt(tmp_path, arrays, sub="stage"):
    """Write a TF1 checkpoint holding the given {var_name: np.ndarray}."""
    import tensorflow.compat.v1 as tf1

    with tf1.Graph().as_default():
        var_list = {}
        for name, val in arrays.items():
            var_list[name] = tf1.get_variable(
                name, initializer=tf1.constant(val.astype(np.float32)))
        saver = tf1.train.Saver(var_list=var_list)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, str(tmp_path / sub) + "/model.ckpt")


class TestStageGoldens:
    """Whole-stage cross-goldens against the reference architecture built
    from TF2 primitives (VERDICT round-2 item 4): one complete generator
    growing stage (eq-lr conv -> leaky -> pixel-norm, nn-upsample, to_rgb
    fade blend; /root/reference/nets/pggan.py:93-211) and one encoder
    growing stage (from_rgb blocks, two-layer block, avg-pool, interp blend;
    :382-479), with identical weights loaded through infer.import_tf —
    the deepest fidelity proxy available without the pretrained checkpoint.
    """

    ALPHA = 0.3

    # -- TF2 building blocks following reference pggan_utils exactly ------ #
    @staticmethod
    def _leaky(x):
        return tf.maximum(0.2 * x, x)  # util_misc.fp16_friendly_leaky_relu

    @staticmethod
    def _pn(x):
        # pggan_utils._pixel_norm (eps 1e-6)
        return x / tf.sqrt(
            tf.reduce_mean(tf.square(x), axis=3, keepdims=True) + 1e-6)

    @staticmethod
    def _eqconv(x, w, b, k, padding="SAME"):
        # maybe_equalized_conv2d: input scaled by sqrt(2/(in_ch k^2)),
        # then conv + bias (slim conv2d, normalizer None).
        inv_c = np.sqrt(2.0 / (int(x.shape[-1]) * k * k)).astype(np.float32)
        y = tf.nn.conv2d(x * inv_c, w, strides=1, padding=padding)
        return y + b

    @staticmethod
    def _up2(x):
        # pggan_utils.resize_twice_as_big (nearest neighbor)
        h = int(x.shape[1])
        return tf.image.resize(x, (2 * h, 2 * h), method="nearest")

    def _rand_weights(self, spec, seed):
        rng = np.random.RandomState(seed)
        return {name: rng.randn(*shape).astype(np.float32) * 0.5
                for name, shape in spec.items()}

    def test_generator_growing_stage_matches_reference_arch(self, tmp_path):
        """Noise path: [B,1,1,C] -> pad 7x7 -> k4 VALID; stage 8 with
        fade-in blend of the upsampled previous to_rgb."""
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.models.pggan import Generator

        C = 16
        spec = {
            "generator/block_4x4x16/Conv/weights": (4, 4, C, C),
            "generator/block_4x4x16/Conv/biases": (C,),
            "generator/block_4x4x16/Conv_1/weights": (3, 3, C, C),
            "generator/block_4x4x16/Conv_1/biases": (C,),
            "generator/generator_to_rgb_4x4/Conv/weights": (1, 1, C, 3),
            "generator/generator_to_rgb_4x4/Conv/biases": (3,),
            "generator/block_8x8x16/Conv/weights": (3, 3, C, C),
            "generator/block_8x8x16/Conv/biases": (C,),
            "generator/block_8x8x16/Conv_1/weights": (3, 3, C, C),
            "generator/block_8x8x16/Conv_1/biases": (C,),
            "generator/generator_to_rgb_8x8/Conv/weights": (1, 1, C, 3),
            "generator/generator_to_rgb_8x8/Conv/biases": (3,),
        }
        W = self._rand_weights(spec, seed=3)
        path = _save_tf1_ckpt(tmp_path, W, "gen")
        noise = np.random.RandomState(0).randn(2, 1, 1, C).astype(np.float32)

        # Reference generator, stage by stage (nets/pggan.py:144-206).
        g = lambda n: W[f"generator/{n}/weights"]
        b = lambda n: W[f"generator/{n}/biases"]
        src = tf.pad(tf.constant(noise), [(0, 0), (3, 3), (3, 3), (0, 0)])
        net = self._pn(self._leaky(self._eqconv(
            src, g("block_4x4x16/Conv"), b("block_4x4x16/Conv"), 4, "VALID")))
        net = self._pn(self._leaky(self._eqconv(
            net, g("block_4x4x16/Conv_1"), b("block_4x4x16/Conv_1"), 3)))
        prev = self._up2(self._eqconv(
            net, g("generator_to_rgb_4x4/Conv"), b("generator_to_rgb_4x4/Conv"), 1))
        up = self._up2(net)
        y = self._pn(self._leaky(self._eqconv(
            up, g("block_8x8x16/Conv"), b("block_8x8x16/Conv"), 3)))
        y = self._pn(self._leaky(self._eqconv(
            y, g("block_8x8x16/Conv_1"), b("block_8x8x16/Conv_1"), 3)))
        rgb = self._eqconv(
            y, g("generator_to_rgb_8x8/Conv"), b("generator_to_rgb_8x8/Conv"), 1)
        ref = (rgb * self.ALPHA + (1 - self.ALPHA) * prev).numpy()

        cfg = PGGANConfig(
            resolution=8, is_growing=True, max_channels=C,
            norm_type="none", equalized_lr=True, do_pixel_norm=True,
        )  # noise_dim derives to channels(1) = C at max_channels=16
        gen = Generator(cfg)
        variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(noise))
        import flax
        state = {"params": {"generator": flax.core.unfreeze(variables["params"])},
                 "model_state": {"generator": {}}}
        imported, report = import_tf_checkpoint(path, state)
        assert len(report["mapped"]) == len(spec), report
        assert not report["missing_target"] and not report["shape_mismatch"], report
        out, _ = gen.apply(
            {"params": imported["params"]["generator"]},
            jnp.asarray(noise), alpha=self.ALPHA)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_generator_code_path_4x4_matches_reference_arch(self, tmp_path):
        """Translation path: a [B,4,4,C] encoding enters via k3 SAME
        (nets/pggan.py:157-162), stabilized stage (no growing)."""
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.models.pggan import Generator

        C = 16
        spec = {
            "generator/block_4x4x16/Conv/weights": (3, 3, C, C),
            "generator/block_4x4x16/Conv/biases": (C,),
            "generator/block_4x4x16/Conv_1/weights": (3, 3, C, C),
            "generator/block_4x4x16/Conv_1/biases": (C,),
            "generator/generator_to_rgb_4x4/Conv/weights": (1, 1, C, 3),
            "generator/generator_to_rgb_4x4/Conv/biases": (3,),
        }
        W = self._rand_weights(spec, seed=4)
        path = _save_tf1_ckpt(tmp_path, W, "gen44")
        code = np.random.RandomState(1).randn(2, 4, 4, C).astype(np.float32)

        g = lambda n: W[f"generator/{n}/weights"]
        b = lambda n: W[f"generator/{n}/biases"]
        net = self._pn(self._leaky(self._eqconv(
            tf.constant(code), g("block_4x4x16/Conv"), b("block_4x4x16/Conv"), 3)))
        net = self._pn(self._leaky(self._eqconv(
            net, g("block_4x4x16/Conv_1"), b("block_4x4x16/Conv_1"), 3)))
        ref = self._eqconv(
            net, g("generator_to_rgb_4x4/Conv"), b("generator_to_rgb_4x4/Conv"), 1
        ).numpy()

        cfg = PGGANConfig(
            resolution=4, max_channels=C,
            norm_type="none", equalized_lr=True, do_pixel_norm=True,
        )
        gen = Generator(cfg)
        variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(code))
        import flax
        state = {"params": {"generator": flax.core.unfreeze(variables["params"])},
                 "model_state": {"generator": {}}}
        imported, report = import_tf_checkpoint(path, state)
        assert len(report["mapped"]) == len(spec), report
        assert not report["missing_target"] and not report["shape_mismatch"], report
        out, _ = gen.apply(
            {"params": imported["params"]["generator"]}, jnp.asarray(code))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_encoder_growing_stage_matches_reference_arch(self, tmp_path):
        """Encoder growing stage at 8px: avg-pooled from_rgb branch, full-res
        from_rgb, two-layer block, avg-pool, interp blend
        (nets/pggan.py:420-470)."""
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.models.pggan import Encoder

        C = 16
        spec = {
            "encoder_content/from_rgb_4x4/Conv/weights": (1, 1, 3, C),
            "encoder_content/from_rgb_4x4/Conv/biases": (C,),
            "encoder_content/from_rgb_8x8/Conv/weights": (1, 1, 3, C),
            "encoder_content/from_rgb_8x8/Conv/biases": (C,),
            "encoder_content/encoder_block_8x8x16/Conv/weights": (3, 3, C, C),
            "encoder_content/encoder_block_8x8x16/Conv/biases": (C,),
            "encoder_content/encoder_block_8x8x16/Conv_1/weights": (3, 3, C, C),
            "encoder_content/encoder_block_8x8x16/Conv_1/biases": (C,),
        }
        W = self._rand_weights(spec, seed=5)
        path = _save_tf1_ckpt(tmp_path, W, "enc")
        img = np.random.RandomState(2).rand(2, 8, 8, 3).astype(np.float32)

        g = lambda n: W[f"encoder_content/{n}/weights"]
        b = lambda n: W[f"encoder_content/{n}/biases"]
        x = tf.constant(img)
        shrunk = tf.nn.avg_pool2d(x, 2, 2, "VALID")
        shrunk = self._pn(self._leaky(self._eqconv(
            shrunk, g("from_rgb_4x4/Conv"), b("from_rgb_4x4/Conv"), 1)))
        net = self._pn(self._leaky(self._eqconv(
            x, g("from_rgb_8x8/Conv"), b("from_rgb_8x8/Conv"), 1)))
        net = self._pn(self._leaky(self._eqconv(
            net, g("encoder_block_8x8x16/Conv"), b("encoder_block_8x8x16/Conv"), 3)))
        net = self._pn(self._leaky(self._eqconv(
            net, g("encoder_block_8x8x16/Conv_1"), b("encoder_block_8x8x16/Conv_1"), 3)))
        net = tf.nn.avg_pool2d(net, 2, 2, "VALID")
        ref = (net * self.ALPHA + (1 - self.ALPHA) * shrunk).numpy()

        cfg = PGGANConfig(
            resolution=8, is_growing=True, max_channels=C,
            norm_type="none", equalized_lr=True, do_pixel_norm=True,
        )
        enc = Encoder(cfg)
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(img))
        import flax
        state = {"params": {"encoder_content": flax.core.unfreeze(variables["params"])},
                 "model_state": {"encoder_content": {}}}
        imported, report = import_tf_checkpoint(path, state)
        assert len(report["mapped"]) == len(spec), report
        assert not report["missing_target"] and not report["shape_mismatch"], report
        out, _ = enc.apply(
            {"params": imported["params"]["encoder_content"]},
            jnp.asarray(img), alpha=self.ALPHA)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


class TestFullCheckpointRoundTrip:
    """VERDICT round-2 item 4b: importer round-trip over a FULL 256px
    TwinGAN checkpoint with every feature on — self-attention, resblocks,
    conditional (style) norms, batch renorm, spectral norm, UNet. Every
    leaf of every reference-scoped network must export to a TF1 name,
    map back to itself, and survive a strict import value-exactly."""

    def _full_state(self):
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.train.optimizers import OptimizerConfig
        from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

        cfg = TwinGANConfig(
            model=PGGANConfig(
                resolution=256, max_channels=32, num_domains=2,
                norm_type="batch_renorm", do_self_attention=True,
                self_attention_hw=64, use_res_block=True,
                spectral_norm=True, style_dim=8,
            ),
            use_style_embedding=True, style_embed_size=8, use_unet=True,
            batch_size=2, opt=OptimizerConfig(learning_rate=1e-3),
        )
        trainer = TwinGANTrainer(cfg)
        return trainer.init_state(jax.random.PRNGKey(0))

    def test_roundtrip_256px_all_features(self, tmp_path):
        from twingan_tpu.infer.import_tf import (
            export_var_names, import_tf_checkpoint, map_var_name,
        )
        import flax.serialization

        state = self._full_state()
        names = export_var_names(state)
        assert len(names) > 400, len(names)

        # 1. Inverse consistency: every exported name maps back to its leaf.
        for tf_name, (net, path, collection) in names.items():
            assert map_var_name(tf_name) == (net, path, collection), tf_name

        # 2. Completeness: every leaf of every reference-scoped net covered.
        sd = flax.serialization.to_state_dict(state)
        covered = {(net, path) for net, path, _ in names.values()}
        missing = []
        for net in ("encoder_content", "encoder_style", "generator",
                    "discriminator_s", "discriminator_t"):
            def walk(d, p=()):
                for k, v in d.items():
                    if isinstance(v, dict):
                        walk(v, p + (k,))
                    elif (net, p + (k,)) not in covered:
                        missing.append((net, p + (k,)))
            walk(sd["params"][net])
            for coll, tree in sd["model_state"].get(net, {}).items():
                walk(tree)
        assert not missing, missing[:20]

        # 3. Value-exact strict import of a full checkpoint.
        rng = np.random.RandomState(0)
        arrays = {}
        for tf_name, (net, path, collection) in names.items():
            root = sd["params" if collection is None else "model_state"][net]
            if collection is not None:
                root = root[collection]
            leaf = root
            for k in path:
                leaf = leaf[k]
            shape = np.shape(leaf)
            val = np.asarray(rng.rand(*shape) + 0.25, np.float32)
            if tf_name.endswith("/u"):
                val = val.reshape(1, -1)  # TF keeps u as [1, out]
            arrays[tf_name] = val
        path_ckpt = _save_tf1_ckpt(tmp_path, arrays, "full256")
        new_state, report = import_tf_checkpoint(path_ckpt, state, strict=True)
        assert len(report["mapped"]) == len(names)

        new_sd = flax.serialization.to_state_dict(new_state)
        for tf_name, (net, path, collection) in names.items():
            root = new_sd["params" if collection is None else "model_state"][net]
            if collection is not None:
                root = root[collection]
            leaf = root
            for k in path:
                leaf = leaf[k]
            np.testing.assert_array_equal(
                np.asarray(leaf).reshape(-1), arrays[tf_name].reshape(-1),
                err_msg=tf_name)


class TestEndToEndTwinGANImport:
    """VERDICT round-4 item 4: exercise infer.import_tf against a REAL
    tf.compat.v1 variable_scope graph, end to end. A tiny full TwinGAN
    (shared encoder + generator, per-domain instance-norm banks selected by
    the '_s'/'_t' var_scope_postfix, UNet skip, eq-lr, pixel norm) is built
    from raw TF1 primitives with slim's auto-numbered Conv/Conv_1 scopes
    (reference nets/pggan.py:382-479 encoder, :93-211 generator;
    libs/instance_norm.py:65-127 postfixed norm params), checkpointed with
    random weights via tf.train.Saver, imported, and our translate()
    (= custom_generated_t_style_source, twingan.py:300-365) must match the
    TF graph's forward numerically with an empty remap report."""

    C = 16  # max_channels -> every stage's width at this size

    # -- slim-like TF1 builders (graph mode) ---------------------------- #
    def _conv(self, tf1, x, ch, k=3, padding="SAME", postfix="",
              norm=True, act=True):
        """slim conv2d under an auto-uniquified 'Conv' scope: eq-lr input
        scaling (pggan_utils.py:236-254), no biases when a normalizer runs,
        InstanceNorm sub-scope with BOTH domain postfixes' params created
        (the reference creates them across its reuse passes) and the
        pass's postfix selected."""
        with tf1.variable_scope(None, default_name="Conv"):
            in_ch = int(x.shape[-1])
            w = tf1.get_variable(
                "weights", [k, k, in_ch, ch],
                initializer=tf1.random_normal_initializer(stddev=0.5, seed=None))
            scale = np.sqrt(2.0 / (in_ch * k * k)).astype(np.float32)
            y = tf1.nn.conv2d(x * scale, w, strides=[1, 1, 1, 1],
                              padding=padding)
            if norm:
                with tf1.variable_scope("InstanceNorm"):
                    params = {}
                    for pf in ("_s", "_t"):
                        params["beta" + pf] = tf1.get_variable(
                            "beta" + pf, [ch],
                            initializer=tf1.random_normal_initializer(
                                stddev=0.2, seed=None))
                        params["gamma" + pf] = tf1.get_variable(
                            "gamma" + pf, [ch],
                            initializer=tf1.random_normal_initializer(
                                mean=1.0, stddev=0.2, seed=None))
                    mean, var = tf1.nn.moments(y, axes=[1, 2], keep_dims=True)
                    y = (y - mean) * tf1.math.rsqrt(var + 1e-6)
                    y = y * params["gamma" + postfix] + params["beta" + postfix]
            else:
                b = tf1.get_variable("biases", [ch],
                                     initializer=tf1.zeros_initializer())
                y = y + b
            if act:
                y = tf1.maximum(0.2 * y, y)  # fp16_friendly_leaky_relu
            return y

    @staticmethod
    def _pn(tf1, x):
        return x / tf1.sqrt(
            tf1.reduce_mean(tf1.square(x), axis=3, keepdims=True) + 1e-6)

    def test_full_twingan_translate_matches_tf_graph(self, tmp_path):
        import tensorflow.compat.v1 as tf1
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.models.config import PGGANConfig
        from twingan_tpu.train.optimizers import OptimizerConfig
        from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer

        C = self.C
        images = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)

        graph = tf1.Graph()
        with graph.as_default():
            src = tf1.constant(images)
            # Encoder pass, source domain ('_s'): from_rgb 8 -> block 8
            # -> avg pool -> 4x4 code (nets/pggan.py:403-479).
            with tf1.variable_scope("encoder_content"):
                with tf1.variable_scope("from_rgb_8x8"):
                    net = self._pn(tf1, self._conv(
                        tf1, src, C, k=1, postfix="_s"))
                with tf1.variable_scope(f"encoder_block_8x8x{C}"):
                    net = self._pn(tf1, self._conv(tf1, net, C, postfix="_s"))
                    net = self._pn(tf1, self._conv(tf1, net, C, postfix="_s"))
                skip_8 = net
                code = tf1.nn.avg_pool(net, [1, 2, 2, 1], [1, 2, 2, 1],
                                       "VALID")
            # Generator pass, target domain ('_t'): 4x4 code path, UNet
            # concat at 8, to_rgb with norm but no activation
            # (nets/pggan.py:144-211, generator_three_layer_block :69-83).
            with tf1.variable_scope("generator"):
                with tf1.variable_scope(f"block_4x4x{C}"):
                    net = self._pn(tf1, self._conv(tf1, code, C, postfix="_t"))
                    net = self._pn(tf1, self._conv(tf1, net, C, postfix="_t"))
                up = tf1.image.resize(net, (8, 8), method="nearest")
                up = tf1.concat([up, skip_8], axis=-1)
                with tf1.variable_scope(f"block_8x8x{C}"):
                    net = self._pn(tf1, self._conv(tf1, up, C, postfix="_t"))
                    net = self._pn(tf1, self._conv(tf1, net, C, postfix="_t"))
                with tf1.variable_scope("generator_to_rgb_8x8"):
                    out = self._conv(tf1, net, 3, k=1, postfix="_t",
                                     act=False)
            saver = tf1.train.Saver()
            with tf1.Session(graph=graph) as sess:
                sess.run(tf1.global_variables_initializer())
                ref_out = sess.run(out)
                ckpt = saver.save(sess, str(tmp_path / "e2e") + "/model.ckpt")

        cfg = TwinGANConfig(
            model=PGGANConfig(
                resolution=8, max_channels=C, num_domains=2,
                norm_type="instance_norm", equalized_lr=True,
                do_pixel_norm=True, dtype="float32",
            ),
            use_unet=True, batch_size=2,
            opt=OptimizerConfig(learning_rate=1e-3),
        )
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, report = import_tf_checkpoint(ckpt, state, strict=True)
        assert not report["unmapped_in_scope"], report["unmapped_in_scope"]
        assert not report["missing_target"], report["missing_target"]
        assert not report["shape_mismatch"], report["shape_mismatch"]
        # 8 conv layers (from_rgb, 2x enc block, 2x gen block_4, 2x gen
        # block_8, to_rgb), each 1 kernel + 4 domain-norm params.
        assert len(report["mapped"]) == 8 * 5, len(report["mapped"])

        ours = trainer.translate(state, jnp.asarray(images), "s2t")
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), ref_out, rtol=2e-4, atol=2e-4)
