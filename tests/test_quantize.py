"""W8A8 int8 inference path (ops/quant.py + EqConv quantize modes).

No reference counterpart (the reference serves fp32 frozen graphs,
/root/reference/inference/image_translation_infer.py) — this is the
TPU-serving quantization feature; tests pin the numerics contract:
calibrated int8 convs track the fp path within tight relative error, and
the calib pass itself is bit-identical to the fp path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.models.layers import EqConv
from twingan_tpu.models.pggan import Encoder, Generator
from twingan_tpu.ops import quant as quant_ops


def _conv(q, scale_mode=None, **kw):
    kw.setdefault("features", 24)
    kw.setdefault("equalized_lr", True)
    kw.setdefault("dtype", jnp.float32)
    return EqConv(scale_mode=scale_mode, quantize=q, **kw)


@pytest.fixture(scope="module")
def data():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 16, 16, 32).astype(np.float32))
    aux = jnp.asarray(r.randn(2, 32, 32, 8).astype(np.float32))
    return x, aux


class TestQuantOps:
    def test_weight_quant_roundtrip(self):
        w = jnp.asarray(np.random.RandomState(1).randn(3, 3, 8, 16), jnp.float32)
        wq, s = quant_ops.weight_quant(w)
        assert wq.dtype == jnp.int8 and s.shape == (16,)
        err = jnp.max(jnp.abs(wq.astype(jnp.float32) * s - w))
        # Round-to-nearest: at most half a quantization step per channel.
        assert float(err) <= float(jnp.max(s)) * 0.5 + 1e-6

    def test_conv_i8_matches_fp_conv_exactly(self):
        # int8 x int8 -> int32 is exact integer arithmetic.
        r = np.random.RandomState(2)
        xq = jnp.asarray(r.randint(-127, 128, (1, 8, 8, 4)), jnp.int8)
        wq = jnp.asarray(r.randint(-127, 128, (3, 3, 4, 6)), jnp.int8)
        got = quant_ops.conv_i8(xq, wq)
        want = jax.lax.conv_general_dilated(
            xq.astype(jnp.float32), wq.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want, np.int64))


class TestEqConvQuantize:
    @pytest.mark.parametrize("scale_mode", [None, "up"])
    def test_int8_close_to_fp(self, data, scale_mode):
        x, aux = data
        a = aux if scale_mode == "up" else None
        v = _conv("calib", scale_mode).init(jax.random.PRNGKey(0), x, a)
        y_fp = _conv("", scale_mode).apply({"params": v["params"]}, x, a)
        _, upd = _conv("calib", scale_mode).apply(v, x, a, mutable=["quant"])
        y_q = _conv("int8", scale_mode).apply(
            {"params": v["params"], "quant": upd["quant"]}, x, a)
        rel = float(jnp.mean(jnp.abs(y_q - y_fp)) / jnp.mean(jnp.abs(y_fp)))
        assert rel < 0.03, rel

    def test_calib_forward_is_exact_fp(self, data):
        x, _ = data
        v = _conv("calib").init(jax.random.PRNGKey(0), x)
        y_fp = _conv("").apply({"params": v["params"]}, x)
        y_cal, upd = _conv("calib").apply(v, x, mutable=["quant"])
        np.testing.assert_array_equal(np.asarray(y_cal), np.asarray(y_fp))
        amax = np.asarray(jax.tree_util.tree_leaves(upd["quant"])[0])
        assert amax[0] == pytest.approx(float(jnp.max(jnp.abs(x))))

    def test_calib_is_running_max_over_batches(self, data):
        x, _ = data
        v = _conv("calib").init(jax.random.PRNGKey(0), x)
        _, u1 = _conv("calib").apply(v, 0.5 * x, mutable=["quant"])
        _, u2 = _conv("calib").apply(
            {"params": v["params"], **u1}, x, mutable=["quant"])
        _, u3 = _conv("calib").apply(
            {"params": v["params"], **u2}, 0.25 * x, mutable=["quant"])
        amax = float(jax.tree_util.tree_leaves(u3["quant"])[0][0])
        assert amax == pytest.approx(float(jnp.max(jnp.abs(x))))

    def test_immutable_calib_does_not_require_quant_mutation(self, data):
        # Reading path (e.g. inside jit eval) must not try to write.
        x, _ = data
        v = _conv("calib").init(jax.random.PRNGKey(0), x)
        y = _conv("calib").apply(v, x)  # no mutable: falls through, no error
        assert y.shape == (2, 16, 16, 24)


class TestModelQuantize:
    def test_translate_end_to_end(self):
        def cfgq(q):
            return PGGANConfig(
                resolution=32, max_channels=64, norm_type="batch_norm",
                equalized_lr=True, do_pixel_norm=True, num_domains=2,
                dtype="float32", quantized_inference=q)

        x = jnp.asarray(
            np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
        enc_c, gen_c = Encoder(cfgq("calib")), Generator(cfgq("calib"))
        ev = enc_c.init(jax.random.PRNGKey(0), x, domain=0)
        code, skips = enc_c.apply(ev, x, domain=0)
        gv = gen_c.init(jax.random.PRNGKey(1), code, domain=1, unet_skips=skips)

        evf = {k: v for k, v in ev.items() if k != "quant"}
        gvf = {k: v for k, v in gv.items() if k != "quant"}
        code_f, skips_f = Encoder(cfgq("")).apply(evf, x, domain=0)
        out_f, _ = Generator(cfgq("")).apply(
            gvf, code_f, domain=1, unet_skips=skips_f)

        (code_c, skips_c), eu = enc_c.apply(ev, x, domain=0, mutable=["quant"])
        _, gu = gen_c.apply(gv, code_c, domain=1, unet_skips=skips_c,
                            mutable=["quant"])
        code_q, skips_q = Encoder(cfgq("int8")).apply(
            {**evf, "quant": eu["quant"]}, x, domain=0)
        out_q, _ = Generator(cfgq("int8")).apply(
            {**gvf, "quant": gu["quant"]}, code_q, domain=1,
            unet_skips=skips_q)
        rel = float(jnp.mean(jnp.abs(out_q - out_f))
                    / (jnp.max(out_f) - jnp.min(out_f)))
        assert rel < 0.02, rel

    def test_default_config_has_no_quant_collection(self):
        cfg = PGGANConfig(resolution=8, max_channels=32, num_domains=1)
        x = jnp.zeros((1, 8, 8, 3), jnp.float32)
        v = Encoder(cfg).init(jax.random.PRNGKey(0), x, domain=0)
        assert "quant" not in v

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError):
            PGGANConfig(resolution=8, quantized_inference="fp4")


class TestQuantizedInferer:
    def test_inferer_self_calibrates_and_serves_int8(self, tmp_path):
        """ImageInferer(quantize=True): first batch calibrates, output
        stays close to the fp inferer (the serving wiring end-to-end)."""
        from twingan_tpu.infer.translate import ImageInferer
        from twingan_tpu.runner.checkpoint import (
            CheckpointManager, save_config_snapshot,
        )
        from twingan_tpu.train.optimizers import OptimizerConfig
        from twingan_tpu.train.twingan_trainer import (
            TwinGANConfig, TwinGANTrainer,
        )

        stage_dir = str(tmp_path / "8")
        cfg = TwinGANConfig(
            model=PGGANConfig(resolution=8, max_channels=16, num_domains=2),
            batch_size=4, opt=OptimizerConfig(learning_rate=1e-3))
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = {
            "source": jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32)),
            "target": jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32)),
        }
        state, _ = trainer.g_step(state, batch, jax.random.PRNGKey(1))
        save_config_snapshot(stage_dir, {"run": {}, "trainer": cfg})
        CheckpointManager(stage_dir).save(int(state.step), state)

        imgs = [(rng.rand(8, 8, 3) * 255).astype(np.uint8) for _ in range(2)]
        out_fp = ImageInferer(stage_dir).infer_batch(imgs)
        q = ImageInferer(stage_dir, quantize=True)
        out_q8 = q.infer_batch(imgs)
        assert not q._quant_pending  # calibrated on the first batch
        assert q.trainer.cfg.model.quantized_inference == "int8"
        l1 = float(np.mean(np.abs(out_q8 - out_fp)))
        assert l1 < 0.05, l1
        # Second batch reuses the calibrated scales (no re-calibration).
        out_q8b = q.infer_batch(imgs)
        np.testing.assert_allclose(out_q8b, out_q8, atol=1e-6)
