"""Inference CLI + export + eval subsystem tests."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

import jax
import jax.numpy as jnp

from twingan_tpu.models.config import PGGANConfig
from twingan_tpu.runner.checkpoint import CheckpointManager, save_config_snapshot
from twingan_tpu.train.optimizers import OptimizerConfig
from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer


@pytest.fixture(scope="module")
def trained_stage(tmp_path_factory):
    """A minimal trained TwinGAN stage dir (config.json + checkpoint)."""
    tmp = tmp_path_factory.mktemp("stage")
    stage_dir = str(tmp / "8")
    cfg = TwinGANConfig(
        model=PGGANConfig(resolution=8, max_channels=16, num_domains=2),
        batch_size=4,
        opt=OptimizerConfig(learning_rate=1e-3),
    )
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
    return stage_dir


class TestEvalCLIModes:
    def test_eval_modes_run_end_to_end(self, trained_stage, tmp_path):
        """run_eval CLI smoke over real TFRecords: msssim / fid /
        inception_score / eval_debug all produce their artifacts."""
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.evals import run_eval

        rng = np.random.RandomState(0)
        dirs = {}
        for dom in ("a", "b"):
            d = tmp_path / dom
            d.mkdir()
            for i in range(8):
                PILImage.fromarray(
                    (rng.rand(8, 8, 3) * 255).astype(np.uint8)
                ).save(d / f"{i}.png")
            rec = str(tmp_path / f"rec_{dom}")
            convert_image_folder(str(d), rec, num_shards=1)
            dirs[dom] = rec

        eval_dir = str(tmp_path / "eval")
        base = [
            f"--model_path={trained_stage}",
            f"--dataset_dir={dirs['a']}", f"--target_dataset_dir={dirs['b']}",
            f"--eval_dir={eval_dir}", "--num_images=8", "--batch_size=4",
        ]
        run_eval.main(["--mode=fid", *base])
        assert os.path.exists(os.path.join(eval_dir, "fid.txt"))
        run_eval.main(["--mode=inception_score", *base])
        is_line = open(os.path.join(eval_dir, "inception_score.txt")).read()
        assert float(is_line.split("\t")[1]) >= 1.0
        run_eval.main(["--mode=msssim", *base])  # 8px -> documented skip path
        run_eval.main(["--mode=eval_debug", *base])
        assert os.path.exists(os.path.join(eval_dir, "eval_debug", "index.html"))
        # swd at 8px is the documented skip path, but --swd_save_images must
        # still dump the generated sample set (reference swd_save_images,
        # image_generation.py:879-881).
        run_eval.main(["--mode=swd", "--swd_num_images=8",
                       "--swd_save_images", *base])
        dbg = os.path.join(eval_dir, "swd_debug")
        assert os.path.isdir(dbg) and os.listdir(dbg)


class TestConfigIO:
    def test_roundtrip(self, trained_stage):
        from twingan_tpu.runner.config_io import load_stage_config

        _, tcfg = load_stage_config(trained_stage)
        assert isinstance(tcfg, TwinGANConfig)
        assert tcfg.model.resolution == 8
        assert tcfg.model.num_domains == 2

    def test_find_latest_stage(self, trained_stage, tmp_path):
        from twingan_tpu.runner.config_io import find_latest_stage_dir

        train_dir = os.path.dirname(trained_stage)
        assert find_latest_stage_dir(train_dir) == trained_stage


class TestImageInferer:
    def test_infer_contract(self, trained_stage, tmp_path):
        from twingan_tpu.infer.translate import ImageInferer

        src = tmp_path / "face.png"
        rng = np.random.RandomState(0)
        PILImage.fromarray((rng.rand(40, 30, 3) * 255).astype(np.uint8)).save(src)
        inferer = ImageInferer(trained_stage)
        out = inferer.infer(str(src), str(tmp_path / "out.png"), return_image=True)
        assert out.shape == (8, 8, 3)
        assert os.path.exists(tmp_path / "out.png")
        saved = np.asarray(PILImage.open(tmp_path / "out.png"))
        assert saved.shape == (8, 8, 3)

    def test_cli_folder_mode(self, trained_stage, tmp_path):
        from twingan_tpu.infer.translate import main

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        rng = np.random.RandomState(1)
        for i in range(3):
            PILImage.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
                in_dir / f"{i}.png"
            )
        out_dir = tmp_path / "out"
        main(
            [
                f"--model_path={trained_stage}",
                f"--input_image_path={in_dir}",
                f"--output_image_path={out_dir}",
                "--batch_size=2",
            ]
        )
        assert sorted(os.listdir(out_dir)) == ["0.png", "1.png", "2.png"]

    def test_both_directions_differ(self, trained_stage, tmp_path):
        from twingan_tpu.infer.translate import ImageInferer

        img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
        a = ImageInferer(trained_stage, direction="s2t").infer_batch([img])
        b = ImageInferer(trained_stage, direction="t2s").infer_batch([img])
        assert not np.allclose(a, b)


class TestExport:
    def test_jax_export_roundtrip(self, trained_stage, tmp_path):
        from twingan_tpu.infer.export import export_jax, load_jax
        from twingan_tpu.infer.translate import ImageInferer

        inferer = ImageInferer(trained_stage)
        path = export_jax(inferer, str(tmp_path / "export"), batch_size=2)
        fn = load_jax(path)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
        got = np.asarray(fn(x))
        want = np.asarray(
            inferer.trainer.translate(inferer.state, x, "s2t").astype(jnp.float32)
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestEvalMetrics:
    def test_swd_eval_protocol(self, tmp_path):
        from twingan_tpu.evals.metrics import swd_eval

        rng = np.random.RandomState(0)
        real = [rng.rand(8, 32, 32, 3).astype(np.float32) for _ in range(2)]
        fake = [rng.rand(8, 32, 32, 3).astype(np.float32) for _ in range(2)]
        path = str(tmp_path / "swd.txt")
        table = swd_eval(jax.random.PRNGKey(0), real, fake, num_images=16, save_path=path, step=1)
        assert set(table) == {32, 16}
        text = open(path).read()
        assert "res\treal\tfake" in text and "Average" in text

    def test_swd_skips_small(self):
        from twingan_tpu.evals.metrics import swd_eval

        out = swd_eval(
            jax.random.PRNGKey(0),
            [np.zeros((4, 8, 8, 3), np.float32)],
            [np.zeros((4, 8, 8, 3), np.float32)],
            num_images=4,
        )
        assert out is None

    def test_msssim_eval(self):
        from twingan_tpu.evals.metrics import msssim_eval

        rng = np.random.RandomState(0)
        batches = [rng.rand(4, 176, 176, 3).astype(np.float32)]
        score = msssim_eval(batches)
        assert 0.0 <= score <= 1.0

    def test_inception_score_uniform_vs_confident(self):
        from twingan_tpu.evals.metrics import inception_score

        rng = np.random.RandomState(0)
        batches = [rng.rand(32, 4, 4, 3).astype(np.float32)]
        # Uniform classifier -> score 1; confident diverse classifier -> > 1.
        uniform, _ = inception_score(lambda x: jnp.zeros((x.shape[0], 10)), batches, splits=2)
        assert uniform == pytest.approx(1.0, abs=1e-3)

        def confident(x):
            idx = np.arange(x.shape[0]) % 10
            return jnp.asarray(np.eye(10, dtype=np.float32)[idx] * 50)

        conf, _ = inception_score(confident, batches, splits=2)
        assert conf > 5.0

    def test_frechet_distance_identity_and_shift(self):
        from twingan_tpu.evals.metrics import frechet_distance

        rng = np.random.RandomState(0)
        mu = rng.rand(8)
        sigma = np.eye(8) * 0.5
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
        # Pure mean shift: distance = |dmu|^2.
        d = frechet_distance(mu, sigma, mu + 2.0, sigma)
        assert d == pytest.approx(4.0 * 8, rel=1e-5)

    def test_fid_separates_distributions(self):
        """FID(real, real') << FID(real, shifted) with any feature fn —
        here a fixed random linear feature map for speed."""
        from twingan_tpu.evals.metrics import fid

        rng = np.random.RandomState(1)
        w = rng.randn(48, 16).astype(np.float32)
        feats = lambda x: jnp.asarray(x.reshape(x.shape[0], -1) @ w)
        real_a = [rng.rand(64, 4, 4, 3).astype(np.float32) for _ in range(2)]
        real_b = [rng.rand(64, 4, 4, 3).astype(np.float32) for _ in range(2)]
        shifted = [b * 0.3 + 0.6 for b in real_b]
        close = fid(feats, real_a, real_b)
        far = fid(feats, real_a, shifted)
        assert far > 5 * close, (close, far)

    def test_inception_fid_smoke(self):
        """The InceptionV3 pooled-feature path runs end to end and separates
        identical from disjoint image sets."""
        from twingan_tpu.evals.metrics import fid, inception_pool_features_fn

        feats = inception_pool_features_fn(image_hw=64, seed=0)
        rng = np.random.RandomState(2)
        a = [rng.rand(8, 64, 64, 3).astype(np.float32)]
        b = [rng.rand(8, 64, 64, 3).astype(np.float32)]
        shifted = [b[0] * 0.3 + 0.6]  # a genuinely different distribution
        close = fid(feats, a, b)
        far = fid(feats, a, shifted)
        assert np.isfinite(close) and np.isfinite(far)
        assert far > 3 * close, (close, far)

    def test_streaming_loss_eval(self):
        from twingan_tpu.evals.metrics import streaming_loss_eval

        batches = [{"x": np.full((2,), float(i))} for i in range(4)]
        out = streaming_loss_eval(lambda b: {"mean_x": jnp.mean(b["x"])}, batches)
        assert out["mean_x"] == pytest.approx(1.5)


class TestGallery:
    def test_html_gallery(self, tmp_path):
        from twingan_tpu.evals.gallery import write_html_gallery

        rng = np.random.RandomState(0)
        items = {
            "sources": rng.rand(3, 8, 8, 3).astype(np.float32),
            "prediction": rng.rand(3, 1).astype(np.float32),
        }
        path = write_html_gallery(str(tmp_path / "g"), items)
        text = open(path).read()
        assert "<table" in text and "sources_0.jpg" in text
        assert os.path.exists(tmp_path / "g" / "sources_2.jpg")

    def test_embeddings_csv(self, tmp_path):
        import csv as csvmod

        from twingan_tpu.evals.gallery import write_embeddings_csv

        rng = np.random.RandomState(0)
        path = write_embeddings_csv(
            str(tmp_path / "e.csv"),
            ["a.png", "b.png"],
            rng.rand(2, 4, 4, 2).astype(np.float32),
            images=rng.rand(2, 8, 8, 3).astype(np.float32),
            append=False,
        )
        rows = list(csvmod.reader(open(path)))
        assert len(rows) == 2
        assert rows[0][0] == "a.png"
        assert len(rows[0]) == 1 + 32 + 1  # name + flattened embedding + base64


class TestTFImportMapping:
    def test_name_mapping(self):
        from twingan_tpu.infer.import_tf import map_var_name

        cases = {
            "encoder_content/from_rgb_256x256/Conv/weights":
                ("encoder_content", ("from_rgb_256_conv", "conv", "kernel"), None),
            "encoder_content/encoder_block_128x128x256/Conv_1/BatchNorm/beta_s":
                ("encoder_content", ("block_128_conv1", "norm", "beta_0"), None),
            "encoder_content/encoder_block_128x128x256/Conv_1/BatchNorm/moving_mean_t":
                ("encoder_content", ("block_128_conv1", "norm", "moving_mean_1"), "batch_stats"),
            "generator/block_8x8x256/Conv/weights":
                ("generator", ("block_8_conv0", "conv", "kernel"), None),
            "generator/generator_to_rgb_256x256/Conv/weights":
                ("generator", ("to_rgb_256", "conv", "kernel"), None),
            "discriminator_t/before_fc_1x1x256/Conv_1/biases":
                ("discriminator_t", ("before_fc_conv1", "conv", "bias"), None),
            "discriminator_t/prediction/fully_connected/weights":
                ("discriminator_t", ("prediction", "kernel"), None),
            "generator/block_4x4x256/Conv_1/BatchNorm/gamma_t":
                ("generator", ("block_4_conv1", "norm", "gamma_1"), None),
            # Self-attention module (reference pggan_utils.py:301-308 +
            # libs/self_attention.py:24-70).
            "generator/self_attention_64x64x64/sa_f/weights":
                ("generator", ("self_attention_64", "sa_f", "conv", "kernel"), None),
            "generator/self_attention_64x64x64/sa_gamma":
                ("generator", ("self_attention_64", "sa_gamma"), None),
            "discriminator_s/self_attention_64x64x64/sa_h/u":
                ("discriminator_s", ("self_attention_64", "sa_h", "conv", "u"), "spectral"),
            # Resblock shortcut 1x1 conv (reference pggan_utils.py:334-342).
            "generator/block_16x16x128/shortcut/weights":
                ("generator", ("block_16_res", "shortcut", "conv", "kernel"), None),
            # from_rgb blocks carry a shortcut too (maybe_resblock in the
            # discriminator/encoder from_rgb, nets/pggan.py:230,392) — it
            # must NOT fall through onto the from_rgb conv kernel.
            "discriminator_t/from_rgb_256x256/shortcut/weights":
                ("discriminator_t",
                 ("from_rgb_256_res", "shortcut", "conv", "kernel"), None),
            # The sa convs sit inside the arg scope, so they carry norms.
            "generator/self_attention_64x64x64/sa_f/BatchNorm/beta_s":
                ("generator",
                 ("self_attention_64", "sa_f", "norm", "beta_0"), None),
            "generator/self_attention_64x64x64/sa_h/BatchNorm/moving_variance_t":
                ("generator",
                 ("self_attention_64", "sa_h", "norm", "moving_var_1"),
                 "batch_stats"),
            # Spectral-norm power-iteration vector (reference libs/sn.py:56).
            "discriminator_t/block_8x8x256/Conv/u":
                ("discriminator_t", ("block_8_conv0", "conv", "u"), "spectral"),
        }
        for tf_name, want in cases.items():
            assert map_var_name(tf_name) == want, tf_name
        # Optimizer slots and unrelated vars are skipped.
        assert map_var_name("generator/block_8x8x256/Conv/weights/Adam") is None
        assert map_var_name("global_step") is None

    def test_import_from_real_tf_checkpoint(self, tmp_path):
        """Round trip: write a TF checkpoint with reference-style names, import
        it, and confirm the values landed in the right pytree leaves."""
        tf = pytest.importorskip("tensorflow")
        from twingan_tpu.infer.import_tf import import_tf_checkpoint
        from twingan_tpu.train.twingan_trainer import TwinGANConfig, TwinGANTrainer
        from twingan_tpu.train.optimizers import OptimizerConfig

        cfg = TwinGANConfig(
            model=PGGANConfig(resolution=8, max_channels=16, num_domains=2),
            batch_size=2,
            opt=OptimizerConfig(learning_rate=1e-3),
        )
        trainer = TwinGANTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        k_shape = np.shape(state.params["generator"]["block_8_conv0"]["conv"]["kernel"])
        marker = np.full(k_shape, 0.125, np.float32)
        beta_shape = np.shape(state.params["generator"]["block_8_conv0"]["norm"]["beta_1"])
        beta_marker = np.full(beta_shape, -0.5, np.float32)

        ckpt_dir = str(tmp_path / "tfckpt")
        import tensorflow.compat.v1 as tf1

        with tf1.Graph().as_default():
            v1 = tf1.get_variable(
                "generator/block_8x8x16/Conv/weights",
                initializer=tf1.constant(marker),
            )
            v2 = tf1.get_variable(
                "generator/block_8x8x16/Conv/BatchNorm/beta_t",
                initializer=tf1.constant(beta_marker),
            )
            saver = tf1.train.Saver(var_list={
                "generator/block_8x8x16/Conv/weights": v1,
                "generator/block_8x8x16/Conv/BatchNorm/beta_t": v2,
            })
            with tf1.Session() as sess:
                sess.run(tf1.global_variables_initializer())
                path = saver.save(sess, ckpt_dir + "/model.ckpt")

        new_state, report = import_tf_checkpoint(path, state)
        np.testing.assert_allclose(
            np.asarray(new_state.params["generator"]["block_8_conv0"]["conv"]["kernel"]),
            marker,
        )
        np.testing.assert_allclose(
            np.asarray(new_state.params["generator"]["block_8_conv0"]["norm"]["beta_1"]),
            beta_marker,
        )
        assert len(report["mapped"]) == 2


class TestTrainedFeatureFID:
    """tools/train_fid_classifier.py + metrics.classifier_features_fn: FID
    in a TRAINED feature space (closes the random-init InceptionV3 eval
    weakness for the synthetic-domain quality runs)."""

    @pytest.fixture(scope="class")
    def fid_classifier_dir(self, tmp_path_factory):
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        import train_fid_classifier

        out = str(tmp_path_factory.mktemp("fid_cls") / "clf")
        # Tiny-but-real training run: enough steps that the feature-space
        # ordering sanity gate inside the tool passes (it exits 1 otherwise).
        train_fid_classifier.main([
            "--out", out, "--hw", "16", "--n", "200", "--steps", "120",
            "--batch", "32", "--platform", "",
        ])
        return out

    def test_labels_cover_all_attributes(self):
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from train_fid_classifier import NUM_LABELS, make_dataset

        images, labels = make_dataset(50, 16, seed=3)
        assert images.shape == (100, 16, 16, 3) and labels.shape == (100, NUM_LABELS)
        # Every one-hot group sums to 1 per row; every attribute value occurs.
        for lo, hi in ((0, 3), (3, 7), (7, 10), (10, 12)):
            np.testing.assert_array_equal(labels[:, lo:hi].sum(1), 1.0)
            assert (labels[:, lo:hi].sum(0) > 0).all()

    def test_features_fn_and_fid_ordering(self, fid_classifier_dir):
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from train_fid_classifier import make_dataset

        from twingan_tpu.evals.metrics import classifier_features_fn, fid

        feats = classifier_features_fn(fid_classifier_dir)
        images, labels = make_dataset(60, 16, seed=11)
        f = np.asarray(feats(jnp.asarray(images[:8])))
        assert f.shape[0] == 8 and f.ndim == 2 and np.isfinite(f).all()
        # Input at a different hw resizes to the classifier's training hw.
        f32 = np.asarray(feats(jnp.asarray(np.zeros((2, 32, 32, 3), np.float32))))
        assert f32.shape == (2, f.shape[1])

        b = images[labels[:, 11] == 1.0]
        a = images[labels[:, 10] == 1.0]
        noise = np.random.RandomState(0).rand(32, 16, 16, 3).astype(np.float32)
        close = fid(feats, [b[: len(b) // 2]], [b[len(b) // 2 :]])
        cross = fid(feats, [b], [a])
        far = fid(feats, [b], [noise])
        # Same-distribution FID must sit far below EVERY cross-distribution
        # FID; no ordering between cross and far (a discriminative feature
        # space pushes the rival domain further out than OOD noise).
        assert close * 3 < min(cross, far)

    def test_run_eval_fid_mode_uses_classifier(self, fid_classifier_dir,
                                               trained_stage, tmp_path):
        from twingan_tpu.evals import run_eval

        eval_dir = str(tmp_path / "eval")
        run_eval.main([
            "--mode=fid", f"--model_path={trained_stage}",
            f"--classifier_path={fid_classifier_dir}",
            f"--eval_dir={eval_dir}", "--num_images=8", "--batch_size=4",
            "--use_synthetic_data",
        ])
        line = open(os.path.join(eval_dir, "fid.txt")).read()
        assert "trained-classifier features" in line
        assert np.isfinite(float(line.split("\t")[1]))
