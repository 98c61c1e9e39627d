"""Classifier zoo, factory, trainer, and Grad-CAM tests (reference
nets_factory_test.py sweep + per-net shape tests + classifier trainer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from twingan_tpu.models.classifiers import NETWORKS, PLANNED, get_network_fn
from twingan_tpu.train.classifier_trainer import ClassifierConfig, ClassifierTrainer, _auc
from twingan_tpu.train.optimizers import OptimizerConfig


SMALL_HW = {
    "lenet": 28, "cifarnet": 32, "alexnet_v2": 224, "vgg_a": 224, "vgg_16": 224,
    "vgg_19": 224, "illust2vec": 64, "resnet_v1_50": 64, "resnet_v1_101": 64,
    "resnet_v2_50": 64, "resnet_v2_101": 64, "mobilenet_v1": 64,
}
# The heavy ones get smoke-tested at reduced spatial size where the
# architecture allows it; VGG/alexnet need >= 224 due to the 7x7/5x5 VALID fc.
FAST_SWEEP = ["lenet", "cifarnet", "illust2vec", "resnet_v1_50", "resnet_v2_50", "mobilenet_v1"]


class TestFactorySweep:
    @pytest.mark.parametrize("name", FAST_SWEEP)
    def test_logits_shape(self, name):
        model = get_network_fn(name, num_classes=7)
        hw = SMALL_HW[name]
        x = jnp.ones((2, hw, hw, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        logits, eps = out
        assert logits.shape == (2, 7)
        assert "Logits" in eps

    def test_vgg16_full_size(self):
        model = get_network_fn("vgg_16", num_classes=5)
        x = jnp.ones((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 5)
        assert eps["conv5"].shape[1] == 14

    def test_planned_mechanism(self):
        # Everything the reference registers is ported (PLANNED is empty);
        # the mechanism still gives a clear error for names parked there.
        import twingan_tpu.models.classifiers as c

        assert c.PLANNED == ()
        old = c.PLANNED
        try:
            c.PLANNED = ("future_net",)
            with pytest.raises(NotImplementedError):
                get_network_fn("future_net", 10)
        finally:
            c.PLANNED = old

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_network_fn("not_a_net", 10)

    def test_illust2vec_embedding_layer(self):
        model = get_network_fn("illust2vec", num_classes=100)
        x = jnp.ones((2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, eps = model.apply(variables, x)
        assert eps["encode"].shape == (2, 1024)


class TestClassifierTrainer:
    def _cfg(self):
        return ClassifierConfig(
            network="lenet", num_classes=5, image_hw=28, batch_size=4,
            opt=OptimizerConfig(optimizer="adam", learning_rate=1e-3),
        )

    def _batch(self, seed=0):
        rng = np.random.RandomState(seed)
        return {
            "image": jnp.asarray(rng.rand(4, 28, 28, 3).astype(np.float32)),
            "labels": jnp.asarray((rng.rand(4, 5) > 0.5).astype(np.float32)),
        }

    def test_train_steps_reduce_loss_on_fixed_batch(self):
        trainer = ClassifierTrainer(self._cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = self._batch()
        losses = []
        for _ in range(10):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_predict_and_eval(self):
        trainer = ClassifierTrainer(self._cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        probs = trainer.predict(state, self._batch()["image"])
        assert probs.shape == (4, 5)
        assert 0.0 <= float(probs.min()) and float(probs.max()) <= 1.0
        metrics = trainer.evaluate(state, [jax.device_get(self._batch(i)) for i in range(2)])
        assert set(metrics) == {"auc", "precision_at_thres", "recall_at_thres"}

    def test_tag_output(self, tmp_path):
        trainer = ClassifierTrainer(self._cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        imgs = np.random.RandomState(0).rand(2, 28, 28, 3).astype(np.float32)
        path = trainer.write_tags(
            state, imgs, ["a.png", "b.png"], [f"tag{i}" for i in range(5)],
            str(tmp_path / "tags.txt"), threshold=0.0, top_k=3,
        )
        lines = open(path).read().splitlines()
        assert len(lines) == 2 and lines[0].startswith("a.png\t")
        assert len(lines[0].split("\t")[1].split(",")) == 3

    def test_auc_golden(self):
        scores = np.asarray([0.9, 0.8, 0.3, 0.2])
        labels = np.asarray([1, 0, 1, 0])
        # Pairs: (0.9>0.8)=1, (0.9>0.2)=1, (0.3<0.8)=0, (0.3>0.2)=1 -> 3/4.
        assert _auc(scores, labels) == pytest.approx(0.75)


class TestGradCam:
    def test_heatmap_shape_and_range(self):
        trainer = ClassifierTrainer(
            ClassifierConfig(network="illust2vec", num_classes=4, image_hw=32, batch_size=2)
        )
        state = trainer.init_state(jax.random.PRNGKey(0))
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
        out = trainer.grad_cam_images(state, imgs, layer="conv5", class_index=1)
        assert out.shape == (2, 32, 32, 3)
        assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0

    def test_probe_gradient_matches_activation_gradient(self):
        # The probe trick must reproduce d(score)/d(acts) for a known model:
        # f(x) = sum(3 * acts) with acts = 2*x -> d/d(acts) = 3 everywhere.
        from twingan_tpu.models.grad_cam import grad_cam

        def apply_fn(images, probes=None):
            acts = images * 2.0
            if probes and "layer" in probes:
                acts = acts + probes["layer"]
            logits = jnp.sum(acts, axis=(1, 2)) * 3.0  # [B, C]
            return logits, {"layer": acts}

        imgs = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 2).astype(np.float32))
        heat = grad_cam(apply_fn, imgs, "layer", class_index=0)
        assert heat.shape == (1, 4, 4)
        # weights = mean grad = 3 for channel 0, 0 for channel 1;
        # cam = relu(3 * acts[...,0]) normalized -> proportional to imgs ch0.
        expected = np.asarray(imgs[0, :, :, 0])
        expected = expected / expected.max()
        np.testing.assert_allclose(np.asarray(heat[0]), expected, rtol=1e-4)


class TestInception:
    def test_v3_shapes(self):
        model = get_network_fn("inception_v3", num_classes=6)
        x = jnp.ones((1, 299, 299, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 6)
        assert eps["Mixed_5d"].shape[1:] == (35, 35, 288)
        assert eps["Mixed_6e"].shape[1:] == (17, 17, 768)
        assert eps["Mixed_7c"].shape[1:] == (8, 8, 2048)

    def test_v1_shapes(self):
        model = get_network_fn("inception_v1", num_classes=6)
        x = jnp.ones((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 6)
        assert eps["Mixed_5c"].shape[1:] == (7, 7, 1024)


class TestPix2Pix:
    def test_generator_and_discriminator(self):
        from twingan_tpu.models.pix2pix import Pix2PixDiscriminator, Pix2PixGenerator

        gen = Pix2PixGenerator(base_filters=8)
        x = jnp.ones((2, 32, 32, 3))
        gv = gen.init({"params": jax.random.PRNGKey(0)}, x)
        out, eps = gen.apply(gv, x)
        assert out.shape == (2, 32, 32, 3)
        assert float(jnp.abs(out).max()) <= 1.0
        dis = Pix2PixDiscriminator(base_filters=8)
        dv = dis.init(jax.random.PRNGKey(1), jnp.concatenate([x, out], axis=-1))
        pred, deps = dis.apply(dv, jnp.concatenate([x, out], axis=-1))
        assert pred.shape == (2, 1)
        assert "patch_logits" in deps


class TestUtilMisc:
    def test_safe_one_hot(self):
        from twingan_tpu.utils.misc import safe_one_hot_encoding

        out = np.asarray(safe_one_hot_encoding(jnp.asarray([0, 2, 7, -1]), 3))
        np.testing.assert_array_equal(out[0], [1, 0, 0])
        np.testing.assert_array_equal(out[2], [0, 0, 0])  # out of range
        np.testing.assert_array_equal(out[3], [0, 0, 0])  # negative

    def test_anime_label_group_max(self, tmp_path):
        from twingan_tpu.utils.misc import get_tags_dict, process_anime_face_labels

        # label id -> group: 0,1 = hair (group 2); 2,3 = eyes (group 3);
        # 4 = ungrouped free tag.
        tsv = tmp_path / "groups.tsv"
        tsv.write_text("0\tblonde_hair\t2\n1\tblack_hair\t2\n"
                       "2\tblue_eyes\t3\n3\tred_eyes\t3\n")
        groups = get_tags_dict(str(tsv), 0, 2)
        assert groups == {0: "2", 1: "2", 2: "3", 3: "3"}

        # Per group only the max survives; free tags are zeroed (no group).
        out = process_anime_face_labels([0.9, 0.4, 0.3, 0.8, 0.7], 0.25, groups)
        assert out == [0.9, 0.0, 0.0, 0.8, 0.0]
        # Hair present but no eye color above threshold -> nothing at all.
        out = process_anime_face_labels([0.9, 0.4, 0.1, 0.2, 0.7], 0.25, groups)
        assert out == [0.0] * 5

    def test_write_tags_group_filter(self, tmp_path):
        trainer = ClassifierTrainer(self._tiny_cfg())
        state = trainer.init_state(jax.random.PRNGKey(0))
        images = np.random.RandomState(0).rand(2, trainer.cfg.image_hw,
                                               trainer.cfg.image_hw, 3)
        names = ["a.png", "b.png"]
        tag_names = [f"t{i}" for i in range(trainer.cfg.num_classes)]
        # Map every label to the hair group only -> eye color always missing
        # -> the filter suppresses every prediction, and images with no
        # surviving tags are SKIPPED entirely (reference 'Skip empty
        # predictions', train_image_classifier.py).
        groups = {i: "2" for i in range(trainer.cfg.num_classes)}
        path = trainer.write_tags(state, images, names, tag_names,
                                  str(tmp_path / "tags.txt"), threshold=0.1,
                                  labels_id_to_group=groups)
        assert open(path).read() == ""
        # Without the group filter, tags above threshold are written.
        path2 = trainer.write_tags(state, images, names, tag_names,
                                   str(tmp_path / "tags2.txt"), threshold=0.0)
        lines = open(path2).read().splitlines()
        assert len(lines) == 2 and all(l.split("\t")[1] for l in lines)

    def _tiny_cfg(self):
        return ClassifierConfig(network="lenet", num_classes=4, multi_label=True,
                                image_hw=28, batch_size=2)

    def test_auc_exact_and_tie_corrected(self):
        # Separable: all positives above all negatives -> 1.0.
        assert _auc(np.array([0.9, 0.8, 0.2, 0.1]),
                    np.array([1, 1, 0, 0])) == pytest.approx(1.0)
        # Uninformative single constant score -> midranks give exactly 0.5
        # (argsort tie-breaking would return an arbitrary biased value).
        assert _auc(np.full(10, 0.7),
                    np.array([1, 0] * 5)) == pytest.approx(0.5)
        # Hand-computed tie case: pos={0.5,0.3}, neg={0.5,0.1}.
        # P(pos>neg)+0.5*P(pos=neg) over 4 pairs = (0.5+1+0+1*0.5*0... )
        # pairs: (.5,.5)=0.5, (.5,.1)=1, (.3,.5)=0, (.3,.1)=1 -> 2.5/4.
        assert _auc(np.array([0.5, 0.3, 0.5, 0.1]),
                    np.array([1, 1, 0, 0])) == pytest.approx(2.5 / 4)

    def test_heatmap_and_patches(self):
        from twingan_tpu.utils.misc import get_random_patches, grayscale_to_heatmap

        g = jnp.linspace(0, 1, 16).reshape(1, 4, 4, 1)
        heat = grayscale_to_heatmap(g)
        assert heat.shape == (1, 4, 4, 3)
        imgs = jnp.ones((2, 16, 16, 3))
        patches = get_random_patches(jax.random.PRNGKey(0), imgs, 5, 7)
        assert patches.shape == (7, 5, 5, 3)

    def test_combine_dicts_and_boxes(self):
        from twingan_tpu.utils.misc import box_iou, combine_dicts, find_boundary

        assert combine_dicts({"a": {"x": 1}, "b": {"x": 2}}) == {"a_x": 1, "b_x": 2}
        assert box_iou((0, 0, 2, 2), (1, 1, 3, 3)) == pytest.approx(1 / 7)
        assert find_boundary(lambda x: x >= 5, 0, 10) == 5
        assert find_boundary(lambda x: False, 0, 10) == 11


class TestLateZooAdditions:
    def test_overfeat(self):
        model = get_network_fn("overfeat", num_classes=4)
        x = jnp.ones((1, 231, 231, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, _ = model.apply(variables, x)
        assert logits.shape == (1, 4)

    def test_resnet_v2_layernorm(self):
        model = get_network_fn("resnet_v2_layernorm", num_classes=4)
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        # Layer norm -> no batch_stats collection at all.
        assert "batch_stats" not in variables
        logits, _ = model.apply(variables, x)
        assert logits.shape == (1, 4)


class TestInceptionFamily:
    @pytest.mark.parametrize("name,hw", [("inception_v2", 224), ("inception_v4", 299),
                                          ("inception_resnet_v2", 299)])
    def test_shapes(self, name, hw):
        model = get_network_fn(name, num_classes=3)
        x = jnp.ones((1, hw, hw, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 3)
        assert "PreLogits" in eps


class TestNASNet:
    def test_mobile_shapes(self):
        model = get_network_fn("nasnet_mobile", num_classes=3)
        x = jnp.ones((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, eps = model.apply(variables, x)
        assert logits.shape == (1, 3)
        assert "stack_2" in eps

    def test_aux_head_and_drop_path(self):
        # Small stack with aux head (input large enough for the 5x5/3 pool)
        # and active drop-path: train mode needs the 'drop_path' rng and
        # must remain stochastic across rng folds; eval is deterministic.
        from twingan_tpu.models.nasnet import NASNet

        model = NASNet(num_classes=3, num_cells=3, initial_filters=8,
                       stem_filters=8, drop_path_keep_prob=0.6)
        x = jnp.ones((2, 128, 128, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "drop_path": jax.random.PRNGKey(1)},
            x, train=True,
        )
        (logits, eps), _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"drop_path": jax.random.PRNGKey(2)},
        )
        assert "AuxLogits" in eps and eps["AuxLogits"].shape == (2, 3)
        (logits2, _), _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"drop_path": jax.random.PRNGKey(3)},
        )
        assert not np.allclose(np.asarray(logits), np.asarray(logits2))
        # progress=0 disables the time-ramped drop entirely: deterministic.
        (a, _), _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"], progress=0.0,
            rngs={"drop_path": jax.random.PRNGKey(4)},
        )
        (b, _), _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"], progress=0.0,
            rngs={"drop_path": jax.random.PRNGKey(5)},
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_every_reference_net_is_ported(self):
        assert PLANNED == ()
        assert len(NETWORKS) >= 19


class TestPRCurves:
    def test_pr_curve_file(self, tmp_path):
        trainer = ClassifierTrainer(ClassifierConfig(
            network="lenet", num_classes=5, image_hw=28, batch_size=4,
            opt=OptimizerConfig(optimizer="adam", learning_rate=1e-3)))
        state = trainer.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batches = [{
            "image": rng.rand(4, 28, 28, 3).astype(np.float32),
            "labels": (rng.rand(4, 5) > 0.5).astype(np.float32),
        }]
        path = str(tmp_path / "pr.tsv")
        trainer.evaluate(state, batches, pr_curve_path=path)
        lines = open(path).read().splitlines()
        assert lines[0] == "threshold\tprecision\trecall"
        assert len(lines) == 22
        # Recall is monotonically nonincreasing in threshold.
        recalls = [float(l.split("\t")[2]) for l in lines[1:]]
        assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))


class TestLabelsOffset:
    """labels_offset (reference model_inheritor.py:213): N leading label
    columns dropped, logits layer shrunk by N; the offset must persist in
    the config snapshot and realign the tags-mode vocabulary."""

    def test_offset_persists_and_batches_realign(self, tmp_path):
        import jax

        from twingan_tpu.runner.classifier_runner import (
            build_parser, load_config_snapshot, make_batches,
        )
        from twingan_tpu.runner.checkpoint import save_config_snapshot
        from twingan_tpu.train.classifier_trainer import ClassifierConfig

        cfg = ClassifierConfig(network="lenet", num_classes=7, labels_offset=3,
                               image_hw=28, batch_size=2)
        save_config_snapshot(str(tmp_path), cfg)
        restored = load_config_snapshot(str(tmp_path))
        assert restored.labels_offset == 3
        assert restored.num_classes == 7

        # Synthetic batches already carry the reduced width.
        args = build_parser().parse_args(
            ["--train_dir", str(tmp_path), "--use_synthetic_data",
             "--num_classes", "10", "--labels_offset", "3"])
        batch = next(make_batches(args, restored, training=True))
        assert batch["labels"].shape[-1] == 7

    def test_tags_mode_vocab_alignment(self, tmp_path, capsys):
        """Logit j trained against vocab j+offset must print vocab name
        j+offset, not j (code-review finding)."""
        import jax
        import jax.numpy as jnp

        from twingan_tpu.train.classifier_trainer import (
            ClassifierConfig, ClassifierTrainer,
        )

        cfg = ClassifierConfig(network="lenet", num_classes=4, labels_offset=2,
                               image_hw=28, batch_size=1)
        trainer = ClassifierTrainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0))
        full_vocab = [f"tag{i}" for i in range(6)]  # dataset vocabulary
        # The runner slices the vocabulary by the offset before write_tags;
        # replicate that contract and assert no out-of-range names appear.
        tag_names = full_vocab[cfg.labels_offset:]
        assert len(tag_names) == cfg.num_classes
        rng = np.random.RandomState(0)
        path = trainer.write_tags(
            state, rng.rand(1, 28, 28, 3).astype(np.float32), ["img0"],
            tag_names, str(tmp_path / "tags.txt"), threshold=0.0, top_k=4,
        )
        body = open(path).read()
        # Every printed tag is from the offset-aligned tail of the vocab.
        printed = [t for t in body.replace("\n", "\t").replace(",", "\t").split("\t")
                   if t.startswith("tag")]
        assert printed and all(t in tag_names for t in printed), body
