"""Data-layer tests: TFRecord codec (cross-checked against TensorFlow's own
writer/reader), tf.Example wire codec, datasets, converters, preprocessing,
pipeline."""

import io
import os

import numpy as np
import pytest
from PIL import Image as PILImage

import jax
import jax.numpy as jnp

from twingan_tpu.data import (
    TFRecordReader,
    TFRecordWriter,
    decode_example,
    encode_example,
    get_dataset,
    masked_crc32c,
)
from twingan_tpu.data.preprocess import (
    PreprocessConfig,
    augment_batch,
    host_resize,
    postprocess_image,
    rgb_to_yiq,
    yiq_to_rgb,
)


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    PILImage.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestTFRecordCodec:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.tfrecord")
        payloads = [b"hello", b"world" * 100, b"", os.urandom(1 << 16)]
        with TFRecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        r = TFRecordReader(path, verify=True)
        assert len(r) == len(payloads)
        for got, want in zip(r, payloads):
            assert bytes(got) == want

    def test_tensorflow_can_read_ours(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        path = str(tmp_path / "ours.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(b"payload-1")
            w.write(b"payload-2" * 50)
        got = [bytes(x.numpy()) for x in tf.data.TFRecordDataset(path)]
        assert got == [b"payload-1", b"payload-2" * 50]

    def test_we_can_read_tensorflows(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        path = str(tmp_path / "tf.tfrecord")
        with tf.io.TFRecordWriter(path) as w:
            w.write(b"abc")
            w.write(os.urandom(1000))
        r = TFRecordReader(path, verify=True)
        assert len(r) == 2
        assert bytes(r[0]) == b"abc"

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "bad.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(b"x" * 100)
        raw = bytearray(open(path, "rb").read())
        raw[20] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(raw)
        with pytest.raises(IOError):
            TFRecordReader(path, verify=True)

    def test_truncated_final_record_detected(self, tmp_path):
        """A shard cut mid-payload (crashed converter) must fail the scan
        even with verify=False — the framing claims bytes past EOF."""
        path = str(tmp_path / "cut.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(b"x" * 100)
            w.write(b"y" * 100)
        raw = open(path, "rb").read()
        open(path, "wb").write(raw[:-60])  # drop most of record 2's payload
        with pytest.raises(IOError, match="truncated|corrupt"):
            TFRecordReader(path, verify=False)

    def test_masked_crc_matches_tensorflow_values(self):
        # Golden value from TF's crc32c of b'123456789' == 0xe3069283.
        from twingan_tpu.data import crc32c

        assert crc32c(b"123456789") == 0xE3069283


class TestExampleCodec:
    def test_roundtrip_all_types(self):
        feats = {
            "image/encoded": b"\x89PNGfake",
            "image/format": b"png",
            "image/attribs": np.arange(-3, 5, dtype=np.int64),
            "image/landmarks": np.linspace(0, 1, 10).astype(np.float32),
            "names": [b"a", b"bb"],
        }
        decoded = decode_example(encode_example(feats))
        assert decoded["image/encoded"] == [b"\x89PNGfake"]
        assert decoded["image/format"] == [b"png"]
        np.testing.assert_array_equal(decoded["image/attribs"], feats["image/attribs"])
        np.testing.assert_allclose(decoded["image/landmarks"], feats["image/landmarks"], rtol=1e-6)
        assert decoded["names"] == [b"a", b"bb"]

    def test_tensorflow_parses_ours(self):
        tf = pytest.importorskip("tensorflow")
        feats = {
            "b": b"bytes",
            "f": np.asarray([1.5, -2.5], np.float32),
            "i": np.asarray([3, -4], np.int64),
        }
        ex = tf.train.Example.FromString(encode_example(feats))
        assert ex.features.feature["b"].bytes_list.value[0] == b"bytes"
        np.testing.assert_allclose(list(ex.features.feature["f"].float_list.value), [1.5, -2.5])
        assert list(ex.features.feature["i"].int64_list.value) == [3, -4]

    def test_we_parse_tensorflows(self):
        tf = pytest.importorskip("tensorflow")
        ex = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "b": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"xyz"])),
                    "i": tf.train.Feature(int64_list=tf.train.Int64List(value=[7, -9])),
                    "f": tf.train.Feature(float_list=tf.train.FloatList(value=[0.25])),
                }
            )
        )
        decoded = decode_example(ex.SerializeToString())
        assert decoded["b"] == [b"xyz"]
        np.testing.assert_array_equal(decoded["i"], [7, -9])
        np.testing.assert_allclose(decoded["f"], [0.25])


class TestDatasetsAndConverters:
    def _make_image_dir(self, tmp_path, n=6, hw=48):
        d = tmp_path / "imgs"
        d.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(n):
            arr = (rng.rand(hw, hw + (i % 2) * 16, 3) * 255).astype(np.uint8)
            PILImage.fromarray(arr).save(d / f"img_{i}.png")
        return str(d)

    def test_convert_and_read_image_only(self, tmp_path):
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.tfrecord import list_shards

        img_dir = self._make_image_dir(tmp_path)
        out_dir = str(tmp_path / "records")
        n = convert_image_folder(img_dir, out_dir, split="train", num_shards=2)
        assert n == 6
        shards = list_shards(out_dir, "train")
        # Token matching: temp files and substring-containing names are
        # excluded ('pretrain' must not match split='train').
        open(os.path.join(out_dir, "x_train_00.tfrecord.tmp"), "w").close()
        open(os.path.join(out_dir, "pretrain_faces_00.tfrecord"), "w").close()
        assert list_shards(out_dir, "train") == shards
        assert len(shards) == 2
        spec = get_dataset("image_only")
        items = [spec.parse(p) for p in TFRecordReader(shards[0])]
        assert items and items[0]["source"].dtype == np.uint8
        assert items[0]["source"].ndim == 3

    def test_size_and_ratio_filters(self, tmp_path):
        from twingan_tpu.data.converters import convert_image_folder

        img_dir = self._make_image_dir(tmp_path)
        out = str(tmp_path / "r2")
        n = convert_image_folder(img_dir, out, num_shards=1, min_hw=1000)
        assert n == 0

    def test_svhn_converter_roundtrip(self, tmp_path):
        from scipy.io import savemat

        from twingan_tpu.data.converters import convert_svhn
        from twingan_tpu.data.tfrecord import list_shards

        rng = np.random.RandomState(0)
        X = (rng.rand(32, 32, 3, 5) * 255).astype(np.uint8)
        y = np.asarray([[1], [2], [10], [4], [5]], np.uint8)
        mat = str(tmp_path / "train_32x32.mat")
        savemat(mat, {"X": X, "y": y})
        out = str(tmp_path / "svhn")
        n = convert_svhn(mat, out)
        assert n == 5
        spec = get_dataset("svhn")
        recs = TFRecordReader(list_shards(out, "train")[0])
        item = spec.parse(recs[2])
        assert item["source"].shape == (32, 32, 3)
        assert int(item["label"]) == 0  # label 10 -> digit 0
        np.testing.assert_array_equal(item["source"], X[:, :, :, 2])

    def test_image_pair_converter(self, tmp_path):
        from twingan_tpu.data.converters import convert_image_pairs
        from twingan_tpu.data.tfrecord import list_shards

        a = self._make_image_dir(tmp_path / "a")
        b = self._make_image_dir(tmp_path / "b")
        out = str(tmp_path / "pairs")
        n = convert_image_pairs(a, b, out, num_shards=1)
        assert n == 6
        spec = get_dataset("image_pair")
        item = spec.parse(TFRecordReader(list_shards(out, "train")[0])[0])
        assert item["source"].shape[2] == 3 and item["target"].shape[2] == 3

    def test_celeba_converter(self, tmp_path):
        from twingan_tpu.data.converters import convert_celeba
        from twingan_tpu.data.tfrecord import list_shards

        img_dir = self._make_image_dir(tmp_path, n=4)
        part = tmp_path / "partition.txt"
        lines = [f"img_{i}.png {0 if i < 3 else 2}" for i in range(4)]
        part.write_text("\n".join(lines))
        attr = tmp_path / "attr.txt"
        header = ["4", " ".join(f"A{j}" for j in range(40))]
        rows = [f"img_{i}.png " + " ".join("1" if j % 2 else "-1" for j in range(40)) for i in range(4)]
        attr.write_text("\n".join(header + rows))
        out = str(tmp_path / "celeba")
        n = convert_celeba(img_dir, out, str(part), attrib_file=str(attr), num_shards=1)
        assert n == 3  # only partition 0
        spec = get_dataset("celeba")
        item = spec.parse(TFRecordReader(list_shards(out, "train")[0])[0])
        assert item["conditional_labels"].shape == (40,)
        assert item["conditional_labels"][1] == 1.0 and item["conditional_labels"][0] == 0.0


class TestPreprocess:
    def test_host_resize_modes(self):
        img = (np.random.RandomState(0).rand(30, 60, 3) * 255).astype(np.uint8)
        for mode in ("PAD", "CROP", "RESHAPE"):
            out = host_resize(img, mode, 32)
            assert out.shape == (32, 32, 3)
            assert out.dtype == np.float32 and out.max() <= 1.0
        out = host_resize(img, "RANDOM_CROP", 16, rng=np.random.RandomState(1))
        assert out.shape == (16, 16, 3)

    def test_pad_preserves_content_ratio(self):
        # A wide white image PAD-resized: rows at top/bottom are black padding.
        img = np.full((10, 40, 3), 255, np.uint8)
        out = host_resize(img, "PAD", 40)
        assert out[0, :, :].max() == 0.0  # top padding
        assert out[20, :, :].min() > 0.9  # center content

    def test_host_resize_uint8_matches_float_path(self):
        from twingan_tpu.data.preprocess import host_resize_uint8

        img = (np.random.RandomState(3).rand(30, 60, 3) * 255).astype(np.uint8)
        for mode in ("PAD", "CROP", "RESHAPE", "NONE"):
            u8 = host_resize_uint8(img, mode, 32)
            assert u8.dtype == np.uint8
            np.testing.assert_allclose(
                u8.astype(np.float32) / 255.0, host_resize(img, mode, 32)
            )

    def test_augment_uint8_matches_float(self):
        # uint8 transfer dtype -> identical augmented output as float [0,1].
        cfg = PreprocessConfig(output_hw=16, is_training=True)
        u8 = (np.random.RandomState(1).rand(4, cfg.host_hw, cfg.host_hw, 3) * 255).astype(np.uint8)
        a = augment_batch(jax.random.PRNGKey(7), jnp.asarray(u8), cfg)
        b = augment_batch(
            jax.random.PRNGKey(7), jnp.asarray(u8.astype(np.float32) / 255.0), cfg
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_augment_shapes_and_range(self):
        cfg = PreprocessConfig(output_hw=16, is_training=True, do_random_cropping=True)
        imgs = jnp.asarray(np.random.RandomState(0).rand(4, cfg.host_hw, cfg.host_hw, 3), jnp.float32)
        out = augment_batch(jax.random.PRNGKey(0), imgs, cfg)
        assert out.shape == (4, 16, 16, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_eval_path_is_deterministic(self):
        cfg = PreprocessConfig(output_hw=16, is_training=False)
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
        a = augment_batch(jax.random.PRNGKey(0), imgs, cfg)
        b = augment_batch(jax.random.PRNGKey(9), imgs, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shared_flip_consistency(self):
        cfg = PreprocessConfig(output_hw=8, is_training=True, shared_flip=True)
        imgs = jnp.asarray(np.random.RandomState(0).rand(3, 8, 8, 3), jnp.float32)
        key = jax.random.PRNGKey(3)
        a = augment_batch(key, imgs, cfg)
        b = augment_batch(key, imgs, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_yiq_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 3), jnp.float32)
        back = yiq_to_rgb(rgb_to_yiq(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-2)

    def test_postprocess_bgr_and_gray(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 3), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(postprocess_image(x[..., ::-1], "bgr")), np.asarray(x), rtol=1e-6
        )
        multi = jnp.concatenate([x, x], axis=-1)
        assert postprocess_image(multi, "rgb").shape[-1] == 1

    def test_gray_is_weighted_sum_not_mean(self):
        """tf.image.rgb_to_grayscale parity: the 0.299/0.587/0.114 weights
        sum to 1, so pure white must map to 1.0 (a mean would give 1/3)."""
        from twingan_tpu.data.preprocess import PreprocessConfig, augment_batch

        cfg = PreprocessConfig(output_hw=4, color_space="gray", is_training=False)
        white = jnp.ones((1, 4, 4, 3), jnp.float32)
        out = augment_batch(jax.random.PRNGKey(0), white, cfg)
        assert out.shape[-1] == 1
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_hue_adjust_hsv_roundtrip(self):
        from twingan_tpu.data.preprocess import _hsv_to_rgb, _rgb_to_hsv

        x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 5, 3), jnp.float32)
        back = _hsv_to_rgb(_rgb_to_hsv(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


class TestPipeline:
    def test_synthetic_source(self):
        from twingan_tpu.data.pipeline import SyntheticSource

        it = iter(SyntheticSource(batch_size=4, hw=8))
        batch = next(it)
        assert batch["source"].shape == (4, 8, 8, 3)
        assert batch["target"].shape == (4, 8, 8, 3)

    def test_tfrecord_source_batches(self, tmp_path):
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.pipeline import TFRecordSource
        from twingan_tpu.data.tfrecord import list_shards

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(10):
            PILImage.fromarray((rng.rand(20, 24, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.png"
            )
        out = str(tmp_path / "rec")
        convert_image_folder(str(d), out, num_shards=2)
        src = TFRecordSource(
            get_dataset("image_only"),
            list_shards(out, "train"),
            PreprocessConfig(output_hw=16),
            batch_size=4,
            repeat=False,
        )
        assert src.num_samples == 10
        batches = list(iter(src))
        assert len(batches) == 2  # drop remainder
        assert batches[0]["source"].shape == (4, 16, 16, 3)
        assert batches[0]["source"].dtype == np.float32
        assert batches[0]["source"].max() <= 1.0

        # yield_uint8=True ships the 1-byte/pixel transfer dtype.
        src8 = TFRecordSource(
            get_dataset("image_only"),
            list_shards(out, "train"),
            PreprocessConfig(output_hw=16),
            batch_size=4,
            repeat=False,
            yield_uint8=True,
        )
        b8 = next(iter(src8))
        assert b8["source"].dtype == np.uint8
        np.testing.assert_allclose(
            np.sort(b8["source"].astype(np.float32).ravel()) / 255.0,
            np.sort(batches[0]["source"].ravel()),
            atol=1e-6,
        )

    def test_unpaired_and_prefetch(self, tmp_path):
        from twingan_tpu.data.pipeline import DevicePrefetcher, SyntheticSource, UnpairedSource

        a = SyntheticSource(batch_size=2, hw=8, keys=("source",), seed=0)
        b = SyntheticSource(batch_size=2, hw=8, keys=("source",), seed=1)
        up = UnpairedSource(a, b)
        pf = DevicePrefetcher(up, depth=2, keys=("source", "target"))
        batch = next(pf)
        assert set(batch) == {"source", "target"}
        assert isinstance(batch["source"], jax.Array)
        pf.close()

    def test_prefetcher_surfaces_worker_errors(self):
        """A crashing source must raise in the consumer, not read as clean
        end-of-data (an infinite training source 'ending' would silently
        truncate a run)."""
        from twingan_tpu.data.pipeline import DevicePrefetcher

        def bad_source():
            yield {"source": np.zeros((2, 4, 4, 3), np.float32)}
            raise OSError("tunnel died")

        pf = DevicePrefetcher(bad_source(), depth=2)
        next(pf)  # first batch fine
        with pytest.raises(RuntimeError, match="worker failed") as ei:
            while True:
                next(pf)
        assert isinstance(ei.value.__cause__, OSError)
        pf.close()

    def test_source_smaller_than_batch_rejected(self, tmp_path):
        """batch > dataset with drop_remainder+repeat would yield nothing
        forever; the constructor must reject it."""
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.pipeline import TFRecordSource
        from twingan_tpu.data.tfrecord import list_shards

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(3):
            PILImage.fromarray(np.full((16, 16, 3), i, np.uint8)).save(d / f"i{i}.png")
        out = str(tmp_path / "rec")
        convert_image_folder(str(d), out, num_shards=1)
        with pytest.raises(ValueError, match="no batch can ever be produced"):
            TFRecordSource(
                get_dataset("image_only"), list_shards(out, "train"),
                PreprocessConfig(output_hw=8), batch_size=8,
            )

    def test_all_records_failing_raises(self, tmp_path):
        """A spec that fails on every record (wrong dataset/spec pairing)
        must error instead of spinning an empty infinite epoch."""
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.pipeline import TFRecordSource
        from twingan_tpu.data.tfrecord import list_shards

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            PILImage.fromarray(np.full((16, 16, 3), i, np.uint8)).save(d / f"i{i}.png")
        out = str(tmp_path / "rec")
        convert_image_folder(str(d), out, num_shards=1)
        # celeba's schema expects attribs/landmarks image_only never wrote.
        src = TFRecordSource(
            get_dataset("celeba"), list_shards(out, "train"),
            PreprocessConfig(output_hw=8), batch_size=2, cache=False,
        )
        with pytest.raises(RuntimeError, match="every record failed"):
            next(iter(src))


class TestExtraConverters:
    def test_danbooru_tags_xml_converter(self, tmp_path):
        from twingan_tpu.data import get_dataset
        from twingan_tpu.data.converters import (
            convert_danbooru_folder,
            parse_tags_xml,
            write_tags_vocab,
        )
        from twingan_tpu.data.tfrecord import TFRecordReader, list_shards

        xml = tmp_path / "tags.xml"
        xml.write_text(
            "<tags>"
            '<tag type="0" ambiguous="false" count="10" name="long_hair" id="1"/>'
            '<tag type="1" ambiguous="false" count="5" name="some_author" id="2"/>'
            '<tag type="5" ambiguous="false" count="3" name="meta_tag" id="3"/>'
            '<tag type="4" ambiguous="true" count="7" name="blue_eyes" id="4"/>'
            "</tags>"
        )
        tags, idx = parse_tags_xml(str(xml))
        # NSFW pseudo-tags first; author/meta types excluded (reference
        # danbooru_utils.py:55-68).
        assert [t[3] for t in tags] == [
            "NSFWRating_s", "NSFWRating_q", "NSFWRating_e",
            "long_hair", "blue_eyes",
        ]
        assert idx["long_hair"] == 3
        assert write_tags_vocab(str(xml), str(tmp_path / "vocab.txt")) == 5
        assert (tmp_path / "vocab.txt").read_text().splitlines()[3] == "long_hair"

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i, rating in enumerate(("s", "q")):
            name = f"{rating} - {i}.png"
            PILImage.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(d / name)
            (d / (name + ".txt")).write_text("long_hair\nunknown_tag\n")
        # Malformed name (no ' - ') and missing sidecar are skipped.
        PILImage.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(d / "plain.png")
        out = str(tmp_path / "rec")
        n = convert_danbooru_folder(str(d), str(xml), out, num_shards=1)
        assert n == 2
        spec = get_dataset("danbooru_2_illust2vec",
                           vocab_file=str(tmp_path / "vocab.txt"), num_classes=5)
        item = spec.parse(TFRecordReader(list_shards(out, "train")[0])[0])
        hot = item["target"]  # classifier convention: labels ride 'target'
        assert hot.shape == (5,)
        assert hot[idx["long_hair"]] == 1.0  # vocabulary-filtered tag kept
        assert hot[:3].sum() == 1.0          # exactly one NSFWRating pseudo-tag

    def test_tagged_images_converter(self, tmp_path):
        from twingan_tpu.data.converters import convert_tagged_images
        from twingan_tpu.data.tfrecord import TFRecordReader, list_shards
        from twingan_tpu.data import get_dataset

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            PILImage.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)).save(
                d / f"p{i}.png"
            )
        tagmap = tmp_path / "tags.tsv"
        tagmap.write_text("p0.png\tblue_hair,smile\np1.png\tred_hair\n")
        out = str(tmp_path / "rec")
        n = convert_tagged_images(str(d), str(tagmap), out, num_shards=1)
        assert n == 2  # only mapped files
        spec = get_dataset("danbooru_2_illust2vec")
        item = spec.parse(TFRecordReader(list_shards(out, "train")[0])[0])
        assert str(item["label_text"]) == "blue_hair,smile"

    def test_faces_converter_runs(self, tmp_path):
        from twingan_tpu.data.converters import convert_faces_from_images

        d = tmp_path / "photos"
        d.mkdir()
        # Copy a real portrait so the detector finds a face.
        import shutil

        shutil.copy(
            "/root/reference/demo/web_interface_input/emma-watson-portrait.jpg",
            d / "face.jpg",
        )
        out = str(tmp_path / "rec")
        n = convert_faces_from_images(str(d), out, num_shards=1, min_face_hw=32)
        assert n >= 1


class TestPreprocessingFactory:
    def test_all_variants_shapes(self):
        from twingan_tpu.data.preprocessing_factory import get_preprocessing

        key = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        for name, hw in [("danbooru", 32), ("inception", 32), ("vgg", 32),
                         ("cifarnet", 32), ("lenet", 28)]:
            for training in (False, True):
                fn = get_preprocessing(name, hw, is_training=training)
                out = fn(key, imgs)
                assert out.shape[1] == hw and out.shape[2] == hw, (name, training)

    def test_inception_range_and_postprocess(self):
        from twingan_tpu.data.preprocessing_factory import get_postprocessing, get_preprocessing

        key = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        out = get_preprocessing("inception", 32)(key, imgs)
        assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
        back = get_postprocessing("inception")(out)
        assert float(back.min()) >= 0.0 and float(back.max()) <= 1.0

    def test_vgg_mean_subtraction(self):
        from twingan_tpu.data.preprocessing_factory import VGG_MEANS_RGB, get_preprocessing

        key = jax.random.PRNGKey(0)
        imgs = jnp.full((1, 64, 64, 3), 0.5, jnp.float32)
        out = get_preprocessing("vgg", 32)(key, imgs)
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), 127.5 - np.asarray(VGG_MEANS_RGB), atol=1.0
        )

    def test_cifarnet_standardized(self):
        from twingan_tpu.data.preprocessing_factory import get_preprocessing

        key = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        out = np.asarray(get_preprocessing("cifarnet", 32)(key, imgs))
        np.testing.assert_allclose(out.mean(axis=(1, 2, 3)), 0.0, atol=1e-4)

    def test_summary_writer(self, tmp_path):
        from twingan_tpu.utils.summary import SummaryWriter

        w = SummaryWriter(str(tmp_path / "logs"))
        w.scalars(1, {"loss": 0.5})
        w.images(1, "samples", np.random.RandomState(0).rand(2, 8, 8, 3))
        w.close()
        import json

        lines = open(tmp_path / "logs" / "metrics.jsonl").read().splitlines()
        assert json.loads(lines[0])["loss"] == 0.5
        # TB event file written when tf is available.
        assert any(f.startswith("events") for f in os.listdir(tmp_path / "logs"))


class TestSampleCache:
    def test_second_epoch_uses_cache(self, tmp_path, monkeypatch):
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.pipeline import TFRecordSource
        from twingan_tpu.data.tfrecord import list_shards
        from twingan_tpu.data import datasets as ds_mod

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(4):
            PILImage.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)).save(
                d / f"i{i}.png"
            )
        out = str(tmp_path / "rec")
        convert_image_folder(str(d), out, num_shards=1)
        decode_calls = {"n": 0}
        real = ds_mod._decode_image_only

        def counting(payload, spec):
            decode_calls["n"] += 1
            return real(payload, spec)

        spec = get_dataset("image_only")
        monkeypatch.setattr(spec, "decode", counting)
        src = TFRecordSource(
            spec, list_shards(out, "train"),
            PreprocessConfig(output_hw=16), batch_size=4, repeat=True,
        )
        it = iter(src)
        next(it)  # epoch 1: decodes all 4
        assert decode_calls["n"] == 4
        next(it)  # epoch 2: all cached
        assert decode_calls["n"] == 4


class TestBlurFilter:
    def test_blur_score_orders_sharp_vs_blurry(self):
        from twingan_tpu.data.converters import blur_score

        rng = np.random.RandomState(0)
        sharp = (rng.rand(64, 64, 3) * 255).astype(np.float32)
        from PIL import ImageFilter

        blurry = np.asarray(
            PILImage.fromarray(sharp.astype(np.uint8)).filter(ImageFilter.GaussianBlur(4)),
            np.float32,
        )
        assert blur_score(sharp) > blur_score(blurry) * 5

    def test_converter_min_sharpness_filters(self, tmp_path):
        from twingan_tpu.data.converters import convert_image_folder
        from PIL import ImageFilter

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        sharp = PILImage.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8))
        sharp.save(d / "sharp.png")
        sharp.filter(ImageFilter.GaussianBlur(6)).save(d / "blurry.png")
        out = str(tmp_path / "rec")
        n = convert_image_folder(str(d), out, num_shards=1, min_sharpness=100.0)
        assert n == 1


class TestSubtractMean:
    """subtract_mean: 0-255-scale minus RGB channel means (vgg19 convention,
    reference model_inheritor.py:243 + danbooru_preprocessing.py:193-196)."""

    def test_values_and_postprocess_inverse(self):
        from twingan_tpu.data.preprocess import MEAN_IMAGE_SUBTRACTION_RGB

        cfg = PreprocessConfig(output_hw=8, is_training=False, subtract_mean=True)
        imgs = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3), jnp.float32)
        out = augment_batch(jax.random.PRNGKey(0), imgs, cfg)
        expect = np.asarray(imgs) * 255.0 - np.asarray(
            MEAN_IMAGE_SUBTRACTION_RGB, np.float32
        )
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-3)
        back = postprocess_image(out, "rgb", subtract_mean=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-5)

    def test_composes_with_bgr(self):
        # Forward: subtract means (RGB order) then reverse channels; the
        # inverse must un-reverse before re-adding the means.
        cfg = PreprocessConfig(
            output_hw=8, is_training=False, subtract_mean=True, color_space="bgr"
        )
        imgs = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3), jnp.float32)
        out = augment_batch(jax.random.PRNGKey(0), imgs, cfg)
        back = postprocess_image(out, "bgr", subtract_mean=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-5)


class TestConverterFilters:
    def _danbooru_dir(self, tmp_path):
        xml = tmp_path / "tags.xml"
        xml.write_text(
            "<tags>"
            '<tag type="0" ambiguous="false" count="10" name="long_hair" id="1"/>'
            '<tag type="0" ambiguous="false" count="9" name="blue_eyes" id="2"/>'
            '<tag type="0" ambiguous="false" count="2" name="rare_tag" id="3"/>'
            "</tags>"
        )
        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        specs = [("s", "long_hair\nblue_eyes\n"), ("q", "long_hair\n"),
                 ("e", "rare_tag\n")]
        for i, (rating, tags) in enumerate(specs):
            name = f"{rating} - {i}.png"
            PILImage.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(d / name)
            (d / (name + ".txt")).write_text(tags)
        return str(d), str(xml)

    def test_safe_unsafe_only(self, tmp_path):
        """Reference do_safe_only/do_unsafe_only: rating-prefix filters
        (convert_anime_faces_from_object_detection.py:40-42,218)."""
        from twingan_tpu.data.converters import convert_danbooru_folder

        d, xml = self._danbooru_dir(tmp_path)
        assert convert_danbooru_folder(d, xml, str(tmp_path / "all"), num_shards=1) == 3
        assert convert_danbooru_folder(
            d, xml, str(tmp_path / "safe"), num_shards=1, safe_only=True) == 1
        assert convert_danbooru_folder(
            d, xml, str(tmp_path / "unsafe"), num_shards=1, unsafe_only=True) == 2

    def test_max_num_labels_most_common(self, tmp_path):
        """Reference max_num_labels: the kept vocabulary is NSFW pseudo-tags
        first, then the dataset's most common tags, capped
        (convert_danbooru_data.py:91-118)."""
        from twingan_tpu.data.converters import (
            convert_danbooru_folder,
            most_common_tags,
        )
        from twingan_tpu.data.tfrecord import TFRecordReader, list_shards
        from twingan_tpu.data.example import decode_example

        d, xml = self._danbooru_dir(tmp_path)
        # long_hair appears twice, blue_eyes once, rare_tag once (tie broken
        # by count order); cap 4 = 3 NSFW pseudo-tags + long_hair.
        vocab = most_common_tags(d, xml, 4)
        assert vocab[:3] == ["NSFWRating_s", "NSFWRating_q", "NSFWRating_e"]
        assert vocab[3] == "long_hair"
        out = str(tmp_path / "capped")
        n = convert_danbooru_folder(d, xml, out, num_shards=1, max_num_labels=4)
        # The 'e'-rated image only carried rare_tag (+ its pseudo-tag, which
        # IS in the cap), so it still converts via the pseudo-tag.
        assert n == 3
        texts = []
        for rec in TFRecordReader(list_shards(out, "train")[0]):
            feats = decode_example(rec)
            val = feats["image/class/text"]
            texts.append((val[0] if isinstance(val, list) else val).decode())
        assert not any("rare_tag" in t or "blue_eyes" in t for t in texts)
        assert any("long_hair" in t for t in texts)

    def test_max_hw_filter(self, tmp_path):
        """Reference allowed_max_hw size cap."""
        from twingan_tpu.data.converters import convert_image_folder

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        PILImage.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(d / "small.png")
        PILImage.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(d / "big.png")
        assert convert_image_folder(str(d), str(tmp_path / "rec"), num_shards=1,
                                    max_hw=32) == 1

    def test_convert_time_preprocessing(self, tmp_path):
        """Reference do_preprocessing + preprocessing_hw: images resized at
        convert time (convert_general_image_data.py:63,168)."""
        from twingan_tpu.data import get_dataset
        from twingan_tpu.data.converters import convert_image_folder
        from twingan_tpu.data.tfrecord import TFRecordReader, list_shards

        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        PILImage.fromarray((rng.rand(40, 60, 3) * 255).astype(np.uint8)).save(d / "a.png")
        out = str(tmp_path / "rec")
        assert convert_image_folder(str(d), out, num_shards=1, preprocess_hw=24) == 1
        spec = get_dataset("image_only")
        item = spec.parse(TFRecordReader(list_shards(out, "train")[0])[0])
        assert item["source"].shape[:2] == (24, 24)

    def test_image_only_custom_key(self, tmp_path):
        """Reference image_only_key_name (datasets/image_only.py:41): read
        records whose encoded image rides a non-standard feature key."""
        import io as _io

        from twingan_tpu.data import get_dataset
        from twingan_tpu.data.example import encode_example
        from twingan_tpu.data.tfrecord import TFRecordWriter

        rng = np.random.RandomState(0)
        buf = _io.BytesIO()
        PILImage.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(buf, "PNG")
        path = str(tmp_path / "x.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(encode_example({"custom/image": buf.getvalue(),
                                    "image/format": b"png"}))
        from twingan_tpu.data.tfrecord import TFRecordReader

        spec = get_dataset("image_only", image_key="custom/image")
        item = spec.parse(TFRecordReader(path)[0])
        assert item["source"].shape == (8, 8, 3)


class TestDeviceResident:
    """Device-resident dataset path (DeviceResidentSampler): batches become
    on-device gathers from HBM-resident arrays; the sample sequence must be
    bit-equal to the streaming TFRecordSource path (same seed)."""

    def _records(self, tmp_path, name, n=10, hw=12, seed=0):
        from twingan_tpu.data.converters import convert_image_folder

        d = tmp_path / name
        d.mkdir()
        rng = np.random.RandomState(seed)
        for i in range(n):
            PILImage.fromarray(
                (rng.rand(hw, hw, 3) * 255).astype(np.uint8)
            ).save(d / f"{i}.png")
        rec = str(tmp_path / f"rec_{name}")
        assert convert_image_folder(str(d), rec, split="train", num_shards=1) == n
        return rec

    def test_materialize_returns_full_arrays(self, tmp_path):
        from twingan_tpu.data.pipeline import TFRecordSource
        from twingan_tpu.data.tfrecord import list_shards

        rec = self._records(tmp_path, "a")
        spec = get_dataset("image_only", use_target=False)
        pp = PreprocessConfig(output_hw=8, resize_mode="PAD", is_training=True)
        src = TFRecordSource(spec, list_shards(rec, "train"), pp, 4, seed=7,
                             yield_uint8=True)
        arrays = src.materialize()
        assert arrays is not None
        assert arrays["source"].shape == (10, 8, 8, 3)
        assert arrays["source"].dtype == np.uint8
        # Over-budget -> refuses (fall back to streaming).
        src2 = TFRecordSource(spec, list_shards(rec, "train"), pp, 4, seed=7,
                              yield_uint8=True)
        assert src2.materialize(max_bytes=100) is None
        # RANDOM host resize -> refuses (content must differ per epoch).
        pp_r = PreprocessConfig(output_hw=8, resize_mode="RANDOM_CROP",
                                is_training=True)
        src3 = TFRecordSource(spec, list_shards(rec, "train"), pp_r, 4, seed=7,
                              yield_uint8=True)
        assert src3.materialize() is None

    def test_sampler_bit_matches_streaming(self, tmp_path):
        from twingan_tpu.data.pipeline import (
            DeviceResidentSampler, TFRecordSource,
        )
        from twingan_tpu.data.tfrecord import list_shards

        rec = self._records(tmp_path, "b")
        spec = get_dataset("image_only", use_target=False)
        pp = PreprocessConfig(output_hw=8, resize_mode="PAD", is_training=True)
        stream = TFRecordSource(spec, list_shards(rec, "train"), pp, 4,
                                seed=7, yield_uint8=True)
        it = iter(stream)
        # 7 batches crosses epoch boundaries (10 records / batch 4 = 2
        # batches per epoch with drop_remainder).
        want = np.stack([next(it)["source"] for _ in range(7)])
        mat = TFRecordSource(spec, list_shards(rec, "train"), pp, 4, seed=7,
                             yield_uint8=True)
        arrays = mat.materialize()
        sampler = DeviceResidentSampler(
            [(arrays, {"source": "source"}, 7)], batch_size=4
        )
        got = np.asarray(sampler.sample_chunk(7, 1)["source"])[:, 0]
        np.testing.assert_array_equal(want, got)
        # Only int32 indices crossed the host boundary per chunk.
        assert sampler.last_index_bytes == 7 * 4 * 4

    def test_sampler_epochs_are_permutations(self):
        from twingan_tpu.data.pipeline import DeviceResidentSampler

        arrays = {"x": np.arange(12, dtype=np.int32)}
        s = DeviceResidentSampler([(arrays, {"target": "x"}, 3)], batch_size=4)
        # 6 batches of 4 = exactly 2 epochs of n=12.
        vals = np.asarray(s.sample_chunk(6, 1)["target"]).reshape(2, 12)
        for epoch in vals:
            assert sorted(epoch.tolist()) == list(range(12))
        # Different epochs use different permutations (overwhelmingly).
        assert not np.array_equal(vals[0], vals[1])

    def test_sampler_rejects_too_small_domain(self):
        from twingan_tpu.data.pipeline import DeviceResidentSampler

        arrays = {"x": np.arange(3, dtype=np.int32)}
        with pytest.raises(ValueError, match="drop_remainder"):
            DeviceResidentSampler([(arrays, {"target": "x"}, 0)], batch_size=4)
