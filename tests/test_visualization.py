"""Detection-visualization + label-map tests.

Mirrors the reference's visualization_utils_test.py checks (shape
preservation, pixel mutation, error cases) and label_map_util semantics on
our own compact implementation (utils/visualization.py)."""

import numpy as np
import pytest

from twingan_tpu.utils import visualization as viz
from twingan_tpu.utils.image_io import base64_to_numpy, numpy_to_base64


def _img(h=48, w=64):
    return np.full((h, w, 3), 128, np.uint8)


class TestDrawing:
    def test_box_preserves_shape_and_draws(self):
        img = _img()
        out = viz.draw_bounding_box_on_image_array(img, 0.25, 0.25, 0.75, 0.75)
        assert out.shape == (48, 64, 3)
        assert not np.all(out == 128)  # pixels changed
        # Interior stays untouched (only the frame is drawn).
        assert np.all(img[20:22, 30:32] == 128)

    def test_box_absolute_coordinates(self):
        img = _img()
        viz.draw_bounding_box_on_image_array(
            img, 10, 10, 30, 40, use_normalized_coordinates=False, thickness=1
        )
        assert not np.all(img[10, 10:41] == 128)

    def test_box_with_labels(self):
        img = _img(96, 96)
        viz.draw_bounding_box_on_image_array(
            img, 0.4, 0.1, 0.9, 0.9, display_str_list=["face: 87%"]
        )
        assert not np.all(img == 128)

    def test_boxes_batch_and_bad_shape(self):
        img = _img()
        boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]])
        viz.draw_bounding_boxes_on_image_array(img, boxes)
        assert not np.all(img == 128)
        with pytest.raises(ValueError):
            viz.draw_bounding_boxes_on_image_array(_img(), np.zeros((2, 3)))

    def test_keypoints(self):
        img = _img()
        viz.draw_keypoints_on_image_array(img, [(0.5, 0.5), (0.25, 0.75)])
        assert not np.all(img == 128)
        # Keypoint at a corner must not crash (clamping).
        viz.draw_keypoints_on_image_array(img, [(0.0, 0.0), (1.0, 1.0)])

    def test_mask_blend_and_errors(self):
        img = _img()
        mask = np.zeros((48, 64), np.uint8)
        mask[:10, :10] = 1
        viz.draw_mask_on_image_array(img, mask, color=(255, 0, 0), alpha=0.5)
        assert not np.all(img[:10, :10] == 128)
        assert np.all(img[20:, 20:] == 128)  # untouched outside the mask
        with pytest.raises(ValueError):
            viz.draw_mask_on_image_array(_img(), np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            viz.draw_mask_on_image_array(_img(), np.zeros((48, 64), np.float32))

    def test_visualize_boxes_threshold_and_scores(self):
        idx = {1: {"id": 1, "name": "face"}}
        img = _img()
        boxes = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]])
        viz.visualize_boxes_and_labels_on_image_array(
            img, boxes, np.array([1, 1]), np.array([0.9, 0.1]), idx
        )
        changed = img != 128
        # High-score box drawn, low-score (0.1 < 0.5 thresh) suppressed:
        assert changed[:30, :30].any() and not changed[30:, 40:].any()
        # scores=None draws every box (groundtruth mode).
        img2 = _img()
        viz.visualize_boxes_and_labels_on_image_array(
            img2, boxes, np.array([1, 1]), None, idx
        )
        assert (img2 != 128)[30:, 40:].any()


class TestLabelMap:
    PBTXT = """
item {
  id: 1
  name: 'face'
  display_name: "human face"
}
item {
  id: 2
  name: 'cat'
}
"""

    def test_load_and_categories(self, tmp_path):
        p = tmp_path / "labels.pbtxt"
        p.write_text(self.PBTXT)
        lm = viz.load_labelmap(str(p))
        assert lm == [
            {"id": 1, "name": "face", "display_name": "human face"},
            {"id": 2, "name": "cat"},
        ]
        cats = viz.convert_label_map_to_categories(lm, max_num_classes=2)
        assert cats == [{"id": 1, "name": "human face"}, {"id": 2, "name": "cat"}]
        cats_raw = viz.convert_label_map_to_categories(
            lm, max_num_classes=2, use_display_name=False
        )
        assert cats_raw[0]["name"] == "face"
        # max_num_classes filters out-of-range ids.
        assert viz.convert_label_map_to_categories(lm, 1) == [
            {"id": 1, "name": "human face"}
        ]
        idx = viz.create_category_index(cats)
        assert idx[2]["name"] == "cat"

    def test_invalid_id_raises(self, tmp_path):
        p = tmp_path / "bad.pbtxt"
        p.write_text("item { id: 0 name: 'background' }")
        with pytest.raises(ValueError):
            viz.load_labelmap(str(p))


class TestBase64RoundTrip:
    def test_round_trip(self):
        img = (np.random.RandomState(0).rand(20, 24, 3) * 255).astype(np.uint8)
        uri = numpy_to_base64(img)
        assert uri.startswith("data:image/PNG;base64,")
        back = base64_to_numpy(uri)
        np.testing.assert_array_equal(back, img)

    def test_accepts_raw_base64(self):
        img = np.zeros((8, 8, 3), np.uint8)
        raw = numpy_to_base64(img).split(",", 1)[1]
        np.testing.assert_array_equal(base64_to_numpy(raw), img)


class TestMarkFace:
    def test_mark_face_no_face(self):
        from twingan_tpu.serve.face_detection import FaceDetector

        det = FaceDetector()
        img = np.zeros((64, 64, 3), np.uint8)
        marked, found = det.mark_face(img)
        assert marked.shape == img.shape and marked.dtype == np.uint8
        assert found is False
        np.testing.assert_array_equal(marked, img)  # nothing drawn
        assert marked is not img  # a copy, input untouched
