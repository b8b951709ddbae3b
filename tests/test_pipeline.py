"""End-to-end pipeline tests with random weights on synthetic receipts.

Without pretrained checkpoints (Google-Drive only; zero egress) the
transcripts are meaningless — these tests assert the *machinery*: shapes,
ordering, bucketing, confidence filtering, API compatibility.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.engines import CRAFT, CRNN, compare_rects, sort_rects
from lightly_ocr_tpu.ops.crop import crop_resize_batch
from lightly_ocr_tpu.pipeline import getText, prepModel, serveModel


@pytest.fixture(scope="module")
def small_cfg():
    # tiny canvas + CTC head keeps test compile times low
    return Config(
        prediction="CTC",
        transform="None",
        sequence="biLSTM",
        canvas_size=256,
        max_boxes=32,
    )


@pytest.fixture(scope="module")
def engines(small_cfg):
    return CRAFT(small_cfg), CRNN(small_cfg)


def _receipt(rng, h=200, w=150):
    img = np.full((h, w, 3), 255, np.uint8)
    # dark text-like strips
    for y in range(30, h - 20, 40):
        img[y : y + 12, 20 : w - 20] = rng.integers(0, 80, (12, w - 40, 3))
    return img


class TestCropResize:
    def test_shapes_and_values(self, rng):
        img = jnp.asarray(rng.random((60, 80)).astype(np.float32) * 255)
        rects = jnp.asarray([[10, 10, 42, 74], [0, 0, 60, 80]], jnp.int32)
        out = np.asarray(crop_resize_batch(img, rects, 32, 100))
        assert out.shape == (2, 32, 100)
        assert np.isfinite(out).all()

    def test_identity_crop(self, rng):
        # crop covering exactly the image, resized to the same size,
        # supersample=1 -> identity
        img = jnp.asarray(rng.random((32, 100)).astype(np.float32))
        rects = jnp.asarray([[0, 0, 32, 100]], jnp.int32)
        out = np.asarray(crop_resize_batch(img, rects, 32, 100, supersample=1))
        np.testing.assert_allclose(out[0], np.asarray(img), atol=1e-5)

    def test_matches_pil_roughly(self, rng):
        # Box-filter supersampling approximates PIL's scaled triangle
        # kernel; compare on smooth (text-like) content where the kernels
        # agree, not white noise where any filter difference is maximal.
        from PIL import Image

        yy, xx = np.mgrid[0:64, 0:200].astype(np.float32)
        src = (
            127 + 80 * np.sin(xx / 17.0) * np.cos(yy / 9.0)
        ).astype(np.uint8)
        rects = jnp.asarray([[0, 0, 64, 200]], jnp.int32)
        ours = np.asarray(
            crop_resize_batch(
                jnp.asarray(src, jnp.float32), rects, 32, 100, supersample=4
            )
        )[0]
        ref = np.asarray(
            Image.fromarray(src).resize((100, 32), Image.BILINEAR)
        ).astype(np.float32)
        assert np.mean(np.abs(ours - ref)) < 2.0
        assert np.max(np.abs(ours - ref)) < 12.0


class TestSortRects:
    def test_reading_order(self):
        rects = np.asarray(
            [
                [50, 10, 60, 40],  # second row
                [10, 50, 20, 80],  # first row right
                [10, 5, 20, 40],  # first row left
            ]
        )
        out = sort_rects(rects)
        np.testing.assert_array_equal(
            out, [[10, 5, 20, 40], [10, 50, 20, 80], [50, 10, 60, 40]]
        )

    def test_comparator_total(self):
        a = [0, 0, 10, 10]
        assert compare_rects(a, a) == 0
        assert compare_rects([0, 0, 5, 5], [10, 0, 20, 5]) == -1
        assert compare_rects([10, 0, 20, 5], [0, 0, 5, 5]) == 1

    def test_empty(self):
        out = sort_rects(np.zeros((0, 4), np.int32))
        assert len(out) == 0


class TestEngines:
    @pytest.mark.slow
    def test_detect_rects_shape(self, engines, rng):
        detector, _ = engines
        img = _receipt(rng)
        rects = detector.detect_rects(img)
        assert rects.ndim == 2 and rects.shape[1] == 4
        # all rects inside the image
        if len(rects):
            assert rects[:, 0].min() >= 0 and rects[:, 1].min() >= 0
            assert rects[:, 2].max() <= img.shape[0]
            assert rects[:, 3].max() <= img.shape[1]

    @pytest.mark.slow
    def test_process_returns_crops(self, engines, rng):
        detector, _ = engines
        img = _receipt(rng)
        rois = detector.process(img)
        for roi in rois:
            assert roi.ndim == 3 and roi.size > 0

    @pytest.mark.slow
    def test_recognizer_batch(self, engines, rng):
        _, recognizer = engines
        gray = rng.random((200, 150)).astype(np.float32) * 255
        rects = np.asarray([[10, 10, 40, 100], [50, 10, 80, 140]], np.int32)
        texts, confs = recognizer.process_batch(gray, rects)
        assert len(texts) == 2 and confs.shape == (2,)
        assert all(isinstance(t, str) for t in texts)
        assert (confs >= 0).all() and (confs <= 1.0 + 1e-6).all()

    def test_recognizer_empty(self, engines, rng):
        _, recognizer = engines
        texts, confs = recognizer.process_batch(
            rng.random((50, 50)).astype(np.float32), np.zeros((0, 4), np.int32)
        )
        assert texts == [] and confs.shape == (0,)

    @pytest.mark.slow
    def test_reference_style_process(self, engines, rng):
        _, recognizer = engines
        crop = (rng.random((30, 80)) * 255).astype(np.uint8)
        result = {}
        text, result = recognizer.process(result, crop)
        assert isinstance(text, str)
        assert len(result) == 1


class TestPipeline:
    @pytest.mark.slow
    def test_get_text(self, engines, rng):
        detector, recognizer = engines
        res = getText(_receipt(rng), detector, recognizer)
        assert isinstance(res, dict)
        for k, v in res.items():
            assert isinstance(k, float) and isinstance(v, str)

    @pytest.mark.slow
    def test_serve_model_threshold(self, small_cfg, rng, tmp_path, monkeypatch):
        model = serveModel(config=small_cfg, thresh=2.0)  # impossible thresh
        out = model.predict(_receipt(rng))
        assert out == []  # nothing exceeds confidence 2.0

    def test_prep_model_validates(self, small_cfg):
        import dataclasses

        with pytest.raises(Exception):
            bad = dataclasses.replace(small_cfg)
            object.__setattr__(bad, "pipeline", "YOLO-CRNN")
            prepModel(bad)
