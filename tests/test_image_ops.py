import numpy as np
import pytest

from lightly_ocr_tpu.ops import (
    adjust_box_coordinates,
    denormalize_mean_variance,
    make_detector_input,
    normalize_mean_variance,
    pick_canvas_bucket,
    plan_aspect_resize,
    resize_bilinear,
    resize_normalize,
    rgb_to_gray,
)

cv2 = pytest.importorskip("cv2")


def _ref_normalize(img):
    # Reference normalizeMeanVariance math (imgproc.py:19-25)
    mean = np.array([0.485 * 255, 0.456 * 255, 0.406 * 255], np.float32)
    var = np.array([0.229 * 255, 0.224 * 255, 0.225 * 255], np.float32)
    return (img.astype(np.float32) - mean) / var


def test_normalize_matches_reference(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(normalize_mean_variance(img)), _ref_normalize(img), rtol=1e-6
    )


def test_denormalize_roundtrip(rng):
    # (x - 255m)/(255v) == (x/255 - m)/v, so denormalize inverts normalize.
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.float32)
    back = np.asarray(denormalize_mean_variance(normalize_mean_variance(img)))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_rgb_to_gray_matches_pil(rng):
    from PIL import Image

    img = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    pil_gray = np.asarray(Image.fromarray(img).convert("L"))
    ours = np.asarray(rgb_to_gray(img.astype(np.float32)))
    # PIL truncates to uint8; allow 1 LSB
    assert np.max(np.abs(ours - pil_gray.astype(np.float32))) <= 1.0


class TestPlanAspectResize:
    def test_matches_reference_formula(self):
        # 600x400 image, mag 1.5 -> target 900, ratio 1.5
        plan = plan_aspect_resize(600, 400, square_size=1280, mag_ratio=1.5)
        assert plan.target_h == 900 and plan.target_w == 600
        assert plan.canvas_h == 928 and plan.canvas_w == 608  # ceil to /32
        assert plan.ratio == pytest.approx(1.5)
        assert (plan.heatmap_h, plan.heatmap_w) == (464, 304)

    def test_cap_at_square_size(self):
        plan = plan_aspect_resize(2000, 1000, square_size=1280, mag_ratio=1.5)
        assert max(plan.target_h, plan.target_w) == 1280
        assert plan.ratio == pytest.approx(1280 / 2000)

    def test_exact_multiple_no_pad(self):
        plan = plan_aspect_resize(64, 32, square_size=1280, mag_ratio=1.0)
        assert plan.canvas_h == 64 and plan.canvas_w == 32

    def test_static_bucket(self):
        plan = plan_aspect_resize(
            600, 400, mag_ratio=1.5, canvas_bucket=(1024, 768)
        )
        assert (plan.canvas_h, plan.canvas_w) == (1024, 768)
        # content bigger than bucket gets shrunk to fit
        plan2 = plan_aspect_resize(
            600, 400, mag_ratio=1.5, canvas_bucket=(512, 512)
        )
        assert plan2.target_h <= 512 and plan2.target_w <= 512

    def test_bucket_quantization(self):
        b = pick_canvas_bucket(600, 400)
        assert b[0] % 256 == 0 and b[1] % 256 == 0
        assert b[0] >= 928 and b[1] >= 608


def test_resize_bilinear_matches_cv2(rng):
    img = rng.random((40, 60, 3)).astype(np.float32) * 255
    ours = np.asarray(resize_bilinear(img, 25, 37))
    ref = cv2.resize(img, (37, 25), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_make_detector_input_geometry(rng):
    img = rng.integers(0, 256, (100, 80, 3)).astype(np.float32)
    plan = plan_aspect_resize(100, 80, mag_ratio=1.5)
    canvas, valid = make_detector_input(img, plan)
    assert canvas.shape == (plan.canvas_h, plan.canvas_w, 3)
    assert valid.tolist() == [plan.target_h, plan.target_w]
    # padding area equals normalized zero
    pad_val = _ref_normalize(np.zeros((1, 1, 3), np.float32))[0, 0]
    np.testing.assert_allclose(
        np.asarray(canvas)[plan.target_h + 1 :, :, :],
        np.broadcast_to(
            pad_val, (plan.canvas_h - plan.target_h - 1, plan.canvas_w, 3)
        ),
        atol=1e-5,
    )


def test_resize_normalize_matches_pil(rng):
    from PIL import Image

    crop = rng.integers(0, 256, (48, 160)).astype(np.uint8)
    pil = Image.fromarray(crop).resize((100, 32), Image.BICUBIC)
    ref = (np.asarray(pil, dtype=np.float32) / 255.0 - 0.5) / 0.5
    ours = np.asarray(resize_normalize(crop[None].astype(np.float32)))[0, ..., 0]
    assert ours.shape == ref.shape
    # PIL's incremental uint8 rounding vs float path: allow loose tolerance
    assert np.mean(np.abs(ours - ref)) < 0.02
    assert np.max(np.abs(ours - ref)) < 0.15


def test_resize_normalize_range(rng):
    crop = rng.integers(0, 256, (2, 20, 50)).astype(np.float32)
    out = np.asarray(resize_normalize(crop))
    assert out.shape == (2, 32, 100, 1)
    assert out.min() >= -1.05 and out.max() <= 1.05


def test_adjust_box_coordinates():
    boxes = np.array([[[10.0, 20.0], [30.0, 40.0]]])
    out = np.asarray(adjust_box_coordinates(boxes, ratio_w=0.5, ratio_h=0.25))
    np.testing.assert_allclose(out, [[[10.0, 10.0], [30.0, 20.0]]])
