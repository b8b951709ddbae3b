"""Polygon refinement vs the reference poly_core (cv2 oracle)."""
import importlib.util
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lightly_ocr_tpu.ops.poly import (  # noqa: E402
    perspective_transform,
    refine_polygon,
    warp_nearest,
)

REF = "/root/reference/ocr/tools/det_utils.py"
pytestmark = [pytest.mark.parity, pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference mount absent"
)]


def _ref():
    spec = importlib.util.spec_from_file_location("ref_det_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_perspective_transform_matches_cv2(rng):
    src = np.asarray([[3, 4], [80, 2], [85, 40], [1, 38]], np.float32)
    dst = np.asarray([[0, 0], [82, 0], [82, 38], [0, 38]], np.float32)
    ref = cv2.getPerspectiveTransform(src, dst)
    ours = perspective_transform(src, dst)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_warp_nearest_matches_cv2(rng):
    labels = rng.integers(0, 5, (40, 60)).astype(np.int32)
    src = np.asarray([[2, 3], [55, 1], [58, 37], [0, 39]], np.float32)
    dst = np.asarray([[0, 0], [50, 0], [50, 36], [0, 36]], np.float32)
    M = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(
        labels, M, (50, 36), flags=cv2.INTER_NEAREST
    )
    ours = warp_nearest(labels, M, 50, 36)
    # nearest rounding at pixel boundaries can differ on a thin seam
    assert (ours == ref).mean() > 0.97


def _curved_word(H=80, W=220):
    """A banana-shaped word blob: labels map with component 1."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    center = 40 + 12 * np.sin((xx - 10) / 60.0)
    mask = (np.abs(yy - center) < 9) & (xx > 10) & (xx < W - 10)
    return mask.astype(np.int32)


def test_refine_polygon_on_curved_text():
    labels = _curved_word()
    ys, xs = np.nonzero(labels)
    box = np.asarray(
        [
            [xs.min(), ys.min()],
            [xs.max(), ys.min()],
            [xs.max(), ys.max()],
            [xs.min(), ys.max()],
        ],
        np.float32,
    )
    poly = refine_polygon(box, labels, 1)
    assert poly is not None
    assert poly.shape == (14, 2)
    # polygon must hug the curve better than the box: its mean |y - curve|
    xs_p = poly[:, 0]
    top = poly[: poly.shape[0] // 2]
    curve = 40 + 12 * np.sin((top[:, 0] - 10) / 60.0)
    assert np.mean(np.abs(top[:, 1] - curve)) < 25

    # behavior parity with the reference on the same inputs
    ref_mod = _ref()
    ref_polys = ref_mod.poly_core(
        [box], labels, [1], np.zeros_like(labels, np.float32)
    )
    if ref_polys[0] is not None:
        np.testing.assert_allclose(poly, ref_polys[0], atol=2.5)


def test_refine_polygon_gapped_word_close_to_reference():
    """A word with a multi-strip gap exercises the lagging strip counter;
    our strip anchors average cleanly where the reference keeps raw sums
    in rare paths, so allow a loose tolerance."""
    H, W = 80, 240
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    center = 40 + 10 * np.sin((xx - 5) / 55.0)
    mask = (np.abs(yy - center) < 8) & (xx > 4) & (xx < W - 4)
    mask[:, 100:148] = False
    labels = mask.astype(np.int32)
    ys, xs = np.nonzero(labels)
    box = np.asarray(
        [
            [xs.min(), ys.min()],
            [xs.max(), ys.min()],
            [xs.max(), ys.max()],
            [xs.min(), ys.max()],
        ],
        np.float32,
    )
    ref_polys = _ref().poly_core(
        [box], labels, [1], np.zeros_like(labels, np.float32)
    )
    ours = refine_polygon(box, labels, 1)
    assert (ours is None) == (ref_polys[0] is None)
    if ours is not None:
        assert ours.shape == ref_polys[0].shape
        np.testing.assert_allclose(ours, ref_polys[0], atol=6.0)


def test_refine_polygon_straight_text_rejected():
    # straight word: contour height ~ box height -> None (keep rect)
    labels = np.zeros((40, 120), np.int32)
    labels[10:30, 10:110] = 1
    box = np.asarray([[10, 10], [109, 10], [109, 29], [10, 29]], np.float32)
    ref_mod = _ref()
    ref_polys = ref_mod.poly_core(
        [box], labels, [1], np.zeros_like(labels, np.float32)
    )
    assert refine_polygon(box, labels, 1) is None
    assert ref_polys[0] is None


def test_small_box_rejected():
    labels = np.ones((8, 8), np.int32)
    box = np.asarray([[0, 0], [5, 0], [5, 5], [0, 5]], np.float32)
    assert refine_polygon(box, labels, 1) is None
