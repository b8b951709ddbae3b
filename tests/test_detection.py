"""On-device box extraction vs the reference cv2 implementation.

The oracle is the reference's own ``det_utils.getDetBoxes`` (loaded
standalone — it only needs cv2/numpy), run on the same synthetic score
maps.  Parity target: >=99% IoU per matched box (BASELINE.md).
"""
import importlib.util
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lightly_ocr_tpu.ops.detection import (  # noqa: E402
    boxes_to_rects,
    get_det_boxes,
    label_components,
)

REF = "/root/reference/ocr/tools/det_utils.py"
pytestmark = [pytest.mark.parity, pytest.mark.skipif(
    not os.path.isfile(REF), reason="reference mount absent"
)]


def _load_ref_det_utils():
    spec = importlib.util.spec_from_file_location("ref_det_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def synthetic_maps(rng, H=120, W=160, n_words=6):
    """Gaussian word blobs + link bridges, CRAFT-like."""
    textmap = np.zeros((H, W), np.float32)
    linkmap = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for _ in range(n_words):
        cy = rng.uniform(15, H - 15)
        cx = rng.uniform(20, W - 20)
        n_chars = rng.integers(2, 5)
        sx, sy = rng.uniform(3, 5), rng.uniform(3, 5)
        spacing = sx * 2.2
        for i in range(n_chars):
            ccx = cx + (i - (n_chars - 1) / 2) * spacing
            g = np.exp(
                -(((xx - ccx) ** 2) / (2 * sx**2) + ((yy - cy) ** 2) / (2 * sy**2))
            )
            textmap = np.maximum(textmap, g)
            if i > 0:
                lcx = ccx - spacing / 2
                gl = np.exp(
                    -(
                        ((xx - lcx) ** 2) / (2 * (sx * 0.7) ** 2)
                        + ((yy - cy) ** 2) / (2 * (sy * 0.7) ** 2)
                    )
                )
                linkmap = np.maximum(linkmap, gl)
    return textmap, linkmap


def box_iou(a, b):
    """IoU of two 4-point polygons via rasterization."""
    H = int(max(a[:, 1].max(), b[:, 1].max())) + 8
    W = int(max(a[:, 0].max(), b[:, 0].max())) + 8
    ma = np.zeros((H, W), np.uint8)
    mb = np.zeros((H, W), np.uint8)
    cv2.fillPoly(ma, [np.round(a).astype(np.int32)], 1)
    cv2.fillPoly(mb, [np.round(b).astype(np.int32)], 1)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return inter / max(union, 1)


class TestLabelComponents:
    def test_matches_cv2_partition(self, rng):
        mask = (rng.random((64, 80)) > 0.72).astype(np.uint8)
        n_ref, ref_labels = cv2.connectedComponents(mask, connectivity=4)
        ours = np.asarray(label_components(jnp.asarray(mask.astype(bool)),
                                           max_rounds=64))
        # same partition: bijection between label values on foreground
        fg = mask.astype(bool)
        pairs = set(zip(ref_labels[fg].tolist(), ours[fg].tolist()))
        assert len(pairs) == n_ref - 1  # each cv2 label maps to one of ours
        assert len({p[1] for p in pairs}) == n_ref - 1

    def test_empty_and_full(self):
        empty = np.asarray(label_components(jnp.zeros((8, 8), bool)))
        assert (empty == 64).all()
        full = np.asarray(label_components(jnp.ones((8, 8), bool)))
        assert (full == 0).all()

    def test_l_shape(self):
        m = np.zeros((16, 16), bool)
        m[2:12, 3] = True
        m[11, 3:14] = True
        out = np.asarray(label_components(jnp.asarray(m)))
        vals = set(out[m].tolist())
        assert len(vals) == 1


class TestGetDetBoxes:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_iou_parity_with_reference(self, seed):
        rng = np.random.default_rng(seed)
        ref_mod = _load_ref_det_utils()
        textmap, linkmap = synthetic_maps(rng)

        ref_boxes, _ = ref_mod.getDetBoxes(
            textmap, linkmap, text_threshold=0.7, link_threshold=0.4,
            low_text=0.4, poly=False,
        )
        out = get_det_boxes(jnp.asarray(textmap), jnp.asarray(linkmap))
        mine = np.asarray(out.boxes)[np.asarray(out.valid)]

        assert len(mine) == len(ref_boxes), (len(mine), len(ref_boxes))
        # order-independent greedy matching by IoU
        used = set()
        ious = []
        for rb in ref_boxes:
            best, best_iou = None, 0.0
            for i, mb in enumerate(mine):
                if i in used:
                    continue
                iou = box_iou(np.asarray(rb, np.float64), mb.astype(np.float64))
                if iou > best_iou:
                    best, best_iou = i, iou
            assert best is not None
            used.add(best)
            ious.append(best_iou)
        assert np.mean(ious) >= 0.99, ious
        assert np.min(ious) >= 0.97, ious

    @pytest.mark.slow
    def test_empty_maps(self):
        z = jnp.zeros((40, 40), jnp.float32)
        out = get_det_boxes(z, z, max_boxes=16)
        assert not bool(out.valid.any())

    @pytest.mark.slow
    def test_small_component_filtered(self):
        t = np.zeros((40, 40), np.float32)
        t[5:7, 5:8] = 0.9  # area 6 < 10
        out = get_det_boxes(
            jnp.asarray(t), jnp.zeros_like(jnp.asarray(t)), max_boxes=16
        )
        assert not bool(out.valid.any())

    def test_low_peak_filtered(self):
        t = np.zeros((40, 40), np.float32)
        t[5:15, 5:25] = 0.5  # above low_text, below text_threshold
        out = get_det_boxes(
            jnp.asarray(t), jnp.zeros_like(jnp.asarray(t)), max_boxes=16
        )
        assert not bool(out.valid.any())

    def test_row_crowded_with_components(self):
        """Candidate extraction is two-level (per-row leftmost-J roots,
        J=32, then a global top-K2): a row whose TOPMOST pixels start
        more components than J keeps the leftmost J — bounded overflow,
        like the K2 cap itself.  40 components all rooted on one row:
        the leftmost 32 must come through; nothing crashes or aliases."""
        t = np.zeros((64, 512), np.float32)
        for i in range(40):  # 4px-wide blobs, 8px apart, area 16 >= 10
            t[5:9, 4 + 12 * i : 8 + 12 * i] = 0.9
        out = get_det_boxes(
            jnp.asarray(t), jnp.zeros_like(jnp.asarray(t)), max_boxes=64
        )
        n = int(np.asarray(out.valid).sum())
        assert n == 32, f"expected leftmost 32 of 40 crowded roots, got {n}"
        # and the kept boxes are the LEFTMOST ones
        rects = np.asarray(out.boxes)[np.asarray(out.valid)]
        assert rects[..., 0].max() < 4 + 12 * 32

    def test_boxes_to_rects_layout(self):
        boxes = jnp.asarray(
            [[[2.0, 3.0], [10.0, 3.0], [10.0, 7.0], [2.0, 7.0]]]
        )
        rects = np.asarray(
            boxes_to_rects(boxes, jnp.asarray([True]), 0.5, 0.5)
        )
        # scale x2 net ratio * 0.5 => identity; layout (row0, col0, row1, col1)
        np.testing.assert_array_equal(rects[0], [3, 2, 7, 10])
