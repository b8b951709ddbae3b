"""Mixed-size serving: arbitrary upload resolutions, bounded programs.

The serving program's input shapes include the ORIGINAL-resolution gray
image (the recognizer crops from it, like the reference crops from the
original — ``ocr/net.py:108-111``), so without bucketing every distinct
upload size would compile its own multi-minute program.  These tests
pin the round-2 fix: uploads are zero-padded to (canvas bucket, gray
bucket) pairs, per-image resize ratios and true extents travel as
program *data*, and mixed-size batches give bit-identical results to
running each image alone.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.engines import CRAFT, CRNN
from lightly_ocr_tpu.ops.image import pick_gray_bucket
from lightly_ocr_tpu.serving.batch import BatchedOCR


def _receipt(rng, h, w):
    img = rng.integers(200, 256, (h, w, 3)).astype(np.float32)
    img[h // 4 : h // 4 + 12, 10 : w - 10] = 10.0
    img[h // 2 : h // 2 + 12, 20 : w - 20] = 10.0
    return img


def _make_ocr(cfg, probe=None):
    """Random-weight nets don't know what "text" is, so detection
    thresholds are picked from score-map quantiles of a probe image
    (same trick as test_e2e_parity) — a realistic number of components
    fire and the assertions below are non-vacuous."""
    det = CRAFT(cfg, seed=3, dtype=jnp.float32)
    if probe is not None:
        maps, ratio = det.score_maps(probe)
        h2 = int(probe.shape[0] * ratio) // 2
        w2 = int(probe.shape[1] * ratio) // 2
        region = np.asarray(maps[:h2, :w2, 0], np.float64)
        link = np.asarray(maps[:h2, :w2, 1], np.float64)
        cfg = cfg.replace(
            low_text=float(np.quantile(region, 0.86)),
            text_threshold=float(np.quantile(region, 0.93)),
            link_threshold=float(np.quantile(link, 0.90)),
        )
        det = CRAFT(cfg, variables=det.variables, dtype=jnp.float32)
    rec = CRNN(cfg, seed=7, dtype=jnp.float32)
    return BatchedOCR(
        cfg, det.variables, rec.variables, boxes_per_image=8,
        dtype=jnp.float32,
    )


def test_pick_gray_bucket():
    assert pick_gray_bucket(100, 130, 128) == (128, 256)
    assert pick_gray_bucket(128, 256, 128) == (128, 256)
    assert pick_gray_bucket(129, 1, 128) == (256, 128)


@pytest.mark.slow
def test_mixed_sizes_bounded_programs(rng):
    """N distinct upload sizes -> far fewer compiled programs than N,
    and every image gets a result."""
    cfg = Config(prediction="CTC", transform="None", max_boxes=8,
                 canvas_size=192, magnify_ratio=1.0,
                 bucket_granularity=64, gray_granularity=128)
    sizes = [(96, 120), (100, 128), (104, 116), (98, 124),
             (140, 180), (150, 170), (60, 80), (64, 90)]
    images = [_receipt(rng, h, w) for h, w in sizes]
    ocr = _make_ocr(cfg, probe=images[0])
    results = ocr.run_images(images)
    assert all(r is not None for r in results)
    # 8 distinct sizes must share a handful of (canvas, gray) buckets
    assert len(ocr._compiled) <= 4, (
        f"{len(ocr._compiled)} programs for {len(sizes)} sizes"
    )


@pytest.mark.slow
def test_mixed_batch_equals_single_runs(rng):
    """Batching mixed sizes must not change any image's output: same
    rects, texts, confidences as running each image by itself."""
    cfg = Config(prediction="CTC", transform="None", max_boxes=8,
                 canvas_size=192, magnify_ratio=1.0,
                 bucket_granularity=64, gray_granularity=128)
    images = [_receipt(rng, 96, 120), _receipt(rng, 100, 128),
              _receipt(rng, 140, 180)]
    ocr = _make_ocr(cfg, probe=images[0])
    batched = ocr.run_images(images)
    for img, got in zip(images, batched):
        (alone,) = ocr.run_images([img])
        assert len(alone) == len(got)
        for a, b in zip(alone, got):
            assert a["text"] == b["text"]
            assert a["rect"] == b["rect"]
            assert np.isclose(a["confidence"], b["confidence"], atol=1e-6)


@pytest.mark.slow
def test_padding_outside_extent_is_inert(rng):
    """Zero padding beyond an image's true extent must not create boxes
    or shift rects: same image served at two gray buckets agrees."""
    cfg_small = Config(prediction="CTC", transform="None", max_boxes=8,
                       canvas_size=192, magnify_ratio=1.0,
                       bucket_granularity=64, gray_granularity=128)
    cfg_big = cfg_small.replace(gray_granularity=512)
    img = _receipt(rng, 100, 120)
    (a,) = _make_ocr(cfg_small, probe=img).run_images([img])
    (b,) = _make_ocr(cfg_big, probe=img).run_images([img])
    assert len(a) == len(b)
    for ia, ib in zip(a, b):
        assert ia["text"] == ib["text"]
        assert ia["rect"] == ib["rect"]


@pytest.mark.slow
def test_rects_clipped_to_true_extent(rng):
    """Every returned rect lies inside the ORIGINAL image, never in the
    padded region."""
    cfg = Config(prediction="CTC", transform="None", max_boxes=8,
                 canvas_size=192, magnify_ratio=1.0,
                 bucket_granularity=64, gray_granularity=256)
    sizes = [(96, 120), (140, 180), (100, 128)]
    images = [_receipt(rng, h, w) for h, w in sizes]
    ocr = _make_ocr(cfg, probe=images[0])
    results = ocr.run_images(images)
    assert any(results), "no boxes fired on any size; retune inputs"
    for (h, w), items in zip(sizes, results):
        for it in items:
            r0, c0, r1, c1 = it["rect"]
            assert 0 <= r0 < r1 <= h
            assert 0 <= c0 < c1 <= w


@pytest.mark.slow
def test_server_predict_many_mixed(rng):
    """The serveModel wrapper routes arbitrary mixed sizes through the
    batched path in one call."""
    from lightly_ocr_tpu.serving.server import BatchedServeModel

    cfg = Config(prediction="CTC", transform="None", max_boxes=8,
                 canvas_size=192, magnify_ratio=1.0,
                 bucket_granularity=64, gray_granularity=128)
    model = BatchedServeModel(config=cfg, thresh=0.0, boxes_per_image=8)
    out = model.predict_many(
        [_receipt(rng, 96, 120), _receipt(rng, 140, 180)]
    )
    assert len(out) == 2
    assert all(isinstance(x, list) for x in out)
