"""TPU-only end-to-end gates for the production serving graph.

Everything else in ``tests/`` runs on the CPU backend, where the fused
Pallas detector tail resolves OFF (`BatchedOCR._fused_kernel_plan` is
TPU-gated) — so the default-on fused path had no pytest coverage, only
ad-hoc check scripts.  This test runs ONLY when the session backend is
a real TPU: the conftest forces CPU unless ``LIGHTLY_OCR_TEST_TPU=1``
is set, so from an axon session run

    LIGHTLY_OCR_TEST_TPU=1 python -m pytest tests/test_tpu_serving.py -m ''

It asserts the fused serving program agrees
with the plain-flax program end to end: same boxes, same transcripts,
same confidences, on the same BatchedOCR inputs.

Small canvas (192 -> H/2 = 96, rows=24) keeps the tunnel compiles to
~1 min each.
"""
import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="fused-tail serving path only activates on a TPU backend",
    ),
]


def _build(monkeypatch, enable_fused: str):
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    monkeypatch.setenv("LIGHTLY_OCR_ENABLE_FUSED", enable_fused)
    cfg = Config(
        prediction="CTC",
        transform="None",
        max_boxes=4,
        canvas_size=192,
        quant_int8=False,
    )
    det_vars = VGG_UNet().init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rec_vars = CRNNet(cfg, dtype=jnp.float32).init(
        jax.random.key(1),
        jnp.zeros((2, cfg.height, cfg.width, 1), jnp.float32),
        None,
        False,
    )
    return BatchedOCR(
        cfg, det_vars, rec_vars, boxes_per_image=cfg.max_boxes
    )


def test_fused_and_plain_serving_agree(monkeypatch):
    rng = np.random.default_rng(11)
    # two tiny "receipts": dark blobs on light ground so the random-
    # weight detector produces SOME foreground structure
    imgs = (rng.uniform(0.6, 1.0, (2, 120, 80, 3)) * 255).astype(np.uint8)
    imgs[0, 30:50, 10:60] = 20
    imgs[1, 60:80, 20:70] = 35

    ocr_plain = _build(monkeypatch, "none")
    assert ocr_plain._fused_kernel_plan(192, 128) == (
        False, False, False, False,
    )
    out_plain = ocr_plain.run_images(list(imgs))

    ocr_fused = _build(monkeypatch, "tail")
    # the plan must actually resolve the tail ON for this test to gate
    # anything — guard against silent fallbacks
    assert ocr_fused._fused_kernel_plan(192, 128) == (
        False, True, False, False,
    )
    out_fused = ocr_fused.run_images(list(imgs))

    assert len(out_plain) == len(out_fused) == 2
    for items_p, items_f in zip(out_plain, out_fused):
        assert len(items_p) == len(items_f)
        for p, f in zip(items_p, items_f):
            assert p["text"] == f["text"]
            np.testing.assert_allclose(
                p["confidence"], f["confidence"], rtol=1e-2, atol=1e-3
            )
            np.testing.assert_allclose(p["rect"], f["rect"], atol=1.0)


def test_s2d_serving_agrees(monkeypatch):
    """The default serving plan (tail + s2d stem) reads the same text
    as the unfused graph on hardware (fg-mask identity at the bench
    shape is gated by scripts/check_s2d_hw.py; this gates the full
    serving chain end-to-end at a small shape)."""
    rng = np.random.default_rng(13)
    imgs = (rng.uniform(0.6, 1.0, (2, 120, 80, 3)) * 255).astype(np.uint8)
    imgs[0, 30:50, 10:60] = 20
    imgs[1, 60:80, 20:70] = 35

    ocr_plain = _build(monkeypatch, "none")
    out_plain = ocr_plain.run_images(list(imgs))

    ocr_s2d = _build(monkeypatch, "tail,s2d")
    plan = ocr_s2d._fused_kernel_plan(192, 128)
    assert plan[1] is True and plan[3] is True
    out_s2d = ocr_s2d.run_images(list(imgs))

    assert len(out_plain) == len(out_s2d) == 2
    for items_p, items_f in zip(out_plain, out_s2d):
        assert len(items_p) == len(items_f)
        for p, f in zip(items_p, items_f):
            assert p["text"] == f["text"]
