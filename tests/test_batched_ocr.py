"""BatchedOCR program semantics, esp. the original-image crop source.

The reference crops recognizer inputs from the ORIGINAL image
(``net.py:108-111``).  The batched program must match — in particular at
``plan.ratio < 1`` (receipt larger than the canvas cap), where cropping
from the canvas would resample twice and drift from the unbatched path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models.crnn import CRNNet
from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
from lightly_ocr_tpu.ops.crop import crop_resize_normalize_matmul
from lightly_ocr_tpu.ops.image import (
    pick_canvas_bucket,
    plan_aspect_resize,
    rgb_to_gray,
)
from lightly_ocr_tpu.serving.batch import BatchedOCR

pytestmark = pytest.mark.slow  # two full-program CPU compiles


def _cfg(canvas_size):
    return Config(
        prediction="CTC",
        transform="None",
        sequence="biLSTM",
        output_channel=64,
        hidden_size=32,
        max_boxes=8,
        character="abcdefghij",
        batch_max_len=8,
        canvas_size=canvas_size,
        bucket_granularity=32,
        # quantile-free thresholds that fire on random-weight score maps
        low_text=-0.05,
        text_threshold=0.0,
        link_threshold=10.0,
    )


def _receipt(rng, h, w):
    g = np.full((h, w), 220.0)
    for _ in range(6):
        wh = int(rng.integers(12, max(13, h // 6)))
        ww = int(rng.integers(24, max(25, w // 2)))
        r = int(rng.integers(4, h - wh - 4))
        c = int(rng.integers(4, w - ww - 4))
        g[r : r + wh, c : c + ww] = rng.random((wh, ww)) * 90
    return np.stack([g, g, g], -1).astype(np.uint8)


@pytest.mark.parametrize("case", ["magnified", "oversized"])
def test_batched_crops_come_from_original_image(rng, case):
    """Batched recognizer outputs == recognizing crops taken straight
    from the original-resolution gray at the program's own rects."""
    h, w = (120, 90) if case == "magnified" else (320, 260)
    canvas_size = 1280 if case == "magnified" else 256
    cfg = _cfg(canvas_size)
    image = _receipt(rng, h, w)

    plan = plan_aspect_resize(
        h, w, cfg.canvas_size, cfg.magnify_ratio,
        canvas_bucket=pick_canvas_bucket(
            h, w, cfg.canvas_size, cfg.magnify_ratio,
            granularity=cfg.bucket_granularity,
        ),
    )
    if case == "oversized":
        assert plan.ratio < 1.0, "case must exercise the downscale branch"
    else:
        assert plan.ratio > 1.0

    det_net = VGG_UNet(dtype=jnp.float32)
    det_vars = det_net.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    rec_net = CRNNet(cfg, dtype=jnp.float32)
    rec_vars = rec_net.init(
        jax.random.key(1),
        jnp.zeros((2, cfg.height, cfg.width, 1), jnp.float32),
        None,
        False,
    )
    ocr = BatchedOCR(
        cfg, det_vars, rec_vars, boxes_per_image=cfg.max_boxes,
        dtype=jnp.float32,
    )
    out_lists = ocr.run_images([image, image])
    out = ocr(
        *_prep(ocr, [image, image], plan)
    )
    rects = np.asarray(out["rects"])  # [2, M, 4] ORIGINAL-image coords
    valid = np.asarray(out["valid"])
    assert valid.any(), "no boxes fired; test inputs need retuning"

    # original-image coordinate sanity: inside the image, not the canvas
    for b in range(2):
        for m in np.nonzero(valid[b])[0]:
            r0, c0, r1, c1 = rects[b, m]
            assert 0 <= r0 < r1 <= h and 0 <= c0 < c1 <= w

    # recognizer-input parity: recognize the SAME rects cropped from the
    # original gray with the unbatched op — pred indices must be equal
    gray = jnp.asarray(rgb_to_gray(jnp.asarray(image, jnp.float32)))
    f_rec = jax.jit(lambda v, x: rec_net.apply(v, x, None, False))
    for b in range(2):
        pick = np.nonzero(valid[b])[0]
        crops = crop_resize_normalize_matmul(
            gray,
            jnp.asarray(rects[b, pick], jnp.float32),
            cfg.height,
            cfg.width,
            "cubic",
        )
        preds = f_rec(rec_vars, crops)
        idx = np.asarray(jnp.argmax(preds, axis=2))
        np.testing.assert_array_equal(
            idx, np.asarray(out["pred_idx"])[b, pick]
        )

    # run_images agrees with the raw program outputs
    for b in range(2):
        texts = [it["text"] for it in out_lists[b]]
        assert len(texts) == valid[b].sum()


def _prep(ocr, images, plan):
    from lightly_ocr_tpu.ops.image import make_detector_input

    canv, grays = [], []
    for img in images:
        c, _ = make_detector_input(jnp.asarray(img, jnp.float32), plan)
        canv.append(c)
        grays.append(rgb_to_gray(jnp.asarray(img, jnp.float32)))
    return jnp.stack(canv), jnp.stack(grays), 1.0 / plan.ratio
