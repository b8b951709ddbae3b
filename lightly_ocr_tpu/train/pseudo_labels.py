"""CRAFT pseudo-labels: word-level boxes -> character-level supervision.

The CRAFT recipe trains on CHARACTER gaussians, but real detection data
(ICDAR-style) ships only WORD boxes + transcripts.  The original paper
splits words with a watershed over the interim model's region scores;
this module implements the TPU-friendly host-side equivalent used for
bootstrap: **projection-profile splitting** — ink valleys between
characters are found in the word crop's column profile, snapped near the
uniform grid (the paper's own fallback when model confidence is low).

Pipeline:
    word rect + transcript
      -> :func:`char_boxes_from_word`   (profile-valley char rects)
      -> :func:`render_craft_targets`   (half-res region/affinity maps)
      -> :func:`batches_from_records`   (records-backed training batches
                                         for ``train_craft``)

Detection samples live in the same LOR1 container as recognition data
(``data/records.py``): the label field holds JSON
``{"words": [{"rect": [r0,c0,r1,c1], "text": "..."}]}`` and the image
field a PNG.  This closes the reference's unticked detector-training
TODO (``/root/reference/README.md:110``) end-to-end: real word-box data
in, trainable gaussian supervision out.
"""
from __future__ import annotations

import io
import json
from typing import Any, Iterator, Sequence

import numpy as np

from lightly_ocr_tpu.train.craft import _paste_gaussian

# numpy mirror of ops.image.normalize_mean_variance (host data path)
_MEAN = np.asarray((0.485, 0.456, 0.406), np.float32) * 255.0
_VAR = np.asarray((0.229, 0.224, 0.225), np.float32) * 255.0


def _ink_profile(crop: np.ndarray) -> np.ndarray:
    """Column-wise darkness of a gray word crop, smoothed.

    High where strokes are, low in inter-character gaps.  The paper
    reference is the 90th-percentile brightness (NOT the median — in a
    dense word most pixels ARE ink, which would zero the profile)."""
    paper = np.percentile(crop, 90)
    ink = np.maximum(0.0, paper - crop.astype(np.float32))
    p = ink.sum(axis=0)
    if p.size >= 3:  # 3-tap box smooth kills single-column speckle
        p = np.convolve(p, np.ones(3, np.float32) / 3.0, mode="same")
    return p


def char_boxes_from_word(
    gray: np.ndarray, rect: Sequence[float], text: str
) -> np.ndarray:
    """Split one word rect into per-character rects.

    ``gray`` is the FULL image [H, W]; ``rect`` = (r0, c0, r1, c1) in
    image coords; ``text`` fixes the character count.  Splits start on
    the uniform grid and snap to the deepest ink valley within a
    +/- width/(3n) window — degrading gracefully to the uniform split on
    flat profiles (the CRAFT paper's low-confidence fallback).
    Returns [n, 4] rects (r0, c0, r1, c1), n = max(len(text), 1).
    """
    h, w = gray.shape
    r0 = int(np.clip(np.floor(rect[0]), 0, h - 1))
    c0 = int(np.clip(np.floor(rect[1]), 0, w - 1))
    r1 = int(np.clip(np.ceil(rect[2]), r0 + 1, h))
    c1 = int(np.clip(np.ceil(rect[3]), c0 + 1, w))
    n = max(len(text), 1)
    width = c1 - c0
    if n == 1 or width < 2 * n:
        edges = np.linspace(c0, c1, n + 1)
    else:
        profile = _ink_profile(gray[r0:r1, c0:c1])
        # tiny distance penalty toward the uniform anchor: a flat
        # profile (no visible gaps) degrades to the EXACT uniform
        # split instead of argmin's first-index bias
        span = float(profile.max() - profile.min())
        edges = [float(c0)]
        win = max(1, width // (3 * n))
        for i in range(1, n):
            u = c0 + width * i / n  # uniform anchor
            lo = int(max(u - win - c0, 1))
            hi = int(min(u + win - c0 + 1, width - 1))
            if hi <= lo:
                edges.append(u)
                continue
            pos = np.arange(lo, hi, dtype=np.float32)
            penalty = (span + 1.0) * 0.02 * np.abs(pos - (u - c0)) / win
            valley = lo + int(np.argmin(profile[lo:hi] + penalty))
            edges.append(float(c0 + valley))
        edges.append(float(c1))
        edges = np.maximum.accumulate(np.asarray(edges))  # keep monotone
    boxes = np.empty((n, 4), np.float32)
    for i in range(n):
        boxes[i] = (r0, edges[i], r1, edges[i + 1])
    return boxes


def render_craft_targets(
    h2: int, w2: int, words_char_boxes: Sequence[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Character rects (image coords) -> half-res region/affinity maps.

    Region: one gaussian per character box.  Affinity: one gaussian per
    adjacent in-word character pair, spanning the rows (10% expanded)
    and the columns between the two character centers — the same
    geometry ``synthesize_batch`` trains on, so records-backed and
    synthetic training are interchangeable.
    """
    region = np.zeros((h2, w2), np.float32)
    affinity = np.zeros((h2, w2), np.float32)
    for char_boxes in words_char_boxes:
        prev = None
        for r0, c0, r1, c1 in np.asarray(char_boxes, np.float32):
            _paste_gaussian(region, r0 / 2, c0 / 2, r1 / 2, c1 / 2)
            center = ((r0 + r1) / 2, (c0 + c1) / 2)
            if prev is not None:
                # inner-quarter span (see craft.synthesize_batch): a
                # center-to-center blob leaves region/affinity >0.4
                # zones only marginally touching once the prediction
                # fits the target sharply, and word CCs split at wide
                # char pairs; reaching 1/4 into each char guarantees
                # threshold-zone overlap (region ~0.46 at the 1/4
                # point of its gaussian).
                (pc, pw), hh = prev, r1 - r0
                _paste_gaussian(
                    affinity,
                    (r0 - 0.1 * hh) / 2,
                    (pc[1] - 0.25 * pw) / 2,
                    (r1 + 0.1 * hh) / 2,
                    (center[1] + 0.25 * (c1 - c0)) / 2,
                )
            prev = (center, c1 - c0)
    return region, affinity


# ---------------------------------------------------------------------------
# Detection records (LOR1 container, JSON word annotations)
# ---------------------------------------------------------------------------


def write_detection_records(path: str, samples: Iterator[tuple]) -> int:
    """``samples`` yields (rgb_uint8 [H,W,3] | PNG bytes, words) where
    ``words`` = [{"rect": [r0,c0,r1,c1], "text": str}, ...]."""
    from lightly_ocr_tpu.data.records import RecordWriter

    n = 0
    with RecordWriter(path) as wr:
        for image, words in samples:
            if isinstance(image, np.ndarray):
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(image.astype(np.uint8)).save(buf, "PNG")
                image = buf.getvalue()
            wr.add(json.dumps({"words": list(words)}), image)
            n += 1
    return n


def _decode_sample(label: str, blob: bytes) -> tuple[np.ndarray, list]:
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    return img, json.loads(label)["words"]


def sample_to_training_item(
    image: np.ndarray,
    words: list,
    height: int,
    width: int,
) -> dict[str, np.ndarray]:
    """One annotated image -> normalized canvas + pseudo-label targets.

    The image is resized (plain, per-axis — training canvases need no
    aspect bookkeeping; boxes scale with it), characters are split on
    the RESIZED gray so profile valleys line up with what the net sees.
    """
    from PIL import Image

    h0, w0 = image.shape[:2]
    sy, sx = height / h0, width / w0
    resized = np.asarray(
        Image.fromarray(image.astype(np.uint8)).resize(
            (width, height), Image.BILINEAR
        ),
        np.float32,
    )
    gray = resized @ np.asarray([0.299, 0.587, 0.114], np.float32)
    char_boxes = []
    for wd in words:
        r0, c0, r1, c1 = wd["rect"]
        rect = (r0 * sy, c0 * sx, r1 * sy, c1 * sx)
        char_boxes.append(char_boxes_from_word(gray, rect, wd["text"]))
    region, affinity = render_craft_targets(
        height // 2, width // 2, char_boxes
    )
    return {
        "image": (resized - _MEAN) / _VAR,
        "region": region,
        "affinity": affinity,
    }


def batches_from_records(
    path: str,
    batch: int,
    height: int,
    width: int,
    rng: np.random.Generator,
) -> Iterator[dict[str, np.ndarray]]:
    """Endless shuffled batches shaped exactly like ``synthesize_batch``
    output, so ``train_craft(records=...)`` is a drop-in swap."""
    from lightly_ocr_tpu.data.records import RecordDataset

    ds = RecordDataset(path, filtering=False)
    if len(ds) == 0:
        raise ValueError(f"{path}: empty detection record file")
    while True:
        idx = rng.integers(0, len(ds), size=batch)
        images = np.empty((batch, height, width, 3), np.float32)
        region = np.empty((batch, height // 2, width // 2), np.float32)
        affinity = np.empty_like(region)
        for j, i in enumerate(idx):
            item = sample_to_training_item(
                *_decode_sample(*ds.raw(int(i))), height, width
            )
            images[j] = item["image"]
            region[j] = item["region"]
            affinity[j] = item["affinity"]
        yield {"images": images, "region": region, "affinity": affinity}


def eval_region_iou(
    model: Any,
    state: Any,
    batch: dict[str, np.ndarray],
    thresh: float = 0.35,
) -> float:
    """IoU of the thresholded predicted region map vs the target —
    the records-backed training progress metric."""
    import jax.numpy as jnp

    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["images"]),
        False,
        mutable=[],
    )
    maps = np.asarray(out[0], np.float32)
    pred = maps[..., 0] > thresh
    tgt = batch["region"] > thresh
    inter = float(np.sum(pred & tgt))
    union = float(np.sum(pred | tgt))
    return inter / union if union else 0.0
