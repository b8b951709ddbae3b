"""Vectorized host decode (`BatchedOCR.decode`) equals the per-box
converter decode it replaced (decode_trimmed / decode_padded)."""
import numpy as np
import pytest

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.serving.batch import BatchedOCR


def _make(prediction):
    cfg = Config(prediction=prediction, transform="None", sequence="biLSTM",
                 character="abcdefghij", batch_max_len=8, max_boxes=6)
    # decode touches neither the program nor the weights
    return BatchedOCR(cfg, {}, {}, boxes_per_image=6)


@pytest.mark.parametrize("prediction", ["Attention", "CTC"])
def test_vectorized_decode_matches_converter(prediction):
    ocr = _make(prediction)
    rng = np.random.default_rng(0)
    B, M, T = 3, 6, 10
    n = ocr.converter.num_classes
    idx = rng.integers(0, n, (B, M, T)).astype(np.int32)
    # force interesting structure: repeats, blanks/EOS runs, no-EOS rows
    idx[0, 0] = 0
    idx[0, 1, :] = idx[0, 1, 0]
    idx[1, 2, 0] = 1  # EOS/blank-ish at position 0
    idx[2, 3] = np.maximum(idx[2, 3], 2)  # attention: no EOS anywhere
    out = {
        "valid": rng.random((B, M)) > 0.3,
        "pred_idx": idx,
        "confidence": rng.random((B, M)).astype(np.float32),
        "rects": rng.random((B, M, 4)).astype(np.float32),
    }
    got = ocr.decode(out)
    conv = ocr.converter
    for b in range(B):
        ms = np.nonzero(out["valid"][b])[0]
        assert len(got[b]) == len(ms)
        for item, m in zip(got[b], ms):
            if prediction == "CTC":
                want = conv.decode_padded(idx[b, m][None])[0]
            else:
                want = conv.decode_trimmed(idx[b, m][None])[0]
            assert item["text"] == want, (b, m, item["text"], want)
            assert item["confidence"] == pytest.approx(
                float(out["confidence"][b, m])
            )
