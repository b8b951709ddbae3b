"""Scripted walkthrough (counterpart of the reference's playground
notebook, ``ocr/noteboooks/playground.ipynb``): build the serving model,
OCR a synthetic receipt, inspect the param trees, run the batched path.

    JAX_PLATFORMS=cpu python examples/quickstart.py     # CPU demo
    python examples/quickstart.py                       # on TPU
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_receipt(path: str) -> str:
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (300, 400), (250, 248, 245))
    d = ImageDraw.Draw(img)
    lines = ["LIGHTLY MART", "apples  3.50", "bread   2.20", "total   5.70"]
    for i, line in enumerate(lines):
        d.text((30, 40 + i * 60), line, fill=(20, 20, 20))
    img.save(path)
    return path


def main() -> int:
    import jax

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.pipeline import serveModel

    # 1) build the serving model (drop reference .pth files into
    #    save_models/ for real predictions; random weights otherwise)
    cfg = Config(prediction="CTC", transform="None", canvas_size=512)
    model = serveModel(config=cfg, thresh=0.0)

    # 2) inspect the recognizer's param tree
    params = model.recognizer.variables["params"]
    n_params = sum(
        int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params)
    )
    print(f"recognizer params: {n_params/1e6:.1f} M")

    # 3) OCR an image
    path = make_receipt("/tmp/quickstart_receipt.png")
    items = model.predict_detailed(path)
    print(f"{len(items)} boxes above threshold")
    for it in items[:5]:
        print(f"  {it['rect']}  {it['confidence']:.3f}  {it['text']!r}")

    # 4) reading-order API (reference getText shape)
    from lightly_ocr_tpu.pipeline import getText

    res = getText(path, model.detector, model.recognizer)
    print("getText ->", dict(list(res.items())[:3]))

    # 5) beam-search decoding (beyond parity; greedy is the default).
    # Attention head: attn_decode="beam"; CTC head: ctc_decode="beam",
    # optionally with a [C, C] shallow-fusion transition log-prior
    # saved as .npy and named by ctc_lm_path (server: --lm PRIOR_NPY):
    #   cfg = Config(prediction="CTC", ctc_decode="beam", beam_width=8,
    #                ctc_lm_path="receipt_prior.npy")
    #   rec = CRNN(cfg); texts, posteriors = rec.recognize_crops(crops)
    # see tests/test_beam_search.py, ops/ctc.py and models/decode.py.
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
