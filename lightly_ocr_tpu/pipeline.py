"""End-to-end OCR pipeline: detect -> crop -> recognize.

Public-API parity with the reference (``ocr/pipeline.py``): ``prepModel``,
``getText``, ``serveModel`` with the same call shapes, plus the same CLI
flags (``--config/--thresh/--img/--debug``).  Differences by design:

* the entire compute path is jitted; crops are batched into one dispatch
  per box-bucket instead of the per-crop loop (``pipeline.py:74-77``);
* images are read as RGB (the reference feeds cv2's BGR into RGB-ordered
  normalization, ``pipeline.py:68`` + ``imgproc.py:19-25`` — an
  output-visible bug we fix rather than reproduce);
* ``--debug`` no longer inverts device selection (the reference sets
  ``docker = cuda_available``, forcing CPU exactly when a GPU exists,
  ``pipeline.py:123``).
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Any, Sequence

import numpy as np

from lightly_ocr_tpu.config import Config, load_config
from lightly_ocr_tpu.engines import CRAFT, CRNN, gray_from_rgb


def read_image(path: str) -> np.ndarray:
    """RGB uint8 [H, W, 3] via PIL (drops alpha, grayscale -> RGB)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img)


def prepModel(config: Config | None = None, docker: bool = False):
    """Construct (detector, recognizer) per ``config.pipeline``
    (``pipeline.py:47-62``)."""
    cfg = config or Config()
    use_detector, use_recognizer = cfg.pipeline.split("-")
    if use_detector != "CRAFT":
        raise AssertionError(f"only CRAFT is supported, got {use_detector}")
    if use_recognizer != "CRNN":
        raise AssertionError(f"only CRNN is supported, got {use_recognizer}")
    return CRAFT(cfg), CRNN(cfg)


def getText(
    image: str | np.ndarray,
    detector: CRAFT,
    recognizer: CRNN,
    write: bool = False,
    out_dir: str = "test",
) -> dict[float, str]:
    """Detect + recognize one receipt -> {confidence: text}
    (``pipeline.py:65-87`` result shape)."""
    if isinstance(image, str):
        image = read_image(image)
    rects = detector.detect_rects(image)
    gray = gray_from_rgb(image)
    texts, confs = recognizer.process_batch(gray, rects)
    res = {float(c): t for c, t in zip(confs, texts)}
    if write:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "results.txt")
        with open(path, "w") as f:
            for k, v in res.items():
                f.write(f"confidence: {k}\tprediction: {v}\n")
    return res


def get_text_detailed(
    image: np.ndarray, detector: CRAFT, recognizer: CRNN
) -> list[dict[str, Any]]:
    """Structured variant: reading-order [{text, confidence, rect}]."""
    rects = detector.detect_rects(image)
    gray = gray_from_rgb(image)
    texts, confs = recognizer.process_batch(gray, rects)
    return [
        {"text": t, "confidence": float(c), "rect": r.tolist()}
        for t, c, r in zip(texts, confs, rects)
    ]


class serveModel:
    """Reference-compatible serving wrapper (``pipeline.py:90-112``)."""

    def __init__(
        self,
        config_file: str | None = None,
        thresh: float = 0.7,
        docker: bool = False,
        config: Config | None = None,
    ):
        self.config_file = config_file
        self.thresh = float(thresh)
        self.docker = docker
        self.config = config or load_config(config_file)
        self.loadModel()

    def loadConfig(self) -> None:
        self.config = load_config(self.config_file)

    def loadModel(self) -> None:
        self.detector, self.recognizer = prepModel(self.config, self.docker)

    def predict(self, inputs: str | np.ndarray) -> list[str]:
        res = getText(inputs, self.detector, self.recognizer)
        return [v for k, v in res.items() if k > self.thresh]

    def predict_detailed(self, inputs: str | np.ndarray):
        if isinstance(inputs, str):
            inputs = read_image(inputs)
        items = get_text_detailed(inputs, self.detector, self.recognizer)
        return [it for it in items if it["confidence"] > self.thresh]


def calcTime(fn, *args, **kwargs):
    """Micro-bench helper (``pipeline.py:40-43``), returning (result,
    seconds) instead of a string."""
    start = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, time.perf_counter() - start


def main(argv: Sequence[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="TPU OCR pipeline")
    parser.add_argument("--config", default=None,
                        help="path to config.yml (defaults built in)")
    parser.add_argument("--thresh", type=float, default=0.7,
                        help="confidence threshold")
    parser.add_argument("--img", required=True, help="image to OCR")
    parser.add_argument("--debug", action="store_true",
                        help="print per-box details and timings")
    opt = parser.parse_args(argv)

    # fail fast before the (slow) model build
    if not os.path.isfile(opt.img):
        parser.error(f"image not found: {opt.img}")
    if opt.config is not None and not os.path.isfile(opt.config):
        parser.error(f"config not found: {opt.config}")

    model = serveModel(config_file=opt.config, thresh=opt.thresh)
    if opt.debug:
        items, dt = calcTime(model.predict_detailed, opt.img)
        for it in items:
            print(f"{it['rect']}\t{it['confidence']:.4f}\t{it['text']}")
        print(f"[debug] end-to-end: {dt:.3f}s ({len(items)} boxes)")
    else:
        for text in model.predict(opt.img):
            print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
