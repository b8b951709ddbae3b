"""Inference engines: CRAFT detector and CRNN recognizer.

The TPU rebuild of the reference's engine layer (``ocr/net.py:37-193``).
Same responsibilities — model + weights + pre/post glue behind
``load()`` / ``process()`` — but the compute path is jitted XLA end to
end, with static canvas/box buckets so repeated calls reuse compiled
programs:

* ``CRAFT.process(image)`` -> detected rects (and optionally crops),
  replacing: host resize -> torch forward -> .cpu() -> cv2 CC loop
  (``net.py:100-113``).  Here: device canvas -> VGG-UNet -> on-device box
  extraction -> rects; a single host sync at the end.
* ``CRNN.process_batch(image, rects)`` -> texts + confidences for ALL
  rects in one dispatch, replacing the per-crop batch-1 loop
  (``net.py:152-193``).

Weights: loads reference ``.pth`` checkpoints via the torch importer when
present (``save_models/CRAFT.pth``/``CRNN.pth`` as in ``net.py:19,40,
120``), falls back to orbax-native checkpoints, else random init.
"""
from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.models.crnn import CRNNet
from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
from lightly_ocr_tpu.ops.crop import crop_resize_normalize_matmul
from lightly_ocr_tpu.ops.detection import boxes_to_rects, get_det_boxes
from lightly_ocr_tpu.ops.image import (
    make_detector_input,
    pick_canvas_bucket,
    plan_aspect_resize,
    rgb_to_gray,
)
from lightly_ocr_tpu.text.converters import build_converter
from lightly_ocr_tpu.utils.torch_import import (
    import_torch_state_dict,
    load_torch_checkpoint,
)

_BOX_BUCKETS = (8, 16, 32, 64, 128, 256)


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def compare_rects(a, b) -> int:
    """Reading-order comparator for rects (row0, col0, row1, col1) —
    behavior of ``det_utils.compare_rects`` (``det_utils.py:8-26``):
    fully-above sorts first, then leftmost start, topmost, smaller."""
    if a[2] <= b[0]:
        return -1
    if b[2] <= a[0]:
        return 1
    for i in (1, 0, 3, 2):
        if a[i] != b[i]:
            return -1 if a[i] < b[i] else 1
    return 0


def sort_rects(rects: np.ndarray) -> np.ndarray:
    import functools as _ft

    idx = sorted(range(len(rects)), key=_ft.cmp_to_key(
        lambda i, j: compare_rects(rects[i], rects[j])
    ))
    return rects[np.asarray(idx, dtype=np.int64)] if len(rects) else rects


class CRAFT:
    """Detector engine (counterpart of ``net.py:37-113``)."""

    def __init__(
        self,
        cfg: Config | None = None,
        variables: dict | None = None,
        model_path: str | None = None,
        seed: int = 0,
        dtype: Any = jnp.float32,
    ):
        self.cfg = cfg or Config()
        self.net = VGG_UNet(dtype=dtype, quant=self.cfg.quant_int8)
        self.variables = variables
        self.model_path = model_path
        self.load(seed)

    def load(self, seed: int = 0) -> None:
        if self.variables is not None:
            return
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        template = self.net.init(jax.random.key(seed), dummy)
        path = self.model_path or os.path.join(self.cfg.pretrained, "CRAFT.pth")
        if os.path.isfile(path):
            self.variables = import_torch_state_dict(
                template, load_torch_checkpoint(path)
            )
        else:
            self.variables = template

    @functools.cached_property
    def _forward(self):
        net = self.net

        @functools.partial(jax.jit, static_argnames=())
        def forward(variables, canvas):
            y, _ = net.apply(variables, canvas[None])
            return y[0]

        return forward

    @functools.cached_property
    def _detect(self):
        cfg = self.cfg
        net = self.net

        @jax.jit
        def detect(variables, canvas):
            y, _ = net.apply(variables, canvas[None])
            det = get_det_boxes(
                y[0, :, :, 0],
                y[0, :, :, 1],
                text_threshold=cfg.text_threshold,
                link_threshold=cfg.link_threshold,
                low_text=cfg.low_text,
                max_boxes=cfg.max_boxes,
                cc_rounds=cfg.cc_max_iters,
            )
            return det.boxes, det.valid

        return detect

    def score_maps(self, image: np.ndarray) -> tuple[np.ndarray, float]:
        """-> (region/affinity maps [h, w, 2], content ratio)."""
        plan = self._plan(image)
        canvas, _ = make_detector_input(jnp.asarray(image, jnp.float32), plan)
        y = self._forward(self.variables, canvas)
        return np.asarray(y), plan.ratio

    def _plan(self, image: np.ndarray):
        h, w = image.shape[:2]
        bucket = pick_canvas_bucket(
            h, w, self.cfg.canvas_size, self.cfg.magnify_ratio,
            granularity=self.cfg.bucket_granularity,
        )
        return plan_aspect_resize(
            h, w, self.cfg.canvas_size, self.cfg.magnify_ratio,
            canvas_bucket=bucket,
        )

    def detect_rects(self, image: np.ndarray) -> np.ndarray:
        """[N, 4] rects (row0, col0, row1, col1) in image coords, reading
        order, clipped to the image."""
        plan = self._plan(image)
        canvas, _ = make_detector_input(jnp.asarray(image, jnp.float32), plan)
        boxes, valid = self._detect(self.variables, canvas)
        inv = 1.0 / plan.ratio
        rects = boxes_to_rects(boxes, valid, inv, inv)
        rects = np.asarray(rects)[np.asarray(valid)]
        h, w = image.shape[:2]
        rects[:, 0::2] = np.clip(rects[:, 0::2], 0, h)
        rects[:, 1::2] = np.clip(rects[:, 1::2], 0, w)
        rects = rects[(rects[:, 2] > rects[:, 0]) & (rects[:, 3] > rects[:, 1])]
        return sort_rects(rects)

    def process(self, image: np.ndarray) -> list[np.ndarray]:
        """Reference-compatible API: ROI crops in reading order
        (``net.py:100-113``)."""
        return [
            image[r[0] : r[2], r[1] : r[3]] for r in self.detect_rects(image)
        ]

    def detect_polygons(self, image: np.ndarray):
        """Boxes + (if ``cfg.enable_poly``) refined curved-text polygons.

        Note: the reference computes polys but a bug overwrites them with
        the boxes before use (``net.py:87``), so its output never reflects
        them; this API exposes the intended behavior.  Returns
        (boxes [N,4,2] image coords, polys list of [14,2]|None).
        """
        from lightly_ocr_tpu.ops.poly import refine_polygon

        plan = self._plan(image)
        canvas, _ = make_detector_input(jnp.asarray(image, jnp.float32), plan)
        y, _ = self.net.apply(self.variables, canvas[None])
        y = np.asarray(y[0], np.float32)
        det = get_det_boxes(
            jnp.asarray(y[..., 0]),
            jnp.asarray(y[..., 1]),
            text_threshold=self.cfg.text_threshold,
            link_threshold=self.cfg.link_threshold,
            low_text=self.cfg.low_text,
            max_boxes=self.cfg.max_boxes,
            cc_rounds=self.cfg.cc_max_iters,
        )
        valid = np.asarray(det.valid)
        boxes_hm = np.asarray(det.boxes)[valid]
        polys = [None] * len(boxes_hm)
        if self.cfg.enable_poly:
            cid = np.asarray(det.cid)
            polys = [
                refine_polygon(b, cid, int(k))
                for k, b in zip(np.nonzero(valid)[0], boxes_hm)
            ]
        scale = 2.0 / plan.ratio  # heatmap -> original image
        boxes = boxes_hm * scale
        polys = [None if p is None else p * scale for p in polys]
        return boxes, polys


class CRNN:
    """Recognizer engine (counterpart of ``net.py:116-193``)."""

    def __init__(
        self,
        cfg: Config | None = None,
        variables: dict | None = None,
        model_path: str | None = None,
        seed: int = 0,
        dtype: Any = jnp.float32,
    ):
        self.cfg = cfg or Config()
        self.net = CRNNet(self.cfg, dtype=dtype, quant=self.cfg.quant_int8)
        self.converter = build_converter(self.cfg.prediction, self.cfg.character)
        self.variables = variables
        self.model_path = model_path
        self.load(seed)

    def load(self, seed: int = 0) -> None:
        if self.variables is not None:
            return
        cfg = self.cfg
        dummy = jnp.zeros(
            (1, cfg.height, cfg.width, cfg.derived_input_channel), jnp.float32
        )
        text = jnp.zeros((1, cfg.num_steps), jnp.int32)
        template = self.net.init(jax.random.key(seed), dummy, text, False)
        path = self.model_path or os.path.join(self.cfg.pretrained, "CRNN.pth")
        if os.path.isfile(path):
            self.variables = import_torch_state_dict(
                template, load_torch_checkpoint(path)
            )
        else:
            self.variables = template

    @functools.cached_property
    def _recognize(self):
        from lightly_ocr_tpu.models.decode import decode_crops, load_lm_prior

        cfg = self.cfg
        net = self.net
        lm = load_lm_prior(cfg)

        @jax.jit
        def recognize(variables, crops):
            """crops [K, H, W, 1] in [-1, 1] -> (indices [K, S],
            confidence [K]) per cfg's decode mode — the shared
            ``models/decode.py`` implementation (same semantics as the
            batched serving program by construction)."""
            return decode_crops(net, variables, crops, cfg, lm)

        return recognize

    @functools.cached_property
    def _crop_and_recognize(self):
        recognize = self._recognize

        @functools.partial(jax.jit, static_argnames=())
        def run(variables, gray, rects):
            crops = crop_resize_normalize_matmul(
                gray, rects, kernel="cubic"
            )
            return recognize(variables, crops)

        return run

    def decode(self, idx: np.ndarray) -> list[str]:
        if self.cfg.prediction == "CTC":
            if self.cfg.ctc_decode == "beam":
                # beam output is already a final label sequence —
                # CTC-collapsing again would eat genuine double letters
                return self.converter.decode_labels(idx)
            return self.converter.decode_padded(idx)
        return self.converter.decode_trimmed(idx)

    def process_batch(
        self, image_gray: jax.Array, rects: np.ndarray
    ) -> tuple[list[str], np.ndarray]:
        """All rects in one (bucketed) dispatch -> (texts, confidences)."""
        n = len(rects)
        if n == 0:
            return [], np.zeros((0,), np.float32)
        bucket = _bucket_for(n, _BOX_BUCKETS)
        padded = np.zeros((bucket, 4), np.int32)
        padded[:n] = rects
        padded[n:] = [0, 0, 1, 1]  # degenerate but valid rects
        idx, conf = self._crop_and_recognize(
            self.variables, jnp.asarray(image_gray), jnp.asarray(padded)
        )
        texts = self.decode(np.asarray(idx[:n]))
        return texts, np.asarray(conf[:n])

    def recognize_crops(self, crops: jax.Array) -> tuple[list[str], np.ndarray]:
        """crops [K, 32, 100, 1] normalized -> (texts, confidences)."""
        idx, conf = self._recognize(self.variables, jnp.asarray(crops))
        return self.decode(np.asarray(idx)), np.asarray(conf)

    def process(self, result: dict, image: np.ndarray):
        """Reference-compatible per-crop API (``net.py:174-193``): gray
        uint8 crop -> updates ``result[confidence] = text``."""
        from lightly_ocr_tpu.ops.image import resize_normalize

        crop = resize_normalize(
            jnp.asarray(image, jnp.float32)[None],
            self.cfg.height,
            self.cfg.width,
        )
        texts, conf = self.recognize_crops(crop)
        result[float(conf[0])] = texts[0]
        return texts[0], result


def gray_from_rgb(image: np.ndarray) -> np.ndarray:
    """Host helper: HxWx3 RGB -> HxW luma float32."""
    return np.asarray(rgb_to_gray(jnp.asarray(image, jnp.float32)))
