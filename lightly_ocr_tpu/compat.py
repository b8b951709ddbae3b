"""Reference-name compatibility surface.

Users of lightly-ocr import names like ``resizeAspectRatio`` from
``ocr.tools`` or ``CRAFT`` from ``ocr.net`` (``ocr/tools/__init__.py:1-8``,
``ocr/__init__.py:1-2``).  This module re-exports the TPU-native
counterparts under those exact names so a switch is a one-line import
change:

    from lightly_ocr_tpu.compat import (
        CRAFT, CRNN, prepModel, getText, serveModel,
        resizeAspectRatio, normalizeMeanVariance, getDetBoxes, ...)

Functions whose reference signatures are host/numpy-shaped get thin
adapters here; everything else aliases the native API directly.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# --- engines / pipeline (ocr/net.py, ocr/pipeline.py) ---
from lightly_ocr_tpu.engines import CRAFT, CRNN, compare_rects  # noqa: F401
from lightly_ocr_tpu.pipeline import (  # noqa: F401
    calcTime,
    getText,
    prepModel,
    serveModel,
)

# --- models (ocr/model.py, ocr/modules/*) ---
from lightly_ocr_tpu.models import (  # noqa: F401
    Attention,
    BidirectionalLSTM,
    CRNNet,
    ResNet50v2,
    TPS_STN,
    VGG_UNet,
)
from lightly_ocr_tpu.models.vgg_unet import UpConv, VggBackbone as vgg16_bn  # noqa: F401

# --- converters & metrics (ocr/tools/recog_utils.py) ---
from lightly_ocr_tpu.text.converters import (  # noqa: F401
    AttnLabelConverter,
    CTCLabelConverter,
)
from lightly_ocr_tpu.utils.metrics import Averager, edit_distance  # noqa: F401

# --- dataset / transforms (ocr/tools/dataset.py, generator.py) ---
from lightly_ocr_tpu.data.loader import (  # noqa: F401
    AlignCollate,
    RandomSequentialSampler,
)
from lightly_ocr_tpu.data.records import RecordDataset as LMDBDataset  # noqa: F401
from lightly_ocr_tpu.data.generator import (  # noqa: F401
    anno2list,
    build_records as DatasetGenerator,
    check_image_valid as checkImgValid,
)

from lightly_ocr_tpu.ops.detection import get_det_boxes as _get_det_boxes
from lightly_ocr_tpu.ops.image import (
    denormalize_mean_variance,
    normalize_mean_variance,
    plan_aspect_resize,
    resize_bilinear,
)
from lightly_ocr_tpu.pipeline import read_image as loadImage  # noqa: F401


def normalizeMeanVariance(in_img, mean=(0.485, 0.456, 0.406),
                          variance=(0.229, 0.224, 0.225)):
    """numpy-in / numpy-out (``imgproc.py:19-25``)."""
    del mean, variance  # fixed ImageNet stats, as the reference defaults
    return np.asarray(normalize_mean_variance(jnp.asarray(in_img)))


def denormalizeMeanVariance(in_img, **_):
    return np.asarray(
        denormalize_mean_variance(jnp.asarray(in_img))
    ).astype(np.uint8)


def resizeAspectRatio(img, square_size, interpolation=None, mag_ratio=1):
    """(resized canvas, ratio, heatmap size) — ``imgproc.py:38-65``."""
    h, w = img.shape[:2]
    plan = plan_aspect_resize(h, w, square_size, mag_ratio)
    content = np.asarray(
        resize_bilinear(jnp.asarray(img, jnp.float32), plan.target_h,
                        plan.target_w)
    )
    canvas = np.zeros((plan.canvas_h, plan.canvas_w, img.shape[2]), np.float32)
    canvas[: plan.target_h, : plan.target_w] = content
    return canvas, plan.ratio, (plan.heatmap_w, plan.heatmap_h)


def getDetBoxes(textmap, linkmap, text_threshold, link_threshold, low_text,
                poly=False):
    """(boxes list, polys list) — ``det_utils.py:248-256`` shape."""
    out = _get_det_boxes(
        jnp.asarray(textmap, jnp.float32),
        jnp.asarray(linkmap, jnp.float32),
        text_threshold=text_threshold,
        link_threshold=link_threshold,
        low_text=low_text,
    )
    valid = np.asarray(out.valid)
    boxes = [b for b in np.asarray(out.boxes)[valid]]
    if poly:
        from lightly_ocr_tpu.ops.poly import refine_polygon

        cid = np.asarray(out.cid)
        polys = [
            refine_polygon(b, cid, int(k))
            for k, b in zip(np.nonzero(valid)[0], boxes)
        ]
    else:
        polys = [None] * len(boxes)
    return boxes, polys


def adjustResultCoordinates(polys, ratio_w, ratio_h, ratio_net=2):
    """``det_utils.py:259-265`` semantics on a list of arrays."""
    return [
        None if p is None else np.asarray(p) * (ratio_w * ratio_net,
                                                ratio_h * ratio_net)
        for p in polys
    ]


def copyStateDict(state_dict):
    """``net.py:24-34``: strip DataParallel prefixes."""
    from lightly_ocr_tpu.utils.torch_import import strip_module_prefix

    return strip_module_prefix(state_dict)
