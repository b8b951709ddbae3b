"""Test-only loader for the reference PyTorch models (the parity oracle).

Imports the reference sources from /root/reference/ocr (read-only mount)
so parity tests compare against the *actual* reference computation with
shared random weights.  torchvision is not installed in this image, so a
minimal stub providing ``models.vgg16_bn(pretrained=False).features`` (the
standard VGG16-BN feature stack) is injected first — the reference only
uses torchvision to fetch pretrained weights, which we never do in tests.

Everything here is gated: tests skip if the reference mount is absent.
"""
from __future__ import annotations

import sys
import types

REFERENCE_OCR = "/root/reference/ocr"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    vggmod = types.ModuleType("torchvision.models.vgg")
    vggmod.model_urls = {"vgg16_bn": "https://invalid.local/vgg16_bn.pth"}

    def _make_features():
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers += [
                    tnn.Conv2d(in_ch, v, kernel_size=3, padding=1),
                    tnn.BatchNorm2d(v),
                    tnn.ReLU(inplace=True),
                ]
                in_ch = v
        return tnn.Sequential(*layers)

    class _VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = _make_features()

    def vgg16_bn(pretrained=False, **kw):
        assert not pretrained, "stub cannot fetch pretrained weights"
        return _VGG()

    models.vgg16_bn = vgg16_bn
    models.vgg = vggmod
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.vgg"] = vggmod


_cache = {}


def load_reference():
    """Returns (model_module, modules_package) from the reference repo."""
    if "model" in _cache:
        return _cache["model"], _cache["modules"]
    _install_torchvision_stub()
    if REFERENCE_OCR not in sys.path:
        sys.path.insert(0, REFERENCE_OCR)
    import modules  # noqa: F401  (reference package)
    import model  # noqa: F401  (reference module)

    _cache["model"] = model
    _cache["modules"] = modules
    return model, modules


def reference_config(prediction: str = "CTC", transform: str = "TPS") -> dict:
    """A reference-shaped CONFIG dict for CRNNet construction."""
    num_classes = 37 if prediction == "CTC" else 38
    return {
        "transform": transform,
        "backbone": "ResNet",
        "sequence": "biLSTM",
        "prediction": prediction,
        "num_fiducial": 20,
        "height": 32,
        "width": 100,
        "input_channel": 1,
        "output_channel": 512,
        "hidden_size": 256,
        "num_classes": num_classes,
        "batch_max_len": 25,
    }


def _install_aux_stubs():
    """lmdb / skimage.io / torchvision.transforms stand-ins for the
    reference's ``tools`` package.  Only ``transforms.ToTensor`` is
    actually executed on the paths the parity tests drive (inside
    ``ResizeNormalize``); lmdb/skimage are import-time-only here."""
    import numpy as np
    import torch

    if "lmdb" not in sys.modules:
        lmdb = types.ModuleType("lmdb")
        lmdb.open = None  # only LMDBDataset uses it; never constructed
        sys.modules["lmdb"] = lmdb

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        io_mod = types.ModuleType("skimage.io")

        def _imread(path):
            from PIL import Image

            return np.asarray(Image.open(path))

        io_mod.imread = _imread
        sk.io = io_mod
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = io_mod

    tvm = sys.modules.get("torchvision")
    if tvm is not None and not hasattr(tvm, "transforms"):
        tfm = types.ModuleType("torchvision.transforms")

        class ToTensor:
            """PIL image -> float tensor [C, H, W] in [0, 1] (the exact
            torchvision semantics ResizeNormalize relies on)."""

            def __call__(self, pic):
                arr = np.asarray(pic, dtype=np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr.copy()).permute(2, 0, 1)
                return t.to(torch.float32).div(255.0)

        tfm.ToTensor = ToTensor
        tvm.transforms = tfm
        sys.modules["torchvision.transforms"] = tfm


def load_reference_engines():
    """Returns (net, pipeline, tools) — the reference's engine/pipeline
    layer (``ocr/net.py``, ``ocr/pipeline.py``).  Unlike
    :func:`load_reference` this pulls in cv2/PIL-based pre/post glue, so
    callers should monkeypatch ``net.MODEL_PATH`` to a writable dir with
    seeded ``CRAFT.pth``/``CRNN.pth`` before constructing engines (their
    ctors call ``load()``)."""
    if "net" in _cache:
        return _cache["net"], _cache["pipeline"], _cache["tools"]
    load_reference()  # stub + sys.path
    _install_aux_stubs()
    import net  # noqa: F401
    import pipeline  # noqa: F401
    import tools  # noqa: F401

    _cache["net"] = net
    _cache["pipeline"] = pipeline
    _cache["tools"] = tools
    return net, pipeline, tools


def reference_rects(ref_det, image):
    """The reference detector's rect extraction in reading order
    (``net.py:100-111``: preproc -> forward -> getCoords ->
    ``compare_rects`` sort), capturing rects instead of crops.  One
    definition shared by the golden-parity tests and
    ``scripts/validate_reference_weights.py`` so the oracle protocol
    cannot drift between them."""
    from functools import cmp_to_key

    import torch

    _, _, ref_tools = load_reference_engines()
    with torch.no_grad():
        im_tensor, rw, rh = ref_det.preproc(image)
        y, _ = ref_det.net(im_tensor)
        score_text = y[0, :, :, 0].cpu().data.numpy()
        score_link = y[0, :, :, 1].cpu().data.numpy()
        rects = ref_det.getCoords([score_text, score_link], rw, rh)
    return sorted(rects, key=cmp_to_key(ref_tools.compare_rects))


def clip_rects(rects, h, w):
    """Rects -> float64 array clipped to the image extent (rows then
    cols) — the shared post-step both consumers apply before IoU."""
    import numpy as _np

    out = _np.asarray(rects, _np.float64)
    out[:, 0::2] = _np.clip(out[:, 0::2], 0, h)
    out[:, 1::2] = _np.clip(out[:, 1::2], 0, w)
    return out
