"""The compat surface must expose every reference public name."""
import numpy as np
import pytest


def test_all_reference_names_importable():
    from lightly_ocr_tpu import compat

    # ocr/__init__.py + ocr/net.py + ocr/pipeline.py surface
    for name in [
        "CRAFT", "CRNN", "prepModel", "getText", "serveModel", "calcTime",
        "copyStateDict", "compare_rects",
        # ocr/model.py + ocr/modules surface
        "VGG_UNet", "CRNNet", "TPS_STN", "Attention", "BidirectionalLSTM",
        "ResNet50v2", "UpConv", "vgg16_bn",
        # ocr/tools surface
        "resizeAspectRatio", "normalizeMeanVariance",
        "denormalizeMeanVariance", "getDetBoxes", "adjustResultCoordinates",
        "CTCLabelConverter", "AttnLabelConverter", "Averager",
        "edit_distance", "AlignCollate", "RandomSequentialSampler",
        "LMDBDataset", "loadImage",
        # ocr/tools/generator.py surface
        "anno2list", "DatasetGenerator", "checkImgValid",
    ]:
        assert hasattr(compat, name), name


def test_resize_aspect_ratio_shapes(rng):
    from lightly_ocr_tpu.compat import resizeAspectRatio

    img = rng.integers(0, 255, (100, 80, 3)).astype(np.float32)
    canvas, ratio, heat = resizeAspectRatio(img, 1280, mag_ratio=1.5)
    assert canvas.shape == (160, 128, 3)
    assert ratio == pytest.approx(1.5)
    assert heat == (64, 80)


def test_normalize_numpy_io(rng):
    from lightly_ocr_tpu.compat import (
        denormalizeMeanVariance,
        normalizeMeanVariance,
    )

    img = rng.integers(0, 255, (8, 8, 3)).astype(np.float32)
    normed = normalizeMeanVariance(img)
    assert isinstance(normed, np.ndarray)
    back = denormalizeMeanVariance(normed)
    np.testing.assert_allclose(back, img, atol=1.0)


@pytest.mark.slow
def test_get_det_boxes_list_api(rng):
    from lightly_ocr_tpu.compat import adjustResultCoordinates, getDetBoxes

    t = np.zeros((60, 60), np.float32)
    t[10:25, 10:50] = 0.9
    boxes, polys = getDetBoxes(t, np.zeros_like(t), 0.7, 0.4, 0.4)
    assert len(boxes) == 1 and polys == [None]
    adj = adjustResultCoordinates(boxes, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(adj[0]), np.asarray(boxes[0]))


def test_copy_state_dict():
    from lightly_ocr_tpu.compat import copyStateDict

    sd = {"module.a.weight": 1, "module.b.bias": 2}
    out = copyStateDict(sd)
    assert set(out) == {"a.weight", "b.bias"}
