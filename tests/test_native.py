"""Native C++ post-processing vs cv2 and vs the reference det_utils."""
import importlib.util
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and not os.path.isfile(
        os.path.join(os.path.dirname(__file__), "..", "native",
                     "libpostproc.so")
    ),
    reason="no C++ toolchain and no prebuilt library",
)

from lightly_ocr_tpu import native_postproc  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_postproc.available():
        pytest.skip("native library unavailable")


def test_label_components_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    mask = (rng.random((80, 100)) > 0.7).astype(np.uint8)
    n_ref, ref = cv2.connectedComponents(mask, connectivity=4)
    n_ours, ours = native_postproc.label_components(mask)
    assert n_ours == n_ref
    fg = mask.astype(bool)
    pairs = set(zip(ref[fg].tolist(), ours[fg].tolist()))
    assert len(pairs) == n_ref - 1
    assert len({p[1] for p in pairs}) == n_ref - 1


def test_det_boxes_matches_reference(rng):
    cv2 = pytest.importorskip("cv2")
    ref_path = "/root/reference/ocr/tools/det_utils.py"
    if not os.path.isfile(ref_path):
        pytest.skip("reference mount absent")
    spec = importlib.util.spec_from_file_location("ref_det_utils", ref_path)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_detection import box_iou, synthetic_maps

    for seed in range(4):
        r = np.random.default_rng(seed)
        textmap, linkmap = synthetic_maps(r)
        ref_boxes, _ = ref_mod.getDetBoxes(
            textmap, linkmap, 0.7, 0.4, 0.4, poly=False
        )
        ours = native_postproc.det_boxes(textmap, linkmap, 0.7, 0.4, 0.4)
        assert len(ours) == len(ref_boxes)
        ious = []
        used = set()
        for rb in ref_boxes:
            best, best_iou = None, 0.0
            for i, mb in enumerate(ours):
                if i in used:
                    continue
                iou = box_iou(np.asarray(rb, np.float64),
                              mb.astype(np.float64))
                if iou > best_iou:
                    best, best_iou = i, iou
            used.add(best)
            ious.append(best_iou)
        # native path should be essentially exact vs the cv2 reference
        assert np.min(ious) >= 0.985, (seed, ious)


def test_det_boxes_empty():
    z = np.zeros((32, 32), np.float32)
    out = native_postproc.det_boxes(z, z)
    assert out.shape == (0, 4, 2)


def test_det_boxes_shape_validation():
    with pytest.raises(ValueError):
        native_postproc.det_boxes(
            np.zeros((4, 4), np.float32), np.zeros((5, 5), np.float32)
        )


def test_matches_device_version(rng):
    """Native host path and on-device path agree on box geometry."""
    import jax.numpy as jnp

    from lightly_ocr_tpu.ops.detection import get_det_boxes

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_detection import box_iou, synthetic_maps

    textmap, linkmap = synthetic_maps(rng)
    native = native_postproc.det_boxes(textmap, linkmap, 0.7, 0.4, 0.4)
    dev = get_det_boxes(jnp.asarray(textmap), jnp.asarray(linkmap))
    dev_boxes = np.asarray(dev.boxes)[np.asarray(dev.valid)]
    assert len(native) == len(dev_boxes)
    for nb, db in zip(
        sorted(native.tolist(), key=lambda b: (b[0][1], b[0][0])),
        sorted(dev_boxes.tolist(), key=lambda b: (b[0][1], b[0][0])),
    ):
        iou = box_iou(np.asarray(nb), np.asarray(db))
        assert iou >= 0.97, iou
