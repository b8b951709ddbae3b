"""Matmul-based crop/resize: PIL-kernel parity and edge semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from lightly_ocr_tpu.ops.crop import (
    crop_resize_matmul,
    crop_resize_normalize_matmul,
)

from PIL import Image


pytestmark = pytest.mark.parity

@pytest.mark.parametrize(
    "rect", [[0, 0, 64, 200], [5, 11, 49, 170], [30, 150, 62, 199]]
)
def test_triangle_matches_pil_bilinear(rng, rect):
    src = rng.integers(0, 255, (64, 200)).astype(np.uint8)
    crop = src[rect[0] : rect[2], rect[1] : rect[3]]
    ours = np.asarray(
        crop_resize_matmul(
            jnp.asarray(src, jnp.float32),
            jnp.asarray([rect], jnp.float32),
            32, 100, "triangle",
        )
    )[0]
    ref = np.asarray(
        Image.fromarray(crop).resize((100, 32), Image.BILINEAR)
    ).astype(np.float32)
    # within PIL's intermediate uint8 rounding, even on white noise
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_cubic_close_to_pil_bicubic(rng):
    src = rng.integers(0, 255, (64, 200)).astype(np.uint8)
    ours = np.asarray(
        crop_resize_matmul(
            jnp.asarray(src, jnp.float32),
            jnp.asarray([[0, 0, 64, 200]], jnp.float32),
            32, 100, "cubic",
        )
    )[0]
    ref = np.asarray(
        Image.fromarray(src).resize((100, 32), Image.BICUBIC)
    ).astype(np.float32)
    assert np.max(np.abs(ours - ref)) <= 3.0  # cubic overshoot rounding


def test_upscale_tiny_rect(rng):
    src = rng.random((40, 40)).astype(np.float32)
    out = np.asarray(
        crop_resize_matmul(
            jnp.asarray(src), jnp.asarray([[10, 10, 14, 13]], jnp.float32),
            32, 100,
        )
    )
    assert out.shape == (1, 32, 100)
    assert np.isfinite(out).all()
    # values bounded by the source range (triangle kernel is a convex avg)
    assert out.min() >= src.min() - 1e-4 and out.max() <= src.max() + 1e-4


def test_degenerate_rect(rng):
    src = rng.random((40, 40)).astype(np.float32)
    out = np.asarray(
        crop_resize_matmul(
            jnp.asarray(src), jnp.asarray([[5, 5, 5, 5]], jnp.float32), 32, 100
        )
    )
    assert np.isfinite(out).all()


def test_normalize_range(rng):
    src = rng.integers(0, 255, (60, 80)).astype(np.float32)
    out = np.asarray(
        crop_resize_normalize_matmul(
            jnp.asarray(src), jnp.asarray([[0, 0, 60, 80]], jnp.float32)
        )
    )
    assert out.shape == (1, 32, 100, 1)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_batch_independent(rng):
    src = jnp.asarray(rng.random((64, 96)).astype(np.float32))
    rects = jnp.asarray(
        [[0, 0, 32, 48], [16, 24, 64, 96], [5, 5, 20, 20]], jnp.float32
    )
    batch = np.asarray(crop_resize_matmul(src, rects, 16, 50))
    for i in range(3):
        single = np.asarray(
            crop_resize_matmul(src, rects[i : i + 1], 16, 50)
        )
        np.testing.assert_allclose(batch[i], single[0], atol=1e-5)
