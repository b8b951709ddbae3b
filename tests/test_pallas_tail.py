"""Fused detector tail (Pallas, interpret mode) vs the flax modules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
from lightly_ocr_tpu.ops.pallas_tail import (
    fused_tail_scores,
    fused_tail_supported,
)


@pytest.mark.slow
def test_fused_tail_matches_unfused_bf16():
    """trunk + fused tail == full bf16 VGG_UNet within bf16 tolerance."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 96, 64, 3)), jnp.float32)
    full = VGG_UNet(dtype=jnp.bfloat16)
    trunk = VGG_UNetTrunk(dtype=jnp.bfloat16)
    v = VGG_UNet().init(jax.random.PRNGKey(0), x)

    y_ref, _ = full.apply(v, x)
    y192 = trunk.apply(v, x)
    assert y192.shape == (1, 48, 32, 192)
    assert fused_tail_supported(48)
    y = fused_tail_scores(v, y192, interpret=True)

    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y, np.float32)
    assert got.shape == ref.shape
    # both paths quantize to bf16 at different points; scores are O(1e-2)
    # with random weights, so bound absolutely
    assert np.max(np.abs(got - ref)) < 5e-3


@pytest.mark.slow
def test_fused_tail_row_split_edges():
    """Slab halo handling: values at block boundaries match a single-
    block run (H/2 = 32 -> one 32-row block vs four 8-row blocks give
    identical output by construction; compare against the flax tail)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(1), x)
    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)
    y192 = VGG_UNetTrunk(dtype=jnp.bfloat16).apply(v, x)
    got = fused_tail_scores(v, y192, interpret=True)
    diff = np.max(np.abs(np.asarray(got) - np.asarray(y_ref, np.float32)))
    assert diff < 5e-3
