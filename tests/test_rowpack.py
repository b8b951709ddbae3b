"""Row-packed strided convs vs direct convs, and the stem/tail
compositions built on them."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.models.vgg_unet import (
    VGG_UNet,
    VGG_UNetTrunk,
    VggStemPrefix,
)
from lightly_ocr_tpu.ops.rowpack import (
    conv3x3_depthpacked,
    conv3x3_rowpacked,
    stem_conv_rowpacked,
    tail_scores_rowpacked,
)


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("G,cin,cout", [(2, 64, 64), (4, 16, 32), (8, 32, 16)])
def test_rowpacked_equals_direct(G, cin, cout):
    rng = np.random.default_rng(G)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    got = conv3x3_rowpacked(x, k, G)
    ref = _direct(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("G,cin,cout", [(2, 64, 64), (4, 32, 32), (8, 16, 16)])
def test_depthpacked_equals_direct(G, cin, cout):
    rng = np.random.default_rng(G + 10)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    got = conv3x3_depthpacked(x, k, G)
    ref = _direct(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_rowpacked_g1_is_direct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 7, 5, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_rowpacked(x, k, 1)),
        np.asarray(_direct(x, k)),
        rtol=1e-6,
        atol=1e-6,
    )


def test_stem_rowpacked_matches_flax_slice():
    """prefix -> rowpacked conv1_2 == the first half of slice1."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(1), x)
    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    got = stem_conv_rowpacked(v, x0)

    p = v["params"]["basenet"]["slice1"]
    bs = v["batch_stats"]["basenet"]["slice1"]
    out = _direct(jnp.asarray(x0, jnp.float32), p["3"]["kernel"]) + p["3"]["bias"]
    scale, shift = p["4"]["scale"], p["4"]["bias"]
    mean, var = bs["4"]["mean"], bs["4"]["var"]
    ref = np.maximum(
        (np.asarray(out) - np.asarray(mean))
        / np.sqrt(np.asarray(var) + 1e-5)
        * np.asarray(scale)
        + np.asarray(shift),
        0.0,
    )
    assert np.max(np.abs(np.asarray(got, np.float32) - ref)) < 3e-2


@pytest.mark.slow
def test_tail_rowpacked_matches_unfused():
    """trunk + rowpacked tail == full bf16 VGG_UNet scores."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 24, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(2), x)
    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)
    y192 = VGG_UNetTrunk(dtype=jnp.bfloat16).apply(v, x)
    got = tail_scores_rowpacked(v, y192)
    assert got.shape == y_ref.shape
    assert np.max(np.abs(np.asarray(got) - np.asarray(y_ref, np.float32))) < 5e-3


@pytest.mark.slow
def test_full_rowpacked_composition():
    """stem prefix -> rowpacked conv1_2 -> from_stem trunk -> rowpacked
    tail == the plain full detector (the exact serving composition)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 32, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(3), x)
    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)

    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    s1c = stem_conv_rowpacked(v, x0)
    y192 = VGG_UNetTrunk(dtype=jnp.bfloat16, from_stem=True).apply(v, s1c)
    got = tail_scores_rowpacked(v, y192)
    diff = np.max(np.abs(np.asarray(got) - np.asarray(y_ref, np.float32)))
    assert diff < 5e-3, diff
