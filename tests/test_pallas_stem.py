"""Fused stem conv (Pallas, interpret mode) vs the flax modules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.models.vgg_unet import (
    VGG_UNet,
    VGG_UNetTrunk,
    VggStemPrefix,
)
from lightly_ocr_tpu.ops.pallas_stem import fused_stem_conv, stem_supported


@pytest.mark.slow
def test_fused_stem_composition_matches_trunk():
    """prefix -> Pallas conv1_2 -> from_stem trunk == the plain trunk
    (whole-composition check incl. the split modules' param scopes)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(0), x)

    y_ref = VGG_UNetTrunk(dtype=jnp.bfloat16).apply(v, x)

    assert stem_supported(96)
    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    assert x0.shape == (1, 96, 64, 64)
    s1c = fused_stem_conv(v, x0, interpret=True)
    assert s1c.shape == (1, 96, 64, 64)
    y = VGG_UNetTrunk(dtype=jnp.bfloat16, from_stem=True).apply(v, s1c)

    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y, np.float32)
    assert got.shape == ref.shape
    # one conv quantizes at a different point; activations are O(1)
    assert np.max(np.abs(got - ref)) < 3e-2
    assert np.mean(np.abs(got - ref)) < 2e-3


@pytest.mark.slow
def test_fused_stem_conv_row_blocks():
    """The overlapping-slab DMA path: H=64 -> rows=32 gives two blocks
    per image; values at the block seam must match a direct conv."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 32, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(1), x)

    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    got = fused_stem_conv(v, x0, interpret=True)

    # direct reference: conv1_2 + BN + ReLU in f32 via lax
    p = v["params"]["basenet"]["slice1"]
    bs = v["batch_stats"]["basenet"]["slice1"]
    k = np.asarray(p["3"]["kernel"], np.float32)
    b = np.asarray(p["3"]["bias"], np.float32)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(k),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    scale = np.asarray(p["4"]["scale"], np.float32)
    shift = np.asarray(p["4"]["bias"], np.float32)
    mean = np.asarray(bs["4"]["mean"], np.float32)
    var = np.asarray(bs["4"]["var"], np.float32)
    ref = np.maximum(
        (np.asarray(out) - mean) / np.sqrt(var + 1e-5) * scale + shift, 0.0
    )
    assert np.max(np.abs(np.asarray(got, np.float32) - ref)) < 3e-2


@pytest.mark.slow
@pytest.mark.parametrize("pool_impl", ["reshape", "strided"])
def test_fused_conv12_pool_matches_flax_chain(pool_impl):
    """conv1_2+BN+ReLU+pool fused (interpret) == the flax slice chain.
    Covers the packed single dot (K=3C row taps, N=3Co w-taps), the
    in-register 2x2 pool (dim-0 strided rows + pair-lane reshape cols),
    and the overlapping-slab DMA (H=64 -> two 32-row blocks)."""
    from lightly_ocr_tpu.models.vgg_unet import _VggSlice
    from lightly_ocr_tpu.ops.pallas_stem import fused_conv12_pool

    import flax.linen as nn

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 48, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(3), x)

    class RefMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            class B(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return _VggSlice(
                        (("C", 0, 64), ("R",), ("C", 3, 64), ("R",), ("P",)),
                        jnp.bfloat16, False, name="slice1",
                    )(x, False)

            return B(name="basenet")(x)

    ref = RefMod().apply(v, x)
    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    got = fused_conv12_pool(v, x0, interpret=True, pool_impl=pool_impl)
    assert got.shape == ref.shape == (2, 32, 24, 64)
    d = np.max(np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32)))
    assert d < 3e-2, d


@pytest.mark.slow
def test_cpool_seam_composition_matches_full_model():
    """The complete cpool serving composition — VggStemPrefix ->
    fused_conv12_pool -> VGG_UNetTrunk(from_pool=True, seam=True) ->
    fused_tail_scores_cs_seam — matches the plain VGG_UNet score maps.
    This is the exact op chain ``detector_scores`` runs when the plan
    resolves (use_cpool=True, tail_is_cs=True)."""
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNetTrunk
    from lightly_ocr_tpu.ops.pallas_stem import fused_conv12_pool
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(4), x)

    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)

    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    p1 = fused_conv12_pool(v, x0, interpret=True)
    trunk = VGG_UNetTrunk(dtype=jnp.bfloat16, from_pool=True, seam=True)
    y_lo, t = trunk.apply(v, p1)
    y = fused_tail_scores_cs_seam(v, y_lo, t, interpret=True)
    w2 = x.shape[2] // 2
    got = np.moveaxis(np.asarray(y), 2, 3)[:, :, :w2]
    assert got.shape == y_ref.shape
    d = np.max(np.abs(got - np.asarray(y_ref, np.float32)))
    assert d < 7e-3, d


@pytest.mark.slow
def test_cpool2_seam_composition_matches_full_model():
    """The deepest fused composition — VggStemPrefix ->
    fused_conv12_pool_conv21 -> VGG_UNetTrunk(from_c21=True, seam=True)
    -> fused_tail_scores_cs_seam — matches plain VGG_UNet (the exact
    op chain detector_scores runs at use_cpool='c21')."""
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNetTrunk
    from lightly_ocr_tpu.ops.pallas_stem import fused_conv12_pool_conv21
    from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores_cs_seam

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(6), x)

    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)

    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    p1 = fused_conv12_pool_conv21(v, x0, interpret=True)
    trunk = VGG_UNetTrunk(dtype=jnp.bfloat16, from_c21=True, seam=True)
    y_lo, t = trunk.apply(v, p1)
    y = fused_tail_scores_cs_seam(v, y_lo, t, interpret=True)
    w2 = x.shape[2] // 2
    got = np.moveaxis(np.asarray(y), 2, 3)[:, :, :w2]
    assert got.shape == y_ref.shape
    d = np.max(np.abs(got - np.asarray(y_ref, np.float32)))
    assert d < 7e-3, d


@pytest.mark.slow
def test_cpool2_int8_kernel_close_to_float_chain():
    """w8a8 cpool2 kernel (int8 slab + int8 MXU dots + in-register
    requant) vs the float flax chain: bounded by normal w8a8
    double-quantization noise, not a correctness bug."""
    from lightly_ocr_tpu.models.vgg_unet import _VggSlice
    from lightly_ocr_tpu.ops.pallas_stem import fused_conv12_pool_conv21_q

    import flax.linen as nn

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 64, 48, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(8), x)

    class RefMod(nn.Module):
        @nn.compact
        def __call__(self, x):
            class B(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return _VggSlice(
                        (("C", 0, 64), ("R",), ("C", 3, 64), ("R",),
                         ("P",), ("C", 7, 128), ("R",)),
                        jnp.float32, False, name="slice1",
                    )(x, False)

            return B(name="basenet")(x)

    ref = np.asarray(RefMod().apply(v, x), np.float32)
    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    got = np.asarray(
        fused_conv12_pool_conv21_q(v, x0, interpret=True), np.float32
    )
    assert got.shape == ref.shape
    cc = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert cc > 0.999, cc
    rel = np.max(np.abs(ref - got)) / max(1e-9, float(np.max(np.abs(ref))))
    assert rel < 0.05, rel
