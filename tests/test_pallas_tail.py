"""Fused detector tail (Pallas, interpret mode) vs the flax modules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
from lightly_ocr_tpu.ops.pallas_tail import (
    fused_tail_scores,
    fused_tail_scores_cs,
    fused_tail_scores_cs_seam,
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


@pytest.mark.slow
def test_seam_split_matches_concat_tail():
    """The seam-split tail (pre-concat pair + split 1x1, the serving
    default) matches the concat-fed tail: conv1x1(concat([up(y), t]))
    == up(conv1x1_a(y)) + conv1x1_b(t) — both the 1x1 and the bilinear
    resize are linear, so the only deltas are bf16 reassociation."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(2), x)

    trunk = VGG_UNetTrunk(dtype=jnp.bfloat16)
    trunk_seam = VGG_UNetTrunk(dtype=jnp.bfloat16, seam=True)
    y192 = trunk.apply(v, x)
    y_lo, t = trunk_seam.apply(v, x)
    assert y_lo.shape == (2, 24, 16, 64)
    assert t.shape == (2, 48, 32, 128)

    ref = fused_tail_scores_cs(v, y192, interpret=True)
    got = fused_tail_scores_cs_seam(v, y_lo, t, interpret=True)
    assert got.shape == ref.shape
    diff = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert diff < 5e-3

    # and against the plain flax head (end-to-end anchor)
    y_flax, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)
    w2 = x.shape[2] // 2
    cl = np.moveaxis(np.asarray(got), 2, 3)[:, :, :w2]
    assert np.max(np.abs(cl - np.asarray(y_flax, np.float32))) < 5e-3


@pytest.mark.slow
def test_seam_trunk_quant_matches_concat_trunk():
    """Quant-mode seam decoder (per-half int8 1x1s with the JOINT
    weight scale) vs the concat trunk's QuantConv 1x1s: same int8
    gates, finer activation grouping — differences bounded well inside
    the serving int8 parity tolerances."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(5), x)

    y192 = VGG_UNetTrunk(dtype=jnp.bfloat16, quant=True).apply(v, x)
    y_lo, t = VGG_UNetTrunk(
        dtype=jnp.bfloat16, quant=True, seam=True
    ).apply(v, x)

    # reconstruct the concat form from the seam pair's tail inputs
    from lightly_ocr_tpu.models.vgg_unet import _upsample_to

    up = np.asarray(
        _upsample_to(y_lo, t.shape[1], t.shape[2]), np.float32
    )
    ref = np.asarray(y192, np.float32)
    got = np.concatenate([up, np.asarray(t, np.float32)], axis=-1)
    assert got.shape == ref.shape
    # int8 per-half quantization reorders roundoff; activations are
    # O(1) post-BN, bound absolutely
    d = np.max(np.abs(got - ref))
    assert d < 0.15, d
    # and the overwhelming majority of positions agree tightly
    frac = np.mean(np.abs(got - ref) < 0.02)
    assert frac > 0.98, frac


def test_seam_kernel_matches_legacy_path():
    """The seam-fused kernel (clamped DMA, in-kernel 1x1s + upsample +
    ReLU — the serving default where the geometry allows) must match
    the legacy pad+kernel seam path bit-for-bit in interpret mode: the
    arithmetic is identical, only WHERE it runs moves (device A/B in
    scripts/check_tail_seamk_hw.py: 24.57 -> 20.74 ms at b16 960x640,
    fg-mask flips 0)."""
    import os

    from lightly_ocr_tpu.ops.pallas_tail import _pick_rows_seam

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(11), x)
    y_lo, t = VGG_UNetTrunk(dtype=jnp.bfloat16, seam=True).apply(v, x)
    assert _pick_rows_seam(t.shape[1], t.shape[2]) == 24

    fused_tail_scores_cs_seam.clear_cache()
    got = np.asarray(
        fused_tail_scores_cs_seam(v, y_lo, t, interpret=True), np.float32
    )
    os.environ["LIGHTLY_OCR_TAIL_SEAMK"] = "0"
    try:
        fused_tail_scores_cs_seam.clear_cache()
        ref = np.asarray(
            fused_tail_scores_cs_seam(v, y_lo, t, interpret=True),
            np.float32,
        )
    finally:
        del os.environ["LIGHTLY_OCR_TAIL_SEAMK"]
        fused_tail_scores_cs_seam.clear_cache()
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_seam_kernel_non_pow2_rows_exact():
    """Non-power-of-two row split (rows=58 — the 928-high canvas's
    H/2=464=8x58 geometry, reachable only through the generalized
    divisor search) matches the legacy seam path in interpret mode.

    NOT bit-for-bit: the in-kernel upsample and ``jax.image.resize``
    differ at fp-reassociation level (measured f32 maxdiff 3e-8 on the
    pre-ReLU activation), and the shared bf16 cast of ``xs``
    occasionally rounds the two a ulp apart — each flip smears into a
    ~9x9 patch of ~1e-4 score deltas through the head chain's
    receptive field (the rows=24 gate above passes bit-exact only
    because its seed happens to produce zero flips).  The gates here
    pin what serving needs: fg-mask identity at the 0.4 threshold and
    near-total bitwise agreement."""
    import os

    from lightly_ocr_tpu.ops.pallas_tail import _pick_rows_seam

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((1, 232, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(29), x)
    y_lo, t = VGG_UNetTrunk(dtype=jnp.bfloat16, seam=True).apply(v, x)
    assert _pick_rows_seam(t.shape[1], t.shape[2]) == 58

    fused_tail_scores_cs_seam.clear_cache()
    got = np.asarray(
        fused_tail_scores_cs_seam(v, y_lo, t, interpret=True), np.float32
    )
    os.environ["LIGHTLY_OCR_TAIL_SEAMK"] = "0"
    try:
        fused_tail_scores_cs_seam.clear_cache()
        ref = np.asarray(
            fused_tail_scores_cs_seam(v, y_lo, t, interpret=True),
            np.float32,
        )
    finally:
        del os.environ["LIGHTLY_OCR_TAIL_SEAMK"]
        fused_tail_scores_cs_seam.clear_cache()
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert d.max() < 1e-3, d.max()
    assert np.mean(got == ref) > 0.95
    # fg-mask identity OUTSIDE a band around the 0.4 threshold: the
    # ~1e-4 ulp-flip deltas documented above make exact mask equality
    # seed/library-version fragile for scores within noise of the
    # threshold, so only positions decisively on one side must agree.
    decisive = np.abs(ref - 0.4) >= 1e-3
    np.testing.assert_array_equal(
        (got > 0.4)[decisive], (ref > 0.4)[decisive]
    )


def test_seam_kernel_geometry_gate():
    """_pick_rows_seam rejects unsupported geometries (odd dims, too
    few row blocks, VMEM-oversized slabs, row splits below the
    interior-block invariant) so the dispatch falls back to the legacy
    path instead of building an invalid kernel."""
    from lightly_ocr_tpu.ops.pallas_tail import (
        _SEAM_VMEM_BUDGET,
        _pick_rows_seam,
        _seam_vmem_bytes,
    )

    assert _pick_rows_seam(480, 320) == 96          # production bench
    assert _pick_rows_seam(48, 32) == 24
    assert _pick_rows_seam(47, 32) == 0             # odd H2
    assert _pick_rows_seam(48, 24) == 0             # W2 % 16 != 0
    assert _pick_rows_seam(8, 32) == 0              # no >=2-block split
    # rows=4 divides 12 but violates the interior-block invariant
    # (hmix(1) needs st = rows - HALO >= 2, i.e. rows >= 6) — must
    # reject rather than mis-offset the H-upsample taps.
    assert _pick_rows_seam(12, 32) == 0
    # h2 % 4 == 2 makes h2//2 odd: even divisors must still be found
    # (98 = 2*49 -> rows=14, not a silent fallback to 0).
    assert _pick_rows_seam(98, 32) == 14
    # wide canvas: the VMEM model scales rows DOWN instead of
    # rejecting outright (1280-wide canvas -> W2=640)
    r = _pick_rows_seam(480, 640)
    assert r == 40
    assert _seam_vmem_bytes(r, 640) <= _SEAM_VMEM_BUDGET
    assert _seam_vmem_bytes(48, 640) > _SEAM_VMEM_BUDGET
    # VMEM model anchors (device-measured, scripts/check_tail_seamk_hw
    # .py): rows=96 x W2=320 fits (~103 MB), rows=120 overflows
    # (~126.8 MB) — the model must reproduce both.
    assert _seam_vmem_bytes(96, 320) <= _SEAM_VMEM_BUDGET
    assert _seam_vmem_bytes(120, 320) > _SEAM_VMEM_BUDGET


def test_seam_kernel_interior_blocks_match_legacy():
    """>=3 row blocks: the interior block (0 < i < ni-1) takes the
    hmix(1)/put(HALO) static-offset branches that no other test
    reaches (the rows=24/58 gates above are both 2-block splits).
    Forced via LIGHTLY_OCR_TAIL_SEAM_ROWS; compared against the legacy
    pad+kernel seam path with the threshold-band discipline of the
    non-pow2 gate (ulp flips near 0.4 are documented noise)."""
    import os

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 144, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(31), x)
    y_lo, t = VGG_UNetTrunk(dtype=jnp.bfloat16, seam=True).apply(v, x)
    assert t.shape[1] == 72

    os.environ["LIGHTLY_OCR_TAIL_SEAM_ROWS"] = "24"  # 72/24 = 3 blocks
    try:
        fused_tail_scores_cs_seam.clear_cache()
        got = np.asarray(
            fused_tail_scores_cs_seam(v, y_lo, t, interpret=True),
            np.float32,
        )
    finally:
        del os.environ["LIGHTLY_OCR_TAIL_SEAM_ROWS"]
    os.environ["LIGHTLY_OCR_TAIL_SEAMK"] = "0"
    try:
        fused_tail_scores_cs_seam.clear_cache()
        ref = np.asarray(
            fused_tail_scores_cs_seam(v, y_lo, t, interpret=True),
            np.float32,
        )
    finally:
        del os.environ["LIGHTLY_OCR_TAIL_SEAMK"]
        fused_tail_scores_cs_seam.clear_cache()
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert d.max() < 1e-3, d.max()
    assert np.mean(got == ref) > 0.95
    decisive = np.abs(ref - 0.4) >= 1e-3
    np.testing.assert_array_equal(
        (got > 0.4)[decisive], (ref > 0.4)[decisive]
    )


@pytest.mark.slow
def test_seam_kernel_engages_wide_canvas():
    """A 1280-wide canvas (W2=640, beyond the legacy path's full-width
    col-block limit) must still take the seam kernel: the VMEM model
    picks a smaller row split instead of silently falling back to the
    slower pad path.  Interpret-mode parity vs the legacy path."""
    import os

    from lightly_ocr_tpu.ops.pallas_tail import _pick_rows_seam

    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.standard_normal((1, 96, 1280, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(37), x)
    y_lo, t = VGG_UNetTrunk(dtype=jnp.bfloat16, seam=True).apply(v, x)
    assert t.shape[1:3] == (48, 640)
    assert _pick_rows_seam(48, 640) == 24

    fused_tail_scores_cs_seam.clear_cache()
    got = np.asarray(
        fused_tail_scores_cs_seam(v, y_lo, t, interpret=True), np.float32
    )
    os.environ["LIGHTLY_OCR_TAIL_SEAMK"] = "0"
    try:
        fused_tail_scores_cs_seam.clear_cache()
        ref = np.asarray(
            fused_tail_scores_cs_seam(v, y_lo, t, interpret=True),
            np.float32,
        )
    finally:
        del os.environ["LIGHTLY_OCR_TAIL_SEAMK"]
        fused_tail_scores_cs_seam.clear_cache()
    # legacy path at W2=640 pads columns to the 128-block grid; the
    # seam output is unpadded full width — compare the valid region
    assert got.shape[3] == 640
    ref = ref[:, :, :, :640]
    d = np.abs(got - ref)
    assert d.max() < 1e-3, d.max()
    decisive = np.abs(ref - 0.4) >= 1e-3
    np.testing.assert_array_equal(
        (got > 0.4)[decisive], (ref > 0.4)[decisive]
    )


def test_seam_split_f32_near_exact():
    """In f32 the seam rewrite is exact up to accumulation order: the
    seam trunk (float path, no quant) must match the concat trunk to
    fp32 roundoff — a much tighter gate than the bf16 tolerance, pinning
    that the rewrite is algebraic, not approximate."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 64, 32, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(7), x)

    y192 = VGG_UNetTrunk(dtype=jnp.float32).apply(v, x)
    y_lo, t = VGG_UNetTrunk(dtype=jnp.float32, seam=True).apply(v, x)

    from lightly_ocr_tpu.models.vgg_unet import _upsample_to

    up = np.asarray(_upsample_to(y_lo, t.shape[1], t.shape[2]), np.float32)
    got = np.concatenate([up, np.asarray(t, np.float32)], axis=-1)
    ref = np.asarray(y192, np.float32)
    scale = np.maximum(np.abs(ref), 1.0)
    d = np.max(np.abs(got - ref) / scale)
    assert d < 1e-5, d
