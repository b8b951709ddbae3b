"""Space-to-depth stem (ops/s2d_stem.py) vs the flax slice1 prefix.

The phase-packed dense 2x2 convs must reproduce conv1_1+BN+ReLU ->
conv1_2+BN+ReLU -> pool1 exactly (modulo BN folding roundoff in f32 and
bf16 cast noise in the serving dtype).  Reference chain:
``ocr/modules/vgg_bn.py:44-47`` torchvision indices 0-5.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightly_ocr_tpu.models.layers import batch_norm, conv, max_pool
from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
from lightly_ocr_tpu.ops.s2d_stem import s2d_conv12_pool, s2d_supported


class _Slice1Prefix(nn.Module):
    """conv1_1+BN+ReLU -> conv1_2+BN+ReLU -> pool1, same param names as
    the full model's basenet/slice1 so one variable tree serves both."""

    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        class _S(nn.Module):
            dtype: object

            @nn.compact
            def __call__(self, x):
                class _B(nn.Module):
                    dtype: object

                    @nn.compact
                    def __call__(self, x):
                        x = conv(64, name="0", dtype=self.dtype)(x)
                        x = nn.relu(batch_norm(False, "1", self.dtype)(x))
                        x = conv(64, name="3", dtype=self.dtype)(x)
                        x = nn.relu(batch_norm(False, "4", self.dtype)(x))
                        return max_pool(x, (2, 2), (2, 2))

                return _B(self.dtype, name="slice1")(x)

        return _S(self.dtype, name="basenet")(x)


def _init_vars(seed, shape):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(seed), x)
    # non-trivial batch stats so BN folding is actually exercised
    bs = jax.tree_util.tree_map(
        lambda a: a + 0.25 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        v["batch_stats"],
    )
    return {"params": v["params"], "batch_stats": bs}, x


def test_s2d_matches_flax_f32():
    """f32: the transform is algebraic — only BN-fold roundoff."""
    v, x = _init_vars(3, (2, 32, 48, 3))
    ref = _Slice1Prefix(jnp.float32).apply(v, x)
    got = s2d_conv12_pool(v, x)
    assert got.shape == ref.shape == (2, 16, 24, 64)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / scale) < 1e-5


def test_s2d_matches_flax_bf16():
    """Serving dtype: bf16 compute both sides, absolute tolerance in
    line with the other fused-stage gates (activations are O(1))."""
    v, x = _init_vars(5, (2, 64, 32, 3))
    ref = _Slice1Prefix(jnp.bfloat16).apply(v, x.astype(jnp.bfloat16))
    got = s2d_conv12_pool(v, x.astype(jnp.bfloat16))
    d = np.max(
        np.abs(
            np.asarray(got, np.float32) - np.asarray(ref, np.float32)
        )
    )
    assert d < 5e-2, d


def test_s2d_edge_rows_exact():
    """The pad ring discipline: an input whose only nonzero values sit
    on the borders exercises every ring branch; f32 exactness."""
    v, _ = _init_vars(7, (1, 16, 16, 3))
    x = np.zeros((1, 16, 16, 3), np.float32)
    x[0, 0, :, :] = 1.5
    x[0, -1, :, :] = -2.0
    x[0, :, 0, :] = 0.75
    x[0, :, -1, :] = -0.5
    x = jnp.asarray(x)
    ref = np.asarray(_Slice1Prefix(jnp.float32).apply(v, x), np.float32)
    got = np.asarray(s2d_conv12_pool(v, x), np.float32)
    scale = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / scale) < 1e-5


def test_s2d_quant_close():
    """w8a8 conv1_2: int8 quantization noise only — bounded like the
    QuantConv parity gates (per-sample scales, O(1) activations)."""
    v, x = _init_vars(9, (2, 32, 32, 3))
    ref = np.asarray(s2d_conv12_pool(v, x), np.float32)
    got = np.asarray(s2d_conv12_pool(v, x, quant=True), np.float32)
    assert got.shape == ref.shape
    d = np.abs(got - ref)
    assert d.max() < 0.3, d.max()
    assert np.mean(d < 0.05) > 0.95


def test_s2d_supported_gate():
    assert s2d_supported(960, 640)
    assert not s2d_supported(961, 640)
    assert not s2d_supported(960, 641)


@pytest.mark.slow
def test_s2d_from_pool_trunk_matches_plain():
    """Serving composition: s2d stem -> from_pool seam trunk must
    match the plain seam trunk (the exact graph substitution
    BatchedOCR makes when the s2d stage is planned)."""
    from lightly_ocr_tpu.models.vgg_unet import VGG_UNetTrunk

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(11), x)
    dt = jnp.bfloat16

    y_ref, t_ref = VGG_UNetTrunk(dtype=dt, seam=True).apply(
        v, x.astype(dt)
    )
    p1 = s2d_conv12_pool(v, x.astype(dt))
    y_got, t_got = VGG_UNetTrunk(
        dtype=dt, seam=True, from_pool=True
    ).apply(v, p1)
    for a, b in ((y_got, y_ref), (t_got, t_ref)):
        d = np.max(np.abs(np.asarray(a, np.float32) -
                          np.asarray(b, np.float32)))
        assert d < 0.25, d  # bf16 drift through the 12-conv trunk
