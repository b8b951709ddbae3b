"""grid_sample parity vs torch.nn.functional.grid_sample (CPU oracle)."""
import numpy as np
import pytest

from lightly_ocr_tpu.ops import affine_grid, grid_sample

torch = pytest.importorskip("torch")


pytestmark = pytest.mark.parity

def _torch_gs(img_nhwc, grid, padding_mode, align_corners, mode="bilinear"):
    t_img = torch.from_numpy(np.moveaxis(img_nhwc, -1, 1)).float()
    t_grid = torch.from_numpy(grid).float()
    out = torch.nn.functional.grid_sample(
        t_img,
        t_grid,
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_matches_torch(rng, padding_mode, align_corners):
    img = rng.random((2, 13, 17, 3)).astype(np.float32)
    # grid spanning beyond [-1, 1] to exercise padding behavior
    grid = (rng.random((2, 9, 11, 2)).astype(np.float32) - 0.5) * 3.0
    ours = np.asarray(
        grid_sample(img, grid, padding_mode=padding_mode, align_corners=align_corners)
    )
    ref = _torch_gs(img, grid, padding_mode, align_corners)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_identity_grid_is_identity(rng):
    img = rng.random((1, 8, 10, 1)).astype(np.float32)
    ys = np.linspace(-1, 1, 8, dtype=np.float32)
    xs = np.linspace(-1, 1, 10, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    grid = np.stack([gx, gy], axis=-1)[None]
    out = np.asarray(grid_sample(img, grid, align_corners=True))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_tps_like_usage(rng):
    # The exact call pattern of the TPS rectifier: border + align_corners.
    img = rng.random((4, 32, 100, 1)).astype(np.float32)
    grid = (rng.random((4, 32, 100, 2)).astype(np.float32) - 0.5) * 2.2
    ours = np.asarray(grid_sample(img, grid, "border", True))
    ref = _torch_gs(img, grid, "border", True)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_nearest_matches_torch(rng):
    img = rng.random((2, 9, 9, 2)).astype(np.float32)
    grid = (rng.random((2, 5, 5, 2)).astype(np.float32) - 0.5) * 2.0
    ours = np.asarray(grid_sample(img, grid, "border", True, mode="nearest"))
    ref = _torch_gs(img, grid, "border", True, mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(rng.random((1, 6, 6, 1)).astype(np.float32))
    grid = jnp.asarray((rng.random((1, 4, 4, 2)).astype(np.float32) - 0.5))

    def loss(g):
        return jnp.sum(grid_sample(img, g) ** 2)

    g = jax.grad(loss)(grid)
    assert np.asarray(g).shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_affine_grid_matches_torch(rng):
    theta = rng.random((2, 2, 3)).astype(np.float32) - 0.5
    ours = np.asarray(affine_grid(theta, 7, 9))
    ref = (
        torch.nn.functional.affine_grid(
            torch.from_numpy(theta), size=(2, 1, 7, 9), align_corners=False
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_shape_validation():
    with pytest.raises(ValueError):
        grid_sample(np.zeros((1, 4, 4)), np.zeros((1, 2, 2, 2)))
    with pytest.raises(ValueError):
        grid_sample(np.zeros((1, 4, 4, 1)), np.zeros((1, 2, 2, 3)))
    with pytest.raises(ValueError):
        grid_sample(
            np.zeros((1, 4, 4, 1)), np.zeros((1, 2, 2, 2)), padding_mode="reflection"
        )


def test_grid_sample_matmul_equals_gather(rng):
    from lightly_ocr_tpu.ops.grid_sample import grid_sample_matmul

    img = rng.random((3, 16, 20, 2)).astype(np.float32)
    grid = (rng.random((3, 8, 9, 2)).astype(np.float32) - 0.5) * 2.4
    ref = np.asarray(grid_sample(img, grid, "border", True))
    out = np.asarray(grid_sample_matmul(img, grid, "border", True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_grid_sample_matmul_matches_torch(rng):
    from lightly_ocr_tpu.ops.grid_sample import grid_sample_matmul

    img = rng.random((2, 32, 100, 1)).astype(np.float32)
    grid = (rng.random((2, 32, 100, 2)).astype(np.float32) - 0.5) * 2.2
    ours = np.asarray(grid_sample_matmul(img, grid, "border", True))
    ref = _torch_gs(img, grid, "border", True)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)
