"""RARE thin-plate-spline spatial transformer (TPS-STN), TPU-native.

Behavior parity with ``ocr/modules/TPS_STN.py:10-150``:
* LocalizationNetwork: 4x [conv3x3(no bias) - BN - ReLU - maxpool2] with
  channels 64/128/256/512, global average pool, fc 512->256->2F, where
  fc2 starts at zero weight with a fiducial-grid bias so the initial warp
  is identity-ish (RARE Fig. 6a).
* GridGenerator: the TPS radial-basis system.  ``inv_delta_C`` (F+3, F+3)
  and ``P_hat`` (n, F+3) depend only on static shapes, so they are
  computed in numpy at trace time and baked into the XLA program as
  constants (the reference registers them as buffers, ``TPS_STN.py:90-91``)
  — per-batch work is two MXU matmuls.
* Sampling via :func:`lightly_ocr_tpu.ops.grid_sample` with border
  padding and align_corners=True, replacing ATen ``F.grid_sample``.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightly_ocr_tpu.models.layers import batch_norm, conv, max_pool
from lightly_ocr_tpu.ops.grid_sample import grid_sample, grid_sample_matmul

Dtype = Any


@functools.lru_cache(maxsize=8)
def tps_constants(F: int, out_h: int, out_w: int, eps: float = 1e-6):
    """Precompute (inv_delta_C [F+3,F+3], P_hat [out_h*out_w, F+3]).

    Pure-numpy, cached per static geometry; becomes an XLA constant.
    """
    # Fiducial base points C: top row then bottom row, x in [-1, 1].
    half = F // 2
    cx = np.linspace(-1.0, 1.0, half)
    C = np.concatenate(
        [
            np.stack([cx, -np.ones(half)], axis=1),
            np.stack([cx, np.ones(half)], axis=1),
        ],
        axis=0,
    )  # [F, 2]

    # delta_C: TPS system matrix.
    d = np.linalg.norm(C[:, None, :] - C[None, :, :], axis=2)
    np.fill_diagonal(d, 1.0)
    rbf = (d**2) * np.log(d)
    delta_C = np.zeros((F + 3, F + 3))
    delta_C[:F, 0] = 1.0
    delta_C[:F, 1:3] = C
    delta_C[:F, 3:] = rbf
    delta_C[F : F + 2, 3:] = C.T
    delta_C[F + 2, 3:] = 1.0
    inv_delta_C = np.linalg.inv(delta_C)

    # Output grid P: pixel centers normalized to (-1, 1).
    gx = (np.arange(-out_w, out_w, 2) + 1.0) / out_w
    gy = (np.arange(-out_h, out_h, 2) + 1.0) / out_h
    P = np.stack(np.meshgrid(gx, gy), axis=2).reshape(-1, 2)  # [n, 2]

    dist = np.linalg.norm(P[:, None, :] - C[None, :, :], axis=2)
    rbf_p = (dist**2) * np.log(dist + eps)
    P_hat = np.concatenate([np.ones((P.shape[0], 1)), P, rbf_p], axis=1)
    return inv_delta_C.astype(np.float32), P_hat.astype(np.float32)


def fiducial_bias_init(F: int) -> np.ndarray:
    """Initial fiducial prediction: top edge y in [0,-1], bottom y in [1,0]
    (matches ``TPS_STN.py:64-68``)."""
    half = F // 2
    cx = np.linspace(-1.0, 1.0, half)
    top = np.stack([cx, np.linspace(0.0, -1.0, half)], axis=1)
    bot = np.stack([cx, np.linspace(1.0, 0.0, half)], axis=1)
    return np.concatenate([top, bot], axis=0).reshape(-1).astype(np.float32)


class LocalizationNetwork(nn.Module):
    F: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # Sequential index names mirror the torch state dict
        # (convs at 0/4/8/12, BNs at 1/5/9/13).
        specs = [(64, "0", "1"), (128, "4", "5"), (256, "8", "9"), (512, "12", "13")]
        inner = self

        class _Conv(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                for ch, cname, bname in specs:
                    x = conv(ch, use_bias=False, name=cname, dtype=inner.dtype)(x)
                    x = nn.relu(batch_norm(train, bname, inner.dtype)(x))
                    x = max_pool(x, (2, 2), (2, 2))
                return x

        x = _Conv(name="conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) -> [B, 512]

        class _FC1(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.relu(nn.Dense(256, dtype=inner.dtype, name="0")(x))

        x = _FC1(name="localization_fc1")(x)
        x = nn.Dense(
            self.F * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype: jnp.asarray(
                fiducial_bias_init(self.F), dtype
            ),
            name="localization_fc2",
        )(x)
        return x.reshape(x.shape[0], self.F, 2)


class TPS_STN(nn.Module):
    """Full rectifier: predict fiducials -> TPS grid -> sample."""

    F: int = 20
    out_h: int = 32
    out_w: int = 100
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B = x.shape[0]
        c_prime = LocalizationNetwork(
            self.F, dtype=self.dtype, name="LocalizationNetwork"
        )(x, train)  # [B, F, 2]

        inv_delta_C, P_hat = tps_constants(self.F, self.out_h, self.out_w)
        inv_delta_C = jnp.asarray(inv_delta_C)
        P_hat = jnp.asarray(P_hat)

        # T = inv_delta_C @ [C'; 0_3x2]  (two small MXU matmuls per batch)
        cp = jnp.concatenate(
            [
                c_prime.astype(jnp.float32),
                jnp.zeros((B, 3, 2), dtype=jnp.float32),
            ],
            axis=1,
        )  # [B, F+3, 2]
        T = jnp.einsum("ij,bjk->bik", inv_delta_C, cp)
        P_prime = jnp.einsum("nj,bjk->bnk", P_hat, T)  # [B, n, 2]
        grid = P_prime.reshape(B, self.out_h, self.out_w, 2)
        # matmul formulation (no gathers) pays off on TPU for crop-sized
        # images; identical bilinear math either way
        sampler = (
            grid_sample_matmul
            if self.out_h * self.out_w <= 64 * 256
            else grid_sample
        )
        return sampler(
            x, grid.astype(x.dtype), padding_mode="border", align_corners=True
        )
