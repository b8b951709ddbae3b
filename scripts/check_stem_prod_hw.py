"""Production-size hardware A/B for the fused Pallas stem (conv1_2).

conv1_2 (3x3, 64->64 at full canvas res) is the detector's single most
expensive conv: XLA:TPU runs it at ~33 TFLOP/s (lane-starved — see
``ops/pallas_stem.py``).  At the serving shape (batch 16, 960x640) this
measures, device-for-device:

  1. XLA's plain conv1_2 (+ bias/BN fold + ReLU, as the serving graph
     sees it after fusion);
  2. the flattened-dot Pallas stem kernel;
  3. numerics: max |diff|.

    nohup python scripts/check_stem_prod_hw.py > /tmp/stem_prod.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
from lightly_ocr_tpu.ops.pallas_stem import fused_stem_conv, stem_params

B, H, W = 16, 960, 640


def timeit(tag, fn, *args, n=7):
    t0 = time.time()
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{tag}: median wall {ms:.1f} ms over {n}", flush=True)
    return out, ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    # conv1_1 activation: post-ReLU, so non-negative
    x0 = jnp.asarray(
        np.abs(rng.standard_normal((B, H, W, 64))), jnp.bfloat16
    )
    v = VGG_UNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))
    w01, w2, bias = stem_params(v)
    # reassemble the folded [3,3,64,64] kernel for the XLA reference
    k = jnp.concatenate(
        [
            w01[:, :64, :][:, None].astype(jnp.float32),
            w01[:, 64:, :][:, None].astype(jnp.float32),
            w2[:, None].astype(jnp.float32),
        ],
        axis=1,
    )  # [3, 3, 64, 64]

    @jax.jit
    def xla_ref(x):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        return jnp.maximum(y + bias.reshape(1, 1, 1, -1).astype(jnp.bfloat16), 0)

    skip_xla = os.environ.get("SKIP_XLA", "") == "1"
    if skip_xla:
        y_ref, t_xla = None, float(os.environ.get("XLA_MS", "0"))
    else:
        y_ref, t_xla = timeit("xla conv1_2", xla_ref, x0)

    fused = jax.jit(lambda v, x: fused_stem_conv(v, x))
    y, t_fused = timeit("pallas stem", fused, v, x0)

    if y_ref is not None:
        diff = float(
            np.max(
                np.abs(
                    np.asarray(y, np.float32) - np.asarray(y_ref, np.float32)
                )
            )
        )
        print(f"max |diff| = {diff:.5f}", flush=True)
    if t_xla:
        print(
            f"pallas vs xla: {t_xla/t_fused:.3f}x ({t_xla - t_fused:+.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
