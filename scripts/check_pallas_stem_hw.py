"""Device-mode parity check for the fused Pallas stem conv (conv1_2).

Interpret-mode tests (tests/test_pallas_stem.py) validate numerics on
CPU; this script compiles and runs the kernel on the real TPU and
compares the full prefix -> kernel -> from_stem-trunk composition
against the plain trunk at a small canvas.

Run from the repo root: ``python scripts/check_pallas_stem_hw.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.vgg_unet import (
    VGG_UNet,
    VGG_UNetTrunk,
    VggStemPrefix,
)
from lightly_ocr_tpu.ops.pallas_stem import fused_stem_conv


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(0), x)
    t0 = time.time()
    y_ref = VGG_UNetTrunk(dtype=jnp.bfloat16).apply(v, x)
    y_ref.block_until_ready()
    print(f"plain trunk compiled+ran {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    x0 = VggStemPrefix(dtype=jnp.bfloat16).apply(v, x)
    s1c = fused_stem_conv(v, x0)  # device mode, NOT interpret
    y = VGG_UNetTrunk(dtype=jnp.bfloat16, from_stem=True).apply(v, s1c)
    y.block_until_ready()
    print(f"fused stem path compiled+ran {time.time()-t0:.1f}s", flush=True)

    ref = np.asarray(y_ref, np.float32)
    got = np.asarray(y, np.float32)
    diff = float(np.max(np.abs(got - ref)))
    print("max |diff| =", diff, flush=True)
    assert diff < 3e-2, diff
    print("HW PARITY OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
