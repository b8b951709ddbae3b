"""Device-mode parity check for the fused Pallas detector tail.

Interpret-mode tests (tests/test_pallas_tail.py) validate numerics on
CPU; this script is the HARDWARE gate: it compiles and runs the kernel
on the real TPU and compares against the unfused flax VGG_UNet at a
small canvas (fast compile through the axon tunnel).

Run from the repo root: ``python scripts/check_pallas_tail_hw.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 96, 64, 3)), jnp.float32)
    v = VGG_UNet().init(jax.random.PRNGKey(0), x)
    t0 = time.time()
    y_ref, _ = VGG_UNet(dtype=jnp.bfloat16).apply(v, x)
    y_ref.block_until_ready()
    print(f"full fwd compiled+ran {time.time()-t0:.1f}s", flush=True)
    y192 = VGG_UNetTrunk(dtype=jnp.bfloat16).apply(v, x)
    t0 = time.time()
    y = fused_tail_scores(v, y192)  # device mode, NOT interpret
    y.block_until_ready()
    print(f"fused tail compiled+ran {time.time()-t0:.1f}s", flush=True)
    diff = float(np.max(np.abs(np.asarray(y) - np.asarray(y_ref, np.float32))))
    print("max |diff| =", diff, flush=True)
    assert diff < 5e-3, diff
    print("HW PARITY OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
