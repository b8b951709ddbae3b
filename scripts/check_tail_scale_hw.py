"""Compile + time the col-blocked Pallas tail at the PRODUCTION shape
(B16, H/2=480, W/2=320) on real hardware — the Mosaic compile-budget
gate.  Random weights/activations; numerics are covered by the
interpret tests and the small-shape parity script."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet
from lightly_ocr_tpu.ops.pallas_tail import fused_tail_scores


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    # init variables at a tiny shape (params are shape-independent)
    v = VGG_UNet().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    y192 = jnp.asarray(
        rng.standard_normal((16, 480, 320, 192)) * 0.1, jnp.bfloat16
    )
    t0 = time.time()
    y = fused_tail_scores(v, y192)
    y.block_until_ready()
    print(f"compiled+ran {time.time()-t0:.1f}s, out {y.shape}", flush=True)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        fused_tail_scores(v, y192).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"steady wall med {sorted(ts)[3]*1e3:.1f} ms", flush=True)
    print("SCALE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
