"""Device A/B for the seam-split tail at the production serving shape.

Compares, fresh-jit on TPU (batch 16, 960x640 canvas, int8 trunk like
the serving default):

  A. concat path:   VGG_UNetTrunk -> y192 -> fused_tail_scores_cs
  B. seam path:     VGG_UNetTrunk(seam=True) -> (y_lo, t) ->
                    fused_tail_scores_cs_seam

B never materializes the 192-ch H/2 concat (943 MB bf16) and runs the
y-half of upconv4's 1x1 at H/4 — an exact linear rewrite (both the 1x1
and the bilinear resize are linear maps).  Reports wall medians and the
score-map max |diff| plus fg-mask agreement at the serving thresholds.

    nohup python scripts/check_seam_hw.py > /tmp/seam_ab.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, VGG_UNetTrunk
from lightly_ocr_tpu.ops.pallas_tail import (
    fused_tail_scores_cs,
    fused_tail_scores_cs_seam,
)

B, H, W = 16, 960, 640
QUANT = True  # serving default trunk precision


def timeit(tag, fn, *args, n=6):
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
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    v = VGG_UNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))

    trunk = VGG_UNetTrunk(dtype=jnp.bfloat16, quant=QUANT)
    trunk_seam = VGG_UNetTrunk(dtype=jnp.bfloat16, quant=QUANT, seam=True)

    @jax.jit
    def path_concat(v, x):
        y192 = trunk.apply(v, x)
        return fused_tail_scores_cs(v, y192)

    @jax.jit
    def path_seam(v, x):
        y_lo, t = trunk_seam.apply(v, x)
        return fused_tail_scores_cs_seam(v, y_lo, t)

    ya, ta = timeit("A concat trunk+tail", path_concat, v, x)
    yb, tb = timeit("B seam  trunk+tail", path_seam, v, x)

    a = np.asarray(ya, np.float32)[:, :, :, : W // 2]
    b = np.asarray(yb, np.float32)[:, :, :, : W // 2]
    print(f"score maxdiff {np.max(np.abs(a - b)):.2e}", flush=True)
    # serving fg mask: region > low_text OR affinity > link_threshold
    fg_a = (a[:, :, 0] > 0.4) | (a[:, :, 1] > 0.4)
    fg_b = (b[:, :, 0] > 0.4) | (b[:, :, 1] > 0.4)
    dis = int(np.sum(fg_a != fg_b))
    print(f"fg-mask disagreements: {dis} / {fg_a.size}", flush=True)
    print(f"speedup A/B: {ta / tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()
