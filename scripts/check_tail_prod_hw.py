"""Production-size hardware gate for the col-blocked Pallas tail.

Round-1 left the fused Pallas detector tail numerically validated but
compile-INFEASIBLE at the production canvas (Mosaic compile cost blew
the remote helper's budget before col-blocking landed).  This script
answers, at the REAL serving shape (batch 16, 960x640 canvas ->
480x320 half-res tail):

  1. does the col-blocked kernel compile within the tunnel budget?
  2. trunk + fused tail vs the plain flax forward — device-for-device,
     which wins, by how much?
  3. numerics: max |diff| of the score maps.

    nohup python scripts/check_tail_prod_hw.py > /tmp/tail_prod.log 2>&1 &
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
    fused_tail_scores,
    fused_tail_supported,
)

B, H, W = 16, 960, 640


def timeit(tag, fn, *args, n=5):
    """Times via a host transfer of a small slice — block_until_ready
    alone returned impossible sub-ms walls through the axon tunnel
    (the ready signal does not imply device completion there)."""
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
    print(f"{tag}: median wall {ms:.1f} ms over {n} "
          f"(incl. tiny host pull)", flush=True)
    return out, ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    print("tail supported at H/2 =", H // 2, ":",
          fused_tail_supported(H // 2), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    v = VGG_UNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))

    plain_net = VGG_UNet(dtype=jnp.bfloat16)
    plain = jax.jit(lambda v, x: plain_net.apply(v, x)[0].astype(jnp.float32))
    y_ref, t_plain = timeit("plain full fwd", plain, v, x)

    trunk_net = VGG_UNetTrunk(dtype=jnp.bfloat16)
    fused = jax.jit(
        lambda v, x: fused_tail_scores(v, trunk_net.apply(v, x))
    )
    y, t_fused = timeit("trunk+fused tail", fused, v, x)

    diff = float(np.max(np.abs(np.asarray(y, np.float32)
                               - np.asarray(y_ref, np.float32))))
    print(f"max |diff| = {diff:.5f}", flush=True)
    print(f"fused vs plain: {t_plain/t_fused:.3f}x "
          f"({t_plain - t_fused:+.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
