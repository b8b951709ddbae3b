"""Device gate for the fused conv1_2+pool kernel at production shape.

Three questions, at b16 960x640 (the serving canvas bucket):

  1. compile feasibility through the tunnel;
  2. numerics: fused vs the plain flax conv1_2->pool chain;
  3. speed: fused kernel vs the XLA chain it replaces (conv1_2 + pool
     measured 9.58 + 1.98 ms plus a 1.89 ms layout copy in the trunk
     profile — BENCH.md).

    nohup python scripts/check_conv_pool_hw.py > /tmp/cpool_hw.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from lightly_ocr_tpu.models.vgg_unet import VGG_UNet, _VggSlice
from lightly_ocr_tpu.ops.pallas_stem import (
    fused_conv12_pool,
    fused_conv12_pool_conv21,
    fused_conv12_pool_conv21_q,
)

B, H, W = 16, 960, 640


def timeit(tag, fn, *args, n=6):
    """Times one variant; a compile/lowering failure reports and
    returns (None, inf) so the remaining variants still run."""
    try:
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
    except Exception as e:  # Mosaic rejections, OOM, compile budget
        print(f"{tag}: FAILED — {type(e).__name__}: {str(e)[:500]}",
              flush=True)
        return None, float("inf")


class _RefChain(nn.Module):
    """The flax chain a kernel replaces (consumes the conv1_1
    activation, like the kernels)."""

    ops: tuple = (("C", 3, 64), ("R",), ("P",))

    @nn.compact
    def __call__(self, x):
        ops = self.ops

        class B(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _VggSlice(
                    ops, jnp.bfloat16, False, name="slice1",
                )(x, False)

        return B(name="basenet")(x)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    v = VGG_UNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 64, 3)))
    # conv1_1-activation-like input: ReLU'd, so nonnegative
    x0 = jnp.asarray(
        np.abs(rng.standard_normal((B, H, W, 64))), jnp.bfloat16
    )

    ref_fn = jax.jit(lambda v, x: _RefChain().apply(v, x))
    fused_fn = jax.jit(lambda v, x: fused_conv12_pool(v, x))

    yr, tr = timeit("A xla conv1_2+pool", ref_fn, v, x0)
    yf, tf = timeit("B fused kernel    ", fused_fn, v, x0)

    if yr is not None and yf is not None:
        a = np.asarray(yr, np.float32)
        b = np.asarray(yf, np.float32)
        print(f"phase-1 maxdiff {np.max(np.abs(a - b)):.2e}", flush=True)
        print(f"phase-1 speedup A/B: {tr / tf:.3f}x", flush=True)
    # pool-lowering hedge: sublane pair reshape instead of the
    # pair-lane reshape
    fused_s_fn = jax.jit(
        lambda v, x: fused_conv12_pool(v, x, pool_impl="strided")
    )
    ys, tsm = timeit("B2 fused (strided)", fused_s_fn, v, x0)
    # free phase-1 device buffers: holding three [16, 480, 320, 64+]
    # results while phase 2 materializes the full-res conv1_2
    # intermediate (lane-padded to 128ch: ~2.5 GB) exhausted the 16 GB
    # HBM on the first run of this gate
    del yr, yf, ys
    import gc

    gc.collect()

    # phase 2: one stage deeper (conv2_1 fused as well)
    ops2 = (("C", 3, 64), ("R",), ("P",), ("C", 7, 128), ("R",))
    ref2_fn = jax.jit(lambda v, x: _RefChain(ops2).apply(v, x))
    fused2_fn = jax.jit(lambda v, x: fused_conv12_pool_conv21(v, x))

    yr2, tr2 = timeit("C xla  +conv2_1   ", ref2_fn, v, x0)
    yf2, tf2 = timeit("D fused+conv2_1   ", fused2_fn, v, x0)
    if yr2 is not None and yf2 is not None:
        a2 = np.asarray(yr2, np.float32)
        b2 = np.asarray(yf2, np.float32)
        print(f"phase-2 maxdiff {np.max(np.abs(a2 - b2)):.2e}", flush=True)
        print(f"phase-2 speedup C/D: {tr2 / tf2:.3f}x", flush=True)

    # phase 2 int8 (w8a8 slab + int8 MXU): vs the same float chain
    fusedq_fn = jax.jit(lambda v, x: fused_conv12_pool_conv21_q(v, x))
    yq, tq = timeit("E fused int8 w8a8 ", fusedq_fn, v, x0)
    if yr2 is not None and yq is not None:
        a2 = np.asarray(yr2, np.float32)
        bq = np.asarray(yq, np.float32)
        cc = float(np.corrcoef(a2.ravel(), bq.ravel())[0, 1])
        print(f"phase-2q corr {cc:.5f}  "
              f"reldiff {np.max(np.abs(a2 - bq)) / max(1e-9, a2.max()):.3f}",
              flush=True)
        print(f"phase-2q speedup C/E: {tr2 / tq:.3f}x", flush=True)


if __name__ == "__main__":
    main()
