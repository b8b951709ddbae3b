"""Microbenchmark: direct vs row-packed vs depth-packed 3x3 convs at
the CRAFT detector's lane-starved shapes (batch 16, canvas 960x640).

Decides which formulation serves conv1_2 and the tail.  Run on the
real chip with the tunnel otherwise idle:

    python scripts/profile_rowpack.py > /tmp/prof_rowpack.log 2>&1
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fetch(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:16].astype(jnp.float32)))


def timeit(tag, fn, *args, flops=0, n=8):
    t0 = time.perf_counter()
    _fetch(fn(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tput = flops / med / 1e12 if flops else 0.0
    print(
        f"{tag:44s} med {med*1e3:8.2f} ms  {tput:7.1f} T/s "
        f"(compile {tc:5.1f}s)",
        flush=True,
    )
    return med


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.ops.rowpack import (
        conv3x3_depthpacked,
        conv3x3_rowpacked,
    )

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # x10 loop inside jit to amortize ~30 ms dispatch overhead
    def loop10(f):
        @jax.jit
        def g(x, k):
            y = x
            for _ in range(10):
                y = f(y, k)
            return y

        return g

    def direct(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    CASES = [
        # (tag, B, H, W, C, G) — conv C->C; conv1_2 is 960x640x64,
        # the tail's 3x3s run at 480x320 with 32 channels
        ("conv1_2 960x640 64ch", 16, 960, 640, 64, 2),
        ("tail 480x320 32ch", 16, 480, 320, 32, 4),
        ("tail 480x320 32ch G8", 16, 480, 320, 32, 8),
    ]
    for tag, B, H, W, C, G in CASES:
        x = jnp.asarray(
            rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16
        )
        flops = 10 * B * H * W * 9 * C * C * 2
        timeit(f"direct    {tag}", loop10(direct), x, k, flops=flops)
        timeit(
            f"rowpack{G}  {tag}",
            loop10(lambda a, b, G=G: conv3x3_rowpacked(a, b, G).astype(a.dtype)),
            x, k, flops=flops,
        )
        timeit(
            f"depthpack{G} {tag}",
            loop10(
                lambda a, b, G=G: conv3x3_depthpacked(a, b, G).astype(a.dtype)
            ),
            x, k, flops=flops,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
