"""Microbenchmark: bf16 vs int8 convs at the CRAFT detector's hot shapes.

Answers ONE question before building a quantized inference path: does
XLA:TPU route int8 conv_general_dilated onto the v5e int8 MXU (peak
~394 TOPS, 2x bf16)?  If int8 is ~2x bf16 at the detector's shapes, a
quantized detector takes the 82.8 ms conv stage to ~45 ms.

nohup python scripts/profile_int8.py > /tmp/prof_int8.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fetch(x):
    # block_until_ready is unreliable through the axon tunnel; fetching a
    # scalar to the host is the only trustworthy sync.
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:16].astype(jnp.float32)))


def timeit(tag, fn, *args, flops=0, n=10):
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
        f"{tag:48s} med {med*1e3:8.2f} ms  {tput:7.1f} T/s (compile {tc:5.1f}s)",
        flush=True,
    )
    return med


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B = 16
    # (H, W, Cin, Cout): the detector's five dominant conv shapes + head
    shapes = [
        (960, 640, 64, 64),   # conv1_2 — 45.3 GF/img
        (480, 320, 128, 128), # conv2_2
        (240, 160, 256, 256), # conv3_2/3_3
        (120, 80, 512, 512),  # conv4_1-ish
        (480, 320, 32, 32),   # cls head 3x3
    ]
    dn = lax.conv_dimension_numbers(
        (B, 8, 8, 8), (3, 3, 8, 8), ("NHWC", "HWIO", "NHWC")
    )

    N = 10  # conv iterations chained inside one jit (amortize tunnel)

    for H, W, Ci, Co in shapes:
        assert Ci == Co
        flops = N * B * H * W * Ci * Co * 9 * 2
        x16 = jnp.asarray(
            rng.standard_normal((B, H, W, Ci)) * 0.1, jnp.bfloat16
        )
        k16 = jnp.asarray(
            rng.standard_normal((3, 3, Ci, Co)) / (3 * np.sqrt(Ci)),
            jnp.bfloat16,
        )

        def conv_bf16(x, k):
            def body(_, x):
                y = lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                return jnp.tanh(y).astype(jnp.bfloat16)

            return lax.fori_loop(0, N, body, x)

        timeit(
            f"bf16 conv x{N} {H}x{W} {Ci}->{Co}",
            jax.jit(conv_bf16), x16, k16, flops=flops, n=5,
        )

        xi8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Ci)), jnp.int8)
        ki8 = jnp.asarray(rng.integers(-127, 127, (3, 3, Ci, Co)), jnp.int8)

        def conv_int8(x, k):
            def body(_, x):
                y = lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32,
                )
                # requantize epilogue: the shape the real path runs
                s = jnp.float32(1.0) / jnp.maximum(
                    jnp.max(jnp.abs(y)).astype(jnp.float32), 1.0
                )
                return jnp.clip(
                    jnp.round(y.astype(jnp.float32) * (127.0 * s)),
                    -127, 127,
                ).astype(jnp.int8)

            return lax.fori_loop(0, N, body, x)

        try:
            timeit(
                f"int8 conv+requant x{N} {H}x{W} {Ci}->{Co}",
                jax.jit(conv_int8), xi8, ki8, flops=flops, n=5,
            )
        except Exception as e:  # noqa: BLE001
            print(f"int8 conv {H}x{W} {Ci}->{Co} FAILED: {e}", flush=True)

    # plain matmul sanity: peak check
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        m = 8192
        a = jnp.asarray(rng.integers(-100, 100, (m, m))).astype(dt)
        b = jnp.asarray(rng.integers(-100, 100, (m, m))).astype(dt)
        acc = jnp.float32 if dt == jnp.bfloat16 else jnp.int32

        def mm(a, b):
            return jnp.matmul(a, b, preferred_element_type=acc)

        timeit(f"{name} matmul {m}x{m}", jax.jit(mm), a, b, flops=2 * m**3)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
