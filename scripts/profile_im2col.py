"""Device experiment: im2col-as-matmul for THIN-CHANNEL convs.

XLA:TPU convs collapse on thin channels (32ch: 6-8 T/s true rate —
BENCH.md): with Cin < 128 the MXU's 128-lane contraction is mostly
padding.  im2col rewrites a 3x3 conv as one dot with K = 9*Cin
(288 for Cin=32 — full lanes) against [9*Cin, Cout].  This measures
XLA conv vs im2col-dot on the recognizer's actual early-stage shapes,
bf16 and w8a8-int8 (im2col also makes narrow convs int8-viable: the
contraction is wide even when the channels are not).

    nohup python scripts/profile_im2col.py > /tmp/prof_im2col.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(tag, fn, *args, n=20):
    """n pipelined dispatches closed by ONE tiny host pull (device work
    serializes, pull latency amortizes) — on the axon tunnel
    block_until_ready alone can return before device completion."""
    t0 = time.time()
    np.asarray(fn(*args)[0, 0, 0])
    tc = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out[0, 0, 0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag:34s} {ms:8.3f} ms  (compile {tc:5.1f}s)", flush=True)
    return ms


def xla_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )


def im2col_conv(x, w):
    """3x3 same-pad conv as ONE dot: patches [B,H,W,9C] . [9C,O]."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy : dy + h, dx : dx + wd, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1)  # [B,H,W,9C]
    wm = w.transpose(0, 1, 2, 3).reshape(9 * c, -1)  # [9C,O] (HWIO flat)
    return jax.lax.dot_general(
        patches, wm, (((3,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    )


def im2col_conv_int8(x, w):
    b, h, wd, c = x.shape
    sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    wm = w.reshape(9 * c, -1)
    sw = jnp.maximum(jnp.max(jnp.abs(wm), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wm / sw), -127, 127).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy : dy + h, dx : dx + wd, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1)
    acc = jax.lax.dot_general(
        patches, wq, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # the recognizer's actual early-stage shapes at K=512 crops
    shapes = [
        ("conv0_1 1->32 @32x100", (512, 32, 100, 1), 32),
        ("conv0_2 32->64 @32x100", (512, 32, 100, 32), 64),
        ("layer1 64->64 @16x50", (512, 16, 50, 64), 64),
        ("layer2 128->128 @8x25", (512, 8, 25, 128), 128),
    ]
    for tag, xshape, cout in shapes:
        cin = xshape[-1]
        x = jnp.asarray(rng.standard_normal(xshape), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dt)
        f_conv = jax.jit(xla_conv)
        f_im = jax.jit(im2col_conv)
        t0 = timeit(f"{tag} xla-conv", f_conv, x, w)
        t1 = timeit(f"{tag} im2col", f_im, x, w)
        # parity
        d = float(jnp.max(jnp.abs(
            f_conv(x, w).astype(jnp.float32) - f_im(x, w).astype(jnp.float32)
        )))
        print(f"  im2col speedup {t0/t1:0.2f}x  maxdiff {d:.4f}", flush=True)
        if cin >= 16:
            f_q = jax.jit(im2col_conv_int8)
            t2 = timeit(f"{tag} im2col-int8", f_q,
                        x.astype(jnp.float32), w.astype(jnp.float32))
            print(f"  int8 speedup vs xla-conv {t0/t2:0.2f}x", flush=True)


if __name__ == "__main__":
    main()
