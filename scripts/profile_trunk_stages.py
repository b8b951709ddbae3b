"""Per-stage device timings of the int8 detector trunk at the
production canvas (960x640, batch 16).

Times each encoder slice / decoder UpConv / upsample+concat as its own
fresh-jitted program over realistic inputs, so the ~33 ms "mid-trunk"
block (BENCH.md round-2 stage table: detector 73.4 = slice1 27.6 +
tail 12.6 + mid ~33) resolves into per-stage numbers.  Suspects: the
slice5 dilated 3x3 (rate 6) and the bilinear upsample+concat pairs.

Axon timing gotcha (BENCH.md): block_until_ready lies through the
tunnel — every timing here fetches a small output slice to host and
is amortized over n dispatches.

nohup python scripts/profile_trunk_stages.py > /tmp/prof_trunk.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(tag, fn, args, n=6, gflop=None):
    import jax.numpy as jnp

    def fetch(out):
        if isinstance(out, (tuple, list)):
            out = out[0]
        return float(jnp.sum(jnp.ravel(out)[:8].astype(jnp.float32)))

    t0 = time.perf_counter()
    fetch(fn(*args))
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    rate = f"  {gflop / med / 1e3:7.1f} TFLOP/s" if gflop else ""
    print(
        f"{tag:44s} med {med * 1e3:8.2f} ms (compile {tc:5.1f}s){rate}",
        flush=True,
    )
    return med


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import (
        UpConv,
        _Slice5,
        _VggSlice,
        _VGG_SLICES,
        _upsample_to,
    )

    B, H, W = 16, 960, 640
    dt = jnp.bfloat16
    quant = True
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    def make(mod, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32), dt)
        vars_ = mod.init(key, x)
        fn = jax.jit(lambda v, x: mod.apply(v, x))
        return fn, (vars_, x)

    def gf_conv(h, w, cin, cout, k=3):
        return 2 * B * h * w * cin * cout * k * k / 1e9

    # encoder slices at their true input resolutions
    stages = [
        ("slice2 (H/2 in, 128->256x2 @H/4)", "slice2", (B, 480, 320, 128),
         gf_conv(240, 160, 128, 256) + gf_conv(240, 160, 256, 256)),
        ("slice3 (256->256@H/4,512x2@H/8)", "slice3", (B, 240, 160, 256),
         gf_conv(240, 160, 256, 256) + gf_conv(120, 80, 256, 512)
         + gf_conv(120, 80, 512, 512)),
        ("slice4 (512@H/8, 512x2 @H/16)", "slice4", (B, 120, 80, 512),
         gf_conv(120, 80, 512, 512) + 2 * gf_conv(60, 40, 512, 512)),
    ]
    for tag, name, shape, gflop in stages:
        mod = _VggSlice(tuple(_VGG_SLICES[name]), dt, quant)
        fn, args = make(mod, shape)
        timeit(tag, fn, args, gflop=gflop)

    # slice5: pool3s1 + dilated(6) 3x3 512->1024 + 1x1 1024->1024 @H/16
    mod = _Slice5(dt, quant)
    fn, args = make(mod, (B, 60, 40, 512))
    timeit(
        "slice5 (dil-6 3x3 512->1024 + 1x1)", fn, args,
        gflop=gf_conv(60, 40, 512, 1024) + gf_conv(60, 40, 1024, 1024, 1),
    )
    # the dilated conv alone, and a rate-1 control at the same shape
    for rate in (6, 1):
        import flax.linen as nn

        m = nn.Conv(1024, (3, 3), padding=((rate, rate), (rate, rate)),
                    kernel_dilation=(rate, rate), dtype=dt)
        fn, args = make(m, (B, 60, 40, 512))
        timeit(f"  bf16 3x3 512->1024 @60x40 rate {rate}", fn, args,
               gflop=gf_conv(60, 40, 512, 1024))

    # decoder blocks
    dec = [
        ("upconv1 (1536->512->256 @H/16)", UpConv(512, 256, dt, quant),
         (B, 60, 40, 1536),
         2 * B * 60 * 40 * 1536 * 512 / 1e9 + gf_conv(60, 40, 512, 256)),
        ("upconv2 (768->256->128 @H/8)", UpConv(256, 128, dt, quant),
         (B, 120, 80, 768),
         2 * B * 120 * 80 * 768 * 256 / 1e9 + gf_conv(120, 80, 256, 128)),
        ("upconv3 (384->128->64 @H/4)", UpConv(128, 64, dt, quant),
         (B, 240, 160, 384),
         2 * B * 240 * 160 * 384 * 128 / 1e9 + gf_conv(240, 160, 128, 64)),
    ]
    for tag, mod, shape, gflop in dec:
        fn, args = make(mod, shape)
        timeit(tag, fn, args, gflop=gflop)

    # upsample+concat pairs (pure bandwidth)
    ups = [
        ("ups 60x40x256 -> 120x80 + cat512", (B, 60, 40, 256),
         (B, 120, 80, 512)),
        ("ups 120x80x128 -> 240x160 + cat256", (B, 120, 80, 128),
         (B, 240, 160, 256)),
        ("ups 240x160x64 -> 480x320 + cat128", (B, 240, 160, 64),
         (B, 480, 320, 128)),
    ]
    for tag, sa, sb in ups:
        a = jnp.asarray(rng.standard_normal(sa).astype(np.float32), dt)
        b = jnp.asarray(rng.standard_normal(sb).astype(np.float32), dt)

        def f(a, b):
            y = _upsample_to(a, b.shape[1], b.shape[2])
            return jnp.concatenate([y, b], axis=-1)

        timeit(tag, jax.jit(f), (a, b))

    print("done", flush=True)


if __name__ == "__main__":
    main()
