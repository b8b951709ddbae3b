"""Device timing of the int8 (QuantConv) detector vs bf16 at the
serving shape — completes the int8 serving-mode device budget."""
import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_ROOT = "/tmp/jtrace_det8"


def device_ms(d):
    files = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    return sum(
        e["dur"] / 1e3
        for e in tr.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
        and e["name"].startswith("jit_") and "(" in e["name"]
    )


def trace_stage(tag, fn, *args):
    import jax

    d = f"{TRACE_ROOT}/{tag.replace(' ', '_')}"
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    with jax.profiler.trace(d):
        jax.block_until_ready(fn(*args))
    print(f"{tag:40s} device {device_ms(d):8.2f} ms  "
          f"(compile+warm {tc:6.1f}s)", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet

    print("backend:", jax.default_backend(), flush=True)
    B, H, W = 16, 960, 640
    rng = np.random.default_rng(0)
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    net = VGG_UNet(dtype=jnp.bfloat16)
    v = net.init(jax.random.key(0), canv[:1])
    net_q = VGG_UNet(dtype=jnp.bfloat16, quant=True)
    trace_stage("det fwd bf16 B16", jax.jit(lambda v, x: net.apply(v, x)[0]),
                v, canv)
    trace_stage("det fwd int8 B16",
                jax.jit(lambda v, x: net_q.apply(v, x)[0]), v, canv)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
