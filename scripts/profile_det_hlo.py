"""Identify the detector's hottest fusions: compile det fwd, dump the
optimized HLO, trace one execution, and print the top device ops with
their HLO definitions.

nohup python scripts/profile_det_hlo.py > /tmp/prof_hlo.log 2>&1 &
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.models.vgg_unet import VGG_UNet

    B, H, W = 16, 960, 640
    rng = np.random.default_rng(0)
    net = VGG_UNet(dtype=jnp.bfloat16)
    canv = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    variables = net.init(jax.random.key(0), canv[:1])

    f = jax.jit(lambda v, x: net.apply(v, x)[0])
    lowered = f.lower(variables, canv)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open("/tmp/det_hlo.txt", "w") as fh:
        fh.write(hlo)
    print(f"HLO dumped ({len(hlo)} chars)", flush=True)

    # warm
    out = f(variables, canv)
    float(jnp.sum(out[:1, :1, :1]))

    trace_dir = "/tmp/jtrace_det"
    with jax.profiler.trace(trace_dir):
        out = f(variables, canv)
        float(jnp.sum(out[:1, :1, :1]))

    traces = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                              recursive=True))
    with gzip.open(traces[-1]) as fz:
        data = json.load(fz)
    tot = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and (
            name.startswith(("fusion", "convolution", "copy", "reduce",
                             "custom-call", "transpose", "bitcast",
                             "dynamic", "scatter", "gather", "select",
                             "concatenate", "slice", "pad", "resize"))
        ):
            tot[name] += e["dur"]

    device_total = sum(tot.values())
    print(f"device total: {device_total/1e3:.2f} ms", flush=True)

    # map HLO op name -> one-line definition summary
    def hlo_def(opname):
        m = re.search(
            r"^\s*(?:ROOT )?%?" + re.escape(opname) + r"(?:\.\d+)? = (.{0,400})",
            hlo,
            re.M,
        )
        return m.group(1) if m else "?"

    for name, dur in tot.most_common(25):
        line = hlo_def(name)
        # pull conv shapes out of fusion bodies if present
        print(f"{dur/1e3:8.2f} ms  {name:20s} {line[:180]}", flush=True)
        if name.startswith("fusion"):
            m = re.search(
                r"%?" + re.escape(name) + r" = [^\n]*calls=%?([\w.\-]+)", hlo
            )
            if m:
                body = m.group(1)
                # find convs inside the called computation
                cm = re.search(
                    re.escape(body) + r"[\s\S]{0,4000}?(convolution[^\n]{0,160})",
                    hlo,
                )
                if cm:
                    print(f"            body conv: {cm.group(1)[:170]}",
                          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
