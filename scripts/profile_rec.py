"""Per-sub-stage DEVICE timings of the recognizer at the serving shape
(512 crops of 32x100, TPS + ResNet + BiLSTM + attention, bf16).

Same trace methodology as profile_trace.py; answers where the
recognizer's 32 ms goes so optimization targets the right sub-stage.

    nohup python scripts/profile_rec.py > /tmp/prof_rec.log 2>&1 &
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

TRACE_ROOT = "/tmp/jtrace_rec"


def device_ms(trace_dir):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    total = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e["name"]
            if name.startswith("jit_") and "(" in name:
                total += e["dur"] / 1e3
    return total


def trace_stage(tag, fn, *args):
    import jax

    d = f"{TRACE_ROOT}/{tag.replace(' ', '_').replace('/', '_')}"
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    with jax.profiler.trace(d):
        jax.block_until_ready(fn(*args))
    ms = device_ms(d)
    print(f"{tag:40s} device {ms:8.2f} ms  (compile+warm {tc:6.1f}s)",
          flush=True)
    return ms


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.models.attention import Attention
    from lightly_ocr_tpu.models.crnn import CRNNet
    from lightly_ocr_tpu.models.lstm import SeqModeling
    from lightly_ocr_tpu.models.resnet import ResNet50v2
    from lightly_ocr_tpu.models.tps import TPS_STN

    print("backend:", jax.default_backend(), flush=True)
    K = 512
    dt = jnp.bfloat16
    cfg = Config(prediction="Attention", transform="TPS")
    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.standard_normal((K, cfg.height, cfg.width, 1)), jnp.float32
    )

    full = CRNNet(cfg, dtype=dt)
    vars_full = full.init(
        jax.random.key(0), crops[:1], jnp.zeros((1, cfg.num_steps), jnp.int32),
        False,
    )
    f_full = jax.jit(lambda v, x: full.apply(v, x, None, False))
    trace_stage(f"full recognizer K{K}", f_full, vars_full, crops)

    # sub-stages with their own variable trees (init at serving shapes)
    tps = TPS_STN(F=cfg.num_fiducial, out_h=cfg.height, out_w=cfg.width,
                  dtype=dt)
    v_tps = tps.init(jax.random.key(1), crops[:1], False)
    f_tps = jax.jit(lambda v, x: tps.apply(v, x, False))
    trace_stage(f"TPS rectify K{K}", f_tps, v_tps, crops)

    res = ResNet50v2(cfg.output_channel, dtype=dt)
    v_res = res.init(jax.random.key(2), crops[:1], False)
    f_res = jax.jit(lambda v, x: jnp.mean(res.apply(v, x, False), axis=1))
    feats = trace_stage(f"ResNet features K{K}", f_res, v_res, crops)
    seq_in = f_res(v_res, crops)  # [K, T, C]

    # int8 serving-mode variant (same variable tree)
    res_q = ResNet50v2(cfg.output_channel, dtype=dt, quant=True)
    f_res_q = jax.jit(lambda v, x: jnp.mean(res_q.apply(v, x, False), axis=1))
    trace_stage(f"ResNet int8 K{K}", f_res_q, v_res, crops)

    seq = SeqModeling(cfg.hidden_size, dtype=dt)
    v_seq = seq.init(jax.random.key(3), seq_in[:1])
    f_seq = jax.jit(lambda v, x: seq.apply(v, x))
    trace_stage(f"BiLSTM x2 K{K}", f_seq, v_seq, seq_in)
    ctx = f_seq(v_seq, seq_in)

    att = Attention(cfg.hidden_size, cfg.derived_num_classes,
                    cfg.num_steps, dtype=dt)
    v_att = att.init(jax.random.key(4), ctx[:1], None, False)
    f_att = jax.jit(lambda v, x: att.apply(v, x, None, False))
    trace_stage(f"attention decode K{K}", f_att, v_att, ctx)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
