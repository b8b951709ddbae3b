"""Device check: beam decoding at production shapes on the real TPU.

Times the recognizer program greedy vs beam (attention head, then CTC)
at 512 crops and sanity-checks the outputs.  Run on the axon tunnel:

    python scripts/check_beam_hw.py [--crops 512] [--beam 8]

Timing caveat (BENCH.md): walls through the tunnel include dispatch +
fetch; deltas between the two programs are still meaningful because
both pay the same overhead.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--crops", type=int, default=512)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRNN

    rng = np.random.default_rng(0)
    crops = jnp.asarray(
        rng.standard_normal((args.crops, 32, 100, 1)).astype(np.float32)
    )

    def bench(rec, label):
        t0 = time.perf_counter()
        idx, conf = rec._recognize(rec.variables, crops)
        np.asarray(conf)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            idx, conf = rec._recognize(rec.variables, crops)
            # fetch (not block_until_ready): axon's ready != complete,
            # see BENCH.md "Axon timing gotcha"
            np.asarray(conf)
            walls.append(time.perf_counter() - t0)
        print(
            f"{label}: compile {compile_s:.1f}s, wall p50 "
            f"{np.median(walls)*1e3:.1f} ms over {args.crops} crops",
            flush=True,
        )
        return np.asarray(idx), np.asarray(conf)

    for pred, key in (("Attention", "attn_decode"), ("CTC", "ctc_decode")):
        cfg = Config(prediction=pred, transform="TPS")
        rec_g = CRNN(cfg, dtype=jnp.bfloat16)
        idx_g, conf_g = bench(rec_g, f"{pred} greedy")
        rec_b = CRNN(
            cfg.replace(**{key: "beam", "beam_width": args.beam}),
            dtype=jnp.bfloat16,
        )
        rec_b.variables = rec_g.variables
        idx_b, conf_b = bench(rec_b, f"{pred} beam W={args.beam}")
        assert conf_b.min() >= 0 and conf_b.max() <= 1 + 1e-5
        texts_b = rec_b.decode(idx_b[:8])
        print(f"  sample beam texts: {texts_b[:4]}", flush=True)
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
