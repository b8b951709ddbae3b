"""DEVICE-trace per-stage timings of the FAN-ResNet at serving shape
(512 crops, 32x100 gray), int8 and bf16 — the wall-clock variant
(``profile_rec_stages.py``) is swamped by the tunnel's ~27 ms
dispatch+fetch overhead, so this uses ``jax.profiler`` spans like
``profile_trace.py``.

    nohup python scripts/profile_rec_stages_trace.py > /tmp/rec_tr.log 2>&1 &
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from profile_trace import trace_stage  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from lightly_ocr_tpu.models.layers import batch_norm, conv, max_pool
    from lightly_ocr_tpu.models.resnet import Stage

    K = 512
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    print("backend:", jax.default_backend(), flush=True)

    class Seg(nn.Module):
        kind: str
        quant: bool

        @nn.compact
        def __call__(self, x):
            q = self.quant
            if self.kind == "stem":
                x = conv(32, use_bias=False, name="c1", dtype=dt, quant=q)(x)
                x = nn.relu(batch_norm(False, "b1", dt)(x))
                x = conv(64, use_bias=False, name="c2", dtype=dt, quant=q)(x)
                return nn.relu(batch_norm(False, "b2", dt)(x))
            if self.kind == "l1":
                x = max_pool(x, (2, 2), (2, 2))
                x = Stage(128, 1, 64, dt, q, name="s")(x, False)
                x = conv(128, use_bias=False, name="c", dtype=dt, quant=q)(x)
                return nn.relu(batch_norm(False, "b", dt)(x))
            if self.kind == "l2":
                x = max_pool(x, (2, 2), (2, 2))
                x = Stage(256, 2, 128, dt, q, name="s")(x, False)
                x = conv(256, use_bias=False, name="c", dtype=dt, quant=q)(x)
                return nn.relu(batch_norm(False, "b", dt)(x))
            raise ValueError(self.kind)

    def gf(h, w, cin, cout, k=9):
        return 2 * K * h * w * cin * cout * k / 1e9

    segs = [
        ("stem 1->32->64 @32x100", "stem", (K, 32, 100, 1),
         gf(32, 100, 1, 32) + gf(32, 100, 32, 64)),
        ("layer1+conv1 128 @16x50", "l1", (K, 32, 100, 64),
         gf(16, 50, 64, 128) + 2 * gf(16, 50, 128, 128)
         + gf(16, 50, 64, 128, k=1) + gf(16, 50, 128, 128)),
        ("layer2+conv2 256 @8x25", "l2", (K, 16, 50, 128),
         gf(8, 25, 128, 256) + 4 * gf(8, 25, 256, 256)
         + gf(8, 25, 128, 256, k=1) + gf(8, 25, 256, 256)),
    ]
    for tag, kind, shape, flops in segs:
        x = jnp.asarray(
            np.abs(rng.standard_normal(shape)).astype(np.float32), dt
        )
        for q in (False, True):
            m = Seg(kind, q)
            v = m.init(key, x)
            fn = jax.jit(lambda v, x, m=m: m.apply(v, x))
            trace_stage(
                f"{tag} {'int8' if q else 'bf16'}", fn, v, x,
                flop=flops * 1e9,
            )

    print("done", flush=True)


if __name__ == "__main__":
    main()
