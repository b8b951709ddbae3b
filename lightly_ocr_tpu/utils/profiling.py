"""Tracing / profiling subsystem.

The reference has only an unused ``calcTime`` helper and ad-hoc prints
(``ocr/pipeline.py:40-43``, ``ocr/train/crnn.py:184-188``).  Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  perfetto-compatible trace directory for TensorBoard/XProf;
* :class:`StageTimer` — lightweight named wall-clock accumulators with
  device sync, for per-stage breakdowns (detector / postproc / crop /
  recognize);
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` passthrough so
  pipeline stages show up as named spans on the device timeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; ``sync=True`` blocks on
    device work so timings are honest."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result_ref: list | None = None):
        t0 = time.perf_counter()
        yield
        if self.sync and result_ref:
            jax.block_until_ready(result_ref[0])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            out = jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(
                f"{name:24s} {t*1e3:9.1f} ms total  {t/n*1e3:8.1f} ms/call"
                f"  x{n}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
