import os

import pytest

import jax.numpy as jnp

from lightly_ocr_tpu.utils.profiling import StageTimer, annotate, trace


def test_stage_timer_accumulates():
    t = StageTimer(sync=True)
    out = t.time("matmul", lambda: jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert out.shape == (8, 8)
    t.time("matmul", lambda: jnp.ones((4, 4)) @ jnp.ones((4, 4)))
    assert t.counts["matmul"] == 2
    assert t.totals["matmul"] > 0
    rep = t.report()
    assert "matmul" in rep and "ms/call" in rep
    t.reset()
    assert t.totals == {}


def test_stage_context_manager():
    t = StageTimer(sync=False)
    with t.stage("outer"):
        _ = jnp.zeros((4,)) + 1
    assert t.counts["outer"] == 1


def test_annotate_runs():
    with annotate("test-span"):
        _ = jnp.zeros((2,)) + 1


@pytest.mark.slow
def test_trace_writes_dir(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        _ = (jnp.ones((16, 16)) @ jnp.ones((16, 16))).block_until_ready()
    assert os.path.isdir(d)
    # jax writes a plugins/ or perfetto trace structure under the dir
    assert any(os.scandir(d))
