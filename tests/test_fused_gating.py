"""Env gating of the fused detector stages and the dispatch split.

Locks the measured-default behavior: plain flax graph, monolithic
program, with every experimental path opt-in (BENCH.md round 3)."""
import pytest

from lightly_ocr_tpu.config import Config
from lightly_ocr_tpu.serving.batch import BatchedOCR


@pytest.fixture(scope="module")
def ocr():
    # _fused_kernel_plan reads only self.cfg — skip the ~40 s engine
    # init the full constructor would pay (this is a pure gating test)
    o = BatchedOCR.__new__(BatchedOCR)
    o.cfg = Config(prediction="CTC", transform="None", max_boxes=2)
    return o


def test_default_plan_disables_fused_stages(ocr, monkeypatch):
    monkeypatch.delenv("LIGHTLY_OCR_ENABLE_FUSED", raising=False)
    # on CPU the plan is always (False, False); on TPU it additionally
    # requires the enable env — assert the env-off outcome either way
    assert ocr._fused_kernel_plan(960) == (False, False)


def test_stem_requires_tail(ocr, monkeypatch, caplog):
    monkeypatch.setenv("LIGHTLY_OCR_ENABLE_FUSED", "stem")
    use_stem, use_tail = ocr._fused_kernel_plan(960)
    assert use_stem is False  # silently-on would measure the baseline
    assert use_tail is False


def test_fused_impl_default_is_rowpack(monkeypatch):
    monkeypatch.delenv("LIGHTLY_OCR_FUSED_IMPL", raising=False)
    stem_conv, tail_scores = BatchedOCR._fused_impls()
    assert stem_conv.__name__ == "stem_conv_rowpacked"
    assert tail_scores.__name__ == "tail_scores_rowpacked"


def test_fused_impl_pallas_selectable(monkeypatch):
    monkeypatch.setenv("LIGHTLY_OCR_FUSED_IMPL", "pallas")
    stem_conv, tail_scores = BatchedOCR._fused_impls()
    assert stem_conv.__name__ == "fused_stem_conv"
    assert tail_scores.__name__ == "fused_tail_scores"
