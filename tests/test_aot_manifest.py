"""The committed AOT serving executable must match the trace path.

Round-4 regression / round-5 near-miss: a commit editing models/ or
serving/ after the last mint silently re-keys the AOT cache
(``utils/aotcache.py``: key = lowered StableHLO + Mosaic locations), so
the driver's ``python bench.py`` pays a 10-40 min remote cold compile
and the round's official number collapses.  This fast test makes that
staleness a RED SUITE instead of a silent end-of-round surprise.

Failing?  Run ``scripts/mint_serving_exe.sh`` on the TPU box, commit
the fresh ``.jexe`` + ``MANIFEST.json``, and land no further
trace-path edits after it (or re-mint again).
"""
import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_manifest_mod():
    spec = importlib.util.spec_from_file_location(
        "aot_manifest", os.path.join(REPO, "scripts", "aot_manifest.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_aot_manifest_fresh():
    mod = _load_manifest_mod()
    problems = mod.check()
    assert not problems, (
        "AOT executable stale vs trace path — re-mint with "
        "scripts/mint_serving_exe.sh and commit .jexe + MANIFEST.json:\n"
        + "\n".join(f"  - {p}" for p in problems)
    )


def _mini_repo(tmp_path):
    """A trace-path skeleton the manifest logic can run against."""
    (tmp_path / ".aotcache").mkdir()
    (tmp_path / "lightly_ocr_tpu" / "models").mkdir(parents=True)
    (tmp_path / "lightly_ocr_tpu" / "ops").mkdir()
    (tmp_path / "lightly_ocr_tpu" / "serving").mkdir()
    (tmp_path / "lightly_ocr_tpu" / "text").mkdir()
    (tmp_path / "lightly_ocr_tpu" / "parallel").mkdir()
    (tmp_path / "bench.py").write_text("print('bench')\n")
    (tmp_path / "config.yml").write_text("canvas: 960\n")
    (tmp_path / "lightly_ocr_tpu" / "config.py").write_text("C = 1\n")
    (tmp_path / "lightly_ocr_tpu" / "engines.py").write_text("E = 1\n")
    (tmp_path / "lightly_ocr_tpu" / "models" / "crnn.py").write_text("M = 1\n")
    (tmp_path / "lightly_ocr_tpu" / "serving" / "__init__.py").write_text("")
    (tmp_path / "lightly_ocr_tpu" / "serving" / "batch.py").write_text("B = 1\n")
    (tmp_path / ".aotcache" / "batched-ocr-tpuv5lite1-abc.jexe").write_bytes(
        b"exe"
    )
    return tmp_path


def test_manifest_detects_drift_and_deletion(tmp_path):
    mod = _load_manifest_mod()
    repo = _mini_repo(tmp_path)
    mod.write(repo=str(repo))
    assert mod.check(repo=str(repo)) == []

    # An edit to a traced model file is named.
    (repo / "lightly_ocr_tpu" / "models" / "crnn.py").write_text("M = 2\n")
    problems = mod.check(repo=str(repo))
    assert any("models/crnn.py" in p and "modified" in p for p in problems)

    # A brand-new trace-path file is named too.
    mod.write(repo=str(repo))
    (repo / "lightly_ocr_tpu" / "ops" / "newkernel.py").write_text("K = 1\n")
    problems = mod.check(repo=str(repo))
    assert any("newkernel.py" in p and "new" in p for p in problems)

    # ... including in a NEW SUBPACKAGE (the walk must recurse).
    mod.write(repo=str(repo))
    sub = repo / "lightly_ocr_tpu" / "ops" / "sub"
    sub.mkdir()
    (sub / "helper.py").write_text("H = 1\n")
    problems = mod.check(repo=str(repo))
    assert any("sub/helper.py" in p for p in problems)

    # Deleting the minted executable is named.
    mod.write(repo=str(repo))
    (repo / ".aotcache" / "batched-ocr-tpuv5lite1-abc.jexe").unlink()
    problems = mod.check(repo=str(repo))
    assert any(".jexe" in p and "missing" in p for p in problems)


def test_manifest_ignores_host_only_serving_files(tmp_path):
    """server.py / ingress.py edits are host-side and must NOT force a
    re-mint (a phantom flag costs a 25-min cold compile)."""
    mod = _load_manifest_mod()
    repo = _mini_repo(tmp_path)
    (repo / "lightly_ocr_tpu" / "serving" / "server.py").write_text("S = 1\n")
    mod.write(repo=str(repo))
    (repo / "lightly_ocr_tpu" / "serving" / "server.py").write_text("S = 2\n")
    assert mod.check(repo=str(repo)) == []
