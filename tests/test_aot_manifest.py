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
