#!/usr/bin/env python
"""Trace-path manifest for the committed AOT serving executable.

Round-4's official bench regression and round-5's near-miss shared one
root cause: a commit touching the serving trace path landed AFTER the
last mint, silently re-keying the AOT cache (utils/aotcache.py: the key
is the full lowered StableHLO + Mosaic source locations), so the
driver's `python bench.py` paid a 10-40 min remote cold compile instead
of loading the committed `.jexe`.  Nothing in the repo could detect the
staleness before the driver did.

This script closes that hole:

* ``write`` — record sha256 of every trace-path file (everything whose
  source can reach the lowered serving program: bench.py, config,
  models/, ops/, serving/, text/, parallel/, engines.py) into
  ``.aotcache/MANIFEST.json`` alongside the minted entry.  Run by
  ``scripts/mint_serving_exe.sh`` after its warm-hit verification.
* ``check`` — recompute and compare; exit 1 naming each drifted file.
  ``tests/test_aot_manifest.py`` runs this in the FAST suite, so the
  moment a commit edits the trace path without re-minting, the suite
  goes red with the instruction to run the mint script.

The manifest is deliberately strict (a comment-only edit to a non-Pallas
model file flags even though plain StableHLO carries no comments): a
false positive costs one re-mint; a false negative costs the round's
official number.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, ".aotcache", "MANIFEST.json")

# Files/dirs whose source can appear in (or shape) the lowered serving
# program.  Directories are walked RECURSIVELY for *.py (a new helper
# module imported from the trace path must not escape the manifest),
# minus EXCLUDE entries.
TRACE_PATHS = [
    "bench.py",
    "config.yml",
    "lightly_ocr_tpu/config.py",
    "lightly_ocr_tpu/engines.py",
    "lightly_ocr_tpu/models",
    "lightly_ocr_tpu/ops",
    "lightly_ocr_tpu/serving",
    "lightly_ocr_tpu/text",
    "lightly_ocr_tpu/parallel",
]
# Host-side code that cannot appear in the lowered program; flagging it
# would force phantom re-mints (a 25-min cold compile each).
EXCLUDE = {
    "lightly_ocr_tpu/serving/server.py",
    "lightly_ocr_tpu/serving/ingress.py",
}


def _iter_files(repo=None):
    repo = repo or REPO
    for rel in TRACE_PATHS:
        path = os.path.join(repo, rel)
        if os.path.isfile(path):
            yield rel
        elif os.path.isdir(path):
            for dirpath, dirnames, filenames in os.walk(path):
                dirnames[:] = sorted(
                    d for d in dirnames if d != "__pycache__"
                )
                for name in sorted(filenames):
                    if not name.endswith(".py"):
                        continue
                    frel = os.path.relpath(
                        os.path.join(dirpath, name), repo
                    ).replace(os.sep, "/")
                    if frel not in EXCLUDE:
                        yield frel


def current_hashes(repo=None) -> dict:
    repo = repo or REPO
    out = {}
    for rel in _iter_files(repo):
        with open(os.path.join(repo, rel), "rb") as f:
            out[rel] = hashlib.sha256(f.read()).hexdigest()
    return out


def write(repo=None) -> None:
    repo = repo or REPO
    manifest = os.path.join(repo, ".aotcache", "MANIFEST.json")
    # Only TPU entries are committed (CPU .jexe files are transient
    # local-cache artifacts from CLI runs on the host backend).
    entries = sorted(
        n for n in os.listdir(os.path.join(repo, ".aotcache"))
        if n.endswith(".jexe") and "tpu" in n
    )
    with open(manifest, "w") as f:
        json.dump(
            {"files": current_hashes(repo), "jexe_entries": entries},
            f, indent=1, sort_keys=True,
        )
    print(f"wrote {manifest} ({len(entries)} jexe entries)")


def check(repo=None) -> list:
    """Return a list of human-readable drift problems (empty = fresh)."""
    repo = repo or REPO
    manifest = os.path.join(repo, ".aotcache", "MANIFEST.json")
    if not os.path.exists(manifest):
        return [f"{manifest} missing — run scripts/mint_serving_exe.sh"]
    with open(manifest) as f:
        recorded = json.load(f)
    now = current_hashes(repo)
    problems = []
    for rel, digest in recorded["files"].items():
        if now.get(rel) != digest:
            state = "modified" if rel in now else "deleted"
            problems.append(f"{rel}: {state} since the last mint")
    for rel in now:
        if rel not in recorded["files"]:
            problems.append(f"{rel}: new trace-path file since the last mint")
    for name in recorded.get("jexe_entries", []):
        if not os.path.exists(os.path.join(repo, ".aotcache", name)):
            problems.append(f".aotcache/{name}: listed in manifest but missing")
    return problems


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "write":
        write()
        return 0
    problems = check()
    if problems:
        print(
            "AOT manifest STALE — the committed serving executable no "
            "longer matches the trace path.  The driver's bench would "
            "pay a 10-40 min cold compile.  Re-mint with "
            "scripts/mint_serving_exe.sh (on the TPU box), commit the "
            "fresh .jexe + MANIFEST.json, and make that the LAST "
            "trace-path-touching commit:",
        )
        for p in problems:
            print(f"  - {p}")
        return 1
    print("AOT manifest fresh")
    return 0


if __name__ == "__main__":
    sys.exit(main())
