"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(`jax.sharding.Mesh` + pjit/shard_map) is exercised without TPU hardware.

NOTE: the ambient environment exports ``JAX_PLATFORMS=axon`` (the real TPU
tunnel) — it must be *overridden*, not defaulted, or every test silently
runs on the single TPU chip with 20-40 s compiles and bf16 matmul
precision.  Env vars are set before any JAX import, and the config flag is
also set explicitly because plugin registration can win over the env var.
"""
import os

# LIGHTLY_OCR_TEST_TPU=1 keeps the ambient (TPU) backend instead — for
# the hardware-only gates (tests/test_tpu_serving.py), which skip
# themselves on CPU.  In that mode every OTHER test is deselected (see
# pytest_collection_modifyitems below): the rest of the suite assumes
# the CPU backend, and running it through the TPU tunnel means
# multi-minute remote compiles per jit shape and bf16 matmul precision
# — exactly the hazard the note below warns about.
_USE_TPU = os.environ.get("LIGHTLY_OCR_TEST_TPU", "") == "1"
_TPU_ONLY_MODULES = ("test_tpu_serving",)
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Keep CPU test executables out of the committed .aotcache/ (it ships
# TPU entries that pre-warm the driver's bench cold start).  Tests that
# exercise the cache itself (test_aotcache.py) monkeypatch their own dir.
os.environ.setdefault("LIGHTLY_OCR_AOT_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if not _USE_TPU:
        return
    skip = pytest.mark.skip(
        reason="LIGHTLY_OCR_TEST_TPU=1 runs only the hardware-gate "
               "modules; the rest of the suite assumes the CPU backend"
    )
    for item in items:
        if item.module.__name__ not in _TPU_ONLY_MODULES:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(4420)
