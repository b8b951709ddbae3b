"""Persistent AOT executable cache (utils/aotcache).

The axon tunnel's remote compiles are multi-minute and non-persistent
(``JAX_COMPILATION_CACHE_DIR`` is ignored by the remote service), so
serving/bench cold starts go through our own serialize_executable disk
cache.  These tests exercise the cache mechanics on the CPU backend:
store -> load round-trip, key stability, corruption fallback, and the
disable switch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lightly_ocr_tpu.utils import aotcache


def _fn():
    return jax.jit(lambda x, y: jnp.tanh(x @ y) + 1.0)


def test_roundtrip_and_hit(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTLY_OCR_AOT_CACHE", str(tmp_path))
    args = (jnp.ones((8, 16)), jnp.ones((16, 4)))
    c1 = aotcache.cached_compile(_fn(), args, label="t")
    files = list(tmp_path.glob("t-*.jexe"))
    assert len(files) == 1, "miss must store exactly one entry"
    # Second resolve must load from disk (delete would force recompile;
    # instead corrupt-check by asserting identical key) and produce the
    # same numerics as a fresh jit.
    c2 = aotcache.cached_compile(_fn(), args, label="t")
    want = np.tanh(np.ones((8, 16)) @ np.ones((16, 4))) + 1.0
    np.testing.assert_allclose(np.asarray(c1(*args)), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c2(*args)), want, rtol=1e-6)
    assert len(list(tmp_path.glob("t-*.jexe"))) == 1, "hit must not re-store"


def test_key_depends_on_shape(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTLY_OCR_AOT_CACHE", str(tmp_path))
    aotcache.cached_compile(_fn(), (jnp.ones((8, 16)), jnp.ones((16, 4))))
    aotcache.cached_compile(_fn(), (jnp.ones((4, 16)), jnp.ones((16, 4))))
    assert len(list(tmp_path.glob("*.jexe"))) == 2


def test_corrupt_entry_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTLY_OCR_AOT_CACHE", str(tmp_path))
    args = (jnp.ones((8, 16)), jnp.ones((16, 4)))
    aotcache.cached_compile(_fn(), args, label="t")
    (path,) = tmp_path.glob("t-*.jexe")
    path.write_bytes(b"LOCRAOT1garbage")
    c = aotcache.cached_compile(_fn(), args, label="t")
    want = np.tanh(np.ones((8, 16)) @ np.ones((16, 4))) + 1.0
    np.testing.assert_allclose(np.asarray(c(*args)), want, rtol=1e-6)


def test_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTLY_OCR_AOT_CACHE", "0")
    args = (jnp.ones((8, 16)), jnp.ones((16, 4)))
    c = aotcache.cached_compile(_fn(), args)
    assert np.asarray(c(*args)).shape == (8, 4)
    assert aotcache.cache_dir() is None


def test_trainer_rejects_int8():
    """Config.quant_int8 is inference-only: QuantConv's rounding has a
    zero gradient, so training with it silently freezes the backbone.
    The Trainer must reject it loudly (ADVICE r1)."""
    from dataclasses import replace

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.train.trainer import Trainer

    with pytest.raises(ValueError, match="inference-only"):
        Trainer(replace(Config(), quant_int8=True))
