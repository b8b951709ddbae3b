"""PyTorch state-dict -> flax variables importer.

Because every flax module in :mod:`lightly_ocr_tpu.models` names its
children after the corresponding reference torch module, the mapping is a
mechanical path + layout transform:

* ``a.b.c.weight`` (4D, OIHW) -> ``params/a/b/c/kernel`` (HWIO)
* ``a.b.c.weight`` (2D, [out, in]) -> ``params/a/b/c/kernel`` ([in, out])
* BatchNorm ``weight``/``bias`` -> ``scale``/``bias``;
  ``running_mean``/``running_var`` -> ``batch_stats/.../mean``/``var``
* LSTM tensors (``weight_ih_l0`` etc.) are stored in torch layout on the
  flax side, so they copy through unchanged.

Leading ``module.`` prefixes from ``nn.DataParallel`` checkpoints are
stripped, mirroring the reference's ``copyStateDict`` (``ocr/net.py:
24-34``) and ``renameStateDict`` (``ocr/pipeline.py:24-37``).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

_FLAX_TO_TORCH_LEAF = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _torch_key(path: tuple) -> str:
    """flax variable path -> torch state-dict key.  THE single mapping
    rule — importer, exporter, and audit all derive from it so they
    cannot drift apart."""
    _, *module_path, leaf = path
    return ".".join([*module_path, _FLAX_TO_TORCH_LEAF.get(leaf, leaf)])


def strip_module_prefix(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Remove DataParallel 'module.' key prefixes if present."""
    keys = list(state_dict.keys())
    if keys and keys[0].startswith("module"):
        return {k.split(".", 1)[1]: v for k, v in state_dict.items()}
    return dict(state_dict)


def import_torch_state_dict(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, Any],
    strict: bool = True,
) -> dict[str, Any]:
    """Fill a flax ``variables`` template from a torch ``state_dict``.

    ``strict=True`` raises if any template leaf has no torch source.
    Extra torch keys (e.g. the TPS GridGenerator's precomputed buffers,
    ``num_batches_tracked``) are always ignored — we recompute those.
    """
    state_dict = strip_module_prefix(state_dict)
    flat = traverse_util.flatten_dict(variables)
    out = {}
    missing = []
    for path, template in flat.items():
        leaf = path[-1]
        torch_key = _torch_key(path)
        if torch_key not in state_dict:
            missing.append(torch_key)
            out[path] = template
            continue
        arr = _to_numpy(state_dict[torch_key])
        if leaf == "kernel":
            if arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            elif arr.ndim == 2:
                arr = np.transpose(arr, (1, 0))
        t_shape = tuple(np.shape(template))
        if tuple(arr.shape) != t_shape:
            raise ValueError(
                f"shape mismatch for {torch_key}: torch {arr.shape} vs "
                f"flax {t_shape} at {'/'.join(path)}"
            )
        out[path] = jnp.asarray(arr, dtype=jnp.asarray(template).dtype)
    if strict and missing:
        raise KeyError(
            f"{len(missing)} template leaves missing from state dict, e.g. "
            + ", ".join(missing[:8])
        )
    return traverse_util.unflatten_dict(out)


def audit_torch_import(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, Any],
) -> tuple[list[str], list[str]]:
    """(missing, unconsumed) key audit for a template/state-dict pair.

    ``missing``     — template leaves with no torch source (import would
                      fall back to the init value);
    ``unconsumed``  — torch keys no template leaf maps onto (real weights
                      the import would silently drop).

    Torch bookkeeping buffers that are *recomputed* on the flax side are
    excluded from ``unconsumed``: BatchNorm ``num_batches_tracked`` and
    the TPS GridGenerator's precomputed constants (``inv_delta_C``,
    ``P_hat``, ``C``, ``P`` — trace-time numpy constants in models/tps.py).
    Used by the full-key importer golden test to prove the mapping covers
    the reference's REAL ``state_dict()`` trees (``ocr/net.py:24-34``).
    """
    state_dict = strip_module_prefix(state_dict)
    flat = traverse_util.flatten_dict(variables)
    consumed, missing = set(), []
    for path, _ in flat.items():
        torch_key = _torch_key(path)
        if torch_key in state_dict:
            consumed.add(torch_key)
        else:
            missing.append(torch_key)
    recomputed = ("num_batches_tracked", "inv_delta_C", "P_hat")
    unconsumed = [
        k
        for k in state_dict
        if k not in consumed and not k.endswith(recomputed)
    ]
    return missing, unconsumed


def export_torch_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> torch-layout state dict (numpy).

    Useful for checkpoint interchange and round-trip tests.
    """
    flat = traverse_util.flatten_dict(variables)
    out: dict[str, np.ndarray] = {}
    for path, value in flat.items():
        arr = np.asarray(value)
        if path[-1] == "kernel":
            if arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))
            elif arr.ndim == 2:
                arr = np.transpose(arr, (1, 0))
        out[_torch_key(path)] = arr
    return out


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` state dict into numpy arrays (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in strip_module_prefix(sd).items()}
