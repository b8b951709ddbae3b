"""Device mesh construction and sharding rules.

The reference's entire parallelism story is single-host
``nn.DataParallel`` (``ocr/net.py:62-63,137-138``, ``ocr/train/crnn.py:
100-101``) — replicate the module, scatter the batch, implicit gather.
The TPU-native replacement (SURVEY §2.4): a ``jax.sharding.Mesh`` with
``('data', 'model')`` axes; batches are sharded over ``data``; large 2D
kernels may shard their output dim over ``model`` (GSPMD tensor
parallelism — unused at these model sizes by default but wired so
``mesh_model > 1`` works).  XLA inserts the psum/all-gather collectives
over ICI; there is no hand-written communication layer.

Multi-host: call :func:`initialize_distributed` first (maps to
``jax.distributed.initialize``); the mesh then spans all processes'
devices and DP gradients ride DCN across slices.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. ``data=-1`` uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model:
        raise ValueError(f"model axis {model} must divide device count {n}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params: Any, mesh: Mesh) -> Any:
    """Per-leaf NamedSharding for the model axis (GSPMD tensor
    parallelism), driven by the leaf's name and layout — never the
    contraction dimension:

    * flax ``Dense``/embedding kernels ``[in, out]`` — shard ``out``
      (column parallel; XLA all-gathers activations where consumers need
      the full feature dim).
    * conv kernels ``[kh, kw, in, out]`` — shard the output channels.
    * torch-layout recurrent weights ``weight_ih/weight_hh [4H, *]`` —
      shard the *gate* dimension (dim 0, the matmul output since these
      are applied transposed); gate mixing inside the cell is resolved
      by GSPMD.
    * biases and BN scales stay replicated (tiny; the sharded matmul
      output plus a replicated bias is a local add).

    Leaves whose shardable dim is indivisible by the axis (or too small
    to be worth it) replicate.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def _fits(dim: int) -> bool:
        return dim % model_size == 0 and dim >= 2 * model_size

    def rule(path, leaf):
        shape = np.shape(leaf)
        if model_size > 1 and shape:
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name.startswith(("weight_ih", "weight_hh")):
                if len(shape) == 2 and _fits(shape[0]):
                    return NamedSharding(mesh, P(MODEL_AXIS, None))
            elif name == "kernel" and len(shape) == 2 and _fits(shape[1]):
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            elif name == "kernel" and len(shape) == 4 and _fits(shape[3]):
                return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the data-parallel sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    rules = param_sharding_rules(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, rules)
