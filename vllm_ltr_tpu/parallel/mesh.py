"""Device mesh + sharding layout.

TPU-native counterpart of the reference's distributed layer
(``vllm/distributed/parallel_state.py`` Megatron TP/PP groups + NCCL/pynccl/
custom all-reduce): here a single `jax.sharding.Mesh` with named axes and
GSPMD-inserted collectives replaces all five communication mechanisms
(SURVEY.md §2.5). Axis names:

* ``data``  — replica / data parallel (batch-sharded)
* ``model`` — tensor parallel (head/hidden-sharded; collectives ride ICI)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_GLOBAL_MESH: Optional[Mesh] = None


def build_mesh(tensor_parallel_size: int = 1,
               data_parallel_size: int = 1,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With multi-host slices, `jax.devices()` already spans all hosts (after
    ``jax.distributed.initialize``); the same single-controller program runs
    everywhere — no Ray actors, no broadcast_tensor_dict.
    """
    if devices is None:
        devices = jax.devices()
    n = tensor_parallel_size * data_parallel_size
    if n > len(devices):
        raise ValueError(
            f"Requested {n} devices (tp={tensor_parallel_size} x "
            f"dp={data_parallel_size}) but only {len(devices)} available.")
    grid = np.array(devices[:n]).reshape(data_parallel_size,
                                         tensor_parallel_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def set_global_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = build_mesh(1, 1)
    return _GLOBAL_MESH


def tp_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or get_global_mesh()
    return mesh.shape[MODEL_AXIS]


@dataclass(frozen=True)
class ShardingLayout:
    """Named shardings for every array family in the serving engine."""
    mesh: Mesh

    def _ns(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    # Weights -----------------------------------------------------------
    @property
    def replicated(self) -> NamedSharding:
        return self._ns()

    @property
    def col_parallel(self) -> NamedSharding:
        """[in, out] with out sharded (ColumnParallelLinear equivalent)."""
        return self._ns(None, MODEL_AXIS)

    @property
    def row_parallel(self) -> NamedSharding:
        """[in, out] with in sharded (RowParallelLinear; psum inserted by
        XLA at the following contraction)."""
        return self._ns(MODEL_AXIS, None)

    @property
    def vocab_parallel(self) -> NamedSharding:
        """[vocab, hidden] embedding sharded over vocab."""
        return self._ns(MODEL_AXIS, None)

    # KV cache ----------------------------------------------------------
    @property
    def kv_cache(self) -> NamedSharding:
        """[layers, num_blocks+1, 2, kv_heads, block_size, head_dim]
        (page-major, ops/kv_cache.py) sharded over kv heads."""
        return self._ns(None, None, None, MODEL_AXIS, None, None)

    # Activations --------------------------------------------------------
    @property
    def tokens(self) -> NamedSharding:
        """Flattened token batch: replicated (small int arrays)."""
        return self._ns()
