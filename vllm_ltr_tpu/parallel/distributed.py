"""Multi-host runtime initialization + host-side plan broadcast.

TPU-native counterpart of the reference's process/communication stack
(vllm/worker/worker.py:283-320 init_worker_distributed_environment,
vllm/distributed/parallel_state.py, Ray actor RPC + NCCL broadcast):
here `jax.distributed.initialize` brings every host's chips into one
global device set, the engine's scheduler runs on process 0 ("leader"),
and each step's packed plan is mirrored to the other processes with a
device-backed one-to-all broadcast (`jax.experimental.multihost_utils`) —
the analogue of the reference's `broadcast_tensor_dict`
(worker.py:228-240), except the payload is the already-packed step arrays.

Environment/flag surface (reference: torchrun-style MASTER_ADDR/RANK):
  --distributed-coordinator / LTR_TPU_COORDINATOR   host:port of process 0
  --distributed-num-processes / LTR_TPU_NUM_PROCESSES
  --distributed-process-id / LTR_TPU_PROCESS_ID
On TPU pods all three are omitted and JAX auto-detects from the metadata
server.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

_INITIALIZED = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join (or form) the multi-host runtime. Safe to call once per
    process; a no-op for single-process runs with no coordinator."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator = coordinator or os.environ.get("LTR_TPU_COORDINATOR")
    env_np = os.environ.get("LTR_TPU_NUM_PROCESSES")
    env_pid = os.environ.get("LTR_TPU_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)

    if coordinator is None and not num_processes:
        return  # single host, nothing to do

    import jax
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    logger.info(
        "distributed runtime up: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()))


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_leader() -> bool:
    return process_index() == 0


# ---------------------------------------------------------------------------
# Step-plan broadcast (leader -> followers)
# ---------------------------------------------------------------------------

# Opcodes of the follower protocol.
OP_STOP = 0
OP_STEP = 1
OP_SWAP_OUT = 2
OP_SWAP_IN = 3
OP_COPY = 4
OP_AUX_SCORE = 5
OP_MULTI_STEP = 6
OP_ADD_LORA = 7
OP_SPEC_STEP = 8

# Fixed header layout (i32): [opcode, 15 x op-specific fields].
HEADER_LEN = 16


def broadcast_header(header: Optional[np.ndarray]) -> np.ndarray:
    """Mirror a HEADER_LEN i32 vector from the leader to every process."""
    from jax.experimental import multihost_utils
    if header is None:
        header = np.zeros(HEADER_LEN, np.int32)
    assert header.shape == (HEADER_LEN, )
    return np.asarray(
        multihost_utils.broadcast_one_to_all(header.astype(np.int32)))


def broadcast_array(arr: Optional[np.ndarray], shape,
                    dtype) -> np.ndarray:
    """Mirror one array (leader value; followers pass None + the shape the
    header told them)."""
    from jax.experimental import multihost_utils
    if arr is None:
        arr = np.zeros(shape, dtype)
    assert tuple(arr.shape) == tuple(shape), (arr.shape, shape)
    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(arr, dtype)))
