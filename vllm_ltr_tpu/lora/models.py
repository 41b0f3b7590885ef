"""LoRA adapter loading + device-side stacked adapter bank.

Behavioral counterpart of reference ``vllm/lora/`` (models.py 641,
layers.py 1,127, punica.py + csrc/punica BGMV ~2,800 LoC CUDA): adapters
load from HF/peft checkpoints into a fixed bank of device arrays, and
per-token application is a masked low-rank matmul batched over the (small)
adapter bank — the TPU-idiomatic BGMV: with <= max_loras adapters,
``delta = sum_l mask_l * (x @ A_l) @ B_l * scale_l`` runs as two dense
einsums over the bank axis, fully on the MXU, with no gather/scatter.

Slot 0 of every bank is zeros = "no adapter".
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

# Llama-family projection names we support adapters on.
TARGET_TO_PARAM = {
    "q_proj": "q",
    "k_proj": "k",
    "v_proj": "v",
    "o_proj": "o",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}


@dataclass
class LoRAAdapter:
    """One loaded adapter: per-layer, per-target A/B matrices + scaling."""
    rank: int
    scaling: float
    # target -> (A [L, H_in, r], B [L, r, H_out]) numpy stacks.
    weights: Dict[str, Tuple[np.ndarray, np.ndarray]]


def load_lora_adapter(path: str, num_layers: int,
                      dtype=np.float32) -> LoRAAdapter:
    """Load a peft-format LoRA checkpoint directory
    (adapter_config.json + adapter_model.safetensors / .bin)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    rank = cfg["r"]
    alpha = cfg.get("lora_alpha", rank)
    scaling = alpha / rank

    sd = {}
    safep = os.path.join(path, "adapter_model.safetensors")
    binp = os.path.join(path, "adapter_model.bin")
    if os.path.exists(safep):
        from safetensors.numpy import load_file
        sd = load_file(safep)
    elif os.path.exists(binp):
        import torch
        sd = {
            k: v.float().numpy()
            for k, v in torch.load(binp, map_location="cpu",
                                   weights_only=True).items()
        }
    else:
        raise FileNotFoundError(f"No adapter weights in {path}")

    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for target, short in TARGET_TO_PARAM.items():
        a_list, b_list = [], []
        found = False
        for i in range(num_layers):
            a_key = None
            for pattern in (
                    f"base_model.model.model.layers.{i}.self_attn.{target}."
                    f"lora_A.weight",
                    f"base_model.model.model.layers.{i}.mlp.{target}."
                    f"lora_A.weight",
                    f"model.layers.{i}.self_attn.{target}.lora_A.weight",
                    f"model.layers.{i}.mlp.{target}.lora_A.weight",
            ):
                if pattern in sd:
                    a_key = pattern
                    break
            if a_key is None:
                break
            found = True
            b_key = a_key.replace("lora_A", "lora_B")
            # peft stores A [r, H_in], B [H_out, r]; we store input-major.
            a_list.append(np.asarray(sd[a_key], dtype).T)  # [H_in, r]
            b_list.append(np.asarray(sd[b_key], dtype).T)  # [r, H_out]
        if found:
            if len(a_list) != num_layers:
                raise ValueError(
                    f"Adapter targets {target} on only {len(a_list)} of "
                    f"{num_layers} layers; partial-layer adapters are not "
                    "supported")
            weights[short] = (np.stack(a_list), np.stack(b_list))
    if not weights:
        raise ValueError(f"No supported LoRA targets found in {path}")
    return LoRAAdapter(rank=rank, scaling=scaling, weights=weights)


class LoRABank:
    """Fixed device bank of up to ``max_loras`` adapters.

    Bank arrays per target: A [S, L, H_in, r_max], B [S, L, r_max, H_out]
    with S = max_loras + 1 (slot 0 = no adapter). Also per-slot scaling.
    Counterpart of the reference's LoRAModelManager slot machinery
    (vllm/lora/models.py) with LRU eviction.
    """

    def __init__(self, max_loras: int, max_rank: int, num_layers: int,
                 dtype=jnp.float32) -> None:
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.num_layers = num_layers
        self.dtype = dtype
        # int_id -> slot (1..max_loras)
        self.slot_of: Dict[int, int] = {}
        self._lru: List[int] = []
        self.banks: Optional[Dict[str, Tuple[jax.Array, jax.Array]]] = None
        self.scalings: Optional[jax.Array] = None  # [S]
        self._dims: Dict[str, Tuple[int, int]] = {}

    def _ensure_banks(self, adapter: LoRAAdapter) -> None:
        if self.banks is not None:
            return
        S = self.max_loras + 1
        banks = {}
        for target, (a, b) in adapter.weights.items():
            _, H_in, _ = a.shape[0], a.shape[1], a.shape[2]
            H_out = b.shape[2]
            banks[target] = (jnp.zeros(
                (S, self.num_layers, a.shape[1], self.max_rank),
                self.dtype),
                             jnp.zeros(
                                 (S, self.num_layers, self.max_rank,
                                  H_out), self.dtype))
            self._dims[target] = (a.shape[1], H_out)
        self.banks = banks
        self.scalings = jnp.zeros((S, ), jnp.float32)

    def add_adapter(self, int_id: int, adapter: LoRAAdapter) -> int:
        """Load an adapter into a free (or LRU-evicted) slot; returns slot."""
        if int_id in self.slot_of:
            self._touch(int_id)
            return self.slot_of[int_id]
        if adapter.rank > self.max_rank:
            raise ValueError(
                f"Adapter rank {adapter.rank} > max_lora_rank "
                f"{self.max_rank}")
        self._ensure_banks(adapter)
        if len(self.slot_of) >= self.max_loras:
            evict_id = self._lru.pop(0)
            slot = self.slot_of.pop(evict_id)
            logger.info("Evicting LoRA %d from slot %d", evict_id, slot)
        else:
            slot = len(self.slot_of) + 1
        r = adapter.rank
        for target, (a, b) in adapter.weights.items():
            A, B = self.banks[target]
            A = A.at[slot].set(0.0)
            B = B.at[slot].set(0.0)
            A = A.at[slot, :, :, :r].set(jnp.asarray(a, self.dtype))
            B = B.at[slot, :, :r, :].set(jnp.asarray(b, self.dtype))
            self.banks[target] = (A, B)
        self.scalings = self.scalings.at[slot].set(adapter.scaling)
        self.slot_of[int_id] = slot
        self._lru.append(int_id)
        return slot

    def _touch(self, int_id: int) -> None:
        if int_id in self._lru:
            self._lru.remove(int_id)
        self._lru.append(int_id)

    def slot_for(self, int_id: int) -> int:
        return self.slot_of.get(int_id, 0)


def apply_lora(x: jax.Array, layer_a: jax.Array, layer_b: jax.Array,
               scalings: jax.Array, token_slot: jax.Array) -> jax.Array:
    """Masked bank BGMV for one layer: x [T, H_in],
    layer_a [S, H_in, r], layer_b [S, r, H_out], token_slot [T] in [0, S).
    Returns delta [T, H_out]."""
    S = layer_a.shape[0]
    # [S, T] activation mask: token belongs to slot s (slot 0 contributes 0
    # because its weights are zero, but mask it anyway to save nothing —
    # kept for clarity).
    mask = (token_slot[None, :] == jnp.arange(S)[:, None]).astype(x.dtype)
    xs = x[None, :, :] * mask[:, :, None]  # [S, T, H_in]
    low = jnp.einsum("sth,shr->str", xs, layer_a)
    delta = jnp.einsum("str,srn->stn", low, layer_b)
    delta = delta * scalings[:, None, None].astype(delta.dtype)
    return jnp.sum(delta, axis=0)
