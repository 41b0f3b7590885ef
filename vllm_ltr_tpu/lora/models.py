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
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)

# Projection names adapters may target, per family (reference wraps every
# parallel layer, vllm/lora/layers.py):
#   llama-family: q/k/v/o_proj, gate/up/down_proj
#   OPT-family:   q/k/v_proj, out_proj, fc1, fc2
# Short names match the model files' per-layer param prefixes (llama.py
# q_w..down_w, opt.py out_w/fc1_w/fc2_w) so the model's _lora() hook
# finds `lora_{short}_a/b` in the scanned layer params.
TARGET_TO_PARAM = {
    "q_proj": "q",
    "k_proj": "k",
    "v_proj": "v",
    "o_proj": "o",
    "out_proj": "out",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
    "fc1": "fc1",
    "fc2": "fc2",
}

# Matches decoder-layer LoRA A keys across peft prefix spellings:
# [base_model.model.]model.[decoder.]layers.{i}.[self_attn.|mlp.]{target}.
_LAYER_A_RE = re.compile(
    r"(?:^|\.)layers\.(\d+)\.(?:self_attn\.|mlp\.)?"
    r"([A-Za-z0-9_]+)\.lora_A\.weight$")


@dataclass
class LoRAAdapter:
    """One loaded adapter: per-layer, per-target A/B matrices + scaling."""
    rank: int
    scaling: float
    # target -> (A [L, H_in, r], B [L, r, H_out]) numpy stacks.
    weights: Dict[str, Tuple[np.ndarray, np.ndarray]]
    # Optional non-layer adapters (reference lora/layers.py wraps the
    # vocab embedding and the logits head too):
    embed: Optional[Tuple[np.ndarray, np.ndarray]] = None  # [V,r], [r,H]
    lm_head: Optional[Tuple[np.ndarray, np.ndarray]] = None  # [H,r], [r,V]


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

    per_target: Dict[str, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    embed = None
    lm_head = None
    skipped: set = set()
    for key, val in sd.items():
        m = _LAYER_A_RE.search(key)
        if m is not None:
            layer, target = int(m.group(1)), m.group(2)
            short = TARGET_TO_PARAM.get(target)
            if short is None:
                skipped.add(target)
                continue
            b = sd[key.replace("lora_A", "lora_B")]
            # peft stores A [r, H_in], B [H_out, r]; we store input-major.
            per_target.setdefault(short, {})[layer] = (
                np.asarray(val, dtype).T, np.asarray(b, dtype).T)
            continue
        if "embed_tokens.lora_embedding_A" in key:
            # peft Embedding adapters: A [r, V], B [H, r].
            b = sd[key.replace("lora_embedding_A", "lora_embedding_B")]
            embed = (np.asarray(val, dtype).T, np.asarray(b, dtype).T)
        elif "embed_tokens.lora_A" in key:
            b = sd[key.replace("lora_A", "lora_B")]
            embed = (np.asarray(val, dtype).T, np.asarray(b, dtype).T)
        elif re.search(r"lm_head\.lora_A", key):
            b = sd[key.replace("lora_A", "lora_B")]
            lm_head = (np.asarray(val, dtype).T, np.asarray(b, dtype).T)
    if skipped:
        logger.warning("LoRA %s: unsupported targets skipped: %s", path,
                       sorted(skipped))

    weights: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for short, by_layer in per_target.items():
        if len(by_layer) != num_layers:
            raise ValueError(
                f"Adapter targets {short} on only {len(by_layer)} of "
                f"{num_layers} layers; partial-layer adapters are not "
                "supported")
        weights[short] = (np.stack([by_layer[i][0]
                                    for i in range(num_layers)]),
                          np.stack([by_layer[i][1]
                                    for i in range(num_layers)]))
    if not weights and embed is None and lm_head is None:
        raise ValueError(f"No supported LoRA targets found in {path}")
    return LoRAAdapter(rank=rank, scaling=scaling, weights=weights,
                       embed=embed, lm_head=lm_head)


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
        # Non-layer banks: embed (A [S, V, r], B [S, r, H]) and lm_head
        # (A [S, H, r], B [S, r, V]); None until an adapter carries one.
        self.embed_bank: Optional[Tuple[jax.Array, jax.Array]] = None
        self.head_bank: Optional[Tuple[jax.Array, jax.Array]] = None
        self.scalings: Optional[jax.Array] = None  # [S]
        self._dims: Dict[str, Tuple[int, int]] = {}

    def _ensure_banks(self, adapter: LoRAAdapter) -> None:
        S = self.max_loras + 1
        if self.banks is None:
            self.banks = {}
            self.scalings = jnp.zeros((S, ), jnp.float32)
        for target, (a, b) in adapter.weights.items():
            if target in self.banks:
                continue
            H_out = b.shape[2]
            self.banks[target] = (jnp.zeros(
                (S, self.num_layers, a.shape[1], self.max_rank),
                self.dtype),
                                  jnp.zeros(
                                      (S, self.num_layers, self.max_rank,
                                       H_out), self.dtype))
            self._dims[target] = (a.shape[1], H_out)
        if adapter.embed is not None and self.embed_bank is None:
            V, _ = adapter.embed[0].shape
            H = adapter.embed[1].shape[1]
            self.embed_bank = (jnp.zeros((S, V, self.max_rank), self.dtype),
                               jnp.zeros((S, self.max_rank, H), self.dtype))
        if adapter.lm_head is not None and self.head_bank is None:
            H, _ = adapter.lm_head[0].shape
            V = adapter.lm_head[1].shape[1]
            self.head_bank = (jnp.zeros((S, H, self.max_rank), self.dtype),
                              jnp.zeros((S, self.max_rank, V), self.dtype))

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
        # Targets this adapter does NOT carry keep whatever the evicted
        # occupant left; zero the slot in every bank for correctness.
        for target in self.banks:
            if target not in adapter.weights:
                A, B = self.banks[target]
                self.banks[target] = (A.at[slot].set(0.0),
                                      B.at[slot].set(0.0))
        if self.embed_bank is not None:
            A, B = self.embed_bank
            A, B = A.at[slot].set(0.0), B.at[slot].set(0.0)
            if adapter.embed is not None:
                A = A.at[slot, :, :r].set(
                    jnp.asarray(adapter.embed[0], self.dtype))
                B = B.at[slot, :r, :].set(
                    jnp.asarray(adapter.embed[1], self.dtype))
            self.embed_bank = (A, B)
        if self.head_bank is not None:
            A, B = self.head_bank
            A, B = A.at[slot].set(0.0), B.at[slot].set(0.0)
            if adapter.lm_head is not None:
                A = A.at[slot, :, :r].set(
                    jnp.asarray(adapter.lm_head[0], self.dtype))
                B = B.at[slot, :r, :].set(
                    jnp.asarray(adapter.lm_head[1], self.dtype))
            self.head_bank = (A, B)
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


def apply_embedding_lora(params, tokens: jax.Array, emb: jax.Array,
                         slots) -> jax.Array:
    """Add the embedding-adapter delta for a token batch: for token t in
    adapter slot s, delta = A[s, token] @ B[s] * scale[s] (the one-hot
    input makes the low-rank product a row gather).  No-op (returns emb)
    when no loaded adapter carries embedding weights or the batch has no
    adapters (reference wraps VocabParallelEmbedding,
    vllm/lora/layers.py)."""
    a = params.get("lora_embed_a")
    if a is None or slots is None:
        return emb
    b = params["lora_embed_b"]  # [S, r, H]
    ar = a[slots, tokens]  # [T, r]
    delta = jnp.einsum("tr,trh->th", ar, b[slots],
                       preferred_element_type=jnp.float32)
    scale = params["lora_scalings"][slots][:, None]
    return emb + (delta * scale).astype(emb.dtype)


def apply_lm_head_lora(params, sel: jax.Array, logits: jax.Array,
                       row_slots) -> jax.Array:
    """Add the logits-head adapter delta for sampled rows [R, H]
    (reference wraps the logits processor's lm_head,
    vllm/lora/layers.py LogitsProcessorWithLoRA)."""
    a = params.get("lora_lm_head_a")
    if a is None or row_slots is None:
        return logits
    delta = apply_lora(sel, a, params["lora_lm_head_b"],
                       params["lora_scalings"], row_slots)
    return logits + delta.astype(logits.dtype)


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
