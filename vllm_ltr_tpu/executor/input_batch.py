"""Host-side batch preparation: scheduler metadata -> padded device arrays.

Counterpart of reference ``vllm/worker/model_runner.py`` ``_prepare_prompt``/
``_prepare_decode``/``_prepare_sample`` (:246-651), re-designed for XLA's
static shapes: every step produces one flattened token batch padded to a
(token-bucket, seq-bucket) pair, so recompilation only happens per bucket —
the TPU analogue of CUDA-graph capture per batch size (:974-1226).

All assembly is vectorized numpy; one host->device transfer per step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from vllm_ltr_tpu.sampling_params import SamplingParams, SamplingType
from vllm_ltr_tpu.sequence import SequenceGroupMetadata
from vllm_ltr_tpu.utils import pad_to_bucket

_PAD_SLOT = -1


def make_buckets(lo: int, hi: int) -> List[int]:
    out = []
    b = lo
    while b < hi:
        out.append(b)
        b *= 2
    out.append(hi)
    return out


@dataclass
class PreparedBatch:
    """Padded numpy arrays for one engine step (shapes: T tokens, S seqs)."""
    tokens: np.ndarray  # i32[T]
    positions: np.ndarray  # i32[T]
    token_seq: np.ndarray  # i32[T] (-1 pad)
    slot_mapping: np.ndarray  # i32[T] (-1 pad -> trash slot)
    block_tables: np.ndarray  # i32[S, MB]
    seq_lens: np.ndarray  # i32[S]
    sample_idx: np.ndarray  # i32[S] index into T of last token per seq
    # sampling tensors
    temperature: np.ndarray  # f32[S]
    top_p: np.ndarray  # f32[S]
    top_k: np.ndarray  # i32[S]
    min_p: np.ndarray  # f32[S]
    greedy: np.ndarray  # bool[S]
    presence_penalty: np.ndarray  # f32[S]
    frequency_penalty: np.ndarray  # f32[S]
    repetition_penalty: np.ndarray  # f32[S]
    # bookkeeping (host only)
    num_real_tokens: int
    num_real_seqs: int
    # seq order: (seq_group index, seq_id) per row
    row_owners: List[Tuple[int, int]]
    # rows whose sampled token should be applied (prefill complete or decode)
    rows_to_sample: List[int]
    # True when every scheduled group is a single decode token (row-aligned)
    decode_only: bool = False
    # i32[T] LoRA bank slot per token (None when no request uses LoRA)
    lora_slots: Optional[np.ndarray] = None
    # token counts for penalties, or None when no request uses penalties
    token_counts: Optional[np.ndarray] = None  # u8[S, V]


def prepare_batch(
    seq_group_metadata_list: List[SequenceGroupMetadata],
    block_size: int,
    max_blocks_per_seq: int,
    token_buckets: List[int],
    seq_buckets: List[int],
    vocab_size: int,
    lora_slot_of=None,
) -> PreparedBatch:
    decode_only = all(not m.is_prompt for m in seq_group_metadata_list)
    tokens: List[int] = []
    positions: List[int] = []
    token_seq: List[int] = []
    slot_mapping: List[int] = []
    seq_rows: List[Dict] = []
    row_owners: List[Tuple[int, int]] = []
    rows_to_sample: List[int] = []
    any_penalty = False

    lora_token_slots: List[int] = []
    any_lora = any(m.lora_request is not None
                   for m in seq_group_metadata_list)

    row = 0
    for g_idx, meta in enumerate(seq_group_metadata_list):
        sp = meta.sampling_params
        lora_slot = 0
        if any_lora and meta.lora_request is not None:
            assert lora_slot_of is not None, "LoRA request without a bank"
            lora_slot = lora_slot_of(meta.lora_request.lora_int_id)
        if (sp.presence_penalty != 0.0 or sp.frequency_penalty != 0.0
                or sp.repetition_penalty != 1.0):
            any_penalty = True
        if meta.is_prompt:
            # One (possibly chunked) prompt sequence.
            (seq_id, ) = meta.seq_data.keys()
            data = meta.seq_data[seq_id]
            computed = data.get_num_computed_tokens()
            chunk = meta.token_chunk_size
            all_tokens = data.get_token_ids()
            new_tokens = all_tokens[computed:computed + chunk]
            block_table = meta.block_tables[seq_id]
            start = len(tokens)
            tokens.extend(new_tokens)
            positions.extend(range(computed, computed + chunk))
            token_seq.extend([row] * chunk)
            for pos in range(computed, computed + chunk):
                b = block_table[pos // block_size]
                slot_mapping.append(_PAD_SLOT if b < 0 else b * block_size +
                                    pos % block_size)
            seq_rows.append({
                "block_table": block_table,
                "seq_len": computed + chunk,
                "sample_idx": start + chunk - 1,
                "params": sp,
                "data": data,
            })
            row_owners.append((g_idx, seq_id))
            lora_token_slots.extend([lora_slot] * chunk)
            # Sample only when the prefill completes this step.
            if computed + chunk == data.get_len():
                rows_to_sample.append(row)
            row += 1
        else:
            for seq_id, data in meta.seq_data.items():
                block_table = meta.block_tables[seq_id]
                pos = data.get_len() - 1
                start = len(tokens)
                tokens.append(data.get_last_token_id())
                positions.append(pos)
                token_seq.append(row)
                b = block_table[pos // block_size]
                slot_mapping.append(_PAD_SLOT if b < 0 else b * block_size +
                                    pos % block_size)
                seq_rows.append({
                    "block_table": block_table,
                    "seq_len": pos + 1,
                    "sample_idx": start,
                    "params": sp,
                    "data": data,
                })
                row_owners.append((g_idx, seq_id))
                lora_token_slots.append(lora_slot)
                rows_to_sample.append(row)
                row += 1

    num_real_tokens = len(tokens)
    num_real_seqs = len(seq_rows)
    S = pad_to_bucket(max(num_real_seqs, 1), seq_buckets)
    if decode_only:
        # Decode-only steps keep token row i == sequence row i so the
        # streaming decode kernel can treat q as [S, ...].
        T = S
    else:
        T = pad_to_bucket(max(num_real_tokens, 1), token_buckets)
    assert num_real_tokens <= T and num_real_seqs <= S, (
        f"batch exceeds buckets: {num_real_tokens}>{T} or "
        f"{num_real_seqs}>{S}")

    def pad1(arr, size, fill, dtype=np.int32):
        out = np.full((size, ), fill, dtype=dtype)
        out[:len(arr)] = arr
        return out

    MB = max_blocks_per_seq
    block_tables = np.zeros((S, MB), dtype=np.int32)
    seq_lens = np.zeros((S, ), dtype=np.int32)
    sample_idx = np.zeros((S, ), dtype=np.int32)
    temperature = np.full((S, ), 1.0, dtype=np.float32)
    top_p = np.ones((S, ), dtype=np.float32)
    top_k = np.full((S, ), vocab_size, dtype=np.int32)
    min_p = np.zeros((S, ), dtype=np.float32)
    greedy = np.ones((S, ), dtype=bool)
    presence = np.zeros((S, ), dtype=np.float32)
    frequency = np.zeros((S, ), dtype=np.float32)
    repetition = np.ones((S, ), dtype=np.float32)
    token_counts = (np.zeros((S, vocab_size), dtype=np.uint8)
                    if any_penalty else None)

    for i, sr in enumerate(seq_rows):
        bt = [b for b in sr["block_table"] if b is not None and b >= 0]
        block_tables[i, :len(bt)] = bt[:MB]
        seq_lens[i] = sr["seq_len"]
        sample_idx[i] = sr["sample_idx"]
        sp: SamplingParams = sr["params"]
        temperature[i] = sp.temperature
        top_p[i] = sp.top_p
        top_k[i] = sp.top_k if sp.top_k > 0 else vocab_size
        min_p[i] = sp.min_p
        greedy[i] = sp.sampling_type in (SamplingType.GREEDY,
                                         SamplingType.BEAM)
        presence[i] = sp.presence_penalty
        frequency[i] = sp.frequency_penalty
        repetition[i] = sp.repetition_penalty
        if token_counts is not None:
            ids = np.asarray(sr["data"].get_token_ids(), dtype=np.int64)
            np.add.at(token_counts[i], ids, 1)

    return PreparedBatch(
        tokens=pad1(tokens, T, 0),
        positions=pad1(positions, T, 0),
        token_seq=pad1(token_seq, T, -1),
        slot_mapping=pad1(slot_mapping, T, _PAD_SLOT),
        block_tables=block_tables,
        seq_lens=seq_lens,
        sample_idx=sample_idx,
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        min_p=min_p,
        greedy=greedy,
        presence_penalty=presence,
        frequency_penalty=frequency,
        repetition_penalty=repetition,
        num_real_tokens=num_real_tokens,
        num_real_seqs=num_real_seqs,
        row_owners=row_owners,
        rows_to_sample=rows_to_sample,
        decode_only=decode_only,
        lora_slots=pad1(lora_token_slots, T, 0) if any_lora else None,
        token_counts=token_counts,
    )
