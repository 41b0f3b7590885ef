"""Host-side batch preparation: scheduler metadata -> padded device arrays.

Counterpart of reference ``vllm/worker/model_runner.py`` ``_prepare_prompt``/
``_prepare_decode``/``_prepare_sample`` (:246-651), re-designed for XLA's
static shapes: every step produces one flattened token batch padded to a
(token-bucket, seq-bucket) pair, so recompilation only happens per bucket —
the TPU analogue of CUDA-graph capture per batch size (:974-1226).

Per-group assembly is Python; the per-token flattening (the host hot loop)
runs in the native C++ packer (csrc_tpu/batch_prep.cpp via
executor/native.py), with a numpy fallback.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from vllm_ltr_tpu.executor import native
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
    # True when prefill rows are tile-aligned (Pallas prefill kernel layout)
    prefill_aligned: bool = False
    # i32[T] LoRA bank slot per token (None when no request uses LoRA)
    lora_slots: Optional[np.ndarray] = None
    # token counts for penalties, or None when no request uses penalties
    token_counts: Optional[np.ndarray] = None  # u8[S, V]
    # guided decoding: bit-packed allowed-token mask, or None when no
    # scheduled request carries a guide (u8[S, ceil(V/8)], np.packbits)
    logits_mask: Optional[np.ndarray] = None
    # i32[T // block_size] destination cache block per flat token page
    # when the layout permits page-granular KV writes (prefill batches;
    # see ops/kv_cache.py write_kv_pages); None = token-scatter fallback
    page_dst: Optional[np.ndarray] = None
    # True when any row's SamplingParams carries host-side
    # logits_processors (forces the two-phase sample dispatch)
    has_host_processors: bool = False


def prepare_batch(
    seq_group_metadata_list: List[SequenceGroupMetadata],
    block_size: int,
    max_blocks_per_seq: int,
    token_buckets: List[int],
    seq_buckets: List[int],
    vocab_size: int,
    lora_slot_of=None,
    prefill_tile: int = 1,
) -> PreparedBatch:
    """``prefill_tile`` > 1 tile-aligns each row's destination offset in the
    flat token layout (prefill batches only), the contract the Pallas
    chunked-prefill kernel needs: every tile of that many tokens belongs to
    at most one sequence."""
    decode_only = all(not m.is_prompt for m in seq_group_metadata_list)
    any_lora = any(m.lora_request is not None
                   for m in seq_group_metadata_list)
    MB = max_blocks_per_seq

    # Per-row descriptors (one row per scheduled sequence).
    new_token_parts: List[List[int]] = []
    row_len: List[int] = []
    row_pos0: List[int] = []
    row_lora: List[int] = []
    row_owners: List[Tuple[int, int]] = []
    rows_to_sample: List[int] = []
    seq_rows: List[Dict] = []
    any_penalty = False

    any_guide = False
    any_processors = False
    row = 0
    for g_idx, meta in enumerate(seq_group_metadata_list):
        sp = meta.sampling_params
        if (sp.presence_penalty != 0.0 or sp.frequency_penalty != 0.0
                or sp.repetition_penalty != 1.0):
            any_penalty = True
        if getattr(meta, "guide", None) is not None:
            any_guide = True
        if sp.logits_processors:
            any_processors = True
        lora_slot = 0
        if any_lora and meta.lora_request is not None:
            assert lora_slot_of is not None, "LoRA request without a bank"
            lora_slot = lora_slot_of(meta.lora_request.lora_int_id)
        if meta.is_prompt:
            (seq_id, ) = meta.seq_data.keys()
            data = meta.seq_data[seq_id]
            computed = data.get_num_computed_tokens()
            chunk = meta.token_chunk_size
            new_token_parts.append(
                data.get_token_ids()[computed:computed + chunk])
            row_len.append(chunk)
            row_pos0.append(computed)
            row_lora.append(lora_slot)
            row_owners.append((g_idx, seq_id))
            seq_rows.append({
                "block_table": meta.block_tables[seq_id],
                "seq_len": computed + chunk,
                "params": sp,
                "data": data,
                "guide": getattr(meta, "guide", None),
            })
            if computed + chunk == data.get_len():
                rows_to_sample.append(row)
            row += 1
        else:
            for seq_id, data in meta.seq_data.items():
                pos = data.get_len() - 1
                new_token_parts.append([data.get_last_token_id()])
                row_len.append(1)
                row_pos0.append(pos)
                row_lora.append(lora_slot)
                row_owners.append((g_idx, seq_id))
                seq_rows.append({
                    "block_table": meta.block_tables[seq_id],
                    "seq_len": pos + 1,
                    "params": sp,
                    "data": data,
                    "guide": getattr(meta, "guide", None),
                })
                rows_to_sample.append(row)
                row += 1

    num_real_seqs = len(seq_rows)
    row_len_np = np.asarray(row_len, np.int32)
    # Source offsets: rows are concatenated back-to-back in all_tokens.
    row_start_np = np.zeros(num_real_seqs, np.int32)
    if num_real_seqs > 1:
        row_start_np[1:] = np.cumsum(row_len_np)[:-1]
    num_real_tokens = int(row_len_np.sum()) if num_real_seqs else 0

    # Destination offsets: tile-aligned for prefill batches so the Pallas
    # prefill kernel's tile->sequence mapping holds; contiguous otherwise.
    def dest_offsets(align: int):
        starts = np.zeros(num_real_seqs, np.int32)
        cursor = 0
        for i in range(num_real_seqs):
            starts[i] = cursor
            cursor += -(-int(row_len_np[i]) // align) * align
        return starts, cursor

    align = 1 if decode_only else max(prefill_tile, 1)
    out_start_np, num_padded_tokens = dest_offsets(align)

    if decode_only:
        # Decode-only steps keep token row i == sequence row i so the
        # streaming decode kernel can treat q as [S, ...].
        S = pad_to_bucket(max(num_real_seqs, 1), seq_buckets)
        T = S
    else:
        if align > 1 and num_padded_tokens > token_buckets[-1]:
            # Alignment waste overflows the largest bucket (many small
            # prefills in one step). NEVER fall back to the contiguous XLA
            # layout here — its per-token context gather is O(T*ctx) and
            # OOMs at serving shapes. Pad T up in coarse 512-token steps
            # above the bucket list instead (a handful of extra compiles,
            # bounded by budget + max_seqs * tile alignment waste).
            T = -(-num_padded_tokens // 512) * 512
            T = max(T, align)
            if T % align:
                T = -(-T // align) * align
        else:
            T = pad_to_bucket(max(num_padded_tokens, 1), token_buckets)
            if align > 1:
                T = max(T, align)
                if T % align:  # non-power-of-two bucket tail
                    align = 1
                    out_start_np, num_padded_tokens = dest_offsets(align)
        # Pin the prefill seq dim to ONE value per token bucket (a prompt
        # has >= 1 token, so T always covers the rows): the jit shape space
        # collapses from |token_buckets| x |seq_buckets| to |token_buckets|,
        # which kills the online compile storm (each fresh shape costs
        # 20-140 s through the remote-compile relay). The cost is sampler/
        # logits padding up to max_num_seqs rows — noise next to a prefill.
        S = min(seq_buckets[-1], T)
    prefill_aligned = (not decode_only) and align > 1
    assert num_padded_tokens <= T and num_real_seqs <= S, (
        f"batch exceeds buckets: {num_padded_tokens}>{T} or "
        f"{num_real_seqs}>{S}")

    # Dense per-row block tables for the packer + the step function.
    block_tables = np.full((S, MB), -1, dtype=np.int32)
    for i, sr in enumerate(seq_rows):
        bt = [b for b in sr["block_table"] if b is not None and b >= 0]
        block_tables[i, :len(bt)] = bt[:MB]

    all_tokens = (np.concatenate([
        np.asarray(p, np.int32) for p in new_token_parts
    ]) if num_real_tokens else np.zeros(0, np.int32))
    tokens, positions, token_seq, slot_mapping = native.pack_batch(
        all_tokens, row_start_np, out_start_np, row_len_np,
        np.asarray(row_pos0, np.int32), block_tables[:num_real_seqs],
        block_size, T)
    block_tables = np.maximum(block_tables, 0)

    # Page-granular KV write map (ops/kv_cache.py write_kv_pages): valid
    # when every token's slot offset matches its flat offset mod
    # block_size (tile-aligned runs starting on page boundaries) and each
    # flat page targets a single destination block.  Padding pages get
    # unique out-of-range indices so the device scatter both drops them
    # and keeps its unique_indices promise.
    page_dst = None
    if not decode_only and T % block_size == 0 and num_real_tokens:
        valid = slot_mapping >= 0
        t_idx = np.arange(T, dtype=np.int32)
        if np.array_equal(slot_mapping[valid] % block_size,
                          t_idx[valid] % block_size):
            P = T // block_size
            blk = np.where(valid, slot_mapping // block_size,
                           -1).reshape(P, block_size)
            mx = blk.max(axis=1)
            if bool(np.all((blk == mx[:, None]) | (blk < 0))):
                page_dst = np.where(
                    mx >= 0, mx,
                    (1 << 28) + np.arange(P, dtype=np.int32)).astype(
                        np.int32)

    # Per-row sample index: last token of each row in the flat layout.
    sample_idx = np.zeros((S, ), np.int32)
    if num_real_seqs:
        sample_idx[:num_real_seqs] = out_start_np + row_len_np - 1

    seq_lens = np.zeros((S, ), dtype=np.int32)
    temperature = np.full((S, ), 1.0, dtype=np.float32)
    top_p = np.ones((S, ), dtype=np.float32)
    top_k = np.full((S, ), vocab_size, dtype=np.int32)
    min_p = np.zeros((S, ), dtype=np.float32)
    greedy = np.ones((S, ), dtype=bool)
    presence = np.zeros((S, ), dtype=np.float32)
    frequency = np.zeros((S, ), dtype=np.float32)
    repetition = np.ones((S, ), dtype=np.float32)

    for i, sr in enumerate(seq_rows):
        seq_lens[i] = sr["seq_len"]
        sp = sr["params"]
        temperature[i] = sp.temperature
        top_p[i] = sp.top_p
        top_k[i] = sp.top_k if sp.top_k > 0 else vocab_size
        min_p[i] = sp.min_p
        greedy[i] = sp.sampling_type in (SamplingType.GREEDY,
                                         SamplingType.BEAM)
        presence[i] = sp.presence_penalty
        frequency[i] = sp.frequency_penalty
        repetition[i] = sp.repetition_penalty

    token_counts = None
    if any_penalty:
        full_ids = [
            np.asarray(sr["data"].get_token_ids(), np.int32)
            for sr in seq_rows
        ]
        lens = np.asarray([len(x) for x in full_ids], np.int32)
        starts = np.zeros(len(full_ids), np.int32)
        if len(full_ids) > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        concat = (np.concatenate(full_ids)
                  if full_ids else np.zeros(0, np.int32))
        counts = native.count_tokens(concat, starts, lens, vocab_size)
        token_counts = np.zeros((S, vocab_size), np.uint8)
        token_counts[:num_real_seqs] = counts

    logits_mask = None
    if any_guide:
        # One bit-packed allowed-token row per guided sequence (all-ones
        # for unguided rows).  The DFA state is cached on the Sequence as
        # (#output tokens consumed, state) and advanced by the delta, so
        # a step costs one cached mask lookup per guided row; a preempted
        # + recomputed sequence replays from the start automatically.
        mask8 = np.ones((S, vocab_size), np.uint8)
        sampled = set(rows_to_sample)
        for i, sr in enumerate(seq_rows):
            guide = sr["guide"]
            if guide is None:
                continue
            if i not in sampled:
                # Non-final chunked-prefill rows are never sampled; the
                # trie-vs-automaton walk (costly on first state visits at
                # large vocabs) would compute a mask that gets discarded.
                continue
            data = sr["data"]
            out_ids = data.get_output_token_ids()
            pos, state = getattr(data, "_guide_progress", (0, 0))
            if pos > len(out_ids):
                pos, state = 0, guide.start_state
            for tok in out_ids[pos:]:
                state = guide.advance(state, tok)
            data._guide_progress = (len(out_ids), state)
            mask8[i] = guide.mask(state, vocab_size)
        logits_mask = np.packbits(mask8, axis=1)

    lora_slots = None
    if any_lora:
        lora_slots = np.zeros(T, np.int32)
        for i in range(num_real_seqs):
            s, l = int(out_start_np[i]), int(row_len_np[i])
            lora_slots[s:s + l] = row_lora[i]

    return PreparedBatch(
        tokens=tokens,
        positions=positions,
        token_seq=token_seq,
        slot_mapping=slot_mapping,
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
        prefill_aligned=prefill_aligned,
        lora_slots=lora_slots,
        token_counts=token_counts,
        logits_mask=logits_mask,
        has_host_processors=any_processors,
        page_dst=page_dst,
    )
