"""Incremental detokenization.

Behavioral counterpart of reference
``vllm/transformers_utils/detokenizer.py`` (313 LoC): decode newly sampled
tokens without re-decoding the whole sequence, handling multi-token glyphs
(hold back text until the byte sequence is complete).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from vllm_ltr_tpu.sequence import Logprob, Sequence

INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


def _convert_tokens_to_string_with_added_encoders(
        tokenizer, output_tokens: List[str], skip_special_tokens: bool,
        spaces_between_special_tokens: bool) -> str:
    sub_texts = []
    current_sub_text: List[str] = []
    all_special_tokens = set(tokenizer.all_special_tokens)
    for token in output_tokens:
        if skip_special_tokens and token in all_special_tokens:
            continue
        if token in tokenizer.get_added_vocab():
            if current_sub_text:
                sub_texts.append(
                    tokenizer.convert_tokens_to_string(current_sub_text))
                current_sub_text = []
            sub_texts.append(token)
        else:
            current_sub_text.append(token)
    if current_sub_text:
        sub_texts.append(tokenizer.convert_tokens_to_string(current_sub_text))
    if spaces_between_special_tokens:
        return " ".join(sub_texts)
    return "".join(sub_texts)


def detokenize_incrementally(
    tokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Returns (new_tokens, new_decoded_text, prefix_offset, read_offset)."""
    new_token_id = all_input_ids[-1]
    if skip_special_tokens and new_token_id in tokenizer.all_special_ids:
        return [], "", prefix_offset, read_offset

    def _ids_to_tokens(ids):
        toks = tokenizer.convert_ids_to_tokens(
            ids, skip_special_tokens=skip_special_tokens)
        # Ids outside the tokenizer vocab (model vocab can be padded
        # larger) decode to None; render them as empty strings.
        return [t if t is not None else "" for t in toks]

    if prev_tokens is None:
        new_tokens = _ids_to_tokens(all_input_ids)
        output_tokens = new_tokens
        prefix_offset = max(
            len(output_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET,
            0)
        read_offset = max(len(output_tokens) - 1, 0)
    else:
        new_tokens = _ids_to_tokens([new_token_id])
        output_tokens = prev_tokens + new_tokens

    # Decode the window and emit only stabilized text.
    if tokenizer.is_fast or not tokenizer.get_added_vocab():
        prefix_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:read_offset])
        new_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:])
    else:
        prefix_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:read_offset],
            skip_special_tokens, spaces_between_special_tokens)
        new_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:], skip_special_tokens,
            spaces_between_special_tokens)

    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        # Utf-8 char at the end means it's a potential unfinished byte
        # sequence from byte fallback tokenization; defer until complete.
        new_text = new_text[len(prefix_text):]
        return new_tokens, new_text, read_offset, len(output_tokens)
    return new_tokens, "", prefix_offset, read_offset


class Detokenizer:
    """Engine-side incremental detokenizer for sequences."""

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer

    def decode_sequence_inplace(self, seq: Sequence,
                                skip_special_tokens: bool,
                                spaces_between_special_tokens: bool) -> None:
        if self.tokenizer is None:
            return
        all_input_ids = seq.get_token_ids()
        (new_tokens, new_output_text, prefix_offset,
         read_offset) = detokenize_incrementally(
             self.tokenizer,
             all_input_ids=all_input_ids,
             prev_tokens=seq.tokens,
             prefix_offset=seq.prefix_offset,
             read_offset=seq.read_offset,
             skip_special_tokens=skip_special_tokens,
             spaces_between_special_tokens=spaces_between_special_tokens)
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_output_text
