"""Streaming detokenization.

Behavioral counterpart of reference vllm/transformers_utils/detokenizer.py:
turn newly sampled token ids into text without re-decoding the whole
sequence, holding back output while a multi-token glyph (byte-fallback
UTF-8 sequence) is still incomplete.

Approach: each sequence keeps a cache of its token *strings* plus a
sliding stabilization window [prefix_offset, read_offset).  A new token is
emitted only once rendering the window with it produces strictly more text
that does not end in U+FFFD (the replacement character HF emits for a
dangling byte sequence).
"""
from __future__ import annotations

from itertools import groupby
from typing import List

from vllm_ltr_tpu.sequence import Sequence

# How many trailing tokens the first render uses for context.
_WINDOW = 5


class Detokenizer:
    """Engine-side streaming decoder; cursor state lives on the sequence."""

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer

    # -- rendering -----------------------------------------------------------

    def _token_strings(self, ids: List[int],
                       skip_special_tokens: bool) -> List[str]:
        toks = self.tokenizer.convert_ids_to_tokens(
            ids, skip_special_tokens=skip_special_tokens)
        # Ids beyond the tokenizer vocab (padded model vocab) map to None.
        return ["" if t is None else t for t in toks]

    def _render(self, tokens: List[str], skip_special_tokens: bool,
                spaces_between_special_tokens: bool) -> str:
        """Token strings -> text.  Slow tokenizers with added vocabulary
        need added tokens rendered verbatim, outside
        convert_tokens_to_string."""
        tok = self.tokenizer
        if tok.is_fast or not tok.get_added_vocab():
            return tok.convert_tokens_to_string(tokens)

        specials = set(tok.all_special_tokens)
        added = set(tok.get_added_vocab())
        kept = [
            t for t in tokens
            if not (skip_special_tokens and t in specials)
        ]
        pieces: List[str] = []
        for is_added, run in groupby(kept, key=lambda t: t in added):
            if is_added:
                pieces.extend(run)
            else:
                pieces.append(tok.convert_tokens_to_string(list(run)))
        sep = " " if spaces_between_special_tokens else ""
        return sep.join(pieces)

    # -- streaming entry point -------------------------------------------------

    def decode_sequence_inplace(self, seq: Sequence,
                                skip_special_tokens: bool,
                                spaces_between_special_tokens: bool) -> None:
        if self.tokenizer is None:
            return
        ids = seq.get_token_ids()
        fresh_id = ids[-1]
        if skip_special_tokens and fresh_id in self.tokenizer.all_special_ids:
            return

        if seq.tokens is None:
            # First decode: build the full token-string cache and place the
            # window over the last few tokens.
            seq.tokens = self._token_strings(ids, skip_special_tokens)
            seq.prefix_offset = max(len(seq.tokens) - _WINDOW, 0)
            seq.read_offset = max(len(seq.tokens) - 1, 0)
        else:
            seq.tokens.extend(
                self._token_strings([fresh_id], skip_special_tokens))

        settled = self._render(seq.tokens[seq.prefix_offset:seq.read_offset],
                               skip_special_tokens,
                               spaces_between_special_tokens)
        candidate = self._render(seq.tokens[seq.prefix_offset:],
                                 skip_special_tokens,
                                 spaces_between_special_tokens)

        if len(candidate) > len(settled) and not candidate.endswith("�"):
            # The new token produced stable text: emit it, slide the window.
            seq.output_text += candidate[len(settled):]
            seq.prefix_offset = seq.read_offset
            seq.read_offset = len(seq.tokens)
