"""Token-level guides: lift a character DFA onto a tokenizer vocabulary.

Reference counterpart: outlines' ``RegexFSM`` / ``RegexLogitsProcessor``
(vllm/model_executor/guided_decoding/outlines_logits_processors.py), which
bias logits row-by-row inside the sampler.  Here the guide produces a
packed allowed-token bitmask per (request, step) on the host; the device
program applies it inside the jitted sampler (see layers/sampler.py
``apply_token_mask``), keeping the TPU step static-shaped.

Mask computation walks a token *trie* against the DFA so shared token
prefixes are evaluated once and dead branches prune entire subtrees —
per-state cost is proportional to the live frontier, not |vocab| x chars.
"""
from __future__ import annotations

import json as _json
from typing import Dict, List, Optional, Tuple

import numpy as np

from vllm_ltr_tpu.guided.json_schema import schema_to_regex
from vllm_ltr_tpu.guided.regex_dfa import CharDFA, escape_literal
from vllm_ltr_tpu.logger import init_logger

logger = init_logger(__name__)


class _TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[str, "_TrieNode"] = {}
        self.token_ids: List[int] = []


def _gpt2_byte_decoder() -> Dict[str, int]:
    """Inverse of the standard GPT-2 bytes->unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def token_strings(tokenizer) -> List[str]:
    """Decode every vocab entry to the text it contributes when
    concatenated mid-sequence.  Handles SentencePiece ('▁' word
    boundary, '<0xNN>' byte fallback) and GPT-2 byte-level BPE ('Ġ'
    style) vocabularies; special tokens decode to "" (never allowed by a
    guide)."""
    vocab: Dict[str, int] = tokenizer.get_vocab()
    size = max(vocab.values()) + 1
    out = [""] * size
    special_ids = set(getattr(tokenizer, "all_special_ids", []) or [])
    byte_level = any("Ġ" in t or "Ċ" in t for t in vocab)
    byte_dec = _gpt2_byte_decoder() if byte_level else None
    for tok, idx in vocab.items():
        if idx in special_ids:
            continue
        if (len(tok) == 6 and tok.startswith("<0x") and tok.endswith(">")):
            try:  # SentencePiece byte-fallback token
                b = int(tok[3:5], 16)
                # Bytes >= 0x80 are UTF-8 fragments: the character DFA
                # would validate a codepoint the detokenizer never emits.
                # Exclude them (mapped to "", never allowed by a guide).
                out[idx] = chr(b) if b < 0x80 else ""
                continue
            except ValueError:
                pass
        if byte_dec is not None:
            try:
                raw = bytes(byte_dec[c] for c in tok)
                s = raw.decode("utf-8", errors="ignore")
                # Only round-tripping tokens participate: a token whose
                # raw bytes end mid-UTF-8 (e.g. b'a\xc3' -> 'a') would
                # let the DFA approve text it never saw the tail bytes
                # of, producing output that violates the constraint.
                out[idx] = s if s.encode("utf-8") == raw else ""
                continue
            except KeyError:
                pass
        out[idx] = tok.replace("▁", " ")
    return out


def _build_trie(strings: List[str]) -> _TrieNode:
    root = _TrieNode()
    for tid, s in enumerate(strings):
        if not s:
            continue  # zero-progress tokens would allow infinite loops
        node = root
        for ch in s:
            nxt = node.children.get(ch)
            if nxt is None:
                nxt = node.children[ch] = _TrieNode()
            node = nxt
        node.token_ids.append(tid)
    return root


class TokenGuide:
    """One compiled constraint, shared by every request using the same
    (constraint, tokenizer) pair; per-request progress is just an int
    DFA state carried by the sequence."""

    def __init__(self, dfa: CharDFA, trie: _TrieNode,
                 strings: List[str], eos_token_id: Optional[int]):
        if eos_token_id is None:
            # Without EOS a state where no vocab token advances the
            # automaton would leave an all-zero mask — which the sampler
            # would renormalize into a uniform (unconstrained!) draw.
            raise ValueError(
                "guided decoding requires a tokenizer with an EOS token")
        self._dfa = dfa
        self._trie = trie
        self._strings = strings
        self.eos_token_id = eos_token_id
        self._mask_cache: Dict[Tuple[int, int], np.ndarray] = {}

    @property
    def start_state(self) -> int:
        return 0

    def advance(self, state: int, token_id: int) -> int:
        """Next DFA state after emitting ``token_id`` (-1 == dead; the
        mask should make that unreachable, but a preempted+recomputed
        sequence replays its history through here, so stay total)."""
        if state < 0:
            return -1
        if token_id == self.eos_token_id:
            return state
        if token_id >= len(self._strings):
            return -1
        return self._dfa.walk(state, self._strings[token_id])

    def mask(self, state: int, vocab_size: int) -> np.ndarray:
        """uint8[vocab_size] allowed-token mask for a row in ``state``."""
        key = (state, vocab_size)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        mask = np.zeros(vocab_size, np.uint8)
        if state >= 0:
            dfa = self._dfa
            stack = [(self._trie, state)]
            while stack:
                node, s = stack.pop()
                for ch, child in node.children.items():
                    s2 = dfa.step(s, ch)
                    if s2 < 0:
                        continue
                    if child.token_ids and dfa.live(s2):
                        for tid in child.token_ids:
                            if tid < vocab_size:
                                mask[tid] = 1
                    stack.append((child, s2))
            if self.eos_token_id is not None and \
                    self.eos_token_id < vocab_size:
                if dfa.accepting(state) or not mask.any():
                    # EOS on acceptance; also as the bail-out when the
                    # vocabulary cannot make progress (degenerate guide).
                    mask[self.eos_token_id] = 1
        elif self.eos_token_id is not None and \
                self.eos_token_id < vocab_size:
            mask[self.eos_token_id] = 1
        self._mask_cache[key] = mask
        return mask


class GuidedDecodingManager:
    """Compiles and caches guides per tokenizer (the engine owns one)."""

    def __init__(self, tokenizer, eos_token_id: Optional[int] = None):
        self._strings = token_strings(tokenizer)
        self._trie = _build_trie(self._strings)
        eos = eos_token_id
        if eos is None:
            eos = getattr(tokenizer, "eos_token_id", None)
        self._eos = eos
        self._guides: Dict[Tuple[str, str], TokenGuide] = {}

    def guide_for(self, kind: str, spec,
                  backend: str = "native") -> TokenGuide:
        # Backend semantics (reference DecodingConfig, vllm/config.py):
        # "outlines" == the strict native engine; "lm-format-enforcer"
        # differs only for guided_json, where it accepts whitespace-
        # tolerant (pretty-printed) JSON instead of the compact form
        # (lm_format_enforcer_decoding.py).  choice/regex/grammar are
        # backend-independent.
        permissive = backend == "lm-format-enforcer"
        if kind == "choice":
            if not isinstance(spec, (list, tuple)) or not spec:
                raise ValueError("guided_choice needs a non-empty list")
            pattern = "(" + "|".join(
                escape_literal(str(c)) for c in spec) + ")"
            key = ("choice", _json.dumps(list(map(str, spec))))
        elif kind == "regex":
            pattern = str(spec)
            key = ("regex", pattern)
        elif kind == "json":
            pattern = schema_to_regex(spec, whitespace=permissive)
            key = ("json", pattern)
        elif kind == "grammar":
            # Lark-style CFG: the pushdown engine exposes the CharDFA
            # state API, so the token trie walk below is unchanged
            # (reference routes guided_grammar to outlines' CFGGuide,
            # outlines_decoding.py:108-126).
            pattern = str(spec)
            key = ("grammar", pattern)
        else:
            raise ValueError(f"unknown guide kind {kind!r}")
        guide = self._guides.get(key)
        if guide is None:
            if kind == "grammar":
                from vllm_ltr_tpu.guided.cfg import CharCFG
                automaton = CharCFG(pattern)
            else:
                automaton = CharDFA(pattern)
            guide = TokenGuide(automaton, self._trie, self._strings,
                               self._eos)
            self._guides[key] = guide
            logger.info("Compiled %s guide (%d cached)", kind,
                        len(self._guides))
        return guide


def guide_from_sampling_params(manager: Optional[GuidedDecodingManager],
                               sampling_params,
                               default_backend: str = "native",
                               ) -> Optional[TokenGuide]:
    """Build the guide a request's SamplingParams asks for (or None).
    ``default_backend`` is the engine's DecodingConfig value; a
    per-request ``guided_decoding_backend`` overrides it (reference
    protocol.py guided_decoding_backend field)."""
    sp = sampling_params
    wanted = [("choice", sp.guided_choice), ("regex", sp.guided_regex),
              ("json", sp.guided_json),
              ("grammar", getattr(sp, "guided_grammar", None))]
    # `is not None`: falsy specs (guided_json={}, guided_choice=[]) must
    # reach the compiler's explicit accept/reject, not silently vanish.
    wanted = [(k, v) for k, v in wanted if v is not None]
    if not wanted:
        return None
    if manager is None:
        raise ValueError(
            "guided decoding requires a tokenizer (the token-level "
            "constraint is compiled over the vocab); the engine was "
            "started with skip_tokenizer_init")
    if len(wanted) > 1:
        raise ValueError("at most one of guided_choice / guided_regex / "
                         "guided_json may be set")
    backend = getattr(sp, "guided_decoding_backend", None) or default_backend
    if backend == "none":
        # Engine started with --guided-decoding-backend none: guided
        # decoding is administratively disabled (per-request 'none' gets
        # the same treatment — there is no constraint to honor).
        raise ValueError(
            "guided decoding is disabled on this server "
            "(--guided-decoding-backend none)")
    allowed = ("native", "outlines", "lm-format-enforcer")
    if backend not in allowed:
        raise ValueError(
            f"guided_decoding_backend must be one of {allowed}, got "
            f"{backend!r}")
    kind, spec = wanted[0]
    return manager.guide_for(kind, spec, backend)
