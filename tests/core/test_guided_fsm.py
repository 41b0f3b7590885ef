"""Unit tests for the native guided-decoding stack (guided/):
regex -> char DFA, JSON schema -> regex, token FSM masks, bit packing.

Reference parity target: outlines-backed guided decoding
(vllm/model_executor/guided_decoding/), re-designed as host-built token
masks applied inside the jitted sampler.
"""
import json

import numpy as np
import pytest

from vllm_ltr_tpu.guided.json_schema import SchemaError, schema_to_regex
from vllm_ltr_tpu.guided.manager import (GuidedDecodingManager, TokenGuide,
                                         _build_trie, token_strings)
from vllm_ltr_tpu.guided.regex_dfa import CharDFA, RegexError, escape_literal


# ---------------------------------------------------------------------------
# Char-level DFA
# ---------------------------------------------------------------------------


def full_match(pattern: str, text: str) -> bool:
    d = CharDFA(pattern)
    s = d.walk(0, text)
    return s >= 0 and d.accepting(s)


@pytest.mark.parametrize("pattern,text,want", [
    (r"abc", "abc", True),
    (r"abc", "ab", False),
    (r"a|bc", "bc", True),
    (r"(ab)+", "ababab", True),
    (r"(ab)+", "aba", False),
    (r"a{2,3}", "aa", True),
    (r"a{2,3}", "aaaa", False),
    (r"[a-c]*x", "abcx", True),
    (r"[^a-c]x", "dx", True),
    (r"[^a-c]x", "ax", False),
    (r"\d{3}-\d{4}", "555-1234", True),
    (r"\d{3}-\d{4}", "55-1234", False),
    (r"\w+@\w+\.com", "bob@corp.com", True),
    (r".*", "anything at all", True),
    (r"a.c", "a\nc", False),  # dot excludes newline
    (r"^hello$", "hello", True),  # anchors are no-ops (full match)
    (r"yes|no|maybe", "maybe", True),
    (r"(?:x|y)z", "yz", True),
    (r"\[\d\]", "[7]", True),
])
def test_regex_full_match(pattern, text, want):
    assert full_match(pattern, text) == want


def test_regex_errors():
    for bad in (r"(", r"[z-a]", r"*a", "a\\", r"(?P<x>a)"):
        with pytest.raises(RegexError):
            CharDFA(bad)


def test_live_detects_dead_ends():
    d = CharDFA(r"ab")
    s = d.walk(0, "a")
    assert d.live(s) and not d.accepting(s)
    assert d.walk(0, "x") == -1


def test_escape_literal_roundtrip():
    text = 'a+b*{c}[d]("e")|\\f.^$'
    assert full_match(escape_literal(text), text)
    assert not full_match(escape_literal(text), text + "!")


# ---------------------------------------------------------------------------
# JSON schema -> regex
# ---------------------------------------------------------------------------


def schema_match(schema, value) -> bool:
    pattern = schema_to_regex(schema)
    return full_match(pattern, json.dumps(value, separators=(",", ":")))


def test_schema_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "active": {"type": "boolean"},
        },
    }
    assert schema_match(schema, {"name": "bob", "age": 33, "active": True})
    assert not schema_match(schema, {"age": 33, "name": "bob",
                                     "active": True})  # property order
    assert not schema_match(schema, {"name": "bob", "age": "x",
                                     "active": True})


def test_schema_scalars_and_unions():
    assert schema_match({"type": "number"}, -3.5e2)
    assert schema_match({"type": "null"}, None)
    assert schema_match({"enum": ["a", "b", 3]}, 3)
    assert not schema_match({"enum": ["a", "b"]}, "c")
    assert schema_match({"anyOf": [{"type": "integer"},
                                   {"type": "boolean"}]}, False)
    assert schema_match({"const": "fixed"}, "fixed")


def test_schema_arrays():
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    assert schema_match(schema, [1, 2])
    assert not schema_match(schema, [])
    assert not schema_match(schema, [1, 2, 3, 4])
    with pytest.raises(SchemaError):
        schema_to_regex({"type": "array", "minItems": 3, "maxItems": 1})


def test_schema_string_constraints():
    assert schema_match({"type": "string", "maxLength": 3}, "abc")
    assert not schema_match({"type": "string", "maxLength": 3}, "abcd")


def test_any_json_regex():
    from vllm_ltr_tpu.guided.json_schema import any_json_regex
    pattern = any_json_regex(3)
    for text, want in [
        ("{}", True),
        ('{"a":1}', True),
        ('{"a":[1,2,{"b":null}],"c":"x"}', True),
        ('{"a":{"b":{"c":[true,false]}}}', True),
        ("[1,2]", False),  # top level must be an object
        ('{"a":}', False),
        ('{"a":1,}', False),
        ('{"a" :1}', False),  # compact JSON only
    ]:
        assert full_match(pattern, text) == want, text


# ---------------------------------------------------------------------------
# Token FSM over a toy vocab
# ---------------------------------------------------------------------------


class FakeTokenizer:
    """Char-level vocab + a few multi-char merges + specials."""

    def __init__(self):
        chars = sorted(set(
            "abcdefghijklmnopqrstuvwxyz0123456789{}[]\",.:- _"))
        self._vocab = {"<s>": 0, "</s>": 1, "<unk>": 2}
        for i, c in enumerate(chars):
            self._vocab[c] = 3 + i
        for merged in ("yes", "no", "maybe", "42", "null", "true"):
            self._vocab[merged] = len(self._vocab)
        self.eos_token_id = 1
        self.all_special_ids = [0, 1, 2]

    def get_vocab(self):
        return dict(self._vocab)

    def id_of(self, tok: str) -> int:
        return self._vocab[tok]


@pytest.fixture(scope="module")
def fake_tok():
    return FakeTokenizer()


@pytest.fixture(scope="module")
def manager(fake_tok):
    return GuidedDecodingManager(fake_tok)


def test_choice_guide_masks(manager, fake_tok):
    guide = manager.guide_for("choice", ["yes", "no"])
    V = max(fake_tok.get_vocab().values()) + 1
    mask = guide.mask(guide.start_state, V)
    allowed = {i for i in range(V) if mask[i]}
    # Merged tokens "yes"/"no" and the chars 'y'/'n' can all start a match;
    # 'x' cannot, nor can EOS (nothing matched yet).
    assert fake_tok.id_of("yes") in allowed
    assert fake_tok.id_of("no") in allowed
    assert fake_tok.id_of("y") in allowed
    assert fake_tok.id_of("x") not in allowed
    assert fake_tok.eos_token_id not in allowed
    # "maybe" is not a choice even though it's one token.
    assert fake_tok.id_of("maybe") not in allowed

    # After emitting "yes", only EOS remains (no choice continues).
    s = guide.advance(guide.start_state, fake_tok.id_of("yes"))
    mask2 = guide.mask(s, V)
    assert mask2[fake_tok.eos_token_id]
    assert mask2.sum() == 1


def test_choice_prefix_progress(manager, fake_tok):
    guide = manager.guide_for("choice", ["maybe"])
    V = max(fake_tok.get_vocab().values()) + 1
    s = guide.advance(guide.start_state, fake_tok.id_of("m"))
    mask = guide.mask(s, V)
    assert mask[fake_tok.id_of("a")]
    assert not mask[fake_tok.id_of("m")]
    # walk a-y-b-e char by char
    for ch in "aybe":
        s = guide.advance(s, fake_tok.id_of(ch))
    assert guide.mask(s, V)[fake_tok.eos_token_id]


def test_regex_guide_masks_digits(manager, fake_tok):
    guide = manager.guide_for("regex", r"-?[1-9][0-9]{0,2}")
    V = max(fake_tok.get_vocab().values()) + 1
    m0 = guide.mask(guide.start_state, V)
    assert m0[fake_tok.id_of("-")] and m0[fake_tok.id_of("7")]
    assert not m0[fake_tok.id_of("0")]  # no leading zero
    assert m0[fake_tok.id_of("42")]  # merged token walks two chars
    s = guide.advance(guide.start_state, fake_tok.id_of("42"))
    m1 = guide.mask(s, V)
    assert m1[fake_tok.id_of("0")]  # now any digit
    assert m1[fake_tok.eos_token_id]  # already a full match
    assert not m1[fake_tok.id_of("-")]


def test_json_guide_end_to_end(manager, fake_tok):
    guide = manager.guide_for(
        "json", {"type": "object",
                 "properties": {"ok": {"type": "boolean"}}})
    V = max(fake_tok.get_vocab().values()) + 1
    state = guide.start_state
    out = []
    rng = np.random.RandomState(0)
    inv = {v: k for k, v in fake_tok.get_vocab().items()}
    for _ in range(64):
        mask = guide.mask(state, V)
        choices = np.nonzero(mask)[0]
        assert len(choices) > 0
        tok = int(rng.choice(choices))
        if tok == fake_tok.eos_token_id:
            break
        out.append(inv[tok])
        state = guide.advance(state, tok)
    text = "".join(out)
    parsed = json.loads(text)
    assert set(parsed) == {"ok"} and isinstance(parsed["ok"], bool)


def test_degenerate_guide_allows_eos(manager, fake_tok):
    # A pattern whose alphabet the vocab can't produce: bail out via EOS.
    guide = manager.guide_for("regex", r"[一-俿]+")
    V = max(fake_tok.get_vocab().values()) + 1
    mask = guide.mask(guide.start_state, V)
    assert mask[fake_tok.eos_token_id] and mask.sum() == 1


def test_guide_cache_shared(manager):
    g1 = manager.guide_for("choice", ["yes", "no"])
    g2 = manager.guide_for("choice", ["yes", "no"])
    assert g1 is g2


# ---------------------------------------------------------------------------
# Bit packing matches the device unpack
# ---------------------------------------------------------------------------


def test_packed_mask_device_roundtrip():
    from vllm_ltr_tpu.layers.sampler import unpack_token_mask
    rng = np.random.RandomState(3)
    for V in (13, 64, 500):
        mask = (rng.rand(4, V) < 0.4).astype(np.uint8)
        packed = np.packbits(mask, axis=1)
        got = np.asarray(unpack_token_mask(packed, V))
        np.testing.assert_array_equal(got, mask.astype(bool))


def test_token_strings_sentencepiece_style():
    class SPish:
        eos_token_id = 2
        all_special_ids = [0, 1, 2]

        def get_vocab(self):
            return {"<s>": 0, "<pad>": 1, "</s>": 2, "▁the": 3,
                    "<0x0A>": 4, "ing": 5}

    out = token_strings(SPish())
    assert out[3] == " the" and out[4] == "\n" and out[5] == "ing"
    assert out[0] == "" and out[2] == ""


def test_token_strings_byte_level():
    class GPT2ish:
        eos_token_id = 0
        all_special_ids = [0]

        def get_vocab(self):
            return {"<|endoftext|>": 0, "Ġworld": 1, "Ċ": 2, "hi": 3}

    out = token_strings(GPT2ish())
    assert out[1] == " world" and out[2] == "\n" and out[3] == "hi"


# ---------------------------------------------------------------------------
# Backend semantics: native/outlines (strict) vs lm-format-enforcer
# (whitespace-tolerant), reference DecodingConfig + per-request override
# (vllm/config.py DecodingConfig, lm_format_enforcer_decoding.py)
# ---------------------------------------------------------------------------


def test_schema_whitespace_mode():
    sch = {"type": "object",
           "properties": {"a": {"type": "integer"},
                          "b": {"type": "string"}},
           "required": ["a"]}
    strict = schema_to_regex(sch)
    loose = schema_to_regex(sch, whitespace=True)
    for text, strict_ok, loose_ok in [
        ('{"a":1,"b":"x"}', True, True),
        ('{"a":1}', True, True),
        ('{ "a" : 1 , "b" : "x" }', False, True),
        ('{\n  "a": 1\n}', False, True),
        ('{ "b": "x" }', False, False),  # missing required prop
        ('{"a":1,}', False, False),      # trailing comma never legal
    ]:
        assert full_match(strict, text) == strict_ok, text
        assert full_match(loose, text) == loose_ok, text
    arr = schema_to_regex({"type": "array", "items": {"type": "integer"}},
                          whitespace=True)
    assert full_match(arr, "[ 1, 2,\n 3 ]")
    assert full_match(arr, "[]")
    from vllm_ltr_tpu.guided.json_schema import any_json_regex
    assert full_match(any_json_regex(2, whitespace=True),
                      '{ "k" : [ 1 , true ] }')


def test_lmfe_backend_guide_masks(manager, fake_tok):
    sch = {"type": "object", "properties": {"ok": {"type": "boolean"}}}
    strict = manager.guide_for("json", sch)
    loose = manager.guide_for("json", sch, "lm-format-enforcer")
    assert strict is not loose  # distinct cache entries per backend
    assert manager.guide_for("json", sch, "outlines") is strict
    V = max(fake_tok.get_vocab().values()) + 1
    s_strict = strict.advance(strict.start_state, fake_tok.id_of("{"))
    s_loose = loose.advance(loose.start_state, fake_tok.id_of("{"))
    space = fake_tok.id_of(" ")
    assert not strict.mask(s_strict, V)[space]
    assert loose.mask(s_loose, V)[space]
    # The loose guide still completes to valid JSON of the schema shape.
    s = loose.advance(s_loose, space)
    assert loose.mask(s, V)[fake_tok.id_of('"')]


def test_backend_override_from_sampling_params(manager, fake_tok):
    from vllm_ltr_tpu.guided.manager import guide_from_sampling_params
    from vllm_ltr_tpu.sampling_params import SamplingParams
    sch = {"type": "object", "properties": {"ok": {"type": "boolean"}}}
    sp = SamplingParams(guided_json=sch)
    g_default = guide_from_sampling_params(manager, sp, "native")
    sp_ws = SamplingParams(guided_json=sch,
                           guided_decoding_backend="lm-format-enforcer")
    g_ws = guide_from_sampling_params(manager, sp_ws, "native")
    assert g_ws is not g_default
    # Engine default applies when the request does not override.
    assert guide_from_sampling_params(manager, sp,
                                      "lm-format-enforcer") is g_ws
    with pytest.raises(ValueError, match="guided_decoding_backend"):
        guide_from_sampling_params(
            manager, SamplingParams(guided_json=sch,
                                    guided_decoding_backend="nope"))


def test_decoding_config_validation():
    from vllm_ltr_tpu.config import DecodingConfig
    DecodingConfig("lm-format-enforcer")
    with pytest.raises(ValueError):
        DecodingConfig("bogus")


def test_backend_none_disables_guided(manager):
    from vllm_ltr_tpu.guided.manager import guide_from_sampling_params
    from vllm_ltr_tpu.sampling_params import SamplingParams
    sp = SamplingParams(guided_regex=r"\d+")
    with pytest.raises(ValueError, match="disabled"):
        guide_from_sampling_params(manager, sp, "none")


def test_falsy_guided_specs_fail_loudly(manager):
    """guided_json={} / guided_choice=[] must hit the compiler's explicit
    rejection, never be silently dropped (which would decode
    unconstrained while the client believes output is guided)."""
    from vllm_ltr_tpu.guided.manager import guide_from_sampling_params
    from vllm_ltr_tpu.sampling_params import SamplingParams
    with pytest.raises(ValueError):  # SchemaError: unsupported schema
        guide_from_sampling_params(
            manager, SamplingParams(guided_json={}), "native")
    with pytest.raises(ValueError, match="non-empty"):
        guide_from_sampling_params(
            manager, SamplingParams(guided_choice=[]), "native")
