"""CFG pushdown guide (guided/cfg.py): grammar parsing, the CharDFA-
compatible state machine, and the token-level guide built on it.

Reference counterpart: outlines' CFGGuide over Lark grammars, reached via
guided_grammar (vllm/model_executor/guided_decoding/outlines_decoding.py
:108-126)."""
import json

import pytest

from vllm_ltr_tpu.guided.cfg import (CharCFG, GrammarError, JSON_GRAMMAR)


def _accepts(g, text):
    s = g.walk(0, text)
    return s >= 0 and g.accepting(s)


def _dead(g, text):
    return g.walk(0, text) < 0


class TestJsonGrammar:
    @pytest.fixture(scope="class")
    def g(self):
        return CharCFG(JSON_GRAMMAR)

    @pytest.mark.parametrize("doc", [
        '{"a": 1}',
        '{"a": [1, 2.5, {"b": null}], "c": "x\\"y"}',
        ' { "k" : [ true , false , null ] } ',
        '[[[[[[1]]]]]]',  # unbounded nesting (regex approximations cap)
        '"string"',
        '-12.5e-3',
        'true',
        '{}',
        '[]',
    ])
    def test_accepts(self, g, doc):
        json.loads(doc)  # sanity: really is JSON
        assert _accepts(g, doc)

    @pytest.mark.parametrize("doc", [
        '{"a" 1}', '[1,]', '{,}', 'truex', '01x', "{'a': 1}",
    ])
    def test_rejects(self, g, doc):
        assert _dead(g, doc)

    def test_prefix_live_not_accepting(self, g):
        s = g.walk(0, '{"a": [1,')
        assert s >= 0 and not g.accepting(s) and g.live(s)


class TestGrammarFeatures:
    def test_postfix_ops_and_groups(self):
        g = CharCFG(r'''start: "a"+ ("b" | "c")* "d"?''')
        for ok in ("a", "aa", "abcb", "aad", "abd"):
            assert _accepts(g, ok), ok
        for bad in ("", "b", "ad d"):
            assert not _accepts(g, bad), bad
        assert _dead(g, "da")

    def test_optional_bracket_group(self):
        g = CharCFG(r'''start: "f(" [arg ("," arg)*] ")"
                        arg: /[a-z]+/''')
        assert _accepts(g, "f()")
        assert _accepts(g, "f(x)")
        assert _accepts(g, "f(x,y,zz)")
        assert _dead(g, "f(x,)")

    def test_ignore_whitespace(self):
        g = CharCFG('start: "a" "b"\n%ignore /[ \\t]+/')
        assert _accepts(g, "ab")
        assert _accepts(g, "a  b")
        assert _accepts(g, "  a b  ")
        assert _dead(g, "a\nb")  # only inline ws ignored

    def test_alias_and_prefixed_rules(self):
        g = CharCFG('?start: x -> alias\n?x: "q"')
        assert _accepts(g, "q")

    def test_left_recursion_raises(self):
        with pytest.raises(GrammarError, match="left-recursive"):
            CharCFG('start: start "a" | "b"')

    def test_undefined_rule_raises(self):
        with pytest.raises(GrammarError, match="undefined"):
            CharCFG('start: missing')

    def test_unsupported_import_raises(self):
        with pytest.raises(GrammarError, match="unsupported %import"):
            CharCFG('start: X\n%import weird.X')

    def test_ambiguity_is_fine(self):
        # Both productions can match "ab"; the frontier carries both.
        g = CharCFG('start: "a" "b" | /a/ /b/')
        assert _accepts(g, "ab")


class TestTokenGuideOverCFG:
    def test_token_guide_masks(self, tiny_char_tokenizer=None):
        # Build a tiny fake tokenizer over single characters.
        class Tok:
            eos_token_id = 0
            all_special_ids = [0]

            def get_vocab(self):
                vocab = {"<eos>": 0}
                for i, ch in enumerate('abcdxyz{}[]",:0123456789'):
                    vocab[ch] = i + 1
                return vocab

        from vllm_ltr_tpu.guided.manager import GuidedDecodingManager
        mgr = GuidedDecodingManager(Tok())
        guide = mgr.guide_for("grammar", 'start: "ab" | "cd"')
        vocab_size = 26
        m0 = guide.mask(guide.start_state, vocab_size)
        allowed0 = {i for i in range(vocab_size) if m0[i]}
        # only 'a' (id 1) and 'c' (id 3) can start; EOS not yet legal
        assert allowed0 == {1, 3}
        s1 = guide.advance(guide.start_state, 1)  # 'a'
        m1 = guide.mask(s1, vocab_size)
        assert {i for i in range(vocab_size) if m1[i]} == {2}  # 'b'
        s2 = guide.advance(s1, 2)
        m2 = guide.mask(s2, vocab_size)
        assert m2[0] == 1  # complete -> EOS allowed
