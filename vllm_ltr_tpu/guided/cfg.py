"""Context-free-grammar guide: a scannerless pushdown engine with the
same lazily-interned integer-state API as :class:`CharDFA`, so
:class:`TokenGuide`'s trie walk and mask cache work unchanged.

Reference counterpart: outlines' ``CFGGuide`` over Lark grammars
(vllm/model_executor/guided_decoding/outlines_decoding.py:108-126 routes
``guided_grammar`` there).  The reference tokenizes with an LALR parser +
terminal scanner; here the grammar runs fully at character level: a guide
state is an interned frozen set of *configurations* — (terminal id,
terminal-DFA state, remaining sentential-form suffix) — advanced one code
point at a time.  Nondeterminism (which production, where a terminal
ends) is carried as set membership, GLR-style, so ambiguous grammars are
fine; **left-recursive** rules are not (expansion of a leftmost
nonterminal must terminate) and raise :class:`GrammarError` with the rule
chain — same practical restriction as any recursive-descent family.

Supported Lark subset: `rule : alternatives`, ``|``, ``( )`` groups,
``[ ]`` optional groups, ``? * +`` postfixes, ``"literal"`` (optional
trailing ``i`` flag is rejected), ``/regex/`` terminals (compiled by the
in-repo regex engine), ``-> alias`` (ignored), ``?rule``/``!rule``
prefixes and ``NAME.prio`` suffixes (normalized away), ``%ignore``, and
``%import common.X`` for the handful of stdlib terminals the reference's
grammars use.  This loads outlines' ``json.lark`` verbatim.
"""
from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Optional, Tuple, Union

from vllm_ltr_tpu.guided.regex_dfa import CharDFA, escape_literal


class GrammarError(ValueError):
    pass


# Terminals from lark.grammars.common that reference grammars import.
_COMMON_TERMINALS: Dict[str, str] = {
    "WS": r"[ \t\r\n]+",
    "WS_INLINE": r"[ \t]+",
    "NEWLINE": r"(\r?\n)+",
    "DIGIT": r"[0-9]",
    "HEXDIGIT": r"[0-9A-Fa-f]",
    "INT": r"[0-9]+",
    "SIGNED_INT": r"[+-]?[0-9]+",
    "DECIMAL": r"([0-9]+\.[0-9]*|\.[0-9]+)",
    "FLOAT": r"([0-9]+\.[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?",
    "SIGNED_FLOAT": r"[+-]?(([0-9]+\.[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?)",
    "NUMBER": r"([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?",
    "SIGNED_NUMBER": r"[+-]?(([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                     r"([eE][+-]?[0-9]+)?)",
    "LETTER": r"[A-Za-z]",
    "UCASE_LETTER": r"[A-Z]",
    "LCASE_LETTER": r"[a-z]",
    "CNAME": r"[A-Za-z_][A-Za-z0-9_]*",
    "ESCAPED_STRING": r'"([^"\\]|\\.)*"',
}

# One frequently-referenced grammar: the reference's unbounded JSON CFG
# (outlines grammars/json.lark), reproduced by meaning.
JSON_GRAMMAR = r"""
?start: value
?value: object
      | array
      | string
      | SIGNED_NUMBER
      | "true"
      | "false"
      | "null"
object : "{" [pair ("," pair)*] "}"
pair   : string ":" value
array  : "[" [value ("," value)*] "]"
string : ESCAPED_STRING
%import common.ESCAPED_STRING
%import common.SIGNED_NUMBER
%import common.WS
%ignore WS
"""

# OpenAI response_format {"type": "json_object"} requires the top level
# to be an OBJECT (not any JSON value) — same rules, object start.
JSON_OBJECT_GRAMMAR = JSON_GRAMMAR.replace("?start: value",
                                           "?start: object")

# Grammar-text lexer: names, literals, regexes, operators.
_TOKEN_RE = re.compile(
    r"""
      (?P<comment>//[^\n]*)
    | (?P<string>"(?:[^"\\]|\\.)*"i?)
    | (?P<regex>/(?:[^/\\\n]|\\.)+/[imslux]*)
    | (?P<arrow>->)
    | (?P<name>[?!]?[A-Za-z_][A-Za-z0-9_]*(?:\.\d+)?)
    | (?P<op>[:|()\[\]?*+%~.])
    | (?P<num>\d+)
    | (?P<ws>\s+)
    """, re.VERBOSE)

Sym = Union[int, str]  # int = terminal index, str = rule name


class CharCFG:
    """Duck-typed like CharDFA: ``step(state, ch) -> int`` (-1 dead),
    state 0 = start, ``walk`` / ``accepting`` / ``live``."""

    _EXPANSION_CAP = 200_000
    # Longest pending sentential-form suffix a closure may build; a
    # left-recursive rule grows this by one symbol per expansion, so the
    # cap converts the divergence into a fast, clear error.
    _SUFFIX_CAP = 2_048

    def __init__(self, grammar: str):
        self._terms: List[CharDFA] = []
        self._term_ids: Dict[str, int] = {}  # keyed by source pattern
        self._rules: Dict[str, List[Tuple[Sym, ...]]] = {}
        self._ignores: List[int] = []
        self._synth = 0
        start = self._parse(grammar)

        self._sets: List[FrozenSet[Tuple[int, int, Tuple[Sym, ...]]]] = []
        self._accepts: List[bool] = []
        self._ids: Dict[Tuple[FrozenSet, bool], int] = {}
        self._step_cache: Dict[Tuple[int, int], int] = {}
        s0, acc0 = self._close([("e", (start, ))])
        self._intern(s0, acc0)  # state 0

    # ------------------------------------------------------------------
    # Grammar parsing
    # ------------------------------------------------------------------

    def _term(self, pattern: str) -> int:
        tid = self._term_ids.get(pattern)
        if tid is None:
            tid = len(self._terms)
            self._terms.append(CharDFA(pattern))
            self._term_ids[pattern] = tid
        return tid

    def _new_rule(self, alts: List[Tuple[Sym, ...]]) -> str:
        name = f"__s{self._synth}"
        self._synth += 1
        self._rules[name] = alts
        return name

    @staticmethod
    def _norm_name(tok: str) -> str:
        tok = tok.lstrip("?!")
        return tok.split(".")[0]

    def _parse(self, text: str) -> str:
        toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise GrammarError(f"cannot lex grammar at {text[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("comment", "ws"):
                continue
            toks.append((kind, m.group()))

        i = 0
        first_rule: Optional[str] = None

        def at_rule_start(j: int) -> bool:
            return (j + 1 < len(toks) and toks[j][0] == "name"
                    and toks[j + 1] == ("op", ":"))

        def parse_atom(j: int) -> Tuple[Sym, int]:
            kind, val = toks[j]
            if kind == "string":
                if val.endswith('"i'):
                    raise GrammarError(
                        "case-insensitive literals are not supported")
                lit = _unescape_literal(val[1:-1])
                return self._term(escape_literal(lit)), j + 1
            if kind == "regex":
                body = val[1:val.rindex("/")]
                flags = val[val.rindex("/") + 1:]
                if flags:
                    raise GrammarError(
                        f"regex flags {flags!r} are not supported")
                return self._term(body.replace(r"\/", "/")), j + 1
            if kind == "name":
                return self._norm_name(val), j + 1
            if (kind, val) == ("op", "("):
                alts, j = parse_alternation(j + 1)
                if toks[j] != ("op", ")"):
                    raise GrammarError("unbalanced ( in grammar")
                return self._new_rule(alts), j + 1
            if (kind, val) == ("op", "["):
                alts, j = parse_alternation(j + 1)
                if toks[j] != ("op", "]"):
                    raise GrammarError("unbalanced [ in grammar")
                return self._new_rule(alts + [()]), j + 1
            raise GrammarError(f"unexpected {val!r} in grammar body")

        def parse_concat(j: int) -> Tuple[Tuple[Sym, ...], int]:
            syms: List[Sym] = []
            while j < len(toks):
                kind, val = toks[j]
                if (kind, val) in (("op", "|"), ("op", ")"), ("op", "]")):
                    break
                if kind == "arrow":  # -> alias: skip the alias name
                    j += 2
                    continue
                if (kind, val) == ("op", "%") or at_rule_start(j):
                    break
                sym, j = parse_atom(j)
                # postfix ? * +
                while j < len(toks) and toks[j][0] == "op" and \
                        toks[j][1] in "?*+":
                    op = toks[j][1]
                    j += 1
                    if op == "?":
                        sym = self._new_rule([(sym, ), ()])
                    elif op == "*":
                        star = f"__s{self._synth}"
                        self._synth += 1
                        self._rules[star] = [(), (sym, star)]
                        sym = star
                    else:  # +
                        star = f"__s{self._synth}"
                        self._synth += 1
                        self._rules[star] = [(), (sym, star)]
                        sym = self._new_rule([(sym, star)])
                syms.append(sym)
            return tuple(syms), j

        def parse_alternation(j: int) -> Tuple[List[Tuple[Sym, ...]], int]:
            alts: List[Tuple[Sym, ...]] = []
            syms, j = parse_concat(j)
            alts.append(syms)
            while j < len(toks) and toks[j] == ("op", "|"):
                syms, j = parse_concat(j + 1)
                alts.append(syms)
            return alts, j

        while i < len(toks):
            kind, val = toks[i]
            if (kind, val) == ("op", "%"):
                # %ignore <item> | %import common.NAME [-> alias]
                dkind, dval = toks[i + 1]
                if dval == "ignore":
                    sym, i = parse_atom(i + 2)
                    if isinstance(sym, str):
                        # named terminal: resolve after all rules parse
                        self._ignores.append(("rule", sym))  # type: ignore
                    else:
                        self._ignores.append(sym)
                    continue
                if dval == "import":
                    # tokens: name('common') op('.')? — the lexer folds
                    # 'common.ESCAPED_STRING'? No: '.' only follows names
                    # with digit suffix; parse name . name
                    lib = self._norm_name(toks[i + 2][1])
                    assert toks[i + 3] == ("op", "."), "expected %import lib.NAME"
                    tname = self._norm_name(toks[i + 4][1])
                    i += 5
                    alias = tname
                    if i < len(toks) and toks[i][0] == "arrow":
                        alias = self._norm_name(toks[i + 1][1])
                        i += 2
                    if lib != "common" or tname not in _COMMON_TERMINALS:
                        raise GrammarError(
                            f"unsupported %import {lib}.{tname}")
                    self._rules[alias] = [
                        (self._term(_COMMON_TERMINALS[tname]), )
                    ]
                    continue
                raise GrammarError(f"unsupported directive %{dval}")
            if not at_rule_start(i):
                raise GrammarError(f"expected a rule, got {val!r}")
            rname = self._norm_name(val)
            alts, i = parse_alternation(i + 2)
            self._rules.setdefault(rname, []).extend(alts)
            if first_rule is None:
                first_rule = rname

        if first_rule is None:
            raise GrammarError("empty grammar")
        # Resolve named %ignore terminals (defined as single-terminal rules).
        resolved: List[int] = []
        for ig in self._ignores:
            if isinstance(ig, tuple):
                _, name = ig
                alts = self._rules.get(name)
                if (not alts or len(alts) != 1 or len(alts[0]) != 1
                        or not isinstance(alts[0][0], int)):
                    raise GrammarError(
                        f"%ignore {name}: must name a single terminal")
                resolved.append(alts[0][0])
            else:
                resolved.append(ig)
        self._ignores = resolved
        # Validate rule refs.
        for rname, alts in self._rules.items():
            for alt in alts:
                for sym in alt:
                    if isinstance(sym, str) and sym not in self._rules:
                        raise GrammarError(
                            f"rule {rname!r} references undefined {sym!r}")
        return "start" if "start" in self._rules else first_rule

    # ------------------------------------------------------------------
    # Pushdown engine
    # ------------------------------------------------------------------

    def _close(self, raw) -> Tuple[FrozenSet, bool]:
        """Expand leftmost nonterminals and completed terminals until
        every configuration is scanning inside a terminal; returns
        (frozen scanning set, accepting)."""
        out = set()
        accept = False
        seen = set()
        stack = list(raw)
        work = 0
        while stack:
            work += 1
            if work > self._EXPANSION_CAP:
                raise GrammarError(
                    "grammar expansion diverged — left-recursive rules "
                    "are not supported by the scannerless engine")
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            if c[0] == "e":  # expansion node: (\"e\", rest)
                rest = c[1]
                if not rest:
                    accept = True
                    for ig in self._ignores:
                        stack.append(("s", ig, 0, ()))
                    continue
                h, rest2 = rest[0], rest[1:]
                if isinstance(h, int):
                    stack.append(("s", h, 0, rest2))
                    if h not in self._ignores:
                        for ig in self._ignores:
                            stack.append(("s", ig, 0, rest))
                else:
                    if len(rest2) > self._SUFFIX_CAP:
                        raise GrammarError(
                            "grammar expansion diverged — left-recursive "
                            "rules are not supported by the scannerless "
                            f"engine (while expanding {h!r})")
                    for alt in self._rules[h]:
                        stack.append(("e", alt + rest2))
            else:  # scanning node: ("s", term, dfa_state, rest)
                _, t, ds, rest = c
                dfa = self._terms[t]
                if dfa.live(ds):
                    out.add((t, ds, rest))
                if dfa.accepting(ds) and ds != 0:
                    # A terminal may not match empty: guides must make
                    # progress (mirrors the token trie's no-empty rule).
                    stack.append(("e", rest))
        return frozenset(out), accept

    def _intern(self, cfgset: FrozenSet, accept: bool) -> int:
        if not cfgset and not accept:
            return -1
        key = (cfgset, accept)
        sid = self._ids.get(key)
        if sid is None:
            sid = len(self._sets)
            self._ids[key] = sid
            self._sets.append(cfgset)
            self._accepts.append(accept)
        return sid

    # -- CharDFA-compatible API ----------------------------------------

    def step(self, state: int, ch: str) -> int:
        if state < 0:
            return -1
        key = (state, ord(ch))
        hit = self._step_cache.get(key)
        if hit is not None:
            return hit
        raw = []
        for (t, ds, rest) in self._sets[state]:
            ds2 = self._terms[t].step(ds, ch)
            if ds2 >= 0:
                raw.append(("s", t, ds2, rest))
        cfgset, accept = self._close(raw)
        sid = self._intern(cfgset, accept)
        self._step_cache[key] = sid
        return sid

    def walk(self, state: int, text: str) -> int:
        for ch in text:
            state = self.step(state, ch)
            if state < 0:
                return -1
        return state

    def accepting(self, state: int) -> bool:
        return state >= 0 and self._accepts[state]

    def live(self, state: int) -> bool:
        return state >= 0 and (bool(self._sets[state])
                               or self._accepts[state])


def _unescape_literal(body: str) -> str:
    """Grammar string literal body -> raw text ("\\n" etc.)."""
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append({
                "n": "\n",
                "t": "\t",
                "r": "\r",
                "\\": "\\",
                '"': '"',
                "'": "'",
                "/": "/",
            }.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)
