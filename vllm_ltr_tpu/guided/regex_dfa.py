"""Regex -> character-level DFA for guided decoding.

A small, dependency-free regex compiler: parser -> Thompson NFA ->
lazily-determinized DFA.  Supports the practical subset guided decoding
needs (the same operators outlines' interegular-based pipeline handles
for typical guided_regex / JSON-schema patterns):

  literals, ``.``, escapes (``\\d \\w \\s \\D \\W \\S \\n \\t \\r`` and
  escaped metacharacters), character classes ``[a-z]`` / ``[^...]``,
  grouping ``( )`` (non-capturing ``(?: )`` accepted), alternation
  ``|``, quantifiers ``* + ?`` and ``{m} {m,} {m,n}``.

Anchors are implicit: guided generation is always a full match, so ``^``
and ``$`` at the pattern edges are accepted and ignored.

Transitions are labeled with sorted disjoint code-point intervals, so
unicode vocabularies don't explode the alphabet.  Determinization is
lazy (states materialize as token walks reach them) and memoized, which
keeps compile time proportional to what generation actually visits.
"""
from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Tuple

Interval = Tuple[int, int]  # inclusive code-point range

MAX_CP = 0x10FFFF

_CLASS_SHORTHANDS: Dict[str, List[Interval]] = {
    "d": [(48, 57)],
    "w": [(48, 57), (65, 90), (95, 95), (97, 122)],
    "s": [(9, 13), (32, 32)],
}

_ESCAPE_LITERALS = {
    "n": "\n", "t": "\t", "r": "\r", "f": "\f", "v": "\v", "0": "\0",
}


def _negate(intervals: List[Interval]) -> List[Interval]:
    out: List[Interval] = []
    cur = 0
    for lo, hi in sorted(intervals):
        if lo > cur:
            out.append((cur, lo - 1))
        cur = max(cur, hi + 1)
    if cur <= MAX_CP:
        out.append((cur, MAX_CP))
    return out


def _merge(intervals: List[Interval]) -> List[Interval]:
    if not intervals:
        return []
    ivs = sorted(intervals)
    out = [ivs[0]]
    for lo, hi in ivs[1:]:
        plo, phi = out[-1]
        if lo <= phi + 1:
            out[-1] = (plo, max(phi, hi))
        else:
            out.append((lo, hi))
    return out


# ---------------------------------------------------------------------------
# Parser (recursive descent) -> AST
# ---------------------------------------------------------------------------

# AST nodes: ("char", intervals) | ("cat", [nodes]) | ("alt", [nodes])
#          | ("star", node) | ("plus", node) | ("opt", node)
#          | ("rep", node, m, n_or_None) | ("eps",)


class RegexError(ValueError):
    pass


class _Parser:

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise RegexError(f"unexpected '{self.peek()}' at {self.i} in "
                             f"{self.p!r}")
        return node

    def _alt(self):
        branches = [self._cat()]
        while self.peek() == "|":
            self.next()
            branches.append(self._cat())
        return branches[0] if len(branches) == 1 else ("alt", branches)

    def _cat(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            # Anchors are no-ops under full-match semantics, but ONLY at
            # branch edges; an interior '^'/'$' (e.g. 'a$b') would match
            # text Python's re rejects — fail at compile time instead.
            if self.peek() == "^" and parts:
                raise RegexError("'^' is only supported at the start of "
                                 "a pattern or branch")
            if self.peek() == "$":
                self.next()
                if self.peek() not in (None, "|", ")"):
                    raise RegexError("'$' is only supported at the end of "
                                     "a pattern or branch")
                continue
            parts.append(self._quantified())
        if not parts:
            return ("eps", )
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def _quantified(self):
        atom = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.next()
                atom = ("star", atom)
            elif ch == "+":
                self.next()
                atom = ("plus", atom)
            elif ch == "?":
                self.next()
                atom = ("opt", atom)
            elif ch == "{":
                save = self.i
                rep = self._try_brace()
                if rep is None:
                    self.i = save
                    break
                m, n = rep
                atom = ("rep", atom, m, n)
            else:
                break
        return atom

    def _try_brace(self):
        """Parse {m}, {m,}, {m,n} after consuming '{'; None if not a
        quantifier (then '{' is a literal, like Python's re)."""
        self.next()  # '{'
        digits = ""
        while self.peek() is not None and self.peek().isdigit():
            digits += self.next()
        if not digits:
            return None
        m = int(digits)
        n: Optional[int] = m
        if self.peek() == ",":
            self.next()
            digits2 = ""
            while self.peek() is not None and self.peek().isdigit():
                digits2 += self.next()
            n = int(digits2) if digits2 else None
        if self.peek() != "}":
            return None
        self.next()
        if n is not None and n < m:
            raise RegexError(f"bad repeat range {{{m},{n}}}")
        return (m, n)

    def _atom(self):
        ch = self.next()
        if ch == "(":
            if self.peek() == "?":
                self.next()
                mod = self.next()
                if mod != ":":
                    raise RegexError(f"unsupported group (?{mod}...)")
            node = self._alt()
            if self.peek() != ")":
                raise RegexError("unbalanced '('")
            self.next()
            return node
        if ch == "[":
            return ("char", self._char_class())
        if ch == ".":
            return ("char", _negate([(10, 10)]))  # anything but newline
        if ch == "\\":
            return ("char", self._escape())
        if ch in ("^", "$"):
            return ("eps", )  # full-match semantics: anchors are no-ops
        if ch in ("*", "+", "?"):
            raise RegexError(f"dangling quantifier '{ch}'")
        return ("char", [(ord(ch), ord(ch))])

    def _escape(self) -> List[Interval]:
        if self.peek() is None:
            raise RegexError("trailing backslash")
        ch = self.next()
        if ch in _CLASS_SHORTHANDS:
            return _CLASS_SHORTHANDS[ch]
        if ch.lower() in _CLASS_SHORTHANDS and ch.isupper():
            return _negate(_CLASS_SHORTHANDS[ch.lower()])
        if ch in _ESCAPE_LITERALS:
            lit = _ESCAPE_LITERALS[ch]
            return [(ord(lit), ord(lit))]
        if ch == "x":
            hexs = ""
            for _ in range(2):
                hexs += self.next()
            return [(int(hexs, 16), int(hexs, 16))]
        if ch == "u":
            hexs = ""
            for _ in range(4):
                hexs += self.next()
            return [(int(hexs, 16), int(hexs, 16))]
        # Escaped metacharacter / punctuation: literal.
        return [(ord(ch), ord(ch))]

    def _char_class(self) -> List[Interval]:
        negated = False
        if self.peek() == "^":
            self.next()
            negated = True
        intervals: List[Interval] = []
        first = True
        while True:
            ch = self.peek()
            if ch is None:
                raise RegexError("unbalanced '['")
            if ch == "]" and not first:
                self.next()
                break
            first = False
            self.next()
            if ch == "\\":
                ivs = self._escape()
                if len(ivs) == 1 and ivs[0][0] == ivs[0][1]:
                    lo_cp = ivs[0][0]
                else:  # shorthand class inside [...]
                    intervals.extend(ivs)
                    continue
            else:
                lo_cp = ord(ch)
            if self.peek() == "-" and self.i + 1 < len(self.p) \
                    and self.p[self.i + 1] != "]":
                self.next()  # '-'
                hi_ch = self.next()
                if hi_ch == "\\":
                    hi_ivs = self._escape()
                    if len(hi_ivs) != 1 or hi_ivs[0][0] != hi_ivs[0][1]:
                        raise RegexError("bad range endpoint")
                    hi_cp = hi_ivs[0][0]
                else:
                    hi_cp = ord(hi_ch)
                if hi_cp < lo_cp:
                    raise RegexError("reversed char-class range")
                intervals.append((lo_cp, hi_cp))
            else:
                intervals.append((lo_cp, lo_cp))
        intervals = _merge(intervals)
        return _negate(intervals) if negated else intervals


# ---------------------------------------------------------------------------
# Thompson NFA
# ---------------------------------------------------------------------------


class _NFA:
    """States are ints; transitions: state -> list[(intervals, next)];
    eps: state -> list[next]."""

    def __init__(self):
        self.trans: List[List[Tuple[List[Interval], int]]] = []
        self.eps: List[List[int]] = []

    def new_state(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def add_eps(self, a: int, b: int) -> None:
        self.eps[a].append(b)

    def add_char(self, a: int, intervals: List[Interval], b: int) -> None:
        self.trans[a].append((intervals, b))


def _build(nfa: _NFA, node) -> Tuple[int, int]:
    """Compile an AST node to an NFA fragment; returns (start, accept)."""
    kind = node[0]
    if kind == "eps":
        s = nfa.new_state()
        return s, s
    if kind == "char":
        s, t = nfa.new_state(), nfa.new_state()
        nfa.add_char(s, node[1], t)
        return s, t
    if kind == "cat":
        s, t = _build(nfa, node[1][0])
        for part in node[1][1:]:
            s2, t2 = _build(nfa, part)
            nfa.add_eps(t, s2)
            t = t2
        return s, t
    if kind == "alt":
        s, t = nfa.new_state(), nfa.new_state()
        for branch in node[1]:
            bs, bt = _build(nfa, branch)
            nfa.add_eps(s, bs)
            nfa.add_eps(bt, t)
        return s, t
    if kind == "star":
        s, t = nfa.new_state(), nfa.new_state()
        bs, bt = _build(nfa, node[1])
        nfa.add_eps(s, bs)
        nfa.add_eps(s, t)
        nfa.add_eps(bt, bs)
        nfa.add_eps(bt, t)
        return s, t
    if kind == "plus":
        return _build(nfa, ("cat", [node[1], ("star", node[1])]))
    if kind == "opt":
        return _build(nfa, ("alt", [node[1], ("eps", )]))
    if kind == "rep":
        _, sub, m, n = node
        parts = [sub] * m
        if n is None:
            parts.append(("star", sub))
        else:
            parts.extend([("opt", sub)] * (n - m))
        if not parts:
            return _build(nfa, ("eps", ))
        return _build(nfa, parts[0] if len(parts) == 1 else ("cat", parts))
    raise RegexError(f"unknown AST node {kind}")


# ---------------------------------------------------------------------------
# Lazy DFA
# ---------------------------------------------------------------------------


class CharDFA:
    """Lazily determinized DFA over code points.

    ``step(state, ch)`` returns the next DFA state id or -1 (dead).
    State 0 is the start.  ``accepting(state)`` marks full-match states.
    """

    def __init__(self, pattern: str):
        nfa = _NFA()
        start, accept = _build(nfa, _Parser(pattern).parse())
        self._nfa = nfa
        self._accept_nfa = accept
        self._closure_cache: Dict[FrozenSet[int], FrozenSet[int]] = {}
        start_set = self._closure(frozenset([start]))
        self._states: Dict[FrozenSet[int], int] = {start_set: 0}
        self._state_sets: List[FrozenSet[int]] = [start_set]
        self._step_cache: Dict[Tuple[int, int], int] = {}
        self._live_cache: Dict[int, bool] = {}

    # -- NFA helpers ------------------------------------------------------

    def _closure(self, states: FrozenSet[int]) -> FrozenSet[int]:
        cached = self._closure_cache.get(states)
        if cached is not None:
            return cached
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for t in self._nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        result = frozenset(seen)
        self._closure_cache[states] = result
        return result

    # -- DFA API ----------------------------------------------------------

    def step(self, state: int, ch: str) -> int:
        cp = ord(ch)
        key = (state, cp)
        hit = self._step_cache.get(key)
        if hit is not None:
            return hit
        nxt = set()
        for s in self._state_sets[state]:
            for intervals, t in self._nfa.trans[s]:
                for lo, hi in intervals:
                    if lo <= cp <= hi:
                        nxt.add(t)
                        break
        if not nxt:
            self._step_cache[key] = -1
            return -1
        closed = self._closure(frozenset(nxt))
        sid = self._states.get(closed)
        if sid is None:
            sid = len(self._state_sets)
            self._states[closed] = sid
            self._state_sets.append(closed)
        self._step_cache[key] = sid
        return sid

    def walk(self, state: int, text: str) -> int:
        for ch in text:
            state = self.step(state, ch)
            if state < 0:
                return -1
        return state

    def accepting(self, state: int) -> bool:
        return self._accept_nfa in self._state_sets[state]

    def live(self, state: int) -> bool:
        """True if some suffix can still reach acceptance from here."""
        cached = self._live_cache.get(state)
        if cached is not None:
            return cached
        # BFS over NFA states reachable by any character path.
        seen = set(self._state_sets[state])
        stack = list(seen)
        alive = self._accept_nfa in seen
        while stack and not alive:
            s = stack.pop()
            targets = list(self._nfa.eps[s]) + [
                t for _, t in self._nfa.trans[s]
            ]
            for t in targets:
                if t not in seen:
                    seen.add(t)
                    if t == self._accept_nfa:
                        alive = True
                        break
                    stack.append(t)
        self._live_cache[state] = alive
        return alive


def escape_literal(text: str) -> str:
    """Escape a literal string for embedding in a pattern."""
    specials = set("\\.^$*+?{}[]()|/")
    out = []
    for ch in text:
        if ch in specials:
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\r":
            out.append("\\r")
        else:
            out.append(ch)
    return "".join(out)
