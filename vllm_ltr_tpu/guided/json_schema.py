"""JSON schema -> regex pattern for guided_json.

Counterpart of outlines' ``build_regex_from_schema`` (the reference routes
guided_json through it, vllm/model_executor/guided_decoding/
outlines_decoding.py:100-113): compile the schema's practical core to a
regular expression over *compact* JSON (no inter-token whitespace), then
reuse the regex DFA pipeline.

Supported schema subset: ``type`` object/array/string/integer/number/
boolean/null, ``enum`` (string/number/bool/null literals), ``const``,
``properties`` (emitted in declaration order, all required — optional
properties would need backtracking-free optionality which the strict
compact form keeps unambiguous via the separating comma), ``items``,
``minItems``/``maxItems``, ``minLength``/``maxLength`` for strings,
``pattern`` (embedded verbatim), and ``anyOf``/``oneOf`` unions.

``whitespace=True`` compiles the lm-format-enforcer-style permissive
form instead: optional whitespace around every structural character
(the reference's alternative backend accepts pretty-printed JSON where
outlines forces the compact form,
vllm/model_executor/guided_decoding/lm_format_enforcer_decoding.py).
Since ``[ \t\n\r]*`` is idempotent under concatenation, the compiler
just swaps the structural tokens — the DFA stays small because all
whitespace runs share one self-loop state per position.
"""
from __future__ import annotations

import json
from typing import Any, Dict

from vllm_ltr_tpu.guided.regex_dfa import escape_literal

_STRING_CHAR = r'[^"\\\x00-\x1f]'  # no escapes/quotes/control chars
_INTEGER = r"-?(0|[1-9][0-9]*)"
_NUMBER = r"-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?"
_BOOLEAN = r"(true|false)"
_NULL = r"null"


class SchemaError(ValueError):
    pass


_STRING = f'"{_STRING_CHAR}*"'
_WS = r"[ \t\n\r]*"


class _Structural:
    """Structural JSON tokens, optionally whitespace-padded (whitespace
    runs compose idempotently, so padding both sides of every token is
    safe even where two padded tokens abut)."""

    def __init__(self, whitespace: bool):
        ws = _WS if whitespace else ""
        self.obrace = rf"\{{{ws}"
        self.cbrace = rf"{ws}\}}"
        self.obrack = rf"\[{ws}"
        self.cbrack = rf"{ws}\]"
        self.comma = rf"{ws},{ws}"
        self.colon = rf"{ws}:{ws}"


def any_json_regex(depth: int = 3, whitespace: bool = False) -> str:
    """Free-form JSON object of bounded nesting depth — the regular
    approximation of the reference's ``response_format: json_object``
    grammar (outlines_decoding.py JSON_GRAMMAR).  Full JSON is not
    regular; ``depth`` levels of array/object nesting cover practical
    model output while keeping the lazily-determinized DFA small."""
    t = _Structural(whitespace)
    scalar = f"({_STRING}|{_NUMBER}|{_BOOLEAN}|{_NULL})"
    pair = f"{_STRING}{t.colon}{{v}}"
    value = scalar
    for _ in range(depth):
        arr = rf"{t.obrack}({value}({t.comma}{value})*)?{t.cbrack}"
        p = pair.format(v=value)
        obj = rf"{t.obrace}({p}({t.comma}{p})*)?{t.cbrace}"
        value = f"({scalar}|{arr}|{obj})"
    p = pair.format(v=value)
    return rf"{t.obrace}({p}({t.comma}{p})*)?{t.cbrace}"


def _json_literal(value: Any) -> str:
    return escape_literal(json.dumps(value, separators=(",", ":")))


def schema_to_regex(schema: Dict[str, Any] | str,
                    whitespace: bool = False) -> str:
    if isinstance(schema, str):
        schema = json.loads(schema)
    return _compile(schema, _Structural(whitespace))


def _compile(schema: Dict[str, Any], t: _Structural = None) -> str:
    if t is None:
        t = _Structural(False)
    if not isinstance(schema, dict):
        raise SchemaError(f"schema must be an object, got {type(schema)}")
    if "enum" in schema:
        options = [_json_literal(v) for v in schema["enum"]]
        return "(" + "|".join(options) + ")"
    if "const" in schema:
        return _json_literal(schema["const"])
    for union_key in ("anyOf", "oneOf"):
        if union_key in schema:
            branches = [_compile(s, t) for s in schema[union_key]]
            return "(" + "|".join(branches) + ")"

    stype = schema.get("type")
    if isinstance(stype, list):
        return "(" + "|".join(
            _compile({**schema, "type": ty}, t) for ty in stype) + ")"
    if stype == "string":
        if "pattern" in schema:
            # Embedded pattern constrains the *content* between quotes.
            return '"' + schema["pattern"] + '"'
        lo = schema.get("minLength", 0)
        hi = schema.get("maxLength")
        rep = (f"{{{lo},{hi}}}" if hi is not None else
               f"{{{lo},}}" if lo else "*")
        return f'"{_STRING_CHAR}{rep}"'
    if stype == "integer":
        return _INTEGER
    if stype == "number":
        return _NUMBER
    if stype == "boolean":
        return _BOOLEAN
    if stype == "null":
        return _NULL
    if stype == "array":
        item = _compile(schema.get("items", {"type": "string"}), t)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        if hi is not None and hi < lo:
            raise SchemaError("maxItems < minItems")
        if hi == 0:
            return t.obrack + t.cbrack
        more = f"({t.comma}{item})"
        if hi is None:
            tail = f"{more}{{{max(lo - 1, 0)},}}"
        else:
            tail = f"{more}{{{max(lo - 1, 0)},{hi - 1}}}"
        body = f"{item}{tail}"
        if lo == 0:
            body = f"({body})?"
        return t.obrack + body + t.cbrack
    if stype == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            return t.obrace + t.cbrace
        names = list(props)
        required = schema.get("required")
        # Without an explicit "required" list every declared property is
        # emitted (the compact all-required form); with one, optional
        # properties fold into ordered optional groups — each optional
        # carries its own comma, and the alternation over "which property
        # appears first" keeps comma placement unambiguous.  Properties
        # always appear in declaration order; additionalProperties is not
        # modeled (output is strictly the declared shape).
        req = set(names if required is None else required)
        unknown = req - set(names)
        if unknown:
            raise SchemaError(
                f"required properties {sorted(unknown)} not declared "
                "in 'properties'")
        pats = [
            f'"{escape_literal(n)}"{t.colon}{_compile(props[n], t)}'
            for n in names
        ]
        req_idx = [i for i, n in enumerate(names) if n in req]
        first_cap = req_idx[0] if req_idx else len(names) - 1
        branches = []
        for i in range(first_cap + 1):
            parts = [pats[i]]
            for j in range(i + 1, len(names)):
                pj = f"{t.comma}{pats[j]}"
                parts.append(pj if names[j] in req else f"({pj})?")
            branches.append("".join(parts))
        body = (branches[0] if len(branches) == 1 else
                "(" + "|".join(branches) + ")")
        if not req_idx:
            body = f"({body})?"
        return t.obrace + body + t.cbrace
    raise SchemaError(f"unsupported schema: {schema!r}")
