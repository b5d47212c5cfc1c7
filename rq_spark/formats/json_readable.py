"""ANSI-colored "readable" JSON emitter (K2).

Re-creates the observable output of the reference's custom serde_json
Formatter (/root/reference/src/value/json.rs:115-520): 2-space
indentation with every item on its own line, empty containers kept
inline (`[]` / `{}`), and the ansi_term style set —

* null        bold+dim+italic black   (ESC[1;2;3;30m)
* true        bold+italic green       (ESC[1;3;32m)
* false       bold+italic red         (ESC[1;3;31m)
* numbers     blue                    (ESC[34m)
* strings     green body, dim green quotes and escape sequences
* object keys blue body, dim blue quotes and escape sequences
* [ ] { } , : bold                    (ESC[1m)

Escape handling mirrors serde_json: only `"`, `\\` and control bytes
are escaped (short forms \\b \\f \\n \\r \\t, else \\u00xx lowercase);
non-ASCII text passes through raw. Each fragment is painted
separately, exactly as the reference's formatter paints per-fragment.
"""

from __future__ import annotations

import json as _json

from .values import OrderedPairs

_RESET = "\x1b[0m"


def _painter(sgr: str):
    def paint(s: str) -> str:
        return f"\x1b[{sgr}m{s}{_RESET}"

    return paint


# ansi_term emits attributes in the order bold(1) dim(2) italic(3) fg
_NULL = _painter("1;2;3;30")
_TRUE = _painter("1;3;32")
_FALSE = _painter("1;3;31")
_NUM = _painter("34")
_STR_QUOTE = _painter("2;32")
_STR_CHAR = _painter("32")
_STR_ESC = _painter("2;32")
_KEY_QUOTE = _painter("2;34")
_KEY_CHAR = _painter("34")
_KEY_ESC = _painter("2;34")
_PUNCT = _painter("1")

_SHORT_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _fragments(s: str):
    """Yield (is_escape, text) runs, serde_json escape policy."""
    buf: list[str] = []
    for ch in s:
        esc = _SHORT_ESCAPES.get(ch)
        if esc is None and ch >= " ":
            buf.append(ch)
            continue
        if esc is None:  # other C0 control
            esc = f"\\u{ord(ch):04x}"
        if buf:
            yield False, "".join(buf)
            buf = []
        yield True, esc
    if buf:
        yield False, "".join(buf)


def _string(s: str, key: bool = False) -> str:
    quote = _KEY_QUOTE if key else _STR_QUOTE
    char = _KEY_CHAR if key else _STR_CHAR
    escape = _KEY_ESC if key else _STR_ESC
    parts = [quote('"')]
    for is_esc, frag in _fragments(s):
        parts.append(escape(frag) if is_esc else char(frag))
    parts.append(quote('"'))
    return "".join(parts)


def _emit(v, out: list, depth: int) -> None:
    if v is None:
        out.append(_NULL("null"))
    elif v is True:
        out.append(_TRUE("true"))
    elif v is False:
        out.append(_FALSE("false"))
    elif isinstance(v, str):
        out.append(_string(v))
    elif isinstance(v, (int, float)):
        out.append(_NUM(_json.dumps(v)))
    elif isinstance(v, (list, tuple)):
        out.append(_PUNCT("["))
        for i, x in enumerate(v):
            if i:
                out.append(_PUNCT(","))
            out.append("\n" + "  " * (depth + 1))
            _emit(x, out, depth + 1)
        if len(v):
            out.append("\n" + "  " * depth)
        out.append(_PUNCT("]"))
    elif isinstance(v, (dict, OrderedPairs)):
        out.append(_PUNCT("{"))
        first = True
        for k, x in v.items():
            if not first:
                out.append(_PUNCT(","))
            first = False
            out.append("\n" + "  " * (depth + 1))
            out.append(_string(str(k), key=True))
            out.append(_PUNCT(": "))
            _emit(x, out, depth + 1)
        if v:
            out.append("\n" + "  " * depth)
        out.append(_PUNCT("}"))
    else:
        raise TypeError(f"not JSON-representable: {type(v).__name__}")


def emit(value) -> str:
    """One record → colored readable JSON (no trailing newline)."""
    out: list[str] = []
    _emit(value, out, 0)
    return "".join(out)
