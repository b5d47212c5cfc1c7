"""Minimal TOML emitter (stdlib has tomllib for reading only).

Scope: what the reference's TOML sink emits — one document per record
(src/value/toml.rs:49-65), tables for nested dicts, arrays of scalars,
basic scalar types. Always "readable" (the reference has a TODO noting
compact TOML output does not exist, rq.rs:267).
"""

from __future__ import annotations

from ...errors import TomlSerializeError
from ..values import OrderedPairs


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    raise TomlSerializeError(f"unencodable scalar {type(v).__name__}")


def _key(k) -> str:
    if not isinstance(k, str):
        raise TomlSerializeError("TOML keys must be strings")
    if k and all(c.isalnum() or c in "-_" for c in k):
        return k
    return _scalar(k)


def emit(doc: dict) -> str:
    """One TOML document for one record (must be a table at top level,
    same constraint the reference's serializer hits)."""
    if isinstance(doc, OrderedPairs):
        raise TomlSerializeError(
            "TOML tables cannot hold duplicate or non-string keys"
        )
    if not isinstance(doc, dict):
        raise TomlSerializeError("top-level TOML value must be a table")
    lines: list[str] = []
    _emit_table(doc, [], lines)
    return "\n".join(lines) + "\n"


def _emit_table(d: dict, path: list[str], lines: list[str]) -> None:
    subtables = []
    for k, v in d.items():
        if isinstance(v, OrderedPairs):
            raise TomlSerializeError(
                "TOML tables cannot hold duplicate or non-string keys"
            )
        if isinstance(v, dict):
            subtables.append((k, v))
        elif isinstance(v, list):
            if any(isinstance(x, (dict, list)) for x in v):
                raise TomlSerializeError("nested arrays/tables in array unsupported")
            lines.append(f"{_key(k)} = [{', '.join(_scalar(x) for x in v)}]")
        elif v is None:
            raise TomlSerializeError("TOML has no null value")
        else:
            lines.append(f"{_key(k)} = {_scalar(v)}")
    for k, v in subtables:
        p = path + [_key(k)]
        lines.append("")
        lines.append(f"[{'.'.join(p)}]")
        _emit_table(v, p, lines)
