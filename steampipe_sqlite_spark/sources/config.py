"""Connection-config parsing: JSON or HCL.

The reference accepts both JSON and HCL connection-config strings — its
test.sql demonstrates `{"profile":"silverwater", "regions":["*"]}` and
`profile = "silverwater"` side by side (/root/reference/test.sql:4-8); the
plugin SDK parses whichever the plugin schema declares.  Here every
connector funnels its config through :func:`parse_config`, which accepts:

1. JSON (tried first — cheap and unambiguous);
2. HCL via the public ``python-hcl2`` package when importable;
3. a built-in parser for the flat HCL subset that connection configs in
   practice use: ``key = value`` lines with string/number/bool/list
   values and ``#``/``//`` comments.  (Nested blocks are out of scope —
   none of the reference's own examples use them; install python-hcl2
   for full HCL.)
"""

from __future__ import annotations

import json
import re
from typing import Any

try:  # public package, optional — container may not ship it
    import hcl2 as _hcl2  # type: ignore
except Exception:  # pragma: no cover - absence is the common case here
    _hcl2 = None


class ConfigError(ValueError):
    """Raised when a config string parses as neither JSON nor HCL."""


_COMMENT_RE = re.compile(r"(#|//).*$")
_KV_RE = re.compile(r"^([A-Za-z_][\w-]*)\s*=\s*(.+)$")


def _parse_scalar(tok: str) -> Any:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return json.loads(tok)  # JSON string escapes ⊇ HCL's
    if tok in ("true", "false"):
        return tok == "true"
    if tok == "null":
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise ConfigError(f"unparseable HCL value: {tok!r}")


def _split_list(body: str) -> list[str]:
    """Split a bracketed list body on top-level commas (quote-aware)."""
    items, depth, in_str, cur = [], 0, False, []
    i = 0
    while i < len(body):
        ch = body[i]
        if in_str:
            cur.append(ch)
            if ch == "\\":
                i += 1
                if i < len(body):
                    cur.append(body[i])
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur and "".join(cur).strip():
        items.append("".join(cur))
    return items


def _parse_value(tok: str) -> Any:
    tok = tok.strip()
    if tok.startswith("[") and tok.endswith("]"):
        body = tok[1:-1].strip()
        if not body:
            return []
        return [_parse_value(item) for item in _split_list(body)]
    return _parse_scalar(tok)


def _parse_hcl_subset(text: str) -> dict[str, Any]:
    out: dict[str, Any] = {}
    # join continuation lines of multiline lists
    lines: list[str] = []
    buf = ""
    for raw in text.splitlines():
        line = _COMMENT_RE.sub("", raw).strip()
        if not line:
            continue
        buf = f"{buf} {line}".strip() if buf else line
        if buf.count("[") > buf.count("]"):
            continue  # list continues on the next line
        lines.append(buf)
        buf = ""
    if buf:
        lines.append(buf)
    if not lines:
        return out
    for line in lines:
        m = _KV_RE.match(line)
        if not m:
            raise ConfigError(f"unsupported HCL construct: {line!r}")
        out[m.group(1)] = _parse_value(m.group(2))
    return out


def parse_config(config: str | None) -> dict[str, Any]:
    """Parse a connection-config string (JSON or HCL) into a dict."""
    if not config or not config.strip():
        return {}
    try:
        parsed = json.loads(config)
        if isinstance(parsed, dict):
            return parsed
        raise ConfigError(f"JSON config must be an object, got {type(parsed).__name__}")
    except json.JSONDecodeError:
        pass
    if _hcl2 is not None:
        import io

        try:
            parsed = _hcl2.load(io.StringIO(config))
            if isinstance(parsed, dict):
                return parsed
        except Exception:
            pass
    return _parse_hcl_subset(config)
