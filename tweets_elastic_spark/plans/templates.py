"""Search templates: ES's `_render/template` + `_search/template` surface —
a mustache-rendered request source bound to ``params`` at call time (how
production ES deployments ship parameterized queries; the reference's
queries are static JSON, so this is surface round-out).

Supported mustache subset (the parts ES documents for search templates):

* ``{{var}}`` — scalar substitution. Strings are JSON-escaped into place;
  numbers/booleans render bare. A missing param renders as the empty
  string (mustache's contract — pair with an inverted section for
  defaults). Dotted names resolve through nested dicts; ``{{.}}`` is the
  current list element inside an iteration section.
* ``{{#toJson}}var{{/toJson}}`` — the whole value JSON-encoded (ES's
  idiom for arrays/objects, e.g. a terms list).
* ``{{#var}}...{{/var}}`` — mustache sections with full semantics:
  a LIST value repeats the body once per element (the element becomes
  the innermost context frame, so ``{{.}}`` / element fields resolve
  inside); a dict pushes a context frame; any other truthy value renders
  the body once; falsy skips it. ``{{^var}}...{{/var}}`` inverted —
  rendered for falsy values and EMPTY lists (the default-value idiom
  ``{{size}}{{^size}}10{{/size}}``). Same-name nested sections raise
  loudly (the section scanner pairs open/close tags by name).

Rendering happens on the SOURCE STRING and the result must parse as JSON
(ES's model: templates are stored strings, not JSON trees). Purely
driver-side string work — nothing here touches the cluster; the rendered
request executes through the ordinary ``es_request``/``from_es_json``
front-ends.
"""

from __future__ import annotations

import json
import re

__all__ = ["render_template", "render_search_template"]

_SECTION_RE = re.compile(
    r"\{\{([#^])\s*([\w.]+)\s*\}\}(.*?)\{\{/\s*\2\s*\}\}", re.DOTALL
)
_VAR_RE = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")

_MISSING = object()


def _lookup(name: str, stack: list):
    """Mustache name resolution: ``.`` is the innermost frame; dotted
    names walk nested dicts; frames are searched innermost-out."""
    if name == ".":
        return stack[-1]
    parts = name.split(".")
    for frame in reversed(stack):
        cur = frame
        ok = True
        for p in parts:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            else:
                ok = False
                break
        if ok:
            return cur
    return _MISSING


def _scalar(value) -> str:
    if value is _MISSING or value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    if isinstance(value, str):
        return json.dumps(value)[1:-1]  # escaped, without the quotes
    raise ValueError(
        f"template variable of type {type(value).__name__} needs "
        "{{#toJson}} (lists/objects don't interpolate as scalars)"
    )


def _subst_vars(text: str, stack: list) -> str:
    return _VAR_RE.sub(lambda m: _scalar(_lookup(m.group(1), stack)), text)


def _render_section(m: re.Match, stack: list) -> str:
    neg, name, body = m.group(1) == "^", m.group(2), m.group(3)
    if name == "toJson":
        if neg:
            raise ValueError("{{^toJson}} is not a thing")
        key = body.strip()
        v = _lookup(key, stack)
        if v is _MISSING:
            raise ValueError(f"toJson param {key!r} missing")
        return json.dumps(v, separators=(",", ":"))
    if re.search(r"\{\{[#^]\s*" + re.escape(name) + r"\s*\}\}", body):
        raise ValueError(
            f"same-name nested section {name!r} is unsupported (the "
            "non-greedy scanner would mis-pair its close tag)"
        )
    v = _lookup(name, stack)
    if isinstance(v, list):
        if neg:  # inverted section renders for an EMPTY list
            return _render(body, stack) if not v else ""
        out = []
        for item in v:
            stack.append(item)
            out.append(_render(body, stack))
            stack.pop()
        return "".join(out)
    if isinstance(v, dict):
        if neg:
            return ""
        stack.append(v)
        try:
            return _render(body, stack)
        finally:
            stack.pop()
    truthy = v is not _MISSING and bool(v)
    return _render(body, stack) if truthy != neg else ""


def _render(text: str, stack: list) -> str:
    """Segment-wise: section bodies render recursively under their scope;
    variable substitution touches only the text OUTSIDE sections, so a
    substituted value can never be re-scanned as template syntax."""
    out, pos = [], 0
    for m in _SECTION_RE.finditer(text):
        out.append(_subst_vars(text[pos:m.start()], stack))
        out.append(_render_section(m, stack))
        pos = m.end()
    out.append(_subst_vars(text[pos:], stack))
    return "".join(out)


def render_template(source: str, params: dict | None = None) -> str:
    """Render the mustache subset against ``params``; returns the string."""
    rendered = _render(source, [params or {}])
    if "{{" in rendered:
        raise ValueError(
            f"unrendered template syntax remains: {rendered!r}"
        )
    return rendered


def render_search_template(
    source: str | dict, params: dict | None = None
) -> dict:
    """ES ``_render/template``: render and parse back to a request dict.
    A dict source is serialized first (ES accepts inline dict sources —
    mustache still runs over the serialized form, ES's behavior)."""
    if isinstance(source, dict):
        source = json.dumps(source)
    rendered = render_template(source, params)
    try:
        return json.loads(rendered)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"rendered template is not valid JSON ({e}): {rendered!r}"
        ) from None
