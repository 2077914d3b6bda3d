"""Search templates: ES's `_render/template` + `_search/template` surface —
a mustache-rendered request source bound to ``params`` at call time (how
production ES deployments ship parameterized queries; the reference's
queries are static JSON, so this is surface round-out).

Supported mustache subset (the parts ES documents for search templates):

* ``{{var}}`` — scalar substitution. Strings are JSON-escaped into place;
  numbers/booleans render bare. A missing param renders as the empty
  string (mustache's contract — pair with an inverted section for
  defaults).
* ``{{#toJson}}var{{/toJson}}`` — the whole value JSON-encoded (ES's
  idiom for arrays/objects, e.g. a terms list).
* ``{{#var}}...{{/var}}`` — section included iff ``var`` is truthy;
  ``{{^var}}...{{/var}}`` inverted (the default-value idiom
  ``{{size}}{{^size}}10{{/size}}``). Mustache's LIST-iteration sections
  are NOT supported — a list-valued section param raises loudly rather
  than silently rendering once.

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


def _scalar(value) -> str:
    if value is None:
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


def render_template(source: str, params: dict | None = None) -> str:
    """Render the mustache subset against ``params``; returns the string."""
    params = params or {}

    def do_sections(text: str) -> str:
        def repl(m: re.Match) -> str:
            neg, name, body = m.group(1) == "^", m.group(2), m.group(3)
            if name == "toJson":
                if neg:
                    raise ValueError("{{^toJson}} is not a thing")
                key = body.strip()
                if key not in params:
                    raise ValueError(f"toJson param {key!r} missing")
                return json.dumps(params[key], separators=(",", ":"))
            v = params.get(name)
            if isinstance(v, (list, dict)):
                raise ValueError(
                    f"section {name!r} got a {type(v).__name__}: mustache "
                    "list iteration is unsupported — use {{#toJson}}"
                )
            return do_sections(body) if bool(v) != neg else ""

        out, prev = _SECTION_RE.sub(repl, text), text
        while out != prev:  # nested sections resolve outside-in
            prev, out = out, _SECTION_RE.sub(repl, out)
        return out

    rendered = do_sections(source)
    rendered = _VAR_RE.sub(lambda m: _scalar(params.get(m.group(1))), rendered)
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
