"""Lightweight boilerplate-strip / normalize path for pure-text spans.

The reference has no text-span path (it is image-only); BASELINE.json's
north_rule extends the engine to interleaved text+media documents where
"pure-text spans take a lightweight boilerplate-strip/normalize path"
(main-content extraction: HTML boilerplate strip + whitespace normalize).
Semantics are defined HERE (oracle == pipeline by shared code):

1. drop <script>/<style> elements entirely (content is boilerplate)
2. strip remaining HTML/XML tags
3. unescape the 5 basic entities (&amp; &lt; &gt; &quot; &#39;) and &nbsp;
4. collapse all whitespace runs to a single space; strip ends
"""

from __future__ import annotations

import re

# Two separate element patterns (no backreference) so the exact same chain is
# expressible in RE2 engines too (pyarrow.compute and DuckDB regexp_replace),
# keeping Python oracle == Arrow pipeline == SQL oracle by construction.
_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last so &amp;lt; does not double-unescape
]


def normalize_text(text: str) -> str:
    if not text:
        return ""
    t = _SCRIPT_RE.sub(" ", text)
    t = _STYLE_RE.sub(" ", t)
    t = _TAG_RE.sub(" ", t)
    for ent, rep in _ENTITIES:
        t = t.replace(ent, rep)
    return _WS_RE.sub(" ", t).strip()
