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

ONE implementation: the RE2 regex chain evaluated by pyarrow.compute. The
scalar ``normalize_text`` wraps the vectorized ``normalize_text_arrow`` on a
1-element array, so the per-document oracle, the Ray text-span path (big
vectorized batches) and the DuckDB SQL twin (same RE2 patterns,
pipelines/analysis.py) are the same function by construction — no
python-re-vs-RE2 corner (unicode \\s, \\b) can diverge.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns — shared verbatim with the SQL oracle strings
RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
RE_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
RE_TAG = r"<[^>]+>"
RE_WS = r"\s+"
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last so &amp;lt; does not double-unescape
]


def normalize_text_arrow(arr: pa.Array) -> pa.Array:
    """Vectorized normalize over a string array (zero-copy RE2 kernels)."""
    t = pc.replace_substring_regex(arr, RE_SCRIPT, " ")
    t = pc.replace_substring_regex(t, RE_STYLE, " ")
    t = pc.replace_substring_regex(t, RE_TAG, " ")
    for ent, rep in ENTITIES:
        t = pc.replace_substring(t, ent, rep)
    t = pc.replace_substring_regex(t, RE_WS, " ")
    # trim SPACES only (the \s+ collapse already reduced ASCII-ws runs to one
    # space; DuckDB trim() also strips exactly ' ' — unicode-trim would
    # silently diverge from the SQL twin on NEL/NBSP-final strings)
    return pc.utf8_trim(t, characters=" ")


def normalize_text(text: str) -> str:
    if not text:
        return ""
    return normalize_text_arrow(pa.array([text], pa.string()))[0].as_py()
