"""URL canonicalization — the crawl-side normalization every dedup-by-URL
pipeline runs before keying (cf. the canonicalization rules crawlers like
Common Crawl / Nutch apply: case-fold scheme+host, strip default ports and
tracking params, stable param order, no fragments).

Pure functions; the distributed operator (`q_url_canonical_dedup`) maps
them per batch and groups by the canonical key.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np
import pyarrow as pa

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]+)"
    r"(?::(?P<port>\d+))?(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#.*)?$")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> Optional[str]:
    """Canonical form: lowercase scheme+host, leading 'www.' stripped,
    default port removed, fragment dropped, ``utm_*`` tracking params
    dropped, remaining query params sorted by (name, value), trailing
    slash stripped from the path. Returns None for unparsable input
    (callers keep it as an in-band miss, never an exception)."""
    m = _URL_RE.match(url or "")
    if m is None:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    if host.startswith("www."):
        host = host[4:]
    port = m.group("port")
    netloc = host
    if port and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = m.group("path") or ""
    if path.endswith("/"):
        path = path.rstrip("/")
    query = m.group("query") or ""
    params = []
    for pair in query.split("&"):
        if not pair:
            continue
        name, _, value = pair.partition("=")
        if name.lower().startswith("utm_"):
            continue
        params.append((name, value))
    params.sort()
    canon = f"{scheme}://{netloc}{path}"
    if params:
        canon += "?" + "&".join(f"{n}={v}" for n, v in params)
    return canon


def canonicalize_batch(urls: List[Optional[str]]) -> pa.Array:
    return pa.array([canonicalize_url(u) for u in urls], pa.string())
