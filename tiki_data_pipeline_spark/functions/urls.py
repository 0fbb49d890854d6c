"""URL canonicalization (SURVEY.md F9).

Port of the reference's cache-key canonicalizer (reference
src/pipelines/crawl/storage/redis_cache.py:83-137), the fix that took
cache hit-rate from 10% to 60-80% (reference
docs/05-PERFORMANCE/CACHE_HIT_RATE_FIX.md): lowercase host, force
https, strip fragment, drop tracking params (utm_*, ref, src, spm),
drop empty values, sort params, strip trailing slash.

The pure-Python core is unit-tested against the reference's
documented cases (reference tests/test_cache_hit_rate_fix.py:42-79);
the Spark surface is an Arrow-batched pandas UDF. In this engine the
idea survives as *normalize-before-join/dedup* — canonical keys make
exact dedup and cache joins converge.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference redis_cache.py:94-104 default_drops (utm_* covered by the
# prefix rule) + the fbclid/gclid click ids
TRACKING_PARAMS = {"ref", "referrer", "src", "spm", "fbclid", "gclid"}
TRACKING_PREFIXES = ("utm_",)


def canonicalize_url(url: str | None) -> str | None:
    """Pure-Python canonicalizer (one URL)."""
    if url is None or not url.strip():
        return None
    u = url.strip()
    if u.startswith("//"):
        u = "https:" + u
    parts = urlsplit(u)
    scheme = "https" if parts.scheme in ("", "http", "https") else parts.scheme
    netloc = parts.netloc.lower()
    if not netloc and parts.path:
        # schemeless absolute like "tiki.vn/x" — treat first segment as host
        segs = parts.path.split("/", 1)
        netloc = segs[0].lower()
        path = "/" + segs[1] if len(segs) > 1 else ""
    else:
        path = parts.path
    kept = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if v != ""
        and k.lower() not in TRACKING_PARAMS
        and not k.lower().startswith(TRACKING_PREFIXES)
    ]
    query = urlencode(sorted(kept))
    path = path.rstrip("/") or ""
    return urlunsplit((scheme, netloc, path, query, ""))


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    """F9 as an Arrow-batched pandas UDF."""
    return urls.map(canonicalize_url)


def cache_key(url_col, prefix: str = "detail"):
    """F10 — md5 cache key over the canonical URL
    (reference redis_cache.py:187-203)."""
    return F.concat(F.lit(prefix + ":"), F.md5(canonicalize_url_udf(url_col)))
