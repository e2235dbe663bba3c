"""URL canonicalization and canonical-url dedup.

Common-Crawl-style corpora carry the same page under many url spellings
(scheme/host case, default ports, ``www.`` prefixes, tracking query
params, fragment anchors, duplicate/trailing slashes, query-param
order).  Canonicalizing before url-keyed dedup/lineage collapses those
families; the reference scanner keys everything on the raw object url
(its S3/web listings are already canonical), so this operator is the
web-corpus extension of its F-filter url handling
(``app/services/data_analysis_service.py`` url-keyed findings).

Scale design: the whole transform is a single chain of built-in string
expressions (``regexp_replace``/``regexp_extract``/``sort_array``/
``concat``) — whole-stage codegen, zero Python, zero shuffle, applied
at scan granularity.  ``sort_array`` (native SortArray) is used instead
of the interpreted higher-order ``array_sort(lambda)`` form.  The dedup
step is one map-side-combinable ``max_by`` aggregation on the canonical
key — no window over a global sort.

Semantics (documented subset — absolute http(s)-style urls; userinfo
(``user:pass@host``) is passed through as part of the authority):

1. trim + drop the ``#fragment``;
2. no ``scheme://`` prefix → returned as-is after (1);
3. scheme and host lowercased; trailing ``.`` of the host dropped;
4. leading ``www.`` of the host dropped (``strip_www=True``);
5. default ports dropped (``http:80``, ``https:443``); others kept;
6. duplicate slashes in the path collapsed, trailing slash dropped
   (except the root path, which is normalized TO ``/``);
7. tracking query params removed (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``igshid``, ``mc_cid``, ``mc_eid``, ``_ga``,
   ``ref_src``, ``spm``) (``strip_tracking=True``);
8. surviving query params sorted bytewise (``sort_query=True``); an
   emptied query drops its ``?``.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_PATTERN",
    "canonicalize_url",
    "canonicalize_url_py",
    "keep_latest_per_canonical",
]

# One alternation, shared by the Spark expression and the pure-Python
# reference; every branch is plain regex (no lookarounds) so the same
# pattern text runs under Java regex, RE2 and Python `re`.
TRACKING_PARAM_PATTERN = (
    "utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|_ga|ref_src|spm"
)

_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def canonicalize_url(
    url: Column | str,
    *,
    strip_www: bool = True,
    strip_tracking: bool = True,
    sort_query: bool = True,
) -> Column:
    """Canonical form of ``url`` as a pure codegen column expression."""
    u = F.col(url) if isinstance(url, str) else url
    # (1) trim + fragment.
    u = F.regexp_replace(F.trim(u), "#.*", "")
    has_scheme = u.rlike(_SCHEME_RE)

    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")

    # Authority = up to the first '/' or '?'; lowercase, drop one
    # trailing host dot, split off an explicit port.
    authority = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(authority, ":[0-9]+$", ""), "\\.$", ""
    )
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    port_part = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )

    path_q = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(path_q, "^([^?]*)", 1)
    query = F.regexp_replace(path_q, "^[^?]*\\??", "")

    # (6) collapse duplicate slashes; strip trailing slashes; '' -> '/'.
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    if strip_tracking:
        # Prefix '&' so every param is '&'-led, remove tracked ones,
        # then drop the artificial lead.
        led = F.concat(F.lit("&"), query)
        led = F.regexp_replace(
            led, f"&({TRACKING_PARAM_PATTERN})=[^&]*", ""
        )
        query = F.regexp_replace(led, "^&", "")
    if sort_query:
        query = F.when(query == "", query).otherwise(
            F.array_join(F.sort_array(F.split(query, "&")), "&")
        )
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )

    canonical = F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
    return F.when(has_scheme, canonical).otherwise(u)


def canonicalize_url_py(
    s: str,
    *,
    strip_www: bool = True,
    strip_tracking: bool = True,
    sort_query: bool = True,
) -> str:
    """Independent pure-Python reference (test oracle for the column
    expression) — stdlib string/`re` ops, no Spark."""
    import re

    s = s.strip().split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", s)
    if not m:
        return s
    scheme = m.group(1).lower()
    rest = s[m.end():]

    cut = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    authority, path_q = rest[:cut].lower(), rest[cut:]

    port = ""
    host = authority
    pm = re.search(r":([0-9]+)$", authority)
    if pm:
        port, host = pm.group(1), authority[: pm.start()]
    host = host[:-1] if host.endswith(".") else host
    if strip_www and host.startswith("www."):
        host = host[4:]
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""

    qi = path_q.find("?")
    path, query = (path_q, "") if qi == -1 else (path_q[:qi], path_q[qi + 1:])
    path = re.sub("/{2,}", "/", path).rstrip("/") or "/"

    if strip_tracking:
        led = re.sub(f"&({TRACKING_PARAM_PATTERN})=[^&]*", "", "&" + query)
        query = led[1:] if led.startswith("&") else led
    if sort_query and query:
        query = "&".join(sorted(query.split("&")))

    out = scheme + "://" + host
    if port:
        out += ":" + port
    out += path
    if query:
        out += "?" + query
    return out


def keep_latest_per_canonical(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    **canon_kwargs,
) -> DataFrame:
    """Keep ONE capture per canonical url: the latest ``ts_col``, ties
    broken by the bytewise-greatest original url (fully deterministic at
    any parallelism).  One ``max_by`` aggregation on the canonical key —
    map-side partial combine, a single metadata-sized shuffle (the doc
    payload columns are carried in the struct, never joined back).
    """
    canon = canonicalize_url(F.col(url_col), **canon_kwargs)
    payload = F.struct(
        F.col(ts_col).alias("_ts"),
        F.col(url_col).alias("_url"),
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
    )
    kept = (
        df.groupBy(canon.alias("canonical_url"))
        .agg(F.max(payload).alias("_best"))
        .select("canonical_url", F.col("_best._row.*"))
    )
    return kept
