"""URL canonicalization + domain analytics (north-star extension).

A web-crawl training pipeline dedups and mixes by URL and by domain
before it ever looks at text: the same page is fetched under
``http``/``https``, with and without ``www``/default ports/trailing
slashes/tracking params. Canonicalizing first collapses those families
so exact dedup (X-DEDUP-EXACT) and per-domain mixing see one key per
logical page.

Everything here is a narrow Column expression (regex + string ops in
whole-stage codegen) — no UDF, no shuffle; the per-domain aggregations
downstream are single hash-shuffles on the domain key. Patterns are kept
to the regex subset Java (Spark) and RE2 (DuckDB oracle) evaluate
identically — no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host[:port]/path?query#fragment — the generic URI split
# (RFC 3986 appendix B, simplified to the subset crawlers meet)
_AFTER_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, NULL when the value is not scheme://-shaped."""
    s = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    return F.when(s != "", s)


def url_host(url: Column) -> Column:
    """Lowercased host without port / credentials; NULL for non-URLs."""
    rest = F.regexp_replace(url, _AFTER_SCHEME, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(hostport, r"^[^@]*@", ""), r":[0-9]*$", "")
    )
    return F.when(url_scheme(url).isNotNull() & (host != ""), host)


def url_path(url: Column) -> Column:
    """Path component ('' when absent); query/fragment stripped."""
    rest = F.regexp_replace(url, _AFTER_SCHEME, "")
    return F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)", 1)


def url_query(url: Column) -> Column:
    """Raw query string without '?' ('' when absent)."""
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def strip_tracking_params(query: Column) -> Column:
    """Drop ``utm_*`` / ``fbclid`` / ``gclid`` params, preserving order of
    the rest. Array filter, not regex surgery, so separators stay exact."""
    parts = F.split(query, "&")
    kept = F.filter(
        parts,
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid=")
        & ~p.startswith("gclid="),
    )
    return F.array_join(kept, "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form for URL-keyed dedup:

    - scheme + host lowercased; ``www.`` prefix dropped
    - default ports (``:80``/``:443``) removed, others kept
    - trailing ``/`` stripped from non-root paths; empty path -> ``/``
    - tracking params removed; empty query -> no ``?``
    - fragment always dropped (client-side only)

    NULL for values that aren't scheme://-shaped (the caller decides
    whether to keep or quarantine those rows).
    """
    scheme = url_scheme(url)
    rest = F.regexp_replace(url, _AFTER_SCHEME, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host_nocred = F.regexp_replace(hostport, r"^[^@]*@", "")
    port = F.regexp_extract(host_nocred, r":([0-9]+)$", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(host_nocred, r":[0-9]*$", "")), r"^www\.", ""
    )
    keep_port = (port != "") & (port != "80") & (port != "443")
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)
    )
    q = strip_tracking_params(url_query(url))
    return F.when(
        scheme.isNotNull() & (host != ""),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of the host (``a.b.example.com`` ->
    ``example.com``) — the per-site aggregation key. Deliberately the
    naive approximation: the real public-suffix list is a data file the
    caller broadcasts and joins when exactness under ccTLDs matters
    (``co.uk``); the engine keeps the pure-expression tier dependency-free.
    """
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
