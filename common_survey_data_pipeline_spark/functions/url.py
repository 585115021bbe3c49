"""URL canonicalization for web-corpus ETL — the normalize-before-
anything step of a crawl pipeline (dedup by canonical URL, host-level
quality rollups, robots/politeness grouping all key on its output).

Rules (the common-crawl-style canonical form):

* scheme and host lowercased;
* a leading ``www.`` stripped from the host;
* default ports dropped (``:80`` for http, ``:443`` for https), any
  other explicit port kept;
* the fragment dropped;
* tracking query parameters removed (``utm_*``, ``gclid``, ``fbclid``),
  remaining parameters kept in their original order; a query left empty
  loses its ``?``;
* the path kept verbatim (paths are case-sensitive).

Everything is built on ``F.parse_url`` + JVM regex/HOF expressions —
whole-stage codegen, no UDFs, so canonicalization is a free map over a
100 TB crawl. ``try_parse_url`` returns NULL for unparseable input, which
propagates to a NULL canonical URL — the filter-them-out contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_parts", "canonicalize_url", "url_host"]

# (?i): trackers arrive in the wild as UTM_Source=/Gclid= too — match
# case-insensitively (the inline flag is shared Java-regex/RE2 syntax,
# so the DuckDB oracle twin in workload.py uses the same pattern).
_TRACKING_RE = "(?i)^(utm_[a-z]+|gclid|fbclid)="


def _part(url: Column, what: str) -> Column:
    # try_parse_url: NULL on unparseable input (plain parse_url RAISES
    # in Spark 4 — a single bad row must not kill a 100 TB crawl job)
    return F.try_parse_url(url, F.lit(what))


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, leading ``www.`` stripped."""
    return F.regexp_replace(F.lower(_part(url, "HOST")), r"^www\.", "")


def _kept_query(url: Column) -> Column:
    """Query string minus tracking params, original order, NULL-safe:
    no query → empty string (so concat never NULLs the whole URL)."""
    q = F.coalesce(_part(url, "QUERY"), F.lit(""))
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    return F.array_join(kept, "&")


def _canon_port(url: Column) -> Column:
    """``:port`` suffix for NON-default ports, else empty string."""
    scheme = F.lower(_part(url, "PROTOCOL"))
    auth = _part(url, "AUTHORITY")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    )
    return F.when(
        (port == "") | port.eqNullSafe(default), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))


def url_parts(url: Column) -> dict[str, Column]:
    """The canonical pieces, exposed for rollups that group on them."""
    return {
        "scheme": F.lower(_part(url, "PROTOCOL")),
        "host": url_host(url),
        "port": _canon_port(url),
        "path": F.coalesce(_part(url, "PATH"), F.lit("")),
        "query": _kept_query(url),
    }


def canonicalize_url(url: Column) -> Column:
    """The full canonical URL string (NULL when the input is not a
    parseable absolute URL)."""
    p = url_parts(url)
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        p["port"],
        p["path"],
        F.when(p["query"] == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), p["query"])
        ),
    )
