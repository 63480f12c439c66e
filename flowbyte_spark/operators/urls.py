"""URL canonicalization + canonical-URL dedup — the first dedup any web
crawl pipeline runs (the same page is fetched as http/https, with and
without ``www.``, default ports, fragments, tracking params and query
orderings; CommonCrawl-style corpora dedup on the canonical form before
any content hashing).

Pure Catalyst — one regex parse plus array ops per row, no UDF, no
shuffle until the final keep-first aggregation on the canonical key.

Canonical form (deterministic, documented so the DuckDB oracle can
recompute it exactly):

1. scheme and host lowercased;
2. a leading ``www.`` stripped from the host;
3. default ports removed (``:80`` for http, ``:443`` for https);
4. the fragment dropped;
5. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``);
6. remaining query params sorted lexicographically (full ``k=v``
   strings);
7. trailing slashes stripped from the path; an empty path becomes
   ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one parse, five groups: scheme, authority, path, ?query, #fragment
URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"

TRACKING_RE = "^(utm_|fbclid=|gclid=)"


def canonical_url(url: Column) -> Column:
    """Canonicalize a URL column per the module contract; returns NULL
    when the string does not parse as ``scheme://authority...``."""
    scheme = F.lower(F.regexp_extract(url, URL_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, URL_RE, 2)), r"^www\.", ""
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(url, URL_RE, 3), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_replace(F.regexp_extract(url, URL_RE, 4), r"^\?", "")
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    query = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon)  # NULL for unparseable input


def dedup_by_canonical_url(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Keep-first dedup on the canonical URL: one row per canonical form
    with the smallest ``id_col`` as keeper plus the duplicate count.
    Unparseable URLs (NULL canonical) are dropped — a crawl pipeline
    quarantines those rather than treating every broken string as
    unique.  One hash shuffle on the canonical key; map-side partial
    aggregation applies (min/count)."""
    return (
        df.select(
            F.col(id_col).alias("__id__"),
            canonical_url(F.col(url_col)).alias("canonical_url"),
        )
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min("__id__").alias("keeper_id"),
            F.count("*").cast("long").alias("n_fetches"),
        )
    )
