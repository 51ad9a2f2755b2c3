"""URL canonicalization — the cheap pre-content dedup key for CC-style
corpora (training-data pipeline op: url-level dedup runs BEFORE the
content dedups in operators/dedup.py because it needs no text at all).

Pure JVM expressions (parse_url + regexp), no Python:
  - scheme and host lowercased, leading ``www.`` stripped;
  - fragment dropped (parse_url PATH/QUERY already exclude it);
  - tracking query params removed (utm_*, fbclid, gclid, ref) while
    meaningful params survive in their original order;
  - trailing path slashes stripped.
Ports are dropped with the host normalization (documented trade-off:
non-default ports are rare in crawl data and usually mirror :443/:80).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|ref)="


def canonicalize_url(url: Column) -> Column:
    proto = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id"):
    """Exact dedup on the canonical url: one shuffle on the canonical key,
    map-side partial agg — the url-level twin of dedup.exact_dedup."""
    return (
        df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )
