"""Pages-table IO: scans, sinks, lineage/metrics, resumable runs.

North-rule requirements (BASELINE.json): Iceberg table of CC-style pages
with explicit bucket-by-url partitioning; extracted text plus per-partition
lineage + metrics tables; failed runs resume from the last committed
snapshot checkpoint.

This container has no Iceberg runtime jars, so the implementation is
format-pluggable: `iceberg` when the session has a catalog configured
(`write_iceberg_ddl` emits the production DDL), parquet otherwise — the
resume logic (anti-join of pending urls against committed lineage) is
format-independent and is what the reference's ``pdf_names.csv`` manifest
re-run skip maps to (reference README.md:121; aviva/parser.py:578-583).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

N_URL_BUCKETS = 1024  # production DDL bucket count


def iceberg_pages_ddl(table: str = "warehouse.cc.pages") -> str:
    """Production DDL for the 10^12-row snapshot: bucket-by-url keeps one
    document's rows co-located and makes the extract stage's shuffle-free
    url-partitioned reads possible."""
    return (
        f"CREATE TABLE {table} (\n"
        "  url STRING, warc_ts TIMESTAMP, html BINARY,\n"
        "  text STRING, lang STRING)\n"
        f"USING iceberg PARTITIONED BY (bucket({N_URL_BUCKETS}, url))"
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table (parquet dir or Iceberg table name)."""
    if "/" not in path and "." in path:
        return spark.read.table(path)
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def write_pages(df: DataFrame, path: str, n_buckets: int = 8) -> None:
    """Write a pages table; hash-cluster by url so downstream per-url work
    reads co-located rows (the parquet stand-in for bucket(url))."""
    df.repartition(n_buckets, "url").write.mode("overwrite").parquet(path)


def salt_hot_hosts(
    df: DataFrame, n_partitions: int, salt: int = 8
) -> DataFrame:
    """Skew mitigation before the extract stage (SURVEY.md §4): hot hosts
    (many docs per host in CC crawls) spread over ``salt`` sub-keys.
    AQE splits skewed JOIN partitions but not skewed UDF stages — this
    repartition is the explicit fix."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return df.repartition(
        n_partitions, host, F.pmod(F.xxhash64("url"), F.lit(salt))
    )


# ---------------------------------------------------------------------------
# lineage / metrics / resume
# ---------------------------------------------------------------------------


def run_with_lineage(
    pages: DataFrame,
    result: DataFrame,
    out_dir: str,
    run_id: str,
) -> dict[str, int]:
    """Write results + per-partition lineage + metrics tables.

    lineage:  one row per processed url (url, run_id) — the committed
              checkpoint future runs anti-join against.
    metrics:  per (doc_class-ish) partition row counts — the reference's
              'Total - N' prints (aviva/parser.py:697) as a table.
    """
    res_path = os.path.join(out_dir, "holdings")
    lin_path = os.path.join(out_dir, "lineage")
    met_path = os.path.join(out_dir, "metrics")

    result.write.mode("append").parquet(res_path)

    lineage = pages.select("url").distinct().withColumn(
        "run_id", F.lit(run_id)
    )
    lineage.write.mode("append").parquet(lin_path)

    metrics = (
        result.groupBy("fund_provider")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("pdf_url").alias("n_docs"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    metrics.write.mode("append").parquet(met_path)
    n_docs = lineage.count()
    return {"docs": n_docs}


def pending_pages(
    spark: SparkSession, pages: DataFrame, out_dir: str
) -> DataFrame:
    """Resume: drop urls already committed to lineage (the distributed
    version of the reference's pdf_names.csv skip, README.md:121)."""
    lin_path = os.path.join(out_dir, "lineage")
    try:
        done = spark.read.parquet(lin_path).select("url").distinct()
    except Exception:
        return pages
    return pages.join(done, "url", "left_anti")
