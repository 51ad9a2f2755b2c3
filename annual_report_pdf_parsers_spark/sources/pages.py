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


def write_csv_contract(df: DataFrame, path: str) -> None:
    """S8 with the reference's EXACT serialization (aviva/parser.py:691-695
    ``result.to_csv(out, index=False, encoding='utf-8')``): each partition
    is rendered by pandas.to_csv inside an Arrow batch — float repr is
    Python's shortest round-trip, quoting is pandas' — so the bytes match
    what the reference emits (Spark's native CSV writer would differ: Java
    Double.toString switches to scientific notation at 1e7).

    Distributed: one part file per partition, no driver collect.  The
    header is written once as ``_header.csv``; ``read_csv_contract``
    reassembles.  At 100 TB this sink shape (text parts + a tiny header
    artifact) is the same as any Spark text sink.

    Newline safety: the rendered buffer is split ONLY on the explicit
    ``lineterminator`` ("\\n"), never ``splitlines()`` — splitlines also
    breaks on \\u2028/\\u2029/\\f/\\x85, silently splitting a record whose
    string field contains one of those (manifest-sourced fields like
    fund_name_website never pass through the F18 whitespace collapse).  A
    field containing a real "\\n" is quoted by to_csv across two physical
    pieces; emitting the pieces as consecutive text rows reassembles to
    the byte-identical file (Spark's text sink joins rows with "\\n")."""
    import io

    import pandas as pd

    from ..config import OUTPUT_COLUMNS

    cols = list(OUTPUT_COLUMNS)

    def fmt(it):
        for pdf in it:
            buf = io.StringIO()
            pdf[cols].to_csv(
                buf, index=False, header=False, lineterminator="\n"
            )
            pieces = buf.getvalue().split("\n")
            if pieces and pieces[-1] == "":
                pieces.pop()  # to_csv terminates the last record too
            yield pd.DataFrame({"line": pieces})

    df.mapInPandas(fmt, "line string").write.mode("overwrite").text(
        os.path.join(path, "data")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(",".join(cols),)], "line string"
    ).coalesce(1).write.mode("overwrite").text(os.path.join(path, "header"))


def read_csv_contract(spark: SparkSession, path: str):
    """Read back a write_csv_contract sink as raw CSV lines (header first).
    Returns (header_line, data_lines DataFrame)."""
    header = spark.read.text(os.path.join(path, "header")).first()[0]
    return header, spark.read.text(os.path.join(path, "data"))


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

    Crash-safety contract (parquet stand-in for an Iceberg transaction):
      1. holdings land in a PER-RUN directory (holdings/run_id=<id>/);
      2. lineage is the commit point.  A crash before it leaves an orphan
         run directory whose urls are absent from lineage: the next run
         reprocesses them (pending_pages) and ``read_holdings`` keeps
         only rows whose (url, run_id) is lineage-committed, so the
         orphan can never surface as duplicate output.
      3. metrics are written AFTER the commit, computed FROM the written
         files (the plan executes exactly once).  Writing them before the
         commit would leave orphan metrics rows for a run lineage says
         never happened — the re-run would then double-count them.  A
         crash between commit and metrics loses at most one run's metrics
         rows, which are recomputable from the committed holdings;
         ``read_metrics`` additionally filters to committed run_ids as
         defense in depth.
    """
    res_path = os.path.join(out_dir, "holdings", f"run_id={run_id}")
    lin_path = os.path.join(out_dir, "lineage")
    met_path = os.path.join(out_dir, "metrics")

    result.write.mode("overwrite").parquet(res_path)

    # the commit point: only now do the urls count as processed
    lineage = pages.select("url").distinct().withColumn(
        "run_id", F.lit(run_id)
    )
    lineage.write.mode("append").parquet(lin_path)

    spark = pages.sparkSession
    written = spark.read.parquet(res_path)
    metrics = (
        written.groupBy("fund_provider")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("pdf_url").alias("n_docs"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    metrics.write.mode("append").parquet(met_path)
    n_docs = (
        spark.read.parquet(lin_path)
        .filter(F.col("run_id") == run_id)
        .count()
    )
    return {"docs": n_docs}


def read_holdings(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed holdings only: a row is visible iff its (url, run_id) is
    present in lineage, latest run winning per url — orphan per-run
    directories from crashed runs are filtered out, and a url defensively
    reprocessed by two committed runs appears once.

    Scale: the lineage table grows WITH the corpus (one row per committed
    url), so — exactly like the manifest in join_manifest — a driver-built
    broadcast of it would OOM/serialize at 10^12 urls.  The semi-join is
    hinted shuffle_hash instead: both sides shuffle on url (holdings are
    hash(url)-clustered on disk, bucket(url) under Iceberg, so only the
    lineage side moves) and the hash build is parallel per-partition.
    tests/test_plan_properties.py::test_read_holdings_no_lineage_broadcast
    pins the no-BroadcastExchange shape."""
    hold = spark.read.parquet(os.path.join(out_dir, "holdings"))
    lin = spark.read.parquet(os.path.join(out_dir, "lineage"))
    latest = lin.groupBy("url").agg(F.max("run_id").alias("_run"))
    return hold.join(
        latest.hint("shuffle_hash"),
        (hold["pdf_url"] == latest["url"])
        & (hold["run_id"].cast("string") == latest["_run"].cast("string")),
        "left_semi",
    )


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Metrics restricted to lineage-committed run_ids — orphan metrics
    rows from a run that crashed between the metrics append and the
    lineage commit (impossible under the current write order, possible
    for tables written by older engine versions) are filtered out, so
    re-running those urls can never double-count."""
    met = spark.read.parquet(os.path.join(out_dir, "metrics"))
    committed = (
        spark.read.parquet(os.path.join(out_dir, "lineage"))
        .select("run_id")
        .distinct()
    )
    return met.join(committed.hint("shuffle_hash"), "run_id", "left_semi")


def pending_pages(
    spark: SparkSession, pages: DataFrame, out_dir: str
) -> DataFrame:
    """Resume: drop urls already committed to lineage (the distributed
    version of the reference's pdf_names.csv skip, README.md:121).
    Only a MISSING lineage table means 'first run, process everything';
    any other read error propagates (a transient failure must not
    silently trigger full reprocessing)."""
    from pyspark.errors import AnalysisException

    lin_path = os.path.join(out_dir, "lineage")
    # scheme-agnostic existence probe (local/HDFS/S3A): avoids Spark
    # logging a scary-but-expected AnalysisException on every first run
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(lin_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return pages
    try:
        done = spark.read.parquet(lin_path).select("url").distinct()
    except AnalysisException:  # backstop: dir exists but no parquet yet
        return pages
    return pages.join(done, "url", "left_anti")
