"""SparkSession factory tuned for the extraction workload.

The settings mirror what we would ship to a real multi-executor cluster
(SURVEY.md §4): AQE on (shuffle coalescing + skew-join splitting), Arrow
enabled for the pandas-UDF extraction stage with a *small* max batch size
because each input row carries a whole document (html/text blobs can be
MBs — one 10 MB doc per Arrow record means a 10k-row default batch would
be 100 GB).  On local[N] the same knobs apply, only the master differs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of parallel worker threads for local mode; the driver's bench
# contract uses SPARK_GRAFT_CPUS (task brief).
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "annual_report_pdf_parsers_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` defaults to 2x the core count — small enough
    that sf0.1 partitions stay cache-friendly, large enough that AQE can
    coalesce down rather than splitting up.  On a 1000-executor cluster
    this is overridden (conf) to ~2-3x total cores; AQE's
    ``coalescePartitions`` makes the exact value forgiving.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    cores = DEFAULT_CPUS
    if master.startswith("local[") and master[6:-1].isdigit():
        cores = int(master[6:-1])
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- AQE: runtime re-planning (shuffle coalesce, skew split) ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(2 * cores, 8)),
        )
        # --- Arrow / pandas-UDF path (the extraction stage) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Batch sizing: the extract stage ships ONLY (url, text, lang) to
        # Python — html (the 10-100x bigger column) is pruned at the scan
        # and never crosses Arrow.  Batch-size sweep history: 256 -> 1024
        # measured 33% faster end-to-end (r1); 1024 -> 4096 measured a
        # further 17% at local[16] while local[4] was UNCHANGED (r4,
        # 100k-doc corpus: t16 6.84 -> 5.71 s, t4 19.6 s both) — the
        # per-batch overhead is a serial cost that binds only at high
        # parallelism, so the larger batch directly lifts the N -> 4N
        # scaling ratio.  8192 added nothing (5.66 s).  Memory bound:
        # 4096 rows x ~10-100 KB text = 40-400 MB per in-flight batch
        # per task; for corpora with multi-MB text columns pass a
        # smaller value via extra_conf.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # --- scan sizing: one partition ~ 64MB of parquet keeps the
        # extract stage's per-task memory bounded even with blob columns
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        # broadcast threshold: currencies/countries/manifests/ToCs are
        # all tiny vs the pages table; let Catalyst broadcast eagerly
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_all() -> None:
    """Stop the active session (used by the bench to switch local[N])."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # SparkContext lingers otherwise and pins the old master
    from pyspark import SparkContext

    if SparkContext._active_spark_context is not None:  # noqa: SLF001
        SparkContext._active_spark_context.stop()  # noqa: SLF001
