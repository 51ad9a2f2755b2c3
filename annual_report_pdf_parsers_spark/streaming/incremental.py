"""Incremental / resumable execution (SURVEY.md §2.10).

The reference is batch-only; its sole incremental behavior is the manifest
re-run skip (README.md:121).  Two Spark mappings:

  1. ``incremental_run``: batch resume — anti-join pending urls vs the
     committed lineage table (sources/pages.py), process, commit.  This is
     the primary north-rule semantics (Iceberg snapshot checkpoint).
  2. ``streaming_pipeline``: optional Structured Streaming sugar — a
     file-source stream over the pages directory with
     ``Trigger.AvailableNow`` + checkpointLocation, giving exactly-once
     resumable batches without custom bookkeeping.  The extraction
     pipeline is stateless per document, so foreachBatch reuses the exact
     batch plan (no watermarks needed — no cross-document state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.pages import pending_pages, run_with_lineage


def incremental_run(
    spark: SparkSession,
    pages: DataFrame,
    manifest: DataFrame,
    out_dir: str,
    run_id: str,
) -> dict[str, int]:
    """Process only not-yet-committed urls; commit results + lineage."""
    from ..plans.pipeline import run_pipeline

    todo = pending_pages(spark, pages, out_dir)
    result = run_pipeline(todo, manifest)
    return run_with_lineage(todo, result, out_dir, run_id)


def streaming_pipeline(
    spark: SparkSession,
    pages_dir: str,
    manifest: DataFrame,
    out_dir: str,
):
    """Structured Streaming wrapper: AvailableNow over the pages directory.

    Returns the started StreamingQuery; await with
    ``q.awaitTermination()``.  Restarting after failure resumes from the
    checkpoint (processed files are not re-read).
    """
    from ..plans.pipeline import run_pipeline
    from ..sources.pages import PAGES_SCHEMA

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        result = run_pipeline(batch_df, manifest)
        result.write.mode("append").parquet(os.path.join(out_dir, "holdings"))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
