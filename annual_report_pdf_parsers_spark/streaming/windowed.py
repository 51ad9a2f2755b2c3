"""Event-time windowed aggregation with watermarking.

The reference is batch-only (SURVEY.md §2.10), but the engine ships the
standard Structured Streaming shape for metric feeds (e.g. per-provider
extraction-rate monitoring over the lineage stream):

    events -> withWatermark(event-time, delay) -> window(N minutes)
           -> count/sum per key -> append sink

Late rows beyond the watermark are dropped by Spark's state cleanup; the
window state is bounded by (delay + window) per key — the property that
makes this safe on an unbounded 10^12-event feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sums per key, watermarked.

    Accepts TIMESTAMP or TIMESTAMP_NTZ event time: Spark's watermark
    only supports TIMESTAMP, so NTZ inputs are cast at the stream edge
    and the window bounds cast back — value-preserving for any fixed
    session timezone (tz offsets are 15-minute multiples, so 5-minute
    epoch-aligned buckets shift consistently and the round-trip cast
    restores the naive values exactly)."""
    ntz = dict(events_stream.dtypes).get(ts_col) == "timestamp_ntz"
    ts = F.col(ts_col).cast("timestamp") if ntz else F.col(ts_col)
    out_t = "timestamp_ntz" if ntz else "timestamp"
    return (
        events_stream.withColumn("_evt", ts)
        .withWatermark("_evt", watermark)
        .groupBy(
            F.window(F.col("_evt"), window_len).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").cast(out_t).alias("win_start"),
            F.col("win.end").cast(out_t).alias("win_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts(
    spark, events_dir: str, out_dir: str, checkpoint_dir: str, schema
):
    """AvailableNow file-stream wrapper for the windowed aggregation."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
