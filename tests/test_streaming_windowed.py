"""Watermarked windowed aggregation over a file stream of events."""

import os

import pandas as pd

from annual_report_pdf_parsers_spark.streaming.windowed import (
    run_windowed_counts,
)


def test_windowed_counts(spark, tmp_path):
    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(events_dir)
    rows = pd.DataFrame(
        {
            "event_id": range(8),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:02:00",
                    "2024-01-01 00:06:00",
                    "2024-01-01 00:07:00",
                    "2024-01-01 00:08:00",
                    "2024-01-01 00:12:00",
                    "2024-01-01 00:13:00",
                    "2024-01-01 00:30:00",  # advances the watermark so the
                ]                            # earlier windows can close
            ),
            "user_id": [1, 2, 1, 2, 3, 1, 2, 9],
            "event_type": ["click"] * 5 + ["view"] * 2 + ["click"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "props": ["{}"] * 8,
        }
    )
    rows.to_parquet(
        os.path.join(events_dir, "e1.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    q = run_windowed_counts(spark, events_dir, out, ckpt, schema)
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    # append mode emits only windows sealed by the watermark (00:30 event
    # - 10 min watermark = 00:20 => windows ending <= 00:20 are final)
    sealed = got.set_index(
        [got.win_start.astype(str), "event_type"]
    ).n_events.to_dict()
    assert sealed[("2024-01-01 00:00:00", "click")] == 2
    assert sealed[("2024-01-01 00:05:00", "click")] == 3
    assert sealed[("2024-01-01 00:10:00", "view")] == 2
