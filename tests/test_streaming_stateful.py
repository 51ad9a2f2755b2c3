"""Cross-run stateful streaming dedup: state must survive via checkpoint."""

import datetime
import os

import pandas as pd

from annual_report_pdf_parsers_spark.streaming.stateful_dedup import (
    run_streaming_dedup,
)


def _pages(rows):
    return pd.DataFrame(
        [
            {
                "url": u,
                "warc_ts": datetime.datetime(2025, 1, 1),
                "html": t.encode(),
                "text": t,
                "lang": "en",
            }
            for u, t in rows
        ]
    )


def test_stateful_dedup_across_runs(spark, tmp_path):
    pages_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pages_dir)

    # run 1: two unique docs + one in-batch duplicate
    _pages(
        [
            ("u1", "alpha beta gamma"),
            ("u2", "delta epsilon zeta"),
            ("u3", "alpha beta gamma"),  # dup of u1, same batch
        ]
    ).to_parquet(
        os.path.join(pages_dir, "b1.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    q = run_streaming_dedup(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out).toPandas()
    assert sorted(got1.url) == ["u1", "u2"]

    # run 2 (fresh query, same checkpoint): duplicates of run 1 plus one new
    _pages(
        [
            ("u4", "alpha beta gamma"),   # dup of u1, PREVIOUS run
            ("u5", "eta theta iota"),     # new
        ]
    ).to_parquet(
        os.path.join(pages_dir, "b2.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    q2 = run_streaming_dedup(spark, pages_dir, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out).toPandas()
    assert sorted(got2.url) == ["u1", "u2", "u5"], sorted(got2.url)
