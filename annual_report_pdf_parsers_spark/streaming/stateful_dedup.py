"""Custom stateful streaming operator: cross-batch exact dedup.

The training-data use case: a continuously-landing document feed where
only first occurrences should flow downstream (re-crawls, mirror copies).
Batch exact-dedup (operators/dedup.py) can't help across triggers — this
is the ``applyInPandasWithState`` formulation:

  - key: a 2-hex-char shard of the content digest (256 groups => state
    and work spread evenly; the digest itself would make one state row
    per document, the shard keeps GroupState rows bounded and lets one
    state object absorb many digests);
  - state: the set of digests seen so far in this shard;
  - output: rows whose digest is new, emitted with the digest attached.

State survives restarts via the streaming checkpoint, so a re-run after
failure continues deduplicating against everything already committed —
the same resume story as the lineage table, but for unbounded input.

Scale: state per shard is a python set of 16-byte digests; at 10^12 docs
this is too big for executor memory — production would switch the state
payload to a Bloom filter (same operator shape, accepted false-positive
rate) or RocksDB state store; the operator contract stays identical.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("digest", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()))]
)


def _dedup_shard(
    key: Any,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    for pdf in batches:
        fresh_mask = ~pdf["digest"].isin(seen) & ~pdf["digest"].duplicated()
        fresh = pdf[fresh_mask]
        seen.update(fresh["digest"])
        if not fresh.empty:
            yield fresh[["url", "text", "lang", "digest"]]
    state.update((sorted(seen),))


def streaming_exact_dedup(pages_stream: DataFrame) -> DataFrame:
    """readStream pages -> first-occurrence rows (url, text, lang, digest)."""
    keyed = pages_stream.select(
        "url", "text", "lang", F.md5("text").alias("digest")
    ).withColumn("shard", F.substring("digest", 1, 2))
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_shard,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark, pages_dir: str, out_dir: str, checkpoint_dir: str
):
    """AvailableNow wrapper: drain the directory, keep state in the
    checkpoint so the next invocation dedups against prior runs."""
    from ..sources.pages import PAGES_SCHEMA

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )
    deduped = streaming_exact_dedup(stream)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
