"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Prints ONE JSON line:
  {"metric": "total_bench_seconds", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "docs_per_sec": {"local8": X, "local32": Y},
   "scaling_efficiency": (Y/X)/4, ...}

Two parts:
  1. Scaling evidence (north rule): the SAME extraction job on the SAME
     synthetic pages snapshot at local[8] and local[32]; report docs/sec
     at both and efficiency = (tput_32 / tput_8) / 4 (target >= 0.8).
     Sandbox stand-in for N -> 4N executors (BASELINE.md row 'Sandbox
     scaling-evidence protocol').
  2. Headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
     local[$SPARK_GRAFT_CPUS]; forced materialization via the noop sink.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_DOCS (scaling
corpus size), BENCH_SKIP_SCALING=1 for a quick headline-only run.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "1200"))

HEADLINE = [
    "a2_group_agg",
    "j1_broadcast_join",
    "j2_interval_join",
    "w1_ffill",
    "w3_block_fusion",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_quality",
    "text_fingerprint",
]


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_extraction(master: str, pages_path: str, manifest_path: str) -> float:
    """One full extraction run; returns wall seconds (session excluded)."""
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline
    from annual_report_pdf_parsers_spark.session import get_spark, stop_all
    from annual_report_pdf_parsers_spark.sources.pages import salt_hot_hosts

    cores = int(master[6:-1])
    spark = get_spark(f"bench-{master}", master=master,
                      shuffle_partitions=2 * cores)
    try:
        spark.range(10).count()  # JVM/codegen warmup
        pages = spark.read.parquet(pages_path)
        manifest = spark.read.parquet(manifest_path)
        # skew-aware spread BEFORE the Arrow stage: hot host salted
        pages = salt_hot_hosts(pages, n_partitions=4 * cores, salt=8)
        t0 = time.time()
        materialize(run_pipeline(pages, manifest))
        return time.time() - t0
    finally:
        stop_all()


def main() -> None:
    t_all = time.time()
    results: dict = {"sf": SF_DIR, "queries": {}}

    # ---- corpus for the scaling runs (written once, read by both) ----
    from annual_report_pdf_parsers_spark.sources.synthetic import make_corpus

    tmp = tempfile.mkdtemp(prefix="bench_pages_")
    pages_pdf, manifest_pdf, expected = make_corpus(N_DOCS, seed=42)
    pages_path = os.path.join(tmp, "pages.parquet")
    manifest_path = os.path.join(tmp, "manifest.parquet")
    # Spark cannot read pandas' default nanosecond parquet timestamps
    pages_pdf.to_parquet(
        pages_path, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    manifest_pdf.to_parquet(manifest_path)

    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        t8 = run_extraction("local[8]", pages_path, manifest_path)
        t32 = run_extraction("local[32]", pages_path, manifest_path)
        tput8, tput32 = N_DOCS / t8, N_DOCS / t32
        results["docs_per_sec"] = {
            "local8": round(tput8, 2),
            "local32": round(tput32, 2),
        }
        results["scaling_efficiency"] = round((tput32 / tput8) / 4, 3)
        results["queries"]["pipeline_local8"] = round(t8, 3)
        results["queries"]["pipeline_local32"] = round(t32, 3)

    # ---- headline queries at SF_DIR ----
    from annual_report_pdf_parsers_spark.queries import QUERIES
    from annual_report_pdf_parsers_spark.session import get_spark, stop_all

    spark = get_spark("bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    try:
        spark.range(10).count()
        for name in HEADLINE:
            t0 = time.time()
            materialize(QUERIES[name](spark, SF_DIR))
            results["queries"][name] = round(time.time() - t0, 3)
    finally:
        stop_all()

    results["metric"] = "total_bench_seconds"
    results["value"] = round(time.time() - t_all, 3)
    results["unit"] = "sec"
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
