"""Production entry point: the extraction job for ``spark-submit``.

Ship:
    python package.py                        # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip submit.py \
        --pages  warehouse.cc.pages \
        --manifest /data/manifest.parquet \
        --out    /warehouse/extracted \
        --run-id run-2026-08-16

On a cluster, master/executors come from spark-submit / cluster conf —
this script only sets job-level SQL conf (AQE etc. via session.get_spark
defaults are applied when master is provided; under spark-submit we use
the provided session config as-is).

Resume semantics: re-running with the same --out continues from the
committed lineage (sources/pages.py::pending_pages).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet dir or Iceberg table name")
    ap.add_argument("--manifest", required=True,
                    help="manifest parquet (name, pdf_url, isin)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--run-id", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from annual_report_pdf_parsers_spark.sources.pages import read_pages
    from annual_report_pdf_parsers_spark.streaming.incremental import (
        incremental_run,
    )

    spark = SparkSession.builder.appName(
        f"annual-report-extract-{args.run_id}"
    ).getOrCreate()
    manifest = spark.read.parquet(args.manifest)
    pages = read_pages(spark, args.pages)
    metrics = incremental_run(
        spark, pages, manifest, args.out, run_id=args.run_id
    )
    print(f"processed docs: {metrics['docs']}")


if __name__ == "__main__":
    main()
