"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship extraction pipeline (sf0.001-scaled corpus)
queries()     -> SURVEY.md §2 operators + training-data ops over testdata
oracle_sql()  -> exact DuckDB equivalents (see
                 annual_report_pdf_parsers_spark/queries.py for the
                 determinism engineering notes)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from annual_report_pdf_parsers_spark.queries import QUERIES, oracle_sql_dict

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dispatch + Arrow-batch extraction + cleanup pipeline.

    Loads sf0.001 documents to size the synthetic pages corpus (the pages
    table itself is generated deterministically — FIXTURES.md §1: the
    driver testdata has no (url, warc_ts, html, text, lang) table).
    """
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline
    from annual_report_pdf_parsers_spark.sources.synthetic import (
        make_corpus,
        manifest_to_spark,
        pages_to_spark,
    )

    n_docs = min(
        spark.read.parquet(f"{SF0001}/documents.parquet").count(), 120
    )
    pages_pdf, manifest_pdf, _ = make_corpus(n_docs, seed=42)
    return run_pipeline(
        pages_to_spark(spark, pages_pdf),
        manifest_to_spark(spark, manifest_pdf),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracle_sql_dict()
