"""End-to-end fixture test: byte-identical output per url (SURVEY.md §5).

The synthetic generator renders page grids from known holdings and computes
the expected 9-column table with a pure-Python oracle.  The Spark pipeline
must reproduce it byte-identically: every row serialized (floats via Python
repr — both sides parse the same decimal strings into the same IEEE754
doubles) and compared per url.
"""

import pandas as pd
import pytest

from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline
from annual_report_pdf_parsers_spark.sources.synthetic import (
    make_corpus,
    manifest_to_spark,
    pages_to_spark,
)


def serialize(df: pd.DataFrame) -> list[str]:
    def fmt(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return ""
        if isinstance(v, float):
            return repr(v)
        return str(v)

    cols = [
        "fund_provider",
        "fund_name_report",
        "fund_name_website",
        "isin",
        "holding_name",
        "market_value",
        "currency",
        "net_assets",
        "pdf_url",
    ]
    rows = ["\x1f".join(fmt(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


@pytest.mark.parametrize("n_docs,seed", [(36, 42), (24, 7), (50, 99)])
def test_byte_identical(spark, n_docs, seed):
    pages_pdf, manifest_pdf, expected = make_corpus(n_docs, seed=seed)
    pages = pages_to_spark(spark, pages_pdf)
    manifest = manifest_to_spark(spark, manifest_pdf)

    result = run_pipeline(pages, manifest).toPandas()
    # make NaN handling uniform
    result = result.where(pd.notna(result), None)
    expected = expected.where(pd.notna(expected), None)

    got, want = serialize(result), serialize(expected)
    # per-url diff for a readable failure
    if got != want:
        gs, ws = set(got), set(want)
        missing = sorted(ws - gs)[:10]
        extra = sorted(gs - ws)[:10]
        raise AssertionError(
            f"rows: got {len(got)} want {len(want)}\n"
            f"MISSING ({len(ws - gs)}):\n" + "\n".join(missing) + "\n"
            f"EXTRA ({len(gs - ws)}):\n" + "\n".join(extra)
        )
    assert got == want


def test_net_assets_invariant(spark):
    """Reference runtime invariant: per-fund net_assets sums ~ 100
    (dpam/parser.py:219; crelan retry guard :132)."""
    pages_pdf, manifest_pdf, expected = make_corpus(18, seed=3)
    pages = pages_to_spark(spark, pages_pdf)
    manifest = manifest_to_spark(spark, manifest_pdf)
    res = run_pipeline(pages, manifest).toPandas()
    assert len(res) > 0
    sums = res.groupby(["pdf_url", "fund_name_report"])["net_assets"].sum()
    # synthetic weights are random, not normalized to 100: just sanity-check
    # the column is populated and no fund-total (==100.0) rows leaked through
    assert (res["net_assets"] != 100.0).all()
    assert sums.notna().all()
