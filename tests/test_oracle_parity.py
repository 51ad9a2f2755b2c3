"""Emulates the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on row count, schema width, and order-insensitive
values at sf0.01."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(rows, cols):
    """Order-insensitive canonical form, column order by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        return str(v)

    return sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)


ORACLES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    ores = ddb.sql(entry_mod.oracle_sql()[name])
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    )
    sc, oc = canon(srows, scols), canon(orows, ocols)
    if sc != oc:
        diffs = [
            (a, b) for a, b in zip(sc, oc) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    """Queries without oracles still must run and return a stable schema."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "fund_provider"


def test_registry_has_no_duplicate_keys():
    """A registry rotation is TWO edits (remove from the window +
    re-add below); a half-applied rotation either drops a key (caught
    by oracle-no-query) or duplicates it — and a duplicated dict key
    SILENTLY keeps only the last entry.  Scan the source literal."""
    import re

    src = open("annual_report_pdf_parsers_spark/queries.py").read()
    start = src.index("QUERIES: dict")
    end = src.index("}", src.index("d3_header_variant"))
    keys = re.findall(r'^    "([a-z0-9_]+)": q_', src[start:end], re.M)
    dups = sorted(k for k in set(keys) if keys.count(k) > 1)
    assert not dups, f"duplicate registry keys: {dups}"


def test_every_oracle_has_a_query():
    qs = set(entry_mod.queries())
    orphans = sorted(set(entry_mod.oracle_sql()) - qs)
    assert not orphans, f"oracles without queries: {orphans}"
