from annual_report_pdf_parsers_spark.operators.toc_repair import (
    repair_toc_lines,
)


def test_w5_toc_repair(spark):
    rows = [
        ("u1", 0, "FUND ALPHA 12"),
        ("u1", 1, "FUND BETA"),          # missing page number
        ("u1", 2, "18"),                  # orphan number line -> consumed
        ("u1", 3, "FUND GAMMA 25"),
        ("u2", 0, "FUND DELTA 3"),
    ]
    df = spark.createDataFrame(rows, "url string, entry_idx int, line string")
    got = {
        (r.url, r.entry_idx): r.line
        for r in repair_toc_lines(df).collect()
    }
    assert got == {
        ("u1", 0): "FUND ALPHA 12",
        ("u1", 1): "FUND BETA 18",      # grafted from next line
        ("u1", 3): "FUND GAMMA 25",     # the "18" line was consumed
        ("u2", 0): "FUND DELTA 3",
    }
