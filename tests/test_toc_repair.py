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


def test_w5_consecutive_unnumbered_lines_match_reference(spark):
    """tobam:91-94 grafts the successor's last token UNCONDITIONALLY — two
    consecutive unnumbered lines become 'LINE1 <lastTokOfLine2>' and LINE2
    is consumed, even though the grafted token is not numeric."""
    rows = [
        ("u1", 0, "FUND ALPHA"),          # no page number
        ("u1", 1, "FUND BETA"),           # also no page number -> consumed
        ("u1", 2, "FUND GAMMA 25"),
        ("u1", 3, "FUND OMEGA"),          # last line, no successor
    ]
    df = spark.createDataFrame(rows, "url string, entry_idx int, line string")
    got = {
        (r.url, r.entry_idx): r.line
        for r in repair_toc_lines(df).collect()
    }
    assert got == {
        ("u1", 0): "FUND ALPHA BETA",     # unconditional graft of 'BETA'
        ("u1", 2): "FUND GAMMA 25",
        ("u1", 3): "FUND OMEGA",          # unrepairable tail, left as-is
    }
