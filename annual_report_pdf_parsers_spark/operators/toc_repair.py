"""W5: ToC line repair (SURVEY.md §2.5, tobam/parser.py:88-94).

A ToC entry whose line lacks a trailing page number grafts the NEXT
line's trailing number onto itself; the consumed next line is removed.
Reference semantics (tobam): the next line is replaced by "0" and
filtered out afterwards — i.e. the repaired entry absorbs its successor
entirely.

Spark formulation: lead() for the next line's number + an anti-filter on
rows consumed by their predecessor, all within per-url windows (no
cross-document state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# last whitespace-separated token is all digits (the reference checks
# ``line.split()[-1].isdigit()``)
_TRAILING_NUM = r"(^|\s)([0-9]+)\s*$"
_NUM_GROUP = 2


def repair_toc_lines(
    toc: DataFrame,
    line_col: str = "line",
    part_cols: tuple[str, ...] = ("url",),
    order_cols: tuple[str, ...] = ("entry_idx",),
) -> DataFrame:
    """Repair ToC entries with a missing trailing page number.

    Input: one row per ToC line.  Output: repaired lines, consumed
    successors removed.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    has_pg = F.col(line_col).rlike(_TRAILING_NUM)
    next_line = F.lead(line_col).over(w)
    prev_had_pg = F.lag(has_pg).over(w)
    next_pg = F.regexp_extract(next_line, _TRAILING_NUM, _NUM_GROUP)
    repaired = F.when(
        ~has_pg & next_pg.isNotNull() & (next_pg != ""),
        F.concat(F.col(line_col), F.lit(" "), next_pg),
    ).otherwise(F.col(line_col))
    return (
        toc.withColumn("_prev_ok", F.coalesce(prev_had_pg, F.lit(True)))
        .withColumn(line_col, repaired)
        # a line whose predecessor lacked a page number was consumed by it
        # (the reference nulls it to "0" then filters, tobam:93-94)
        .filter(F.col("_prev_ok"))
        .drop("_prev_ok")
    )
