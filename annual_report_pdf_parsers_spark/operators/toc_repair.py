"""W5: ToC line repair (SURVEY.md §2.5, tobam/parser.py:88-94).

A ToC entry whose line lacks a trailing page number grafts the NEXT
line's last whitespace token onto itself (UNCONDITIONALLY — even when
that token is not numeric); the consumed next line is replaced by "0"
and filtered out afterwards.

The "0" replacement matters: a consumed line's effective content HAS a
trailing digit, so it never consumes ITS successor — within a run of
consecutive unnumbered lines, consumption ALTERNATES (L0 grafts+consumes
L1, L2 grafts+consumes L3, ...), it does not cascade.  The closed form:
row i is consumed iff the streak of consecutive unnumbered (original)
lines immediately before it has ODD length.

Spark formulation: row_number + a bounded max-window locating the last
numbered predecessor gives the streak length; lead() supplies the graft
token — all within per-url windows (no cross-document state).

Deviation from the reference (documented): tobam raises IndexError when
the LAST line lacks a page number (it indexes contents[i+1]); we leave
that line unrepaired — downstream numeric parsing drops it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# last whitespace-separated token is all digits (the reference checks
# ``line.split()[-1].isdigit()``)
_TRAILING_NUM = r"(^|\s)([0-9]+)\s*$"


def repair_toc_lines(
    toc: DataFrame,
    line_col: str = "line",
    part_cols: tuple[str, ...] = ("url",),
    order_cols: tuple[str, ...] = ("entry_idx",),
) -> DataFrame:
    """Repair ToC entries with a missing trailing page number.

    Input: one row per ToC line.  Output: repaired lines, consumed
    successors removed (tobam/parser.py:88-94 semantics, see module doc).
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    has_pg = F.col(line_col).rlike(_TRAILING_NUM)
    rn = F.row_number().over(w)
    # streak of consecutive unnumbered lines immediately before this row
    last_pg_rn = F.max(F.when(has_pg, rn)).over(w_prev)
    streak = (rn - 1) - F.coalesce(last_pg_rn, F.lit(0))
    consumed = streak % 2 == 1
    next_line = F.lead(line_col).over(w)
    next_tok = F.regexp_extract(next_line, r"(\S+)\s*$", 1)
    grafts = ~consumed & ~has_pg & next_line.isNotNull()
    repaired = F.when(
        grafts, F.concat(F.col(line_col), F.lit(" "), next_tok)
    ).otherwise(F.col(line_col))
    return (
        toc.withColumn("_consumed", consumed)
        .withColumn(line_col, repaired)
        .filter(~F.col("_consumed"))
        .drop("_consumed")
    )
