"""Numeric normalization expressions (SURVEY.md §2.8 F1-F8, F19).

Pure Spark SQL Column expressions — JVM-side, whole-stage-codegen friendly.
Each mirrors a cleanup idiom of the reference parsers:

  F1 FR decimal normalize   crelan/parser.py:129-131; oddo/parser.py:121-123
  F2 EN decimal normalize   scor/parser.py:190-192; pictet/parser.py:106-108
  F3 format inference       mirova/parser.py:213-218
  F4 parenthesized negative crelan/parser.py:804-819; roth/parser.py:34-49
  F5 en-dash minus          crelan/parser.py:130; bnp/parser.py:128
  F6 dash/empty -> zero     crelan/parser.py:798-800; banque/parser.py:134-139
  F7 percent strip          crelan/parser.py:126-128; bnp/parser.py:570-577
  F8 non-numeric purge      banque/parser.py:140-153
  F19 float cast            aviva/parser.py:687-688

The Python oracle for these lives in sources/synthetic.py::parse_number —
the two must stay in lockstep (fixture tests enforce it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# thin space / nbsp variants seen in FR number formatting
_SPACES = "   "

NUMERIC_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def _strip_common(col: Column) -> Column:
    """F7 percent strip + F5 en-dash + F4 paren removal + trim."""
    c = F.trim(col)
    c = F.regexp_replace(c, "%", "")            # F7
    c = F.translate(c, "–", "-")           # F5
    c = F.regexp_replace(c, r"[()]", "")        # F4 (sign handled separately)
    return F.trim(c)


def is_paren_negative(col: Column) -> Column:
    """F4: '(1.234,56)' marks a negative value."""
    return F.trim(col).rlike(r"^\(.*\)$")


def normalize_number_str(col: Column, locale_col: Column) -> Column:
    """F1/F2/F3: locale-aware '1.234,56'/'1,234.56' -> '1234.56' string.

    ``locale_col`` is a per-row column ('fr'/'en') so one plan serves mixed
    corpora — no per-provider branching outside Catalyst (F3 semantics).
    """
    c = _strip_common(col)
    fr = F.regexp_replace(
        F.regexp_replace(c, f"[.{_SPACES}]", ""), ",", "."
    )
    en = F.regexp_replace(c, f"[,{_SPACES}]", "")
    return F.when(locale_col == "fr", fr).otherwise(en)


def to_double(col: Column, locale_col: Column) -> Column:
    """Full numeric chain -> DOUBLE; NULL when not numeric (feeds P6).

    '', '-', 'nan' -> 0.0 (F6); parenthesized -> negated (F4); cast (F19).
    """
    s = normalize_number_str(col, locale_col)
    zero = s.isin("", "-", "nan")                 # F6
    num = F.when(zero, F.lit(0.0)).when(
        s.rlike(NUMERIC_RE), s.cast("double")
    )  # otherwise NULL => P6 drop
    return F.when(
        is_paren_negative(col) & (num > 0), -num
    ).otherwise(num)


def is_numeric_shape(col: Column, locale_col: Column) -> Column:
    """P6 numeric-shape predicate (aviva/parser.py:203-214)."""
    s = normalize_number_str(col, locale_col)
    return s.isin("", "-", "nan") | s.rlike(NUMERIC_RE)


def purge_non_numeric(col: Column) -> Column:
    """F8: keep only ``[-.0-9]`` (banque/parser.py:140-153)."""
    return F.regexp_replace(col, r"[^\-.0-9]", "")
