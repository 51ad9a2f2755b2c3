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

Codegen note: these expressions get inlined MANY times per stage (Catalyst
collapses projects and substitutes aliases into pushed-down filters), so
they are built from trim/translate + a single regexp_replace — keeping the
generated code well under janino's 64KB method limit (a violation makes
the whole stage silently fall back to interpreted execution).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUMERIC_RE = r"^-?[0-9]+(\.[0-9]+)?$"

# %, parens and every space flavor (ascii, nbsp  , thin  ,
# narrow  ) — removed via translate (a single char-map
# pass; the regexp-class form was a measured top cost of the pipeline's
# normalize stage, r06).  The sign of a parenthesized value is handled
# separately in to_double
_STRIP_CHARS = "%()" + " \u00a0\u2009\u202f"


def is_paren_negative(col: Column) -> Column:
    """F4: '(1.234,56)' marks a negative value."""
    return F.trim(col).rlike(r"^\(.*\)$")


def normalize_number_str(col: Column, locale_col: Column) -> Column:
    """F1/F2/F3: locale-aware '1.234,56'/'1,234.56' -> '1234.56' string.

    ``locale_col`` is a per-row column ('fr'/'en'/'auto') so one plan
    serves mixed corpora — no per-provider branching outside Catalyst.

    'auto' is the F3 content-inferred rule (mirova/parser.py:213-218):
    a cell containing BOTH '.' and ',' treats ',' as thousands
    (``x.replace(",", "")``); otherwise ',' is the decimal mark
    (``x.replace(",", ".")`` — note the reference does NOT delete '.'
    in this branch, so '1.234' stays 1.234; fixture values always print
    two decimals, which is what makes the inference sound).
    """
    # ONE translate does F5 + F7 + F4 + space strip: the first from-char
    # (en-dash) maps to '-', every other from-char has no counterpart in
    # the to-string and is deleted — identical semantics to the previous
    # en-dash translate + [%()\s-flavors] regexp pass, one pass, no regex
    c = F.translate(F.trim(col), "–" + _STRIP_CHARS, "-")
    # translate deletes from-chars with no to-char counterpart:
    fr = F.translate(c, ",.", ".")  # ','->'.', thousands '.' deleted (F1)
    en = F.translate(c, ",", "")    # thousands ',' deleted (F2)
    auto = F.when(c.contains(".") & c.contains(","), en).otherwise(
        F.translate(c, ",", ".")
    )
    return F.when(locale_col == "fr", fr).when(locale_col == "en", en).otherwise(auto)


def pin(col: Column) -> Column:
    """Optimizer pin: stop PushDownPredicates from substituting this
    column's (expensive) defining expression into downstream filters.

    A filter on a projected alias gets rewritten to the alias's FULL
    expression and pushed below the projection — for regex-heavy chains
    that re-evaluates the chain once per filter (measured 4-5x stage
    cost in the cleanup pipeline).  Wrapping the alias in a condition on
    a nondeterministic expression makes the predicate non-pushable while
    leaving the value untouched (monotonically_increasing_id() >= 0 is
    always true, but the optimizer cannot fold it).
    """
    return F.when(F.monotonically_increasing_id() >= 0, col)


def double_from_normalized(s: Column, raw: Column) -> Column:
    """F4/F6/F19 tail of the chain, taking an ALREADY-normalized string.

    Use with ``normalize_number_str`` materialized as its own column:
    the CASE branches below reference ``s`` several times, and Spark's
    subexpression elimination does not deduplicate inside conditional
    branches — if ``s`` were the inline normalize chain, every reference
    would re-run the regex work (measured 5-8x stage cost).  As a
    separate column it is a cheap attribute reference, and CollapseProject
    keeps the two projections apart because a non-cheap multi-referenced
    alias is never re-inlined.

    ``try_cast`` replaces an rlike-gated cast: NULL on non-numeric (P6),
    and closer to the reference's Python ``float(s)`` acceptance set than
    a digits-only regex.  ``raw`` must be pre-trimmed (extractor cells
    are); the paren check is plain startswith/endswith, no regex.
    """
    mag = F.when(s.isin("", "-", "nan"), F.lit(0.0)).otherwise(
        s.try_cast("double")
    )  # NULL => P6 drop
    neg = raw.startswith("(") & raw.endswith(")")
    return F.when(neg, -F.abs(mag)).otherwise(mag) + F.lit(0.0)


def to_double(col: Column, locale_col: Column) -> Column:
    """Full numeric chain -> DOUBLE; NULL when not numeric (feeds P6).

    '', '-', 'nan' -> 0.0 (F6); parenthesized -> negative absolute (F4 —
    matches the reference's "negate only when positive" since
    -abs(v) == v for already-negative v); cast (F19).  The trailing
    ``+ 0.0`` folds IEEE -0.0 to +0.0 so serialization stays
    byte-identical with the Python oracle.
    """
    return double_from_normalized(
        normalize_number_str(col, locale_col), F.trim(col)
    )


def is_numeric_shape(col: Column, locale_col: Column) -> Column:
    """P6 numeric-shape predicate (aviva/parser.py:203-214)."""
    s = normalize_number_str(col, locale_col)
    return s.isin("", "-", "nan") | s.rlike(NUMERIC_RE)


def purge_non_numeric(col: Column) -> Column:
    """F8: keep only ``[-.0-9]`` (banque/parser.py:140-153)."""
    return F.regexp_replace(col, r"[^\-.0-9]", "")
