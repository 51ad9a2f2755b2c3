"""String cleanup expressions (SURVEY.md §2.8 F9-F18).

All JVM-side Spark SQL expressions:

  F9  ISIN strip                aviva/parser.py:456-460, 481-485, 517-521
  F10 charset purge             aviva/parser.py:673-676; capitalatwork:345-348
  F11 multi-% truncation        aviva/parser.py:677-680; capitalatwork:349-359
  F12 currency-token extraction aviva/parser.py:259-268; capitalatwork:89-97
  F13 leading-token drop        scor/parser.py:55-57; oddo/parser.py:107-109
  F14 trailing-digit strip      capitalatwork/parser.py:92-94, 115-117
  F15 digit strip (currency)    roth/parser.py:61-63; comgest/parser.py:148-150
  F16 fund-name rewrites        roth/parser.py:191; crelan/parser.py:58-66
  F17 name-from-page regex      scor/parser.py:111-114; mandarin/parser.py:91-93
  F18 whitespace collapse       aviva/parser.py:115-117, 682
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISIN_PATTERN = r"[A-Z]{2}[A-Z0-9]{9}[0-9]"


def strip_isin(col: Column) -> Column:
    """F9: remove embedded ISIN codes (and the reference's 'PROPRE' tag)."""
    return F.regexp_replace(col, ISIN_PATTERN + r"|PROPRE", "")


def purge_charset(col: Column) -> Column:
    """F10: keep only ``[0-9a-zA-Z/ %)(]``."""
    return F.regexp_replace(col, r"[^0-9a-zA-Z/ %)(]", "")


def truncate_multi_percent(col: Column) -> Column:
    """F11 (generic variant): if a name contains more than one '%', cut
    after the first '% <num>' match."""
    n_pct = F.length(col) - F.length(F.regexp_replace(col, "%", ""))
    head = F.regexp_extract(col, r"^(.*?%\s*[0-9.,]+)", 1)
    return F.when((n_pct > 1) & (head != ""), head).otherwise(col)


def truncate_multi_percent_aviva(col: Column) -> Column:
    """F11, aviva-exact (aviva/parser.py:677-680): when the name holds >1
    '%', truncate at the END of the first ``% {0,3}[\\d/]+`` match —
    ``text[:s.end()]``.  Deviation: the reference crashes (s is None) when
    no '%' is digit-followed; we leave the name unchanged instead."""
    n_pct = F.length(col) - F.length(F.regexp_replace(col, "%", ""))
    head = F.regexp_extract(col, r"^(.*?% {0,3}[0-9/]+)", 1)
    return F.when((n_pct > 1) & (head != ""), head).otherwise(col)


def extract_currency_token(col: Column, currencies: list[str]) -> Column:
    """F12: whitelisted currency embedded in a name cell -> its own value."""
    alt = "|".join(currencies)
    return F.regexp_extract(col, rf"(?:^| )({alt})(?: |$)", 1)


def remove_currency_token(col: Column, currencies: list[str]) -> Column:
    """F12 (complement): drop the embedded currency token from the name."""
    alt = "|".join(currencies)
    return F.regexp_replace(col, rf"(?:^| )({alt})(?= |$)", " ")


def drop_leading_token(col: Column) -> Column:
    """F13: drop the first whitespace-separated token (quantity prefix)."""
    return F.regexp_replace(col, r"^\S+ +", "")


def strip_trailing_digits(col: Column) -> Column:
    """F14: ``re.sub('\\d*$', '', name)``."""
    return F.regexp_replace(col, r"[0-9]+$", "")


def strip_digits(col: Column) -> Column:
    """F15: remove all digits (currency cells polluted with amounts)."""
    return F.regexp_replace(col, r"[0-9]+", "")


def rewrite_fund_name(col: Column, pattern: str, replacement: str = "") -> Column:
    """F16: provider-specific prefix/suffix removal, as config data."""
    return F.trim(F.regexp_replace(col, pattern, replacement))


def extract_by_regex(col: Column, pattern: str, group: int = 1) -> Column:
    """F17: pull a fund name / currency out of page text."""
    return F.regexp_extract(col, pattern, group)


def hard_clean_crelan(col: Column) -> Column:
    """Crelan hard ``clean()`` (crelan/parser.py:644-656): bond-code
    normalization via three SEQUENTIAL regex passes — lookarounds evaluate
    against each pass's INPUT, so pass boundaries matter (a removal in
    pass 1 creates adjacencies pass 2 sees):

      1. ``(?<!\\d)%|[a-z]|%(?! )`` — every lowercase letter; a '%'
         survives only when digit-preceded AND space-followed;
      2. ``(?<=\\d)[a-zA-Z](?! )|(?<=\\.)[a-zA-Z](?! )`` — letters glued
         to a digit/dot (unit suffixes like '2y');
      3. ``(?<=[0-9/]) (?=[0-9/])`` — the space inside split numerics.

    ``'nan'`` maps to ``'_'`` (the reference's NaN cell sentinel).  Java
    regex supports the lookarounds natively; the DuckDB oracle (no
    lookarounds in RE2) reproduces each pass as a per-character keep
    predicate over the same input — see queries._hard_clean_pass_sql.

    The passes are exposed individually (hard_clean_pass1/2/3) so
    cleanup.clean_names can stage them as named cells — composing them
    inside CASE branches re-evaluates every upstream expression per
    reference (no cross-branch CSE)."""
    p3 = hard_clean_pass3(hard_clean_pass2(hard_clean_pass1(col)))
    return F.when(col == "nan", F.lit("_")).otherwise(p3)


def hard_clean_pass1(col: Column) -> Column:
    return F.regexp_replace(col, r"(?<!\d)%|[a-z]|%(?! )", "")


def hard_clean_pass2(col: Column) -> Column:
    return F.regexp_replace(
        col, r"(?<=\d)[a-zA-Z](?! )|(?<=\.)[a-zA-Z](?! )", ""
    )


def hard_clean_pass3(col: Column) -> Column:
    return F.regexp_replace(col, r"(?<=[0-9/]) (?=[0-9/])", "")


def collapse_ws(col: Column) -> Column:
    """F18: whitespace collapse + trim ('" ".join(x.split())')."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_holding_name(
    col: Column,
    strip_leading: Column,
    deep_clean: Column | None = None,
    hard_clean: Column | None = None,
) -> Column:
    """The canonical name-cleanup chain: optional F13, then F9, then the
    optional aviva deep clean (F10 charset purge + F11 multi-% truncation,
    aviva/parser.py:673-680 order) OR the crelan hard clean
    (hard_clean_crelan — the two never co-occur in an archetype), then
    F18 collapse+trim.

    ``strip_leading`` / ``deep_clean`` / ``hard_clean`` are boolean
    Columns (per-row, set by the dispatch stage per archetype) so the
    whole corpus stays one plan.

    This composed single-expression form is the CONTRACT, not the hot
    path: the conditional branches substitute the upstream chain into
    every CASE reference (no cross-branch CSE), so the pipeline runs the
    staged named-cell form in ``operators.cleanup.clean_names`` instead.
    ``tests/test_property.py::test_staged_clean_names_matches_composed``
    pins the two forms equal on adversarial inputs.
    """
    stripped = F.when(strip_leading, drop_leading_token(col)).otherwise(col)
    base = strip_isin(stripped)
    if deep_clean is not None:
        base = F.when(
            deep_clean, truncate_multi_percent_aviva(purge_charset(base))
        ).otherwise(base)
    if hard_clean is not None:
        base = F.when(hard_clean, hard_clean_crelan(base)).otherwise(base)
    return collapse_ws(base)
