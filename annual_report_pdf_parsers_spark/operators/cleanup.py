"""Relational cleanup operators (SURVEY.md §2.2 predicates, §2.5 windows).

Named DataFrame->DataFrame transforms, all pure Catalyst (no UDFs).  The
canonical order — the engine's documented contract, mirrored by the Python
oracle ``sources/synthetic.py::simulate_cleanup`` — is:

  [in-batch: extract + fund resolution + P9 per-page country drop] ->
  P11 shape filter -> realign (P1/D4) -> P7 junk -> [exchange on url] ->
  W3 block fusion -> F12 currency rescue -> P3 currency filter ->
  W1 ffill (+ A1 mode fallback) -> F* numeric + P6 -> P12 summary drop ->
  name cleanup (F9/F13 [+F10/F11 deep] /F18) -> P5/P8

Window partitioning: every order-dependent operator runs inside
``(url, fund)`` partitions ordered by ``(page_no, row_idx)`` — the total
order threaded from the extraction stage (SURVEY.md §7 risk #1).  Nothing
ever windows across documents, so the plan scales horizontally: one
shuffle on url (hash(url) satisfies every (url, fund, ...) clustering by
the subset rule), then fusion's groupBy and both ffill/mode windows reuse
that clustering — the executed plan carries exactly TWO sorts (W3's
descending, W1's ascending) and ONE wide exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CURRENCIES, JUNK_MARKERS, KEEP_LIST
from ..functions.numeric import (
    double_from_normalized,
    normalize_number_str,
    pin,
)
ORDER_COLS = ["page_no", "row_idx"]
PART_COLS = ["url", "fund_name_report"]


def realign(df: DataFrame) -> DataFrame:
    """P1/P11: shape filter + positional cells -> named columns.

    The D4 token shift for gap-split shape-5 rows already happened inside
    the Arrow batch (operators/extract.py) — ``shape`` carries the raw
    token count, so the P11 predicate stays a plain column comparison
    (keeping generated code small enough for whole-stage codegen).
    """
    shape = F.col("shape")
    is_gap = F.col("doc_class") == "gap_split_en"
    ok = F.when(is_gap, shape.isin(4, 5)).otherwise(shape == 4)
    return (
        df.filter(ok)
        .select(
            # lang deliberately dropped: nothing downstream reads it, and
            # every column here transits the wide exchange + four sorts
            "url",
            "doc_class",
            "page_no",
            "row_idx",
            "fund_name_report",
            F.col("c0").alias("holding_name"),
            F.col("c1").alias("currency"),
            F.col("c2").alias("market_value"),
            F.col("c3").alias("net_assets"),
        )
    )


def drop_junk_rows(df: DataFrame) -> DataFrame:
    """P7 (aviva/parser.py:168-180): 'Total...' / boilerplate rows.
    One rlike alternation instead of N Contains — smaller generated code."""
    pattern = "|".join(JUNK_MARKERS)
    return df.filter(~F.col("holding_name").rlike(pattern))


def fuse_fragments(df: DataFrame) -> DataFrame:
    """W3 block fusion (aviva/parser.py:183-199; bnp/parser.py:258-273).

    Fragment rows (both value cells empty) concatenate into the NEXT
    complete row's name.  Implemented as a reverse running count of
    complete rows (descending window) => fragments share their following
    complete row's block id; then one groupBy per block.  Trailing
    fragments (no complete row after) are dropped.

    The descending window and the groupBy use the same (url, fund)
    clustering, so Catalyst plans ONE shuffle for both.
    """
    complete = (F.col("market_value") != "") | (F.col("net_assets") != "")
    w_desc = (
        Window.partitionBy(*PART_COLS)
        .orderBy(F.desc("page_no"), F.desc("row_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blk = F.sum(complete.cast("int")).over(w_desc)
    frag = df.withColumn("_blk", blk).withColumn("_complete", complete)
    name_parts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("page_no"), F.col("row_idx"), F.col("holding_name")
            )
        )
    )
    fused_name = F.array_join(
        F.transform(name_parts, lambda s: s["holding_name"]), " "
    )
    keep_if = lambda c: F.max(F.when(F.col("_complete"), F.col(c)))  # noqa: E731
    return (
        frag.groupBy("url", "doc_class", "fund_name_report", "_blk")
        .agg(
            fused_name.alias("holding_name"),
            keep_if("currency").alias("currency"),
            keep_if("market_value").alias("market_value"),
            keep_if("net_assets").alias("net_assets"),
            keep_if("page_no").alias("page_no"),
            keep_if("row_idx").alias("row_idx"),
            F.max(F.col("_complete")).alias("_has_complete"),
        )
        .filter(F.col("_has_complete"))
        .drop("_blk", "_has_complete")
    )


def rescue_embedded_currency(df: DataFrame) -> DataFrame:
    """F12 (aviva/parser.py:259-268 correct_corrupt_tables): when the
    currency cell is empty but a whitelisted currency token is embedded
    in the name cell, move it to the currency column and strip it from
    the name.  Runs before P3 so rescued rows pass the whitelist without
    waiting for W1."""
    from ..functions.numeric import pin
    from ..functions.strings import (
        extract_currency_token,
        remove_currency_token,
    )

    tok = pin(
        F.when(
            F.col("currency") == "",
            extract_currency_token(F.col("holding_name"), CURRENCIES),
        ).otherwise(F.lit(""))
    )
    df = df.withColumn("_ctok", tok)
    rescued = F.col("_ctok").isNotNull() & (F.col("_ctok") != "")
    return (
        df.withColumn(
            "holding_name",
            F.when(
                rescued,
                remove_currency_token(F.col("holding_name"), CURRENCIES),
            ).otherwise(F.col("holding_name")),
        )
        .withColumn(
            "currency",
            F.when(rescued, F.col("_ctok")).otherwise(F.col("currency")),
        )
        .drop("_ctok")
    )


def filter_currency_whitelist(df: DataFrame) -> DataFrame:
    """P3/P4 (crelan/parser.py:121-125): currency whitelist OR keep-list
    anchor OR empty currency (pending W1 forward-fill)."""
    return df.filter(
        F.col("currency").isin(CURRENCIES)
        | (F.col("currency") == "")
        | F.col("holding_name").isin(KEEP_LIST)
    )


def ffill_currency(df: DataFrame) -> DataFrame:
    """W1 (crelan/parser.py:782-784 et al.): empty currency takes the
    previous surviving row's value.

    A1 fallback (amundi/parser.py:104-110, archetypes with
    ``impute_currency_mode``): unfillable LEADING rows take the fund's
    most-frequent currency (pandas ``mode()[0]`` = smallest value among
    the most frequent — mirrored by the (-count, currency) struct-min).
    Other archetypes drop unfillable rows (W6 seed semantics).

    Scale: the mode is computed as per-currency conditional counts over
    the LITERAL whitelist (post-P3 every non-empty currency is
    whitelisted) in an unordered (url, fund) window stacked ABOVE the
    ffill window — its required (url, fund) ordering is a prefix of the
    ffill sort's output, so the plan carries ONE sort, not two (the
    earlier (url, fund, currency)-partitioned formulation cost a
    dedicated full-width sort).
    """
    from ..config import ARCHETYPES, CURRENCIES

    w = (
        Window.partitionBy(*PART_COLS)
        .orderBy(*ORDER_COLS)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(
        F.when(F.col("currency") != "", F.col("currency")), ignorenulls=True
    ).over(w)
    df = df.withColumn("_filled", filled)

    w_fund = Window.partitionBy(*PART_COLS)
    cands = []
    for c in CURRENCIES:
        cnt_c = F.count(F.when(F.col("currency") == c, 1)).over(w_fund)
        cands.append(
            F.when(
                cnt_c > 0,
                F.struct((-cnt_c).alias("nc"), F.lit(c).alias("c")),
            )
        )
    mode = F.array_min(F.array(*cands))["c"]  # max count, min currency
    impute_classes = [
        n for n, cfg in ARCHETYPES.items() if cfg.impute_currency_mode
    ]
    fallback = F.when(F.col("doc_class").isin(impute_classes), mode)
    return (
        df.withColumn("currency", F.coalesce(F.col("_filled"), fallback))
        .drop("_filled")
        .filter(F.col("currency").isNotNull() & (F.col("currency") != ""))
    )


def normalize_numbers(df: DataFrame, locale) -> DataFrame:
    """F1-F7/F19 + P6 + P12: numeric cells -> DOUBLE, drop non-numeric
    rows and the net_assets==100.00 fund-total row (mandarin/parser.py:191).

    Two-step on purpose: the normalized strings are materialized as their
    own columns so the conditional tail (double_from_normalized) references
    cheap attributes — see that function's docstring for the measured
    codegen/CSE rationale.
    """
    df = df.withColumn(
        "_mv_s", normalize_number_str(F.col("market_value"), locale)
    ).withColumn("_na_s", normalize_number_str(F.col("net_assets"), locale))
    # pin(): the P6/P12 filters below must reference these columns as
    # attributes — pushed-down substitution would re-run the whole
    # normalize chain per filter (see functions/numeric.py::pin)
    mv = pin(double_from_normalized(F.col("_mv_s"), F.col("market_value")))
    na = pin(double_from_normalized(F.col("_na_s"), F.col("net_assets")))
    return (
        df.withColumn("market_value", mv)
        .withColumn("net_assets", na)
        .filter(
            F.col("market_value").isNotNull() & F.col("net_assets").isNotNull()
        )
        .filter(F.col("net_assets") != 100.0)  # P12
        .drop("_mv_s", "_na_s")
    )


def clean_names(
    df: DataFrame, strip_leading, deep_clean=None, hard_clean=None
) -> DataFrame:
    """F9/F13 (+F10/F11 deep clean, + crelan hard clean) /F18 + P5/P8 name
    predicates.

    STAGED named cells, not one composed expression: Catalyst performs no
    CSE across CASE branches, so composing
    ``hard(CASE deep(CASE base))`` substitutes the entire upstream chain
    into every reference inside each branch — the plan dump showed the
    base ISIN chain repeated ~10x and the composed projection ran 7.8x
    slower than the staged form (4M rows, local[8], min of 3; same root
    cause as the extractor's named-cell refactor, NOTES.md gotcha 2).
    Each stage below computes ONCE per row into a pin()-ned column (the
    pin stops CollapseProject from re-inlining the stages into one
    another and the length filters from re-inlining the chain).
    Branch-only inputs (the deep purge, the hard passes) are computed
    under ``F.when(flag, ...)`` so non-branch rows pay nothing.
    """
    from ..functions.strings import (
        collapse_ws,
        drop_leading_token,
        hard_clean_pass1,
        hard_clean_pass2,
        hard_clean_pass3,
        strip_isin,
        truncate_multi_percent_aviva,
        purge_charset,
    )

    n0 = F.col("holding_name")
    stages: list[tuple[str, object]] = [
        ("_n1", F.when(strip_leading, drop_leading_token(n0)).otherwise(n0)),
        ("_n2", strip_isin(F.col("_n1"))),
    ]
    prev = "_n2"
    if deep_clean is not None:
        stages += [
            ("_dp", F.when(deep_clean, purge_charset(F.col(prev)))),
            (
                "_n3",
                F.when(
                    deep_clean, truncate_multi_percent_aviva(F.col("_dp"))
                ).otherwise(F.col(prev)),
            ),
        ]
        prev = "_n3"
    if hard_clean is not None:
        stages += [
            ("_h1", F.when(hard_clean, hard_clean_pass1(F.col(prev)))),
            ("_h2", F.when(hard_clean, hard_clean_pass2(F.col("_h1")))),
            (
                "_n4",
                F.when(
                    hard_clean & (F.col(prev) == "nan"), F.lit("_")
                )
                .when(hard_clean, hard_clean_pass3(F.col("_h2")))
                .otherwise(F.col(prev)),
            ),
        ]
        prev = "_n4"
    collisions = {name for name, _ in stages} & set(df.columns)
    if collisions:
        raise ValueError(
            f"clean_names stage columns {sorted(collisions)} already "
            "exist in the input — rename them before cleanup"
        )
    out = df
    for name, expr in stages:
        out = out.withColumn(name, pin(expr))
    out = out.withColumn("holding_name", pin(collapse_ws(F.col(prev))))
    return (
        out.drop(*[name for name, _ in stages])
        .filter(
            (F.length("holding_name") > 0) & (F.length("holding_name") < 90)
        )
    )
