"""Event-time relational operators: distributed as-of join and gap
sessionization.

Spark has no ASOF JOIN operator (task brief lists it as a canonical
custom-operator case).  The standard range-join encoding
(``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + keep max r.ts) explodes
to O(|l| * |r|) rows per key before pruning; the union+window form here
stays linear:

    tag left rows side=1, right rows side=0 (carrying the value columns,
    left's as NULL) -> UNION -> window last(value, ignorenulls=True)
    over (PARTITION BY key ORDER BY ts, side) -> keep side=1 rows.

At any left row the window has seen exactly the right rows with
``r.ts < l.ts`` plus (side ordering 0 before 1) the right row at
``r.ts == l.ts`` — the pandas ``merge_asof(allow_exact_matches=True)``
semantics.  The same in-batch trick backs the pipeline's ToC interval
join (operators/extract.py, J2); this is the distributed general form.

100 TB shape: ONE shuffle+sort keyed by the `by` columns — no range
explosion, no broadcast.  Hot keys (a bot user with 10^8 events) land in
one partition: pre-split such keys by time range and as-of join each
range seeded with the previous range's last value (same pattern as the
pipeline's host-salting note, SCALE.md §3).

Determinism: ties inside a side must be impossible for the result to be
engine-independent — callers aggregate the right side to one row per
(key, ts) first (see queries.py::q_events_asof).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the value columns of the latest right
    row with ``right.on <= left.on`` within the same `by` group (NULL
    when no such row).  Backward as-of, exact matches allowed."""
    by = list(by)
    carried = [f"{c}{suffix}" for c in value_cols]
    clash = sorted(set(carried) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join carried column(s) {clash} already exist on the "
            "left frame; pass a different suffix"
        )
    lhs = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(n)
          for c, n in zip(value_cols, carried)],
        *[c for c in left.columns if c not in by and c != on],
    )
    rhs = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(n) for c, n in zip(value_cols, carried)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by and c != on],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(F.col(n), ignorenulls=True).over(w).alias(f"_f_{n}")
            for n in carried
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *by,
        on,
        *[c for c in left.columns if c not in by and c != on],
        *[F.col(f"_f_{n}").alias(n) for n in carried],
    )


def sessionize(
    events: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event in the same `by` group exceeds the gap.  Session
    numbers are 1-based per group (BIGINT row-number-free cumsum — the
    new-session indicator summed over the ordered window).

    100 TB shape: one shuffle+sort keyed by `by`; the per-session
    aggregation below it reuses the same clustering (subset rule).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(F.col(on).asc())
    # gaps in INTEGER microseconds (timestampdiff): exact, and — unlike
    # a cast to double epoch — independent of the session/JVM timezone
    # for TIMESTAMP_NTZ event times
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev = F.lag(F.col(on)).over(w)
    staged = events.withColumn("_prev", prev)
    new_session = F.when(
        F.col("_prev").isNull()
        | (
            F.expr(f"timestampdiff(MICROSECOND, _prev, {on})")
            > F.lit(gap_us)
        ),
        1,
    ).otherwise(0)
    return staged.withColumn(
        "session_no",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    ).drop("_prev")


def session_stats(
    events: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    gap_minutes: float = 30.0,
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates over sessionize(): event count, exact
    decimal value sum (partition-order-independent), start/end, duration
    seconds.  GroupBy keys extend the window's clustering, so Catalyst
    plans the aggregation without a second exchange."""
    s = sessionize(events, on=on, by=by, gap_minutes=gap_minutes)
    return s.groupBy(*by, "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
        F.min(on).alias("t_start"),
        F.max(on).alias("t_end"),
        F.round(
            F.expr(f"timestampdiff(MICROSECOND, min({on}), max({on}))")
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
    )


def sliding_window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_len: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """BATCH sliding-window (hopping) aggregation — the relational
    form of the metric feeds `streaming/windowed.py` serves online
    (public practice: rolling rates over overlapping windows; each
    event contributes to window_len/slide windows).  Spark's
    `F.window(ts, len, slide)` expands each row into its windows
    JVM-side (a STATIC Expand: len/slide projections enumerated at
    plan time — not even a Generate), so the whole query is ONE
    exchange keyed by (window, key) with map-side partial aggregation.

    Returns ``(win_start, win_end, <key_col>, n_events, sum_value)``
    with the repo's decimal-sum discipline (DECIMAL(18,2) sum cast to
    double — an IEEE double sum would hash-differ across
    partitionings).  TIMESTAMP_NTZ event time is cast at the edge and
    the bounds cast back, exactly like `windowed_event_counts`.

    100 TB shape: row expansion is the bounded factor len/slide (4 at
    the defaults); state is nothing (batch agg), skew is per
    (window, key) — event-time windows are intrinsically fine-grained.
    """
    ntz = dict(events.dtypes).get(ts_col) == "timestamp_ntz"
    ts = F.col(ts_col).cast("timestamp") if ntz else F.col(ts_col)
    out_t = "timestamp_ntz" if ntz else "timestamp"
    return (
        events.groupBy(
            F.window(ts, window_len, slide).alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").cast(out_t).alias("win_start"),
            F.col("win.end").cast(out_t).alias("win_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per `by` group: step i+1 counts only
    when it happens STRICTLY after the earliest completion of step i
    (the product-analytics funnel; the reference's keyword-anchor
    keep-lists are the page-local analogue of "this row counts only
    after its anchor", bnp/parser.py:120-141 — this is the event-time
    general form).

    Semantics (deterministic regardless of intra-timestamp ordering):
    t1 = min ts of step-1 events; t_{i+1} = min ts of step-(i+1) events
    with ts STRICTLY greater than t_i.  Equal-timestamp step pairs do
    NOT advance the funnel — a tie carries no order information, and
    any tie-break on event ids would be engine-private.

    Plan shape: ONE exchange keyed by `by`; each step after the first
    is a running-min window over the SAME sort (default RANGE frame, so
    ties are all visible), staged one select per step because window
    expressions cannot nest; the final per-group aggregation extends
    the window's clustering (subset rule — no second exchange).

    100 TB shape: linear in events, no join, no broadcast; hot users
    (bots with 10^8 events) land in one partition — pre-filter by the
    step whitelist first (done here: a filter on `type_col` pushes to
    the scan), and split pathological keys by time range exactly like
    asof_join's note above.

    Returns one row per group: step times (t_1..t_n), `depth` (number
    of steps completed in order), `converted`, and `us_to_convert`
    (integer microseconds t_1 -> t_n when converted, else NULL).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    by = list(by)
    ts = F.col(on)
    staged = events.filter(F.col(type_col).isin(*steps)).select(
        *by, on, type_col
    )
    # default ordered-window frame = RANGE UNBOUNDED PRECEDING ..
    # CURRENT ROW: every row sees all rows at-or-before its OWN ts,
    # ties included — strict `<` below is what enforces the order
    w = Window.partitionBy(*by).orderBy(ts.asc())
    run_prev = F.min(
        F.when(F.col(type_col) == steps[0], ts)
    ).over(w)
    cands = [F.when(F.col(type_col) == steps[0], ts).alias("_c_1")]
    for i, step in enumerate(steps[1:], start=2):
        staged = staged.withColumn(f"_r_{i - 1}", run_prev)
        cand = F.when(
            (F.col(type_col) == step) & (F.col(f"_r_{i - 1}") < ts), ts
        )
        cands.append(cand.alias(f"_c_{i}"))
        run_prev = F.min(cand).over(w)
    staged = staged.select(*by, *[c for c in cands])
    agg = staged.groupBy(*by).agg(
        *[F.min(f"_c_{i}").alias(f"t_{i}") for i in range(1, len(steps) + 1)]
    )
    depth = F.lit(0)
    for i in range(1, len(steps) + 1):
        depth = F.when(F.col(f"t_{i}").isNotNull(), i).otherwise(depth)
    n = len(steps)
    converted = F.col(f"t_{n}").isNotNull()
    return agg.select(
        *by,
        *[f"t_{i}" for i in range(1, n + 1)],
        depth.cast("int").alias("depth"),
        converted.alias("converted"),
        F.when(
            converted,
            F.expr(f"timestampdiff(MICROSECOND, t_1, t_{n})"),
        ).alias("us_to_convert"),
    )


def retention_cohorts(
    events: DataFrame,
    on: str = "ts",
    user_col: str = "user_id",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event (epoch-anchored calendar periods), then counted
    distinctly at each per-user period offset — the standard
    product-analytics retention table, all-integer day arithmetic so
    both engines agree bit-for-bit.

    cohort period  = days-since-1970-01-01(first day) DIV period_days
    period offset  = (event day - first day) DIV period_days
    retention      = n_users / cohort size (offset-0 users), the one
                     division, ROUND 6.

    Plan shape: per-user min-day agg (exchange 1) + user-keyed join
    back (exchange 2 on the probe side; the agg side reuses its own
    partitioning) — PINNED shuffle_hash, the first-day table scales
    with the user base so a broadcast would be the dedup_soft_weights
    AQE trap; the (cohort, offset, user) dedup level needs NO exchange
    (user-partitioning co-locates every such group — subset rule),
    then one (cohort, offset) exchange and a cohort-keyed window for
    the cohort size over the aggregated (tiny) matrix.

    100 TB shape: linear; no broadcast of anything corpus-scaled; the
    matrix itself is bounded by periods^2 x cohorts, never by events.
    """
    d = F.to_date(F.col(on))
    epoch = F.lit("1970-01-01").cast("date")
    firsts = (
        events.select(F.col(user_col).alias("u"), d.alias("d"))
        .groupBy("u")
        .agg(F.min("d").alias("d0"))
    )
    ev = events.select(F.col(user_col).alias("u"), d.alias("d"))
    joined = ev.join(firsts.hint("shuffle_hash"), on="u")
    staged = joined.select(
        "u",
        (F.datediff(F.col("d0"), epoch) / period_days)
        .cast("long")  # floor: both operands non-negative
        .alias("cohort_period"),
        (F.datediff(F.col("d"), F.col("d0")) / period_days)
        .cast("long")
        .alias("period_offset"),
    )
    matrix = staged.groupBy("cohort_period", "period_offset").agg(
        F.countDistinct("u").alias("n_users")
    )
    wc = Window.partitionBy("cohort_period")
    out = matrix.select(
        F.date_add(
            epoch, (F.col("cohort_period") * period_days).cast("int")
        ).alias("cohort_start"),
        "period_offset",
        "n_users",
        F.max(
            F.when(F.col("period_offset") == 0, F.col("n_users"))
        ).over(wc).alias("cohort_size"),
    )
    return out.select(
        "cohort_start",
        "period_offset",
        "n_users",
        "cohort_size",
        F.round(
            F.col("n_users") / F.col("cohort_size").cast("double"), 6
        ).alias("retention"),
    )


def session_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    order_col: str = "event_id",
    gap_minutes: float = 30.0,
    sep: str = ">",
) -> DataFrame:
    """Top-k most frequent length-n event-type paths WITHIN sessions
    (navigation path mining — the sequence signal funnels collapse
    away: a funnel fixes the steps, paths DISCOVER them).

    A path is n consecutive events of one session ordered by
    (ts, order_col) — the explicit unique-id tie-break makes
    equal-timestamp order engine-deterministic (sessionize itself is
    tie-safe: a row-frame cumsum over an equal-ts pair yields the
    same session number in either order).  Paths crossing a session
    boundary are not paths; rows whose n-1 leads run off the session
    emit nothing.

    Plan shape: sessionize's ONE user-keyed exchange; the lead window
    re-sorts locally on (user, session_no, ts, id) without a second
    exchange (subset rule); then one path-keyed count exchange and
    the global top-k as TakeOrderedAndProject (ties broken by path
    ascending — the k boundary is deterministic).

    100 TB shape: linear; the count agg is map-side partial (hot
    paths are absorbed exactly like hot tokens in vocab_topk); k
    bounds the driver merge.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    if k < 1:
        raise ValueError("k must be >= 1")
    by = list(by)
    s = sessionize(events, on=on, by=by, gap_minutes=gap_minutes)
    w = Window.partitionBy(*by, "session_no").orderBy(
        F.col(on).asc(), F.col(order_col).asc()
    )
    parts = [F.col(type_col)] + [
        F.lead(F.col(type_col), i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(sep, *parts)
    complete = parts[-1].isNotNull()
    return (
        s.select(F.when(complete, path).alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(k)
    )


def rate_spikes(
    events: DataFrame,
    on: str = "ts",
    key_col: str = "event_type",
    window_hours: int = 24,
    factor: int = 3,
    min_hours: int = 12,
) -> DataFrame:
    """Hourly event-rate spike detection: an hour is a spike when its
    count exceeds ``factor`` times the trailing-window hourly mean —
    the crawl/ops health monitor (error-rate bursts, scraper loops).

    ALL-INTEGER determinism: the mean is never materialized — the
    comparison cross-multiplies (n * trailing_hours > factor *
    trailing_sum), so there is no float anywhere and both engines
    agree bit-for-bit.  The trailing window is a RANGE frame over the
    integer hour slot (gap hours are absent ROWS but present RANGE —
    a quiet-then-burst pattern is judged against real hours, not
    against the previous k populated rows); hours with fewer than
    ``min_hours`` trailing observations are never flagged (cold
    start).

    Plan shape: one (key, slot) count exchange with map-side partial,
    then one key exchange for the trailing window over the ALREADY
    AGGREGATED (tiny: keys x hours) table.  100 TB: events never sort
    globally; the window input is bounded by cardinality, not volume.
    """
    if window_hours < 1 or factor < 1 or min_hours < 1:
        raise ValueError("window_hours, factor, min_hours must be >= 1")
    ntz = dict(events.dtypes).get(on) == "timestamp_ntz"
    ts = F.col(on).cast("timestamp") if ntz else F.col(on)
    out_t = "timestamp_ntz" if ntz else "timestamp"
    slot = (F.unix_micros(ts) / F.lit(3_600_000_000)).cast("long")
    hourly = events.groupBy(
        F.col(key_col), slot.alias("_slot")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_slot").asc())
        .rangeBetween(-window_hours, -1)
    )
    staged = hourly.select(
        key_col,
        "_slot",
        "n_events",
        F.count(F.lit(1)).over(w).alias("trailing_hours"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0))
        .cast("long")
        .alias("trailing_sum"),
    )
    return staged.select(
        key_col,
        F.timestamp_micros(F.col("_slot") * F.lit(3_600_000_000))
        .cast(out_t)
        .alias("hour_start"),
        "n_events",
        "trailing_hours",
        "trailing_sum",
        (
            (F.col("trailing_hours") >= min_hours)
            & (
                F.col("n_events") * F.col("trailing_hours")
                > F.lit(factor) * F.col("trailing_sum")
            )
        ).alias("is_spike"),
    )


def ab_lift(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "ab1",
) -> DataFrame:
    """Deterministic A/B lift readout: users are assigned to arms by
    a salted-md5 hex parity (the corpus_sample_hash convention — no
    randomness, both engines regenerate the same split), conversion =
    the user has at least one ``convert_type`` event, and the lift is
    computed from INTEGER cross-products with exactly one final
    division (ROUND 6) — the analytics twin of the dedup family's
    digest-threshold sampling.

    Returns ONE row: (n_treat, conv_treat, rate_treat, n_ctrl,
    conv_ctrl, rate_ctrl, lift); lift is NULL when the control never
    converts (division guard).

    Plan shape: ONE user-keyed aggregation (conversion flag as
    max(flag) in the same pass — no join anywhere), then the global
    single-row conditional-sum aggregation (partial + final).  100 TB:
    linear, two exchanges, nothing broadcast.
    """
    per_user = (
        events.select(
            F.col(user_col).alias("u"),
            (F.col(type_col) == convert_type)
            .cast("int")
            .alias("conv"),
        )
        .groupBy("u")
        .agg(F.max("conv").alias("conv"))
        .select(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("u").cast("string"))),
                1,
                1,
            ).alias("hx"),
            "conv",
        )
    )
    t = F.col("hx") < "8"
    g = per_user.agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("long").alias("n_treat"),
        F.sum(F.when(t, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_treat"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("long").alias("n_ctrl"),
        F.sum(F.when(~t, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_ctrl"),
    )
    return g.select(
        "n_treat",
        "conv_treat",
        F.round(
            F.col("conv_treat") / F.col("n_treat").cast("double"), 6
        ).alias("rate_treat"),
        "n_ctrl",
        "conv_ctrl",
        F.round(
            F.col("conv_ctrl") / F.col("n_ctrl").cast("double"), 6
        ).alias("rate_ctrl"),
        F.when(
            (F.col("conv_ctrl") > 0) & (F.col("n_treat") > 0),
            F.round(
                (F.col("conv_treat") * F.col("n_ctrl"))
                / (F.col("n_treat") * F.col("conv_ctrl")).cast(
                    "double"
                ),
                6,
            ),
        ).alias("lift"),
    )


def bot_regularity(
    events: DataFrame,
    on: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    min_events: int = 20,
    spread_factor: int = 10,
) -> DataFrame:
    """Timing-regularity bot detection — the crawl/abuse traffic
    filter (public heuristic: scripted clients fire on near-constant
    timers while humans are bursty; event rate + inter-event-gap
    regularity is the standard first-pass signal before any
    fingerprinting).  The decision is ALL-INTEGER so no float exists
    to drift (the rate_spikes discipline):

      is_regular = (max_gap - min_gap) * spread_factor * n_gaps
                   < sum_gap
      is_bot     = n_events >= min_events AND is_regular

    i.e. the gap spread must be under 1/spread_factor of the MEAN gap,
    cross-multiplied.  Gaps are integer microseconds between
    consecutive events per user ordered by (ts, id) — the consecutive
    differences of a sorted multiset are tie-order invariant, the id
    tie-break just pins the plan.  A single-event user has no gaps
    (0 < 0 fails -> never regular); an all-same-ts user sums to 0
    (never regular).

    Returns per user::

      (user_col, n_events, n_gaps, min_gap_us, max_gap_us,
       sum_gap_us, is_regular, is_bot)

    100 TB shape: ONE user-keyed exchange — the window sort and the
    per-user aggregation share the clustering (subset rule); the
    decision runs on the tiny aggregate.
    """
    if min_events < 2 or spread_factor < 1:
        raise ValueError(
            "min_events must be >= 2 and spread_factor >= 1"
        )
    for n in ("_br_prev", "_br_gap"):
        if n in events.columns:
            raise ValueError(f"staging column {n!r} already exists")
    w = Window.partitionBy(user_col).orderBy(
        F.col(on).asc(), F.col(id_col).asc()
    )
    staged = events.withColumn(
        "_br_prev", F.lag(F.col(on)).over(w)
    ).withColumn(
        "_br_gap",
        F.expr(f"timestampdiff(MICROSECOND, _br_prev, {on})").cast(
            "long"
        ),
    )
    agg = staged.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("_br_gap").alias("n_gaps"),
        F.min("_br_gap").alias("min_gap_us"),
        F.max("_br_gap").alias("max_gap_us"),
        F.sum("_br_gap").alias("sum_gap_us"),
    )
    # the cross-multiplication runs in DECIMAL(38,0): a multi-year
    # spread (~3e13 µs) times tens of thousands of gaps overflows
    # BIGINT and ANSI mode would kill the whole job for one
    # long-history user (review fix; the oracle mirrors the cast)
    regular = (
        (F.col("max_gap_us") - F.col("min_gap_us")).cast(
            "decimal(38,0)"
        )
        * F.lit(int(spread_factor))
        * F.col("n_gaps")
        < F.col("sum_gap_us").cast("decimal(38,0)")
    )
    regular = F.coalesce(regular, F.lit(False))
    return agg.select(
        user_col,
        "n_events",
        "n_gaps",
        "min_gap_us",
        "max_gap_us",
        "sum_gap_us",
        regular.alias("is_regular"),
        (
            (F.col("n_events") >= F.lit(int(min_events)))
            & regular
        ).alias("is_bot"),
    )


def attribution_matrix(
    events: DataFrame,
    on: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """First-touch x last-touch attribution matrix — the standard
    credit-assignment report (public practice: first/last-touch are
    the two baseline attribution models every analytics stack ships):
    per CONVERTING user, the type of the earliest event and of the
    latest event STRICTLY BEFORE the first conversion (the funnel
    tie rule: an event at exactly the conversion timestamp carries no
    causal order), rolled up into::

        (first_touch, last_touch, n_users)

    Users whose first event IS the conversion credit 'direct' on both
    ends.  First/last are min/max over (ts, id, type) structs — the
    (ts, id) prefix is a total order, so the pick is deterministic
    without a sort-based window.

    100 TB shape: ONE user-keyed exchange — the conversion-time
    window (no ORDER BY: a partition-wide min needs no sort) and the
    per-user aggregation share the clustering (subset rule); the
    matrix rollup aggregates a types^2-bounded table.
    """
    for n in ("_at_conv",):
        if n in events.columns:
            raise ValueError(f"staging column {n!r} already exists")
    w = Window.partitionBy(user_col)
    conv_ts = F.min(
        F.when(F.col(type_col) == conversion, F.col(on))
    ).over(w)
    staged = events.withColumn("_at_conv", conv_ts).filter(
        F.col("_at_conv").isNotNull()
    )
    pre = F.col(on) < F.col("_at_conv")
    s = F.struct(
        F.col(on).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t"),
    )
    per_user = staged.groupBy(user_col).agg(
        F.min(F.when(pre, s)).alias("_first"),
        F.max(F.when(pre, s)).alias("_last"),
    )
    return (
        per_user.select(
            F.coalesce(F.col("_first.t"), F.lit("direct")).alias(
                "first_touch"
            ),
            F.coalesce(F.col("_last.t"), F.lit("direct")).alias(
                "last_touch"
            ),
        )
        .groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
