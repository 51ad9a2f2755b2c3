"""Driver-contract query registry: SURVEY.md §2 operators over the
driver's testdata tables, each paired with an exact DuckDB oracle SQL.

Every pair is engineered for bit-identical results across engines:
  - aggregates over doubles go through DECIMAL(18,2) (exact) then cast back;
  - ratios/scores are integer counts with ONE final division/rounding;
  - hashes are md5-hex (portable); MinHash minima are hex-string minima;
  - ranks use explicit deterministic tie-breaks; row_number cast to BIGINT
    (DuckDB's type) so schemas align.

Query keys are prefixed by the SURVEY.md §2 operator they exercise.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup, similarity, temporal, text
from .operators import scrub as _scrub
from .operators import sketch as _sketch

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# §2.1/2.2 scans, projections, predicates
# ---------------------------------------------------------------------------


def q_s1_scan_prune(spark, sf):
    return (
        load(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "lang", "n_chars")
    )


def q_p3_whitelist(spark, sf):
    """Per-row whitelist filter output (not just the per-lang counts):
    3-row aggregates were flagged as thin driver evidence in r02 — the
    surviving rows themselves hash every filtered value."""
    return (
        load(spark, sf, "documents")
        .filter(F.col("lang").isin("en", "fr", "de"))
        .select("doc_id", "lang", "source")
    )


def q_p6_numeric_shape(spark, sf):
    """Per-row shape-predicate output (r02: the 3-row aggregate form was
    thin evidence)."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_orderkey").cast("string").rlike("4$"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


def q_p7_junk_drop(spark, sf):
    d = load(spark, sf, "documents")
    return (
        d.filter(
            ~F.col("text").contains("spark") & ~F.col("text").contains("stream")
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_p8_length_pred(spark, sf):
    return (
        load(spark, sf, "documents")
        .filter(F.length("text").between(120, 400))
        .select("doc_id", "n_chars")
    )


def q_p11_shape_filter(spark, sf):
    d = load(spark, sf, "documents").withColumn(
        "n_tokens", text.token_count(F.col("text")).cast("long")
    )
    return d.filter(F.col("n_tokens").between(30, 60)).select(
        "doc_id", "n_tokens"
    )


def q_p12_value_filter(spark, sf):
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_quantity") != 50.0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / slices
# ---------------------------------------------------------------------------


def q_o3_positional_slice(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn").between(3, 5))
        .select("user_id", "event_id", "rn")
    )


def q_o4_bounded_tail(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# §2.7 set ops
# ---------------------------------------------------------------------------


def q_u1_union(spark, sf):
    d = load(spark, sf, "documents")
    a = d.filter(F.col("lang") == "fr").select(
        "doc_id", F.lit("fr_slice").alias("slice")
    )
    b = d.filter(F.col("source") == "src1").select(
        "doc_id", F.lit("src1_slice").alias("slice")
    )
    return a.unionByName(b)


def q_u2_distinct(spark, sf):
    return load(spark, sf, "documents").select("lang", "source").distinct()


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


def q_j1_broadcast_join(spark, sf):
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def q_j2_interval_join(spark, sf):
    """J2: the ToC page-interval lookup pattern (lead() + range join)."""
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("session_id"),
            F.col("ts").alias("start_ts"),
        )
        .withColumn("end_ts", F.lead("start_ts").over(
            Window.partitionBy("user_id").orderBy("start_ts", "session_id")
        ))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        s.join(
            p,
            (s["user_id"] == p["p_user"])
            & (p["p_ts"] >= s["start_ts"])
            & (s["end_ts"].isNull() | (p["p_ts"] < s["end_ts"])),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


def q_j5_anti_join(spark, sf):
    """Customers with no high-value order.  The totalprice filter keeps the
    result non-empty at driver scale (every customer has SOME order, so the
    bare anti-join was vacuous — 0 rows both sides proves nothing)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey")


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------


def q_w1_ffill(spark, sf):
    e = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(~F.col("event_type").isin("click", "view"), F.col("value"))
    return e.select(
        "event_id",
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


def q_w3_block_fusion(spark, sf):
    """W3 on events: 'view' rows are fragments fused into the next
    non-view event's props (the aviva fragment-concat semantics)."""
    e = load(spark, sf, "events")
    complete = F.col("event_type") != "view"
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blk = F.sum(complete.cast("int")).over(w_desc)
    parts = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "props"))
    )
    return (
        e.withColumn("_blk", blk)
        .withColumn("_c", complete)
        .groupBy("user_id", "_blk")
        .agg(
            F.array_join(
                F.transform(parts, lambda s: s["props"]), " "
            ).alias("fused_props"),
            F.max(F.when(F.col("_c"), F.col("event_id"))).alias(
                "anchor_event_id"
            ),
            F.count(F.lit(1)).alias("n_rows"),
            F.max("_c").alias("_has"),
        )
        .filter(F.col("_has"))
        .select("user_id", "anchor_event_id", "fused_props", "n_rows")
    )


def q_w4_lead(spark, sf):
    e = load(spark, sf, "events").filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lead("event_id").over(w).alias("next_event_id"),
    )


def q_w6_first_seed(spark, sf):
    e = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", F.first("value").over(w).alias("seed_value")
    )


def q_p9_first_occurrence_drop(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return (
        e.withColumn("_rn", rn)
        .filter(
            ~(F.col("event_type").isin("error", "signup") & (F.col("_rn") == 1))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


def q_a1_mode(spark, sf):
    e = load(spark, sf, "events")
    cnt = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


def q_a2_group_agg(spark, sf):
    return (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_a5_keep_last(spark, sf):
    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", F.col("event_id").alias("last_event_id")
        )
    )


# ---------------------------------------------------------------------------
# §2.8 scalar function chains (the cleanup library, oracle-checked)
# ---------------------------------------------------------------------------


def q_f_numeric_chain(spark, sf):
    """F1/F4/F6 chain on deterministically constructed FR numerals."""
    from .functions.numeric import to_double

    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    s = F.concat(
        F.lit("("),
        F.col("l_orderkey").cast("string"),
        F.lit(","),
        F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        F.lit(")"),
    )
    s2 = F.when(F.col("l_linenumber") == 1, F.lit("-")).otherwise(s)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        to_double(s2, F.lit("fr")).alias("fr_value"),
    )


def q_f_name_clean(spark, sf):
    """F9 ISIN strip + F18 collapse on tagged part names."""
    from .functions.strings import collapse_ws, strip_isin

    p = load(spark, sf, "part")
    tagged = F.concat(
        F.col("p_name"),
        F.lit(" LU"),
        F.lpad((F.col("p_partkey") % 1000000).cast("string"), 10, "0"),
    )
    return p.select(
        "p_partkey", collapse_ws(strip_isin(tagged)).alias("cleaned")
    )


def q_d1_dispatch(spark, sf):
    d = load(spark, sf, "documents")
    cls = (
        F.when(F.col("text").contains("window"), "windowed")
        .when(F.col("text").contains("join"), "join-heavy")
        .otherwise("plain")
    )
    return (
        d.withColumn("doc_class", cls)
        .groupBy("lang", "doc_class")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# §2.1 extraction operators (driver-gate surface for the Arrow-batch slicer)
# ---------------------------------------------------------------------------


_S5_GRID = (0, 40, 48, 66)


def _s5_lines(spark, sf):
    """Fixed-width lines built deterministically from part — the stand-in
    for a rendered page grid, reproducible as string concat in SQL."""
    p = load(spark, sf, "part")
    line = F.concat(
        F.rpad(F.col("p_name"), 40, " "),
        F.rpad(F.col("p_brand"), 8, " "),
        F.rpad(F.col("p_size").cast("string"), 18, " "),
        F.col("p_type"),
    )
    return p.select(F.col("p_partkey").alias("line_id"), line.alias("line"))


def q_s5_grid_slice(spark, sf):
    """S5: the pipeline's ``_slice_cells`` run as a standalone mapInPandas
    over fixed-width lines; oracle = substr/trim (crelan/parser.py:96-103
    tabula columns=[...] semantics)."""
    from .operators.extract import slice_lines

    return slice_lines(_s5_lines(spark, sf), _S5_GRID)


def q_s4_page_explode(spark, sf):
    """S4: document -> page -> line explosion via the extract stage's own
    pandas helpers (form-feed pages, newline lines, empty lines kept)."""
    from .operators.extract import explode_page_lines

    s = load(spark, sf, "supplier")
    text = F.concat(
        F.lit("TITLE "), F.col("s_name"), F.lit("\n"),
        F.lit("row-"), (F.col("s_suppkey") % 97).cast("string"),
        F.lit("\n\nlast"),                      # empty line kept
        F.lit("\f"),                             # page break
        F.lit("PAGE2 "), F.col("s_name"),
    )
    d = s.select(
        F.col("s_suppkey").cast("string").alias("url"), text.alias("text")
    )
    return explode_page_lines(d)


def q_s7_gap_split(spark, sf):
    """S7 + D4 shift: ``_gap_cells`` (camelot-stream stand-in,
    four/parser.py:196-218) — 5-token rows drop their leading qty."""
    from .operators.extract import gap_split_lines

    p = load(spark, sf, "part")
    base = F.concat_ws(
        "  ",
        F.col("p_brand"),
        F.col("p_name"),
        F.col("p_size").cast("string"),
        F.col("p_type"),
    )
    line = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat((F.col("p_partkey") % 89).cast("string"), F.lit("  "), base),
    ).otherwise(base)
    return gap_split_lines(
        p.select(F.col("p_partkey").alias("line_id"), line.alias("line"))
    )


def q_u3_two_up_split(spark, sf):
    """U3: two-up half-page split + restack (mandarin/parser.py:102-114)."""
    p = load(spark, sf, "part")
    line = F.concat(
        F.rpad(F.concat_ws("  ", "p_brand", F.col("p_size").cast("string")), 40, " "),
        F.concat_ws("  ", "p_type", (F.col("p_partkey") % 97).cast("string")),
    )
    d = p.select(F.col("p_partkey").alias("line_id"), line.alias("line"))
    left = d.select(
        "line_id",
        F.lit("L").alias("half"),
        F.trim(F.substring("line", 1, 40)).alias("cell"),
    )
    right = d.select(
        "line_id",
        F.lit("R").alias("half"),
        F.trim(F.substring("line", 41, 100000)).alias("cell"),
    )
    return left.unionByName(right)


# ---------------------------------------------------------------------------
# §2.2 remaining projections / predicates
# ---------------------------------------------------------------------------


def q_p1_realign(spark, sf):
    """P1: positional cells -> named columns, filler dropped
    (crelan/parser.py:105-118)."""
    p = load(spark, sf, "part")
    arr = F.split(
        F.concat_ws("|", "p_brand", "p_type", "p_name", F.lit("filler")),
        r"\|",
    )
    return p.select("p_partkey", arr.alias("cols")).select(
        "p_partkey",
        F.col("cols")[0].alias("brand"),
        F.col("cols")[1].alias("ptype"),
        F.col("cols")[2].alias("pname"),
    )


def q_p2_projection(spark, sf):
    """P2: the fixed output-contract projection/reorder."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 0)
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus",
            "l_shipdate",
        )
    )


def q_p4_keep_anchor(spark, sf):
    """P4: keyword-anchor keep-list rescues rows failing the main predicate
    (amundi/parser.py:73-79)."""
    return (
        load(spark, sf, "documents")
        .filter(
            (F.col("n_chars") < 200) | F.col("source").isin("src1", "src2")
        )
        .select("doc_id", "source", "n_chars")
    )


def q_p5_null_blank(spark, sf):
    """P5 + P8 blank variant: drop null / whitespace-only values
    (aviva/parser.py:181; capitalatwork:338-344)."""
    e = load(spark, sf, "events")
    v = (
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("event_id") % 5 == 1, F.lit("   "))
        .otherwise(F.col("props"))
    )
    return (
        e.select("event_id", v.alias("kept_props"))
        .filter(
            F.col("kept_props").isNotNull()
            & (F.length(F.trim("kept_props")) > 0)
        )
    )


def q_p10_sentinel(spark, sf):
    """P10: sentinel-URL discard (aviva/parser.py:553-564)."""
    from .config import URL_SENTINELS

    c = load(spark, sf, "customer")
    url = (
        F.when(F.col("c_custkey") % 97 == 0, F.lit("nan"))
        .when(
            F.col("c_custkey") % 97 == 1,
            F.lit("annual_report_does_not_exists"),
        )
        .otherwise(
            F.concat(F.lit("https://h/"), F.col("c_custkey").cast("string"))
        )
    )
    return (
        c.select("c_custkey", url.alias("pdf_url"))
        .filter(~F.col("pdf_url").isin(URL_SENTINELS))
    )


# ---------------------------------------------------------------------------
# §2.5/2.6 remaining windows / sorts
# ---------------------------------------------------------------------------


def q_w2_name_ffill(spark, sf):
    """W2: forward-fill a name-ish string column (roth/parser.py:496-503)."""
    e = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(F.col("event_type") == "signup", F.col("props"))
    return e.select(
        "event_id", F.last(v, ignorenulls=True).over(w).alias("filled_name")
    )


def q_w5_toc_repair(spark, sf):
    """W5: the tobam ToC repair (operators/toc_repair.py) over lines built
    from events — unnumbered lines graft the next line's trailing token
    with alternating consumption."""
    from .operators.toc_repair import repair_toc_lines

    e = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    line = F.concat(
        F.lit("SEC "),
        F.col("event_type"),
        F.when(F.col("event_id") % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit(" "), (F.col("event_id") % 97).cast("string"))
        ),
    )
    df = e.select(
        F.col("user_id").alias("url"),
        F.row_number().over(w).cast("long").alias("entry_idx"),
        line.alias("line"),
    )
    return repair_toc_lines(df).select("url", "entry_idx", "line")


def q_o2_page_sort(spark, sf):
    """O2: page-list sort (scor/parser.py:90) — per-group sorted id list."""
    e = load(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("event_id").cast("string"))),
            ",",
        ).alias("sorted_ids")
    )


# ---------------------------------------------------------------------------
# §2.4 remaining aggregations
# ---------------------------------------------------------------------------


def q_a3_threshold_retry(spark, sf):
    """A3: threshold-triggered retry (crelan/parser.py:132-135) as its
    relational pattern — groups whose primary aggregate is below threshold
    take the alternate measure."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 23 == 0)
    g = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("alt"),
    )
    picked = F.when(F.col("s") < 50, F.col("alt")).otherwise(F.col("s"))
    return g.select(
        "l_orderkey",
        picked.cast("double").alias("picked"),
        (F.col("s") < 50).alias("retried"),
    )


def q_a4_counts(spark, sf):
    """A4: per-partition row/doc counts — the lineage metrics shape."""
    return (
        load(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 remaining scalar functions
# ---------------------------------------------------------------------------


def q_f2_en_normalize(spark, sf):
    """F2 + F4 under the EN locale ('1,234.56', parenthesized negatives)."""
    from .functions.numeric import to_double

    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 11 == 0)
    s = F.concat(
        ((F.col("l_orderkey") % 900) + 1).cast("string"),
        F.lit(","),
        F.lpad((F.col("l_partkey") % 1000).cast("string"), 3, "0"),
        F.lit("."),
        F.lpad((F.col("l_suppkey") % 100).cast("string"), 2, "0"),
    )
    s2 = F.when(F.col("l_linenumber") == 2, F.concat(F.lit("("), s, F.lit(")"))).otherwise(s)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        to_double(s2, F.lit("en")).alias("en_value"),
    )


def q_f3_format_infer(spark, sf):
    """F3: content-inferred locale (mirova/parser.py:213-218) — both '.'
    and ',' => ',' is thousands; otherwise ',' is the decimal mark."""
    from .functions.numeric import to_double

    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 13 == 0)
    mod3 = F.col("l_partkey") % 3
    n9 = ((F.col("l_orderkey") % 90) + 1).cast("string")
    n900 = ((F.col("l_orderkey") % 900) + 1).cast("string")
    frac2 = F.lpad((F.col("l_suppkey") % 100).cast("string"), 2, "0")
    both = F.concat(
        n9, F.lit(","),
        F.lpad((F.col("l_partkey") % 1000).cast("string"), 3, "0"),
        F.lit("."), frac2,
    )
    comma_dec = F.concat(n900, F.lit(","), frac2)
    dot_only = F.concat(n900, F.lit("."), frac2)
    s = F.when(mod3 == 0, both).when(mod3 == 1, comma_dec).otherwise(dot_only)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        to_double(s, F.lit("auto")).alias("auto_value"),
    )


def q_f_token_strip(spark, sf):
    """F13 leading-token drop / F14 trailing-digit strip / F15 digit strip."""
    from .functions.strings import (
        drop_leading_token,
        strip_digits,
        strip_trailing_digits,
    )

    p = load(spark, sf, "part")
    name = F.concat(
        (F.col("p_partkey") % 9999).cast("string"),
        F.lit(" "),
        F.col("p_brand"),
        F.lit(" "),
        F.col("p_type"),
        (F.col("p_size") % 100).cast("string"),
    )
    return p.select(
        "p_partkey",
        drop_leading_token(name).alias("no_lead"),
        strip_trailing_digits(name).alias("no_tail"),
        strip_digits(name).alias("no_digits"),
    )


def q_f8_purge_numeric(spark, sf):
    """F8: keep only [-.0-9] (banque/parser.py:140-153)."""
    from .functions.numeric import purge_non_numeric

    p = load(spark, sf, "part")
    dirty = F.concat(
        F.col("p_brand"),
        F.lit("#"),
        F.col("p_size").cast("string"),
        F.lit("kg -"),
        (F.col("p_partkey") % 1000).cast("string"),
    )
    return p.select("p_partkey", purge_non_numeric(dirty).alias("digits_only"))


def q_f10_charset_purge(spark, sf):
    """F10: keep only [0-9a-zA-Z/ %)(] (aviva/parser.py:673-676)."""
    from .functions.strings import purge_charset

    p = load(spark, sf, "part")
    noisy = F.concat(
        F.col("p_name"), F.lit(" ¬ß "), F.col("p_brand"), F.lit(" 12% (ok)/")
    )
    return p.select("p_partkey", purge_charset(noisy).alias("clean"))


def q_f11_multi_pct(spark, sf):
    """F11: multi-'%' truncation after the first '% <num>' match — both
    the generic variant and the aviva-exact one (aviva/parser.py:677-680,
    live in the pipeline for deep_name_clean archetypes)."""
    from .functions.strings import (
        truncate_multi_percent,
        truncate_multi_percent_aviva,
    )

    p = load(spark, sf, "part")
    nm = F.when(
        F.col("p_partkey") % 2 == 0,
        F.concat(
            F.col("p_brand"), F.lit(" % "), F.col("p_size").cast("string"),
            F.lit(" "), F.col("p_type"), F.lit(" % 99 tail"),
        ),
    ).otherwise(
        F.concat(F.col("p_brand"), F.lit(" % "), F.col("p_size").cast("string"))
    )
    return p.select(
        "p_partkey",
        truncate_multi_percent(nm).alias("name_cut"),
        truncate_multi_percent_aviva(nm).alias("aviva_cut"),
    )


def q_f12_currency_rescue(spark, sf):
    """F12: whitelisted currency embedded in a name cell -> extracted to
    its own value, stripped from the name (aviva/parser.py:259-268).
    The oracle reconstructs the expected strings from the same inputs."""
    from .config import CURRENCIES
    from .functions.strings import (
        extract_currency_token,
        remove_currency_token,
    )

    p = load(spark, sf, "part")
    curs = ["EUR", "USD", "GBP", "CHF"]
    cur = F.element_at(
        F.array(*[F.lit(c) for c in curs]),
        (F.col("p_partkey") % 4 + 1).cast("int"),
    )
    w1 = F.regexp_replace(F.col("p_brand"), "#", "")
    name = F.concat(w1, F.lit(" "), cur, F.lit(" "), F.col("p_type"))
    return p.select(
        "p_partkey",
        extract_currency_token(name, CURRENCIES).alias("cur_tok"),
        remove_currency_token(name, CURRENCIES).alias("name_clean"),
    )


def q_f16_rewrite_const(spark, sf):
    """F16 provider rewrite + F20 constant columns (roth/parser.py:191;
    tobam/parser.py:156-158)."""
    from .functions.strings import rewrite_fund_name

    p = load(spark, sf, "part")
    title = F.concat(F.lit("EDR FUND "), F.col("p_brand"), F.lit(" EQUITY"))
    return p.select(
        "p_partkey",
        rewrite_fund_name(title, r"^EDR FUND\s+").alias("report_name"),
        F.lit("PROVIDER_X").alias("fund_provider"),
        F.lit(None).cast("string").alias("isin"),
    )


def q_f17_regex_extract(spark, sf):
    """F17: name-from-page regex extraction (scor/parser.py:111-114)."""
    from .functions.strings import extract_by_regex

    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        extract_by_regex(F.col("text"), r"the ([a-z]+)").alias("after_the"),
    )


# ---------------------------------------------------------------------------
# §2.9 remaining dispatch operators
# ---------------------------------------------------------------------------


def q_d2_page0_dispatch(spark, sf):
    """D2: document-type dispatch on page-0 content (oddo:427-435)."""
    d = load(spark, sf, "documents")
    page0 = F.substring("text", 1, 80)
    cls = (
        F.when(page0.contains("spark"), "spark_doc")
        .when(page0.contains("data"), "data_doc")
        .otherwise("other")
    )
    # per-document classes, not the 3-row count rollup (r02: thin evidence)
    return d.withColumn("doc_class", cls).select("doc_id", "doc_class")


def q_d3_header_variant(spark, sf):
    """D3: header-regex chooses the column grid per line
    (banque/parser.py:48-121)."""
    s = load(spark, sf, "supplier")
    line = F.when(
        F.col("s_suppkey") % 2 == 0,
        F.concat(
            F.rpad(F.concat(F.lit("T1 "), F.col("s_name")), 40, " "),
            F.col("s_nationkey").cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.rpad(F.concat(F.lit("T2 "), F.col("s_name")), 50, " "),
            F.col("s_nationkey").cast("string"),
        )
    )
    d = s.select("s_suppkey", line.alias("line"))
    v = F.when(F.col("line").startswith("T1"), 0).otherwise(1)
    c0 = F.trim(
        F.when(v == 0, F.substring("line", 1, 40)).otherwise(
            F.substring("line", 1, 50)
        )
    )
    c1 = F.trim(
        F.when(v == 0, F.substring("line", 41, 100000)).otherwise(
            F.substring("line", 51, 100000)
        )
    )
    return d.select(
        "s_suppkey", v.alias("variant"), c0.alias("c0"), c1.alias("c1")
    )


def q_d4_shape_dispatch(spark, sf):
    """D4: token-count drives the realignment recipe (four/parser.py:16-32)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 17 == 0)
    base = F.concat_ws(
        "  ",
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        (F.col("l_partkey") % 100).cast("string"),
        (F.col("l_suppkey") % 100).cast("string"),
    )
    line = F.when(
        F.col("l_linenumber") % 2 == 0,
        F.concat((F.col("l_orderkey") % 89).cast("string"), F.lit("  "), base),
    ).otherwise(base)
    arr = F.split(line, "  ")
    shape = F.size(arr)
    off = F.when(shape == 5, 1).otherwise(0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        shape.alias("shape"),
        F.element_at(arr, off + 1).alias("c0"),
        F.element_at(arr, off + 2).alias("c1"),
        F.element_at(arr, off + 3).alias("c2"),
        F.element_at(arr, off + 4).alias("c3"),
    )


def q_d5_fallback_chain(spark, sf):
    """D5: primary extraction falls back to a secondary pattern
    (roth/parser.py:186-187, 418-427)."""
    d = load(spark, sf, "documents")
    p1 = F.regexp_extract(F.col("text"), r"spark ([a-z]+)", 1)
    p2 = F.regexp_extract(F.col("text"), r"the ([a-z]+)", 1)
    picked = (
        F.when(p1 != "", p1).when(p2 != "", p2).otherwise(F.lit("none"))
    )
    return d.select("doc_id", picked.alias("picked"))


def q_d5_rename_retry(spark, sf):
    """D5 token-rename retry through the REAL manifest join
    (roth/parser.py:418-427 via operators/joins.py::join_manifest):
    report names spelled 'europe' match website names spelled 'Euro '
    ONLY for the toc_rename_fr archetype (the rename residual), and the
    output keeps the website's original EURO spelling; the same mismatch
    under a non-retry archetype stays NULL."""
    from .operators.joins import join_manifest

    c = load(spark, sf, "customer")
    k = F.col("c_custkey")
    h = c.filter(k < 240).select(
        k.alias("hid"),
        F.concat(F.lit("u"), (k % 40).cast("string")).alias("url"),
        F.when(k % 2 == 0, F.lit("toc_rename_fr"))
        .otherwise(F.lit("toc_grid_fr"))
        .alias("doc_class"),
        F.concat(
            F.lit("europe fund "), (k % 40).cast("string")
        ).alias("fund_name_report"),
    )
    man = c.filter(k < 40).select(
        F.concat(
            F.lit("Euro Fund "), k.cast("string"), F.lit(" - Cap")
        ).alias("name"),
        F.concat(F.lit("u"), k.cast("string")).alias("pdf_url"),
        F.concat(F.lit("IS"), k.cast("string")).alias("isin"),
    )
    return join_manifest(h, man).select(
        "hid", "url", "doc_class", "fund_name_website", "isin"
    )


# ---------------------------------------------------------------------------
# training-data ops: dedup / similarity / text analysis
# ---------------------------------------------------------------------------


def q_d1_manifest_routing(spark, sf):
    """D1 manifest-name routing through the REAL dispatch operator
    (plans/dispatch.py::classify + route_map; crelan/parser.py:736-763):
    a synthetic pages/manifest pair built from customer rows — urls whose
    manifest names carry the METROPOLITAN token route to
    manifest_grid_fr regardless of page-0 content; the rest fall through
    to the page-0 when-chain (toc / keyword t1 / keyword t2)."""
    from .plans.dispatch import classify

    c = load(spark, sf, "customer")
    k = F.col("c_custkey")
    url = F.concat(F.lit("u"), (k % 60).cast("string"))
    text_c = (
        F.when(k % 3 == 0, F.lit("RAPPORT ANNUEL X\fbody"))
        .when(k % 3 == 1, F.lit("ANNUAL REPORT Y\fbody"))
        .otherwise(F.lit("SEMI-ANNUAL REPORT Z\fbody"))
    )
    # url determines k%60, which determines k%3: the dedupe is exact
    pages = (
        c.filter(k < 180)
        .select(url.alias("url"), text_c.alias("text"))
        .dropDuplicates(["url"])
    )
    man = c.filter(k < 300).select(
        F.concat(F.lit("u"), (k % 60).cast("string")).alias("pdf_url"),
        F.when(
            k % 5 == 0,
            F.concat(F.lit("METROPOLITAN FUND "), (k % 60).cast("string")),
        )
        .otherwise(F.concat(F.lit("FUND "), (k % 60).cast("string")))
        .alias("name"),
    )
    return classify(pages, man).select("url", "doc_class")


def q_d2_family_fallback(spark, sf):
    """D2 family fallback through the REAL dispatch operator
    (plans/dispatch.py::classify; oddo/parser.py:427-435 else-branch):
    marked page-0 classifies by content and WINS over the family token;
    unmarked page-0 with a family-token manifest falls back to
    keyword_scan_en_t3; unmarked without the token stays NULL."""
    from .plans.dispatch import classify

    c = load(spark, sf, "customer")
    k = F.col("c_custkey")
    url = F.concat(F.lit("u"), (k % 60).cast("string"))
    text_c = (
        F.when(k % 3 == 0, F.lit("ANNUAL REPORT X\fbody"))
        .when(k % 3 == 1, F.lit("FUND FACTS Y\fbody"))
        .otherwise(F.lit("NEWSLETTER Z\fbody"))
    )
    # url determines k%60, which determines k%3 and parity: exact dedupe
    pages = (
        c.filter(k < 180)
        .select(url.alias("url"), text_c.alias("text"))
        .dropDuplicates(["url"])
    )
    man = c.filter(k < 300).select(
        F.concat(F.lit("u"), (k % 60).cast("string")).alias("pdf_url"),
        F.when(
            (k % 60) % 2 == 0,
            F.concat(
                F.lit("PROVIDER_KEYWORD_EN FUND "), (k % 60).cast("string")
            ),
        )
        .otherwise(F.concat(F.lit("OTHER FUND "), (k % 60).cast("string")))
        .alias("name"),
    )
    return classify(pages, man).select("url", "doc_class")


def q_f_hard_name_clean(spark, sf):
    """Crelan hard clean() (crelan/parser.py:644-656) over adversarial
    bond-code names built from part rows: lowercase purge, contextual '%'
    removal, post-digit letter removal, digit-space collapse, plus the
    'nan' sentinel.  The oracle reproduces each sequential regex pass as
    a per-character keep predicate (DuckDB's RE2 has no lookarounds)."""
    from .functions import strings

    p = load(spark, sf, "part")
    k = F.col("p_partkey")
    raw = F.when(k % 97 == 0, F.lit("nan")).otherwise(
        F.concat(
            F.upper(F.substring("p_name", 1, 4)),
            F.lit(" "),
            F.col("p_name"),
            F.lit(" "),
            (k % 9).cast("string"),
            F.lit(","),
            (k % 90 + 10).cast("string"),
            F.lit("%"),
            F.when(k % 3 == 0, F.lit(" ")).otherwise(F.lit("")),
            (k % 28 + 1).cast("string"),
            F.lit("/"),
            (k % 12 + 1).cast("string"),
            F.when(k % 4 == 0, F.lit(" 2y")).otherwise(F.lit(" 30BX9")),
        )
    )
    return p.select(
        k.cast("long").alias("id"),
        strings.collapse_ws(strings.hard_clean_crelan(raw)).alias(
            "name_clean"
        ),
    )


def _ws_noise(k):
    """doc_id-derived multi-whitespace suffix (tab / newline / NBSP /
    CR / double spaces) injected into the token-consuming driver
    queries so their oracles are NON-VACUOUS about the whitespace-run
    split: a single-space tokenizer regression disagrees the moment
    this text lands (round-3 verdict wrongness #1).  Mirrored byte for
    byte by _WS_NOISE_SQL."""
    return (
        F.when(k % 3 == 0, F.lit("\tws\nprobe  end"))
        .when(k % 3 == 1, F.lit(" nb\u00a0sp\r"))
        .otherwise(F.lit(""))
    )


_WS_NOISE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN chr(9) || 'ws' || chr(10) || 'probe  end' "
    "WHEN 1 THEN ' nb' || chr(160) || 'sp' || chr(13) ELSE '' END"
)


def _with_ws_noise(d):
    """documents frame with the whitespace-probe suffix appended."""
    return d.withColumn(
        "text", F.concat(F.col("text"), _ws_noise(F.col("doc_id")))
    )


def _spread(spark, df, key="doc_id"):
    """Scan-parallelism restoration for HEAVY narrow chains (r06, guide
    §2.5 input skew / §6 input splits): the sandbox testdata tables are
    ONE parquet row group, so a scan yields a single partition and every
    narrow map stage above it runs on 1 of N cores — measured 6-17 s
    serial for the heavy text/html chains at sf1.0 while the same work
    spread over 32 cores prices under 2 s.  ONE narrow re-key below the
    scan restores the parallelism a production multi-split layout gives
    for free; the helper is a NO-OP whenever the scan already yields >=
    defaultParallelism splits, so it cannot add an exchange at scale.
    Applied per-QUERY at the fixture edge (the _corpus_with_dupes
    precedent) — operators themselves stay zero-exchange narrow.  Only
    queries whose map cost dominates the ~0.3 s shuffle are spread (the
    dedup_exact lesson: a cheap query loses more to the exchange than
    the parallelism returns)."""
    if df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism, key)


def _corpus_with_dupes(spark, sf):
    """documents (with the whitespace probe of _ws_noise) plus shifted
    copies of every 50th doc — deterministic near/exact duplicates so
    dedup queries return non-trivial results.  The probe is applied
    BEFORE the dup union, so exact copies stay exact.

    The corpus is repartitioned by doc_id: the sandbox testdata is ONE
    parquet file, so the scan yields a single partition and every heavy
    map stage above it (tokenize/shingle/fingerprint — the dominant
    cost of the dedup family) would run serial (measured 6 s for the
    64-bit fingerprint alone at sf0.1).  Production scans arrive in
    thousands of splits; ONE narrow re-key of the raw text restores
    that parallelism and is amortized by every downstream stage."""
    d = _with_ws_noise(load(spark, sf, "documents"))
    dup = d.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return d.unionByName(dup).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def q_dedup_exact(spark, sf):
    return dedup.exact_dedup(_corpus_with_dupes(spark, sf)).select(
        "digest", "keep_id", "n_copies"
    )


def q_dedup_soft_weights(spark, sf):
    """Soft exact dedup: every row survives with weight
    min(1, 2/n_copies).  The dup fixture's pair groups alone would be
    vacuous at max_weight_copies=2 (all weights 1), so a SECOND copy
    of every 100th doc makes 3-copy groups — the gate sees the cap
    hold on pairs (weight 1) AND the division fire on triples
    (0.666667).  Oracle = count per md5 digest joined back."""
    d = _corpus_with_dupes(spark, sf)
    extra = d.filter(
        (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < 1000000)
    ).withColumn("doc_id", F.col("doc_id") + 2000000)
    return dedup.soft_dedup_weights(
        d.unionByName(extra), max_weight_copies=2
    )


def q_dedup_ngram_jaccard(spark, sf):
    """max_df=4 exercises the hot-shingle document-frequency cap (the
    100x skew guard) — the cap provably fires at sf0.01 (max organic DF
    is 5) and the oracle applies the identical filter."""
    return dedup.ngram_jaccard_pairs(
        _corpus_with_dupes(spark, sf),
        bucket_cols=["lang", "source"],
        threshold=0.5,
        max_df=4,
    )


def q_dedup_minhash_lsh(spark, sf):
    return dedup.minhash_lsh_pairs(_corpus_with_dupes(spark, sf))


def q_dedup_jaccard_estimate(spark, sf):
    """MinHash estimate-vs-exact Jaccard audit over the standard dupes
    corpus: exact copies sit at est=1.0/exact=1.0 (abs_err 0), organic
    near-dups spread across the 1/8-granular estimate lattice with
    non-zero errors — the sketch-quality signal a pipeline reads to
    size n_hashes.  Oracle = the shared _MH_PAIRS chain + unrolled
    per-position signature agreement + the shingle-join exact
    intersection."""
    return dedup.minhash_jaccard_estimate(_corpus_with_dupes(spark, sf))


def q_dedup_incremental(spark, sf):
    """Crawl-over-crawl incremental dedup: a NEW batch (exact copies of
    every 25th reference doc + fresh doc_id-derived documents sharing no
    reference shingles) flagged against the REFERENCE corpus via
    incremental_lsh_flags — the form a recurring ingest runs so the
    history is never re-paired with itself.  max_band_freq=8 exercises
    the reference-side hot-band cap on the same plan."""
    ref = (
        _with_ws_noise(load(spark, sf, "documents"))
        .select("doc_id", "text")
        # restore scan parallelism for the shingle/signature map stage
        # (single-file sandbox layout — see _corpus_with_dupes)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    copies = ref.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 2000000
    )
    fresh = ref.filter(F.col("doc_id") % 9 == 4).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.lit("fresh unseen document number "),
            F.col("doc_id").cast("string"),
            F.lit(" standalone content block"),
        ).alias("text"),
    )
    return dedup.incremental_lsh_flags(
        copies.unionByName(fresh), ref, max_band_freq=8
    )


def q_dedup_bloom(spark, sf):
    """Bloom-filter paragraph dedup (the Dolma-BFF shape): the filter
    is built from the EVEN-doc_id half of an injected paragraph corpus
    and probes the ODD half.  Probe paragraphs: the corpus-wide footer
    (indented trim-variant on doc_id%3==1) and the g-group (mod 7,
    residues covered by both parities) hit; the q-group (odd-only) and
    most upara lines miss — EXCEPT odd doc_id%3==0 docs whose upara
    copies an even doc's, lifting them over the 0.6 drop threshold.
    False positives from the 4096-bit filter are deterministic and
    mirrored exactly by the oracle (that IS Bloom semantics)."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    a = F.when(
        F.col("doc_id") % 3 == 1, F.lit("  SHARED BLOOM FOOTER ")
    ).otherwise(F.lit("SHARED BLOOM FOOTER"))
    b = F.concat(
        F.lit("upara "),
        F.when(
            (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 == 0),
            F.col("doc_id") - 1,
        )
        .otherwise(F.col("doc_id"))
        .cast("string"),
    )
    c = F.concat(F.lit("g"), (F.col("doc_id") % 7).cast("string"))
    e = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("r")).otherwise(
            F.lit("q")
        ),
        (F.col("doc_id") % 5).cast("string"),
    )
    inj = d.select(
        "doc_id", F.concat_ws("\n\n", a, b, c, F.lit(""), e).alias("text")
    )
    return dedup.bloom_dedup_flags(
        inj.filter(F.col("doc_id") % 2 == 0),
        inj.filter(F.col("doc_id") % 2 == 1),
        m=4096,
        k_hashes=3,
        max_flag_frac=0.6,
    )


def q_dedup_keep_best(spark, sf):
    """Per-cluster best-representative selection: base docs plus two
    quality-SHIFTED copies (appended tokens change the classifier
    score, so clusters are non-degenerate — the argmax genuinely
    differs from keep-lowest-id wherever a copy scores higher) wired
    into clusters by an explicit pair graph (the pair table is the
    operator's input contract; candidate generation is separately
    in-window via corpus_split_safe / end_to_end).  %50 docs form
    3-member clusters (base + both copies), %25-only docs pairs.
    Oracle = recursive-CTE components + the shared classifier chain +
    row_number over (score DESC, doc_id)."""
    d = _with_ws_noise(load(spark, sf, "documents")).select(
        "doc_id", "text"
    )
    v1 = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" absolutely wonderful")).alias(
            "text"
        ),
    )
    v2 = d.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" terrible awful spam")).alias(
            "text"
        ),
    )
    corpus = d.unionByName(v1).unionByName(v2).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1000000).alias("id_b"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 50 == 0).select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 2000000).alias("id_b"),
            )
        )
    )
    scored = text.quality_classifier(corpus).select("doc_id", "score")
    return dedup.cluster_keep_best(scored, pairs, "score")


def q_dedup_simhash(spark, sf):
    return dedup.simhash16(
        _with_ws_noise(load(spark, sf, "documents"))
    ).select(F.col("sid").alias("doc_id"), "simhash")


def q_dedup_simhash64(spark, sf):
    """64-bit SimHash — the 10^12-scale fingerprint width (16 bits is
    collision-prone as a near-dup key beyond ~10^5 docs)."""
    return dedup.simhash_bits(
        _with_ws_noise(load(spark, sf, "documents")), 64
    ).select(F.col("sid").alias("doc_id"), "simhash")


def q_dedup_simhash_pairs(spark, sf):
    """SimHash banded near-dup pairing (64-bit, 4 bands of 16 — the
    classic web-scale configuration, exact for hamming <= 3 by
    pigeonhole) with the hot-band frequency cap active (template-heavy
    corpora degenerate narrow bands toward all-pairs — measured 71% of
    ALL pairs as candidates with 8-bit bands at sf0.1).  The corpus is
    documents + exact copies (+1e6, hamming 0) + one-token-appended
    near copies (+2e6, a few tie-bits flip) of every 50th doc, so BOTH
    the zero and nonzero Hamming verify paths return rows at any sf."""
    d = _with_ws_noise(load(spark, sf, "documents")).select(
        "doc_id", "text"
    )
    fifty = d.filter(F.col("doc_id") % 50 == 0)
    exact = fifty.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = fifty.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" simprobe")).alias("text"),
    )
    # repartition: restore scan parallelism for the fingerprint map
    # stage (single-file sandbox layout — see _corpus_with_dupes)
    return dedup.simhash_pairs(
        d.unionByName(exact)
        .unionByName(near)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id"),
        n_bits=64,
        n_bands=4,
        max_band_freq=50,
    )


def q_dedup_simhash_pairs_mp(spark, sf):
    """Multi-probe SimHash pairing at hamming <= 6 (r04 verdict next
    #5): C(8,2) = 28 block-combination key tables of 16-bit keys —
    larger exact radius than the 4-band form without the 8-bit-band
    degeneracy.  The corpus adds a THIRD copy class (+3e6,
    three-token-appended) so mid-radius pairs (hamming 4..6, invisible
    to the radius-3 query) are represented at any sf.  The oracle is
    the INDEPENDENT brute-force Hamming ball — valid because the
    block-combination candidates are pigeonhole-exact at radius 6."""
    d = _with_ws_noise(load(spark, sf, "documents")).select(
        "doc_id", "text"
    )
    fifty = d.filter(F.col("doc_id") % 50 == 0)
    exact = fifty.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = fifty.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" simprobe")).alias("text"),
    )
    far = fifty.select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" simprobe midradius flip")
        ).alias("text"),
    )
    # repartition: restore scan parallelism for the fingerprint map
    # stage (single-file sandbox layout — see _corpus_with_dupes)
    return dedup.simhash_pairs_multiprobe(
        d.unionByName(exact)
        .unionByName(near)
        .unionByName(far)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id"),
        n_bits=64,
        n_blocks=8,
        key_blocks=2,
    )


def q_dedup_semantic(spark, sf):
    """SemDeDup: k-means-cell bucketing (the same deterministic
    ivf_fit_local quantizer as ann_ivf_topk, centroids embedded as
    literals in BOTH engines) -> within-cell cosine >= 0.35 against any
    lower id -> keep decision.  Exact copies of every 25th vector
    guarantee dropped rows at any sf (cos 1.0 inside the same cell);
    threshold 0.35 sits inside the natural pair distribution so
    organic drops occur too (the dedup_embedding_cosine rationale)."""
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    dup = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    cents = similarity.ivf_fit_local(sf, n_cells=8, iters=2)
    return similarity.semantic_dedup(
        emb.unionByName(dup), cents, threshold=0.35
    )


def q_corpus_embed_prune(spark, sf):
    """Prototype pruning over the embeddings table: the same
    deterministic ivf_fit_local quantizer as ann_ivf_topk/dedup_semantic
    (centroid literals in BOTH engines), cosine-to-own-centroid
    prototypicality, per-cell exact 0.3-quantile cut.  Non-vacuous by
    construction: a percentile cut always splits every non-degenerate
    cell into kept and pruned rows.  Oracle = the shared argmax
    assignment CTE + quantile_cont (lazily built at gate time like the
    IVF/semantic oracles)."""
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 300)
    cents = similarity.ivf_fit_local(sf, n_cells=8, iters=2)
    return similarity.prototype_prune(emb, cents, q=0.3)


def q_dedup_embedding_cosine(spark, sf):
    """Embedding-cosine near-dup pairs above a threshold.

    Two non-vacuity guarantees (the 0.5-threshold version returned 0 rows
    both sides — a green that proved nothing about the cosine math):
      - threshold 0.35 sits inside the natural pair distribution at the
        driver's sf (41 organic pairs at sf0.01);
      - every 25th vector is unioned back as an exact copy (cos == 1.0),
        so the result is non-empty at ANY scale factor.
    """
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    dup = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    return similarity.cosine_near_dup_pairs(
        emb.unionByName(dup), threshold=0.35
    )


def q_dedup_embedding_cosine_lsh(spark, sf):
    """The composed SCALE path for embedding near-dup: multi-table LSH
    candidates -> exact-cosine verify (never the O(n^2) pair join).
    Deterministic (md5-derived hyperplanes), so the oracle reproduces the
    buckets and the exact same pair set in SQL."""
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    dup = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    return similarity.near_dup_pairs_lsh(
        emb.unionByName(dup), threshold=0.35, n_planes=2, n_tables=3
    )


def q_dedup_url_canonical(spark, sf):
    """URL-level dedup on canonicalized urls (operators/urls.py) — four
    dirty variants per logical url (scheme/host case, www., tracking
    params, trailing slash + fragment) must collapse to one canonical
    key.  The oracle reconstructs the canonical form from the same key
    arithmetic."""
    from .operators.urls import url_dedup

    c = load(spark, sf, "customer")
    lid = (F.col("c_custkey") % 300).cast("string")
    v = F.col("c_custkey") % 4
    tail = F.concat(
        F.lit("shop-"), lid, F.lit(".com/r/"), lid, F.lit("?x="), lid
    )
    url = (
        F.when(v == 0, F.concat(F.lit("https://"), tail))
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW.SHOP-"), lid, F.lit(".COM/r/"), lid,
                F.lit("?x="), lid,
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://shop-"), lid, F.lit(".com/r/"), lid,
                F.lit("?utm_source=ad&x="), lid, F.lit("&gclid=zz"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://shop-"), lid, F.lit(".com/r/"), lid,
                F.lit("/?x="), lid, F.lit("#frag"),
            )
        )
    )
    d = c.select(F.col("c_custkey").alias("doc_id"), url.alias("url"))
    return url_dedup(d)


def q_dedup_corpus_keep(spark, sf):
    """The composed training-corpus dedup decision — what a data pipeline
    actually ships: exact dedup (keep min id per content digest), then
    near-dup removal over the survivors (bucketed shingle Jaccard with
    the hot-shingle cap; higher id of each pair dropped).  Every stage is
    the already-oracle-checked operator; this entry checks the
    COMPOSITION end-to-end."""
    corpus = _corpus_with_dupes(spark, sf)
    ex = dedup.exact_dedup(corpus)
    survivors = corpus.join(
        ex.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    pairs = dedup.ngram_jaccard_pairs(
        survivors, bucket_cols=["lang", "source"], threshold=0.5, max_df=4
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return survivors.join(drop, "doc_id", "left_anti").select("doc_id")


def q_ann_cosine_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    return similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    ).withColumn("rnk", F.col("rnk").cast("long"))


def q_ann_lsh_topk(spark, sf):
    """n_planes pinned to 2 because the SQL oracle hardcodes the 2-plane
    bucket expressions; the operator's own default derives the count from
    the corpus size (lsh_plane_count) so production callers can't ship
    the sandbox constant."""
    emb = load(spark, sf, "embeddings")
    return similarity.lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_planes=2
    ).withColumn("rnk", F.col("rnk").cast("long"))


def q_ann_ivf_topk(spark, sf):
    """IVF ANN: deterministic quantizer fit -> cell-probed search.

    The SEARCH is now fully oracle-checked (r02 verdict item #7): the
    quantizer is ``ivf_fit_local`` — a deterministic driver-side Lloyd
    fit whose centroids are embedded as LITERALS in both this query and
    the SQL oracle (see _ivf_oracle_sql), so assignment/probe/scoring
    reproduce bit-identically (left-to-right float64 folds, explicit
    cid/vec_id tie-breaks).  The Spark-aggregation fit ``ivf_fit`` stays
    the production path, pinned by recall tests (full-probe == brute
    force) — its partition-order-dependent AVG floats are exactly why
    the gate uses the local fit."""
    emb = load(spark, sf, "embeddings")
    cents = similarity.ivf_fit_local(sf, n_cells=8, iters=2)
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), cents, k=5, n_probe=3
    ).withColumn("rnk", F.col("rnk").cast("long"))


# 5-language fixture sentences (pure doc_id-derived, mirrored verbatim
# by the SQL oracle; every 17th doc gets trigram-free digits so the
# 'unknown' branch is exercised too)
_LANGID_SENTS = [
    ("en", "the house and the garden of the old man going to the end "
           "of the road"),
    ("fr", "le chat et la maison des amis est dans le jardin avec les "
           "enfants et le chien"),
    ("de", "der hund und die katze sind in dem haus und die kinder "
           "singen ein lied"),
    ("es", "el perro y la casa de los amigos en el jardin con los "
           "abuelos y el gato"),
    ("it", "il cane e la casa di un amico nel giardino con il gatto "
           "di una bella sera"),
    ("pt", "a casa de um amigo que não vai para o jardim em lisboa "
           "não era de verão"),
    ("nl", "het huis van de man en een vrouw in de tuin met een hond "
           "van het kind"),
    ("sv", "det är ett hus och en katt som är för barnen och det var "
           "med en hund"),
]
_N_LANGS = len(_LANGID_SENTS)
_LANGID_UNKNOWN = "9876 54321 00"
# deliberately MIXED es/it/fr phrasing: argmax is still es but the
# margin lands ~0.236 — below the 0.3 confidence floor, so the
# confident=false routing path is represented (non-vacuous) at any sf
_LANGID_AMBIG = "de la casa de los amigos e il gatto de la sera era la"
_LANGID_AMBIG_LANG = "es"


def q_text_langid(spark, sf):
    """Multi-language character-trigram ID (en/fr/de/es/it/pt/nl/sv +
    unknown — widened from 5 to 8 languages, r04 verdict next #6) over
    a doc_id-derived fixture, now emitting the best-vs-second score
    MARGIN (the confident-vs-ambiguous routing signal).  The oracle
    regenerates the cosine scoring AND the margin from the SAME
    literal profile dict (LANG_TRIGRAM_PROFILES)."""
    d = load(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    sent = F.when(k % 17 == 0, F.lit(_LANGID_UNKNOWN)).when(
        k % 19 == 3, F.lit(_LANGID_AMBIG)
    )
    for i, (_, s) in enumerate(_LANGID_SENTS):
        sent = sent.when(k % _N_LANGS == i, F.lit(s))
    injected = _spread(
        spark, d.withColumn("text", sent.otherwise(F.lit("")))
    )
    return text.lang_id_trigram(injected).select(
        "doc_id", "lang_guess", "lang_score", "lang_margin"
    )


def q_text_quality(spark, sf):
    # _spread: heavy narrow chain over the single-row-group sandbox scan
    return text.quality_score(
        _spread(spark, load(spark, sf, "documents"))
    ).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "quality"
    )


def q_text_tokens(spark, sf):
    """Token counting, whitespace + BPE-ish regex (task brief).  The
    whitespace probe (_ws_noise) makes the whitespace-RUN split
    non-vacuous: a single-space tokenizer would miscount these rows."""
    d = _with_ws_noise(load(spark, sf, "documents"))
    return d.select(
        "doc_id",
        text.token_count(F.col("text")).cast("long").alias("ws_tokens"),
        text.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_text_fingerprint(spark, sf):
    return text.fingerprint(
        _with_ws_noise(load(spark, sf, "documents"))
    ).select("doc_id", "fp")


def q_corpus_text_filter(spark, sf):
    """The composed training-corpus TEXT filter decision — language match
    (heuristic guess == declared lang), quality floor, token bounds — the
    lang-ID + quality operators as they would actually ship."""
    d = text.quality_score(text.lang_id(load(spark, sf, "documents")))
    return (
        d.filter(
            (F.col("lang_guess") == F.col("lang"))
            & (F.col("quality") >= 0.42)
            & F.col("n_tokens").between(20, 90)
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "quality",
        )
    )


def q_text_repetition(spark, sf):
    """Gopher-style repetition filters over the documents table (task
    brief: quality scoring): duplicate-token fraction, duplicate-3-gram
    fraction, and top-3-gram mass — the standard signals for
    machine-generated/spammy webtext."""
    # _spread: heavy narrow chain over the single-row-group sandbox scan
    return text.repetition_stats(
        _spread(spark, load(spark, sf, "documents"))
    )


def q_text_char_entropy(spark, sf):
    """Character-class entropy over documents with a doc_id-derived
    digit/punctuation probe appended to a rotating third (the raw
    corpus is letters+spaces only, which would leave the digit and
    'other' classes vacuously zero).  The oracle regenerates the
    28-class count/fold chain from the same class list."""
    d = load(spark, sf, "documents")
    suffix = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" 0123456789!!"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" 42,42;"))
        .otherwise(F.lit(""))
    )
    return text.char_entropy(
        _spread(
            spark,
            d.select(
                "doc_id", F.concat(F.col("text"), suffix).alias("text")
            ),
        )
    )


def q_text_unigram_lm(spark, sf):
    """Unigram-LM quality score over documents with a doc_id-derived
    known-word probe (the synthetic corpus is mostly out-of-vocabulary,
    which would put every doc at the unknown floor): rotating suffixes
    mix known stopwords, unknowns, and nothing, so the mean log-prob
    separates the classes.  The oracle regenerates the lookup CASE from
    the same UNIGRAM_LOGPROBS dict."""
    d = load(spark, sf, "documents")
    m = F.col("doc_id") % 4
    suffix = (
        F.when(m == 0, F.lit(" the of and to"))
        .when(m == 1, F.lit(" The WAS unseenword"))
        .when(m == 2, F.lit(" is"))
        .otherwise(F.lit(""))
    )
    return text.unigram_logprob(
        _spread(
            spark,
            d.select(
                "doc_id", F.concat(F.col("text"), suffix).alias("text")
            ),
        )
    )


def q_text_bigram_lm(spark, sf):
    """Bigram-LM score over documents with a doc_id-derived probe that
    exercises every scoring path: in-table bigrams (word ORDER signal),
    known unigrams in an order that forces the backoff, case folding,
    unknown words, and empty suffixes.  The oracle regenerates both
    lookup CASEs from the same dicts and mirrors the first-term +
    ordered-fold addition order."""
    d = load(spark, sf, "documents")
    m = F.col("doc_id") % 4
    suffix = (
        F.when(m == 0, F.lit(" of the to be"))
        .when(m == 1, F.lit(" Of The unseenword"))
        .when(m == 2, F.lit(" the of"))
        .otherwise(F.lit(""))
    )
    return text.bigram_logprob(
        _spread(
            spark,
            d.select(
                "doc_id", F.concat(F.col("text"), suffix).alias("text")
            ),
        )
    )


def q_corpus_quality_ensemble(spark, sf):
    """Quality-ENSEMBLE decision: the three orthogonal quality signals
    (hashed-ngram classifier, unigram-LM logprob, Flesch readability)
    composed in ONE narrow plan via keep_cols threading — NO doc_id
    re-joins — with a 2-of-3 majority keep.  Thresholds sit at the
    corpus medians (probed at sf0.01: clf -0.024 / lm -6.54 / flesch
    38.4) so every vote splits the population and the majority rule is
    non-vacuous in both directions.  The probe suffix mixes known
    stopwords, punctuation, case, and unknowns so all three signals
    move.  Oracle = the shared classifier/unigram fragments + the
    readability formula over the same probe."""
    d = load(spark, sf, "documents")
    m = F.col("doc_id") % 4
    suffix = (
        F.when(m == 0, F.lit(" the of and to. it is!"))
        .when(m == 1, F.lit(" The WAS unseenword?"))
        .when(m == 2, F.lit(" is."))
        .otherwise(F.lit(""))
    )
    d = _spread(
        spark,
        d.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        ),
    )
    rd = text.readability(d).select("doc_id", "text", "flesch")
    clf = text.quality_classifier(rd, keep_cols=("flesch", "text"))
    ul = text.unigram_logprob(
        clf.withColumnRenamed("score", "clf_score"),
        keep_cols=("flesch", "clf_score"),
    )
    clf_pass = F.col("clf_score") >= -0.025
    lm_pass = F.col("avg_logprob") >= -6.5
    read_pass = F.col("flesch") >= 35.0
    n_pass = (
        clf_pass.cast("int") + lm_pass.cast("int") + read_pass.cast("int")
    )
    return ul.select(
        "doc_id",
        "clf_score",
        F.col("avg_logprob").alias("lm_logprob"),
        "flesch",
        n_pass.cast("long").alias("n_pass"),
        (n_pass >= 2).alias("keep"),
    )


def q_corpus_token_stats(spark, sf):
    """Per-source token-count distribution summary (exact interpolated
    percentiles p25/p50/p90/p99 + count/min/max/total) — the corpus
    report every curation run publishes.  Spark's exact percentile and
    DuckDB's quantile_cont share the same linear-interpolation
    definition, so the oracle matches bit for bit."""
    return text.token_count_stats(load(spark, sf, "documents"))


def q_corpus_ccnet_tiers(spark, sf):
    """CCNet head/middle/tail LM-quality routing per language — the
    per-language tercile split CCNet trains on.  The unigram-LM probe
    suffix (same rotation as text_unigram_lm) spreads scores so the
    cutoffs separate real classes; the table's lang column is the
    stratum.  The oracle recomputes the cutoffs with quantile_cont
    (same linear interpolation as Spark's exact percentile, both
    ROUND 6) and the same >= boundary rule."""
    d = load(spark, sf, "documents")
    m = F.col("doc_id") % 4
    suffix = (
        F.when(m == 0, F.lit(" the of and to"))
        .when(m == 1, F.lit(" The WAS unseenword"))
        .when(m == 2, F.lit(" is"))
        .otherwise(F.lit(""))
    )
    return text.ccnet_tiers(
        _spread(
            spark,
            d.select(
                "doc_id",
                "lang",
                F.concat(F.col("text"), suffix).alias("text"),
            ),
        )
    )


def q_text_quality_classifier(spark, sf):
    """fastText-style hashed bag-of-ngrams quality classifier (task
    brief: model-based quality scoring) over documents with the
    whitespace probe — non-vacuous about BOTH the whitespace-run split
    and the bigram construction (the probe's tab/newline-separated
    words create bigrams a single-space split would never form).  The
    oracle regenerates the 256-arm bucket CASE from the same
    CLASSIFIER_WEIGHTS dict (one site to edit)."""
    return text.quality_classifier(
        _spread(spark, _with_ws_noise(load(spark, sf, "documents")))
    )


def q_corpus_mixture_sample(spark, sf):
    """Temperature-based (alpha=0.5) source reweighting + deterministic
    realization — the data-mixing step.  The fixture skews the corpus
    so sqrt reweighting is non-trivial: sources whose md5 first hex
    digit is <= '7' get a doc_id-shifted duplicate block, <= '3' a
    second one (so per-source counts come in 1x/2x/3x bands and the
    realized keep rates differ across bands).  Output is all-integer
    (doc_id, source, src_n, src_w, keep_thr) — fully hash-checkable."""
    from .operators.sampling import mixture_sample

    d = load(spark, sf, "documents").select("doc_id", "source")
    h = F.substring(F.md5(F.col("source")), 1, 1)
    e1 = d.filter(h <= "7").select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "source"
    )
    e2 = d.filter(h <= "3").select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "source"
    )
    corpus = d.unionByName(e1).unionByName(e2)
    return mixture_sample(
        corpus, "source", "doc_id", target_total=200, alpha=0.5
    )


def q_dedup_winnow(spark, sf):
    """Winnowing fingerprints (k=5, w=4) over the dup-injected corpus:
    exact copies share every fingerprint and near copies share most
    (shared_frac non-vacuous at both ends); the ws-noise probes
    exercise the run split inside the window join.  Oracle = the same
    key encoding (md5 || lpad(10^9 - pos)), list_aggregate min, and
    min(doc)!=max(doc) cross test."""
    return dedup.winnow_stats(_corpus_with_dupes(spark, sf), k=5, w=4)


_MEDIA_HDR = "MEDIAHDR" * 16  # 128-byte shared "container header"


def q_media_chunk_dedup(spark, sf):
    """Binary chunk-dedup stats over blobs synthesized from the dupe
    corpus (testdata carries no binary column): blob = UTF-8 bytes of
    a 128-byte shared container header + the document text, chunked at
    64 bytes — EVERY blob shares its header chunks (corpus-wide
    boilerplate), exact copies share everything, unique docs share
    only the header.  First driver-gated row for the binary/multimodal
    family: blobs stay BinaryType through the operator.  Oracle = the
    same hex-grid chunking (hex() is identically uppercase in both
    engines; DuckDB md5 is VARCHAR-only, hence the hex form — see the
    operator docstring)."""
    from .operators.multimodal import chunk_dedup_stats

    d = _corpus_with_dupes(spark, sf).select(
        "doc_id",
        F.encode(
            F.concat(F.lit(_MEDIA_HDR), F.col("text")), "UTF-8"
        ).alias("blob"),
    )
    return chunk_dedup_stats(d, chunk_bytes=64)


def q_media_cdc_dedup(spark, sf):
    """Content-defined-chunking dedup stats over the same synthesized
    blobs as media_chunk_dedup PLUS a shift probe: every 60th doc gains
    a copy with ONE byte prepended — fixed-grid chunking would share
    nothing with the original (every 64-byte chunk shifts), CDC
    re-synchronizes at the first content-defined boundary and shares
    nearly everything.  Oracle = the same boundary rule (trailing
    8-byte window md5 first hex char '0') restated over the hex
    encoding."""
    from .operators.multimodal import cdc_chunk_stats

    # ONE repartition after the whole union (not _corpus_with_dupes'
    # per-branch re-key): the plan re-derives the fixture subtree per
    # stats consumer, so per-branch exchanges would triple
    d = _with_ws_noise(load(spark, sf, "documents")).select(
        "doc_id", "text"
    )
    dup = d.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    shifted = d.filter(F.col("doc_id") % 60 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "text"
    )
    corpus = (
        d.unionByName(dup)
        .unionByName(shifted)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    blobs = corpus.select(
        "doc_id",
        F.encode(
            F.concat(
                F.when(
                    F.col("doc_id") >= 3000000,
                    F.lit("Z" + _MEDIA_HDR),
                ).otherwise(F.lit(_MEDIA_HDR)),
                F.col("text"),
            ),
            "UTF-8",
        ).alias("blob"),
    )
    return cdc_chunk_stats(blobs)


def _html_page(body_tail=None, mid=None):
    """The shared html page-synth expression (nav + body paragraph +
    doc_id%3 tail), engine side — ONE site mirroring _HTML_PAGE_SQL.
    ``body_tail`` overrides the body paragraph's closing literal
    column; ``mid`` inserts a literal between body and tail."""
    m3 = F.col("doc_id") % 3
    tail = (
        F.when(m3 == 0, F.lit("<div>short</div>"))
        .when(
            m3 == 1,
            F.concat(
                F.lit("<p>"),
                F.substring(F.col("text"), 121, 100),
                F.lit(
                    " second paragraph continues with more visible"
                    " words.</p>"
                ),
            ),
        )
        .otherwise(
            F.lit(
                '<footer><a href="/t">All rights reserved terms'
                " privacy</a></footer>"
            )
        )
    )
    if body_tail is None:
        body_tail = F.lit(" body paragraph tail &amp; more.</p>")
    parts = [
        F.lit(
            "<html><head><script>var a=1;</script></head><body>"
            '<nav><a href="/">Home</a> <a href="/x">About</a></nav>'
            "<p>"
        ),
        F.substring(F.col("text"), 1, 120),
        body_tail,
    ]
    if mid is not None:
        parts.append(F.lit(mid))
    parts += [tail, F.lit("</body></html>")]
    return F.concat(*parts)


def q_html_main_content(spark, sf):
    """jusText/Boilerpipe-style HTML main-content extraction (the
    north-star DOM-heuristic stage) over html synthesized from the
    documents text: a script head, a link-dominated nav (dropped by
    link density), a long body paragraph (kept, with an &amp; entity
    probe), and a doc_id%3 tail — short block (len bar), second good
    paragraph, or a link-heavy footer.  Oracle restates the strip →
    block-split → per-block text/anchor-length → keep → ordered
    reconstruction chain with the identical regexes."""
    from .operators.html import main_content

    d = load(spark, sf, "documents")
    return main_content(
        _spread(spark, d.select("doc_id", _html_page().alias("html")))
    )


def q_html_outline(spark, sf):
    """Heading-outline extraction over synthesized html: an h1 from
    the text head, an entity-probed h2, and a doc_id%4 tail — an extra
    attributed h3, a BLANK h4 (kept with ''), a nested-inline h2, or
    no tail.  Oracle = the same two-group regexp_extract_all zipped by
    index + the shared block-text cleanup."""
    from .operators.html import outline

    d = load(spark, sf, "documents")
    m4 = F.col("doc_id") % 4
    tail = (
        F.when(
            m4 == 0,
            F.concat(
                F.lit('<h3 class="x">Deep '),
                (F.col("doc_id") % 9).cast("string"),
                F.lit("</h3>"),
            ),
        )
        .when(m4 == 1, F.lit("<h4>   </h4>"))
        .when(
            m4 == 2,
            F.lit("<h2>Nested <b>bold</b> heading</h2>"),
        )
        .otherwise(F.lit(""))
    )
    page = F.concat(
        F.lit("<h1>"),
        F.substring(F.col("text"), 1, 30),
        F.lit("</h1><p>body</p><h2>Sec &amp; "),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("</h2>"),
        tail,
    )
    return outline(d.select("doc_id", page.alias("html")))


def q_corpus_web_extract(spark, sf):
    """The extraction-tier capstone: html -> jusText main content ->
    quality classifier -> script-mix screen -> keep, composed as ONE
    narrow chain (keep_cols threading, no re-joins).  Same page synth
    as html_main_content plus a U+FFFD probe inside the KEPT body
    paragraph on doc_id%11==5, so the encoding screen fires on
    extracted (not raw) text.  keep = any good block AND rounded
    classifier score >= 0 AND not suspect.  Oracle = the shared
    _html_main_ctes chain + _classifier_ctes over the extracted text +
    the full script-mix rule."""
    from .operators.html import main_content

    d = load(spark, sf, "documents")
    body_tail = F.when(
        F.col("doc_id") % 11 == 5,
        F.lit(" body paragraph tail &amp; \ufffd more.</p>"),
    ).otherwise(F.lit(" body paragraph tail &amp; more.</p>"))
    page = _html_page(body_tail=body_tail)
    mc = main_content(
        _spread(spark, d.select("doc_id", page.alias("html")))
    )
    scored = text.quality_classifier(
        mc,
        text_col="main_text",
        keep_cols=("main_text", "n_good", "link_frac"),
    )
    mixed = text.script_mix_stats(
        scored,
        text_col="main_text",
        keep_cols=("main_text", "n_good", "link_frac", "score"),
    )
    return mixed.select(
        "doc_id",
        "n_good",
        "link_frac",
        "score",
        "suspect",
        (
            (F.col("n_good") > 0)
            & (F.col("score") >= 0.0)
            & ~F.col("suspect")
        ).alias("keep"),
        F.md5(F.col("main_text")).alias("text_digest"),
    )


def q_html_main_content_ctx(spark, sf):
    """jusText CONTEXT promotion (the block-fusion rule): the shared
    page synth plus a SHORT '<h3>Mid section</h3>' between the body
    paragraph and the %3 tail — promoted when its non-short neighbors
    are good (second-paragraph docs; edge counts good), never next to
    the link-dominated footer.  Oracle = the shared chain with the
    IGNORE-NULLS neighbor windows."""
    from .operators.html import main_content

    d = load(spark, sf, "documents")
    page = _html_page(mid="<h3>Mid section</h3>")
    return main_content(
        _spread(spark, d.select("doc_id", page.alias("html"))),
        context_pass=True,
    )


def _link_fixture_page():
    """Shared doc_id-derived link fixture: an absolute link with an
    entity-probed anchor, a relative link, and a %4 tail (commented-out
    link / href-less anchor / cased-www absolute / nothing)."""
    m4 = F.col("doc_id") % 4
    tail = (
        F.when(
            m4 == 0,
            F.lit('<!-- <a href="https://no.com">hidden</a> -->'),
        )
        .when(m4 == 1, F.lit('<a name="x">no href</a>'))
        .when(
            m4 == 2,
            F.lit('<a href="https://www.Ext.org/q">Www link</a>'),
        )
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit('<a href="https://site'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com/p/"),
        F.col("doc_id").cast("string"),
        F.lit('">Link &amp; '),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('</a><a href="/rel/'),
        (F.col("doc_id") % 3).cast("string"),
        F.lit('">Rel</a>'),
        tail,
    )


def q_html_links(spark, sf):
    """Outlink extraction over the shared link fixture: quoted
    absolute + relative hrefs extracted in order with cleaned anchor
    text; the commented-out link and the href-less anchor emit
    nothing.  Oracle = the same two-group extract_all zipped by index
    after the strip passes."""
    from .operators.html import links

    d = load(spark, sf, "documents")
    return links(d.select("doc_id", _link_fixture_page().alias("html")))


def q_html_metadata(spark, sf):
    """Head-metadata extraction over synthesized pages: a doc_id%5
    rotation covering cased <TITLE> with an entity probe, whitespace-
    padded titles, script/comment FAKE titles (must lose), an empty
    title (-> NULL), single- and double-quoted meta/link attributes,
    quoted/bare/single-quoted charsets, and lang attributes in both
    quote styles.  Oracle = the same five first-match extractions over
    the identically stripped html, regenerated from the engine's regex
    constants."""
    from .operators.html import metadata

    d = load(spark, sf, "documents")
    m5 = F.col("doc_id") % 5
    lang = (
        F.when(m5 == 0, F.lit(' lang="en-US"'))
        .when(m5 == 1, F.lit(" lang='fr'"))
        .otherwise(F.lit(""))
    )
    title = (
        F.when(
            m5 == 0,
            F.concat(
                F.lit("<TITLE>Doc &amp; "),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("</TITLE>"),
            ),
        )
        .when(
            m5 == 1,
            F.concat(
                F.lit("<title>  "),
                F.substring("text", 1, 20),
                F.lit("   more</title>"),
            ),
        )
        .when(
            m5 == 2,
            F.lit(
                '<script>var t="<title>zz</title>";</script>'
                "<!-- <title>ghost</title> -->"
            ),
        )
        .when(m5 == 3, F.lit("<title></title>"))
        .otherwise(
            F.concat(
                F.lit("<title>Plain "),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("</title>"),
            )
        )
    )
    desc = (
        F.when(
            m5 == 0,
            F.concat(
                F.lit(
                    '<meta name="description" content="Summary'
                    " &amp; "
                ),
                (F.col("doc_id") % 4).cast("string"),
                F.lit('">'),
            ),
        )
        .when(
            m5 == 1,
            F.concat(
                F.lit("<meta name='description' content='single "),
                (F.col("doc_id") % 6).cast("string"),
                F.lit("'>"),
            ),
        )
        .when(m5 == 3, F.lit('<meta name="description" content="   ">'))
        .otherwise(F.lit(""))
    )
    canon = (
        F.when(
            m5.isin(0, 3),
            F.concat(
                F.lit('<link rel="canonical" href="https://site'),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".com/p/"),
                F.col("doc_id").cast("string"),
                F.lit('">'),
            ),
        )
        .when(
            m5 == 2,
            F.concat(
                F.lit("<link rel='canonical' href='/rel/"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("'>"),
            ),
        )
        .otherwise(F.lit(""))
    )
    charset = (
        F.when(m5 == 0, F.lit('<meta charset="UTF-8">'))
        .when(m5 == 2, F.lit("<meta charset=utf-8>"))
        .when(m5 == 4, F.lit("<meta charset='ISO-8859-1'>"))
        .otherwise(F.lit(""))
    )
    page = F.concat(
        F.lit("<html"),
        lang,
        F.lit("><head>"),
        title,
        desc,
        canon,
        charset,
        F.lit("</head><body><p>"),
        F.substring("text", 1, 40),
        F.lit("</p></body></html>"),
    )
    return metadata(d.select("doc_id", page.alias("html")))


def q_html_tables(spark, sf):
    """HTML table extraction (the webtext cell grid) over synthesized
    pages: a cased <TABLE> with attributes, a %2 <thead> header row
    with an entity probe and a cased-attr <th>, a fixed data row, a %3
    second-row rotation (attr'd row with an EMPTY cell / whitespace
    inside the <td open tag / a cell-less row that must emit nothing),
    a %5 second table, and three decoys that must never match: a
    commented-out table, a <track> tag (the <tr prefix), and a
    script-quoted table.  Oracle = the same three-level extract_all
    chain (table -> tr -> td|th, two groups zipped by index) after the
    shared strip passes, regenerated from the engine's regex
    constants."""
    from .operators.html import tables

    d = load(spark, sf, "documents")
    return tables(
        _spread(
            spark,
            d.select("doc_id", _table_fixture_page().alias("html")),
        )
    )


def _table_fixture_page():
    """Shared doc_id-derived table fixture (see q_html_tables); the
    DuckDB restatement is _TABLE_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    head = F.when(
        did % 2 == 0,
        F.lit(
            '<thead><tr><th>Name</th><th CLASS="v">Val &amp; Co'
            "</th></tr></thead>"
        ),
    ).otherwise(F.lit(""))
    row1 = F.concat(
        F.lit("<tr><td>A"),
        (did % 10).cast("string"),
        F.lit("</td><td>"),
        (did % 100).cast("string"),
        F.lit("</td></tr>"),
    )
    m3 = did % 3
    row2 = (
        F.when(
            m3 == 0,
            F.concat(
                F.lit('<tr class="alt"><td>B'),
                (did % 5).cast("string"),
                F.lit("</td><td></td></tr>"),
            ),
        )
        .when(
            m3 == 1,
            F.concat(
                F.lit("<tr><td\n>B"),
                (did % 5).cast("string"),
                F.lit("</td></tr>"),
            ),
        )
        .otherwise(F.lit("<tr> </tr>"))
    )
    t2 = F.when(
        did % 5 == 0,
        F.concat(
            F.lit('<table id="t2"><tr><td>T2-'),
            (did % 7).cast("string"),
            F.lit("</td></tr></table>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('<p>pre</p><TABLE border="1">'),
        head,
        row1,
        row2,
        F.lit("</TABLE>"),
        t2,
        F.lit(
            '<!-- <table><tr><td>ghost</td></tr></table> -->'
            '<track src="x">'
            '<script>var t = "<table><tr><td>js</td></tr></table>";'
            "</script>"
        ),
    )


def q_html_lists(spark, sf):
    """HTML list extraction (<ul>/<ol> items as relational rows) over
    synthesized pages: a cased <UL> with attributes holding an
    entity-probed item and a cased-attr item, a %3 third-item rotation
    (whitespace inside the <li open tag / an EMPTY item kept as '' /
    an UNCLOSED item that must be dropped), a %2 cased <OL> (ordered
    flag), a %5 nested ul+ol whose outer body truncates at the first
    close of either kind (inner items attribute to the outer list),
    and three decoys that must never match: a commented-out list, a
    <link> tag (the <li prefix), and a script-quoted list.  Oracle =
    the same two-level extract_all chain (list kind/body groups zipped
    by index -> li items) after the shared strip passes, regenerated
    from the engine's regex constants."""
    from .operators.html import lists

    d = load(spark, sf, "documents")
    return lists(d.select("doc_id", _list_fixture_page().alias("html")))


def _list_fixture_page():
    """Shared doc_id-derived list fixture (see q_html_lists); the
    DuckDB restatement is _LIST_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    m3 = did % 3
    rot = (
        F.when(
            m3 == 0,
            F.concat(
                F.lit("<li\n>Ws "),
                (did % 5).cast("string"),
                F.lit("</li>"),
            ),
        )
        .when(m3 == 1, F.lit("<li></li>"))
        .otherwise(F.lit("<li>dropped no close"))
    )
    ol2 = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<OL start="3"><li>Step '),
            (did % 5).cast("string"),
            F.lit("</li><li>Step b</li></OL>"),
        ),
    ).otherwise(F.lit(""))
    nested = F.when(
        did % 5 == 0,
        F.lit("<ul><li>outer</li><ol><li>inner</li></ol></ul>"),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('<p>pre</p><UL class="menu"><li>First &amp; '),
        (did % 7).cast("string"),
        F.lit('</li><li CLASS="x">Second '),
        (did % 10).cast("string"),
        F.lit("</li>"),
        rot,
        F.lit("</UL>"),
        ol2,
        nested,
        F.lit(
            "<!-- <ul><li>ghost</li></ul> -->"
            '<link href="x">'
            '<script>var l = "<ol><li>js</li></ol>";</script>'
        ),
    )


ROBOTS_RULES = [
    ("site0.com", "/", False),
    ("site0.com", "/p/", True),
    ("site1.com", "/p/1", False),
    ("site2.com", "/", True),
    ("site2.com", "/x/", False),
    ("site3.com", "/t/", True),
    ("site3.com", "/t/", False),
]


def q_html_pub_date(spark, sf):
    """Publish-date extraction over synthesized (html, url) pairs: a
    %6 rotation covering a valid article:published_time meta (a time
    tag present but outranked), an INVALID meta date (Feb 30) falling
    through to a leap-day <time> (years 2016/2020/2024 — the leap
    rule non-vacuous three ways), unpadded /Y/M/D/ url dates, /Y/M/
    url dates (day -> 01), an out-of-window url year (1990) plus a
    free-text datetime (both must yield NULL), and a no-candidate
    arm.  Dates vary with doc_id so the zero-pad and day-in-month
    arithmetic is exercised across the corpus.  Oracle = the same
    regex extracts + the same integer calendar validation,
    regenerated from the engine constants."""
    from .operators.html import publish_date

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    m6 = did % 6
    y0 = (2015 + did % 20).cast("string")
    mo0 = (1 + did % 12).cast("string")
    dy0 = (1 + did % 28).cast("string")
    iso0 = F.concat(
        y0,
        F.lit("-"),
        F.lpad(mo0, 2, "0"),
        F.lit("-"),
        F.lpad(dy0, 2, "0"),
    )
    leap_y = (2016 + (did % 3) * 4).cast("string")
    html = (
        F.when(
            m6 == 0,
            F.concat(
                F.lit(
                    '<meta property="article:published_time" '
                    'content="'
                ),
                iso0,
                F.lit(
                    'T08:30:00Z"><time datetime="2010-01-01">x'
                    "</time>"
                ),
            ),
        )
        .when(
            m6 == 1,
            F.concat(
                F.lit('<meta name="date" content="2021-02-30">'),
                F.lit('<time datetime="'),
                leap_y,
                F.lit('-02-29T00:00">y</time>'),
            ),
        )
        .when(m6 == 4, F.lit('<time datetime="May 5, 2020">w</time>'))
        .otherwise(F.lit("<p>no date markup</p>"))
    )
    url = (
        F.when(
            m6 == 2,
            F.concat(
                F.lit("https://ex.com/"),
                (2000 + did % 30).cast("string"),
                F.lit("/"),
                mo0,
                F.lit("/"),
                dy0,
                F.lit("/post"),
            ),
        )
        .when(
            m6 == 3,
            F.concat(
                F.lit("https://ex.com/"),
                (1996 + did % 30).cast("string"),
                F.lit("/"),
                mo0,
                F.lit("/archive"),
            ),
        )
        .when(m6 == 4, F.lit("https://ex.com/1990/05/06/old"))
        .otherwise(F.lit("https://ex.com/plain"))
    )
    return publish_date(
        d.select("doc_id", html.alias("html"), url.alias("url"))
    )


def q_corpus_robots_filter(spark, sf):
    """robots.txt longest-match crawl-policy filtering over a doc_id%7
    url rotation: disallow-all-except-/p/ (longest wins both ways), a
    partial-prefix /p/1 block (fires only on matching id ranges), a
    bare www/case url resolving to the '/' allow, an unlisted host, a
    junk url (NULL host -> allowed), and an exact-tie host where allow
    beats disallow at equal length.  Oracle = the rules as a VALUES
    CTE + regenerated host/path arithmetic + the ROW_NUMBER
    (len DESC, allow DESC) restatement of the argmax."""
    from .operators.urls import robots_filter

    d = load(spark, sf, "documents")
    rules = spark.createDataFrame(
        ROBOTS_RULES, "host string, path_prefix string, allow boolean"
    )
    did = F.col("doc_id")
    m7 = did % 7
    url = (
        F.when(
            m7 == 0,
            F.concat(
                F.lit("https://site0.com/p/"),
                (did % 97).cast("string"),
            ),
        )
        .when(
            m7 == 1,
            F.concat(
                F.lit("https://site0.com/other/"),
                (did % 5).cast("string"),
            ),
        )
        .when(
            m7 == 2,
            F.concat(
                F.lit("https://site1.com/p/"),
                (did % 23).cast("string"),
            ),
        )
        .when(m7 == 3, F.lit("https://www.Site2.com"))
        .when(
            m7 == 4,
            F.concat(F.lit("https://site9.com/p/"), did.cast("string")),
        )
        .when(
            m7 == 5,
            F.concat(F.lit("junk url "), did.cast("string")),
        )
        .otherwise(F.lit("https://site3.com/t/x"))
    )
    return robots_filter(d.select("doc_id", url.alias("url")), rules)


def q_corpus_link_graph(spark, sf):
    """Host-level link graph: outlinks from the shared fixture plus a
    doc_id-derived source host -> weighted (src, dst) edges; relative
    links become self-edges, the www/case absolute normalizes to
    ext.org.  The oracle REGENERATES the edges from the same
    arithmetic (the fixture hrefs are pure doc_id functions)."""
    from .operators.html import host_link_graph, links

    d = load(spark, sf, "documents")
    lk = links(d.select("doc_id", _link_fixture_page().alias("html")))
    src = F.concat(
        F.lit("host"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".net"),
    )
    return host_link_graph(lk.withColumn("src_host", src))


def q_corpus_anchor_text(spark, sf):
    """Per-target-host top-3 anchor terms over the shared link
    fixture: every doc contributes ('link', '&', digit) terms to its
    site<k>.com target, 'rel' self-edges, and the %4==2 arm sends
    ('www', 'link') to ext.org — counts, tie-breaks, and the k-prune
    all non-vacuous.  Oracle = the term table REGENERATED from the
    fixture arithmetic + the same (count DESC, term) ROW_NUMBER."""
    from .operators.html import anchor_terms, links

    d = load(spark, sf, "documents")
    lk = links(d.select("doc_id", _link_fixture_page().alias("html")))
    src = F.concat(
        F.lit("host"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".net"),
    )
    return anchor_terms(lk.withColumn("src_host", src), k=3)


def q_corpus_frontier_score(spark, sf):
    """The crawl-FRONTIER prioritization capstone: outlink candidates
    -> domain blocklist -> robots longest-match -> soft url-quality ->
    template-saturation counts -> host PageRank, fused into one ranked
    keep decision per DISTINCT candidate url (public practice:
    frontier schedulers rank by authority + novelty + policy).  Page
    synth gives every doc ONE absolute outlink with a doc_id%5
    quality-word arm (wiki/casino/news/download/blog), %7 target
    hosts, and %50 page ids, so every component varies; site5.com is
    blocklisted, ROBOTS_RULES block site0 ('/' disallow, the '/p/'
    allow never matches these paths) and allow site2 explicitly.
    ``n_seen`` counts blocklist-surviving candidate ROWS per (host,
    digit-template) — the saturation signal.  frontier_score =
    round(10·pr + url_score - 0.5·ln(1+n_seen), 6); keep = allowed
    AND score > 0.  Oracle composes the VALUES rules + ROW_NUMBER
    longest-match, the URL_WORD_WEIGHTS sum, the template counts, and
    the shared _pagerank_rounds_sql chain over the frontier edges."""
    from .operators.graph import pagerank
    from .operators.html import host_link_graph, links
    from .operators.urls import (
        filter_blocked_domains,
        robots_filter,
        url_quality_score,
        url_templates,
    )

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    arm = (
        F.when(did % 5 == 0, F.lit("wiki"))
        .when(did % 5 == 1, F.lit("casino"))
        .when(did % 5 == 2, F.lit("news"))
        .when(did % 5 == 3, F.lit("download"))
        .otherwise(F.lit("blog"))
    )
    page = F.concat(
        F.lit('<a href="https://site'),
        (did % 7).cast("string"),
        F.lit(".com/"),
        arm,
        F.lit("/p/"),
        (did % 50).cast("string"),
        F.lit('">go</a>'),
    )
    lk = links(
        _spread(spark, d.select("doc_id", page.alias("html")))
    )
    src = F.concat(
        F.lit("host"), (did % 4).cast("string"), F.lit(".net")
    )
    edges = host_link_graph(lk.withColumn("src_host", src))
    pr = pagerank(edges, iterations=2)

    cand = filter_blocked_domains(
        lk.select("doc_id", "href"), ["site5.com"], url_col="href"
    )
    rules = spark.createDataFrame(
        ROBOTS_RULES, "host string, path_prefix string, allow boolean"
    )
    rb = robots_filter(cand, rules, url_col="href", id_col="doc_id")
    uq = url_quality_score(
        rb,
        url_col="href",
        id_col="doc_id",
        keep_cols=("host", "allowed"),
    )
    tpl = url_templates(uq, url_col="href", id_col="doc_id", min_urls=1)
    with_tpl = uq.withColumn(
        "_tpl", F.regexp_replace(F.col("href"), "[0-9]+", "{n}")
    )
    joined = with_tpl.join(
        tpl.hint("shuffle_hash").select(
            F.col("host").alias("_th"),
            F.col("template").alias("_tt"),
            F.col("n_urls").alias("n_seen"),
        ),
        (F.col("host") == F.col("_th"))
        & (F.col("_tpl") == F.col("_tt")),
    )
    scored = joined.join(
        pr.hint("shuffle_hash").withColumnRenamed("node", "_pn"),
        F.col("host") == F.col("_pn"),
        "left",
    )
    prc = F.coalesce(F.col("pr"), F.lit(0.0))
    fs = F.round(
        F.lit(10.0) * prc
        + F.col("url_score")
        - F.lit(0.5) * F.log(F.lit(1.0) + F.col("n_seen")),
        6,
    )
    return scored.select(
        F.col("href"),
        F.col("host"),
        prc.alias("host_pr"),
        F.col("url_score"),
        F.col("n_seen"),
        F.col("allowed"),
        fs.alias("frontier_score"),
        (F.col("allowed") & (fs > F.lit(0.0))).alias("keep"),
    ).distinct()


def q_graph_pagerank(spark, sf):
    """Weighted PageRank (3 fixed iterations, damping 0.85) over the
    host link graph built from the shared link fixture — hub sites
    (every doc links site<k>.com) outrank the teleport floor, self
    -edges and the %4==2 ext.org arm spread the mass.  The oracle
    UNROLLS the three iterations as CTEs with the identical
    rounded-contribution + DECIMAL(38,12)-sum arithmetic."""
    from .operators.graph import pagerank
    from .operators.html import host_link_graph, links

    d = load(spark, sf, "documents")
    lk = links(
        _spread(
            spark,
            d.select("doc_id", _link_fixture_page().alias("html")),
        )
    )
    src = F.concat(
        F.lit("host"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".net"),
    )
    edges = host_link_graph(lk.withColumn("src_host", src))
    return pagerank(edges, iterations=3).select("node", "pr")


def q_graph_hits(spark, sf):
    """Weighted HITS (2 fixed iterations, L1 normalization) over the
    host link graph from the shared link fixture — host<k>.net sources
    are pure hubs, site<k>.com sinks pure authorities, self-edges give
    the .net hosts both sides.  Oracle = the four half-rounds UNROLLED
    as CTE triples (contribs, total, normalize) with the identical
    rounded-contribution + DECIMAL(38,12)-sum + guarded-division
    arithmetic."""
    from .operators.graph import hits
    from .operators.html import host_link_graph, links

    d = load(spark, sf, "documents")
    lk = links(
        _spread(
            spark,
            d.select("doc_id", _link_fixture_page().alias("html")),
        )
    )
    src = F.concat(
        F.lit("host"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".net"),
    )
    edges = host_link_graph(lk.withColumn("src_host", src))
    return hits(edges, iterations=2)


def q_graph_hop_distance(spark, sf):
    """Bounded BFS (max_hops=3) over a synthesized chain+shortcut
    graph: n<k> -> n<k+1> for k in 0..39 plus n<k> -> n<k+10>
    shortcuts on %5 nodes, seeds n0 / n25 / an isolated host absent
    from the graph (emits hops 0).  The shortcut arms make MIN across
    levels non-vacuous (n20 is 2 hops via two shortcuts, 20 via the
    chain; chain nodes near n25 resolve to the nearer seed).  Oracle =
    the three frontier levels unrolled as distinct-join CTEs + one
    final MIN."""
    from .operators.graph import hop_distance

    d = load(spark, sf, "documents")
    k = F.col("doc_id") % 40
    chain = d.select(
        F.concat(F.lit("n"), k.cast("string")).alias("src_host"),
        F.concat(F.lit("n"), (k + 1).cast("string")).alias("dst_host"),
    )
    short = d.filter(k % 5 == 0).select(
        F.concat(F.lit("n"), k.cast("string")).alias("src_host"),
        F.concat(F.lit("n"), (k + 10).cast("string")).alias("dst_host"),
    )
    seeds = spark.createDataFrame(
        [("n0",), ("n25",), ("isolated.seed",)], "host string"
    )
    return hop_distance(chain.unionByName(short), seeds, max_hops=3)


def q_text_line_stats(spark, sf):
    """Gopher LINE-level signals (bullet-start / ellipsis-end /
    duplicate-line fractions).  The synthetic corpus is single-line, so
    the query first INJECTS a deterministic doc_id-derived line
    structure (bullets, an indented duplicate, trailing ellipses, a
    blank line, and one untouched class) — both engines build the same
    multi-line text, then the oracle recomputes every fraction from
    first principles over the split/trimmed/non-blank line list."""
    d = load(spark, sf, "documents")
    s1 = F.substring("text", 1, 15)
    s2 = F.substring("text", 16, 15)
    m = F.col("doc_id") % 4
    injected = (
        F.when(
            m == 0,
            F.concat(
                F.lit("- "), s1, F.lit("\n"), s2,
                F.lit("...\n\n  "), s2, F.lit("..."),
            ),
        )
        .when(m == 1, F.concat(F.lit("* "), s1, F.lit("\n"), s2))
        .when(
            m == 2,
            F.concat(F.lit("•"), s1, F.lit("\n"), s2, F.lit("…")),
        )
        .otherwise(F.col("text"))
    )
    return text.line_stats(
        d.select("doc_id", injected.alias("text"))
    )


def q_corpus_source_stats(spark, sf):
    """Domain-level (per-source) corpus statistics + keep decision —
    CCNet/C4-style filtering on aggregate domain stats rather than only
    per-document scores."""
    return text.source_stats(load(spark, sf, "documents"))


def q_dedup_cluster_cc(spark, sf):
    """The transitive-closure dedup decision: MinHash-LSH candidate
    pairs -> connected components (iterative min-label propagation) ->
    one canonical survivor per cluster.  Pairwise keep-lower-id
    decisions over-delete chains (A~B, B~C deletes C even when A~C is
    false); components are the decision a corpus pipeline actually
    ships.  The oracle computes the same components with a recursive
    CTE — an independent fixpoint implementation."""
    corpus = _corpus_with_dupes(spark, sf)
    pairs = dedup.minhash_lsh_pairs(corpus)
    return dedup.cluster_keep_decision(corpus, pairs)


def q_corpus_split_safe(spark, sf):
    """Leakage-safe train/val/test split: near-dup CLUSTERS (the same
    MinHash-LSH pairs -> connected components as dedup_cluster_cc) are
    the assignment unit, so duplicates can never straddle train/val —
    the eval-contamination guarantee a per-document random split
    can't give.  Split = 4-hex salted-digest CASE over the cluster id
    (thresholds regenerated by the shared split_thresholds builder in
    BOTH engines).  The oracle recomputes the components with the
    recursive CTE and restates the CASE."""
    from .operators.sampling import split_assign

    corpus = _corpus_with_dupes(spark, sf)
    pairs = dedup.minhash_lsh_pairs(corpus)
    clustered = dedup.cluster_keep_decision(corpus, pairs)
    return split_assign(
        clustered.select("doc_id", "cluster_id"), "cluster_id"
    )


def q_corpus_vocab_topk(spark, sf):
    """Vocabulary induction over the ws-noise corpus: top-50 tokens by
    occurrence (ties broken by token asc — the k boundary is
    deterministic).  The probe suffixes inject ws-separated tokens so
    the gate is non-vacuous about the run split.  Oracle = UNNEST +
    count + the same ORDER BY / LIMIT."""
    return text.vocab_topk(
        _with_ws_noise(load(spark, sf, "documents")), k=50
    )


def q_text_tfidf_topk(spark, sf):
    """Per-document top-5 tf-idf terms over the ws-noise corpus: the
    probe suffixes create shared (low-idf) AND per-residue (higher-idf)
    tokens so both the idf spread and the rank tie-breaks are
    non-vacuous.  Oracle = the same two aggregations + smoothed-idf
    formula + ROW_NUMBER over the ROUNDED score."""
    return text.tfidf_topk(
        _spread(spark, _with_ws_noise(load(spark, sf, "documents"))),
        k=5,
    )


def q_corpus_inverted_index(spark, sf):
    """Inverted-index build over the ws-noise corpus: top-3 postings
    per token with df bounds [2, 400] — the probe tokens ('ws',
    'probe', 'end', 'nb', 'sp') recur in ~1/3 of docs so they survive
    the df pruning, corpus-wide stopword-ish tokens exceed max_df and
    are CUT (the cap is non-vacuous at sf0.01), and hapax tokens fall
    under min_df.  Oracle = the same two aggregations, the BETWEEN
    pruning, and ROW_NUMBER over (tf DESC, doc_id)."""
    return text.inverted_index(
        _with_ws_noise(load(spark, sf, "documents")),
        k=3, min_df=2, max_df=400,
    )


def q_corpus_robots_rules(spark, sf):
    """robots.txt parsing over %4 synthesized files: a standard
    group with crawl-delay + sitemap; a CRLF file with a TWO-agent
    group (the rule fans out to both), a trailing comment on a rule
    line, and an empty-value Allow; an invalid rules-before-any-group
    arm that must emit only its grouped tail; and an uppercase/tab
    arm pinning directive case-folding and [ \\t] trimming.  Oracle
    restates the line split, the three cleanup passes, the lag+cumsum
    grouping, and the agent fan-out join."""
    from .operators.urls import robots_rules

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    m4 = did % 4
    txt = (
        F.when(
            m4 == 0,
            F.lit(
                "User-Agent: *\nDisallow: /private/\n"
                "Allow: /private/ok\nCrawl-Delay: 2\n"
                "Sitemap: https://maps.example/s.xml"
            ),
        )
        .when(
            m4 == 1,
            F.lit(
                "# header\r\nUser-agent: googlebot\r\n"
                "User-Agent: bingbot\r\nDisallow: /a # note\r\n"
                "\r\nUser-agent: *\r\nAllow:\r\n"
            ),
        )
        .when(
            m4 == 2,
            F.lit("Disallow: /early\nUser-Agent: *\nDisallow: /x"),
        )
        .otherwise(F.lit("USER-AGENT:\t*\nDISALLOW:\t/Tab  "))
    )
    host = F.concat(F.lit("site"), did.cast("string"), F.lit(".org"))
    return robots_rules(
        d.select(host.alias("host"), txt.alias("robots_txt"))
    )


def q_corpus_warc_records(spark, sf):
    """WARC-archive ingestion over archives synthesized from the
    documents table: every doc carries a response record whose
    Content-Length TRUNCATES the payload for the %5 arm (the bounded-
    read rule is value-hashed via payload_md5), %3 docs append a
    second request record (multi-record archives, rec_no order), and
    %7 docs append a header-less metadata block that must surface as
    an is_valid=false row with its rec_no gap kept.  Oracle = the
    same version-line split + per-fragment header regexes + clen-
    bounded substr."""
    from .operators.warc import warc_records

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    crlf = F.lit("\r\n")
    p1 = F.substring(F.col("text"), 1, 60)
    l1 = F.when(
        did % 5 == 0, F.greatest(F.length(p1) - 10, F.lit(0))
    ).otherwise(F.length(p1))
    uri = F.concat(
        F.lit("https://ex"),
        (did % 20).cast("string"),
        F.lit(".org/p/"),
        did.cast("string"),
    )
    rec1 = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: response"), crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("WARC-Date: 2024-01-15T00:00:00Z"), crlf,
        F.lit("Content-Length: "), l1.cast("string"), crlf, crlf,
        p1, crlf, crlf,
    )
    rec2 = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: request"), crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("WARC-Date: 2024-01-15T00:00:01Z"), crlf,
        F.lit("Content-Length: 14"), crlf, crlf,
        F.lit("GET / HTTP/1.1"), crlf, crlf,
    )
    bad = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: metadata"), crlf,
        F.lit("No-Uri: x"), crlf, crlf,
        F.lit("junk"),
    )
    arc = F.concat(
        rec1,
        F.when(did % 3 == 0, rec2).otherwise(F.lit("")),
        F.when(did % 7 == 0, bad).otherwise(F.lit("")),
    )
    return warc_records(d.select("doc_id", arc.alias("warc")))


def q_text_license_detect(spark, sf):
    """License/compliance detection over %6 probe arms on a 50-char
    prose base: CC BY-SA prose (hits FOUR marker rows — the priority
    rule must pick cc-by-sa, not the 'cc by' prefix), an
    all-rights-reserved + © arm, a public-domain + CC0 arm, a
    dual-grant MIT+Apache arm (priority picks mit), a copyright-
    without-grant arm (license NULL, has_copyright true), and the
    no-injection negative.  Oracle = the same first-match CASE
    regenerated from LICENSE_MARKERS in table order."""
    d = load(spark, sf, "documents")
    base = F.substring(F.col("text"), 1, 50)
    m6 = F.col("doc_id") % 6
    inj = (
        F.when(
            m6 == 1,
            F.concat(
                base,
                F.lit(
                    " Licensed under a Creative Commons "
                    "Attribution-ShareAlike 4.0 license. CC BY-SA."
                ),
            ),
        )
        .when(
            m6 == 2,
            F.concat(
                base, F.lit(" © 2024 Example Corp. All Rights Reserved.")
            ),
        )
        .when(
            m6 == 3,
            F.concat(
                base, F.lit(" Released into the public domain (CC0).")
            ),
        )
        .when(
            m6 == 4,
            F.concat(
                base,
                F.lit(
                    " distributed under the MIT License and the "
                    "Apache License 2.0"
                ),
            ),
        )
        .when(
            m6 == 5,
            F.concat(base, F.lit(" copyright notice without a grant")),
        )
        .otherwise(base)
    )
    return text.license_stats(
        d.select("doc_id", inj.alias("text"))
    ).select(
        "doc_id", "license", "n_license_markers", "has_copyright",
        "is_openly_licensed",
    )


def q_corpus_sitemap_diff(spark, sf):
    """Sitemap-vs-crawl coverage audit composing sitemap_entries (the
    SAME shared fixture as corpus_sitemap) with a synthesized crawl
    set: %2 docs' crawl urls exactly match the decoded primary <loc>
    (covered), %3 docs crawl an undeclared url (orphan_page), and the
    /two/ + index-excluded locs stay uncrawled_seed — all three
    statuses dense at sf0.01.  Oracle reuses the sitemap entry chain
    verbatim as a CTE plus the same crawl arms + FULL OUTER join."""
    from .operators.urls import sitemap_coverage, sitemap_entries

    d = load(spark, sf, "documents")
    entries = sitemap_entries(
        d.select("doc_id", _sitemap_fixture_page().alias("xml"))
    )
    did = F.col("doc_id")
    crawl1 = d.filter(did % 2 == 0).select(
        F.concat(
            F.lit("https://www.Site"),
            (did % 7).cast("string"),
            F.lit(".com/page/"),
            (did % 50).cast("string"),
            F.lit("?a=1&b=2"),
        ).alias("url")
    )
    crawl2 = d.filter(did % 3 == 0).select(
        F.concat(
            F.lit("https://only-crawl.org/"), (did % 30).cast("string")
        ).alias("url")
    )
    return sitemap_coverage(entries, crawl1.unionByName(crawl2))


def q_graph_degree_stats(spark, sf):
    """Link-graph degree audit over the shared link fixture's edges
    PLUS a %5 reverse arm (site->host back-edges) so reciprocity is
    non-vacuous; the self-edges make has_self_loop fire and are
    excluded from reciprocity by the operator's rule.  Edges re-
    aggregate after the union (degree_stats expects one row per
    pair).  Oracle reuses the link-graph oracle verbatim as a CTE +
    the same reverse arm + integer degree arithmetic."""
    from .operators.graph import degree_stats

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    e1 = q_corpus_link_graph(spark, sf).select(
        "src_host", "dst_host", "n_links"
    )
    rev = d.filter(did % 5 == 0).select(
        F.concat(
            F.lit("site"), (did % 7).cast("string"), F.lit(".com")
        ).alias("src_host"),
        F.concat(
            F.lit("host"), (did % 4).cast("string"), F.lit(".net")
        ).alias("dst_host"),
        F.lit(1).cast("long").alias("n_links"),
    )
    edges = (
        e1.unionByName(rev)
        .groupBy("src_host", "dst_host")
        .agg(F.sum("n_links").alias("n_links"))
    )
    return degree_stats(edges)


def q_text_vocab_coverage(spark, sf):
    """Vocabulary-coverage eval over the ws-noise corpus at k=50: the
    probe tokens recur corpus-wide so they land in the vocab, while
    each doc's unique id-bearing tokens are OOV — every doc gets a
    non-trivial oov_frac.  Oracle = the same top-50 (count DESC,
    token) vocab + IN-vocab counting + ROUND-6 division."""
    return text.vocab_coverage(
        _with_ws_noise(load(spark, sf, "documents")), k=50
    )


def q_events_ab_lift(spark, sf):
    """A/B lift readout over a deterministically-skewed conversion
    set: purchases of user%3==0 are dropped BEFORE the salted-md5 arm
    split, so the arms (whose hex-parity assignment is independent of
    the %3 rule) convert at different rates and the lift is a
    non-trivial value.  All arithmetic is integer cross-products with
    single ROUND-6 divisions."""
    e = load(spark, sf, "events")
    kept = e.filter(
        ~(
            (F.col("user_id") % 3 == 0)
            & (F.col("event_type") == "purchase")
        )
    )
    return temporal.ab_lift(kept)


def q_html_link_resolve(spark, sf):
    """RFC 3986 reference resolution over %8 href arms against a
    query+fragment base: absolute (foreign fragment dropped),
    protocol-relative, rooted, query-only, fragment-only (resolves
    to the base minus its fragment), plain relative, one-level ../,
    and a 3-deep ../ underflow that must clamp at the root — every
    branch of the resolver fires at sf0.01.  Oracle = the same CASE
    + bounded dot-segment passes regenerated from the engine's
    pass-count constants."""
    from .operators.urls import resolve_href

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    base = F.concat(
        F.lit("https://www.Ex"),
        (did % 5).cast("string"),
        F.lit(".org/dir/sub/page.html?q=1#frag"),
    )
    m8 = did % 8
    href = (
        F.when(m8 == 0, F.lit("https://abs.example/x?y=2#z"))
        .when(m8 == 1, F.lit("//cdn.example/lib.js"))
        .when(
            m8 == 2,
            F.concat(F.lit("/rooted/r"), (did % 9).cast("string")),
        )
        .when(
            m8 == 3,
            F.concat(F.lit("?only="), (did % 4).cast("string")),
        )
        .when(m8 == 4, F.lit("#frag2"))
        .when(
            m8 == 5,
            F.concat(F.lit("rel/p"), (did % 6).cast("string")),
        )
        .when(m8 == 6, F.lit("../up.html"))
        .otherwise(F.lit("../../../deep.html"))
    )
    return d.select(
        "doc_id",
        resolve_href(base, href).alias("resolved"),
    )


def q_media_srt_cues(spark, sf):
    """SRT/VTT cue parsing over %4 synthesized subtitle files: comma
    vs dot millisecond separators, a CRLF arm, a malformed
    timing-less block that must keep its row as is_valid=false, and
    trailing blank-line runs that must not mint phantom cues;
    multi-line cue text joins with single spaces.  All timestamps
    resolve to integer milliseconds — no duration float exists.
    Oracle = the same block split + per-group timing extraction."""
    from .operators.multimodal import srt_cues

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    mm = F.lpad((did % 9).cast("string"), 2, "0")
    mm2 = F.lpad(((did % 9) + 1).cast("string"), 2, "0")
    ss = F.lpad((did % 50).cast("string"), 2, "0")
    ms = F.lpad((did % 999).cast("string"), 3, "0")
    sep = F.when(did % 4 == 1, F.lit(".")).otherwise(F.lit(","))
    t1 = F.concat(F.lit("00:"), mm, F.lit(":"), ss, sep, ms)
    t2 = F.concat(
        F.lit("00:"), mm2, F.lit(":"), ss, sep, F.lit("250")
    )
    cue1 = F.concat(
        F.lit("1\n"), t1, F.lit(" --> "), t2,
        F.lit("\nline one "), (did % 7).cast("string"),
        F.lit("\nline two"),
    )
    cue2 = F.concat(
        F.lit("2\n00:10:00,000 --> 00:10:02,500\nsecond cue "),
        (did % 5).cast("string"),
    )
    bad = F.when(
        did % 4 == 2, F.lit("not a cue block\n\n")
    ).otherwise(F.lit(""))
    tail = F.when(did % 4 == 3, F.lit("\n\n\n")).otherwise(F.lit(""))
    srt = F.concat(cue1, F.lit("\n\n"), bad, cue2, tail)
    srt = F.when(
        did % 4 == 1, F.replace(srt, F.lit("\n"), F.lit("\r\n"))
    ).otherwise(srt)
    return srt_cues(d.select("doc_id", srt.alias("srt")))


def q_corpus_cdx_records(spark, sf):
    """CDX capture index over synthesized recrawl captures: %40 url
    collisions make multi-capture keys, a %3-derived digest gives
    multiple versions per key, ties at the latest 14-digit timestamp
    break by max digest (exercised: same-ts captures share ts but
    differ in digest when doc_id%2 flips), and a %13 junk-url arm
    must drop (no host, no archive key).  Oracle = the same SURT
    arithmetic + group aggregation with the ts=max digest rule."""
    from .operators.urls import cdx_records

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.when(did % 13 == 0, F.lit("junk url")).otherwise(
        F.concat(
            F.lit("https://www.Ex"),
            (did % 5).cast("string"),
            F.lit(".org/p/"),
            (did % 40).cast("string"),
            F.lit("?v=1#frag"),
        )
    )
    ts = F.concat(
        F.lit("2024011"),
        ((did % 9) + 1).cast("string"),
        F.lit("120000"),
    )
    digest = F.md5((did % 3).cast("string"))
    return cdx_records(
        d.select(
            url.alias("url"), ts.alias("fetch_ts"),
            digest.alias("digest"),
        )
    )


def q_corpus_hll_distinct(spark, sf):
    """HyperLogLog distinct-count audit per group: per-lang small
    groups over a 77-value vocabulary (the linear-counting correction
    branch fires) plus an injected high-cardinality 'big' group (5
    unique values per doc -> ~2500 distinct, raw-estimator branch)
    and a NULL value on every 11th small row (carries no identity,
    dropped before hashing but n_rows counts only non-null).  Oracle =
    the identical md5 register/rank arithmetic with the harmonic sum
    carried as an exact DECIMAL(38,0) integer."""
    from .operators.sketch import hll_distinct

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    small = d.select(
        F.coalesce(F.col("lang"), F.lit("unk")).alias("grp"),
        F.when(did % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), (did % 77).cast("string")))
        .alias("v"),
    )
    big = d.select(
        F.lit("big").alias("grp"),
        F.explode(
            F.array(
                *[
                    F.concat(F.lit("u"), (did * 5 + i).cast("string"))
                    for i in range(5)
                ]
            )
        ).alias("v"),
    )
    return hll_distinct(small.unionByName(big), "v", "grp")


def q_events_attribution(spark, sf):
    """First/last-touch attribution matrix over the natural events
    stream (every user purchases at sf0.01, so the matrix is dense)
    plus an injected direct-converter (user 99993's only event is a
    purchase — the 'direct'/'direct' cell must appear) and a same-ts
    probe (user 99994's click AT the conversion timestamp carries no
    causal order and must not take credit; its earlier view does).
    Oracle = the same conversion-time window, strictly-before filter,
    and ROW_NUMBER-over-(ts, id) first/last picks."""
    from .operators.temporal import attribution_matrix

    ev = load(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    extra = spark.createDataFrame(
        [
            (9000001, "2024-03-01 00:00:00", 99993, "purchase"),
            (9000002, "2024-03-01 00:00:00", 99994, "view"),
            (9000003, "2024-03-01 00:05:00", 99994, "click"),
            (9000004, "2024-03-01 00:05:00", 99994, "purchase"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
    )
    return attribution_matrix(ev.unionByName(extra))


def q_corpus_warc_extract(spark, sf):
    """The archive->corpus capstone: WARC response records whose
    payload is the shared html page synth, parsed with the bounded
    read (the %5 arm's Content-Length cuts 200 chars — extraction
    over a TRUNCATED page must still be deterministic), request
    records (%3) excluded by type, header-less blocks (%7) by
    validity, then jusText main-content extraction on the recovered
    payload in the SAME narrow chain — the WARC->WET conversion every
    web corpus starts from.  Gate value-hashes md5(main_text).
    Oracle = the shared _WARC_CHAIN_SQL + _html_main_ctes fragments
    composed over the same archive synthesis."""
    from .operators.html import main_content
    from .operators.warc import warc_records

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    crlf = F.lit("\r\n")
    page = _html_page()
    clen = F.when(
        did % 5 == 0, F.greatest(F.length(page) - 200, F.lit(0))
    ).otherwise(F.length(page))
    uri = F.concat(
        F.lit("https://ex"),
        (did % 20).cast("string"),
        F.lit(".org/p/"),
        did.cast("string"),
    )
    rec1 = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: response"), crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("Content-Length: "), clen.cast("string"), crlf, crlf,
        page, crlf, crlf,
    )
    rec2 = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: request"), crlf,
        F.lit("WARC-Target-URI: "), uri, crlf,
        F.lit("Content-Length: 14"), crlf, crlf,
        F.lit("GET / HTTP/1.1"), crlf, crlf,
    )
    bad = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit("WARC-Type: metadata"), crlf,
        F.lit("No-Uri: x"), crlf, crlf,
        F.lit("junk"),
    )
    arc = F.concat(
        rec1,
        F.when(did % 3 == 0, rec2).otherwise(F.lit("")),
        F.when(did % 7 == 0, bad).otherwise(F.lit("")),
    )
    recs = warc_records(
        d.select("doc_id", arc.alias("warc")), keep_payload=True
    )
    pages = recs.filter(
        F.col("is_valid") & (F.col("warc_type") == "response")
    ).select("doc_id", F.col("payload").alias("html"))
    mc = main_content(pages)
    return mc.select(
        "doc_id",
        F.md5(F.col("main_text")).alias("main_md5"),
        "n_blocks",
        "n_good",
        "link_frac",
    )


def q_events_bot_detect(spark, sf):
    """Timing-regularity bot detection over the natural events users
    plus two injected clients: user 99991 fires every 210 s exactly
    (the %7 event_id stride x 30 s — zero spread, flagged bot) and
    decoy 99992 adds a (id%50)*40 s jitter (regular-ish rate, spread
    far above mean/10 — must NOT flag).  NTZ timestamp literals (the
    events table reads as TIMESTAMP_NTZ).  Oracle = the same lag
    window (ts, id order), date_diff microseconds, and the integer
    cross-multiplied spread rule."""
    from .operators.temporal import bot_regularity

    ev = load(spark, sf, "events").select("event_id", "ts", "user_id")
    bot = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id",
        # BIGINT quantity: an INT cast would ANSI-overflow at the
        # event_id scale large sfs reach (review fix)
        F.expr(
            "timestampadd(SECOND, CAST(event_id * 30 AS BIGINT), "
            "TIMESTAMP_NTZ '2024-06-01 00:00:00')"
        ).alias("ts"),
        F.lit(99991).cast("long").alias("user_id"),
    )
    decoy = ev.filter(F.col("event_id") % 11 == 0).select(
        "event_id",
        F.expr(
            "timestampadd(SECOND, CAST(event_id * 30 + "
            "(event_id % 50) * 40 AS BIGINT), "
            "TIMESTAMP_NTZ '2024-07-01 00:00:00')"
        ).alias("ts"),
        F.lit(99992).cast("long").alias("user_id"),
    )
    return bot_regularity(ev.unionByName(bot).unionByName(decoy))


def q_corpus_host_safety(spark, sf):
    """Host-safety classification over a 17-arm url rotation: every
    class fires — loopback by name and by 127/8, all three RFC-1918
    ranges INCLUDING the 172.16/12 boundary pair (172.20 private vs
    172.32 public), link-local, a shape-valid-octet-invalid 999 quad
    (parser-rejected -> no_host), a public IP literal, .onion,
    .local, a bare intranet name, a junk url, an IPv6 literal, an
    OCTAL leading-zero quad (0177.0.0.1 — the SSRF bypass the review
    found), the 0/8 "this network" quad, and plain fetchable names.
    Oracle = the same host restatement + anchored octet groups with
    NULLIF-guarded casts + the identical priority CASE."""
    from .operators.urls import with_host_safety

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    m = did % 17
    url = (
        F.when(m == 0, F.lit("https://localhost/admin"))
        .when(m == 1, F.lit("https://dev.Localhost/x"))
        .when(m == 2, F.lit("http://127.0.0.1:8080/x"))
        .when(m == 3, F.lit("http://10.1.2.3/x"))
        .when(
            m == 4,
            F.concat(
                F.lit("http://192.168.0."),
                (did % 200).cast("string"),
                F.lit("/x"),
            ),
        )
        .when(m == 5, F.lit("http://172.20.5.5/x"))
        .when(m == 6, F.lit("http://172.32.1.1/x"))
        .when(m == 7, F.lit("http://169.254.9.9/x"))
        .when(m == 8, F.lit("http://999.1.2.3/x"))
        .when(m == 9, F.lit("http://8.8.8.8/dns"))
        .when(m == 10, F.lit("http://hidden.service.onion/x"))
        .when(m == 11, F.lit("http://printer.local/x"))
        .when(m == 12, F.lit("http://intranet/wiki"))
        .when(m == 13, F.lit("http://[::ffff:127.0.0.1]/x"))
        .when(m == 14, F.lit("http://0177.0.0.1/x"))
        .when(m == 15, F.lit("http://0.1.2.3/x"))
        .otherwise(
            F.concat(
                F.lit("https://www.site"),
                (did % 40).cast("string"),
                F.lit(".example.org/p"),
            )
        )
    )
    extra = spark.createDataFrame([("junk url",)], "url string")
    return with_host_safety(
        d.select(url.alias("url")).unionByName(extra)
    ).select("url", "host", "host_class", "fetch_ok")


# Forms fixture arms — ONE site; the engine query lits these and the
# oracle splices them (single-quote-doubled), so the two cannot drift.
_FORMS_FIX = {
    "base": (
        "<html><head><script>var f=\"<form action='/ghost'>"
        "<input></form>\";</script>"
        '<!-- <form action="/c"><input></form> --></head><body>'
        '<form action="/search?q=&amp;x=1" method="GET">'
        '<input type="text" name="q"><inputx>'
        '<select name="s"></select><input type="submit"></form>'
    ),
    "login": (
        "<FORM METHOD='POST' ACTION='/login'>"
        '<input type="email"><INPUT TYPE=\'password\'>'
        "<textarea></textarea></FORM>"
    ),
    "bare": '<form><textarea name="t"></textarea></form>',
    "nested": (
        '<form action="/outer"><input name="a">'
        '<form action="/inner"><input name="b"></form></form>'
    ),
    "tail": "</body></html>",
}


def q_html_forms(spark, sf):
    """Form extraction over a 4-arm page: the base GET search form
    (entity in action, <inputx> boundary decoy, scripted + commented
    ghost forms stripped), %3 a CASED single-quoted POST login form
    with a password input, %5 an attribute-less form (method defaults
    'get', action NULL), %11 a nested form truncating at the first
    close (the tables trade).  Oracle regenerated from the engine's
    FORM_* regex constants + the shared entity list."""
    from .operators.html import forms

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    page = F.concat(
        F.lit(_FORMS_FIX["base"]),
        F.when(did % 3 == 0, F.lit(_FORMS_FIX["login"])).otherwise(
            F.lit("")
        ),
        F.when(did % 5 == 0, F.lit(_FORMS_FIX["bare"])).otherwise(
            F.lit("")
        ),
        F.when(did % 11 == 0, F.lit(_FORMS_FIX["nested"])).otherwise(
            F.lit("")
        ),
        F.lit(_FORMS_FIX["tail"]),
    )
    return forms(d.select("doc_id", page.alias("html")))


def q_corpus_bpe_pairs(spark, sf):
    """First BPE merge-round pair counts over the raw corpus text
    (k=60): suffix pairs like 't </w>' compete with in-word pairs —
    the tokenizer-training wordcount transpose.  Oracle = the same
    token wordcount, per-code-point split with the appended marker,
    adjacent-pair UNNEST, weighted sum, and the (count DESC, pair)
    top-k cut."""
    return text.bpe_pair_counts(load(spark, sf, "documents"), k=60)


def q_corpus_cooccurrence(spark, sf):
    """Skip-gram co-occurrence + PMI (window 2, min_count 10) over the
    lowered corpus: directed pairs both ways, marginals and the total
    derived from the same pair table.  Oracle = the position-UNNEST
    pair generation per offset/direction, the same aggs, and the
    identical ln arithmetic."""
    return text.cooccurrence_pmi(
        _spread(spark, load(spark, sf, "documents")),
        window=2,
        min_count=10,
    )


def q_events_hll_users(spark, sf):
    """The HLL sketch composed on the events table: distinct users per
    event_type (5 small groups — linear counting) plus an injected
    'all-events' group keyed by (user, event) — ~10k distinct, the raw
    estimator branch at a cardinality the documents fixture cannot
    reach.  Oracle = the shared _hll_chain_sql fragment over the same
    values CTE."""
    from .operators.sketch import hll_distinct

    # _spread: the per-row md5 register derivation over 2x the events
    # table is the map cost; the sandbox events scan is one row group
    ev = _spread(spark, load(spark, sf, "events"), key="event_id")
    daily = ev.select(
        F.col("event_type").alias("grp"),
        F.col("user_id").cast("string").alias("v"),
    )
    allg = ev.select(
        F.lit("all-events").alias("grp"),
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("event_id").cast("string"),
        ).alias("v"),
    )
    return hll_distinct(daily.unionByName(allg), "v", "grp")


def q_corpus_registered_domains(spark, sf):
    """Pay-level-domain rollup over a 7-arm url fixture: multi-label
    suffix beats its parent (a.b.shop.co.uk -> shop.co.uk, never uk),
    PSL private-section entries mint per-user registered domains
    (userN.github.io), www strips before matching, subdomain
    multiplicity shows up as n_hosts > 1 (shopN.example.com), unknown
    TLDs group under (NULL, NULL), a bare suffix host under
    (NULL, 'com'), and junk urls drop.  Oracle = the same host
    restatement + a longest-first CASE regenerated from
    PUBLIC_SUFFIXES."""
    from .operators.urls import registered_domains

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    m = did % 7
    url = (
        F.when(
            m == 0,
            F.concat(
                F.lit("https://www.Shop"),
                (did % 5).cast("string"),
                F.lit(".Example.COM/x"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://a"),
                (did % 3).cast("string"),
                F.lit(".b.shop.co.uk/y"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://user"),
                (did % 20).cast("string"),
                F.lit(".github.io/p"),
            ),
        )
        .when(m == 3, F.lit("https://weird.host.unknowntld/x"))
        .when(m == 4, F.lit("junk url"))
        .when(m == 5, F.lit("https://com/"))
        .otherwise(
            F.concat(
                F.lit("https://site"),
                (did % 30).cast("string"),
                F.lit(".org/page"),
            )
        )
    )
    return registered_domains(d.select(url.alias("url")))


def q_corpus_length_buckets(spark, sf):
    """Dynamic-padding batch plan over controlled token counts:
    repeat('w ', doc_id % 200) spans every bucket of (16,32,64,128)
    INCLUDING the -1 overflow route (counts 129-199), a NULL text on
    every 97th doc lands in the 16-bucket with 0 tokens, and batch
    fills of 8 exercise partial final batches per bucket.  Oracle =
    the same token count, boundary CASE, salted-digest ROW_NUMBER
    order, integer floor-division batch assignment, and the guarded
    waste division."""
    from .operators.sampling import length_buckets

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    txt = F.when(did % 97 == 0, F.lit(None).cast("string")).otherwise(
        F.expr("repeat('w ', CAST(doc_id % 200 AS INT))")
    )
    return length_buckets(
        d.select("doc_id", txt.alias("text")),
        boundaries=(16, 32, 64, 128),
        batch_size=8,
    )


def q_corpus_drift(spark, sf):
    """Snapshot-drift report: ref = the ws-noise corpus, new = the same
    corpus with every 5th doc dropped (scraper-loss signal) and a spam
    burst appended to every 3rd (flood signal) — the injected tokens
    must surface in the top-k and the drop shifts every ratio slightly.
    Oracle = two UNNEST wordcounts, FULL OUTER join, the identical
    add-one ratio arithmetic, and the same (drift DESC, token) top-k."""
    d = _with_ws_noise(load(spark, sf, "documents"))
    ref = d.select("text")
    new = d.filter(F.col("doc_id") % 5 != 0).select(
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" driftspam driftspam buynow"),
            ).otherwise(F.lit("")),
        ).alias("text")
    )
    return text.token_drift_topk(ref, new, k=40)


def q_corpus_dsir_sample(spark, sf):
    """DSIR importance resampling of 100 docs from the ws-noise corpus:
    hashed-ngram log importance weights + the Gumbel-top-k realization
    from the salted digest.  Oracle = the shared _ngram_feat_ctes chain
    + the DSIR_LOG_RATIOS CASE + the identical -ln(-ln(u)) key."""
    from .operators.sampling import dsir_sample

    return dsir_sample(
        _spread(spark, _with_ws_noise(load(spark, sf, "documents"))),
        n=100,
    )


def q_corpus_epoch_plan(spark, sf):
    """Data-constrained epoch planning at target 110k tokens over the
    ws-noise corpus (~27k tokens / 20 near-uniform small sources) plus
    an injected LARGE source (every even doc relabeled, ~13k tokens —
    plans 2 epochs uncapped), an injected zero-token source (plans
    zero epochs), and a NULL source (dropped) — the gate sees capped,
    uncapped-at-4, mid-epoch, and zero rows simultaneously.  Oracle recomputes the exact
    BIGINT token totals, the sqrt temperature weights, the fixed-op-
    order requested floor, and the integer ceil-div epochs."""
    from .operators.sampling import epoch_plan

    base = _with_ws_noise(load(spark, sf, "documents"))
    d = base.select("source", "text")
    big = base.filter(F.col("doc_id") % 2 == 0).select(
        F.lit("big_src").alias("source"), "text"
    )
    extra = spark.createDataFrame(
        [("empty_src", ""), (None, "dropped null source row here")],
        "source string, text string",
    )
    return epoch_plan(
        d.unionByName(big).unionByName(extra), target_total_tokens=110000
    )


def q_corpus_sample_hash(spark, sf):
    """Deterministic content-hash sampling at 25% (md5 2-hex-digit
    prefix <= '3f').  df.sample() selects different rows after any
    repartition/resume; the hash-mod rule reselects the identical subset
    on any engine — which is exactly what lets the oracle check it."""
    from .operators.sampling import hash_mod_sample

    return hash_mod_sample(
        load(spark, sf, "documents"), "doc_id", keep_hex="3f"
    ).select("doc_id", "lang", "source")


def _doc_host():
    """doc_id-derived host fixture shared by corpus_domain_filter and
    corpus_ingest: blocked exact / blocked subdomain / lookalike /
    clean / blocked rotation keyed on doc_id % 5."""
    m = F.col("doc_id") % 5
    return (
        F.when(m == 0, F.lit("spam-site.com"))
        .when(m == 1, F.lit("ads.spam-site.com"))
        .when(m == 2, F.lit("notspam-site.com"))
        .when(
            m == 3,
            F.concat(
                F.lit("good-"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(".org"),
            ),
        )
        .otherwise(F.lit("tracker.net"))
    )


def _doc_url():
    return F.concat(
        F.lit("https://"), _doc_host(), F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )


_INGEST_BLOCKLIST = ["Spam-Site.com", "www.tracker.net"]


def q_corpus_domain_filter(spark, sf):
    """Domain-blocklist filter (urls.filter_blocked_domains) over
    doc_id-derived urls: blocked hosts and their subdomains drop, a
    lookalike host that merely CONTAINS the blocked string survives,
    blocklist entries normalize case/www.  The oracle reconstructs the
    same host from the same arithmetic and restates the keep rule."""
    from .operators.urls import filter_blocked_domains

    d = load(spark, sf, "documents")
    withu = d.select("doc_id", _doc_url().alias("url"))
    return filter_blocked_domains(withu, _INGEST_BLOCKLIST)


def q_corpus_url_templates(spark, sf):
    """URL-template mining over doc_id-derived urls: product pages
    (/item/<id>/view) collapse to one per-host template, date archives
    (/a/2024/<m>?page=<p>) collapse across two digit runs, /about is
    digit-free, and 'shard<k>.cdn.net' hosts stay DISTINCT host keys
    while the digit still collapses inside the template (the mining
    point).  The /u/<md5-hex> pattern yields mostly-unique templates
    that min_urls=2 prunes, and the %3==0 'www.Shop.' host probes the
    lower+www host normalization."""
    from .operators.urls import url_templates

    d = load(spark, sf, "documents")
    m3 = F.col("doc_id") % 3
    m4 = F.col("doc_id") % 4
    host = (
        F.when(m3 == 0, F.lit("www.Shop.example.com"))
        .when(m3 == 1, F.lit("blog.example.org"))
        .otherwise(
            F.concat(
                F.lit("shard"),
                m4.cast("string"),
                F.lit(".cdn.net"),
            )
        )
    )
    path = (
        F.when(
            m4 == 0,
            F.concat(
                F.lit("/item/"),
                F.col("doc_id").cast("string"),
                F.lit("/view"),
            ),
        )
        .when(
            m4 == 1,
            F.concat(
                F.lit("/a/2024/"),
                (F.col("doc_id") % 12).cast("string"),
                F.lit("?page="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(m4 == 2, F.lit("/about"))
        .otherwise(
            F.concat(
                F.lit("/u/"),
                F.substring(
                    F.md5(F.col("doc_id").cast("string")), 1, 6
                ),
            )
        )
    )
    withu = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    return url_templates(withu, min_urls=2)


def q_html_jsonld(spark, sf):
    """JSON-LD structured-data extraction over synthesized pages: an
    Article object block whose name goes NESTED-OBJECT on %7 (the
    scalar-only contract -> NULL) and carries \\u-escaped text
    otherwise (both engines' JSON parsers decode escapes), a %2
    headline, a %3 ROOT-ARRAY Product block read through $[0] with
    a single-quoted type attribute, a %5 MALFORMED block that keeps
    its row with is_valid False and all fields NULL, plus two decoys
    that must never match (a type-less script and a commented-out
    block).  Oracle = the same comment strip + block extract_all +
    json_extract_string chain with the identical root-array and
    scalar-only CASE rules, regenerated from the engine's
    JSONLD_RE/JSONLD_FIELDS constants."""
    from .operators.html import jsonld

    d = load(spark, sf, "documents")
    return jsonld(
        _spread(
            spark,
            d.select("doc_id", _jsonld_fixture_page().alias("html")),
        )
    )


def _jsonld_fixture_page():
    """Shared doc_id-derived JSON-LD fixture (see q_html_jsonld); the
    DuckDB restatement is _JSONLD_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    name_val = F.when(did % 7 == 0, F.lit('{"x": 1}')).otherwise(
        F.concat(
            F.lit('"Doc '),
            (did % 50).cast("string"),
            F.lit(' \\u0026 Co"'),
        )
    )
    headline = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(', "headline": "H'),
            (did % 9).cast("string"),
            F.lit('"'),
        ),
    ).otherwise(F.lit(""))
    block_a = F.concat(
        F.lit(
            '<script async type="application/ld+json">'
            '{"@type": "Article", "name": '
        ),
        name_val,
        headline,
        F.lit(', "datePublished": "2024-0'),
        ((did % 9) + 1).cast("string"),
        F.lit('-05", "author": {"@type": "Person"}}</script>'),
    )
    block_b = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(
                "<script type='application/ld+json'>"
                '[{"@type": "Product", "name": "P'
            ),
            (did % 10).cast("string"),
            F.lit('"}, {"@type": "Decoy"}]</script>'),
        ),
    ).otherwise(F.lit(""))
    block_c = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(
                '<script type="application/ld+json">{"name": "x'
            ),
            (did % 4).cast("string"),
            F.lit('"</script>'),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<head><script>var a = 1;</script>"),
        block_a,
        block_b,
        block_c,
        F.lit(
            '<!-- <script type="application/ld+json">'
            '{"@type": "Ghost"}</script> --></head>'
        ),
    )


def q_corpus_feed_items(spark, sf):
    """RSS/Atom feed-item extraction over synthesized feed pages: an
    RSS item with an entity-escaped title/link and a %2 pubDate, a %3
    CDATA-titled item whose &amp; must stay LITERAL (XML forbids
    entity expansion inside CDATA) with no link (NULL link/host), a
    %11 junk-link item behind a <linkage> decoy (NULL host via the
    host_of junk contract), a %5 Atom <entry> with a self-closing
    href link + <updated>, and a commented-out item that must never
    match.  Oracle = the same block/title/link/date extract chain
    with the identical CDATA and text-else-href CASE rules,
    regenerated from the engine's regex constants."""
    from .operators.urls import feed_items

    d = load(spark, sf, "documents")
    return feed_items(
        d.select("doc_id", _feed_fixture_page().alias("xml"))
    )


def _feed_fixture_page():
    """Shared doc_id-derived feed fixture (see q_corpus_feed_items);
    the DuckDB restatement is _FEED_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    h7 = (did % 7).cast("string")
    item1 = F.concat(
        F.lit("<item><title> Breaking &amp; A"),
        (did % 9).cast("string"),
        F.lit(" </title><link>https://www.News"),
        h7,
        F.lit(".com/a/"),
        (did % 10).cast("string"),
        F.lit("?x=1&amp;y=2</link>"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit("<pubDate>Mon, 0"),
                ((did % 9) + 1).cast("string"),
                F.lit(" Jan 2024</pubDate>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</item>"),
    )
    item2 = F.when(
        did % 3 == 0,
        F.concat(
            F.lit("<item><title><![CDATA[C &amp; D "),
            (did % 5).cast("string"),
            F.lit("]]></title></item>"),
        ),
    ).otherwise(F.lit(""))
    item3 = F.when(
        did % 11 == 0,
        F.lit("<item><linkage>z</linkage><link>junk url</link></item>"),
    ).otherwise(F.lit(""))
    atom = F.when(
        did % 5 == 0,
        F.concat(
            F.lit('<entry><title type="text">Atom T'),
            (did % 4).cast("string"),
            F.lit('</title><link rel="alternate" href="https://Blog'),
            h7,
            F.lit(".example/p/"),
            (did % 6).cast("string"),
            F.lit('"/><updated>2024-02-0'),
            ((did % 9) + 1).cast("string"),
            F.lit("</updated></entry>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<rss><channel><title>Chan</title>"),
        item1,
        item2,
        item3,
        F.lit("</channel></rss>"),
        atom,
        F.lit("<!-- <item><title>ghost</title></item> -->"),
    )


def q_html_hreflang(spark, sf):
    """Hreflang alternate extraction over synthesized pages: a
    reversed-attr single-quoted CASED-lang alternate with an
    entity-escaped cased-www href (always), a %2 multi-token
    rel="alternate help" x-default, a %7 junk-href alternate (host ->
    NULL via the host_of junk contract), and five decoys that must
    never match (stylesheet rel, rel="alternated", blank hreflang,
    data-href, commented + scripted links) — the decoy arms also make
    link_no gaps non-vacuous.  Oracle = the same tag extract_all +
    per-attribute regexes with the identical rel-token-list rule,
    regenerated from the engine's regex constants."""
    from .operators.html import hreflang_alternates

    d = load(spark, sf, "documents")
    return hreflang_alternates(
        d.select("doc_id", _hreflang_fixture_page().alias("html"))
    )


def _hreflang_fixture_page():
    """Shared doc_id-derived hreflang fixture (see q_html_hreflang);
    the DuckDB restatement is _HREFLANG_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    h7 = (did % 7).cast("string")
    alt1 = F.concat(
        F.lit('<link hreflang="FR" rel="alternate" '),
        F.lit("href='https://www.Ex"),
        h7,
        F.lit(".com/fr/"),
        (did % 10).cast("string"),
        F.lit("?a=1&amp;b=2'>"),
    )
    alt2 = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<link rel="alternate help" hreflang="x-default" '),
            F.lit('href="https://ex'),
            h7,
            F.lit('.com/">'),
        ),
    ).otherwise(F.lit(""))
    junk = F.when(
        did % 7 == 0,
        F.lit('<link rel="alternate" hreflang="de" href="junk url">'),
    ).otherwise(F.lit(""))
    decoy3 = F.when(
        did % 3 == 0,
        F.lit('<link rel="alternated" hreflang="de" href="https://x.de/">'),
    ).otherwise(F.lit(""))
    decoy5 = F.when(
        did % 5 == 0,
        F.lit('<link rel="alternate" hreflang="" href="https://y.com/">'),
    ).otherwise(F.lit(""))
    decoy11 = F.when(
        did % 11 == 0,
        F.lit(
            '<link rel="alternate" hreflang="pt" '
            'data-href="https://z.pt/">'
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('<head><link rel="stylesheet" href="s.css">'),
        alt1,
        decoy3,
        alt2,
        decoy5,
        junk,
        decoy11,
        F.lit(
            '<!-- <link rel="alternate" hreflang="it" '
            'href="https://g.it/"> -->'
            "<script>var l = '<link rel=\"alternate\" "
            'hreflang="nl" href="https://j.nl/">'
            "';</script></head>"
        ),
    )


def q_corpus_dom_stats(spark, sf):
    """DOM shape stats over synthesized pages: a two-paragraph base
    with title/style/script regions (style 'p{' and a scripted ghost
    '<p>' must never count), a %3 table arm, a %5 list arm whose
    '<pre>' exercises the open-tag boundary guard (not a '<p>'), and
    a %2 anchor arm; text_chars/markup_frac run the shared block-text
    cleanup over the whole page.  Oracle = the same strip + counted
    extract_all + block-text chain regenerated from the engine
    constants."""
    from .operators.html import dom_stats

    d = load(spark, sf, "documents")
    did = F.col("doc_id")

    def arm(mod: int, tag: str):
        return F.when(did % mod == 0, F.lit(tag)).otherwise(F.lit(""))

    page = F.concat(
        F.lit(
            "<html><head><title>T</title><style>p{color:red}</style>"
            "</head><body><div><p>"
        ),
        F.substring(F.col("text"), 1, 40),
        F.lit("</p><p>second  para &amp; more</p></div>"),
        arm(3, "<table><tr><td>1</td><td>2</td></tr></table>"),
        arm(5, "<ul><li>x</li><li>y</li><pre>not a p</pre></ul>"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<a href="https://ex'),
                (did % 9).cast("string"),
                F.lit('.com/">link text</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit('<script>var p = "<p>ghost</p>";</script></body></html>'),
    )
    return dom_stats(d.select("doc_id", page.alias("html")))


def q_html_opengraph(spark, sf):
    """Open Graph / Twitter-card extraction over synthesized pages: an
    entity+double-space og:title (block-text clean non-vacuous), a
    single-quoted og:description whose &lt;b&gt; decodes AFTER the tag
    strip (stays literal), a cased raw og:image url, a cased og:type
    ('Article' -> 'article'), a %11-before-%3 BLANK og:image arm (first
    match wins, blank -> NULL — the documented interaction), and two
    decoys that must never match (a commented-out og:title, a
    name="og:title" tag — og is property-attributed).  Oracle = the
    same six extractions regenerated from OPENGRAPH_FIELDS +
    _meta_attr_re."""
    from .operators.html import opengraph

    d = load(spark, sf, "documents")
    return opengraph(
        d.select("doc_id", _opengraph_fixture_page().alias("html"))
    )


def _opengraph_fixture_page():
    """Shared doc_id-derived Open Graph fixture (see q_html_opengraph);
    the DuckDB restatement is _OG_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")

    def arm(mod: int, tag: str):
        return F.when(did % mod == 0, F.lit(tag)).otherwise(F.lit(""))

    img = F.when(
        did % 3 == 0,
        F.concat(
            F.lit('<meta property="og:image" content="https://img.Ex'),
            (did % 5).cast("string"),
            F.lit('.com/i.png">'),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        did % 7 == 0,
        F.concat(
            F.lit('<meta property="og:url" content="https://ex'),
            (did % 5).cast("string"),
            F.lit('.com/page">'),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit(
            '<head><!-- <meta property="og:title" content="ghost"> -->'
            '<meta name="og:title" content="not og">'
            '<meta property="og:title" content="OG &amp; Title '
        ),
        (did % 9).cast("string"),
        F.lit('  here">'),
        arm(11, '<meta property="og:image" content="">'),
        img,
        arm(2, "<meta property='og:description' content='Desc &lt;b&gt; x'>"),
        arm(5, '<meta property="og:type" content="Article">'),
        url,
        arm(2, '<meta name="twitter:card" content="SUMMARY_large_image">'),
        F.lit("</head>"),
    )


def q_html_images(spark, sf):
    """Image-reference extraction over synthesized pages: a shared-src
    main image with an entity + double-space alt (block-text clean
    non-vacuous), a %2 short-alt arm, a %3 relative no-alt arm (host
    NULL, alt NULL), a %5 single-quoted blank-alt arm (alt NULL, cased
    host lowered), and decoys that must never match — a %7 data-src
    lazy-loading tag (src required; leaves an img_no gap), a commented
    and a scripted img.  Oracle = the shared _images_ctes chain
    regenerated from the engine's regex constants."""
    from .operators.html import images

    d = load(spark, sf, "documents")
    return images(
        d.select("doc_id", _images_fixture_page().alias("html"))
    )


def q_corpus_image_captions(spark, sf):
    """LAION-style alt-text caption mining composed end-to-end over
    the images fixture: short alts (< 3 tokens) and NULL alts filter
    out; each shared src keeps its BEST caption (longest alt — the
    2-digit 'number 10..12' arms beat the 1-digit ones — ties by
    lexicographic alt then doc_id) with n_refs counting qualifying
    references.  Oracle = the same imgs chain + the keep-best rule
    restated as an explicit-total-order ROW_NUMBER."""
    from .operators.html import image_captions, images

    d = load(spark, sf, "documents")
    return image_captions(
        images(d.select("doc_id", _images_fixture_page().alias("html")))
    )


def _images_fixture_page():
    """Shared doc_id-derived img fixture (see q_html_images /
    q_corpus_image_captions); the DuckDB restatement is
    _IMAGES_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    k = (did % 20).cast("string")
    main = F.concat(
        F.lit('<img alt="A  scenic &amp; detailed view number '),
        (did % 13).cast("string"),
        F.lit(' of landmark" src="https://img.ex/'),
        k,
        F.lit('.jpg">'),
    )
    short = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<img src="https://img.ex/s'),
            k,
            F.lit('.png" alt="tiny logo">'),
        ),
    ).otherwise(F.lit(""))
    noalt = F.when(
        did % 3 == 0,
        F.concat(
            F.lit('<img src="/relative/img'), k, F.lit('.gif">')
        ),
    ).otherwise(F.lit(""))
    blank = F.when(
        did % 5 == 0,
        F.lit("<img src='https://cdn.Ex.com/b.jpg' alt=''>"),
    ).otherwise(F.lit(""))
    lazy = F.when(
        did % 7 == 0,
        F.lit(
            '<img data-src="https://lazy.ex/l.jpg" '
            'alt="lazy loaded image here">'
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<body>"),
        main,
        short,
        noalt,
        blank,
        lazy,
        F.lit(
            '<!-- <img src="https://g.ex/c.jpg" alt="ghost commented'
            ' image"> --><script>var i = \'<img src="https://j.ex/s.jpg"'
            ' alt="scripted ghost image">\';</script></body>'
        ),
    )


def q_html_feed_discovery(spark, sf):
    """Feed autodiscovery over synthesized pages: an RSS link with an
    entity-escaped %3 href variant, a %2 Atom arm with CASED mime type
    + reversed single-quoted attrs + relative href (host NULL), and
    four decoys that must never match (rel=alternate type=text/html,
    rel=stylesheet with a feed type, blank href, commented link).
    Oracle = the same tag extract_all + rel-token-list + lowered-mime
    CASE regenerated from FEED_MIME_TYPES."""
    from .operators.html import feed_discovery

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    k = (did % 11).cast("string")
    rss = F.concat(
        F.lit('<link rel="alternate" type="application/rss+xml" '),
        F.lit('href="https://ex'),
        k,
        F.when(did % 3 == 0, F.lit(".com/feed?a=1&amp;b=2")).otherwise(
            F.lit(".com/feed.xml")
        ),
        F.lit('">'),
    )
    atom = F.when(
        did % 2 == 0,
        F.lit(
            "<link type='Application/Atom+XML' rel='alternate' "
            "href='/atom.xml'>"
        ),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit(
            '<head><link rel="alternate" type="text/html" '
            'href="https://m.ex/">'
            '<link rel="stylesheet" type="application/rss+xml" '
            'href="https://s.ex/f.xml">'
        ),
        rss,
        atom,
        F.lit(
            '<link rel="alternate" type="application/rss+xml" href="">'
            '<!-- <link rel="alternate" type="application/rss+xml" '
            'href="https://g.ex/f.xml"> --></head>'
        ),
    )
    return feed_discovery(d.select("doc_id", page.alias("html")))


def q_html_robots_meta(spark, sf):
    """Meta-robots page policy over synthesized pages: a %2
    cased+padded 'NoIndex , nofollow' list, a %3 cased-name NONE
    expansion (noindex AND nofollow), a %5 two-tag union (noarchive +
    a tab-padded nofollow in a SEPARATE tag), and three decoys that
    must never match — a description meta containing the word, a
    commented-out noindex, a bot-specific googlebot tag (documented
    narrowing: only the generic name is policy).  Oracle = the same
    extract_all + comma-split + trim + token-membership chain,
    regenerated from the engine's regex constants."""
    from .operators.html import robots_meta

    d = load(spark, sf, "documents")
    return robots_meta(
        d.select("doc_id", _robots_meta_fixture_page().alias("html"))
    )


def _robots_meta_fixture_page():
    """Shared doc_id-derived meta-robots fixture (see
    q_html_robots_meta); the DuckDB restatement is _ROBOTS_PAGE_SQL —
    edit BOTH."""
    did = F.col("doc_id")

    def arm(mod: int, tag: str):
        return F.when(did % mod == 0, F.lit(tag)).otherwise(F.lit(""))

    return F.concat(
        F.lit('<head><meta name="description" content="noindex decoy">'),
        arm(2, '<meta name="robots" content="NoIndex , nofollow">'),
        arm(3, '<meta name="ROBOTS" content="NONE">'),
        arm(
            5,
            '<META name="robots" content="noarchive">'
            '<meta name="robots" content=" nofollow\t">',
        ),
        arm(7, '<!-- <meta name="robots" content="noindex"> -->'),
        arm(11, '<meta name="googlebot" content="noindex">'),
        F.lit("</head>"),
    )


def q_corpus_canonical_dedup(spark, sf):
    """Canonical-aware url dedup over synthesized crawl rows: four
    grime variants per logical url (www+case, utm+gclid, trailing
    slash+fragment) that must collapse onto one clean key, a %3
    absolute CASED-host canonical that pulls the page OUT of its
    grime group (used_canonical), a %7-not-%3 RELATIVE canonical
    that must be ignored (fallback to the crawl url), and a
    commented-out canonical decoy placed BEFORE the real one.
    Oracle = the canonical key reconstructed arithmetically from the
    same doc_id arms (the dedup_url_canonical precedent) + the same
    count agg and keep rule."""
    from .operators.urls import canonical_dedup

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    lid = (did % 40).cast("string")
    h5 = (did % 5).cast("string")
    v = did % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://site"), h5, F.lit(".com/p/"), lid,
                F.lit("?id="), lid,
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://WWW.Site"), h5, F.lit(".COM/p/"), lid,
                F.lit("?id="), lid,
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://site"), h5, F.lit(".com/p/"), lid,
                F.lit("?utm_source=ad&id="), lid, F.lit("&gclid=zz"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"), h5, F.lit(".com/p/"), lid,
                F.lit("/?id="), lid, F.lit("#frag"),
            )
        )
    )
    html = F.concat(
        F.lit(
            '<!-- <link rel="canonical" href="https://ghost.com/">'
            " --><head>"
        ),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="https://SiteC'),
                F.lit(".com/canon/"),
                (did % 8).cast("string"),
                F.lit('">'),
            ),
        )
        .when(
            did % 7 == 0,
            F.concat(
                F.lit("<link rel='canonical' href='/rel/"),
                (did % 6).cast("string"),
                F.lit("'>"),
            ),
        )
        .otherwise(F.lit("")),
        F.lit("</head>"),
    )
    return canonical_dedup(
        d.select("doc_id", url.alias("url"), html.alias("html"))
    )


def q_corpus_fetch_schedule(spark, sf):
    """Crawl-politeness fetch scheduling over a synthesized frontier:
    17 hosts x ~30 candidates at sf0.01 with a deterministic integer
    score ((doc_id*37) %% 101 — collisions make the id tie-break
    non-vacuous), 3 fetches/window over 4 windows so every host
    overflows (deferred rows dropped).  Oracle = the same ROW_NUMBER
    window with the explicit (score DESC, doc_id ASC) tie-break +
    integer floor-division window assignment (Spark DIV == DuckDB
    // on positives, the epoch_plan rule)."""
    from .operators.sampling import fetch_schedule

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("site"), (did % 17).cast("string"), F.lit(".com")
        ).alias("host"),
        ((did * 37) % 101).alias("score"),
    )
    return fetch_schedule(
        frontier, per_window=3, n_windows=4
    )


def q_corpus_translation_clusters(spark, sf):
    """Translation-cluster induction over synthesized hreflang sets:
    25 logical clusters (~20 declaring pages each at sf0.01, so the
    cross-page triple dedup is NON-vacuous), en+fr always, de on
    even clusters (sizes vary), x-default on %3 clusters (key rule
    exercises BOTH arms: x-default href vs lexicographic min — de <
    en < fr), %7 pages declare nothing.  Oracle composes the shared
    _hreflang_alts_ctes fragment with the same key agg, triple
    distinct, and n_langs count-back."""
    from .operators.html import translation_clusters

    d = load(spark, sf, "documents")
    return translation_clusters(
        d.select(
            "doc_id", _translation_fixture_page().alias("html")
        )
    )


def _translation_fixture_page():
    """Shared doc_id-derived hreflang-set fixture (see
    q_corpus_translation_clusters); the DuckDB restatement is
    _TRANSLATION_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    g = (did % 25).cast("string")

    def alt(lang: str, leaf: str) -> Column:
        return F.concat(
            F.lit(f'<link rel="alternate" hreflang="{lang}" '),
            F.lit('href="https://ex'),
            g,
            F.lit(f'.com/{leaf}">'),
        )

    xdef = F.concat(
        F.lit('<link rel="alternate" hreflang="x-default" '),
        F.lit('href="https://ex'),
        g,
        F.lit('.com/">'),
    )
    decl = F.concat(
        alt("en", "en"),
        alt("fr", "fr"),
        F.when(did % 25 % 2 == 0, alt("de", "de")).otherwise(
            F.lit("")
        ),
        F.when(did % 25 % 3 == 0, xdef).otherwise(F.lit("")),
    )
    return F.when(
        did % 7 == 0, F.lit("<p>no declarations</p>")
    ).otherwise(decl)


def q_corpus_bitext_pairs(spark, sf):
    """Bitext candidate mining composed end-to-end: the translation
    fixture's hreflang sets -> translation_clusters -> pair mining
    against a synthesized crawled corpus whose urls match the declared
    hrefs and whose token counts come from repeat('w ', n) arms — fr
    docs on %4 clusters are 3x the en length so the 0.5 length-ratio
    filter fires (keep false), de docs (even clusters) stay within
    ratio.  materialize=True: the member table carries pin()-ned
    extraction columns, so the self-join must checkpoint (the LADDER
    rule).  Oracle composes the shared _hreflang_alts_ctes chain with
    the same docs arms, token rule, and ratio CASE."""
    from .operators.html import bitext_pairs, translation_clusters

    d = load(spark, sf, "documents")
    clusters = translation_clusters(
        d.select("doc_id", _translation_fixture_page().alias("html"))
    )
    did = F.col("doc_id")
    k = did % 25
    lang_idx = F.expr("doc_id DIV 25")
    lang = (
        F.when(lang_idx == 0, F.lit("en"))
        .when(lang_idx == 1, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    ntok = (
        F.when(lang_idx == 0, k + 20)
        .when(
            lang_idx == 1,
            F.when(k % 4 == 0, (k + 20) * 3).otherwise(k + 22),
        )
        .otherwise(k + 21)
    ).cast("int")
    docs = d.filter(did < 75).select(
        F.concat(
            F.lit("https://ex"), k.cast("string"), F.lit(".com/"), lang
        ).alias("url"),
        F.repeat(F.lit("w "), ntok).alias("text"),
    )
    return bitext_pairs(clusters, docs, materialize=True)


def q_corpus_crawl_diff(spark, sf):
    """Crawl-over-crawl page diff between two synthesized snapshots:
    the old crawl is the corpus; the new crawl drops %3 urls
    (removed), rewrites %5-not-%3 texts (changed), keeps the rest
    (unchanged), and adds a '/new' url per %7 doc (added) — all four
    statuses non-vacuous at sf0.01.  Oracle = the same per-side MIN
    digest aggs + a FULL OUTER JOIN with the identical status CASE."""
    from .operators.urls import crawl_diff

    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://s"),
        (did % 9).cast("string"),
        F.lit(".com/p"),
        did.cast("string"),
    )
    old = d.select(url.alias("url"), "text")
    changed = F.when(
        did % 5 == 0, F.concat(F.col("text"), F.lit(" updated content"))
    ).otherwise(F.col("text"))
    new = (
        d.filter(did % 3 != 0)
        .select(url.alias("url"), changed.alias("text"))
        .unionByName(
            d.filter(did % 7 == 0).select(
                F.concat(url, F.lit("/new")).alias("url"), "text"
            )
        )
    )
    return crawl_diff(old, new)


def q_corpus_sitemap(spark, sf):
    """Sitemap-XML entry extraction over synthesized sitemap pages:
    a cased-host url with a leading/trailing-ws + &amp;-escaped <loc>
    and a %2 <lastmod>, a cased <URL rel=..> whose loc goes JUNK on
    %11 (host -> NULL, never a throw), a %3 loc-less block that must
    drop while later entry_no keeps the source gap, a %5
    <sitemap> index entry (is_index), and a commented-out decoy that
    must never match.  Oracle = the same block/loc/lastmod extract
    chain regenerated from the engine's regex constants + a generic
    scheme://host restatement of host_of."""
    from .operators.urls import sitemap_entries

    d = load(spark, sf, "documents")
    return sitemap_entries(
        d.select("doc_id", _sitemap_fixture_page().alias("xml"))
    )


def _sitemap_fixture_page():
    """Shared doc_id-derived sitemap fixture (see q_corpus_sitemap);
    the DuckDB restatement is _SITEMAP_PAGE_SQL — edit BOTH."""
    did = F.col("doc_id")
    h7 = (did % 7).cast("string")
    lastmod = F.when(
        did % 2 == 0,
        F.concat(
            F.lit("<lastmod>2024-0"),
            ((did % 9) + 1).cast("string"),
            F.lit("-11</lastmod>"),
        ),
    ).otherwise(F.lit(""))
    loc2 = F.when(did % 11 == 0, F.lit("junk loc")).otherwise(
        F.concat(
            F.lit("https://site"),
            h7,
            F.lit(".com/two/"),
            (did % 10).cast("string"),
        )
    )
    locless = F.when(
        did % 3 == 0, F.lit("<url><priority>0.5</priority></url>")
    ).otherwise(F.lit(""))
    smap = F.when(
        did % 5 == 0,
        F.concat(
            F.lit("<sitemap><loc>https://site"),
            h7,
            F.lit(".com/sitemaps/s"),
            (did % 4).cast("string"),
            F.lit(".xml</loc></sitemap>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc> '),
        F.lit("https://www.Site"),
        h7,
        F.lit(".com/page/"),
        (did % 50).cast("string"),
        F.lit("?a=1&amp;b=2 </loc>"),
        lastmod,
        F.lit('</url><URL rel="x"><loc>'),
        loc2,
        F.lit("</loc></URL>"),
        locless,
        smap,
        F.lit(
            "<!-- <url><loc>https://ghost.example/</loc></url> -->"
            "</urlset>"
        ),
    )


def q_corpus_c4_filters(spark, sf):
    """C4 heuristic cleanup (Raffel et al. 2020 §2.2) over a
    doc_id-derived multi-line fixture exercising every rule: a kept
    opening sentence (doc_id-unique), a too-short line, a
    no-terminal-punct line, a javascript line, a tab-separated kept
    line (whitespace-run word count — ws-noise built in), a blank
    line, and a doc_id%5 tail: extra sentence (keep=true), lorem
    ipsum, a '{', a bad word, or NO tail (kept text falls below
    min_sentences).  concat_ws skips the NULL tail on both engines.
    The oracle restates the line rules, the replace-trick sentence
    count, and the doc-level flags."""
    d = load(spark, sf, "documents")
    m5 = F.col("doc_id") % 5
    tail = (
        F.when(
            m5 == 0,
            F.lit("An extra closing sentence rounds the document out."),
        )
        .when(
            m5 == 1,
            F.lit(
                "Sadly this page contains lorem ipsum filler text"
                " everywhere."
            ),
        )
        .when(m5 == 2, F.lit("Some code follows in this page { not prose."))
        .when(
            m5 == 3,
            F.lit(
                "This document mentions a badword unfortunately for"
                " everyone."
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    injected = F.concat_ws(
        "\n",
        F.concat(
            F.lit("Document number "),
            F.col("doc_id").cast("string"),
            F.lit(" begins with a clean opening sentence."),
        ),
        F.lit("Short line."),
        F.lit("this line has no terminal punctuation at all"),
        F.lit("Please enable javascript to continue viewing this page."),
        F.lit("Tabs\there\tare\tstill\twords in this sentence!"),
        F.lit(""),
        tail,
    )
    return text.c4_filters(d.select("doc_id", injected.alias("text")))


def q_corpus_assemble(spark, sf):
    """The corpus-to-LOADER assembly composed as ONE query — the
    training-side capstone next to corpus_end_to_end (dedup side) and
    corpus_ingest (crawl side): (1) fastText-style classifier keep,
    (2) temperature mixture resampling of the survivors (target 60 at
    the gate sf, so the mix actually cuts), (3) deterministic shard +
    concat-and-split sequence packing of the mixed set.  The oracle
    composes the SAME fragments (classifier CTE chain, mixture
    arithmetic, packing window) stage for stage."""
    from .operators.sampling import mixture_sample, pack_sequences

    d = _spread(
        spark,
        _with_ws_noise(load(spark, sf, "documents")).select(
            "doc_id", "source", "text"
        ),
    )
    cls = text.quality_classifier(d)
    kept = d.join(
        cls.filter(F.col("keep")).select("doc_id").hint("shuffle_hash"),
        "doc_id",
    )
    mixed = mixture_sample(
        kept.select("doc_id", "source"), "source", "doc_id",
        target_total=60,
    )
    packed_in = kept.select("doc_id", "text").join(
        mixed.select("doc_id").hint("shuffle_hash"), "doc_id"
    )
    return pack_sequences(packed_in, "doc_id", budget=50, prefix_len=1)


def q_corpus_pack_sequences(spark, sf):
    """Concat-and-split sequence packing over the ws-probed documents:
    shard by md5 first hex digit (16 shards -> ~30 docs each at the
    gate sf, several 100-token sequences per shard, so boundary
    CROSSINGS occur), exact per-shard token cumsum, and each doc's
    first/last sequence index.  The oracle replays the same digest
    order with an explicit ROWS window frame."""
    from .operators.sampling import pack_sequences

    d = _with_ws_noise(load(spark, sf, "documents"))
    return pack_sequences(
        d.select("doc_id", "text"), "doc_id", budget=100, prefix_len=1
    )


def q_corpus_span_ladder(spark, sf):
    """Stride-LADDER span dedup decision (the NOTES r04 idea): two
    dup_span_stats passes composed as one query — the exact short pass
    (k=8, stride=1: GUARANTEES any shared 8-token span is caught) plus
    a cheap grid-aligned long-boilerplate pass (k=16, stride=4: ~1/4
    the windows, catches full copies and fixed-position boilerplate
    only — the documented stride trade).  keep = short dup_frac < 0.5
    AND no long-pass dup window; the exact copies in the dupe corpus
    trip BOTH passes, organic template overlap only the short one, so
    the decision is non-vacuous per arm.  The oracle restates both
    window chains (generate_series step = stride).

    Plan shape: the corpus is tokenized ONCE and localCheckpoint-ed,
    then both passes consume the shared tokens_col — the dominant
    tokenize map cost is paid once, not per pass (review finding r05;
    pinned by test_span_ladder_plan_bounded).  A pinned-column branch
    point cannot rely on ReusedExchange (nondeterministic projections
    don't canonicalize equal), so multi-pass composition MATERIALIZES
    the shared intermediate — exactly the production pattern at scale
    (write the tokenized corpus once, run every pass against it)."""
    from .functions.numeric import pin as _pin
    from .operators.text import tokens as _tokens

    c = (
        _corpus_with_dupes(spark, sf)
        .withColumn("_tk0", _pin(_tokens(F.col("text"))))
        .localCheckpoint()
    )
    short = dedup.dup_span_stats(c, k=8, stride=1, tokens_col="_tk0")
    long_ = dedup.dup_span_stats(c, k=16, stride=4, tokens_col="_tk0")
    return (
        short.select(
            "doc_id",
            F.col("dup_frac").alias("short_frac"),
        )
        .join(
            long_.select(
                "doc_id",
                F.col("dup_frac").alias("long_frac"),
                F.col("n_dup_windows").alias("n_long_dup"),
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            "short_frac",
            "long_frac",
            "n_long_dup",
            (
                (F.col("short_frac") < 0.5) & (F.col("n_long_dup") == 0)
            ).alias("keep"),
        )
    )


def q_corpus_url_quality(spark, sf):
    """Soft URL-quality scoring (RefinedWeb-style word weights — the
    layer ABOVE the binary blocklist) over doc_id-derived urls with a
    rotating path suffix injecting negative, positive, and mixed
    weighted words (the base hosts already carry 'tracker'/'popup'-free
    spam strings, so both suffix and host contribute).  The oracle
    regenerates the count-times-weight arithmetic from the same
    URL_WORD_WEIGHTS dict."""
    from .operators.urls import url_quality_score

    d = load(spark, sf, "documents")
    m = F.col("doc_id") % 4
    suffix = (
        F.when(m == 0, F.lit("/casino/coupon-popup"))
        .when(m == 1, F.lit("/wiki/research-article"))
        .when(m == 2, F.lit("/blog/login"))
        .otherwise(F.lit(""))
    )
    withu = d.select(
        "doc_id", F.concat(_doc_url(), suffix).alias("url")
    )
    return url_quality_score(withu)


def q_corpus_ingest(spark, sf):
    """Composed CRAWL-INGEST decision — the ingest-time analogue of
    corpus_end_to_end, chaining this round's new operators as ONE
    query: a new batch (url-carrying copies of every doc_id%10==3
    reference doc + fresh docs sharing no reference shingles) flows
    through (1) domain-blocklist filter, (2) incremental cross-corpus
    MinHash-LSH dedup against the full reference corpus (anti-join on
    the flags), (3) per-language stratified sampling.  The copies all
    carry clean hosts, so the dedup stage — not the blocklist — must
    remove them; the oracle recomputes every stage from the shared
    fragments."""
    from .operators.sampling import stratified_sample
    from .operators.urls import filter_blocked_domains

    ref = _with_ws_noise(load(spark, sf, "documents")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    copies = ref.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "text", "lang", _doc_url().alias("url"),
    )
    fresh = ref.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.lit("fresh unseen document number "),
            F.col("doc_id").cast("string"),
            F.lit(" standalone content block"),
        ).alias("text"),
        "lang", _doc_url().alias("url"),
    )
    s1 = filter_blocked_domains(
        copies.unionByName(fresh), _INGEST_BLOCKLIST
    )
    flags = dedup.incremental_lsh_flags(
        s1.select("doc_id", "text"),
        ref.select("doc_id", "text"),
        max_band_freq=8,
    )
    s2 = s1.join(flags.select("doc_id"), "doc_id", "left_anti")
    return stratified_sample(
        s2, strata_col="lang", rates={"en": "bf", "fr": "7f"},
        key_col="doc_id", default_hex="3f",
    ).select("doc_id", "lang")


def q_dedup_boilerplate_lines(spark, sf):
    """Cross-document boilerplate LINE removal over a doc_id-derived
    multi-line corpus: a site-wide nav line (two indentation variants —
    trim-keyed identity) and a 5-doc group line exceed max_df=4 and are
    cut; a unique line, a 2-doc line, and a blank line survive.  The
    oracle recomputes line document-frequencies and reassembles the
    residual text with an ordered string_agg."""
    d = load(spark, sf, "documents")
    m3 = F.col("doc_id") % 3
    a = (
        F.when(m3 == 0, F.lit("NAV HOME | ABOUT | CONTACT"))
        .when(m3 == 1, F.lit("  NAV HOME | ABOUT | CONTACT "))
        .otherwise(
            F.concat(F.lit("solo "), F.col("doc_id").cast("string"))
        )
    )
    b = F.concat(
        F.lit("u"), F.col("doc_id").cast("string"), F.lit(" "),
        F.substring("text", 1, 12),
    )
    c = F.concat(F.lit("G"), (F.col("doc_id") % 100).cast("string"))
    e = F.concat(F.lit("H"), (F.col("doc_id") % 250).cast("string"))
    injected = F.concat_ws("\n", a, b, c, F.lit(""), e)
    return dedup.drop_boilerplate_lines(
        d.select("doc_id", injected.alias("text")), max_df=4
    )


def q_dedup_paragraphs(spark, sf):
    """Cross-corpus paragraph-level first-occurrence dedup (CCNet's
    dedup unit).  Fixture paragraphs per doc: a corpus-wide shared
    footer (indented variant on doc_id%3==1 — trims to the same key
    but its RAW form differs, so reconstruction is probed), a unique
    para, a small-modulus repeated para (first occurrence wins by
    (doc_id, pos)), a blank para (always survives), and a within-doc
    repeat of the unique para (dropped: same doc, later pos)."""
    d = load(spark, sf, "documents")
    m3 = F.col("doc_id") % 3
    a = (
        F.when(m3 == 0, F.lit("SHARED FOOTER PARAGRAPH"))
        .when(m3 == 1, F.lit("  SHARED FOOTER PARAGRAPH "))
        .otherwise(
            F.concat(F.lit("solo "), F.col("doc_id").cast("string"))
        )
    )
    b = F.concat(
        F.lit("u"), F.col("doc_id").cast("string"), F.lit(" "),
        F.substring("text", 1, 12),
    )
    c = F.concat(F.lit("rep"), (F.col("doc_id") % 9).cast("string"))
    injected = F.concat_ws("\n\n", a, b, c, F.lit(""), b)
    return dedup.dedup_paragraphs(
        d.select("doc_id", injected.alias("text"))
    )


def q_corpus_stratified_sample(spark, sf):
    """Per-stratum deterministic sampling — the data-MIXING primitive:
    keep ~62.5% of en, ~37.5% of fr, ~18.75% of de, and a ~6.25% floor
    for every other language, all via the same salted md5 rule as
    corpus_sample_hash so the oracle reselects the identical rows."""
    from .operators.sampling import stratified_sample

    return stratified_sample(
        load(spark, sf, "documents"),
        strata_col="lang",
        rates={"en": "9f", "fr": "5f", "de": "2f"},
        key_col="doc_id",
        default_hex="0f",
    ).select("doc_id", "lang", "source")


def q_corpus_quota_topk(spark, sf):
    """Per-source quality quota: top 12 documents by quality score per
    source (domain contribution cap with explicit total tie-break)."""
    from .operators.sampling import quota_topk_per_group

    d = text.quality_score(
        _spread(spark, load(spark, sf, "documents"))
    )
    return quota_topk_per_group(
        d, group_col="source", order_col="quality", id_col="doc_id", k=12
    ).select("doc_id", "source", "quality", "rnk")


def q_text_pii_scrub(spark, sf):
    """PII scrubbing (emails / IPv4 / phones -> typed placeholders) with
    per-category redaction counts.  The corpus text carries no organic
    PII, so the query first INJECTS deterministic doc_id-derived PII
    into a rotating third of the documents (including none — the
    zero-redaction case is exercised); both engines apply the identical
    injection, then the identical three sequential scrub passes."""
    from .operators.scrub import scrub_pii

    d = load(spark, sf, "documents")
    k = F.col("doc_id")
    suffix = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit(" contact user"), k, F.lit("@example.com now")
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(
                F.lit(" srv 10.0."), (k % 256).cast("string"),
                F.lit(".7 tel +33 555 01"),
                F.lpad((k % 100).cast("string"), 2, "0"),
            ),
        )
        .otherwise(F.lit(""))
    )
    injected = _spread(
        spark,
        d.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        ),
    )
    return scrub_pii(injected).select(
        "doc_id", "n_emails", "n_ips", "n_phones", "text"
    )


def q_corpus_decontaminate(spark, sf):
    """Benchmark decontamination: every 40th document's text stands in
    as the eval set; docs sharing >= 2 distinct 3-shingles with it are
    flagged.  The eval members themselves flag (full self-overlap) and
    organically-similar docs flag too — both engines compute the same
    decision table over ALL docs, zeros included."""
    d = load(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 40 == 0).select("text")
    # _spread only the CORPUS side — the bench side stays the bounded
    # broadcast build
    return dedup.decontaminate(_spread(spark, d), bench)


def q_corpus_contamination_report(spark, sf):
    """Benchmark-SIDE contamination report (the dual of
    corpus_decontaminate, same %40 eval fixture): every eval item
    counts the corpus docs sharing >= 2 distinct 3-shingles with it —
    each item's own corpus copy guarantees n_contaminating >= 1 and a
    large max_overlap, organic near-matches add spread.  Oracle =
    the same shingle CTEs aggregated per (bench, corpus-doc) pair."""
    d = load(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 40 == 0).select(
        "doc_id", "text"
    )
    # _spread only the CORPUS side — the bench side stays the bounded
    # broadcast build
    return dedup.decontaminate_report(_spread(spark, d), bench)


def q_corpus_health_report(spark, sf):
    """Per-language corpus health dashboard over the ws-noise corpus
    with a mojibake probe (doc_id%7==3 gains a U+FFFD tail BEFORE the
    dup union, so exact copies stay exact) and the %50 dup copies (so
    dup_frac is non-zero per language).  Oracle restates the four
    per-doc signals (token count, md5 digest, shared classifier chain,
    full script-mix suspect rule) and the decimal-sum mean."""
    d = _with_ws_noise(load(spark, sf, "documents"))
    suf = d.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 3, F.lit(" � bad")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    dup = suf.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = suf.unionByName(dup).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return text.corpus_health_report(corpus)


def q_corpus_shard_shuffle(spark, sf):
    """Deterministic training-order shuffle: every doc gets a (shard,
    pos) so replaying shards in order reproduces ONE fixed pseudo-random
    permutation across reruns — orderBy(rand()) cannot (different order
    every run, not resumable)."""
    from .operators.sampling import shard_shuffle

    return shard_shuffle(
        load(spark, sf, "documents"), "doc_id"
    ).select("doc_id", "shard", "pos")


def q_text_readability(spark, sf):
    """Flesch-style readability over documents with injected sentence
    punctuation (the synthetic text is unpunctuated, so without the
    probe every doc would clamp to 1 sentence and the sentence count
    would be vacuous): every other doc gains a three-sentence tail."""
    d = load(spark, sf, "documents")
    suffix = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit(" First probe sentence. Second one! Third?"),
    ).otherwise(F.lit(""))
    injected = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return text.readability(injected).select(
        "doc_id", "n_words", "n_sentences", "n_syllables", "flesch"
    )


def q_text_dup_spans(spark, sf):
    """Cross-document duplicated-span stats — the window-hash
    approximation of exact substring dedup (Lee et al. style) the
    other dedup ops don't cover: full-document digests and shingle
    Jaccard miss a unique document QUOTING a long span of another.
    Over documents + exact copies: copied docs and their bases show
    dup_frac 1.0, organic template overlap gives partial fractions,
    sub-k-token docs stay at n_windows 0."""
    return dedup.dup_span_stats(
        _corpus_with_dupes(spark, sf), k=8, stride=1
    )


def q_text_dup_excise(spark, sf):
    """Span-level dedup EXCISION (the Lee et al. family's end state —
    r04 verdict item #3): duplicated k-token spans are REMOVED, not
    just flagged; the min-id owner keeps each span, every other doc
    keeps its residual text.  Over documents + exact copies: the +1e6
    copies collapse to empty residuals (their base doc owns every
    window), organic template overlap cuts partial spans, sub-k docs
    pass through whole."""
    return dedup.excise_dup_spans(_corpus_with_dupes(spark, sf), k=8)


def q_corpus_text_filter_ml(spark, sf):
    """The corpus text-filter decision upgraded to MULTI-LANGUAGE ID
    (r03 missing #3 said users of corpus_text_filter hit the en/fr
    heuristic's limits first): trigram lang-guess must equal the
    declared language, plus the quality floor and token bounds, over
    the 8-language fixture.  Now margin-ROUTED (r04 verdict next #6):
    surviving rows carry lang_margin and a confident flag (margin >=
    0.3) — the %19==3 mixed-phrasing rows match their declared 'es'
    but land below the floor, so both routing paths are represented.
    The en/fr form stays as corpus_text_filter."""
    d = load(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    sent = F.when(k % 17 == 0, F.lit(_LANGID_UNKNOWN)).when(
        k % 19 == 3, F.lit(_LANGID_AMBIG)
    )
    declared = F.when(k % 19 == 3, F.lit(_LANGID_AMBIG_LANG))
    for i, (lang, s) in enumerate(_LANGID_SENTS):
        sent = sent.when(k % _N_LANGS == i, F.lit(s))
        declared = declared.when(k % _N_LANGS == i, F.lit(lang))
    injected = d.withColumn("text", sent.otherwise(F.lit(""))).withColumn(
        "lang", declared
    )
    scored = text.quality_score(text.lang_id_trigram(injected))
    return scored.filter(
        (F.col("lang_guess") == F.col("lang"))
        & (F.col("quality") >= 0.3)
        & F.col("n_tokens").between(12, 17)
    ).select(
        "doc_id",
        "lang_guess",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality",
        "lang_margin",
        # margin-based routing (r04 verdict next #6): rows below the
        # margin floor are kept but flagged ambiguous, so downstream
        # can route them to a heavier classifier instead of dropping
        (F.col("lang_margin") >= 0.3).alias("confident"),
    )


def q_corpus_curation(spark, sf):
    """The quota analogue of corpus_end_to_end (r04 verdict next #7):
    domain-level keep flags (source_stats), per-document readability
    and quality, and the per-source quota top-k composed as ONE
    curation decision — keep docs from healthy domains (mean quality
    >= 0.45) that read like prose (flesch >= 30), capped at the 10
    best per source.

    100 TB shape: the domain stats are CORPUS-DERIVED, so unlike the
    bounded benchmark-shingle broadcast they must NOT be broadcast —
    the keep-flag join shuffles BOTH sides on source and the quota
    window then reuses that same clustering (join + window, one
    exchange of the big side; pinned by
    test_corpus_curation_plan_shape)."""
    from .operators.sampling import quota_topk_per_group

    d = load(spark, sf, "documents").select("doc_id", "source", "text")
    suffix = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit(" First probe sentence. Second one! Third?"),
    ).otherwise(F.lit(""))
    injected = _spread(
        spark,
        d.withColumn("text", F.concat(F.col("text"), suffix)),
    )
    scored = text.readability(text.quality_score(injected))
    keep_sources = text.source_stats(
        injected, min_mean_quality=0.45
    ).select("source", "keep")
    kept = (
        scored.join(keep_sources.hint("shuffle_hash"), "source")
        .filter(F.col("keep") & (F.col("flesch") >= 30.0))
    )
    return quota_topk_per_group(
        kept, "source", "quality", "doc_id", k=10
    ).select("doc_id", "source", "quality", "flesch", "rnk")


def q_corpus_end_to_end(spark, sf):
    """The full training-corpus decision chain composed as ONE query
    (r03 verdict next #8): url-level dedup -> exact dedup -> MinHash-LSH
    + connected-components clustering -> benchmark decontamination ->
    per-source quality quota -> deterministic shard shuffle.  Every
    stage is the already-oracle-checked operator; this entry proves the
    operators COMPOSE (column contracts, join keys, no stage-boundary
    surprises), with a full value-hash oracle assembled from the same
    SQL fragments.

    Fixture shape: base docs 490..499 share canonical urls with 0..9
    (url stage fires), the +1e6 exact copies carry UNIQUE urls so they
    survive to the exact-dedup stage (which drops them), and organic
    near-dups fall to the MinHash+CC stage."""
    from .operators.sampling import shard_shuffle

    # r06 second pass: materialize=True — the one-lazy-plan form
    # replicated the prefix lineage at every stage's self-join
    # (left side + the keep-set derivation both carry it), an
    # EXPONENTIAL plan: 98 static parquet-scan copies of the corpus
    # subtree at 6 stages, and the materialized funnel variant was
    # measurably cheaper while computing MORE (six counts).  The
    # checkpoints live inside one query evaluation (every bench/gate
    # invocation rebuilds from the parquet scan — the LADDER rule),
    # results are value-identical, and the composition pin only
    # tightens (exchange count drops).
    s5 = _e2e_stages(spark, sf, materialize=True)[-1][1]
    return shard_shuffle(s5.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "shard", "pos"
    )


def _e2e_stages(spark, sf, materialize: bool = False) -> list:
    """The end-to-end decision chain's stage frames, in funnel order:
    [(stage_name, frame), ...] for input -> url_dedup -> exact_dedup ->
    minhash_cc -> decontaminate -> quality_quota.  ONE site for the
    composition — shared by corpus_end_to_end (which shards the final
    stage, materialize=False: one lazy plan, the pinned shape) and
    corpus_dedup_funnel (materialize=True: each stage localCheckpoints
    so six counts don't re-derive six chain prefixes — the LADDER
    LESSON, NOTES.md; production writes each stage once per snapshot
    and audits the outputs)."""
    from .operators.sampling import quota_topk_per_group
    from .operators.urls import url_dedup

    def _chk(f):
        return f.localCheckpoint(eager=False) if materialize else f

    d = _chk(_corpus_with_dupes(spark, sf))
    k = F.col("doc_id")
    lid = (
        F.when(k < 1000000, (k % 490)).otherwise(k)
    ).cast("string")
    v = k % 4
    url = (
        F.when(v == 0, F.concat(
            F.lit("https://corp-"), lid, F.lit(".com/d/"), lid))
        .when(v == 1, F.concat(
            F.lit("HTTPS://WWW.CORP-"), lid, F.lit(".COM/d/"), lid))
        .when(v == 2, F.concat(
            F.lit("https://corp-"), lid, F.lit(".com/d/"), lid,
            F.lit("?utm_source=x")))
        .otherwise(F.concat(
            F.lit("https://corp-"), lid, F.lit(".com/d/"), lid,
            F.lit("/#f")))
    )
    u = url_dedup(d.withColumn("url", url))
    s1 = _chk(d.join(u.select(F.col("keep_id").alias("doc_id")), "doc_id"))
    ex = dedup.exact_dedup(s1)
    s2 = _chk(
        s1.join(ex.select(F.col("keep_id").alias("doc_id")), "doc_id")
    )
    pairs = dedup.minhash_lsh_pairs(s2)
    cc = dedup.cluster_keep_decision(s2, pairs)
    s3 = _chk(s2.join(cc.filter(F.col("keep")).select("doc_id"), "doc_id"))
    bench = load(spark, sf, "documents").filter(k % 40 == 0).select(
        "text"
    )
    dec = dedup.decontaminate(s3, bench)
    s4 = _chk(s3.join(
        dec.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    ))
    s5 = quota_topk_per_group(
        text.quality_score(s4), "source", "quality", "doc_id", 12
    )
    return [
        ("input", d),
        ("url_dedup", s1),
        ("exact_dedup", s2),
        ("minhash_cc", s3),
        ("decontaminate", s4),
        ("quality_quota", s5),
    ]


def q_corpus_dedup_funnel(spark, sf):
    """Dedup-funnel AUDIT: per-stage survival counts down the SAME
    composed chain as corpus_end_to_end (one site, _e2e_stages) — the
    observability report every curation run publishes (where did the
    corpus go; which stage over- or under-fires).  Returns one row per
    stage: (stage_no, stage, n_docs), stage_no preserving funnel order.
    Each count is a map-side-partial aggregate; at production scale the
    chain is materialized once per snapshot and the funnel reads the
    stage outputs, so the multi-pass plan here is the audit's cost, not
    the pipeline's.  Oracle = the shared e2e CTE chain + a UNION ALL of
    stage counts."""
    parts = []
    for i, (name, frame) in enumerate(
        _e2e_stages(spark, sf, materialize=True)
    ):
        parts.append(
            frame.agg(F.count(F.lit(1)).alias("n_docs")).select(
                F.lit(i).cast("long").alias("stage_no"),
                F.lit(name).alias("stage"),
                "n_docs",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_text_lexical_diversity(spark, sf):
    """Lexical-diversity stats over the ws-noise corpus with a
    case-folding probe: ' Rpt rpt RPT' collapses to ONE type of count
    3 (lowered identity) and ' uniq<doc_id>' is a guaranteed hapax, so
    the gate is non-vacuous about the fold, the repeat counting, and
    the hapax boundary test.  Oracle = relational (doc, word) counts
    (the engine stays narrow — no shuffle)."""
    d = _with_ws_noise(load(spark, sf, "documents"))
    inj = _spread(
        spark,
        d.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" Rpt rpt RPT uniq"),
                F.col("doc_id").cast("string"),
            ).alias("text"),
        ),
    )
    return text.lexical_diversity(inj)


def q_text_chunk_windows(spark, sf):
    """Sliding-window token chunking (size=12, stride=8 — 4-token
    overlap) over the ws-noise corpus: most docs produce several
    chunks, the tail chunk is short, and the ws-probe suffix makes the
    run split non-vacuous.  Oracle = generate_series starts + 1-based
    list slices joined with a single space."""
    return text.chunk_windows(
        _with_ws_noise(load(spark, sf, "documents")), size=12, stride=8
    )


def q_text_sentences(spark, sf):
    """Sentence segmentation over synthesized multi-sentence docs: a
    three-sentence base with internal double-space and a tab separator
    (trim non-vacuous), a %3 unclosed tail, a %5 ellipsis arm where
    the punct RUN stays on its sentence ('Ellipsis wait...'), and the
    %15 overlap where the unclosed tail merges into the following
    sentence (maximal-run rule).  Oracle = the same extract_all(re, 0)
    + trim + blank-drop + dense 0-based numbering + ws-token counts."""
    d = load(spark, sf, "documents")
    did = F.col("doc_id")
    t = F.concat(
        F.lit("Doc "),
        did.cast("string"),
        F.lit(" opens here. Second  sentence is longer!\tThird one?"),
        F.when(
            did % 3 == 0, F.lit(" trailing tail with no terminal")
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit(" Ellipsis wait... more.")).otherwise(
            F.lit("")
        ),
    )
    return text.sentences(d.select("doc_id", t.alias("text")))


def q_text_script_mix(spark, sf):
    """Mojibake/script-mix detection over a doc_id%4 probe rotation on
    a 40-char text base: clean ASCII tail, a U+FFFD + C0-control tail
    (decode-error smoking gun), a light accent tail (non-ASCII but
    under the 0.3 bar), and a Cyrillic tail heavy enough to cross it —
    all four suspect arms fire at sf0.01.  Oracle = the same replace-
    trick counts over the identical codepoint-range classes."""
    d = load(spark, sf, "documents")
    base = F.substring(F.col("text"), 1, 40)
    m4 = F.col("doc_id") % 4
    inj = (
        F.when(m4 == 0, F.concat(base, F.lit(" clean tail.")))
        .when(
            m4 == 1,
            F.concat(
                base,
                # raw U+FFFD is intended; the C0 byte is escaped
                F.lit(" broken � decode "),
                F.lit("\x01 here"),
            ),
        )
        .when(m4 == 2, F.concat(base, F.lit(" café résumé été")))
        .otherwise(
            F.concat(base, F.lit(" привет мир это тест столица"))
        )
    )
    return text.script_mix_stats(
        d.select("doc_id", inj.alias("text"))
    )


def q_text_normalize(spark, sf):
    """Pre-tokenization normalization (lowercase + accent fold + ws
    collapse).  The corpus text is already lowercase ASCII, so the query
    injects deterministic accented/uppercase suffixes (both injection
    branches exercised) — both engines apply the identical injection
    then the identical fold."""
    d = load(spark, sf, "documents")
    suffix = F.when(
        F.col("doc_id") % 2 == 0, F.lit("  Café DÉJÀ-VU Ñandú ß")
    ).otherwise(F.lit(" ÉLÈVE naïve  øre Œuf"))
    injected = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return text.normalize_text(injected).select("doc_id", "text")


def q_text_mojibake(spark, sf):
    """ftfy-style encoding repair: the corpus text is clean ASCII, so
    the query injects deterministic mojibake suffixes BUILT FROM the
    MOJIBAKE_PAIRS table itself (a %5 rotation over quote/punct,
    currency/dash, symbol, accent arms, and a no-injection arm) —
    both engines apply the identical injection, then the oracle
    restates the identical fixed-order replace chain with the
    length-trick counts on each pass's input.  Output value-hashes
    the repaired text (md5, the corpus_web_extract convention)."""
    from .operators.encoding import MOJIBAKE_PAIRS, fix_mojibake

    p = {c: pat for pat, c in MOJIBAKE_PAIRS}
    d = load(spark, sf, "documents")
    m5 = F.col("doc_id") % 5
    suffix = (
        F.when(
            m5 == 0,
            F.lit(f" Caf{p['é']} {p['’']}x{p['’']}"),
        )
        .when(m5 == 1, F.lit(f" {p['€']}9 {p['—']} ok"))
        .when(m5 == 2, F.lit(f" {p['«']}q{p['»']} 20{p['°']}"))
        .when(m5 == 3, F.lit(f" na{p['ï']}ve {p['ñ']} {p['ü']}"))
        .otherwise(F.lit(""))
    )
    injected = _spread(
        spark,
        d.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        ),
    )
    return fix_mojibake(injected).select(
        "doc_id",
        F.md5(F.col("text")).alias("fixed_md5"),
        "n_fixes",
        "had_mojibake",
    )


def q_text_dehyphenate(spark, sf):
    """PDF/OCR wrap-artifact repair over injected %4 arms: two wrap
    joins; soft hyphens (mid-word x2); trailing space+tab runs; and a
    no-fix-shaped arm that pins every NEGATIVE rule at the gate — the
    spaced dash, uppercase and digit neighbors all survive, and the
    consecutive-wrap chain 'a-\\nb-\\nc' repairs only its FIRST break
    (scan-resume rule).  Oracle restates the identical three-pass
    chain (RE2 '\\1' backreference syntax, chr() literals)."""
    from .operators.encoding import dehyphenate

    d = load(spark, sf, "documents")
    m4 = F.col("doc_id") % 4
    sh = "­"
    suffix = (
        F.when(m4 == 0, F.lit(" hy-\nphen and line-\nbreak repairs"))
        .when(m4 == 1, F.lit(f" soft{sh}hyphen he{sh}re"))
        .when(m4 == 2, F.lit(" trail  \t\nnext line"))
        .otherwise(F.lit(" keep - it A-\nB 3-\n4 a-\nb-\nc"))
    )
    injected = d.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    return dehyphenate(injected).select(
        "doc_id",
        F.md5(F.col("text")).alias("fixed_md5"),
        "n_soft_hyphens",
        "n_line_joins",
        "n_trail_ws",
        "had_hyphenation",
    )


# code_stats fixture arms — ONE site: the engine injects these
# literals and the oracle builder rewrites the same strings into
# chr(10)-concatenated SQL (no invisible bytes in the SQL text)
_CODE_ARMS = (
    "\ndef f(x):\n    return x + 1\n    print(y)\nimport os",
    "\nfunction g() { var x = 1; const y = [2]; }",
    "\n```\nplain code block\n```",
)


def q_text_code_detect(spark, sf):
    """Code-content detection over a %4 probe rotation on a 40-char
    prose base: no-injection prose, a Python-shaped arm (keywords +
    indented lines), a JS-shaped arm (symbol-dense one-liner), and a
    fenced block — all three is_code routes fire at sf0.01 and the
    prose arm stays false.  Oracle = the SAME symbol/keyword/indent
    counting chain regenerated from CODE_SYMBOLS/CODE_KEYWORDS."""
    d = load(spark, sf, "documents")
    base = F.substring(F.col("text"), 1, 40)
    m4 = F.col("doc_id") % 4
    inj = (
        F.when(m4 == 1, F.concat(base, F.lit(_CODE_ARMS[0])))
        .when(m4 == 2, F.concat(base, F.lit(_CODE_ARMS[1])))
        .when(m4 == 3, F.concat(base, F.lit(_CODE_ARMS[2])))
        .otherwise(base)
    )
    return text.code_stats(
        d.select("doc_id", inj.alias("text"))
    ).select(
        "doc_id", "n_symbols", "symbol_frac", "kw_hits", "n_lines",
        "indent_frac", "has_fence", "is_code",
    )


def q_events_asof(spark, sf):
    """Distributed as-of join (task brief: a canonical operator Spark
    lacks) via the linear union+window form — each purchase event joined
    to the same user's latest click at-or-before it.  The DuckDB oracle
    uses the native ASOF JOIN operator, a fully independent
    implementation of the semantics."""
    e = load(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return temporal.asof_join(
        purchases, clicks, on="ts", by=("user_id",),
        value_cols=("click_value",),
    )


def q_events_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity) + per-session stats:
    one shuffle keyed by user; the session aggregation reuses the window
    sort's clustering (subset rule — no second exchange)."""
    return temporal.session_stats(
        load(spark, sf, "events"), gap_minutes=30.0
    )


def q_events_slide_window(spark, sf):
    """Batch sliding-window aggregation: 1-hour windows hopping every
    15 minutes — each event lands in exactly 4 windows.  Oracle =
    integer-µs window-start arithmetic (floor-slot minus 0..3 slides)
    + the same DECIMAL(18,2) value sum."""
    # _spread: the 4x window Expand runs map-side before the (window,
    # key) exchange — on the sandbox's one-row-group scan it was serial
    return temporal.sliding_window_counts(
        _spread(spark, load(spark, sf, "events"), key="event_id"),
        window_len="1 hour",
        slide="15 minutes",
    )


def q_events_funnel(spark, sf):
    """Ordered view->click->purchase funnel per user (strictly-after
    step rule).  Fixture arms make every depth non-vacuous at sf0.01:
    user%5==0 drops clicks (depth stalls at 1 even though purchases
    exist — the ORDER is what's checked), %5==1 drops purchases
    (depth 2), and %7==3 floors view/click timestamps to the hour so
    equal-ts step pairs appear and the STRICT-after rule is exercised
    (a tie must NOT advance the funnel).  Oracle restates the
    running-min windows with the same RANGE frame + strict compare."""
    e = load(spark, sf, "events")
    u, t, ty = F.col("user_id"), F.col("ts"), F.col("event_type")
    kept = e.filter(
        ~((u % 5 == 0) & (ty == F.lit("click")))
        & ~((u % 5 == 1) & (ty == F.lit("purchase")))
    )
    tied = kept.withColumn(
        "ts",
        F.when(
            (u % 7 == 3) & ty.isin("view", "click"),
            F.date_trunc("hour", t),
        ).otherwise(t),
    )
    return temporal.funnel(tied)


def q_events_session_paths(spark, sf):
    """Top-25 3-step event-type paths within 12-hour-gap sessions:
    the wide gap makes multi-event sessions (and hence competing path
    counts) dense at sf0.01, so the (count DESC, path ASC) k-boundary
    tie-break is non-vacuous.  Oracle restates sessionize's integer-µs
    gap rule, the (ts, event_id)-ordered leads, and the same ORDER
    BY/LIMIT."""
    return temporal.session_paths(
        load(spark, sf, "events"), n=3, k=25, gap_minutes=720.0
    )


def q_events_rate_spikes(spark, sf):
    """Hourly spike detection with an injected error burst: the error
    events of hour 12, day 20 are replicated x5 (union of 4 extra
    copies — deterministic, no randomness), so exactly that (type,
    hour) must flag against its trailing 24-hour window while the
    uninjected types stay quiet.  The spike rule is pure-integer
    cross-multiplication — no float appears anywhere in the oracle
    comparison either."""
    e = load(spark, sf, "events")
    burst = e.filter(
        (F.dayofmonth("ts") == 20)
        & (F.hour("ts") == 12)
        & (F.col("event_type") == "error")
    )
    boosted = e
    for _ in range(4):
        boosted = boosted.unionByName(burst)
    return temporal.rate_spikes(boosted)


def q_events_retention(spark, sf):
    """Weekly cohort retention over a deterministically-churned events
    slice: user%3 staggers sign-up week (3 cohorts), user%5 scales how
    long the user stays active (offsets 0..4 all populated, partial
    retention in every cohort).  All-integer day arithmetic; the one
    division is the final retention ratio, ROUND 6."""
    e = load(spark, sf, "events")
    u, dom = F.col("user_id"), F.dayofmonth("ts")
    lo = 1 + (u % 3) * 7
    hi = lo + (u % 5) * 6 + 2
    return temporal.retention_cohorts(e.filter(dom.between(lo, hi)))


def q_events_stream_window(spark, sf):
    """Structured Streaming driver-gate entry: the REAL streaming path
    (file-source readStream -> watermark -> tumbling 5-min window agg
    -> AvailableNow -> parquet sink) run to COMPLETION over the events
    table, returning the sink read back.  Append-mode emission is part
    of the contract: only windows whose end <= the final watermark
    (max event time - 10 min) are emitted — the oracle reproduces that
    exact emission rule in SQL, so the driver value-hash checks the
    streaming semantics, not just a batch lookalike."""
    import atexit
    import shutil
    import tempfile

    from .streaming.windowed import run_windowed_counts

    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    root = tempfile.mkdtemp(prefix="stream_win_")
    # the sink dir must outlive the returned LAZY DataFrame (the driver
    # collects it after this function returns), so cleanup is deferred
    # to process exit rather than done here; repeated gate/parity runs
    # in one process register one removal per invocation.
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src_dir = os.path.join(root, "in")
    os.makedirs(src_dir)
    try:  # the file source requires a DIRECTORY
        os.symlink(
            f"{sf}/events.parquet",
            os.path.join(src_dir, "events.parquet"),
        )
    except OSError:
        shutil.copy(
            f"{sf}/events.parquet",
            os.path.join(src_dir, "events.parquet"),
        )
    q = run_windowed_counts(
        spark,
        src_dir,
        os.path.join(root, "out"),
        os.path.join(root, "ck"),
        schema,
    )
    # AvailableNow over one file finishes in seconds; a stalled stream
    # must FAIL the gate entry, not hang the whole driver run.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "events_stream_window: stream did not finish within 300s"
        )
    return spark.read.parquet(os.path.join(root, "out")).select(
        "win_start", "win_end", "event_type", "n_events", "sum_value"
    )


def q_pipeline_extract(spark, sf):
    """Flagship: the full extraction pipeline on the synthetic pages
    corpus (rows-only check: no SQL oracle can express the Arrow-batch
    slicer; byte-identical correctness is covered by tests/)."""
    from .plans.pipeline import run_pipeline
    from .sources.synthetic import make_corpus, manifest_to_spark, pages_to_spark

    pages_pdf, manifest_pdf, _ = make_corpus(60, seed=42)
    return run_pipeline(
        pages_to_spark(spark, pages_pdf), manifest_to_spark(spark, manifest_pdf)
    )


# ---------------------------------------------------------------------------
# flagship with a FULL value-hash oracle (r04 verdict item #1)
# ---------------------------------------------------------------------------

# The fixture corpus both sides derive from documents.doc_id.  Word lists
# deliberately avoid every dispatch/section/junk token (INTERIM, REPORT,
# PORTFOLIO, STATEMENT, Total, METROPOLITAN, ...) and every COUNTRIES
# entry, so each rendered row's path through the pipeline is exact.
_PF_WORDS = [
    "ALPHA", "BETA", "GAMMA", "DELTA", "OMEGA", "NOVA", "ORION", "VEGA",
    "ATLAS", "TITAN", "SOLAR", "LUNAR", "POLAR", "AZURE", "COBALT", "AMBER",
]
_PF_SUFFIX = ["HOLDINGS", "CORP", "GROUP", "INDUSTRIES", "PARTNERS", "SA", "NV"]

# gap-split lines join cells with TWO spaces; these constants are shared
# by the renderer (they never reach the oracle: header repeat dies at P3,
# the junk row at P7, the 100.00% row at P12)
_PF_HDR_LINE = "Holding  Ccy  Market Value  %NAV"
_PF_JUNK_LINE = "Total portfolio  EUR  1,234.56  9.99%"
_PF_P12_LINE = "Net Assets  EUR  5,000.00  100.00%"
_PF_LONG_NAME = "X" * 92  # P8: cleaned length >= 90 drops the row


def _pf_hx(h, p: int, n: int = 1):
    """Hex substring of an md5 column -> BIGINT (Spark side)."""
    return F.conv(F.substring(h, p, n), 16, 10).cast("long")


def _pf_el(arr, idx0):
    """0-based element pick from a literal array column."""
    return F.element_at(arr, (idx0 + 1).cast("int"))


def _pipeline_fixture(spark, sf):
    """Deterministic single-archetype (gap_split_en) pages + manifest,
    every value a pure md5 function of documents.doc_id — the rendering
    is Spark-side only; the oracle recomputes the EXPECTED output from
    the same derivations (the doc_id-derived-fixture pattern of
    text_langid / d2_family_fallback, applied to the whole pipeline).

    Per holding (doc, fund, k in 0..7) the hash nibbles choose:
      - dash row  (mv='-', na='0.00%')          -> F6 zero
      - paren-negative market value             -> F4
      - leading qty token (5-token gap line)    -> D4 shape shift
      - embedded ISIN in the name cell          -> F9 strip
      - k==7 long-name row                      -> P8 drop
    plus per fund: a top + mid-table column-header repeat (P3 drop), a
    'Total portfolio' row (P7 drop), a 100.00% summary row (P12 drop);
    per doc: 1-2 funds (J2 section attribution), Cap(+Dis) share classes
    (J4 fan-back), every 11th doc without manifest rows (J1 null path),
    every 13th doc a 'nan'-url sentinel (P10)."""
    from .config import CURRENCIES

    words = F.array(*[F.lit(w) for w in _PF_WORDS])
    sufs = F.array(*[F.lit(s) for s in _PF_SUFFIX])
    curs = F.array(*[F.lit(c) for c in CURRENCIES[:8]])

    docs = load(spark, sf, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://host"), (d % 17).cast("string"),
        F.lit(".example.org/gap/"), d.cast("string"), F.lit(".pdf"),
    )

    funds = docs.select(
        "doc_id",
        F.explode(
            F.when(d % 4 == 1, F.array(F.lit(1), F.lit(2))).otherwise(
                F.array(F.lit(1))
            )
        ).alias("f"),
    )
    hdf = F.md5(
        F.concat(
            F.lit("pipet:"), d.cast("string"),
            F.lit(":"), F.col("f").cast("string"),
        )
    )
    funds = funds.withColumn("_hdf", hdf).withColumn(
        "title",
        F.concat(
            _pf_el(words, _pf_hx(F.col("_hdf"), 1)),
            F.lit(" FUND "), F.col("f").cast("string"),
        ),
    )

    # ---- holding rows ----
    hold = funds.select(
        "doc_id", "f", "title",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"),
    ).withColumn(
        "_h",
        F.md5(
            F.concat(
                F.lit("pipe:"), d.cast("string"),
                F.lit(":"), F.col("f").cast("string"),
                F.lit(":"), F.col("k").cast("string"),
            )
        ),
    )
    hc = F.col("_h")
    hold = (
        hold.withColumn("_cents", _pf_hx(hc, 5, 6) % 19_999_000 + 1000)
        .withColumn("_nac", _pf_hx(hc, 11, 3) % 9998 + 1)
        .withColumn("_dash", _pf_hx(hc, 14) == 0)
        .withColumn("_neg", (_pf_hx(hc, 14) != 0) & (_pf_hx(hc, 15) < 3))
        .withColumn("_qty5", _pf_hx(hc, 16) < 4)
        .withColumn("_isin", _pf_hx(hc, 18) == 15)
        .withColumn("_long", (F.col("k") == 7) & (_pf_hx(hc, 20) < 2))
    )
    name3 = F.concat(
        _pf_el(words, _pf_hx(hc, 1)), F.lit(" "),
        _pf_el(words, _pf_hx(hc, 2)), F.lit(" "),
        _pf_el(sufs, _pf_hx(hc, 3) % 7),
    )
    name_cell = F.when(F.col("_long"), F.lit(_PF_LONG_NAME)).otherwise(
        F.when(
            F.col("_isin"),
            F.concat(
                name3, F.lit(" LU"),
                F.lpad(_pf_hx(hc, 21, 8).cast("string"), 10, "0"),
            ),
        ).otherwise(name3)
    )
    cents, nac = F.col("_cents"), F.col("_nac")
    mv_core = F.concat(
        F.format_number(F.floor(cents / 100), 0),
        F.lit("."), F.lpad((cents % 100).cast("string"), 2, "0"),
    )
    mv_cell = (
        F.when(F.col("_dash"), F.lit("-"))
        .when(F.col("_neg"), F.concat(F.lit("("), mv_core, F.lit(")")))
        .otherwise(mv_core)
    )
    na_cell = F.when(F.col("_dash"), F.lit("0.00%")).otherwise(
        F.concat(
            F.floor(nac / 100).cast("string"), F.lit("."),
            F.lpad((nac % 100).cast("string"), 2, "0"), F.lit("%"),
        )
    )
    rest = F.concat_ws(
        "  ", name_cell, _pf_el(curs, _pf_hx(hc, 4) % 8), mv_cell, na_cell
    )
    line = F.when(
        F.col("_qty5"),
        F.concat((_pf_hx(hc, 17, 3) % 999 + 1).cast("string"), F.lit("  "), rest),
    ).otherwise(rest)
    lines = hold.select(
        "doc_id", "f", "title",
        (F.col("k") * 2).alias("srt"), line.alias("line"),
    )

    # ---- per-fund special rows (header top + mid repeat, junk, 100%) ----
    specials = funds.select(
        "doc_id", "f", "title",
        F.explode(
            F.array(
                F.struct(F.lit(-1).alias("srt"), F.lit(_PF_HDR_LINE).alias("line")),
                F.struct(F.lit(7).alias("srt"), F.lit(_PF_HDR_LINE).alias("line")),
                F.struct(F.lit(100).alias("srt"), F.lit(_PF_JUNK_LINE).alias("line")),
                F.struct(F.lit(101).alias("srt"), F.lit(_PF_P12_LINE).alias("line")),
            )
        ).alias("s"),
    ).select("doc_id", "f", "title", F.col("s.srt").alias("srt"), F.col("s.line").alias("line"))

    body = (
        lines.unionByName(specials)
        .groupBy("doc_id", "f", "title")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("srt", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("body")
        )
    )
    section = F.concat(
        F.lit("PORTFOLIO STATEMENT - "), F.col("title"),
        F.lit("\n"), F.col("body"),
    )
    doc_text = (
        body.select("doc_id", F.struct("f", section.alias("page")).alias("fp"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("fp")), lambda s: s["page"]
                ),
                "\f",
            ).alias("secs")
        )
    )
    pages = doc_text.select(
        url.alias("url"),
        F.concat(
            F.lit("INTERIM REPORT PROVIDER_GAP_EN\nquiet filler line\f"),
            F.col("secs"),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )

    # ---- manifest: Cap (+Dis) share classes, null path, P10 sentinels ----
    base = funds.filter(~(d % 11 == 7))
    cap = base.select(
        F.concat(F.col("title"), F.lit(" - Cap")).alias("name"),
        url.alias("pdf_url"),
        F.concat(
            F.lit("LU"), F.lpad(_pf_hx(F.col("_hdf"), 5, 8).cast("string"), 10, "0")
        ).alias("isin"),
    )
    dis = base.filter(_pf_hx(F.col("_hdf"), 13) < 4).select(
        F.concat(F.col("title"), F.lit(" - Dis")).alias("name"),
        url.alias("pdf_url"),
        F.concat(
            F.lit("LU"), F.lpad(_pf_hx(F.col("_hdf"), 14, 8).cast("string"), 10, "0")
        ).alias("isin"),
    )
    sent = docs.filter(d % 13 == 5).select(
        F.lit("ghost fund").alias("name"),
        F.lit("nan").alias("pdf_url"),
        F.lit(None).cast("string").alias("isin"),
    )
    return pages, cap.unionByName(dis).unionByName(sent)


def q_pipeline_oracle(spark, sf):
    """The flagship under a FULL value-hash oracle: the REAL run_pipeline
    (classify -> Arrow-batch extract -> cleanup chain -> manifest join ->
    9-column projection, plans/pipeline.py) over the doc_id-derived
    gap_split_en fixture corpus; the DuckDB oracle recomputes the exact
    expected output from the same md5 derivations."""
    from .plans.pipeline import run_pipeline

    pages, manifest = _pipeline_fixture(spark, sf)
    return run_pipeline(pages, manifest)


def _pf_hx_sql(col: str, p: int, n: int = 1) -> str:
    return f"CAST(('0x' || substr({col}, {p}, {n})) AS BIGINT)"


def _pf_list_sql(items: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in items) + "]"


def _pipeline_oracle_sql() -> str:
    """DuckDB restatement of the fixture's EXPECTED pipeline output,
    regenerated from the same constants as the Spark renderer."""
    from .config import CURRENCIES

    w = _pf_list_sql(_PF_WORDS)
    s = _pf_list_sql(_PF_SUFFIX)
    c = _pf_list_sql(CURRENCIES[:8])
    return f"""
WITH funds AS (
  SELECT doc_id, fx.f AS f,
    md5('pipet:' || CAST(doc_id AS VARCHAR) || ':' || CAST(fx.f AS VARCHAR))
      AS hdf
  FROM documents, (SELECT UNNEST([1, 2]) AS f) fx
  WHERE fx.f = 1 OR doc_id % 4 = 1
), titled AS (
  SELECT doc_id, f, hdf,
    {w}[{_pf_hx_sql('hdf', 1)} + 1] || ' FUND ' || CAST(f AS VARCHAR)
      AS title
  FROM funds
), hold AS (
  SELECT doc_id, f, title, kx.k AS k,
    md5('pipe:' || CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR)
        || ':' || CAST(kx.k AS VARCHAR)) AS h
  FROM titled, (SELECT UNNEST(generate_series(0, 7)) AS k) kx
), cells AS (
  SELECT doc_id, f, title,
    {w}[{_pf_hx_sql('h', 1)} + 1] || ' ' || {w}[{_pf_hx_sql('h', 2)} + 1]
      || ' ' || {s}[{_pf_hx_sql('h', 3)} % 7 + 1] AS holding_name,
    {c}[{_pf_hx_sql('h', 4)} % 8 + 1] AS currency,
    ({_pf_hx_sql('h', 5, 6)} % 19999000 + 1000) AS cents,
    ({_pf_hx_sql('h', 11, 3)} % 9998 + 1) AS na_c,
    ({_pf_hx_sql('h', 14)} = 0) AS dash,
    ({_pf_hx_sql('h', 14)} <> 0 AND {_pf_hx_sql('h', 15)} < 3) AS neg
  FROM hold
  WHERE NOT (k = 7 AND {_pf_hx_sql('h', 20)} < 2)   -- P8 long-name drop
), vals AS (
  SELECT doc_id, f, title, holding_name, currency,
    CASE WHEN dash THEN 0.0 WHEN neg THEN -(cents / 100.0)
         ELSE cents / 100.0 END AS market_value,
    CASE WHEN dash THEN 0.0 ELSE na_c / 100.0 END AS net_assets
  FROM cells
), mani AS (
  SELECT doc_id, f, title || ' - Cap' AS website,
    'LU' || lpad(CAST({_pf_hx_sql('hdf', 5, 8)} AS VARCHAR), 10, '0') AS isin
  FROM titled WHERE doc_id % 11 <> 7
  UNION ALL
  SELECT doc_id, f, title || ' - Dis',
    'LU' || lpad(CAST({_pf_hx_sql('hdf', 14, 8)} AS VARCHAR), 10, '0')
  FROM titled WHERE doc_id % 11 <> 7 AND {_pf_hx_sql('hdf', 13)} < 4
)
SELECT 'PROVIDER_GAP_EN' AS fund_provider,
  lower(v.title) AS fund_name_report,
  m.website AS fund_name_website,
  m.isin AS isin,
  v.holding_name AS holding_name,
  v.market_value AS market_value,
  v.currency AS currency,
  v.net_assets AS net_assets,
  'https://host' || CAST(v.doc_id % 17 AS VARCHAR) || '.example.org/gap/'
    || CAST(v.doc_id AS VARCHAR) || '.pdf' AS pdf_url
FROM vals v LEFT JOIN mani m ON m.doc_id = v.doc_id AND m.f = v.f
"""


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

# ORDER MATTERS: the driver's CORRECTNESS gate snapshots the FIRST 50
# keys.  End-of-r05 composition: 48 training-data/extraction ops + the
# 2 flagship entries = 50 exactly (pipeline_oracle is key #50); the
# session's 12 late additions are all BORN below-window (the r06
# queue) with full value-hash oracles in the local gate.  The
# r05 registry grew past what one window can cover, so rotation policy
# (NOTES items 29/36/38): every rotation is TWO edits (remove from the
# window AND re-add below — verify with the oracle-no-query set
# check), and when all candidates lack a current-round driver row,
# rotate the op whose LOCAL evidence is strongest (bit-exact fuzz
# models, in-window composed oracles exercising the same code).
# Everything below the window stays covered every session by
# tests/test_oracle_parity.py, which runs ALL oracled entries.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- training-data ops: dedup family ------------------------------
    "dedup_soft_weights": q_dedup_soft_weights,
    "dedup_simhash_pairs_mp": q_dedup_simhash_pairs_mp,
    "dedup_bloom": q_dedup_bloom,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_boilerplate_lines": q_dedup_boilerplate_lines,
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_semantic": q_dedup_semantic,
    "dedup_winnow": q_dedup_winnow,
    "media_cdc_dedup": q_media_cdc_dedup,
    "html_main_content": q_html_main_content,
    "html_main_content_ctx": q_html_main_content_ctx,
    "html_outline": q_html_outline,
    "html_metadata": q_html_metadata,
    "html_tables": q_html_tables,
    "html_lists": q_html_lists,
    "html_jsonld": q_html_jsonld,
    "html_links": q_html_links,
    "corpus_link_graph": q_corpus_link_graph,
    "corpus_anchor_text": q_corpus_anchor_text,
    "graph_pagerank": q_graph_pagerank,
    "corpus_web_extract": q_corpus_web_extract,
    # -- text analysis ------------------------------------------------
    "text_dup_excise": q_text_dup_excise,
    "text_line_stats": q_text_line_stats,
    "text_char_entropy": q_text_char_entropy,
    "text_lexical_diversity": q_text_lexical_diversity,
    "text_script_mix": q_text_script_mix,
    "text_chunk_windows": q_text_chunk_windows,
    "text_bigram_lm": q_text_bigram_lm,
    "text_quality_classifier": q_text_quality_classifier,
    "text_tfidf_topk": q_text_tfidf_topk,
    # -- corpus decisions ---------------------------------------------
    "corpus_c4_filters": q_corpus_c4_filters,
    "corpus_dsir_sample": q_corpus_dsir_sample,
    "corpus_dedup_funnel": q_corpus_dedup_funnel,
    "corpus_robots_filter": q_corpus_robots_filter,
    "corpus_sitemap": q_corpus_sitemap,
    "corpus_frontier_score": q_corpus_frontier_score,
    "corpus_span_ladder": q_corpus_span_ladder,
    "corpus_assemble": q_corpus_assemble,
    "corpus_ingest": q_corpus_ingest,
    "corpus_ccnet_tiers": q_corpus_ccnet_tiers,
    "corpus_quality_ensemble": q_corpus_quality_ensemble,
    "corpus_split_safe": q_corpus_split_safe,
    "corpus_vocab_topk": q_corpus_vocab_topk,
    "corpus_drift": q_corpus_drift,
    "corpus_contamination_report": q_corpus_contamination_report,
    "corpus_health_report": q_corpus_health_report,
    "corpus_embed_prune": q_corpus_embed_prune,
    # -- events / temporal --------------------------------------------
    "events_slide_window": q_events_slide_window,
    # -- flagship (pipeline_oracle = the oracled fixture form) --------
    "pipeline_extract": q_pipeline_extract,
    "pipeline_oracle": q_pipeline_oracle,
    # ---- the driver's CORRECTNESS window is the FIRST 50 keys of this
    # ---- dict: 48 training-data ops + 2 flagship = 50 exactly.  Every
    # ---- entry from here down EITHER carries green driver rows from
    # ---- an earlier round (r04 for the dispatch variants and the
    # ---- previous backfill set, r02/r03 for the rest) OR is a
    # ---- born-below late-r05 addition flagged as such in its comment
    # ---- (graph_hits, text_mojibake, html_pub_date — the r06 window
    # ---- queue); ALL of them have permanent local-gate coverage
    # ---- (tests/test_oracle_parity.py runs ALL oracled entries), so
    # ---- sliding below the window as new ops land above is safe ----
    # r06 rotation queue (OLDEST driver rows first): P1-P8, W2-W4,
    # U1-U3, O2-O3, A2/A4/A5, J5 (r02/r03 greens), then the r05-rotated
    # training ops below (all r04-green).
    # corpus_text_filter (r04-green; its ml variant stays in-window)
    # rotated below to make room for corpus_c4_filters; dedup_simhash
    # (r04-green; simhash64/pairs/mp keep the family in-window) rotated
    # below for corpus_split_safe; dedup_embedding_cosine (r04-green;
    # the LSH scale path stays in-window) rotated below for
    # dedup_soft_weights; ann_lsh_topk (r04-green; brute baseline +
    # IVF scale path stay in-window) rotated below for
    # corpus_epoch_plan; text_quality (r04-green; the quality family
    # stays via classifier/entropy/unigram-lm) rotated below for
    # corpus_vocab_topk;
    # dedup_simhash_pairs (r04-green; the multi-probe generalization
    # dedup_simhash_pairs_mp stays in-window and subsumes its banded
    # join + Hamming verify) rotated below for text_tfidf_topk;
    # corpus_decontaminate (r04-green; corpus_end_to_end composes its
    # shingle anti-join in-window) rotated below for corpus_dsir_sample;
    # corpus_quota_topk (r04-green; corpus_curation composes its
    # WindowGroupLimit quota in-window, and text_tfidf_topk now pins the
    # same plan shape) rotated below for text_bigram_lm;
    # events_sessionize (r03+r04-green; asof_join + stream_window keep
    # the temporal family in-window) rotated below for
    # corpus_embed_prune;
    # corpus_source_stats (r04-green; corpus_curation composes its
    # domain keep-flags in-window and corpus_token_stats keeps the
    # per-source-agg shape) rotated below for dedup_winnow;
    # text_repetition (r04-green; text_line_stats keeps the Gopher
    # filter family in-window) rotated below for
    # corpus_quality_ensemble;
    # ann_cosine_topk (r02/r03/r04-green; the brute baseline stays
    # proven by the local gate + the IVF/LSH recall-floor tests that
    # compare against it every session) rotated below for corpus_drift;
    # dedup_simhash64 (r04-green; the simhash family stays in-window
    # via dedup_simhash_pairs_mp, which consumes the same fingerprint
    # builder) rotated below for corpus_dedup_funnel;
    # dedup_ngram_jaccard (r04-green; the shingle machinery stays
    # in-window via corpus_end_to_end's MinHash stage and the span/
    # winnow window hashes) rotated below for media_chunk_dedup;
    # p1_realign + text_tokens rotated below late in r05 to make room
    # for dedup_paragraphs / corpus_ccnet_tiers; text_normalize /
    # corpus_sample_hash / corpus_shard_shuffle / text_fingerprint /
    # text_pii_scrub / text_readability rotated below earlier in r05 —
    # all carry green r04 driver rows, permanent local-gate coverage,
    # and are the simplest ops of their families (narrow projections /
    # filters / one keyed exchange)
    # dedup_exact (r02/r03/r04-green; the md5-digest identity stays
    # in-window via dedup_soft_weights and corpus_end_to_end's exact
    # stage) rotated below for dedup_bloom;
    # dedup_corpus_keep (r04-green; the CC+join-back keep decision
    # stays in-window via dedup_keep_best — its argmax generalization —
    # plus corpus_split_safe and corpus_end_to_end) rotated below for
    # dedup_keep_best;
    # dedup_url_canonical (r04-green; the canonicalize+dedup stage is
    # composed in-window by corpus_end_to_end, and the url family stays
    # via corpus_url_quality / corpus_domain_filter / corpus_ingest)
    # rotated below for text_lexical_diversity;
    # dedup_embedding_cosine_lsh (r04-green; the embedding-dedup scale
    # path stays in-window via dedup_semantic + corpus_embed_prune +
    # ann_ivf_topk, and the hyperplane-LSH recall floors re-prove the
    # bucketing every session) rotated below for text_chunk_windows;
    # dedup_minhash_lsh (r04-green; its r05-changed shared pairing code
    # — band_rows expansion + shuffle_hash pins — is exercised
    # in-window with full value-hash oracles by dedup_incremental,
    # corpus_split_safe, and corpus_end_to_end's MinHash+CC stage)
    # rotated below for corpus_url_templates;
    # text_dup_spans (r04-green; the windowed-hash span machinery stays
    # in-window via text_dup_excise, corpus_span_ladder, and the funnel
    # audit) rotated below for text_script_mix;
    # events_asof_join (r04-green, unchanged in r05; its oracle is
    # DuckDB's NATIVE ASOF JOIN — the strongest independent check in
    # the local gate, re-run every session) rotated below for
    # corpus_contamination_report;
    # dedup_cluster_cc (r04-green; the CC machinery keeps THREE
    # in-window recursive-CTE oracles via dedup_keep_best,
    # corpus_split_safe, and corpus_end_to_end) rotated below for
    # corpus_health_report;
    # ann_ivf_topk (r04-green + r05 local-gate re-greens; the
    # r05-changed shared centroid argmax (_assign_nearest_centroid) is
    # in-window with full oracles via corpus_embed_prune and
    # dedup_semantic) rotated below for events_slide_window;
    # text_langid (r04-green + green local-gate margin parity every
    # session; the langid scoring chain stays in-window via
    # corpus_text_filter_ml's trigram routing) rotated below for
    # media_cdc_dedup;
    # dedup_incremental (r05; its ENTIRE oracle chain _INC_LSH_CHAIN
    # is composed verbatim in-window by corpus_ingest, so the
    # incremental-LSH code keeps a full value-hash driver row) rotated
    # below for html_main_content;
    # corpus_token_stats (r05; rotated below for html_outline — of the
    # no-driver-row-yet candidates it carries the STRONGEST local
    # evidence: exact percentile == quantile_cont == numpy.percentile
    # bit-for-bit, fuzz-proven every session) rotated below;
    # corpus_curation (r05; rotated below for corpus_web_extract — its
    # constituent signals all keep in-window rows: quota WindowGroupLimit
    # via text_tfidf_topk's plan pin, domain keep via corpus_health /
    # source-stats fragments, readability via corpus_quality_ensemble)
    # corpus_stratified_sample (r05; its per-stratum hex-threshold
    # CASE is composed VERBATIM in-window by corpus_ingest's final
    # stage, and the hashlib threshold fuzz re-proves it every
    # session) rotated below for html_main_content_ctx;
    # corpus_pack_sequences + corpus_mixture_sample (r05; BOTH stages
    # run composed in-window inside corpus_assemble — classifier ->
    # mixture -> shard+pack — with a full value-hash oracle, and both
    # carry hashlib-model fuzzes every session) rotated below for
    # html_links / corpus_link_graph;
    # corpus_epoch_plan (r05; rotated below for graph_pagerank — its
    # arithmetic is ALL-integer with a bit-exact Python-model fuzz
    # every session, the strongest local evidence in the window)
    # media_chunk_dedup (r05; rotated below for html_metadata — the
    # fixed-grid chunk stats share _chunk_share_stats and the blob
    # synth with media_cdc_dedup, which stays in-window and subsumes
    # the chunk-hash/share machinery; the grid itself keeps the local
    # parity oracle every session)
    # text_unigram_lm (r05; rotated below for corpus_robots_filter —
    # the unigram-LM fold runs composed IN-WINDOW with full value-hash
    # oracles inside corpus_ccnet_tiers and corpus_quality_ensemble,
    # both via the shared _unigram_fold_parts fragments)
    # corpus_text_filter_ml (r04-green; rotated below for
    # corpus_anchor_text — of the in-window candidates it is one of
    # only three with a prior driver row; the trigram-langid routing
    # keeps its regenerated-profile oracle + margin parity in the
    # local gate every session)
    # graph_hits is BORN below-window (late-r05 addition after the
    # window's rotation budget was spent on ops without any prior
    # driver row); its full value-hash oracle runs in the local gate
    # every session and it heads the r06 window queue.
    # corpus_url_quality (r05; rotated below for corpus_frontier_score
    # — the count×weight scoring arithmetic runs composed IN-WINDOW
    # inside the frontier capstone with the SAME regenerated
    # URL_WORD_WEIGHTS oracle via the shared _url_word_terms_sql
    # fragment; the threshold url_keep compare stays proven by the
    # local gate every session)
    # corpus_domain_filter (r04-green; rotated below for html_tables —
    # its blocklist suffix-match predicate runs composed IN-WINDOW
    # with a full value-hash oracle inside corpus_frontier_score via
    # the shared filter_blocked_domains; the standalone form keeps its
    # regenerated-blocklist oracle in the local gate every session)
    # text_mojibake is BORN below-window (late-r05 addition, same call
    # as graph_hits); full value-hash oracle in the local gate every
    # session; joins the r06 window queue behind graph_hits.
    # corpus_end_to_end (r04-green; rotated below for html_lists — the
    # SAME six-stage chain runs in-window stage-for-stage via
    # corpus_dedup_funnel, whose full value-hash oracle shares
    # _e2e_stages/_e2e_chain_sql with it, and every constituent stage
    # keeps its own in-window row)
    # corpus_url_templates (r05-born; rotated below for corpus_sitemap
    # — its host+digit-template counts run composed IN-WINDOW with a
    # full value-hash oracle inside corpus_frontier_score's saturation
    # stage; the standalone form keeps its regenerated oracle in the
    # local gate every session)
    "dedup_exact": q_dedup_exact,
    "corpus_url_templates": q_corpus_url_templates,
    "corpus_end_to_end": q_corpus_end_to_end,
    "graph_hits": q_graph_hits,
    "text_mojibake": q_text_mojibake,
    "html_pub_date": q_html_pub_date,
    # events_stream_window (r04-green driver row; the windowed-agg
    # shape stays in-window via events_slide_window — the streaming
    # source/watermark half keeps its r04 row + the local gate, which
    # runs the real AvailableNow stream every session) rotated below
    # for html_jsonld
    "events_stream_window": q_events_stream_window,
    # corpus_feed_items + html_jsonld-era late ops are BORN below-window
    # (the r06 window queue) with full value-hash oracles in the local
    # gate every session
    "corpus_feed_items": q_corpus_feed_items,
    "html_robots_meta": q_html_robots_meta,
    "html_opengraph": q_html_opengraph,
    "corpus_dom_stats": q_corpus_dom_stats,
    "html_images": q_html_images,
    "corpus_image_captions": q_corpus_image_captions,
    "corpus_crawl_diff": q_corpus_crawl_diff,
    "html_feed_discovery": q_html_feed_discovery,
    "html_hreflang": q_html_hreflang,
    "corpus_canonical_dedup": q_corpus_canonical_dedup,
    "corpus_fetch_schedule": q_corpus_fetch_schedule,
    "corpus_translation_clusters": q_corpus_translation_clusters,
    "corpus_bitext_pairs": q_corpus_bitext_pairs,
    "text_sentences": q_text_sentences,
    "graph_hop_distance": q_graph_hop_distance,
    # events_funnel + events_retention are BORN below-window (late-r05
    # additions, the graph_hits call); full value-hash oracles in the
    # local gate every session; they join the r06 window queue.
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "text_dehyphenate": q_text_dehyphenate,
    "text_code_detect": q_text_code_detect,
    "corpus_inverted_index": q_corpus_inverted_index,
    "corpus_warc_records": q_corpus_warc_records,
    "events_session_paths": q_events_session_paths,
    "events_rate_spikes": q_events_rate_spikes,
    "corpus_robots_rules": q_corpus_robots_rules,
    "text_license_detect": q_text_license_detect,
    "corpus_sitemap_diff": q_corpus_sitemap_diff,
    "graph_degree_stats": q_graph_degree_stats,
    "text_vocab_coverage": q_text_vocab_coverage,
    "events_ab_lift": q_events_ab_lift,
    "html_link_resolve": q_html_link_resolve,
    "media_srt_cues": q_media_srt_cues,
    "corpus_cdx_records": q_corpus_cdx_records,
    # corpus_hll_distinct is BORN below-window (late-r05 sketch axis);
    # full value-hash oracle in the local gate every session; joins the
    # r06 window queue.
    "corpus_hll_distinct": q_corpus_hll_distinct,
    "dedup_jaccard_estimate": q_dedup_jaccard_estimate,
    "corpus_length_buckets": q_corpus_length_buckets,
    "corpus_registered_domains": q_corpus_registered_domains,
    "corpus_bpe_pairs": q_corpus_bpe_pairs,
    "corpus_cooccurrence": q_corpus_cooccurrence,
    "events_hll_users": q_events_hll_users,
    "html_forms": q_html_forms,
    "events_bot_detect": q_events_bot_detect,
    "corpus_host_safety": q_corpus_host_safety,
    "corpus_warc_extract": q_corpus_warc_extract,
    "events_attribution": q_events_attribution,
    "corpus_url_quality": q_corpus_url_quality,
    "corpus_domain_filter": q_corpus_domain_filter,
    "corpus_text_filter_ml": q_corpus_text_filter_ml,
    "media_chunk_dedup": q_media_chunk_dedup,
    "text_unigram_lm": q_text_unigram_lm,
    "corpus_epoch_plan": q_corpus_epoch_plan,
    "corpus_pack_sequences": q_corpus_pack_sequences,
    "corpus_mixture_sample": q_corpus_mixture_sample,
    "corpus_curation": q_corpus_curation,
    "corpus_stratified_sample": q_corpus_stratified_sample,
    "corpus_token_stats": q_corpus_token_stats,
    "ann_ivf_topk": q_ann_ivf_topk,
    "text_langid": q_text_langid,
    "dedup_incremental": q_dedup_incremental,
    "dedup_cluster_cc": q_dedup_cluster_cc,
    "events_asof_join": q_events_asof,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "text_dup_spans": q_text_dup_spans,
    "dedup_embedding_cosine_lsh": q_dedup_embedding_cosine_lsh,
    "dedup_corpus_keep": q_dedup_corpus_keep,
    "dedup_url_canonical": q_dedup_url_canonical,
    "corpus_text_filter": q_corpus_text_filter,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "corpus_decontaminate": q_corpus_decontaminate,
    "corpus_quota_topk": q_corpus_quota_topk,
    "events_sessionize": q_events_sessionize,
    "corpus_source_stats": q_corpus_source_stats,
    "text_repetition": q_text_repetition,
    "ann_cosine_topk": q_ann_cosine_topk,
    "dedup_simhash64": q_dedup_simhash64,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_lsh_topk": q_ann_lsh_topk,
    "text_quality": q_text_quality,
    "p1_realign": q_p1_realign,
    "text_tokens": q_text_tokens,
    "text_normalize": q_text_normalize,
    "corpus_sample_hash": q_corpus_sample_hash,
    "corpus_shard_shuffle": q_corpus_shard_shuffle,
    "text_fingerprint": q_text_fingerprint,
    "text_pii_scrub": q_text_pii_scrub,
    "text_readability": q_text_readability,
    "d4_shape_dispatch": q_d4_shape_dispatch,
    "d5_fallback_chain": q_d5_fallback_chain,
    "d5_rename_retry": q_d5_rename_retry,
    "d1_manifest_routing": q_d1_manifest_routing,
    "d2_family_fallback": q_d2_family_fallback,
    "f_hard_name_clean": q_f_hard_name_clean,
    "s1_scan_prune": q_s1_scan_prune,
    "s4_page_explode": q_s4_page_explode,
    "s5_grid_slice": q_s5_grid_slice,
    "s7_gap_split": q_s7_gap_split,
    "j1_broadcast_join": q_j1_broadcast_join,
    "j2_interval_join": q_j2_interval_join,
    "w1_ffill": q_w1_ffill,
    "w2_name_ffill": q_w2_name_ffill,
    "w3_block_fusion": q_w3_block_fusion,
    "w4_lead": q_w4_lead,
    "w5_toc_repair": q_w5_toc_repair,
    "p9_first_occurrence_drop": q_p9_first_occurrence_drop,
    "a1_mode": q_a1_mode,
    "a3_threshold_retry": q_a3_threshold_retry,
    "f_numeric_chain": q_f_numeric_chain,
    "f_name_clean": q_f_name_clean,
    "d1_dispatch": q_d1_dispatch,
    "p2_projection": q_p2_projection,
    "p3_whitelist": q_p3_whitelist,
    "p4_keep_anchor": q_p4_keep_anchor,
    "p5_null_blank": q_p5_null_blank,
    "p6_numeric_shape": q_p6_numeric_shape,
    "p7_junk_drop": q_p7_junk_drop,
    "p8_length_pred": q_p8_length_pred,
    "p11_shape_filter": q_p11_shape_filter,
    "p12_value_filter": q_p12_value_filter,
    "o3_positional_slice": q_o3_positional_slice,
    "o4_bounded_tail": q_o4_bounded_tail,
    "u1_union": q_u1_union,
    "u2_distinct": q_u2_distinct,
    "j5_anti_join": q_j5_anti_join,
    "w6_first_seed": q_w6_first_seed,
    "a2_group_agg": q_a2_group_agg,
    "a5_keep_last": q_a5_keep_last,
    "u3_two_up_split": q_u3_two_up_split,
    "p10_sentinel": q_p10_sentinel,
    "o2_page_sort": q_o2_page_sort,
    "a4_counts": q_a4_counts,
    "f2_en_normalize": q_f2_en_normalize,
    "f3_format_infer": q_f3_format_infer,
    "f_token_strip": q_f_token_strip,
    "f8_purge_numeric": q_f8_purge_numeric,
    "f10_charset_purge": q_f10_charset_purge,
    "f11_multi_pct": q_f11_multi_pct,
    "f12_currency_rescue": q_f12_currency_rescue,
    "f16_rewrite_const": q_f16_rewrite_const,
    "f17_regex_extract": q_f17_regex_extract,
    "d2_page0_dispatch": q_d2_page0_dispatch,
    "d3_header_variant": q_d3_header_variant,
}

# shared SQL fragments -------------------------------------------------------


def _cos_sql(a: str, b: str) -> str:
    """Cosine between two embedding-table aliases, folding left-to-right
    in float64 exactly like operators/similarity.py::cosine."""

    def dot(x, y):
        return (
            f"list_reduce(list_transform(generate_series(1, "
            f"len({x}.embedding)), i -> CAST({x}.embedding[i] AS DOUBLE) * "
            f"CAST({y}.embedding[i] AS DOUBLE)), (p, q) -> p + q)"
        )

    return f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))"


def _lsh_bucket_sql(
    table_no: int, n_planes: int, dim: int = 64, col: str = "embedding"
) -> str:
    """Per-table LSH bucket string, reproducing similarity.hyperplane_sign
    (md5-derived +/-1 plane components, left-to-right float64 fold)."""
    signs = []
    for p in range(table_no * n_planes, (table_no + 1) * n_planes):
        fold = (
            f"list_reduce(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({col}[i] AS DOUBLE) * "
            f"(CASE WHEN substr(md5('plane{p}:' || CAST(i - 1 AS VARCHAR)), "
            f"1, 1) >= '8' THEN 1.0 ELSE -1.0 END)), (p, q) -> p + q)"
        )
        signs.append(f"(CASE WHEN {fold} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(signs)

# The RE2 spelling of the engine's whitespace-token split, quoted for
# SQL splicing — ONE site; every token-consuming oracle interpolates
# this (text.py: 'any change must keep them in lockstep').
_WSRE2 = "'" + text.WS_SPLIT_RE2 + "'"


def _split_case_sql(
    gexpr: str, rest: str = "test", salt: str = "sp0"
) -> str:
    """The oracle spelling of split_assign's CASE — thresholds
    regenerated from the SAME split_thresholds builder the engine
    uses, so the float accumulation and the hex literals are identical
    by construction."""
    from .operators.sampling import split_thresholds

    arms = " ".join(
        f"WHEN substr(md5(CAST({gexpr} AS VARCHAR) || '|{salt}'), 1, 4)"
        f" < '{h}' THEN '{n}'"
        for n, h in split_thresholds()
    )
    return f"CASE {arms} ELSE '{rest}' END"

# mirrors _corpus_with_dupes: whitespace probe FIRST, then dup union
_DUPES = f"""
wsbase AS (
    SELECT doc_id, text || {_WS_NOISE_SQL} AS text, lang, source
    FROM documents
),
corpus AS (
    SELECT doc_id, text, lang, source FROM wsbase
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source
    FROM wsbase WHERE doc_id % 50 = 0
)
"""

_TOKS = """
toks AS (
    SELECT doc_id, lang, source,
           list_filter(regexp_split_to_array(text, """ + _WSRE2 + """), t -> t <> '') AS tk
    FROM corpus
)
"""

_SHINGLES = """
sh AS (
    SELECT DISTINCT doc_id, lang, source,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
    FROM toks, UNNEST(generate_series(1, greatest(len(tk) - 2, 0))) AS g(i)
    WHERE len(tk) >= 3
)
"""

# MinHash signatures -> bands -> candidate pairs, shared verbatim by the
# dedup_minhash_lsh and dedup_cluster_cc oracles (one site to mirror if
# the engine's n_hashes/band_size/seed format ever changes).
_MH_PAIRS = (
    "mh AS (SELECT doc_id, "
    + ", ".join(
        f"MIN(substr(md5(shingle || ':{i}'), 1, 8)) AS h{i}"
        for i in range(8)
    )
    + " FROM sh GROUP BY doc_id), "
    "bands AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_no, "
        f"h{2 * b} || '|' || h{2 * b + 1} AS band_val FROM mh"
        for b in range(4)
    )
    + "), "
    "pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
    "  FROM bands a JOIN bands b "
    "  ON a.band_no = b.band_no AND a.band_val = b.band_val "
    "  WHERE a.doc_id < b.doc_id)"
)

# doc_id-derived host fixture + blocklist keep rule (the SQL mirror of
# _doc_host / _INGEST_BLOCKLIST), shared by the corpus_domain_filter
# and corpus_ingest oracles.
_HOST_SQL = (
    "CASE doc_id % 5 "
    "WHEN 0 THEN 'spam-site.com' "
    "WHEN 1 THEN 'ads.spam-site.com' "
    "WHEN 2 THEN 'notspam-site.com' "
    "WHEN 3 THEN 'good-' || CAST(doc_id % 50 AS VARCHAR) || '.org' "
    "ELSE 'tracker.net' END"
)
_HOST_KEEP_SQL = (
    "NOT (host IN ('spam-site.com', 'tracker.net') "
    "OR host LIKE '%.spam-site.com' OR host LIKE '%.tracker.net')"
)


def _url_word_terms_sql(var: str = "u") -> str:
    """The url_quality_score count×weight sum REGENERATED from the
    same URL_WORD_WEIGHTS dict in the same sorted word order (the
    left-assoc terms after the 0.0 seed — identical IEEE op
    sequence); shared by the corpus_url_quality and
    corpus_frontier_score oracles."""
    from .operators.urls import URL_WORD_WEIGHTS

    return " + ".join(
        f"((length({var}) - length(replace({var}, '{w}', ''))) "
        f"/ {len(w)}) * CAST({float(wt)!r} AS DOUBLE)"
        for w, wt in sorted(URL_WORD_WEIGHTS.items())
    )


def _url_quality_oracle_sql() -> str:
    """corpus_url_quality oracle — the count×weight arithmetic is
    REGENERATED from the same URL_WORD_WEIGHTS dict in the same sorted
    word order (left-assoc 0.0-seeded sum, identical IEEE op sequence),
    over the same host/suffix fixture arithmetic."""
    terms = _url_word_terms_sql()
    url_expr = (
        "'https://' || " + _HOST_SQL + " || '/p/' || "
        "CAST(doc_id AS VARCHAR) || CASE doc_id % 4 "
        "WHEN 0 THEN '/casino/coupon-popup' "
        "WHEN 1 THEN '/wiki/research-article' "
        "WHEN 2 THEN '/blog/login' ELSE '' END"
    )
    return (
        f"WITH urls AS (SELECT doc_id, {url_expr} AS url FROM documents), "
        "low AS (SELECT doc_id, url, lower(url) AS u FROM urls), "
        f"sc AS (SELECT doc_id, url, 0.0 + {terms} AS s FROM low) "
        "SELECT doc_id, url, ROUND(s, 6) AS url_score, "
        "s > CAST(-0.5 AS DOUBLE) AS url_keep FROM sc"
    )


def _entropy_oracle_sql() -> str:
    """text_char_entropy oracle — regenerated from the SAME class list
    the engine uses (a..z, digit, space, other; fixed fold order,
    one ROUND 6), over the same doc_id-derived probe injection."""
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    cnts = [
        f"CAST(length(t) - length(replace(t, '{ch}', '')) AS BIGINT) "
        f"AS c{i}"
        for i, ch in enumerate(letters)
    ]
    cnts.append(
        "CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) "
        "AS BIGINT) AS c26"
    )
    cnts.append(
        "CAST(length(t) - length(replace(t, ' ', '')) AS BIGINT) AS c27"
    )
    total = " + ".join(f"c{i}" for i in range(28))
    terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN -(c{i} / n) * log2(c{i} / n) "
        f"ELSE 0.0 END)"
        for i in range(29)
    )
    return (
        "WITH inj AS (SELECT doc_id, text || CASE doc_id % 3 "
        "  WHEN 0 THEN ' 0123456789!!' WHEN 1 THEN ' 42,42;' "
        "  ELSE '' END AS text FROM documents), "
        "lowered AS (SELECT doc_id, lower(text) AS t FROM inj), "
        f"cc AS (SELECT doc_id, length(t) AS n, {', '.join(cnts)} "
        "  FROM lowered), "
        f"cc2 AS (SELECT *, n - ({total}) AS c28 FROM cc) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_chars, "
        f"CASE WHEN n > 0 THEN ROUND(0.0 + {terms}, 6) ELSE 0.0 END "
        "AS entropy FROM cc2"
    )


def _unigram_fold_parts(var: str = "w") -> tuple:
    """(lookup CASE over SQL expression ``var``, known-word list)
    regenerated from the SAME UNIGRAM_LOGPROBS dict the engine's
    literal map is built from — shared by the text_unigram_lm,
    corpus_ccnet_tiers, and text_bigram_lm oracles."""
    from .operators.text import UNIGRAM_LOGPROBS, UNKNOWN_LOGPROB

    items = sorted(UNIGRAM_LOGPROBS.items())
    # CAST each arm to DOUBLE: DuckDB types bare decimal literals as
    # DECIMAL and the fold then sums (and overflows) in decimal
    arms = " ".join(
        f"WHEN '{w}' THEN CAST({lp!r} AS DOUBLE)" for w, lp in items
    )
    case = (
        f"CASE {var} {arms} ELSE CAST({UNKNOWN_LOGPROB!r} AS DOUBLE) END"
    )
    known = ", ".join(f"'{w}'" for w, _ in items)
    return case, known


# the text_unigram_lm / corpus_ccnet_tiers probe suffix, mirrored from
# the query-side rotation (known stopwords / case+unknown / short / none)
_UNIGRAM_PROBE_SQL = (
    "CASE doc_id % 4 "
    "  WHEN 0 THEN ' the of and to' "
    "  WHEN 1 THEN ' The WAS unseenword' "
    "  WHEN 2 THEN ' is' ELSE '' END"
)


def _unigram_oracle_sql() -> str:
    """text_unigram_lm oracle — lookup CASE + known-set from
    _unigram_fold_parts; ordered left fold via list_reduce over a
    0.0-prepended list (identical addition order to the engine's
    aggregate())."""
    case, known = _unigram_fold_parts()
    return (
        "WITH inj AS (SELECT doc_id, text || " + _UNIGRAM_PROBE_SQL +
        " AS text FROM documents), "
        "tks AS (SELECT doc_id, list_transform(list_filter("
        "  regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        "  w -> lower(w)) AS tk FROM inj) "
        "SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, "
        f"CAST(len(list_filter(tk, w -> w IN ({known}))) AS BIGINT) "
        "AS n_known, "
        "CASE WHEN len(tk) > 0 THEN ROUND(list_reduce(list_prepend("
        f"0.0, list_transform(tk, w -> {case})), (p, q) -> p + q) "
        "/ len(tk), 6) ELSE 0.0 END AS avg_logprob FROM tks"
    )


def _ccnet_tiers_oracle_sql() -> str:
    """corpus_ccnet_tiers oracle — the same unigram fold carrying lang,
    then per-language tercile cutoffs via quantile_cont (the same
    linear-interpolation definition as Spark's exact percentile; both
    sides ROUND 6) and the same >= boundary rule.  The 1/3 and 2/3
    fractions are formatted from the identical Python doubles the
    engine passes to F.lit."""
    case, _ = _unigram_fold_parts()
    q_head, q_tail = repr(2.0 / 3.0), repr(1.0 / 3.0)
    return (
        "WITH inj AS (SELECT doc_id, lang, text || "
        + _UNIGRAM_PROBE_SQL + " AS text FROM documents), "
        "tks AS (SELECT doc_id, lang, list_transform(list_filter("
        "  regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        "  w -> lower(w)) AS tk FROM inj), "
        "sc AS (SELECT doc_id, lang, "
        "  CASE WHEN len(tk) > 0 THEN ROUND(list_reduce(list_prepend("
        f"  0.0, list_transform(tk, w -> {case})), (p, q) -> p + q) "
        "  / len(tk), 6) ELSE 0.0 END AS avg_logprob FROM tks), "
        "cuts AS (SELECT lang, "
        f"  ROUND(quantile_cont(avg_logprob, {q_head}), 6) AS ch, "
        f"  ROUND(quantile_cont(avg_logprob, {q_tail}), 6) AS ct "
        "  FROM sc GROUP BY lang) "
        "SELECT s.doc_id, s.lang, s.avg_logprob, "
        "  CASE WHEN s.avg_logprob >= c.ch THEN 'head' "
        "       WHEN s.avg_logprob >= c.ct THEN 'middle' "
        "       ELSE 'tail' END AS tier, "
        "  s.avg_logprob >= c.ct AS keep "
        "FROM sc s JOIN cuts c ON s.lang IS NOT DISTINCT FROM c.lang"
    )


def _hash_bucket_case(table: dict) -> str:
    """The 256-arm md5-bucket CASE regenerated from a {2-hex: weight}
    dict (CLASSIFIER_WEIGHTS / DSIR_LOG_RATIOS) — the engine's literal
    map, restated."""
    arms = " ".join(
        f"WHEN '{k}' THEN CAST({w!r} AS DOUBLE)"
        for k, w in sorted(table.items())
    )
    return f"CASE substr(md5(w), 1, 2) {arms} END"


def _ngram_feat_ctes(src: str) -> str:
    """The hashed-bag FEATURE chain (tks -> big -> ft, with
    ft(doc_id, nf, feats)) over source CTE ``src`` — mirrors
    text.ngram_features byte for byte: lowered whitespace-run unigrams,
    adjacent bigrams, unigrams-then-bigrams concatenation.  Shared by
    the classifier and DSIR oracles."""
    return (
        f"tks AS (SELECT doc_id, list_transform(list_filter("
        "  regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        f"  w -> lower(w)) AS tk FROM {src}), "
        "big AS (SELECT doc_id, tk, CASE WHEN len(tk) >= 2 THEN "
        "  list_transform(generate_series(1, len(tk) - 1), "
        "    i -> tk[i] || ' ' || tk[i + 1]) "
        "  ELSE CAST([] AS VARCHAR[]) END AS bi FROM tks), "
        "ft AS (SELECT doc_id, len(tk) + len(bi) AS nf, "
        "  list_concat(tk, bi) AS feats FROM big)"
    )


def _classifier_ctes(src: str) -> str:
    """The fastText-classifier CTE chain (tks -> big -> ft -> sc, with
    sc(doc_id, nf, s)) over source CTE ``src`` — feature chain shared
    via _ngram_feat_ctes, the bucket CASE regenerated from the same
    CLASSIFIER_WEIGHTS dict the engine's literal map is built from
    (one site to edit); summed by the same ordered left fold as the
    engine's aggregate(), one division.  Shared by the
    text_quality_classifier and corpus_assemble oracles."""
    from .operators.text import CLASSIFIER_BIAS, CLASSIFIER_WEIGHTS

    case = _hash_bucket_case(CLASSIFIER_WEIGHTS)
    bias = f"CAST({float(CLASSIFIER_BIAS)!r} AS DOUBLE)"
    return (
        _ngram_feat_ctes(src)
        + ", sc AS (SELECT doc_id, nf, CASE WHEN nf > 0 THEN "
        f"  {bias} + list_reduce(list_prepend(0.0, "
        f"  list_transform(feats, w -> {case})), (p, q) -> p + q) / nf "
        f"  ELSE {bias} END AS s FROM ft)"
    )


def _classifier_oracle_sql() -> str:
    """text_quality_classifier oracle — keep on the UNROUNDED score
    (bit-identical fold -> safe comparison); chain shared via
    _classifier_ctes."""
    return (
        f"WITH inj AS (SELECT doc_id, text || {_WS_NOISE_SQL} AS text "
        "  FROM documents), "
        + _classifier_ctes("inj")
        + " SELECT doc_id, CAST(nf AS BIGINT) AS n_features, "
        "ROUND(s, 6) AS score, s >= 0.0 AS keep FROM sc"
    )


# corpus_mixture_sample oracle — mirrors operators/sampling.py::
# mixture_sample arm for arm: integer sqrt-weights (floor(sqrt*1e6)),
# exact BIGINT weight sum, the same fixed double op order for the
# threshold ((65536*T) * w / W / n), and the same 4-hex-digit salted
# digest realization.  13107200.0 = 65536.0 * target_total(200).
_MIXTURE_ORACLE_SQL = (
    "WITH base AS (SELECT doc_id, source FROM documents), "
    "e1 AS (SELECT doc_id + 1000000 AS doc_id, source FROM base "
    "  WHERE substr(md5(source), 1, 1) <= '7'), "
    "e2 AS (SELECT doc_id + 2000000 AS doc_id, source FROM base "
    "  WHERE substr(md5(source), 1, 1) <= '3'), "
    "corpus AS (SELECT * FROM base UNION ALL SELECT * FROM e1 "
    "  UNION ALL SELECT * FROM e2), "
    "cnt AS (SELECT source, COUNT(*) AS src_n, "
    "  CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) "
    "  AS src_w FROM corpus GROUP BY source), "
    "tw AS (SELECT SUM(src_w) AS w FROM cnt), "
    "rates AS (SELECT source, src_n, src_w, "
    "  least(CAST(floor(13107200.0 * CAST(src_w AS DOUBLE) "
    "    / CAST(w AS DOUBLE) / CAST(src_n AS DOUBLE)) AS BIGINT), "
    "    65536) AS keep_thr FROM cnt, tw) "
    "SELECT c.doc_id, c.source, r.src_n, r.src_w, r.keep_thr "
    "FROM corpus c JOIN rates r USING (source) "
    "WHERE r.keep_thr >= 65536 "
    "OR substr(md5(CAST(c.doc_id AS VARCHAR) || '|mx0'), 1, 4) "
    "   < printf('%04x', r.keep_thr)"
)


# Incremental (cross-corpus) LSH chain: expects CTEs wsbase(doc_id,
# text) [the REFERENCE corpus] and newc(doc_id, text) [the NEW batch]
# to be defined upstream; emits allc..refb plus flags(doc_id, dup_of,
# n_ref_matches) with the reference-side hot-band cap at 8 — mirrors
# operators/dedup.py::incremental_lsh_flags band for band.  Shared by
# the dedup_incremental and corpus_ingest oracles.
_INC_LSH_CHAIN = (
    "allc AS (SELECT 'r' AS side, doc_id, text FROM wsbase "
    "  UNION ALL SELECT 'n' AS side, doc_id, text FROM newc), "
    "itoks AS (SELECT side, doc_id, "
    "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
    "    t -> t <> '') AS tk FROM allc), "
    "ish AS (SELECT DISTINCT side, doc_id, "
    "  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle "
    "  FROM itoks, UNNEST(generate_series(1, "
    "    greatest(len(tk) - 2, 0))) AS g(i) WHERE len(tk) >= 3), "
    "imh AS (SELECT side, doc_id, "
    + ", ".join(
        f"MIN(substr(md5(shingle || ':{i}'), 1, 8)) AS h{i}"
        for i in range(8)
    )
    + " FROM ish GROUP BY side, doc_id), "
    "ibands AS ("
    + " UNION ALL ".join(
        f"SELECT side, doc_id, {b} AS band_no, "
        f"h{2 * b} || '|' || h{2 * b + 1} AS band_val FROM imh"
        for b in range(4)
    )
    + "), "
    "refb AS (SELECT doc_id, band_no, band_val, "
    "  COUNT(*) OVER (PARTITION BY band_no, band_val) AS bf "
    "  FROM ibands WHERE side = 'r'), "
    "flags AS (SELECT n.doc_id AS doc_id, MIN(r.doc_id) AS dup_of, "
    "  COUNT(DISTINCT r.doc_id) AS n_ref_matches "
    "FROM ibands n JOIN refb r "
    "  ON n.band_no = r.band_no AND n.band_val = r.band_val "
    "WHERE n.side = 'n' AND r.bf <= 8 "
    "GROUP BY n.doc_id)"
)


def _simhash_fp_cte(src: str, n_bits: int = 64) -> str:
    """CTE chain computing ``fps(doc_id, fp)`` — the n-bit SimHash
    fingerprint string — over ``src`` (any (doc_id, text) relation),
    mirroring operators/dedup.py::simhash_bits nibble for nibble.
    Shared by the dedup_simhash64 and dedup_simhash_pairs oracles so a
    fingerprint change mirrors to ONE site."""
    assert n_bits <= 64
    hcols = "md5(tok) AS h" + (
        ", md5(tok || '#2') AS h2" if n_bits > 32 else ""
    )

    def nib(i: int) -> str:
        return f"substr({'h' if i < 32 else 'h2'}, {i % 32 + 1}, 1)"

    votes = ", ".join(
        f"SUM(CASE WHEN {nib(i)} >= '8' THEN 1 ELSE -1 END) AS b{i}"
        for i in range(n_bits)
    )
    fp = " || ".join(
        f"(CASE WHEN b{i} > 0 THEN '1' ELSE '0' END)" for i in range(n_bits)
    )
    return (
        f"simt AS (SELECT doc_id, {hcols} FROM ("
        f"  SELECT doc_id, UNNEST(list_filter(regexp_split_to_array("
        f"text, '{text.WS_SPLIT_RE2}'), x -> x <> '')) AS tok "
        f"FROM {src})), "
        f"simv AS (SELECT doc_id, {votes} FROM simt GROUP BY doc_id), "
        f"fps AS (SELECT doc_id, {fp} AS fp FROM simv)"
    )


def _langid_parts() -> tuple[str, str, str, str]:
    """(cte_chain, guess_expr, max_expr, margin_expr) for the trigram
    language ID — regenerated from the SAME literal profile dict the
    engine uses (operators/text.py::LANG_TRIGRAM_PROFILES): counts via
    the replace-trick, per-language dot folded in sorted-profile order,
    one division, ROUND 6, GREATEST + first-at-max CASE, margin = max
    minus second-best via a sorted score list — clause for clause what
    lang_id_trigram builds in Spark.  The chain defines
    ``base(doc_id, text)`` (the 8-language fixture) through
    ``sc(doc_id, s_<lang>...)``; guess/max/margin are expressions over
    sc.  Shared by the text_langid and corpus_text_filter_ml oracles."""
    import math

    from .operators.text import LANG_TRIGRAM_PROFILES as P

    def esc(s: str) -> str:
        return s.replace("'", "''")

    vocab = sorted(set().union(*(p.keys() for p in P.values())))
    gcol = {g: f"g{i}" for i, g in enumerate(vocab)}
    sents = " ".join(
        f"WHEN doc_id % {_N_LANGS} = {i} THEN '{esc(s)}'"
        for i, (_, s) in enumerate(_LANGID_SENTS)
    )
    base = (
        "base AS (SELECT doc_id, CASE "
        f"WHEN doc_id % 17 = 0 THEN '{_LANGID_UNKNOWN}' "
        f"WHEN doc_id % 19 = 3 THEN '{esc(_LANGID_AMBIG)}' "
        + sents
        + " ELSE '' END AS text FROM documents)"
    )
    cexprs = ", ".join(
        f"(length(t) - length(replace(t, '{esc(g)}', ''))) / 3 "
        f"AS {gcol[g]}"
        for g in vocab
    )
    cnts = (
        "c AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM base), "
        f"n AS (SELECT doc_id, {cexprs} FROM c), "
        "m AS (SELECT *, sqrt(0.0 + "
        + " + ".join(f"{gcol[g]} * {gcol[g]}" for g in vocab)
        + ") AS nd FROM n)"
    )
    ordered = sorted(P)
    sexprs = []
    for lang in ordered:
        prof = P[lang]
        dot = "0.0 + " + " + ".join(
            f"{gcol[g]} * {float(w)!r}" for g, w in sorted(prof.items())
        )
        nl = math.sqrt(sum(w * w for w in prof.values()))
        sexprs.append(
            f"ROUND(CASE WHEN nd > 0 THEN ({dot}) / (nd * {nl!r}) "
            f"ELSE 0.0 END, 6) AS s_{lang}"
        )
    sc = "sc AS (SELECT doc_id, " + ", ".join(sexprs) + " FROM m)"
    mx = "GREATEST(" + ", ".join(f"s_{lang}" for lang in ordered) + ")"
    guess = (
        f"CASE WHEN {mx} <= 0 THEN 'unknown' "
        + " ".join(f"WHEN s_{lang} = {mx} THEN '{lang}'" for lang in ordered)
        + " ELSE 'unknown' END"
    )
    slist = "list_sort([" + ", ".join(
        f"s_{lang}" for lang in ordered
    ) + "])"
    margin = f"ROUND({mx} - {slist}[{len(ordered) - 1}], 6)"
    return f"{base}, {cnts}, {sc}", guess, mx, margin


def _langid_oracle_sql() -> str:
    cte, guess, mx, margin = _langid_parts()
    return (
        f"WITH {cte} "
        f"SELECT doc_id, {guess} AS lang_guess, {mx} AS lang_score, "
        f"{margin} AS lang_margin FROM sc"
    )


def _ctf_ml_oracle_sql() -> str:
    """corpus_text_filter_ml: the trigram lang-ID CTE chain joined to
    the shared quality fragment over the SAME fixture base, with the
    identical keep predicate (guess == declared, quality floor, token
    bounds)."""
    cte, guess, _mx, margin = _langid_parts()
    decl = (
        f"CASE WHEN sc.doc_id % 19 = 3 THEN '{_LANGID_AMBIG_LANG}' "
        + " ".join(
            f"WHEN sc.doc_id % {_N_LANGS} = {i} THEN '{lang}'"
            for i, (lang, _) in enumerate(_LANGID_SENTS)
        )
        + " END"
    )
    return (
        f"WITH {cte}, "
        + _quality_cte("doc_id", "base")
        + f" SELECT sc.doc_id, {guess} AS lang_guess, "
        "qdoc.n_tokens, qdoc.quality, "
        f"{margin} AS lang_margin, "
        f"{margin} >= 0.3 AS confident "
        "FROM sc JOIN qdoc ON qdoc.doc_id = sc.doc_id "
        f"WHERE {guess} = {decl} AND qdoc.quality >= 0.3 "
        "AND qdoc.n_tokens BETWEEN 12 AND 17"
    )


# Per-document quality score (mirrors operators/text.py::quality_score
# exactly — single-chain stopword fold, guarded divisions, ROUND 6),
# shared by the text_quality / corpus_source_stats / corpus_quota_topk
# oracles.  corpus_text_filter keeps its split en/fr form because its
# lang-guess needs the per-family sums.  NOTES.md item 13: a quality fix
# must be mirrored here and in the split form — this fragment is now the
# only other site.
_STOP_SUM = (
    "(0.0 "
    "+ (length(t) - length(replace(t, ' the ', ''))) / 5 "
    "+ (length(t) - length(replace(t, ' a ', ''))) / 3 "
    "+ (length(t) - length(replace(t, ' of ', ''))) / 4 "
    "+ (length(t) - length(replace(t, ' and ', ''))) / 5 "
    "+ (length(t) - length(replace(t, ' le ', ''))) / 4 "
    "+ (length(t) - length(replace(t, ' la ', ''))) / 4 "
    "+ (length(t) - length(replace(t, ' et ', ''))) / 4 "
    "+ (length(t) - length(replace(t, ' des ', ''))) / 5)"
)
_QUALITY_EXPR = (
    "ROUND(0.4 * (CASE WHEN n_tokens > 0 THEN "
    + _STOP_SUM
    + " / n_tokens ELSE 0.0 END) "
    "+ 0.3 * (CASE WHEN n_chars > 0 THEN "
    "(n_chars - punct - spaces) / n_chars ELSE 0.0 END) "
    "+ 0.3 * LEAST(n_tokens / 100.0, 1.0), 6)"
)


def _quality_cte(carry: str, src: str = "documents") -> str:
    """CTE pair computing ``qdoc(<carry>, n_tokens, quality)`` over
    ``src`` (any relation with a text column), carrying the named
    columns through."""
    return (
        "qraw AS (SELECT " + carry + ", "
        "  length(text) AS n_chars, "
        "  len(list_filter(regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> '')) "
        "    AS n_tokens, "
        "  length(text) - length(replace(text, ' ', '')) AS spaces, "
        "  length(text) - length(regexp_replace(text, "
        "    '[^a-zA-Z0-9 ]', '', 'g')) AS punct, "
        "  ' ' || lower(text) || ' ' AS t "
        "  FROM " + src + "), "
        "qdoc AS (SELECT " + carry + ", n_tokens, "
        + _QUALITY_EXPR
        + " AS quality FROM qraw)"
    )


def _readability_counts_sql(src: str, out: str) -> str:
    """CTE ``out``(doc_id, n_words, n_sentences, n_syllables) over
    source CTE ``src`` — ONE site for the readability count
    definitions (ws-run words, [.!?]+ sentence runs clamped >= 1,
    [aeiouy]+ vowel-group syllables), mirrored from text.readability.
    Shared by the text_readability / corpus_curation /
    corpus_quality_ensemble oracles."""
    return (
        f"{out} AS (SELECT doc_id, "
        "CAST(len(list_filter(regexp_split_to_array(text, " + _WSRE2
        + "), t -> t <> '')) AS BIGINT) AS n_words, "
        "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) "
        "AS BIGINT) AS n_sentences, "
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) "
        "AS BIGINT) AS n_syllables "
        f"FROM {src})"
    )


# the Flesch expression over a _readability_counts_sql row — the other
# half of the ONE-site rule above
_FLESCH_SQL = (
    "ROUND(CASE WHEN n_words > 0 THEN "
    "206.835 - 1.015 * (n_words / n_sentences) "
    "- 84.6 * (n_syllables / n_words) ELSE 0.0 END, 6)"
)


def _e2e_chain_sql() -> str:
    """The end-to-end decision chain as a CTE string (through s5) —
    ONE site mirroring _e2e_stages, shared by the corpus_end_to_end
    and corpus_dedup_funnel oracles."""
    return (
        f"WITH RECURSIVE {_DUPES}, "
        "uurl AS (SELECT doc_id, CASE WHEN doc_id < 1000000 "
        "  THEN doc_id % 490 ELSE doc_id END AS lid FROM corpus), "
        "ukeep AS (SELECT MIN(doc_id) AS doc_id FROM uurl GROUP BY lid), "
        "s1 AS (SELECT c.* FROM corpus c JOIN ukeep USING (doc_id)), "
        "keepx AS (SELECT MIN(doc_id) AS doc_id FROM s1 "
        "  GROUP BY md5(text)), "
        "surv AS (SELECT s1.* FROM s1 JOIN keepx USING (doc_id)), "
        + _TOKS.replace("FROM corpus", "FROM surv")
        + ", " + _SHINGLES + ", " + _MH_PAIRS + ", "
        "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
        "  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs), "
        "reach AS (SELECT DISTINCT s AS node, s AS r FROM edges "
        "  UNION "
        "  SELECT e.s AS node, reach.r FROM edges e "
        "  JOIN reach ON reach.node = e.d), "
        "comp AS (SELECT node, MIN(r) AS cluster_id FROM reach "
        "  GROUP BY node), "
        "s3 AS (SELECT surv.* FROM surv LEFT JOIN comp "
        "  ON comp.node = surv.doc_id "
        "  WHERE COALESCE(comp.cluster_id, surv.doc_id) = surv.doc_id), "
        "dsh AS (SELECT sh.doc_id, sh.shingle FROM sh "
        "  JOIN s3 USING (doc_id)), "
        "btoks AS (SELECT doc_id, "
        "  list_filter(regexp_split_to_array(text, "
        "" + _WSRE2 + "), t -> t <> '') AS tk "
        "  FROM documents WHERE doc_id % 40 = 0), "
        "bsh AS (SELECT DISTINCT "
        "  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle "
        "  FROM btoks, UNNEST(generate_series(1, "
        "    greatest(len(tk) - 2, 0))) AS g(i) WHERE len(tk) >= 3), "
        "hits AS (SELECT doc_id, COUNT(*) AS n FROM dsh "
        "  JOIN bsh USING (shingle) GROUP BY doc_id), "
        "s4 AS (SELECT s3.* FROM s3 LEFT JOIN hits USING (doc_id) "
        "  WHERE COALESCE(hits.n, 0) < 2), "
        + _quality_cte("doc_id, source", "s4")
        + ", "
        "r AS (SELECT doc_id, source, "
        "  CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "    ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk "
        "  FROM qdoc), "
        "s5 AS (SELECT doc_id, source FROM r WHERE rnk <= 12)"
    )


ORACLE_SQL: dict[str, str] = {
    "s1_scan_prune": (
        "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'"
    ),
    "p3_whitelist": (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE lang IN ('en','fr','de')"
    ),
    "p6_numeric_shape": (
        "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem "
        "WHERE regexp_matches(CAST(l_orderkey AS VARCHAR), '4$')"
    ),
    "p7_junk_drop": (
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text NOT LIKE '%spark%' AND text NOT LIKE '%stream%' "
        "GROUP BY source"
    ),
    "p8_length_pred": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE length(text) BETWEEN 120 AND 400"
    ),
    "p11_shape_filter": (
        "SELECT doc_id, n_tokens FROM ("
        "  SELECT doc_id, len(list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
        "         t -> t <> '')) AS n_tokens FROM documents) "
        "WHERE n_tokens BETWEEN 30 AND 60"
    ),
    "p12_value_filter": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows "
        "FROM lineitem WHERE l_quantity <> 50.0 "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "o3_positional_slice": (
        "SELECT user_id, event_id, rn FROM ("
        "  SELECT user_id, event_id, ROW_NUMBER() OVER ("
        "    PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) "
        "WHERE rn BETWEEN 3 AND 5"
    ),
    "o4_bounded_tail": (
        "SELECT user_id, event_id FROM ("
        "  SELECT user_id, event_id, ROW_NUMBER() OVER ("
        "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "  FROM events) WHERE rn <= 2"
    ),
    "u1_union": (
        "SELECT doc_id, 'fr_slice' AS slice FROM documents WHERE lang='fr' "
        "UNION ALL "
        "SELECT doc_id, 'src1_slice' AS slice FROM documents "
        "WHERE source='src1'"
    ),
    "u2_distinct": "SELECT DISTINCT lang, source FROM documents",
    "j1_broadcast_join": (
        "SELECT c_mktsegment, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    "j2_interval_join": (
        "WITH s AS ("
        "  SELECT user_id, event_id AS session_id, ts AS start_ts, "
        "    LEAD(ts) OVER (PARTITION BY user_id "
        "                   ORDER BY ts, event_id) AS end_ts "
        "  FROM events WHERE event_type = 'signup') "
        "SELECT s.user_id, s.session_id, COUNT(*) AS n_purchases "
        "FROM s JOIN events e ON e.user_id = s.user_id "
        "  AND e.event_type = 'purchase' AND e.ts >= s.start_ts "
        "  AND (s.end_ts IS NULL OR e.ts < s.end_ts) "
        "GROUP BY s.user_id, s.session_id"
    ),
    "j5_anti_join": (
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        " AND o_totalprice > 300000.0)"
    ),
    "w1_ffill": (
        "SELECT event_id, last_value("
        "  CASE WHEN event_type NOT IN ('click','view') THEN value END "
        "  IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "  AS filled_value "
        "FROM events"
    ),
    "w3_block_fusion": (
        "WITH b AS ("
        "  SELECT user_id, event_id, ts, props, "
        "    event_type <> 'view' AS c, "
        "    SUM(CASE WHEN event_type <> 'view' THEN 1 ELSE 0 END) OVER ("
        "      PARTITION BY user_id ORDER BY ts DESC, event_id DESC "
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS blk "
        "  FROM events) "
        "SELECT user_id, "
        "  MAX(CASE WHEN c THEN event_id END) AS anchor_event_id, "
        "  STRING_AGG(props, ' ' ORDER BY ts, event_id) AS fused_props, "
        "  COUNT(*) AS n_rows "
        "FROM b GROUP BY user_id, blk HAVING BOOL_OR(c)"
    ),
    "w4_lead": (
        "SELECT user_id, event_id, LEAD(event_id) OVER ("
        "  PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id "
        "FROM events WHERE event_type = 'error'"
    ),
    "w6_first_seed": (
        "SELECT event_id, FIRST_VALUE(value) OVER ("
        "  PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seed_value "
        "FROM events WHERE event_type = 'purchase'"
    ),
    "p9_first_occurrence_drop": (
        "WITH r AS ("
        "  SELECT event_type, ROW_NUMBER() OVER ("
        "    PARTITION BY user_id, event_type "
        "    ORDER BY ts, event_id) AS rn FROM events) "
        "SELECT event_type, COUNT(*) AS n_kept FROM r "
        "WHERE NOT (event_type IN ('error','signup') AND rn = 1) "
        "GROUP BY event_type"
    ),
    "a1_mode": (
        "WITH c AS ("
        "  SELECT user_id, event_type, COUNT(*) AS n FROM events "
        "  GROUP BY user_id, event_type) "
        "SELECT user_id, event_type AS mode_type, n FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "    ORDER BY n DESC, event_type ASC) AS rn FROM c) WHERE rn = 1"
    ),
    "a2_group_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS sum_price, "
        "COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "a5_keep_last": (
        "SELECT user_id, event_type, event_id AS last_event_id FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
        "    ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "WHERE rn = 1"
    ),
    "f_numeric_chain": (
        "SELECT l_orderkey, l_linenumber, "
        "CASE WHEN l_linenumber = 1 THEN 0.0 ELSE "
        "  -CAST(CAST(l_orderkey AS VARCHAR) || '.' || "
        "        lpad(CAST(l_linenumber AS VARCHAR), 2, '0') AS DOUBLE) "
        "END AS fr_value "
        "FROM lineitem WHERE l_orderkey % 7 = 0"
    ),
    "f_name_clean": (
        "SELECT p_partkey, trim(regexp_replace(regexp_replace("
        "  p_name || ' LU' || lpad(CAST(p_partkey % 1000000 AS VARCHAR), "
        "                          10, '0'), "
        "  '[A-Z]{2}[A-Z0-9]{9}[0-9]|PROPRE', '', 'g'), "
        "  '\\s+', ' ', 'g')) AS cleaned "
        "FROM part"
    ),
    "d1_dispatch": (
        "SELECT lang, CASE WHEN text LIKE '%window%' THEN 'windowed' "
        "  WHEN text LIKE '%join%' THEN 'join-heavy' ELSE 'plain' END "
        "  AS doc_class, COUNT(*) AS n_docs "
        "FROM documents GROUP BY 1, 2"
    ),
    "s4_page_explode": (
        "WITH d AS (SELECT CAST(s_suppkey AS VARCHAR) AS url, "
        "  'TITLE ' || s_name || chr(10) || 'row-' || "
        "  CAST(s_suppkey % 97 AS VARCHAR) || chr(10) || chr(10) || "
        "  'last' || chr(12) || 'PAGE2 ' || s_name AS text FROM supplier), "
        "p AS (SELECT url, CAST(g.i - 1 AS INTEGER) AS page_no, "
        "  pages[g.i] AS page FROM "
        "  (SELECT url, string_split(text, chr(12)) AS pages FROM d), "
        "  UNNEST(generate_series(1, len(pages))) AS g(i)) "
        "SELECT url, page_no, CAST(g2.i - 1 AS INTEGER) AS row_idx, "
        "lines[g2.i] AS line FROM "
        "(SELECT url, page_no, string_split(page, chr(10)) AS lines FROM p), "
        "UNNEST(generate_series(1, len(lines))) AS g2(i)"
    ),
    "s5_grid_slice": (
        "WITH l AS (SELECT p_partkey AS line_id, "
        "  rpad(p_name, 40, ' ') || rpad(p_brand, 8, ' ') || "
        "  rpad(CAST(p_size AS VARCHAR), 18, ' ') || p_type AS line "
        "FROM part) "
        "SELECT line_id, trim(substr(line, 1, 40)) AS c0, "
        "trim(substr(line, 41, 8)) AS c1, trim(substr(line, 49, 18)) AS c2, "
        "trim(substr(line, 67)) AS c3, 4 AS shape FROM l"
    ),
    "s7_gap_split": (
        "WITH l AS (SELECT p_partkey AS line_id, "
        "  CASE WHEN p_partkey % 3 = 0 "
        "    THEN CAST(p_partkey % 89 AS VARCHAR) || '  ' ELSE '' END "
        "  || p_brand || '  ' || p_name || '  ' || "
        "  CAST(p_size AS VARCHAR) || '  ' || p_type AS line FROM part), "
        "t AS (SELECT line_id, "
        "  regexp_split_to_array(trim(line), ' {2,}') AS tk FROM l), "
        "s AS (SELECT line_id, len(tk) AS shape, "
        "  CASE WHEN len(tk) = 5 THEN 1 ELSE 0 END AS o, tk FROM t) "
        "SELECT line_id, tk[1+o] AS c0, tk[2+o] AS c1, tk[3+o] AS c2, "
        "tk[4+o] AS c3, CAST(shape AS INTEGER) AS shape FROM s"
    ),
    "u3_two_up_split": (
        "WITH l AS (SELECT p_partkey AS line_id, "
        "  rpad(p_brand || '  ' || CAST(p_size AS VARCHAR), 40, ' ') || "
        "  p_type || '  ' || CAST(p_partkey % 97 AS VARCHAR) AS line "
        "FROM part) "
        "SELECT line_id, 'L' AS half, trim(substr(line, 1, 40)) AS cell "
        "FROM l UNION ALL "
        "SELECT line_id, 'R' AS half, trim(substr(line, 41)) AS cell FROM l"
    ),
    "p1_realign": (
        "WITH t AS (SELECT p_partkey, string_split("
        "  p_brand || '|' || p_type || '|' || p_name || '|filler', '|') "
        "  AS cols FROM part) "
        "SELECT p_partkey, cols[1] AS brand, cols[2] AS ptype, "
        "cols[3] AS pname FROM t"
    ),
    "p2_projection": (
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, "
        "l_extendedprice, l_returnflag, l_linestatus, l_shipdate "
        "FROM lineitem WHERE l_orderkey % 500 = 0"
    ),
    "p4_keep_anchor": (
        "SELECT doc_id, source, n_chars FROM documents "
        "WHERE n_chars < 200 OR source IN ('src1','src2')"
    ),
    "p5_null_blank": (
        "SELECT event_id, kept_props FROM ("
        "  SELECT event_id, CASE WHEN event_id % 5 = 0 THEN NULL "
        "    WHEN event_id % 5 = 1 THEN '   ' ELSE props END AS kept_props "
        "  FROM events) "
        "WHERE kept_props IS NOT NULL AND length(trim(kept_props)) > 0"
    ),
    "p10_sentinel": (
        "SELECT c_custkey, pdf_url FROM ("
        "  SELECT c_custkey, CASE WHEN c_custkey % 97 = 0 THEN 'nan' "
        "    WHEN c_custkey % 97 = 1 THEN 'annual_report_does_not_exists' "
        "    ELSE 'https://h/' || CAST(c_custkey AS VARCHAR) END AS pdf_url "
        "  FROM customer) "
        "WHERE pdf_url NOT IN "
        "('nan', 'annual_report_does_not_exists', '')"
    ),
    "w2_name_ffill": (
        "SELECT event_id, last_value("
        "  CASE WHEN event_type = 'signup' THEN props END IGNORE NULLS) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "  AS filled_name "
        "FROM events"
    ),
    "w5_toc_repair": (
        "WITH l AS ("
        "  SELECT user_id AS url, "
        "    CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
        "      ORDER BY ts, event_id) AS BIGINT) AS entry_idx, "
        "    'SEC ' || event_type || CASE WHEN event_id % 3 = 0 THEN '' "
        "      ELSE ' ' || CAST(event_id % 97 AS VARCHAR) END AS line "
        "  FROM events), "
        "f AS ("
        "  SELECT url, entry_idx, line, "
        "    regexp_matches(line, '(^|\\s)([0-9]+)\\s*$') AS has_pg, "
        "    ROW_NUMBER() OVER (PARTITION BY url ORDER BY entry_idx) AS rn, "
        "    LEAD(line) OVER (PARTITION BY url ORDER BY entry_idx) "
        "      AS next_line "
        "  FROM l), "
        "g AS ("
        "  SELECT *, MAX(CASE WHEN has_pg THEN rn END) OVER ("
        "    PARTITION BY url ORDER BY entry_idx "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_pg_rn "
        "  FROM f) "
        "SELECT url, entry_idx, "
        "  CASE WHEN NOT has_pg AND next_line IS NOT NULL "
        "    THEN line || ' ' || regexp_extract(next_line, '(\\S+)\\s*$', 1) "
        "    ELSE line END AS line "
        "FROM g "
        "WHERE ((rn - 1 - COALESCE(last_pg_rn, 0)) % 2) <> 1"
    ),
    "o2_page_sort": (
        "SELECT user_id, array_to_string(list_sort(list("
        "CAST(event_id AS VARCHAR))), ',') AS sorted_ids "
        "FROM events GROUP BY user_id"
    ),
    "a3_threshold_retry": (
        "WITH g AS ("
        "  SELECT l_orderkey, "
        "    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s, "
        "    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS alt "
        "  FROM lineitem WHERE l_orderkey % 23 = 0 GROUP BY l_orderkey) "
        "SELECT l_orderkey, "
        "CAST(CASE WHEN s < 50 THEN alt ELSE s END AS DOUBLE) AS picked, "
        "s < 50 AS retried FROM g"
    ),
    "a4_counts": (
        "SELECT source, COUNT(*) AS n_rows, "
        "COUNT(DISTINCT lang) AS n_langs FROM documents GROUP BY source"
    ),
    "f2_en_normalize": (
        "WITH t AS (SELECT l_orderkey, l_linenumber, "
        "  CAST(CAST((l_orderkey % 900) + 1 AS VARCHAR) || "
        "    lpad(CAST(l_partkey % 1000 AS VARCHAR), 3, '0') || '.' || "
        "    lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') AS DOUBLE) AS v "
        "  FROM lineitem WHERE l_orderkey % 11 = 0) "
        "SELECT l_orderkey, l_linenumber, "
        "CASE WHEN l_linenumber = 2 THEN -v ELSE v END AS en_value FROM t"
    ),
    "f3_format_infer": (
        "SELECT l_orderkey, l_linenumber, "
        "CASE WHEN l_partkey % 3 = 0 THEN "
        "  CAST(CAST((l_orderkey % 90) + 1 AS VARCHAR) || "
        "    lpad(CAST(l_partkey % 1000 AS VARCHAR), 3, '0') || '.' || "
        "    lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') AS DOUBLE) "
        "WHEN l_partkey % 3 = 1 THEN "
        "  CAST(CAST((l_orderkey % 900) + 1 AS VARCHAR) || '.' || "
        "    lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') AS DOUBLE) "
        "ELSE "
        "  CAST(CAST((l_orderkey % 900) + 1 AS VARCHAR) || '.' || "
        "    lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') AS DOUBLE) "
        "END AS auto_value "
        "FROM lineitem WHERE l_orderkey % 13 = 0"
    ),
    "f_token_strip": (
        "WITH t AS (SELECT p_partkey, "
        "  CAST(p_partkey % 9999 AS VARCHAR) || ' ' || p_brand || ' ' || "
        "  p_type || CAST(p_size % 100 AS VARCHAR) AS name FROM part) "
        "SELECT p_partkey, "
        "regexp_replace(name, '^\\S+ +', '') AS no_lead, "
        "regexp_replace(name, '[0-9]+$', '') AS no_tail, "
        "regexp_replace(name, '[0-9]+', '', 'g') AS no_digits FROM t"
    ),
    "f8_purge_numeric": (
        "SELECT p_partkey, regexp_replace("
        "p_brand || '#' || CAST(p_size AS VARCHAR) || 'kg -' || "
        "CAST(p_partkey % 1000 AS VARCHAR), "
        "'[^-.0-9]', '', 'g') AS digits_only FROM part"
    ),
    "f10_charset_purge": (
        "SELECT p_partkey, regexp_replace("
        "p_name || ' ¬ß ' || p_brand || ' 12% (ok)/', "
        "'[^0-9a-zA-Z/ %)(]', '', 'g') AS clean FROM part"
    ),
    "f11_multi_pct": (
        "WITH t AS (SELECT p_partkey, "
        "  CASE WHEN p_partkey % 2 = 0 THEN "
        "    p_brand || ' % ' || CAST(p_size AS VARCHAR) || ' ' || p_type "
        "      || ' % 99 tail' "
        "  ELSE p_brand || ' % ' || CAST(p_size AS VARCHAR) END AS nm "
        "  FROM part) "
        "SELECT p_partkey, "
        "CASE WHEN (length(nm) - length(replace(nm, '%', ''))) > 1 "
        "  AND regexp_extract(nm, '^(.*?%\\s*[0-9.,]+)', 1) <> '' "
        "  THEN regexp_extract(nm, '^(.*?%\\s*[0-9.,]+)', 1) "
        "  ELSE nm END AS name_cut, "
        "CASE WHEN (length(nm) - length(replace(nm, '%', ''))) > 1 "
        "  AND regexp_extract(nm, '^(.*?% {0,3}[0-9/]+)', 1) <> '' "
        "  THEN regexp_extract(nm, '^(.*?% {0,3}[0-9/]+)', 1) "
        "  ELSE nm END AS aviva_cut FROM t"
    ),
    "f12_currency_rescue": (
        "WITH t AS (SELECT p_partkey, "
        "  replace(p_brand, '#', '') AS w1, p_type AS w2, "
        "  ['EUR','USD','GBP','CHF'][CAST(p_partkey % 4 AS INTEGER) + 1] "
        "    AS cur FROM part) "
        "SELECT p_partkey, cur AS cur_tok, "
        # the Spark removal replaces ' CUR' (lookahead keeps the trailing
        # space) with ' ' -> a double space remains until F18 collapses it
        "w1 || '  ' || w2 AS name_clean FROM t"
    ),
    "f16_rewrite_const": (
        "SELECT p_partkey, "
        "trim(regexp_replace('EDR FUND ' || p_brand || ' EQUITY', "
        "  '^EDR FUND\\s+', '')) AS report_name, "
        "'PROVIDER_X' AS fund_provider, CAST(NULL AS VARCHAR) AS isin "
        "FROM part"
    ),
    "f17_regex_extract": (
        "SELECT doc_id, regexp_extract(text, 'the ([a-z]+)', 1) "
        "AS after_the FROM documents"
    ),
    "d2_page0_dispatch": (
        "SELECT doc_id, CASE WHEN substr(text, 1, 80) LIKE '%spark%' "
        "  THEN 'spark_doc' "
        "WHEN substr(text, 1, 80) LIKE '%data%' THEN 'data_doc' "
        "ELSE 'other' END AS doc_class FROM documents"
    ),
    "d3_header_variant": (
        "WITH l AS (SELECT s_suppkey, "
        "  CASE WHEN s_suppkey % 2 = 0 "
        "    THEN rpad('T1 ' || s_name, 40, ' ') || "
        "      CAST(s_nationkey AS VARCHAR) "
        "    ELSE rpad('T2 ' || s_name, 50, ' ') || "
        "      CAST(s_nationkey AS VARCHAR) END AS line FROM supplier), "
        "v AS (SELECT s_suppkey, line, "
        "  CASE WHEN line LIKE 'T1%' THEN 0 ELSE 1 END AS variant FROM l) "
        "SELECT s_suppkey, variant, "
        "trim(CASE WHEN variant = 0 THEN substr(line, 1, 40) "
        "  ELSE substr(line, 1, 50) END) AS c0, "
        "trim(CASE WHEN variant = 0 THEN substr(line, 41) "
        "  ELSE substr(line, 51) END) AS c1 FROM v"
    ),
    "d4_shape_dispatch": (
        "WITH l AS (SELECT l_orderkey, l_linenumber, "
        "  CASE WHEN l_linenumber % 2 = 0 "
        "    THEN CAST(l_orderkey % 89 AS VARCHAR) || '  ' ELSE '' END "
        "  || l_returnflag || '  ' || l_linestatus || '  ' || "
        "  CAST(l_partkey % 100 AS VARCHAR) || '  ' || "
        "  CAST(l_suppkey % 100 AS VARCHAR) AS line "
        "  FROM lineitem WHERE l_orderkey % 17 = 0), "
        "t AS (SELECT l_orderkey, l_linenumber, "
        "  string_split(line, '  ') AS tk FROM l), "
        "s AS (SELECT *, CAST(len(tk) AS INTEGER) AS shape, "
        "  CASE WHEN len(tk) = 5 THEN 1 ELSE 0 END AS o FROM t) "
        "SELECT l_orderkey, l_linenumber, shape, tk[1+o] AS c0, "
        "tk[2+o] AS c1, tk[3+o] AS c2, tk[4+o] AS c3 FROM s"
    ),
    "d5_fallback_chain": (
        "SELECT doc_id, "
        "CASE WHEN regexp_extract(text, 'spark ([a-z]+)', 1) <> '' "
        "  THEN regexp_extract(text, 'spark ([a-z]+)', 1) "
        "WHEN regexp_extract(text, 'the ([a-z]+)', 1) <> '' "
        "  THEN regexp_extract(text, 'the ([a-z]+)', 1) "
        "ELSE 'none' END AS picked FROM documents"
    ),
    "d5_rename_retry": (
        "WITH h AS (SELECT c_custkey AS hid, "
        "  'u' || CAST(c_custkey % 40 AS VARCHAR) AS url, "
        "  CASE WHEN c_custkey % 2 = 0 THEN 'toc_rename_fr' "
        "    ELSE 'toc_grid_fr' END AS doc_class, "
        "  'europe fund ' || CAST(c_custkey % 40 AS VARCHAR) AS report "
        "  FROM customer WHERE c_custkey < 240), "
        "m AS (SELECT "
        "  'Euro Fund ' || CAST(c_custkey AS VARCHAR) || ' - Cap' AS name, "
        "  'u' || CAST(c_custkey AS VARCHAR) AS pdf_url, "
        "  'IS' || CAST(c_custkey AS VARCHAR) AS isin "
        "  FROM customer WHERE c_custkey < 40) "
        "SELECT h.hid, h.url, h.doc_class, "
        "  m.name AS fund_name_website, m.isin "
        "FROM h LEFT JOIN m ON m.pdf_url = h.url AND ("
        "  strpos(lower(m.name), h.report) > 0 "
        "  OR (h.doc_class = 'toc_rename_fr' AND strpos("
        "    replace(lower(m.name), 'euro ', 'europe '), h.report) > 0))"
    ),
    "dedup_exact": (
        f"WITH {_DUPES} "
        "SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, "
        "COUNT(*) AS n_copies FROM corpus GROUP BY md5(text)"
    ),
    "dedup_soft_weights": (
        f"WITH {_DUPES}, "
        "corpus3 AS (SELECT doc_id, text FROM corpus "
        "  UNION ALL SELECT doc_id + 2000000 AS doc_id, text "
        "  FROM corpus WHERE doc_id % 100 = 0 AND doc_id < 1000000), "
        "keyed AS (SELECT doc_id, md5(text) AS digest FROM corpus3), "
        "cnt AS (SELECT digest, COUNT(*) AS n_copies FROM keyed "
        "  GROUP BY digest) "
        "SELECT k.doc_id, k.digest, c.n_copies, "
        "ROUND(LEAST(1.0, 2.0 / CAST(c.n_copies AS DOUBLE)), 6) "
        "AS weight "
        "FROM keyed k JOIN cnt c ON c.digest = k.digest"
    ),
    "dedup_ngram_jaccard": (
        f"WITH {_DUPES}, {_TOKS}, {_SHINGLES}, "
        # max_df=4 hot-shingle cap, identical to the engine's filter
        "dfc AS (SELECT lang, source, shingle FROM sh "
        "  GROUP BY lang, source, shingle HAVING COUNT(*) <= 4), "
        "shf AS (SELECT sh.doc_id, sh.lang, sh.source, sh.shingle "
        "  FROM sh JOIN dfc USING (lang, source, shingle)), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY doc_id), "
        "inter AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i "
        "  FROM shf a JOIN shf b ON a.lang = b.lang AND a.source = b.source "
        "    AND a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "  GROUP BY a.doc_id, b.doc_id) "
        "SELECT id_a, id_b, "
        "  ROUND(i / (sa.sz + sb.sz - i), 6) AS jaccard "
        "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
        "JOIN sizes sb ON sb.doc_id = id_b "
        "WHERE ROUND(i / (sa.sz + sb.sz - i), 6) >= 0.5"
    ),
    "dedup_minhash_lsh": (
        f"WITH {_DUPES}, {_TOKS}, {_SHINGLES}, {_MH_PAIRS} "
        "SELECT id_a, id_b FROM pairs"
    ),
    # dedup_incremental: both sides' signatures computed over ONE union
    # tagged by side, then new-side bands join ref-side bands (ref
    # band frequency capped at 8 BEFORE the join, mirroring the
    # engine's window count) — same minhash/band format as _MH_PAIRS;
    # chain shared with the corpus_ingest oracle via _inc_lsh_chain.
    "dedup_incremental": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text FROM documents), "
        "newc AS ("
        "  SELECT doc_id + 2000000 AS doc_id, text FROM wsbase "
        "  WHERE doc_id % 25 = 0 "
        "  UNION ALL "
        "  SELECT doc_id + 3000000 AS doc_id, "
        "    'fresh unseen document number ' || CAST(doc_id AS VARCHAR) "
        "    || ' standalone content block' AS text "
        "  FROM wsbase WHERE doc_id % 9 = 4), "
        + _INC_LSH_CHAIN
        + " SELECT doc_id, dup_of, n_ref_matches FROM flags"
    ),
    # dedup_bloom: same injected paragraph fixture; the filter's set
    # positions are rebuilt from the even half (salted md5 hex -> BIGINT
    # mod 4096 — the engine's exact hash family), probes check all 3
    # positions per trimmed non-blank paragraph.  FPs reproduce exactly.
    "dedup_bloom": (
        "WITH inj AS (SELECT doc_id, "
        "  (CASE WHEN doc_id % 3 = 1 THEN '  SHARED BLOOM FOOTER ' "
        "    ELSE 'SHARED BLOOM FOOTER' END) "
        "  || chr(10) || chr(10) || 'upara ' || "
        "  CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 3 = 0 "
        "    THEN doc_id - 1 ELSE doc_id END AS VARCHAR) "
        "  || chr(10) || chr(10) || 'g' || CAST(doc_id % 7 AS VARCHAR) "
        "  || chr(10) || chr(10) || chr(10) || chr(10) || "
        "  (CASE WHEN doc_id % 2 = 0 THEN 'r' ELSE 'q' END) || "
        "  CAST(doc_id % 5 AS VARCHAR) AS text FROM documents), "
        "refp AS (SELECT DISTINCT trim(p) AS t FROM inj, "
        "  UNNEST(string_split(text, chr(10) || chr(10))) AS u(p) "
        "  WHERE doc_id % 2 = 0 AND trim(p) <> ''), "
        "pos AS (SELECT DISTINCT "
        "  CAST(('0x' || substr(md5('bf' || CAST(i AS VARCHAR) || ':' "
        "    || t), 1, 8)) AS BIGINT) % 4096 AS p "
        "  FROM refp, UNNEST([1, 2, 3]) AS h(i)), "
        "bits AS (SELECT list(p) AS bl FROM pos), "
        "pd AS (SELECT doc_id, "
        "  list_filter(list_transform(string_split(text, "
        "    chr(10) || chr(10)), x -> trim(x)), x -> x <> '') AS ps "
        "  FROM inj WHERE doc_id % 2 = 1), "
        "fl AS (SELECT doc_id, len(ps) AS np, "
        "  len(list_filter(ps, t -> "
        "    list_contains(bl, CAST(('0x' || substr(md5('bf1:' || t), "
        "      1, 8)) AS BIGINT) % 4096) AND "
        "    list_contains(bl, CAST(('0x' || substr(md5('bf2:' || t), "
        "      1, 8)) AS BIGINT) % 4096) AND "
        "    list_contains(bl, CAST(('0x' || substr(md5('bf3:' || t), "
        "      1, 8)) AS BIGINT) % 4096))) AS nf "
        "  FROM pd, bits) "
        "SELECT doc_id, CAST(np AS BIGINT) AS n_paras, "
        "  CAST(nf AS BIGINT) AS n_flagged, "
        "  CASE WHEN np > 0 THEN ROUND(nf / CAST(np AS DOUBLE), 6) "
        "    ELSE 0.0 END AS flag_frac, "
        "  (np > 0 AND CASE WHEN np > 0 THEN "
        "    ROUND(nf / CAST(np AS DOUBLE), 6) ELSE 0.0 END >= 0.6) "
        '  AS "drop" FROM fl'
    ),
    # dedup_keep_best: same shifted-copy corpus + explicit pair graph;
    # components via the recursive CTE, score via the shared classifier
    # chain, winner = row_number over (ROUNDED score DESC, doc_id) —
    # the engine's min(struct(-score, id)) argmax restated.
    "dedup_keep_best": (
        "WITH RECURSIVE wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text FROM documents), "
        "corpus AS (SELECT doc_id, text FROM wsbase "
        "  UNION ALL SELECT doc_id + 1000000, "
        "    text || ' absolutely wonderful' FROM wsbase "
        "    WHERE doc_id % 25 = 0 "
        "  UNION ALL SELECT doc_id + 2000000, "
        "    text || ' terrible awful spam' FROM wsbase "
        "    WHERE doc_id % 50 = 0), "
        "prs AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b "
        "    FROM wsbase WHERE doc_id % 25 = 0 "
        "  UNION ALL SELECT doc_id, doc_id + 2000000 FROM wsbase "
        "    WHERE doc_id % 50 = 0), "
        "edges AS (SELECT id_a AS s, id_b AS d FROM prs "
        "  UNION ALL SELECT id_b, id_a FROM prs), "
        "reach AS (SELECT DISTINCT s AS node, s AS r FROM edges "
        "  UNION SELECT e.s AS node, reach.r FROM edges e "
        "  JOIN reach ON reach.node = e.d), "
        "comp AS (SELECT node, MIN(r) AS cluster_id FROM reach "
        "  GROUP BY node), "
        + _classifier_ctes("corpus")
        + ", cl AS (SELECT c.doc_id, "
        "  COALESCE(comp.cluster_id, c.doc_id) AS cluster_id, "
        "  ROUND(sc.s, 6) AS score FROM corpus c "
        "  LEFT JOIN comp ON comp.node = c.doc_id "
        "  JOIN sc ON sc.doc_id = c.doc_id), "
        "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id "
        "  ORDER BY score DESC, doc_id) AS rn FROM cl) "
        "SELECT doc_id, cluster_id, score, rn = 1 AS keep FROM rk"
    ),
    "dedup_simhash": (
        "WITH t AS ("
        "  SELECT doc_id, md5(tok) AS h FROM ("
        "    SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
        "      x -> x <> '')) AS tok FROM (SELECT doc_id, "
        "  text || " + _WS_NOISE_SQL + " AS text FROM documents))), "
        "v AS (SELECT doc_id, "
        + ", ".join(
            f"SUM(CASE WHEN substr(h, {i + 1}, 1) >= '8' "
            f"THEN 1 ELSE -1 END) AS b{i}"
            for i in range(16)
        )
        + " FROM t GROUP BY doc_id) "
        "SELECT doc_id, "
        + " || ".join(
            f"(CASE WHEN b{i} > 0 THEN '1' ELSE '0' END)" for i in range(16)
        )
        + " AS simhash FROM v"
    ),
    "corpus_text_filter": (
        "WITH c AS (SELECT doc_id, lang, "
        "  length(text) AS n_chars, "
        "  len(list_filter(regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> '')) "
        "    AS n_tokens, "
        "  length(text) - length(replace(text, ' ', '')) AS spaces, "
        "  length(text) - length(regexp_replace(text, "
        "    '[^a-zA-Z0-9 ]', '', 'g')) AS punct, "
        "  ' ' || lower(text) || ' ' AS t FROM documents), "
        "s AS (SELECT doc_id, lang, n_tokens, "
        "  0.0 + (length(t) - length(replace(t, ' the ', ''))) / 5 "
        "    + (length(t) - length(replace(t, ' a ', ''))) / 3 "
        "    + (length(t) - length(replace(t, ' of ', ''))) / 4 "
        "    + (length(t) - length(replace(t, ' and ', ''))) / 5 AS en_hits, "
        "  0.0 + (length(t) - length(replace(t, ' le ', ''))) / 4 "
        "    + (length(t) - length(replace(t, ' la ', ''))) / 4 "
        "    + (length(t) - length(replace(t, ' et ', ''))) / 4 "
        "    + (length(t) - length(replace(t, ' des ', ''))) / 5 AS fr_hits, "
        "  n_chars, spaces, punct FROM c), "
        "q AS (SELECT doc_id, lang, n_tokens, en_hits, fr_hits, "
        "  ROUND(0.4 * (CASE WHEN n_tokens > 0 THEN "
        "    (en_hits + fr_hits) / n_tokens ELSE 0.0 END) "
        "    + 0.3 * (CASE WHEN n_chars > 0 THEN "
        "    (n_chars - punct - spaces) / n_chars ELSE 0.0 END) "
        "    + 0.3 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality FROM s) "
        "SELECT doc_id, n_tokens, quality FROM q "
        "WHERE CASE WHEN en_hits = 0 AND fr_hits = 0 THEN 'unknown' "
        "  WHEN en_hits >= fr_hits THEN 'en' ELSE 'fr' END = lang "
        "  AND quality >= 0.42 AND n_tokens BETWEEN 20 AND 90"
    ),
    "dedup_url_canonical": (
        "SELECT 'https://shop-' || CAST(c_custkey % 300 AS VARCHAR) || "
        "'.com/r/' || CAST(c_custkey % 300 AS VARCHAR) || "
        "'?x=' || CAST(c_custkey % 300 AS VARCHAR) AS canonical_url, "
        "MIN(c_custkey) AS keep_id, COUNT(*) AS n_variants "
        "FROM customer GROUP BY c_custkey % 300"
    ),
    "dedup_corpus_keep": (
        f"WITH {_DUPES}, "
        "keepx AS (SELECT MIN(doc_id) AS doc_id FROM corpus "
        "  GROUP BY md5(text)), "
        "surv AS (SELECT c.* FROM corpus c JOIN keepx USING (doc_id)), "
        + _TOKS.replace("FROM corpus", "FROM surv")
        + ", "
        + _SHINGLES
        + ", "
        "dfc AS (SELECT lang, source, shingle FROM sh "
        "  GROUP BY lang, source, shingle HAVING COUNT(*) <= 4), "
        "shf AS (SELECT sh.doc_id, sh.lang, sh.source, sh.shingle "
        "  FROM sh JOIN dfc USING (lang, source, shingle)), "
        "sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY doc_id), "
        "inter AS ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i "
        "  FROM shf a JOIN shf b ON a.lang = b.lang AND a.source = b.source "
        "    AND a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "  GROUP BY a.doc_id, b.doc_id), "
        "dropd AS (SELECT DISTINCT id_b FROM inter "
        "  JOIN sizes sa ON sa.doc_id = id_a "
        "  JOIN sizes sb ON sb.doc_id = id_b "
        "  WHERE ROUND(i / (sa.sz + sb.sz - i), 6) >= 0.5) "
        "SELECT doc_id FROM surv "
        "WHERE doc_id NOT IN (SELECT id_b FROM dropd)"
    ),
    # dedup_cluster_cc: same minhash-LSH candidate pairs as
    # dedup_minhash_lsh, then connected components via a RECURSIVE CTE
    # (set-semantics fixpoint) — an independent implementation of the
    # engine's iterative min-label propagation.  cluster_id = MIN id
    # reachable through the symmetric edge closure; singletons fall back
    # to their own id in the final left join.
    "dedup_cluster_cc": (
        f"WITH RECURSIVE {_DUPES}, {_TOKS}, {_SHINGLES}, {_MH_PAIRS}, "
        "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
        "  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs), "
        "reach AS (SELECT DISTINCT s AS node, s AS r FROM edges "
        "  UNION "
        "  SELECT e.s AS node, reach.r FROM edges e "
        "  JOIN reach ON reach.node = e.d), "
        "comp AS (SELECT node, MIN(r) AS cluster_id FROM reach "
        "  GROUP BY node) "
        "SELECT c.doc_id, "
        "COALESCE(comp.cluster_id, c.doc_id) AS cluster_id, "
        "COALESCE(comp.cluster_id, c.doc_id) = c.doc_id AS keep "
        "FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id"
    ),
    # corpus_vocab_topk: same ws-noise corpus; token counts via the
    # shared split class; identical deterministic order + limit.
    "corpus_vocab_topk": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text FROM documents), "
        "tk AS (SELECT doc_id, UNNEST(list_filter("
        "regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> '')) "
        "AS token FROM wsbase) "
        "SELECT token, COUNT(*) AS n_occurrences, "
        "COUNT(DISTINCT doc_id) AS n_docs FROM tk GROUP BY token "
        "ORDER BY n_occurrences DESC, token LIMIT 50"
    ),
    # text_tfidf_topk: same ws-noise corpus + lowered token split; the
    # same two aggregations, the same smoothed-idf formula with the
    # identical (N+1.0)/(df+1.0) operand order, ROW_NUMBER over the
    # ROUNDED score with the token tie-break, rank <= 5.
    "text_tfidf_topk": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text FROM documents), "
        "tk AS (SELECT doc_id, unnest(list_transform(list_filter("
        "regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        "w -> lower(w))) AS token FROM wsbase), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk "
        "  GROUP BY doc_id, token), "
        "dfq AS (SELECT token, COUNT(*) AS df_docs FROM tf "
        "  GROUP BY token), "
        "nd AS (SELECT COUNT(*) AS n FROM wsbase), "
        "sc AS (SELECT f.doc_id, f.token, f.tf, d.df_docs, "
        "  ROUND(f.tf * (LN((nd.n + 1.0) / (d.df_docs + 1.0)) + 1.0), 6)"
        "  AS score FROM tf f JOIN dfq d ON f.token = d.token "
        "  CROSS JOIN nd), "
        "rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id "
        "  ORDER BY score DESC, token) AS BIGINT) AS \"rank\" FROM sc) "
        "SELECT doc_id, token, tf, df_docs, score, \"rank\" FROM rk "
        "WHERE \"rank\" <= 5"
    ),
    # text_lexical_diversity: same ws-noise + case-fold/hapax probe;
    # relational (doc, word) counts restate the engine's narrow sorted-
    # array reductions (n_tokens = sum, n_types = count, hapax = c=1,
    # top = max) — integers + identical ROUND-6 divisions.
    "text_lexical_diversity": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} || ' Rpt rpt RPT uniq' || "
        "CAST(doc_id AS VARCHAR) AS text FROM documents), "
        "tk AS (SELECT doc_id, unnest(list_transform(list_filter("
        "regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        "w -> lower(w))) AS w FROM wsbase), "
        "ct AS (SELECT doc_id, w, COUNT(*) AS c FROM tk "
        "  GROUP BY doc_id, w), "
        "ag AS (SELECT doc_id, SUM(c) AS nt, COUNT(*) AS ty, "
        "  SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hx, "
        "  MAX(c) AS tp FROM ct GROUP BY doc_id) "
        "SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, "
        "  CAST(ty AS BIGINT) AS n_types, "
        "  ROUND(ty / CAST(nt AS DOUBLE), 6) AS ttr, "
        "  ROUND(hx / CAST(ty AS DOUBLE), 6) AS hapax_frac, "
        "  ROUND(tp / CAST(nt AS DOUBLE), 6) AS top_frac FROM ag"
    ),
    # corpus_url_templates: same doc_id-derived url fixture; host
    # regenerated lowered/www-stripped from the same CASE, template =
    # global digit-run replacement, (host, template) counts with the
    # min_urls HAVING.
    "corpus_url_templates": (
        "WITH u AS (SELECT doc_id, 'https://' || "
        "  (CASE doc_id % 3 WHEN 0 THEN 'www.Shop.example.com' "
        "    WHEN 1 THEN 'blog.example.org' "
        "    ELSE 'shard' || CAST(doc_id % 4 AS VARCHAR) || '.cdn.net' "
        "  END) || "
        "  (CASE doc_id % 4 "
        "    WHEN 0 THEN '/item/' || CAST(doc_id AS VARCHAR) || '/view' "
        "    WHEN 1 THEN '/a/2024/' || CAST(doc_id % 12 AS VARCHAR) "
        "      || '?page=' || CAST(doc_id % 7 AS VARCHAR) "
        "    WHEN 2 THEN '/about' "
        "    ELSE '/u/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) "
        "  END) AS url, "
        "  (CASE doc_id % 3 WHEN 0 THEN 'shop.example.com' "
        "    WHEN 1 THEN 'blog.example.org' "
        "    ELSE 'shard' || CAST(doc_id % 4 AS VARCHAR) || '.cdn.net' "
        "  END) AS host FROM documents), "
        "t AS (SELECT host, "
        "  regexp_replace(url, '[0-9]+', '{n}', 'g') AS template, "
        "  doc_id FROM u) "
        "SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls, "
        "  MIN(doc_id) AS first_doc FROM t GROUP BY host, template "
        "HAVING COUNT(*) >= 2"
    ),
    # text_script_mix: same 40-char-base probe rotation; replace-trick
    # counts over the identical codepoint-range classes (no \p{...}
    # script properties — they drift between Java and RE2), chr(65533)
    # = U+FFFD, chr(1) = the C0 probe; same ROUND-6 fraction + OR.
    "text_script_mix": (
        "WITH inj AS (SELECT doc_id, substr(text, 1, 40) || "
        "  (CASE doc_id % 4 WHEN 0 THEN ' clean tail.' "
        "    WHEN 1 THEN ' broken ' || chr(65533) || ' decode ' || "
        "      chr(1) || ' here' "
        "    WHEN 2 THEN ' café résumé été' "
        "    ELSE ' привет мир это тест столица' END) AS t "
        "  FROM documents), "
        "c AS (SELECT doc_id, length(t) AS n, "
        "  length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) "
        "    AS al, "
        "  length(t) - length(regexp_replace(t, "
        "    '[^\\x00-\\x7f]', '', 'g')) AS na, "
        "  length(t) - length(replace(t, chr(65533), '')) AS rp, "
        "  length(t) - length(regexp_replace(t, "
        "    '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS ct "
        "  FROM inj) "
        "SELECT doc_id, CAST(n AS BIGINT) AS n_chars, "
        "  CAST(al AS BIGINT) AS n_ascii_letters, "
        "  CAST(na AS BIGINT) AS n_nonascii, "
        "  CAST(rp AS BIGINT) AS n_replacement, "
        "  CAST(ct AS BIGINT) AS n_control, "
        "  CASE WHEN n > 0 THEN ROUND(na / CAST(n AS DOUBLE), 6) END "
        "    AS nonascii_frac, "
        "  (n > 0 AND (rp > 0 OR ct > 0 OR "
        "    COALESCE(CASE WHEN n > 0 THEN "
        "      ROUND(na / CAST(n AS DOUBLE), 6) END, 0.0) > 0.3)) "
        "    AS suspect FROM c"
    ),
    # text_chunk_windows: same ws-noise corpus; starts = stride-stepped
    # generate_series (empty for zero-token docs), chunk = 1-based
    # inclusive list slice, single-space join; chunk_id = start/stride.
    "text_chunk_windows": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text FROM documents), "
        "tk AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "text, " + _WSRE2 + "), t -> t <> '') AS t FROM wsbase), "
        "st AS (SELECT doc_id, t, len(t) AS n, s FROM tk, "
        "  UNNEST(generate_series(0, len(t) - 1, 8)) AS g(s)) "
        "SELECT doc_id, CAST(s // 8 AS BIGINT) AS chunk_id, "
        "  CAST(s AS BIGINT) AS start_tok, "
        "  CAST(LEAST(12, n - s) AS BIGINT) AS n_tokens, "
        "  array_to_string(t[s + 1 : s + LEAST(12, n - s)], ' ') "
        "    AS chunk_text FROM st"
    ),
    # corpus_epoch_plan: same ws-noise corpus + the two injected rows;
    # exact token totals via the shared split class, sqrt weights,
    # fixed-op-order requested floor, integer ceil-div epochs (// is
    # DuckDB floor division == Spark DIV on positives).
    "corpus_epoch_plan": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text, source FROM documents), "
        "u AS (SELECT source, text FROM wsbase "
        "  UNION ALL SELECT 'big_src', text FROM wsbase "
        "    WHERE doc_id % 2 = 0 "
        "  UNION ALL SELECT 'empty_src', '' "
        "  UNION ALL SELECT NULL, 'dropped null source row here'), "
        "tok AS (SELECT source, COALESCE(len(list_filter("
        "regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> '')), 0)"
        " AS t FROM u WHERE source IS NOT NULL), "
        "agg AS (SELECT source, COUNT(*) AS n_docs, "
        "  CAST(SUM(t) AS BIGINT) AS n_tokens FROM tok GROUP BY source), "
        "w AS (SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * "
        "1000000.0) AS BIGINT) AS weight FROM agg), "
        "tw AS (SELECT SUM(weight) AS tot FROM w), "
        "req AS (SELECT w.*, CASE WHEN tot > 0 THEN "
        "CAST(FLOOR(110000.0 * "
        "CAST(weight AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT) "
        "ELSE 0 END AS requested_tokens FROM w, tw), "
        "pl AS (SELECT *, "
        "  CASE WHEN n_tokens <= 0 THEN 0 "
        "    ELSE LEAST((requested_tokens + n_tokens - 1) // n_tokens, 4)"
        "  END AS epochs, "
        "  CASE WHEN n_tokens <= 0 THEN 0 "
        "    ELSE LEAST(requested_tokens, n_tokens * 4) END "
        "  AS realized_tokens FROM req) "
        "SELECT source, n_docs, n_tokens, weight, requested_tokens, "
        "CAST(epochs AS BIGINT) AS epochs, "
        "CAST(realized_tokens AS BIGINT) AS realized_tokens, "
        "requested_tokens > realized_tokens AS capped FROM pl"
    ),
    # corpus_split_safe: the same CC components as dedup_cluster_cc,
    # then the split CASE over the cluster id — thresholds regenerated
    # from the shared split_thresholds builder (_split_case_sql).
    "corpus_split_safe": (
        f"WITH RECURSIVE {_DUPES}, {_TOKS}, {_SHINGLES}, {_MH_PAIRS}, "
        "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
        "  UNION ALL SELECT id_b AS s, id_a AS d FROM pairs), "
        "reach AS (SELECT DISTINCT s AS node, s AS r FROM edges "
        "  UNION "
        "  SELECT e.s AS node, reach.r FROM edges e "
        "  JOIN reach ON reach.node = e.d), "
        "comp AS (SELECT node, MIN(r) AS cluster_id FROM reach "
        "  GROUP BY node), "
        "cl AS (SELECT c.doc_id, "
        "  COALESCE(comp.cluster_id, c.doc_id) AS cluster_id "
        "  FROM corpus c LEFT JOIN comp ON comp.node = c.doc_id) "
        "SELECT doc_id, cluster_id, "
        + _split_case_sql("cluster_id")
        + " AS split FROM cl"
    ),
    "corpus_sample_hash": (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|s0'), 1, 2) "
        "<= '3f'"
    ),
    # corpus_stratified_sample: the engine's per-stratum CASE chain of
    # hex thresholds over the same salted digest rule as sample_hash.
    "corpus_stratified_sample": (
        "SELECT doc_id, lang, source FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|st0'), 1, 2) <= "
        "CASE lang WHEN 'en' THEN '9f' WHEN 'fr' THEN '5f' "
        "WHEN 'de' THEN '2f' ELSE '0f' END"
    ),
    # corpus_domain_filter: rebuild the same doc_id-derived host, then
    # restate the keep rule (blocked exact hosts + dot-anchored
    # subdomain suffixes) directly.
    "corpus_domain_filter": (
        f"WITH u AS (SELECT doc_id, {_HOST_SQL} AS host FROM documents) "
        "SELECT doc_id, 'https://' || host || '/p/' || "
        "CAST(doc_id AS VARCHAR) AS url FROM u "
        f"WHERE {_HOST_KEEP_SQL}"
    ),
    # corpus_ingest: blocklist -> incremental LSH flags (shared chain)
    # -> stratified rule, each stage restated from the same fragments.
    "corpus_ingest": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text, lang FROM documents), "
        f"hosts AS (SELECT doc_id, {_HOST_SQL} AS host FROM documents), "
        "newall AS ("
        "  SELECT w.doc_id + 2000000 AS doc_id, w.text, w.lang, h.host "
        "  FROM wsbase w JOIN hosts h ON h.doc_id = w.doc_id "
        "  WHERE w.doc_id % 10 = 3 "
        "  UNION ALL "
        "  SELECT w.doc_id + 3000000 AS doc_id, "
        "    'fresh unseen document number ' || "
        "    CAST(w.doc_id AS VARCHAR) || ' standalone content block' "
        "    AS text, w.lang, h.host "
        "  FROM wsbase w JOIN hosts h ON h.doc_id = w.doc_id "
        "  WHERE w.doc_id % 3 = 1), "
        "survivors AS (SELECT doc_id, text, lang FROM newall "
        f"  WHERE {_HOST_KEEP_SQL}), "
        "newc AS (SELECT doc_id, text FROM survivors), "
        + _INC_LSH_CHAIN
        + " SELECT s.doc_id, s.lang FROM survivors s "
        "WHERE s.doc_id NOT IN (SELECT doc_id FROM flags) "
        "AND substr(md5(CAST(s.doc_id AS VARCHAR) || '|st0'), 1, 2) <= "
        "CASE s.lang WHEN 'en' THEN 'bf' WHEN 'fr' THEN '7f' "
        "ELSE '3f' END"
    ),
    # dedup_boilerplate_lines: same injected line structure; line
    # document-frequencies over trimmed non-blank lines; residual text
    # reassembled by ordered string_agg with an all-dropped spine join.
    "dedup_boilerplate_lines": (
        "WITH inj AS (SELECT doc_id, "
        "  (CASE doc_id % 3 WHEN 0 THEN 'NAV HOME | ABOUT | CONTACT' "
        "    WHEN 1 THEN '  NAV HOME | ABOUT | CONTACT ' "
        "    ELSE 'solo ' || CAST(doc_id AS VARCHAR) END) "
        "  || chr(10) || 'u' || CAST(doc_id AS VARCHAR) || ' ' || "
        "  substr(text, 1, 12) "
        "  || chr(10) || 'G' || CAST(doc_id % 100 AS VARCHAR) "
        "  || chr(10) || chr(10) || 'H' || CAST(doc_id % 250 AS VARCHAR) "
        "  AS text FROM documents), "
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS l "
        "  FROM inj), "
        "lines AS (SELECT doc_id, i AS pos, l[i] AS line FROM ls, "
        "  UNNEST(generate_series(1, len(l))) AS g(i)), "
        "dfc AS (SELECT trim(line) AS key, "
        "  COUNT(DISTINCT doc_id) AS line_df FROM lines "
        "  WHERE trim(line) <> '' GROUP BY 1), "
        "keep AS (SELECT doc_id, pos, line FROM lines "
        "  LEFT JOIN dfc ON dfc.key = trim(lines.line) "
        "  WHERE trim(line) = '' OR line_df <= 4), "
        "agg AS (SELECT doc_id, "
        "  string_agg(line, chr(10) ORDER BY pos) AS text, "
        "  COUNT(*) AS nk FROM keep GROUP BY doc_id), "
        "tot AS (SELECT doc_id, COUNT(*) AS nt FROM lines "
        "  GROUP BY doc_id) "
        "SELECT t.doc_id, COALESCE(a.text, '') AS text, "
        "  CAST(COALESCE(a.nk, 0) AS BIGINT) AS n_lines_kept, "
        "  CAST(t.nt - COALESCE(a.nk, 0) AS BIGINT) AS n_lines_dropped "
        "FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id"
    ),
    # dedup_paragraphs: same injected paragraph structure; first
    # occurrence per trimmed key via row_number over (doc_id, pos)
    # (the oracle needn't be skew-safe); residual text reassembled by
    # ordered string_agg (NULL = dropped; '' paragraphs survive).
    "dedup_paragraphs": (
        "WITH inj AS (SELECT doc_id, "
        "  (CASE doc_id % 3 WHEN 0 THEN 'SHARED FOOTER PARAGRAPH' "
        "    WHEN 1 THEN '  SHARED FOOTER PARAGRAPH ' "
        "    ELSE 'solo ' || CAST(doc_id AS VARCHAR) END) "
        "  || chr(10) || chr(10) || 'u' || CAST(doc_id AS VARCHAR) "
        "  || ' ' || substr(text, 1, 12) "
        "  || chr(10) || chr(10) || 'rep' || CAST(doc_id % 9 AS VARCHAR) "
        "  || chr(10) || chr(10) "
        "  || chr(10) || chr(10) || 'u' || CAST(doc_id AS VARCHAR) "
        "  || ' ' || substr(text, 1, 12) "
        "  AS text FROM documents), "
        "ps AS (SELECT doc_id, "
        "  string_split(text, chr(10) || chr(10)) AS p FROM inj), "
        "paras AS (SELECT doc_id, i AS pos, p[i] AS para FROM ps, "
        "  UNNEST(generate_series(1, len(p))) AS g(i)), "
        "flag AS (SELECT doc_id, pos, para, "
        "  CASE WHEN trim(para) = '' THEN 0 "
        "       WHEN row_number() OVER (PARTITION BY trim(para) "
        "         ORDER BY doc_id, pos) = 1 THEN 0 "
        "       ELSE 1 END AS drp FROM paras) "
        "SELECT doc_id, "
        "  COALESCE(string_agg(CASE WHEN drp = 0 THEN para END, "
        "    chr(10) || chr(10) ORDER BY pos), '') AS text, "
        "  CAST(SUM(1 - drp) AS BIGINT) AS n_paras_kept, "
        "  CAST(SUM(drp) AS BIGINT) AS n_paras_dropped "
        "FROM flag GROUP BY doc_id"
    ),
    # corpus_c4_filters: same injected line fixture (concat_ws skips
    # the NULL doc_id%5=4 tail on both engines); line keep = trimmed,
    # terminal-punct end, >=5 ws-run words, no 'javascript'; sentence
    # count = replace-trick over the KEPT text; doc flags over the
    # ORIGINAL text.
    "corpus_c4_filters": (
        "WITH inj AS (SELECT doc_id, concat_ws(chr(10), "
        "  'Document number ' || CAST(doc_id AS VARCHAR) || "
        "    ' begins with a clean opening sentence.', "
        "  'Short line.', "
        "  'this line has no terminal punctuation at all', "
        "  'Please enable javascript to continue viewing this page.', "
        "  'Tabs' || chr(9) || 'here' || chr(9) || 'are' || chr(9) || "
        "    'still' || chr(9) || 'words in this sentence!', "
        "  '', "
        "  CASE doc_id % 5 "
        "    WHEN 0 THEN "
        "      'An extra closing sentence rounds the document out.' "
        "    WHEN 1 THEN 'Sadly this page contains lorem ipsum filler "
        "text everywhere.' "
        "    WHEN 2 THEN 'Some code follows in this page { not prose.' "
        "    WHEN 3 THEN 'This document mentions a badword "
        "unfortunately for everyone.' "
        "    END) AS text FROM documents), "
        "ls AS (SELECT doc_id, text, string_split(text, chr(10)) AS l "
        "  FROM inj), "
        "lines AS (SELECT doc_id, i AS pos, trim(l[i]) AS t FROM ls, "
        "  UNNEST(generate_series(1, len(l))) AS g(i)), "
        "flag AS (SELECT doc_id, pos, t, "
        "  (t <> '' AND substr(t, length(t), 1) IN ('.', '!', '?', '\"') "
        "   AND len(list_filter(regexp_split_to_array(t, " + _WSRE2 + "), "
        "     x -> x <> '')) >= 5 "
        "   AND NOT contains(lower(t), 'javascript')) AS ok FROM lines), "
        "agg AS (SELECT doc_id, "
        "  COALESCE(string_agg(CASE WHEN ok THEN t END, chr(10) "
        "    ORDER BY pos), '') AS ktext, "
        "  COALESCE(SUM(CASE WHEN ok THEN 1 ELSE 0 END), 0) AS nk, "
        "  COUNT(*) AS nt FROM flag GROUP BY doc_id), "
        "sig AS (SELECT i.doc_id, a.ktext, a.nk, a.nt, "
        "  (length(a.ktext) - length(replace(a.ktext, '.', ''))) + "
        "  (length(a.ktext) - length(replace(a.ktext, '!', ''))) + "
        "  (length(a.ktext) - length(replace(a.ktext, '?', ''))) AS ns, "
        "  contains(lower(i.text), 'lorem ipsum') AS lor, "
        "  contains(i.text, '{') AS br, "
        "  list_has_any(list_filter(regexp_split_to_array(lower(i.text), "
        + _WSRE2 + "), x -> x <> ''), "
        "    ['badword', 'nsfw', 'obscene']) AS bad "
        "  FROM inj i JOIN agg a ON a.doc_id = i.doc_id) "
        "SELECT doc_id, ktext AS text, CAST(nk AS BIGINT) AS n_lines_kept, "
        "  CAST(nt - nk AS BIGINT) AS n_lines_dropped, "
        "  CAST(ns AS BIGINT) AS n_sentences, "
        "  (ns >= 3 AND NOT lor AND NOT br AND NOT bad) AS keep "
        "FROM sig"
    ),
    "text_char_entropy": _entropy_oracle_sql(),
    "text_unigram_lm": _unigram_oracle_sql(),
    "corpus_ccnet_tiers": _ccnet_tiers_oracle_sql(),
    "text_quality_classifier": _classifier_oracle_sql(),
    "corpus_mixture_sample": _MIXTURE_ORACLE_SQL,
    "corpus_url_quality": _url_quality_oracle_sql(),
    "corpus_token_stats": (
        "WITH d AS (SELECT source, CAST(len(list_filter("
        "regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> '')) "
        "AS BIGINT) AS tc FROM documents) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(tc) AS BIGINT) AS total_tokens, "
        "MIN(tc) AS min_tokens, MAX(tc) AS max_tokens, "
        "ROUND(quantile_cont(tc, 0.25), 6) AS p25_tokens, "
        "ROUND(quantile_cont(tc, 0.5), 6) AS p50_tokens, "
        "ROUND(quantile_cont(tc, 0.9), 6) AS p90_tokens, "
        "ROUND(quantile_cont(tc, 0.99), 6) AS p99_tokens "
        "FROM d GROUP BY source"
    ),
    # text_line_stats: rebuild the SAME doc_id-derived multi-line text,
    # then recompute every fraction from first principles over the
    # split -> trim -> drop-blank line list (single final divisions,
    # ROUND 6, zero-line guard).
    "text_line_stats": (
        "WITH inj AS (SELECT doc_id, CASE doc_id % 4 "
        "  WHEN 0 THEN '- ' || substr(text, 1, 15) || chr(10) || "
        "    substr(text, 16, 15) || '...' || chr(10) || chr(10) || "
        "    '  ' || substr(text, 16, 15) || '...' "
        "  WHEN 1 THEN '* ' || substr(text, 1, 15) || chr(10) || "
        "    substr(text, 16, 15) "
        "  WHEN 2 THEN '•' || substr(text, 1, 15) || chr(10) || "
        "    substr(text, 16, 15) || '…' "
        "  ELSE text END AS text FROM documents), "
        "ln AS (SELECT doc_id, list_filter(list_transform("
        "  string_split(text, chr(10)), l -> trim(l)), l -> l <> '') "
        "  AS ls FROM inj) "
        "SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, "
        "CASE WHEN len(ls) > 0 THEN ROUND(len(list_filter(ls, "
        "  l -> substr(l, 1, 2) IN ('- ', '* ') "
        "  OR substr(l, 1, 1) = '•')) / len(ls), 6) "
        "  ELSE 0.0 END AS bullet_frac, "
        "CASE WHEN len(ls) > 0 THEN ROUND(len(list_filter(ls, "
        "  l -> right(l, 3) = '...' OR right(l, 1) = '…')) "
        "  / len(ls), 6) ELSE 0.0 END AS ellipsis_frac, "
        "CASE WHEN len(ls) > 0 THEN ROUND((len(ls) - "
        "  len(list_distinct(ls))) / len(ls), 6) ELSE 0.0 END "
        "  AS dup_line_frac FROM ln"
    ),
    # corpus_decontaminate: distinct per-doc 3-shingles (same 1-based
    # window build as _SHINGLES) vs the distinct shingle set of the
    # doc_id%40 benchmark subset; left join keeps zero-overlap rows.
    "corpus_decontaminate": (
        "WITH toks AS (SELECT doc_id, "
        "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> '') AS tk "
        "  FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, "
        "  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle "
        "  FROM toks, UNNEST(generate_series(1, "
        "    greatest(len(tk) - 2, 0))) AS g(i) WHERE len(tk) >= 3), "
        "bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 40 = 0), "
        "hits AS (SELECT doc_id, COUNT(*) AS n FROM sh "
        "  JOIN bsh USING (shingle) GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) "
        "  AS n_overlap, "
        "COALESCE(hits.n, 0) >= 2 AS contaminated "
        "FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id"
    ),
    # corpus_contamination_report: same %40 benchmark + shingle CTEs as
    # corpus_decontaminate, aggregated per (bench item, corpus doc)
    # pair then per item; zero-match items kept via the spine join.
    "corpus_contamination_report": (
        "WITH toks AS (SELECT doc_id, "
        "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
        "    t -> t <> '') AS tk FROM documents), "
        "sh AS (SELECT DISTINCT doc_id, "
        "  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle "
        "  FROM toks, UNNEST(generate_series(1, "
        "    greatest(len(tk) - 2, 0))) AS g(i) WHERE len(tk) >= 3), "
        "bsh AS (SELECT doc_id AS bid, shingle FROM sh "
        "  WHERE doc_id % 40 = 0), "
        "pair AS (SELECT b.bid, s.doc_id AS sid, COUNT(*) AS n "
        "  FROM sh s JOIN bsh b USING (shingle) GROUP BY b.bid, sid), "
        "per AS (SELECT bid, "
        "  SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS nc, "
        "  MAX(n) AS mo FROM pair GROUP BY bid) "
        "SELECT d.doc_id AS bench_id, "
        "  CAST(COALESCE(per.nc, 0) AS BIGINT) AS n_contaminating, "
        "  CAST(COALESCE(per.mo, 0) AS BIGINT) AS max_overlap "
        "FROM documents d LEFT JOIN per ON per.bid = d.doc_id "
        "WHERE d.doc_id % 40 = 0"
    ),
    # corpus_health_report: same suffixed+duped corpus; the four
    # per-doc signals restated (split-class token count, md5 digest,
    # shared classifier chain, full script-mix suspect rule) and the
    # DECIMAL(18,6) sum of rounded scores cast to double ONCE.
    "corpus_health_report": (
        "WITH wsbase AS (SELECT doc_id, "
        f"text || {_WS_NOISE_SQL} AS text, lang FROM documents), "
        "suf AS (SELECT doc_id, lang, text || "
        "  CASE WHEN doc_id % 7 = 3 THEN ' ' || chr(65533) || ' bad' "
        "  ELSE '' END AS text FROM wsbase), "
        "corpus AS (SELECT doc_id, lang, text FROM suf "
        "  UNION ALL SELECT doc_id + 1000000, lang, text FROM suf "
        "  WHERE doc_id % 50 = 0), "
        + _classifier_ctes("corpus")
        + ", met AS (SELECT c.doc_id, c.lang, "
        "  len(list_filter(regexp_split_to_array(c.text, " + _WSRE2 + "), "
        "    x -> x <> '')) AS nt, "
        "  md5(c.text) AS dg, "
        "  CAST(ROUND(sc.s, 6) AS DECIMAL(18,6)) AS q, "
        "  (length(c.text) > 0 AND ("
        "    length(c.text) - length(replace(c.text, chr(65533), '')) > 0 "
        "    OR length(c.text) - length(regexp_replace(c.text, "
        "      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) > 0 "
        "    OR COALESCE(ROUND((length(c.text) - length(regexp_replace("
        "      c.text, '[^\\x00-\\x7f]', '', 'g'))) / "
        "      CAST(length(c.text) AS DOUBLE), 6), 0.0) > 0.3)) AS sus "
        "  FROM corpus c JOIN sc ON sc.doc_id = c.doc_id) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "  CAST(SUM(nt) AS BIGINT) AS n_tokens, "
        "  CAST(COUNT(DISTINCT dg) AS BIGINT) AS n_distinct, "
        "  ROUND(1.0 - COUNT(DISTINCT dg) / CAST(COUNT(*) AS DOUBLE), 6) "
        "    AS dup_frac, "
        "  ROUND(CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) "
        "    AS mean_quality, "
        "  ROUND(SUM(CASE WHEN sus THEN 1 ELSE 0 END) / "
        "    CAST(COUNT(*) AS DOUBLE), 6) AS suspect_frac "
        "FROM met GROUP BY lang"
    ),
    "corpus_shard_shuffle": (
        "WITH h AS (SELECT doc_id, "
        "  md5(CAST(doc_id AS VARCHAR) || '|sh0') AS dg FROM documents) "
        "SELECT doc_id, substr(dg, 1, 2) AS shard, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY substr(dg, 1, 2) "
        "  ORDER BY dg ASC, doc_id ASC) AS BIGINT) AS pos FROM h"
    ),
    # corpus_end_to_end: the composed decision chain, each stage the
    # SAME fragment its standalone oracle uses — url keep via the key
    # arithmetic, md5 exact keep, _TOKS/_SHINGLES/_MH_PAIRS + recursive
    # CC over the survivors, shingle-overlap decontamination vs the raw
    # %40 benchmark, _quality_cte + quota window, md5 shard shuffle.
    "corpus_end_to_end": (
        _e2e_chain_sql() + ", "
        "hsh AS (SELECT doc_id, source, "
        "  md5(CAST(doc_id AS VARCHAR) || '|sh0') AS dg FROM s5) "
        "SELECT doc_id, source, substr(dg, 1, 2) AS shard, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY substr(dg, 1, 2) "
        "  ORDER BY dg ASC, doc_id ASC) AS BIGINT) AS pos FROM hsh"
    ),
    # corpus_dedup_funnel: the shared e2e chain + a UNION ALL of stage
    # counts in funnel order (input/url/exact/cc/decontaminate/quota)
    "corpus_dedup_funnel": (
        _e2e_chain_sql() + " "
        "SELECT CAST(0 AS BIGINT) AS stage_no, 'input' AS stage, "
        "  COUNT(*) AS n_docs FROM corpus "
        "UNION ALL SELECT 1, 'url_dedup', COUNT(*) FROM s1 "
        "UNION ALL SELECT 2, 'exact_dedup', COUNT(*) FROM surv "
        "UNION ALL SELECT 3, 'minhash_cc', COUNT(*) FROM s3 "
        "UNION ALL SELECT 4, 'decontaminate', COUNT(*) FROM s4 "
        "UNION ALL SELECT 5, 'quality_quota', COUNT(*) FROM s5"
    ),
    # text_normalize: injection + the same lower/translate/collapse
    # chain; the fold tables are the engine's own constants so the two
    # sites cannot drift.
    "text_normalize": (
        "WITH inj AS (SELECT doc_id, text || "
        "  CASE WHEN doc_id % 2 = 0 THEN '  Café DÉJÀ-VU Ñandú ß' "
        "  ELSE ' ÉLÈVE naïve  øre Œuf' END AS text FROM documents) "
        "SELECT doc_id, "
        "trim(regexp_replace(translate(lower(text), '"
        + text.ACCENT_SRC + "', '" + text.ACCENT_DST + "'), "
        "'\\s+', ' ', 'g')) AS text FROM inj"
    ),
    # corpus_quota_topk: shared quality fragment, ROW_NUMBER with the
    # engine's explicit total tie-break (quality DESC, doc_id ASC),
    # BIGINT rank.
    "corpus_quota_topk": (
        f"WITH {_quality_cte('doc_id, source')}, "
        "r AS (SELECT doc_id, source, quality, "
        "  CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "    ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk "
        "  FROM qdoc) "
        "SELECT doc_id, source, quality, rnk FROM r WHERE rnk <= 12"
    ),
    # text_pii_scrub: injection + three SEQUENTIAL scrub passes, each
    # count on that pass's INPUT; patterns are the very same strings the
    # engine uses (operators/scrub.py constants — Java/RE2-shared syntax).
    "text_pii_scrub": (
        "WITH inj AS (SELECT doc_id, text || "
        "  CASE WHEN doc_id % 3 = 0 THEN ' contact user' || "
        "    CAST(doc_id AS VARCHAR) || '@example.com now' "
        "  WHEN doc_id % 3 = 1 THEN ' srv 10.0.' || "
        "    CAST(doc_id % 256 AS VARCHAR) || '.7 tel +33 555 01' || "
        "    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') "
        "  ELSE '' END AS text FROM documents), "
        "p1 AS (SELECT doc_id, "
        "  CAST(len(regexp_extract_all(text, '" + _scrub.EMAIL_RE + "')) "
        "    AS BIGINT) AS n_emails, "
        "  regexp_replace(text, '" + _scrub.EMAIL_RE + "', "
        "    '<EMAIL>', 'g') AS t1 FROM inj), "
        "p2 AS (SELECT doc_id, n_emails, "
        "  CAST(len(regexp_extract_all(t1, '" + _scrub.IPV4_RE + "')) "
        "    AS BIGINT) AS n_ips, "
        "  regexp_replace(t1, '" + _scrub.IPV4_RE + "', '<IP>', 'g') "
        "    AS t2 FROM p1) "
        "SELECT doc_id, n_emails, n_ips, "
        "CAST(len(regexp_extract_all(t2, '" + _scrub.PHONE_RE + "')) "
        "  AS BIGINT) AS n_phones, "
        "regexp_replace(t2, '" + _scrub.PHONE_RE + "', '<PHONE>', 'g') "
        "  AS text FROM p2"
    ),
    "dedup_simhash64": (
        "WITH wsdocs AS (SELECT doc_id, text || " + _WS_NOISE_SQL
        + " AS text FROM documents), "
        + _simhash_fp_cte("wsdocs", 64)
        + " SELECT doc_id, fp AS simhash FROM fps"
    ),
    # SimHash banded pairing: fingerprints over documents + exact
    # copies (+1e6) + one-token near copies (+2e6) of every 50th doc,
    # 4 bands of 16 bits (mirroring q_dedup_simhash_pairs), candidates
    # on exact band match under the hot-band cap, verify = exact
    # Hamming via BIT xor/bit_count (mirrors hamming_on_bits)
    "dedup_simhash_pairs": (
        "WITH wsdocs AS (SELECT doc_id, text || " + _WS_NOISE_SQL
        + " AS text FROM documents), "
        "shcorpus AS ("
        "  SELECT doc_id, text FROM wsdocs "
        "  UNION ALL SELECT doc_id + 1000000 AS doc_id, text "
        "    FROM wsdocs WHERE doc_id % 50 = 0 "
        "  UNION ALL SELECT doc_id + 2000000 AS doc_id, "
        "    text || ' simprobe' AS text "
        "    FROM wsdocs WHERE doc_id % 50 = 0), "
        + _simhash_fp_cte("shcorpus", 64) + ", "
        "bands AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, fp, {b} AS band_no, "
            f"substr(fp, {b * 16 + 1}, 16) AS bb FROM fps"
            for b in range(4)
        )
        + "), "
        # hot-band frequency cap (max_band_freq=50), identical to the
        # engine's window filter
        "bfc AS (SELECT band_no, bb FROM bands "
        "  GROUP BY band_no, bb HAVING COUNT(*) <= 50), "
        "bandsf AS (SELECT bands.* FROM bands "
        "  JOIN bfc USING (band_no, bb)), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "  a.fp AS fa, b.fp AS fb FROM bandsf a JOIN bandsf b "
        "  ON a.band_no = b.band_no AND a.bb = b.bb "
        "  AND a.doc_id < b.doc_id) "
        "SELECT id_a, id_b, "
        "  CAST(bit_count(xor(CAST(fa AS BIT), CAST(fb AS BIT))) AS INT) "
        "    AS hamming "
        "FROM cand "
        "WHERE bit_count(xor(CAST(fa AS BIT), CAST(fb AS BIT))) <= 3"
    ),
    # dedup_simhash_pairs_mp: INDEPENDENT oracle — the brute-force
    # Hamming ball at radius 6 (no candidate-stage restatement needed:
    # the 8-block/2-key combination join is pigeonhole-exact there)
    "dedup_simhash_pairs_mp": (
        "WITH wsdocs AS (SELECT doc_id, text || " + _WS_NOISE_SQL
        + " AS text FROM documents), "
        "shcorpus AS ("
        "  SELECT doc_id, text FROM wsdocs "
        "  UNION ALL SELECT doc_id + 1000000 AS doc_id, text "
        "    FROM wsdocs WHERE doc_id % 50 = 0 "
        "  UNION ALL SELECT doc_id + 2000000 AS doc_id, "
        "    text || ' simprobe' AS text "
        "    FROM wsdocs WHERE doc_id % 50 = 0 "
        "  UNION ALL SELECT doc_id + 3000000 AS doc_id, "
        "    text || ' simprobe midradius flip' AS text "
        "    FROM wsdocs WHERE doc_id % 50 = 0), "
        + _simhash_fp_cte("shcorpus", 64) + " "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "  CAST(bit_count(xor(CAST(a.fp AS BIT), CAST(b.fp AS BIT))) "
        "    AS INT) AS hamming "
        "FROM fps a JOIN fps b ON a.doc_id < b.doc_id "
        "WHERE bit_count(xor(CAST(a.fp AS BIT), CAST(b.fp AS BIT))) <= 6"
    ),
    "dedup_embedding_cosine_lsh": (
        "WITH e AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id < 200 "
        "UNION ALL "
        "SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings "
        "WHERE vec_id < 200 AND vec_id % 25 = 0), "
        "b AS ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {t} AS t, {_lsh_bucket_sql(t, 2)} AS bk FROM e"
            for t in range(3)
        )
        + "), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b "
        "  FROM b a JOIN b c ON a.t = c.t AND a.bk = c.bk "
        "    AND a.vec_id < c.vec_id), "
        "s AS (SELECT id_a, id_b, "
        f"  ROUND({_cos_sql('ea', 'eb')}, 4) AS cos "
        "  FROM cand JOIN e ea ON ea.vec_id = id_a "
        "  JOIN e eb ON eb.vec_id = id_b) "
        "SELECT id_a, id_b, cos FROM s WHERE cos >= 0.35"
    ),
    "text_langid": _langid_oracle_sql(),
    "text_quality": (
        f"WITH {_quality_cte('doc_id')} "
        "SELECT doc_id, n_tokens, quality FROM qdoc"
    ),
    "text_tokens": (
        "SELECT doc_id, "
        "CAST(len(list_filter(regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> '')) "
        "  AS BIGINT) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, "
        "  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s\\x0b]')) AS BIGINT) AS bpe_tokens "
        "FROM (SELECT doc_id, text || " + _WS_NOISE_SQL
        + " AS text FROM documents)"
    ),
    "text_fingerprint": (
        "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
        "list_filter(regexp_split_to_array(text, " + _WSRE2 + "), x -> x <> ''))), ' ')) AS fp "
        "FROM (SELECT doc_id, text || " + _WS_NOISE_SQL
        + " AS text FROM documents)"
    ),
    # text_repetition: 3-grams built exactly like the engine's
    # ngrams_from_tokens (1-based list windows, space-joined); integer
    # counts, one final division, ROUND 6 — bit-identical doubles.
    "text_repetition": (
        "WITH tks AS ("
        "  SELECT doc_id, "
        "    list_filter(regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> '') AS tk "
        "  FROM documents), "
        "base AS ("
        "  SELECT doc_id, len(tk) AS n_tokens, "
        "    len(list_distinct(tk)) AS n_dtok, "
        "    greatest(len(tk) - 2, 0) AS n_grams "
        "  FROM tks), "
        "g2 AS ("
        "  SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g "
        "  FROM tks, UNNEST(generate_series(1, greatest(len(tk) - 2, 0))) "
        "    AS u(i) "
        "  WHERE len(tk) >= 3), "
        "gd AS ("
        "  SELECT doc_id, COUNT(DISTINCT g) AS n_dg, MAX(c) AS max_c "
        "  FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 "
        "        GROUP BY doc_id, g) GROUP BY doc_id) "
        "SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens, "
        "CASE WHEN b.n_tokens > 0 THEN "
        "  ROUND((b.n_tokens - b.n_dtok) / b.n_tokens, 6) "
        "  ELSE 0.0 END AS dup_word_frac, "
        "CASE WHEN b.n_grams > 0 THEN "
        "  ROUND((b.n_grams - gd.n_dg) / b.n_grams, 6) "
        "  ELSE 0.0 END AS dup_ngram_frac, "
        "CASE WHEN b.n_grams > 0 THEN ROUND(gd.max_c / b.n_grams, 6) "
        "  ELSE 0.0 END AS max_ngram_frac "
        "FROM base b LEFT JOIN gd ON b.doc_id = gd.doc_id"
    ),
    # events_asof_join: DuckDB's NATIVE ASOF JOIN — an independent
    # implementation of the backward/exact-match semantics the engine
    # builds from union+window.  Clicks pre-aggregated to one row per
    # (user, ts) so ties cannot make either engine nondeterministic.
    "events_asof_join": (
        "WITH p AS (SELECT user_id, ts, event_id, value FROM events "
        "  WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value FROM events "
        "  WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.user_id, p.ts, p.event_id, p.value, "
        "c.click_value AS click_value_asof "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
    # events_sessionize: gaps/durations in INTEGER microseconds
    # (epoch_us differences == Spark's timestampdiff(MICROSECOND) on
    # TIMESTAMP_NTZ, timezone-free), one final division; value sums via
    # exact decimal(18,2).
    "events_sessionize": (
        "WITH o AS (SELECT user_id, ts, value, "
        "  CASE WHEN lag(ts) OVER w IS NULL "
        "    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 "
        "  THEN 1 ELSE 0 END AS ns "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, ts, value, "
        "  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts "
        "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no FROM o) "
        "SELECT user_id, session_no, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, "
        "MIN(ts) AS t_start, MAX(ts) AS t_end, "
        "ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6) "
        "  AS duration_sec "
        "FROM s GROUP BY user_id, session_no"
    ),
    # corpus_source_stats: quality restated per-doc (same expression as
    # text_quality), then per-source aggregation with an exact
    # decimal(18,6) sum and one final division (mirrors source_stats).
    # corpus_curation: the composed curation decision — the SAME probe
    # injection and readability/quality/source-stats fragments as their
    # standalone oracles, joined, then the quota window
    "corpus_curation": (
        "WITH inj AS (SELECT doc_id, source, text || "
        "  CASE WHEN doc_id % 2 = 0 "
        "  THEN ' First probe sentence. Second one! Third?' "
        "  ELSE '' END AS text FROM documents), "
        + _quality_cte("doc_id, source", "inj") + ", "
        + _readability_counts_sql("inj", "rdn") + ", "
        f"rd AS (SELECT doc_id, {_FLESCH_SQL} AS flesch FROM rdn), "
        "st AS (SELECT source, "
        "  ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) "
        "    / COUNT(*), 6) >= 0.45 AS keep FROM qdoc GROUP BY source), "
        "kept AS (SELECT qdoc.doc_id, qdoc.source, qdoc.quality, "
        "  rd.flesch FROM qdoc JOIN rd USING (doc_id) "
        "  JOIN st USING (source) WHERE st.keep AND rd.flesch >= 30.0), "
        "r AS (SELECT doc_id, source, quality, flesch, "
        "  CAST(ROW_NUMBER() OVER (PARTITION BY source "
        "    ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk "
        "  FROM kept) "
        "SELECT doc_id, source, quality, flesch, rnk FROM r "
        "WHERE rnk <= 10"
    ),
    "corpus_source_stats": (
        f"WITH {_quality_cte('doc_id, source')} "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, "
        "ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) "
        "  / COUNT(*), 6) AS mean_quality, "
        "MIN(quality) AS min_quality, MAX(quality) AS max_quality, "
        "ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) "
        "  / COUNT(*), 6) >= 0.45 AS keep "
        "FROM qdoc GROUP BY source"
    ),
    "dedup_embedding_cosine": (
        "WITH e AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id < 200 "
        "UNION ALL "
        "SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings "
        "WHERE vec_id < 200 AND vec_id % 25 = 0), "
        "s AS ("
        "  SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "  ROUND(list_reduce(list_transform(generate_series(1, "
        "    len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * "
        "    CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) "
        "  / (sqrt(list_reduce(list_transform(generate_series(1, "
        "    len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE) * "
        "    CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y)) "
        "  * sqrt(list_reduce(list_transform(generate_series(1, "
        "    len(b.embedding)), i -> CAST(b.embedding[i] AS DOUBLE) * "
        "    CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y))), 4) AS cos "
        "  FROM e a JOIN e b ON a.vec_id < b.vec_id) "
        "SELECT id_a, id_b, cos FROM s WHERE cos >= 0.35"
    ),
    # ann_lsh_topk: deterministic md5 hyperplanes make even the ANN path
    # exactly SQL-reproducible (same trick as dedup_embedding_cosine_lsh).
    # ann_ivf_topk's SEARCH is oracle-checked too (centroid literals from
    # the deterministic local fit, registered below ORACLE_SQL); only
    # pipeline_extract (Arrow batch) remains rows-only.
    "ann_lsh_topk": (
        "WITH cb AS ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {t} AS t, {_lsh_bucket_sql(t, 2)} AS bk "
            "FROM embeddings"
            for t in range(3)
        )
        + "), "
        "qb AS (SELECT vec_id AS query_id, t, bk FROM cb "
        "  WHERE vec_id < 10), "
        "cand AS (SELECT DISTINCT qb.query_id, cb.vec_id "
        "  FROM qb JOIN cb ON qb.t = cb.t AND qb.bk = cb.bk "
        "    AND cb.vec_id <> qb.query_id), "
        "s AS (SELECT query_id, cand.vec_id, "
        f"  ROUND({_cos_sql('eq', 'ec')}, 4) AS cos "
        "  FROM cand JOIN embeddings eq ON eq.vec_id = query_id "
        "  JOIN embeddings ec ON ec.vec_id = cand.vec_id) "
        "SELECT query_id, vec_id, cos, rnk FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "    ORDER BY cos DESC, vec_id ASC) AS rnk FROM s) WHERE rnk <= 5"
    ),
    "ann_cosine_topk": (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qv "
        "FROM embeddings WHERE vec_id < 10), "
        "s AS ("
        "  SELECT q.query_id, c.vec_id, "
        "    ROUND(list_reduce(list_transform(generate_series(1, "
        "      len(q.qv)), i -> CAST(q.qv[i] AS DOUBLE) * "
        "      CAST(c.embedding[i] AS DOUBLE)), (a, b) -> a + b) "
        "    / (sqrt(list_reduce(list_transform(generate_series(1, "
        "      len(q.qv)), i -> CAST(q.qv[i] AS DOUBLE) * "
        "      CAST(q.qv[i] AS DOUBLE)), (a, b) -> a + b)) "
        "    * sqrt(list_reduce(list_transform(generate_series(1, "
        "      len(c.embedding)), i -> CAST(c.embedding[i] AS DOUBLE) * "
        "      CAST(c.embedding[i] AS DOUBLE)), (a, b) -> a + b))), 4) "
        "    AS cos "
        "  FROM q CROSS JOIN embeddings c WHERE q.query_id <> c.vec_id) "
        "SELECT query_id, vec_id, cos, rnk FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        "    ORDER BY cos DESC, vec_id ASC) AS rnk FROM s) WHERE rnk <= 5"
    ),
}


def _cos_arr_sql(x: str, y: str) -> str:
    """Cosine between two SQL array expressions, folding left-to-right in
    float64 exactly like operators/similarity.py::cosine (both sides cast
    per element — a no-op on DOUBLE[] literals, the FLOAT->DOUBLE widening
    on embedding columns)."""

    def dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({x})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            f"(p, q) -> p + q)"
        )

    return f"{dot(x, y)} / (sqrt({dot(x, x)}) * sqrt({dot(y, y)}))"


def _ivf_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    n_cells: int = 8,
    iters: int = 2,
    n_probe: int = 3,
    k: int = 5,
) -> str:
    """Exact SQL oracle for the IVF SEARCH: the fitted centroids (the one
    non-reproducible step — see q_ann_ivf_topk) are embedded as DOUBLE[]
    literals from the SAME ``ivf_fit_local`` call the Spark query uses, at
    the driver gate's sf (0.01).  Assignment (argmax cosine, first-wins =
    lowest cid on ties), probe ranking (unrounded ccos desc, cell asc) and
    scoring (round-4 cos desc, vec_id asc) mirror similarity.ivf_topk
    clause for clause."""
    from .operators.similarity import ivf_fit_local

    cents = ivf_fit_local(sf_dir, n_cells, iters)
    vals = ", ".join(
        "(" + str(cid) + ", ["
        + ", ".join(repr(v) for v in vec)
        + "]::DOUBLE[])"
        for cid, vec in cents
    )
    return (
        f"WITH cents(cid, cv) AS (VALUES {vals}), "
        "ca AS (SELECT e.vec_id, c.cid, "
        f"  {_cos_arr_sql('e.embedding', 'c.cv')} AS ccos "
        "  FROM embeddings e CROSS JOIN cents c), "
        "cell_of AS (SELECT vec_id, cid AS cell FROM ("
        "  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
        "    ORDER BY ccos DESC, cid ASC) AS rn FROM ca) WHERE rn = 1), "
        "probes AS (SELECT vec_id AS query_id, cid AS cell FROM ("
        "  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
        "    ORDER BY ccos DESC, cid ASC) AS pr FROM ca "
        f"  WHERE vec_id < 10) WHERE pr <= {n_probe}), "
        "s AS (SELECT p.query_id, co.vec_id, "
        f"  ROUND({_cos_arr_sql('eq.embedding', 'ec.embedding')}, 4) AS cos "
        "  FROM probes p "
        "  JOIN cell_of co ON co.cell = p.cell AND co.vec_id <> p.query_id "
        "  JOIN embeddings eq ON eq.vec_id = p.query_id "
        "  JOIN embeddings ec ON ec.vec_id = co.vec_id) "
        "SELECT query_id, vec_id, cos, rnk FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"    ORDER BY cos DESC, vec_id ASC) AS rnk FROM s) WHERE rnk <= {k}"
    )


def _semantic_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    n_cells: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
) -> str:
    """Exact SQL oracle for dedup_semantic: the same ivf_fit_local
    centroids as DOUBLE[] literals, the same argmax-cosine assignment
    (first-wins = lowest cid on ties), within-cell lower-id pairing
    with the ROUND-6 cosine threshold, LEFT-join keep flag."""
    from .operators.similarity import ivf_fit_local

    cents = ivf_fit_local(sf_dir, n_cells, iters)
    vals = ", ".join(
        "(" + str(cid) + ", ["
        + ", ".join(repr(v) for v in vec)
        + "]::DOUBLE[])"
        for cid, vec in cents
    )
    return (
        f"WITH cents(cid, cv) AS (VALUES {vals}), "
        "e AS (SELECT vec_id, embedding FROM embeddings "
        "  WHERE vec_id < 200 "
        "  UNION ALL "
        "  SELECT vec_id + 1000000 AS vec_id, embedding "
        "  FROM embeddings WHERE vec_id < 200 AND vec_id % 25 = 0), "
        "ca AS (SELECT e.vec_id, c.cid, "
        f"  {_cos_arr_sql('e.embedding', 'c.cv')} AS ccos "
        "  FROM e CROSS JOIN cents c), "
        "cell_of AS (SELECT vec_id, cid AS cell FROM ("
        "  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id "
        "    ORDER BY ccos DESC, cid ASC) AS rn FROM ca) WHERE rn = 1), "
        "dup AS (SELECT DISTINCT a.vec_id FROM cell_of a "
        "  JOIN cell_of b ON b.cell = a.cell AND b.vec_id < a.vec_id "
        "  JOIN e ea ON ea.vec_id = a.vec_id "
        "  JOIN e eb ON eb.vec_id = b.vec_id "
        f"  WHERE ROUND({_cos_arr_sql('ea.embedding', 'eb.embedding')}, 6) "
        f"    >= {threshold!r}) "
        "SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS keep "
        "FROM cell_of c LEFT JOIN dup d ON d.vec_id = c.vec_id"
    )


@_lru_cache(maxsize=4)
def _semantic_oracle_cached(sf_dir: str) -> str:
    return _semantic_oracle_sql(sf_dir)


def _proto_prune_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
    n_cells: int = 8,
    iters: int = 2,
    q: float = 0.3,
) -> str:
    """Exact SQL oracle for corpus_embed_prune: the same ivf_fit_local
    centroids as DOUBLE[] literals, the same argmax-cosine assignment
    (lowest cid on ties) ALSO carrying the winning cosine (ROUND 6 =
    proto_cos), per-cell quantile_cont cutoff (ROUND 6 — the same
    linear-interpolation definition as Spark's exact percentile), and
    the >= keep rule."""
    from .operators.similarity import ivf_fit_local

    cents = ivf_fit_local(sf_dir, n_cells, iters)
    vals = ", ".join(
        "(" + str(cid) + ", ["
        + ", ".join(repr(v) for v in vec)
        + "]::DOUBLE[])"
        for cid, vec in cents
    )
    return (
        f"WITH cents(cid, cv) AS (VALUES {vals}), "
        "e AS (SELECT vec_id, embedding FROM embeddings "
        "  WHERE vec_id < 300), "
        "ca AS (SELECT e.vec_id, c.cid, "
        f"  {_cos_arr_sql('e.embedding', 'c.cv')} AS ccos "
        "  FROM e CROSS JOIN cents c), "
        # NULL-vector sentinel mirror: the engine's argmax coalesces a
        # NULL cosine to -2.0 so it never wins, and when EVERY cosine
        # is NULL the -1.5 sentinel yields (cell -1, proto_cos -1.5) —
        # restated here as the ccos-IS-NULL CASE on the rn=1 row
        # (NULLS LAST makes any real cosine win first)
        "cell_of AS (SELECT vec_id, "
        "  CASE WHEN ccos IS NULL THEN -1 ELSE cid END AS cell, "
        "  CASE WHEN ccos IS NULL THEN -1.5 "
        "    ELSE ROUND(ccos, 6) END AS proto_cos FROM ("
        "  SELECT vec_id, cid, ccos, ROW_NUMBER() OVER ("
        "    PARTITION BY vec_id ORDER BY ccos DESC NULLS LAST, "
        "    cid ASC) AS rn FROM ca) WHERE rn = 1), "
        "cuts AS (SELECT cell, "
        f"  ROUND(quantile_cont(proto_cos, {q!r}), 6) AS cell_cutoff "
        "  FROM cell_of GROUP BY cell) "
        "SELECT co.vec_id, co.cell, co.proto_cos, cu.cell_cutoff, "
        "co.proto_cos >= cu.cell_cutoff AS keep "
        "FROM cell_of co JOIN cuts cu ON cu.cell = co.cell"
    )


@_lru_cache(maxsize=4)
def _proto_prune_oracle_cached(sf_dir: str) -> str:
    return _proto_prune_oracle_sql(sf_dir)


def oracle_sql_dict() -> dict[str, str]:
    """ORACLE_SQL plus the lazily-built entries, resolved at gate time.

    The IVF oracle fits a quantizer from gate testdata; building it at
    module import made a corrupt/partial parquet (pyarrow ArrowInvalid,
    not just OSError) break ``import queries``, and pinned the centroid
    literals to sf0.01 even when the gate ran elsewhere.  The gate sf
    dir is overridable via SPARK_GRAFT_GATE_SF_DIR (default sf0.01, the
    driver's documented gate scale, matching q_ann_ivf_topk's fit)."""
    out = dict(ORACLE_SQL)
    try:
        gate_sf = os.environ.get(
            "SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"
        )
        out["ann_ivf_topk"] = _ivf_oracle_cached(gate_sf)
        out["dedup_semantic"] = _semantic_oracle_cached(gate_sf)
        out["corpus_embed_prune"] = _proto_prune_oracle_cached(gate_sf)
    except (OSError, ValueError):
        # testdata absent or unreadable: this entry falls back to the
        # driver's rows-only check rather than failing every oracle.
        # ValueError covers pyarrow's ArrowInvalid (its base class) for
        # corrupt/partial parquet; anything else is a real bug in the
        # oracle builder and must surface, not silently degrade.
        pass
    return out


@_lru_cache(maxsize=4)
def _ivf_oracle_cached(sf_dir: str) -> str:
    """One quantizer fit per gate sf dir: the parity suite calls
    oracle_sql() once per test (~87x/run) and the fit reads parquet +
    runs k-means — memoized; lru_cache does not cache exceptions, so a
    transiently-unreadable dir is retried on the next call."""
    return _ivf_oracle_sql(sf_dir)


def _hard_clean_pass_sql(src: str, remove_pred: str) -> str:
    """One sequential pass of the crelan hard clean() as SQL: DuckDB's
    RE2 regexes have no lookarounds, so each pass is restated as a
    per-character KEEP predicate over that pass's input — exactly how
    Python's re.sub evaluates lookarounds (against the pass input, not
    the partially-built output).  ``remove_pred`` may reference {C} (the
    char), {PV} (previous char or ''), {NX} (next char or '')."""
    pred = remove_pred.format(
        C="ch[i]",
        PV="coalesce(ch[i-1], '')",
        NX="coalesce(ch[i+1], '')",
    )
    return (
        "(SELECT array_to_string(list_transform(list_filter("
        "generate_series(1, len(ch)), "
        f"i -> NOT ({pred})), i -> ch[i]), '') "
        f"FROM (SELECT regexp_split_to_array({src}, '') AS ch))"
    )


# remove-predicates per pass (see functions/strings.py::hard_clean_crelan);
# placeholders {C}/{PV}/{NX} are substituted by _hard_clean_pass_sql
_HC1 = (
    "regexp_matches({C}, '^[a-z]$') "
    "OR ({C} = '%' AND NOT regexp_matches({PV}, '^[0-9]$')) "
    "OR ({C} = '%' AND {NX} <> ' ')"
)
_HC2 = (
    "regexp_matches({C}, '^[A-Za-z]$') "
    "AND regexp_matches({PV}, '^[0-9.]$') AND {NX} <> ' '"
)
_HC3 = (
    "{C} = ' ' AND regexp_matches({PV}, '^[0-9/]$') "
    "AND regexp_matches({NX}, '^[0-9/]$')"
)

ORACLE_SQL["f_hard_name_clean"] = (
    "WITH raw AS (SELECT CAST(p_partkey AS BIGINT) AS id, "
    "  CASE WHEN p_partkey % 97 = 0 THEN 'nan' ELSE "
    "    upper(substr(p_name, 1, 4)) || ' ' || p_name || ' ' || "
    "    CAST(p_partkey % 9 AS VARCHAR) || ',' || "
    "    CAST(p_partkey % 90 + 10 AS VARCHAR) || '%' || "
    "    (CASE WHEN p_partkey % 3 = 0 THEN ' ' ELSE '' END) || "
    "    CAST(p_partkey % 28 + 1 AS VARCHAR) || '/' || "
    "    CAST(p_partkey % 12 + 1 AS VARCHAR) || "
    "    (CASE WHEN p_partkey % 4 = 0 THEN ' 2y' ELSE ' 30BX9' END) "
    "  END AS s FROM part), "
    f"p1 AS (SELECT id, {_hard_clean_pass_sql('s', _HC1)} AS s, "
    "  s AS orig FROM raw), "
    f"p2 AS (SELECT id, {_hard_clean_pass_sql('s', _HC2)} AS s, "
    "  orig FROM p1), "
    f"p3 AS (SELECT id, {_hard_clean_pass_sql('s', _HC3)} AS s, "
    "  orig FROM p2) "
    "SELECT id, trim(regexp_replace("
    "  CASE WHEN orig = 'nan' THEN '_' ELSE s END, "
    "  '\\s+', ' ', 'g')) AS name_clean FROM p3"
)

ORACLE_SQL["corpus_text_filter_ml"] = _ctf_ml_oracle_sql()

# text_readability: punctuation-probe injection + the same integer
# counts / single divisions — words via the shared ws split, sentences
# = [.!?]+ runs clamped to 1, syllables = [aeiouy]+ runs
ORACLE_SQL["text_readability"] = (
    "WITH inj AS (SELECT doc_id, text || "
    "  CASE WHEN doc_id % 2 = 0 "
    "  THEN ' First probe sentence. Second one! Third?' "
    "  ELSE '' END AS text FROM documents), "
    + _readability_counts_sql("inj", "n")
    + " SELECT doc_id, n_words, n_sentences, n_syllables, "
    f"{_FLESCH_SQL} AS flesch FROM n"
)

# text_dup_spans: k=8/stride=1 window hashes over the dupe corpus
# (stride 1 = the guaranteed-detection grid, see dup_span_stats);
# cross-doc test = MIN(doc) <> MAX(doc) per hash; decision table keeps
# every doc (zeros for sub-k docs) — mirrors dedup.dup_span_stats
ORACLE_SQL["text_dup_spans"] = (
    f"WITH {_DUPES}, "
    "tkx AS (SELECT doc_id, "
    "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
    "    t -> t <> '') AS tk FROM corpus), "
    "w AS (SELECT doc_id, "
    "  md5(array_to_string(tk[i+1 : i+8], ' ')) AS h "
    "  FROM tkx, UNNEST(generate_series(0, len(tk) - 8)) AS g(i) "
    "  WHERE len(tk) >= 8), "
    "crossh AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS is_dup "
    "  FROM w GROUP BY h), "
    "pd AS (SELECT w.doc_id, COUNT(*) AS n_windows, "
    "  SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_windows "
    "  FROM w JOIN crossh USING (h) GROUP BY w.doc_id) "
    "SELECT c.doc_id, "
    "CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows, "
    "CAST(COALESCE(n_dup_windows, 0) AS BIGINT) AS n_dup_windows, "
    "ROUND(CASE WHEN COALESCE(n_windows, 0) > 0 "
    "  THEN COALESCE(n_dup_windows, 0) / n_windows "
    "  ELSE 0.0 END, 6) AS dup_frac "
    "FROM corpus c LEFT JOIN pd USING (doc_id)"
)

# corpus_assemble: classifier keep (shared _classifier_ctes) ->
# mixture over the survivors (same sqrt-weight/threshold arithmetic
# as _MIXTURE_ORACLE_SQL, target 60) -> shard + pack (same window
# chain as corpus_pack_sequences, budget 50) — the corpus->loader
# capstone, every stage restated from the shared fragments
ORACLE_SQL["corpus_assemble"] = (
    f"WITH inj AS (SELECT doc_id, text || {_WS_NOISE_SQL} AS text, "
    "  source FROM documents), "
    + _classifier_ctes("inj")
    + ", kept AS (SELECT i.doc_id, i.source, i.text FROM inj i "
    "  JOIN sc USING (doc_id) WHERE sc.s >= 0.0), "
    "cnt AS (SELECT source, COUNT(*) AS n, "
    "  CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) "
    "  AS w FROM kept GROUP BY source), "
    "tw AS (SELECT SUM(w) AS tw FROM cnt), "
    "rates AS (SELECT source, "
    "  least(CAST(floor(3932160.0 * CAST(w AS DOUBLE) "
    "    / CAST(tw AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT), "
    "    65536) AS thr FROM cnt, tw), "
    "mixed AS (SELECT k.doc_id, k.text FROM kept k "
    "  JOIN rates r USING (source) WHERE r.thr >= 65536 "
    "  OR substr(md5(CAST(k.doc_id AS VARCHAR) || '|mx0'), 1, 4) "
    "     < printf('%04x', r.thr)), "
    "t AS (SELECT doc_id, "
    "  md5(CAST(doc_id AS VARCHAR) || '|sh0') AS dg, "
    "  CAST(len(list_filter(regexp_split_to_array(text, " + _WSRE2
    + "), x -> x <> '')) AS BIGINT) AS n FROM mixed), "
    "s2 AS (SELECT doc_id, dg, substr(dg, 1, 1) AS shard, n FROM t), "
    "c2 AS (SELECT doc_id, shard, n, SUM(n) OVER (PARTITION BY shard "
    "  ORDER BY dg ASC, doc_id ASC "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
    "  FROM s2) "
    "SELECT doc_id, shard, n AS n_tokens, "
    "CAST(cum - n AS BIGINT) AS start_tok, "
    "CAST(floor((cum - n) / 50) AS BIGINT) AS seq_first, "
    "CAST(CASE WHEN n > 0 THEN floor((cum - 1) / 50) "
    "  ELSE floor((cum - n) / 50) END AS BIGINT) AS seq_last FROM c2"
)

# corpus_pack_sequences: the shard_shuffle digest layout + a per-shard
# exact token cumsum with an EXPLICIT ROWS frame (the (dg, doc_id)
# order is unique, so RANGE==ROWS, but both engines state ROWS to kill
# any tie-frame ambiguity), then the seq_first/seq_last floor-division
# arithmetic of operators/sampling.py::pack_sequences (budget 100,
# 1-hex shards — the q_corpus_pack_sequences fixture params)
ORACLE_SQL["corpus_pack_sequences"] = (
    f"WITH inj AS (SELECT doc_id, text || {_WS_NOISE_SQL} AS text "
    "  FROM documents), "
    "t AS (SELECT doc_id, "
    "  md5(CAST(doc_id AS VARCHAR) || '|sh0') AS dg, "
    "  CAST(len(list_filter(regexp_split_to_array(text, " + _WSRE2
    + "), x -> x <> '')) AS BIGINT) AS n FROM inj), "
    "s AS (SELECT doc_id, dg, substr(dg, 1, 1) AS shard, n FROM t), "
    "c AS (SELECT doc_id, shard, n, SUM(n) OVER (PARTITION BY shard "
    "  ORDER BY dg ASC, doc_id ASC "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
    "  FROM s) "
    "SELECT doc_id, shard, n AS n_tokens, "
    "CAST(cum - n AS BIGINT) AS start_tok, "
    "CAST(floor((cum - n) / 100) AS BIGINT) AS seq_first, "
    "CAST(CASE WHEN n > 0 THEN floor((cum - 1) / 100) "
    "  ELSE floor((cum - n) / 100) END AS BIGINT) AS seq_last FROM c"
)

# corpus_span_ladder: BOTH dup_span_stats window chains restated — the
# exact k=8/stride=1 pass (as text_dup_spans) plus the grid-aligned
# k=16/stride=4 long-boilerplate pass (generate_series step = stride,
# window slice widened to 16) — joined per doc with the composed keep
ORACLE_SQL["corpus_span_ladder"] = (
    f"WITH {_DUPES}, "
    "tkx AS (SELECT doc_id, "
    "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
    "    t -> t <> '') AS tk FROM corpus), "
    "w8 AS (SELECT doc_id, "
    "  md5(array_to_string(tk[i+1 : i+8], ' ')) AS h "
    "  FROM tkx, UNNEST(generate_series(0, len(tk) - 8)) AS g(i) "
    "  WHERE len(tk) >= 8), "
    "c8 AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS is_dup "
    "  FROM w8 GROUP BY h), "
    "p8 AS (SELECT w8.doc_id, COUNT(*) AS nw, "
    "  SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS nd "
    "  FROM w8 JOIN c8 USING (h) GROUP BY w8.doc_id), "
    "w16 AS (SELECT doc_id, "
    "  md5(array_to_string(tk[i+1 : i+16], ' ')) AS h "
    "  FROM tkx, UNNEST(generate_series(0, len(tk) - 16, 4)) AS g(i) "
    "  WHERE len(tk) >= 16), "
    "c16 AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS is_dup "
    "  FROM w16 GROUP BY h), "
    "p16 AS (SELECT w16.doc_id, COUNT(*) AS nw, "
    "  SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS nd "
    "  FROM w16 JOIN c16 USING (h) GROUP BY w16.doc_id), "
    "base AS (SELECT c.doc_id, "
    "  ROUND(CASE WHEN COALESCE(p8.nw, 0) > 0 "
    "    THEN COALESCE(p8.nd, 0) / p8.nw ELSE 0.0 END, 6) AS short_frac, "
    "  ROUND(CASE WHEN COALESCE(p16.nw, 0) > 0 "
    "    THEN COALESCE(p16.nd, 0) / p16.nw ELSE 0.0 END, 6) AS long_frac, "
    "  CAST(COALESCE(p16.nd, 0) AS BIGINT) AS n_long_dup "
    "  FROM corpus c LEFT JOIN p8 USING (doc_id) "
    "  LEFT JOIN p16 USING (doc_id)) "
    "SELECT doc_id, short_frac, long_frac, n_long_dup, "
    "(short_frac < 0.5 AND n_long_dup = 0) AS keep FROM base"
)

# text_dup_excise: the same window-hash build as text_dup_spans, then
# per-hash ownership (min doc_id), covered-position cut for non-owners,
# and an ordered string_agg reconstruction of the residual tokens
ORACLE_SQL["text_dup_excise"] = (
    f"WITH {_DUPES}, "
    "tkx AS (SELECT doc_id, "
    "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
    "    t -> t <> '') AS tk FROM corpus), "
    "w AS (SELECT doc_id, g.i AS i, "
    "  md5(array_to_string(tk[g.i+1 : g.i+8], ' ')) AS h "
    "  FROM tkx, UNNEST(generate_series(0, len(tk) - 8)) AS g(i) "
    "  WHERE len(tk) >= 8), "
    "own AS (SELECT h, MIN(doc_id) AS owner, "
    "  MIN(doc_id) <> MAX(doc_id) AS is_dup FROM w GROUP BY h), "
    "cut AS (SELECT DISTINCT w.doc_id, p.p "
    "  FROM w JOIN own USING (h), "
    "  UNNEST(generate_series(w.i, w.i + 7)) AS p(p) "
    "  WHERE own.is_dup AND w.doc_id <> own.owner), "
    "tp AS (SELECT doc_id, g.p AS p, tk[g.p+1] AS tok "
    "  FROM tkx, UNNEST(generate_series(0, len(tk) - 1)) AS g(p) "
    "  WHERE len(tk) > 0), "
    "kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp "
    "  ANTI JOIN cut ON tp.doc_id = cut.doc_id AND tp.p = cut.p), "
    "agg AS (SELECT doc_id, "
    "  string_agg(tok, ' ' ORDER BY p) AS text_excised, "
    "  COUNT(*) AS n_kept FROM kept GROUP BY doc_id) "
    "SELECT tkx.doc_id, "
    "COALESCE(agg.text_excised, '') AS text_excised, "
    "CAST(len(tkx.tk) AS BIGINT) AS n_tokens, "
    "CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept, "
    "CAST(len(tkx.tk) - COALESCE(agg.n_kept, 0) AS BIGINT) "
    "  AS n_excised "
    "FROM tkx LEFT JOIN agg USING (doc_id)"
)

# d2_family_fallback: page-0 marker wins; unmarked + family token ->
# the catch-all type; unmarked without the token -> NULL (mirrors the
# classify coalesce order route > page-0 > family fallback)
ORACLE_SQL["d2_family_fallback"] = (
    "WITH pages AS (SELECT DISTINCT "
    "  'u' || CAST(c_custkey % 60 AS VARCHAR) AS url, "
    "  c_custkey % 3 AS t3, (c_custkey % 60) % 2 AS par "
    "  FROM customer WHERE c_custkey < 180) "
    "SELECT url, CASE WHEN t3 = 0 THEN 'keyword_scan_en' "
    "  WHEN par = 0 THEN 'keyword_scan_en_t3' END AS doc_class "
    "FROM pages"
)

# events_stream_window: batch restatement of the streaming windowed agg
# INCLUDING the append-mode emission rule (windows whose end <= final
# watermark = max event time - 10 minutes)
# events_slide_window: every event belongs to exactly window/slide = 4
# hopping windows; starts = (floor-slot - i) * slide for i in 0..3 in
# integer microseconds (the same epoch alignment Spark's F.window
# uses), value summed as DECIMAL(18,2) cast to double once.
ORACLE_SQL["events_slide_window"] = (
    "WITH e AS (SELECT epoch_us(ts) AS t, event_type, value "
    "  FROM events), "
    "w AS (SELECT ((t // 900000000) - g.i) * 900000000 AS s, "
    "  event_type, value FROM e, "
    "  UNNEST(generate_series(0, 3)) AS g(i)) "
    "SELECT make_timestamp(s) AS win_start, "
    "  make_timestamp(s + 3600000000) AS win_end, event_type, "
    "  COUNT(*) AS n_events, "
    "  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM w GROUP BY s, event_type"
)

ORACLE_SQL["events_stream_window"] = (
    "WITH mx AS (SELECT max(ts) AS m FROM events), "
    "w AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, "
    "  event_type, COUNT(*) AS n_events, "
    "  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "  FROM events GROUP BY 1, 2) "
    "SELECT win_start, win_start + INTERVAL '5 minutes' AS win_end, "
    "  event_type, n_events, sum_value "
    "FROM w, mx "
    "WHERE win_start + INTERVAL '5 minutes' <= m - INTERVAL '10 minutes'"
)

ORACLE_SQL["pipeline_oracle"] = _pipeline_oracle_sql()

ORACLE_SQL["d1_manifest_routing"] = (
    "WITH pages AS (SELECT DISTINCT "
    "  'u' || CAST(c_custkey % 60 AS VARCHAR) AS url, "
    "  c_custkey % 3 AS t3 FROM customer WHERE c_custkey < 180), "
    "routes AS (SELECT 'u' || CAST(c_custkey % 60 AS VARCHAR) AS url, "
    "  'manifest_grid_fr' AS rc FROM customer "
    "  WHERE c_custkey < 300 AND c_custkey % 5 = 0 GROUP BY 1, 2) "
    "SELECT p.url, COALESCE(r.rc, "
    "  CASE p.t3 WHEN 0 THEN 'toc_grid_fr' WHEN 1 THEN 'keyword_scan_en' "
    "  ELSE 'keyword_scan_en_t2' END) AS doc_class "
    "FROM pages p LEFT JOIN routes r ON p.url = r.url"
)


def _dsir_oracle_sql() -> str:
    """corpus_dsir_sample oracle — the shared _ngram_feat_ctes feature
    chain, the DSIR_LOG_RATIOS bucket CASE (regenerated from the same
    dict as the engine's literal map), the UNROUNDED logw feeding the
    Gumbel key, and the identical (BIGINT+1.0)/65537.0 uniform."""
    from .operators.sampling import DSIR_LOG_RATIOS

    case = _hash_bucket_case(DSIR_LOG_RATIOS)
    u = (
        "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|dsir0')"
        ", 1, 4)) AS BIGINT) + 1.0) / 65537.0"
    )
    return (
        f"WITH inj AS (SELECT doc_id, text || {_WS_NOISE_SQL} AS text "
        "  FROM documents), "
        + _ngram_feat_ctes("inj")
        + ", lw AS (SELECT doc_id, nf, list_reduce(list_prepend(0.0, "
        f"  list_transform(feats, w -> {case})), (p, q) -> p + q) "
        "  AS logw FROM ft) "
        "SELECT doc_id, CAST(nf AS BIGINT) AS n_features, "
        "ROUND(logw, 6) AS log_weight, "
        f"ROUND(logw - ln(-ln({u})), 6) AS sample_key "
        "FROM lw ORDER BY sample_key DESC, doc_id LIMIT 100"
    )


ORACLE_SQL["corpus_dsir_sample"] = _dsir_oracle_sql()


def _bigram_oracle_sql() -> str:
    """text_bigram_lm oracle — both lookup CASEs regenerated from the
    same BIGRAM_LOGPROBS / UNIGRAM_LOGPROBS dicts; the first-term +
    ordered-left-fold addition order mirrors the engine's
    first + aggregate(pairs) exactly."""
    from .operators.text import BIGRAM_BACKOFF, BIGRAM_LOGPROBS

    bi_items = sorted(BIGRAM_LOGPROBS.items())
    bi_arms = " ".join(
        f"WHEN '{b}' THEN CAST({lp!r} AS DOUBLE)" for b, lp in bi_items
    )
    bi_keys = ", ".join(f"'{b}'" for b, _ in bi_items)
    backoff = f"CAST({float(BIGRAM_BACKOFF)!r} AS DOUBLE)"
    uni_first, _ = _unigram_fold_parts("tk[1]")
    uni_next, _ = _unigram_fold_parts("tk[i]")
    probe = (
        "CASE doc_id % 4 WHEN 0 THEN ' of the to be' "
        "WHEN 1 THEN ' Of The unseenword' "
        "WHEN 2 THEN ' the of' ELSE '' END"
    )
    term = (
        f"CASE tk[i-1] || ' ' || tk[i] {bi_arms} "
        f"ELSE {backoff} + {uni_next} END"
    )
    return (
        f"WITH inj AS (SELECT doc_id, text || {probe} AS text "
        "  FROM documents), "
        "tks AS (SELECT doc_id, list_transform(list_filter("
        "  regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
        "  w -> lower(w)) AS tk FROM inj), "
        "tm AS (SELECT doc_id, tk, "
        "  CASE WHEN len(tk) >= 2 THEN list_transform("
        f"    generate_series(2, len(tk)), i -> {term}) "
        "  ELSE CAST([] AS DOUBLE[]) END AS terms, "
        "  CASE WHEN len(tk) >= 2 THEN len(list_filter("
        "    generate_series(2, len(tk)), "
        f"    i -> (tk[i-1] || ' ' || tk[i]) IN ({bi_keys}))) "
        "  ELSE 0 END AS hits FROM tks) "
        "SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, "
        "CAST(hits AS BIGINT) AS n_bigram_hits, "
        f"CASE WHEN len(tk) > 0 THEN ROUND(({uni_first} + "
        "list_reduce(list_prepend(0.0, terms), (p, q) -> p + q)) "
        "/ len(tk), 6) ELSE 0.0 END AS avg_logprob FROM tm"
    )


ORACLE_SQL["text_bigram_lm"] = _bigram_oracle_sql()


# dedup_winnow: the same dupe corpus; window-hash keys encoded
# md5 || lpad(10^9 - pos, 10) so string MIN = (min hash, rightmost
# pos) — Schleimer et al.'s tie rule — in one comparison; selection =
# per-position min over w consecutive window keys (slice clipping at
# the end mirrors Spark's slice), distinct, then the dup_span_stats
# cross test keyed by the 32-hex hash prefix.
ORACLE_SQL["dedup_winnow"] = (
    f"WITH {_DUPES}, "
    "tkx AS (SELECT doc_id, "
    "  list_filter(regexp_split_to_array(text, " + _WSRE2 + "), "
    "    t -> t <> '') AS tk FROM corpus), "
    "wins AS (SELECT doc_id, CASE WHEN len(tk) >= 5 THEN "
    "  list_transform(generate_series(1, len(tk) - 4), i -> "
    "    md5(array_to_string(tk[i : i+4], ' ')) || "
    "    lpad(CAST(1000000000 - i AS VARCHAR), 10, '0')) "
    "  ELSE CAST([] AS VARCHAR[]) END AS ws FROM tkx), "
    "sel AS (SELECT doc_id, list_distinct(list_transform("
    "  generate_series(1, greatest(len(ws) - 3, 1)), "
    "  j -> list_aggregate(ws[j : j+3], 'min'))) AS fps "
    "  FROM wins WHERE len(ws) >= 1), "
    "fp AS (SELECT doc_id, substr(UNNEST(fps), 1, 32) AS h FROM sel), "
    "crossh AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS is_shared "
    "  FROM fp GROUP BY h), "
    "pd AS (SELECT fp.doc_id, COUNT(*) AS n_fingerprints, "
    "  SUM(CASE WHEN is_shared THEN 1 ELSE 0 END) AS n_shared_fp "
    "  FROM fp JOIN crossh USING (h) GROUP BY fp.doc_id) "
    "SELECT c.doc_id, "
    "CAST(COALESCE(n_fingerprints, 0) AS BIGINT) AS n_fingerprints, "
    "CAST(COALESCE(n_shared_fp, 0) AS BIGINT) AS n_shared_fp, "
    "ROUND(CASE WHEN COALESCE(n_fingerprints, 0) > 0 "
    "  THEN COALESCE(n_shared_fp, 0) / n_fingerprints "
    "  ELSE 0.0 END, 6) AS shared_frac "
    "FROM corpus c LEFT JOIN pd USING (doc_id)"
)


def _quality_ensemble_oracle_sql() -> str:
    """corpus_quality_ensemble oracle — the shared classifier chain
    (tks/big/ft/sc), the unigram fold over the SAME lowered-token CTE,
    the readability formula of the text_readability oracle, and the
    identical median thresholds over the ROUNDED scores."""
    uni_case, _ = _unigram_fold_parts()
    probe = (
        "CASE doc_id % 4 WHEN 0 THEN ' the of and to. it is!' "
        "WHEN 1 THEN ' The WAS unseenword?' "
        "WHEN 2 THEN ' is.' ELSE '' END"
    )
    return (
        f"WITH inj AS (SELECT doc_id, text || {probe} AS text "
        "  FROM documents), "
        + _classifier_ctes("inj")
        + ", lm AS (SELECT doc_id, CASE WHEN len(tk) > 0 THEN "
        "  ROUND(list_reduce(list_prepend(0.0, "
        f"  list_transform(tk, w -> {uni_case})), (p, q) -> p + q) "
        "  / len(tk), 6) ELSE 0.0 END AS lm_logprob FROM tks), "
        + _readability_counts_sql("inj", "rd") + ", "
        f"rf AS (SELECT doc_id, {_FLESCH_SQL} AS flesch FROM rd), "
        "j AS (SELECT sc.doc_id, ROUND(sc.s, 6) AS clf_score, "
        "  lm.lm_logprob, rf.flesch FROM sc "
        "  JOIN lm ON lm.doc_id = sc.doc_id "
        "  JOIN rf ON rf.doc_id = sc.doc_id), "
        "v AS (SELECT *, "
        "  (CASE WHEN clf_score >= -0.025 THEN 1 ELSE 0 END) + "
        "  (CASE WHEN lm_logprob >= -6.5 THEN 1 ELSE 0 END) + "
        "  (CASE WHEN flesch >= 35.0 THEN 1 ELSE 0 END) AS np FROM j) "
        "SELECT doc_id, clf_score, lm_logprob, flesch, "
        "CAST(np AS BIGINT) AS n_pass, np >= 2 AS keep FROM v"
    )


ORACLE_SQL["corpus_quality_ensemble"] = _quality_ensemble_oracle_sql()


# corpus_drift: two add-one-smoothed wordcounts (ref = ws-noise corpus;
# new = 20% dropped + spam burst on every 3rd doc), FULL OUTER join on
# the token key, identical (n+1.0)/(T+1.0) ratio operand order, top-40
# by (ROUND(|ln ratio|) DESC, token).
ORACLE_SQL["corpus_drift"] = (
    "WITH wsbase AS (SELECT doc_id, "
    f"text || {_WS_NOISE_SQL} AS text FROM documents), "
    "newb AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 "
    "  THEN ' driftspam driftspam buynow' ELSE '' END AS text "
    "  FROM wsbase WHERE doc_id % 5 <> 0), "
    "tkr AS (SELECT lower(UNNEST(list_filter(regexp_split_to_array("
    "  text, " + _WSRE2 + "), t -> t <> ''))) AS token FROM wsbase), "
    "tkn AS (SELECT lower(UNNEST(list_filter(regexp_split_to_array("
    "  text, " + _WSRE2 + "), t -> t <> ''))) AS token FROM newb), "
    "cr AS (SELECT token, COUNT(*) AS n_ref FROM tkr GROUP BY token), "
    "cn AS (SELECT token, COUNT(*) AS n_new FROM tkn GROUP BY token), "
    "tr AS (SELECT COALESCE(SUM(n_ref), 0) AS t_ref FROM cr), "
    "tn AS (SELECT COALESCE(SUM(n_new), 0) AS t_new FROM cn), "
    "j AS (SELECT COALESCE(cr.token, cn.token) AS token, "
    "  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_new, 0) AS n_new "
    "  FROM cr FULL OUTER JOIN cn ON cn.token = cr.token), "
    "f AS (SELECT j.*, t_ref, t_new FROM j CROSS JOIN tr CROSS JOIN tn "
    "  WHERE n_ref + n_new >= 3) "
    "SELECT token, n_ref, n_new, "
    "ROUND(LN(((n_new + 1.0) / (t_new + 1.0)) / "
    "  ((n_ref + 1.0) / (t_ref + 1.0))), 6) AS log_ratio, "
    "ROUND(ABS(LN(((n_new + 1.0) / (t_new + 1.0)) / "
    "  ((n_ref + 1.0) / (t_ref + 1.0)))), 6) AS drift "
    "FROM f ORDER BY drift DESC, token LIMIT 40"
)


# media_chunk_dedup: blobs synthesized as encode(header || text) over
# the dupe corpus; chunks on the hex grid (128 hex chars = 64 bytes,
# hex() uppercase in both engines), md5 per chunk VARCHAR, the
# dup_span_stats cross test, decision-table left join with byte sizes.
# media_cdc_dedup: same synthesized blobs + the 1-byte-shift copies;
# boundary rule restated (trailing 8-byte window md5 first hex '0'),
# segment hashes over COALESCE(prev-end, 0), shared tail identical.
_HTML_PAGE_SQL = (
    "'<html><head><script>var a=1;</script></head><body>"
    '<nav><a href="/">Home</a> <a href="/x">About</a></nav><p>\' '
    "|| substr(text, 1, 120) || ' body paragraph tail &amp; "
    "more.</p>' || "
    "(CASE doc_id % 3 WHEN 0 THEN '<div>short</div>' "
    "WHEN 1 THEN '<p>' || substr(text, 121, 100) || "
    "' second paragraph continues with more visible words.</p>' "
    "ELSE '<footer><a href=\"/t\">All rights reserved terms "
    "privacy</a></footer>' END) || '</body></html>'"
)


def _html_main_ctes(
    page_sql: str, ctx: bool = False, src: str = "documents"
) -> str:
    """The strip/split/score/reconstruct CTE chain over a page
    expression (regenerated from the SAME regex + entity constants the
    engine uses, operators/html.py — one site to edit), ending in
    ``mc(doc_id, main_text, n_blocks, n_good, link_frac)``.  Shared by
    the html_main_content, html_main_content_ctx (``ctx=True`` adds
    the jusText context-promotion rule via IGNORE-NULLS windows),
    corpus_web_extract, and corpus_warc_extract (``src`` points the
    page expression at an upstream CTE instead of documents) oracles."""
    from .operators.html import (
        ANCHOR_TEXT_RE,
        BLOCK_SPLIT_RE,
        COMMENT_RE,
        HTML_ENTITIES,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
    )

    def btxt(x: str) -> str:
        t = f"regexp_replace({x}, '{TAG_RE}', ' ', 'g')"
        for ent, ch in HTML_ENTITIES:
            t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
        return f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"

    alen = (
        "list_reduce(list_prepend(0, list_transform("
        f"regexp_extract_all(raw, '{ANCHOR_TEXT_RE}', 1), "
        f"a -> length({btxt('a')}))), (p, q) -> p + q)"
    )
    return (
        f"d AS (SELECT doc_id, {page_sql} AS h FROM {src}), "
        "s AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS t "
        "FROM d), "
        "bl AS (SELECT doc_id, "
        f"regexp_split_to_array(t, '{BLOCK_SPLIT_RE}') AS b FROM s), "
        "rws AS (SELECT doc_id, i AS pos, b[i] AS raw FROM bl, "
        "UNNEST(generate_series(1, len(b))) AS g(i)), "
        f"tx AS (SELECT doc_id, pos, {btxt('raw')} AS txt, "
        f"{alen} AS alen FROM rws), "
        + (
            "fl0 AS (SELECT *, CASE WHEN length(txt) >= 40 AND "
            "alen <= length(txt) * 0.3 THEN 1 "
            "WHEN alen <= length(txt) * 0.3 THEN 2 ELSE 0 END AS lab "
            "FROM tx WHERE txt <> ''), "
            "fl AS (SELECT *, (lab = 1 OR (lab = 2 AND "
            "COALESCE(last_value(CASE WHEN lab <> 2 THEN lab END "
            "IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1) "
            "= 1 AND "
            "COALESCE(first_value(CASE WHEN lab <> 2 THEN lab END "
            "IGNORE NULLS) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 1) "
            "= 1)) AS good FROM fl0), "
            if ctx
            else "fl AS (SELECT *, (length(txt) >= 40 AND "
            "alen <= length(txt) * 0.3) AS good FROM tx "
            "WHERE txt <> ''), "
        )
        + 
        "ag AS (SELECT doc_id, COALESCE(string_agg("
        "CASE WHEN good THEN txt END, chr(10) || chr(10) "
        "ORDER BY pos), '') AS main_text, "
        "COUNT(*) AS n_blocks, "
        "SUM(CASE WHEN good THEN 1 ELSE 0 END) AS n_good, "
        "SUM(length(txt)) AS tl, SUM(alen) AS ta "
        "FROM fl GROUP BY doc_id), "
        "mc AS (SELECT d.doc_id, "
        "COALESCE(ag.main_text, '') AS main_text, "
        "CAST(COALESCE(ag.n_blocks, 0) AS BIGINT) AS n_blocks, "
        "CAST(COALESCE(ag.n_good, 0) AS BIGINT) AS n_good, "
        "CASE WHEN COALESCE(ag.tl, 0) > 0 THEN "
        "ROUND(ag.ta / CAST(ag.tl AS DOUBLE), 6) END AS link_frac "
        "FROM d LEFT JOIN ag ON ag.doc_id = d.doc_id)"
    )


def _html_main_oracle_sql() -> str:
    return (
        f"WITH {_html_main_ctes(_HTML_PAGE_SQL)} "
        "SELECT doc_id, main_text, n_blocks, n_good, link_frac FROM mc"
    )


def _html_outline_oracle_sql() -> str:
    """html_outline oracle — same HEADING_RE two-group extraction
    zipped by index, same block-text cleanup chain, regenerated from
    the engine's constants."""
    from .operators.html import (
        HEADING_RE,
        HTML_ENTITIES,
        TAG_RE,
        WS_RUN_RE,
    )

    t = f"regexp_replace(tx[i], '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    clean = f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"
    from .operators.html import COMMENT_RE, SCRIPT_RE, STYLE_RE

    return (
        "WITH d0 AS (SELECT doc_id, '<h1>' || substr(text, 1, 30) || "
        "'</h1><p>body</p><h2>Sec &amp; ' || "
        "CAST(doc_id % 5 AS VARCHAR) || '</h2>' || "
        "(CASE doc_id % 4 WHEN 0 THEN "
        "'<h3 class=\"x\">Deep ' || CAST(doc_id % 9 AS VARCHAR) "
        "|| '</h3>' "
        "WHEN 1 THEN '<h4>   </h4>' "
        "WHEN 2 THEN '<h2>Nested <b>bold</b> heading</h2>' "
        "ELSE '' END) AS h FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0), "
        "x AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{HEADING_RE}', 1) AS lv, "
        f"regexp_extract_all(h, '{HEADING_RE}', 2) AS tx FROM d) "
        "SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, "
        "CAST(lv[i] AS INTEGER) AS level, "
        f"{clean} AS heading "
        "FROM x, UNNEST(generate_series(1, len(lv))) AS g(i)"
    )


def _web_extract_oracle_sql() -> str:
    """corpus_web_extract oracle — the shared _html_main_ctes chain
    (page synth with the %11 U+FFFD probe spliced into the kept body
    paragraph), _classifier_ctes over the EXTRACTED text, and the full
    script-mix suspect rule."""
    probe_target = "' body paragraph tail &amp; more.</p>'"
    assert probe_target in _HTML_PAGE_SQL, "page synth drifted"
    page = _HTML_PAGE_SQL.replace(
        probe_target,
        "(CASE WHEN doc_id % 11 = 5 THEN "
        "' body paragraph tail &amp; ' || chr(65533) || ' more.</p>' "
        "ELSE ' body paragraph tail &amp; more.</p>' END)",
    )
    mt = "mc.main_text"
    na = (
        f"length({mt}) - length(regexp_replace({mt}, "
        "'[^\\x00-\\x7f]', '', 'g'))"
    )
    return (
        f"WITH {_html_main_ctes(page)}, "
        "wt AS (SELECT doc_id, main_text AS text FROM mc), "
        + _classifier_ctes("wt")
        + ", fin AS (SELECT mc.doc_id, mc.n_good, mc.link_frac, "
        "ROUND(sc.s, 6) AS score, md5(mc.main_text) AS text_digest, "
        f"(length({mt}) > 0 AND ("
        f"length({mt}) - length(replace({mt}, chr(65533), '')) > 0 "
        f"OR length({mt}) - length(regexp_replace({mt}, "
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) > 0 "
        "OR COALESCE(CASE WHEN length(" + mt + ") > 0 THEN "
        f"ROUND(({na}) / CAST(length({mt}) AS DOUBLE), 6) END, 0.0) "
        "> 0.3)) AS suspect "
        "FROM mc JOIN sc ON sc.doc_id = mc.doc_id) "
        "SELECT doc_id, n_good, link_frac, score, suspect, "
        "(n_good > 0 AND score >= 0.0 AND NOT suspect) AS keep, "
        "text_digest FROM fin"
    )


ORACLE_SQL["corpus_web_extract"] = _web_extract_oracle_sql()

_LINK_PAGE_SQL = (
    "'<a href=\"https://site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com/p/' || CAST(doc_id AS VARCHAR) || '\">Link &amp; ' || "
    "CAST(doc_id % 5 AS VARCHAR) || "
    "'</a><a href=\"/rel/' || CAST(doc_id % 3 AS VARCHAR) || "
    "'\">Rel</a>' || "
    "(CASE doc_id % 4 "
    "WHEN 0 THEN '<!-- <a href=\"https://no.com\">hidden</a> -->' "
    "WHEN 1 THEN '<a name=\"x\">no href</a>' "
    "WHEN 2 THEN '<a href=\"https://www.Ext.org/q\">Www link</a>' "
    "ELSE '' END)"
)


def _html_links_oracle_sql() -> str:
    """html_links oracle — strip passes + the two-group LINK_RE
    extraction zipped by index + the shared anchor cleanup, all
    regenerated from the engine constants."""
    from .operators.html import (
        COMMENT_RE,
        HTML_ENTITIES,
        LINK_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
    )

    link_re = LINK_RE.replace(chr(39), chr(39) * 2)
    t = f"regexp_replace(tx[i], '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    clean = f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"
    return (
        f"WITH d0 AS (SELECT doc_id, {_LINK_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0), "
        "x AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{link_re}', 1) AS hr, "
        f"regexp_extract_all(h, '{link_re}', 2) AS tx FROM d) "
        "SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, "
        "hr[i] AS href, "
        f"{clean} AS anchor "
        "FROM x, UNNEST(generate_series(1, len(hr))) AS g(i)"
    )


ORACLE_SQL["html_links"] = _html_links_oracle_sql()


# the DuckDB restatement of _table_fixture_page() — edit BOTH
_TABLE_PAGE_SQL = (
    "'<p>pre</p><TABLE border=\"1\">' || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<thead><tr><th>Name</th><th CLASS=\"v\">Val &amp; Co</th>"
    "</tr></thead>' ELSE '' END) || "
    "'<tr><td>A' || CAST(doc_id % 10 AS VARCHAR) || '</td><td>' || "
    "CAST(doc_id % 100 AS VARCHAR) || '</td></tr>' || "
    "(CASE doc_id % 3 "
    "WHEN 0 THEN '<tr class=\"alt\"><td>B' || "
    "CAST(doc_id % 5 AS VARCHAR) || '</td><td></td></tr>' "
    "WHEN 1 THEN '<tr><td' || chr(10) || '>B' || "
    "CAST(doc_id % 5 AS VARCHAR) || '</td></tr>' "
    "ELSE '<tr> </tr>' END) || "
    "'</TABLE>' || "
    "(CASE WHEN doc_id % 5 = 0 THEN '<table id=\"t2\"><tr><td>T2-' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '</td></tr></table>' "
    "ELSE '' END) || "
    "'<!-- <table><tr><td>ghost</td></tr></table> -->"
    "<track src=\"x\">"
    "<script>var t = \"<table><tr><td>js</td></tr></table>\";"
    "</script>'"
)


def _html_tables_oracle_sql() -> str:
    """html_tables oracle — the strip passes + the THREE-level
    extract_all chain (table body -> tr -> td|th with the tag-letter
    and content groups zipped by index), all regenerated from the
    engine's regex constants; 0-based positions BIGINT-cast at every
    level (the driver-hash casting rule)."""
    from .operators.html import (
        CELL_RE,
        COMMENT_RE,
        HTML_ENTITIES,
        SCRIPT_RE,
        STYLE_RE,
        TABLE_RE,
        TAG_RE,
        TR_RE,
        WS_RUN_RE,
    )

    t = f"regexp_replace(cx[ci], '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    clean = f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"
    return (
        f"WITH d0 AS (SELECT doc_id, {_TABLE_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0), "
        "t AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{TABLE_RE}', 1) AS tbs FROM d), "
        "tb AS (SELECT doc_id, CAST(ti - 1 AS BIGINT) AS table_no, "
        "tbs[ti] AS body FROM t, "
        "UNNEST(generate_series(1, len(tbs))) AS g1(ti)), "
        "r AS (SELECT doc_id, table_no, "
        f"regexp_extract_all(body, '{TR_RE}', 1) AS rws FROM tb), "
        "rw AS (SELECT doc_id, table_no, "
        "CAST(ri - 1 AS BIGINT) AS row_no, rws[ri] AS raw FROM r, "
        "UNNEST(generate_series(1, len(rws))) AS g2(ri)), "
        "c AS (SELECT doc_id, table_no, row_no, "
        f"regexp_extract_all(raw, '{CELL_RE}', 1) AS tg, "
        f"regexp_extract_all(raw, '{CELL_RE}', 2) AS cx FROM rw) "
        "SELECT doc_id, table_no, row_no, "
        "CAST(ci - 1 AS BIGINT) AS col_no, "
        "lower(tg[ci]) = 'h' AS is_header, "
        f"{clean} AS cell "
        "FROM c, UNNEST(generate_series(1, len(cx))) AS g3(ci)"
    )


ORACLE_SQL["html_tables"] = _html_tables_oracle_sql()


_LIST_PAGE_SQL = (
    "'<p>pre</p><UL class=\"menu\"><li>First &amp; ' || "
    "CAST(doc_id % 7 AS VARCHAR) || "
    "'</li><li CLASS=\"x\">Second ' || "
    "CAST(doc_id % 10 AS VARCHAR) || '</li>' || "
    "(CASE doc_id % 3 WHEN 0 THEN '<li' || chr(10) || '>Ws ' || "
    "CAST(doc_id % 5 AS VARCHAR) || '</li>' "
    "WHEN 1 THEN '<li></li>' ELSE '<li>dropped no close' END) || "
    "'</UL>' || "
    "(CASE WHEN doc_id % 2 = 0 THEN '<OL start=\"3\"><li>Step ' || "
    "CAST(doc_id % 5 AS VARCHAR) || '</li><li>Step b</li></OL>' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<ul><li>outer</li><ol><li>inner</li></ol></ul>' ELSE '' END) || "
    "'<!-- <ul><li>ghost</li></ul> --><link href=\"x\">"
    "<script>var l = \"<ol><li>js</li></ol>\";</script>'"
)


def _html_lists_oracle_sql() -> str:
    """html_lists oracle — the strip passes + the TWO-level extract_all
    chain (list kind/body groups zipped by index -> li items), all
    regenerated from the engine's regex constants; 0-based positions
    BIGINT-cast at every level (the driver-hash casting rule)."""
    from .operators.html import (
        COMMENT_RE,
        HTML_ENTITIES,
        LI_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        UL_OL_RE,
        WS_RUN_RE,
    )

    t = f"regexp_replace(its[ii], '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    clean = f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"
    return (
        f"WITH d0 AS (SELECT doc_id, {_LIST_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0), "
        "t AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{UL_OL_RE}', 1) AS tg, "
        f"regexp_extract_all(h, '{UL_OL_RE}', 2) AS bd FROM d), "
        "l AS (SELECT doc_id, CAST(li - 1 AS BIGINT) AS list_no, "
        "lower(tg[li]) = 'o' AS ordered, bd[li] AS raw FROM t, "
        "UNNEST(generate_series(1, len(bd))) AS g1(li)), "
        "c AS (SELECT doc_id, list_no, ordered, "
        f"regexp_extract_all(raw, '{LI_RE}', 1) AS its FROM l) "
        "SELECT doc_id, list_no, ordered, "
        "CAST(ii - 1 AS BIGINT) AS item_no, "
        f"{clean} AS item "
        "FROM c, UNNEST(generate_series(1, len(its))) AS g2(ii)"
    )


ORACLE_SQL["html_lists"] = _html_lists_oracle_sql()


_SITEMAP_PAGE_SQL = (
    "'<?xml version=\"1.0\"?><urlset><url><loc> https://www.Site' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.com/page/' || "
    "CAST(doc_id % 50 AS VARCHAR) || '?a=1&amp;b=2 </loc>' || "
    "(CASE WHEN doc_id % 2 = 0 THEN '<lastmod>2024-0' || "
    "CAST(doc_id % 9 + 1 AS VARCHAR) || '-11</lastmod>' "
    "ELSE '' END) || "
    "'</url><URL rel=\"x\"><loc>' || "
    "(CASE WHEN doc_id % 11 = 0 THEN 'junk loc' "
    "ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com/two/' || CAST(doc_id % 10 AS VARCHAR) END) || "
    "'</loc></URL>' || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<url><priority>0.5</priority></url>' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<sitemap><loc>https://site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com/sitemaps/s' || CAST(doc_id % 4 AS VARCHAR) || "
    "'.xml</loc></sitemap>' ELSE '' END) || "
    "'<!-- <url><loc>https://ghost.example/</loc></url> --></urlset>'"
)


def _corpus_sitemap_oracle_sql() -> str:
    """corpus_sitemap oracle — the comment strip + block extract_all
    (kind/body groups zipped by index) -> per-block first loc/lastmod,
    all regenerated from the engine's regex constants; host restated
    generically as lower(scheme://AUTHORITY) with the leading-www
    strip ('' -> NULL mirrors try_parse_url's junk contract for every
    fixture arm)."""
    from .operators.html import COMMENT_RE, HTML_ENTITIES
    from .operators.urls import LASTMOD_RE, LOC_RE, SITEMAP_BLOCK_RE

    t = "lr"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(loc, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), '')"
    )
    return (
        f"WITH d0 AS (SELECT doc_id, {_SITEMAP_PAGE_SQL} AS x "
        "FROM documents), "
        "d AS (SELECT doc_id, "
        f"regexp_replace(x, '{COMMENT_RE}', ' ', 'g') AS x FROM d0), "
        "t AS (SELECT doc_id, "
        f"regexp_extract_all(x, '{SITEMAP_BLOCK_RE}', 1) AS kd, "
        f"regexp_extract_all(x, '{SITEMAP_BLOCK_RE}', 2) AS bd "
        "FROM d), "
        "e AS (SELECT doc_id, CAST(ei - 1 AS BIGINT) AS entry_no, "
        "lower(kd[ei]) = 'sitemap' AS is_index, "
        f"regexp_extract(bd[ei], '{LOC_RE}', 1) AS lr, "
        f"regexp_extract(bd[ei], '{LASTMOD_RE}', 1) AS lm FROM t, "
        "UNNEST(generate_series(1, len(bd))) AS g(ei)), "
        f"c AS (SELECT doc_id, entry_no, is_index, trim({t}) AS loc, "
        "NULLIF(trim(lm), '') AS lastmod FROM e) "
        "SELECT doc_id, entry_no, is_index, loc, lastmod, "
        f"{host} AS host FROM c WHERE loc <> ''"
    )


ORACLE_SQL["corpus_sitemap"] = _corpus_sitemap_oracle_sql()


_JSONLD_PAGE_SQL = (
    "'<head><script>var a = 1;</script>"
    "<script async type=\"application/ld+json\">"
    "{\"@type\": \"Article\", \"name\": ' || "
    "(CASE WHEN doc_id % 7 = 0 THEN '{\"x\": 1}' "
    "ELSE '\"Doc ' || CAST(doc_id % 50 AS VARCHAR) || "
    "' \\u0026 Co\"' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN ', \"headline\": \"H' || "
    "CAST(doc_id % 9 AS VARCHAR) || '\"' ELSE '' END) || "
    "', \"datePublished\": \"2024-0' || "
    "CAST(doc_id % 9 + 1 AS VARCHAR) || "
    "'-05\", \"author\": {\"@type\": \"Person\"}}</script>' || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<script type=''application/ld+json''>"
    "[{\"@type\": \"Product\", \"name\": \"P' || "
    "CAST(doc_id % 10 AS VARCHAR) || "
    "'\"}, {\"@type\": \"Decoy\"}]</script>' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<script type=\"application/ld+json\">{\"name\": \"x' || "
    "CAST(doc_id % 4 AS VARCHAR) || '\"</script>' ELSE '' END) || "
    "'<!-- <script type=\"application/ld+json\">"
    "{\"@type\": \"Ghost\"}</script> --></head>'"
)


def _html_jsonld_oracle_sql() -> str:
    """html_jsonld oracle — the comment strip + block extract_all +
    json_extract_string chain regenerated from the engine's JSONLD_RE/
    JSONLD_FIELDS constants, with the identical root-array ($[0] when
    the first non-space char is '[') and scalar-only (array/object
    value -> NULL) CASE rules; the json_valid guard doubles as both
    the is_valid column and DuckDB's malformed-input protection
    (json_extract_string THROWS on invalid JSON where Spark's
    get_json_object returns NULL)."""
    from .operators.html import COMMENT_RE, JSONLD_FIELDS, JSONLD_RE

    re_sql = JSONLD_RE.replace("'", "''")
    exts = ", ".join(
        "CASE WHEN json_valid(raw) THEN "
        "CASE WHEN left(ltrim(raw), 1) = '[' "
        f"THEN json_extract_string(raw, '$[0].\"{k}\"') "
        f"ELSE json_extract_string(raw, '$.\"{k}\"') END END "
        f"AS _v_{o}"
        for k, o in JSONLD_FIELDS
    )
    outs = ", ".join(
        f"CASE WHEN left(_v_{o}, 1) IN ('[', '{{') THEN NULL "
        f"ELSE _v_{o} END AS {o}"
        for _, o in JSONLD_FIELDS
    )
    return (
        f"WITH d0 AS (SELECT doc_id, {_JSONLD_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, "
        f"regexp_replace(h, '{COMMENT_RE}', ' ', 'g') AS h FROM d0), "
        "t AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{re_sql}', 1) AS bl FROM d), "
        "b AS (SELECT doc_id, CAST(bi - 1 AS BIGINT) AS block_no, "
        "bl[bi] AS raw FROM t, "
        "UNNEST(generate_series(1, len(bl))) AS g(bi)), "
        "e AS (SELECT doc_id, block_no, "
        f"json_valid(raw) AS is_valid, {exts} FROM b) "
        f"SELECT doc_id, block_no, is_valid, {outs} FROM e"
    )


ORACLE_SQL["html_jsonld"] = _html_jsonld_oracle_sql()


_FEED_PAGE_SQL = (
    "'<rss><channel><title>Chan</title>"
    "<item><title> Breaking &amp; A' || "
    "CAST(doc_id % 9 AS VARCHAR) || "
    "' </title><link>https://www.News' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.com/a/' || "
    "CAST(doc_id % 10 AS VARCHAR) || '?x=1&amp;y=2</link>' || "
    "(CASE WHEN doc_id % 2 = 0 THEN '<pubDate>Mon, 0' || "
    "CAST(doc_id % 9 + 1 AS VARCHAR) || ' Jan 2024</pubDate>' "
    "ELSE '' END) || '</item>' || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<item><title><![CDATA[C &amp; D ' || "
    "CAST(doc_id % 5 AS VARCHAR) || ']]></title></item>' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 11 = 0 THEN "
    "'<item><linkage>z</linkage><link>junk url</link></item>' "
    "ELSE '' END) || "
    "'</channel></rss>' || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<entry><title type=\"text\">Atom T' || "
    "CAST(doc_id % 4 AS VARCHAR) || "
    "'</title><link rel=\"alternate\" href=\"https://Blog' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.example/p/' || "
    "CAST(doc_id % 6 AS VARCHAR) || '\"/><updated>2024-02-0' || "
    "CAST(doc_id % 9 + 1 AS VARCHAR) || '</updated></entry>' "
    "ELSE '' END) || "
    "'<!-- <item><title>ghost</title></item> -->'"
)


def _corpus_feed_items_oracle_sql() -> str:
    """corpus_feed_items oracle — the comment strip + block
    extract_all (tag/body groups zipped by index) -> per-item
    title/link/date extracts with the identical CDATA-literal and
    text-else-href CASE rules, all regenerated from the engine's
    regex constants; host restated generically as
    lower(scheme://AUTHORITY) with the leading-www strip (the
    sitemap-oracle form — '' -> NULL mirrors host_of's junk
    contract)."""
    from .operators.html import COMMENT_RE, HTML_ENTITIES
    from .operators.urls import (
        CDATA_RE,
        FEED_BLOCK_RE,
        FEED_DATE_RE,
        FEED_LINK_HREF_RE,
        FEED_LINK_TEXT_RE,
        FEED_TITLE_RE,
    )

    def esc(r: str) -> str:
        return r.replace("'", "''")

    def dec(e: str) -> str:
        for ent, ch in HTML_ENTITIES:
            e = f"replace({e}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
        return e

    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(link, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), '')"
    )
    return (
        f"WITH d0 AS (SELECT doc_id, {_FEED_PAGE_SQL} AS x "
        "FROM documents), "
        "d AS (SELECT doc_id, "
        f"regexp_replace(x, '{COMMENT_RE}', ' ', 'g') AS x FROM d0), "
        "t AS (SELECT doc_id, "
        f"regexp_extract_all(x, '{esc(FEED_BLOCK_RE)}', 1) AS tg, "
        f"regexp_extract_all(x, '{esc(FEED_BLOCK_RE)}', 2) AS bd "
        "FROM d), "
        "e AS (SELECT doc_id, CAST(ei - 1 AS BIGINT) AS item_no, "
        "lower(tg[ei]) = 'entry' AS is_atom, bd[ei] AS b FROM t, "
        "UNNEST(generate_series(1, len(bd))) AS g(ei)), "
        "f AS (SELECT doc_id, item_no, is_atom, "
        f"regexp_extract(b, '{esc(FEED_TITLE_RE)}', 1) AS traw, "
        f"regexp_extract(regexp_extract(b, '{esc(FEED_TITLE_RE)}', 1), "
        f"'{esc(CDATA_RE)}', 1) AS tcd, "
        f"trim({dec('regexp_extract(b, ' + chr(39) + esc(FEED_LINK_TEXT_RE) + chr(39) + ', 1)')}) AS ltxt, "
        f"trim({dec('regexp_extract(b, ' + chr(39) + esc(FEED_LINK_HREF_RE) + chr(39) + ', 1)')}) AS lhref, "
        f"regexp_extract(b, '{esc(FEED_DATE_RE)}', 1) AS draw FROM e), "
        "g2 AS (SELECT doc_id, item_no, is_atom, "
        "NULLIF(CASE WHEN tcd <> '' THEN trim(tcd) "
        f"ELSE trim({dec('traw')}) END, '') AS title, "
        "NULLIF(CASE WHEN ltxt <> '' THEN ltxt ELSE lhref END, '') "
        "AS link, NULLIF(trim(draw), '') AS pub_date FROM f) "
        "SELECT doc_id, item_no, is_atom, title, link, pub_date, "
        f"{host} AS host FROM g2"
    )


ORACLE_SQL["corpus_feed_items"] = _corpus_feed_items_oracle_sql()


_HREFLANG_PAGE_SQL = (
    "'<head><link rel=\"stylesheet\" href=\"s.css\">"
    "<link hreflang=\"FR\" rel=\"alternate\" "
    "href=''https://www.Ex' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com/fr/' || CAST(doc_id % 10 AS VARCHAR) || "
    "'?a=1&amp;b=2''>' || "
    "(CASE WHEN doc_id % 3 = 0 THEN '<link rel=\"alternated\" "
    "hreflang=\"de\" href=\"https://x.de/\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '<link rel=\"alternate help\" "
    "hreflang=\"x-default\" href=\"https://ex' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.com/\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN '<link rel=\"alternate\" "
    "hreflang=\"\" href=\"https://y.com/\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN '<link rel=\"alternate\" "
    "hreflang=\"de\" href=\"junk url\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 11 = 0 THEN '<link rel=\"alternate\" "
    "hreflang=\"pt\" data-href=\"https://z.pt/\">' ELSE '' END) || "
    "'<!-- <link rel=\"alternate\" hreflang=\"it\" "
    "href=\"https://g.it/\"> -->"
    "<script>var l = ''<link rel=\"alternate\" hreflang=\"nl\" "
    "href=\"https://j.nl/\">'';</script></head>'"
)


def _hreflang_alts_ctes(page_sql: str) -> str:
    """Parametrized hreflang-alternates CTE chain (the
    _html_main_ctes precedent): the script+comment strip + link-tag
    extract_all + per-attribute regexes with the identical
    rel-token-list, lowercase-hreflang, and entity-decode rules, all
    regenerated from the engine's regex constants; host restated
    generically (the sitemap-oracle form).  Ends in a relation
    ``alts(doc_id, link_no, hreflang, href, is_default, host)`` —
    shared by the standalone html_hreflang oracle and the
    corpus_translation_clusters composition."""
    from .operators.html import (
        COMMENT_RE,
        HREF_ATTR_RE,
        HREFLANG_ATTR_RE,
        HTML_ENTITIES,
        LINK_TAG_RE,
        REL_ATTR_RE,
        SCRIPT_RE,
    )

    def esc(r: str) -> str:
        return r.replace("'", "''")

    href = f"regexp_extract(t, '{esc(HREF_ATTR_RE)}', 1)"
    for ent, ch in HTML_ENTITIES:
        href = f"replace({href}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(href, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), '')"
    )
    return (
        f"d0 AS (SELECT doc_id, {page_sql} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace(h, "
        f"'{esc(SCRIPT_RE)}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') "
        "AS h FROM d0), "
        "tt AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{esc(LINK_TAG_RE)}', 1) AS tags "
        "FROM d), "
        "e AS (SELECT doc_id, CAST(ti - 1 AS BIGINT) AS link_no, "
        "tags[ti] AS t FROM tt, "
        "UNNEST(generate_series(1, len(tags))) AS g(ti)), "
        "f AS (SELECT doc_id, link_no, "
        "string_split_regex(lower(trim(regexp_extract(t, "
        f"'{esc(REL_ATTR_RE)}', 1))), '[ \\t\\n\\r]+') AS rel_toks, "
        "lower(trim(regexp_extract(t, "
        f"'{esc(HREFLANG_ATTR_RE)}', 1))) AS hreflang, "
        f"trim({href}) AS href FROM e), "
        "alts AS (SELECT doc_id, link_no, hreflang, href, "
        "hreflang = 'x-default' AS is_default, "
        f"{host} AS host FROM f "
        "WHERE list_contains(rel_toks, 'alternate') "
        "AND hreflang <> '' AND href <> '')"
    )


ORACLE_SQL["html_hreflang"] = (
    f"WITH {_hreflang_alts_ctes(_HREFLANG_PAGE_SQL)} "
    "SELECT doc_id, link_no, hreflang, href, is_default, host "
    "FROM alts"
)


_TRANSLATION_PAGE_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN '<p>no declarations</p>' ELSE "
    "'<link rel=\"alternate\" hreflang=\"en\" href=\"https://ex' "
    "|| CAST(doc_id % 25 AS VARCHAR) || '.com/en\">' || "
    "'<link rel=\"alternate\" hreflang=\"fr\" href=\"https://ex' "
    "|| CAST(doc_id % 25 AS VARCHAR) || '.com/fr\">' || "
    "(CASE WHEN doc_id % 25 % 2 = 0 THEN "
    "'<link rel=\"alternate\" hreflang=\"de\" href=\"https://ex' "
    "|| CAST(doc_id % 25 AS VARCHAR) || '.com/de\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 25 % 3 = 0 THEN "
    "'<link rel=\"alternate\" hreflang=\"x-default\" "
    "href=\"https://ex' || CAST(doc_id % 25 AS VARCHAR) || "
    "'.com/\">' ELSE '' END) END"
)


ORACLE_SQL["corpus_translation_clusters"] = (
    f"WITH {_hreflang_alts_ctes(_TRANSLATION_PAGE_SQL)}, "
    "keys AS (SELECT doc_id, COALESCE("
    "MAX(CASE WHEN is_default THEN href END), MIN(href)) "
    "AS cluster_key FROM alts GROUP BY doc_id), "
    "pairs AS (SELECT DISTINCT k.cluster_key, a.hreflang, a.href "
    "FROM alts a JOIN keys k USING (doc_id)), "
    "sizes AS (SELECT cluster_key, "
    "COUNT(DISTINCT hreflang) AS n_langs FROM pairs "
    "GROUP BY cluster_key) "
    "SELECT p.cluster_key, p.hreflang, p.href, s.n_langs "
    "FROM pairs p JOIN sizes s USING (cluster_key)"
)


ORACLE_SQL["corpus_crawl_diff"] = (
    "WITH u AS (SELECT doc_id, 'https://s' || "
    "CAST(doc_id % 9 AS VARCHAR) || '.com/p' || "
    "CAST(doc_id AS VARCHAR) AS url, text FROM documents), "
    "o AS (SELECT url, MIN(md5(COALESCE(text, ''))) AS old_digest "
    "FROM u GROUP BY url), "
    "n0 AS (SELECT url, COALESCE(CASE WHEN doc_id % 5 = 0 "
    "THEN text || ' updated content' ELSE text END, '') AS text "
    "FROM u WHERE doc_id % 3 <> 0 "
    "UNION ALL SELECT url || '/new', COALESCE(text, '') "
    "FROM u WHERE doc_id % 7 = 0), "
    "n AS (SELECT url, MIN(md5(text)) AS new_digest "
    "FROM n0 GROUP BY url) "
    "SELECT COALESCE(o.url, n.url) AS url, "
    "CASE WHEN old_digest IS NULL THEN 'added' "
    "WHEN new_digest IS NULL THEN 'removed' "
    "WHEN old_digest = new_digest THEN 'unchanged' "
    "ELSE 'changed' END AS status, old_digest, new_digest "
    "FROM o FULL OUTER JOIN n ON o.url = n.url"
)


def _hop_distance_oracle_sql(max_hops: int = 3) -> str:
    """graph_hop_distance oracle — the chain+shortcut edge arms
    restated arithmetically, then each BFS level as a distinct-join
    CTE and ONE final MIN over the level union (integer-exact: no
    rounding discipline needed)."""
    k = "CAST(doc_id % 40 AS VARCHAR)"
    edges = (
        f"SELECT 'n' || {k} AS src, "
        "'n' || CAST(doc_id % 40 + 1 AS VARCHAR) AS dst "
        "FROM documents "
        f"UNION ALL SELECT 'n' || {k}, "
        "'n' || CAST(doc_id % 40 + 10 AS VARCHAR) "
        "FROM documents WHERE doc_id % 40 % 5 = 0"
    )
    parts = [
        f"e AS ({edges}), "
        "f0 AS (SELECT DISTINCT host AS node FROM (VALUES ('n0'), "
        "('n25'), ('isolated.seed')) AS s(host))"
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f", f{h} AS (SELECT DISTINCT e.dst AS node "
            f"FROM f{h - 1} JOIN e ON f{h - 1}.node = e.src)"
        )
    union = " UNION ALL ".join(
        f"SELECT node, {h} AS hops FROM f{h}"
        for h in range(0, max_hops + 1)
    )
    return (
        "WITH " + "".join(parts) + " "
        "SELECT node, CAST(MIN(hops) AS BIGINT) AS hops "
        f"FROM ({union}) GROUP BY node"
    )


ORACLE_SQL["graph_hop_distance"] = _hop_distance_oracle_sql()


def _text_sentences_oracle_sql() -> str:
    """text_sentences oracle — the same fixture arms, then
    extract_all(SENT_SPLIT_RE, 0) + explicit-class trim + blank drop
    + dense numbering + the shared ws-token count, regenerated from
    the engine's constants ('g' on the trim: both sides may be
    padded)."""
    from .operators.text import SENT_SPLIT_RE, _SENT_TRIM_RE

    page = (
        "'Doc ' || CAST(doc_id AS VARCHAR) || "
        "' opens here. Second  sentence is longer!' || chr(9) || "
        "'Third one?' || "
        "(CASE WHEN doc_id % 3 = 0 THEN "
        "' trailing tail with no terminal' ELSE '' END) || "
        "(CASE WHEN doc_id % 5 = 0 THEN "
        "' Ellipsis wait... more.' ELSE '' END)"
    )
    return (
        f"WITH p AS (SELECT doc_id, {page} AS h FROM documents), "
        "seg AS (SELECT doc_id, list_filter(list_transform("
        f"regexp_extract_all(h, '{SENT_SPLIT_RE}', 0), "
        f"s -> regexp_replace(s, '{_SENT_TRIM_RE}', '', 'g')), "
        "s -> s <> '') AS arr FROM p), "
        "e AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_no, "
        "arr[i] AS sentence FROM seg, "
        "UNNEST(generate_series(1, len(arr))) AS g(i)) "
        "SELECT doc_id, sent_no, sentence, "
        "CAST(len(list_filter(regexp_split_to_array(sentence, "
        + _WSRE2
        + "), x -> x <> '')) AS BIGINT) AS n_tokens FROM e"
    )


ORACLE_SQL["text_sentences"] = _text_sentences_oracle_sql()


def _bitext_pairs_oracle_sql() -> str:
    """corpus_bitext_pairs oracle — the shared hreflang CTE chain +
    the translation-cluster key/dedup stages, members (x-default
    excluded) joined to the restated docs arms, then the ordered
    self-join with the identical token rule and ratio CASE (0.0 when
    the longer side is empty)."""
    from .operators import text

    k = "doc_id % 25"
    ntok = (
        f"CASE doc_id // 25 WHEN 0 THEN 20 + {k} "
        f"WHEN 1 THEN (CASE WHEN {k} % 4 = 0 THEN 3 * (20 + {k}) "
        f"ELSE 22 + {k} END) ELSE 21 + {k} END"
    )
    return (
        f"WITH {_hreflang_alts_ctes(_TRANSLATION_PAGE_SQL)}, "
        "keys AS (SELECT doc_id, COALESCE("
        "MAX(CASE WHEN is_default THEN href END), MIN(href)) "
        "AS cluster_key FROM alts GROUP BY doc_id), "
        "cpairs AS (SELECT DISTINCT k.cluster_key, a.hreflang, a.href "
        "FROM alts a JOIN keys k USING (doc_id)), "
        "members AS (SELECT cluster_key, hreflang, href FROM cpairs "
        "WHERE hreflang <> 'x-default'), "
        "docs AS (SELECT "
        f"'https://ex' || CAST({k} AS VARCHAR) || '.com/' || "
        "(CASE doc_id // 25 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' "
        "ELSE 'de' END) AS url, "
        f"repeat('w ', {ntok}) AS text "
        "FROM documents WHERE doc_id < 75), "
        "sized AS (SELECT url, CAST(len(list_filter("
        f"regexp_split_to_array(text, '{text.WS_SPLIT_RE2}'), "
        "x -> x <> '')) AS BIGINT) AS tok FROM docs), "
        "m AS (SELECT cluster_key, hreflang, href, tok "
        "FROM members JOIN sized ON href = url), "
        "paired AS (SELECT a.cluster_key, a.hreflang AS lang_a, "
        "b.hreflang AS lang_b, a.href AS href_a, b.href AS href_b, "
        "a.tok AS tokens_a, b.tok AS tokens_b, "
        "CASE WHEN greatest(a.tok, b.tok) = 0 THEN 0.0 "
        "ELSE round(CAST(least(a.tok, b.tok) AS DOUBLE) / "
        "CAST(greatest(a.tok, b.tok) AS DOUBLE), 6) END AS len_ratio "
        "FROM m a JOIN m b ON a.cluster_key = b.cluster_key "
        "AND a.hreflang < b.hreflang) "
        "SELECT *, len_ratio >= 0.5 AS keep FROM paired"
    )


ORACLE_SQL["corpus_bitext_pairs"] = _bitext_pairs_oracle_sql()


_OG_PAGE_SQL = (
    "'<head><!-- <meta property=\"og:title\" content=\"ghost\"> -->"
    "<meta name=\"og:title\" content=\"not og\">"
    "<meta property=\"og:title\" content=\"OG &amp; Title ' || "
    "CAST(doc_id % 9 AS VARCHAR) || '  here\">' || "
    "(CASE WHEN doc_id % 11 = 0 THEN "
    "'<meta property=\"og:image\" content=\"\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<meta property=\"og:image\" content=\"https://img.Ex' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.com/i.png\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<meta property=''og:description'' "
    "content=''Desc &lt;b&gt; x''>' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<meta property=\"og:type\" content=\"Article\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN "
    "'<meta property=\"og:url\" content=\"https://ex' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.com/page\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<meta name=\"twitter:card\" content=\"SUMMARY_large_image\">' "
    "ELSE '' END) || '</head>'"
)


_DOM_PAGE_SQL = (
    "'<html><head><title>T</title><style>p{color:red}</style>"
    "</head><body><div><p>' || substr(text, 1, 40) || "
    "'</p><p>second  para &amp; more</p></div>' || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<table><tr><td>1</td><td>2</td></tr></table>' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<ul><li>x</li><li>y</li><pre>not a p</pre></ul>' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<a href=\"https://ex' || CAST(doc_id % 9 AS VARCHAR) || "
    "'.com/\">link text</a>' ELSE '' END) || "
    "'<script>var p = \"<p>ghost</p>\";</script></body></html>'"
)


def _dom_stats_oracle_sql() -> str:
    """corpus_dom_stats oracle — the strip passes + tag counts via
    len(regexp_extract_all) + the shared block-text chain, all
    regenerated from the engine constants (DOM_COUNTED_TAGS /
    DOM_TAG_BOUNDARY / TAG_RE — one site to edit)."""
    from .operators.html import (
        COMMENT_RE,
        DOM_COUNTED_TAGS,
        DOM_TAG_BOUNDARY,
        HTML_ENTITIES,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
    )

    t = f"regexp_replace(h, '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        t = f"replace({t}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
    btxt = f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"
    counts = ", ".join(
        "CAST(len(regexp_extract_all(h, "
        f"'(?i)<{tag}{DOM_TAG_BOUNDARY}')) AS BIGINT) AS n_{tag}"
        for tag in DOM_COUNTED_TAGS
    )
    return (
        f"WITH d0 AS (SELECT doc_id, COALESCE({_DOM_PAGE_SQL}, '') "
        "AS h0 FROM documents), "
        "d AS (SELECT doc_id, h0, regexp_replace(regexp_replace("
        f"regexp_replace(h0, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0), "
        "c AS (SELECT doc_id, h0, "
        f"CAST(len(regexp_extract_all(h, '{TAG_RE}')) AS BIGINT) "
        f"AS n_tags, {counts}, "
        f"CAST(length({btxt}) AS BIGINT) AS text_chars FROM d) "
        "SELECT doc_id, n_tags, n_p, n_div, n_table, n_li, n_a, "
        "text_chars, "
        "CASE WHEN length(h0) = 0 THEN 0.0 ELSE "
        "ROUND(1.0 - CAST(text_chars AS DOUBLE) / "
        "CAST(length(h0) AS DOUBLE), 6) END AS markup_frac FROM c"
    )


ORACLE_SQL["corpus_dom_stats"] = _dom_stats_oracle_sql()


def _opengraph_oracle_sql() -> str:
    """html_opengraph oracle — the six first-match extractions over
    the identically stripped html, regenerated from OPENGRAPH_FIELDS
    + _meta_attr_re + the shared block-text chain (one site to
    edit)."""
    from .operators.html import (
        COMMENT_RE,
        HTML_ENTITIES,
        OPENGRAPH_FIELDS,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
        _meta_attr_re,
    )

    def esc(r: str) -> str:
        return r.replace(chr(39), chr(39) * 2)

    def btxt(x: str) -> str:
        t = f"regexp_replace({x}, '{TAG_RE}', ' ', 'g')"
        for ent, ch in HTML_ENTITIES:
            t = (
                f"replace({t}, '{ent}', "
                f"'{ch.replace(chr(39), chr(39) * 2)}')"
            )
        return f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"

    fields = []
    for name, attr, value, mode in OPENGRAPH_FIELDS:
        e = f"regexp_extract(h, '{esc(_meta_attr_re(attr, value))}', 1)"
        if mode == "text":
            x = btxt(e)
        elif mode == "lower":
            x = f"lower(trim({e}))"
        else:
            x = e
        fields.append(f"NULLIF({x}, '') AS {name}")
    return (
        f"WITH d0 AS (SELECT doc_id, {_OG_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0) "
        "SELECT doc_id, " + ", ".join(fields) + " FROM d"
    )


ORACLE_SQL["html_opengraph"] = _opengraph_oracle_sql()


_IMAGES_PAGE_SQL = (
    "'<body><img alt=\"A  scenic &amp; detailed view number ' || "
    "CAST(doc_id % 13 AS VARCHAR) || "
    "' of landmark\" src=\"https://img.ex/' || "
    "CAST(doc_id % 20 AS VARCHAR) || '.jpg\">' || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<img src=\"https://img.ex/s' || CAST(doc_id % 20 AS VARCHAR) "
    "|| '.png\" alt=\"tiny logo\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<img src=\"/relative/img' || CAST(doc_id % 20 AS VARCHAR) || "
    "'.gif\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<img src=''https://cdn.Ex.com/b.jpg'' alt=''''>' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN "
    "'<img data-src=\"https://lazy.ex/l.jpg\" "
    "alt=\"lazy loaded image here\">' ELSE '' END) || "
    "'<!-- <img src=\"https://g.ex/c.jpg\" alt=\"ghost commented"
    " image\"> --><script>var i = ''<img src=\"https://j.ex/s.jpg\""
    " alt=\"scripted ghost image\">'';</script></body>'"
)


def _images_ctes(page_sql: str) -> str:
    """Parametrized img-extraction CTE chain (the _hreflang_alts_ctes
    precedent): strip passes + img-tag extract_all + per-attribute
    src/alt regexes with the identical entity-decode and block-text
    rules, regenerated from the engine's regex constants.  Ends in a
    relation ``imgs(doc_id, img_no, src, alt, host)`` — shared by the
    html_images and corpus_image_captions oracles."""
    from .operators.html import (
        ALT_ATTR_RE,
        COMMENT_RE,
        HTML_ENTITIES,
        IMG_TAG_RE,
        SCRIPT_RE,
        SRC_ATTR_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
    )

    def esc(r: str) -> str:
        return r.replace(chr(39), chr(39) * 2)

    src = f"regexp_extract(t, '{esc(SRC_ATTR_RE)}', 1)"
    for ent, ch in HTML_ENTITIES:
        src = (
            f"replace({src}, '{ent}', "
            f"'{ch.replace(chr(39), chr(39) * 2)}')"
        )
    alt = f"regexp_replace(regexp_extract(t, '{esc(ALT_ATTR_RE)}', 1), '{TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        alt = (
            f"replace({alt}, '{ent}', "
            f"'{ch.replace(chr(39), chr(39) * 2)}')"
        )
    alt = f"trim(regexp_replace({alt}, '{WS_RUN_RE}', ' ', 'g'))"
    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(src, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), '')"
    )
    return (
        f"d0 AS (SELECT doc_id, {page_sql} AS h FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{esc(SCRIPT_RE)}', ' ', 'g'), "
        f"'{esc(STYLE_RE)}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') "
        "AS h FROM d0), "
        "tt AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{esc(IMG_TAG_RE)}', 1) AS tags "
        "FROM d), "
        "e AS (SELECT doc_id, CAST(ti - 1 AS BIGINT) AS img_no, "
        "tags[ti] AS t FROM tt, "
        "UNNEST(generate_series(1, len(tags))) AS g(ti)), "
        "f AS (SELECT doc_id, img_no, "
        f"trim({src}) AS src, NULLIF({alt}, '') AS alt FROM e), "
        "imgs AS (SELECT doc_id, img_no, src, alt, "
        f"{host} AS host FROM f WHERE src <> '')"
    )


ORACLE_SQL["html_images"] = (
    f"WITH {_images_ctes(_IMAGES_PAGE_SQL)} "
    "SELECT doc_id, img_no, src, alt, host FROM imgs"
)


def _image_captions_oracle_sql() -> str:
    """corpus_image_captions oracle — the shared imgs chain + the
    token-count filter and the keep-best rule restated as an
    explicit-total-order ROW_NUMBER (length DESC, alt, doc_id — the
    exact struct-min order the engine aggregates with)."""
    from .operators import text

    ntok = (
        "len(list_filter(regexp_split_to_array(alt, "
        f"'{text.WS_SPLIT_RE2}'), x -> x <> ''))"
    )
    return (
        f"WITH {_images_ctes(_IMAGES_PAGE_SQL)}, "
        f"kept AS (SELECT * FROM imgs WHERE alt IS NOT NULL "
        f"AND {ntok} >= 3), "
        "r AS (SELECT src, alt, doc_id, "
        "ROW_NUMBER() OVER (PARTITION BY src "
        "ORDER BY length(alt) DESC, alt, doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY src) AS n_refs FROM kept) "
        f"SELECT src, alt, CAST({ntok} AS BIGINT) AS alt_tokens, "
        "CAST(n_refs AS BIGINT) AS n_refs FROM r WHERE rn = 1"
    )


ORACLE_SQL["corpus_image_captions"] = _image_captions_oracle_sql()


def _feed_discovery_oracle_sql() -> str:
    """html_feed_discovery oracle — the link-tag chain with the
    rel-token-list rule + the lowered-mime feed-type CASE, regenerated
    from the engine's constants (LINK_TAG_RE / REL_ATTR_RE /
    TYPE_ATTR_RE / HREF_ATTR_RE / FEED_MIME_TYPES)."""
    from .operators.html import (
        COMMENT_RE,
        FEED_MIME_TYPES,
        HREF_ATTR_RE,
        HTML_ENTITIES,
        LINK_TAG_RE,
        REL_ATTR_RE,
        SCRIPT_RE,
        TYPE_ATTR_RE,
    )

    def esc(r: str) -> str:
        return r.replace(chr(39), chr(39) * 2)

    page = (
        "'<head><link rel=\"alternate\" type=\"text/html\" "
        "href=\"https://m.ex/\">"
        "<link rel=\"stylesheet\" type=\"application/rss+xml\" "
        "href=\"https://s.ex/f.xml\">"
        "<link rel=\"alternate\" type=\"application/rss+xml\" "
        "href=\"https://ex' || CAST(doc_id % 11 AS VARCHAR) || "
        "(CASE WHEN doc_id % 3 = 0 THEN '.com/feed?a=1&amp;b=2' "
        "ELSE '.com/feed.xml' END) || '\">' || "
        "(CASE WHEN doc_id % 2 = 0 THEN "
        "'<link type=''Application/Atom+XML'' rel=''alternate'' "
        "href=''/atom.xml''>' ELSE '' END) || "
        "'<link rel=\"alternate\" type=\"application/rss+xml\" "
        "href=\"\">"
        "<!-- <link rel=\"alternate\" type=\"application/rss+xml\" "
        "href=\"https://g.ex/f.xml\"> --></head>'"
    )
    href = f"regexp_extract(t, '{esc(HREF_ATTR_RE)}', 1)"
    for ent, ch in HTML_ENTITIES:
        href = (
            f"replace({href}, '{ent}', "
            f"'{ch.replace(chr(39), chr(39) * 2)}')"
        )
    ftype = "CASE " + " ".join(
        f"WHEN mime = '{m}' THEN '{name}'"
        for m, name in sorted(FEED_MIME_TYPES.items())
    ) + " END"
    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(href, "
        "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "'^www\\.', ''), '')"
    )
    return (
        f"WITH d0 AS (SELECT doc_id, {page} AS h FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace(h, "
        f"'{esc(SCRIPT_RE)}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') "
        "AS h FROM d0), "
        "tt AS (SELECT doc_id, "
        f"regexp_extract_all(h, '{esc(LINK_TAG_RE)}', 1) AS tags "
        "FROM d), "
        "e AS (SELECT doc_id, CAST(ti - 1 AS BIGINT) AS link_no, "
        "tags[ti] AS t FROM tt, "
        "UNNEST(generate_series(1, len(tags))) AS g(ti)), "
        "f AS (SELECT doc_id, link_no, "
        "string_split_regex(lower(trim(regexp_extract(t, "
        f"'{esc(REL_ATTR_RE)}', 1))), '[ \\t\\n\\r]+') AS rel_toks, "
        "lower(trim(regexp_extract(t, "
        f"'{esc(TYPE_ATTR_RE)}', 1))) AS mime, "
        f"trim({href}) AS href FROM e), "
        f"q AS (SELECT doc_id, link_no, {ftype} AS feed_type, href "
        "FROM f WHERE list_contains(rel_toks, 'alternate') "
        "AND href <> '') "
        "SELECT doc_id, link_no, feed_type, href, "
        f"{host} AS host FROM q WHERE feed_type IS NOT NULL"
    )


ORACLE_SQL["html_feed_discovery"] = _feed_discovery_oracle_sql()


_ROBOTS_PAGE_SQL = (
    "'<head><meta name=\"description\" content=\"noindex decoy\">' || "
    "(CASE WHEN doc_id % 2 = 0 THEN "
    "'<meta name=\"robots\" content=\"NoIndex , nofollow\">' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "'<meta name=\"ROBOTS\" content=\"NONE\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'<META name=\"robots\" content=\"noarchive\">"
    "<meta name=\"robots\" content=\" nofollow\t\">' ELSE '' END) || "
    "(CASE WHEN doc_id % 7 = 0 THEN "
    "'<!-- <meta name=\"robots\" content=\"noindex\"> -->' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 11 = 0 THEN "
    "'<meta name=\"googlebot\" content=\"noindex\">' ELSE '' END) || "
    "'</head>'"
)


def _robots_meta_oracle_sql() -> str:
    """html_robots_meta oracle — the strip passes + one extract_all +
    comma-split + per-token ws-trim + token membership, regenerated
    from the engine's regex constants (META_ROBOTS_RE, _DIR_TRIM_RE,
    the strip REs).  The trim regexp_replace needs the 'g' flag: a
    token padded on BOTH sides is two matches (Spark replaces all by
    default)."""
    from .operators.html import (
        COMMENT_RE,
        META_ROBOTS_RE,
        SCRIPT_RE,
        STYLE_RE,
        _DIR_TRIM_RE,
    )

    def esc(r: str) -> str:
        return r.replace("'", "''")

    return (
        f"WITH d0 AS (SELECT doc_id, {_ROBOTS_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{esc(SCRIPT_RE)}', ' ', 'g'), "
        f"'{esc(STYLE_RE)}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') "
        "AS h FROM d0), "
        "t AS (SELECT doc_id, list_transform(flatten(list_transform("
        f"regexp_extract_all(h, '{esc(META_ROBOTS_RE)}', 1), "
        "c -> string_split(lower(c), ','))), "
        f"s -> regexp_replace(s, '{_DIR_TRIM_RE}', '', 'g')) "
        "AS toks FROM d) "
        "SELECT doc_id, "
        "list_contains(toks, 'noindex') OR list_contains(toks, 'none') "
        "AS noindex, "
        "list_contains(toks, 'nofollow') OR list_contains(toks, 'none') "
        "AS nofollow, "
        "list_contains(toks, 'noarchive') AS noarchive, "
        "NOT (list_contains(toks, 'noindex') "
        "OR list_contains(toks, 'none')) AS keep FROM t"
    )


ORACLE_SQL["html_robots_meta"] = _robots_meta_oracle_sql()


def _corpus_canonical_dedup_oracle_sql() -> str:
    """corpus_canonical_dedup oracle — canonical key reconstructed
    ARITHMETICALLY from the fixture's doc_id arms (the
    dedup_url_canonical precedent: the oracle proves the grime
    variants collapse exactly onto the clean form the engine's
    canonicalize_url computes), then the same count agg + min-id
    keep rule."""
    lid = "CAST(doc_id % 40 AS VARCHAR)"
    h5 = "CAST(doc_id % 5 AS VARCHAR)"
    url = (
        "CASE doc_id % 4 "
        f"WHEN 0 THEN 'https://site' || {h5} || '.com/p/' || {lid} "
        f"|| '?id=' || {lid} "
        f"WHEN 1 THEN 'HTTPS://WWW.Site' || {h5} || '.COM/p/' || "
        f"{lid} || '?id=' || {lid} "
        f"WHEN 2 THEN 'https://site' || {h5} || '.com/p/' || {lid} "
        f"|| '?utm_source=ad&id=' || {lid} || '&gclid=zz' "
        f"ELSE 'https://site' || {h5} || '.com/p/' || {lid} || "
        f"'/?id=' || {lid} || '#frag' END"
    )
    key = (
        "CASE WHEN doc_id % 3 = 0 THEN 'https://sitec.com/canon/' "
        "|| CAST(doc_id % 8 AS VARCHAR) "
        f"ELSE 'https://site' || {h5} || '.com/p/' || {lid} || "
        f"'?id=' || {lid} END"
    )
    return (
        f"WITH d AS (SELECT doc_id, {url} AS url, "
        "doc_id % 3 = 0 AS used_canonical, "
        f"{key} AS canon_key FROM documents), "
        "c AS (SELECT canon_key, MIN(doc_id) AS keep_id, "
        "COUNT(*) AS n_members FROM d GROUP BY canon_key) "
        "SELECT d.doc_id, d.url, d.canon_key, c.keep_id, "
        "c.n_members, d.used_canonical, "
        "d.doc_id <> c.keep_id AS is_dup "
        "FROM d JOIN c USING (canon_key)"
    )


ORACLE_SQL["corpus_canonical_dedup"] = (
    _corpus_canonical_dedup_oracle_sql()
)


ORACLE_SQL["corpus_fetch_schedule"] = (
    "WITH d AS (SELECT doc_id, "
    "'site' || CAST(doc_id % 17 AS VARCHAR) || '.com' AS host, "
    "(doc_id * 37) % 101 AS score FROM documents), "
    "r AS (SELECT doc_id, host, score, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY host "
    "ORDER BY score DESC, doc_id ASC) AS BIGINT) AS fetch_rank "
    "FROM d) "
    "SELECT doc_id, host, score, fetch_rank, "
    "CAST((fetch_rank - 1) // 3 AS BIGINT) AS window_no "
    "FROM r WHERE fetch_rank <= 12"
)


def _duck_str(s: str) -> str:
    """A DuckDB string-literal expression for ``s``, splicing
    non-printable chars (the sloppy-cp1252 control bytes, e.g. U+009D
    in the right-double-quote mojibake pattern) as chr(n) — a raw
    control char inside a quoted literal is lexer roulette."""
    parts, buf = [], []

    def flush():
        if buf:
            parts.append("'" + "".join(buf).replace("'", "''") + "'")
            buf.clear()

    for ch in s:
        if ch.isprintable():
            buf.append(ch)
        else:
            flush()
            parts.append(f"chr({ord(ch)})")
    flush()
    return " || ".join(parts) if parts else "''"


def _mojibake_oracle_sql() -> str:
    """text_mojibake oracle — the injection arms AND the fixed-order
    replace chain both regenerated from MOJIBAKE_PAIRS (one CTE per
    pair carrying the repaired text and the cumulative length-trick
    count, each count on that pass's input — the scrub convention)."""
    from .operators.encoding import MOJIBAKE_PAIRS

    p = {c: pat for pat, c in MOJIBAKE_PAIRS}
    arms = (
        "CASE doc_id % 5 "
        f"WHEN 0 THEN {_duck_str(' Caf' + p['é'] + ' ' + p['’'] + 'x' + p['’'])} "
        f"WHEN 1 THEN {_duck_str(' ' + p['€'] + '9 ' + p['—'] + ' ok')} "
        f"WHEN 2 THEN {_duck_str(' ' + p['«'] + 'q' + p['»'] + ' 20' + p['°'])} "
        f"WHEN 3 THEN {_duck_str(' na' + p['ï'] + 've ' + p['ñ'] + ' ' + p['ü'])} "
        "ELSE '' END"
    )
    ctes = [
        f"m0 AS (SELECT doc_id, coalesce(text, '') || {arms} AS t, "
        "CAST(0 AS DOUBLE) AS c FROM documents)"
    ]
    for i, (pat, rep) in enumerate(MOJIBAKE_PAIRS, start=1):
        ps, rs = _duck_str(pat), _duck_str(rep)
        ctes.append(
            f"m{i} AS (SELECT doc_id, replace(t, {ps}, {rs}) AS t, "
            f"c + (length(t) - length(replace(t, {ps}, ''))) "
            f"/ {len(pat)} AS c FROM m{i - 1})"
        )
    n = len(MOJIBAKE_PAIRS)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT doc_id, md5(t) AS fixed_md5, "
        "CAST(c AS BIGINT) AS n_fixes, "
        f"c > 0 AS had_mojibake FROM m{n}"
    )


ORACLE_SQL["text_mojibake"] = _mojibake_oracle_sql()


def _pub_date_oracle_sql() -> str:
    """html_pub_date oracle — the fixture arms, the strip passes, the
    meta/time/url regex extracts, AND the integer calendar validation
    (window, day-in-month, leap years) all regenerated from the
    engine constants; priority = meta > time > url with invalid
    candidates falling through, exactly the engine rule."""
    from .operators.html import (
        COMMENT_RE,
        ISO_DATE_RE,
        META_DATE_RE,
        SCRIPT_RE,
        STYLE_RE,
        TIME_DATE_RE,
        URL_DATE_RE,
    )

    def q(s: str) -> str:
        return s.replace(chr(39), chr(39) * 2)

    iso0 = (
        "CAST(2015 + doc_id % 20 AS VARCHAR) || '-' || "
        "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-' || "
        "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')"
    )
    html = (
        "CASE doc_id % 6 "
        "WHEN 0 THEN '<meta property=\"article:published_time\" "
        f"content=\"' || {iso0} || 'T08:30:00Z\">"
        "<time datetime=\"2010-01-01\">x</time>' "
        "WHEN 1 THEN '<meta name=\"date\" content=\"2021-02-30\">"
        "<time datetime=\"' || "
        "CAST(2016 + (doc_id % 3) * 4 AS VARCHAR) || "
        "'-02-29T00:00\">y</time>' "
        "WHEN 4 THEN '<time datetime=\"May 5, 2020\">w</time>' "
        "ELSE '<p>no date markup</p>' END"
    )
    url = (
        "CASE doc_id % 6 "
        "WHEN 2 THEN 'https://ex.com/' || "
        "CAST(2000 + doc_id % 30 AS VARCHAR) || '/' || "
        "CAST(1 + doc_id % 12 AS VARCHAR) || '/' || "
        "CAST(1 + doc_id % 28 AS VARCHAR) || '/post' "
        "WHEN 3 THEN 'https://ex.com/' || "
        "CAST(1996 + doc_id % 30 AS VARCHAR) || '/' || "
        "CAST(1 + doc_id % 12 AS VARCHAR) || '/archive' "
        "WHEN 4 THEN 'https://ex.com/1990/05/06/old' "
        "ELSE 'https://ex.com/plain' END"
    )

    def canon(y: str, m: str, d: str) -> str:
        return (
            f"CASE WHEN {y} IS NOT NULL AND {m} IS NOT NULL "
            f"AND {d} IS NOT NULL "
            f"AND {y} BETWEEN 1995 AND 2035 "
            f"AND {m} BETWEEN 1 AND 12 AND {d} >= 1 "
            f"AND {d} <= (CASE WHEN {m} IN (4, 6, 9, 11) THEN 30 "
            f"WHEN {m} = 2 THEN (CASE WHEN ({y} % 4 = 0 "
            f"AND {y} % 100 <> 0) OR {y} % 400 = 0 "
            "THEN 29 ELSE 28 END) ELSE 31 END) "
            f"THEN CAST({y} AS VARCHAR) || '-' || "
            f"lpad(CAST({m} AS VARCHAR), 2, '0') || '-' || "
            f"lpad(CAST({d} AS VARCHAR), 2, '0') END"
        )

    def grp(raw: str, re_: str, g: int) -> str:
        return (
            f"CAST(NULLIF(regexp_extract({raw}, '{q(re_)}', {g}), "
            "'') AS INT)"
        )

    return (
        f"WITH d0 AS (SELECT doc_id, {html} AS h, {url} AS u "
        "FROM documents), "
        "d1 AS (SELECT doc_id, u, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{q(SCRIPT_RE)}', ' ', 'g'), "
        f"'{q(STYLE_RE)}', ' ', 'g'), '{q(COMMENT_RE)}', ' ', 'g') "
        "AS h FROM d0), "
        "r AS (SELECT doc_id, u, "
        f"regexp_extract(h, '{q(META_DATE_RE)}', 1) AS mr, "
        f"regexp_extract(h, '{q(TIME_DATE_RE)}', 1) AS tr FROM d1), "
        "g AS (SELECT doc_id, "
        f"{grp('mr', ISO_DATE_RE, 1)} AS my, "
        f"{grp('mr', ISO_DATE_RE, 2)} AS mm, "
        f"{grp('mr', ISO_DATE_RE, 3)} AS md, "
        f"{grp('tr', ISO_DATE_RE, 1)} AS ty, "
        f"{grp('tr', ISO_DATE_RE, 2)} AS tm, "
        f"{grp('tr', ISO_DATE_RE, 3)} AS td, "
        f"{grp('u', URL_DATE_RE, 1)} AS uy, "
        f"{grp('u', URL_DATE_RE, 2)} AS um, "
        f"{grp('u', URL_DATE_RE, 3)} AS ud FROM r), "
        "c AS (SELECT doc_id, "
        f"{canon('my', 'mm', 'md')} AS mc, "
        f"{canon('ty', 'tm', 'td')} AS tc, "
        f"{canon('uy', 'um', 'COALESCE(ud, 1)')} AS uc FROM g) "
        "SELECT doc_id, COALESCE(mc, tc, uc) AS pub_date, "
        "CASE WHEN mc IS NOT NULL THEN 'meta' "
        "WHEN tc IS NOT NULL THEN 'time' "
        "WHEN uc IS NOT NULL THEN 'url' END AS date_source FROM c"
    )


ORACLE_SQL["html_pub_date"] = _pub_date_oracle_sql()

# corpus_link_graph: the fixture hrefs are pure doc_id functions, so
# the oracle REGENERATES the (src, dst) edges from the same arithmetic
# (absolute -> site<k>.com, relative -> self, %4==2 -> ext.org after
# the lower/www normalization) and aggregates identically.
ORACLE_SQL["corpus_link_graph"] = (
    "WITH e AS ("
    "SELECT doc_id, 'host' || CAST(doc_id % 4 AS VARCHAR) || '.net' "
    "  AS src_host, "
    "  'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS dst_host "
    "FROM documents "
    "UNION ALL "
    "SELECT doc_id, 'host' || CAST(doc_id % 4 AS VARCHAR) || '.net', "
    "  'host' || CAST(doc_id % 4 AS VARCHAR) || '.net' "
    "FROM documents "
    "UNION ALL "
    "SELECT doc_id, 'host' || CAST(doc_id % 4 AS VARCHAR) || '.net', "
    "  'ext.org' FROM documents WHERE doc_id % 4 = 2) "
    "SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links, "
    "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs "
    "FROM e GROUP BY src_host, dst_host HAVING COUNT(*) >= 1"
)

_HTML_META_PAGE_SQL = (
    "'<html' || (CASE doc_id % 5 WHEN 0 THEN ' lang=\"en-US\"' "
    "WHEN 1 THEN ' lang=''fr''' ELSE '' END) || '><head>' || "
    "(CASE doc_id % 5 "
    "WHEN 0 THEN '<TITLE>Doc &amp; ' || CAST(doc_id % 7 AS VARCHAR) "
    "|| '</TITLE>' "
    "WHEN 1 THEN '<title>  ' || substr(text, 1, 20) || "
    "'   more</title>' "
    "WHEN 2 THEN '<script>var t=\"<title>zz</title>\";</script>"
    "<!-- <title>ghost</title> -->' "
    "WHEN 3 THEN '<title></title>' "
    "ELSE '<title>Plain ' || CAST(doc_id % 3 AS VARCHAR) || "
    "'</title>' END) || "
    "(CASE doc_id % 5 "
    "WHEN 0 THEN '<meta name=\"description\" content=\"Summary "
    "&amp; ' || CAST(doc_id % 4 AS VARCHAR) || '\">' "
    "WHEN 1 THEN '<meta name=''description'' content=''single ' || "
    "CAST(doc_id % 6 AS VARCHAR) || '''>' "
    "WHEN 3 THEN '<meta name=\"description\" content=\"   \">' "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 5 IN (0, 3) THEN "
    "'<link rel=\"canonical\" href=\"https://site' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.com/p/' || "
    "CAST(doc_id AS VARCHAR) || '\">' "
    "WHEN doc_id % 5 = 2 THEN "
    "'<link rel=''canonical'' href=''/rel/' || "
    "CAST(doc_id % 3 AS VARCHAR) || '''>' ELSE '' END) || "
    "(CASE doc_id % 5 WHEN 0 THEN '<meta charset=\"UTF-8\">' "
    "WHEN 2 THEN '<meta charset=utf-8>' "
    "WHEN 4 THEN '<meta charset=''ISO-8859-1''>' ELSE '' END) || "
    "'</head><body><p>' || substr(text, 1, 40) || "
    "'</p></body></html>'"
)


def _html_metadata_oracle_sql() -> str:
    """html_metadata oracle — the five first-match extractions over
    the identically stripped html, every regex + the entity/cleanup
    chain regenerated from the engine constants (operators/html.py —
    one site to edit)."""
    from .operators.html import (
        CANONICAL_RE,
        CHARSET_RE,
        COMMENT_RE,
        HTML_ENTITIES,
        LANG_ATTR_RE,
        META_DESC_RE,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        TITLE_RE,
        WS_RUN_RE,
    )

    def esc(r: str) -> str:
        return r.replace(chr(39), chr(39) * 2)

    def btxt(x: str) -> str:
        t = f"regexp_replace({x}, '{TAG_RE}', ' ', 'g')"
        for ent, ch in HTML_ENTITIES:
            t = (
                f"replace({t}, '{ent}', "
                f"'{ch.replace(chr(39), chr(39) * 2)}')"
            )
        return f"trim(regexp_replace({t}, '{WS_RUN_RE}', ' ', 'g'))"

    def first(re_: str) -> str:
        return f"regexp_extract(h, '{esc(re_)}', 1)"

    return (
        f"WITH d0 AS (SELECT doc_id, {_HTML_META_PAGE_SQL} AS h "
        "FROM documents), "
        "d AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(h, '{SCRIPT_RE}', ' ', 'g'), "
        f"'{STYLE_RE}', ' ', 'g'), '{COMMENT_RE}', ' ', 'g') AS h "
        "FROM d0) "
        "SELECT doc_id, "
        f"NULLIF({btxt(first(TITLE_RE))}, '') AS title, "
        f"NULLIF({btxt(first(META_DESC_RE))}, '') "
        "AS meta_description, "
        f"NULLIF({first(CANONICAL_RE)}, '') AS canonical_url, "
        f"NULLIF(lower(trim({first(LANG_ATTR_RE)})), '') "
        "AS html_lang, "
        f"NULLIF(lower({first(CHARSET_RE)}), '') AS charset "
        "FROM d"
    )


ORACLE_SQL["html_metadata"] = _html_metadata_oracle_sql()


def _robots_filter_oracle_sql() -> str:
    """corpus_robots_filter oracle — rules regenerated from
    ROBOTS_RULES as a VALUES CTE, host/path regenerated from the
    fixture's doc_id arithmetic, and the longest-match argmax restated
    as ROW_NUMBER ordered by (prefix length DESC, allow DESC)."""
    vals = ", ".join(
        f"('{h}', '{p}', {'TRUE' if a else 'FALSE'})"
        for h, p, a in ROBOTS_RULES
    )
    return (
        "WITH u AS (SELECT doc_id, "
        "CASE doc_id % 7 "
        "WHEN 0 THEN 'https://site0.com/p/' || "
        "CAST(doc_id % 97 AS VARCHAR) "
        "WHEN 1 THEN 'https://site0.com/other/' || "
        "CAST(doc_id % 5 AS VARCHAR) "
        "WHEN 2 THEN 'https://site1.com/p/' || "
        "CAST(doc_id % 23 AS VARCHAR) "
        "WHEN 3 THEN 'https://www.Site2.com' "
        "WHEN 4 THEN 'https://site9.com/p/' || "
        "CAST(doc_id AS VARCHAR) "
        "WHEN 5 THEN 'junk url ' || CAST(doc_id AS VARCHAR) "
        "ELSE 'https://site3.com/t/x' END AS url, "
        "CASE doc_id % 7 WHEN 0 THEN 'site0.com' "
        "WHEN 1 THEN 'site0.com' WHEN 2 THEN 'site1.com' "
        "WHEN 3 THEN 'site2.com' WHEN 4 THEN 'site9.com' "
        "WHEN 5 THEN NULL ELSE 'site3.com' END AS host, "
        "CASE doc_id % 7 "
        "WHEN 0 THEN '/p/' || CAST(doc_id % 97 AS VARCHAR) "
        "WHEN 1 THEN '/other/' || CAST(doc_id % 5 AS VARCHAR) "
        "WHEN 2 THEN '/p/' || CAST(doc_id % 23 AS VARCHAR) "
        "WHEN 3 THEN '/' WHEN 4 THEN '/p/' || "
        "CAST(doc_id AS VARCHAR) WHEN 5 THEN NULL "
        "ELSE '/t/x' END AS path FROM documents), "
        f"r AS (SELECT * FROM (VALUES {vals}) "
        "AS t(host, path_prefix, allow)), "
        "m AS (SELECT u.doc_id, r.path_prefix, r.allow, "
        "ROW_NUMBER() OVER (PARTITION BY u.doc_id ORDER BY "
        "length(r.path_prefix) DESC, r.allow DESC) AS rn "
        "FROM u JOIN r ON r.host = u.host "
        "AND starts_with(u.path, r.path_prefix)) "
        "SELECT u.doc_id, u.url, u.host, "
        "m.path_prefix AS matched_prefix, "
        "COALESCE(m.allow, TRUE) AS allowed "
        "FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m "
        "ON m.doc_id = u.doc_id"
    )


ORACLE_SQL["corpus_robots_filter"] = _robots_filter_oracle_sql()


# corpus_anchor_text: like corpus_link_graph, the fixture anchors are
# pure doc_id functions, so the oracle REGENERATES the (dst_host,
# term) table from the same arithmetic ('Link &amp; <d%5>' cleans and
# lowers to 'link', '&', the digit; 'Rel' -> self-edge 'rel'; the
# %4==2 arm sends 'www'/'link' to ext.org) and ranks identically.
ORACLE_SQL["corpus_anchor_text"] = (
    "WITH t AS ("
    "SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' "
    "AS dst_host, 'link' AS term FROM documents "
    "UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com', '&' FROM documents "
    "UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com', CAST(doc_id % 5 AS VARCHAR) FROM documents "
    "UNION ALL SELECT 'host' || CAST(doc_id % 4 AS VARCHAR) || "
    "'.net', 'rel' FROM documents "
    "UNION ALL SELECT 'ext.org', 'www' FROM documents "
    "WHERE doc_id % 4 = 2 "
    "UNION ALL SELECT 'ext.org', 'link' FROM documents "
    "WHERE doc_id % 4 = 2), "
    "c AS (SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) "
    "AS n_links FROM t GROUP BY 1, 2), "
    "r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY dst_host "
    "ORDER BY n_links DESC, term) AS BIGINT) AS rnk FROM c) "
    "SELECT dst_host, term, n_links, rnk FROM r WHERE rnk <= 3"
)


# the shared-link-fixture edge body (graph_pagerank + graph_hits use
# it verbatim; corpus_frontier_score passes its own body)
_LINK_EDGES_SQL = (
    "SELECT doc_id, 'host' || CAST(doc_id % 4 AS VARCHAR) || "
    "'.net' AS src_host, "
    "'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS dst_host "
    "FROM documents "
    "UNION ALL SELECT doc_id, "
    "'host' || CAST(doc_id % 4 AS VARCHAR) || '.net', "
    "'host' || CAST(doc_id % 4 AS VARCHAR) || '.net' "
    "FROM documents "
    "UNION ALL SELECT doc_id, "
    "'host' || CAST(doc_id % 4 AS VARCHAR) || '.net', 'ext.org' "
    "FROM documents WHERE doc_id % 4 = 2"
)


def _pagerank_rounds_sql(
    edges_sql: str, damping: float = 0.85, iters: int = 3
) -> str:
    """The e/eg/wd/nd/nn/p0..p{iters} CTE chain over an edge body —
    the PageRank iterations UNROLLED as CTE pairs with the engine's
    exact rounding/decimal-sum discipline, shared by the
    graph_pagerank and corpus_frontier_score oracles.  The teleport
    numerator is the PYTHON-computed double repr (1.0 - d in IEEE is
    NOT the decimal 0.15 — a bare SQL literal would fold in DECIMAL
    and diverge in the 17th digit).  Returns the CTE list WITHOUT the
    leading WITH or a final SELECT; ranks end in p{iters}(node, pr)."""
    tp = repr(1.0 - damping)
    dp = repr(damping)
    parts = [
        f"e AS ({edges_sql}), "
        "eg AS (SELECT src_host, dst_host, COUNT(*) AS w FROM e "
        "GROUP BY 1, 2), "
        "wd AS (SELECT src_host, SUM(w) AS wd FROM eg GROUP BY 1), "
        "nd AS (SELECT src_host AS node FROM eg "
        "UNION SELECT dst_host FROM eg), "
        "nn AS (SELECT COUNT(*) AS n FROM nd), "
        "p0 AS (SELECT node, ROUND(CAST(1.0 AS DOUBLE) / nn.n, 12) "
        "AS pr FROM nd, nn)"
    ]
    for k in range(1, iters + 1):
        parts.append(
            f", c{k} AS (SELECT eg.dst_host AS node, "
            f"SUM(CAST(ROUND(p{k - 1}.pr * eg.w / wd.wd, 12) "
            "AS DECIMAL(38,12))) AS s "
            f"FROM eg JOIN p{k - 1} ON p{k - 1}.node = eg.src_host "
            "JOIN wd ON wd.src_host = eg.src_host GROUP BY 1), "
            f"p{k} AS (SELECT nd.node, "
            f"ROUND(CAST({tp} AS DOUBLE) / nn.n + "
            f"CAST({dp} AS DOUBLE) * "
            f"COALESCE(CAST(c{k}.s AS DOUBLE), 0.0), 12) AS pr "
            f"FROM nd CROSS JOIN nn "
            f"LEFT JOIN c{k} ON c{k}.node = nd.node)"
        )
    return "".join(parts)


ORACLE_SQL["graph_pagerank"] = (
    f"WITH {_pagerank_rounds_sql(_LINK_EDGES_SQL)} "
    "SELECT node, pr FROM p3"
)


def _hits_oracle_sql(iters: int = 2) -> str:
    """graph_hits oracle — the link-graph edges regenerated from the
    fixture arithmetic, then every HALF-round (spread, total,
    L1-normalize) unrolled as a CTE triple with the engine's exact
    round-then-DECIMAL(38,12)-sum + guarded-division arithmetic."""
    parts = [
        f"WITH e AS ({_LINK_EDGES_SQL}), "
        "eg AS (SELECT src_host, dst_host, COUNT(*) AS w FROM e "
        "GROUP BY 1, 2), "
        "nd AS (SELECT src_host AS node FROM eg "
        "UNION SELECT dst_host FROM eg), "
        "nn AS (SELECT COUNT(*) AS n FROM nd), "
        "h0 AS (SELECT node, ROUND(CAST(1.0 AS DOUBLE) / nn.n, 12) "
        "AS s FROM nd, nn)"
    ]
    half = 0
    prev = "h0"
    for _ in range(iters):
        for jk, gk, out in (
            ("src_host", "dst_host", "a"),
            ("dst_host", "src_host", "h"),
        ):
            half += 1
            parts.append(
                f", c{half} AS (SELECT eg.{gk} AS g, "
                f"SUM(CAST(ROUND({prev}.s * eg.w, 12) "
                "AS DECIMAL(38,12))) AS r "
                f"FROM eg JOIN {prev} ON {prev}.node = eg.{jk} "
                "GROUP BY 1), "
                f"t{half} AS (SELECT CAST(SUM(r) AS DECIMAL(38,12)) "
                f"AS t FROM c{half}), "
                f"{out}{half} AS (SELECT nd.node, "
                f"CASE WHEN t{half}.t > 0 THEN "
                f"ROUND(COALESCE(CAST(c{half}.r AS DOUBLE), 0.0) / "
                f"CAST(t{half}.t AS DOUBLE), 12) ELSE 0.0 END AS s "
                f"FROM nd CROSS JOIN t{half} "
                f"LEFT JOIN c{half} ON c{half}.g = nd.node)"
            )
            prev = f"{out}{half}"
    a_final = f"a{half - 1}"
    h_final = f"h{half}"
    parts.append(
        f" SELECT nd.node, {h_final}.s AS hub, {a_final}.s AS auth "
        f"FROM nd JOIN {h_final} ON {h_final}.node = nd.node "
        f"JOIN {a_final} ON {a_final}.node = nd.node"
    )
    return "".join(parts)


ORACLE_SQL["graph_hits"] = _hits_oracle_sql()


def _frontier_score_oracle_sql() -> str:
    """corpus_frontier_score oracle — every component REGENERATED
    independently: the frontier edges from the fixture arithmetic fed
    through the shared `_pagerank_rounds_sql` chain (2 rounds -> p2),
    the blocklist as the doc_id%7<>5 predicate, ROBOTS_RULES as a
    VALUES CTE with the ROW_NUMBER (len DESC, allow DESC) longest
    match, the URL_WORD_WEIGHTS sum via `_url_word_terms_sql`, and
    the per-(host, digit-template) row counts — then the one fused
    score/keep expression in the engine's exact operand order
    ((10·pr + url_score) - 0.5·ln(1+n_seen), ROUND 6)."""
    vals = ", ".join(
        f"('{h}', '{p}', {'TRUE' if a else 'FALSE'})"
        for h, p, a in ROBOTS_RULES
    )
    arm = (
        "CASE doc_id % 5 WHEN 0 THEN 'wiki' WHEN 1 THEN 'casino' "
        "WHEN 2 THEN 'news' WHEN 3 THEN 'download' ELSE 'blog' END"
    )
    edges = (
        "SELECT doc_id, 'host' || CAST(doc_id % 4 AS VARCHAR) || "
        "'.net' AS src_host, "
        "'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS dst_host "
        "FROM documents"
    )
    return (
        f"WITH {_pagerank_rounds_sql(edges, iters=2)}, "
        "cand AS (SELECT doc_id, "
        "'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.com/' || "
        f"{arm} || '/p/' || CAST(doc_id % 50 AS VARCHAR) AS href, "
        "'site' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host, "
        f"'/' || {arm} || '/p/' || CAST(doc_id % 50 AS VARCHAR) "
        "AS path FROM documents WHERE doc_id % 7 <> 5), "
        f"r AS (SELECT * FROM (VALUES {vals}) "
        "AS t(host, path_prefix, allow)), "
        "m AS (SELECT cand.doc_id, r.allow, ROW_NUMBER() OVER ("
        "PARTITION BY cand.doc_id ORDER BY length(r.path_prefix) "
        "DESC, r.allow DESC) AS rn FROM cand JOIN r "
        "ON r.host = cand.host "
        "AND starts_with(cand.path, r.path_prefix)), "
        "al AS (SELECT cand.doc_id, cand.href, cand.host, "
        "COALESCE(m.allow, TRUE) AS allowed FROM cand "
        "LEFT JOIN (SELECT * FROM m WHERE rn = 1) m "
        "ON m.doc_id = cand.doc_id), "
        "sc AS (SELECT doc_id, href, host, allowed, "
        f"0.0 + {_url_word_terms_sql('lower(href)')} AS s FROM al), "
        "tpl AS (SELECT host AS th, "
        "regexp_replace(href, '[0-9]+', '{n}', 'g') AS tt, "
        "CAST(COUNT(*) AS BIGINT) AS n_seen FROM al GROUP BY 1, 2), "
        "j AS (SELECT sc.href, sc.host, "
        "COALESCE(p2.pr, CAST(0.0 AS DOUBLE)) AS host_pr, "
        "ROUND(sc.s, 6) AS url_score, tpl.n_seen, sc.allowed "
        "FROM sc JOIN tpl ON tpl.th = sc.host "
        "AND tpl.tt = regexp_replace(sc.href, '[0-9]+', '{n}', 'g') "
        "LEFT JOIN p2 ON p2.node = sc.host), "
        "fin AS (SELECT *, "
        "ROUND(CAST(10.0 AS DOUBLE) * host_pr + url_score - "
        "CAST(0.5 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE) + "
        "CAST(n_seen AS DOUBLE)), 6) AS frontier_score FROM j) "
        "SELECT DISTINCT href, host, host_pr, url_score, n_seen, "
        "allowed, frontier_score, "
        "(allowed AND frontier_score > CAST(0.0 AS DOUBLE)) AS keep "
        "FROM fin"
    )


ORACLE_SQL["corpus_frontier_score"] = _frontier_score_oracle_sql()

ORACLE_SQL["html_outline"] = _html_outline_oracle_sql()

ORACLE_SQL["html_main_content"] = _html_main_oracle_sql()

assert "' body paragraph tail &amp; more.</p>'" in _HTML_PAGE_SQL, (
    "html page synth drifted"
)
_HTML_CTX_PAGE_SQL = _HTML_PAGE_SQL.replace(
    "' body paragraph tail &amp; more.</p>'",
    "' body paragraph tail &amp; more.</p><h3>Mid section</h3>'",
)
ORACLE_SQL["html_main_content_ctx"] = (
    f"WITH {_html_main_ctes(_HTML_CTX_PAGE_SQL, ctx=True)} "
    "SELECT doc_id, main_text, n_blocks, n_good, link_frac FROM mc"
)

ORACLE_SQL["media_cdc_dedup"] = (
    f"WITH {_DUPES}, "
    "blobs AS (SELECT doc_id, "
    f"  hex(encode('{_MEDIA_HDR}' || text)) AS hx FROM corpus "
    "  UNION ALL SELECT doc_id + 3000000, "
    f"  hex(encode('Z{_MEDIA_HDR}' || text)) AS hx FROM corpus "
    "  WHERE doc_id % 60 = 0 AND doc_id < 1000000), "
    "b AS (SELECT doc_id, hx, length(hx) // 2 AS n FROM blobs), "
    "bp AS (SELECT doc_id, hx, n, "
    "  list_filter(generate_series(8, greatest(n, 8)), "
    "    i -> i <= n AND substr(md5(substr(hx, (i - 8) * 2 + 1, 16)), "
    "      1, 1) = '0') AS bl FROM b), "
    "en AS (SELECT doc_id, hx, n, "
    "  CASE WHEN len(bl) > 0 AND bl[-1] = n THEN bl "
    "  ELSE list_append(bl, n) END AS el FROM bp), "
    "ch AS (SELECT doc_id, md5(substr(hx, "
    "  COALESCE(el[j - 1], 0) * 2 + 1, "
    "  (el[j] - COALESCE(el[j - 1], 0)) * 2)) AS h "
    "  FROM en, UNNEST(generate_series(1, len(el))) AS g(j) "
    "  WHERE n > 0), "
    "cx AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS sh FROM ch "
    "  GROUP BY h), "
    "pd AS (SELECT doc_id, COUNT(*) AS nc, "
    "  SUM(CASE WHEN sh THEN 1 ELSE 0 END) AS ns "
    "  FROM ch JOIN cx USING (h) GROUP BY doc_id) "
    "SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_bytes, "
    "  CAST(COALESCE(pd.nc, 0) AS BIGINT) AS n_chunks, "
    "  CAST(COALESCE(pd.ns, 0) AS BIGINT) AS n_shared_chunks, "
    "  CASE WHEN COALESCE(pd.nc, 0) > 0 THEN "
    "    ROUND(pd.ns / CAST(pd.nc AS DOUBLE), 6) ELSE 0.0 END "
    "    AS shared_frac "
    "FROM b LEFT JOIN pd ON pd.doc_id = b.doc_id"
)

ORACLE_SQL["media_chunk_dedup"] = (
    f"WITH {_DUPES}, "
    "hxd AS (SELECT doc_id, "
    f"  hex(encode('{_MEDIA_HDR}' || text)) AS hx FROM corpus), "
    "ch AS (SELECT doc_id, "
    "  md5(substring(hx, (i - 1) * 128 + 1, 128)) AS h "
    "  FROM hxd, UNNEST(generate_series(1, "
    "    CAST(ceil(len(hx) / 128) AS INT))) AS g(i) "
    "  WHERE len(hx) > 0), "
    "crossh AS (SELECT h, MIN(doc_id) <> MAX(doc_id) AS is_shared "
    "  FROM ch GROUP BY h), "
    "pd AS (SELECT ch.doc_id, COUNT(*) AS n_chunks, "
    "  SUM(CASE WHEN is_shared THEN 1 ELSE 0 END) AS n_shared_chunks "
    "  FROM ch JOIN crossh USING (h) GROUP BY ch.doc_id) "
    "SELECT x.doc_id, CAST(len(x.hx) / 2 AS BIGINT) AS n_bytes, "
    "CAST(COALESCE(n_chunks, 0) AS BIGINT) AS n_chunks, "
    "CAST(COALESCE(n_shared_chunks, 0) AS BIGINT) AS n_shared_chunks, "
    "ROUND(CASE WHEN COALESCE(n_chunks, 0) > 0 "
    "  THEN COALESCE(n_shared_chunks, 0) / n_chunks "
    "  ELSE 0.0 END, 6) AS shared_frac "
    "FROM hxd x LEFT JOIN pd ON pd.doc_id = x.doc_id"
)

# events_funnel: the same fixture filter/tie-floor arms, then the
# funnel's two staged running-min windows (default RANGE frame — ties
# all visible; strict `<` enforces the order) and the per-user min
# aggregation; us_to_convert as an exact epoch_us BIGINT difference.
ORACLE_SQL["events_funnel"] = (
    "WITH base AS (SELECT user_id, "
    "  CASE WHEN user_id % 7 = 3 AND event_type IN ('view', 'click') "
    "    THEN date_trunc('hour', ts) ELSE ts END AS ts, event_type "
    "  FROM events "
    "  WHERE NOT (user_id % 5 = 0 AND event_type = 'click') "
    "    AND NOT (user_id % 5 = 1 AND event_type = 'purchase') "
    "    AND event_type IN ('view', 'click', 'purchase')), "
    "s1 AS (SELECT user_id, ts, event_type, "
    "  MIN(CASE WHEN event_type = 'view' THEN ts END) OVER "
    "    (PARTITION BY user_id ORDER BY ts "
    "     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1 "
    "  FROM base), "
    "s2 AS (SELECT user_id, ts, event_type, r1, "
    "  MIN(CASE WHEN event_type = 'click' AND r1 < ts THEN ts END) "
    "    OVER (PARTITION BY user_id ORDER BY ts "
    "     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2 "
    "  FROM s1), "
    "f AS (SELECT user_id, "
    "  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_1, "
    "  MIN(CASE WHEN event_type = 'click' AND r1 < ts THEN ts END) "
    "    AS t_2, "
    "  MIN(CASE WHEN event_type = 'purchase' AND r2 < ts THEN ts END) "
    "    AS t_3 "
    "  FROM s2 GROUP BY user_id) "
    "SELECT user_id, t_1, t_2, t_3, "
    "CAST(CASE WHEN t_3 IS NOT NULL THEN 3 "
    "  WHEN t_2 IS NOT NULL THEN 2 "
    "  WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS depth, "
    "t_3 IS NOT NULL AS converted, "
    "CASE WHEN t_3 IS NOT NULL THEN epoch_us(t_3) - epoch_us(t_1) END "
    "  AS us_to_convert "
    "FROM f"
)

# events_retention: the same churn-slice arms, then all-integer day
# arithmetic — epoch-anchored cohort period, per-user period offset
# (both floor DIV 7), distinct-user matrix, cohort size via the
# offset-0 window, one final division ROUND 6.
ORACLE_SQL["events_retention"] = (
    "WITH base AS (SELECT user_id AS u, CAST(ts AS DATE) AS d "
    "  FROM events WHERE day(ts) BETWEEN 1 + (user_id % 3) * 7 "
    "    AND 1 + (user_id % 3) * 7 + (user_id % 5) * 6 + 2), "
    "f AS (SELECT u, MIN(d) AS d0 FROM base GROUP BY u), "
    "s AS (SELECT base.u, "
    "  CAST(datediff('day', DATE '1970-01-01', d0) // 7 AS BIGINT) "
    "    AS cp, "
    "  CAST(datediff('day', d0, d) // 7 AS BIGINT) AS po "
    "  FROM base JOIN f USING (u)), "
    "m AS (SELECT cp, po, CAST(COUNT(DISTINCT u) AS BIGINT) "
    "  AS n_users FROM s GROUP BY cp, po), "
    "w AS (SELECT cp, po, n_users, "
    "  MAX(CASE WHEN po = 0 THEN n_users END) "
    "    OVER (PARTITION BY cp) AS cohort_size FROM m) "
    "SELECT DATE '1970-01-01' + CAST(cp * 7 AS INT) AS cohort_start, "
    "po AS period_offset, n_users, cohort_size, "
    "ROUND(n_users / CAST(cohort_size AS DOUBLE), 6) AS retention "
    "FROM w"
)

# text_dehyphenate: the same %4 injection arms, then the identical
# three fixed-order passes with length-trick counts on each pass's
# input; RE2 replacement backreferences (\1\2), newline/tab/soft-
# hyphen as chr() literals so the SQL carries no invisible bytes.
ORACLE_SQL["text_dehyphenate"] = (
    "WITH inj AS (SELECT doc_id, text || CASE doc_id % 4 "
    "  WHEN 0 THEN ' hy-' || chr(10) || 'phen and line-' || chr(10) "
    "    || 'break repairs' "
    "  WHEN 1 THEN ' soft' || chr(173) || 'hyphen he' || chr(173) "
    "    || 're' "
    "  WHEN 2 THEN ' trail  ' || chr(9) || chr(10) || 'next line' "
    "  ELSE ' keep - it A-' || chr(10) || 'B 3-' || chr(10) "
    "    || '4 a-' || chr(10) || 'b-' || chr(10) || 'c' END AS t "
    "  FROM documents), "
    "s0 AS (SELECT doc_id, COALESCE(t, '') AS s FROM inj), "
    "p1 AS (SELECT doc_id, "
    "  length(s) - length(replace(s, chr(173), '')) AS n_soft, "
    "  replace(s, chr(173), '') AS s1 FROM s0), "
    "p2 AS (SELECT doc_id, n_soft, "
    "  (length(s1) - length(regexp_replace(s1, "
    "    '([a-z])-\\n([a-z])', '\\1\\2', 'g'))) // 2 AS n_joins, "
    "  regexp_replace(s1, '([a-z])-\\n([a-z])', '\\1\\2', 'g') AS s2 "
    "  FROM p1), "
    "p3 AS (SELECT doc_id, n_soft, n_joins, "
    "  length(s2) - length(regexp_replace(s2, '[ \\t]+\\n', chr(10), "
    "    'g')) AS n_trail, "
    "  regexp_replace(s2, '[ \\t]+\\n', chr(10), 'g') AS s3 FROM p2) "
    "SELECT doc_id, md5(s3) AS fixed_md5, "
    "CAST(n_soft AS BIGINT) AS n_soft_hyphens, "
    "CAST(n_joins AS BIGINT) AS n_line_joins, "
    "CAST(n_trail AS BIGINT) AS n_trail_ws, "
    "n_joins > 0 AS had_hyphenation FROM p3"
)


def _code_stats_oracle_sql() -> str:
    """Regenerated from CODE_SYMBOLS/CODE_KEYWORDS/_CODE_ARMS (the
    langid pattern: one table, two engines); newlines in the arms are
    rewritten to chr(10) concatenation so the SQL carries no
    control bytes."""
    from .operators.text import CODE_KEYWORDS, CODE_SYMBOLS

    def lit(s: str) -> str:
        return (
            "'"
            + s.replace("'", "''")
            .replace("\t", "' || chr(9) || '")
            .replace("\n", "' || chr(10) || '")
            + "'"
        )

    sym = " + ".join(
        f"(length(s) - length(replace(s, '{c}', '')))"
        for c in CODE_SYMBOLS
    )
    kw = " + ".join(
        f"(length(s) - length(replace(s, {lit(k)}, ''))) // {len(k)}"
        for k in CODE_KEYWORDS
    )
    arms = " ".join(
        f"WHEN {i} THEN substr(text, 1, 40) || {lit(a)}"
        for i, a in enumerate(_CODE_ARMS, start=1)
    )
    return (
        f"WITH inj AS (SELECT doc_id, CASE doc_id % 4 {arms} "
        "  ELSE substr(text, 1, 40) END AS s FROM documents), "
        f"c AS (SELECT doc_id, s, CAST({sym} AS BIGINT) AS n_symbols, "
        f"  CAST({kw} AS BIGINT) AS kw_hits, "
        "  CASE WHEN length(s) > 0 THEN "
        "    length(s) - length(replace(s, chr(10), '')) + 1 "
        "    ELSE 0 END AS n_lines, "
        "  (length(s) - length(replace(s, chr(10) || '    ', ''))) "
        "    // 5 "
        "  + (length(s) - length(replace(s, chr(10) || chr(9), ''))) "
        "    // 2 "
        "  + CASE WHEN substr(s, 1, 4) = '    ' "
        "      OR substr(s, 1, 1) = chr(9) THEN 1 ELSE 0 END "
        "    AS n_ind, "
        "  position('```' IN s) > 0 AS has_fence FROM inj), "
        "f AS (SELECT doc_id, n_symbols, "
        "  CASE WHEN length(s) > 0 THEN "
        "    ROUND(n_symbols / CAST(length(s) AS DOUBLE), 6) "
        "    ELSE 0.0 END AS symbol_frac, "
        "  kw_hits, CAST(n_lines AS BIGINT) AS n_lines, "
        "  CASE WHEN n_lines > 0 THEN "
        "    ROUND(n_ind / CAST(n_lines AS DOUBLE), 6) "
        "    ELSE 0.0 END AS indent_frac, "
        "  has_fence FROM c) "
        "SELECT doc_id, n_symbols, symbol_frac, kw_hits, n_lines, "
        "indent_frac, has_fence, "
        "(has_fence OR (symbol_frac >= 0.03 AND kw_hits >= 2) "
        "  OR indent_frac >= 0.4) AS is_code FROM f"
    )


ORACLE_SQL["text_code_detect"] = _code_stats_oracle_sql()

# corpus_inverted_index: same ws-noise corpus + lowered ws-run tokens
# (the tfidf tokenization), (token, doc) and token aggregations, df
# BETWEEN pruning, ROW_NUMBER over (tf DESC, doc_id) capped at 3.
ORACLE_SQL["corpus_inverted_index"] = (
    "WITH wsbase AS (SELECT doc_id, "
    f"text || {_WS_NOISE_SQL} AS text FROM documents), "
    "tk AS (SELECT doc_id, unnest(list_transform(list_filter("
    "regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
    "w -> lower(w))) AS token FROM wsbase), "
    "tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
    "  FROM tk GROUP BY doc_id, token), "
    "dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs "
    "  FROM tf GROUP BY token "
    "  HAVING COUNT(*) BETWEEN 2 AND 400), "
    "rk AS (SELECT f.token, d.df_docs, f.doc_id, f.tf, "
    "  CAST(ROW_NUMBER() OVER (PARTITION BY f.token "
    "    ORDER BY f.tf DESC, f.doc_id) AS BIGINT) AS \"rank\" "
    "  FROM tf f JOIN dfq d ON f.token = d.token) "
    "SELECT token, df_docs, doc_id, tf, \"rank\" FROM rk "
    "WHERE \"rank\" <= 3"
)

# WARC parsing CTE chain over an existing arcs(doc_id, arc) + c(nl)
# pair — version-line split with rec_no = i-1 indexing, header
# regexes over the before-blank-line fragment only, the validity
# rule — ending in wv(doc_id, rec_no, b, ba, warc_type, target_uri,
# warc_date, content_length, is_valid); w-prefixed CTE names so the
# chain composes with _html_main_ctes (which owns bl/s/d).  Shared
# by the corpus_warc_records and corpus_warc_extract oracles.
_CRLF_SQL = "chr(13) || chr(10)"
_WARC_CHAIN_SQL = (
    "wbl AS (SELECT doc_id, "
    "  string_split_regex(arc, 'WARC/1\\.0') AS arr FROM arcs), "
    "wrc AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS rec_no, "
    "  arr[i] AS b FROM wbl, "
    "  UNNEST(generate_series(2, len(arr))) AS g(i)), "
    "wpr AS (SELECT doc_id, rec_no, b, "
    "  position((nl || nl) IN b) AS ba, "
    "  CASE WHEN position((nl || nl) IN b) > 0 "
    "    THEN substr(b, 1, position((nl || nl) IN b) - 1) "
    "    ELSE b END AS hdr FROM wrc, c), "
    "wf AS (SELECT doc_id, rec_no, b, ba, "
    "  NULLIF(regexp_extract(hdr, 'WARC-Type: ([^\\r\\n]+)', 1), '') "
    "    AS warc_type, "
    "  NULLIF(regexp_extract(hdr, "
    "    'WARC-Target-URI: ([^\\r\\n]+)', 1), '') AS target_uri, "
    "  NULLIF(regexp_extract(hdr, 'WARC-Date: ([^\\r\\n]+)', 1), '') "
    "    AS warc_date, "
    "  CASE WHEN regexp_extract(hdr, 'Content-Length: ([0-9]+)', 1) "
    "    <> '' THEN CAST(regexp_extract(hdr, "
    "    'Content-Length: ([0-9]+)', 1) AS BIGINT) END "
    "    AS content_length FROM wpr), "
    "wv AS (SELECT *, (target_uri IS NOT NULL "
    "  AND content_length IS NOT NULL AND ba > 0) AS is_valid FROM wf)"
)

# corpus_warc_records: the same synthesized archives (CRLF as
# chr(13)||chr(10) so the SQL carries no control bytes) + the shared
# parsing chain; absent-and-blank headers both NULL via NULLIF.
ORACLE_SQL["corpus_warc_records"] = (
    f"WITH c AS (SELECT {_CRLF_SQL} AS nl FROM (VALUES (1))), "
    "base AS (SELECT doc_id, substr(text, 1, 60) AS p1, "
    "  'https://ex' || CAST(doc_id % 20 AS VARCHAR) || '.org/p/' || "
    "  CAST(doc_id AS VARCHAR) AS uri FROM documents), "
    "lens AS (SELECT doc_id, p1, uri, "
    "  CASE WHEN doc_id % 5 = 0 THEN greatest(length(p1) - 10, 0) "
    "  ELSE length(p1) END AS l1 FROM base), "
    "arcs AS (SELECT doc_id, "
    "  'WARC/1.0' || nl || 'WARC-Type: response' || nl || "
    "  'WARC-Target-URI: ' || uri || nl || "
    "  'WARC-Date: 2024-01-15T00:00:00Z' || nl || "
    "  'Content-Length: ' || CAST(l1 AS VARCHAR) || nl || nl || "
    "  p1 || nl || nl || "
    "  CASE WHEN doc_id % 3 = 0 THEN "
    "    'WARC/1.0' || nl || 'WARC-Type: request' || nl || "
    "    'WARC-Target-URI: ' || uri || nl || "
    "    'WARC-Date: 2024-01-15T00:00:01Z' || nl || "
    "    'Content-Length: 14' || nl || nl || "
    "    'GET / HTTP/1.1' || nl || nl ELSE '' END || "
    "  CASE WHEN doc_id % 7 = 0 THEN "
    "    'WARC/1.0' || nl || 'WARC-Type: metadata' || nl || "
    "    'No-Uri: x' || nl || nl || 'junk' ELSE '' END AS arc "
    "  FROM lens, c), "
    f"{_WARC_CHAIN_SQL} "
    "SELECT doc_id, rec_no, warc_type, target_uri, warc_date, "
    "content_length, "
    "CASE WHEN is_valid THEN "
    "  md5(substr(substr(b, ba + 4), 1, content_length)) END "
    "  AS payload_md5, is_valid FROM wv"
)

# events_session_paths: sessionize's integer-µs gap cumsum (the
# events_sessionize oracle fragment at gap 720 min = 43.2e9 µs), then
# 3-grams via leads ordered (ts, event_id) within (user, session),
# complete paths only, count + the same deterministic top-k.
ORACLE_SQL["events_session_paths"] = (
    "WITH o AS (SELECT user_id, ts, event_id, event_type, "
    "  CASE WHEN lag(ts) OVER w IS NULL "
    "    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000 "
    "  THEN 1 ELSE 0 END AS ns "
    "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, ts, event_id, event_type, "
    "  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts "
    "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no FROM o), "
    "p AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2 "
    "  || '>' || lead(event_type, 2) OVER w2 AS path, "
    "  lead(event_type, 2) OVER w2 AS l2 FROM s "
    "  WINDOW w2 AS (PARTITION BY user_id, session_no "
    "    ORDER BY ts, event_id)) "
    "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM p "
    "WHERE l2 IS NOT NULL GROUP BY path "
    "ORDER BY n_occurrences DESC, path LIMIT 25"
)

# events_rate_spikes: same x5 burst injection, integer hour slots
# (epoch_us floor-div), RANGE 24..1 PRECEDING trailing window over
# the aggregated table, and the all-integer cross-multiplied rule.
ORACLE_SQL["events_rate_spikes"] = (
    "WITH burst AS (SELECT ts, event_type FROM events "
    "  WHERE day(ts) = 20 AND hour(ts) = 12 "
    "    AND event_type = 'error'), "
    "all_e AS (SELECT ts, event_type FROM events "
    "  UNION ALL SELECT ts, event_type FROM burst, "
    "    UNNEST(generate_series(1, 4)) AS g(i)), "
    "h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS slot, "
    "  COUNT(*) AS n FROM all_e GROUP BY 1, 2), "
    "t AS (SELECT event_type, slot, n, "
    "  COUNT(*) OVER w AS th, COALESCE(SUM(n) OVER w, 0) AS tsum "
    "  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY slot "
    "    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)) "
    "SELECT event_type, make_timestamp(slot * 3600000000) "
    "  AS hour_start, CAST(n AS BIGINT) AS n_events, "
    "CAST(th AS BIGINT) AS trailing_hours, "
    "CAST(tsum AS BIGINT) AS trailing_sum, "
    "(th >= 12 AND n * th > 3 * tsum) AS is_spike FROM t"
)

# corpus_robots_rules: the same %4 fixture (control bytes as chr()),
# line split + CR strip + comment cut + [ \t] trims, directive/value
# extracts (single-line input, so Java-$ vs RE2 drift cannot arise),
# lag+cumsum grouping, agent fan-out join, sitemap agent-NULL union.
ORACLE_SQL["corpus_robots_rules"] = (
    "WITH src AS (SELECT 'site' || CAST(doc_id AS VARCHAR) || '.org' "
    "  AS host, CASE doc_id % 4 "
    "  WHEN 0 THEN 'User-Agent: *' || chr(10) || "
    "    'Disallow: /private/' || chr(10) || 'Allow: /private/ok' || "
    "    chr(10) || 'Crawl-Delay: 2' || chr(10) || "
    "    'Sitemap: https://maps.example/s.xml' "
    "  WHEN 1 THEN '# header' || chr(13) || chr(10) || "
    "    'User-agent: googlebot' || chr(13) || chr(10) || "
    "    'User-Agent: bingbot' || chr(13) || chr(10) || "
    "    'Disallow: /a # note' || chr(13) || chr(10) || chr(13) || "
    "    chr(10) || 'User-agent: *' || chr(13) || chr(10) || "
    "    'Allow:' || chr(13) || chr(10) "
    "  WHEN 2 THEN 'Disallow: /early' || chr(10) || "
    "    'User-Agent: *' || chr(10) || 'Disallow: /x' "
    "  ELSE 'USER-AGENT:' || chr(9) || '*' || chr(10) || "
    "    'DISALLOW:' || chr(9) || '/Tab  ' END AS txt FROM documents), "
    "sp AS (SELECT host, string_split(txt, chr(10)) AS arr FROM src), "
    "ln AS (SELECT host, CAST(i AS BIGINT) AS line_no, "
    "  regexp_replace(regexp_replace(replace(arr[i], chr(13), ''), "
    "    '#.*', ''), '^[ \\t]+|[ \\t]+$', '', 'g') AS s "
    "  FROM sp, UNNEST(generate_series(1, len(arr))) AS g(i)), "
    "d AS (SELECT host, line_no, "
    "  lower(regexp_extract(s, '^([A-Za-z][A-Za-z-]*)[ \\t]*:', 1)) "
    "    AS directive, "
    "  regexp_replace(regexp_extract(s, "
    "    '^[A-Za-z][A-Za-z-]*[ \\t]*:(.*)$', 1), "
    "    '^[ \\t]+|[ \\t]+$', '', 'g') AS value FROM ln), "
    "bd AS (SELECT *, CASE WHEN directive = 'user-agent' "
    "  AND NOT COALESCE(lag(directive = 'user-agent') OVER w, FALSE) "
    "  THEN 1 ELSE 0 END AS b FROM d "
    "  WINDOW w AS (PARTITION BY host ORDER BY line_no)), "
    "grp AS (SELECT *, CAST(SUM(b) OVER (PARTITION BY host "
    "  ORDER BY line_no ROWS UNBOUNDED PRECEDING) AS BIGINT) "
    "  AS group_no FROM bd), "
    "ag AS (SELECT host, group_no, lower(value) AS agent FROM grp "
    "  WHERE directive = 'user-agent'), "
    "ru AS (SELECT host, group_no, line_no, directive, value "
    "  FROM grp WHERE directive IN ('allow', 'disallow', "
    "  'crawl-delay') AND group_no >= 1) "
    "SELECT ru.host, ru.group_no, ag.agent, ru.line_no, "
    "  ru.directive, ru.value "
    "FROM ru JOIN ag ON ru.host = ag.host "
    "  AND ru.group_no = ag.group_no "
    "UNION ALL SELECT host, CAST(NULL AS BIGINT), "
    "  CAST(NULL AS VARCHAR), line_no, 'sitemap', value FROM grp "
    "WHERE directive = 'sitemap'"
)


def _license_oracle_sql() -> str:
    """Regenerated from LICENSE_MARKERS/OPEN_LICENSES in TABLE ORDER
    (first-match = the engine's priority rule, one site)."""
    from .operators.text import LICENSE_MARKERS, OPEN_LICENSES

    first = " ".join(
        f"WHEN position('{m}' IN s) > 0 THEN '{lic}'"
        for lic, m in LICENSE_MARKERS
    )
    n = " + ".join(
        f"CASE WHEN position('{m}' IN s) > 0 THEN 1 ELSE 0 END"
        for _, m in LICENSE_MARKERS
    )
    open_list = ", ".join(f"'{x}'" for x in sorted(OPEN_LICENSES))
    return (
        "WITH inj AS (SELECT doc_id, substr(text, 1, 50) || "
        "CASE doc_id % 6 "
        "WHEN 1 THEN ' Licensed under a Creative Commons "
        "Attribution-ShareAlike 4.0 license. CC BY-SA.' "
        "WHEN 2 THEN ' © 2024 Example Corp. All Rights Reserved.' "
        "WHEN 3 THEN ' Released into the public domain (CC0).' "
        "WHEN 4 THEN ' distributed under the MIT License and the "
        "Apache License 2.0' "
        "WHEN 5 THEN ' copyright notice without a grant' "
        "ELSE '' END AS t FROM documents), "
        "b AS (SELECT doc_id, lower(COALESCE(t, '')) AS s FROM inj), "
        f"f AS (SELECT doc_id, s, CASE {first} END AS license, "
        f"CAST({n} AS BIGINT) AS n_license_markers FROM b) "
        "SELECT doc_id, license, n_license_markers, "
        "(position('©' IN s) > 0 OR position('copyright' IN s) > 0) "
        "  AS has_copyright, "
        f"COALESCE(license IN ({open_list}), FALSE) "
        "  AS is_openly_licensed FROM f"
    )


ORACLE_SQL["text_license_detect"] = _license_oracle_sql()

# corpus_sitemap_diff: the sitemap entry chain REUSED VERBATIM as a
# CTE (one site), the same crawl arms, DISTINCT sides, FULL OUTER.
ORACLE_SQL["corpus_sitemap_diff"] = (
    "WITH sm AS (" + _corpus_sitemap_oracle_sql() + "), "
    "s AS (SELECT DISTINCT loc AS url FROM sm WHERE NOT is_index), "
    "cr AS (SELECT 'https://www.Site' || CAST(doc_id % 7 AS VARCHAR) "
    "  || '.com/page/' || CAST(doc_id % 50 AS VARCHAR) || '?a=1&b=2' "
    "  AS url FROM documents WHERE doc_id % 2 = 0 "
    "UNION SELECT 'https://only-crawl.org/' || "
    "  CAST(doc_id % 30 AS VARCHAR) FROM documents "
    "  WHERE doc_id % 3 = 0), "
    "j AS (SELECT COALESCE(s.url, cr.url) AS url, "
    "  s.url IS NOT NULL AS in_sitemap, "
    "  cr.url IS NOT NULL AS crawled "
    "  FROM s FULL OUTER JOIN cr ON s.url = cr.url) "
    "SELECT url, in_sitemap, crawled, "
    "CASE WHEN in_sitemap AND crawled THEN 'covered' "
    "WHEN in_sitemap THEN 'uncrawled_seed' "
    "ELSE 'orphan_page' END AS status FROM j"
)

# graph_degree_stats: the link-graph oracle reused VERBATIM as a CTE
# (one site) + the %5 reverse arm, re-aggregated pairs, then pure-
# integer degree/reciprocity arithmetic (self-loops excluded from
# reciprocity, flagged separately).
ORACLE_SQL["graph_degree_stats"] = (
    "WITH g AS (" + ORACLE_SQL["corpus_link_graph"] + "), "
    "e0 AS (SELECT src_host, dst_host, n_links FROM g "
    "  UNION ALL SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || "
    "  '.com', 'host' || CAST(doc_id % 4 AS VARCHAR) || '.net', 1 "
    "  FROM documents WHERE doc_id % 5 = 0), "
    "e AS (SELECT src_host AS s, dst_host AS d, "
    "  CAST(SUM(n_links) AS BIGINT) AS w FROM e0 GROUP BY 1, 2), "
    "o AS (SELECT s AS host, COUNT(*) AS od, SUM(w) AS ow "
    "  FROM e GROUP BY s), "
    "i AS (SELECT d AS host, COUNT(*) AS ind, SUM(w) AS iw "
    "  FROM e GROUP BY d), "
    "ne AS (SELECT s, d FROM e WHERE s <> d), "
    "r AS (SELECT a.s AS host, COUNT(*) AS nr FROM ne AS a "
    "  JOIN ne AS b ON a.s = b.d AND a.d = b.s GROUP BY a.s), "
    "l AS (SELECT DISTINCT s AS host, TRUE AS lp FROM e "
    "  WHERE s = d), "
    "h AS (SELECT COALESCE(o.host, i.host) AS host, od, ind, ow, iw "
    "  FROM o FULL OUTER JOIN i ON o.host = i.host) "
    "SELECT h.host, CAST(COALESCE(od, 0) AS BIGINT) AS out_degree, "
    "CAST(COALESCE(ind, 0) AS BIGINT) AS in_degree, "
    "CAST(COALESCE(ow, 0) AS BIGINT) AS out_weight, "
    "CAST(COALESCE(iw, 0) AS BIGINT) AS in_weight, "
    "CAST(COALESCE(nr, 0) AS BIGINT) AS n_reciprocal, "
    "COALESCE(lp, FALSE) AS has_self_loop "
    "FROM h LEFT JOIN r ON h.host = r.host "
    "LEFT JOIN l ON h.host = l.host"
)

# text_vocab_coverage: same ws-noise tokens, top-50 vocab with the
# (count DESC, token) deterministic boundary, IN-vocab counting.
ORACLE_SQL["text_vocab_coverage"] = (
    "WITH wsbase AS (SELECT doc_id, "
    f"text || {_WS_NOISE_SQL} AS text FROM documents), "
    "tk AS (SELECT doc_id, unnest(list_transform(list_filter("
    "regexp_split_to_array(text, " + _WSRE2 + "), t -> t <> ''), "
    "w -> lower(w))) AS token FROM wsbase), "
    "vc AS (SELECT token FROM (SELECT token, COUNT(*) AS n FROM tk "
    "  GROUP BY token ORDER BY n DESC, token LIMIT 50)), "
    "ag AS (SELECT doc_id, COUNT(*) AS nt, "
    "  SUM(CASE WHEN token IN (SELECT token FROM vc) THEN 1 "
    "  ELSE 0 END) AS niv FROM tk GROUP BY doc_id) "
    "SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, "
    "CAST(niv AS BIGINT) AS n_in_vocab, "
    "ROUND((nt - niv) / CAST(nt AS DOUBLE), 6) AS oov_frac FROM ag"
)

# events_ab_lift: same pre-split conversion skew, the salted-md5 hex
# parity arms, integer conditional sums, single-division rates/lift.
ORACLE_SQL["events_ab_lift"] = (
    "WITH e AS (SELECT user_id, event_type FROM events "
    "  WHERE NOT (user_id % 3 = 0 AND event_type = 'purchase')), "
    "pu AS (SELECT user_id, MAX(CASE WHEN event_type = 'purchase' "
    "  THEN 1 ELSE 0 END) AS conv FROM e GROUP BY user_id), "
    "a AS (SELECT substr(md5('ab1' || CAST(user_id AS VARCHAR)), "
    "  1, 1) AS hx, conv FROM pu), "
    "g AS (SELECT "
    "  SUM(CASE WHEN hx < '8' THEN 1 ELSE 0 END) AS nt, "
    "  SUM(CASE WHEN hx < '8' THEN conv ELSE 0 END) AS ct, "
    "  SUM(CASE WHEN hx >= '8' THEN 1 ELSE 0 END) AS nc, "
    "  SUM(CASE WHEN hx >= '8' THEN conv ELSE 0 END) AS cc FROM a) "
    "SELECT CAST(nt AS BIGINT) AS n_treat, "
    "CAST(ct AS BIGINT) AS conv_treat, "
    "ROUND(ct / CAST(nt AS DOUBLE), 6) AS rate_treat, "
    "CAST(nc AS BIGINT) AS n_ctrl, "
    "CAST(cc AS BIGINT) AS conv_ctrl, "
    "ROUND(cc / CAST(nc AS DOUBLE), 6) AS rate_ctrl, "
    "CASE WHEN cc > 0 AND nt > 0 THEN "
    "ROUND((ct * nc) / CAST(nt * cc AS DOUBLE), 6) END AS lift "
    "FROM g"
)


def _link_resolve_oracle_sql() -> str:
    """Regenerated from the resolver's pass-count constants (one
    site): the same CASE arms, fragment strips, and bounded
    dot-segment sweeps."""
    from .operators.urls import (
        RESOLVE_DOT_PASSES,
        RESOLVE_DOTDOT_PASSES,
    )

    rest = "substr(u, length(ro) + 1)"
    for _ in range(RESOLVE_DOT_PASSES):
        rest = f"regexp_replace({rest}, '/\\./', '/', 'g')"
    for _ in range(RESOLVE_DOTDOT_PASSES):
        rest = f"regexp_replace({rest}, '/[^/]+/\\.\\./', '/', 'g')"
    for _ in range(2):
        rest = f"regexp_replace({rest}, '^/\\.\\./', '/', 'g')"
    return (
        "WITH f AS (SELECT doc_id, "
        "  'https://www.Ex' || CAST(doc_id % 5 AS VARCHAR) || "
        "  '.org/dir/sub/page.html?q=1#frag' AS b, "
        "  CASE doc_id % 8 "
        "  WHEN 0 THEN 'https://abs.example/x?y=2#z' "
        "  WHEN 1 THEN '//cdn.example/lib.js' "
        "  WHEN 2 THEN '/rooted/r' || CAST(doc_id % 9 AS VARCHAR) "
        "  WHEN 3 THEN '?only=' || CAST(doc_id % 4 AS VARCHAR) "
        "  WHEN 4 THEN '#frag2' "
        "  WHEN 5 THEN 'rel/p' || CAST(doc_id % 6 AS VARCHAR) "
        "  WHEN 6 THEN '../up.html' "
        "  ELSE '../../../deep.html' END AS h FROM documents), "
        "p AS (SELECT doc_id, h, "
        "  regexp_extract(b, "
        "    '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS origin, "
        "  regexp_extract(b, '^([A-Za-z][A-Za-z0-9+.-]*):', 1) "
        "    AS scheme, "
        "  regexp_replace(regexp_extract(b, "
        "    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), "
        "    '^$', '/') AS bpath, "
        "  regexp_replace(b, '#.*', '') AS bnf FROM f), "
        "p2 AS (SELECT *, CASE WHEN "
        "  regexp_replace(bpath, '[^/]*$', '') = '' THEN '/' "
        "  ELSE regexp_replace(bpath, '[^/]*$', '') END AS bdir "
        "  FROM p), "
        "j AS (SELECT doc_id, h, origin, "
        "  CASE WHEN regexp_matches(h, "
        "    '^[A-Za-z][A-Za-z0-9+.-]*://') THEN h "
        "  WHEN h LIKE '//%' THEN scheme || ':' || h "
        "  WHEN h LIKE '/%' THEN origin || h "
        "  WHEN h LIKE '#%' THEN bnf "
        "  WHEN h LIKE '?%' THEN origin || bpath || h "
        "  ELSE origin || bdir || h END AS j0 FROM p2), "
        "u0 AS (SELECT doc_id, h, origin, "
        "  regexp_replace(j0, '#.*', '') AS u FROM j), "
        "r AS (SELECT doc_id, h, origin, u, regexp_extract(u, "
        "  '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)', 1) AS ro "
        "  FROM u0) "
        "SELECT doc_id, CASE WHEN origin <> '' AND h <> '' "
        f"  AND ro <> '' THEN ro || {rest} END AS resolved FROM r"
    )


ORACLE_SQL["html_link_resolve"] = _link_resolve_oracle_sql()

# media_srt_cues: the same %4 fixture (control bytes as chr()), blank-
# line block split after CR strip, per-group timing extraction with
# pure-integer millisecond arithmetic, ws-collapsed cue text, the
# whitespace-only block filter, and ROW_NUMBER source order.
_SRT_TIME_RE_SQL = (
    "([0-9]{2}):([0-9]{2}):([0-9]{2})[,.]([0-9]{3})"
    " *--> *"
    "([0-9]{2}):([0-9]{2}):([0-9]{2})[,.]([0-9]{3})"
)
ORACLE_SQL["media_srt_cues"] = (
    "WITH parts AS (SELECT doc_id, "
    "  lpad(CAST(doc_id % 9 AS VARCHAR), 2, '0') AS mm, "
    "  lpad(CAST(doc_id % 9 + 1 AS VARCHAR), 2, '0') AS mm2, "
    "  lpad(CAST(doc_id % 50 AS VARCHAR), 2, '0') AS ss, "
    "  lpad(CAST(doc_id % 999 AS VARCHAR), 3, '0') AS ms, "
    "  CASE WHEN doc_id % 4 = 1 THEN '.' ELSE ',' END AS sep "
    "  FROM documents), "
    "built AS (SELECT doc_id, "
    "  '1' || chr(10) || '00:' || mm || ':' || ss || sep || ms || "
    "  ' --> ' || '00:' || mm2 || ':' || ss || sep || '250' || "
    "  chr(10) || 'line one ' || CAST(doc_id % 7 AS VARCHAR) || "
    "  chr(10) || 'line two' || chr(10) || chr(10) || "
    "  CASE WHEN doc_id % 4 = 2 THEN 'not a cue block' || chr(10) "
    "    || chr(10) ELSE '' END || "
    "  '2' || chr(10) || '00:10:00,000 --> 00:10:02,500' || "
    "  chr(10) || 'second cue ' || CAST(doc_id % 5 AS VARCHAR) || "
    "  CASE WHEN doc_id % 4 = 3 THEN chr(10) || chr(10) || chr(10) "
    "    ELSE '' END AS s0 FROM parts), "
    "crlf AS (SELECT doc_id, CASE WHEN doc_id % 4 = 1 THEN "
    "  replace(s0, chr(10), chr(13) || chr(10)) ELSE s0 END AS srt "
    "  FROM built), "
    "sp AS (SELECT doc_id, string_split_regex("
    "  replace(srt, chr(13), ''), '\\n[ \\t]*\\n+') AS arr "
    "  FROM crlf), "
    "bl AS (SELECT doc_id, i AS bno, arr[i] AS b "
    "  FROM sp, UNNEST(generate_series(1, len(arr))) AS g(i) "
    "  WHERE regexp_replace(arr[i], '[ \\t\\n]+', '', 'g') <> ''), "
    "ex AS (SELECT doc_id, bno, b, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 1) AS g1, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 2) AS g2, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 3) AS g3, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 4) AS g4, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 5) AS g5, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 6) AS g6, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 7) AS g7, "
    f"  regexp_extract(b, '{_SRT_TIME_RE_SQL}', 8) AS g8, "
    "  regexp_extract(b, '^[ \\t]*([0-9]+)[ \\t]*\\n', 1) AS ix, "
    "  trim(regexp_replace(regexp_extract(b, "
    "    '(?s)--> *[^\\n]*\\n(.*)$', 1), "
    "    '[ \\t]*\\n[ \\t]*', ' ', 'g')) AS ct FROM bl), "
    "v AS (SELECT doc_id, bno, g1 <> '' AS ok, ix, ct, "
    "  CASE WHEN g1 <> '' THEN CAST(g1 AS BIGINT) * 3600000 + "
    "    CAST(g2 AS BIGINT) * 60000 + CAST(g3 AS BIGINT) * 1000 + "
    "    CAST(g4 AS BIGINT) END AS sms, "
    "  CASE WHEN g1 <> '' THEN CAST(g5 AS BIGINT) * 3600000 + "
    "    CAST(g6 AS BIGINT) * 60000 + CAST(g7 AS BIGINT) * 1000 + "
    "    CAST(g8 AS BIGINT) END AS ems FROM ex) "
    "SELECT doc_id, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id "
    "  ORDER BY bno) AS BIGINT) AS cue_no, "
    "CASE WHEN ix <> '' THEN CAST(ix AS BIGINT) END AS declared_idx, "
    "sms AS start_ms, ems AS end_ms, ems - sms AS dur_ms, "
    "CASE WHEN ok THEN ct END AS text, ok AS is_valid FROM v"
)

# corpus_cdx_records: the same capture synthesis, host via the
# generic scheme://host + lower + www-strip restatement, reversed
# label join, fragment-stripped path?query ('' -> '/'), group agg
# with the latest-capture digest picked among ts = MAX(ts) rows by
# MAX(digest) (the engine's max(struct) tie rule).
ORACLE_SQL["corpus_cdx_records"] = (
    "WITH cap AS (SELECT CASE WHEN doc_id % 13 = 0 THEN 'junk url' "
    "  ELSE 'https://www.Ex' || CAST(doc_id % 5 AS VARCHAR) || "
    "  '.org/p/' || CAST(doc_id % 40 AS VARCHAR) || '?v=1#frag' END "
    "  AS url, '2024011' || CAST(doc_id % 9 + 1 AS VARCHAR) || "
    "  '120000' AS ts, md5(CAST(doc_id % 3 AS VARCHAR)) AS dg "
    "  FROM documents), "
    "h AS (SELECT url, ts, dg, "
    "  NULLIF(regexp_replace(lower(regexp_extract(url, "
    "    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
    "    '^www\\.', ''), '') AS host FROM cap), "
    "k AS (SELECT list_aggregate(list_reverse("
    "    string_split(host, '.')), 'string_agg', ',') || ')' || "
    "  CASE WHEN regexp_replace(regexp_extract(url, "
    "    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1), "
    "    '#.*', '') = '' THEN '/' "
    "  ELSE regexp_replace(regexp_extract(url, "
    "    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$', 1), '#.*', '') "
    "  END AS surt_key, ts, dg FROM h WHERE host IS NOT NULL), "
    "g AS (SELECT surt_key, CAST(COUNT(*) AS BIGINT) AS n_captures, "
    "  CAST(COUNT(DISTINCT dg) AS BIGINT) AS n_versions, "
    "  MIN(ts) AS first_ts, MAX(ts) AS latest_ts FROM k "
    "  GROUP BY surt_key), "
    "ld AS (SELECT k.surt_key, MAX(k.dg) AS latest_digest "
    "  FROM k JOIN g ON k.surt_key = g.surt_key "
    "  AND k.ts = g.latest_ts GROUP BY k.surt_key) "
    "SELECT g.surt_key, n_captures, n_versions, first_ts, "
    "latest_ts, latest_digest FROM g JOIN ld "
    "ON g.surt_key = ld.surt_key"
)

# HLL register arithmetic REGENERATED from operators/sketch.py's
# constants (register = first 2 md5 hex digits, rank = leading-zero
# bits of the next 64 bits + 1 via a zero-run length + first-nonzero-
# hex CASE, the harmonic sum as an exact DECIMAL(38,0) integer,
# alpha*m^2*2^65 as the ONE Python-repr literal, linear counting
# below 2.5m) — parametrized by the (grp, v) values CTE so every
# hll consumer (documents fixture, events composition) shares the
# one chain.
_HLL_ZR = "length(regexp_extract(substr(hx, 3, 16), '^(0*)', 1))"


def _hll_chain_sql(vals_cte: str) -> str:
    return (
        f"WITH vals AS ({vals_cte}), "
        "h AS (SELECT grp, v, md5(v) AS hx FROM vals "
        "  WHERE v IS NOT NULL), "
    f"rk AS (SELECT grp, substr(hx, 1, 2) AS reg, {_HLL_ZR} AS zr, "
    f"  substr(hx, 3 + {_HLL_ZR}, 1) AS fc FROM h), "
    "rnk AS (SELECT grp, reg, CASE WHEN zr = 16 THEN 65 "
    "  ELSE zr * 4 + (CASE WHEN fc = '1' THEN 3 "
    "    WHEN fc IN ('2', '3') THEN 2 "
    "    WHEN fc IN ('4', '5', '6', '7') THEN 1 ELSE 0 END) + 1 END "
    "  AS rank FROM rk), "
    "regs AS (SELECT grp, reg, MAX(rank) AS mrank FROM rnk "
    "  GROUP BY grp, reg), "
    "sk AS (SELECT grp, CAST(COUNT(*) AS INT) AS used_registers, "
    "  SUM(CAST(power(2, 65 - mrank) AS DECIMAL(38,0))) AS zu "
    "  FROM regs GROUP BY grp), "
    "sk2 AS (SELECT grp, used_registers, "
    f"  round({_sketch.EST_NUMERATOR} / CAST(zu + "
    f"    ({_sketch.M_REGISTERS} - used_registers) * "
    "    CAST(power(2, 65) AS DECIMAL(38,0)) AS DOUBLE), 4) "
    "  AS raw_estimate FROM sk), "
    "sk3 AS (SELECT grp, used_registers, raw_estimate, "
    f"  CASE WHEN raw_estimate <= {_sketch.LC_THRESHOLD!r} "
    f"    AND used_registers < {_sketch.M_REGISTERS} "
    f"  THEN round({float(_sketch.M_REGISTERS)!r} * "
    f"    ln({float(_sketch.M_REGISTERS)!r} / "
    f"    CAST({_sketch.M_REGISTERS} - used_registers AS DOUBLE)), 4) "
    "  ELSE raw_estimate END AS hll_estimate FROM sk2), "
    "cnt AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "  CAST(COUNT(DISTINCT v) AS BIGINT) AS exact_distinct FROM h "
    "  GROUP BY grp) "
    "SELECT sk3.grp, n_rows, used_registers, raw_estimate, "
    "hll_estimate, exact_distinct, "
    "round(abs(hll_estimate - CAST(exact_distinct AS DOUBLE)) / "
    "  CAST(exact_distinct AS DOUBLE), 6) AS rel_err "
    "FROM sk3 JOIN cnt ON sk3.grp = cnt.grp"
    )


ORACLE_SQL["corpus_hll_distinct"] = _hll_chain_sql(
    "SELECT coalesce(lang, 'unk') AS grp, CASE WHEN doc_id % 11 = 0 "
    "  THEN NULL ELSE 'v' || CAST(doc_id % 77 AS VARCHAR) END AS v "
    "FROM documents "
    "UNION ALL "
    "SELECT 'big', 'u' || CAST(doc_id * 5 + i AS VARCHAR) "
    "FROM documents, UNNEST(generate_series(0, 4)) AS g(i)"
)

# dedup_jaccard_estimate: the shared _DUPES/_TOKS/_SHINGLES/_MH_PAIRS
# chain, then per-pair signature agreement (8 unrolled h_i equality
# terms — the SQL spelling of the engine's zip_with count) over the
# candidate pairs, and the exact Jaccard from a shingle equi-join
# (LEFT, coalesced to 0: a pure band-collision pair shares no
# shingle).
ORACLE_SQL["dedup_jaccard_estimate"] = (
    f"WITH {_DUPES}, {_TOKS}, {_SHINGLES}, {_MH_PAIRS}, "
    "szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh "
    "  GROUP BY doc_id), "
    "it AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS i "
    "  FROM pairs p JOIN sh a ON a.doc_id = p.id_a "
    "  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle "
    "  GROUP BY p.id_a, p.id_b), "
    "m AS (SELECT p.id_a, p.id_b, ("
    + " + ".join(
        f"CASE WHEN ma.h{i} = mb.h{i} THEN 1 ELSE 0 END"
        for i in range(8)
    )
    + ") AS mt FROM pairs p "
    "  JOIN mh ma ON ma.doc_id = p.id_a "
    "  JOIN mh mb ON mb.doc_id = p.id_b), "
    "r AS (SELECT m.id_a, m.id_b, "
    "  round(CAST(mt AS DOUBLE) / 8, 6) AS est_jaccard, "
    "  round(CAST(COALESCE(it.i, 0) AS DOUBLE) / "
    "    (sa.sz + sb.sz - COALESCE(it.i, 0)), 6) AS exact_jaccard "
    "  FROM m LEFT JOIN it ON it.id_a = m.id_a AND it.id_b = m.id_b "
    "  JOIN szs sa ON sa.doc_id = m.id_a "
    "  JOIN szs sb ON sb.doc_id = m.id_b) "
    "SELECT id_a, id_b, est_jaccard, exact_jaccard, "
    "round(abs(est_jaccard - exact_jaccard), 6) AS abs_err FROM r"
)

# corpus_length_buckets: the same repeat/NULL fixture, the engine's
# token count (WS_SPLIT_RE2 class), the ascending boundary CASE with
# the -1 overflow arm, salted-digest ROW_NUMBER order (id tie-break),
# (rn-1)//8 batch assignment (DuckDB // == Spark DIV on positives),
# and the max=0-guarded padding-waste division.
ORACLE_SQL["corpus_length_buckets"] = (
    "WITH t AS (SELECT doc_id, CASE WHEN doc_id % 97 = 0 THEN NULL "
    "  ELSE repeat('w ', CAST(doc_id % 200 AS INT)) END AS text "
    "  FROM documents), "
    "n AS (SELECT doc_id, CAST(len(list_filter("
    "  regexp_split_to_array(coalesce(text, ''), " + _WSRE2 + "), "
    "  x -> x <> '')) AS BIGINT) AS nt FROM t), "
    "b AS (SELECT doc_id, nt, CAST(CASE WHEN nt <= 16 THEN 16 "
    "  WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64 "
    "  WHEN nt <= 128 THEN 128 ELSE -1 END AS INT) AS bucket_cap, "
    "  md5(CAST(doc_id AS VARCHAR) || '|lb0') AS dg FROM n), "
    "r AS (SELECT *, CAST((CAST(ROW_NUMBER() OVER ("
    "  PARTITION BY bucket_cap ORDER BY dg, doc_id) AS BIGINT) - 1) "
    "  // 8 AS BIGINT) AS batch_no FROM b), "
    "g AS (SELECT bucket_cap, batch_no, "
    "  CAST(COUNT(*) AS BIGINT) AS n_docs, MAX(nt) AS max_tokens, "
    "  CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM r "
    "  GROUP BY bucket_cap, batch_no) "
    "SELECT bucket_cap, batch_no, n_docs, max_tokens, sum_tokens, "
    "CASE WHEN max_tokens = 0 THEN 0.0 ELSE "
    "  round(1.0 - CAST(sum_tokens AS DOUBLE) / "
    "  (CAST(n_docs AS DOUBLE) * CAST(max_tokens AS DOUBLE)), 6) END "
    "AS pad_waste_frac FROM g"
)


def _psl_case_sql(hvar: str = "host") -> str:
    """Longest-match public-suffix CASE REGENERATED from the engine's
    PUBLIC_SUFFIXES (arms sorted longest-first, suffix tie-break by
    name — ties cannot both match, the order just makes the SQL
    deterministic); mirrors the engine's (length, suffix) struct
    argmax."""
    from .operators.urls import PUBLIC_SUFFIXES

    arms = " ".join(
        f"WHEN {hvar} = '{s}' OR {hvar} LIKE '%.{s}' THEN '{s}'"
        for s in sorted(PUBLIC_SUFFIXES, key=lambda x: (-len(x), x))
    )
    return f"CASE {arms} END"


# corpus_registered_domains: the same 7-arm url synthesis, the
# generic scheme://host + lower + www-strip host restatement (the
# cdx_records precedent for try_parse_url HOST), the regenerated
# longest-first suffix CASE, the label via a greatest()-guarded
# substr (AND is not short-circuit — the lexical_diversity lesson;
# a negative substr length must be structurally impossible), and the
# standard distinct-agg rollup.
ORACLE_SQL["corpus_registered_domains"] = (
    "WITH u AS (SELECT CASE doc_id % 7 "
    "  WHEN 0 THEN 'https://www.Shop' || CAST(doc_id % 5 AS VARCHAR) "
    "    || '.Example.COM/x' "
    "  WHEN 1 THEN 'https://a' || CAST(doc_id % 3 AS VARCHAR) "
    "    || '.b.shop.co.uk/y' "
    "  WHEN 2 THEN 'https://user' || CAST(doc_id % 20 AS VARCHAR) "
    "    || '.github.io/p' "
    "  WHEN 3 THEN 'https://weird.host.unknowntld/x' "
    "  WHEN 4 THEN 'junk url' "
    "  WHEN 5 THEN 'https://com/' "
    "  ELSE 'https://site' || CAST(doc_id % 30 AS VARCHAR) "
    "    || '.org/page' END AS url FROM documents), "
    "h AS (SELECT NULLIF(regexp_replace(lower(regexp_extract(url, "
    "  '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
    "  '^www\\.', ''), '') AS host FROM u), "
    f"s AS (SELECT host, {_psl_case_sql()} AS suf FROM h "
    "  WHERE host IS NOT NULL), "
    "r AS (SELECT host, suf AS public_suffix, "
    "  CASE WHEN suf IS NOT NULL AND host <> suf THEN "
    "    NULLIF(regexp_extract(substr(host, 1, "
    "      CAST(greatest(len(host) - len(suf) - 1, 0) AS INT)), "
    "      '([^.]+)$', 1), '') || '.' || suf END "
    "  AS registered_domain FROM s) "
    "SELECT registered_domain, public_suffix, "
    "CAST(COUNT(*) AS BIGINT) AS n_urls, "
    "CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts "
    "FROM r GROUP BY registered_domain, public_suffix"
)

# corpus_bpe_pairs: the engine's wordcount (WS_SPLIT_RE2 class),
# per-code-point split ('.' matches one code point in RE2 as in
# Java), appended '</w>' marker, adjacent-pair generate_series, the
# weighted sum, and the same deterministic (count DESC, pair) top-60.
ORACLE_SQL["corpus_bpe_pairs"] = (
    "WITH tj AS (SELECT list_filter(regexp_split_to_array(text, "
    + _WSRE2 + "), t -> t <> '') AS tk FROM documents), "
    "words AS (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n "
    "  FROM tj, UNNEST(tk) AS u(w) GROUP BY w), "
    "ch AS (SELECT word, n, list_append("
    "  regexp_extract_all(word, '.'), '</w>') AS c FROM words), "
    "pr AS (SELECT c[i] || ' ' || c[i+1] AS pair, n FROM ch, "
    "  UNNEST(generate_series(1, len(c) - 1)) AS g(i)), "
    "agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences "
    "  FROM pr GROUP BY pair) "
    "SELECT pair, n_occurrences FROM agg "
    "ORDER BY n_occurrences DESC, pair LIMIT 60"
)

# corpus_cooccurrence: position-UNNEST directed pair generation per
# offset (1, 2) and direction, the same pair/marginal/total aggs, the
# min_count cut, and the identical (n_pair * N) / (n_a * n_b) ln op
# order.
ORACLE_SQL["corpus_cooccurrence"] = (
    "WITH tj AS (SELECT list_filter(regexp_split_to_array("
    "  lower(text), " + _WSRE2 + "), t -> t <> '') AS tk "
    "  FROM documents), "
    "pr AS ("
    "  SELECT tk[i] AS tok_a, tk[i + d] AS tok_b "
    "  FROM tj, UNNEST(generate_series(1, len(tk))) AS g(i), "
    "    UNNEST([1, 2]) AS dd(d) WHERE i + d <= len(tk) "
    "  UNION ALL "
    "  SELECT tk[i + d] AS tok_a, tk[i] AS tok_b "
    "  FROM tj, UNNEST(generate_series(1, len(tk))) AS g(i), "
    "    UNNEST([1, 2]) AS dd(d) WHERE i + d <= len(tk)), "
    "pc AS (SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_pair "
    "  FROM pr GROUP BY tok_a, tok_b), "
    "ma AS (SELECT tok_a, CAST(SUM(n_pair) AS BIGINT) AS n_a "
    "  FROM pc GROUP BY tok_a), "
    "mb AS (SELECT tok_b, CAST(SUM(n_pair) AS BIGINT) AS n_b "
    "  FROM pc GROUP BY tok_b), "
    "tt AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS nn FROM pc) "
    "SELECT pc.tok_a, pc.tok_b, n_pair, n_a, n_b, "
    "round(ln((CAST(n_pair AS DOUBLE) * CAST(nn AS DOUBLE)) / "
    "  (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS pmi "
    "FROM pc JOIN ma ON pc.tok_a = ma.tok_a "
    "JOIN mb ON pc.tok_b = mb.tok_b CROSS JOIN tt "
    "WHERE n_pair >= 10"
)

ORACLE_SQL["events_hll_users"] = _hll_chain_sql(
    "SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS v "
    "FROM events "
    "UNION ALL "
    "SELECT 'all-events', CAST(user_id AS VARCHAR) || ':' || "
    "CAST(event_id AS VARCHAR) FROM events"
)


def _html_forms_oracle_sql() -> str:
    """html_forms oracle — the same strip passes, FORM_* regexes, and
    entity chain regenerated from the engine constants; the fixture
    arms spliced from the shared _FORMS_FIX dict."""
    from .operators.html import (
        ACTION_ATTR_RE,
        COMMENT_RE,
        FORM_ATTRS_RE,
        FORM_BODY_RE,
        FORM_EL_RE,
        FORM_FIELD_RE,
        HTML_ENTITIES,
        METHOD_ATTR_RE,
        PASSWORD_INPUT_RE,
        SCRIPT_RE,
        STYLE_RE,
    )

    def q(s: str) -> str:
        return s.replace("'", "''")

    fix = {k: q(v) for k, v in _FORMS_FIX.items()}
    act = f"regexp_extract(attrs, '{q(ACTION_ATTR_RE)}', 1)"
    for ent, ch in HTML_ENTITIES:
        act = f"replace({act}, '{ent}', '{q(ch)}')"
    meth = (
        "lower(trim(regexp_extract(attrs, "
        f"'{q(METHOD_ATTR_RE)}', 1)))"
    )
    return (
        f"WITH d0 AS (SELECT doc_id, '{fix['base']}' || "
        f"CASE WHEN doc_id % 3 = 0 THEN '{fix['login']}' ELSE '' END "
        f"|| CASE WHEN doc_id % 5 = 0 THEN '{fix['bare']}' ELSE '' "
        f"END || CASE WHEN doc_id % 11 = 0 THEN '{fix['nested']}' "
        f"ELSE '' END || '{fix['tail']}' AS page FROM documents), "
        "h AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"regexp_replace(page, '{q(SCRIPT_RE)}', ' ', 'g'), "
        f"'{q(STYLE_RE)}', ' ', 'g'), '{q(COMMENT_RE)}', ' ', 'g') "
        "AS hh FROM d0), "
        "els AS (SELECT doc_id, regexp_extract_all(hh, "
        f"'{q(FORM_EL_RE)}', 1) AS fs FROM h), "
        "pe AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS form_no, "
        "fs[i] AS el FROM els, "
        "UNNEST(generate_series(1, len(fs))) AS g(i)), "
        "ab AS (SELECT doc_id, form_no, "
        f"regexp_extract(el, '{q(FORM_ATTRS_RE)}', 1) AS attrs, "
        f"regexp_extract(el, '{q(FORM_BODY_RE)}', 1) AS body FROM pe) "
        "SELECT doc_id, form_no, "
        f"CASE WHEN {meth} = '' THEN 'get' ELSE {meth} END AS method, "
        f"NULLIF(trim({act}), '') AS action, "
        f"CAST(len(regexp_extract_all(body, '{q(FORM_FIELD_RE)}')) "
        "AS BIGINT) AS n_fields, "
        f"regexp_matches(body, '{q(PASSWORD_INPUT_RE)}') "
        "AS has_password FROM ab"
    )


ORACLE_SQL["html_forms"] = _html_forms_oracle_sql()

# events_bot_detect: the same two injected clients (INTERVAL second
# arithmetic == timestampadd on NTZ), lag over (ts, id), microsecond
# date_diff, and the all-integer cross-multiplied spread rule —
# coalesced FALSE for gap-less users.
_BOT_REG_SQL = (
    "coalesce(CAST(max_gap_us - min_gap_us AS DECIMAL(38,0)) * 10 "
    "* n_gaps < CAST(sum_gap_us AS DECIMAL(38,0)), FALSE)"
)
ORACLE_SQL["events_bot_detect"] = (
    "WITH ev AS ("
    "  SELECT event_id, ts, user_id FROM events "
    "  UNION ALL "
    "  SELECT event_id, TIMESTAMP '2024-06-01 00:00:00' + "
    "    INTERVAL (event_id * 30) SECOND, CAST(99991 AS BIGINT) "
    "  FROM events WHERE event_id % 7 = 0 "
    "  UNION ALL "
    "  SELECT event_id, TIMESTAMP '2024-07-01 00:00:00' + "
    "    INTERVAL (event_id * 30 + (event_id % 50) * 40) SECOND, "
    "    CAST(99992 AS BIGINT) "
    "  FROM events WHERE event_id % 11 = 0), "
    "g AS (SELECT user_id, event_id, ts, lag(ts) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM ev), "
    "d AS (SELECT user_id, CASE WHEN pts IS NULL THEN NULL "
    "  ELSE CAST(date_diff('microsecond', pts, ts) AS BIGINT) END "
    "  AS gap FROM g), "
    "a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "  CAST(COUNT(gap) AS BIGINT) AS n_gaps, MIN(gap) AS min_gap_us, "
    "  MAX(gap) AS max_gap_us, CAST(SUM(gap) AS BIGINT) "
    "  AS sum_gap_us FROM d GROUP BY user_id) "
    "SELECT user_id, n_events, n_gaps, min_gap_us, max_gap_us, "
    f"sum_gap_us, {_BOT_REG_SQL} AS is_regular, "
    f"n_events >= 20 AND {_BOT_REG_SQL} AS is_bot FROM a"
)


def _host_safety_oracle_sql() -> str:
    """corpus_host_safety oracle — the generic host restatement (with
    an explicit port strip, minus the bracketed-IPv6 case which
    carries no port here, and an invalid-quad NULL rule: Spark's
    try_parse_url rejects a PLAIN dotted-quad with an octet > 255 at
    the parser), anchored octet groups with NULLIF-guarded casts, and
    the engine's priority CASE with fetch_ok derived from the class
    (only public_ip and name fetch).  The restatement is exact FOR
    THE FIXTURE ARMS — it does not reproduce the parser's rejection
    of every malformed host shape (e.g. '127.1' shorthand or 5-label
    quads, which the engine sends to no_host), so new fixture arms
    must stay within the shapes mirrored here."""
    ip_re = (
        "^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$"
    )
    vd = (
        "o1 IS NOT NULL AND o1 <= 255 AND o2 <= 255 AND o3 <= 255 "
        "AND o4 <= 255"
    )
    arms = (
        "CASE doc_id % 17 "
        "WHEN 0 THEN 'https://localhost/admin' "
        "WHEN 1 THEN 'https://dev.Localhost/x' "
        "WHEN 2 THEN 'http://127.0.0.1:8080/x' "
        "WHEN 3 THEN 'http://10.1.2.3/x' "
        "WHEN 4 THEN 'http://192.168.0.' || "
        "  CAST(doc_id % 200 AS VARCHAR) || '/x' "
        "WHEN 5 THEN 'http://172.20.5.5/x' "
        "WHEN 6 THEN 'http://172.32.1.1/x' "
        "WHEN 7 THEN 'http://169.254.9.9/x' "
        "WHEN 8 THEN 'http://999.1.2.3/x' "
        "WHEN 9 THEN 'http://8.8.8.8/dns' "
        "WHEN 10 THEN 'http://hidden.service.onion/x' "
        "WHEN 11 THEN 'http://printer.local/x' "
        "WHEN 12 THEN 'http://intranet/wiki' "
        "WHEN 13 THEN 'http://[::ffff:127.0.0.1]/x' "
        "WHEN 14 THEN 'http://0177.0.0.1/x' "
        "WHEN 15 THEN 'http://0.1.2.3/x' "
        "ELSE 'https://www.site' || CAST(doc_id % 40 AS VARCHAR) || "
        "  '.example.org/p' END"
    )
    return (
        f"WITH u AS (SELECT {arms} AS url FROM documents "
        "  UNION ALL SELECT 'junk url'), "
        "h0 AS (SELECT url, NULLIF(regexp_replace(regexp_replace("
        "  lower(regexp_extract(url, "
        "  '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), "
        "  ':[0-9]+$', ''), '^www\\.', ''), '') AS h0 FROM u), "
        "oc0 AS (SELECT url, h0, "
        + ", ".join(
            f"CAST(NULLIF(regexp_extract(h0, '{ip_re}', {i + 1}), "
            f"'') AS INT) AS o{i + 1}"
            for i in range(4)
        )
        + " FROM h0), "
        "oc AS (SELECT url, "
        f"  CASE WHEN o1 IS NOT NULL AND NOT ({vd}) THEN NULL "
        "  ELSE h0 END AS host, "
        f"  CASE WHEN {vd} THEN o1 END AS o1, "
        f"  CASE WHEN {vd} THEN o2 END AS o2 FROM oc0), "
        "r AS (SELECT url, host, CASE "
        "WHEN host IS NULL THEN 'no_host' "
        "WHEN host = 'localhost' OR host LIKE '%.localhost' "
        "  THEN 'loopback' "
        "WHEN host LIKE '%:%' OR host LIKE '[%' "
        "  THEN 'ip6_literal' "
        "WHEN regexp_matches(host, '^[0-9.]+$') AND "
        "  (regexp_matches(host, '(^|\\.)0[0-9]') OR o1 IS NULL) "
        "  THEN 'ambiguous_ip' "
        "WHEN o1 = 127 THEN 'loopback' "
        "WHEN o1 = 0 THEN 'private_ip' "
        "WHEN o1 = 10 THEN 'private_ip' "
        "WHEN o1 = 192 AND o2 = 168 THEN 'private_ip' "
        "WHEN o1 = 172 AND o2 BETWEEN 16 AND 31 THEN 'private_ip' "
        "WHEN o1 = 169 AND o2 = 254 THEN 'link_local' "
        "WHEN o1 IS NOT NULL THEN 'public_ip' "
        "WHEN host LIKE '%.onion' THEN 'onion' "
        "WHEN host LIKE '%.local' THEN 'mdns_local' "
        "WHEN host NOT LIKE '%.%' THEN 'bare' "
        "ELSE 'name' END AS host_class FROM oc) "
        "SELECT url, host, host_class, "
        "host_class IN ('public_ip', 'name') AS fetch_ok FROM r"
    )


ORACLE_SQL["corpus_host_safety"] = _host_safety_oracle_sql()

# events_attribution: the same injected rows, per-user conversion-time
# window, strictly-before filter, ROW_NUMBER-over-(ts, id) first/last
# picks with a LEFT join back so purchase-first users credit 'direct'.
ORACLE_SQL["events_attribution"] = (
    "WITH ev AS (SELECT event_id, ts, user_id, event_type FROM events "
    "  UNION ALL SELECT * FROM (VALUES "
    "  (9000001, TIMESTAMP '2024-03-01 00:00:00', 99993, 'purchase'), "
    "  (9000002, TIMESTAMP '2024-03-01 00:00:00', 99994, 'view'), "
    "  (9000003, TIMESTAMP '2024-03-01 00:05:00', 99994, 'click'), "
    "  (9000004, TIMESTAMP '2024-03-01 00:05:00', 99994, 'purchase')"
    "  ) AS t(event_id, ts, user_id, event_type)), "
    "cv AS (SELECT *, min(CASE WHEN event_type = 'purchase' THEN ts "
    "  END) OVER (PARTITION BY user_id) AS conv FROM ev), "
    "cu AS (SELECT DISTINCT user_id FROM cv WHERE conv IS NOT NULL), "
    "pe AS (SELECT user_id, event_type, ts, event_id FROM cv "
    "  WHERE conv IS NOT NULL AND ts < conv), "
    "fst AS (SELECT user_id, event_type AS ft FROM ("
    "  SELECT user_id, event_type, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM pe) "
    "  WHERE rn = 1), "
    "lst AS (SELECT user_id, event_type AS lt FROM ("
    "  SELECT user_id, event_type, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
    "  FROM pe) WHERE rn = 1), "
    "m AS (SELECT cu.user_id, coalesce(ft, 'direct') AS first_touch, "
    "  coalesce(lt, 'direct') AS last_touch FROM cu "
    "  LEFT JOIN fst ON cu.user_id = fst.user_id "
    "  LEFT JOIN lst ON cu.user_id = lst.user_id) "
    "SELECT first_touch, last_touch, CAST(COUNT(*) AS BIGINT) "
    "AS n_users FROM m GROUP BY first_touch, last_touch"
)

# corpus_warc_extract: the archive synthesis over the shared
# _HTML_PAGE_SQL payload, the shared _WARC_CHAIN_SQL parsing chain,
# the response/validity filter recovering the bounded payload, and
# the shared _html_main_ctes extraction over that pages CTE.
ORACLE_SQL["corpus_warc_extract"] = (
    f"WITH c AS (SELECT {_CRLF_SQL} AS nl FROM (VALUES (1))), "
    f"pg0 AS (SELECT doc_id, ({_HTML_PAGE_SQL}) AS p0 "
    "  FROM documents), "
    "lens AS (SELECT doc_id, p0, "
    "  'https://ex' || CAST(doc_id % 20 AS VARCHAR) || '.org/p/' || "
    "  CAST(doc_id AS VARCHAR) AS uri, "
    "  CASE WHEN doc_id % 5 = 0 THEN greatest(length(p0) - 200, 0) "
    "  ELSE length(p0) END AS l1 FROM pg0), "
    "arcs AS (SELECT doc_id, "
    "  'WARC/1.0' || nl || 'WARC-Type: response' || nl || "
    "  'WARC-Target-URI: ' || uri || nl || "
    "  'Content-Length: ' || CAST(l1 AS VARCHAR) || nl || nl || "
    "  p0 || nl || nl || "
    "  CASE WHEN doc_id % 3 = 0 THEN "
    "    'WARC/1.0' || nl || 'WARC-Type: request' || nl || "
    "    'WARC-Target-URI: ' || uri || nl || "
    "    'Content-Length: 14' || nl || nl || "
    "    'GET / HTTP/1.1' || nl || nl ELSE '' END || "
    "  CASE WHEN doc_id % 7 = 0 THEN "
    "    'WARC/1.0' || nl || 'WARC-Type: metadata' || nl || "
    "    'No-Uri: x' || nl || nl || 'junk' ELSE '' END AS arc "
    "  FROM lens, c), "
    f"{_WARC_CHAIN_SQL}, "
    "pages AS (SELECT doc_id, "
    "  substr(substr(b, ba + 4), 1, content_length) AS page FROM wv "
    "  WHERE is_valid AND warc_type = 'response'), "
    f"{_html_main_ctes('page', src='pages')} "
    "SELECT doc_id, md5(main_text) AS main_md5, n_blocks, n_good, "
    "link_frac FROM mc"
)
