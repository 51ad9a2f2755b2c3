"""Deterministic cardinality sketches — HyperLogLog from first
principles over md5 (training-data pipeline op: corpus audits ask
"how many distinct urls / hosts / users per group" constantly, and at
100 TB an exact COUNT(DISTINCT) shuffles every distinct (group, value)
pair; the register sketch shuffles at most 256 rows per group per map
partition).

Why not Spark's built-in ``approx_count_distinct``: its HLL++ registers
depend on Spark's internal 64-bit hash, so the estimate is neither
reproducible across engines nor checkable by the DuckDB oracle.  This
implementation derives every register from ``md5`` hex arithmetic that
both engines evaluate identically, so the ESTIMATE ITSELF is
bit-reproducible: register index = first 2 hex digits (m = 256
registers), rank = leading-zero bits of the next 64 hash bits + 1, and
the harmonic sum is carried as an exact DECIMAL(38,0) integer
(``sum(2^(65 - rank))`` — order-independent, no float accumulation), so
the only float ops are one cast, one division, and the standard
linear-counting ``ln`` branch (Flajolet et al. 2007 small-range
correction).

100 TB shape: the register aggregation is a map-side-partial
``max`` — per map partition at most m rows per group reach the
exchange, independent of corpus size.  The optional exact audit column
(``include_exact=True``) re-introduces the full distinct shuffle and is
for validation runs only; production sketches run with
``include_exact=False``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

B_BITS = 8
M_REGISTERS = 1 << B_BITS  # 256
# alpha_m for m = 256 (Flajolet et al. 2007, m >= 128 branch).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
# alpha * m^2 * 2^65 folded into ONE Python-repr literal: both engines
# parse the identical decimal string (the pagerank teleport-literal
# lesson — a bare arithmetic expression would constant-fold in DECIMAL
# on DuckDB and diverge in the last digits).
EST_NUMERATOR = repr(HLL_ALPHA * M_REGISTERS * M_REGISTERS * 2.0**65)
# Linear-counting threshold: raw estimate <= 2.5 * m.
LC_THRESHOLD = 2.5 * M_REGISTERS


def hll_rank(hexdigest: Column) -> Column:
    """HLL rank (1..65) from an md5 hex digest: position of the first
    1-bit in the 64 bits AFTER the 2-hex-digit register prefix, + 1.
    Pure string arithmetic (leading-zero-run length * 4 + a 16-way CASE
    on the first non-zero hex digit) — no 64-bit conv, no UDF."""
    body = F.substring(hexdigest, 3, 16)
    zrun = F.length(F.regexp_extract(body, "^(0*)", 1))
    first = F.substr(body, zrun + F.lit(1), F.lit(1))
    extra = (
        F.when(first == "1", F.lit(3))
        .when(first.isin("2", "3"), F.lit(2))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        F.when(zrun == 16, F.lit(65))
        .otherwise(zrun * 4 + extra + 1)
        .cast("int")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate:

      (group, n_rows, used_registers, raw_estimate, hll_estimate
       [, exact_distinct, rel_err])

    ``hll_estimate`` applies the standard small-range correction: when
    the raw estimate is <= 2.5*m and empty registers remain, linear
    counting ``m * ln(m / zero_registers)`` replaces it.  Rows with a
    NULL value carry no identity and are dropped before hashing (a
    group of only-NULL values disappears).

    With ``include_exact`` the output also carries the true
    COUNT(DISTINCT) and the relative error — the audit form this
    repo's driver gate checks; production estimation runs turn it off
    to avoid the exact-distinct shuffle the sketch exists to replace.
    """
    grp = group_col or "scope"
    if group_col is None:
        if "scope" in df.columns:
            # ADVICE r05: withColumn would silently OVERWRITE the
            # caller's column and group the sketch by the literal —
            # refuse, matching the clash guards of with_host_safety /
            # with_registered_domain / length_buckets
            raise ValueError(
                "hll_distinct staging column 'scope' already exists — "
                "pass group_col or rename it"
            )
        df = df.withColumn(grp, F.lit("all"))
    if grp == value_col:
        raise ValueError("group_col and value_col must differ")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(grp).alias("grp"),
        F.col(value_col).cast("string").alias("v"),
    )
    h = F.md5(F.col("v"))
    # per-register row counts ride the register aggregation, so n_rows
    # is free on the production path (no second corpus scan, no join)
    regs = (
        base.select(
            "grp",
            F.substring(h, 1, 2).alias("reg"),
            hll_rank(h).alias("rank"),
        )
        .groupBy("grp", "reg")
        .agg(
            F.max("rank").alias("mrank"),
            F.count(F.lit(1)).alias("_rc"),
        )
    )
    two65 = F.pow(F.lit(2.0), F.lit(65)).cast("decimal(38,0)")
    sk = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("int").alias("used_registers"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(65) - F.col("mrank")).cast(
                "decimal(38,0)"
            )
        ).alias("_zu"),
        F.sum("_rc").alias("n_rows"),
    )
    zeros = F.lit(M_REGISTERS) - F.col("used_registers")
    z_total = F.col("_zu") + zeros.cast("decimal(38,0)") * two65
    raw = F.round(
        F.lit(float(EST_NUMERATOR)) / z_total.cast("double"), 4
    )
    sk = sk.withColumn("raw_estimate", raw).withColumn(
        "hll_estimate",
        F.when(
            (F.col("raw_estimate") <= F.lit(LC_THRESHOLD))
            & (zeros > 0),
            F.round(
                F.lit(float(M_REGISTERS))
                * F.log(
                    F.lit(float(M_REGISTERS)) / zeros.cast("double")
                ),
                4,
            ),
        ).otherwise(F.col("raw_estimate")),
    )
    if include_exact:
        # the exact-distinct audit is the only consumer that re-scans
        # the input; both sides are per-group aggregates partitioned
        # by grp, and shuffle_hash keeps the join off the corpus-
        # scaled-broadcast path (group cardinality grows with the
        # corpus for host-like groups — the soft_weights AQE trap)
        counts = base.groupBy("grp").agg(
            F.countDistinct("v").alias("exact_distinct")
        )
        out = sk.join(counts.hint("shuffle_hash"), "grp")
    else:
        out = sk
    cols = [
        F.col("grp").alias(grp),
        "n_rows",
        "used_registers",
        "raw_estimate",
        "hll_estimate",
    ]
    if include_exact:
        cols += [
            "exact_distinct",
            F.round(
                F.abs(
                    F.col("hll_estimate")
                    - F.col("exact_distinct").cast("double")
                )
                / F.col("exact_distinct").cast("double"),
                6,
            ).alias("rel_err"),
        ]
    return out.select(*cols)
