"""Link-graph algorithms over (src, dst, weight) edge tables.

PageRank here is the classic Pregel-style iterative join (public
knowledge: Page et al. 1999; the standard Spark formulation) with one
twist: every iteration's arithmetic is engineered to be bit-identical
in any engine — per-edge contributions are ROUNDED to 12 dp and summed
as DECIMAL(38,12) (exact, order-independent), then one double
expression with a fixed operand order produces the next rank.  An IEEE
double sum would differ run-to-run with partitioning; the decimal-sum
discipline (see corpus_health_report) makes the whole fixpoint
restatable as unrolled SQL for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """Weighted PageRank over an edge table (e.g. `host_link_graph`
    output) -> ``(node, pr)`` after a FIXED number of iterations.

    Semantics: pr0 = round(1/N, 12); each round every node sends
    ``round(pr * w / out_weight, 12)`` along each out-edge; next rank
    = ``round((1-d)/N + d * sum(contribs), 12)``.  Dangling nodes
    (no out-edges) leak their mass — the simplified variant,
    documented; nodes with no in-edges settle at the teleport floor.
    Fixed iterations (not convergence-tested) keep the oracle an
    unrolled CTE chain; web-graph practice runs a fixed 20-50 rounds
    anyway.

    Determinism: contributions rounded THEN summed as DECIMAL(38,12)
    (order-independent exact), cast to double once per round, fixed
    operand order — both engines produce identical ranks bit for bit.
    ``damping`` must have an exact short decimal literal (0.85): both
    engines parse the same literal to the same double.

    100 TB shape: one shuffle-hash join (rank table is node-scaled —
    NOTES 4a, never broadcast) + one map-side-partial agg per round,
    localCheckpoint truncating lineage (the connected_components
    pattern); N is the only driver scalar (O(1)/job, not per round).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    src, dst, w = F.col(src_col), F.col(dst_col), F.col(weight_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
    )
    n = nodes.count()
    wd = edges.groupBy(src.alias("_s")).agg(F.sum(w).alias("_wd"))
    e = edges.join(
        wd.hint("shuffle_hash"), src == F.col("_s")
    ).select(
        src.alias("_src"), dst.alias("_dst"), w.alias("_w"), "_wd"
    )
    pr = nodes.withColumn(
        "pr", F.round(F.lit(1.0) / F.lit(float(n)), 12)
    )
    teleport = F.lit(1.0 - damping) / F.lit(float(n))
    for it in range(iterations):
        contribs = e.join(
            pr.hint("shuffle_hash"), e["_src"] == pr["node"]
        ).select(
            F.col("_dst"),
            F.round(
                F.col("pr") * F.col("_w") / F.col("_wd"), 12
            ).alias("_c"),
        )
        sums = contribs.groupBy("_dst").agg(
            F.sum(F.col("_c").cast("decimal(38,12)")).alias("_s")
        )
        pr = (
            nodes.join(
                sums.hint("shuffle_hash"),
                nodes["node"] == sums["_dst"],
                "left",
            )
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("_s").cast("double"), F.lit(0.0)
                    ),
                    12,
                ).alias("pr"),
            )
        )
        # truncate lineage BETWEEN rounds only — the returned frame
        # keeps a real plan (composable, plan-pinnable); intermediate
        # rounds would otherwise stack join trees linearly
        if it < iterations - 1:
            pr = pr.localCheckpoint(eager=False)
    return pr
