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


def hits(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
    iterations: int = 2,
) -> DataFrame:
    """Weighted HITS (Kleinberg 1999) over an edge table ->
    ``(node, hub, auth)`` after a FIXED number of iterations — the
    hub/authority complement to `pagerank` (a page LINKING many
    authorities is a hub; link-farm detection and seed selection use
    both sides).

    One iteration: ``auth_raw(v) = Σ_{u→v} round(hub(u)·w, 12)``
    summed as DECIMAL(38,12), then L1-normalized
    (``auth = round(raw/Σraw, 12)``, the deterministic normalization
    choice — classic L2 needs a sqrt whose operand order is harder to
    pin; L1 is standard in practice and keeps every round restatable);
    then ``hub_raw(u) = Σ_{u→v} round(auth(v)·w, 12)`` normalized the
    same way.  hub0 = round(1/N, 12).  Nodes missing a side score 0;
    an all-zero side normalizes to 0 (guarded division).

    Determinism: the `pagerank` decimal-sum discipline — round THEN
    DECIMAL-sum (order-independent exact), ONE double division per
    node per round against the decimal-exact global total, ROUND 12.

    100 TB shape: per round two shuffle-hash joins + two map-side
    partial aggs (score tables are node-scaled — never broadcast,
    NOTES 4a); the L1 total is ONE scalar agg broadcast back;
    localCheckpoint truncates lineage between rounds.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    src, dst, w = F.col(src_col), F.col(dst_col), F.col(weight_col)
    # r06 PERF (the LADDER rule): the edge table is node-scaled (tiny)
    # but its LINEAGE is the caller's whole link-extraction chain, and
    # it is consumed many times (both node branches, the n count, every
    # half-round's propagate join) — each consumer re-derived the
    # extraction.  Materialize the edges once.
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
        # lazy-materialized by the n count below: the node table is
        # consumed ~2x per round (score init + every half-round's
        # normalize join) and would otherwise re-run its union+distinct
        # shuffle per consumer (r06 second pass)
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    e = edges.select(
        src.alias("_src"), dst.alias("_dst"), w.alias("_w")
    )

    def _propagate(
        scores: DataFrame, score_col: str, join_key: str,
        group_key: str, out_col: str,
    ) -> DataFrame:
        """One half-round: spread `score_col` along edges from
        `join_key` to `group_key`, decimal-sum, L1-normalize."""
        contribs = e.join(
            scores.hint("shuffle_hash"),
            e[join_key] == scores["node"],
        ).select(
            F.col(group_key).alias("_g"),
            F.round(F.col(score_col) * F.col("_w"), 12).alias("_c"),
        )
        raw = contribs.groupBy("_g").agg(
            F.sum(F.col("_c").cast("decimal(38,12)")).alias("_r")
        )
        tot = raw.agg(
            F.sum("_r").cast("decimal(38,12)").alias("_t")
        )
        return (
            nodes.join(
                raw.hint("shuffle_hash"),
                nodes["node"] == raw["_g"],
                "left",
            )
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                F.when(
                    F.col("_t") > 0,
                    F.round(
                        F.coalesce(
                            F.col("_r").cast("double"), F.lit(0.0)
                        )
                        / F.col("_t").cast("double"),
                        12,
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias(out_col),
            )
        )

    hub = nodes.withColumn(
        "hub", F.round(F.lit(1.0) / F.lit(float(n)), 12)
    )
    auth = None
    for it in range(iterations):
        auth = _propagate(hub, "hub", "_src", "_dst", "auth")
        hub = _propagate(auth, "auth", "_dst", "_src", "hub")
        if it < iterations - 1:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    return hub.join(
        auth.withColumnRenamed("node", "_an").hint("shuffle_hash"),
        F.col("node") == F.col("_an"),
    ).select("node", "hub", "auth")


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
    # r06 PERF: materialize the (tiny, node-scaled) edge table once —
    # its lineage is the caller's whole link-extraction chain and it is
    # consumed by both node branches, the n count, the out-weight agg,
    # and every round's contribution join (see hits)
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
        # lazy-materialized by the n count below — consumed by every
        # round's rank join; see hits (r06 second pass)
        .localCheckpoint(eager=False)
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


def hop_distance(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    seed_col: str = "host",
    max_hops: int = 3,
) -> DataFrame:
    """Bounded BFS hop distance from seed hosts over the link graph ->
    ``(node, hops)`` — the crawl-frontier DEPTH signal (public
    practice: crawlers bound exploration by link depth from trusted
    seeds, and seed-distance is a classic spam/quality prior à la
    TrustRank, Gyöngyi et al. 2004).

    ``hops`` = minimum number of directed edges from ANY seed; seeds
    emit 0 (even seeds absent from the graph — a known host is a known
    host); only nodes REACHED within ``max_hops`` are emitted
    (unreachable is absence, not a sentinel — the fetch_schedule
    deferred-row discipline).  Level semantics: frontier_h = distinct
    targets of frontier_{h-1}; a node on several levels resolves by
    the final MIN — integer-exact, no decimal discipline needed, so
    the oracle is a plain unrolled CTE chain.

    100 TB shape: per round ONE pinned shuffle_hash join (frontier and
    edges are both graph-scaled — never broadcast, the NOTES-4a trap)
    + one distinct; ONE final min agg instead of per-round aggs;
    localCheckpoint truncates lineage between rounds (the pagerank
    pattern).  Parallel edges need no pre-dedup: the per-level
    distinct absorbs them.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    # r06 PERF: materialize the edge list once — consumed by every BFS
    # round, and its lineage is the caller's extraction chain (see hits)
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    ).localCheckpoint(eager=False)
    frontier = seeds.select(F.col(seed_col).alias("node")).distinct()
    levels = [frontier.withColumn("hops", F.lit(0))]
    for h in range(1, max_hops + 1):
        frontier = (
            frontier.join(
                e.hint("shuffle_hash"), frontier["node"] == e["_src"]
            )
            .select(F.col("_dst").alias("node"))
            .distinct()
        )
        if h < max_hops:
            frontier = frontier.localCheckpoint(eager=False)
        levels.append(frontier.withColumn("hops", F.lit(h)))
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.unionByName(lv)
    return dist.groupBy("node").agg(
        F.min("hops").cast("long").alias("hops")
    )


def degree_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "n_links",
) -> DataFrame:
    """Per-node degree audit over a weighted edge list (one row per
    distinct (src, dst)): out/in degree and weight, reciprocal-
    neighbor count, self-loop flag — the link-graph health profile
    read BEFORE trusting PageRank/HITS output (a farm of mutually-
    linking hosts shows up as reciprocity >> organic baseline;
    public knowledge: link-spam detection à la TrustRank).

    Reciprocity counts DISTINCT neighbors with an edge in both
    directions, self-loops excluded (a self-loop is its own reverse —
    it gets its own flag instead).  All counts/weights are integers;
    no floats anywhere.

    Plan shape: the edge table is consumed by four branches (out agg,
    in agg, reciprocal self-join, self-loop flag) — acceptable
    because edges are ALREADY aggregated (bounded by distinct host
    pairs, not by the corpus); every join is host-keyed and PINNED
    shuffle_hash (the graph scales with the crawl — never broadcast).
    """
    # r06 PERF: materialize the aggregated edge list once — FIVE
    # branches consume it and its lineage is the caller's whole
    # link-extraction chain (see hits)
    e = edges.select(
        F.col(src_col).alias("s"),
        F.col(dst_col).alias("d"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint(eager=False)
    outd = e.groupBy(F.col("s").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("w").alias("out_weight"),
    )
    ind = e.groupBy(F.col("d").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("w").alias("in_weight"),
    )
    ne = e.filter(F.col("s") != F.col("d"))
    rev = ne.select(
        F.col("d").alias("s"), F.col("s").alias("d")
    )
    recip = (
        ne.select("s", "d")
        .join(rev.hint("shuffle_hash"), on=["s", "d"])
        .groupBy(F.col("s").alias("host"))
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    loops = (
        e.filter(F.col("s") == F.col("d"))
        .select(F.col("s").alias("host"))
        .distinct()
        .withColumn("_dg_loop", F.lit(True))
    )
    base = outd.join(ind.hint("shuffle_hash"), on="host", how="full_outer")
    base = base.join(recip.hint("shuffle_hash"), on="host", how="left")
    base = base.join(loops.hint("shuffle_hash"), on="host", how="left")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return base.select(
        "host",
        z("out_degree").alias("out_degree"),
        z("in_degree").alias("in_degree"),
        z("out_weight").alias("out_weight"),
        z("in_weight").alias("in_weight"),
        z("n_reciprocal").alias("n_reciprocal"),
        F.coalesce(F.col("_dg_loop"), F.lit(False)).alias(
            "has_self_loop"
        ),
    )
