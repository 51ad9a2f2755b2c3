"""Similarity search over embedding columns (task-brief first-class op).

  cosine_topk       brute-force cosine top-k (the correctness baseline)
  lsh_topk          random-hyperplane LSH bucketing, search within bucket
                    (the scale path: candidate set shrinks ~2^n_planes)

Embeddings are ``array<float>`` columns; all arithmetic is a left-to-right
``aggregate`` fold in float64 (deterministic order => reproducible doubles;
the DuckDB oracle folds in the same order via list_reduce/ordinality).

Scale notes: brute force is a broadcast of the (small) query set against
the corpus — no shuffle on the big side; top-k via per-query window. The
LSH variant buckets both sides on a sign-pattern key and joins bucket-to-
bucket: at 10^12 rows the join is shuffle-bounded by bucket key, and the
planes are derived from md5 bits (data-independent, no fitting step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Brute-force top-k by cosine: queries broadcast against the corpus.

    Output (query_id, vec_id, cos) with cos rounded and rank ties broken
    by vec_id — deterministic across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.55,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task-brief dedup entry):
    all (a < b) pairs with rounded cosine >= threshold.

    Sandbox formulation is the exact quadratic one (oracle-checkable);
    at 10^12 scale candidates come from lsh_topk/ivf_topk buckets first
    and this predicate is the verify step on the bounded candidate set.
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.55,
    n_planes: int | None = None,
    n_tables: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs, SCALE path: multi-table LSH candidate
    generation + exact-cosine verification.

    ``cosine_near_dup_pairs`` above is the exact quadratic form (the
    verify predicate / small-scale oracle); THIS is the plan to run at
    10^12 rows — candidates come from an equi-join on (table_no, bucket),
    never a cross product, and each surviving pair is verified with the
    exact cosine.  Recall for a pair at angle theta is
    1 - (1 - (1 - theta/pi)^n_planes)^n_tables; exact duplicates are
    always caught (identical vectors share every bucket).

    ``n_planes=None`` (the default) sizes the plane count FROM THE CORPUS
    via ``lsh_plane_count(corpus.count())`` — a caller taking defaults on
    a 10^12-row corpus gets ~30 planes, not a sandbox constant whose
    2-bit buckets would admit ~25% of the corpus as candidates (r02
    verdict).  The count is one metadata-cheap job (parquet/Iceberg
    count-from-statistics, no scan).  Pass an explicit value to pin
    recall/pruning for tests or oracle reproducibility."""
    if n_planes is None:
        n_planes = lsh_plane_count(corpus.count())
    b = corpus.select(
        F.col(id_col).alias("sid"),
        F.explode(
            lsh_tables(F.col(vec_col), n_tables, n_planes, dim)
        ).alias("tb"),
    ).select("sid", F.col("tb.table_no").alias("t"), F.col("tb.bucket").alias("bk"))
    a = b.select(F.col("sid").alias("id_a"), "t", "bk")
    c = b.select(F.col("sid").alias("id_b"), "t", "bk")
    cand = (
        a.join(c, ["t", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), round_digits).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_plane_count(n_docs: int, target_bucket_size: int = 1024) -> int:
    """Planes per LSH table so expected bucket occupancy ~= target:
    2^planes buckets => planes = log2(n / target).  At n=10^12 and a 1k
    target this is ~30 planes; the sandbox default (2) exists because 500
    test vectors would otherwise land one-per-bucket and recall tests
    would be vacuous.  Trade-off: more planes => better pruning, lower
    per-table recall => compensate with n_tables (the OR-construction)."""
    import math

    return max(2, math.ceil(math.log2(max(2, n_docs / target_bucket_size))))


def hyperplane_sign(vec: Column, plane_no: int, dim: int = 64) -> Column:
    """Sign bit of <v, p_i> where plane p_i has +/-1 components derived
    from md5 nibbles (deterministic, engine-reproducible, no RNG)."""
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.substring(
                F.md5(F.concat(F.lit(f"plane{plane_no}:"), j.cast("string"))),
                1,
                1,
            )
            >= "8",
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    dot = F.aggregate(
        F.zip_with(vec, comp, lambda x, p: x.cast("double") * p),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket(vec: Column, n_planes: int = 4, dim: int = 64) -> Column:
    """Concatenated sign pattern over n random hyperplanes -> bucket key."""
    return F.concat(*[hyperplane_sign(vec, i, dim) for i in range(n_planes)])


def _assign_nearest_centroid(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    out_col: str,
    cos_col: str | None = None,
) -> DataFrame:
    """Argmax-cosine cell id against a broadcast list of centroid
    literals, fully JVM-side — STAGED form (r05 perf fix, the NOTES
    gotcha-#2 family): the per-centroid cosines are pin()-materialized
    columns and only the argmax fold runs over them.

    The previous Column-level fold nested ``when(c > best_cos, ...)``
    with the full 64-dim literal cosine INLINED at every ``best_cos``
    reference — the expression tree doubled per centroid (~2^k copies
    of a ~400-node cosine at k=8), blowing the generated method past
    janino's 64 KB limit into interpreted eval: dedup_semantic measured
    15-16 s WARM on 210 rows at sf0.1.  Staged + LINEAR argmax it is
    sub-second: the per-centroid cosines are materialized once, and
    the argmax is ``array_max`` over (cos, -cid) structs — O(k) code,
    so it also survives the large-k SemDeDup operating point (k ~
    corpus/cell_size) where ANY sequential when-chain would blow up.

    Tie rule: cos ties pick the SMALLEST cid (struct max breaks them
    on the larger -cid) — independent of the list order the caller
    passes.  For ascending-cid lists (every in-repo call site:
    enumerate-seeded ivf_fit and the sorted ivf_fit_local output) this
    is identical to the old first-in-list-wins when-fold and to the
    DuckDB oracles; a caller passing a reordered list gets the
    smallest-cid rule, not list order.  A null cosine never wins
    (coalesced to -2.0, below the sentinel), and if every cosine is
    null the sentinel yields cell -1 — the old fold's contract."""
    from ..functions.numeric import pin

    names = [f"_nc_{j}" for j in range(len(centroids))]
    for n in names:
        if n in df.columns:
            raise ValueError(
                f"staging column {n!r} already exists in the input"
            )
    staged = df
    for n, (cid, cvec) in zip(names, centroids):
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        staged = staged.withColumn(
            n, pin(cosine(F.col(vec_col), carr))
        )
    entries = [
        F.struct(
            F.coalesce(F.col(n), F.lit(-2.0)).alias("c"),
            F.lit(-cid).alias("nid"),
        )
        for n, (cid, cvec) in zip(names, centroids)
    ]
    # sentinel: wins only when every real cosine is null (-2.0 < -1.5
    # <= any real cosine is false — cosines live in [-1, 1])
    entries.append(
        F.struct(F.lit(-1.5).alias("c"), F.lit(1).alias("nid"))
    )
    best = F.array_max(F.array(*entries))
    out = staged.withColumn(out_col, best["nid"] * -1)
    if cos_col is not None:
        # the winning (max) cosine = the vector's similarity to its OWN
        # centroid — the "prototypicality" score prototype_prune needs;
        # all-null vectors carry the -1.5 sentinel alongside cell -1
        out = out.withColumn(cos_col, best["c"])
    return out.drop(*names)


def ivf_fit(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Tiny k-means (Lloyd) for the IVF coarse quantizer, driven from the
    driver but with all heavy work in DataFrame ops: assignment is a
    JVM-side fold against broadcast centroid literals, update is one
    groupBy-avg per dimension.  Seeds are deterministic (every
    (n/n_cells)-th vector by id) — no RNG, reproducible across runs.

    Centroids (n_cells x dim floats) are collected per iteration — KB-
    scale, the standard Spark k-means shape.
    """
    n = corpus.count()
    stride = max(1, n // n_cells)
    seeds = (
        corpus.filter((F.col(id_col) % stride == 0))
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[0]]) for i, r in enumerate(seeds)]
    dim = len(centroids[0][1])
    for _ in range(iters):
        assigned = _assign_nearest_centroid(
            corpus, vec_col, centroids, "_cell"
        )
        agg = assigned.groupBy("_cell").agg(
            *[
                F.avg(F.element_at(F.col(vec_col), d + 1)).alias(f"d{d}")
                for d in range(dim)
            ]
        )
        rows = agg.collect()
        centroids = [
            (int(r["_cell"]), [float(r[f"d{d}"]) for d in range(dim)])
            for r in rows
        ]
    return centroids


_IVF_LOCAL_CACHE: dict = {}


def ivf_fit_local(
    sf_dir: str, n_cells: int = 8, iters: int = 2
) -> list[tuple[int, list[float]]]:
    """Deterministic driver-side Lloyd fit over the (small) embeddings
    table — the DRIVER-GATE determinism shim for ``ann_ivf_topk``.

    ``ivf_fit`` (the Spark form above) is the production quantizer, but
    its Lloyd update AVGs doubles with partition-order-dependent partial
    aggregation, so fitted floats are not reproducible across engines —
    an SQL oracle of the SEARCH would flake on centroid low bits.  This
    fit reads the parquet directly (pandas), computes everything with
    single-threaded numpy elementwise+pairwise-sum reductions (no BLAS
    threading nondeterminism), and its output is embedded as LITERALS in
    both the Spark query and the DuckDB oracle — making the search step
    hash-checkable (r02 verdict item #7).  Semantics mirror ivf_fit:
    stride seeding by id, argmax-cosine assignment with first-wins ties
    in ascending-cid order, per-dimension mean update, empty cells drop.

    Centroids are n_cells x dim floats — KB-scale, cached per argument
    tuple so the query and the oracle builder share one fit."""
    key = (sf_dir, n_cells, iters)
    if key in _IVF_LOCAL_CACHE:
        return _IVF_LOCAL_CACHE[key]
    import os

    import numpy as np
    import pandas as pd

    pdf = pd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
    )
    n = len(ids)
    stride = max(1, n // n_cells)
    seeds = x[ids % stride == 0][:n_cells]
    cents = {i: seeds[i] for i in range(len(seeds))}
    xn = np.sqrt((x * x).sum(axis=1))
    for _ in range(iters):
        cids = sorted(cents)
        sims = np.stack(
            [
                (x * cents[c]).sum(axis=1)
                / (xn * np.sqrt((cents[c] * cents[c]).sum()))
                for c in cids
            ],
            axis=1,
        )
        # argmax returns the FIRST max — first-wins ties over ascending
        # cid, exactly _nearest_centroid's strict-> update rule
        assign = np.asarray(cids)[np.argmax(sims, axis=1)]
        cents = {
            int(c): x[assign == c].mean(axis=0) for c in np.unique(assign)
        }
    out = [(c, [float(v) for v in cents[c]]) for c in sorted(cents)]
    _IVF_LOCAL_CACHE[key] = out
    return out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus rows carry their cell id; a query scans only its
    ``n_probe`` nearest cells.  The candidate join is an equi-join on
    cell — shuffle-bounded, candidate set ~ (n_probe / n_cells) of the
    corpus; recall < 1 by design (the scale path next to the brute-force
    baseline)."""
    c = _assign_nearest_centroid(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")
        ),
        "_cv",
        centroids,
        "cell",
    )
    # n_probe nearest cells per query: rank the centroid list per query
    probe = None
    for cid, cvec in centroids:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        row = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.lit(cid).alias("cell"),
            cosine(F.col(vec_col), carr).alias("_ccos"),
        )
        probe = row if probe is None else probe.unionByName(row)
    wq = Window.partitionBy("query_id").orderBy(F.desc("_ccos"), F.asc("cell"))
    q = (
        probe.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "_qv", "cell")
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def lsh_tables(vec: Column, n_tables: int, n_planes: int, dim: int) -> Column:
    """Array of (table_no, bucket) structs — the standard multi-table
    OR-construction: each table uses an independent plane set; a
    candidate pair needs to collide in ANY table.  Recall for neighbors
    at angle theta: 1 - (1 - (1-theta/pi)^n_planes)^n_tables."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table_no"),
                F.concat(
                    *[
                        hyperplane_sign(vec, t * n_planes + i, dim)
                        for i in range(n_planes)
                    ]
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    n_tables: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: compare only vectors sharing an LSH bucket in >=1 table
    (recall < 1 by design; the scale path for 10^12-row corpora).
    Candidates dedupe across tables BEFORE scoring so each pair's cosine
    is computed once — the join is shuffle-bounded on (table, bucket).

    ``n_planes=None`` derives the plane count from the corpus size (see
    near_dup_pairs_lsh — same rationale, same lsh_plane_count math)."""
    if n_planes is None:
        n_planes = lsh_plane_count(corpus.count())
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(
            lsh_tables(F.col(vec_col), n_tables, n_planes, dim)
        ).alias("tb"),
    ).select("query_id", "_qv", "tb.table_no", "tb.bucket")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            lsh_tables(F.col(vec_col), n_tables, n_planes, dim)
        ).alias("tb"),
    ).select("vec_id", "tb.table_no", "tb.bucket")
    cand = (
        q.join(c, ["table_no", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "_qv", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")
    )
    scored = cand.join(cv, "vec_id").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qv"), F.col("_cv")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos", "rnk")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): bucket
    the corpus into k-means cells, then drop every document that has a
    LOWER-id neighbor in its own cell with cosine >= threshold — the
    embedding-space analogue of the MinHash keep decision, catching
    paraphrases and re-renders that share no n-grams.

    Returns one row per input vector: (vec_id, cell, keep).

    100 TB shape: the pairwise cosine is confined WITHIN cells via one
    equi-join on the cell id — with k sized to the corpus (k ~ n /
    target_cell_size, the SemDeDup operating point) the per-cell
    quadratic is bounded by target_cell_size² regardless of n.  The
    cell assignment is a JVM-side fold over broadcast centroid
    LITERALS (no shuffle), the self-join pins shuffle_hash (the
    assigned table grows with the corpus — never broadcast it), and
    both join children share one plan so the assignment computes once.
    Cosine is rounded to 6 before the threshold compare so the
    decision is engine-stable (DuckDB oracle reproduces the fold
    bit for bit).
    """
    assigned = _assign_nearest_centroid(
        df.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
        ),
        "vec",
        centroids,
        "cell",
    )
    a, b = assigned.alias("a"), assigned.alias("b").hint("shuffle_hash")
    dup = (
        a.join(b, F.col("a.cell") == F.col("b.cell"))
        .filter(F.col("b.vid") < F.col("a.vid"))
        .filter(
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6)
            >= F.lit(threshold)
        )
        .select(F.col("a.vid").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(
            dup.withColumn("_dup", F.lit(True)), "vid", "left"
        )
        .select(
            F.col("vid").alias(id_col),
            F.col("cell"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def prototype_prune(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    q: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space OUTLIER pruning by prototypicality (public
    knowledge: the SSL-prototypes metric of Sorscher et al. 2022
    "Beyond neural scaling laws" — distance to the example's k-means
    prototype as the data-pruning signal): assign each vector to its
    nearest centroid, score it by the cosine to that OWN centroid, and
    drop the least prototypical ``q`` fraction of each CELL — the
    embedding-junk cut (mis-embedded, off-distribution, or garbage
    inputs sit far from every prototype).  The paper's dual move —
    pruning the MOST prototypical (easy/redundant) examples when data
    is abundant — is the same plan with the keep comparison flipped.

    keep = ROUND(proto_cos, 6) >= cell_cutoff, with cell_cutoff the
    exact per-cell ``q``-quantile (linear interpolation — the same
    definition as DuckDB's quantile_cont, both sides ROUND 6; the
    ccnet_tiers discipline).

    100 TB shape: assignment is a JVM-side fold over broadcast centroid
    LITERALS (no shuffle; the staged-argmax form that survives large
    k); ONE small aggregation keyed by cell (<= n_cells rows) computes
    the cutoffs and broadcasts back — the big side never shuffles, and
    there is no per-row window (an NTILE per cell would sort whole
    cells inside single tasks).  At true 100 TB swap the exact
    percentile for approx_percentile (documented trade: the oracle can
    then no longer match bit-for-bit).

    Returns (vec_id, cell, proto_cos, cell_cutoff, keep).
    """
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    assigned = _assign_nearest_centroid(
        df.select(
            F.col(id_col).alias(id_col), F.col(vec_col).alias("_pp_vec")
        ),
        "_pp_vec",
        centroids,
        "cell",
        cos_col="_pp_cos",
    ).select(
        id_col, "cell", F.round(F.col("_pp_cos"), 6).alias("proto_cos")
    )
    cuts = assigned.groupBy("cell").agg(
        F.round(
            F.percentile(F.col("proto_cos"), F.lit(float(q))), 6
        ).alias("cell_cutoff")
    )
    return assigned.join(F.broadcast(cuts), "cell").select(
        id_col,
        "cell",
        "proto_cos",
        "cell_cutoff",
        (F.col("proto_cos") >= F.col("cell_cutoff")).alias("keep"),
    )
