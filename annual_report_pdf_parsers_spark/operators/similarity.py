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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: compare only vectors sharing the LSH bucket (recall < 1 by
    design; the scale path for 10^12-row corpora)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cv"),
        lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
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
