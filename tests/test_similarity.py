"""ANN variants: brute force is ground truth; LSH/IVF trade recall for a
bounded candidate set — assert recall floors + determinism."""

from pyspark.sql import functions as F

from annual_report_pdf_parsers_spark.operators import similarity

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _topk_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ivf_recall_and_determinism(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    truth = _topk_map(similarity.cosine_topk(emb, q, k=5).collect())

    cents = similarity.ivf_fit(emb, n_cells=8, iters=2)
    got1 = similarity.ivf_topk(emb, q, cents, k=5, n_probe=3).collect()
    got2 = similarity.ivf_topk(emb, q, cents, k=5, n_probe=3).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))

    ivf = _topk_map(got1)
    hits = sum(len(truth[k] & ivf.get(k, set())) for k in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.5, f"IVF recall too low: {hits}/{total}"
    # full probe == brute force (sanity: recall 1.0 when scanning all cells)
    full = _topk_map(
        similarity.ivf_topk(emb, q, cents, k=5, n_probe=8).collect()
    )
    assert full == truth


def test_lsh_recall_floor(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    truth = _topk_map(similarity.cosine_topk(emb, q, k=5).collect())
    lsh = _topk_map(similarity.lsh_topk(emb, q, k=5, n_planes=2, n_tables=3).collect())
    hits = sum(len(truth[k] & lsh.get(k, set())) for k in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.5, f"LSH recall too low: {hits}/{total}"


def test_lsh_eight_planes_prunes(spark):
    """At n_planes=8 (the scale direction) each table has 256 buckets:
    the candidate set must shrink well below the corpus and the query
    must still run end-to-end."""
    emb = _emb(spark)
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    got = similarity.lsh_topk(emb, q, k=5, n_planes=8, n_tables=4)
    rows = got.collect()
    assert all(r.rnk <= 5 for r in rows)
    # pruning evidence: candidates per query far below corpus size
    b = emb.select(
        "vec_id",
        F.explode(
            similarity.lsh_tables(F.col("embedding"), 4, 8, 64)
        ).alias("tb"),
    ).select("vec_id", "tb.table_no", "tb.bucket")
    sizes = b.groupBy("table_no", "bucket").count().agg(F.max("count")).first()[0]
    assert sizes < n / 4, f"largest bucket {sizes} of {n} — no pruning"


def test_lsh_plane_count_scaling():
    """planes ~ log2(n/target): sandbox corpora stay small, web-scale
    corpora get real pruning."""
    assert similarity.lsh_plane_count(500) == 2
    assert similarity.lsh_plane_count(10**6, 1024) == 10
    assert similarity.lsh_plane_count(10**12, 1024) == 30


def test_near_dup_lsh_catches_exact_dups(spark):
    """Exact duplicates share every LSH bucket, so the composed
    candidates->verify path has recall 1.0 on them by construction."""
    emb = _emb(spark).filter(F.col("vec_id") < 100)
    dup = emb.withColumn("vec_id", F.col("vec_id") + 5000)
    corpus = emb.unionByName(dup)
    got = similarity.near_dup_pairs_lsh(
        corpus, threshold=0.999, n_planes=4, n_tables=2
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert {(i, i + 5000) for i in range(100)} <= pairs


def test_near_dup_lsh_plan_is_shuffle_bounded(spark):
    """The composed near-dup path must never plan a cross product — the
    whole point vs cosine_near_dup_pairs' O(n^2) pair join."""
    emb = _emb(spark)
    df = similarity.near_dup_pairs_lsh(emb, threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
