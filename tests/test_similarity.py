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


def test_prototype_prune_model_and_bounds(spark):
    """prototype_prune vs a numpy model (argmax assignment with the
    smallest-cid tie rule, cosine to own centroid, per-cell linear-
    interpolation percentile, >= keep rule); plus the pruning-fraction
    sanity bound and q validation."""
    import numpy as np
    import pytest as _pytest

    emb = _emb(spark).filter(F.col("vec_id") < 120)
    cents = similarity.ivf_fit_local(SF, n_cells=4, iters=2)
    got = {r.vec_id: r for r in
           similarity.prototype_prune(emb, cents, q=0.25).collect()}

    rows = emb.collect()
    C = {cid: np.array(v, dtype=np.float64) for cid, v in cents}
    proto = {}
    for r in rows:
        v = np.array([float(x) for x in r.embedding])
        best = max(
            ((float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))), -cid)
             for cid, c in C.items())
        )
        proto[r.vec_id] = (-best[1], round(best[0], 6))
    by_cell: dict = {}
    for vid, (cell, pc) in proto.items():
        by_cell.setdefault(cell, []).append(pc)
    cuts = {
        cell: round(float(np.percentile(v, 25.0)), 6)
        for cell, v in by_cell.items()
    }
    for vid, (cell, pc) in proto.items():
        r = got[vid]
        assert (r.cell, r.proto_cos) == (cell, pc), vid
        assert r.cell_cutoff == cuts[cell], cell
        assert r.keep == (pc >= cuts[cell]), vid
    # a q-cut prunes a nonzero, sub-half fraction overall
    pruned = sum(1 for r in got.values() if not r.keep)
    assert 0 < pruned < len(got) / 2
    with _pytest.raises(ValueError, match="in \\(0, 1\\)"):
        similarity.prototype_prune(emb, cents, q=1.0)
