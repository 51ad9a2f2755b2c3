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
