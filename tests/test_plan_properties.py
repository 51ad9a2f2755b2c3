"""Physical-plan assertions: the scale properties SCALE.md claims must
hold structurally, not just in prose.  These catch plan regressions the
value-level tests can't see (a plan that silently re-adds a shuffle or
re-reads the html column still produces correct rows)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline
from annual_report_pdf_parsers_spark.sources.synthetic import (
    make_corpus,
    manifest_to_spark,
)


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("plan_corpus")
    pages_pdf, manifest_pdf, _ = make_corpus(30, seed=11)
    pp = str(d / "pages.parquet")
    pages_pdf.to_parquet(
        pp, coerce_timestamps="us", allow_truncated_timestamps=True
    )
    return pp, manifest_pdf


def _plan(spark, corpus_paths, **kw) -> str:
    pp, manifest_pdf = corpus_paths
    pages = spark.read.parquet(pp)
    out = run_pipeline(pages, manifest_to_spark(spark, manifest_pdf), **kw)
    return out._jdf.queryExecution().executedPlan().toString()


def test_html_column_pruned(spark, corpus_paths):
    """The pipeline must never read html/warc_ts from the scan —
    ReadSchema is the 100TB-vs-20TB difference (SCALE.md §1)."""
    plan = _plan(spark, corpus_paths)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "no FileScan in plan"
    assert "html" not in scan[0]
    assert "warc_ts" not in scan[0]
    assert "text" in scan[0]


def test_single_wide_shuffle(spark, corpus_paths):
    """Exactly ONE hash exchange on the big path: the url clustering that
    all windows/groupBys reuse (SCALE.md §2).  With manifest_routing=False
    (no D1-routed archetypes in the corpus) that is the ONLY hash exchange
    in the whole plan; broadcast exchanges (manifest) are allowed."""
    plan = _plan(spark, corpus_paths, manifest_routing=False)
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges == 1, f"expected 1 hash exchange, got:\n{plan}"


def test_routed_plan_shape(spark, corpus_paths):
    """Default plan (D1 manifest routing on): TWO hash exchanges — the
    big-path url clustering plus ONE small-side manifest aggregation
    (the COMBINED route map: D1 priority + oddo-style family fallback
    come out of a single (url)-grouped pass since r05, r04 advice) —
    and both manifest-derived joins (route map, manifest) hit the scan
    side as broadcasts (no exchange of the pages side).  The heavy
    columns still shuffle exactly once."""
    plan = _plan(spark, corpus_paths)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("MapInPandas") == 1
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_manifest_join_is_broadcast(spark, corpus_paths):
    plan = _plan(spark, corpus_paths)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_one_python_stage(spark, corpus_paths):
    """Python appears exactly once in the hot path (the extract
    mapInPandas); everything else must stay JVM-side."""
    plan = _plan(spark, corpus_paths)
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time UDFs
    assert "ArrowEvalPython" not in plan  # no scalar pandas UDFs either


def test_pipeline_two_sorts(spark, corpus_paths):
    """Sort economy (round 2): the plan carries exactly TWO sorts — W3's
    descending and W1's ascending.  P9 runs in-batch and the A1 mode
    windows reuse the ffill sort; a third sort is a regression."""
    plan = _plan(spark, corpus_paths)
    n_sorts = sum(
        1 for ln in plan.splitlines() if "- Sort [" in ln
    )
    assert n_sorts == 2, f"expected 2 sorts, got {n_sorts}:\n{plan}"


def test_manifest_shuffle_join_is_copartitioned(spark, corpus_paths):
    """The bench/production manifest-join shape ("shuffle_hash" hint):
    holdings are already hash(url)-partitioned, so the join must add an
    exchange ONLY for the manifest side — exactly 2 hash exchanges total
    (the (url) big-path one + the small manifest one), a ShuffledHashJoin,
    and still no broadcast-nested-loop / cartesian."""
    pp, manifest_pdf = corpus_paths
    pages = spark.read.parquet(pp)
    # the exact bench shape: shuffle-hash manifest join, routing off
    # (bench.py pins a corpus with no manifest-routed classes)
    out = run_pipeline(
        pages, manifest_to_spark(spark, manifest_pdf),
        manifest_hint="shuffle_hash", manifest_routing=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_minhash_plan_no_duplication(spark):
    """The shingle/token chain must not be re-inlined (NOTES.md #2/#3):
    split() may appear at most a few times, not once per reference."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") <= 4, plan.count("split(")


def test_dedup_joins_shuffle_bounded(spark):
    """Candidate generation must be equi-joins — never a cross product."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    for q in (
        "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash_pairs"
    ):
        df = QUERIES[q](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_filters_stay_on_attributes(spark, corpus_paths):
    """P6/P12 predicates must reference projected attributes, not inline
    the normalize chain (functions/numeric.py::pin)."""
    pp, manifest_pdf = corpus_paths
    pages = spark.read.parquet(pp)
    out = run_pipeline(pages, manifest_to_spark(spark, manifest_pdf))
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    for ln in optimized.splitlines():
        if ln.strip().startswith("Filter") or "+- Filter" in ln:
            assert "translate(" not in ln, (
                "normalize chain leaked into a Filter:\n" + ln[:300]
            )


# ---------------------------------------------------------------------------
# new-operator plan shapes (round 3): the scale claims in their docstrings
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.01"


def _qplan(spark, name: str) -> str:
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES[name](spark, SF001)
    return df._jdf.queryExecution().executedPlan().toString()


def test_sessionize_single_exchange(spark):
    """session_stats: ONE hash exchange (user key), ONE sort — the
    per-session aggregation must reuse the window sort's clustering
    (subset rule), not re-shuffle (temporal.py docstring)."""
    plan = _qplan(spark, "events_sessionize")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 1, plan
    assert "SortAggregate" not in plan


def test_asof_join_no_range_explosion(spark):
    """asof_join: the union+window form — no join operator at all on the
    event path (the range-join encoding would plan a SortMergeJoin or
    BroadcastNestedLoopJoin), ONE sort, and only doc-scoped exchanges
    (the window's user key + the click pre-aggregation's (user, ts))."""
    plan = _qplan(spark, "events_asof_join")
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Sort [") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_source_stats_partial_agg(spark):
    """source_stats: ONE shuffle keyed by source with map-side partial
    aggregation (HashAggregate below AND above the exchange)."""
    plan = _qplan(spark, "corpus_source_stats")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") == 2, plan
    assert "SortAggregate" not in plan


def test_repetition_stats_doc_scoped(spark):
    """repetition_stats: the max-gram aggregation is relational —
    partial-aggregated exchanges keyed by (id, gram) then id, never a
    sort-based aggregate or a cross product."""
    plan = _qplan(spark, "text_repetition")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "SortAggregate" not in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_sample_hash_narrow_no_shuffle(spark):
    """hash_mod_sample: a pure narrow filter — ZERO exchanges, no Python
    eval, the md5-prefix predicate sits directly above the scan
    (sampling.py '100 TB shape')."""
    plan = _qplan(spark, "corpus_sample_hash")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_quota_topk_single_exchange(spark):
    """quota_topk_per_group: ONE hash exchange (the group key), and —
    the load-bearing scale property — Catalyst's WindowGroupLimit
    push-down fires in Partial/Final form: each MAP partition prunes to
    its own top-k per group BEFORE the shuffle, so at most k rows per
    (group, map partition) transit the exchange regardless of how hot a
    domain is (the rank<=k filter is visible to the optimizer because
    row_number uses the plain rank filter idiom)."""
    plan = _qplan(spark, "corpus_quota_topk")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("WindowGroupLimit") == 2, plan
    assert "Partial" in plan and "Final" in plan, plan
    assert "EvalPython" not in plan, plan


def test_pii_scrub_narrow_no_shuffle(spark):
    """scrub_pii: per-row projection only — ZERO exchanges, no Python
    eval; the three regex passes are JVM expressions (scrub.py)."""
    plan = _qplan(spark, "text_pii_scrub")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_cluster_cc_no_cross_product(spark):
    """dedup_cluster_cc: the final keep-decision join and every
    propagation round are equi-joins — no cartesian/nested-loop anywhere
    in the final plan, and the corpus-side join is NOT a driver-built
    broadcast of the (corpus-scaling) labels... the labels ARE
    broadcast-eligible here only because sf0.001 is tiny; the decision
    join itself must remain an equi-join."""
    plan = _qplan(spark, "dedup_cluster_cc")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_shard_shuffle_single_exchange(spark):
    """shard_shuffle: ONE hash exchange (shard key) + the per-shard
    digest sort — exactly the cost of writing output partitioned by
    shard; no Python eval."""
    plan = _qplan(spark, "corpus_shard_shuffle")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 1, plan
    assert "EvalPython" not in plan, plan


def test_normalize_text_narrow(spark):
    """normalize_text: per-row projection only — zero exchanges, no
    Python eval (lower/translate/regexp_replace stay in codegen)."""
    plan = _qplan(spark, "text_normalize")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_decontaminate_broadcasts_benchmark(spark):
    """decontaminate: the benchmark shingle set joins as a BROADCAST
    (bounded by construction — the one case where broadcast is right,
    unlike the corpus-growing manifest/lineage tables), and no join in
    the plan degenerates to a cartesian/nested-loop.

    autoBroadcastJoinThreshold is disabled for the check: at the test sf
    the stats-based rule would broadcast BOTH small join sides anyway,
    and a bare 'BroadcastHashJoin present' assertion could not detect
    loss of the explicit hint (the property that matters at 100 TB,
    where only the benchmark side stays broadcast-sized)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _qplan(spark, "corpus_decontaminate")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # exactly the hinted benchmark-side broadcast survives
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_corpus_end_to_end_plan_bounded(spark):
    """The composed corpus decision chain (url dedup -> exact ->
    minhash+CC -> decontaminate -> quota -> shard shuffle) must stay a
    pure equi-join/agg DAG: no cartesian/BNLJ anywhere, and the
    exchange count bounded — the per-op pins guarantee each stage's
    shape, this guards the COMPOSITION against re-planning blow-ups
    (e.g. a stage chain planned twice by a broken column pin)."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["corpus_end_to_end"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = plan.count("Exchange hashpartitioning")
    # r05: 54 — the fixture repartition (scan-parallelism floor) and
    # the shuffle_hash candidate joins (corpus-scaled side must not
    # broadcast) each add hash exchanges by design
    assert n <= 60, f"composed chain exchange blow-up: {n}"


def test_corpus_frontier_score_plan_shape(spark):
    """The frontier-prioritization capstone (blocklist -> robots ->
    url-quality -> template counts -> 2-round PageRank -> fused
    score) must stay a pure equi-join/agg DAG: the curation-bounded
    robots rules are the ONLY broadcast (never the corpus- or
    node-scaled sides — those are shuffle_hash by pin), and the
    exchange count stays bounded across the pagerank rounds."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["corpus_frontier_score"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ONE broadcast: the per-host robots rule-array (curation-bounded)
    assert plan.count("BroadcastHashJoin") == 1
    # rank/template/candidate joins all shuffle_hash (corpus/node
    # scaled): 2 pagerank rounds + edge-outweight + template + rank
    assert plan.count("ShuffledHashJoin") == 5
    n = plan.count("Exchange hashpartitioning")
    # bound raised 16 -> 20: the _spread fixture re-key subtree appears
    # once per corpus consumer in the static plan (r06; runtime exchange
    # reuse collapses the identical copies)
    assert n <= 20, f"frontier chain exchange blow-up: {n}"


def test_dup_spans_and_langid_plan_shape(spark):
    """text_dup_spans: FOUR static exchanges — the fixture's
    scan-parallelism repartition appears once per corpus consumer
    (spine / spans / owners; identical subtrees, collapsed to one by
    runtime exchange reuse) plus the ONE window-hash agg exchange —
    and the pinned token chain plans at most twice, not once per
    window reference.
    text_langid: a fully narrow expression tree (0 exchanges) with the
    staged trigram counts holding (no split() re-inlining)."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["text_dup_spans"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    # 4 -> 3 (r06): dup_span_stats materializes the span rows once
    # (lazy localCheckpoint — the LADDER rule), so the tokenize/window
    # chain and its fixture re-key appear once, not per consumer; the
    # tokenizing split() now lives entirely below the checkpoint (0
    # split sites in the optimized plan above it)
    assert plan.count("Exchange hashpartitioning") == 3, plan
    assert "CartesianProduct" not in plan
    assert opt.count("split(") <= 2, opt.count("split(")

    df = QUERIES["text_langid"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_corpus_curation_plan_shape(spark):
    """corpus_curation: the domain keep-flags are CORPUS-DERIVED (they
    scale with the input, unlike the bounded benchmark shingles), so
    they must NOT be broadcast — the keep join is a ShuffledHashJoin
    with both sides keyed on source, and the quota window reuses that
    clustering (Sort + WindowGroupLimit directly on the join output).
    Exactly TWO hash exchanges total: the big side's source re-key and
    the stats aggregation; a third would mean the window re-shuffled."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["corpus_curation"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 2 -> 4 (r06): the _spread fixture re-key appears under BOTH corpus
    # consumers (scored + keep_sources) in the static plan; runtime
    # exchange reuse computes it once
    assert plan.count("Exchange hashpartitioning") == 4, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_corpus_ingest_plan_bounded(spark):
    """The composed crawl-ingest chain (blocklist filter -> incremental
    cross-corpus LSH anti-join -> stratified sample) stays a pure
    equi-join/agg DAG: no cartesian/BNLJ, bounded exchanges, and the
    blocklist stays a literal predicate (no extra join introduced for
    the domain list)."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["corpus_ingest"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    n = plan.count("Exchange hashpartitioning")
    # r05: 14 — the ref-side scan-parallelism repartition feeds two
    # consumers (blocklist batch + flags reference)
    assert n <= 16, f"ingest chain exchange blow-up: {n}"


def test_boilerplate_lines_plan_shape(spark):
    """dedup_boilerplate_lines: the line-df agg / join-back / per-doc
    regroup plans with bounded exchanges, no cartesian, and exactly one
    posexplode pair (the lines side and the count side — not one per
    column reference)."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    df = QUERIES["dedup_boilerplate_lines"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    n = plan.count("Exchange hashpartitioning")
    assert n <= 6, f"boilerplate exchange blow-up: {n}"
    assert plan.count("Generate posexplode") <= 2, plan


def test_quality_classifier_narrow(spark):
    """quality_classifier: a pure narrow projection — ZERO exchanges, no
    Python eval (the 256-entry weight map is a constant-folded literal;
    tokenize/bigram/fold all stay in JVM expressions)."""
    plan = _qplan(spark, "text_quality_classifier")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_mixture_sample_plan_shape(spark):
    """mixture_sample: the per-source rate table joins back to the
    corpus as the hinted BROADCAST (bounded by the source vocabulary —
    the decontaminate-style justified broadcast), the 1-row weight-sum
    attach is the only nested-loop join (broadcast of literally one
    row), and the only hash exchanges are the two tiny count/sum aggs —
    the BIG side never shuffles.  autoBroadcastJoinThreshold is
    disabled so the check detects loss of the explicit hints."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _qplan(spark, "corpus_mixture_sample")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "EvalPython" not in plan, plan


def test_url_quality_narrow(spark):
    """url_quality_score: pure narrow projection — zero exchanges, no
    Python eval (replace-trick counts and the weighted sum stay in
    codegen)."""
    plan = _qplan(spark, "corpus_url_quality")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_span_ladder_plan_bounded(spark):
    """corpus_span_ladder: two window-hash passes composed — every join
    stays an equi-join (hash/window keys), no cartesian/nested-loop,
    the exchange count is bounded (two agg+joinback chains + the
    per-doc join), and the shared tokenized corpus is MATERIALIZED
    once (localCheckpoint -> both branches scan the checkpointed RDD;
    a pinned branch point can't use ReusedExchange), so the dominant
    tokenize map cost is paid once — the plan must contain NO
    tokenizing split() at all."""
    plan = _qplan(spark, "corpus_span_ladder")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 12, plan
    assert "ExistingRDD" in plan, plan
    assert "split(" not in plan, plan


def test_pack_sequences_single_exchange(spark):
    """pack_sequences: ONE hash exchange (shard) + the per-shard sort —
    packing rides the shard_shuffle layout pass; no Python eval."""
    plan = _qplan(spark, "corpus_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort [") == 1, plan
    assert "EvalPython" not in plan, plan


def test_corpus_assemble_plan_bounded(spark):
    """corpus_assemble (classifier keep -> mixture -> shard+pack as ONE
    query): every join is an equi-join except the single 1-row
    weight-sum broadcast attach (mixture's), exchanges stay bounded,
    and exactly one window sort (the per-shard pack) plus the join
    machinery — no Python eval anywhere."""
    plan = _qplan(spark, "corpus_assemble")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert plan.count("Exchange hashpartitioning") <= 12, plan
    assert "EvalPython" not in plan, plan


def test_dedup_paragraphs_plan_shape(spark):
    """dedup_paragraphs: the skew-safe agg-then-join form — NO window
    over the paragraph key (a row_number would sort every hot
    boilerplate key's copies in one task), no cartesian, bounded
    exchanges, and the min-(doc,pos) agg is map-side partial."""
    plan = _qplan(spark, "dedup_paragraphs")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan, plan
    n = plan.count("Exchange hashpartitioning")
    assert n <= 6, f"paragraph-dedup exchange blow-up: {n}"
    assert plan.count("Generate posexplode") <= 2, plan
    assert "partial_min" in plan, plan


def test_ccnet_tiers_plan_shape(spark):
    """corpus_ccnet_tiers: cutoffs (one tiny per-language agg) BROADCAST
    back onto the scored rows — no per-document window/NTILE (the skew
    trap: an 'order by score' per language sorts that language's whole
    corpus in one task), no Python stage, and the only hash exchange is
    the cutoff agg's own (the big side never shuffles)."""
    plan = _qplan(spark, "corpus_ccnet_tiers")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    n = plan.count("Exchange hashpartitioning")
    # 1 -> 3 (r06): the _spread re-key under both consumers (cutoff agg
    # + probe side) plus the cutoff agg's own exchange
    assert n <= 3, f"big-side shuffle crept in: {n}"


def test_c4_filters_narrow(spark):
    """corpus_c4_filters: pure narrow projection — zero exchanges, no
    Python eval, and the line split is staged exactly once (the pinned
    _c4l array; re-inlining the split into the kept-lines filter or
    the counts would re-tokenize per reference).  Exactly three split
    sites: the line split, the per-line word split (one HOF lambda),
    and the doc-level bad-word token split — any fourth means a pinned
    stage re-inlined."""
    plan = _qplan(spark, "corpus_c4_filters")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("split(") == 3, plan


def test_split_safe_plan_shape(spark):
    """corpus_split_safe: the CC machinery pays its own (pinned) cost;
    the split CASE itself must add nothing — no cartesian/BNLJ, no
    Python stage, bounded exchanges (the minhash+CC chain), and the
    digest staged once (one md5 site in the plan)."""
    plan = _qplan(spark, "corpus_split_safe")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 14, plan


def test_split_assign_narrow(spark):
    """split_assign alone (group key already a column): a pure narrow
    projection — zero exchanges."""
    from annual_report_pdf_parsers_spark.operators.sampling import (
        split_assign,
    )

    df = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id", "source"
    )
    plan = (
        split_assign(df, "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_soft_dedup_weights_plan_shape(spark):
    """dedup_soft_weights: agg-then-join on the digest — no window over
    hot digests, no cartesian, bounded exchanges, no Python, and the
    corpus-scaled counts table must NOT broadcast (shuffle_hash pinned
    — the NOTES.md 4a rule)."""
    plan = _qplan(spark, "dedup_soft_weights")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 6, plan


def test_epoch_plan_single_exchange(spark):
    """corpus_epoch_plan: one map-side-partial source aggregation (the
    1-row weight-total build side repeats its subtree, so at most two
    hash exchanges of the SAME tiny agg) + the mixture-style 1-row
    nested-loop attach — no window, no Python, nothing corpus-scaled
    broadcast."""
    plan = _qplan(spark, "corpus_epoch_plan")
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_vocab_topk_no_global_sort(spark):
    """corpus_vocab_topk: the top-k must plan as TakeOrderedAndProject
    (per-partition heaps, driver k-merge) — a global Sort over the
    token table is the scale regression this pin exists for.  Two
    exchanges: the count-distinct two-phase agg on the token key."""
    plan = _qplan(spark, "corpus_vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "EvalPython" not in plan, plan


def test_tfidf_topk_plan(spark):
    """text_tfidf_topk: the corpus-scaled df table must join via
    shuffle_hash (NOT a driver broadcast build — the NOTES 4a rule);
    the only broadcast is the 1-row N attach (one BNLJ); the per-doc
    top-k must plan as WindowGroupLimit (map-side k-prune); bounded
    exchanges, no Python, no cartesian."""
    plan = _qplan(spark, "text_tfidf_topk")
    assert "ShuffledHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    # 5 -> 7 (r06): the _spread fixture re-key per corpus consumer
    assert plan.count("Exchange hashpartitioning") <= 7, plan


def test_dsir_sample_plan(spark):
    """corpus_dsir_sample: scoring is a pure narrow tree (the ratio
    table is a constant-folded literal map — NO join, NO keyed
    exchange) and the global top-n plans as TakeOrderedAndProject
    (per-partition heaps), never a rangepartitioning sort."""
    plan = _qplan(spark, "corpus_dsir_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bigram_lm_plan(spark):
    """text_bigram_lm: pure narrow expression tree — both literal maps
    constant-fold, the pair structs ride one staged zip; NO exchange of
    any kind, no join, no Python."""
    plan = _qplan(spark, "text_bigram_lm")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_embed_prune_plan(spark):
    """corpus_embed_prune: assignment is a narrow fold over centroid
    literals (no shuffle on the big side beyond the tiny cell agg);
    cutoffs attach via BROADCAST (bounded by n_cells — the one
    corpus-independent small side); no window over cells, no cartesian,
    no Python."""
    plan = _qplan(spark, "corpus_embed_prune")
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_winnow_plan(spark):
    """dedup_winnow: selection is a narrow pin()-staged array chain; the
    cross-doc test + verdict join ride ONE fingerprint-keyed exchange
    family + the per-doc rollup and left-join re-keys (the
    dup_span_stats shape) — bounded exchanges, no cartesian/Python."""
    plan = _qplan(spark, "dedup_winnow")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 5, plan


def test_quality_ensemble_plan(spark):
    """corpus_quality_ensemble: the three signals thread through ONE
    narrow plan via keep_cols (no doc_id re-join anywhere) — zero
    exchanges, zero joins, no Python."""
    plan = _qplan(spark, "corpus_quality_ensemble")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_drift_plan(spark):
    """corpus_drift: both count tables are vocabulary-scaled, so the
    full-outer join must NOT plan as a broadcast (NOTES 4a); totals
    attach as 1-row BNLJ broadcasts; the top-k plans as
    TakeOrderedAndProject, never a global sort."""
    plan = _qplan(spark, "corpus_drift")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 2, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_dedup_funnel_plan(spark):
    """corpus_dedup_funnel: the six counts ride localCheckpoint-ed
    stage frames (the LADDER LESSON — without materialization each
    union branch re-derived the whole chain prefix: measured 134
    exchanges; checkpointed: 1), so the audit plan is a union of
    trivial aggregates."""
    plan = _qplan(spark, "corpus_dedup_funnel")
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 8, plan


def test_media_chunk_dedup_plan(spark):
    """media_chunk_dedup: blobs never shuffle — only 32-hex chunk
    hashes move through the ONE cross-test exchange family (the
    dup_span_stats shape); no cartesian, no Python."""
    plan = _qplan(spark, "media_chunk_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 5, plan


def test_bloom_dedup_plan_shape(spark):
    """dedup_bloom: the probe side is a ZERO-SHUFFLE narrow pass — the
    Bloom bitmap rides as a single-row broadcast (the fixed-size-filter
    contract), so the only exchanges are the bounded ref-side distinct
    + the 1-row bitmap agg; no sort-merge join, no Python stage, and
    the paragraph split appears exactly once PER SIDE (ref build +
    probe array — a third means the pinned probe stage re-inlined into
    the flag filter)."""
    plan = _qplan(spark, "dedup_bloom")
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    n = plan.count("Exchange")
    assert n <= 4, f"bloom exchange blow-up: {n}\n{plan}"
    assert plan.count("split(") == 2, plan


def test_cluster_keep_best_plan_shape(spark):
    """dedup_keep_best: the selection is agg-then-join — NO window over
    the cluster key (hot clusters are boilerplate families; a
    row_number would sort the biggest cluster in one task), the
    join-back pins shuffle_hash (the best table is corpus-scaled — an
    AQE broadcast would be a serial driver build), no cartesian, no
    Python stage."""
    plan = _qplan(spark, "dedup_keep_best")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_min" in plan, plan


def test_lexical_diversity_narrow(spark):
    """text_lexical_diversity: pure narrow — zero exchanges, no Python
    stage, and the token split staged exactly once (the pinned sorted
    array; hapax/top-run reductions must reference the attribute, not
    re-tokenize per index)."""
    plan = _qplan(spark, "text_lexical_diversity")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("split(") == 1, plan


def test_chunk_windows_narrow(spark):
    """text_chunk_windows: narrow + ONE posexplode, zero exchanges, no
    Python stage; the token array is staged once (each chunk slices
    the attribute — a second split means it re-tokenized per chunk)."""
    plan = _qplan(spark, "text_chunk_windows")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Generate posexplode") == 1, plan
    assert plan.count("split(") == 1, plan


def test_url_templates_single_exchange(spark):
    """corpus_url_templates: narrow derive into ONE map-side-partial
    agg keyed by (host, template) — no window, no join, no Python."""
    plan = _qplan(spark, "corpus_url_templates")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan or "partial" in plan, plan


def test_script_mix_narrow(spark):
    """text_script_mix: pure narrow — zero exchanges, no Python; the
    four class counts are staged once (a re-inlined strip would show as
    extra regexp_replace sites beyond the 3 classes + the fixture's
    own)."""
    plan = _qplan(spark, "text_script_mix")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("regexp_replace") <= 3, plan


def test_contamination_report_plan(spark):
    """corpus_contamination_report: the bench (item, shingle) set is
    the broadcast side (bounded by construction — the decontaminate
    precedent); the corpus side never shuffles before the join; no
    cartesian, bounded exchanges."""
    plan = _qplan(spark, "corpus_contamination_report")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_health_report_plan(spark):
    """corpus_health_report: the four per-doc signals thread through
    ONE narrow chain (keep_cols — no per-signal re-joins), then a
    single language-keyed aggregation (count-distinct digest = the
    standard two-phase expand, hence <= 3 hash exchanges incl. the
    fixture repartition); no joins, no windows, no Python."""
    plan = _qplan(spark, "corpus_health_report")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_slide_window_plan(spark):
    """events_slide_window: the hopping-window expansion plans as a
    STATIC Expand (window/slide = 4 projections enumerated at plan
    time — cheaper than a Generate), never a join; ONE hash exchange
    keyed by (window, key) with map-side partial agg; no Python."""
    plan = _qplan(spark, "events_slide_window")
    assert "Join" not in plan, plan
    assert "Expand" in plan, plan
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_count" in plan or "partial" in plan, plan
    assert "EvalPython" not in plan, plan


def test_media_cdc_plan(spark):
    """media_cdc_dedup: boundary detection + segment hashing are one
    narrow pinned array chain; the only exchanges are the chunk-hash
    agg and the joins back — blobs never shuffle (only 32-hex hashes
    move); no cartesian, no Python."""
    plan = _qplan(spark, "media_cdc_dedup")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 6, plan


def test_html_main_content_narrow(spark):
    """html_main_content: pure narrow — zero exchanges, no Python, no
    parser objects; the block array and (text, anchor-len) structs are
    pinned stages."""
    plan = _qplan(spark, "html_main_content")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_html_outline_narrow(spark):
    """html_outline: narrow + one posexplode, zero exchanges; both
    capture groups come off pinned extract_all passes."""
    plan = _qplan(spark, "html_outline")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Generate posexplode") == 1, plan


def test_html_metadata_narrow(spark):
    """html_metadata: pure narrow — zero exchanges, no Python; the
    stripped html is ONE pinned column feeding five regexp_extract
    passes (no Generate, no join)."""
    plan = _qplan(spark, "html_metadata")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_html_pub_date_plan(spark):
    """html_pub_date: pure narrow — the per-source (y, m, d) ints are
    pinned STRUCTS so the calendar-validation CASE references
    attributes, not re-inlined group extracts (NOTES gotcha 2); zero
    exchanges, no Generate, no join, no Python."""
    plan = _qplan(spark, "html_pub_date")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_text_mojibake_plan(spark):
    """text_mojibake: the staged replace chain stays one narrow
    codegen span — zero exchanges, no Generate, no join, no
    Python."""
    plan = _qplan(spark, "text_mojibake")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan


def test_html_tables_plan(spark):
    """html_tables: narrow + exactly TWO Generates (table->row,
    row->cell) — zero exchanges, no join, no Python; each regex level
    runs on the already-exploded fragment, never re-scanning the
    page."""
    plan = _qplan(spark, "html_tables")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 2, plan


def test_html_lists_plan(spark):
    """html_lists: narrow + exactly TWO Generates (list->row,
    row->item) — zero exchanges, no join, no Python; the item-level
    regex runs on the already-exploded list body, never re-scanning
    the page."""
    plan = _qplan(spark, "html_lists")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 2, plan


def test_robots_filter_plan(spark):
    """corpus_robots_filter: the big side never shuffles — the only
    exchange keys the curation-bounded rules agg, broadcast onto the
    corpus; the longest-match argmax is a pinned array_max (no window,
    no Python)."""
    plan = _qplan(spark, "corpus_robots_filter")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_anchor_text_plan(spark):
    """corpus_anchor_text: ONE map-side-partial agg keyed (dst_host,
    term) + the per-host top-k as WindowGroupLimit (map-side k-prune)
    — no join, no Python; hub hosts never materialize full term
    lists."""
    plan = _qplan(spark, "corpus_anchor_text")
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_web_extract_plan(spark):
    """corpus_web_extract: html -> main-content -> classifier ->
    script-mix -> keep composed as ONE narrow chain (keep_cols
    threading) — zero exchanges, zero joins, no Python; the whole
    extraction decision runs inside the scan's partitioning."""
    plan = _qplan(spark, "corpus_web_extract")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_html_ctx_narrow(spark):
    """html_main_content_ctx: the context folds stay narrow — zero
    exchanges, no Python."""
    plan = _qplan(spark, "html_main_content_ctx")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_link_graph_plan(spark):
    """corpus_link_graph: narrow link extraction + ONE map-side-partial
    agg keyed by (src, dst); no window, no join, no Python (the
    count-distinct doc adds the standard expand, still one keyed
    exchange family)."""
    plan = _qplan(spark, "corpus_link_graph")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_hits_plan(spark):
    """graph_hits: the per-round score joins pin shuffle_hash (score
    tables are node-scaled — never broadcast-joined, NOTES 4a); the
    only nested-loop is the 1-row L1-total broadcast; no cartesian,
    no Python."""
    plan = _qplan(spark, "graph_hits")
    assert "CartesianProduct" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def test_pagerank_plan(spark):
    """graph_pagerank: the per-round joins pin shuffle_hash (rank and
    degree tables are node-scaled — never broadcast, NOTES 4a), no
    cartesian, no Python stage."""
    plan = _qplan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_corpus_sitemap_plan(spark):
    """corpus_sitemap: narrow + exactly ONE Generate (block->entry) —
    zero exchanges, no join, no Python; the per-entry loc/lastmod
    regexes run on the already-exploded block body."""
    plan = _qplan(spark, "corpus_sitemap")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 1, plan


def test_html_jsonld_plan(spark):
    """html_jsonld: narrow + exactly ONE Generate (block->row) — zero
    exchanges, no join, no Python; the per-field get_json_object
    parses run on the already-exploded block attribute."""
    plan = _qplan(spark, "html_jsonld")
    # +1 exchange: the fixture-edge scan-parallelism re-key (_spread, r06)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 1, plan


def test_corpus_feed_items_plan(spark):
    """corpus_feed_items: narrow + exactly ONE Generate (block->item)
    — zero exchanges, no join, no Python; per-item title/link/date
    regexes run on the already-exploded block body."""
    plan = _qplan(spark, "corpus_feed_items")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 1, plan


def test_html_hreflang_plan(spark):
    """html_hreflang: narrow + exactly ONE Generate (tag->row) — zero
    exchanges, no join, no Python; attribute regexes run on the
    already-exploded link tag."""
    plan = _qplan(spark, "html_hreflang")
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 1, plan


def test_html_feed_discovery_plan(spark):
    """html_feed_discovery: narrow + exactly ONE Generate — zero
    exchanges, no join, no Python (the hreflang shape)."""
    plan = _qplan(spark, "html_feed_discovery")
    assert "Exchange" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_corpus_crawl_diff_plan(spark):
    """corpus_crawl_diff: only (url, md5) shuffles — two url-keyed
    partial-agg exchanges + the full-outer join co-partition, ONE
    pinned ShuffledHashJoin, never a broadcast (both snapshots are
    corpus-scaled), no Python."""
    plan = _qplan(spark, "corpus_crawl_diff")
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "FullOuter" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "EvalPython" not in plan, plan


def test_html_images_plan(spark):
    """html_images: narrow + exactly ONE Generate (tag->row) — zero
    exchanges, no join, no Python."""
    plan = _qplan(spark, "html_images")
    assert "Exchange" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_corpus_image_captions_plan(spark):
    """corpus_image_captions: the keep-best rule is an AGGREGATE
    (map-side partial min-struct), never a window over hot srcs —
    exactly ONE src exchange, no Sort, no Window, no join, no
    Python."""
    plan = _qplan(spark, "corpus_image_captions")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    # struct-min plans as SortAggregate: partition-LOCAL sorts are the
    # agg's mechanism — a global sort (rangepartitioning) is what the
    # hot-key rule forbids
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan
    # the pinned alt chain must not re-inline into the caption filter
    assert plan.count("(?is)[ \\t\\n\\r]alt") <= 2, plan


def test_corpus_dom_stats_plan(spark):
    """corpus_dom_stats: pure narrow — zero exchanges, zero Generate,
    no join, no Python (regexp_count passes over one pinned
    stripped-html column)."""
    plan = _qplan(spark, "corpus_dom_stats")
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_graph_hop_distance_plan(spark):
    """graph_hop_distance: rounds checkpoint, so the visible plan is
    the LAST level — ONE pinned ShuffledHashJoin, never a broadcast
    (frontier and edges are graph-scaled) or cartesian, <= 5 hash
    exchanges (join co-partition, level distinct, final min agg), no
    Python."""
    plan = _qplan(spark, "graph_hop_distance")
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 5, plan
    assert "EvalPython" not in plan, plan


def test_html_opengraph_plan(spark):
    """html_opengraph: pure narrow — zero exchanges, zero Generate,
    no join, no Python (six regexp_extract passes over one pinned
    stripped-html column)."""
    plan = _qplan(spark, "html_opengraph")
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_html_robots_meta_plan(spark):
    """html_robots_meta: pure narrow — zero exchanges, zero Generate
    (the token flatten is an expression, not an explode), no join, no
    Python."""
    plan = _qplan(spark, "html_robots_meta")
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_text_sentences_plan(spark):
    """text_sentences: narrow + exactly ONE Generate (sentence array
    -> rows) — zero exchanges, no join, no Python; the token count
    runs on the already-exploded sentence attribute."""
    plan = _qplan(spark, "text_sentences")
    assert "Exchange" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_corpus_bitext_pairs_plan(spark):
    """corpus_bitext_pairs (materialize=True): the pair self-join runs
    over the CHECKPOINTED member table — exactly TWO cluster_key
    exchanges feeding ONE pinned ShuffledHashJoin; never a broadcast
    (members scale with the crawl — the soft_weights AQE trap), never
    a cartesian/BNLJ, no Python."""
    plan = _qplan(spark, "corpus_bitext_pairs")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_canonical_dedup_plan(spark):
    """corpus_canonical_dedup: the metadata extraction stays narrow;
    TWO canon_key hash exchanges (count agg + join co-partition) and
    a PINNED shuffle_hash count-back join — never a broadcast (the
    counts table scales with the corpus: the dedup_soft_weights
    trap); no Python."""
    plan = _qplan(spark, "corpus_canonical_dedup")
    assert plan.count("Exchange") == 2, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_fetch_schedule_plan(spark):
    """corpus_fetch_schedule: ONE host hash exchange with the
    WindowGroupLimit partial top-k prune map-side (the quota_topk
    lesson — a hot host cannot skew the shuffle); no join, no
    Python."""
    plan = _qplan(spark, "corpus_fetch_schedule")
    assert plan.count("Exchange") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_corpus_translation_clusters_plan(spark):
    """corpus_translation_clusters: key agg + PINNED shuffle_hash
    key-back join + triple distinct + n_langs WINDOW = exactly 4
    exchanges, ONE join, extraction subtree derived exactly twice
    (keys + join branches — the documented cost; the first agg+join
    draft re-derived it 4x at 8 exchanges / 3 joins); never a
    broadcast, no Python."""
    plan = _qplan(spark, "corpus_translation_clusters")
    assert plan.count("Exchange") == 4, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert plan.count("Generate") == 2, plan


def test_events_funnel_plan(spark):
    """events_funnel: ONE user-keyed hash exchange — the two staged
    running-min windows share the sort and the final per-user agg
    extends the window's clustering (subset rule); no join, no
    Python."""
    plan = _qplan(spark, "events_funnel")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_retention_plan(spark):
    """events_retention: user agg + PINNED shuffle_hash first-day join
    (the first-day table scales with the user base — never broadcast)
    + (cohort, offset) agg + cohort window over the tiny matrix = 4
    exchanges, ONE join; the (cohort, offset, user) dedup level runs
    exchange-free on the join's user partitioning (subset rule); no
    Python."""
    plan = _qplan(spark, "events_retention")
    assert plan.count("Exchange") == 4, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_text_dehyphenate_plan(spark):
    """text_dehyphenate: zero-exchange narrow replace chain — no
    join, no Generate, no Python."""
    plan = _qplan(spark, "text_dehyphenate")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_text_code_detect_plan(spark):
    """text_code_detect: zero-exchange narrow counting chain — no
    join, no Generate, no Python (the ~20 length/replace pairs run on
    the pinned text attribute)."""
    plan = _qplan(spark, "text_code_detect")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_inverted_index_plan(spark):
    """corpus_inverted_index: (token, doc) tf agg + token df agg +
    PINNED shuffle_hash join (df table is corpus-scaled — never
    broadcast) + token re-key = 4 exchanges, ONE join, and the
    rank<=k filter plans WindowGroupLimit (map-side posting prune);
    the tokenize subtree is derived twice (df + probe branches — the
    tfidf shape); no Python."""
    plan = _qplan(spark, "corpus_inverted_index")
    assert plan.count("Exchange") == 4, plan
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Generate") == 2, plan
    assert "EvalPython" not in plan, plan


def test_corpus_warc_records_plan(spark):
    """corpus_warc_records: zero-exchange narrow chain — ONE Generate
    (record posexplode), per-fragment header regexes, no join, no
    Python."""
    plan = _qplan(spark, "corpus_warc_records")
    assert "Exchange" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_session_paths_plan(spark):
    """events_session_paths: user exchange (sessionize) + path count
    exchange = 2; the lead window re-sorts LOCALLY on the session key
    (subset rule, no third exchange) and the top-k plans
    TakeOrderedAndProject (no global sort); no join, no Python."""
    plan = _qplan(spark, "events_session_paths")
    assert plan.count("Exchange") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_rate_spikes_plan(spark):
    """events_rate_spikes: one (key, slot) count exchange with
    map-side partial + one key exchange for the trailing RANGE window
    over the aggregated table = 2 exchanges (+ the fixture's burst
    union scans); no join, no Python."""
    plan = _qplan(spark, "events_rate_spikes")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_robots_rules_plan(spark):
    """corpus_robots_rules: host window exchange + the (host, group)
    fan-out join's two exchanges — PINNED shuffle_hash, both sides
    crawl-scaled (never broadcast); the line subtree is re-derived
    across the agents/rules/sitemap branches (the tfidf shape); no
    Python."""
    plan = _qplan(spark, "corpus_robots_rules")
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_text_license_detect_plan(spark):
    """text_license_detect: zero-exchange narrow marker scan on the
    pinned lowered text — no join, no Generate, no Python."""
    plan = _qplan(spark, "text_license_detect")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_sitemap_diff_plan(spark):
    """corpus_sitemap_diff: two url-keyed distinct aggs whose
    partitioning the FULL OUTER join reuses — PINNED shuffle_hash
    (both sides crawl-scaled, never broadcast), ONE Generate (the
    sitemap block explode); no Python."""
    plan = _qplan(spark, "corpus_sitemap_diff")
    assert plan.count("ShuffledHashJoin") == 1, plan
    assert "FullOuter" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "EvalPython" not in plan, plan


def test_graph_degree_stats_plan(spark):
    """graph_degree_stats: every join host-keyed and PINNED
    shuffle_hash over the ALREADY-AGGREGATED edge table (4 joins:
    reciprocity self-join + out/in full-outer + two lefts); never a
    broadcast, no cartesian, no Python."""
    plan = _qplan(spark, "graph_degree_stats")
    assert plan.count("ShuffledHashJoin") == 4, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_text_vocab_coverage_plan(spark):
    """text_vocab_coverage: the vocab is k-BOUNDED so its broadcast
    is the justified one (the decontaminate rule); one token agg +
    the per-doc agg; no shuffle-side join of the corpus."""
    plan = _qplan(spark, "text_vocab_coverage")
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_ab_lift_plan(spark):
    """events_ab_lift: ONE user-keyed aggregation + the single-row
    global aggregation — 2 hash exchanges (the global agg's partial/
    final pair plans as SinglePartition), NO join anywhere."""
    plan = _qplan(spark, "events_ab_lift")
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_html_link_resolve_plan(spark):
    """html_link_resolve: zero-exchange narrow expression tree — no
    join, no Generate, no Python."""
    plan = _qplan(spark, "html_link_resolve")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_media_srt_cues_plan(spark):
    """media_srt_cues: narrow chain with ONE Generate (block
    posexplode) + ONE doc-keyed exchange (the cue_no window); no
    join, no Python."""
    plan = _qplan(spark, "media_srt_cues")
    assert plan.count("Generate") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_cdx_records_plan(spark):
    """corpus_cdx_records: narrow SURT key construction + the
    standard two-level distinct-aggregate shape (partial on
    (surt, digest), final on surt) = 2 exchanges; no join, no
    Python."""
    plan = _qplan(spark, "corpus_cdx_records")
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_hll_distinct_plan(spark):
    """corpus_hll_distinct: register path = map-side-partial max over
    (grp, reg) then the per-group fold (2 exchanges), audit path = the
    mixed count/count-distinct Expand aggregate (2 exchanges), joined
    with a SHUFFLED hash join (the per-group tables scale with group
    cardinality — a host-keyed sketch must not broadcast them); no
    cartesian, no Python."""
    plan = _qplan(spark, "corpus_hll_distinct")
    assert plan.count("Exchange") == 4, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan, plan


def test_dedup_jaccard_estimate_plan(spark):
    """dedup_jaccard_estimate: the (sid, set, sig) table is
    MATERIALIZED (LADDER rule — three consumers) so the tokenize/
    shingle/signature chain plans ONCE as checkpoint scans; all three
    joins are SHUFFLED hash (candidates and doc sets scale with the
    corpus — no broadcast), no cartesian, no Python."""
    plan = _qplan(spark, "dedup_jaccard_estimate")
    assert plan.count("ShuffledHashJoin") == 3, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan, plan
    # the shingle chain must NOT be re-derived per consumer: after the
    # checkpoint there is no tokenizing split() left in the plan
    assert "split(" not in plan, plan


def test_corpus_length_buckets_plan(spark):
    """corpus_length_buckets: token count + boundary CASE are narrow;
    ONE hash(bucket_cap) exchange feeds both the ordering window and
    the (bucket, batch) aggregation (bucket is a subset of the
    grouping key, so the agg reuses the window's partitioning); no
    join, no Python."""
    plan = _qplan(spark, "corpus_length_buckets")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_registered_domains_plan(spark):
    """corpus_registered_domains: the suffix argmax is a narrow
    (length, suffix) struct array_max — no join against a suffix
    table, no broadcast; the rollup is the standard two-level
    distinct aggregate (2 exchanges); no Python."""
    plan = _qplan(spark, "corpus_registered_domains")
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_bpe_pairs_plan(spark):
    """corpus_bpe_pairs: wordcount agg + vocabulary-bounded pair agg
    (2 exchanges), top-k as TakeOrderedAndProject — NO global sort,
    no join, no Python."""
    plan = _qplan(spark, "corpus_bpe_pairs")
    assert plan.count("Exchange") == 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_cooccurrence_plan(spark):
    """corpus_cooccurrence: pair generation is NARROW (array slices,
    no position self-join); the aggregated pair table is checkpointed
    (LADDER rule — 4 consumers; no tokenizing split() left in the
    plan); marginal joins are SHUFFLED hash; the only broadcast is the
    1-row total (BroadcastNestedLoop on a literal single row)."""
    plan = _qplan(spark, "corpus_cooccurrence")
    assert plan.count("ShuffledHashJoin") == 2, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert "split(" not in plan, plan
    assert plan.count("Exchange") <= 6, plan
    assert "EvalPython" not in plan, plan


def test_events_hll_users_plan(spark):
    """events_hll_users: the sketch shape on the events table — same
    bounds as the documents fixture (4 exchanges, SHJ, no
    broadcast)."""
    plan = _qplan(spark, "events_hll_users")
    # 4 -> 8 (r06): the _spread fixture re-key appears under every
    # consumer branch (2 union arms x 2 sketch consumers) in the static
    # plan; runtime exchange reuse computes it once
    assert plan.count("Exchange") == 8, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_html_forms_plan(spark):
    """html_forms: narrow strip passes + ONE posexplode; per-form
    regexes on the exploded attribute (no re-derivation); zero
    exchanges, no join, no Python."""
    plan = _qplan(spark, "html_forms")
    assert plan.count("Generate") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_bot_detect_plan(spark):
    """events_bot_detect: ONE user-keyed exchange shared by the lag
    window and the per-user aggregation (subset rule); the decision
    runs on the tiny aggregate — no join, no Python."""
    plan = _qplan(spark, "events_bot_detect")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_host_safety_plan(spark):
    """corpus_host_safety: pure narrow classification — pinned host +
    ONE pinned octet struct + ONE pinned decision struct; zero
    exchanges, no join, no Python."""
    plan = _qplan(spark, "corpus_host_safety")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_corpus_warc_extract_plan(spark):
    """corpus_warc_extract: archive parse -> payload -> main-content
    extraction is ONE zero-exchange narrow chain with a single
    Generate (the record posexplode) — the payload never crosses an
    exchange; no join, no Python."""
    plan = _qplan(spark, "corpus_warc_extract")
    assert "Exchange" not in plan, plan
    assert plan.count("Generate") == 1, plan
    assert "Join" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_attribution_plan(spark):
    """events_attribution: ONE user-keyed exchange shared by the
    conversion window (no sort — partition-wide min) and the per-user
    agg; the matrix rollup aggregates a types^2-bounded table; no
    join, no Python."""
    plan = _qplan(spark, "events_attribution")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 3, plan
    assert "EvalPython" not in plan, plan
