"""Deterministic corpus sampling operators (training-data pipeline ops).

At 100 TB, ``df.sample()`` is the wrong tool for corpus subsetting: its
selection depends on partition layout and seed plumbing, so a re-run
after a repartition (or a resume after failure) selects DIFFERENT rows —
a training set that cannot be reproduced or resumed.  Both operators
here derive the decision from row CONTENT (a stable key), so any engine,
any partitioning, any rerun selects the identical subset, and the
driver's DuckDB oracle can reproduce it exactly.

  hash_mod_sample       content-hash Bernoulli sampling (rate = k/256)
  stratified_sample     per-stratum hash rates (language/source mixing)
  quota_topk_per_group  per-group top-k (quality quota per source/domain)
  shard_shuffle         deterministic training-order shuffle into shards
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salted_digest(key_col: str, salt: str) -> Column:
    """THE content-hash every sampling/layout decision derives from:
    ``md5(key || '|' || salt)`` — single-sited (the _WSRE2 'ONE site'
    convention) because every DuckDB oracle mirrors this format byte
    for byte; a change here must be mirrored into the oracle SQL
    fragments in queries.py."""
    return F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))
    )


def hash_mod_sample(
    df: DataFrame,
    key_col: str,
    keep_hex: str = "3f",
    salt: str = "s0",
) -> DataFrame:
    """Keep rows whose ``md5(key || '|' || salt)`` first-two-hex-digit
    prefix is <= ``keep_hex`` — rate = (int(keep_hex,16)+1)/256 (``"3f"``
    = 25%).  The hex-prefix comparison is pure lexicographic string
    ordering, identical in every engine (no integer conversion needed).

    ``salt`` decorrelates independent samples of the same corpus (e.g.
    a held-out split uses a different salt, guaranteeing the two samples
    are independent but each individually reproducible).

    100 TB shape: a pure narrow filter — no shuffle, no state; composes
    with scan pruning (the filter sits directly above the scan).
    """
    keep_hex = keep_hex.lower()
    if len(keep_hex) != 2 or any(c not in "0123456789abcdef" for c in keep_hex):
        # md5 output is lowercase hex: an uppercase threshold compares
        # below every a-f prefix and silently under-samples.
        raise ValueError(
            f"keep_hex must be two lowercase hex digits, got {keep_hex!r}"
        )
    digest = _salted_digest(key_col, salt)
    return df.filter(F.substring(digest, 1, 2) <= F.lit(keep_hex))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, str],
    key_col: str,
    default_hex: str = "00",
    salt: str = "st0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-MIXING primitive of
    corpus assembly (e.g. keep 50% of en, 25% of fr, 6% of everything
    else to hit a target language distribution).  ``rates`` maps a
    stratum value to its two-hex-digit keep threshold exactly as in
    hash_mod_sample (``"7f"`` = 50%, ``"3f"`` = 25%); strata absent from
    the map fall back to ``default_hex`` (``"00"`` = keep ~0.4%, the
    floor rate — pass ``None`` to DROP unlisted strata entirely).

    The rate map is compiled into a literal CASE chain, so like
    hash_mod_sample this is a pure narrow filter: no shuffle, no join
    against a rates table, and the same row set survives under any
    partitioning/resume.  The per-row decision reuses the SAME salted
    digest as hash_mod_sample, so a stratified pass and a flat pass with
    different salts stay independent.

    100 TB shape: narrow filter above the scan; the CASE chain is
    O(len(rates)) comparisons per row against a column attribute —
    bounded by the stratum vocabulary (languages/sources), not the data.
    """
    rates = {s: v.lower() for s, v in rates.items()}
    if default_hex is not None:
        default_hex = default_hex.lower()
    for v in list(rates.values()) + (
        [default_hex] if default_hex is not None else []
    ):
        if len(v) != 2 or any(c not in "0123456789abcdef" for c in v):
            raise ValueError(
                f"rates must be two lowercase hex digits, got {v!r}"
            )
    digest = _salted_digest(key_col, salt)
    thresh = None
    for stratum, hx in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        thresh = (
            F.when(cond, F.lit(hx))
            if thresh is None
            else thresh.when(cond, F.lit(hx))
        )
    if thresh is None:
        thresh = F.lit(default_hex)
    elif default_hex is not None:
        thresh = thresh.otherwise(F.lit(default_hex))
    # NULL threshold (unlisted stratum, default_hex=None) fails the
    # comparison -> row dropped, which is the documented semantics
    return df.filter(F.substring(digest, 1, 2) <= thresh)


def quota_topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-group quota: the top ``k`` rows by ``order_col`` (descending)
    within each ``group_col`` — the CCNet/RefinedWeb-style move of
    capping any single domain's contribution to the training mix while
    keeping its best documents.

    Tie-break is explicit and total (``order_col`` desc, then ``id_col``
    asc) so the selected set is deterministic and oracle-reproducible —
    a bare ``ORDER BY quality DESC LIMIT k`` is partition-order lottery
    on ties.  ``rank_col`` names the emitted rank column (refuses to
    clobber an existing column).

    100 TB shape: one hash exchange on ``group_col``, and because the
    ``rank <= k`` filter is visible to Catalyst, the WindowGroupLimit
    rule plans a PARTIAL top-k prune on the map side — at most k rows
    per (group, map partition) transit the exchange, so a mega-domain
    cannot skew the shuffle (plan-pinned:
    tests/test_plan_properties.py::test_quota_topk_single_exchange).
    """
    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists in the input — pass a "
            "different name instead of silently overwriting it"
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )


def shard_shuffle(
    df: DataFrame,
    key_col: str,
    prefix_len: int = 2,
    salt: str = "sh0",
) -> DataFrame:
    """Deterministic training-order shuffle: assign every row a
    ``shard`` (the first ``prefix_len`` hex digits of the salted key
    md5 — 16^prefix_len shards) and a ``pos`` (its rank within the
    shard, ordered by the full digest then the key).  Reading shards in
    name order, each by ``pos``, replays one fixed pseudo-random
    permutation of the corpus — the property training-data loaders need
    (epoch order must be reproducible and resumable; ``orderBy(rand())``
    gives a different order every run and cannot be resumed).

    ``salt`` selects the permutation (a new training run re-shuffles by
    changing the salt, each still fully reproducible).

    100 TB shape: one hash exchange keyed by shard + a per-shard sort —
    i.e. exactly the cost of writing the output partitioned by shard.
    ``prefix_len`` sizes shards to the corpus (2 -> 256 shards, ok to a
    few TB; 4 -> 65k shards at CC scale).  For a pure write path, skip
    the rank column and use ``df.repartition("shard")
    .sortWithinPartitions("_dg")`` — same plan minus the window state;
    the ``pos`` form here is the oracle-checkable contract.
    """
    if not 1 <= prefix_len <= 8:
        raise ValueError("prefix_len must be in [1, 8]")
    dg = _salted_digest(key_col, salt)
    from ..functions.numeric import pin

    out = df.withColumn("_dg", pin(dg)).withColumn(
        "shard", F.substring(F.col("_dg"), 1, prefix_len)
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_dg").asc(), F.col(key_col).asc()
    )
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("_dg")


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    target_total: int,
    alpha: float = 0.5,
    salt: str = "mx0",
) -> DataFrame:
    """Temperature-based source REWEIGHTING + deterministic realization
    — the data-mixing step that turns raw per-source counts into a
    training mix (the "temperature sampling"
    trick used by multilingual and multi-domain corpus builders, public
    knowledge: sample source s with probability
    proportional to n_s^alpha, alpha<1 upweights small sources).

    Per source: w_s = floor(sqrt(n_s) * 1e6) at the default alpha=0.5
    (sqrt is IEEE-correctly-rounded in every engine, so the integer
    weights — and everything downstream — are bit-identical across
    Spark and the DuckDB oracle; other alphas use pow() with a
    documented cross-engine 1-ulp caveat).  The realized keep rate is
    r_s = min(1, target_total * (w_s / W) / n_s) with W = sum(w_s)
    (exact BIGINT sum — order-independent, unlike a double sum), and
    each row keeps iff the first four hex digits of md5(key || '|' ||
    salt) sit below floor(r_s * 65536) — the same content-hash
    realization as hash_mod_sample, so the selected set is reproducible
    under any partitioning/resume and independent across salts.

    100 TB shape: ONE map-side-partial count agg over the corpus; the
    per-source weight/threshold table is bounded by the source
    vocabulary (not the data) and is broadcast back — the same
    bounded-by-construction broadcast as decontaminate's benchmark
    shingles; the keep decision itself is a narrow filter.  Returns the
    kept rows as (key_col, source_col, src_n, src_w, keep_thr) — all
    integers, fully hash-checkable.

    NULL-source rows carry no stratum evidence and are DROPPED — and
    they are excluded from the weighting too: counting them into W
    while the inner join discards them would silently deflate every
    real source's keep rate (route such rows through a 'unknown'
    constant upstream to keep them).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if target_total <= 0:
        raise ValueError("target_total must be positive")
    df = df.filter(F.col(source_col).isNotNull())
    n_dbl = F.col("_mx_n").cast("double")
    pw = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_mx_n"))
        .withColumn("_mx_w", F.floor(pw * F.lit(1000000.0)).cast("long"))
    )
    total_w = counts.agg(F.sum("_mx_w").alias("_mx_tw"))
    # threshold in fixed double op order: ((65536*T) * w / W) / n —
    # every intermediate is IEEE-defined on exact integer inputs, so
    # both engines floor the same value
    thr = F.least(
        F.floor(
            F.lit(65536.0 * target_total)
            * F.col("_mx_w").cast("double")
            / F.col("_mx_tw").cast("double")
            / F.col("_mx_n").cast("double")
        ).cast("long"),
        F.lit(65536).cast("long"),
    )
    rates = (
        counts.crossJoin(F.broadcast(total_w))
        .withColumn("_mx_thr", thr)
        .select(
            source_col,
            F.col("_mx_n").alias("src_n"),
            F.col("_mx_w").alias("src_w"),
            F.col("_mx_thr").alias("keep_thr"),
        )
    )
    digest4 = F.substring(_salted_digest(key_col, salt), 1, 4)
    hex4 = F.lower(F.lpad(F.hex(F.col("keep_thr")), 4, "0"))
    return (
        df.select(key_col, source_col)
        .join(F.broadcast(rates), on=source_col, how="inner")
        .filter((F.col("keep_thr") >= 65536) | (digest4 < hex4))
        .select(key_col, source_col, "src_n", "src_w", "keep_thr")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    budget: int,
    text_col: str = "text",
    prefix_len: int = 2,
    salt: str = "sh0",
) -> DataFrame:
    """Concat-and-split sequence PACKING — the step between a curated
    corpus and a pretraining loader (public knowledge: GPT-style
    pipelines concatenate documents in a fixed order and split every
    ``budget`` tokens; documents may CROSS sequence boundaries).  Lays
    documents out in the deterministic shard_shuffle order (salted-md5
    shard, within-shard (digest, key) order), runs an exact token-count
    cumsum per shard, and maps every document to the training sequences
    it lands in: sequence boundaries fall every ``budget`` tokens from
    the shard start.

    Returns one row per document::

        (key_col, shard, n_tokens, start_tok, seq_first, seq_last)

    start_tok is the document's first token offset within its shard;
    seq_first/seq_last the first/last sequence index it occupies
    (equal when it fits inside one sequence; empty documents occupy no
    tokens and report seq_first == seq_last at their offset).  All
    columns integer/hex-string — fully hash-checkable, and a rerun
    under ANY partitioning reproduces the identical packing (the
    property resumable training loaders need; the frame is an explicit
    ROWS window over a UNIQUE (digest, key) order, so no RANGE-frame
    tie ambiguity exists in either engine).

    100 TB shape: ONE hash exchange keyed by shard + the per-shard
    sort — identical cost to shard_shuffle (packing rides the same
    layout pass); the cumsum is a running ROWS frame, no second
    shuffle.  Shards pack independently, exactly how per-worker
    training loaders consume them; ``prefix_len`` sizes shards as in
    shard_shuffle.
    """
    from ..functions.numeric import pin
    from .text import tokens

    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not 1 <= prefix_len <= 8:
        raise ValueError("prefix_len must be in [1, 8]")
    for n in ("_pk_dg", "_pk_n", "_pk_cum", "shard"):
        if n in df.columns:
            # 'shard' is an OUTPUT column: silently overwriting a
            # caller's existing shard (e.g. shard_shuffle output fed
            # back in) would hide a layout mismatch — same refuse-to-
            # clobber convention as quota_topk_per_group's rank_col
            raise ValueError(f"output/staging column {n!r} already exists")
    dg = _salted_digest(key_col, salt)
    base = (
        df.withColumn("_pk_dg", pin(dg))
        .withColumn("shard", F.substring(F.col("_pk_dg"), 1, prefix_len))
        .withColumn(
            # NULL text carries no tokens: coalesce keeps the cumsum
            # exact and the all-integer output contract intact (size()
            # of a NULL array would NULL every downstream column)
            "_pk_n",
            F.coalesce(
                F.size(tokens(F.col(text_col))).cast("long"), F.lit(0)
            ),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_pk_dg").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.withColumn("_pk_cum", F.sum("_pk_n").over(w))
    start = F.col("_pk_cum") - F.col("_pk_n")
    seq_first = F.floor(start / budget).cast("long")
    seq_last = F.when(
        F.col("_pk_n") > 0,
        F.floor((F.col("_pk_cum") - 1) / budget),
    ).otherwise(seq_first).cast("long")
    return base.select(
        F.col(key_col),
        F.col("shard"),
        F.col("_pk_n").alias("n_tokens"),
        start.cast("long").alias("start_tok"),
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
    )


def split_thresholds(
    splits: tuple = (("train", 0.90), ("val", 0.05)),
) -> list:
    """Cumulative 4-hex split thresholds — ONE site (the _salted_digest
    convention): the engine CASE in ``split_assign`` and the DuckDB
    oracle CASE in queries.py are both generated from this list, so the
    float accumulation order is identical by construction.  Each listed
    split must have a positive fraction and the cumulative sum must
    stay below 1 (the remainder is the caller's else bucket)."""
    import math

    out, cum = [], 0.0
    for name, frac in splits:
        if frac <= 0.0:
            raise ValueError(f"split {name!r}: fraction must be > 0")
        cum += frac
        t = math.floor(cum * 65536.0)
        if t >= 65536:
            raise ValueError(
                "listed splits must sum below 1 (the else bucket takes "
                f"the remainder); cumulative {cum} at {name!r}"
            )
        out.append((name, format(t, "04x")))
    return out


def split_assign(
    df: DataFrame,
    group_col: str,
    splits: tuple = (("train", 0.90), ("val", 0.05)),
    rest: str = "test",
    salt: str = "sp0",
) -> DataFrame:
    """Deterministic LEAKAGE-SAFE train/val/test assignment: the split
    is a pure function of ``group_col`` — the leakage unit — so every
    row sharing a group lands in the same split by construction.  Pass
    the near-dup cluster id (connected components over MinHash pairs)
    and duplicates can never straddle train/val (the classic eval-
    contamination bug a per-document random split ships); a host
    column gives the site-level variant, an exact-content digest the
    cheap form.

    Assignment: the first four hex digits of md5(group || '|' || salt)
    — the corpus-wide _salted_digest convention — compared against the
    cumulative thresholds from ``split_thresholds`` (pure string
    comparison, identical in every engine); rows past every listed
    threshold take the ``rest`` bucket.  Deterministic under any
    partitioning/resume, independent across salts, and reproducible by
    the DuckDB oracle byte for byte.

    100 TB shape: a narrow projection — ZERO shuffles, no UDF (when the
    group key is already a column; clustering upstream pays its own
    cost).  Appends a ``split`` column; all input columns pass through.
    """
    names = [n for n, _ in splits] + [rest]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    if "split" in df.columns:
        raise ValueError(
            "input already has a 'split' column — rename it first "
            "(split_assign appends its own)"
        )
    from ..functions.numeric import pin

    digest4 = F.substring(_salted_digest(group_col, salt), 1, 4)
    staged = df.withColumn("_sp_d4", pin(digest4))
    case = None
    for name, hex4 in split_thresholds(splits):
        arm = F.col("_sp_d4") < F.lit(hex4)
        case = (
            F.when(arm, F.lit(name))
            if case is None
            else case.when(arm, F.lit(name))
        )
    case = case.otherwise(F.lit(rest))
    return staged.select(*df.columns, case.alias("split"))


def epoch_plan(
    df: DataFrame,
    target_total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained EPOCH planning — given a token budget and a
    temperature mix, how many times must each source be repeated, and
    which sources hit the repeat cap (public knowledge: repeating
    web-scale data beyond ~4 epochs yields rapidly diminishing
    returns, Muennighoff et al. 2023; mixtures are realized as
    per-source epoch counts in every open corpus recipe).

    Per source: exact BIGINT token total (whitespace-run tokens, the
    corpus convention), temperature weight w_s = floor(n_tokens^alpha
    * 1e6) (sqrt at the default — IEEE-correctly-rounded, so integer
    weights are engine-identical), requested_tokens =
    floor(target * w_s / W) in the fixed double op order (exact while
    the integer inputs sit below 2^53 — mixture_sample's documented
    envelope), epochs = exact integer ceil-div of requested by
    n_tokens (DIV arithmetic, no doubles) capped at ``max_epochs``,
    realized_tokens = min(requested, n_tokens * max_epochs), and
    ``capped`` flags the sources the budget over-asks.  Zero-token
    sources plan zero epochs.

    100 TB shape: ONE map-side-partial aggregation over the corpus;
    the plan table is |sources| rows (bounded by the source
    vocabulary) with a broadcast of the 1-row weight total.  Returns
    (source, n_docs, n_tokens, weight, requested_tokens, epochs,
    realized_tokens, capped) sorted nowhere — order-free, all
    integers + one boolean.  An all-zero-token corpus (weight total 0)
    plans zero everywhere rather than dividing by zero."""
    if target_total_tokens <= 0:
        raise ValueError("target_total_tokens must be positive")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    from .text import token_count

    per_doc = df.filter(F.col(source_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.coalesce(
            token_count(F.col(text_col)).cast("long"), F.lit(0)
        ).alias("_ep_t"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ep_t").alias("n_tokens"),
    )
    n_dbl = F.col("n_tokens").cast("double")
    pw = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    agg = agg.withColumn(
        "weight", F.floor(pw * F.lit(1000000.0)).cast("long")
    )
    total = agg.agg(F.sum("weight").alias("_ep_w"))
    req = F.when(F.col("_ep_w") > 0, F.floor(
        F.lit(float(target_total_tokens))
        * F.col("weight").cast("double")
        / F.col("_ep_w").cast("double")
    )).otherwise(F.lit(0)).cast("long")
    base = agg.crossJoin(F.broadcast(total)).withColumn(
        "requested_tokens", req
    )
    epochs_raw = F.expr(
        "(requested_tokens + n_tokens - 1) DIV n_tokens"
    )
    epochs = F.when(F.col("n_tokens") <= 0, F.lit(0)).otherwise(
        F.least(epochs_raw, F.lit(max_epochs))
    ).cast("long")
    realized = F.when(F.col("n_tokens") <= 0, F.lit(0)).otherwise(
        F.least(
            F.col("requested_tokens"),
            F.col("n_tokens") * F.lit(max_epochs),
        )
    ).cast("long")
    return base.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        "requested_tokens",
        epochs.alias("epochs"),
        realized.alias("realized_tokens"),
        (F.col("requested_tokens") > realized).alias("capped"),
    )


# DSIR hashed-ngram importance table (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"; public knowledge).
# Features are the shared text.ngram_features chain (lowered unigrams +
# adjacent bigrams) hashed into 256 buckets via md5[:2]; each bucket
# carries log p_target(bucket) - log p_raw(bucket).  The values here
# are deterministic pseudo log-ratios from a fixed formula (a stand-in
# for the fitted tables, like UNIGRAM_LOGPROBS / CLASSIFIER_WEIGHTS:
# real deployments fit the two hashed-ngram distributions on a target
# corpus and the raw crawl and swap the dict; the OPERATOR SHAPE is the
# production plan either way).  The DuckDB oracle regenerates its CASE
# from this same dict — ONE site to edit.
DSIR_LOG_RATIOS = {
    f"{i:02x}": round((((i * 53) % 97) - 48) / 150.0, 6)
    for i in range(256)
}


def dsir_sample(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir0",
) -> DataFrame:
    """DSIR importance RESAMPLING: select ``n`` documents with
    probability proportional to exp(log importance weight) via the
    Gumbel-top-k trick (public knowledge: sampling without replacement
    by ranking logw + Gumbel noise) — the data-selection move that
    shifts a raw crawl toward a target distribution instead of hard
    thresholding it.

        logw(x)   = sum over hashed ngram features of DSIR_LOG_RATIOS
        u(x)      = (hex4(md5(id || '|' || salt)) + 1) / 65537   in (0,1)
        key(x)    = ROUND(logw + (-ln(-ln(u))), 6)

    and the sample is the global top-``n`` by (key DESC, id ASC) — the
    rounded key + id tie-break make the boundary engine-deterministic,
    and the salted-digest uniform makes the "noise" reproducible on any
    engine, partitioning, or rerun (the same property as every sampler
    in this module).  Documents with no features carry logw = 0 and
    compete on pure noise.

    Determinism: the fold is literal doubles in the fixed
    unigrams-then-bigrams order; u is an exact (BIGINT+1)/65537 double;
    the two ln calls run on identical doubles in both engines with
    ROUND 6 absorbing libm ulp differences (the char_entropy / tfidf
    precedent).

    100 TB shape: the scoring is a pure narrow expression tree (no
    join — the ratio table is a constant-folded literal map, unlike the
    corpus-scaled df table of tfidf); the global top-n plans as
    TakeOrderedAndProject (per-partition heaps, driver n-merge, no
    global sort).  Returns (doc_id, n_features, log_weight, sample_key).
    """
    from ..functions.numeric import pin
    from .text import ngram_features

    if n < 1:
        raise ValueError("n must be >= 1")
    lookup = F.create_map(
        *[
            F.lit(x)
            for k, w in sorted(DSIR_LOG_RATIOS.items())
            for x in (k, w)
        ]
    )
    staged, feats, nf = ngram_features(df, text_col, "_ds")
    logw = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, w: acc
        + F.element_at(lookup, F.substring(F.md5(w), 1, 2)),
    )
    staged = staged.withColumn("_ds_lw", pin(logw))
    u = (
        F.conv(
            F.substring(_salted_digest(id_col, salt), 1, 4), 16, 10
        ).cast("long")
        + F.lit(1.0)
    ) / F.lit(65537.0)
    key = F.round(F.col("_ds_lw") - F.log(-F.log(u)), 6)
    return (
        staged.select(
            F.col(id_col),
            nf.cast("long").alias("n_features"),
            F.round(F.col("_ds_lw"), 6).alias("log_weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(n)
    )


def fetch_schedule(
    df: DataFrame,
    host_col: str = "host",
    score_col: str = "score",
    id_col: str = "doc_id",
    per_window: int = 2,
    n_windows: int = 4,
) -> DataFrame:
    """Crawl-politeness fetch scheduling — the frontier->fetcher step:
    a polite crawler may issue at most ``per_window`` requests per
    host per time window, so the top-scored candidates of each host
    are assigned to the next ``n_windows`` windows and the rest are
    deferred to a later planning round.  This is the quota
    generalization of :func:`quota_topk_per_group` (a schedule is a
    quota with a TIMELINE), and at 100 TB it is the op that keeps a
    mega-host from serializing the fetch fleet.

    Appends to each KEPT row (rank <= per_window * n_windows)::

        fetch_rank  -- 1-based rank within the host
                       (score desc, id asc — the explicit total
                       tie-break, oracle-reproducible)
        window_no   -- 0-based fetch window: (fetch_rank-1) DIV
                       per_window (integer arithmetic, no doubles;
                       Spark DIV == DuckDB // on positives)

    Dropped rows are the next round's frontier — re-plan, don't
    queue unbounded state.

    100 TB shape: ONE hash exchange on ``host_col``; the visible
    rank filter lets Catalyst plan the WindowGroupLimit PARTIAL
    top-k prune map-side (at most k rows per (host, map partition)
    transit the exchange — the quota_topk lesson), so a hot host
    cannot skew the shuffle.
    """
    if per_window < 1 or n_windows < 1:
        raise ValueError(
            "per_window and n_windows must be >= 1, got "
            f"{per_window}/{n_windows}"
        )
    picked = quota_topk_per_group(
        df,
        group_col=host_col,
        order_col=score_col,
        id_col=id_col,
        k=per_window * n_windows,
        rank_col="_fs_rnk",
    )
    return picked.select(
        *df.columns,
        F.col("_fs_rnk").alias("fetch_rank"),
        F.expr(f"(_fs_rnk - 1) DIV {int(per_window)}")
        .cast("long")
        .alias("window_no"),
    )


def length_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundaries: tuple[int, ...] = (16, 32, 64, 128, 256, 512),
    batch_size: int = 8,
    salt: str = "lb0",
) -> DataFrame:
    """Length-bucketed dynamic-padding batch planning — the loader-side
    ALTERNATIVE to pack_sequences for models that pad rather than
    concatenate (public knowledge: fairseq/tensor2tensor-style dynamic
    batching groups similar-length examples so the pad-to-batch-max
    waste stays small).  Documents are bucketed by exact token count
    into the smallest boundary >= n_tokens; docs longer than the last
    boundary land in bucket_cap = -1 (the OVERFLOW route — truncate or
    hand to pack_sequences; they are reported, never silently dropped).
    Within a bucket, documents take the deterministic salted-digest
    order (the corpus-wide _salted_digest convention, id tie-break) and
    fill batches of ``batch_size``.

    Returns one row per planned batch::

        (bucket_cap, batch_no, n_docs, max_tokens, sum_tokens,
         pad_waste_frac)

    pad_waste_frac = 1 - sum/(n*max) — the fraction of a dynamically
    padded batch tensor that would be padding (0.0 for an all-empty
    batch).  NULL text counts 0 tokens (the c4_filters convention).

    100 TB shape: the token count and bucket CASE are narrow; the only
    exchange is hash(bucket_cap) for the ordering window, and the
    (bucket, batch) aggregation reuses that partitioning (bucket is a
    subset of the grouping key) — ONE exchange total, pinned.  Bucket
    count is bounded by ``boundaries``, so per-bucket sort is the
    skew ceiling; shard the corpus first (shard, bucket) when one
    bucket dominates.
    """
    from .text import token_count

    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    bnds = sorted(set(int(b) for b in boundaries))
    if not bnds or bnds[0] < 1:
        raise ValueError("boundaries must be positive ints")
    for n in ("_lb_nt", "_lb_dg", "_lb_rn", "bucket_cap", "batch_no"):
        if n in df.columns:
            raise ValueError(f"output/staging column {n!r} already exists")
    nt = F.coalesce(
        token_count(F.col(text_col)).cast("long"), F.lit(0).cast("long")
    )
    bucket = None
    for b in bnds:
        cond = F.col("_lb_nt") <= b
        bucket = (
            F.when(cond, F.lit(b)) if bucket is None else bucket.when(cond, F.lit(b))
        )
    bucket = bucket.otherwise(F.lit(-1)).cast("int")
    w = Window.partitionBy("bucket_cap").orderBy("_lb_dg", id_col)
    out = (
        df.withColumn("_lb_nt", nt)
        .withColumn("_lb_dg", _salted_digest(id_col, salt))
        .withColumn("bucket_cap", bucket)
        .withColumn(
            "_lb_rn", F.row_number().over(w).cast("long")
        )
        .withColumn(
            "batch_no",
            F.expr(f"(_lb_rn - 1) DIV {int(batch_size)}").cast("long"),
        )
        .groupBy("bucket_cap", "batch_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("_lb_nt").alias("max_tokens"),
            F.sum("_lb_nt").alias("sum_tokens"),
        )
    )
    waste = F.when(F.col("max_tokens") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.col("sum_tokens").cast("double")
            / (
                F.col("n_docs").cast("double")
                * F.col("max_tokens").cast("double")
            ),
            6,
        )
    )
    return out.select(
        "bucket_cap",
        "batch_no",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        waste.alias("pad_waste_frac"),
    )
