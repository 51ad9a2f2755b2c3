"""Deduplication operators for web-scale corpora (task-brief first-class ops).

  exact_dedup       hash-groupBy on content digest (md5)
  shingles          k-word shingle sets (the unit for Jaccard/MinHash)
  ngram_jaccard     pairwise n-gram Jaccard within cheap buckets
  minhash_lsh       MinHash signatures + banded LSH candidate pairs
  simhash           bitwise majority fingerprint over token hashes

Design for 100 TB:
  - exact dedup is one shuffle on the digest (map-side partial agg);
  - Jaccard never goes all-pairs: candidates come from an equi-join on
    (bucket, shingle) / LSH band keys — both shuffle-bounded;
  - hashes are md5-hex (available in every engine) so the driver's DuckDB
    oracle can reproduce signatures byte-for-byte; MinHash minima compare
    lexicographically on hex strings (order-isomorphic to the integer
    hash, so it IS a valid min-hash).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per identical content; one shuffle on digest."""
    digest = F.md5(F.col(text_col))
    return (
        df.withColumn("digest", digest)
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles via an array lambda — no explode/shuffle.

    ``toks`` MUST be a materialized column attribute, not an inline
    expression: the lambda body references it 3-4 times per element, and
    Catalyst re-evaluates an inline child expression at every reference —
    with ``tokens(text)`` inlined that made shingling O(len^2) per doc
    (measured ~900us/shingle; attribute form is ~2us).

    Spark arrays index 0-based in lambda bracket syntax; the DuckDB oracle
    uses 1-based list indexing — both produce tok[i..i+k-1] windows.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.when(
        F.size(toks) >= k, F.array_distinct(F.transform(idx, parts))
    ).otherwise(F.array().cast("array<string>"))


def with_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3, out: str = "_sh"
) -> DataFrame:
    """Materialize tokens, then shingles, as real columns (see
    shingles_from_tokens).

    Both columns are pin()-ned: CollapseProject/pushdown otherwise
    re-inline them into every downstream reference (observed: 80+ copies
    of the split() chain in the minhash plan => quadratic work)."""
    from ..functions.numeric import pin

    return (
        df.withColumn("_tk", pin(tokens(F.col(text_col))))
        .withColumn(out, pin(shingles_from_tokens(F.col("_tk"), k)))
        .drop("_tk")
    )


def shingle_array(text_col: Column, k: int = 3) -> Column:
    """Inline-expression form — ONLY for tiny inputs/tests; prefer
    with_shingles (attribute form) in anything measured."""
    return shingles_from_tokens(tokens(text_col), k)


def doc_shingles(df: DataFrame, text_col="text", id_col="doc_id", k=3):
    """(id, shingle) exploded rows, distinct per doc."""
    return with_shingles(df, text_col, k).select(
        F.col(id_col).alias("sid"),
        F.explode(F.col("_sh")).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Pairwise k-shingle Jaccard, candidates restricted to docs sharing a
    bucket AND at least one shingle (equi-join, no cross product).

    jaccard = |A∩B| / (|A|+|B|-|A∩B|), one integer division -> identical
    double in any engine.

    ``max_df`` caps a shingle's document frequency within its bucket: a
    boilerplate shingle shared by d documents contributes d^2 rows to the
    intersect join (quadratic within that key — the hot-shingle skew that
    kills this plan at 100x).  Shingles above the cap are dropped BEFORE
    the self-join, and set sizes are computed over the surviving shingles
    so the Jaccard stays internally consistent (a documented approximation
    of the exact measure — boilerplate carries no dedup signal anyway).

    The cap is a window count over ONE exchange of the exploded frame
    (hash(bucket, shingle)), not a separate aggregate + semi-join: the
    groupBy formulation pruned ``sid`` from its branch, so the expensive
    tokenize+shingle chain planned TWICE (no exchange reuse — measured as
    the r02 +88% regression).  Here every consumer — both self-join sides
    and the set-size aggregate — sits above the same exchange, shingling
    runs once, and the join keys arrive pre-partitioned.  WindowExec
    buffers one (bucket, shingle) group at a time in a spillable array,
    so a hot boilerplate key degrades to disk, never OOM.
    """
    base = with_shingles(df, text_col, k).select(
        F.col(id_col).alias("sid"),
        *[F.col(c) for c in bucket_cols],
        F.explode(F.col("_sh")).alias("shingle"),
    )
    if max_df is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*bucket_cols, "shingle")
        base = (
            base.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    sizes = base.groupBy("sid").count().withColumnRenamed("count", "sz")
    a = base.select(
        F.col("sid").alias("id_a"),
        *[F.col(c).alias(f"_b_{c}") for c in bucket_cols],
        "shingle",
    )
    b = base.select(
        F.col("sid").alias("id_b"),
        *[F.col(c).alias(f"_b_{c}") for c in bucket_cols],
        "shingle",
    )
    inter = (
        a.join(b, on=[*(f"_b_{c}" for c in bucket_cols), "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("sid").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("sid").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(sh: Column, n_hashes: int = 8):
    """MinHash signature over a (materialized) shingles column: per seed
    i, min over shingles of substr(md5(shingle||':'||i), 1, 8) —
    hex-string minima (lexicographic min on hex == min on the underlying
    32-bit value)."""

    def hash_i(i: int):
        # single-arg lambda: a two-arg lambda would be interpreted by
        # Spark as an (element, index) higher-order function
        return lambda s: F.substring(
            F.md5(F.concat(s, F.lit(f":{i}"))), 1, 8
        )

    return F.array(
        *[
            F.array_min(F.transform(sh, hash_i(i)))
            for i in range(n_hashes)
        ]
    )


def _sig_bands(n_hashes: int, band_size: int):
    """Band structs over an existing ``sig`` column — ONE site for the
    band value format (band_rows and the Jaccard-estimate audit both
    explode it; the DuckDB _MH_PAIRS fragment mirrors it)."""
    n_bands = n_hashes // band_size
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_no"),
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(F.col("sig"), bi * band_size + j + 1)
                        for j in range(band_size)
                    ],
                ).alias("band_val"),
            )
            for bi in range(n_bands)
        ]
    )


def _explode_sig_bands(
    docs: DataFrame, n_hashes: int, band_size: int
) -> DataFrame:
    """(sid, band_no, band_val) rows from a (sid, sig) table; empty-doc
    bands (concat_ws of NULL minima = '') are dropped here."""
    return (
        docs.select(
            "sid", F.explode(_sig_bands(n_hashes, band_size)).alias("b")
        )
        .select(
            "sid",
            F.col("b.band_no").alias("band_no"),
            F.col("b.band_val").alias("band_val"),
        )
        .filter(F.col("band_val") != "")
    )


def band_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """(sid, band_no, band_val) MinHash-LSH band rows — the candidate-key
    expansion shared by within-corpus pairing (minhash_lsh_pairs) and
    cross-corpus incremental dedup (incremental_lsh_flags)."""
    # shingle array materialized as its OWN column: the 8 array_min
    # minima below each reference it — inline, Catalyst would re-tokenize
    # and re-shingle the text once per hash (measured 10x query cost)
    sig = minhash_signature(F.col("_sh"), n_hashes)
    # docs with no shingles produce NULL minima (array_min over an
    # empty array); the real empty-doc gate is _explode_sig_bands'
    # band_val != '' filter — concat_ws('') of NULLs is '' — so no
    # size guard is needed here (F.array(...) is always length
    # n_hashes).
    docs = (
        with_shingles(df, text_col, k)
        .select(F.col(id_col).alias("sid"), "_sh")
        .select("sid", sig.alias("sig"))
    )
    return _explode_sig_bands(docs, n_hashes, band_size)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
) -> DataFrame:
    """Banded LSH: docs sharing any band of the MinHash signature become
    candidate pairs.  n_hashes/band_size bands; the band value is the
    concatenation of its minhashes.  One explode + one equi-join on
    (band_no, band_val): shuffle-bounded, never all-pairs."""
    exploded = band_rows(df, text_col, id_col, n_hashes, band_size, k)
    return _pairs_from_bands(exploded)


def _pairs_from_bands(exploded: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) candidate pairs from a band-row table —
    shared by minhash_lsh_pairs and the Jaccard-estimate audit.

    Self-join via ALIASED VIEWS of the SAME plan, renames applied
    AFTER the join: both join children are then byte-identical, so
    the (band_no, band_val) exchange is planned ONCE and the second
    side becomes a ReusedExchange — the tokenize/shingle/signature
    chain (the dominant cost) computes once, not once per side
    (measured ~2x on the r05 bench; the old pre-join renames made
    the subtrees differ and defeated reuse).
    shuffle_hash hint: the candidate-key table GROWS WITH THE CORPUS,
    so AQE's local broadcast of it is a small-sf artifact (and a
    serial driver build — measured 2.7x the query cost at sf0.1);
    at 100 TB a corpus-scaled broadcast is simply wrong.  Same lesson
    as the round-2 manifest join (NOTES.md)."""
    a, b = exploded.alias("a"), exploded.alias("b").hint("shuffle_hash")
    return (
        a.join(
            b,
            [
                F.col("a.band_no") == F.col("b.band_no"),
                F.col("a.band_val") == F.col("b.band_val"),
            ],
        )
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b")
        )
        .distinct()
    )


def incremental_lsh_flags(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Crawl-over-crawl dedup: flag documents of a NEW batch that are
    MinHash-LSH candidates of any document in an existing REFERENCE
    corpus — the incremental form every recurring ingest runs (crawl
    N+1 dedups against crawl N without re-pairing crawl N with itself;
    a within-corpus minhash_lsh_pairs over (new UNION ref) would redo
    the quadratic-in-history work on every ingest).

    Returns one row per flagged NEW document:
      (doc_id, dup_of, n_ref_matches)
    with ``dup_of`` the smallest matching reference id (deterministic)
    and ``n_ref_matches`` the distinct reference docs sharing a band.
    Band agreement is the standard LSH candidate signal — compose with
    exact Jaccard verification where precision matters (the same
    two-stage shape as dedup_embedding_cosine_lsh).

    100 TB shape: each side's tokenize/shingle/signature chain runs
    exactly once; candidates come from ONE equi-join on
    (band_no, band_val), then a groupBy on the new id — never all-pairs,
    and the reference side is never re-paired with itself.
    ``max_band_freq`` caps a band value's REFERENCE frequency (the
    historical corpus is the side that accumulates boilerplate): a band
    shared by r reference docs emits r rows per matching new doc, so a
    degenerate band is capped BEFORE the join via a window count over
    the join's own (band_no, band_val) clustering — the same measured
    mitigation as simhash near-dup pairing (hot bands are boilerplate
    and carry no dedup signal).
    """
    newb = band_rows(new_df, text_col, id_col, n_hashes, band_size, k)
    refb = band_rows(ref_df, text_col, id_col, n_hashes, band_size, k)
    if max_band_freq is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_no", "band_val")
        refb = (
            refb.withColumn("_bf", F.count(F.lit(1)).over(w))
            .filter(F.col("_bf") <= max_band_freq)
            .drop("_bf")
        )
    return (
        newb.select(F.col("sid").alias(id_col), "band_no", "band_val")
        .join(
            refb.select(
                F.col("sid").alias("_ref_id"), "band_no", "band_val"
            ),
            ["band_no", "band_val"],
        )
        .groupBy(id_col)
        .agg(
            F.min("_ref_id").alias("dup_of"),
            F.count_distinct(F.col("_ref_id")).alias("n_ref_matches"),
        )
    )


def minhash_jaccard_estimate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Sketch-quality audit of the MinHash dedup path: for every banded
    LSH candidate pair, the Jaccard ESTIMATE the signature implies
    (fraction of agreeing signature positions — the textbook MinHash
    estimator, E[est] = J) next to the EXACT shingle-set Jaccard, plus
    the absolute error:

      (id_a, id_b, est_jaccard, exact_jaccard, abs_err)

    This is how a pipeline picks ``n_hashes``/``band_size`` for a new
    corpus: run the audit on a sample, read the error distribution,
    then run the estimate-only dedup at scale.

    100 TB shape: candidates come from the banded equi-join (never
    all-pairs); the exact intersection is array_intersect on the two
    DISTINCT shingle sets of just the candidate pairs — the same
    verify-step confinement as dedup_embedding_cosine_lsh (per-doc
    set size is bounded by document length, not corpus size).  The
    doc-side joins are pinned shuffle_hash: the shingle-set table
    scales with the corpus (the AQE corpus-scaled-broadcast trap).

    The (sid, shingle-set, signature) table feeds THREE consumers
    (the band explode and both pair sides), so it is MATERIALIZED
    (``materialize=True`` localCheckpoint — the LADDER lesson:
    a multi-consumer branch point cannot rely on ReusedExchange;
    write-then-read at production scale) and the expensive
    tokenize/shingle/signature chain runs exactly once.
    """
    from ..functions.numeric import pin

    docs = (
        with_shingles(df, text_col, k)
        # _sh is already distinct by construction (shingles_from_tokens
        # wraps array_distinct), so it IS the shingle set
        .select(
            F.col(id_col).alias("sid"),
            F.col("_sh").alias("_set"),
        )
        .withColumn("sig", minhash_signature(F.col("_set"), n_hashes))
    )
    if materialize:
        docs = docs.localCheckpoint(eager=False)
    pairs = _pairs_from_bands(
        _explode_sig_bands(docs, n_hashes, band_size)
    )
    a = docs.select(
        F.col("sid").alias("id_a"),
        F.col("_set").alias("_set_a"),
        F.col("sig").alias("_sig_a"),
    )
    b = docs.select(
        F.col("sid").alias("id_b"),
        F.col("_set").alias("_set_b"),
        F.col("sig").alias("_sig_b"),
    )
    j = (
        pairs.join(a.hint("shuffle_hash"), "id_a")
        .join(b.hint("shuffle_hash"), "id_b")
        .withColumn(
            "_matches",
            F.size(
                F.filter(
                    F.zip_with(
                        "_sig_a", "_sig_b", lambda x, y: x == y
                    ),
                    lambda m: m,
                )
            ),
        )
        # staged + pinned: referenced twice below (numerator and the
        # union-size denominator) and array_intersect per pair is the
        # audit's dominant cost — re-inlining would double it
        .withColumn(
            "_inter",
            pin(F.size(F.array_intersect("_set_a", "_set_b"))),
        )
    )
    est = F.round(F.col("_matches") / F.lit(n_hashes), 6)
    exact = F.round(
        F.col("_inter")
        / (
            F.size("_set_a") + F.size("_set_b") - F.col("_inter")
        ),
        6,
    )
    return (
        j.withColumn("est_jaccard", est)
        .withColumn("exact_jaccard", exact)
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            "exact_jaccard",
            F.round(
                F.abs(F.col("est_jaccard") - F.col("exact_jaccard")),
                6,
            ).alias("abs_err"),
        )
    )


def simhash_bits(
    df: DataFrame, n_bits: int = 64, text_col="text", id_col="doc_id"
) -> DataFrame:
    """n-bit SimHash: per token, md5 nibbles vote +1/-1 per bit position;
    the sign vector is the fingerprint (near-dup docs differ in few bits).

    Implemented as n_bits conditional-sum aggregates over exploded tokens —
    one shuffle on id, partial-aggregated map-side.  Bits beyond the 32
    nibbles of md5(tok) come from md5(tok || '#2') etc., so up to 128 bits
    are available.  16 bits is collision-prone as a near-dup key beyond
    ~10^5 docs (2^16 buckets); 64 bits is the 10^12-scale default.
    """
    assert n_bits <= 128
    toks = df.select(
        F.col(id_col).alias("sid"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    toks = toks.withColumn("h", F.md5(F.col("tok")))
    if n_bits > 32:
        toks = toks.withColumn(
            "h2", F.md5(F.concat(F.col("tok"), F.lit("#2")))
        )
        if n_bits > 64:
            toks = toks.withColumn(
                "h3", F.md5(F.concat(F.col("tok"), F.lit("#3")))
            )
            toks = toks.withColumn(
                "h4", F.md5(F.concat(F.col("tok"), F.lit("#4")))
            )

    # nibble i encodes bit i: vote +1 when the hex digit >= '8', i.e.
    # when the nibble's high bit is set.  The digits are pre-projected
    # as 32-bit integer chunks (8 hex chars via conv) so each of the
    # n_bits vote sums is a shift/mask on a long ATTRIBUTE — the
    # per-bit substring+string-compare form re-ran 2 string ops per
    # (token, bit) and measured ~2.5x slower at sf0.1.
    srcs = ["h", "h2", "h3", "h4"][: (n_bits + 31) // 32]
    chunk_cols = []
    for si, src in enumerate(srcs):
        for c in range(4):
            chunk_cols.append(
                F.conv(F.substring(src, c * 8 + 1, 8), 16, 10)
                .cast("long")
                .alias(f"ck{si * 4 + c}")
            )
    toks = toks.select("sid", *chunk_cols)

    def vote(i: int):
        chunk = i // 8
        shift = 4 * (7 - i % 8)  # nibble position within the chunk
        hit = (
            F.shiftright(F.col(f"ck{chunk}"), shift).bitwiseAND(F.lit(8))
            != 0
        )
        return F.when(hit, 1).otherwise(-1)

    votes = [F.sum(vote(i)).alias(f"b{i}") for i in range(n_bits)]
    agg = toks.groupBy("sid").agg(*votes)
    fp = F.concat(
        *[
            F.when(F.col(f"b{i}") > 0, "1").otherwise("0")
            for i in range(n_bits)
        ]
    )
    return agg.select("sid", fp.alias("simhash"))


def simhash16(df: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """16-bit SimHash (sandbox-friendly width; see simhash_bits)."""
    return simhash_bits(df, 16, text_col, id_col)


def hamming_on_bits(a: Column, b: Column, n_bits: int) -> Column:
    """Exact Hamming distance between two '0'/'1' fingerprint strings,
    via 32-bit limbs: conv(base2) -> bitwise XOR -> bit_count.  Pure
    JVM expressions inside whole-stage codegen — no UDF, no explode."""
    terms = []
    for off in range(0, n_bits, 32):
        w = min(32, n_bits - off)
        ia = F.conv(F.substring(a, off + 1, w), 2, 10).cast("long")
        ib = F.conv(F.substring(b, off + 1, w), 2, 10).cast("long")
        terms.append(F.bit_count(ia.bitwiseXOR(ib)))
    return sum(terms[1:], terms[0]).cast("int")


def simhash_pairs(
    df: DataFrame,
    n_bits: int = 64,
    n_bands: int = 4,
    max_hamming: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_band_freq: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: banded-Hamming candidate generation +
    exact Hamming verify — the missing pairing half of simhash_bits
    (round-3 verdict next #4).

    The n-bit fingerprint splits into ``n_bands`` contiguous bands;
    docs sharing ANY band's exact bits become candidates (equi-join on
    (band_no, band_bits)).  Pigeonhole guarantee: a pair within
    ``n_bands - 1`` bit flips must agree on at least one whole band,
    so with the default ``max_hamming = n_bands - 1`` the result is
    EXACT (all qualifying pairs, no misses).  A larger max_hamming is
    allowed but then the candidate stage is approximate (standard
    SimHash-LSH trade-off) — documented rather than hidden.

    100 TB shape: ONE shuffle keyed by (band_no, band_bits) — never an
    all-pairs product; fingerprints ride along the band rows so the
    verify needs no second join; the exact Hamming is 32-bit-limb
    conv/XOR/bit_count inside codegen (hamming_on_bits).  Hot bands
    are the skew risk — template-heavy corpora concentrate similar
    fingerprints into few band values and the band join degenerates
    toward all-pairs (measured: 8-bit bands on the synthetic sf0.1
    corpus produced 9.6M candidates = 71% of ALL pairs).  Two guards:
    bands must be WIDE (the default 4x16-bit on 64 bits is the classic
    web-scale configuration — hamming <= 3 exact), and
    ``max_band_freq`` drops band values shared by more docs (the
    max_df move from ngram_jaccard_pairs; pairs inside a dropped band
    are found only via their other bands — documented approximation,
    mirrored by the oracle).  The frequency count is a window over the
    same (band_no, band_bits) clustering the join shuffles on, so the
    cap adds no extra exchange of the band table.

    Returns (id_a, id_b, hamming), id_a < id_b, distinct.
    """
    if n_bits % n_bands:
        raise ValueError("n_bands must divide n_bits evenly")
    if max_hamming is None:
        max_hamming = n_bands - 1
    # r06 PERF: banding is exactly the key_blocks=1 special case of the
    # block-combination scheme, so the banded form delegates to
    # simhash_pairs_multiprobe and inherits its integer-limb shuffle,
    # the Hamming filter directly on the join output, and the min-band
    # dedup filter (no candidate-wide distinct — the measured 77->7 s
    # multiprobe fix; the capped path keeps a result-sized distinct).
    # The band value/window-cap semantics are identical: the combo key
    # for key_blocks=1 IS (band_no, band_bits).
    return simhash_pairs_multiprobe(
        df,
        n_bits=n_bits,
        n_blocks=n_bands,
        key_blocks=1,
        max_hamming=max_hamming,
        text_col=text_col,
        id_col=id_col,
        max_key_freq=max_band_freq,
    )


def simhash_pairs_multiprobe(
    df: DataFrame,
    n_bits: int = 64,
    n_blocks: int = 8,
    key_blocks: int = 2,
    max_hamming: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_key_freq: int | None = None,
) -> DataFrame:
    """Multi-probe SimHash pairing for LARGER Hamming radii (r04 verdict
    next #5): ``simhash_pairs`` is pigeonhole-exact only to
    ``n_bands - 1`` flips (3 at the web-scale 4x16 default), but
    near-dup curation commonly wants hamming <= 6-8 — and simply using
    more, narrower bands degenerates toward all-pairs (the measured
    8-bit-band trap).  This is the standard block-combination /
    permuted-table scheme (the Manku-Jain-Sarma "Detecting
    Near-Duplicates for Web Crawling" table construction): split the
    fingerprint into ``n_blocks`` blocks and join on every
    ``key_blocks``-subset of blocks CONCATENATED as one wide key.

    Pigeonhole guarantee: <= ``n_blocks - key_blocks`` flips leave at
    least ``key_blocks`` blocks untouched, so some combination key
    matches exactly — the default ``max_hamming = n_blocks -
    key_blocks`` (6 at 64/8/2) is EXACT.  A larger radius is allowed
    but the candidate stage is then approximate (documented, as in
    simhash_pairs).

    100 TB shape: ONE shuffle keyed by (combo_no, key_bits) — C(8,2) =
    28 key tables of 16-bit keys, i.e. the same 2^16 bucket width that
    survived the r04 skew measurements, never the 2^8 degenerate
    bands; fingerprints ride the key rows so verify needs no second
    join; exact Hamming is the same conv/XOR/bit_count limb form.
    ``max_key_freq`` is the hot-key cap (window over the join's own
    clustering, no extra exchange).  Row cost is C(n_blocks,
    key_blocks) per doc — the documented price of the larger exact
    radius (28x fingerprint rows vs 4x for the banded form).

    Returns (id_a, id_b, hamming), id_a < id_b, distinct.
    """
    from itertools import combinations

    if n_bits % n_blocks:
        raise ValueError("n_blocks must divide n_bits evenly")
    if not 1 <= key_blocks < n_blocks:
        raise ValueError("key_blocks must be in [1, n_blocks)")
    if max_hamming is None:
        max_hamming = n_blocks - key_blocks
    w = n_bits // n_blocks
    fp = simhash_bits(df, n_bits, text_col, id_col)
    combos = list(combinations(range(n_blocks), key_blocks))
    # r06 PERF (guide §2.3/§2.4, measured at sf1.0): the original shape
    # shuffled every candidate row carrying TWO 64-char fingerprint
    # strings into a post-join .distinct() — 168 s of the 77-168 s query
    # was that one exchange+aggregate (the join itself costs ~6 s).  Three
    # structural fixes, result-identical:
    #   1. fingerprints ride the key rows as 32-bit INTEGER LIMBS (the
    #      same conv(substring, 2, 10) limbs hamming_on_bits builds per
    #      candidate — built once per key row instead), so the verify is
    #      bit_count(xor) on longs and the key-table shuffle carries
    #      ~24 bytes/row instead of ~100;
    #   2. the Hamming filter runs DIRECTLY on the join output, before
    #      any further shuffle — candidates die map-side;
    #   3. the .distinct() is replaced by a min-combo keep filter: an
    #      uncapped pair's matching-combo set is fully determined by its
    #      two fingerprints (combo matches iff all its blocks are equal),
    #      so keeping a candidate only where the join combo equals the
    #      lexicographically-first matching combo emits each pair exactly
    #      once — NO post-join exchange at all.  With max_key_freq the
    #      matching set also depends on which key rows survived the cap,
    #      so that path keeps a distinct — but on (id_a, id_b, hamming)
    #      AFTER the Hamming filter (result-sized, not candidate-sized).
    n_limbs = (n_bits + 31) // 32
    limb_cols = [
        F.conv(
            F.substring("simhash", off * 32 + 1, min(32, n_bits - off * 32)),
            2,
            10,
        )
        .cast("long")
        .alias(f"l{off}")
        for off in range(n_limbs)
    ]
    key_val = {
        ci: F.conv(
            F.concat(*[
                F.substring("simhash", blk * w + 1, w) for blk in combo
            ]),
            2,
            10,
        ).cast("long")
        for ci, combo in enumerate(combos)
    }
    # one combined integer join key: combo_no * 2^(w*key_blocks) + bits
    # (w*key_blocks <= 62 always holds for n_bits <= 128 splits)
    kw = w * key_blocks
    keys = fp.select(
        "sid",
        *limb_cols,
        F.explode(
            F.array(*[
                (F.lit(ci) * F.lit(1 << kw) + key_val[ci]).cast("long")
                for ci in range(len(combos))
            ])
        ).alias("ckey"),
    )
    if max_key_freq is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy("ckey")
        keys = (
            keys.withColumn("_kf", F.count(F.lit(1)).over(wnd))
            .filter(F.col("_kf") <= max_key_freq)
            .drop("_kf")
        )
    # aliased-view self-join (renames AFTER the join) so both children
    # share one plan and the combo-key exchange is reused — the
    # fingerprint aggregation computes once, not per side (measured
    # ~2x on the r05 bench; see minhash_lsh_pairs)
    # shuffle_hash: the key table grows with the corpus — never let the
    # planner broadcast it (see minhash_lsh_pairs; measured 2.7x)
    a, b = keys.alias("a"), keys.alias("b").hint("shuffle_hash")
    xors = [
        F.col(f"a.l{off}").bitwiseXOR(F.col(f"b.l{off}"))
        for off in range(n_limbs)
    ]
    cand = (
        a.join(b, [F.col("a.ckey") == F.col("b.ckey")])
        .filter(F.col("a.sid") < F.col("b.sid"))
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            *[xors[off].alias(f"x{off}") for off in range(n_limbs)],
            F.col("a.ckey").alias("_ck"),
        )
        .withColumn(
            "hamming",
            sum(
                [F.bit_count(F.col(f"x{off}")) for off in range(n_limbs)][1:],
                F.bit_count(F.col("x0")),
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if max_key_freq is not None:
        return cand.select("id_a", "id_b", "hamming").distinct()
    # min-combo keep: block b is equal iff its w-bit slice of the XOR is
    # zero; the first key_blocks equal block indices name the
    # lexicographically-first matching combination (itertools order).
    per_limb = 32 // w if 32 % w == 0 else None
    if per_limb is None:
        # blocks straddle limb boundaries — fall back to result-sized
        # distinct (cannot derive block equality from 32-bit limbs)
        return cand.select("id_a", "id_b", "hamming").distinct()
    # block b equal iff its w-bit slice of the XOR limb is zero; the
    # slice is a LITERAL mask per block (conv puts the substring's first
    # char at bit 31, so block position pos covers bits
    # [32 - w*(pos+1), 32 - w*pos))
    eqs = []
    for blk in range(n_blocks):
        limb_i, pos = blk // per_limb, blk % per_limb
        mask = ((1 << w) - 1) << (32 - w * (pos + 1))
        eqs.append(
            F.col(f"x{limb_i}").bitwiseAND(F.lit(mask)) == 0
        )
    eq_blocks = F.filter(
        F.array(*[
            F.when(eqs[blk], F.lit(blk)).otherwise(F.lit(-1))
            for blk in range(n_blocks)
        ]),
        lambda v: v >= 0,
    )
    combo_of = F.element_at(
        F.array(*[
            F.array(*[F.lit(blk) for blk in combo]) for combo in combos
        ]),
        F.shiftright(F.col("_ck"), kw).cast("int") + 1,
    )
    return (
        cand.filter(F.slice(eq_blocks, 1, key_blocks) == combo_of)
        .select("id_a", "id_b", "hamming")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_overlap`` distinct k-word shingles with an evaluation set —
    the standard pre-training hygiene step (a training doc that
    contains benchmark text inflates eval scores).

    Returns ``(doc_id, n_overlap, contaminated)`` for EVERY corpus doc
    (n_overlap = 0 rows included: the decision table is the contract,
    not just the hit list).

    100 TB shape: the benchmark side is aggregated to its DISTINCT
    shingle set and broadcast — correct here, unlike the manifest/
    lineage joins this repo de-broadcast, because an eval suite is
    bounded by construction (thousands of questions, not corpus-
    growing); the corpus side then needs NO shuffle for the join, and
    the per-doc overlap count partial-aggregates map-side into one
    exchange on doc id.
    """
    doc_sh = doc_shingles(corpus, text_col, id_col, k)
    bench_sh = (
        with_shingles(benchmark, text_col, k)
        .select(F.explode(F.col("_sh")).alias("shingle"))
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("sid")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits.withColumnRenamed("sid", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap
            ).alias("contaminated"),
        )
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over a near-dup pair graph -> ``(node,
    cluster_id)`` with ``cluster_id`` = the smallest node id in the
    component (deterministic regardless of execution order or
    algorithm).

    Pairwise candidate lists (minhash_lsh_pairs / ngram_jaccard_pairs)
    are not yet a dedup DECISION: near-duplication is transitive in
    practice (A~B, B~C => one cluster), and keeping "the lower id of
    each pair" over-deletes chains.  The shipped decision is one
    canonical survivor per component.

    ``algorithm="label"`` (default): iterative min-label propagation.
    Each round is ONE hash-partitioned aggregation — messages (edge
    endpoint, neighbor label) union'd with the current labels, ``min``
    per node — i.e. the standard Pregel formulation with map-side
    partial aggregation and no driver-side data.  Convergence detection
    is O(1) driver traffic: labels only ever decrease, so ``sum(label)``
    is strictly monotonic and a repeated sum == fixpoint (no
    change-count join needed).  Rounds are DIAMETER-bounded — the right
    default for near-dup graphs, whose components are shallow dup
    clusters (3-5 rounds typical), and the cheapest per round.

    ``algorithm="star"``: alternating large-star/small-star
    (`connected_components_star`) — O(log n) rounds regardless of
    diameter; pick it when components can be adversarially chain-shaped
    (e.g. templated page sequences where page_i ~ page_{i+1} only).

    Both raise rather than return partial labels when the round cap is
    hit (a silently split component means multiple keep=True survivors
    — duplicates leaking into the corpus).

    100 TB shape: ``localCheckpoint`` truncates the per-round lineage so
    the plan does not grow with iterations (on a cluster, use a reliable
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` instead —
    localCheckpoint ties recovery to executor storage).
    """
    if algorithm == "star":
        return connected_components_star(pairs, id_a, id_b, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(
        edges.schema["src"].dataType, NumericType
    )
    def _prop_step(lbls):
        """One min-label message round (no materialization)."""
        msgs = edges.join(
            lbls.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        return (
            lbls.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )

    prev_sum = None
    prev_labels = None
    converged = False
    steps_left = max_iter
    while steps_left > 0:
        # r06 PERF: propagate TWO steps per materialization round on the
        # numeric path — each round costs one localCheckpoint job + one
        # convergence-sum job of driver-synced latency, which dominates
        # at the shallow-cluster scale this runs at (measured ~1 s/round
        # on tables of ~10^5 rows), so halving the sync rounds halves
        # that fixed cost.  The fixpoint is unchanged (labels decrease
        # monotonically; an unchanged sum after a double step is still
        # exactly the fixpoint), and total propagation steps stay
        # bounded by max_iter.
        if numeric_ids and steps_left >= 2:
            stepped = _prop_step(_prop_step(labels))
            steps_left -= 2
        else:
            stepped = _prop_step(labels)
            steps_left -= 1
        # r06 PERF (second pass): LAZY checkpoint — the convergence
        # action below (the sum collect / changed count) is the round's
        # single consumer, so it materializes the checkpoint inside ITS
        # job: one driver-synced job per round instead of two.  The
        # edges checkpoint above stays EAGER on purpose: it is consumed
        # from multiple concurrent stages in round 1 and a lazy persist
        # could race its expensive pair lineage into duplicate compute.
        new_labels = stepped.localCheckpoint(eager=False)
        if numeric_ids:
            # DECIMAL(38,0) sum: a BIGINT sum overflows at ~10^9 nodes
            # with 64-bit hash-derived ids (ANSI mode would throw every
            # round — the operator could never converge at exactly its
            # design scale).  Labels only decrease, so an unchanged sum
            # IS the fixpoint — no change-count join needed.
            cur_sum = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))
            ).collect()[0][0]
            if cur_sum == prev_sum:
                converged = True
                labels = new_labels
                break
            prev_sum = cur_sum
        else:
            # string/other orderable ids: no sum exists, so pay one
            # extra equi-join per round for the exact changed count
            prev_labels = labels
            changed = (
                new_labels.join(
                    prev_labels.withColumnRenamed("lbl", "_prev"),
                    "node",
                )
                .filter(F.col("lbl") != F.col("_prev"))
                .count()
            )
            if changed == 0:
                converged = True
                labels = new_labels
                break
        labels = new_labels
    if not converged:
        # returning partial labels would silently split components
        # (multiple keep=True survivors inside one cluster — duplicates
        # leaking into the corpus); fail loudly instead.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(component diameter exceeds max_iter) — raise max_iter or "
            "use algorithm='star' (O(log n) rounds)"
        )
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over canonical (a < b) edges: every node's
    STRICTLY LARGER neighbors re-point to the minimum of its closed
    neighborhood.  Output stays canonical (the new target m <= u < v)."""
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("u"), F.col("b").alias("v"))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.least(F.col("mn"), F.col("u")).alias("a"),
            F.col("v").alias("b"),
        )
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over canonical (a < b) edges: every node's
    smaller-or-equal neighborhood (plus itself) re-points to its
    minimum.  Canonical edges group their smaller endpoints by ``b``, so
    N(u)'s smaller side is exactly the ``a`` values of u's ``b`` rows."""
    mins = e.groupBy("b").agg(F.min("a").alias("mn"))
    child = e.join(mins, "b").select(
        F.col("mn").alias("a"), F.col("a").alias("b")
    )
    hub = mins.select(F.col("mn").alias("a"), F.col("b"))
    return (
        child.unionByName(hub)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds REGARDLESS of component diameter, where
    min-label propagation needs diameter rounds.  Same output contract
    as `connected_components`: ``(node, cluster_id=component min)``.

    Each round is two grouped aggregations + a distinct over the edge
    set (all hash-partitioned by node id, map-side partial agg);
    convergence = the canonical edge set is a fixpoint of the round,
    checked set-exactly (count equality both sides + union-distinct
    count — not a collision-prone sum signature).  At the fixpoint the
    edge set is a star forest: every edge is (component-min, member).
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        )
        .distinct()
        # lazy: the n_old count below is the single consumer and
        # materializes the checkpoint in its own job (r06 second pass —
        # one driver-synced job per step instead of two)
        .localCheckpoint(eager=False)
    )
    converged = False
    n_old = e.count()
    for _ in range(max_rounds):
        e_new = _small_star(_large_star(e)).localCheckpoint(eager=False)
        n_new = e_new.count()
        if n_old == n_new:
            n_union = e.unionByName(e_new).distinct().count()
            if n_union == n_new:
                converged = True
                e = e_new
                break
        e, n_old = e_new, n_new
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_rounds} "
            "rounds — raise max_rounds"
        )
    # star forest: a = center (component min), b = member
    members = e.select(
        F.col("b").alias("node"), F.col("a").alias("cluster_id")
    )
    centers = e.select(F.col("a").alias("node")).distinct().withColumn(
        "cluster_id", F.col("node")
    )
    return members.unionByName(centers)


def cluster_keep_decision(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "label",
) -> DataFrame:
    """Per-document dedup decision from a pair graph: ``(doc_id,
    cluster_id, keep)`` over the WHOLE corpus — singletons (docs in no
    pair) form their own cluster, and exactly the smallest id per
    component survives.  One broadcast-size-independent left join on id
    (the components table is |nodes-in-pairs| rows, far smaller than the
    corpus, but still corpus-scaling — so no broadcast hint; Catalyst/AQE
    decide).  ``algorithm`` passes through to `connected_components`
    ("label" | "star").  ``id_col`` is used AS-IS (no cast): string doc
    ids are valid keys — min-label semantics only need a total order —
    and an unconditional long cast would throw (ANSI) or NULL out the
    whole corpus (non-ANSI) on them."""
    cc = connected_components(pairs, algorithm=algorithm)
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(
            cc.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            (
                F.coalesce(F.col("cluster_id"), F.col("doc_id"))
                == F.col("doc_id")
            ).alias("keep"),
        )
    )


def dup_span_stats(
    df: DataFrame,
    k: int = 8,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Cross-document duplicated-span detection — the window-hash
    approximation of exact substring deduplication (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" family):
    k-token windows taken at ``stride`` are hashed; a window whose hash
    occurs in ANY OTHER document is a duplicated span.  Returns per
    document::

        (doc_id, n_windows, n_dup_windows, dup_frac)

    with n_windows = 0 / dup_frac 0.0 for docs shorter than k tokens
    (every doc present — decision-table contract).  dup_frac is the
    train-time removal signal: docs above a threshold are boilerplate
    or syndicated copies even when full-document hashes differ.

    ``stride`` caveat (learned from the quoting unit test): windows are
    taken on each document's OWN token grid, so with stride s > 1 a
    span shared at different grid phases never collides — s > 1 only
    catches grid-aligned duplication (full-document copies, fixed-
    position boilerplate).  The default stride=1 GUARANTEES any shared
    k-token span is caught in both docs; raise it only as a documented
    subsampling trade for throughput.

    100 TB shape: stride bounds the explode to ~n_tokens/stride rows
    per doc (k/stride overlap factor, NOT k×); the cross-doc test is
    min(id) != max(id) per hash — ONE exchange keyed by the window
    hash with map-side partial agg (no count-distinct shuffle); the
    verdict joins back by hash (same clustering) and the per-doc
    rollup re-keys by id.  Window hashes are md5 of the space-joined
    window, so the DuckDB oracle reproduces them byte for byte.
    """
    from ..functions.numeric import pin

    if k < 1 or stride < 1:
        raise ValueError("k and stride must be >= 1")
    # tokens_col: callers composing several passes over the same corpus
    # (corpus_span_ladder) tokenize ONCE upstream and pass the column
    # name — the tokenize is the dominant map cost of the span family
    if tokens_col is None:
        base = df.withColumn("_tk", pin(tokens(F.col(text_col))))
        tcol = "_tk"
    else:
        if tokens_col not in df.columns:
            raise ValueError(f"tokens_col {tokens_col!r} not in input")
        base = df
        tcol = tokens_col
    n = F.size(F.col(tcol))
    idx = F.sequence(F.lit(0), F.floor((n - k) / stride).cast("int"))
    win = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(
                " ", F.slice(F.col(tcol), i * stride + 1, k)
            )
        ),
    )
    spans = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(n >= k, win).otherwise(F.array().cast("array<string>"))
        ).alias("h"),
    )
    # r06 PERF (the LADDER rule, same as _chunk_share_stats): ``spans``
    # has two consumers and the pinned tokenize/window-hash chain above
    # it cannot be deduplicated by exchange reuse — materialize the
    # small (doc_id, h) rows once instead of hashing every window twice.
    spans = spans.localCheckpoint(eager=False)
    cross = spans.groupBy("h").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup")
    )
    per_doc = (
        spans.join(cross, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias(
                "n_dup_windows"
            ),
            F.round(
                F.when(
                    F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_dup_windows"), F.lit(0))
                    / F.col("n_windows"),
                ).otherwise(0.0),
                6,
            ).alias("dup_frac"),
        )
    )


def excise_dup_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level dedup EXCISION — the end state of the Lee et al.
    exact-substring family: instead of flagging whole documents
    (``dup_span_stats``), remove the duplicated k-token spans and keep
    the residual text.  Each duplicated window hash has one canonical
    owner (the min doc_id containing it); the owner keeps the span,
    every other document has the covering token positions cut.  Exactly
    one copy of each shared span survives the corpus.

    Returns one row per input document::

        (doc_id, text_excised, n_tokens, n_kept, n_excised)

    ``text_excised`` is the space-join of the surviving tokens — the
    output is token-stream residual for EVERY row (also docs with
    nothing excised), so the column is uniformly whitespace-normalized.
    Docs shorter than k tokens pass through whole; a doc that is
    entirely shared spans (a pure copy of a lower-id doc) collapses to
    the empty string.

    100 TB shape: three bounded shuffles — (1) window-hash agg (map-side
    partial; the join back reuses the clustering), (2) covered-position
    distinct keyed (doc_id, pos) with the explode bounded by
    k x n_excised_windows (duplicated windows only, never the whole
    corpus), (3) the per-doc token regroup keyed by doc_id.  No
    all-pairs step anywhere; hashes are md5 of the space-joined window
    so the DuckDB oracle reproduces the cut byte for byte.  Within-doc
    repeats of an owned hash all stay with the owner (ownership is per
    hash, not per occurrence).
    """
    from ..functions.numeric import pin

    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).alias("doc_id"), pin(tokens(F.col(text_col))).alias("_tk")
    )
    # r06 PERF (the LADDER rule): ``base`` has THREE consumers (spans,
    # the token posexplode, the n_tokens rollup) and the pinned tokenize
    # cannot be deduplicated by exchange reuse — materialize the token
    # arrays once (the corpus_span_ladder production pattern: tokenize
    # once, run every pass against it).
    base = base.localCheckpoint(eager=False)
    n = F.size(F.col("_tk"))
    idx = F.sequence(F.lit(0), (n - k).cast("int"))
    win = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("i"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("_tk"), i + 1, k))
            ).alias("h"),
        ),
    )
    spans = base.select(
        "doc_id",
        F.explode(
            F.when(n >= k, win).otherwise(
                F.array().cast("array<struct<i:int,h:string>>")
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.i").alias("i"), F.col("w.h").alias("h"))
    # two consumers of the window-hash rows (owners agg + the cut join)
    spans = spans.localCheckpoint(eager=False)
    owners = spans.groupBy("h").agg(
        F.min("doc_id").alias("owner"),
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup"),
    )
    cut = (
        spans.join(owners, "h")
        .filter(F.col("is_dup") & (F.col("doc_id") != F.col("owner")))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(k - 1))
            ).alias("p"),
        )
        .distinct()
    )
    toks = base.select(
        "doc_id", F.posexplode(F.col("_tk")).alias("p", "tok")
    )
    kept = toks.join(cut, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text_excised"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("doc_id", n.alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_excised"), F.lit("")).alias(
                "text_excised"
            ),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_kept"), F.lit(0))
            .cast("long")
            .alias("n_kept"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_excised"),
        )
    )


def drop_boilerplate_lines(
    df: DataFrame,
    max_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate LINE removal — the CCNet/C4-style
    pass that deletes nav menus, cookie banners, and footer lines: any
    non-blank line whose trimmed form appears in MORE than ``max_df``
    distinct documents is removed from every document; everything else
    (including blank lines) survives verbatim, in original order.

    Line identity is the SPACE-trimmed line (both engines' native
    trim; indentation variants of the same menu collapse to one key,
    a tab-only line counts as content) but removal cuts the raw line, so kept
    text is byte-identical to the input minus whole dropped lines.

    Returns one row per input document::

        (doc_id, text, n_lines_kept, n_lines_dropped)

    with ``text`` the newline-join of surviving raw lines ('' when every
    line was boilerplate).

    100 TB shape: posexplode -> distinct (line, doc) -> one map-side
    partially aggregated count per trimmed line -> join back on the
    line key -> one per-doc regroup.  Same agg-then-join same-key shape
    as dup_span_stats: the hot keys ARE the boilerplate lines, so the
    join relies on AQE skew splitting; blank lines (the hottest key of
    all) are excluded from the count and the join condition entirely.
    The per-doc collect is bounded by document size, never corpus size.
    """
    if max_df < 1:
        raise ValueError("max_df must be >= 1")
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "pos", "line"
        ),
    ).withColumn("_t", F.trim(F.col("line")))
    dfc = (
        lines.filter(F.col("_t") != "")
        .select("doc_id", "_t")
        .distinct()
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    flagged = lines.join(dfc, "_t", "left").withColumn(
        "_drop",
        (F.col("_t") != "") & (F.col("line_df") > max_df),
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct("pos", "line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.sum(F.when(F.col("_drop"), 0).otherwise(1))
        .cast("long")
        .alias("n_lines_kept"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_dropped"),
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus paragraph-level FIRST-OCCURRENCE dedup — CCNet's
    actual dedup unit (Wenzek et al. 2019 dedup paragraph hashes, not
    whole documents): every repeated paragraph keeps exactly its first
    occurrence corpus-wide and is removed everywhere else (other docs
    AND later repeats inside the same doc); the residual text is
    reconstructed in original order.

    Paragraph = literal ``\\n\\n`` split (left-to-right literal split
    is lossless: joining the parts with the separator restores the
    input byte-for-byte, so e.g. a ``\\n\\n\\n`` run leaves the odd
    ``\\n`` attached to the next part).  Identity = the SPACE-trimmed
    paragraph (same rule as ``drop_boilerplate_lines``: both engines'
    native trim); blank-identity paragraphs are never dedup keys and
    always survive.  First occurrence = smallest (doc_id, pos).

    Returns one row per input document::

        (doc_id, text, n_paras_kept, n_paras_dropped)

    with ``text`` the ``\\n\\n``-join of surviving raw paragraphs (''
    when everything was a later duplicate).

    100 TB shape: skew-safe agg-then-join — ``min(struct(doc_id,
    pos))`` per trimmed key is a map-side-combinable partial agg (the
    hot keys ARE the boilerplate paragraphs; a windowed row_number
    over the key would sort each hot key's copies in one task), then
    one join back on the key (AQE skew split, blank keys excluded from
    both sides) and one per-doc regroup.  The per-doc collect is
    bounded by document size, never corpus size.
    """
    paras = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n\n", -1)).alias(
            "pos", "para"
        ),
    ).withColumn("_t", F.trim(F.col("para")))
    firsts = (
        paras.filter(F.col("_t") != "")
        .groupBy("_t")
        .agg(F.min(F.struct("doc_id", "pos")).alias("_first"))
    )
    flagged = paras.join(firsts, "_t", "left").withColumn(
        "_drop",
        (F.col("_t") != "")
        & ~(
            (F.col("_first.doc_id") == F.col("doc_id"))
            & (F.col("_first.pos") == F.col("pos"))
        ),
    )
    return flagged.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"),
                            F.struct("pos", "para"),
                        )
                    )
                ),
                lambda s: s["para"],
            ),
        ).alias("text"),
        F.sum(F.when(F.col("_drop"), 0).otherwise(1))
        .cast("long")
        .alias("n_paras_kept"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0))
        .cast("long")
        .alias("n_paras_dropped"),
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_weight_copies: int = 1,
) -> DataFrame:
    """SOFT exact dedup — keep every copy but DOWNWEIGHT it, the
    alternative to hard removal when duplicates carry signal (public
    practice: duplicate-aware loss weighting / SlimPajama-style
    reweighting studies; a page mirrored n times contributes total
    mass ~1, not n).  Weight = min(1, max_weight_copies / n_copies)
    per identical-content group (exact md5 digest, the same identity
    as ``exact_dedup``), ROUND 6 — one division on integer inputs, so
    both engines produce the identical double.

    ``max_weight_copies`` > 1 gives the softened variant where up to
    that many copies keep full weight (n <= max ⇒ weight 1).

    Returns every input row as ``(doc_id, digest, n_copies, weight)``.

    100 TB shape: map-side-partial count per digest, then an
    AQE-skew-safe join back on the digest (hot digests ARE the
    boilerplate pages; there is no window over them).  The counts
    table GROWS WITH THE CORPUS (one row per distinct content), so the
    join pins shuffle_hash — the NOTES.md 4a rule: letting AQE
    broadcast a corpus-scaled table is a serial driver build that caps
    scaling (measured 2.7x on the LSH band tables).  Weights are a
    pure expression over the join's columns."""
    if max_weight_copies < 1:
        raise ValueError("max_weight_copies must be >= 1")
    digest = F.md5(F.col(text_col))
    keyed = df.select(F.col(id_col).alias("doc_id"), digest.alias("digest"))
    counts = keyed.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return keyed.join(counts.hint("shuffle_hash"), "digest").select(
        "doc_id",
        "digest",
        "n_copies",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(max_weight_copies))
                / F.col("n_copies").cast("double"),
            ),
            6,
        ).alias("weight"),
    )


def winnow_stats(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection + cross-document match stats
    (public knowledge: Schleimer, Wilkerson & Aiken 2003 "Winnowing:
    Local Algorithms for Document Fingerprinting" — the MOSS
    algorithm).  Where ``dup_span_stats`` at stride s subsamples on a
    fixed grid (and misses phase-shifted copies), winnowing selects
    the MINIMUM hash of every ``w`` consecutive k-token window hashes
    (rightmost on ties — the paper's robustness rule), which guarantees
    any shared run of at least w+k-1 tokens contributes at least one
    IDENTICAL fingerprint in both documents at ~1/w the explode cost of
    stride-1.

    Selection key encoding (both engines): ``md5hex || lpad(10^9 - pos,
    10)`` — string min = (min hash, rightmost position) in one
    comparison; position is recovered from the suffix.  Documents with
    more than 10^9 windows would wrap the suffix (no realistic web
    document approaches that).

    Returns one row per input document::

        (doc_id, n_fingerprints, n_shared_fp, shared_frac)

    with 0 / 0.0 for docs shorter than k tokens.  A doc with fewer than
    w window hashes still selects its global minimum (at least one
    fingerprint whenever n_tokens >= k — the paper's guarantee).

    100 TB shape: selection is a pure narrow array chain (window
    hashes and the per-position minima are pin()-staged — the explode
    is ~n_windows/w rows per doc AFTER distinct); the cross-doc test is
    min(id) != max(id) per fingerprint — ONE exchange keyed by the
    fingerprint hash with map-side partial agg, the dup_span_stats
    shape; the verdict joins back on the same clustering.
    """
    from ..functions.numeric import pin

    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    base = df.withColumn("_wn_tk", pin(tokens(F.col(text_col))))
    tk = F.col("_wn_tk")
    n = F.size(tk)
    win = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat(
            F.md5(F.concat_ws(" ", F.slice(tk, i, k))),
            F.lpad(
                (F.lit(1000000000) - i).cast("string"), 10, "0"
            ),
        ),
    )
    base = base.withColumn(
        "_wn_ws",
        pin(
            F.when(n >= k, win).otherwise(
                F.array().cast("array<string>")
            )
        ),
    )
    ws = F.col("_wn_ws")
    m = F.size(ws)
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(m - w + 1, F.lit(1))),
            lambda j: F.array_min(F.slice(ws, j, w)),
        )
    )
    fps = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(m >= 1, sel).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("key"),
    ).select("doc_id", F.substring(F.col("key"), 1, 32).alias("h"))
    # r06 PERF (the LADDER rule, same as _chunk_share_stats): ``fps``
    # has two consumers and its pin()-staged window-hash chain cannot
    # be deduplicated by exchange reuse — materialize the small
    # (doc_id, h) rows once instead of hashing every window twice.
    fps = fps.localCheckpoint(eager=False)
    cross = fps.groupBy("h").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_shared")
    )
    per_doc = (
        fps.join(cross, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(
                F.when(F.col("is_shared"), 1).otherwise(0)
            ).alias("n_shared_fp"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_fingerprints"), F.lit(0)).cast(
                "long"
            ).alias("n_fingerprints"),
            F.coalesce(F.col("n_shared_fp"), F.lit(0)).cast(
                "long"
            ).alias("n_shared_fp"),
            F.when(
                F.coalesce(F.col("n_fingerprints"), F.lit(0)) > 0,
                F.round(
                    F.col("n_shared_fp") / F.col("n_fingerprints"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("shared_frac"),
        )
    )


def bloom_dedup_flags(
    ref: DataFrame,
    probe: DataFrame,
    m: int = 4096,
    k_hashes: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_flag_frac: float = 0.5,
) -> DataFrame:
    """Bloom-filter paragraph dedup — the BFF shape (public knowledge:
    Bloom 1970; Dolma's "bff" paragraph Bloom dedup, Soldaini et al.
    2024): build a FIXED-SIZE Bloom filter from a reference corpus's
    paragraphs (a previous crawl, an already-kept shard), then flag
    probe documents whose paragraphs hit the filter.  False positives
    are possible by design and fully DETERMINISTIC (fixed salted md5
    hash family), so the DuckDB oracle reproduces the exact same flag
    set, FPs included — that IS Bloom semantics, not a test artifact.

    Paragraph identity = the SPACE-trimmed ``\\n\\n`` part (same rule
    as ``dedup_paragraphs``); blanks are never keys.  Hash family:
    position_i = conv(md5('bf' || i || ':' || para)[0:8], 16) % m for
    i in 1..k_hashes.  A paragraph is flagged iff ALL k positions are
    set.  Returns one row per probe document::

        (doc_id, n_paras, n_flagged, flag_frac, drop)

    with ``flag_frac`` ROUND 6 and ``drop`` = n_paras > 0 AND
    flag_frac >= max_flag_frac (0-paragraph docs never drop); NULL
    text behaves as '' on both sides (the c4_filters convention).

    100 TB shape — the entire point of a Bloom filter: the filter is
    O(m) bits REGARDLESS of reference-corpus size, so it rides every
    executor as a single-row broadcast bitmap (array<boolean>, O(1)
    membership via element_at) and the probe side is a ZERO-SHUFFLE
    narrow pass — no explode, no join key, no candidate table.  The
    only exchange is the bounded ref-side distinct (<= m rows by
    construction, the `decontaminate` precedent).  Production m is
    10^9-10^10 bits packed 64/word; the array<boolean> form keeps the
    same contract at sandbox m.
    """
    if m < 2 or k_hashes < 1:
        raise ValueError("m must be >= 2 and k_hashes >= 1")
    clash = sorted({"_bf_bm", "_bf_ps"} & set(probe.columns))
    if clash:
        raise ValueError(f"bloom_dedup_flags staging columns clash: {clash}")

    def positions(t: Column) -> list[Column]:
        return [
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), t)), 1, 8),
                16,
                10,
            ).cast("long")
            % m
            for i in range(1, k_hashes + 1)
        ]

    ref_pos = (
        ref.select(
            F.explode(
                F.split(
                    F.coalesce(F.col(text_col), F.lit("")),
                    "\n\n",
                    -1,
                )
            ).alias("_p")
        )
        .select(F.trim(F.col("_p")).alias("_t"))
        .filter(F.col("_t") != "")
        .select(F.explode(F.array(*positions(F.col("_t")))).alias("p"))
        .distinct()
    )
    bits = ref_pos.agg(
        F.collect_list("p").alias("_pl")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.array_contains(F.col("_pl"), i),
        ).alias("_bf_bm")
    )

    from ..functions.numeric import pin

    out = (
        probe.join(F.broadcast(bits))
        .withColumn(
            "_bf_ps",
            pin(
                F.filter(
                    F.transform(
                        F.split(
                            F.coalesce(F.col(text_col), F.lit("")),
                            "\n\n",
                            -1,
                        ),
                        lambda t: F.trim(t),
                    ),
                    lambda t: t != "",
                )
            ),
        )
    )
    bm = F.col("_bf_bm")
    hit = lambda t: reduce(  # noqa: E731
        lambda a, b: a & b,
        [
            F.coalesce(F.element_at(bm, (p + 1).cast("int")), F.lit(False))
            for p in positions(t)
        ],
    )
    n_paras = F.size(F.col("_bf_ps"))
    n_flagged = F.size(F.filter(F.col("_bf_ps"), hit))
    frac = F.when(
        n_paras > 0, F.round(n_flagged / n_paras.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col).alias("doc_id"),
        n_paras.cast("long").alias("n_paras"),
        n_flagged.cast("long").alias("n_flagged"),
        frac.alias("flag_frac"),
        ((n_paras > 0) & (frac >= max_flag_frac)).alias("drop"),
    )


def cluster_keep_best(
    scored: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    algorithm: str = "label",
) -> DataFrame:
    """Per-cluster BEST-representative dedup decision: where
    `cluster_keep_decision` keeps the smallest id (a positional
    accident), this keeps the HIGHEST-``score_col`` member of every
    near-dup component (ties -> smallest id) — the public-practice
    selection rule when duplicates differ in quality (keep the clean
    mirror, drop the ad-ridden one).  ``scored`` is the whole corpus
    with a numeric quality column (classifier score, LM logprob, ...);
    ``pairs`` is any candidate pair table (id_a, id_b).  Singletons
    keep themselves.

    Returns ``(doc_id, cluster_id, <score_col>, keep)`` for every
    input row.  Scores must be NON-NULL (argmax over NULL is
    undefined — feed a COALESCEd column) and numeric (the argmax key is
    ``min(struct(-score, id))`` — negation turns max into min so the
    id tie-break needs no ordering inversion and works for any
    orderable id type).

    100 TB shape: components via `connected_components` (O(1) driver
    traffic per round), then ONE map-side-partial agg per cluster and
    one join back — NO window over the cluster key (the hot clusters
    ARE the boilerplate families; a row_number would sort the biggest
    cluster's copies in one task).  The per-cluster best table is
    corpus-scaled, so the join-back pins shuffle_hash (NOTES 4a: an
    AQE broadcast of a corpus-scaled table is a serial driver build).
    """
    cc = connected_components(pairs, algorithm=algorithm)
    base = (
        scored.select(
            F.col(id_col).alias("doc_id"), F.col(score_col).alias("_sc")
        )
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")),
        )
        # r06 second pass (the LADDER rule): base carries the caller's
        # whole scoring chain and is consumed by BOTH the per-cluster
        # argmax and the join-back — the plan audit showed the scored
        # subtree (scan + classifier) planned twice with no exchange
        # reuse.  Materialize the small (doc_id, _sc, cluster_id) rows
        # once; only these three columns persist, never the text.
        .localCheckpoint(eager=False)
    )
    best = base.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (-F.col("_sc")).alias("ns"),
                F.col("doc_id").alias("kid"),
            )
        ).alias("_b")
    )
    return base.join(best.hint("shuffle_hash"), "cluster_id").select(
        "doc_id",
        "cluster_id",
        F.col("_sc").alias(score_col),
        (F.col("doc_id") == F.col("_b.kid")).alias("keep"),
    )


def decontaminate_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark-SIDE contamination report — the dual of
    `decontaminate`: instead of flagging corpus documents, report for
    EVERY eval item how many corpus documents share >= ``min_overlap``
    distinct k-shingles with it and the worst single overlap (public
    practice: eval suites publish per-item contamination rates so
    burned items can be excluded from scoring, not just scrubbed from
    the training set — the two directions answer different questions).

    Returns one row per benchmark document, zeros included::

        (bench_id, n_contaminating, max_overlap)

    100 TB shape: the benchmark is bounded by construction, so its
    (item, shingle) set BROADCASTS (the `decontaminate` precedent) and
    the corpus side never shuffles for the join; the per-(item, doc)
    overlap counts partial-aggregate map-side into one exchange keyed
    by the pair, then one tiny per-item agg.  The pair table is
    bounded by |matches|, not |corpus| x |bench|.
    """
    bench_sh = with_shingles(benchmark, text_col, k).select(
        F.col(bench_id_col).alias("bid"),
        F.explode(F.col("_sh")).alias("shingle"),
    )
    doc_sh = doc_shingles(corpus, text_col, id_col, k)
    pair = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("bid", "sid")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    per_item = pair.groupBy("bid").agg(
        F.sum(
            F.when(F.col("n_shared") >= min_overlap, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_contaminating"),
        F.max("n_shared").cast("long").alias("max_overlap"),
    )
    return (
        benchmark.select(F.col(bench_id_col).alias("bench_id"))
        .join(
            per_item.withColumnRenamed("bid", "bench_id"),
            "bench_id",
            "left",
        )
        .select(
            "bench_id",
            F.coalesce(F.col("n_contaminating"), F.lit(0))
            .cast("long")
            .alias("n_contaminating"),
            F.coalesce(F.col("max_overlap"), F.lit(0))
            .cast("long")
            .alias("max_overlap"),
        )
    )
