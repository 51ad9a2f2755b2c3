"""Property-based tests (hypothesis): Spark expressions vs independent
Python models on generated adversarial inputs.

Each property collects one generated BATCH of cases and runs ONE Spark
job over it (per-example Spark jobs would take minutes).  Settings are
derandomized for reproducibility.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from annual_report_pdf_parsers_spark.functions.numeric import to_double
from annual_report_pdf_parsers_spark.operators.toc_repair import (
    repair_toc_lines,
)
from annual_report_pdf_parsers_spark.operators.urls import canonicalize_url
from annual_report_pdf_parsers_spark.sources.synthetic import parse_number

SETTINGS = settings(max_examples=8, deadline=None, derandomize=True)

# ---------------------------------------------------------------------------
# F1-F8/F19 numeric chain vs the pure-Python oracle
# ---------------------------------------------------------------------------

_NUMERIC_ALPHABET = "0123456789.,-()%  –"

numeric_cell = st.text(alphabet=_NUMERIC_ALPHABET, min_size=0, max_size=14)
locale = st.sampled_from(["fr", "en", "auto"])


@SETTINGS
@given(st.lists(st.tuples(numeric_cell, locale), min_size=1, max_size=40))
def test_numeric_chain_matches_python_oracle(spark, cases):
    df = spark.createDataFrame(cases, "cell string, loc string")
    got = df.select(
        to_double(F.col("cell"), F.col("loc")).alias("v")
    ).collect()
    for (cell, loc), row in zip(cases, got):
        want = parse_number(cell, loc)
        assert row.v == want or (
            row.v is None and want is None
        ), f"cell={cell!r} loc={loc}: spark={row.v} python={want}"


# ---------------------------------------------------------------------------
# W5 ToC repair vs a direct port of the reference loop (tobam:88-94)
# ---------------------------------------------------------------------------


def _reference_repair(lines: list[str]) -> list[str]:
    """tobam/parser.py:88-94 ported verbatim (mutating loop with the '0'
    sentinel), with the one documented deviation: no IndexError when the
    LAST line lacks a number (left unrepaired)."""
    c = list(lines)
    for i in range(len(c)):
        if not c[i].split()[-1].isdigit():
            if i + 1 < len(c):
                c[i] = c[i] + " " + c[i + 1].split()[-1]
                c[i + 1] = "0"
    return [x for x in c if x != "0"]


_WORD = st.text(alphabet="ABCDEFGH", min_size=1, max_size=4)
_toc_line = st.builds(
    lambda words, pg: " ".join(words) + (f" {pg}" if pg else ""),
    st.lists(_WORD, min_size=1, max_size=3),
    st.one_of(st.none(), st.integers(min_value=1, max_value=99)),
)


@SETTINGS
@given(st.lists(st.lists(_toc_line, min_size=1, max_size=7), min_size=1, max_size=6))
def test_toc_repair_matches_reference_loop(spark, docs):
    rows = [
        (f"u{d}", i, line)
        for d, lines in enumerate(docs)
        for i, line in enumerate(lines)
    ]
    df = spark.createDataFrame(rows, "url string, entry_idx int, line string")
    got: dict[str, list[str]] = {}
    for r in sorted(
        repair_toc_lines(df).collect(), key=lambda r: (r.url, r.entry_idx)
    ):
        got.setdefault(r.url, []).append(r.line)
    for d, lines in enumerate(docs):
        want = _reference_repair(lines)
        assert got.get(f"u{d}", []) == want, (
            f"doc={lines!r}: spark={got.get(f'u{d}')} reference={want}"
        )


# ---------------------------------------------------------------------------
# URL canonicalization vs component-wise construction (non-circular:
# the expected value is built from the parts, never parsed)
# ---------------------------------------------------------------------------

_host_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_param = st.one_of(
    st.tuples(st.sampled_from(["q", "id", "page"]), st.integers(0, 99)),
    st.tuples(
        st.sampled_from(["utm_source", "utm_campaign", "fbclid", "gclid"]),
        st.integers(0, 99),
    ),
)
_url_case = st.builds(
    lambda scheme_up, www, host, segs, params, slash, frag: {
        "scheme_up": scheme_up, "www": www, "host": host, "segs": segs,
        "params": params, "slash": slash, "frag": frag,
    },
    st.booleans(),
    st.booleans(),
    _host_word,
    st.lists(_host_word, min_size=0, max_size=3),
    st.lists(_param, min_size=0, max_size=4),
    st.booleans(),
    st.booleans(),
)

_TRACKING = re.compile(r"^(utm_[A-Za-z]+|fbclid|gclid|ref)$")


def _build_and_expect(case: dict) -> tuple[str, str]:
    scheme = "HTTPS" if case["scheme_up"] else "https"
    host = case["host"] + ".com"
    raw_host = ("WWW." if case["www"] else "") + (
        host.upper() if case["scheme_up"] else host
    )
    path = "".join("/" + s for s in case["segs"])
    qs = "&".join(f"{k}={v}" for k, v in case["params"])
    url = (
        f"{scheme}://{raw_host}{path}"
        + ("/" if case["slash"] else "")
        + (f"?{qs}" if qs else "")
        + ("#frag" if case["frag"] else "")
    )
    kept = "&".join(
        f"{k}={v}" for k, v in case["params"] if not _TRACKING.match(k)
    )
    expected = f"https://{host}{path}" + (f"?{kept}" if kept else "")
    return url, expected


@SETTINGS
@given(st.lists(_url_case, min_size=1, max_size=40))
def test_url_canonicalization_property(spark, cases):
    pairs = [_build_and_expect(c) for c in cases]
    df = spark.createDataFrame(
        [(u,) for u, _ in pairs], "url string"
    )
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    for (u, want), g in zip(pairs, got):
        assert g == want, f"url={u!r}: spark={g!r} expected={want!r}"


# ---------------------------------------------------------------------------
# crelan hard clean() vs the reference regex chain (crelan:644-656)
# ---------------------------------------------------------------------------

_HARD_ALPHABET = "abyzABYZ0123456789%./, "
_hard_name = st.one_of(
    st.just("nan"),
    st.text(alphabet=_HARD_ALPHABET, min_size=0, max_size=18),
)


@SETTINGS
@given(st.lists(_hard_name, min_size=1, max_size=50))
def test_hard_clean_matches_reference_chain(spark, cases):
    """functions/strings.py::hard_clean_crelan (Java-regex lookarounds)
    must equal the reference's sequential re.sub chain on adversarial
    inputs — every '%' context, glued unit letters, digit-space runs."""
    from annual_report_pdf_parsers_spark.functions.strings import (
        hard_clean_crelan,
    )
    from annual_report_pdf_parsers_spark.sources.synthetic import (
        hard_clean_ref,
    )

    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = df.select(hard_clean_crelan(F.col("s")).alias("v")).collect()
    for s, row in zip(cases, got):
        want = hard_clean_ref(s)
        assert row.v == want, f"s={s!r}: spark={row.v!r} python={want!r}"


# ---------------------------------------------------------------------------
# staged clean_names (the hot path) vs the composed contract expression
# ---------------------------------------------------------------------------

_NAME_ALPHABET = "abzABZ0123456789%./,() –é  "
_clean_name = st.one_of(
    st.just("nan"),
    st.just("FR0000120271 TOTAL SA"),  # embedded ISIN
    st.just("1.234 ACME % 5 % 6/2"),  # multi-%, digit-space runs
    st.text(alphabet=_NAME_ALPHABET, min_size=0, max_size=24),
)
# deep_clean and hard_clean never co-occur in an archetype (the dispatch
# stage sets at most one), so generate flags from the 6 legal combos.
_clean_flags = st.sampled_from(
    [
        (False, False, False),
        (True, False, False),
        (False, True, False),
        (True, True, False),
        (False, False, True),
        (True, False, True),
    ]
)


@SETTINGS
@given(
    st.lists(st.tuples(_clean_name, _clean_flags), min_size=1, max_size=40)
)
def test_staged_clean_names_matches_composed(spark, cases):
    """operators/cleanup.py::clean_names stages the F13/F9/deep/hard/F18
    chain as pin()-ned named cells (no cross-branch CSE in Catalyst makes
    the composed form re-evaluate the upstream chain per CASE reference).
    The staged plan must keep AND filter rows exactly like the composed
    contract expression (strings.clean_holding_name + the P5/P8 length
    predicates)."""
    from annual_report_pdf_parsers_spark.functions.strings import (
        clean_holding_name,
    )
    from annual_report_pdf_parsers_spark.operators.cleanup import clean_names

    rows = [
        (i, name, strip, deep, hard)
        for i, (name, (strip, deep, hard)) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, holding_name string, strip boolean, "
        "deep boolean, hard boolean",
    )
    staged = {
        r.id: r.holding_name
        for r in clean_names(
            df, F.col("strip"), F.col("deep"), F.col("hard")
        ).collect()
    }
    composed = {
        r.id: r.holding_name
        for r in df.withColumn(
            "holding_name",
            clean_holding_name(
                F.col("holding_name"),
                F.col("strip"),
                F.col("deep"),
                F.col("hard"),
            ),
        )
        .filter(
            (F.length("holding_name") > 0) & (F.length("holding_name") < 90)
        )
        .collect()
    }
    assert staged == composed, {
        i: (staged.get(i), composed.get(i))
        for i in set(staged) ^ set(composed)
        | {i for i in staged if staged.get(i) != composed.get(i)}
    }


# ---------------------------------------------------------------------------
# connected components vs a pure-Python union-find
# ---------------------------------------------------------------------------

_edge = st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
    lambda e: e[0] != e[1]
)


@SETTINGS
@given(st.lists(_edge, min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """operators/dedup.py::connected_components (iterative min-label
    propagation with sum-fixpoint detection) vs a sequential union-find
    on random multigraphs — chains, cycles, self-dup edges, singleton
    absence."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        connected_components,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want = {}
    for n in parent:
        want.setdefault(find(n), []).append(n)
    expected = {
        n: min(members) for members in want.values() for n in members
    }

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    assert got == expected
    got_star = {
        r.node: r.cluster_id
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert got_star == expected


# ---------------------------------------------------------------------------
# PII scrub vs the Python re chain
# ---------------------------------------------------------------------------

_pii_fragment = st.one_of(
    st.text(alphabet="ab @.+-0123456789", min_size=0, max_size=12),
    st.just("bob.smith+x@mail-hub.example.org"),
    st.just("10.0.255.7"),
    st.just("999.999.999.999"),  # shape-valid ipv4 (scrubbers take it)
    st.just("+44 123 4567"),
    st.just("a@b.c"),  # single-letter TLD: NOT an email per the pattern
    st.just("1.2.3.4.5"),  # 5 octets: \b boundaries pick the first 4
)
_pii_text = st.lists(_pii_fragment, min_size=0, max_size=6).map(" ".join)


@SETTINGS
@given(st.lists(_pii_text, min_size=1, max_size=30))
def test_pii_scrub_matches_python_re(spark, texts):
    """operators/scrub.py::scrub_pii (Java regex) vs the identical
    sequential re.sub/findall chain in Python — adversarial adjacency,
    malformed near-misses, multiple hits per doc, count-on-pass-input
    semantics."""
    import re as _re

    from annual_report_pdf_parsers_spark.operators.scrub import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        scrub_pii,
    )

    def model(t):
        ne = len(_re.findall(EMAIL_RE, t))
        t1 = _re.sub(EMAIL_RE, "<EMAIL>", t)
        ni = len(_re.findall(IPV4_RE, t1))
        t2 = _re.sub(IPV4_RE, "<IP>", t1)
        np_ = len(_re.findall(PHONE_RE, t2))
        return ne, ni, np_, _re.sub(PHONE_RE, "<PHONE>", t2)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    for i, t in enumerate(texts):
        ne, ni, np_, clean = model(t)
        r = got[i]
        assert (
            r.n_emails, r.n_ips, r.n_phones, r.text
        ) == (ne, ni, np_, clean), f"t={t!r}: {tuple(r)} vs {(ne, ni, np_, clean)}"


# ---------------------------------------------------------------------------
# deterministic sampling / shard shuffle / decontamination vs Python models
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(st.integers(0, 10**12), min_size=1, max_size=60, unique=True),
    st.sampled_from(["00", "3f", "7f", "ff"]),
    st.sampled_from(["s0", "alt"]),
)
def test_hash_mod_sample_matches_hashlib(spark, keys, keep_hex, salt):
    """sampling.hash_mod_sample vs hashlib.md5: the kept set must be
    exactly the rows whose digest prefix clears the threshold — any id
    range, any threshold, any salt."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.sampling import (
        hash_mod_sample,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k for r in hash_mod_sample(df, "k", keep_hex, salt).collect()
    }
    want = {
        k
        for k in keys
        if hashlib.md5(f"{k}|{salt}".encode()).hexdigest()[:2] <= keep_hex
    }
    assert got == want


@SETTINGS
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
def test_shard_shuffle_matches_hashlib(spark, keys):
    """sampling.shard_shuffle vs hashlib.md5: shard = digest prefix and
    pos = 1-based rank within the shard under (digest, key) order."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.sampling import (
        shard_shuffle,
    )

    dg = {k: hashlib.md5(f"{k}|sh0".encode()).hexdigest() for k in keys}
    want = {}
    by_shard = {}
    for k in keys:
        by_shard.setdefault(dg[k][:2], []).append(k)
    for shard, ks in by_shard.items():
        for pos, k in enumerate(
            sorted(ks, key=lambda k: (dg[k], k)), start=1
        ):
            want[k] = (shard, pos)

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: (r.shard, r.pos) for r in shard_shuffle(df, "k").collect()
    }
    assert got == want


# Separators drawn from the engine's whitespace split class (Java \\s +
# \\p{Zs} + U+2028/29): tokenization must agree with the model under
# tabs, newlines, NBSP, and multi-space runs, not just single spaces.
_WS_SEPS = [" ", "\t", "\n", "\r", "  ", " \t ", "\xa0", "\u2028"]


def _model_tokens(text: str) -> list[str]:
    import re

    return [
        t
        for t in re.split("[ \t\n\r\x0b\x0c\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+", text)
        if t
    ]


def _ws_joined(words):
    _words, seps = words
    return "".join(
        w + s for w, s in zip(_words, seps)
    )


_decon_text = st.tuples(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=0,
        max_size=10,
    ),
    st.lists(st.sampled_from(_WS_SEPS), min_size=10, max_size=10),
).map(_ws_joined)


@SETTINGS
@given(
    st.lists(_decon_text, min_size=1, max_size=25),
    st.lists(_decon_text, min_size=1, max_size=5),
    st.integers(1, 3),
)
def test_decontaminate_matches_python_model(spark, docs, bench, thresh):
    """dedup.decontaminate vs a direct Python shingle-set model on a
    tiny alphabet (dense organic overlap): distinct-overlap counts and
    the threshold decision for EVERY doc, zeros included."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        decontaminate,
    )

    def sh(t):
        tk = _model_tokens(t)
        return {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }

    bench_sh = set().union(*(sh(t) for t in bench)) if bench else set()
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    got = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(corpus, bdf, min_overlap=thresh).collect()
    }
    for i, t in enumerate(docs):
        n = len(sh(t) & bench_sh)
        assert got[i] == (n, n >= thresh), (i, t, got[i], n)


# ---------------------------------------------------------------------------
# Gopher-style repetition stats vs a pure-Python model
# ---------------------------------------------------------------------------

_rep_word = st.sampled_from(["a", "b", "c", "aa", "x y".replace(" ", ""), ""])
_rep_text = st.tuples(
    st.lists(_rep_word, min_size=0, max_size=24),
    st.lists(st.sampled_from(_WS_SEPS), min_size=24, max_size=24),
).map(_ws_joined)


def _rep_model(text: str, n: int = 3):
    toks = _model_tokens(text)
    grams = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ] if len(toks) >= n else []
    nt, ng = len(toks), len(grams)
    dup_w = round((nt - len(set(toks))) / nt, 6) if nt else 0.0
    dup_g = round((ng - len(set(grams))) / ng, 6) if ng else 0.0
    max_g = (
        round(max(grams.count(g) for g in set(grams)) / ng, 6) if ng else 0.0
    )
    return nt, dup_w, dup_g, max_g


@SETTINGS
@given(st.lists(_rep_text, min_size=1, max_size=30))
def test_repetition_stats_matches_python_model(spark, texts):
    """operators/text.py::repetition_stats (HOF fractions + relational
    max-gram frequency) vs a direct Python model on adversarial token
    streams: empty docs, all-duplicate docs, sub-n-gram-length docs."""
    from annual_report_pdf_parsers_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in repetition_stats(df).collect()
    }
    for i, t in enumerate(texts):
        nt, dup_w, dup_g, max_g = _rep_model(t)
        r = got[i]
        assert (
            r.n_tokens,
            r.dup_word_frac,
            r.dup_ngram_frac,
            r.max_ngram_frac,
        ) == (nt, dup_w, dup_g, max_g), f"doc={t!r}: {r} vs {(nt, dup_w, dup_g, max_g)}"


# ---------------------------------------------------------------------------
# as-of join vs pandas merge_asof; sessionization vs a Python model
# ---------------------------------------------------------------------------

_ts_us = st.integers(min_value=0, max_value=3_600_000_000)


@SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 3), _ts_us), min_size=1, max_size=25),
    st.lists(
        st.tuples(st.integers(0, 3), _ts_us, st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    """operators/temporal.py::asof_join (union+window form) vs pandas
    merge_asof (backward, exact matches allowed) — a third, independent
    implementation besides the DuckDB native ASOF JOIN oracle."""
    import pandas as pd

    from annual_report_pdf_parsers_spark.operators.temporal import asof_join

    # dedupe (key, ts) on both sides: as-of ties within a side are
    # undefined across engines (documented in the module doc)
    lrows = list({(k, t): (k, t) for k, t in lrows}.values())
    rrows = list({(k, t): (k, t, v) for k, t, v in rrows}.values())
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {"user_id": [k for k, _ in lrows],
         "ts": [base + pd.Timedelta(microseconds=t) for _, t in lrows]}
    )
    rpdf = pd.DataFrame(
        {"user_id": [k for k, _, _ in rrows],
         "ts": [base + pd.Timedelta(microseconds=t) for _, t, _ in rrows],
         "val": [float(v) for _, _, v in rrows]}
    ).astype({"user_id": "int64", "val": "float64"})
    rpdf["ts"] = pd.to_datetime(rpdf["ts"])
    want = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "user_id long, ts timestamp, val double")
    )
    got = asof_join(
        ldf, rdf, on="ts", by=("user_id",), value_cols=("val",)
    ).toPandas()
    wmap = {
        (r.user_id, r.ts): None if pd.isna(r.val) else r.val
        for r in want.itertuples()
    }
    assert len(got) == len(lpdf)
    for r in got.itertuples():
        gv = None if pd.isna(r.val_asof) else r.val_asof
        assert gv == wmap[(r.user_id, r.ts)], (
            f"({r.user_id},{r.ts}): spark={gv} pandas={wmap[(r.user_id, r.ts)]}"
        )


@SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 2), _ts_us), min_size=1, max_size=30)
)
def test_sessionize_matches_python_model(spark, rows):
    """operators/temporal.py::sessionize gap semantics vs a direct Python
    model (30s gap over microsecond timestamps)."""
    import pandas as pd

    from annual_report_pdf_parsers_spark.operators.temporal import sessionize

    rows = list({(k, t): (k, t) for k, t in rows}.values())
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {"user_id": [k for k, _ in rows],
         "ts": [base + pd.Timedelta(microseconds=t) for _, t in rows]}
    )
    got = {
        (r.user_id, r.ts): r.session_no
        for r in sessionize(
            spark.createDataFrame(pdf), gap_minutes=0.5
        ).collect()
    }
    gap_us = int(0.5 * 60 * 1_000_000)
    for uid, grp in pdf.sort_values("ts").groupby("user_id"):
        sno, prev = 0, None
        for r in grp.itertuples():
            if prev is None or (r.ts - prev).value // 1000 > gap_us:
                sno += 1
            prev = r.ts
            assert got[(uid, r.ts)] == sno, (uid, r.ts, got[(uid, r.ts)], sno)


# ---------------------------------------------------------------------------
# SimHash banded pairing vs a pure-Python fingerprint + Hamming-ball model
# ---------------------------------------------------------------------------

_sh_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
_sh_text = st.tuples(
    st.lists(_sh_word, min_size=1, max_size=10),
    st.lists(st.sampled_from(_WS_SEPS), min_size=10, max_size=10),
).map(_ws_joined)


def _py_simhash(text: str, n_bits: int) -> str:
    """Independent Python model of dedup.simhash_bits (md5 nibble
    votes), sharing only the SPEC: nibble i of md5(tok) (md5(tok+'#2')
    past 32) votes +1 when the hex digit >= '8'."""
    import hashlib

    toks = _model_tokens(text)
    votes = [0] * n_bits
    for tok in toks:
        h = hashlib.md5(tok.encode()).hexdigest()
        h2 = (
            hashlib.md5((tok + "#2").encode()).hexdigest()
            if n_bits > 32
            else ""
        )
        for i in range(n_bits):
            d = (h if i < 32 else h2)[i % 32]
            votes[i] += 1 if d >= "8" else -1
    return "".join("1" if v > 0 else "0" for v in votes)


@SETTINGS
@given(st.lists(_sh_text, min_size=2, max_size=14))
def test_simhash_pairs_matches_python_model(spark, texts):
    """simhash_pairs (integer-chunk votes, banded candidates, limb
    Hamming) vs a from-scratch Python model: the returned pair set must
    equal the brute-force Hamming ball of radius n_bands-1 over the
    model fingerprints — on whitespace-noisy token streams (empty docs
    produce no tokens and no fingerprint; they must simply be absent,
    not crash)."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fps = {
        i: _py_simhash(t, 32)
        for i, t in enumerate(texts)
        if _model_tokens(t)
    }
    want = set()
    ids = sorted(fps)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            h = sum(p != q for p, q in zip(fps[a], fps[b]))
            if h <= 3:
                want.add((a, b, h))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(df, n_bits=32, n_bands=4).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# boilerplate-line removal + line stats vs Python models
# ---------------------------------------------------------------------------

_line = st.one_of(
    st.sampled_from(
        ["NAV | MENU", "  NAV | MENU  ", "- item", "* item ",
         "• dot", "end...", "more…", "", "   ", "plain words here"]
    ),
    st.text(
        alphabet="ab -*.…•\t", min_size=0, max_size=12
    ),
)
_mldoc = st.lists(_line, min_size=0, max_size=6).map("\n".join)


@SETTINGS
@given(st.lists(_mldoc, min_size=1, max_size=12), st.integers(1, 3))
def test_drop_boilerplate_lines_matches_python_model(spark, docs, max_df):
    """dedup.drop_boilerplate_lines vs a direct Python model: trim-keyed
    cross-doc line DF, blank lines immune, raw lines cut, original
    order preserved, all-dropped docs collapse to ''."""
    from collections import defaultdict

    from annual_report_pdf_parsers_spark.operators.dedup import (
        drop_boilerplate_lines,
    )

    # SPACE-trim, not full whitespace-strip: both engines' native
    # trim() strips ASCII spaces only, and the operator documents that
    # choice (a tab-only line counts as content)
    dfreq = defaultdict(set)
    for i, d in enumerate(docs):
        for ln in d.split("\n"):
            if ln.strip(" "):
                dfreq[ln.strip(" ")].add(i)

    def model(i, d):
        kept, dropped = [], 0
        for ln in d.split("\n"):
            t = ln.strip(" ")
            if t and len(dfreq[t]) > max_df:
                dropped += 1
            else:
                kept.append(ln)
        return "\n".join(kept), len(kept), dropped

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in drop_boilerplate_lines(df, max_df=max_df).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == model(i, d), f"doc {i}: {d!r}"


@SETTINGS
@given(st.lists(_mldoc, min_size=1, max_size=12))
def test_line_stats_matches_python_model(spark, docs):
    """text.line_stats vs a direct Python model over adversarial line
    mixes (blanks, pure-whitespace lines, unicode bullets/ellipses)."""
    from annual_report_pdf_parsers_spark.operators.text import line_stats

    def model(d):
        # SPACE-trim: see test_drop_boilerplate_lines model note
        ls = [ln.strip(" ") for ln in d.split("\n")]
        ls = [ln for ln in ls if ln]
        n = len(ls)
        if not n:
            return 0, 0.0, 0.0, 0.0
        bullet = sum(
            1 for ln in ls
            if ln[:2] in ("- ", "* ") or ln[:1] == "•"
        )
        ell = sum(
            1 for ln in ls if ln.endswith("...") or ln.endswith("…")
        )
        dup = n - len(set(ls))
        return (
            n, round(bullet / n, 6), round(ell / n, 6), round(dup / n, 6)
        )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lines, r.bullet_frac, r.ellipsis_frac,
                   r.dup_line_frac)
        for r in line_stats(df).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == model(d), f"doc {i}: {d!r}"


# ---------------------------------------------------------------------------
# fastText-style hashed classifier vs a pure-Python model
# ---------------------------------------------------------------------------

_qc_text = st.tuples(
    st.lists(
        st.sampled_from(["a", "b", "cd", "THE", "zz", "Mixed"]),
        min_size=0,
        max_size=16,
    ),
    st.lists(st.sampled_from(_WS_SEPS), min_size=16, max_size=16),
).map(_ws_joined)


def _qc_model(text: str):
    """Independent model of operators/text.py::quality_classifier:
    lowered unigrams + adjacent bigrams, md5 2-hex bucket into
    CLASSIFIER_WEIGHTS, ordered left-fold sum (Python floats ARE IEEE
    doubles, so the fold matches Spark's bit for bit), one division."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.text import (
        CLASSIFIER_BIAS, CLASSIFIER_WEIGHTS,
    )

    tk = [t.lower() for t in _model_tokens(text)]
    feats = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
    total = 0.0
    for f in feats:
        total = total + CLASSIFIER_WEIGHTS[
            hashlib.md5(f.encode()).hexdigest()[:2]
        ]
    nf = len(feats)
    s = CLASSIFIER_BIAS + total / nf if nf else float(CLASSIFIER_BIAS)
    return nf, round(s, 6), s >= 0.0


@SETTINGS
@given(st.lists(_qc_text, min_size=1, max_size=30))
def test_quality_classifier_matches_python_model(spark, texts):
    """operators/text.py::quality_classifier vs the model on
    whitespace-noisy streams: empty docs, single-token docs (no
    bigrams), case folding, and the exact keep boundary."""
    from annual_report_pdf_parsers_spark.operators.text import (
        quality_classifier,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_features, r.score, r.keep)
        for r in quality_classifier(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _qc_model(t), (i, t, got[i], _qc_model(t))


# ---------------------------------------------------------------------------
# temperature mixture sampling vs hashlib + IEEE-ordered arithmetic
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.sampled_from(["s1", "s2", "s3", "hot"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 40),
)
def test_mixture_sample_matches_hashlib(spark, rows, target):
    """sampling.mixture_sample vs an independent model: integer sqrt
    weights, exact weight sum, the fixed-order double threshold, and
    the 4-hex digest realization — the kept set and every emitted
    integer column must match exactly."""
    import hashlib
    import math

    from annual_report_pdf_parsers_spark.operators.sampling import (
        mixture_sample,
    )

    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    w = {s: math.floor(math.sqrt(float(n)) * 1000000.0) for s, n in counts.items()}
    tw = sum(w.values())
    thr = {
        s: min(
            math.floor(65536.0 * target * float(w[s]) / float(tw) / float(n)),
            65536,
        )
        for s, n in counts.items()
    }
    want = {
        k: (s, counts[s], w[s], thr[s])
        for k, s in rows
        if thr[s] >= 65536
        or hashlib.md5(f"{k}|mx0".encode()).hexdigest()[:4]
        < f"{thr[s]:04x}"
    }

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r.doc_id: (r.source, r.src_n, r.src_w, r.keep_thr)
        for r in mixture_sample(
            df, "source", "doc_id", target_total=target
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# soft URL-quality score vs a pure-Python model
# ---------------------------------------------------------------------------

_url_piece = st.sampled_from(
    ["casino", "wiki", "blog", "login", "x", "paper", "PORN", "Coupon",
     "notspam", "research"]
)
_uq_url = st.lists(_url_piece, min_size=0, max_size=8).map(
    lambda ps: "https://h.example/" + "-".join(ps)
)


def _uq_model(url: str):
    from annual_report_pdf_parsers_spark.operators.urls import (
        URL_WORD_WEIGHTS,
    )

    u = url.lower()
    s = 0.0
    for w, wt in sorted(URL_WORD_WEIGHTS.items()):
        s = s + ((len(u) - len(u.replace(w, ""))) / len(w)) * float(wt)
    return round(s, 6), s > -0.5


@SETTINGS
@given(st.lists(_uq_url, min_size=1, max_size=40))
def test_url_quality_matches_python_model(spark, urls):
    """urls.url_quality_score vs the model: case folding, repeated and
    overlapping-ish word hits, zero-hit urls, the exact keep boundary —
    fixed-order IEEE sum must agree bit for bit."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        url_quality_score,
    )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got = {
        r.doc_id: (r.url_score, r.url_keep)
        for r in url_quality_score(df).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _uq_model(u), (i, u, got[i], _uq_model(u))


# ---------------------------------------------------------------------------
# sequence packing vs hashlib + exact cumsum model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.integers(0, 40),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 60),
)
def test_pack_sequences_matches_model(spark, rows, budget):
    """sampling.pack_sequences vs an independent model: salted-digest
    shard layout, per-shard exact cumsum in (digest, key) order, and
    the floor-division sequence spans — including zero-token docs and
    budget-1 packing."""
    import hashlib
    import math

    from annual_report_pdf_parsers_spark.operators.sampling import (
        pack_sequences,
    )

    dg = {k: hashlib.md5(f"{k}|sh0".encode()).hexdigest() for k, _ in rows}
    by_shard: dict = {}
    for k, n in rows:
        by_shard.setdefault(dg[k][:1], []).append((k, n))
    want = {}
    for shard, ks in by_shard.items():
        cum = 0
        for k, n in sorted(ks, key=lambda t: (dg[t[0]], t[0])):
            start = cum
            cum += n
            first = math.floor(start / budget)
            last = math.floor((cum - 1) / budget) if n > 0 else first
            want[k] = (shard, n, start, first, last)

    texts = [(k, " ".join(["w"] * n)) for k, n in rows]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.start_tok, r.seq_first, r.seq_last)
        for r in pack_sequences(
            df, "doc_id", budget=budget, prefix_len=1
        ).collect()
    }
    assert got == want


@SETTINGS
@given(st.lists(_mldoc, min_size=1, max_size=10))
def test_dedup_paragraphs_matches_python_model(spark, docs):
    """dedup.dedup_paragraphs vs a direct Python model: literal '\\n\\n'
    split, space-trimmed identity, global first occurrence by
    (doc_id, pos) wins (within-doc repeats included), blank-identity
    paragraphs immune, raw paragraphs reassembled in order."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        dedup_paragraphs,
    )

    first = {}
    for i, d in enumerate(docs):
        for p_idx, p in enumerate(d.split("\n\n")):
            t = p.strip(" ")
            if t and t not in first:
                first[t] = (i, p_idx)

    def model(i, d):
        kept, dropped = [], 0
        for p_idx, p in enumerate(d.split("\n\n")):
            t = p.strip(" ")
            if t and first[t] != (i, p_idx):
                dropped += 1
            else:
                kept.append(p)
        return "\n\n".join(kept), len(kept), dropped

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_paras_kept, r.n_paras_dropped)
        for r in dedup_paragraphs(df).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == model(i, d), f"doc {i}: {d!r}"


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", None]),
            st.lists(
                st.sampled_from(["the", "of", "and", "zzqx", "wqk"]),
                min_size=0, max_size=6,
            ).map(" ".join),
        ),
        min_size=1, max_size=14,
    )
)
def test_ccnet_tiers_matches_python_model(spark, rows):
    """text.ccnet_tiers vs a Python model using numpy's linear-
    interpolated percentile (the same definition as Spark's exact
    percentile and DuckDB's quantile_cont), round-6 on both the scores
    and the cutoffs, NULL langs as their own stratum."""
    import numpy as np

    from annual_report_pdf_parsers_spark.operators.text import (
        UNIGRAM_LOGPROBS,
        UNKNOWN_LOGPROB,
        ccnet_tiers,
    )

    def score(txt):
        tk = [w.lower() for w in txt.split(" ") if w]
        if not tk:
            return 0.0
        acc = 0.0
        for w in tk:
            acc += UNIGRAM_LOGPROBS.get(w, UNKNOWN_LOGPROB)
        return round(acc / len(tk), 6)

    by_lang = {}
    scored = []
    for i, (lang, txt) in enumerate(rows):
        s = score(txt)
        scored.append((i, lang, s))
        by_lang.setdefault(lang, []).append(s)
    cuts = {
        lang: (
            round(float(np.percentile(v, 100 * 2.0 / 3.0)), 6),
            round(float(np.percentile(v, 100 * 1.0 / 3.0)), 6),
        )
        for lang, v in by_lang.items()
    }

    def model(lang, s):
        ch, ct = cuts[lang]
        tier = "head" if s >= ch else ("middle" if s >= ct else "tail")
        return tier, s >= ct

    df = spark.createDataFrame(
        [(i, lang, txt) for i, (lang, txt) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )
    got = {r.doc_id: r for r in ccnet_tiers(df).collect()}
    assert len(got) == len(rows)
    for i, lang, s in scored:
        r = got[i]
        assert r.avg_logprob == s, (i, r.avg_logprob, s)
        assert (r.tier, r.keep) == model(lang, s), (i, lang, s, r)


_c4line = st.one_of(
    st.sampled_from(
        [
            "This is a good clean sentence with many words.",
            "Short line.",
            "no terminal punct in this longer line here",
            "please enable javascript to continue viewing now.",
            "Tabs\there\tare\tstill\twords in this sentence!",
            "Is this a question with enough words here?",
            "lorem ipsum appears here with other words too.",
            "code with brace { inside a long enough line.",
            "a badword mentioned among many other words here.",
            'They said "this quoted sentence ends with a quote."',
            "",
            "   ",
        ]
    ),
    st.text(alphabet='ab .!?"{\t', min_size=0, max_size=12),
)
_c4doc = st.lists(_c4line, min_size=0, max_size=7).map("\n".join)


@SETTINGS
@given(st.lists(_c4doc, min_size=1, max_size=10))
def test_c4_filters_matches_python_model(spark, docs):
    """text.c4_filters vs a direct Python model: line keep rules
    (SPACE-trim identity, terminal-punct end, >=5 whitespace-run
    words, no 'javascript'), replace-trick sentence count over the
    KEPT text, and the doc-level lorem/brace/bad-word flags over the
    ORIGINAL text."""
    from annual_report_pdf_parsers_spark.operators.text import (
        C4_BAD_WORDS, C4_TERMINAL_PUNCT, c4_filters,
    )

    def model(d):
        trimmed = [ln.strip(" ") for ln in d.split("\n")]
        kept = [
            t
            for t in trimmed
            if t
            and t[-1] in C4_TERMINAL_PUNCT
            and len(_model_tokens(t)) >= 5
            and "javascript" not in t.lower()
        ]
        ktext = "\n".join(kept)
        ns = sum(ktext.count(c) for c in ".!?")
        low = d.lower()
        bad = any(w in C4_BAD_WORDS for w in _model_tokens(low))
        keep = (
            ns >= 3
            and "lorem ipsum" not in low
            and "{" not in d
            and not bad
        )
        return ktext, len(kept), len(trimmed) - len(kept), ns, keep

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.text,
            r.n_lines_kept,
            r.n_lines_dropped,
            r.n_sentences,
            r.keep,
        )
        for r in c4_filters(df).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == model(d), f"doc {i}: {d!r}"


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_split_assign_matches_python_model(spark, rows):
    """sampling.split_assign vs a hashlib model: 4-hex salted-digest
    prefix vs the cumulative thresholds from split_thresholds — the
    same md5(group || '|' || salt) convention as every sampling op."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.sampling import (
        split_assign, split_thresholds,
    )

    thr = split_thresholds()

    def model(g):
        d4 = hashlib.md5(f"{g}|sp0".encode()).hexdigest()[:4]
        for name, h in thr:
            if d4 < h:
                return name
        return "test"

    df = spark.createDataFrame(rows, "doc_id long, grp long")
    got = {r.doc_id: r.split for r in split_assign(df, "grp").collect()}
    for doc_id, g in rows:
        assert got[doc_id] == model(g), (doc_id, g)


@SETTINGS
@given(
    st.lists(st.text(alphabet="abc", min_size=0, max_size=3),
             min_size=1, max_size=30),
    st.integers(1, 3),
)
def test_soft_dedup_weights_matches_python_model(spark, texts, cap):
    """dedup.soft_dedup_weights vs a Counter model: md5-identity group
    sizes, min(1, cap/n) rounded to 6."""
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.dedup import (
        soft_dedup_weights,
    )

    n_of = Counter(texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_copies, r.weight)
           for r in soft_dedup_weights(df, max_weight_copies=cap).collect()}
    for i, t in enumerate(texts):
        n = n_of[t]
        assert got[i] == (n, round(min(1.0, cap / n), 6)), (i, t, cap)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.text(alphabet="ab \t\n", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 100_000),
    st.integers(1, 6),
)
def test_epoch_plan_matches_python_model(spark, rows, target, cap):
    """sampling.epoch_plan vs a Python model: ws-run token totals,
    sqrt temperature weights, fixed-op-order requested floor, integer
    ceil-div epochs, cap and zero-token branches."""
    import math
    from collections import defaultdict

    from annual_report_pdf_parsers_spark.operators.sampling import (
        epoch_plan,
    )

    toks = defaultdict(int)
    docs = defaultdict(int)
    for s, t in rows:
        toks[s] += len(_model_tokens(t))
        docs[s] += 1
    w = {s: math.floor(math.sqrt(float(n)) * 1e6) for s, n in toks.items()}
    W = sum(w.values())

    def model(s):
        n = toks[s]
        req = (
            math.floor(float(target) * float(w[s]) / float(W))
            if W > 0 else 0
        )
        if n <= 0:
            ep, real = 0, 0
        else:
            ep = min(cap, -(-req // n))
            real = min(req, n * cap)
        return (docs[s], n, w[s], req, ep, real, req > real)

    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (
            r.n_docs, r.n_tokens, r.weight, r.requested_tokens,
            r.epochs, r.realized_tokens, r.capped,
        )
        for r in epoch_plan(
            df, target_total_tokens=target, max_epochs=cap
        ).collect()
    }
    for s in toks:
        assert got[s] == model(s), (s, rows, target, cap)


@SETTINGS
@given(
    st.lists(st.text(alphabet="ab \t", min_size=0, max_size=16),
             min_size=1, max_size=15),
    st.integers(1, 8),
)
def test_vocab_topk_matches_python_model(spark, docs, k):
    """text.vocab_topk vs a Counter model: ws-run token counts, exact
    doc frequencies, (count desc, token asc) order, k cut."""
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import vocab_topk

    occ, dfq = Counter(), Counter()
    for d in docs:
        ts = _model_tokens(d)
        occ.update(ts)
        dfq.update(set(ts))
    want = sorted(occ, key=lambda t: (-occ[t], t))[:k]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = [(r.token, r.n_occurrences, r.n_docs)
           for r in vocab_topk(df, k=k).collect()]
    assert got == [(t, occ[t], dfq[t]) for t in want], (docs, k)


# ---------------------------------------------------------------------------
# tf-idf top-k vs a direct Python model
# ---------------------------------------------------------------------------

_tfidf_word = st.sampled_from(["apple", "Banana", "ch", "d", "éé", "x1"])


@SETTINGS
@given(
    st.lists(
        st.lists(_tfidf_word, min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
)
def test_tfidf_topk_matches_python_model(spark, docs, k):
    """text.tfidf_topk vs the model: lowered tokens under ws-run
    separators, shared-vs-rare idf spread, the rounded-score rank with
    the token tie-break, and empty docs emitting nothing."""
    import math

    from annual_report_pdf_parsers_spark.operators.text import tfidf_topk

    texts = [
        "".join(
            w + _WS_SEPS[(i + j) % len(_WS_SEPS)]
            for j, w in enumerate(ws)
        )
        for i, ws in enumerate(docs)
    ]
    n = len(texts)
    tf: dict = {}
    for i, t in enumerate(texts):
        for w in _model_tokens(t):
            tf[(i, w.lower())] = tf.get((i, w.lower()), 0) + 1
    dfreq: dict = {}
    for _, w in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    per_doc: dict = {}
    for (i, w), c in tf.items():
        s = round(c * (math.log((n + 1.0) / (dfreq[w] + 1.0)) + 1.0), 6)
        per_doc.setdefault(i, []).append((w, c, dfreq[w], s))
    want = {}
    for i, lst in per_doc.items():
        lst.sort(key=lambda t: (-t[3], t[0]))
        for r, (w, c, d, s) in enumerate(lst[:k], 1):
            want[(i, w)] = (c, d, s, r)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.token): (r.tf, r.df_docs, r.score, r.rank)
        for r in tfidf_topk(df, k=k).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# DSIR importance resampling vs hashlib + math model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.lists(_tfidf_word, min_size=0, max_size=5),
        min_size=1,
        max_size=10,
    ),
    st.integers(1, 6),
)
def test_dsir_sample_matches_python_model(spark, docs, n):
    """sampling.dsir_sample vs the model: the ordered feature fold over
    unigrams-then-bigrams, the salted-digest uniform, the Gumbel key,
    and the (key desc, id asc) top-n boundary — including empty docs
    competing on pure noise."""
    import hashlib
    import math

    from annual_report_pdf_parsers_spark.operators.sampling import (
        DSIR_LOG_RATIOS,
        dsir_sample,
    )

    texts = [
        "".join(
            w + _WS_SEPS[(i + j) % len(_WS_SEPS)]
            for j, w in enumerate(ws)
        )
        for i, ws in enumerate(docs)
    ]
    want = []
    for i, t in enumerate(texts):
        tk = [w.lower() for w in _model_tokens(t)]
        feats = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        lw = 0.0
        for f_ in feats:
            lw += DSIR_LOG_RATIOS[
                hashlib.md5(f_.encode()).hexdigest()[:2]
            ]
        u = (
            int(hashlib.md5(f"{i}|dsir0".encode()).hexdigest()[:4], 16)
            + 1.0
        ) / 65537.0
        key = round(lw - math.log(-math.log(u)), 6)
        want.append((i, len(feats), round(lw, 6), key))
    want.sort(key=lambda r: (-r[3], r[0]))
    want = want[:n]

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = [
        (r.doc_id, r.n_features, r.log_weight, r.sample_key)
        for r in dsir_sample(df, n=n).collect()
    ]
    assert sorted(got, key=lambda r: (-r[3], r[0])) == want


# ---------------------------------------------------------------------------
# bigram LM with backoff vs a pure-Python model
# ---------------------------------------------------------------------------

_blm_word = st.sampled_from(
    ["of", "the", "to", "be", "it", "is", "unseen", "Zq"]
)


@SETTINGS
@given(st.lists(_blm_word, min_size=0, max_size=10))
def test_bigram_logprob_matches_python_model(spark, words):
    """text.bigram_logprob vs the model: the first-term + left-fold
    order, bigram hits vs backoff arms, lowering, ws-run separators."""
    from annual_report_pdf_parsers_spark.operators.text import (
        BIGRAM_BACKOFF,
        BIGRAM_LOGPROBS,
        UNIGRAM_LOGPROBS,
        UNKNOWN_LOGPROB,
        bigram_logprob,
    )

    text = "".join(
        w + _WS_SEPS[j % len(_WS_SEPS)] for j, w in enumerate(words)
    )
    tk = [w.lower() for w in _model_tokens(text)]
    uni = lambda w: UNIGRAM_LOGPROBS.get(w, UNKNOWN_LOGPROB)  # noqa: E731
    hits = 0
    if tk:
        total = uni(tk[0])
        rest = 0.0
        for a, b in zip(tk, tk[1:]):
            bg = f"{a} {b}"
            if bg in BIGRAM_LOGPROBS:
                rest += BIGRAM_LOGPROBS[bg]
                hits += 1
            else:
                rest += BIGRAM_BACKOFF + uni(b)
        want = (len(tk), hits, round((total + rest) / len(tk), 6))
    else:
        want = (0, 0, 0.0)

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = bigram_logprob(df).collect()[0]
    assert (r.n_tokens, r.n_bigram_hits, r.avg_logprob) == want


# ---------------------------------------------------------------------------
# winnowing fingerprints vs a from-scratch Python model
# ---------------------------------------------------------------------------


def _winnow_model(texts, k, w):
    import hashlib

    fps = {}
    for i, t in enumerate(texts):
        tk = _model_tokens(t)
        if len(tk) < k:
            fps[i] = set()
            continue
        wins = [
            hashlib.md5(
                " ".join(tk[p : p + k]).encode()
            ).hexdigest()
            + str(10**9 - (p + 1)).zfill(10)
            for p in range(len(tk) - k + 1)
        ]
        sel = {
            min(wins[j : j + w])
            for j in range(max(len(wins) - w + 1, 1))
        }
        fps[i] = sel
    # multiset per doc after distinct is a set; shared = hash prefix
    # seen under ANY other doc
    by_hash = {}
    for i, s in fps.items():
        for key in s:
            by_hash.setdefault(key[:32], set()).add(i)
    out = {}
    for i, s in fps.items():
        nf = len(s)
        ns = sum(1 for key in s if len(by_hash[key[:32]]) > 1)
        out[i] = (nf, ns, round(ns / nf, 6) if nf else 0.0)
    return out


@SETTINGS
@given(
    st.lists(
        st.lists(_tfidf_word, min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
    st.integers(1, 4),
)
def test_winnow_stats_matches_python_model(spark, docs, k, w):
    """dedup.winnow_stats vs the model: the key encoding, the
    rightmost-min tie rule, end-clipped selection windows, distinct
    fingerprints, and the cross-doc share fractions — under ws-run
    separators and repeated tokens (hash ties DO occur with this tiny
    vocabulary)."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        winnow_stats,
    )

    texts = [
        "".join(
            t + _WS_SEPS[(i + j) % len(_WS_SEPS)]
            for j, t in enumerate(ws)
        )
        for i, ws in enumerate(docs)
    ]
    want = _winnow_model(texts, k, w)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_fingerprints, r.n_shared_fp, r.shared_frac)
        for r in winnow_stats(df, k=k, w=w).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# token drift vs a Counter-based model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.lists(_tfidf_word, min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(_tfidf_word, min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 20),
)
def test_token_drift_matches_python_model(spark, ref_docs, new_docs, k):
    """text.token_drift_topk vs the model: add-one ratios, the
    min_total floor, absent-side zeros, and the rounded (drift desc,
    token asc) boundary."""
    import math
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import (
        token_drift_topk,
    )

    def mk(docs):
        return [
            "".join(
                w + _WS_SEPS[(i + j) % len(_WS_SEPS)]
                for j, w in enumerate(ws)
            )
            for i, ws in enumerate(docs)
        ]

    rt, nt = mk(ref_docs), mk(new_docs)
    cr = Counter(w.lower() for t in rt for w in _model_tokens(t))
    cn = Counter(w.lower() for t in nt for w in _model_tokens(t))
    t_ref, t_new = sum(cr.values()), sum(cn.values())
    want = []
    for tok in set(cr) | set(cn):
        a, b = cr.get(tok, 0), cn.get(tok, 0)
        if a + b < 3:
            continue
        lr = math.log(
            ((b + 1.0) / (t_new + 1.0)) / ((a + 1.0) / (t_ref + 1.0))
        )
        want.append((tok, a, b, round(lr, 6), round(abs(lr), 6)))
    want.sort(key=lambda r: (-r[4], r[0]))
    want = want[:k]

    ref = spark.createDataFrame([(t,) for t in rt], "text string")
    new = spark.createDataFrame([(t,) for t in nt], "text string")
    got = [
        (r.token, r.n_ref, r.n_new, r.log_ratio, r.drift)
        for r in token_drift_topk(ref, new, k=k).collect()
    ]
    assert sorted(got, key=lambda r: (-r[4], r[0])) == want


# ---------------------------------------------------------------------------
# binary chunk dedup vs a hashlib model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.binary(min_size=0, max_size=120),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 40),
)
def test_chunk_dedup_matches_python_model(spark, blobs, chunk):
    """multimodal.chunk_dedup_stats vs the model: hex-grid chunking ==
    byte-grid chunking (per-byte bijection), unpadded tails, cross-doc
    sharing, zero-length blobs."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        chunk_dedup_stats,
    )

    per_doc = {}
    for i, b in enumerate(blobs):
        hs = [
            hashlib.md5(
                b[p : p + chunk].hex().upper().encode()
            ).hexdigest()
            for p in range(0, len(b), chunk)
        ]
        per_doc[i] = hs
    owners: dict = {}
    for i, hs in per_doc.items():
        for h in hs:
            owners.setdefault(h, set()).add(i)
    want = {}
    for i, (b, hs) in enumerate(zip(blobs, per_doc.values())):
        ns = sum(1 for h in hs if len(owners[h]) > 1)
        want[i] = (
            len(b),
            len(hs),
            ns,
            round(ns / len(hs), 6) if hs else 0.0,
        )

    df = spark.createDataFrame(
        list(enumerate(blobs)), "doc_id long, blob binary"
    )
    got = {
        r.doc_id: (r.n_bytes, r.n_chunks, r.n_shared_chunks,
                   r.shared_frac)
        for r in chunk_dedup_stats(df, chunk_bytes=chunk).collect()
    }
    assert got == want


@SETTINGS
@given(
    st.lists(_mldoc, min_size=1, max_size=8),
    st.lists(_mldoc, min_size=1, max_size=8),
    st.integers(2, 64),
)
def test_bloom_dedup_flags_matches_python_model(spark, refs, probes, m):
    """dedup.bloom_dedup_flags vs a direct hashlib model: salted-md5
    positions mod m, paragraph = space-trimmed '\\n\\n' part, flagged
    iff ALL k positions set by the reference side — false positives
    (frequent at tiny m) must match EXACTLY, that is the Bloom
    contract the oracle also reproduces."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.dedup import (
        bloom_dedup_flags,
    )

    k = 3

    def positions(t):
        return [
            int(
                hashlib.md5(f"bf{i}:{t}".encode()).hexdigest()[:8], 16
            )
            % m
            for i in range(1, k + 1)
        ]

    bits = set()
    for d in refs:
        for p in d.split("\n\n"):
            t = p.strip(" ")
            if t:
                bits.update(positions(t))

    def model(d):
        ps = [p.strip(" ") for p in d.split("\n\n")]
        ps = [p for p in ps if p]
        nf = sum(
            1 for t in ps if all(b in bits for b in positions(t))
        )
        frac = round(nf / len(ps), 6) if ps else 0.0
        return (
            len(ps),
            nf,
            frac,
            bool(ps) and frac >= 0.5,
        )

    ref_df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(refs)], "doc_id long, text string"
    )
    probe_df = spark.createDataFrame(
        [(1000 + i, d) for i, d in enumerate(probes)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_paras, r.n_flagged, r.flag_frac, r.drop)
        for r in bloom_dedup_flags(ref_df, probe_df, m=m).collect()
    }
    for i, d in enumerate(probes):
        assert got[1000 + i] == model(d), f"probe {i}: {d!r}"


@SETTINGS
@given(
    st.integers(3, 12),
    st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
             min_size=0, max_size=12),
    st.lists(st.sampled_from([0.0, 0.25, 0.5, -1.5, 2.0]),
             min_size=12, max_size=12),
)
def test_cluster_keep_best_matches_python_model(spark, n, edges, scores):
    """dedup.cluster_keep_best vs a union-find + argmax model: highest
    score per component wins, ties -> smallest doc_id, singletons keep
    themselves, cluster_id = min member id."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        cluster_keep_best,
    )

    ids = list(range(n))
    edges = [(a % n, b % n) for a, b in edges if a % n != b % n]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    want = {}
    for members in comp.values():
        cid = min(members)
        best = min(members, key=lambda i: (-scores[i], i))
        for i in members:
            want[i] = (cid, scores[i], i == best)

    sdf = spark.createDataFrame(
        [(i, scores[i]) for i in ids], "doc_id long, score double"
    )
    pdf = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        pdf = pdf.filter("id_a <> id_b")
    got = {
        r.doc_id: (r.cluster_id, r.score, r.keep)
        for r in cluster_keep_best(sdf, pdf, "score").collect()
    }
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "The", "THE", "cat", "sat", "zq"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=14,
    )
)
def test_lexical_diversity_matches_python_model(spark, docs):
    """text.lexical_diversity vs a Counter model: lowered type
    identity, hapax = count-1 types, top = max count, NULLs on zero
    tokens.  Mixed-case inputs probe the fold; the tab/NBSP joiners
    probe the ws-run split."""
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import (
        lexical_diversity,
    )

    joiners = [" ", "\t", " ", " \n "]

    def join(ws):
        return "".join(
            w + joiners[i % len(joiners)] for i, w in enumerate(ws)
        )

    def model(ws):
        c = Counter(w.lower() for w in ws)
        n = sum(c.values())
        if n == 0:
            return (0, 0, None, None, None)
        ty = len(c)
        hx = sum(1 for v in c.values() if v == 1)
        tp = max(c.values())
        return (
            n, ty, round(ty / n, 6), round(hx / ty, 6),
            round(tp / n, 6),
        )

    df = spark.createDataFrame(
        [(i, join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_tokens, r.n_types, r.ttr, r.hapax_frac, r.top_frac
        )
        for r in lexical_diversity(df).collect()
    }
    for i, ws in enumerate(docs):
        assert got[i] == model(ws), f"doc {i}: {ws!r}"


@SETTINGS
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "b", "ccc", "dd"]),
            min_size=0, max_size=15,
        ),
        min_size=1, max_size=10,
    ),
    st.integers(1, 5),
    st.integers(1, 5),
)
def test_chunk_windows_matches_python_model(spark, docs, size, stride):
    """text.chunk_windows vs a direct slicing model: stride-stepped
    starts while start < n, short tails, zero-token docs emit no
    rows.  stride is clamped to size (stride > size raises by
    contract — tested separately)."""
    from annual_report_pdf_parsers_spark.operators.text import (
        chunk_windows,
    )

    stride = min(stride, size)

    def model(ws):
        out = []
        for cid, st_ in enumerate(range(0, len(ws), stride)):
            w = ws[st_:st_ + size]
            out.append((cid, st_, len(w), " ".join(w)))
        return out

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {}
    for r in chunk_windows(df, size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text)
        )
    for i, ws in enumerate(docs):
        assert sorted(got.get(i, [])) == model(ws), (
            f"doc {i}: {ws!r} size={size} stride={stride}"
        )


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet="aB9 .\t\x01\x07пи日�éñ",
            min_size=0, max_size=30,
        ),
        min_size=1, max_size=20,
    )
)
def test_script_mix_matches_python_model(spark, docs):
    """text.script_mix_stats vs a direct codepoint model over an
    adversarial alphabet (C0 controls, Cyrillic/CJK, accents, U+FFFD
    itself)."""
    from annual_report_pdf_parsers_spark.operators.text import (
        script_mix_stats,
    )

    ctrl = set(range(0, 9)) | {0x0B, 0x0C} | set(range(0x0E, 0x20))

    def model(t):
        n = len(t)
        al = sum(1 for c in t if c.isascii() and c.isalpha())
        na = sum(1 for c in t if ord(c) > 0x7F)
        rp = t.count("�")
        ct = sum(1 for c in t if ord(c) in ctrl)
        frac = round(na / n, 6) if n else None
        suspect = n > 0 and (
            rp > 0 or ct > 0 or (frac or 0.0) > 0.3
        )
        return (n, al, na, rp, ct, frac, suspect)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_chars, r.n_ascii_letters, r.n_nonascii,
            r.n_replacement, r.n_control, r.nonascii_frac, r.suspect,
        )
        for r in script_mix_stats(df).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == model(t), f"doc {i}: {t!r}"


_html_bits = st.lists(
    st.sampled_from(
        [
            "<p>a good long paragraph full of ordinary visible"
            " words that comfortably clears the bar.</p>",
            "<div><a href='/x'>linky link link text</a></div>",
            "<p>tiny</p>",
            "<script>var q = 'no';</script>",
            "<!-- hidden -->",
            "plain interstitial text outside any block tag here",
            "<li>item &amp; item</li>",
            "<br>",
        ]
    ),
    min_size=0,
    max_size=6,
)


@SETTINGS
@given(st.lists(_html_bits, min_size=1, max_size=8))
def test_html_main_content_matches_python_model(spark, docs):
    """html.main_content vs a Python re model running the identical
    strip -> split -> score -> reconstruct chain (the same regexes;
    Python re agrees with Java/RE2 on every construct used)."""
    import re

    from annual_report_pdf_parsers_spark.operators.html import (
        ANCHOR_TEXT_RE,
        BLOCK_SPLIT_RE,
        COMMENT_RE,
        HTML_ENTITIES,
        SCRIPT_RE,
        STYLE_RE,
        TAG_RE,
        WS_RUN_RE,
        main_content,
    )

    def btxt(x):
        t = re.sub(TAG_RE, " ", x)
        for ent, ch in HTML_ENTITIES:
            t = t.replace(ent, ch)
        return re.sub(WS_RUN_RE, " ", t).strip(" ")

    def model(h):
        t = re.sub(SCRIPT_RE, " ", h)
        t = re.sub(STYLE_RE, " ", t)
        t = re.sub(COMMENT_RE, " ", t)
        out, nb, ng, tl, ta = [], 0, 0, 0, 0
        for raw in re.split(BLOCK_SPLIT_RE, t):
            txt = btxt(raw)
            if txt == "":
                continue
            alen = sum(
                len(btxt(a))
                for a in re.findall(ANCHOR_TEXT_RE, raw)
            )
            nb += 1
            tl += len(txt)
            ta += alen
            if len(txt) >= 40 and alen <= len(txt) * 0.3:
                ng += 1
                out.append(txt)
        frac = round(ta / tl, 6) if tl > 0 else None
        return ("\n\n".join(out), nb, ng, frac)

    df = spark.createDataFrame(
        [(i, "".join(bits)) for i, bits in enumerate(docs)],
        "doc_id long, html string",
    )
    got = {
        r.doc_id: (r.main_text, r.n_blocks, r.n_good, r.link_frac)
        for r in main_content(df).collect()
    }
    for i, bits in enumerate(docs):
        assert got[i] == model("".join(bits)), f"doc {i}: {bits!r}"


@SETTINGS
@given(
    st.lists(
        st.text(
            alphabet="ab \u00c3\u00e9\u00c2\u00ab\u00b0\u00e2"
            "\u20ac\u2122\u0153\u201c\u201d\u2013\u009d"
            "\u00ac\u00a2\u201a\u201e\u00a6x",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fix_mojibake_matches_python_model(spark, docs):
    """encoding.fix_mojibake vs a direct sequential str.replace model
    over an alphabet of pattern fragments, replacement characters, and
    the sloppy-cp1252 control char (U+009D) -- partial/overlapping
    corrupt sequences exercise the documented order-dependence; counts
    are non-overlapping left-to-right in both (no pattern has a proper
    prefix==suffix, so the length-trick count and str.count agree)."""
    from annual_report_pdf_parsers_spark.operators.encoding import (
        MOJIBAKE_PAIRS,
        fix_mojibake,
    )

    def model(t):
        n = 0
        for pat, rep in MOJIBAKE_PAIRS:
            n += t.count(pat)
            t = t.replace(pat, rep)
        return t, n

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_fixes)
        for r in fix_mojibake(df).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == model(t), f"doc {i}: {t!r}"


# ---------------------------------------------------------------------------
# sketch.hll_distinct vs a from-scratch Python HLL model
# ---------------------------------------------------------------------------

_hll_value = st.one_of(
    st.none(),
    st.text(
        alphabet="abβ☃01 |:'\"\\\n", min_size=0, max_size=6
    ),
    st.integers(min_value=-5, max_value=10_000),
)


@SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), _hll_value),
        min_size=1,
        max_size=60,
    )
)
def test_hll_distinct_matches_python_model(spark, rows):
    """Register index, rank, harmonic DECIMAL sum, raw estimate, and
    the linear-counting branch all reproduce a hashlib+math model
    exactly (round-4) on adversarial values: unicode, quotes,
    backslashes, newlines, NULLs, negative ints (cast to string the
    way the engine casts)."""
    import hashlib
    import math

    from annual_report_pdf_parsers_spark.operators.sketch import (
        EST_NUMERATOR,
        LC_THRESHOLD,
        M_REGISTERS,
        hll_distinct,
    )

    def model(values):
        regs = {}
        vals = [str(v) for v in values if v is not None]
        for v in vals:
            hx = hashlib.md5(v.encode()).hexdigest()
            reg, body = hx[:2], hx[2:18]
            bits = bin(int(body, 16))[2:].zfill(64)
            lz = 64 - len(bits.lstrip("0"))
            regs[reg] = max(regs.get(reg, 0), lz + 1)
        used = len(regs)
        z = sum(2 ** (65 - r) for r in regs.values()) + (
            M_REGISTERS - used
        ) * 2**65
        raw = round(float(EST_NUMERATOR) / float(z), 4)
        zeros = M_REGISTERS - used
        if raw <= LC_THRESHOLD and zeros > 0:
            est = round(
                float(M_REGISTERS)
                * math.log(float(M_REGISTERS) / float(zeros)),
                4,
            )
        else:
            est = raw
        return used, raw, est, len(set(vals)), len(vals)

    df = spark.createDataFrame(
        [(g, str(v) if v is not None else None) for g, v in rows],
        "grp string, v string",
    )
    got = {
        r["grp"]: r for r in hll_distinct(df, "v", "grp").collect()
    }
    by_group: dict[str, list] = {}
    for g, v in rows:
        by_group.setdefault(g, []).append(v)
    for g, vals in by_group.items():
        used, raw, est, exact, n = model(vals)
        if n == 0:
            assert g not in got  # only-NULL group disappears
            continue
        r = got[g]
        assert (
            r["used_registers"],
            r["raw_estimate"],
            r["hll_estimate"],
            r["exact_distinct"],
            r["n_rows"],
        ) == (used, raw, est, exact, n), g


# ---------------------------------------------------------------------------
# urls.with_host_safety vs a pure-Python classifier model
# ---------------------------------------------------------------------------

_hs_host = st.one_of(
    # dotted quads incl. invalid octets and boundary values
    st.tuples(
        st.sampled_from([0, 8, 10, 127, 169, 172, 192, 255, 256, 300]),
        st.sampled_from([0, 16, 31, 32, 168, 254, 255, 999]),
        st.integers(min_value=0, max_value=260),
        st.integers(min_value=0, max_value=260),
    ).map(lambda t: ".".join(str(x) for x in t)),
    st.sampled_from(
        [
            "localhost", "a.localhost", "x.onion", "p.local",
            "intranet", "example.org", "www.shop.example.com",
            # trailing-dot FQDN forms (the ADVICE r05 SSRF bypass)
            "localhost.", "printer.local.", "x.onion.", "example.org.",
        ]
    ),
)


@SETTINGS
@given(st.lists(_hs_host, min_size=1, max_size=40))
def test_host_safety_matches_python_model(spark, hosts):
    """The priority classification vs an independent model: quad
    validity (every octet <= 255, mirroring try_parse_url's parser
    rejection), range membership, suffix rules, bare names."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        with_host_safety,
    )

    def model(h):
        if h.endswith("."):
            hh = h[:-1]
            qparts = hh.split(".")
            if len(qparts) == 4 and all(
                p.isdigit() and len(p) <= 3 for p in qparts
            ):
                # try_parse_url rejects dotted quads with a trailing
                # dot at the parser — the url lands in no_host
                return ("no_host", False)
            # root-anchored FQDN: one trailing dot strips before
            # classification (the ADVICE r05 fail-closed rule)
            h = hh
        h = h.removeprefix("www.")
        parts = h.split(".")
        quad = len(parts) == 4 and all(
            p.isdigit() and len(p) <= 3 for p in parts
        )
        if quad and any(int(p) > 255 for p in parts):
            return ("no_host", False)  # parser rejects the url
        if h == "localhost" or h.endswith(".localhost"):
            return ("loopback", False)
        if quad:
            o = [int(p) for p in parts]
            if o[0] == 127:
                return ("loopback", False)
            if o[0] == 0:  # "this network" connects to localhost
                return ("private_ip", False)
            if o[0] == 10 or (o[0] == 192 and o[1] == 168) or (
                o[0] == 172 and 16 <= o[1] <= 31
            ):
                return ("private_ip", False)
            if o[0] == 169 and o[1] == 254:
                return ("link_local", False)
            return ("public_ip", True)
        if h.endswith(".onion"):
            return ("onion", False)
        if h.endswith(".local"):
            return ("mdns_local", False)
        if "." not in h:
            return ("bare", False)
        return ("name", True)

    df = spark.createDataFrame(
        [(i, f"http://{h}/p") for i, h in enumerate(hosts)],
        "i long, url string",
    )
    got = {
        r["i"]: (r["host_class"], r["fetch_ok"])
        for r in with_host_safety(df).collect()
    }
    for i, h in enumerate(hosts):
        assert got[i] == model(h), h


# ---------------------------------------------------------------------------
# temporal.bot_regularity vs an integer-gap model
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_bot_regularity_matches_python_model(spark, rows):
    """Gap extraction, min/max/sum, and the cross-multiplied spread
    rule vs a sorted-diff model -- duplicate timestamps, single-event
    users, and arbitrary arrival orders included."""
    from datetime import datetime, timedelta

    from annual_report_pdf_parsers_spark.operators.temporal import (
        bot_regularity,
    )

    base = datetime(2024, 1, 1)
    data = [
        (i, u, base + timedelta(seconds=s))
        for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(i, t, u) for i, u, t in data],
        "event_id long, ts timestamp_ntz, user_id string",
    )
    got = {
        r["user_id"]: (
            r["n_events"],
            r["n_gaps"],
            r["min_gap_us"],
            r["max_gap_us"],
            r["sum_gap_us"],
            r["is_regular"],
            r["is_bot"],
        )
        for r in bot_regularity(
            df, user_col="user_id", min_events=5
        ).collect()
    }
    per_user: dict[str, list[int]] = {}
    for _, u, t in data:
        per_user.setdefault(u, []).append(
            int((t - base).total_seconds()) * 1_000_000
        )
    for u, ts in per_user.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if gaps:
            mn, mx, sm = min(gaps), max(gaps), sum(gaps)
            reg = (mx - mn) * 10 * len(gaps) < sm
        else:
            mn = mx = sm = None
            reg = False
        exp = (
            len(ts),
            len(gaps),
            mn,
            mx,
            sm,
            reg,
            len(ts) >= 5 and reg,
        )
        assert got[u] == exp, (u, ts)


# ---------------------------------------------------------------------------
# text.bpe_pair_counts vs a Counter model on unicode-bearing words
# ---------------------------------------------------------------------------

_bpe_word = st.text(
    alphabet="abc\u00df\u6f22\u00e9\u0085", min_size=1, max_size=5
)


@SETTINGS
@given(
    st.lists(
        st.lists(_bpe_word, min_size=0, max_size=6),
        min_size=1,
        max_size=20,
    )
)
def test_bpe_pair_counts_matches_python_model(spark, docs):
    """Per-code-point pair counting vs a Counter model on words
    carrying multibyte letters AND the U+0085 NEL line terminator
    (the (?s) review fix) -- weights, markers, and the deterministic
    top-k cut all reproduce."""
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import (
        bpe_pair_counts,
    )

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    wc: Counter = Counter()
    for ws in docs:
        for w in ws:
            # mirror the engine's whitespace-run split: the fixture
            # joins with single spaces, so tokens are the non-empty
            # space-split pieces (NEL is NOT whitespace to the engine)
            for tk in w.split(" "):
                if tk:
                    wc[tk] += 1
    pc: Counter = Counter()
    for w, n in wc.items():
        ch = list(w) + ["</w>"]
        for i in range(len(ch) - 1):
            pc[f"{ch[i]} {ch[i + 1]}"] += n
    exp = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_pair_counts(df, k=30).collect()
    ]
    assert got == exp
