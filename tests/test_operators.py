"""Unit tests for operators beyond the oracle-parity suite: lineage/resume,
streaming wrapper, multimodal plumbing, skew salting, numeric edge cases."""

import datetime
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from annual_report_pdf_parsers_spark.functions.numeric import to_double
from annual_report_pdf_parsers_spark.operators.multimodal import (
    extract_features,
    sample_frames,
)
from annual_report_pdf_parsers_spark.sources.pages import (
    pending_pages,
    read_holdings,
    run_with_lineage,
    salt_hot_hosts,
)
from annual_report_pdf_parsers_spark.sources.synthetic import (
    make_corpus,
    manifest_to_spark,
    pages_to_spark,
)


def test_numeric_edge_cases(spark):
    rows = [
        ("1.234,56", "fr", 1234.56),
        ("1 234,56", "fr", 1234.56),          # thin-space thousands
        ("(1.234,56)", "fr", -1234.56),
        ("1,234.56", "en", 1234.56),
        ("(1,234.56)", "en", -1234.56),
        ("12,34%", "fr", 12.34),
        ("–", "fr", 0.0),                # en-dash F5+F6
        ("-", "en", 0.0),
        ("nan", "en", 0.0),
        ("", "fr", 0.0),
        ("abc", "en", None),                   # P6: not numeric
        ("12.34.56", "en", None),
    ]
    df = spark.createDataFrame(
        [(s, loc) for s, loc, _ in rows], "s string, loc string"
    )
    got = [
        r.v
        for r in df.select(
            to_double(F.col("s"), F.col("loc")).alias("v")
        ).collect()
    ]
    for (s, loc, want), g in zip(rows, got):
        assert g == want or (g is None and want is None), (s, loc, want, g)


def test_lineage_resume(spark, tmp_path):
    out = str(tmp_path / "run")
    pages_pdf, manifest_pdf, _ = make_corpus(12, seed=5)
    pages = pages_to_spark(spark, pages_pdf)
    manifest = manifest_to_spark(spark, manifest_pdf)

    from annual_report_pdf_parsers_spark.streaming.incremental import (
        incremental_run,
    )

    m1 = incremental_run(spark, pages, manifest, out, run_id="r1")
    assert m1["docs"] == 12
    # second run: everything committed, nothing pending
    m2 = incremental_run(spark, pages, manifest, out, run_id="r2")
    assert m2["docs"] == 0
    # metrics table exists with provider counts
    met = spark.read.parquet(os.path.join(out, "metrics"))
    assert met.filter(F.col("run_id") == "r1").count() > 0


def test_pending_pages_partial(spark, tmp_path):
    out = str(tmp_path / "run2")
    pages_pdf, manifest_pdf, _ = make_corpus(8, seed=6)
    pages = pages_to_spark(spark, pages_pdf)
    first = pages.limit(3)
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline

    res = run_pipeline(first, manifest_to_spark(spark, manifest_pdf))
    run_with_lineage(first, res, out, "r1")
    left = pending_pages(spark, pages, out)
    assert left.count() == 5


def test_lineage_crash_window_no_duplicates(spark, tmp_path):
    """A crash between the holdings write and the lineage commit must not
    yield duplicate output after resume: the orphan run directory's urls
    stay pending, and read_holdings only surfaces lineage-committed rows."""
    out = str(tmp_path / "crash")
    pages_pdf, manifest_pdf, _ = make_corpus(6, seed=13)
    pages = pages_to_spark(spark, pages_pdf)
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline

    res = run_pipeline(pages, manifest_to_spark(spark, manifest_pdf))
    n = res.count()
    # simulate the crash: holdings written, lineage NOT committed
    res.write.mode("overwrite").parquet(
        os.path.join(out, "holdings", "run_id=r0")
    )
    # resume still sees every url as pending (orphan run is uncommitted)
    assert pending_pages(spark, pages, out).count() == 6
    # the re-run commits normally
    run_with_lineage(pages, res, out, "r1")
    # raw storage holds both copies, committed view exactly one
    raw = spark.read.parquet(os.path.join(out, "holdings"))
    assert raw.count() == 2 * n
    assert read_holdings(spark, out).count() == n


def test_csv_sink_byte_parity(spark, tmp_path):
    """S8: write_csv_contract must emit byte-identical CSV lines to the
    reference's pandas to_csv serialization of the same rows."""
    import io

    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline
    from annual_report_pdf_parsers_spark.sources.pages import (
        read_csv_contract,
        write_csv_contract,
    )
    from annual_report_pdf_parsers_spark.config import OUTPUT_COLUMNS

    out = str(tmp_path / "csv_sink")
    pages_pdf, manifest_pdf, expected = make_corpus(10, seed=21)
    res = run_pipeline(
        pages_to_spark(spark, pages_pdf),
        manifest_to_spark(spark, manifest_pdf),
    )
    write_csv_contract(res, out)
    header, lines = read_csv_contract(spark, out)
    assert header == ",".join(OUTPUT_COLUMNS)
    got = sorted(r[0] for r in lines.collect())
    buf = io.StringIO()
    expected[list(OUTPUT_COLUMNS)].to_csv(buf, index=False, header=False)
    want = sorted(buf.getvalue().splitlines())
    assert got == want


def test_csv_sink_embedded_newlines(spark, tmp_path):
    """ADVICE r02: a string field containing \\n / \\u2028 / \\f (e.g. a
    manifest-sourced fund_name_website that never passed F18) must not be
    silently broken into malformed rows — the reassembled file must be
    byte-identical to pandas to_csv of the same records."""
    import io

    from annual_report_pdf_parsers_spark.config import OUTPUT_COLUMNS
    from annual_report_pdf_parsers_spark.sources.pages import (
        write_csv_contract,
    )

    rows = [
        ("P1", "fund a", "WEB\nLINE2", "LU1", "hold", 1.5, "EUR", 2.5, "u1"),
        ("P1", "fund b", "WEB X", "LU2", "hold2", 1.0, "USD", 3.0, "u2"),
        ("P1", "fund c", "WEB\fY", "LU3", "hold3", 2.0, "GBP", 4.0, "u3"),
    ]
    schema = (
        "fund_provider string, fund_name_report string, "
        "fund_name_website string, isin string, holding_name string, "
        "market_value double, currency string, net_assets double, "
        "pdf_url string"
    )
    out = str(tmp_path / "csv_nl")
    df = spark.createDataFrame(rows, schema).coalesce(1)
    write_csv_contract(df, out)
    import glob

    parts = sorted(glob.glob(os.path.join(out, "data", "part-*")))
    got = b"".join(open(p, "rb").read() for p in parts).decode("utf-8")
    buf = io.StringIO()
    pd.DataFrame(rows, columns=OUTPUT_COLUMNS).to_csv(
        buf, index=False, header=False, lineterminator="\n"
    )
    assert got == buf.getvalue()


def test_read_holdings_no_lineage_broadcast(spark, tmp_path):
    """The lineage table grows with the corpus — the committed-holdings
    semi-join must not broadcast it (VERDICT r02: driver OOM at 10^12
    urls).  Pinned structurally: no BroadcastExchange/BroadcastHashJoin
    anywhere in the read_holdings plan."""
    out = str(tmp_path / "nobc")
    pages_pdf, manifest_pdf, _ = make_corpus(6, seed=17)
    pages = pages_to_spark(spark, pages_pdf)
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline

    res = run_pipeline(pages, manifest_to_spark(spark, manifest_pdf))
    run_with_lineage(pages, res, out, "r1")
    plan = (
        read_holdings(spark, out)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan


def test_metrics_orphans_filtered(spark, tmp_path):
    """ADVICE r02: metrics rows from an uncommitted (crashed) run must not
    surface — read_metrics filters to lineage-committed run_ids."""
    from annual_report_pdf_parsers_spark.sources.pages import read_metrics

    out = str(tmp_path / "orphan_met")
    pages_pdf, manifest_pdf, _ = make_corpus(4, seed=19)
    pages = pages_to_spark(spark, pages_pdf)
    from annual_report_pdf_parsers_spark.plans.pipeline import run_pipeline

    res = run_pipeline(pages, manifest_to_spark(spark, manifest_pdf))
    run_with_lineage(pages, res, out, "r1")
    # orphan metrics from a run lineage never committed (older engine /
    # partial write): must be invisible in the committed view
    orphan = spark.createDataFrame(
        [("GHOST", 9, 9, "r_crashed")],
        "fund_provider string, n_rows long, n_docs long, run_id string",
    )
    orphan.write.mode("append").parquet(os.path.join(out, "metrics"))
    met = read_metrics(spark, out)
    assert met.filter(F.col("run_id") == "r_crashed").count() == 0
    assert met.filter(F.col("run_id") == "r1").count() > 0


def test_streaming_available_now(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_in")
    out = str(tmp_path / "stream_out")
    pages_pdf, manifest_pdf, expected = make_corpus(10, seed=8)
    pages_to_spark(spark, pages_pdf).write.parquet(pages_dir)
    from annual_report_pdf_parsers_spark.streaming.incremental import (
        streaming_pipeline,
    )

    q = streaming_pipeline(
        spark, pages_dir, manifest_to_spark(spark, manifest_pdf), out
    )
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(out, "holdings"))
    assert got.count() == len(expected)
    # restart: checkpoint prevents reprocessing
    q2 = streaming_pipeline(
        spark, pages_dir, manifest_to_spark(spark, manifest_pdf), out
    )
    q2.awaitTermination(60)
    assert (
        spark.read.parquet(os.path.join(out, "holdings")).count()
        == len(expected)
    )


def _has_iceberg(spark) -> bool:
    """True iff the Iceberg Spark runtime is on this JVM's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_table_roundtrip(spark, tmp_path):
    """Real Iceberg integration, exercised wherever runtime jars exist
    (VERDICT r02 item #9; this container ships none, so the test SKIPS
    here — the claim stays checkable the day jars appear): create the
    production bucket(url) table from iceberg_pages_ddl, append the
    synthetic corpus, verify a committed snapshot exists, read it back
    through read_pages' table-name path, and confirm a second append
    creates a second snapshot (the commit boundary lineage/resume keys
    on)."""
    if not _has_iceberg(spark):
        pytest.skip("no Iceberg runtime jars on the classpath")
    from annual_report_pdf_parsers_spark.sources.pages import (
        iceberg_pages_ddl,
        read_pages,
    )

    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.cc")
    spark.sql(iceberg_pages_ddl("ice.cc.pages"))
    pages_pdf, _, _ = make_corpus(6, seed=3)
    pages_to_spark(spark, pages_pdf).writeTo("ice.cc.pages").append()
    assert read_pages(spark, "ice.cc.pages").count() == 6
    snaps1 = spark.sql(
        "SELECT snapshot_id FROM ice.cc.pages.snapshots"
    ).collect()
    assert len(snaps1) == 1
    pages_to_spark(spark, pages_pdf).writeTo("ice.cc.pages").append()
    snaps2 = spark.sql(
        "SELECT snapshot_id FROM ice.cc.pages.snapshots"
    ).collect()
    assert len(snaps2) == 2


def test_salt_hot_hosts(spark):
    pages_pdf, _, _ = make_corpus(30, seed=9)
    pages = pages_to_spark(spark, pages_pdf)
    salted = salt_hot_hosts(pages, n_partitions=8, salt=4)
    # the hot host (~30% of docs) must spread over >1 partition
    dist = (
        salted.withColumn("pid", F.spark_partition_id())
        .filter(F.col("url").contains("hot.example.com"))
        .select("pid")
        .distinct()
        .count()
    )
    assert dist > 1


def _mk_png(w: int, h: int) -> bytes:
    """A complete, valid PNG built on the stdlib (zlib + struct)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _mk_gif(w: int, h: int, n_frames: int) -> bytes:
    """A valid GIF89a stream with n_frames image descriptors."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + bytes([2, 0x4C, 0x01]) + b"\x00"  # LZW data
    return out + b"\x3b"


def _mk_bmp(w: int, h: int) -> bytes:
    import struct

    return b"BM" + b"\x00" * 12 + struct.pack("<Iii", 40, w, h)


def _mk_jpeg(w: int, h: int) -> bytes:
    import struct

    sof = struct.pack(">HBHHB", 17, 8, h, w, 3) + b"\x00" * 9
    return b"\xff\xd8\xff\xc0" + sof


def test_multimodal_real_decode(spark):
    """Image metadata comes from REAL container parsing (PNG IHDR, GIF
    screen descriptor, BMP DIB, JPEG SOF scan) — no stubs, no fakes."""
    rows = [
        (1, "image", _mk_png(64, 48), None, None),
        (2, "image", _mk_gif(32, 16, 3), None, None),
        (3, "image", _mk_bmp(120, 80), None, None),
        (4, "image", _mk_jpeg(640, 480), None, None),
        (5, "audio", b"RIFF" + b"y" * 1500, None, None),
        (6, "image", b"", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int",
    )
    feats = {r.media_id: r for r in extract_features(df).collect()}
    assert (feats[1].format, feats[1].width, feats[1].height) == ("png", 64, 48)
    assert (feats[2].format, feats[2].width, feats[2].height) == ("gif", 32, 16)
    assert (feats[3].format, feats[3].width, feats[3].height) == ("bmp", 120, 80)
    assert (feats[4].format, feats[4].width, feats[4].height) == (
        "jpeg", 640, 480,
    )
    assert feats[5].format is None and feats[6].format is None
    assert feats[1].feat[0] == 64.0 and feats[1].feat[1] == 48.0
    assert len(feats[1].feat) == 8
    # determinism
    feats2 = {r.media_id: r.digest for r in extract_features(df).collect()}
    assert feats2 == {k: v.digest for k, v in feats.items()}


def test_multimodal_gif_demux(spark):
    """sample_frames runs a real GIF demuxer: a 3-frame GIF fans out to 3
    frame rows whose bytes each contain exactly one image descriptor;
    single-image formats yield one whole-payload frame."""
    gif = _mk_gif(32, 16, 3)
    png = _mk_png(8, 8)
    df = spark.createDataFrame(
        [(1, "image", gif, None, None), (2, "image", png, None, None)],
        "media_id long, kind string, payload binary, width int, height int",
    )
    frames = sample_frames(df).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert [r.frame_no for r in sorted(by_media[1], key=lambda r: r.frame_no)] == [0, 1, 2]
    for r in by_media[1]:
        assert bytes(r.frame).count(b"\x2c") >= 1  # one descriptor each
    assert len(by_media[2]) == 1
    assert bytes(by_media[2][0].frame) == png


def test_hash_mod_sample_guards_and_rate(spark):
    """sampling.hash_mod_sample normalizes/validates keep_hex: md5 output
    is lowercase, so an uppercase threshold would silently under-sample
    ('3F' < 'a'-'f' prefixes) — it must normalize; junk must raise."""
    from annual_report_pdf_parsers_spark.operators.sampling import (
        hash_mod_sample,
    )

    df = spark.range(2000).withColumnRenamed("id", "k")
    lower = hash_mod_sample(df, "k", keep_hex="3f")
    upper = hash_mod_sample(df, "k", keep_hex="3F")
    assert lower.count() == upper.count()  # normalized, not lex-compared
    # ~25% of 2000 with binomial noise
    assert 400 < lower.count() < 600
    with pytest.raises(ValueError):
        hash_mod_sample(df, "k", keep_hex="zz")
    with pytest.raises(ValueError):
        hash_mod_sample(df, "k", keep_hex="3f0")


def test_stratified_sample_matches_python_model(spark):
    """sampling.stratified_sample selects EXACTLY the rows a hashlib
    model selects per stratum (content-derived decision, not a rate
    approximation); unlisted strata fall back to default_hex, or are
    dropped entirely when default_hex=None; junk thresholds raise."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.sampling import (
        stratified_sample,
    )

    langs = ["en", "fr", "de", "xx"]
    rows = [(i, langs[i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    rates = {"en": "7f", "fr": "3f"}

    def model(default):
        keep = []
        for k, lang in rows:
            hx = rates.get(lang, default)
            if hx is None:
                continue
            d = hashlib.md5(f"{k}|st0".encode()).hexdigest()
            if d[:2] <= hx:
                keep.append(k)
        return sorted(keep)

    got = sorted(
        r.k for r in stratified_sample(df, "lang", rates, "k").collect()
    )
    assert got == model("00") and len(got) > 0
    got_drop = sorted(
        r.k
        for r in stratified_sample(
            df, "lang", rates, "k", default_hex=None
        ).collect()
    )
    assert got_drop == model(None)
    # only listed strata survive the None default
    kept_langs = {
        r.lang
        for r in stratified_sample(
            df, "lang", rates, "k", default_hex=None
        ).collect()
    }
    assert kept_langs <= {"en", "fr"}
    # uppercase normalizes like hash_mod_sample; junk raises
    up = stratified_sample(df, "lang", {"en": "7F"}, "k", default_hex=None)
    assert sorted(r.k for r in up.collect()) == sorted(
        r.k
        for r in stratified_sample(
            df, "lang", {"en": "7f"}, "k", default_hex=None
        ).collect()
    )
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": "zz"}, "k")


def test_line_stats_counts_fixture(spark):
    """text.line_stats: bullet/ellipsis/duplicate-line fractions over a
    hand-built fixture — blank lines dropped, lines trimmed, each
    fraction an exact single division."""
    from annual_report_pdf_parsers_spark.operators.text import line_stats

    rows = [
        # 4 non-blank lines: 2 bullets, 1 ellipsis-end, dup pair
        (1, "- first item\n  - second item  \n\nwait...\nwait..."),
        (2, "plain text only"),
        (3, ""),
        # unicode bullet + unicode ellipsis + trimmed dup
        (4, "• dot item\nmore…\n  plain \nplain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.bullet_frac, r.ellipsis_frac, r.dup_line_frac)
        for r in line_stats(df).collect()
    }
    assert got[1] == (4, 0.5, 0.5, 0.25)
    assert got[2] == (1, 0.0, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0, 0.0)
    assert got[4] == (4, 0.25, 0.25, 0.25)


def test_incremental_lsh_flags_cross_corpus(spark):
    """dedup.incremental_lsh_flags: exact copies of reference docs are
    flagged with dup_of = the smallest matching ref id; new docs with no
    reference overlap are absent; the reference corpus is never paired
    with itself; max_band_freq drops a boilerplate band shared by many
    reference docs."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        incremental_lsh_flags,
    )

    base = [
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (20, "one two three four five six seven eight nine ten eleven"),
        (30, "red orange yellow green blue indigo violet cyan magenta"),
    ]
    ref = spark.createDataFrame(base, "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (100, base[0][1]),              # exact copy of 10
            (101, base[1][1]),              # exact copy of 20
            (102, "totally unrelated words carrying no shared shingles"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dup_of, r.n_ref_matches)
        for r in incremental_lsh_flags(new, ref).collect()
    }
    assert got[100] == (10, 1) and got[101] == (20, 1)
    assert 102 not in got
    # hot-band cap: a boilerplate text shared by MANY ref docs stops
    # matching once its band frequency exceeds the cap
    boiler = "shared boilerplate header repeated across the whole site yes"
    ref_hot = spark.createDataFrame(
        [(i, boiler) for i in range(50)], "doc_id long, text string"
    )
    new_hot = spark.createDataFrame(
        [(900, boiler)], "doc_id long, text string"
    )
    assert incremental_lsh_flags(new_hot, ref_hot).count() == 1
    assert (
        incremental_lsh_flags(new_hot, ref_hot, max_band_freq=10).count()
        == 0
    )


def test_quota_topk_refuses_rank_collision(spark):
    from annual_report_pdf_parsers_spark.operators.sampling import (
        quota_topk_per_group,
    )

    df = spark.createDataFrame(
        [(1, "a", 0.5, 9)], "id long, g string, q double, rnk long"
    )
    with pytest.raises(ValueError):
        quota_topk_per_group(df, "g", "q", "id", 3)
    out = quota_topk_per_group(df, "g", "q", "id", 3, rank_col="_r")
    assert out.columns[-1] == "_r" and out.count() == 1


def test_connected_components_raises_without_fixpoint(spark):
    """A 6-node chain has diameter 5: min-label propagation cannot reach
    the fixpoint in 1 round, and returning partial labels would split
    the component (duplicate 'survivors') — it must raise instead."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(chain, max_iter=1)
    ok = {r.node: r.cluster_id for r in connected_components(chain).collect()}
    assert set(ok.values()) == {0}


def test_connected_components_star_long_chain(spark):
    """The O(log n) path: a 300-node chain (diameter 299) is exactly the
    shape that exhausts diameter-bounded label propagation; large-star/
    small-star must resolve it to ONE cluster well within its default
    round cap — and a reversed/interleaved edge order must not matter."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        connected_components,
    )

    n = 300
    edges = [(i + 1, i) if i % 2 else (i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert len(got) == n and set(got.values()) == {0}


def test_shard_shuffle_is_reproducible_permutation(spark):
    """shard_shuffle: per-shard pos is contiguous 1..n, the assignment
    is identical across invocations (reproducible), and a different
    salt yields a different permutation of the same rows."""
    from annual_report_pdf_parsers_spark.operators.sampling import (
        shard_shuffle,
    )

    df = spark.range(500).withColumnRenamed("id", "k")
    a = shard_shuffle(df, "k").select("k", "shard", "pos")
    rows = a.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    again = {(r.k, r.shard, r.pos) for r in shard_shuffle(df, "k").collect()}
    assert again == {(r.k, r.shard, r.pos) for r in rows}
    other = {
        (r.k, r.shard, r.pos)
        for r in shard_shuffle(df, "k", salt="sh1").collect()
    }
    assert other != again and {k for k, _, _ in other} == {
        k for k, _, _ in again
    }
    with pytest.raises(ValueError):
        shard_shuffle(df, "k", prefix_len=0)


def test_normalize_text_folds(spark):
    from annual_report_pdf_parsers_spark.operators.text import (
        normalize_text,
    )

    df = spark.createDataFrame(
        [(1, "  Déjà   VU  Ñandú ß Œuf øre "), (2, "plain ascii")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in normalize_text(df).collect()}
    assert got[1] == "deja vu nandu s ouf ore"
    assert got[2] == "plain ascii"


def test_connected_components_string_ids(spark):
    """String doc ids (url hashes) are valid CC keys: min-label needs
    only a total order.  The label algorithm's convergence check must
    not rely on a numeric sum (it switches to an exact changed-count
    join), and cluster_keep_decision must not cast ids."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        cluster_keep_decision,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    for algo in ("label", "star"):
        got = {
            r.node: r.cluster_id
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == {
            "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
            "doc-x": "doc-x", "doc-y": "doc-x",
        }, (algo, got)
    corpus = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-z",)], "doc_id string"
    )
    dec = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in cluster_keep_decision(corpus, pairs).collect()
    }
    assert dec == {
        "doc-a": ("doc-a", True),
        "doc-b": ("doc-a", False),
        "doc-z": ("doc-z", True),
    }


def test_decontaminate_counts_distinct_overlap(spark):
    """decontaminate: n_overlap counts DISTINCT shared shingles (repeats
    inside a doc count once), zero-overlap docs appear with
    contaminated=False, and the threshold is >= min_overlap."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),          # shares 'a b c' + 'b c d' -> 2
            (2, "a b c a b c"),        # repeats: distinct overlap = 1
            (3, "x y z w"),            # no overlap
            (4, "too short"),          # < k tokens: no shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("a b c d q",)], "text string"
    )
    got = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(corpus, bench, min_overlap=2).collect()
    }
    assert got == {
        1: (2, True), 2: (1, False), 3: (0, False), 4: (0, False)
    }, got


def test_multimodal_wav_decode(spark):
    """decode_audio_meta walks real RIFF/WAVE chunks: a constructed
    16-bit stereo 8 kHz PCM file (with an extra LIST chunk before fmt)
    yields exact (rate, channels, bits, samples, duration); garbage and
    truncated payloads degrade to (None, 0...) rows, never raise."""
    import struct as st

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        extract_audio_features,
    )

    def wav(sr, ch, bits, n_samples, extra_chunk=False):
        block = ch * bits // 8
        data = bytes(n_samples * block)
        fmt = st.pack("<HHIIHH", 1, ch, sr, sr * block, block, bits)
        chunks = b""
        if extra_chunk:
            chunks += b"LIST" + st.pack("<I", 4) + b"INFO"
        chunks += b"fmt " + st.pack("<I", len(fmt)) + fmt
        chunks += b"data" + st.pack("<I", len(data)) + data
        return b"RIFF" + st.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = [
        (1, "audio", wav(8000, 2, 16, 4000), None, None),
        (2, "audio", wav(44100, 1, 8, 441, extra_chunk=True), None, None),
        (3, "audio", b"not a wav at all", None, None),
        (4, "audio", b"RIFF\x00\x00\x00\x00WAVE", None, None),  # truncated
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int",
    )
    got = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert (
        got[1].format, got[1].sample_rate, got[1].channels, got[1].bits,
        got[1].n_samples, got[1].duration_sec,
    ) == ("wav", 8000, 2, 16, 4000, 0.5)
    assert (
        got[2].format, got[2].sample_rate, got[2].channels,
        got[2].n_samples, got[2].duration_sec,
    ) == ("wav", 44100, 1, 441, 0.01)
    assert got[3].format is None and got[3].sample_rate == 0
    assert got[4].format == "wav" and got[4].n_samples == 0


def test_multimodal_mp4_decode(spark):
    """decode_video_meta walks real ISO-BMFF boxes: hand-built MP4s
    (mvhd v0 and v1, two tracks where only the second carries video
    dimensions) yield exact (brand, w, h, timescale, duration, tracks);
    non-BMFF and truncated payloads degrade, never raise."""
    import struct as st

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        extract_video_features,
    )

    def box(btype, body):
        return st.pack(">I", 8 + len(body)) + btype + body

    def tkhd(w, h, version=0):
        if version:
            body = bytes([1, 0, 0, 0]) + b"\x00" * 84
        else:
            body = bytes(76)
        return box(b"tkhd", body + st.pack(">II", w << 16, h << 16))

    def mvhd(ts, dur, version=0):
        if version:
            body = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                    + st.pack(">I", ts) + st.pack(">Q", dur))
        else:
            body = bytes(12) + st.pack(">II", ts, dur)
        return box(b"mvhd", body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # v0: audio track (0x0) first, then the 640x360 video track
    moov0 = box(b"moov", mvhd(1000, 2500)
                + box(b"trak", tkhd(0, 0))
                + box(b"trak", tkhd(640, 360)))
    # v1: 64-bit times, single 1920x1080 track
    moov1 = box(b"moov", mvhd(90000, 90000 * 7, version=1)
                + box(b"trak", tkhd(1920, 1080, version=1)))
    rows = [
        (1, "video", ftyp + moov0, None, None),
        (2, "video", ftyp + moov1, None, None),
        (3, "video", b"RIFF not bmff", None, None),
        (4, "video", ftyp + box(b"moov", b"\x00\x00\x00\xffbad!"), None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int",
    )
    got = {r.media_id: r for r in extract_video_features(df).collect()}
    assert (
        got[1].format, got[1].width, got[1].height, got[1].timescale,
        got[1].duration_sec, got[1].n_tracks,
    ) == ("isom", 640, 360, 1000, 2.5, 2)
    assert (
        got[2].format, got[2].width, got[2].height, got[2].duration_sec,
        got[2].n_tracks,
    ) == ("isom", 1920, 1080, 7.0, 1)
    assert got[3].format is None and got[3].n_tracks == 0
    assert got[4].format == "isom" and got[4].n_tracks == 0


def test_multimodal_mp4_sample_extraction(spark):
    """mp4_samples walks the real sample tables: a hand-built MP4 whose
    stsc maps 2 samples to chunk 1 and 1 sample to chunk 2, with
    per-sample stsz sizes and stco offsets into mdat, yields exactly
    the three known byte spans through sample_frames; a sample range
    beyond EOF is skipped, not raised."""
    import struct as st

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        sample_frames,
    )

    def box(t, body):
        return st.pack(">I", 8 + len(body)) + t + body

    s1, s2, s3 = b"AAAA", b"BBBBBB", b"CC"
    ftyp = box(b"ftyp", b"isom\x00\x00\x00\x00isom")
    # mdat samples: chunk1 = s1+s2 back to back, chunk2 = s3 after a gap
    mdat_body = s1 + s2 + b"__gap__" + s3
    # compute absolute offsets after we know header sizes: build stbl
    # with placeholders sized identically, then patch
    def build(c1_off, c2_off):
        # full boxes carry a version/flags word before their payloads
        stsz = box(b"stsz", st.pack(">IIII", 0, 0, 3, len(s1))
                   + st.pack(">II", len(s2), len(s3)))
        stsc = box(b"stsc", st.pack(">II", 0, 2)
                   + st.pack(">III", 1, 2, 1) + st.pack(">III", 2, 1, 1))
        stco = box(b"stco", st.pack(">II", 0, 2)
                   + st.pack(">II", c1_off, c2_off))
        stbl = box(b"stbl", stsz + stsc + stco)
        trak = box(b"trak", box(b"mdia", box(b"minf", stbl)))
        moov = box(b"moov", trak)
        mdat = box(b"mdat", mdat_body)
        return ftyp + moov + mdat

    probe = build(0, 0)
    mdat_start = len(probe) - len(mdat_body)
    mp4 = build(mdat_start, mdat_start + len(s1) + len(s2) + 7)
    truncated = mp4[: len(mp4) - len(s3)]  # third sample range past EOF

    df = spark.createDataFrame(
        [(1, "video", mp4, None, None), (2, "video", truncated, None, None)],
        "media_id long, kind string, payload binary, width int, height int",
    )
    by_media = {}
    for r in sample_frames(df).collect():
        by_media.setdefault(r.media_id, []).append(bytes(r.frame))
    assert by_media[1] == [s1, s2, s3]
    assert by_media[2] == [s1, s2]


def test_decoder_hardening_adversarial_payloads():
    """Round-4 hardening against malformed/adversarial containers:

    - stsz uniform-size path: a forged sample count near 2^32 must not
      allocate a proportional Python list (clamped before materializing);
    - JPEG scan: 0xFF fill bytes before a marker are skipped, and the
      scan stops at SOS instead of reading pseudo-segments out of
      entropy-coded data;
    - GIF: a comment extension between a frame's graphic-control
      extension and its image descriptor (legal per GIF89a) must not
      drop the GCE bytes from that frame.
    """
    import struct as st

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        decode_image_meta,
        gif_frames,
        mp4_samples,
    )

    def box(t, body):
        return st.pack(">I", 8 + len(body)) + t + body

    # --- forged uniform stsz declaring 2^32-1 samples of 4 bytes ---
    ftyp = box(b"ftyp", b"isom\x00\x00\x00\x00isom")
    stsz = box(b"stsz", st.pack(">III", 0, 4, 0xFFFFFFFF))
    stsc = box(b"stsc", st.pack(">II", 0, 1) + st.pack(">III", 1, 2, 1))
    stco = box(b"stco", st.pack(">II", 0, 1) + st.pack(">I", 0))
    stbl = box(b"stbl", stsz + stsc + stco)
    forged = ftyp + box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    out = mp4_samples(forged, max_samples=8)
    assert len(out) <= 8  # returned promptly with bounded allocation

    # --- JPEG: fill bytes before SOF0 ---
    sof = st.pack(">HBHHB", 17, 8, 48, 64, 3) + b"\x00" * 9
    padded = b"\xff\xd8" + b"\xff\xff\xff\xc0" + sof
    assert decode_image_meta(padded) == ("jpeg", 64, 48)

    # --- JPEG: payload ENDS in fill bytes (review finding: the skip
    # loop must not read a marker past the buffer) ---
    assert decode_image_meta(b"\xff\xd8\xff\xff") == ("jpeg", 0, 0)

    # --- JPEG: pseudo-SOF inside entropy-coded data after SOS ---
    sos = b"\xff\xda" + st.pack(">H", 4) + b"\x00\x00"
    pseudo_sof = b"\xff\xc0" + st.pack(">HBHHB", 17, 8, 999, 777, 3)
    assert decode_image_meta(b"\xff\xd8" + sos + pseudo_sof) == (
        "jpeg", 0, 0,
    )

    # --- GIF: comment extension between GCE and image descriptor ---
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe" + bytes([3]) + b"abc" + b"\x00"
    desc = b"\x2c" + st.pack("<HHHH", 0, 0, 8, 8) + b"\x00"
    lzw = b"\x02" + bytes([2, 0x4C, 0x01]) + b"\x00"
    gif = (
        b"GIF89a" + st.pack("<HH", 8, 8) + b"\x00\x00\x00"
        + gce + comment + desc + lzw + b"\x3b"
    )
    (frame,) = gif_frames(gif)
    assert frame.startswith(gce)  # GCE survives the interposed comment
    assert frame.endswith(desc + lzw)


def test_asof_join_refuses_carried_name_collision(spark):
    """A left frame already holding `<value>_asof` would produce
    duplicate output names — refuse loudly (quota rank_col convention)."""
    from annual_report_pdf_parsers_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, 0.0)], "user_id long, ts long, value_asof double"
    )
    right = spark.createDataFrame(
        [(1, 1, 2.0)], "user_id long, ts long, value double"
    )
    with pytest.raises(ValueError):
        asof_join(left, right)


def test_ivf_oracle_lazy_and_fault_tolerant(monkeypatch):
    """The IVF oracle entry is resolved at oracle_sql() call time, not
    import time: with unreadable gate testdata the entry is omitted
    (rows-only fallback) instead of breaking the whole oracle dict."""
    from annual_report_pdf_parsers_spark import queries as q

    monkeypatch.setenv("SPARK_GRAFT_GATE_SF_DIR", "/nonexistent/sfX")
    assert "ann_ivf_topk" not in q.oracle_sql_dict()
    monkeypatch.delenv("SPARK_GRAFT_GATE_SF_DIR")
    import os as _os

    if _os.path.isdir("/root/testdata/sf0.01"):
        sql = q.oracle_sql_dict()["ann_ivf_topk"]
        assert "cell_of" in sql


def test_tokens_whitespace_runs_cross_engine(spark):
    """tokens() splits on whitespace RUNS (tab/newline/CR/VT/FF, NBSP
    and the other Zs separators, U+2028/29) — and the Java spelling
    (WS_SPLIT_RE) and RE2 spelling (WS_SPLIT_RE2) denote the SAME
    character set: every class member is swept through both engines."""
    import duckdb

    from annual_report_pdf_parsers_spark.operators.text import (
        WS_SPLIT_RE2,
        tokens,
    )

    ws_chars = (
        "\t\n\x0b\x0c\r \xa0 "
        + "".join(chr(c) for c in range(0x2000, 0x200B))
        + "    　"
    )
    texts = [f"a{c}b{c}{c}c {c}" for c in ws_chars] + [
        "", " ", "one", "a\tb\nc\rd e\x0bf", "  lead trail  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: list(r.tk)
        for r in df.select(
            "i", tokens(F.col("text")).alias("tk")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT list_filter(regexp_split_to_array(?, '"
            + WS_SPLIT_RE2
            + "'), t -> t <> '')",
            [t],
        ).fetchone()[0]
        assert got[i] == want, (i, repr(t), got[i], want)
    # the ws-char sweeps must all tokenize to [a, b, c]
    for i in range(len(ws_chars)):
        assert got[i] == ["a", "b", "c"], (i, repr(texts[i]))


def test_simhash_pairs_complete_vs_bruteforce(spark):
    """dedup.simhash_pairs (banded candidates + limb Hamming verify)
    must return EXACTLY the brute-force pairs with hamming <= n_bands-1
    — the pigeonhole guarantee says banding loses nothing inside that
    radius, and the conv/XOR/bit_count limbs must agree with a direct
    Python popcount."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        simhash_bits,
        simhash_pairs,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [
        (i, " ".join(vocab[(i + j) % len(vocab)] for j in range(4 + i % 3)))
        for i in range(36)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {
        r.sid: r.simhash for r in simhash_bits(df, 64).collect()
    }
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(fps[a], fps[b]))
            if h <= 7:
                want.add((a, b, h))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(df, n_bits=64, n_bands=8).collect()
    }
    assert got == want and len(want) > 0


def test_simhash_multiprobe_complete_vs_bruteforce(spark):
    """simhash_pairs_multiprobe at the 64/8/2 default must return
    EXACTLY the brute-force Hamming ball at radius 6 — the block-
    combination pigeonhole guarantee (<= n_blocks - key_blocks flips
    leave some 2-block key untouched), at 16-bit key width rather than
    the degenerate 8-bit bands."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        simhash_bits,
        simhash_pairs_multiprobe,
    )

    # LONG docs (24+ tokens) so an appended token flips only a few
    # low-margin bits — short docs jump straight from hamming 0 to 7+
    # and would leave the 4..6 radius untested
    vocab = [
        "alpha", "beta", "gamma", "delta", "eps", "zeta",
        "omega", "nova", "orion", "vega", "atlas", "titan",
    ]
    docs = [
        (i, " ".join(
            vocab[(i * 3 + j * j) % len(vocab)] for j in range(24 + i % 5)
        ))
        for i in range(20)
    ]
    base = dict(docs)
    for i in range(8):
        docs.append((100 + i, base[i] + f" probe{i}"))
        docs.append((200 + i, base[i] + f" probe{i} extra"))
        docs.append((300 + i, base[i] + f" probe{i} extra tokens here"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {r.sid: r.simhash for r in simhash_bits(df, 64).collect()}
    ids = sorted(fps)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(fps[a], fps[b]))
            if h <= 6:
                want.add((a, b, h))
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs_multiprobe(df).collect()
    }
    assert got == want and len(want) > 0
    # the radius-6 ball must be strictly larger than the 4-band
    # radius-3 result on this fixture (the green is about the RADIUS)
    assert any(h in (4, 5, 6) for _, _, h in want)


def test_lang_id_trigram_classifies_five_languages(spark):
    """lang_id_trigram labels each 5-language fixture sentence with its
    language (clear cosine margins) and digit-only text as unknown."""
    from annual_report_pdf_parsers_spark.operators.text import (
        lang_id_trigram,
    )
    from annual_report_pdf_parsers_spark.queries import (
        _LANGID_SENTS,
        _LANGID_UNKNOWN,
    )

    rows = [(i, s) for i, (_, s) in enumerate(_LANGID_SENTS)] + [
        (99, _LANGID_UNKNOWN)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.lang_guess, r.lang_score)
        for r in lang_id_trigram(df).collect()
    }
    for i, (lang, _) in enumerate(_LANGID_SENTS):
        assert got[i][0] == lang, (i, got[i])
        assert got[i][1] > 0.5
    assert got[99] == ("unknown", 0.0)


def test_dup_span_stats_detects_quoting(spark):
    """dup_span_stats (windowed exact-substring approximation): a doc
    QUOTING an 8-token span of another is flagged on both sides even
    though digests and full-shingle Jaccard would call them unrelated;
    sub-k docs report zero windows, identical docs 1.0."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        dup_span_stats,
    )

    span = "one two three four five six seven eight"
    rows = [
        (1, f"{span} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"unrelated words entirely own text here now {span}"),
        (3, "totally different content with no overlap at all today"),
        (4, "short doc"),
        (5, f"{span} alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in dup_span_stats(df, k=8).collect()
    }
    # stride > 1 is grid-aligned-only: the doc-2 quote sits at a
    # different phase and MUST be missed — the documented trade
    coarse = {
        r.doc_id: r.n_dup_windows
        for r in dup_span_stats(df, k=8, stride=4).collect()
    }
    assert coarse[2] == 0 and coarse[1] > 0
    assert got[4] == (0, 0, 0.0)              # sub-k: zero windows
    assert got[3][1] == 0                      # no overlap
    assert got[1] == got[5]                    # identical docs agree
    assert got[1][2] == 1.0                    # full duplicate
    assert got[2][1] >= 1                      # the quoted span flags
    assert 0 < got[2][2] < 1.0


def test_excise_dup_spans_removes_quote_from_one_side(spark):
    """excise_dup_spans: the quoted span is cut from exactly ONE side —
    the min-id owner keeps it, the quoting doc loses those tokens and
    keeps its residual; an exact copy of a lower-id doc collapses to
    the empty string; untouched and sub-k docs pass through whole."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        excise_dup_spans,
    )

    span = "one two three four five six seven eight"
    rows = [
        (1, f"{span} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"unrelated words entirely own text here now {span}"),
        (3, "totally different content with no overlap at all today"),
        (4, "short doc"),
        (5, f"{span} alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_excised, r.n_tokens, r.n_kept, r.n_excised)
        for r in excise_dup_spans(df, k=8).collect()
    }
    assert got[1] == (rows[0][1], 16, 16, 0)   # owner keeps the span
    assert got[2] == (                          # quoter loses ONLY it
        "unrelated words entirely own text here now", 15, 7, 8
    )
    assert got[5] == ("", 16, 0, 16)            # pure copy -> empty
    assert got[3] == (rows[2][1], 9, 9, 0)
    assert got[4] == ("short doc", 2, 2, 0)     # sub-k passes through


def test_filter_blocked_domains(spark):
    """urls.filter_blocked_domains: blocked hosts and their subdomains
    drop; a lookalike host that merely ends with the blocked string
    survives; entries normalize case/leading www.; hostless urls are
    kept; an empty blocklist is the identity."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        filter_blocked_domains,
    )

    rows = [
        (1, "https://spam-site.com/x"),
        (2, "https://ads.spam-site.com/y"),
        (3, "https://notspam-site.com/z"),
        (4, "https://www.spam-site.com/w"),
        (5, "https://good.org/a"),
        (6, "not a url"),
        (7, "https://tracker.net/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = sorted(
        r.doc_id
        for r in filter_blocked_domains(
            df, ["Spam-Site.com", "www.tracker.net"]
        ).collect()
    )
    assert got == [3, 5, 6]
    # subdomain matching off: only the exact host drops
    got_exact = sorted(
        r.doc_id
        for r in filter_blocked_domains(
            df, ["spam-site.com"], match_subdomains=False
        ).collect()
    )
    assert got_exact == [2, 3, 5, 6, 7]
    assert filter_blocked_domains(df, []).count() == len(rows)


def test_drop_boilerplate_lines(spark):
    """dedup.drop_boilerplate_lines: a line shared (modulo trim) by more
    than max_df docs is cut from every doc; rarer shared lines, unique
    lines, and blank lines survive verbatim; a doc of pure boilerplate
    collapses to ''."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        drop_boilerplate_lines,
    )

    nav = "NAV | HOME | ABOUT"
    rows = [(i, f"  {nav}  \nunique {i}\n\nshared pair") for i in range(3)]
    rows += [(3, f"{nav}\nshared pair rare"), (4, nav)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
        for r in drop_boilerplate_lines(df, max_df=2).collect()
    }
    # nav appears in 5 docs (> 2) -> dropped everywhere, raw lines cut;
    # 'shared pair' df=3 -> dropped; blank + unique survive
    for i in range(3):
        assert got[i] == (f"unique {i}\n", 2, 2)
    assert got[3] == ("shared pair rare", 1, 1)
    assert got[4] == ("", 0, 1)
    with pytest.raises(ValueError):
        drop_boilerplate_lines(df, max_df=0)


def test_char_entropy_known_values(spark):
    """text.char_entropy on hand-computable distributions: single-class
    text has entropy 0, two equal classes 1 bit, four equal classes
    2 bits; empty text guards to 0; uppercase folds first."""
    from annual_report_pdf_parsers_spark.operators.text import char_entropy

    rows = [(1, "aaaa"), (2, "AbaB"), (3, "ab1 "), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert got[3] == (4, 2.0)
    assert got[4] == (0, 0.0)
    # staging-name clash guard (the letter column _ce_a)
    clash = spark.createDataFrame([(1, "x", 0)], "doc_id long, text string, _ce_a int")
    with pytest.raises(ValueError):
        char_entropy(clash)


def test_unigram_logprob_known_values(spark):
    """text.unigram_logprob: known words read the literal table, unknown
    tokens take the floor, mean is one rounded division; case folds."""
    from annual_report_pdf_parsers_spark.operators.text import (
        UNIGRAM_LOGPROBS, UNKNOWN_LOGPROB, unigram_logprob,
    )

    the = UNIGRAM_LOGPROBS["the"]
    rows = [(1, "THE the zzzq"), (2, "zz qq"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_known, r.avg_logprob)
        for r in unigram_logprob(df).collect()
    }
    assert got[1] == (3, 2, round((2 * the + UNKNOWN_LOGPROB) / 3, 6))
    assert got[2] == (2, 0, UNKNOWN_LOGPROB)
    assert got[3] == (0, 0, 0.0)


def test_token_count_stats_matches_numpy_percentiles(spark):
    """text.token_count_stats: exact interpolated percentiles equal
    numpy's linear-interpolation percentile on the same counts."""
    import numpy as np

    from annual_report_pdf_parsers_spark.operators.text import (
        token_count_stats,
    )

    rows = [(f"d{i}", "s1", " ".join(["w"] * (i + 1))) for i in range(10)]
    rows += [("x", "s2", "one two three")]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {r.source: r.asDict() for r in token_count_stats(df).collect()}
    counts = np.arange(1, 11)
    for p, col in [(25, "p25_tokens"), (50, "p50_tokens"), (90, "p90_tokens"), (99, "p99_tokens")]:
        assert got["s1"][col] == round(float(np.percentile(counts, p)), 6)
    assert got["s1"]["n_docs"] == 10 and got["s1"]["total_tokens"] == 55
    assert got["s2"]["p50_tokens"] == 3.0 and got["s2"]["min_tokens"] == 3


def test_semantic_dedup_cell_confined(spark):
    """similarity.semantic_dedup: a near-duplicate with a lower-id
    neighbor in the SAME cell is dropped; an equally-similar pair split
    across cells is NOT paired (the SemDeDup trade); the lowest id of
    each duplicate group survives."""
    from annual_report_pdf_parsers_spark.operators.similarity import (
        semantic_dedup,
    )

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows = [
        (1, [1.0, 0.05]),   # cell 0
        (2, [1.0, 0.06]),   # cell 0, ~identical to 1 -> dropped
        (3, [0.05, 1.0]),   # cell 1
        (4, [1.0, 0.9]),    # near the boundary, lands in ONE cell only
        (5, [0.9, 1.0]),    # cos(4,5) is high but cells differ -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.cell, r.keep) for r in
           semantic_dedup(df, cents, threshold=0.99).collect()}
    assert got[1][1] is True and got[2] == (0, False)
    assert got[3][1] is True
    assert got[4][1] is True and got[5][1] is True
    assert got[4][0] != got[5][0]


def test_quality_classifier_known_values(spark):
    """text.quality_classifier: unigram+bigram bucket weights from the
    literal table, mean + bias, keep on the unrounded score; empty and
    single-token docs (no bigrams) degrade cleanly."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.text import (
        CLASSIFIER_BIAS, CLASSIFIER_WEIGHTS, quality_classifier,
    )

    def wt(f):
        return CLASSIFIER_WEIGHTS[hashlib.md5(f.encode()).hexdigest()[:2]]

    rows = [(1, "The of"), (2, "solo"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_features, r.score, r.keep)
        for r in quality_classifier(df).collect()
    }
    s1 = CLASSIFIER_BIAS + (
        ((0.0 + wt("the")) + wt("of")) + wt("the of")
    ) / 3
    assert got[1] == (3, round(s1, 6), s1 >= 0.0)
    s2 = CLASSIFIER_BIAS + wt("solo") / 1
    assert got[2] == (1, round(s2, 6), s2 >= 0.0)
    assert got[3] == (0, round(float(CLASSIFIER_BIAS), 6), CLASSIFIER_BIAS >= 0.0)


def test_mixture_sample_thresholds_and_clamp(spark):
    """sampling.mixture_sample: hand-checked sqrt reweighting — a 16-row
    source and a 1-row source at target 4 give thresholds 13107 / 52428
    (small source upweighted ~4x per row); a huge target clamps at
    65536 and keeps EVERY row; invalid params raise."""
    import hashlib

    import pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        mixture_sample,
    )

    rows = [(i, "big") for i in range(16)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(df, "source", "doc_id", target_total=4).collect()
    # w_big = 4e6, w_tiny = 1e6, W = 5e6:
    # thr_big  = floor(65536*4 * (4/5) / 16) = floor(13107.2) = 13107
    # thr_tiny = floor(65536*4 * (1/5) / 1)  = floor(52428.8) = 52428
    want = {
        k: (s, 13107 if s == "big" else 52428)
        for k, s in rows
        if hashlib.md5(f"{k}|mx0".encode()).hexdigest()[:4]
        < f"{13107 if s == 'big' else 52428:04x}"
    }
    assert want, "fixture must keep at least one row to be non-vacuous"
    got = {r.doc_id: (r.source, r.keep_thr) for r in out}
    assert got == want
    # clamp: target >= corpus size -> every source at 65536, all kept
    full = mixture_sample(df, "source", "doc_id", target_total=1000)
    assert full.count() == 17
    assert set(
        r.keep_thr for r in full.select("keep_thr").distinct().collect()
    ) == {65536}
    with pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", target_total=0)
    with pytest.raises(ValueError):
        mixture_sample(df, "source", "doc_id", 10, alpha=1.5)
    # NULL-source rows: dropped AND excluded from the weighting — a
    # corpus half-full of NULL sources must leave the real sources'
    # thresholds untouched (review finding r05: counting NULLs into W
    # while the join drops them silently deflated every keep rate)
    with_null = rows + [(1000 + i, None) for i in range(17)]
    dfn = spark.createDataFrame(
        with_null, "doc_id long, source string"
    )
    outn = {
        r.doc_id: (r.source, r.keep_thr)
        for r in mixture_sample(
            dfn, "source", "doc_id", target_total=4
        ).collect()
    }
    assert outn == want


def test_url_quality_score_known_values(spark):
    """urls.url_quality_score: weighted word counts over the lowered
    url, repeated hits count multiply, clean urls score 0.0 and keep."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        URL_WORD_WEIGHTS, url_quality_score,
    )

    rows = [
        (1, "https://a.example/CASINO/casino"),   # 2 hits of -1.5
        (2, "https://b.example/wiki/research"),   # +0.8 +0.7
        (3, "https://c.example/plain"),           # no weighted words
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: (r.url_score, r.url_keep)
        for r in url_quality_score(df).collect()
    }
    assert got[1] == (round(2 * URL_WORD_WEIGHTS["casino"], 6), False)
    assert got[2] == (
        round(URL_WORD_WEIGHTS["wiki"] + URL_WORD_WEIGHTS["research"], 6),
        True,
    )
    assert got[3] == (0.0, True)
    # keep_cols threads extras through (the frontier-composition path)
    kept = url_quality_score(
        df.withColumn("extra", df.doc_id * 2), keep_cols=("extra",)
    )
    assert kept.columns == [
        "doc_id", "url", "url_score", "url_keep", "extra"
    ]
    assert {r.doc_id: r.extra for r in kept.collect()} == {
        1: 2, 2: 4, 3: 6
    }


def test_pack_sequences_boundary_crossing(spark):
    """sampling.pack_sequences: a document straddling a sequence
    boundary reports seq_first < seq_last; exact fits stay inside one
    sequence; empty docs occupy no tokens; invalid budget raises."""
    import pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        pack_sequences,
    )

    # single shard via one key-space: find keys landing in one shard
    # is fragile — instead use budget math on whatever shards appear
    rows = [(1, " ".join(["a"] * 7)), (2, " ".join(["b"] * 7)),
            (3, ""), (4, " ".join(["c"] * 10)), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_sequences(df, "doc_id", budget=10, prefix_len=1).collect()}
    assert all(v is not None for r in out.values() for v in r), out
    for k, txt in rows:
        r = out[k]
        n = len([t for t in txt.split() if t]) if txt else 0
        assert r.n_tokens == n
        assert r.seq_first == r.start_tok // 10
        if n > 0:
            assert r.seq_last == (r.start_tok + n - 1) // 10
            # crossing iff the span covers a boundary
            assert (r.seq_first < r.seq_last) == (
                r.start_tok // 10 != (r.start_tok + n - 1) // 10
            )
        else:
            assert r.seq_last == r.seq_first
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", budget=0)


def test_dedup_paragraphs(spark):
    """dedup.dedup_paragraphs: first occurrence of a repeated paragraph
    (by trimmed key, ordered by (doc_id, pos)) survives; later copies —
    in other docs, in the same doc, and indentation variants — are cut;
    blank paragraphs always survive and reconstruction is byte-exact."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        dedup_paragraphs,
    )

    rows = [
        (0, "SHARED\n\nu0\n\nu0"),        # within-doc repeat of u0
        (1, "  SHARED \n\nu1\n\n\n\nx"),  # trim-variant + blank para
        (2, "SHARED\n\nu2"),
        (3, ""),                          # one blank paragraph
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_paras_kept, r.n_paras_dropped)
        for r in dedup_paragraphs(df).collect()
    }
    assert got[0] == ("SHARED\n\nu0", 2, 1)
    # the odd third newline stays attached to the next part (lossless
    # literal split), so the kept text is byte-identical minus the cut
    assert got[1] == ("u1\n\n\n\nx", 3, 1)
    assert got[2] == ("u2", 1, 1)
    assert got[3] == ("", 1, 0)


def test_ccnet_tiers_fixture(spark):
    """text.ccnet_tiers: per-language tercile routing — 6 docs with
    strictly decreasing known-word fraction split head/head/middle/
    middle/tail/tail (linear-interpolated cutoffs sit strictly between
    adjacent scores); keep == (tier != 'tail'); a NULL language forms
    its own stratum (its single score equals both cutoffs -> head)."""
    from annual_report_pdf_parsers_spark.operators.text import ccnet_tiers

    rows = [
        (i, "en", " ".join(["the"] * (6 - i) + ["zzqx"] * i))
        for i in range(6)
    ]
    rows.append((100, None, "the of and"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in ccnet_tiers(df).collect()}
    assert [got[i].tier for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    assert all(
        got[i].keep == (got[i].tier != "tail") for i in range(6)
    )
    scores = [got[i].avg_logprob for i in range(6)]
    assert scores == sorted(scores, reverse=True)
    assert got[100].lang is None
    assert got[100].tier == "head" and got[100].keep


def test_c4_filters(spark):
    """text.c4_filters: line rules (terminal punct, >=5 ws-run words,
    no javascript) and doc rules (>=3 sentences in the KEPT text,
    lorem ipsum / brace / bad-word anywhere in the ORIGINAL text);
    NULL text behaves as '' (one blank line, dropped)."""
    from annual_report_pdf_parsers_spark.operators.text import c4_filters

    good = "This is a good clean sentence with many words."
    bang = "Another perfectly fine sentence appears right here!"
    rows = [
        (0, f"{good}\nShort line.\nno terminal punct here at all\n"
            f"Please enable javascript to continue now.\n{bang}\n\n"
            "An extra closing sentence rounds the document out."),
        (1, f"{good}\n{bang}\nSadly lorem ipsum filler text is here."),
        (2, f"Some code follows in this page {{ not prose.\n{good}\n{bang}"),
        (3, f"This document mentions a badword sadly for everyone.\n"
            f"{good}\n{bang}"),
        (4, f"{good}\n{bang}"),      # only 2 sentences -> dropped
        (5, None),
        (6, f"Tabs\there\tare\tstill\twords in this sentence.\n"
            f"{good}\n{bang}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_lines_kept, r.n_lines_dropped, r.n_sentences, r.keep
        )
        for r in c4_filters(df).collect()
    }
    assert got[0] == (3, 4, 3, True)
    assert got[1] == (3, 0, 3, False)   # lorem ipsum
    assert got[2] == (3, 0, 3, False)   # brace (line itself is kept)
    assert got[3] == (3, 0, 3, False)   # bad word
    assert got[4] == (2, 0, 2, False)   # < min_sentences
    assert got[5] == (0, 1, 0, False)   # NULL -> '' -> one blank line
    assert got[6] == (3, 0, 3, True)    # tab-separated words count
    # kept text is the trimmed-line join, original order
    t0 = {r.doc_id: r.text for r in c4_filters(df).collect()}[0]
    assert t0.split("\n")[0] == good
    assert t0.split("\n")[2].startswith("An extra closing")


def test_split_assign(spark):
    """sampling.split_assign: deterministic group-keyed assignment —
    all rows of a group share a split, every input column passes
    through, listed-fraction validation raises, and a preexisting
    'split' column is refused."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        split_assign,
    )

    rows = [(i, i % 7, f"t{i}") for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, cluster_id long, text string"
    )
    out = split_assign(df, "cluster_id").collect()
    assert {r.asDict().keys() == {"doc_id", "cluster_id", "text", "split"}
            for r in out} == {True}
    by_group = {}
    for r in out:
        by_group.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values()), by_group
    assert set().union(*by_group.values()) <= {"train", "val", "test"}
    # same input -> same assignment (pure function of group + salt)
    again = {r.doc_id: r.split for r in split_assign(df, "cluster_id").collect()}
    assert again == {r.doc_id: r.split for r in out}
    # a different salt decorrelates (200 distinct groups so the two
    # assignments cannot coincide by chance)
    wide = split_assign(df, "doc_id", salt="sp1")
    base = split_assign(df, "doc_id")
    assert {r.doc_id: r.split for r in wide.collect()} != {
        r.doc_id: r.split for r in base.collect()
    }
    with _pytest.raises(ValueError, match="sum below 1"):
        split_assign(df, "cluster_id", splits=(("train", 1.0),))
    with _pytest.raises(ValueError, match="must be > 0"):
        split_assign(df, "cluster_id", splits=(("train", 0.0),))
    with _pytest.raises(ValueError, match="duplicate split names"):
        split_assign(df, "cluster_id", splits=(("test", 0.5),))
    with _pytest.raises(ValueError, match="'split' column"):
        split_assign(df.withColumn("split", F.lit("x")), "cluster_id")


def test_split_safe_no_leakage(spark):
    """corpus_split_safe: every MinHash candidate pair lands in ONE
    split — the leakage guarantee the op exists for (a per-doc random
    split would straddle ~2*frac_train*frac_val of the pairs)."""
    from annual_report_pdf_parsers_spark.queries import (
        QUERIES, _corpus_with_dupes,
    )
    from annual_report_pdf_parsers_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    out = {r.doc_id: r.split
           for r in QUERIES["corpus_split_safe"](spark, sf).collect()}
    pairs = dedup.minhash_lsh_pairs(_corpus_with_dupes(spark, sf))
    npairs = 0
    for p in pairs.collect():
        npairs += 1
        assert out[p.id_a] == out[p.id_b], (p.id_a, p.id_b)
    assert npairs > 0  # non-vacuous: the fixture has near-dups


def test_soft_dedup_weights(spark):
    """dedup.soft_dedup_weights: min(1, cap/n) per identical-content
    group, every row survives, cap validation raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.dedup import (
        soft_dedup_weights,
    )

    rows = [
        (0, "same"), (1, "same"), (2, "same"),   # n=3
        (3, "pair"), (4, "pair"),                # n=2
        (5, "solo"),                             # n=1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_copies, r.weight)
           for r in soft_dedup_weights(df).collect()}
    assert len(got) == 6  # every row survives
    assert got[0] == (3, 0.333333) and got[1] == (3, 0.333333)
    assert got[3] == (2, 0.5)
    assert got[5] == (1, 1.0)
    got2 = {r.doc_id: r.weight
            for r in soft_dedup_weights(df, max_weight_copies=2).collect()}
    assert got2[0] == 0.666667 and got2[3] == 1.0 and got2[5] == 1.0
    with _pytest.raises(ValueError, match=">= 1"):
        soft_dedup_weights(df, max_weight_copies=0)


def test_epoch_plan(spark):
    """sampling.epoch_plan: exact integer arithmetic on a tiny known
    corpus — weights, requested floor, ceil-div epochs, cap, the
    zero-token source, the NULL-source drop, and validation."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        epoch_plan,
    )

    rows = [
        ("a", "one two three four"),        # 4 tokens
        ("a", "five six"),                  # a: 6 tokens total
        ("b", "just two"),                  # b: 2 tokens
        ("z", ""),                          # zero-token source
        (None, "dropped entirely"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r.asDict()
           for r in epoch_plan(df, target_total_tokens=100).collect()}
    assert set(got) == {"a", "b", "z"}
    import math
    wa = math.floor(math.sqrt(6.0) * 1e6)
    wb = math.floor(math.sqrt(2.0) * 1e6)
    W = wa + wb  # z has weight 0
    ra = math.floor(100.0 * wa / W)
    rb = math.floor(100.0 * wb / W)
    assert got["a"]["weight"] == wa and got["a"]["requested_tokens"] == ra
    assert got["a"]["epochs"] == min(4, -(-ra // 6))
    assert got["a"]["realized_tokens"] == min(ra, 24)
    assert got["a"]["capped"] == (ra > 24)
    assert got["b"]["epochs"] == min(4, -(-rb // 2))
    assert got["b"]["capped"] == (rb > 8)
    assert got["z"]["n_tokens"] == 0 and got["z"]["epochs"] == 0
    assert got["z"]["realized_tokens"] == 0 and not got["z"]["capped"]
    with _pytest.raises(ValueError, match="positive"):
        epoch_plan(df, target_total_tokens=0)
    with _pytest.raises(ValueError, match="alpha"):
        epoch_plan(df, target_total_tokens=10, alpha=1.5)
    with _pytest.raises(ValueError, match="max_epochs"):
        epoch_plan(df, target_total_tokens=10, max_epochs=0)


def test_vocab_topk(spark):
    """text.vocab_topk: counts, doc frequencies, the deterministic
    (count desc, token asc) boundary, and k validation."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.text import vocab_topk

    rows = [
        (0, "apple banana apple"),
        (1, "apple cherry\tbanana"),
        (2, "date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.token, r.n_occurrences, r.n_docs)
           for r in vocab_topk(df, k=3).collect()]
    # apple 3x/2docs; banana 2x/2docs; cherry & date tie at 1 -> cherry
    assert got == [("apple", 3, 2), ("banana", 2, 2), ("cherry", 1, 1)]
    with _pytest.raises(ValueError, match=">= 1"):
        vocab_topk(df, k=0)


def test_tfidf_topk(spark):
    """text.tfidf_topk: tf/df counts, the smoothed-idf formula, the
    deterministic (score desc, token asc) rank, empty docs emitting no
    rows, and k validation."""
    import math

    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.text import tfidf_topk

    rows = [
        (0, "Apple apple banana"),
        (1, "apple cherry"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.token): (r.tf, r.df_docs, r.score, r.rank)
        for r in tfidf_topk(df, k=2).collect()
    }
    # N=3; apple df=2, banana/cherry df=1
    idf = lambda d: math.log(4.0 / (d + 1.0)) + 1.0  # noqa: E731
    assert got[(0, "apple")] == (2, 2, round(2 * idf(2), 6), 1)
    assert got[(0, "banana")] == (1, 1, round(idf(1), 6), 2)
    assert got[(1, "cherry")][3] == 1  # beats apple via higher idf
    assert got[(1, "apple")][3] == 2
    assert not any(d == 2 for d, _ in got)  # empty doc -> no rows
    with _pytest.raises(ValueError, match=">= 1"):
        tfidf_topk(df, k=0)


def test_dsir_sample(spark):
    """sampling.dsir_sample: hashed-ratio log weight vs a hand model,
    Gumbel key determinism across reruns, top-n boundary, empty-doc
    logw = 0, and n validation."""
    import hashlib
    import math

    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        DSIR_LOG_RATIOS,
        dsir_sample,
    )

    rows = [(i, t) for i, t in enumerate(
        ["Apple banana", "apple", "", "cherry date elder"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dsir_sample(df, n=4).collect()}
    assert len(got) == 4

    def logw(words):
        feats = words + [
            f"{a} {b}" for a, b in zip(words, words[1:])
        ]
        s = 0.0
        for f_ in feats:
            s += DSIR_LOG_RATIOS[
                hashlib.md5(f_.encode()).hexdigest()[:2]
            ]
        return s

    def key(i, lw):
        u = (
            int(hashlib.md5(f"{i}|dsir0".encode()).hexdigest()[:4], 16)
            + 1.0
        ) / 65537.0
        return round(lw - math.log(-math.log(u)), 6)

    lw0 = logw(["apple", "banana"])
    assert got[0].log_weight == round(lw0, 6)
    assert got[0].n_features == 3
    assert got[0].sample_key == key(0, lw0)
    assert got[2].log_weight == 0.0 and got[2].n_features == 0
    # top-1 is the max key
    top = dsir_sample(df, n=1).collect()[0]
    assert top.sample_key == max(r.sample_key for r in got.values())
    with _pytest.raises(ValueError, match=">= 1"):
        dsir_sample(df, n=0)


def test_bigram_logprob(spark):
    """text.bigram_logprob: in-table bigram terms, the backoff path,
    the first-term unigram, hit counting, word-order sensitivity, and
    empty/NULL text."""
    from annual_report_pdf_parsers_spark.operators.text import (
        BIGRAM_BACKOFF,
        BIGRAM_LOGPROBS,
        UNIGRAM_LOGPROBS,
        UNKNOWN_LOGPROB,
        bigram_logprob,
    )

    rows = [
        (0, "Of the"),        # bigram hit after lowering
        (1, "the of"),        # same words, no bigram -> backoff
        (2, ""),              # empty
        (3, "zzz"),           # single unknown token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_logprob(df).collect()}

    uni = lambda w: UNIGRAM_LOGPROBS.get(w, UNKNOWN_LOGPROB)  # noqa: E731
    assert got[0].n_bigram_hits == 1
    assert got[0].avg_logprob == round(
        (uni("of") + BIGRAM_LOGPROBS["of the"]) / 2, 6
    )
    assert got[1].n_bigram_hits == 0
    assert got[1].avg_logprob == round(
        (uni("the") + BIGRAM_BACKOFF + uni("of")) / 2, 6
    )
    # order sensitivity: same bag of words, different score
    assert got[0].avg_logprob > got[1].avg_logprob
    assert got[2].n_tokens == 0 and got[2].avg_logprob == 0.0
    assert got[3].avg_logprob == UNKNOWN_LOGPROB


def test_winnow_stats(spark):
    """dedup.winnow_stats: exact copies share every fingerprint, a
    unique doc shares none, sub-k docs emit zero fingerprints, the
    w+k-1 shared-run guarantee produces a match, and k/w validation."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.dedup import (
        winnow_stats,
    )

    shared_run = "one two three four five six seven eight"  # 8 >= w+k-1
    rows = [
        (0, "alpha beta gamma " + shared_run),
        (1, shared_run + " delta epsilon zeta"),
        (2, "totally different words here avoiding any overlap run"),
        (3, "short text"),            # < k tokens
        (4, "alpha beta gamma " + shared_run),   # exact copy of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in winnow_stats(df, k=5, w=4).collect()}
    assert got[3].n_fingerprints == 0 and got[3].shared_frac == 0.0
    assert got[2].n_shared_fp == 0
    # exact copy: every fingerprint shared
    assert got[0].shared_frac == 1.0 and got[4].shared_frac == 1.0
    # the winnowing guarantee: docs 0 and 1 share a >= w+k-1 token run
    assert got[1].n_shared_fp > 0
    with _pytest.raises(ValueError, match=">= 1"):
        winnow_stats(df, k=0)


def test_quality_ensemble_votes(spark):
    """corpus_quality_ensemble at sf0.001: the majority rule is
    non-vacuous — kept and dropped docs both occur, n_pass spans more
    than one value, and keep == (n_pass >= 2) row-by-row."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    rows = QUERIES["corpus_quality_ensemble"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    assert all(r.keep == (r.n_pass >= 2) for r in rows)
    assert len({r.keep for r in rows}) == 2
    assert len({r.n_pass for r in rows}) >= 2


def test_token_drift_topk(spark):
    """text.token_drift_topk: injected-token drift dominates, signed
    log_ratio direction, the min_total floor, lowering, and k/min
    validation."""
    import math

    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.text import (
        token_drift_topk,
    )

    ref = spark.createDataFrame(
        [("aa bb cc aa",), ("aa bb dd",)], "text string"
    )
    new = spark.createDataFrame(
        [("aa bb cc SPAM spam",), ("aa spam spam",)], "text string"
    )
    got = {r.token: r for r in
           token_drift_topk(ref, new, k=10, min_total=2).collect()}
    # 'dd' (1 occurrence total) falls below min_total=2
    assert "dd" not in got
    # spam: 0 -> 4 (lowered) is the top drift; positive = new-heavy
    top = token_drift_topk(ref, new, k=1, min_total=2).collect()[0]
    assert top.token == "spam" and top.log_ratio > 0
    r = got["spam"]
    assert (r.n_ref, r.n_new) == (0, 4)
    t_ref, t_new = 7, 8
    assert r.log_ratio == round(
        math.log((5.0 / (t_new + 1.0)) / (1.0 / (t_ref + 1.0))), 6
    )
    # 'aa' shrank relatively: negative ratio
    assert got["aa"].log_ratio < 0
    with _pytest.raises(ValueError, match=">= 1"):
        token_drift_topk(ref, new, k=0)


def test_token_drift_empty_snapshot(spark):
    """token_drift_topk regression (review finding): a zero-token
    snapshot must produce total = 0 (add-one smoothing still defined),
    not NULL-poisoned ratios."""
    import math

    from annual_report_pdf_parsers_spark.operators.text import (
        token_drift_topk,
    )

    ref = spark.createDataFrame([("",)], "text string")
    new = spark.createDataFrame([("aa aa aa",)], "text string")
    rows = token_drift_topk(ref, new, k=5, min_total=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.token, r.n_ref, r.n_new) == ("aa", 0, 3)
    want = round(math.log((4.0 / 4.0) / (1.0 / 1.0)), 6)
    assert r.log_ratio == want and r.drift == abs(want)


def test_dedup_funnel_monotone(spark):
    """corpus_dedup_funnel at sf0.001: six stages in order, counts
    monotonically non-increasing, and every stage below 'input' fires
    at least once on the dupe fixture (no vacuous stage)."""
    from annual_report_pdf_parsers_spark.queries import QUERIES

    rows = sorted(
        QUERIES["corpus_dedup_funnel"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.stage_no,
    )
    assert [r.stage for r in rows] == [
        "input", "url_dedup", "exact_dedup", "minhash_cc",
        "decontaminate", "quality_quota",
    ]
    counts = [r.n_docs for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[0] > counts[1] > counts[2], counts
    assert counts[-1] > 0


def test_registry_window_contract():
    """Driver-gate registry invariants (ADVICE r04 #1 drift class):
    the CORRECTNESS window is the FIRST 50 keys — both flagship
    entries must sit inside it, every key must be oracled except the
    documented rows-only flagship, and rotation must never lose keys
    (every below-window key is still registered exactly once)."""
    from annual_report_pdf_parsers_spark.queries import (
        QUERIES,
        oracle_sql_dict,
    )

    ks = list(QUERIES)
    window = ks[:50]
    assert "pipeline_extract" in window
    assert "pipeline_oracle" in window
    oracled = oracle_sql_dict()
    assert {k for k in ks if k not in oracled} == {"pipeline_extract"}
    assert all(callable(QUERIES[k]) for k in ks)
    # oracles never dangle: every oracle key is a registered query
    assert set(oracled) <= set(ks)


def test_chunk_dedup_stats(spark):
    """multimodal.chunk_dedup_stats: shared-prefix chunks detected,
    unique tails not, byte sizes exact, empty/NULL blobs zero rows,
    tail chunks unpadded, and chunk validation."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        chunk_dedup_stats,
    )

    rows = [
        (0, b"A" * 100 + b"unique-tail-0"),
        (1, b"A" * 100 + b"other-tail!!!"),
        (2, b"completely different bytes here"),
        (3, b""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {r.doc_id: r for r in
           chunk_dedup_stats(df, chunk_bytes=16).collect()}
    # 113 bytes at 16 -> 8 chunks (7 full + 1 tail); first 6 chunks of
    # A's shared between 0 and 1, the 96..112 chunk and tail differ
    assert (got[0].n_bytes, got[0].n_chunks) == (113, 8)
    assert got[0].n_shared_chunks == 6 and got[0].shared_frac == 0.75
    assert got[1].n_shared_chunks == 6
    assert got[2].n_shared_chunks == 0
    assert (got[3].n_chunks, got[3].shared_frac) == (0, 0.0)
    assert (got[4].n_bytes, got[4].n_chunks) == (0, 0)
    with _pytest.raises(ValueError, match=">= 1"):
        chunk_dedup_stats(df, chunk_bytes=0)


def test_url_templates(spark):
    """urls.url_templates: digit runs collapse to {n} per host, host is
    lowered/www-stripped, min_urls prunes singletons, junk urls group
    under a NULL host instead of failing (try_parse_url), first_doc is
    the smallest member id."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        url_templates,
    )

    df = spark.createDataFrame(
        [
            (1, "https://www.Shop.com/item/12/view"),
            (2, "https://shop.com/item/9934/view"),
            (7, "https://shop.com/item/5/view"),
            (3, "https://shard3.cdn.net/a/1"),
            (4, "https://shard7.cdn.net/a/2"),
            (9, "https://shard3.cdn.net/a/9"),
            (5, "https://shop.com/unique-one-off"),
            (6, "not a url at all 77"),
            (8, "also ::junk:: 77"),
        ],
        "doc_id long, url string",
    )
    got = {
        (r.host, r.template): (r.n_urls, r.first_doc)
        for r in url_templates(df, min_urls=2).collect()
    }
    # the www. host and the bare host produce DIFFERENT templates
    # (template preserves the raw url) but share the host KEY; the two
    # bare-host item urls share one template of size 2
    assert got[("shop.com", "https://shop.com/item/{n}/view")] == (2, 2)
    # shard3: digit collapses inside the template, 2 members survive;
    # shard7's lone url is a (host, template) singleton -> pruned even
    # though shard3 shares the template string (host is part of the key)
    assert got[("shard3.cdn.net", "https://shard{n}.cdn.net/a/{n}")] == (
        2,
        3,
    )
    assert not any(h == "shard7.cdn.net" for h, _ in got)
    # singletons pruned
    assert not any("unique-one-off" in t for _, t in got)
    assert not any("www.Shop.com" in t for _, t in got)
    # junk urls -> NULL host group (2 members, template digits collapse
    # only; they differ in text so each is a singleton and is pruned)
    assert not any(h is None for h, _ in got)


def test_decontaminate_report(spark):
    """dedup.decontaminate_report: per-ITEM counts — a bench item with
    two >=2-shingle corpus matches reports n_contaminating=2 and the
    worst overlap; an item with only a 1-shingle brush reports 0/1; an
    unmatched item reports 0/0 (spine join)."""
    from annual_report_pdf_parsers_spark.operators.dedup import (
        decontaminate_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "alpha beta gamma nope nope2"),
            (4, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),
            (200, "no shingle overlap at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.bench_id: (r.n_contaminating, r.max_overlap)
        for r in decontaminate_report(corpus, bench).collect()
    }
    # item 100 shingles: {a b g, b g d}; doc1/doc2 share both (2),
    # doc3 shares one (1 < min_overlap)
    assert got[100] == (2, 2)
    assert got[200] == (0, 0)


def test_corpus_health_report(spark):
    """text.corpus_health_report: per-language volume/dup/quality/
    encoding stats — dup_frac counts exact md5 identity, the mojibake
    doc flips suspect_frac, NULL lang is its own row."""
    from annual_report_pdf_parsers_spark.operators.text import (
        corpus_health_report,
    )

    df = spark.createDataFrame(
        [
            (1, "en", "one common page body"),
            (2, "en", "one common page body"),
            (3, "en", "a different page"),
            (4, "fr", "page unique ici"),
            (5, None, "broken � here"),
            (6, "fr", None),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.lang: (
            r.n_docs, r.n_tokens, r.n_distinct, r.dup_frac,
            r.suspect_frac,
        )
        for r in corpus_health_report(df).collect()
    }
    assert got["en"] == (3, 11, 2, round(1 - 2 / 3, 6), 0.0)
    # the NULL-text row counts as '' (c4_filters convention): one more
    # fr doc, zero tokens, its own '' digest, not suspect
    assert got["fr"] == (2, 3, 2, 0.0, 0.0)
    assert got[None] == (1, 3, 1, 0.0, 1.0)
    # mean_quality is engine-checked exactly by the driver oracle; here
    # just assert it is a rounded finite double
    assert all(
        r.mean_quality is not None
        for r in corpus_health_report(df).collect()
    )


def test_chunk_windows_rejects_gapping_stride(spark):
    """chunk_windows: stride > size would silently drop tokens between
    windows — the operator refuses (review finding)."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.text import (
        chunk_windows,
    )

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="tile"):
        chunk_windows(df, size=2, stride=3)


def test_sliding_window_counts(spark):
    """temporal.sliding_window_counts: each event lands in exactly
    window/slide hopping windows, bounds are epoch-aligned, the value
    sum is the exact decimal sum."""
    from datetime import datetime

    from annual_report_pdf_parsers_spark.operators.temporal import (
        sliding_window_counts,
    )

    df = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 10, 7), "click", 1.25),
            (datetime(2024, 1, 1, 10, 20), "click", 2.50),
            (datetime(2024, 1, 1, 12, 0), "view", 0.75),
        ],
        "ts timestamp, event_type string, value double",
    )
    rows = sliding_window_counts(
        df, window_len="1 hour", slide="15 minutes"
    ).collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.event_type, []).append(r)
        assert (r.win_end - r.win_start).total_seconds() == 3600
        assert r.win_start.minute % 15 == 0 and r.win_start.second == 0
    # each click event is in 4 windows; the two clicks share the 3
    # windows covering both 10:07 and 10:20 -> 5 distinct windows
    clicks = sorted(
        (r.win_start, r.n_events, r.sum_value)
        for r in per_key["click"]
    )
    assert len(clicks) == 5
    shared = [c for c in clicks if c[1] == 2]
    assert len(shared) == 3 and all(c[2] == 3.75 for c in shared)
    assert len(per_key["view"]) == 4
    assert all(r.n_events == 1 and r.sum_value == 0.75 for r in per_key["view"])


def test_cdc_shift_resistance(spark):
    """multimodal.cdc_chunk_stats: a 1-byte prefix shifts every fixed
    chunk (chunk_dedup_stats shares ~nothing) but CDC boundaries
    re-synchronize and nearly all chunks still match — the reason CDC
    exists."""
    from annual_report_pdf_parsers_spark.operators.multimodal import (
        cdc_chunk_stats,
        chunk_dedup_stats,
    )

    body = ("The quick brown fox jumps over the lazy dog. " * 20).encode()
    df = spark.createDataFrame(
        [(1, body), (2, b"X" + body), (3, b"short and unique"), (4, None)],
        "doc_id long, blob binary",
    )
    cdc = {r.doc_id: r for r in cdc_chunk_stats(df).collect()}
    fixed = {r.doc_id: r for r in chunk_dedup_stats(df).collect()}
    assert cdc[1].shared_frac > 0.9 and cdc[2].shared_frac > 0.9
    assert fixed[1].shared_frac == 0.0 and fixed[2].shared_frac == 0.0
    assert cdc[3].n_shared_chunks == 0
    # NULL blob -> 0-row shape on both
    assert (cdc[4].n_bytes, cdc[4].n_chunks, cdc[4].shared_frac) == (0, 0, 0.0)
    # byte accounting: chunks tile the blob exactly (no gaps/overlap)
    assert cdc[1].n_bytes == len(body)


def test_html_main_content(spark):
    """html.main_content: script/style/comment stripped, nav+footer
    dropped by link density, short blocks dropped by length, entities
    decoded, NULL html -> empty shape, tagless text is one good
    block."""
    from annual_report_pdf_parsers_spark.operators.html import (
        main_content,
    )

    page = (
        "<html><head><script>var x=1;</script>"
        "<style>p{color:red}</style></head><body><!-- c -->"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<div><p>This is the real article body with plenty of"
        " visible words to keep, about things &amp; stuff.</p>"
        "<p>Second good paragraph with enough characters to pass"
        " the minimum length bar easily, q&quot;d.</p></div>"
        "<div>short</div>"
        "<footer><a href='/tos'>Terms of service and privacy"
        " information</a> (c)</footer></body></html>"
    )
    plain = (
        "no tags at all just plain text that is long enough"
        " to be one good block"
    )
    df = spark.createDataFrame(
        [(1, page), (2, None), (3, plain)],
        "doc_id long, html string",
    )
    got = {r.doc_id: r for r in main_content(df).collect()}
    assert got[1].n_good == 2
    assert "real article body" in got[1].main_text
    assert "things & stuff" in got[1].main_text  # entity decoded
    assert 'q"d' in got[1].main_text
    assert "Home" not in got[1].main_text  # nav dropped
    assert "Terms" not in got[1].main_text  # footer dropped
    assert "short" not in got[1].main_text  # length bar
    assert "var x" not in got[1].main_text  # script stripped
    assert (got[2].n_blocks, got[2].main_text, got[2].link_frac) == (
        0,
        "",
        None,
    )
    assert got[3].n_good == 1 and got[3].main_text == plain


def test_html_outline(spark):
    """html.outline: ordered (pos, level, heading) rows; inline tags
    stripped, entities decoded, blank headings kept as '', docs
    without headings (or NULL html) emit nothing."""
    from annual_report_pdf_parsers_spark.operators.html import outline

    df = spark.createDataFrame(
        [
            (
                1,
                "<h1>Title &amp; Co</h1><p>x</p>"
                "<h2 class='s'>Section <b>One</b></h2>"
                "<h3>   </h3><h2>Two</h2>",
            ),
            (2, "no headings here"),
            (3, None),
        ],
        "doc_id long, html string",
    )
    got = {}
    for r in outline(df).collect():
        got.setdefault(r.doc_id, []).append((r.pos, r.level, r.heading))
    assert sorted(got[1]) == [
        (0, 1, "Title & Co"),
        (1, 2, "Section One"),
        (2, 3, ""),
        (3, 2, "Two"),
    ]
    assert 2 not in got and 3 not in got


def test_main_content_context_promotion(spark):
    """context_pass=True: a short block between good neighbors is
    promoted; short blocks adjacent to link-dominated blocks are not;
    edges count as good."""
    from annual_report_pdf_parsers_spark.operators.html import (
        main_content,
    )

    page = (
        "<p>A first good paragraph long enough to clear the length"
        " bar easily today.</p>"
        "<h3>Short heading</h3>"
        "<p>A second good paragraph that is also long enough to"
        " clear the bar today.</p>"
        "<div><a href='/'>nav nav nav</a></div>"
        "<p>tiny</p>"
        "<div><a href='/x'>more nav links</a></div>"
        "<p>lead-in</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    plain = main_content(df).collect()[0]
    ctx = main_content(df, context_pass=True).collect()[0]
    assert plain.n_good == 2 and "Short heading" not in plain.main_text
    assert ctx.n_good == 3 and "Short heading" in ctx.main_text
    assert "tiny" not in ctx.main_text  # bad neighbors
    assert "lead-in" not in ctx.main_text  # prev non-short is bad


def test_html_entity_amp_last(spark):
    """Entity decode order regression (review finding): '&amp;lt;' is
    an author DISPLAYING a literal '&lt;' — it must single-decode to
    '&lt;', not double-decode to '<'."""
    from annual_report_pdf_parsers_spark.operators.html import (
        main_content,
    )

    page = (
        "<p>To show a tag write &amp;lt;div&amp;gt; in your source"
        " and it renders literally for readers.</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    r = main_content(df).collect()[0]
    assert "&lt;div&gt;" in r.main_text
    assert "<div>" not in r.main_text


def test_outline_ignores_comments_and_scripts(spark):
    """Outline strip regression (review finding): commented-out or
    scripted headings are not part of the document outline."""
    from annual_report_pdf_parsers_spark.operators.html import outline

    df = spark.createDataFrame(
        [
            (
                1,
                "<!-- <h2>old draft</h2> --><h1>Real</h1>"
                '<script>x("<h2>fake</h2>")</script><h2>Also real</h2>',
            )
        ],
        "doc_id long, html string",
    )
    got = [(r.pos, r.level, r.heading) for r in outline(df).collect()]
    assert sorted(got) == [(0, 1, "Real"), (1, 2, "Also real")]


def test_html_metadata(spark):
    """html.metadata: first match wins per field, cased tags + entity
    decode + ws collapse on title/description, commented/scripted fake
    titles lose, raw canonical href, lowercased lang/charset (bare
    charset accepted), absent-or-blank -> NULL, NULL html -> all-NULL
    row, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import metadata

    rows = [
        (
            1,
            '<html lang="EN-us"><head>'
            "<TITLE>  A &amp; B  </TITLE><title>second</title>"
            "<meta name='description' content='  d &lt;1&gt;  '>"
            '<link rel="canonical" href="https://Ex.com/p?a=1&amp;b=2">'
            "<meta charset=UTF-8></head><body></body></html>",
        ),
        (
            2,
            "<!-- <title>ghost</title> -->"
            '<script>var t="<title>zz</title>";</script>'
            "<title></title><p>no head fields</p>",
        ),
        (3, None),
    ]
    got = {
        r.doc_id: r
        for r in metadata(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    }
    r1 = got[1]
    assert r1.title == "A & B"
    assert r1.meta_description == "d <1>"
    # href stays RAW (entities included) — the links() contract
    assert r1.canonical_url == "https://Ex.com/p?a=1&amp;b=2"
    assert r1.html_lang == "en-us"
    assert r1.charset == "utf-8"
    for doc in (2, 3):
        r = got[doc]
        assert (
            r.title,
            r.meta_description,
            r.canonical_url,
            r.html_lang,
            r.charset,
        ) == (None, None, None, None, None)
    clash = spark.createDataFrame(
        [(1, "<p>x</p>", "t")], "doc_id long, html string, _md_h string"
    )
    with _pytest.raises(ValueError, match="_md_h"):
        metadata(clash)


def test_robots_filter(spark):
    """urls.robots_filter: longest prefix wins, allow wins exact ties,
    unlisted host / junk url / no matching prefix -> allowed, bare url
    path counts as '/', staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.urls import (
        robots_filter,
    )

    rules = spark.createDataFrame(
        [
            ("a.com", "/", False),
            ("a.com", "/pub/", True),
            ("t.com", "/x/", True),
            ("t.com", "/x/", False),
            ("b.com", "/priv/", False),
        ],
        "host string, path_prefix string, allow boolean",
    )
    urls = [
        (1, "https://a.com/pub/ok"),       # longest = /pub/ allow
        (2, "https://a.com/secret"),       # only '/' matches -> block
        (3, "https://www.A.com"),          # bare -> '/' -> block
        (4, "https://t.com/x/page"),       # exact tie -> allow wins
        (5, "https://b.com/open"),         # no matching prefix
        (6, "https://z.com/p"),            # unlisted host
        (7, "totally junk"),               # NULL host
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r.doc_id: (r.allowed, r.matched_prefix)
        for r in robots_filter(df, rules).collect()
    }
    assert got == {
        1: (True, "/pub/"),
        2: (False, "/"),
        3: (False, "/"),
        4: (True, "/x/"),
        5: (True, None),
        6: (True, None),
        7: (True, None),
    }
    clash = spark.createDataFrame(
        [(1, "https://a.com/", 0)], "doc_id long, url string, _rb_h int"
    )
    with _pytest.raises(ValueError, match="_rb_h"):
        robots_filter(clash, rules)


def test_anchor_terms(spark):
    """html.anchor_terms: absolute hrefs resolve to the target host,
    relative to the source, junk absolutes fall back to the source;
    terms lowercased, blanks and NULL-src rows dropped; top-k prunes
    with (count DESC, term ASC) ties."""
    from annual_report_pdf_parsers_spark.operators.html import (
        anchor_terms,
    )

    rows = [
        (1, "h1.net", "https://T.com/a", "Click Here"),
        (2, "h1.net", "https://t.com/b", "click now"),
        (3, "h2.net", "/rel", "Self Link"),
        (4, "h2.net", "https://:junk//", "Fallback"),
        (5, None, "https://t.com/c", "dropped"),
        (6, "h1.net", "https://t.com/d", ""),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, src_host string, href string, anchor string"
    )
    got = {
        (r.dst_host, r.term): (r.n_links, r.rnk)
        for r in anchor_terms(df, k=2).collect()
    }
    # t.com counts: click=2, here=1, now=1 -> k=2 keeps click, here
    assert got[("t.com", "click")] == (2, 1)
    assert got[("t.com", "here")] == (1, 2)
    assert ("t.com", "now") not in got
    # h2.net has fallback/link/self all at count 1 -> k=2 keeps the
    # term-ASC pair (fallback, link); 'self' is pruned
    assert got[("h2.net", "fallback")] == (1, 1)
    assert got[("h2.net", "link")] == (1, 2)
    assert ("h2.net", "self") not in got
    assert all(t != "dropped" for (h, t) in got)


def test_graph_hits(spark):
    """graph.hits on a hand-checked hub/authority graph: A->X, B->X,
    B->Y (unit weights).  After one iteration auth concentrates on X
    (2/3 vs 1/3), hubs on B (0.6 vs 0.4); pure sources score 0 auth,
    pure sinks 0 hub; iterations<1 raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("A", "X", 1), ("B", "X", 1), ("B", "Y", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = {r.node: (r.hub, r.auth) for r in
           hits(edges, iterations=1).collect()}
    assert got["X"][1] == _pytest.approx(2 / 3, abs=1e-9)
    assert got["Y"][1] == _pytest.approx(1 / 3, abs=1e-9)
    assert got["A"][0] == _pytest.approx(0.4, abs=1e-9)
    assert got["B"][0] == _pytest.approx(0.6, abs=1e-9)
    assert got["A"][1] == 0.0 and got["B"][1] == 0.0
    assert got["X"][0] == 0.0 and got["Y"][0] == 0.0
    with _pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)


def test_cdc_boundary_hex_case(spark):
    """cdc boundary_hex case regression (review finding): md5 hex is
    lowercase — 'A' and 'a' must select the same boundaries, and
    non-hex still raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.multimodal import (
        cdc_chunk_stats,
    )

    body = ("boundary case probe text " * 30).encode()
    df = spark.createDataFrame(
        [(1, body), (2, b"Y" + body)], "doc_id long, blob binary"
    )
    up = {r.doc_id: r.n_chunks for r in
          cdc_chunk_stats(df, boundary_hex="A").collect()}
    lo = {r.doc_id: r.n_chunks for r in
          cdc_chunk_stats(df, boundary_hex="a").collect()}
    assert up == lo and up[1] > 1
    with _pytest.raises(ValueError, match="hex"):
        cdc_chunk_stats(df, boundary_hex="g")


def test_publish_date(spark):
    """html.publish_date: meta > time > url priority with INVALID
    candidates falling through (Feb 30 meta -> leap-day time; non-leap
    Feb 29 time -> url), unpadded url dates zero-padded, missing url
    day -> 01, out-of-window years rejected, free-text datetimes
    rejected, commented-out meta ignored, NULL html/url -> NULL row,
    url_col=None skips the url source, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        publish_date,
    )

    rows = [
        (
            1,
            '<meta property="article:published_time" '
            'content="2021-03-05T10:00:00Z">'
            '<time datetime="2020-01-01">x</time>',
            "https://a.com/2019/01/02/x",
        ),
        (2, '<meta name="DC.date.issued" content="2019-11-30">', None),
        (
            3,
            '<meta name="date" content="2020-13-01">'
            '<time datetime="2020-02-29T08:00">y</time>',
            None,
        ),
        (
            4,
            '<time datetime="2021-02-29">z</time>',
            "https://b.org/2018/7/4/post",
        ),
        (5, "<p>n</p>", "https://b.org/2017/05/page"),
        (6, "<p>n</p>", "https://b.org/plain"),
        (7, None, None),
        (
            8,
            '<!-- <meta name="date" content="2020-01-01"> -->'
            '<time datetime="May 5, 2020">w</time>',
            "https://c.io/1994/05/06/old",
        ),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, html string, url string"
    )
    got = {
        r.doc_id: (r.pub_date, r.date_source)
        for r in publish_date(df).collect()
    }
    assert got[1] == ("2021-03-05", "meta")
    assert got[2] == ("2019-11-30", "meta")
    assert got[3] == ("2020-02-29", "time")
    assert got[4] == ("2018-07-04", "url")
    assert got[5] == ("2017-05-01", "url")
    for doc in (6, 7, 8):
        assert got[doc] == (None, None), doc
    no_url = {
        r.doc_id: (r.pub_date, r.date_source)
        for r in publish_date(df, url_col=None).collect()
    }
    assert no_url[4] == (None, None)
    assert no_url[1] == ("2021-03-05", "meta")
    with _pytest.raises(ValueError, match="clash"):
        publish_date(
            spark.createDataFrame(
                [(1, "x", "u", "y")],
                "doc_id long, html string, url string, _pd_h string",
            )
        )


def test_fix_mojibake(spark):
    """encoding.fix_mojibake: cp1252 mojibake repaired with exact
    per-pass counts, clean text and NULL untouched (NULL -> ''), the
    derived pair table includes the sloppy-cp1252 control-char case
    (U+009D for the right double quote), and the documented
    order-dependence on corrupt partial sequences is pinned."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.encoding import (
        MOJIBAKE_PAIRS,
        fix_mojibake,
    )

    # the ” pattern really carries the sloppy-cp1252 control char
    assert ("â€\u009d", "”") in MOJIBAKE_PAIRS
    rows = [
        (1, "CafÃ© â€™quotedâ€™ costs â‚¬9 â€” naÃ¯ve"),
        (2, "plain ascii text"),
        (3, None),
        (4, "Â«qÂ» at 20Â°C Ã± Ã¼ â€\u009dend"),
        # corrupt partial sequence: repairing the '“' mints the tail
        # of the en-dash pattern ('â€' + '“' == 'â€“') — the later
        # pass then fires; deterministic, mirrored in the oracle
        (5, "â€â€œ"),
    ]
    got = {
        r.doc_id: r
        for r in fix_mojibake(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[1].text == "Café ’quoted’ costs €9 — naïve"
    assert got[1].n_fixes == 6 and got[1].had_mojibake
    assert got[2].text == "plain ascii text"
    assert got[2].n_fixes == 0 and not got[2].had_mojibake
    assert got[3].text == "" and got[3].n_fixes == 0
    assert got[4].text == "«q» at 20°C ñ ü ”end"
    assert got[4].n_fixes == 6
    assert got[5].text == "–" and got[5].n_fixes == 2
    with _pytest.raises(ValueError, match="clash"):
        fix_mojibake(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, text string, _mj_0 string"
            )
        )


def test_html_tables(spark):
    """html.tables: cell grid as relational rows — header flags,
    entity decode, empty cell '', ragged rows, cell-less rows emit
    nothing (row_no stays positional), nested-table truncation is
    deterministic, commented/scripted/<track>/<thead> decoys never
    match, NULL/table-less html emits nothing, staging clash
    raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import tables

    rows = [
        (
            1,
            '<p>x</p><TABLE border="1"><thead><tr><th>Name</th>'
            '<th CLASS="v">Val &amp; Co</th></tr></thead><tbody>'
            "<tr><td>A1</td><td>42</td></tr>"
            '<tr class="alt"><td>B2</td><td></td></tr></tbody></TABLE>'
            "<!-- <table><tr><td>ghost</td></tr></table> -->"
            '<track src="x">'
            '<script>var t = "<table><tr><td>js</td></tr></table>";'
            "</script>",
        ),
        (
            2,
            "<table><tr><td>outer<table><tr><td>inner</td></tr>"
            "</table></td></tr></table>",
        ),
        (3, None),
        (4, "<div>no tables</div>"),
        (
            5,
            "<table><tr>\n</tr><tr><td\n>ws attr</td></tr></table>"
            '<table id="t2"><tr><td>T2</td></tr></table>',
        ),
    ]
    got = [
        tuple(r)
        for r in tables(
            spark.createDataFrame(rows, "doc_id long, html string")
        )
        .orderBy("doc_id", "table_no", "row_no", "col_no")
        .collect()
    ]
    assert got == [
        (1, 0, 0, 0, True, "Name"),
        (1, 0, 0, 1, True, "Val & Co"),
        (1, 0, 1, 0, False, "A1"),
        (1, 0, 1, 1, False, "42"),
        (1, 0, 2, 0, False, "B2"),
        (1, 0, 2, 1, False, ""),
        # nested: outer body truncates at the inner's close -> the
        # single cell's content tag-strips to both text runs
        (2, 0, 0, 0, False, "outer inner"),
        # the cell-less <tr> keeps its row_no slot (row 0 skipped)
        (5, 0, 1, 0, False, "ws attr"),
        (5, 1, 0, 0, False, "T2"),
    ]
    with _pytest.raises(ValueError, match="clash"):
        tables(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, html string, _tb_raw string",
            )
        )


def test_html_lists(spark):
    """html.lists: ul/ol items as relational rows — ordered flags,
    entity decode, empty item '', whitespace in the open tag, unclosed
    items dropped, nested truncation attributes inner closed items to
    the outer list, commented/scripted/<link> decoys never match,
    NULL/list-less html emits nothing, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import lists

    rows = [
        (
            1,
            '<p>x</p><UL class="menu"><li>First &amp; A</li>'
            '<li CLASS="x">Second</li><li\n>Ws</li><li></li>'
            "<li>dropped no close</UL>"
            '<OL start="3"><li>Step 1</li></OL>'
            "<!-- <ul><li>ghost</li></ul> -->"
            '<link href="x">'
            '<script>var l = "<ol><li>js</li></ol>";</script>',
        ),
        # nested: outer <ul> body truncates at the inner's </ol>, so
        # the inner's closed item attributes to the OUTER list
        (2, "<ul><li>outer</li><ol><li>inner</li></ol></ul>"),
        (3, None),
        (4, "<div>no lists</div>"),
    ]
    got = [
        tuple(r)
        for r in lists(
            spark.createDataFrame(rows, "doc_id long, html string")
        )
        .orderBy("doc_id", "list_no", "item_no")
        .collect()
    ]
    assert got == [
        (1, 0, False, 0, "First & A"),
        (1, 0, False, 1, "Second"),
        (1, 0, False, 2, "Ws"),
        (1, 0, False, 3, ""),
        (1, 1, True, 0, "Step 1"),
        (2, 0, False, 0, "outer"),
        (2, 0, False, 1, "inner"),
    ]
    with _pytest.raises(ValueError, match="clash"):
        lists(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, html string, _li_raw string",
            )
        )


def test_html_links_and_graph(spark):
    """html.links: quoted hrefs only, comments/scripts stripped,
    href-less anchors skipped, anchors cleaned; host_link_graph:
    relative -> self-edge, absolute normalized lower/www, NULL source
    hosts dropped."""
    from pyspark.sql import functions as F

    from annual_report_pdf_parsers_spark.operators.html import (
        host_link_graph,
        links,
    )

    df = spark.createDataFrame(
        [
            (
                1,
                '<a href="https://other.com/p">External &amp; x</a>'
                '<a href="/local">Relative</a>'
                "<a href='https://www.Other.com/q'>Cased</a>"
                '<!-- <a href="https://hidden.com">no</a> -->'
                '<a name="n">no href</a>',
            ),
            (2, None),
        ],
        "doc_id long, html string",
    )
    lk = links(df)
    rows = [(r.doc_id, r.pos, r.href, r.anchor) for r in lk.collect()]
    assert sorted(rows) == [
        (1, 0, "https://other.com/p", "External & x"),
        (1, 1, "/local", "Relative"),
        (1, 2, "https://www.Other.com/q", "Cased"),
    ]
    g = {
        (r.src_host, r.dst_host): (r.n_links, r.n_docs)
        for r in host_link_graph(
            lk.withColumn("src_host", F.lit("me.org"))
        ).collect()
    }
    assert g[("me.org", "other.com")] == (2, 1)
    assert g[("me.org", "me.org")] == (1, 1)


def test_pagerank_matches_python_model(spark):
    """graph.pagerank vs a direct Python model with the identical
    round-then-decimal-sum arithmetic: weighted edges, dangling-node
    leak, teleport floor for in-edge-less nodes."""
    from decimal import Decimal

    from annual_report_pdf_parsers_spark.operators.graph import pagerank

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("d", "a", 1)]
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    wd = {}
    for srch, _, w in edges:
        wd[srch] = wd.get(srch, 0) + w
    pr = {v: round(1.0 / n, 12) for v in nodes}
    d = 0.85
    for _ in range(3):
        sums = {v: Decimal(0) for v in nodes}
        for srch, dsth, w in edges:
            sums[dsth] += Decimal(
                repr(round(pr[srch] * w / wd[srch], 12))
            )
        pr = {
            v: round((1.0 - d) / n + d * float(sums[v]), 12)
            for v in nodes
        }
    got = {r.node: r.pr for r in pagerank(df, iterations=3).collect()}
    assert got == pr
    # c receives from both a and b; d has no in-edges -> teleport floor
    assert got["c"] > got["d"]
    assert got["d"] == round((1.0 - d) / n, 12)


def test_sitemap_entries(spark):
    """urls.sitemap_entries: url + sitemapindex blocks as rows —
    is_index flags, entity-decoded/trimmed loc, lastmod ''/absent ->
    NULL, loc-less blocks dropped (entry_no keeps the source gap),
    cased tags + attrs match, commented-out decoys never match,
    host = shared normalization (www-strip/lower; junk -> NULL),
    NULL/entry-less xml emits nothing, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.urls import (
        sitemap_entries,
    )

    rows = [
        (
            1,
            '<?xml version="1.0"?><urlset>'
            "<url><loc> https://www.Site.com/a&amp;b </loc>"
            "<lastmod>2024-01-15</lastmod></url>"
            "<URL week=\"x\"><loc>https://site.com/two</loc>"
            "<lastmod>  </lastmod></URL>"
            "<url><priority>0.5</priority></url>"
            "<sitemap><loc>https://site.com/s1.xml</loc></sitemap>"
            "<!-- <url><loc>https://ghost.com/</loc></url> -->"
            "</urlset>",
        ),
        (2, "<urlset><url><loc>junk no scheme</loc></url></urlset>"),
        (3, None),
        (4, "<urlset></urlset>"),
    ]
    got = [
        tuple(r)
        for r in sitemap_entries(
            spark.createDataFrame(rows, "doc_id long, xml string")
        )
        .orderBy("doc_id", "entry_no")
        .collect()
    ]
    assert got == [
        (1, 0, False, "https://www.Site.com/a&b", "2024-01-15", "site.com"),
        (1, 1, False, "https://site.com/two", None, "site.com"),
        (1, 3, True, "https://site.com/s1.xml", None, "site.com"),
        (2, 0, False, "junk no scheme", None, None),
    ]
    with _pytest.raises(ValueError, match="clash"):
        sitemap_entries(
            spark.createDataFrame(
                [(1, "<x/>", "y")],
                "doc_id long, xml string, _site_loc string",
            )
        )


def test_html_jsonld(spark):
    """html.jsonld: ld+json script blocks as rows — root object and
    root array ($[0]) shapes, scalar-only values (nested object ->
    NULL), \\u escapes decoded, malformed block keeps its row with
    is_valid False, type attribute in any position/quote style,
    plain-script + commented decoys never match, NULL/blockless html
    emits nothing, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import jsonld

    rows = [
        (
            1,
            "<head><script>var x = 1;</script>"
            '<script async type="application/ld+json">'
            '{"@type": "Article", "name": "Caf\\u00e9 \\u0026 Bar",'
            ' "headline": "H1", "datePublished": "2024-03-05",'
            ' "author": {"@type": "Person"}}</script>'
            "<!-- <script type=\"application/ld+json\">"
            '{"@type": "Ghost"}</script> -->'
            "<script type='application/ld+json'>"
            '[{"@type": "Product", "name": "P9"},'
            ' {"@type": "Ignored"}]</script></head>',
        ),
        # malformed JSON: row kept, is_valid False, all fields NULL;
        # nested-object name -> NULL under the scalar-only contract
        (
            2,
            '<script type="application/ld+json">{"name": </script>'
            '<script type="application/ld+json">'
            '{"@type": "Thing", "name": {"x": 1}}</script>',
        ),
        (3, None),
        (4, "<script>no type</script><p>x</p>"),
    ]
    got = [
        tuple(r)
        for r in jsonld(
            spark.createDataFrame(rows, "doc_id long, html string")
        )
        .orderBy("doc_id", "block_no")
        .collect()
    ]
    assert got == [
        (1, 0, True, "Article", "Café & Bar", "H1", "2024-03-05"),
        (1, 1, True, "Product", "P9", None, None),
        (2, 0, False, None, None, None, None),
        (2, 1, True, "Thing", None, None, None),
    ]
    with _pytest.raises(ValueError, match="clash"):
        jsonld(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, html string, _jl_b string",
            )
        )


def test_feed_items(spark):
    """urls.feed_items: RSS item (text link, pubDate, entity decode)
    and Atom entry (href link, updated) in one pass — CDATA titles
    taken literally (no entity expansion), absent/blank fields NULL,
    junk link -> NULL host, <linkage> never matches <link>, commented
    items never match, NULL/feed-less xml emits nothing, staging
    clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.urls import feed_items

    rows = [
        (
            1,
            "<rss><channel><title>Chan</title>"
            "<item><title> Breaking &amp; A </title>"
            "<link>https://www.News1.com/a/1?x=1&amp;y=2</link>"
            "<pubDate> Mon, 05 Jan 2024 </pubDate></item>"
            "<item><title><![CDATA[C &amp; D]]></title></item>"
            "<item><linkage>z</linkage><link>junk url</link></item>"
            "<!-- <item><title>ghost</title></item> -->"
            "</channel></rss>",
        ),
        (
            2,
            '<feed><entry><title type="text">Atom T</title>'
            '<link rel="alternate" href="https://blog2.example/p/3"/>'
            "<updated>2024-02-05</updated></entry></feed>",
        ),
        (3, None),
        (4, "<rss><channel><title>empty</title></channel></rss>"),
    ]
    got = [
        tuple(r)
        for r in feed_items(
            spark.createDataFrame(rows, "doc_id long, xml string")
        )
        .orderBy("doc_id", "item_no")
        .collect()
    ]
    assert got == [
        (
            1, 0, False, "Breaking & A",
            "https://www.News1.com/a/1?x=1&y=2",
            "Mon, 05 Jan 2024", "news1.com",
        ),
        # CDATA literal: the &amp; inside CDATA is NOT decoded
        (1, 1, False, "C &amp; D", None, None, None),
        (1, 2, False, None, "junk url", None, None),
        (2, 0, True, "Atom T", "https://blog2.example/p/3",
         "2024-02-05", "blog2.example"),
    ]
    with _pytest.raises(ValueError, match="clash"):
        feed_items(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, xml string, _fd_b string",
            )
        )


def test_hreflang_alternates(spark):
    """html.hreflang_alternates: rel token-list rule (alternate in a
    multi-token rel qualifies, 'alternated' does not), any attribute
    order/quote style, whitespace boundary (data-href never matches),
    hreflang lowercased, x-default flag, entity-decoded href, link_no
    gaps stable under filtering, commented/scripted decoys never
    match, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        hreflang_alternates,
    )

    rows = [
        (
            1,
            '<link rel="stylesheet" href="s.css">'
            '<link hreflang="FR" rel="alternate" '
            "href='https://www.Ex1.com/fr?a=1&amp;b=2'>"
            '<link rel="alternate help" hreflang="x-default" '
            'href="https://ex1.com/">'
            '<link rel="alternated" hreflang="de" href="https://x.de/">'
            '<link rel="alternate" hreflang="" href="https://y.com/">'
            '<link rel="alternate" hreflang="es" href="">'
            '<link rel="alternate" hreflang="pt" data-href="https://z.pt/">'
            "<!-- <link rel=\"alternate\" hreflang=\"it\" href=\"https://g.it/\"> -->"
            '<script>var l = \'<link rel="alternate" hreflang="nl" href="https://j.nl/">\';</script>',
        ),
        (2, None),
        (3, "<p>no links</p>"),
    ]
    got = [
        tuple(r)
        for r in hreflang_alternates(
            spark.createDataFrame(rows, "doc_id long, html string")
        )
        .orderBy("doc_id", "link_no")
        .collect()
    ]
    assert got == [
        (1, 1, "fr", "https://www.Ex1.com/fr?a=1&b=2", False, "ex1.com"),
        (1, 2, "x-default", "https://ex1.com/", True, "ex1.com"),
    ]
    with _pytest.raises(ValueError, match="clash"):
        hreflang_alternates(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, html string, _hl_t string",
            )
        )


def test_feed_discovery(spark):
    """html.feed_discovery: rel token-list + lowered mime gate, rss vs
    atom mapping, relative href -> NULL host, wrong-type / wrong-rel /
    blank-href / commented decoys never match, link_no gaps stable,
    staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        feed_discovery,
    )

    rows = [
        (
            1,
            '<link rel="alternate" type="text/html" href="https://m.ex/">'
            '<link rel="alternate feed" type="APPLICATION/RSS+XML" '
            "href='https://Ex.com/f.xml?a=1&amp;2'>"
            "<link type='application/atom+xml' rel='alternate' "
            "href='/atom.xml'>"
            '<link rel="stylesheet" type="application/rss+xml" href="https://s.ex/f.xml">'
            '<link rel="alternate" type="application/rss+xml" href="">'
            '<!-- <link rel="alternate" type="application/rss+xml" href="https://g.ex/f.xml"> -->',
        ),
        (2, None),
    ]
    got = [
        tuple(r)
        for r in feed_discovery(
            spark.createDataFrame(rows, "doc_id long, html string")
        )
        .orderBy("doc_id", "link_no")
        .collect()
    ]
    assert got == [
        (1, 1, "rss", "https://Ex.com/f.xml?a=1&2", "ex.com"),
        (1, 2, "atom", "/atom.xml", None),
    ]
    with _pytest.raises(ValueError, match="clash"):
        feed_discovery(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, html string, _fd_t string"
            )
        )


def test_crawl_diff(spark):
    """urls.crawl_diff: all four statuses, NULL text digests as '',
    within-snapshot duplicate urls resolve by MIN digest, missing-side
    digest NULL."""
    from annual_report_pdf_parsers_spark.operators.urls import crawl_diff

    old = spark.createDataFrame(
        [
            ("u1", "same"),
            ("u2", "before"),
            ("u3", "gone"),
            ("u4", None),       # NULL text == ''
            ("u5", "bbb"),      # duplicate url in one snapshot:
            ("u5", "aaa"),      # MIN digest wins deterministically
        ],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [
            ("u1", "same"),
            ("u2", "after"),
            ("u4", ""),
            ("u6", "brand new"),
            ("u5", "aaa"),
        ],
        "url string, text string",
    )
    got = {
        r["url"]: (
            r["status"],
            r["old_digest"] is None,
            r["new_digest"] is None,
        )
        for r in crawl_diff(old, new).collect()
    }
    import hashlib

    min_u5 = min(
        hashlib.md5(b"aaa").hexdigest(), hashlib.md5(b"bbb").hexdigest()
    )
    u5_status = (
        "unchanged"
        if min_u5 == hashlib.md5(b"aaa").hexdigest()
        else "changed"
    )
    assert got == {
        "u1": ("unchanged", False, False),
        "u2": ("changed", False, False),
        "u3": ("removed", False, True),
        "u4": ("unchanged", False, False),  # NULL == '' -> same digest
        "u5": (u5_status, False, False),
        "u6": ("added", True, False),
    }


def test_images_and_captions(spark):
    """html.images: src required (data-src never matches, gap kept in
    img_no), alt block-text cleaned (absent AND blank -> NULL),
    relative src -> NULL host, commented/scripted decoys never match.
    image_captions: < min tokens filtered, keep-best = longest alt
    then lexicographic then doc_id, n_refs counts qualifying refs."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        image_captions,
        images,
    )

    rows = [
        (
            1,
            '<img data-src="https://lazy.ex/l.jpg" alt="never matched">'
            '<img src="https://a.ex/i.jpg" alt="a  big &amp; shiny thing">'
            "<img src='/rel/p.png'>"
            '<img src="https://b.ex/j.jpg" alt="">'
            '<!-- <img src="https://g.ex/c.jpg" alt="ghost gone now"> -->',
        ),
        # same src as doc 1's first real img, longer alt -> wins
        (2, '<img src="https://a.ex/i.jpg" alt="a much longer caption here">'),
        # same src, same LENGTH as doc 2's alt -> lexicographic tie-break
        (3, '<img src="https://a.ex/i.jpg" alt="z much longer caption here">'),
        (4, '<img src="https://a.ex/i.jpg" alt="too short">'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    imgs = {
        (r["doc_id"], r["img_no"]): (r["src"], r["alt"], r["host"])
        for r in images(df).collect()
    }
    assert imgs == {
        (1, 1): ("https://a.ex/i.jpg", "a big & shiny thing", "a.ex"),
        (1, 2): ("/rel/p.png", None, None),
        (1, 3): ("https://b.ex/j.jpg", None, "b.ex"),
        (2, 0): ("https://a.ex/i.jpg", "a much longer caption here", "a.ex"),
        (3, 0): ("https://a.ex/i.jpg", "z much longer caption here", "a.ex"),
        (4, 0): ("https://a.ex/i.jpg", "too short", "a.ex"),
    }
    caps = {
        r["src"]: (r["alt"], r["alt_tokens"], r["n_refs"])
        for r in image_captions(images(df)).collect()
    }
    # 'too short' (2 tokens) filtered; longest wins; length tie ->
    # lexicographic min ('a...' < 'z...')
    assert caps == {
        "https://a.ex/i.jpg": ("a much longer caption here", 5, 3),
    }
    with _pytest.raises(ValueError, match="min_alt_tokens"):
        image_captions(images(df), min_alt_tokens=0)
    with _pytest.raises(ValueError, match="clash"):
        images(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, html string, _im_t string"
            )
        )


def test_dom_stats(spark):
    """html.dom_stats: boundary-guarded open-tag counts (<pre> is not
    <p>, </p> never counts), style/script/comment regions stripped
    before counting, block-text text_chars, guarded markup_frac (0.0
    on empty/NULL), staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import dom_stats

    html1 = (
        "<style>p{x}</style><div><p>ab&amp;c</p><pre>q</pre>"
        '<a href="u">t</a></div>'
        "<script><p>ghost</p></script><!-- <table> -->"
    )
    rows = [(1, html1), (2, None), (3, "plain text only")]
    got = {
        r["doc_id"]: (
            r["n_tags"],
            r["n_p"],
            r["n_div"],
            r["n_table"],
            r["n_li"],
            r["n_a"],
            r["text_chars"],
        )
        for r in dom_stats(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    }
    # stripped html1: <div><p>ab&amp;c</p><pre>q</pre><a href="u">t</a></div>
    # tags: div p /p pre /pre a /a /div = 8; text 'ab&c q t' = 8 chars
    assert got == {
        1: (8, 1, 1, 0, 0, 1, 8),
        2: (0, 0, 0, 0, 0, 0, 0),
        3: (0, 0, 0, 0, 0, 0, len("plain text only")),
    }
    mf = {
        r["doc_id"]: r["markup_frac"]
        for r in dom_stats(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    }
    assert mf[2] == 0.0
    assert mf[3] == 0.0  # all text: 1 - 15/15
    assert 0.0 < mf[1] < 1.0
    with _pytest.raises(ValueError, match="clash"):
        dom_stats(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, html string, _ds_h string"
            )
        )


def test_hop_distance(spark):
    """graph.hop_distance: min hops across levels (shortcut beats
    chain), bound enforced (nodes past max_hops absent), absent seed
    emits 0, parallel edges absorbed, cycle safe, max_hops
    validation."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.graph import (
        hop_distance,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b"),
            ("a", "b"),          # parallel edge
            ("b", "c"),
            ("c", "d"),
            ("a", "c"),          # shortcut: c is 1 hop, not 2
            ("d", "a"),          # cycle back to the seed
            ("x", "y"),          # disconnected from the seed
        ],
        "src_host string, dst_host string",
    )
    seeds = spark.createDataFrame([("a",), ("ghost",)], "host string")
    got = {
        r["node"]: r["hops"]
        for r in hop_distance(edges, seeds, max_hops=2).collect()
    }
    # d is 2 hops (a->c->d); the cycle re-reaches a at 2 but MIN keeps 0
    assert got == {"a": 0, "ghost": 0, "b": 1, "c": 1, "d": 2}
    with _pytest.raises(ValueError, match="max_hops"):
        hop_distance(edges, seeds, max_hops=0)


def test_opengraph(spark):
    """html.opengraph: property-attributed og fields vs name-attributed
    twitter_card, first match wins (blank first -> NULL), block-text
    clean on title/description, raw urls, lowered type/card,
    name="og:title" + commented decoys never match, NULL html -> all
    NULL, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import opengraph

    rows = [
        (
            1,
            '<!-- <meta property="og:title" content="ghost"> -->'
            '<meta name="og:title" content="not og">'
            '<meta property="og:title" content="A &amp;  B">'
            "<meta property='og:type' content='Article'>"
            '<meta property="og:image" content="https://IMG.ex/i.png">'
            '<meta name="twitter:card" content="Summary">',
        ),
        # blank first match wins over the later real one
        (
            2,
            '<meta property="og:description" content="">'
            '<meta property="og:description" content="real">',
        ),
        (3, None),
    ]
    got = {
        r["doc_id"]: (
            r["og_title"],
            r["og_description"],
            r["og_image"],
            r["og_url"],
            r["og_type"],
            r["twitter_card"],
        )
        for r in opengraph(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    }
    assert got == {
        1: ("A & B", None, "https://IMG.ex/i.png", None, "article", "summary"),
        2: (None, None, None, None, None, None),
        3: (None, None, None, None, None, None),
    }
    with _pytest.raises(ValueError, match="clash"):
        opengraph(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, html string, _og_h string"
            )
        )


def test_robots_meta(spark):
    """html.robots_meta: comma-split + trim + case-insensitive
    directive tokens, multi-tag union, none -> noindex+nofollow,
    description/commented/scripted/googlebot decoys never match,
    NULL html -> all-false keep, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        robots_meta,
    )

    rows = [
        # cased + padded directives in one tag
        (1, '<meta name="robots" content=" NoIndex ,\tnofollow ">'),
        # none expansion, cased name attr
        (2, '<meta name="ROBOTS" content="NONE">'),
        # multi-tag union: noarchive + nofollow, noindex stays false
        (
            3,
            '<meta name="robots" content="noarchive">'
            '<p>x</p><meta name="robots" content="nofollow">',
        ),
        # decoys only: description-with-the-word, commented, scripted,
        # bot-specific
        (
            4,
            '<meta name="description" content="noindex all">'
            '<!-- <meta name="robots" content="noindex"> -->'
            "<script>document.write('<meta name=\"robots\" "
            "content=\"noindex\">');</script>"
            '<meta name="googlebot" content="noindex">',
        ),
        (5, None),
    ]
    got = {
        r["doc_id"]: (r["noindex"], r["nofollow"], r["noarchive"], r["keep"])
        for r in robots_meta(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    }
    assert got == {
        1: (True, True, False, False),
        2: (True, True, False, False),
        3: (False, True, True, True),
        4: (False, False, False, True),
        5: (False, False, False, True),
    }
    with _pytest.raises(ValueError, match="clash"):
        robots_meta(
            spark.createDataFrame(
                [(1, "<i>x</i>", "y")],
                "doc_id long, html string, _rm_toks string",
            )
        )


def test_sentences(spark):
    """text.sentences: maximal runs closed by terminal-punct runs,
    unclosed tail kept, ws-only tail dropped, detached punct run stays,
    naive abbreviation split pinned, dense 0-based sent_no, NULL ->
    zero rows, staging clash raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.text import sentences

    rows = [
        (1, "One. Two!  Three? tail"),
        (2, "Dr. Smith went. "),
        (3, "a. . b"),
        (4, None),
        (5, "..."),
    ]
    got = {}
    for r in sentences(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["sent_no"], r["sentence"], r["n_tokens"])
        )
    assert got == {
        1: [
            (0, "One.", 1),
            (1, "Two!", 1),
            (2, "Three?", 1),
            (3, "tail", 1),
        ],
        # the documented naive rule: "Dr." splits; trailing ws tail drops
        2: [(0, "Dr.", 1), (1, "Smith went.", 2)],
        3: [(0, "a.", 1), (1, ".", 1), (2, "b", 1)],
        5: [(0, "...", 1)],
    }
    with _pytest.raises(ValueError, match="clash"):
        sentences(
            spark.createDataFrame(
                [(1, "x", "y")], "doc_id long, text string, _sn_s string"
            )
        )


def test_bitext_pairs(spark):
    """html.bitext_pairs: within-cluster ordered language pairs,
    x-default excluded, missing-doc sides dropped (inner join),
    len_ratio = round(min/max, 6) with the empty-side 0.0 pin, keep
    at the 0.5 default, min_ratio validation + staging clash raise."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.html import (
        bitext_pairs,
    )

    clusters = spark.createDataFrame(
        [
            ("c1", "en", "u-en", 3),
            ("c1", "fr", "u-fr", 3),
            ("c1", "x-default", "u-en", 3),
            ("c2", "en", "u2-en", 2),
            ("c2", "de", "u2-de", 2),   # u2-de never crawled -> drops
            ("c3", "en", "u3-en", 2),
            ("c3", "es", "u3-es", 2),   # es side empty -> ratio 0.0
        ],
        "cluster_key string, hreflang string, href string, n_langs int",
    )
    docs = spark.createDataFrame(
        [
            ("u-en", "one two three four"),
            ("u-fr", "un deux trois"),
            ("u2-en", "a b"),
            ("u3-en", "a b c"),
            ("u3-es", None),
        ],
        "url string, text string",
    )
    got = {
        (r["cluster_key"], r["lang_a"], r["lang_b"]): (
            r["tokens_a"],
            r["tokens_b"],
            r["len_ratio"],
            r["keep"],
        )
        for r in bitext_pairs(clusters, docs).collect()
    }
    assert got == {
        ("c1", "en", "fr"): (4, 3, 0.75, True),
        ("c3", "en", "es"): (3, 0, 0.0, False),
    }
    with _pytest.raises(ValueError, match="min_ratio"):
        bitext_pairs(clusters, docs, min_ratio=0.0)
    with _pytest.raises(ValueError, match="clash"):
        bitext_pairs(
            clusters,
            docs.withColumn("_bt_tok", docs.url),
        )


def test_canonical_dedup(spark):
    """urls.canonical_dedup: absolute canonical honored (cased host
    lowered into the key), relative canonical falls back to the crawl
    url, grimy variants (www/case/tracking/slash+fragment) collapse
    onto the clean key, keep_id = min doc_id, commented canonical
    never wins."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        canonical_dedup,
    )

    rows = [
        # 1+2: same logical url through grime; 2 also declares an
        # absolute canonical elsewhere -> it LEAVES the grime group
        (1, "https://site1.com/p/9?id=9", "<p>x</p>"),
        (
            2,
            "HTTPS://WWW.SITE1.COM/p/9?utm_source=a&id=9#frag",
            '<!-- <link rel="canonical" href="https://ghost.com/"> -->'
            '<link rel="canonical" href="https://SiteC.com/canon/3">',
        ),
        # 3: relative canonical ignored -> stays on its own url
        (
            3,
            "https://site1.com/p/9/?id=9",
            "<link rel='canonical' href='/rel/2'>",
        ),
        # 4: self-canonical group of one
        (4, "https://other.com/a", None),
    ]
    got = {
        r["doc_id"]: (
            r["canon_key"], r["keep_id"], r["n_members"],
            r["used_canonical"], r["is_dup"],
        )
        for r in canonical_dedup(
            spark.createDataFrame(
                rows, "doc_id long, url string, html string"
            )
        ).collect()
    }
    k = "https://site1.com/p/9?id=9"
    assert got[1] == (k, 1, 2, False, False)
    assert got[2] == (
        "https://sitec.com/canon/3", 2, 1, True, False
    )
    assert got[3] == (k, 1, 2, False, True)
    assert got[4] == ("https://other.com/a", 4, 1, False, False)


def test_fetch_schedule(spark):
    """sampling.fetch_schedule: per-host top-(rate*windows) keep with
    score-desc/id-asc tie-break, 0-based window assignment by integer
    division, overflow rows deferred (dropped), invalid rates raise,
    rank staging clash surfaces via quota_topk's guard."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.sampling import (
        fetch_schedule,
    )

    rows = [
        # host a: 6 candidates, scores force reordering; tie at 50
        (1, "a.com", 10), (2, "a.com", 50), (3, "a.com", 50),
        (4, "a.com", 70), (5, "a.com", 20), (6, "a.com", 60),
        # host b: fewer than one full window
        (7, "b.com", 5),
    ]
    got = {
        r["doc_id"]: (r["fetch_rank"], r["window_no"])
        for r in fetch_schedule(
            spark.createDataFrame(
                rows, "doc_id long, host string, score long"
            ),
            per_window=2,
            n_windows=2,
        ).collect()
    }
    # host a keeps top 4 of 6: 70,60,50(id2),50(id3); windows 0,0,1,1
    assert got == {
        4: (1, 0), 6: (2, 0), 2: (3, 1), 3: (4, 1), 7: (1, 0),
    }
    with _pytest.raises(ValueError, match=">= 1"):
        fetch_schedule(
            spark.createDataFrame(rows, "doc_id long, host string, score long"),
            per_window=0,
        )


def test_translation_clusters(spark):
    """html.translation_clusters: pages declaring the same hreflang
    set collapse to one cluster (x-default key when declared, else
    min href), n_langs counts distinct languages incl. x-default,
    declaration-less pages contribute nothing."""
    from annual_report_pdf_parsers_spark.operators.html import (
        translation_clusters,
    )

    set_a = (
        '<link rel="alternate" hreflang="en" href="https://a.com/en">'
        '<link rel="alternate" hreflang="fr" href="https://a.com/fr">'
        '<link rel="alternate" hreflang="x-default" href="https://a.com/">'
    )
    set_b = (
        '<link rel="alternate" hreflang="de" href="https://b.com/de">'
        '<link rel="alternate" hreflang="en" href="https://b.com/en">'
    )
    rows = [
        (1, set_a),
        (2, set_a),          # same set declared on a second page
        (3, set_b),          # no x-default -> min href keys it
        (4, "<p>nothing</p>"),
    ]
    got = sorted(
        tuple(r)
        for r in translation_clusters(
            spark.createDataFrame(rows, "doc_id long, html string")
        ).collect()
    )
    assert got == [
        ("https://a.com/", "en", "https://a.com/en", 3),
        ("https://a.com/", "fr", "https://a.com/fr", 3),
        ("https://a.com/", "x-default", "https://a.com/", 3),
        ("https://b.com/de", "de", "https://b.com/de", 2),
        ("https://b.com/de", "en", "https://b.com/en", 2),
    ]


def test_funnel_order_and_tie_semantics(spark):
    """The funnel advances only on STRICTLY-later steps: out-of-order
    purchases don't count, an equal-ts click does not advance past its
    view, and a user without the first step has depth 0."""
    from datetime import datetime as dt

    from annual_report_pdf_parsers_spark.operators.temporal import funnel

    rows = [
        # u1: clean ordered funnel
        (1, dt(2024, 1, 1, 0, 0), "view"),
        (1, dt(2024, 1, 1, 0, 5), "click"),
        (1, dt(2024, 1, 1, 0, 9), "purchase"),
        # u2: purchase BEFORE the click -> never counts, depth 2
        (2, dt(2024, 1, 1, 0, 0), "view"),
        (2, dt(2024, 1, 1, 0, 1), "purchase"),
        (2, dt(2024, 1, 1, 0, 2), "click"),
        # u3: click tied with the view must NOT advance; later one does
        (3, dt(2024, 1, 1, 0, 0), "view"),
        (3, dt(2024, 1, 1, 0, 0), "click"),
        (3, dt(2024, 1, 1, 0, 3), "click"),
        (3, dt(2024, 1, 1, 0, 4), "purchase"),
        # u4: no view at all -> depth 0 even with later steps present
        (4, dt(2024, 1, 1, 0, 0), "click"),
        (4, dt(2024, 1, 1, 0, 1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in funnel(df).collect()
    }
    assert out[1]["depth"] == 3 and out[1]["converted"]
    assert out[1]["us_to_convert"] == 9 * 60 * 1_000_000
    assert out[2]["depth"] == 2 and not out[2]["converted"]
    assert out[3]["depth"] == 3
    assert out[3]["t_2"] == dt(2024, 1, 1, 0, 3)  # not the tied click
    assert out[4]["depth"] == 0 and out[4]["t_1"] is None


def test_funnel_rejects_single_step(spark):
    from annual_report_pdf_parsers_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [(1, 1, "view")], "user_id long, ts long, event_type string"
    )
    with pytest.raises(ValueError, match="at least two"):
        funnel(df, steps=("view",))


def test_retention_cohorts_semantics(spark):
    """Two users in one cohort, one churning after week 0; a third
    user starting a period later forms its own cohort with its own
    size denominator."""
    from datetime import datetime as dt

    from annual_report_pdf_parsers_spark.operators.temporal import (
        retention_cohorts,
    )

    rows = [
        (1, dt(2024, 1, 1)), (1, dt(2024, 1, 9)),   # w0 + w1
        (2, dt(2024, 1, 2)),                         # w0 only
        (3, dt(2024, 1, 8)), (3, dt(2024, 1, 16)),  # later cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (str(r["cohort_start"]), r["period_offset"]): r
        for r in retention_cohorts(df).collect()
    }
    # 2024-01-01 lands in epoch week 2817 starting 2023-12-28
    a0 = out[("2023-12-28", 0)]
    assert a0["n_users"] == 2 and a0["cohort_size"] == 2
    a1 = out[("2023-12-28", 1)]
    assert a1["n_users"] == 1 and a1["retention"] == 0.5
    b0 = out[("2024-01-04", 0)]
    assert b0["n_users"] == 1 and b0["retention"] == 1.0
    assert ("2024-01-04", 1) in out and len(out) == 4


def test_dehyphenate_semantics(spark):
    """Wrap joins fire only lowercase-to-lowercase; consecutive wraps
    repair only the first break (scan-resume rule); soft hyphens
    vanish without joining their line break; trailing ws counted in
    chars; NULL text behaves as ''."""
    from annual_report_pdf_parsers_spark.operators.encoding import (
        dehyphenate,
    )

    rows = [
        (1, "exam-\nple and hy-\nphen"),
        (2, "a-\nb-\nc"),              # only the first break joins
        (3, "A-\nB 3-\n4 x - \ny"),    # none of these join
        (4, "so­ft and br­\neak"),
        (5, "trail  \t\nnext \n"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dehyphenate(df).collect()}
    assert out[1]["text"] == "example and hyphen"
    assert out[1]["n_line_joins"] == 2 and out[1]["had_hyphenation"]
    assert out[2]["text"] == "ab-\nc" and out[2]["n_line_joins"] == 1
    assert out[3]["n_line_joins"] == 0 and not out[3]["had_hyphenation"]
    # the spaced dash keeps its trailing space trimmed by pass 3
    assert out[3]["text"] == "A-\nB 3-\n4 x -\ny"
    assert out[4]["text"] == "soft and br\neak"
    assert out[4]["n_soft_hyphens"] == 2 and out[4]["n_line_joins"] == 0
    assert out[5]["text"] == "trail\nnext\n"
    assert out[5]["n_trail_ws"] == 4
    assert out[6]["text"] == "" and out[6]["n_line_joins"] == 0


def test_dehyphenate_staging_clash(spark):
    from annual_report_pdf_parsers_spark.operators.encoding import (
        dehyphenate,
    )

    df = spark.createDataFrame([(1, "x", "y")], "doc_id long, text string, _dh_1 string")
    with pytest.raises(ValueError, match="staging columns clash"):
        dehyphenate(df)


def test_code_stats_routes(spark):
    """All three is_code routes and the prose negative: fence alone;
    symbol-dense + keywords; indent-majority; and prose with one
    keyword-looking word staying false."""
    from annual_report_pdf_parsers_spark.operators.text import code_stats

    rows = [
        (1, "plain prose that might return something someday"),
        (2, "function g() { var x = 1; const y = [2]; }"),
        (3, "intro\n    indented\n    also indented"),
        (4, "text\n```\nblock\n```"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in code_stats(df).collect()}
    assert not out[1]["is_code"] and out[1]["kw_hits"] == 1
    assert out[2]["is_code"] and out[2]["symbol_frac"] >= 0.03
    assert out[3]["is_code"] and out[3]["indent_frac"] >= 0.4
    assert out[3]["n_lines"] == 3
    assert out[4]["is_code"] and out[4]["has_fence"]
    assert not out[5]["is_code"] and out[5]["n_lines"] == 0


def test_code_stats_staging_clash(spark):
    from annual_report_pdf_parsers_spark.operators.text import code_stats

    df = spark.createDataFrame(
        [(1, "x", 0)], "doc_id long, text string, _cd_kw int"
    )
    with pytest.raises(ValueError, match="staging columns clash"):
        code_stats(df)


def test_inverted_index_semantics(spark):
    """df bounds prune hapax and stopwords; postings rank by
    (tf DESC, doc_id ASC); k caps the posting list."""
    from annual_report_pdf_parsers_spark.operators.text import (
        inverted_index,
    )

    rows = [
        (1, "apple apple banana the"),
        (2, "apple banana banana the"),
        (3, "apple cherry the"),
        (4, "the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = inverted_index(df, k=2, min_df=2, max_df=3).collect()
    by_tok = {}
    for r in out:
        by_tok.setdefault(r["token"], []).append(r)
    # 'the' has df=4 > max_df -> cut; 'cherry' df=1 < min_df -> cut
    assert set(by_tok) == {"apple", "banana"}
    apple = sorted(by_tok["apple"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in apple] == [1, 2]  # tf 2 first, then id
    assert apple[0]["tf"] == 2 and apple[0]["df_docs"] == 3
    assert len(apple) == 2  # doc 3 pruned by k=2
    banana = sorted(by_tok["banana"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in banana] == [2, 1]


def test_inverted_index_rejects_bad_bounds(spark):
    from annual_report_pdf_parsers_spark.operators.text import (
        inverted_index,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_df"):
        inverted_index(df, min_df=5, max_df=2)
    with pytest.raises(ValueError, match="k must"):
        inverted_index(df, k=0)


def test_warc_records_semantics(spark):
    """Bounded read truncates at Content-Length; multi-record archives
    keep rec_no order; header-less blocks stay as invalid rows; a
    header name inside the PAYLOAD must not leak into the fields;
    NULL/empty archives emit no rows."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.warc import (
        warc_records,
    )

    nl = "\r\n"

    def rec(t, uri, clen, payload):
        return (
            "WARC/1.0" + nl + "WARC-Type: " + t + nl
            + "WARC-Target-URI: " + uri + nl
            + "WARC-Date: 2024-01-15T00:00:00Z" + nl
            + "Content-Length: " + str(clen) + nl + nl
            + payload + nl + nl
        )

    sneaky = "body WARC-Target-URI: https://evil.example/x tail"
    rows = [
        (1, rec("response", "https://a.org/1", 5, "hello there")),
        (2, rec("response", "https://b.org/2", 3, "abc")
            + rec("request", "https://b.org/2", 2, "hi")),
        (3, "WARC/1.0" + nl + "WARC-Type: metadata" + nl
            + "No-Uri: x" + nl + nl + "junk"),
        (4, rec("response", "https://c.org", len(sneaky), sneaky)),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, warc string")
    out = warc_records(df).collect()
    by = {}
    for r in out:
        by[(r["doc_id"], r["rec_no"])] = r
    assert by[(1, 1)]["payload_md5"] == hashlib.md5(b"hello").hexdigest()
    assert by[(2, 1)]["warc_type"] == "response"
    assert by[(2, 2)]["warc_type"] == "request"
    bad = by[(3, 1)]
    assert not bad["is_valid"] and bad["target_uri"] is None
    assert bad["warc_type"] == "metadata"
    assert by[(4, 1)]["target_uri"] == "https://c.org"
    assert {d for d, _ in by} == {1, 2, 3, 4}


def test_warc_records_staging_clash(spark):
    from annual_report_pdf_parsers_spark.operators.warc import (
        warc_records,
    )

    df = spark.createDataFrame(
        [(1, "x", "y")], "doc_id long, warc string, _wr_b string"
    )
    with pytest.raises(ValueError, match="staging columns clash"):
        warc_records(df)


def test_session_paths_semantics(spark):
    """Paths never cross a session boundary; equal-ts order is fixed
    by the id tie-break; short sessions emit nothing."""
    from datetime import datetime as dt

    from annual_report_pdf_parsers_spark.operators.temporal import (
        session_paths,
    )

    rows = [
        # session A: a > b > c and b > c > d
        (1, 101, dt(2024, 1, 1, 0, 0), "a"),
        (1, 102, dt(2024, 1, 1, 0, 1), "b"),
        (1, 103, dt(2024, 1, 1, 0, 2), "c"),
        (1, 104, dt(2024, 1, 1, 0, 3), "d"),
        # session B starts after the 30-min gap: only 2 events -> none
        (1, 105, dt(2024, 1, 1, 2, 0), "a"),
        (1, 106, dt(2024, 1, 1, 2, 1), "b"),
        # u2: equal-ts pair ordered by event_id: x(201) then y(202)
        (2, 201, dt(2024, 1, 1, 0, 0), "x"),
        (2, 202, dt(2024, 1, 1, 0, 0), "y"),
        (2, 203, dt(2024, 1, 1, 0, 1), "z"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {
        r["path"]: r["n_occurrences"]
        for r in session_paths(df, n=3, k=10).collect()
    }
    assert out == {"a>b>c": 1, "b>c>d": 1, "x>y>z": 1}


def test_session_paths_rejects_bad_params(spark):
    from annual_report_pdf_parsers_spark.operators.temporal import (
        session_paths,
    )

    df = spark.createDataFrame(
        [(1, 1, 1, "a")],
        "user_id long, event_id long, ts long, event_type string",
    )
    with pytest.raises(ValueError, match="n must"):
        session_paths(df, n=1)
    with pytest.raises(ValueError, match="k must"):
        session_paths(df, k=0)


def test_rate_spikes_semantics(spark):
    """Integer cross-multiplied rule: a x5 hour flags once the
    trailing window is warm; cold-start hours never flag; RANGE
    trailing windows see real hours across gaps."""
    from datetime import datetime as dt, timedelta

    from annual_report_pdf_parsers_spark.operators.temporal import (
        rate_spikes,
    )

    base = dt(2024, 1, 1)
    rows = []
    # 30 steady hours at 2 events/hour, then one 12-event burst hour
    for h in range(30):
        for i in range(2):
            rows.append((base + timedelta(hours=h, minutes=i), "e"))
    for i in range(12):
        rows.append((base + timedelta(hours=30, minutes=i), "e"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {
        r["hour_start"]: r
        for r in rate_spikes(df, min_hours=12).collect()
    }
    burst = out[base + timedelta(hours=30)]
    # 12 * 24 > 3 * 48 -> spike
    assert burst["is_spike"] and burst["trailing_sum"] == 48
    assert not out[base + timedelta(hours=29)]["is_spike"]
    # hour 5 has only 5 trailing hours < min_hours -> cold start
    assert not out[base + timedelta(hours=5)]["is_spike"]


def test_robots_rules_grouping(spark):
    """Two-agent groups fan rules out; pre-group rules drop; comments
    and CRLF strip; empty Disallow keeps its row; sitemap rows are
    agent-NULL."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        robots_rules,
    )

    txt = (
        "Disallow: /orphan\r\n"
        "User-agent: A\r\nUser-agent: B\r\n"
        "Disallow: /x # hidden\r\n"
        "\r\n"
        "User-agent: *\r\nDisallow:\r\n"
        "Sitemap: https://s.example/m.xml\r\n"
    )
    df = spark.createDataFrame([("h1", txt)], "host string, robots_txt string")
    out = robots_rules(df).collect()
    rules = sorted(
        (r["group_no"], r["agent"], r["directive"], r["value"])
        for r in out
        if r["directive"] != "sitemap"
    )
    assert rules == [
        (1, "a", "disallow", "/x"),
        (1, "b", "disallow", "/x"),
        (2, "*", "disallow", ""),
    ]
    sm = [r for r in out if r["directive"] == "sitemap"]
    assert len(sm) == 1 and sm[0]["agent"] is None
    assert sm[0]["value"] == "https://s.example/m.xml"
    assert not any(r["value"] == "/orphan" for r in out)


def test_license_stats_priority(spark):
    """Table order is the tie rule: cc-by-sa text also contains the
    'cc by' prefix marker but must detect cc-by-sa; all-rights-
    reserved is never openly licensed; copyright alone detects no
    license."""
    from annual_report_pdf_parsers_spark.operators.text import (
        license_stats,
    )

    rows = [
        (1, "shared under CC BY-SA terms"),
        (2, "shared under CC BY terms"),
        (3, "© all rights reserved"),
        (4, "plain copyright line"),
        (5, "MIT License applies; Apache License too"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in license_stats(df).collect()}
    assert out[1]["license"] == "cc-by-sa"
    assert out[1]["n_license_markers"] == 2  # 'cc by-sa' + 'cc by'
    assert out[2]["license"] == "cc-by" and out[2]["is_openly_licensed"]
    assert out[3]["license"] == "all-rights-reserved"
    assert not out[3]["is_openly_licensed"] and out[3]["has_copyright"]
    assert out[4]["license"] is None and out[4]["has_copyright"]
    assert out[5]["license"] == "mit" and out[5]["n_license_markers"] == 2
    assert out[6]["license"] is None and not out[6]["has_copyright"]


def test_sitemap_coverage_statuses(spark):
    """All three statuses; index entries excluded; crawl dups count
    once."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        sitemap_coverage,
    )

    entries = spark.createDataFrame(
        [
            ("https://a.org/1", False),
            ("https://a.org/2", False),
            ("https://a.org/child.xml", True),
        ],
        "loc string, is_index boolean",
    )
    crawled = spark.createDataFrame(
        [("https://a.org/1",), ("https://a.org/1",), ("https://b.org/x",)],
        "url string",
    )
    out = {r["url"]: r["status"] for r in
           sitemap_coverage(entries, crawled).collect()}
    assert out == {
        "https://a.org/1": "covered",
        "https://a.org/2": "uncrawled_seed",
        "https://b.org/x": "orphan_page",
    }


def test_degree_stats_semantics(spark):
    """Reciprocal pairs count distinct both-direction neighbors,
    self-loops flag but never count as reciprocal, absent sides
    coalesce to zero."""
    from annual_report_pdf_parsers_spark.operators.graph import (
        degree_stats,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("b", "a", 1),   # reciprocal pair
            ("a", "c", 2),                   # one-way
            ("c", "c", 5),                   # self-loop only
        ],
        "src_host string, dst_host string, n_links long",
    )
    out = {r["host"]: r for r in degree_stats(edges).collect()}
    a = out["a"]
    assert (a["out_degree"], a["in_degree"]) == (2, 1)
    assert (a["out_weight"], a["in_weight"]) == (5, 1)
    assert a["n_reciprocal"] == 1 and not a["has_self_loop"]
    b = out["b"]
    assert b["n_reciprocal"] == 1
    c = out["c"]
    assert c["has_self_loop"] and c["n_reciprocal"] == 0
    assert c["in_degree"] == 2  # from a and from itself


def test_vocab_coverage_semantics(spark):
    """OOV fraction per doc against a k-bounded vocab; ties at the k
    boundary break by token asc."""
    from annual_report_pdf_parsers_spark.operators.text import (
        vocab_coverage,
    )

    rows = [
        (1, "aa aa bb zz"),
        (2, "aa bb bb qq qq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # counts: aa=3 bb=3 qq=2 zz=1; k=2 -> vocab {aa, bb}
    out = {r["doc_id"]: r for r in vocab_coverage(df, k=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_in_vocab"] == 3
    assert out[1]["oov_frac"] == 0.25
    assert out[2]["n_in_vocab"] == 3 and out[2]["oov_frac"] == 0.4


def test_ab_lift_semantics(spark):
    """Arm assignment is a pure function of (salt, user); conversion
    is any-purchase; lift NULL when control never converts."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.temporal import (
        ab_lift,
    )

    def arm(u):
        return hashlib.md5(f"ab1{u}".encode()).hexdigest()[0] < "8"

    rows = []
    for u in range(40):
        rows.append((u, "view"))
        if u % 2 == 0:
            rows.append((u, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = ab_lift(df).collect()[0]
    nt = sum(1 for u in range(40) if arm(u))
    ct = sum(1 for u in range(40) if arm(u) and u % 2 == 0)
    assert (r["n_treat"], r["conv_treat"]) == (nt, ct)
    assert r["n_treat"] + r["n_ctrl"] == 40
    # control-never-converts -> NULL lift
    df2 = spark.createDataFrame(
        [(u, "purchase" if arm(u) else "view") for u in range(40)],
        "user_id long, event_type string",
    )
    assert ab_lift(df2).collect()[0]["lift"] is None


def test_resolve_href_cases(spark):
    """Every RFC 3986 resolution branch plus the bounded-underflow
    clamp and the NULL guards."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        resolve_href,
    )

    base = "https://www.Ex.org/dir/sub/page.html?q=1#frag"
    cases = [
        ("https://abs.example/x?y=2#z", "https://abs.example/x?y=2"),
        ("//cdn.example/lib.js", "https://cdn.example/lib.js"),
        ("/rooted/r", "https://www.Ex.org/rooted/r"),
        ("?only=2", "https://www.Ex.org/dir/sub/page.html?only=2"),
        ("#frag2", "https://www.Ex.org/dir/sub/page.html?q=1"),
        ("rel/p", "https://www.Ex.org/dir/sub/rel/p"),
        ("./here.html", "https://www.Ex.org/dir/sub/here.html"),
        ("../up.html", "https://www.Ex.org/dir/up.html"),
        ("../../../deep.html", "https://www.Ex.org/deep.html"),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, base, h) for i, (h, _) in enumerate(cases)],
        "i long, base string, href string",
    )
    got = {
        r["i"]: r["res"]
        for r in df.select(
            "i", resolve_href(F.col("base"), F.col("href")).alias("res")
        ).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)
    # malformed base -> NULL
    df2 = spark.createDataFrame(
        [("not a url", "x/y")], "base string, href string"
    )
    assert (
        df2.select(
            resolve_href(F.col("base"), F.col("href")).alias("r")
        ).collect()[0]["r"]
        is None
    )


def test_srt_cues_semantics(spark):
    """Comma and dot millis both parse to integer ms; a timing-less
    block keeps an invalid row; multi-line text joins with spaces;
    trailing blank runs mint no cues; NULL srt emits nothing."""
    from annual_report_pdf_parsers_spark.operators.multimodal import (
        srt_cues,
    )

    srt = (
        "1\n00:00:01,500 --> 00:00:03.250\nline one\n  line two\n\n"
        "garbage block\n\n"
        "2\n01:02:03,004 --> 01:02:04,000\nsolo\n\n\n"
    )
    df = spark.createDataFrame(
        [(1, srt), (2, None)], "doc_id long, srt string"
    )
    out = {
        (r["doc_id"], r["cue_no"]): r for r in srt_cues(df).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (1, 3)}
    c1 = out[(1, 1)]
    assert c1["start_ms"] == 1500 and c1["end_ms"] == 3250
    assert c1["text"] == "line one line two"
    assert c1["declared_idx"] == 1 and c1["is_valid"]
    bad = out[(1, 2)]
    assert not bad["is_valid"] and bad["start_ms"] is None
    c2 = out[(1, 3)]
    assert c2["start_ms"] == 3723004 and c2["dur_ms"] == 996


def test_cdx_records_semantics(spark):
    """SURT keys reverse host labels and strip www/fragment; the
    latest-capture digest ties break by max digest; junk urls drop."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        cdx_records,
    )

    rows = [
        ("https://www.Ex.org/a?q=1#f", "20240101", "d1"),
        ("https://ex.org/a?q=1", "20240102", "d2"),
        ("https://ex.org/a?q=1", "20240102", "d0"),  # tie at latest
        ("https://sub.ex.org/", "20240103", "d3"),
        ("junk", "20240104", "d4"),
    ]
    df = spark.createDataFrame(
        rows, "url string, fetch_ts string, digest string"
    )
    out = {r["surt_key"]: r for r in cdx_records(df).collect()}
    a = out["org,ex)/a?q=1"]
    assert a["n_captures"] == 3 and a["n_versions"] == 3
    assert a["first_ts"] == "20240101" and a["latest_ts"] == "20240102"
    assert a["latest_digest"] == "d2"  # max digest among the tie
    assert "org,ex,sub)/" in out
    assert len(out) == 2


def test_hll_distinct_semantics(spark):
    """HLL sketch vs a from-scratch Python model: register/rank/harmonic
    arithmetic is bit-identical on both estimator branches (linear
    counting for the 40-value group, raw HLL for the 3000-value group),
    NULL values carry no identity, and the audit columns carry the
    exact distinct count."""
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
        vals = [v for v in values if v is not None]
        for v in vals:
            hx = hashlib.md5(str(v).encode()).hexdigest()
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
        return used, raw, est, len(set(vals))

    small = [f"v{i % 40}" for i in range(300)]
    big = [f"u{i}" for i in range(3000)]
    rows = (
        [("small", v) for v in small]
        + [("big", v) for v in big]
        + [("small", None)]
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r["grp"]: r for r in hll_distinct(df, "v", "grp").collect()}
    for g, vals in [("small", small), ("big", big)]:
        used, raw, est, exact = model(vals)
        r = out[g]
        assert (
            r["used_registers"],
            r["raw_estimate"],
            r["hll_estimate"],
            r["exact_distinct"],
        ) == (used, raw, est, exact), g
    # the NULL row is dropped before hashing AND before n_rows
    assert out["small"]["n_rows"] == 300
    # the sketch is actually a useful estimator at both scales
    assert out["small"]["rel_err"] < 0.25
    assert out["big"]["rel_err"] < 0.15
    # pure-sketch production form drops the exact-distinct audit
    cols = hll_distinct(df, "v", "grp", include_exact=False).columns
    assert "exact_distinct" not in cols and "rel_err" not in cols


def test_hll_distinct_global_and_guards(spark):
    """group_col=None sketches the whole column under scope='all';
    value/group name collision raises."""
    import pytest as _pytest

    from annual_report_pdf_parsers_spark.operators.sketch import (
        hll_distinct,
    )

    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(50)], "v string"
    )
    out = hll_distinct(df, "v").collect()
    assert len(out) == 1 and out[0]["scope"] == "all"
    assert out[0]["exact_distinct"] == 7
    assert abs(out[0]["hll_estimate"] - 7) < 3
    with _pytest.raises(ValueError):
        hll_distinct(df.withColumn("g", F.col("v")), "v", "v")


def test_minhash_jaccard_estimate_semantics(spark):
    """Estimate-vs-exact audit vs a hashlib model: exact copies land at
    est=1.0/exact=1.0/err=0; a near-dup pair reproduces the model's
    signature-agreement estimate and set Jaccard exactly; a disjoint
    doc pairs with nothing."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.dedup import (
        minhash_jaccard_estimate,
    )

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = t1 + " iota"  # near-dup
    docs = [(1, t1), (2, t1), (3, t2), (4, "totally different words here now")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(t):
        tk = t.split()
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

    def sig(sh):
        return [
            min(
                hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8]
                for s in sh
            )
            for i in range(8)
        ]

    def model(ta, tb):
        sa, sb = shingles(ta), shingles(tb)
        ga, gb = sig(sa), sig(sb)
        est = round(sum(x == y for x, y in zip(ga, gb)) / 8, 6)
        exact = round(len(sa & sb) / len(sa | sb), 6)
        return est, exact, round(abs(est - exact), 6)

    out = {
        (r["id_a"], r["id_b"]): (
            r["est_jaccard"],
            r["exact_jaccard"],
            r["abs_err"],
        )
        for r in minhash_jaccard_estimate(df).collect()
    }
    assert out[(1, 2)] == (1.0, 1.0, 0.0)
    assert (1, 3) in out and out[(1, 3)] == model(t1, t2)
    assert not any(4 in p for p in out)
    # every reported pair matches the model
    texts = dict(docs)
    for (ia, ib), got in out.items():
        assert got == model(texts[ia], texts[ib]), (ia, ib)


def test_length_buckets_semantics(spark):
    """Bucket assignment (smallest boundary >= n_tokens, -1 overflow),
    digest-ordered batch fill, partial final batches, NULL text as 0
    tokens, and the pad-waste arithmetic vs a hashlib model."""
    import hashlib

    from annual_report_pdf_parsers_spark.operators.sampling import (
        length_buckets,
    )

    rows = [(i, "w " * (i * 7 % 40)) for i in range(30)]
    rows += [(100, None), (101, "w " * 999)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["bucket_cap"], r["batch_no"]): r
        for r in length_buckets(
            df, boundaries=(8, 16, 32), batch_size=4
        ).collect()
    }

    def model():
        per_bucket: dict[int, list] = {}
        for i, t in rows:
            nt = len((t or "").split())
            cap = next((b for b in (8, 16, 32) if nt <= b), -1)
            dg = hashlib.md5(f"{i}|lb0".encode()).hexdigest()
            per_bucket.setdefault(cap, []).append((dg, i, nt))
        out = {}
        for cap, docs in per_bucket.items():
            docs.sort()
            for bno in range(0, len(docs), 4):
                batch = docs[bno : bno + 4]
                nts = [d[2] for d in batch]
                mx, sm, n = max(nts), sum(nts), len(batch)
                waste = (
                    0.0 if mx == 0 else round(1.0 - sm / (n * mx), 6)
                )
                out[(cap, bno // 4)] = (n, mx, sm, waste)
        return out

    exp = model()
    assert set(got) == set(exp)
    for key, (n, mx, sm, waste) in exp.items():
        r = got[key]
        assert (
            r["n_docs"],
            r["max_tokens"],
            r["sum_tokens"],
            r["pad_waste_frac"],
        ) == (n, mx, sm, waste), key
    # the overflow route is reported, never dropped
    assert any(cap == -1 for cap, _ in got)
    # staging/output clash guard + bad params raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        length_buckets(df.withColumn("bucket_cap", F.lit(1)))
    with _pytest.raises(ValueError):
        length_buckets(df, batch_size=0)
    with _pytest.raises(ValueError):
        length_buckets(df, boundaries=())


def test_registered_domain_semantics(spark):
    """PLD extraction: longest suffix wins (co.uk over uk), PSL
    private entries mint per-user domains (github.io), www strips
    before matching, unknown TLD -> both NULL, bare-suffix host ->
    suffix without registered domain, junk url -> NULL host; the
    rollup collapses subdomains into n_hosts."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        registered_domains,
        with_registered_domain,
    )

    rows = [
        (1, "https://www.Sub.Example.COM/x"),
        (2, "https://a.b.shop.co.uk/y"),
        (3, "https://user1.github.io/p"),
        (4, "https://weird.host.unknowntld/x"),
        (5, "junk url"),
        (6, "https://com/"),
        (7, "https://other.example.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: (r["host"], r["public_suffix"], r["registered_domain"])
        for r in with_registered_domain(df).collect()
    }
    assert got[1] == ("sub.example.com", "com", "example.com")
    assert got[2] == ("a.b.shop.co.uk", "co.uk", "shop.co.uk")
    assert got[3] == ("user1.github.io", "github.io", "user1.github.io")
    assert got[4] == ("weird.host.unknowntld", None, None)
    assert got[5] == (None, None, None)
    assert got[6] == ("com", "com", None)
    agg = {
        (r["registered_domain"], r["public_suffix"]): (
            r["n_urls"],
            r["n_hosts"],
        )
        for r in registered_domains(df).collect()
    }
    # two distinct hosts collapse into the example.com PLD
    assert agg[("example.com", "com")] == (2, 2)
    assert agg[(None, None)] == (1, 1)  # unknown TLD kept, junk dropped
    assert agg[(None, "com")] == (1, 1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        with_registered_domain(df.withColumn("host", F.lit("x")))


def test_bpe_pair_counts_semantics(spark):
    """BPE first-merge pair counts vs a Counter model: per-code-point
    split, the </w> marker pair, word-frequency weighting, NULL text
    contributing nothing, and the (count DESC, pair) top-k cut."""
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import (
        bpe_pair_counts,
    )

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate"),
        (3, None),
        (4, "x"),
        # U+0085 (NEL) survives the whitespace split INSIDE a token;
        # the (?s) flag on the per-code-point split is what keeps the
        # engine matching it like RE2/Python do (review fix)
        (5, "a\u0085b a\u0085b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # split on the literal separator, NOT str.split(): Python's
    # no-arg split treats U+0085 as whitespace, the engine's WS class
    # deliberately does not (it must match the oracle's RE2 class)
    wc = Counter(
        w for _, t in docs if t for w in t.split(" ") if w
    )
    pc = Counter()
    for w, n in wc.items():
        ch = list(w) + ["</w>"]
        for i in range(len(ch) - 1):
            pc[f"{ch[i]} {ch[i + 1]}"] += n
    exp = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_pair_counts(df, k=10).collect()
    ]
    assert got == exp
    # the single-char word still mints its marker pair
    assert ("x </w>", 1) in pc.items()
    # the NEL-bearing token split per code point (weight 2)
    assert pc["a \u0085"] == 2 and pc["\u0085 b"] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_pair_counts(df, k=0)
    with _pytest.raises(ValueError):
        bpe_pair_counts(df, marker="a b")


def test_cooccurrence_pmi_semantics(spark):
    """Directed window pairs both ways, self-consistent marginals and
    total from the pair table, the min_count cut, and the exact ln
    arithmetic vs a Counter+math model."""
    import math
    from collections import Counter

    from annual_report_pdf_parsers_spark.operators.text import (
        cooccurrence_pmi,
    )

    docs = [(1, "The cat sat on the mat"), (2, "the cat ate"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs: Counter = Counter()
    for _, t in docs:
        tk = (t or "").lower().split()
        for i in range(len(tk)):
            for d in (1, 2):
                if i + d < len(tk):
                    pairs[(tk[i], tk[i + d])] += 1
                    pairs[(tk[i + d], tk[i])] += 1
    n_total = sum(pairs.values())
    na: Counter = Counter()
    nb: Counter = Counter()
    for (a, b), n in pairs.items():
        na[a] += n
        nb[b] += n
    exp = {
        (a, b): (
            n,
            na[a],
            nb[b],
            round(
                math.log(
                    (float(n) * float(n_total))
                    / (float(na[a]) * float(nb[b]))
                ),
                6,
            ),
        )
        for (a, b), n in pairs.items()
        if n >= 2
    }
    got = {
        (r["tok_a"], r["tok_b"]): (
            r["n_pair"],
            r["n_a"],
            r["n_b"],
            r["pmi"],
        )
        for r in cooccurrence_pmi(df, window=2, min_count=2).collect()
    }
    assert got == exp and got  # non-vacuous
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cooccurrence_pmi(df, window=0)


def test_forms_semantics(spark):
    """Form rows: method default + lowering, entity-decoded action,
    NULL action for self-submitting forms, boundary-guarded field
    counts (<inputx> never counts), password detection through cased
    single-quoted attrs, scripted/commented ghost forms stripped, and
    the nested-form first-close truncation pinned."""
    from annual_report_pdf_parsers_spark.operators.html import forms

    page = (
        "<script>var f='<form action=\"/ghost\"><input></form>';"
        "</script><!-- <form action=\"/c\"><input></form> -->"
        '<form action="/s?a=&amp;b=1" method="GET">'
        '<input name="q"><inputx><select></select></form>'
        "<FORM METHOD='POST' ACTION='/login'>"
        "<INPUT TYPE='password'><textarea></textarea></FORM>"
        "<form><textarea></textarea></form>"
    )
    nested = (
        '<form action="/outer"><input name="a">'
        '<form action="/inner"><input name="b"></form></form>'
    )
    df = spark.createDataFrame(
        [(1, page), (2, nested), (3, None)], "doc_id long, html string"
    )
    out = {
        (r["doc_id"], r["form_no"]): (
            r["method"],
            r["action"],
            r["n_fields"],
            r["has_password"],
        )
        for r in forms(df).collect()
    }
    assert out[(1, 0)] == ("get", "/s?a=&b=1", 2, False)
    assert out[(1, 1)] == ("post", "/login", 2, True)
    assert out[(1, 2)] == ("get", None, 1, False)
    # nested form truncates at the FIRST close; inner fields counted
    assert out[(2, 0)] == ("get", "/outer", 2, False)
    assert len(out) == 4  # ghost forms stripped, NULL html no rows
    import pytest as _pytest

    with _pytest.raises(ValueError):
        forms(df.withColumn("_fo_h", F.lit("x")))


def test_bot_regularity_semantics(spark):
    """All-integer regularity rule: a constant-timer client flags, a
    jittered client and a bursty human do not; single-event and
    all-same-ts users can never be regular; min_events gates the
    flag."""
    from datetime import datetime, timedelta

    from annual_report_pdf_parsers_spark.operators.temporal import (
        bot_regularity,
    )

    def t(s):
        return datetime(2024, 1, 1) + timedelta(seconds=s)

    rows = []
    # bot: 30 events exactly 10 s apart
    rows += [(100 + i, t(10 * i), 1) for i in range(30)]
    # human: bursty gaps (1 s and 120 s alternating-ish)
    rows += [(200 + i, datetime(2024, 1, 1, 0, i % 2, i), 2) for i in range(30)]
    # regular but BELOW min_events
    rows += [(300 + i, t(10 * i), 3) for i in range(5)]
    # single event + same-ts pair
    rows += [(400, t(0), 4), (500, t(7), 5), (501, t(7), 5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long"
    )
    out = {
        r["user_id"]: r
        for r in bot_regularity(df, min_events=20).collect()
    }
    assert out[1]["is_bot"] and out[1]["is_regular"]
    assert out[1]["min_gap_us"] == out[1]["max_gap_us"] == 10_000_000
    assert not out[2]["is_bot"] and not out[2]["is_regular"]
    # regular timing but too few events: is_regular without is_bot
    assert out[3]["is_regular"] and not out[3]["is_bot"]
    assert not out[4]["is_regular"] and out[4]["n_gaps"] == 0
    assert not out[5]["is_regular"] and out[5]["sum_gap_us"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bot_regularity(df, min_events=1)


def test_host_safety_semantics(spark):
    """Priority classification: loopback by name and by 127/8, the
    three RFC-1918 ranges with the 172.16/12 boundary, link-local,
    public IP literal (fetchable, flagged), onion/mdns/bare never
    fetch, invalid quads die at the url parser (no_host), names
    fetch."""
    from annual_report_pdf_parsers_spark.operators.urls import (
        with_host_safety,
    )

    cases = [
        ("https://localhost/x", "loopback", False),
        ("https://a.Localhost/x", "loopback", False),
        ("http://127.0.0.1:8080/x", "loopback", False),
        ("http://10.0.0.1/x", "private_ip", False),
        ("http://192.168.1.1/x", "private_ip", False),
        ("http://172.16.0.1/x", "private_ip", False),
        ("http://172.31.255.255/x", "private_ip", False),
        ("http://172.32.0.1/x", "public_ip", True),
        ("http://169.254.1.1/x", "link_local", False),
        ("http://8.8.8.8/x", "public_ip", True),
        ("http://999.1.2.3/x", "no_host", False),
        ("http://a.onion/x", "onion", False),
        ("http://b.local/x", "mdns_local", False),
        ("http://intranet/x", "bare", False),
        ("junk url", "no_host", False),
        ("https://www.example.org/x", "name", True),
        # SSRF bypass arms (review findings): octal quads and IPv6
        # literals survive try_parse_url and MUST fail closed
        ("http://0177.0.0.1/x", "ambiguous_ip", False),
        ("http://010.1.2.3/x", "ambiguous_ip", False),
        ("http://[::ffff:127.0.0.1]/x", "ip6_literal", False),
        ("http://[::1]/x", "ip6_literal", False),
        ("http://0.1.2.3/x", "private_ip", False),
        # trailing-dot FQDN arms (ADVICE r05): a root-anchored dot
        # resolves identically in DNS — strip one dot, fail closed;
        # trailing-dot QUADS die at try_parse_url (no_host)
        ("http://localhost./x", "loopback", False),
        ("http://printer.local./x", "mdns_local", False),
        ("http://x.onion./x", "onion", False),
        ("http://127.0.0.1./x", "no_host", False),
        ("https://example.org./x", "name", True),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(cases)],
        "i long, url string",
    )
    got = {
        r["i"]: (r["host_class"], r["fetch_ok"])
        for r in with_host_safety(df).collect()
    }
    for i, (u, cls_, ok) in enumerate(cases):
        assert got[i] == (cls_, ok), u
    import pytest as _pytest

    with _pytest.raises(ValueError):
        with_host_safety(df.withColumn("host", F.lit("x")))


def test_warc_payload_extraction_compose(spark):
    """warc_records(keep_payload=True) -> main_content composition:
    the bounded payload feeds extraction in one chain, request and
    invalid records never mint pages, and a lying (short)
    Content-Length yields extraction over the truncated html."""
    from annual_report_pdf_parsers_spark.operators.html import (
        main_content,
    )
    from annual_report_pdf_parsers_spark.operators.warc import (
        warc_records,
    )

    body = (
        "<html><body><p>"
        + "visible main words repeated enough to clear the bar "
        + "visible main words repeated enough to clear the bar"
        + "</p></body></html>"
    )
    crlf = "\r\n"

    def rec(rtype, uri, clen, payload):
        return (
            f"WARC/1.0{crlf}WARC-Type: {rtype}{crlf}"
            f"WARC-Target-URI: {uri}{crlf}"
            f"Content-Length: {clen}{crlf}{crlf}{payload}{crlf}{crlf}"
        )

    full = rec("response", "u1", len(body), body)
    trunc = rec("response", "u2", len(body) - 60, body)
    req = rec("request", "u1", 3, "GET")
    df = spark.createDataFrame(
        [(1, full + req), (2, trunc)], "doc_id long, warc string"
    )
    recs = warc_records(df, keep_payload=True)
    by = {(r["doc_id"], r["rec_no"]): r for r in recs.collect()}
    assert by[(1, 1)]["payload"] == body
    assert by[(2, 1)]["payload"] == body[:-60]
    pages = recs.filter(
        (F.col("warc_type") == "response") & F.col("is_valid")
    ).select("doc_id", F.col("payload").alias("html"))
    mc = {r["doc_id"]: r for r in main_content(pages).collect()}
    assert len(mc) == 2  # the request record minted no page
    assert mc[1]["n_good"] >= 1
    assert mc[1]["main_text"] != mc[2]["main_text"]  # truncation shows
    # default audit form carries no payload column
    assert "payload" not in warc_records(df).columns


def test_attribution_matrix_semantics(spark):
    """First/last-touch picks are (ts, id)-deterministic and strictly
    before the FIRST conversion; purchase-first users credit
    'direct'; equal-ts events at conversion carry no credit;
    non-converters drop."""
    from datetime import datetime, timedelta

    from annual_report_pdf_parsers_spark.operators.temporal import (
        attribution_matrix,
    )

    def t(m):
        return datetime(2024, 1, 1) + timedelta(minutes=m)

    rows = [
        # u1: view -> click -> purchase -> click (post-conv ignored)
        (1, t(0), 1, "view"),
        (2, t(1), 1, "click"),
        (3, t(2), 1, "purchase"),
        (4, t(3), 1, "click"),
        # u2: purchase only -> direct/direct
        (5, t(0), 2, "purchase"),
        # u3: click AT conversion ts (no credit), earlier view wins
        (6, t(0), 3, "view"),
        (7, t(5), 3, "click"),
        (8, t(5), 3, "purchase"),
        # u4: never converts -> excluded
        (9, t(0), 4, "click"),
        # u5: same-ts first events -> id tie-break picks lower id
        (10, t(0), 5, "error"),
        (11, t(0), 5, "signup"),
        (12, t(9), 5, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string"
    )
    got = {
        (r["first_touch"], r["last_touch"]): r["n_users"]
        for r in attribution_matrix(df).collect()
    }
    assert got == {
        ("view", "click"): 1,   # u1
        ("direct", "direct"): 1,  # u2
        ("view", "view"): 1,    # u3 — the equal-ts click took no credit
        ("error", "signup"): 1,  # u5 — (ts, id) total order both ends
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        attribution_matrix(df.withColumn("_at_conv", F.lit(1)))
