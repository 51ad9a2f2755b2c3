"""The end-to-end extraction pipeline (SURVEY.md §3, "Spark lifecycle").

    pages (url, warc_ts, html, text, lang)
      -> classify (D2, dispatch.py)
      -> extract_rows (Arrow-batch slicer, operators/extract.py)
      -> assign_funds (meta ffill + ToC interval join, operators/joins.py)
      -> realign (P1/P11/D4)
      -> cleanup chain (P7 -> P9 -> W3 -> P3 -> W1 -> F*/P6/P12 -> names)
      -> join_manifest (J1/J4/P10)
      -> fixed 9-column projection (P2, reference README.md:25-35)

One logical plan end-to-end: Catalyst prunes the pages scan down to
(url, text, lang) — html/warc_ts are never read by this query — and the
only Python stage is the extraction mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import OUTPUT_COLUMNS
from ..operators.cleanup import (
    clean_names,
    rescue_embedded_currency,
    drop_junk_rows,
    ffill_currency,
    filter_currency_whitelist,
    fuse_fragments,
    normalize_numbers,
    realign,
)
from ..operators.extract import extract_resolved
from ..operators.joins import join_manifest
from .dispatch import classify, locale_col, provider_col, report_name_col


def extract_holdings(
    pages: DataFrame, manifest: DataFrame | None = None
) -> DataFrame:
    """pages -> cleaned holdings (before the manifest join).

    Plan shape (see SCALE.md §2): ONE Arrow-batch stage emitting rows
    with funds already resolved (ToC/meta lookup happens in-batch — the
    document is whole there), then ONE shuffle clustering (url, fund)
    that every downstream window/group reuses: P9's (url,fund,name)
    window, W3's descending window + group-by, W1's ffill are all
    satisfied by hash(url, fund) and plan as sorts, not exchanges.

    ``manifest`` (optional) enables D1 manifest-name routing (see
    plans/dispatch.py): a broadcast join of the per-url route map on the
    scan side — no exchange of the big side, one small-side shuffle to
    build the map.
    """
    classified = classify(pages, manifest).filter(
        F.col("doc_class").isNotNull()
    )
    rows = extract_resolved(classified).withColumn(
        "fund_name_report", report_name_col(F.col("fund"))  # F16 + lower
    ).drop("fund")
    # P11 shape filter + P1 realign + P7 junk drop BEFORE the exchange:
    # all three are per-row and order-independent, so running them map-side
    # shrinks the shuffled payload (junk/misshapen rows never ship, the
    # shape/lang columns never transit the exchange or the four sorts).
    rows = realign(rows)
    rows = drop_junk_rows(rows)
    # ONE wide exchange, keyed on url ALONE: hash(url) satisfies the
    # ClusteredDistribution of every downstream (url, fund, ...) window
    # and group-by (subset rule), AND it co-partitions holdings with the
    # url-keyed manifest join — a (url, fund) key would force the join to
    # re-exchange the big side.  Granularity is per-document, uniform.
    rows = rows.repartition("url")
    # P9 ran in-batch (extract.py) — per-page logic, no extra sort here
    rows = fuse_fragments(rows)
    rows = rescue_embedded_currency(rows)
    rows = filter_currency_whitelist(rows)
    rows = ffill_currency(rows)
    rows = normalize_numbers(rows, locale_col())
    from ..config import ARCHETYPES

    strip_leading = F.col("doc_class") == "keyword_scan_en"  # F13 archetype
    deep = F.col("doc_class").isin(
        [n for n, c in ARCHETYPES.items() if c.deep_name_clean]
    )  # F10+F11 archetypes (aviva/parser.py:673-680)
    hard = F.col("doc_class").isin(
        [n for n, c in ARCHETYPES.items() if c.hard_name_clean]
    )  # crelan hard clean() archetypes (crelan/parser.py:644-656)
    rows = clean_names(rows, strip_leading, deep, hard)
    return rows


def run_pipeline(
    pages: DataFrame,
    manifest: DataFrame,
    manifest_hint: str | None = None,
    manifest_routing: bool = True,
) -> DataFrame:
    """Full pipeline to the 9-column output contract.

    ``manifest_hint="shuffle_hash"`` selects the co-partitioned manifest
    join (see join_manifest) — the production shape when the manifest
    scales with the corpus; default lets Catalyst broadcast small ones.

    ``manifest_routing`` enables D1 manifest-name dispatch (default on —
    required for archetypes with manifest_route_regex; the reference's
    crelan dispatcher routes on the website name only).  Pass False when
    the corpus is known to contain no manifest-routed documents to keep
    the exact one-exchange legacy plan (bench.py does this for its
    pinned 7-class corpus so docs/sec stays comparable round over round).
    """
    holdings = extract_holdings(
        pages, manifest if manifest_routing else None
    )
    joined = join_manifest(holdings, manifest, hint=manifest_hint)
    return joined.select(
        provider_col().alias("fund_provider"),
        "fund_name_report",
        "fund_name_website",
        "isin",
        "holding_name",
        "market_value",
        "currency",
        "net_assets",
        F.col("url").alias("pdf_url"),
    ).select(*OUTPUT_COLUMNS)
