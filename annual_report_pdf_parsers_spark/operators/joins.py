"""Join operators (SURVEY.md §2.3): fund assignment + manifest fan-back.

  J2 fund -> page-interval lookup   crelan/parser.py:57-95 (ToC scan)
  W4 lead for interval ends         crelan/parser.py:80, 87-90
  J1 manifest join                  aviva/parser.py:555-580
  J4 parse-once fan-back            crelan/parser.py:722-724 (memoized
                                    report reused per manifest share class
                                    => our 1:N join fan-out)
  P10 sentinel filter               aviva/parser.py:553-564
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import URL_SENTINELS


def toc_intervals(raw: DataFrame) -> DataFrame:
    """ToC rows -> (url, fund, pg, end_pg) page intervals.

    W4: ``end_pg`` is the NEXT ToC entry's page via ``lead()`` — the
    reference's ``contents['pg'][idx+1]`` (crelan/parser.py:80).  Our
    interval contract is [pg, end_pg): rows on the next section's first
    page belong to the next fund.
    """
    w = Window.partitionBy("_t_url").orderBy("page_no", "row_idx")
    return (
        raw.filter(F.col("kind") == "toc")
        .select(
            # alias away from 'url': toc and table rows share lineage (both
            # come from the extract stage), and a same-name self-join would
            # resolve ambiguously
            F.col("url").alias("_t_url"),
            "page_no",
            "row_idx",
            F.col("c0").alias("toc_fund"),
            F.col("c1").cast("int").alias("pg"),
        )
        .withColumn("end_pg", F.lead("pg").over(w))
        .drop("page_no", "row_idx")
    )


def assign_funds(raw: DataFrame) -> DataFrame:
    """Attach ``fund_name_report`` to every extracted table row.

    Two mechanisms, one plan:
      - meta rows (section headers carrying the fund name, F17): W2-style
        forward-fill — last meta at or before the row, per url;
      - ToC docs: J2 interval join against ``toc_intervals``.
    ``coalesce`` picks whichever applies; rows with neither are dropped
    (a table row outside any located section is noise).

    Scale: the ffill window shuffles on url once; the interval join is an
    equi-join on url with a range residual — co-partitioned with the
    window output, and tiny on the build side relative to table rows.
    """
    w = (
        Window.partitionBy("url")
        .orderBy("page_no", "row_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    meta_fund = F.last(
        F.when(F.col("kind") == "meta", F.col("c0")),
        ignorenulls=True,
    ).over(w)
    rows = (
        raw.withColumn("meta_fund", meta_fund)
        .filter(F.col("kind") == "row")
    )
    toc = toc_intervals(raw)
    joined = rows.join(
        toc,
        on=(
            (rows["url"] == toc["_t_url"])
            & (rows["page_no"] >= toc["pg"])
            & (toc["end_pg"].isNull() | (rows["page_no"] < toc["end_pg"]))
        ),
        how="left",
    ).drop("_t_url")
    return (
        joined.withColumn(
            "fund_name_report",
            F.lower(F.coalesce(F.col("toc_fund"), F.col("meta_fund"))),
        )
        .filter(F.col("fund_name_report").isNotNull())
        .drop("toc_fund", "meta_fund", "pg", "end_pg")
    )


def join_manifest(
    holdings: DataFrame, manifest: DataFrame, hint: str | None = None
) -> DataFrame:
    """J1/J4/P10: left join to the manifest for website name + isin.

    The match is the reference's substring containment (the ToC/report
    name is contained in the website fund name, crelan/parser.py:61-66):
    an equi-join on url with an ``instr`` residual.  One report row fans
    out to every matching share class (Cap/Dis) — the J4 memo semantics.
    Unmatched reports keep NULL website/isin (pages-driven engine).

    ``hint``: the manifest is NOT a fixed small dimension — it grows with
    the corpus (one row per fund share class), so at bench/production
    scale a driver-built broadcast is a serial bottleneck.  Pass
    ``"shuffle_hash"`` to co-partition instead: holdings are already
    hash(url)-clustered by the pipeline, so only the (small) manifest
    side shuffles and the hash build is parallel per-partition.  Default
    None lets Catalyst choose (broadcast for genuinely small manifests).
    """
    m = (
        manifest.filter(~F.col("pdf_url").isin(URL_SENTINELS))  # P10
        .select(
            F.col("name").alias("fund_name_website"),
            F.col("pdf_url").alias("_m_url"),
            "isin",
        )
    )
    if hint:
        m = m.hint(hint)
    name_match = (
        F.instr(F.lower(m["fund_name_website"]), holdings["fund_name_report"])
        > 0
    )
    # D5 rename-retry (roth/parser.py:418-427): archetypes flagged with
    # name_rename_retry get a second chance — the website name with the
    # configured token renames applied ("Euro " -> "Europe ") may
    # contain the report name; the OUTPUT keeps the website's original
    # spelling, exactly the reference's post-retry restore.  Still an
    # equi-join on url; the renames only widen the residual.  The
    # retry needs the holdings' doc_class column — frames without it
    # (non-pipeline callers) simply skip the retry rather than hitting
    # an unresolved-column error caused by a config.py entry.
    from ..config import ARCHETYPES

    for cls_name, cfg in ARCHETYPES.items():
        if not cfg.name_rename_retry or "doc_class" not in holdings.columns:
            continue
        renamed = F.lower(m["fund_name_website"])
        for old, new in cfg.name_rename_retry:
            renamed = F.replace(renamed, F.lit(old), F.lit(new))
        name_match = name_match | (
            (holdings["doc_class"] == cls_name)
            & (F.instr(renamed, holdings["fund_name_report"]) > 0)
        )
    cond = (holdings["url"] == m["_m_url"]) & name_match
    return holdings.join(m, on=cond, how="left").drop("_m_url")
