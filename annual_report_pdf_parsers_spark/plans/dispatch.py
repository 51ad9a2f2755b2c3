"""Dispatch stage (SURVEY.md §2.9 D1/D2/D3): classify each document.

The reference routes per-row in Python (crelan/parser.py:736-763 name
substrings; oddo/parser.py:427-435 page-0 content).  Here both mechanics
are declarative:

  D2 — a single ``when`` chain over the first page's text producing a
  ``doc_class`` column: pure Catalyst expression, evaluated once per
  document, drives both the Arrow-batch extractor and every downstream
  locale/provider branch without splitting the plan.

  D1 — manifest-name routing (crelan dispatches SOLELY on the website
  fund name: "Crelan"/"Metropolitan Rentastro" substrings pick the
  parser).  ``route_map`` reduces the manifest to one (url, class) row
  per routable document; ``classify`` left-joins it and gives it
  priority over the page-0 chain (``coalesce``), exactly the reference's
  name-first order.  Within one provider family several page-0 types map
  to distinct archetypes sharing a provider (oddo/parser.py:427-435) —
  keyword_scan_en / keyword_scan_en_t2 in ARCHETYPES.

Scale: the route map is one row per ROUTED url — corpus-growing, like
the manifest itself.  In the sandbox Catalyst broadcasts it; at 10^12
documents both pages and manifest live in bucket(url) Iceberg tables and
the join is storage-partitioned (no exchange of the big side, no driver
build).  The map build is one shuffle of the (small) manifest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ARCHETYPES, DISPATCH_ORDER
from ..sources.synthetic import PROVIDER_OF


# (config attr, output column) pairs the combined route map emits
_ROUTE_ATTRS: tuple[tuple[str, str], ...] = (
    ("manifest_route_regex", "_route_class"),       # D1 priority routing
    ("manifest_fallback_regex", "_fb_class"),       # D2 family fallback
)


def _route_idx(attr: str) -> tuple[Column | None, list[str]]:
    """When-chain mapping manifest names to a DISPATCH_ORDER-indexed
    route for one config attr; None when no archetype carries it."""
    idx: Column | None = None
    routable: list[str] = []
    for name in DISPATCH_ORDER:
        rx = getattr(ARCHETYPES[name], attr)
        if rx is None:
            continue
        cond = F.col("name").rlike(rx)
        i = F.lit(len(routable))
        idx = F.when(cond, i) if idx is None else idx.when(cond, i)
        routable.append(name)
    return idx, routable


def route_map(manifest: DataFrame) -> DataFrame | None:
    """D1 priority routes AND D2 family-fallback routes from ONE manifest
    aggregation: (url, _route_class, _fb_class).  min() makes each pick
    deterministic if share classes ever matched different archetypes.

    One pass on purpose: per-attr maps cost classify() a second
    small-side exchange and a third broadcast join on every routed plan
    even for corpora with no fallback-family documents (r04 advice);
    both columns share the same (url)-grouped aggregation.

    The aggregation runs on each route's DISPATCH_ORDER index, not the
    class STRING: min(int) plans as a HashAggregate while min(string)
    falls back to a SortAggregate — two pointless sorts of the manifest
    side (observed; test_pipeline_two_sorts pins the sort economy)."""
    parts: list[tuple[str, Column, list[str]]] = []
    for attr, out_col in _ROUTE_ATTRS:
        idx, routable = _route_idx(attr)
        if idx is not None:
            parts.append((out_col, idx, routable))
    if not parts:
        return None
    # filter on the ALIASED index attributes (post-select the manifest's
    # `name` column is gone), dropping manifest rows that route nowhere
    keep = F.col("_i" + parts[0][0]).isNotNull()
    for out_col, _idx, _r in parts[1:]:
        keep = keep | F.col("_i" + out_col).isNotNull()
    back_cols = []
    for out_col, _idx, routable in parts:
        back: Column | None = None
        for i, name in enumerate(routable):
            cond = F.col("_i" + out_col) == i
            back = (
                F.when(cond, name) if back is None else back.when(cond, name)
            )
        back_cols.append(back.alias(out_col))
    return (
        manifest.select(
            F.col("pdf_url").alias("url"),
            *[idx.alias("_i" + out_col) for out_col, idx, _r in parts],
        )
        .filter(keep)
        .groupBy("url")
        .agg(
            *[
                F.min("_i" + out_col).alias("_i" + out_col)
                for out_col, _idx, _r in parts
            ]
        )
        .select("url", *back_cols)
    )


def classify(
    pages: DataFrame, manifest: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """D2 (+ D1 when a manifest is supplied): add ``doc_class``; unknown
    layouts -> NULL.  Manifest routing takes priority — the reference's
    crelan dispatcher never looks at page content."""
    page0 = F.substring_index(F.col(text_col), "\f", 1)
    expr: Column | None = None
    for name in DISPATCH_ORDER:
        cond = page0.rlike(ARCHETYPES[name].classify_regex)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    routes = route_map(manifest) if manifest is not None else None
    if routes is None:
        return pages.withColumn("doc_class", expr)
    # ONE left join against the combined route map; priority is
    # explicit route > page-0 chain > family fallback — the fallback
    # goes LAST (oddo/parser.py:427-435: the marker types take
    # priority, the else-branch only catches unmarked documents)
    out = pages.join(routes, "url", "left")
    picks: list[Column] = []
    if "_route_class" in routes.columns:
        picks.append(F.col("_route_class"))
    picks.append(expr)
    if "_fb_class" in routes.columns:
        picks.append(F.col("_fb_class"))
    return out.withColumn("doc_class", F.coalesce(*picks)).drop(
        "_route_class", "_fb_class"
    )


def provider_col() -> Column:
    """D1/F20: provider literal from doc_class (one when-chain, JVM-side)."""
    expr = None
    for name, prov in PROVIDER_OF.items():
        cond = F.col("doc_class") == name
        expr = F.when(cond, prov) if expr is None else expr.when(cond, prov)
    return expr


def locale_col() -> Column:
    """Per-row numeric locale ('fr'/'en'/'auto') for the F1/F2/F3 chain."""
    expr = None
    for name, cfg in ARCHETYPES.items():
        cond = F.col("doc_class") == name
        loc = cfg.number_locale
        expr = F.when(cond, loc) if expr is None else expr.when(cond, loc)
    return expr


def report_name_col(fund_col: Column) -> Column:
    """F16: archetype-configured fund-name rewrites, then lowercase.

    The rewrite table lives in config (name_rewrites) — prefix strips only,
    so the rewritten report name stays a substring of the website fund name
    and the J1 manifest containment join is unaffected."""
    expr = F.lower(F.trim(fund_col))
    out = None
    for name, cfg in ARCHETYPES.items():
        if not cfg.name_rewrites:
            continue
        rewritten = fund_col
        for pat, repl in cfg.name_rewrites:
            rewritten = F.regexp_replace(rewritten, pat, repl)
        rewritten = F.lower(F.trim(rewritten))
        cond = F.col("doc_class") == name
        out = F.when(cond, rewritten) if out is None else out.when(cond, rewritten)
    return expr if out is None else out.otherwise(expr)
