"""Dispatch stage (SURVEY.md §2.9 D1/D2/D3): classify each document.

The reference routes per-row in Python (crelan/parser.py:736-763 name
substrings; oddo/parser.py:427-435 page-0 content).  Here it is a single
``when`` chain over the first page's text producing a ``doc_class`` column
— pure Catalyst expression, evaluated once per document, drives both the
Arrow-batch extractor and every downstream locale/provider branch without
splitting the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ARCHETYPES, DISPATCH_ORDER
from ..sources.synthetic import PROVIDER_OF


def classify(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """D2: add ``doc_class`` from page-0 content; unknown layouts -> NULL."""
    page0 = F.substring_index(F.col(text_col), "\f", 1)
    expr: Column | None = None
    for name in DISPATCH_ORDER:
        cond = page0.rlike(ARCHETYPES[name].classify_regex)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return pages.withColumn("doc_class", expr)


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
