"""HTML main-content extraction — block-level text/link-density
heuristics (public knowledge: Kohlschütter et al. 2010 "Boilerplate
Detection using Shallow Text Features" / Boilerpipe; Pomikálek 2011
jusText).  The north-star pipeline narrative's DOM-heuristic stage,
expressed as a pure Spark SQL expression tree — no parser library, no
UDF — so the DuckDB oracle can restate it exactly.

Engine-portability: every regex construct used ((?is) inline flags,
lazy .*?, [^>]+ classes, non-capturing groups) behaves identically in
Java regex and RE2; backreferences are deliberately avoided (RE2 has
none — script and style are stripped in separate passes).  Whitespace
collapse uses the explicit ASCII class [ \\t\\n\\r] (the WS_SPLIT
lesson: never trust the engines' \\s to agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tags whose open/close boundaries delimit text blocks (block-level
# HTML elements; inline tags like <a>/<b> stay inside their block)
BLOCK_SPLIT_RE = (
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|section|"
    "article|header|footer|nav|aside|blockquote|form)[^>]*>"
)
SCRIPT_RE = "(?is)<script[^>]*>.*?</script>"
STYLE_RE = "(?is)<style[^>]*>.*?</style>"
COMMENT_RE = "(?s)<!--.*?-->"
ANCHOR_TEXT_RE = "(?is)<a[^>]*>(.*?)</a>"
TAG_RE = "<[^>]+>"
WS_RUN_RE = "[ \\t\\n\\r]+"

# minimal entity set, decoded in a FIXED order with &amp; LAST: the
# named entities are decoded first, so '&amp;lt;' (an author showing a
# literal '&lt;') correctly single-decodes to '&lt;' — amp-first would
# double-decode it to '<'.  Still the lossy-but-deterministic cleanup
# path, not a spec HTML parser.  Engine, both oracle builders, and the
# fuzz model all iterate THIS list — one site to edit.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _block_text(raw: Column) -> Column:
    """Visible text of one raw block: strip tags, decode entities,
    collapse whitespace runs, trim."""
    txt = F.regexp_replace(raw, TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, WS_RUN_RE, " "))


def _anchor_len(raw: Column) -> Column:
    """Total visible-text length inside <a>...</a> of one raw block."""
    return F.aggregate(
        F.regexp_extract_all(raw, F.lit(ANCHOR_TEXT_RE), 1),
        F.lit(0),
        lambda acc, a: acc + F.length(_block_text(a)),
    )


def main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_len: int = 40,
    max_link_density: float = 0.3,
    context_pass: bool = False,
) -> DataFrame:
    """jusText/Boilerpipe-style main-content extraction: split the
    document into blocks at block-level tag boundaries, score each
    block by visible-text length and LINK DENSITY (anchor-text chars /
    text chars — navigation and footers are link-dominated), keep
    blocks with len >= ``min_len`` and link density <=
    ``max_link_density``, and join the survivors with blank lines.

    Returns one row per document::

        (doc_id, main_text, n_blocks, n_good, link_frac)

    ``n_blocks`` counts non-empty text blocks, ``link_frac`` (ROUND 6,
    NULL for text-less docs) is the document-level anchor-text share —
    a page-quality signal on its own.  NULL html behaves as ''.

    ``context_pass=True`` adds jusText's CONTEXT rule (the block-
    fusion idea): a SHORT block (passes the link-density bar but not
    the length bar — an inline heading, a one-line lead-in) is
    PROMOTED to good when its nearest non-short neighbors on both
    sides are good (a missing neighbor at the document edge counts as
    good).  Link-dominated blocks are never promoted.  The neighbor
    labels come from two linear folds (running last-non-short label,
    forward and backward) — still a pure narrow chain.

    100 TB shape: pure narrow — one pinned raw-block array, one pinned
    (text, anchor_len) struct array; no shuffle, no UDF, no parser
    object.  This is the boilerplate-strip stage the north-star
    pipeline narrative names (link-density + block heuristics); W3
    block fusion and the cleanup library operate downstream of it.
    """
    clash = sorted(
        {"_mc_bl", "_mc_st", "_mc_lb", "_mc_pv", "_mc_nx"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"main_content staging columns clash: {clash}")
    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn(
        "_mc_bl",
        F.split(stripped, BLOCK_SPLIT_RE, -1),
    )
    from ..functions.numeric import pin

    base = base.withColumn(
        "_mc_st",
        pin(
            F.filter(
                F.transform(
                    F.col("_mc_bl"),
                    lambda b: F.struct(
                        _block_text(b).alias("txt"),
                        _anchor_len(b).alias("alen"),
                    ),
                ),
                lambda s: s["txt"] != "",
            )
        ),
    )
    st = F.col("_mc_st")

    def ld_ok(s):
        return s["alen"] <= F.length(s["txt"]) * F.lit(
            float(max_link_density)
        )

    def is_good(s):
        return (F.length(s["txt"]) >= min_len) & ld_ok(s)

    if not context_pass:
        good = F.filter(st, is_good)
    else:
        # labels: 1 good / 2 short / 0 bad; neighbor context = running
        # last-non-short label, forward and backward (missing -> good)
        lab = F.transform(
            st,
            lambda s: F.when(is_good(s), F.lit(1))
            .when(ld_ok(s), F.lit(2))
            .otherwise(F.lit(0)),
        )
        base = base.withColumn("_mc_lb", pin(lab))
        lb = F.col("_mc_lb")

        def running(arr):
            return F.aggregate(
                arr,
                F.struct(
                    F.array().cast("array<int>").alias("out"),
                    F.lit(1).alias("last"),
                ),
                lambda acc, l: F.struct(
                    F.concat(
                        acc["out"], F.array(acc["last"])
                    ).alias("out"),
                    F.when(l != 2, l)
                    .otherwise(acc["last"])
                    .alias("last"),
                ),
                lambda acc: acc["out"],
            )

        base = base.withColumn("_mc_pv", pin(running(lb)))
        base = base.withColumn(
            "_mc_nx", pin(F.reverse(running(F.reverse(lb))))
        )
        st = F.col("_mc_st")
        keep_idx = F.filter(
            F.sequence(F.lit(1), F.greatest(F.size(st), F.lit(1))),
            lambda i: (i <= F.size(st))
            & (
                (F.element_at(F.col("_mc_lb"), i.cast("int")) == 1)
                | (
                    (
                        F.element_at(F.col("_mc_lb"), i.cast("int"))
                        == 2
                    )
                    & (
                        F.element_at(F.col("_mc_pv"), i.cast("int"))
                        == 1
                    )
                    & (
                        F.element_at(F.col("_mc_nx"), i.cast("int"))
                        == 1
                    )
                )
            ),
        )
        good = F.transform(
            keep_idx,
            lambda i: F.element_at(st, i.cast("int")),
        )
    tot_len = F.aggregate(
        st, F.lit(0), lambda acc, s: acc + F.length(s["txt"])
    )
    tot_alen = F.aggregate(
        st, F.lit(0), lambda acc, s: acc + s["alen"]
    )
    return base.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws(
            "\n\n", F.transform(good, lambda s: s["txt"])
        ).alias("main_text"),
        F.size(st).cast("long").alias("n_blocks"),
        F.size(good).cast("long").alias("n_good"),
        F.when(
            tot_len > 0,
            F.round(tot_alen / tot_len.cast("double"), 6),
        ).alias("link_frac"),
    )


HEADING_RE = "(?is)<h([1-6])[^>]*>(.*?)</h[1-6]>"


def outline(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Document OUTLINE extraction: every <h1>..<h6> heading in order,
    with its level and the visible heading text (same tag-strip /
    entity / whitespace rules as `main_content`) — the
    section-structure signal (public practice: outline-based section
    chunking for RAG, heading-density page classification).

    Emits one row per heading::

        (doc_id, pos, level, heading)

    ``pos`` is the 0-based heading index within the document; blank-
    text headings are kept (pos stays aligned with the raw sequence)
    but carry ''.  NULL html emits no rows.

    100 TB shape: narrow + ONE posexplode; both capture groups come
    from the same regexp_extract_all pass over a pinned column (the
    level list and body list are zipped by index — RE2/Java agree on
    match order and non-overlap).
    """
    clash = sorted({"_ol_h", "_ol_lv", "_ol_tx"} & set(df.columns))
    if clash:
        raise ValueError(f"outline staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    # same script/style/comment strip as main_content — a commented-out
    # or document.write'd heading is not part of the document outline
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_ol_h", pin(h))
    hc = F.col("_ol_h")
    base = base.withColumn(
        "_ol_lv",
        pin(F.regexp_extract_all(hc, F.lit(HEADING_RE), 1)),
    ).withColumn(
        "_ol_tx",
        pin(F.regexp_extract_all(hc, F.lit(HEADING_RE), 2)),
    )
    lv = F.col("_ol_lv")
    tx = F.col("_ol_tx")
    rows = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(lv), F.lit(1))
        ),
        lambda i: F.struct(
            F.element_at(lv, i.cast("int"))
            .cast("int")
            .alias("level"),
            _block_text(F.element_at(tx, i.cast("int"))).alias(
                "heading"
            ),
        ),
    )
    return base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.when(F.size(lv) > 0, rows).otherwise(
                F.array().cast(
                    "array<struct<level:int,heading:string>>"
                )
            )
        ).alias("pos", "_o"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("_o.level").alias("level"),
        F.col("_o.heading").alias("heading"),
    )


LINK_RE = (
    "(?is)<a[^>]*?href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"
)


def links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """OUTLINK extraction — the crawl-graph feed (public practice:
    frontier expansion, PageRank-family link graphs, anchor-text
    corpora all start from (page, href, anchor) triples).  Quoted
    ``href`` attributes only (single or double — the unquoted legacy
    form is skipped, documented); anchors cleaned with the shared
    block-text rules; script/style/comment regions stripped first
    (a commented-out link is not an outlink).

    Emits one row per link, in document order::

        (doc_id, pos, href, anchor)

    NULL html emits no rows.  100 TB shape: narrow + ONE posexplode;
    both capture groups off pinned extract_all passes (the outline
    pattern).
    """
    clash = sorted({"_lk_h", "_lk_hr", "_lk_tx"} & set(df.columns))
    if clash:
        raise ValueError(f"links staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_lk_h", pin(h))
    hc = F.col("_lk_h")
    base = base.withColumn(
        "_lk_hr", pin(F.regexp_extract_all(hc, F.lit(LINK_RE), 1))
    ).withColumn(
        "_lk_tx", pin(F.regexp_extract_all(hc, F.lit(LINK_RE), 2))
    )
    hr = F.col("_lk_hr")
    tx = F.col("_lk_tx")
    rows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(hr), F.lit(1))),
        lambda i: F.struct(
            F.element_at(hr, i.cast("int")).alias("href"),
            _block_text(F.element_at(tx, i.cast("int"))).alias(
                "anchor"
            ),
        ),
    )
    return base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.when(F.size(hr) > 0, rows).otherwise(
                F.array().cast(
                    "array<struct<href:string,anchor:string>>"
                )
            )
        ).alias("pos", "_l"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("_l.href").alias("href"),
        F.col("_l.anchor").alias("anchor"),
    )


TITLE_RE = "(?is)<title[^>]*>(.*?)</title>"
META_DESC_RE = (
    "(?is)<meta[^>]*?name[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']description[\"'][^>]*?content[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
CANONICAL_RE = (
    "(?is)<link[^>]*?rel[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']canonical[\"'][^>]*?href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
LANG_ATTR_RE = (
    "(?is)<html[^>]*?lang[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
CHARSET_RE = (
    "(?is)<meta[^>]*?charset[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']?([A-Za-z0-9._-]+)"
)


def metadata(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Page METADATA extraction — title, meta description, canonical
    url, declared language, charset (public practice: these head
    fields feed url canonicalization, language routing, and dedup
    keys before any body text is parsed; WARC/WET tooling extracts
    the same set).  One row per document::

        (doc_id, [keep_cols...], title, meta_description,
         canonical_url, html_lang, charset)

    ``keep_cols`` are passed through untouched (the composition
    convention — urls.canonical_dedup threads the crawl url this
    way).  First match wins for every field.  ``title`` and
    ``meta_description`` are cleaned with the shared block-text rules
    (tag strip, entity decode, whitespace collapse, trim);
    ``canonical_url`` stays RAW (the href contract of `links`);
    ``html_lang`` and ``charset`` are lowercased.  Absent fields are
    NULL — and so are present-but-blank ones (regexp_extract cannot
    distinguish them; a blank title carries no signal).  NULL html
    behaves as ''.

    Documented limitations (both engines, symmetric): attribute order
    is fixed (``name`` before ``content``, ``rel`` before ``href`` —
    the overwhelmingly dominant emitted order) and attribute values
    must be quoted, except charset where the bare legacy form is
    accepted.  Script/style/comment regions are stripped first, so a
    commented-out or document.write'd title never wins.

    100 TB shape: pure narrow — one pinned stripped-html column, five
    regexp_extract passes over it; no shuffle, no UDF, no parser.
    """
    clash = sorted({"_md_h"} & set(df.columns))
    if clash:
        raise ValueError(f"metadata staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_md_h", pin(h))
    hc = F.col("_md_h")

    def first(re_: str) -> Column:
        return F.regexp_extract(hc, re_, 1)

    return base.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        F.nullif(_block_text(first(TITLE_RE)), F.lit("")).alias(
            "title"
        ),
        F.nullif(
            _block_text(first(META_DESC_RE)), F.lit("")
        ).alias("meta_description"),
        F.nullif(first(CANONICAL_RE), F.lit("")).alias(
            "canonical_url"
        ),
        F.nullif(
            F.lower(F.trim(first(LANG_ATTR_RE))), F.lit("")
        ).alias("html_lang"),
        F.nullif(F.lower(first(CHARSET_RE)), F.lit("")).alias(
            "charset"
        ),
    )


# open-tag boundary: '<p' must be followed by whitespace, '/', or '>'
# so '<pre' / '<param' never count as '<p' (the html_tables '<t([dh])'
# lesson applied to counting)
DOM_TAG_BOUNDARY = "[ \\t\\n\\r/>]"
DOM_COUNTED_TAGS = ["p", "div", "table", "li", "a"]


def dom_stats(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-document DOM shape statistics — the DISPATCH-stage routing
    signal (the north-star pipeline classifies each document by
    markup shape before choosing an extraction strategy: table-heavy
    pages take the grid path, list/paragraph pages the text-density
    path; Boilerpipe/jusText both consume exactly these shallow
    features).  One row per document::

        (doc_id, [keep_cols...], n_tags, n_p, n_div, n_table, n_li,
         n_a, text_chars, markup_frac)

    ``n_tags`` counts every markup tag after script/style/comment
    stripping; per-tag counts match OPEN tags with a boundary guard
    ('<p' then whitespace//>/ '>' — '<pre>' is not a '<p>').
    ``text_chars`` = length of the block-text cleanup of the whole
    stripped page (tag strip, entity decode, ws collapse, trim — the
    shared rules); ``markup_frac`` = round(1 - text_chars /
    raw_chars, 6), 0.0 for empty pages (guarded division — the ANSI
    rule).  NULL html behaves as ''.

    100 TB shape: pure narrow — one pinned stripped-html column,
    regexp_count passes over it (JVM codegen); no shuffle, no
    Generate, no UDF.
    """
    clash = sorted({"_ds_h", "_ds_tc"} & set(df.columns))
    if clash:
        raise ValueError(f"dom_stats staging columns clash: {clash}")
    from ..functions.numeric import pin

    h0 = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h0, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_ds_h", pin(h))
    hc = F.col("_ds_h")
    # text_chars feeds two outputs — pin so the block-text regex
    # chain evaluates once (the gotcha-2 staging rule)
    base = base.withColumn("_ds_tc", pin(F.length(_block_text(hc))))

    def cnt(tag: str) -> Column:
        return F.regexp_count(
            hc, F.lit(f"(?i)<{tag}{DOM_TAG_BOUNDARY}")
        ).cast("long")

    tc = F.col("_ds_tc")
    raw_len = F.length(h0)
    return base.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        F.regexp_count(hc, F.lit(TAG_RE)).cast("long").alias("n_tags"),
        *[cnt(t).alias(f"n_{t}") for t in DOM_COUNTED_TAGS],
        tc.cast("long").alias("text_chars"),
        F.when(raw_len == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0)
                - tc.cast("double") / raw_len.cast("double"),
                6,
            )
        )
        .alias("markup_frac"),
    )


def _meta_attr_re(attr: str, value: str) -> str:
    """Meta-tag content regex for one (attr, value) pair — the
    META_DESC_RE contract generalized: fixed attribute order (``attr``
    before ``content``), quoted values, case-insensitive."""
    return (
        f"(?is)<meta[^>]*?{attr}[ \\t\\n\\r]*=[ \\t\\n\\r]*"
        f"[\"']{value}[\"'][^>]*?content[ \\t\\n\\r]*=[ \\t\\n\\r]*"
        "[\"']([^\"']*)[\"']"
    )


# Open Graph uses the ``property`` attribute (RDFa), Twitter cards use
# ``name`` — both are meta/content pairs (public spec: ogp.me, the
# Twitter card markup docs).
OPENGRAPH_FIELDS = [
    ("og_title", "property", "og:title", "text"),
    ("og_description", "property", "og:description", "text"),
    ("og_image", "property", "og:image", "raw"),
    ("og_url", "property", "og:url", "raw"),
    ("og_type", "property", "og:type", "lower"),
    ("twitter_card", "name", "twitter:card", "lower"),
]


def opengraph(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Open Graph / Twitter-card extraction — the SOCIAL-metadata twin
    of :func:`metadata` (public practice: og:title/og:description are
    often the cleanest publisher-authored summary of a page, og:url is
    a canonical-url signal, og:type routes article-vs-site pages).
    One row per document::

        (doc_id, [keep_cols...], og_title, og_description, og_image,
         og_url, og_type, twitter_card)

    og: fields match on the ``property`` attribute (RDFa, per ogp.me),
    twitter_card on ``name`` — a ``name="og:title"`` tag is NOT Open
    Graph and never matches (documented strictness).  First match wins
    per field.  Text fields (title/description) are cleaned with the
    shared block-text rules (entity decode, ws collapse, trim); url
    fields (image/url) stay RAW (the href contract); type/card are
    lowercased + trimmed.  Absent and present-but-blank both -> NULL;
    NULL html behaves as ''.  Attribute order is fixed (``property``/
    ``name`` before ``content``) and values must be quoted — the
    metadata() contract.  Script/style/comment regions are stripped
    first.

    100 TB shape: pure narrow — one pinned stripped-html column, six
    regexp_extract passes; no shuffle, no UDF.
    """
    clash = sorted({"_og_h"} & set(df.columns))
    if clash:
        raise ValueError(f"opengraph staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_og_h", pin(h))
    hc = F.col("_og_h")

    def field(attr: str, value: str, mode: str) -> Column:
        raw = F.regexp_extract(hc, _meta_attr_re(attr, value), 1)
        if mode == "text":
            out = _block_text(raw)
        elif mode == "lower":
            out = F.lower(F.trim(raw))
        else:
            out = raw
        return F.nullif(out, F.lit(""))

    return base.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        *[
            field(attr, value, mode).alias(name)
            for name, attr, value, mode in OPENGRAPH_FIELDS
        ],
    )


META_ROBOTS_RE = (
    "(?is)<meta[^>]*?name[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']robots[\"'][^>]*?content[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
_DIR_TRIM_RE = "^[ \\t\\n\\r]+|[ \\t\\n\\r]+$"


def robots_meta(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Meta-robots page-level crawl policy — the PAGE-side dual of
    corpus_robots_filter (robots.txt is the host's word; ``<meta
    name="robots">`` is the page's own): a corpus that keeps noindex
    pages republishes content its publisher withdrew, so crawl
    pipelines drop them before extraction.  One row per document::

        (doc_id, [keep_cols...], noindex, nofollow, noarchive, keep)

    Directive semantics follow the de-facto spec (Google/Bing robots
    meta): the ``content`` attribute is a comma-separated directive
    list; directives are case-insensitive and whitespace-trimmed;
    MULTIPLE robots meta tags union their directives; ``none``
    expands to ``noindex + nofollow``.  ``keep`` = NOT noindex.
    Only the generic ``robots`` name is honored — bot-specific names
    (``googlebot`` etc.) are crawler-identity decisions this engine
    deliberately does not take (documented narrowing).  Attribute
    order is fixed (``name`` before ``content``, the META_DESC_RE
    contract) and values must be quoted.  Script/style/comment
    regions are stripped first (a commented-out or document.write'd
    directive is not policy).  NULL html behaves as '' (all-false,
    keep).

    100 TB shape: pure narrow — one pinned stripped-html column, one
    extract_all + in-expression token flatten; no shuffle, no
    Generate, no UDF.
    """
    clash = sorted({"_rm_h", "_rm_toks"} & set(df.columns))
    if clash:
        raise ValueError(f"robots_meta staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_rm_h", pin(h))
    toks = F.transform(
        F.flatten(
            F.transform(
                F.regexp_extract_all(
                    F.col("_rm_h"), F.lit(META_ROBOTS_RE), 1
                ),
                lambda c: F.split(F.lower(c), ","),
            )
        ),
        lambda t: F.regexp_replace(t, _DIR_TRIM_RE, ""),
    )
    # pin the token array: noindex/nofollow/noarchive/keep would
    # otherwise each inline the whole extract+flatten chain (the
    # gotcha-2 staging rule)
    staged = base.withColumn("_rm_toks", pin(toks))
    tk = F.col("_rm_toks")
    none_ = F.array_contains(tk, "none")
    noindex = F.array_contains(tk, "noindex") | none_
    return staged.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        noindex.alias("noindex"),
        (F.array_contains(tk, "nofollow") | none_).alias("nofollow"),
        F.array_contains(tk, "noarchive").alias("noarchive"),
        (~noindex).alias("keep"),
    )


def dst_host_of(src: Column, href: Column) -> Column:
    """Target host of one outlink: absolute http(s) hrefs resolve via
    host parsing (junk absolute hrefs -> the source host, never a
    throw); relative hrefs are same-host by definition.  ONE site for
    the resolution rule, shared by `host_link_graph` and
    `anchor_terms`."""
    from .urls import host_of

    return F.coalesce(
        F.when(href.rlike("(?i)^https?://"), host_of(href)).otherwise(
            src
        ),
        src,
    )


def anchor_terms(
    links_df: DataFrame,
    src_host_col: str = "src_host",
    href_col: str = "href",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """Anchor-TEXT aggregation per target host — the classic
    relevance/training signal (public practice: TREC/MS MARCO anchor
    harvesting, Common Crawl anchor-text corpora): what the web calls
    a site is often a better label than the site's own text.

    Input is `links` output plus the source host.  Anchor text arrives
    with the block-text INVARIANT (whitespace runs collapsed to single
    spaces, trimmed), so the term split on a literal ' ' is exact —
    both engines split identically by construction.  Terms are
    lowercased; empties drop (blank anchors contribute nothing).
    Rows with a NULL source host drop (no resolvable target).

    Returns ``(dst_host, term, n_links, rnk)`` — the top-``k`` anchor
    terms per target host, ranked by (count DESC, term ASC).

    100 TB shape: narrow resolve+explode into ONE map-side-partial agg
    keyed (dst_host, term), then the per-host top-k plans as
    WindowGroupLimit (map-side k-prune before the final sort) — hub
    hosts never materialize their full term list on one task.
    """
    from pyspark.sql import Window

    dst = dst_host_of(F.col(src_host_col), F.col(href_col))
    terms = (
        links_df.filter(F.col(src_host_col).isNotNull())
        .select(
            dst.alias("dst_host"),
            F.explode(
                F.split(F.lower(F.col(anchor_col)), " ")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_links").desc(), F.col("term")
    )
    return terms.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).filter(F.col("rnk") <= k)


def host_link_graph(
    links_df: DataFrame,
    src_host_col: str = "src_host",
    href_col: str = "href",
    min_edges: int = 1,
) -> DataFrame:
    """HOST-level link graph from (src_host, href) rows: resolve each
    href's target host (absolute http/https urls only — relative links
    are same-host edges by definition), aggregate to weighted edges.
    The input to PageRank / domain-authority / spam-neighborhood
    analyses.

    Returns ``(src_host, dst_host, n_links, n_docs)`` for edges with
    at least ``min_edges`` links, where dst_host for relative hrefs is
    the source host itself.  Rows whose source host is NULL are
    dropped (unparseable pages contribute no edges).

    100 TB shape: narrow host resolution (try_parse_url — junk hrefs
    group under the source host, never throw) + ONE map-side-partial
    agg keyed by (src, dst); hub hosts are exactly what map-side
    combine eats.
    """
    return (
        links_df.filter(F.col(src_host_col).isNotNull())
        .select(
            F.col(src_host_col).alias("src_host"),
            dst_host_of(
                F.col(src_host_col), F.col(href_col)
            ).alias("dst_host"),
            F.col("doc_id"),
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.count_distinct(F.col("doc_id")).cast("long").alias(
                "n_docs"
            ),
        )
        .filter(F.col("n_links") >= min_edges)
    )


TABLE_RE = "(?is)<table(?:[ \\t\\n\\r][^>]*)?>(.*?)</table>"
TR_RE = "(?is)<tr(?:[ \\t\\n\\r][^>]*)?>(.*?)</tr>"
# group 1 = the tag letter (d/h, any case), group 2 = the cell body.
# No backreference on the close tag (RE2 has none) — '<td>x</th>' is
# malformed HTML and closes the cell at the first of either close tag,
# deterministically in both engines.
CELL_RE = "(?is)<t([dh])(?:[ \\t\\n\\r][^>]*)?>(.*?)</t[dh]>"


def tables(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """HTML TABLE extraction — the cell grid as relational rows, the
    webtext analog of the reference engine's column-grid page slicing
    (bnp/parser.py extract_tables -> per-cell grid; here the grid
    boundaries are <table>/<tr>/<td|th> markup instead of x-y cuts).
    Public practice: web-table corpora (WDC Web Table Corpus, TabLib)
    are mined exactly this way at CommonCrawl scale.

    Emits one row per CELL, in document order::

        (doc_id, table_no, row_no, col_no, is_header, cell)

    ``table_no``/``row_no``/``col_no`` are 0-based positions (col_no
    is the CELL index within its row — colspan/rowspan are not
    expanded, documented); ``is_header`` marks <th> cells; ``cell`` is
    cleaned with the shared block-text rules (tag strip, entity
    decode, whitespace collapse, trim — an empty cell carries '').
    Script/style/comment regions are stripped first (a commented-out
    or document.write'd table is not a table).  <thead>/<tbody>/
    <tfoot>/<caption> wrappers pass through transparently (they never
    match TR_RE/CELL_RE — the open-tag regexes require whitespace or
    '>' after the tag name, so <track>/<thead> are not <tr>/<th>).
    NESTED tables are the documented lossy-but-deterministic trade of
    the no-parser design: the outer body truncates at the FIRST
    </table> (the inner's close), identically in both engines.  Rows
    with no cells and NULL/table-less html emit nothing.

    100 TB shape: narrow + TWO posexplodes (table->row, row->cell),
    zero exchanges, no UDF; the per-level regex passes run on the
    already-exploded fragment, never re-scanning the page (the
    lambda-attribute rule: each extract_all input is the lambda
    element or a pinned attribute, NOTES gotcha 3).
    """
    clash = sorted(
        {"_tb_h", "_tb_rs", "_tb_raw", "_tb_tg", "_tb_cx"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"tables staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_tb_h", pin(h))
    # (table_no, row_no, raw-row) structs in one flattened pass: the
    # two-arg transform lambdas are (element, index) HOFs (NOTES
    # gotcha 4 — here that behavior is exactly what we want).
    rows = F.flatten(
        F.transform(
            F.regexp_extract_all(
                F.col("_tb_h"), F.lit(TABLE_RE), 1
            ),
            lambda tb, ti: F.transform(
                F.regexp_extract_all(tb, F.lit(TR_RE), 1),
                lambda r, ri: F.struct(
                    ti.cast("long").alias("table_no"),
                    ri.cast("long").alias("row_no"),
                    r.alias("raw"),
                ),
            ),
        )
    )
    per_row = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(pin(rows)).alias("_tb_rs"),
    ).select(
        "doc_id",
        F.col("_tb_rs.table_no").alias("table_no"),
        F.col("_tb_rs.row_no").alias("row_no"),
        F.col("_tb_rs.raw").alias("_tb_raw"),
    )
    per_row = per_row.withColumn(
        "_tb_tg",
        pin(
            F.regexp_extract_all(
                F.col("_tb_raw"), F.lit(CELL_RE), 1
            )
        ),
    ).withColumn(
        "_tb_cx",
        pin(
            F.regexp_extract_all(
                F.col("_tb_raw"), F.lit(CELL_RE), 2
            )
        ),
    )
    tg = F.col("_tb_tg")
    cells = F.transform(
        F.col("_tb_cx"),
        lambda c, i: F.struct(
            i.cast("long").alias("col_no"),
            (
                F.lower(F.element_at(tg, (i + 1).cast("int")))
                == "h"
            ).alias("is_header"),
            _block_text(c).alias("cell"),
        ),
    )
    return per_row.select(
        "doc_id",
        "table_no",
        "row_no",
        F.explode(cells).alias("_tb_c"),
    ).select(
        "doc_id",
        "table_no",
        "row_no",
        F.col("_tb_c.col_no").alias("col_no"),
        F.col("_tb_c.is_header").alias("is_header"),
        F.col("_tb_c.cell").alias("cell"),
    )


# group 1 = the list-kind letter (u/o, any case), group 2 = the list
# body.  No backreference on the close tag (RE2 has none) — a nested
# list truncates the outer body at the FIRST close of either kind,
# deterministically in both engines (same trade as TABLE_RE).
UL_OL_RE = "(?is)<([uo])l(?:[ \\t\\n\\r][^>]*)?>(.*?)</[uo]l>"
# items REQUIRE a </li> close tag: RE2 has no lookahead, so the
# HTML-legal implicit close (next <li> or list end) can't be expressed
# portably — unclosed items are dropped, identically in both engines.
LI_RE = "(?is)<li(?:[ \\t\\n\\r][^>]*)?>(.*?)</li>"


def lists(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """HTML LIST extraction — <ul>/<ol> items as relational rows, the
    companion of :func:`tables` for the other structured-markup region
    webtext carries (navigation menus, step lists, bullet summaries).
    The reference engine's keyword-anchor keep-lists
    (bnp/parser.py KEEP_LIST semantics) read exactly this shape once
    the markup boundaries replace the x-y grid.

    Emits one row per ITEM, in document order::

        (doc_id, list_no, ordered, item_no, item)

    ``list_no``/``item_no`` are 0-based positions; ``ordered`` marks
    <ol> lists; ``item`` is cleaned with the shared block-text rules
    (tag strip, entity decode, whitespace collapse, trim — an empty
    item carries '').  Script/style/comment regions are stripped first
    (a commented-out or document.write'd list is not a list).  The
    open-tag regexes require whitespace or '>' after the tag name, so
    <link>/<ulx> never match <li>/<ul>.  NESTED lists are the
    documented lossy-but-deterministic trade of the no-parser design:
    the outer body truncates at the FIRST close tag of either kind, so
    inner items that closed before it attribute to the outer list.
    Items without a </li> close are dropped (RE2 portability — see
    LI_RE).  Lists with no closed items and NULL/list-less html emit
    nothing.

    100 TB shape: narrow + ONE posexplode (list->row) + ONE item
    explode, zero exchanges, no UDF; the item-level regex pass runs on
    the already-exploded list body, never re-scanning the page (the
    lambda-attribute rule, NOTES gotcha 3).
    """
    clash = sorted(
        {"_li_h", "_li_ls", "_li_tg", "_li_bd", "_li_raw", "_li_it"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"lists staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = (
        df.withColumn("_li_h", pin(h))
        .withColumn(
            "_li_tg",
            pin(
                F.regexp_extract_all(
                    F.col("_li_h"), F.lit(UL_OL_RE), 1
                )
            ),
        )
        .withColumn(
            "_li_bd",
            pin(
                F.regexp_extract_all(
                    F.col("_li_h"), F.lit(UL_OL_RE), 2
                )
            ),
        )
    )
    tg = F.col("_li_tg")
    lsts = F.transform(
        F.col("_li_bd"),
        lambda b, i: F.struct(
            i.cast("long").alias("list_no"),
            (
                F.lower(F.element_at(tg, (i + 1).cast("int")))
                == "o"
            ).alias("ordered"),
            b.alias("raw"),
        ),
    )
    per_list = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(lsts).alias("_li_ls"),
    ).select(
        "doc_id",
        F.col("_li_ls.list_no").alias("list_no"),
        F.col("_li_ls.ordered").alias("ordered"),
        F.col("_li_ls.raw").alias("_li_raw"),
    )
    items = F.transform(
        F.regexp_extract_all(F.col("_li_raw"), F.lit(LI_RE), 1),
        lambda c, i: F.struct(
            i.cast("long").alias("item_no"),
            _block_text(c).alias("item"),
        ),
    )
    return per_list.select(
        "doc_id",
        "list_no",
        "ordered",
        F.explode(items).alias("_li_it"),
    ).select(
        "doc_id",
        "list_no",
        "ordered",
        F.col("_li_it.item_no").alias("item_no"),
        F.col("_li_it.item").alias("item"),
    )


META_DATE_RE = (
    "(?is)<meta[^>]*?(?:property|name)[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"'](?:article:published_time|article:modified_time|date|"
    "dc\\.date(?:\\.issued)?|publish(?:ed)?[-_]?date)[\"']"
    "[^>]*?content[ \\t\\n\\r]*=[ \\t\\n\\r]*[\"']([^\"']*)[\"']"
)
TIME_DATE_RE = (
    "(?is)<time[^>]*?datetime[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
ISO_DATE_RE = "^([0-9]{4})-([0-9]{2})-([0-9]{2})"
URL_DATE_RE = (
    "/((?:19|20)[0-9]{2})/([0-9]{1,2})(?:/([0-9]{1,2}))?(?:/|$)"
)


def _canon_date(y: Column, m: Column, d: Column) -> Column:
    """'YYYY-MM-DD' when (y, m, d) is a REAL calendar date inside the
    plausible-web-content window (1995-2035, correct day-in-month
    incl. leap years), else NULL.  Pure integer arithmetic — identical
    in Spark and DuckDB; no date parser, no timezone."""
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    max_d = (
        F.when(m.isin(4, 6, 9, 11), F.lit(30))
        .when(m == 2, F.when(leap, F.lit(29)).otherwise(F.lit(28)))
        .otherwise(F.lit(31))
    )
    ok = (
        y.isNotNull()
        & m.isNotNull()
        & d.isNotNull()
        & y.between(1995, 2035)
        & m.between(1, 12)
        & (d >= 1)
        & (d <= max_d)
    )
    return F.when(
        ok,
        F.concat_ws(
            "-",
            y.cast("string"),
            F.lpad(m.cast("string"), 2, "0"),
            F.lpad(d.cast("string"), 2, "0"),
        ),
    )


def publish_date(
    df: DataFrame,
    html_col: str = "html",
    url_col: str | None = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Publish-DATE extraction (public practice: htmldate /
    trafilatura's date stage — every news/blog corpus carries one).
    First valid candidate wins across three sources in priority
    order::

        meta  — <meta property|name="article:published_time|
                article:modified_time|date|dc.date[.issued]|
                publish[ed][-_]date" content="...">
        time  — <time datetime="...">
        url   — a /YYYY/MM[/DD]/ path segment (missing day -> 01,
                the htmldate convention)

    meta/time values must START with an ISO 'YYYY-MM-DD' prefix
    (documented — free-text dates are the parser-library trade this
    engine doesn't make); every candidate is validated as a REAL
    calendar date (1995-2035, day-in-month, leap years) by pure
    integer arithmetic, so an invalid high-priority candidate FALLS
    THROUGH to the next source.  Emits one row per document::

        (doc_id, pub_date, date_source)

    with pub_date 'YYYY-MM-DD' (a STRING, deliberately: cross-engine
    date types disagree long before the arithmetic does) and
    date_source in ('meta', 'time', 'url') or both NULL.  Script/
    style/comment regions are stripped first; attribute order is
    fixed (property/name before content) and values quoted, the
    metadata() contract.  ``url_col=None`` skips the url source.

    100 TB shape: pure narrow — one pinned stripped-html column, two
    first-match extracts + three url-group extracts + integer
    validation; no shuffle, no UDF, no date parser.
    """
    clash = sorted(
        {
            "_pd_h",
            "_pd_m",
            "_pd_t",
            "_pd_m3",
            "_pd_t3",
            "_pd_u3",
            "_pd_mc",
            "_pd_tc",
            "_pd_uc",
        }
        & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"publish_date staging columns clash: {clash}"
        )
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_pd_h", pin(h))
    hc = F.col("_pd_h")
    base = base.withColumn(
        "_pd_m", pin(F.regexp_extract(hc, META_DATE_RE, 1))
    ).withColumn("_pd_t", pin(F.regexp_extract(hc, TIME_DATE_RE, 1)))

    # each source's (y, m, d) ints are staged as ONE pinned struct —
    # the validation CASE references every component many times, and
    # CollapseProject would otherwise re-inline the group extract into
    # each reference (NOTES gotcha 2; ~20 tiny regex calls per source)
    def ymd(raw: Column, re_: str) -> Column:
        parts = [
            F.nullif(F.regexp_extract(raw, re_, g), F.lit(""))
            .cast("int")
            .alias(n)
            for g, n in ((1, "y"), (2, "m"), (3, "d"))
        ]
        return pin(F.struct(*parts))

    base = base.withColumn(
        "_pd_m3", ymd(F.col("_pd_m"), ISO_DATE_RE)
    ).withColumn("_pd_t3", ymd(F.col("_pd_t"), ISO_DATE_RE))

    def canon(s: str, day_default: Column | None = None) -> Column:
        d = F.col(f"{s}.d")
        if day_default is not None:
            d = F.coalesce(d, day_default)
        return _canon_date(F.col(f"{s}.y"), F.col(f"{s}.m"), d)

    base = base.withColumn(
        "_pd_mc", pin(canon("_pd_m3"))
    ).withColumn("_pd_tc", pin(canon("_pd_t3")))
    if url_col is not None:
        u = F.coalesce(F.col(url_col).cast("string"), F.lit(""))
        base = base.withColumn("_pd_u3", ymd(u, URL_DATE_RE))
        url_canon = canon("_pd_u3", day_default=F.lit(1))
    else:
        url_canon = F.lit(None).cast("string")
    base = base.withColumn("_pd_uc", pin(url_canon))
    src = (
        F.when(F.col("_pd_mc").isNotNull(), F.lit("meta"))
        .when(F.col("_pd_tc").isNotNull(), F.lit("time"))
        .when(F.col("_pd_uc").isNotNull(), F.lit("url"))
    )
    return base.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.col("_pd_mc"), F.col("_pd_tc"), F.col("_pd_uc")
        ).alias("pub_date"),
        src.alias("date_source"),
    )


# The open tag must carry type="application/ld+json" (any attribute
# position, either quote style, case-insensitive via (?is)); [^>]*?
# keeps the scan inside the tag.  RE2-safe: lazy quantifiers only, no
# backreferences or lookahead.
JSONLD_RE = (
    "(?is)<script[ \\t\\n\\r][^>]*?type[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>"
)
# The four schema.org fields the extraction tier actually consumes
# downstream: (json path key, output column).
JSONLD_FIELDS = [
    ("@type", "item_type"),
    ("name", "name"),
    ("headline", "headline"),
    ("datePublished", "date_published"),
]


def _json_scalar(v: Column) -> Column:
    """Scalar-only contract: array/object-valued fields -> NULL.  The
    two engines normalize nested-JSON serialization differently
    (whitespace, key order preservation), so composite values are
    deliberately outside the cross-engine contract."""
    return F.when(
        F.substring(v, 1, 1).isin("[", "{"), F.lit(None)
    ).otherwise(v)


def jsonld(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """JSON-LD structured-data extraction — schema.org blocks from
    ``<script type="application/ld+json">`` as relational rows, the
    machine-readable twin of :func:`metadata` (publishers duplicate
    title/date/author into JSON-LD precisely so extractors don't have
    to parse the visible markup; htmldate and trafilatura both read
    this block first).

    Emits one row per JSON-LD script block, in document order::

        (doc_id, block_no, is_valid, item_type, name, headline,
         date_published)

    ``is_valid`` marks blocks that parse as JSON at all (malformed
    blocks keep their row — block positions stay stable — with every
    field NULL); field extraction is ``get_json_object`` on the raw
    block (JVM-side Jackson, no UDF) with a ROOT-ARRAY rule: a block
    whose first non-space char is '[' reads ``$[0].field`` (the
    common publisher shape is a one-element array), a root object
    reads ``$.field``.  ``@graph`` indirection is NOT followed
    (documented out of scope — a deterministic no-parser trade like
    :func:`tables` nesting).  Values are SCALAR-ONLY: array/object
    values -> NULL (see _json_scalar); JSON string escapes (\\uXXXX,
    \\n, \\") are decoded by both engines' parsers identically.  XML
    comments are stripped first (a commented-out block is not data);
    a literal ``</script>`` INSIDE a JSON string truncates the block
    (real-world JSON-LD escapes it as ``<\\/script>`` per the HTML
    spec, which the JSON parser then reads back as ``</script>``).

    100 TB shape: narrow + ONE posexplode (block->row), zero
    exchanges, no UDF; the per-field parses run on the already-
    exploded block attribute (the lambda-attribute rule).  Each
    get_json_object call re-parses the block (4 parses/row) — the
    Spark-4 single-parse upgrade is parse_json + variant_get, kept
    out for cross-engine oracle simplicity at 4 fields.
    """
    clash = sorted({"_jl_h", "_jl_bl", "_jl_b"} & set(df.columns))
    if clash:
        raise ValueError(f"jsonld staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(h, COMMENT_RE, " ")
    base = df.withColumn("_jl_h", pin(h)).withColumn(
        "_jl_bl",
        pin(F.regexp_extract_all(F.col("_jl_h"), F.lit(JSONLD_RE), 1)),
    )
    per_block = base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("_jl_bl")).alias("block_no", "_jl_b"),
    )
    raw = F.col("_jl_b")
    is_arr = F.substring(F.ltrim(raw), 1, 1) == "["
    fields = [
        _json_scalar(
            F.when(
                is_arr, F.get_json_object(raw, f"$[0]['{key}']")
            ).otherwise(F.get_json_object(raw, f"$['{key}']"))
        ).alias(out)
        for key, out in JSONLD_FIELDS
    ]
    return per_block.select(
        "doc_id",
        F.col("block_no").cast("long").alias("block_no"),
        F.get_json_object(raw, "$").isNotNull().alias("is_valid"),
        *fields,
    )


LINK_TAG_RE = "(?is)(<link(?:[ \\t\\n\\r][^>]*)?>)"
REL_ATTR_RE = (
    "(?is)[ \\t\\n\\r]rel[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
HREFLANG_ATTR_RE = (
    "(?is)[ \\t\\n\\r]hreflang[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
HREF_ATTR_RE = (
    "(?is)[ \\t\\n\\r]href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)


def hreflang_alternates(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Hreflang alternate-language link extraction — the TRANSLATION-
    CLUSTER signal (``<link rel="alternate" hreflang=..>``): pages
    publishing hreflang sets declare "these N urls are the same
    content in N languages", which is exactly how a training-data
    pipeline aligns parallel corpora and avoids counting a
    translation as a near-dup of its siblings.

    Emits one row per alternate declaration, in document order::

        (doc_id, link_no, hreflang, href, is_default, host)

    ``link_no`` is the 0-based position among ALL <link> tags (a
    non-alternate tag leaves a gap — positions stay stable, the
    sitemap rule); a tag qualifies when its ``rel`` token LIST
    contains ``alternate`` (rel is space-separated per the HTML spec
    — ``rel="alternate help"`` qualifies, ``rel="alternated"`` does
    not), its ``hreflang`` is non-blank, and its ``href`` is
    non-blank; attributes match in ANY order/quote style but REQUIRE
    a leading whitespace boundary (``data-href=`` never matches
    ``href=``).  ``hreflang`` is lowercased + trimmed (BCP-47 tags
    are case-insensitive); ``is_default`` marks ``x-default``;
    ``href`` is entity-decoded + trimmed; ``host`` via the shared
    urls.host_of (junk -> NULL).  Comments and scripts are stripped
    first (a commented-out or document.write'd link is not a
    declaration).

    100 TB shape: narrow + ONE posexplode (tag->row), zero
    exchanges, no UDF; attribute regexes run on the already-exploded
    tag (the lambda-attribute rule).
    """
    clash = sorted(
        {"_hl_h", "_hl_tags", "_hl_t", "_hl_lang", "_hl_href"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"hreflang_alternates staging columns clash: {clash}"
        )
    from ..functions.numeric import pin
    from .urls import host_of

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(h, SCRIPT_RE, " "), COMMENT_RE, " "
    )
    base = df.withColumn("_hl_h", pin(h)).withColumn(
        "_hl_tags",
        pin(
            F.regexp_extract_all(F.col("_hl_h"), F.lit(LINK_TAG_RE), 1)
        ),
    )
    per_tag = base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("_hl_tags")).alias("link_no", "_hl_t"),
    )
    t = F.col("_hl_t")
    rel_tokens = F.split(
        F.lower(F.trim(F.regexp_extract(t, REL_ATTR_RE, 1))),
        "[ \\t\\n\\r]+",
    )
    href = F.regexp_extract(t, HREF_ATTR_RE, 1)
    for ent, ch in HTML_ENTITIES:
        href = F.replace(href, F.lit(ent), F.lit(ch))
    return (
        per_tag.withColumn(
            "_hl_lang",
            F.lower(F.trim(F.regexp_extract(t, HREFLANG_ATTR_RE, 1))),
        )
        .withColumn("_hl_href", F.trim(href))
        .filter(
            F.array_contains(rel_tokens, "alternate")
            & (F.col("_hl_lang") != "")
            & (F.col("_hl_href") != "")
        )
        .select(
            "doc_id",
            F.col("link_no").cast("long").alias("link_no"),
            F.col("_hl_lang").alias("hreflang"),
            F.col("_hl_href").alias("href"),
            (F.col("_hl_lang") == "x-default").alias("is_default"),
            host_of(F.col("_hl_href")).alias("host"),
        )
    )


TYPE_ATTR_RE = (
    "(?is)[ \\t\\n\\r]type[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
FEED_MIME_TYPES = {
    "application/rss+xml": "rss",
    "application/atom+xml": "atom",
}


def feed_discovery(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """RSS/Atom feed AUTODISCOVERY — ``<link rel="alternate"
    type="application/rss+xml|atom+xml" href>`` declarations as rows,
    the standard way a page advertises its feed (the RSS
    autodiscovery convention); the discovery step upstream of
    `urls.feed_items` the way `urls.sitemap_entries` is upstream of
    the frontier.  One row per qualifying link, in document order::

        (doc_id, link_no, feed_type, href, host)

    ``link_no`` is the 0-based position among ALL <link> tags (gaps
    stable — the hreflang rule); a tag qualifies when its ``rel``
    token LIST contains ``alternate`` and its ``type`` (lowercased,
    trimmed — MIME types are case-insensitive) is one of
    FEED_MIME_TYPES, mapping to ``feed_type`` 'rss'/'atom'; ``href``
    is entity-decoded + trimmed and must be non-blank; ``host`` via
    the shared urls.host_of.  Comments and scripts are stripped
    first.

    100 TB shape: narrow + ONE posexplode, zero exchanges, no UDF
    (the hreflang_alternates shape).
    """
    clash = sorted(
        {"_fd_h", "_fd_tags", "_fd_t", "_fd_type", "_fd_href"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"feed_discovery staging columns clash: {clash}"
        )
    from ..functions.numeric import pin
    from .urls import host_of

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(h, SCRIPT_RE, " "), COMMENT_RE, " "
    )
    base = df.withColumn("_fd_h", pin(h)).withColumn(
        "_fd_tags",
        pin(
            F.regexp_extract_all(F.col("_fd_h"), F.lit(LINK_TAG_RE), 1)
        ),
    )
    per_tag = base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("_fd_tags")).alias("link_no", "_fd_t"),
    )
    t = F.col("_fd_t")
    rel_tokens = F.split(
        F.lower(F.trim(F.regexp_extract(t, REL_ATTR_RE, 1))),
        "[ \\t\\n\\r]+",
    )
    href = F.regexp_extract(t, HREF_ATTR_RE, 1)
    for ent, ch in HTML_ENTITIES:
        href = F.replace(href, F.lit(ent), F.lit(ch))
    mime = F.lower(F.trim(F.regexp_extract(t, TYPE_ATTR_RE, 1)))
    feed_type = F.lit(None).cast("string")
    for m, name in sorted(FEED_MIME_TYPES.items()):
        feed_type = F.when(mime == m, F.lit(name)).otherwise(feed_type)
    return (
        per_tag.withColumn("_fd_type", feed_type)
        .withColumn("_fd_href", F.trim(href))
        .filter(
            F.array_contains(rel_tokens, "alternate")
            & F.col("_fd_type").isNotNull()
            & (F.col("_fd_href") != "")
        )
        .select(
            "doc_id",
            F.col("link_no").cast("long").alias("link_no"),
            F.col("_fd_type").alias("feed_type"),
            F.col("_fd_href").alias("href"),
            host_of(F.col("_fd_href")).alias("host"),
        )
    )


def translation_clusters(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Translation-cluster induction — :func:`hreflang_alternates`
    composed into the PARALLEL-CORPUS table: every page declaring an
    hreflang set names the same cluster, so deduping the declared
    (cluster, language, url) triples across pages yields one row per
    language edition per cluster — the join key for aligning
    translations and the exclusion key for cross-lingual near-dup
    scoring.

    One row per distinct language edition::

        (cluster_key, hreflang, href, n_langs)

    ``cluster_key`` = the set's ``x-default`` href when declared,
    else the lexicographic MIN href (deterministic under partial
    declarations — every member page of a consistent set derives
    the same key); ``n_langs`` = distinct languages in the cluster
    (x-default counts as its own pseudo-language, faithful to the
    declaration).  Pages declaring nothing contribute nothing.

    100 TB shape: the extraction stays narrow; ONE doc_id exchange
    for the per-page key agg, the key-back join PINNED shuffle_hash
    (alternate tables scale with the corpus; an AQE broadcast would
    serialize the build on the driver — the dedup_soft_weights
    trap), one distinct exchange, and n_langs as a WINDOW over the
    deduped pairs so that table is consumed once.  The extraction
    subtree is derived twice (keys branch + join branch) — at
    production scale materialize the alternates table first (the
    LADDER rule).
    """
    alts = hreflang_alternates(df, html_col=html_col, id_col=id_col)
    keys = alts.groupBy("doc_id").agg(
        F.coalesce(
            F.max(F.when(F.col("is_default"), F.col("href"))),
            F.min("href"),
        ).alias("cluster_key")
    )
    pairs = (
        alts.join(keys.hint("shuffle_hash"), "doc_id")
        .select("cluster_key", "hreflang", "href")
        .distinct()
    )
    # n_langs as a WINDOW collect_set, not agg+join-back: the deduped
    # pairs table is consumed ONCE (an agg+join would re-derive the
    # whole extraction subtree per consumer — pin()-ned projections
    # never canonicalize equal, so ReusedExchange cannot fire: the
    # LADDER lesson)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_key")
    return pairs.select(
        "cluster_key",
        "hreflang",
        "href",
        F.size(F.collect_set("hreflang").over(w))
        .cast("long")
        .alias("n_langs"),
    )


IMG_TAG_RE = "(?is)(<img(?:[ \\t\\n\\r][^>]*)?/?>)"
SRC_ATTR_RE = (
    "(?is)[ \\t\\n\\r]src[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
ALT_ATTR_RE = (
    "(?is)[ \\t\\n\\r]alt[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)


def images(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Image-reference extraction — ``<img src alt>`` as relational
    rows, the MULTIMODAL bridge (public practice: LAION-style
    image-text datasets are mined from exactly these (src, alt)
    pairs; the binary decode side lives in operators/multimodal.py).
    One row per img tag with a non-blank ``src``, in document
    order::

        (doc_id, img_no, src, alt, host)

    ``img_no`` is the 0-based position among ALL img tags (a src-less
    tag leaves a gap — the hreflang/sitemap position rule).
    Attributes match in any order but REQUIRE a leading whitespace
    boundary (``data-src`` never matches — the lazy-loading
    attribute is a different contract, documented).  ``src`` is
    entity-decoded + trimmed (the href contract); ``alt`` is cleaned
    with the shared block-text rules (entity decode, ws collapse,
    trim — it is human text) and absent AND blank both -> NULL;
    ``host`` via the shared urls.host_of (junk/relative -> NULL).
    Script/style/comment regions are stripped first.

    100 TB shape: narrow + ONE posexplode (tag->row), zero
    exchanges, no UDF; attribute regexes run on the already-exploded
    tag (the gotcha-3 rule).
    """
    clash = sorted(
        {"_im_h", "_im_tags", "_im_t", "_im_src", "_im_alt"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"images staging columns clash: {clash}")
    from ..functions.numeric import pin
    from .urls import host_of

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_im_h", pin(h)).withColumn(
        "_im_tags",
        pin(F.regexp_extract_all(F.col("_im_h"), F.lit(IMG_TAG_RE), 1)),
    )
    per_tag = base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("_im_tags")).alias("img_no", "_im_t"),
    )
    t = F.col("_im_t")
    src = F.regexp_extract(t, SRC_ATTR_RE, 1)
    for ent, ch in HTML_ENTITIES:
        src = F.replace(src, F.lit(ent), F.lit(ch))
    src = F.trim(src)
    alt = F.nullif(
        _block_text(F.regexp_extract(t, ALT_ATTR_RE, 1)), F.lit("")
    )
    # pin BOTH attribute chains: the in-op src filter and any
    # downstream caption filter (alt non-null + token count) would
    # otherwise re-inline the whole replace/regex chain per condition
    # (the cleanup-pipeline pin() scenario, measured 4-5x)
    return (
        per_tag.withColumn("_im_src", pin(src))
        .withColumn("_im_alt", pin(alt))
        .filter(F.col("_im_src") != "")
        .select(
            "doc_id",
            F.col("img_no").cast("long").alias("img_no"),
            F.col("_im_src").alias("src"),
            F.col("_im_alt").alias("alt"),
            host_of(F.col("_im_src")).alias("host"),
        )
    )


def image_captions(
    images_df: DataFrame, min_alt_tokens: int = 3
) -> DataFrame:
    """Alt-text caption mining — :func:`images` output reduced to one
    (image, caption) pair per distinct ``src``, the LAION-style
    image-text training-data step (Schuhmann et al. 2021 mine
    image-alt pairs from Common Crawl exactly this way).

    Captions must have >= ``min_alt_tokens`` ws-run tokens (short
    alts like "logo" carry no training signal).  An image referenced
    from many pages keeps its BEST caption: longest (chars), ties ->
    lexicographically smallest, then smallest doc_id — a total order,
    so the result is deterministic.  One row per distinct src::

        (src, alt, alt_tokens, n_refs)

    ``n_refs`` counts qualifying references (the popularity prior).

    100 TB shape: ONE src-keyed exchange — the keep-best rule is a
    ``min(struct(-len, alt, doc_id))`` AGGREGATE (map-side partial),
    NEVER a window over hot keys (a viral image would sort one task
    — the keep_best/ccnet_tiers lesson).
    """
    if min_alt_tokens < 1:
        raise ValueError("min_alt_tokens must be >= 1")
    from .text import token_count

    kept = images_df.filter(
        F.col("alt").isNotNull()
        & (token_count(F.col("alt")) >= min_alt_tokens)
    )
    agg = kept.groupBy("src").agg(
        F.min(
            F.struct(
                (-F.length("alt")).alias("_neg_len"),
                F.col("alt").alias("_alt"),
                F.col("doc_id").alias("_did"),
            )
        ).alias("_best"),
        F.count(F.lit(1)).cast("long").alias("n_refs"),
    )
    return agg.select(
        "src",
        F.col("_best._alt").alias("alt"),
        token_count(F.col("_best._alt")).cast("long").alias("alt_tokens"),
        "n_refs",
    )


def bitext_pairs(
    clusters: DataFrame,
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_ratio: float = 0.5,
    materialize: bool = False,
) -> DataFrame:
    """Bitext candidate mining — :func:`translation_clusters` composed
    with the crawled corpus into the PARALLEL-TEXT pair table (public
    practice: Resnik & Smith 2003 "The Web as a Parallel Corpus";
    ParaCrawl-style pipelines start from url-aligned document pairs
    sanity-filtered by length ratio before sentence alignment).  One
    row per within-cluster unordered language pair::

        (cluster_key, lang_a, lang_b, href_a, href_b,
         tokens_a, tokens_b, len_ratio, keep)

    Members join the corpus on ``href == url`` INNER (a candidate
    needs both sides crawled); ``x-default`` rows are aliases of a
    member, not languages, and are excluded; ``lang_a < lang_b``
    orders each pair once.  ``len_ratio`` = round(min/max whitespace
    token count, 6), pinned to 0.0 when the longer side is empty
    (never an ANSI division throw — the epoch_plan rule); ``keep`` =
    ``len_ratio >= min_ratio``, the Gale-Church-style length-ratio
    sanity filter.  A language declaring two hrefs in one cluster
    yields one candidate per href (deterministic, declaration-
    faithful).

    100 TB shape: token counts attach NARROW on the docs side before
    the href join; the href join and the pair self-join are both
    PINNED shuffle_hash (members and corpus scale with the crawl —
    the AQE-broadcast trap); the self-join runs on aliased views of
    ONE member plan so the cluster_key exchange can reuse — but when
    ``clusters`` carries pin()-ned extraction columns ReusedExchange
    cannot fire (the LADDER rule): pass ``materialize=True`` to
    localCheckpoint the member table first (write-then-read at
    production scale).  Cluster sizes are bounded by the language
    count, so the within-key pair expansion never skews.
    """
    if not (0.0 < min_ratio <= 1.0):
        raise ValueError(f"min_ratio must be in (0, 1]: {min_ratio}")
    clash = sorted({"_bt_url", "_bt_tok"} & set(docs.columns))
    if clash:
        raise ValueError(f"bitext_pairs staging columns clash: {clash}")
    from .text import token_count

    sized = docs.select(
        F.col(url_col).alias("_bt_url"),
        token_count(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("_bt_tok"),
    )
    m = (
        clusters.filter(F.col("hreflang") != "x-default")
        .select("cluster_key", "hreflang", "href")
        .join(
            sized.hint("shuffle_hash"),
            F.col("href") == F.col("_bt_url"),
        )
        .select("cluster_key", "hreflang", "href", "_bt_tok")
    )
    if materialize:
        m = m.localCheckpoint(eager=False)
    a, b = m.alias("a"), m.alias("b")
    ta = F.col("a._bt_tok").cast("double")
    tb = F.col("b._bt_tok").cast("double")
    mx = F.greatest(ta, tb)
    ratio = F.when(mx == 0, F.lit(0.0)).otherwise(
        F.round(F.least(ta, tb) / mx, 6)
    )
    return a.join(
        b.hint("shuffle_hash"),
        (F.col("a.cluster_key") == F.col("b.cluster_key"))
        & (F.col("a.hreflang") < F.col("b.hreflang")),
    ).select(
        F.col("a.cluster_key").alias("cluster_key"),
        F.col("a.hreflang").alias("lang_a"),
        F.col("b.hreflang").alias("lang_b"),
        F.col("a.href").alias("href_a"),
        F.col("b.href").alias("href_b"),
        F.col("a._bt_tok").alias("tokens_a"),
        F.col("b._bt_tok").alias("tokens_b"),
        ratio.alias("len_ratio"),
        (ratio >= F.lit(min_ratio)).alias("keep"),
    )


FORM_EL_RE = "(?is)(<form(?:[ \\t\\n\\r][^>]*)?>.*?</form>)"
FORM_ATTRS_RE = "(?is)^<form([^>]*)>"
FORM_BODY_RE = "(?is)^<form[^>]*>(.*)</form>$"
METHOD_ATTR_RE = (
    "(?is)[ \\t\\n\\r]method[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
ACTION_ATTR_RE = (
    "(?is)[ \\t\\n\\r]action[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
FORM_FIELD_RE = "(?is)<(?:input|select|textarea)[ \\t\\n\\r/>]"
PASSWORD_INPUT_RE = (
    "(?is)<input[^>]*[ \\t\\n\\r]type[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']password[\"']"
)


def forms(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Form extraction — ``<form>`` elements as relational rows, the
    login-wall / search-box / paywall DISPATCH signal (public
    practice: quality pipelines drop or down-weight pages that are
    mostly interactive chrome, and a password form is the canonical
    auth-wall marker)::

        (doc_id, form_no, method, action, n_fields, has_password)

    ``method`` lowercased, absent/blank -> 'get' (the HTML default);
    ``action`` entity-decoded + trimmed RAW (the href contract),
    absent AND blank -> NULL (self-submitting form); ``n_fields``
    counts input/select/textarea open tags with the boundary guard
    (``<inputx`` never counts — the dom_stats rule); has_password via
    the quoted type attribute (the quoted-attr contract shared with
    SRC/ALT).  Nested forms truncate at the first ``</form>`` (the
    tables lossy-deterministic no-parser trade; invalid HTML anyway).
    Script/style/comment stripped first.

    100 TB shape: narrow + ONE posexplode; per-form regexes run on
    the already-exploded element (gotcha-3), attrs/body pinned so the
    output expressions reference attributes.
    """
    clash = sorted(
        {"_fo_h", "_fo_els", "_fo_el", "_fo_attrs", "_fo_body"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"forms staging columns clash: {clash}")
    from ..functions.numeric import pin

    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    h = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(h, SCRIPT_RE, " "), STYLE_RE, " "
        ),
        COMMENT_RE,
        " ",
    )
    base = df.withColumn("_fo_h", pin(h)).withColumn(
        "_fo_els",
        pin(F.regexp_extract_all(F.col("_fo_h"), F.lit(FORM_EL_RE), 1)),
    )
    per_el = base.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col("_fo_els")).alias("form_no", "_fo_el"),
    )
    el = F.col("_fo_el")
    per_el = per_el.withColumn(
        "_fo_attrs", pin(F.regexp_extract(el, FORM_ATTRS_RE, 1))
    ).withColumn("_fo_body", pin(F.regexp_extract(el, FORM_BODY_RE, 1)))
    method = F.lower(
        F.trim(F.regexp_extract(F.col("_fo_attrs"), METHOD_ATTR_RE, 1))
    )
    method = F.when(method == "", F.lit("get")).otherwise(method)
    action = F.regexp_extract(F.col("_fo_attrs"), ACTION_ATTR_RE, 1)
    for ent, ch in HTML_ENTITIES:
        action = F.replace(action, F.lit(ent), F.lit(ch))
    action = F.nullif(F.trim(action), F.lit(""))
    return per_el.select(
        "doc_id",
        F.col("form_no").cast("long").alias("form_no"),
        method.alias("method"),
        action.alias("action"),
        F.regexp_count(F.col("_fo_body"), F.lit(FORM_FIELD_RE))
        .cast("long")
        .alias("n_fields"),
        F.col("_fo_body").rlike(PASSWORD_INPUT_RE).alias("has_password"),
    )
