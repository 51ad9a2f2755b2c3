"""URL canonicalization — the cheap pre-content dedup key for CC-style
corpora (training-data pipeline op: url-level dedup runs BEFORE the
content dedups in operators/dedup.py because it needs no text at all).

Pure JVM expressions (parse_url + regexp), no Python:
  - scheme and host lowercased, leading ``www.`` stripped;
  - fragment dropped (parse_url PATH/QUERY already exclude it);
  - tracking query params removed (utm_*, fbclid, gclid, ref) while
    meaningful params survive in their original order;
  - trailing path slashes stripped.
Ports are dropped with the host normalization (documented trade-off:
non-default ports are rare in crawl data and usually mirror :443/:80).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[A-Za-z]+|fbclid|gclid|ref)="


def canonicalize_url(url: Column) -> Column:
    proto = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id"):
    """Exact dedup on the canonical url: one shuffle on the canonical key,
    map-side partial agg — the url-level twin of dedup.exact_dedup."""
    return (
        df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


def host_of(url: Column) -> Column:
    """Lowercased host with the leading ``www.`` stripped — the domain
    key used by the blocklist filter and per-domain stats.  try_parse_url
    (not parse_url — ANSI-strict in Spark 4) so junk urls yield NULL
    instead of failing the job."""
    return F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: list[str],
    url_col: str = "url",
    match_subdomains: bool = True,
) -> DataFrame:
    """Domain-blocklist filter — the first gate of every crawl pipeline
    (spam/adult/SEO-farm domain lists à la UT1/Blacklists-for-C4): keep
    rows whose url host is NOT on the blocklist.  ``match_subdomains``
    also drops ``x.y.blocked.com`` (the usual semantics of domain
    lists; suffix match is anchored at a dot so ``notblocked.com``
    survives a ``blocked.com`` entry).

    The list is compiled into literal predicates (isin + endswith), so
    this is a pure narrow filter — no join, no shuffle, no broadcast
    that scales with the corpus; the blocklist vocabulary is bounded by
    curation, not by the data.  For million-entry lists, switch to a
    broadcast anti-join on host; this literal form is the fast path for
    the usual few-thousand-domain curated lists.

    Rows whose url yields no parseable host are KEPT (they carry no
    domain evidence; downstream quality filters handle them).
    """
    normalized = sorted(
        {b.lower().lstrip(".").removeprefix("www.") for b in blocked if b}
    )
    if not normalized:
        return df
    host = host_of(F.col(url_col))
    hit = host.isin(*normalized)
    if match_subdomains:
        for b in normalized:
            hit = hit | host.endswith("." + b)
    return df.filter(host.isNull() | ~hit)


# Curated URL word weights for the SOFT url-quality score — the
# RefinedWeb-style refinement of the binary blocklist (public
# knowledge: Penedo et al. 2023 score URLs by weighted soft words
# instead of dropping on any single hit).  Deterministic stand-in
# table like CLASSIFIER_WEIGHTS/UNIGRAM_LOGPROBS: deployments swap the
# dict, the operator shape — lowered-substring counts × literal
# weights, fixed-order sum — is the production plan either way.  The
# DuckDB oracle regenerates its arithmetic from this same dict.
URL_WORD_WEIGHTS = {
    "casino": -1.5, "porn": -2.0, "viagra": -2.0, "torrent": -1.0,
    "coupon": -0.8, "login": -0.5, "signup": -0.4, "download": -0.3,
    "tracker": -0.6, "popup": -0.7,
    "wiki": 0.8, "docs": 0.6, "news": 0.5, "article": 0.5,
    "blog": 0.3, "research": 0.7, "paper": 0.4, "tutorial": 0.4,
}


def url_quality_score(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    threshold: float = -0.5,
    keep_cols: tuple = (),
) -> DataFrame:
    """Soft URL-quality scoring: every curated word contributes
    weight × occurrences over the LOWERED url (replace-trick substring
    counts — exact small doubles, engine-portable), summed in fixed
    sorted-word order; ``keep = score > threshold`` on the UNROUNDED
    value (fixed-order IEEE sum -> bit-identical across engines), the
    emitted ``url_score`` is ROUND 6.

    Unlike ``filter_blocked_domains`` (binary, host-anchored) this
    scores the whole url string, so one weak signal ('shop') cannot
    kill a page that also carries strong positive path words — the
    soft-filtering refinement web-scale pipelines layer on top of hard
    blocklists.

    100 TB shape: pure narrow projection+filter flags — no shuffle, no
    join; the word vocabulary is bounded by curation, not data.
    Returns (id_col, url_col, url_score, url_keep, *keep_cols) —
    ``keep_cols`` threads extra input columns through (the
    quality_classifier convention, so compositions stay one narrow
    chain instead of re-joining).
    """
    from ..functions.numeric import pin
    from .text import count_occurrences

    if "_uq_low" in df.columns:
        raise ValueError("staging column '_uq_low' already exists")
    base = df.withColumn("_uq_low", pin(F.lower(F.col(url_col))))
    low = F.col("_uq_low")
    score = sum(
        (
            count_occurrences(low, w) * F.lit(float(wt))
            for w, wt in sorted(URL_WORD_WEIGHTS.items())
        ),
        F.lit(0.0),
    )
    staged = base.withColumn("_uq_sc", pin(score))
    return staged.select(
        F.col(id_col),
        F.col(url_col),
        F.round(F.col("_uq_sc"), 6).alias("url_score"),
        (F.col("_uq_sc") > F.lit(float(threshold))).alias("url_keep"),
        *[F.col(c) for c in keep_cols],
    )


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-POLICY filtering with robots.txt longest-match semantics
    (public spec: REP / RFC 9309 — among the rules whose path prefix
    matches, the LONGEST wins; at equal length ``allow`` wins).  A
    compliance-minded corpus pipeline re-applies fetched robots rules
    at curation time to drop pages whose policy changed since crawl.

    ``rules`` is a (host, path_prefix, allow:boolean) table — hosts
    normalized like `host_of` output.  Per URL: resolve host + path
    (bare/NULL paths count as '/', the spec default), look up the
    host's rules, keep the longest matching prefix (allow wins exact
    ties).  URLs with no parseable host, no host entry, or no matching
    prefix are ALLOWED (robots is opt-out).  Wildcard/``$`` rule
    syntax is out of scope (documented; expand rules upstream).

    Returns ``(id_col, url_col, host, matched_prefix, allowed)``.

    100 TB shape: rules aggregate to ONE (host, rule-array) row per
    host — curation-bounded, broadcast onto the corpus; the big side
    never shuffles, and the longest-match argmax is an order-based
    array_max over (len, allow, prefix) structs (the NOTES #10 lesson
    — never a when()-chain).  For a million-host rules table, swap
    the broadcast for shuffle_hash on host; the plan is otherwise
    unchanged.
    """
    clash = sorted(
        {"_rb_h", "_rb_p", "_rb_rules", "_rb_best"} & set(df.columns)
    )
    if clash:
        raise ValueError(f"robots_filter staging columns clash: {clash}")
    per_host = rules.groupBy(F.col("host").alias("_rb_rh")).agg(
        F.collect_list(
            F.struct(
                F.col("path_prefix").alias("p"),
                F.col("allow").alias("a"),
            )
        ).alias("_rb_rules")
    )
    base = (
        df.withColumn("_rb_h", host_of(F.col(url_col)))
        .withColumn(
            "_rb_p",
            F.when(
                F.coalesce(
                    F.try_parse_url(F.col(url_col), F.lit("PATH")),
                    F.lit(""),
                )
                == "",
                F.lit("/"),
            ).otherwise(
                F.try_parse_url(F.col(url_col), F.lit("PATH"))
            ),
        )
        .join(
            F.broadcast(per_host),
            F.col("_rb_h") == F.col("_rb_rh"),
            "left",
        )
    )
    matches = F.filter(
        F.col("_rb_rules"),
        lambda r: F.col("_rb_p").startswith(r["p"]),
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["p"]).alias("l"),
                r["a"].cast("int").alias("a"),
                r["p"].alias("p"),
            ),
        )
    )
    from ..functions.numeric import pin

    # pin: _rb_best is referenced twice below (p and a) — unpinned,
    # Catalyst would inline the whole filter+argmax per reference
    return base.withColumn("_rb_best", pin(best)).select(
        F.col(id_col),
        F.col(url_col),
        F.col("_rb_h").alias("host"),
        F.col("_rb_best")["p"].alias("matched_prefix"),
        F.coalesce(
            F.col("_rb_best")["a"] == 1, F.lit(True)
        ).alias("allowed"),
    )


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    min_urls: int = 2,
) -> DataFrame:
    """URL-template mining — the crawl-frontier dedup signal (public
    practice: auto-generated page families — product ids, pagination,
    date archives — are found by collapsing digit runs, and template-
    heavy hosts are candidates for frontier pruning / boilerplate
    sampling).  Every digit run in the url becomes ``{n}``, so
    ``/product/123/view`` and ``/product/456/view`` share one
    template.  Hosts are kept as their own column (the template keeps
    the raw host text, digits templated — ``shard3.cdn.com`` and
    ``shard7.cdn.com`` collapse there too, which is the point).

    Returns ``(host, template, n_urls, first_doc)`` for templates with
    at least ``min_urls`` members (first_doc = smallest id, the
    deterministic exemplar).

    100 TB shape: narrow derive (try_parse_url host + one
    regexp_replace) into ONE map-side-partial agg keyed by (host,
    template); hot templates are exactly what map-side combine eats.
    No window, no join.
    """
    return (
        df.select(
            host_of(F.col(url_col)).alias("host"),
            F.regexp_replace(
                F.col(url_col), "[0-9]+", "{n}"
            ).alias("template"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("_id").alias("first_doc"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )


# group 1 = the block kind (url|sitemap, any case), group 2 = the block
# body.  No backreference on the close tag (RE2 has none) — a <url>
# block truncates at the FIRST close of either kind, deterministically
# in both engines (the html.tables trade; well-formed sitemaps never
# nest these blocks, so the trade only bites malformed input).
SITEMAP_BLOCK_RE = (
    "(?is)<(url|sitemap)(?:[ \\t\\n\\r][^>]*)?>(.*?)</(?:url|sitemap)>"
)
LOC_RE = "(?is)<loc(?:[ \\t\\n\\r][^>]*)?>(.*?)</loc>"
LASTMOD_RE = "(?is)<lastmod(?:[ \\t\\n\\r][^>]*)?>(.*?)</lastmod>"


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", id_col: str = "doc_id"
) -> DataFrame:
    """Sitemap-XML entry extraction (sitemaps.org protocol) — the
    crawl-frontier SEED feed: <urlset> url entries and <sitemapindex>
    child-sitemap entries as relational rows, the upstream companion
    of :func:`url_templates` / the frontier capstone (a crawler's
    candidate set is seeded from exactly this shape).

    Emits one row per entry carrying a <loc>, in document order::

        (doc_id, entry_no, is_index, loc, lastmod, host)

    ``entry_no`` is the 0-based position among ALL url/sitemap blocks
    (a dropped loc-less block leaves a gap — positions stay stable
    under filtering); ``is_index`` marks <sitemap> blocks (pointers to
    child sitemaps, vs page urls); ``loc`` is entity-decoded (the
    protocol REQUIRES &amp;-escaping inside loc) and trimmed;
    ``lastmod`` is the trimmed raw string ('' and absent both -> NULL
    — regexp_extract cannot tell them apart; stays a STRING, the
    html.publish_date rule: cross-engine date types disagree before
    the comparison does); ``host`` = the shared :func:`host_of`
    normalization of loc (lowered, www-stripped; junk -> NULL, never
    a throw).  XML comments are stripped first (a commented-out entry
    is not an entry); blocks without a non-blank <loc> are dropped
    (loc is the protocol's one required field).  First <loc>/<lastmod>
    per block wins (well-formed blocks have at most one).

    100 TB shape: narrow + ONE posexplode (block->row), zero
    exchanges, no UDF; the per-entry regexes run on the already-
    exploded block body, never re-scanning the page (the
    lambda-attribute rule, NOTES gotcha 3).
    """
    clash = sorted(
        {"_site_x", "_site_kd", "_site_bd", "_site_e", "_site_loc"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(
            f"sitemap_entries staging columns clash: {clash}"
        )
    from ..functions.numeric import pin
    from .html import COMMENT_RE, HTML_ENTITIES

    x = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    x = F.regexp_replace(x, COMMENT_RE, " ")
    base = (
        df.withColumn("_site_x", pin(x))
        .withColumn(
            "_site_kd",
            pin(
                F.regexp_extract_all(
                    F.col("_site_x"), F.lit(SITEMAP_BLOCK_RE), 1
                )
            ),
        )
        .withColumn(
            "_site_bd",
            pin(
                F.regexp_extract_all(
                    F.col("_site_x"), F.lit(SITEMAP_BLOCK_RE), 2
                )
            ),
        )
    )
    kd = F.col("_site_kd")
    entries = F.transform(
        F.col("_site_bd"),
        lambda b, i: F.struct(
            i.cast("long").alias("entry_no"),
            (
                F.lower(F.element_at(kd, (i + 1).cast("int")))
                == "sitemap"
            ).alias("is_index"),
            F.regexp_extract(b, LOC_RE, 1).alias("loc_raw"),
            F.regexp_extract(b, LASTMOD_RE, 1).alias("lastmod_raw"),
        ),
    )
    loc = F.col("_site_e.loc_raw")
    for ent, ch in HTML_ENTITIES:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return (
        base.select(
            F.col(id_col).alias("doc_id"),
            F.explode(entries).alias("_site_e"),
        )
        .withColumn("_site_loc", F.trim(loc))
        .filter(F.col("_site_loc") != "")
        .select(
            "doc_id",
            F.col("_site_e.entry_no").alias("entry_no"),
            F.col("_site_e.is_index").alias("is_index"),
            F.col("_site_loc").alias("loc"),
            F.nullif(
                F.trim(F.col("_site_e.lastmod_raw")), F.lit("")
            ).alias("lastmod"),
            host_of(F.col("_site_loc")).alias("host"),
        )
    )


FEED_BLOCK_RE = (
    "(?is)<(item|entry)(?:[ \\t\\n\\r][^>]*)?>(.*?)</(?:item|entry)>"
)
FEED_TITLE_RE = "(?is)<title(?:[ \\t\\n\\r][^>]*)?>(.*?)</title>"
# RSS puts the url in the <link> TEXT; Atom self-closes <link href=..>
# (no close tag), so the two shapes need separate regexes.
FEED_LINK_TEXT_RE = "(?is)<link(?:[ \\t\\n\\r][^>]*)?>(.*?)</link>"
FEED_LINK_HREF_RE = (
    "(?is)<link[^>]*?href[ \\t\\n\\r]*=[ \\t\\n\\r]*"
    "[\"']([^\"']*)[\"']"
)
FEED_DATE_RE = (
    "(?is)<(?:pubdate|published|updated)(?:[ \\t\\n\\r][^>]*)?>"
    "(.*?)</(?:pubdate|published|updated)>"
)
CDATA_RE = "(?s)<!\\[CDATA\\[(.*?)\\]\\]>"


def feed_items(
    df: DataFrame, xml_col: str = "xml", id_col: str = "doc_id"
) -> DataFrame:
    """RSS/Atom feed-item extraction — the FRESHNESS companion of
    :func:`sitemap_entries` (a crawler discovers new urls from feeds
    between sitemap refreshes; news/blog corpora are seeded from
    exactly this shape).  Handles BOTH syndication dialects in one
    pass: RSS 2.0 ``<item>`` (link as element TEXT, ``<pubDate>``)
    and Atom ``<entry>`` (link as a self-closing ``href`` attribute,
    ``<published>``/``<updated>``).

    Emits one row per item/entry block, in document order::

        (doc_id, item_no, is_atom, title, link, pub_date, host)

    ``is_atom`` marks <entry> blocks; ``title`` resolves CDATA
    spec-faithfully — ``<![CDATA[..]]>`` content is taken LITERALLY
    (XML forbids entity expansion inside CDATA) while plain text
    nodes are entity-decoded; ``link`` = the first link TEXT if
    non-blank else the first link ``href`` attribute, entity-decoded
    (feeds must &amp;-escape urls); ``pub_date`` = the first
    pubDate/published/updated text, trimmed, kept a STRING (the
    html.publish_date rule — RFC-822 vs ISO-8601 parsing diverges
    across engines long before the comparison does); absent and
    blank both -> NULL for all three (regexp_extract cannot tell
    them apart); ``host`` = the shared :func:`host_of` normalization
    (junk -> NULL, never a throw).  XML comments are stripped first
    (comment strip is CDATA-blind — the documented no-parser trade);
    a mismatched close (``<item>..</entry>``) truncates at the first
    close of either kind (the tables rule).  Blocks are NOT dropped
    on missing fields — item positions stay stable.

    100 TB shape: narrow + ONE posexplode (block->row), zero
    exchanges, no UDF; per-item regexes run on the already-exploded
    block body (the lambda-attribute rule, NOTES gotcha 3).
    """
    clash = sorted(
        {"_fd_x", "_fd_tg", "_fd_bd", "_fd_b", "_fd_ti", "_fd_ln"}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"feed_items staging columns clash: {clash}")
    from ..functions.numeric import pin
    from .html import COMMENT_RE, HTML_ENTITIES

    x = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    x = F.regexp_replace(x, COMMENT_RE, " ")
    base = (
        df.withColumn("_fd_x", pin(x))
        .withColumn(
            "_fd_tg",
            pin(
                F.regexp_extract_all(
                    F.col("_fd_x"), F.lit(FEED_BLOCK_RE), 1
                )
            ),
        )
        .withColumn(
            "_fd_bd",
            pin(
                F.regexp_extract_all(
                    F.col("_fd_x"), F.lit(FEED_BLOCK_RE), 2
                )
            ),
        )
    )
    per_item = base.select(
        F.col(id_col).alias("doc_id"),
        F.col("_fd_tg"),
        F.posexplode(F.col("_fd_bd")).alias("item_no", "_fd_b"),
    )
    b = F.col("_fd_b")

    def decoded(raw: Column) -> Column:
        for ent, ch in HTML_ENTITIES:
            raw = F.replace(raw, F.lit(ent), F.lit(ch))
        return raw

    t_raw = F.regexp_extract(b, FEED_TITLE_RE, 1)
    t_cd = F.regexp_extract(t_raw, CDATA_RE, 1)
    title = F.when(t_cd != "", F.trim(t_cd)).otherwise(
        F.trim(decoded(t_raw))
    )
    l_txt = F.trim(decoded(F.regexp_extract(b, FEED_LINK_TEXT_RE, 1)))
    l_href = F.trim(
        decoded(F.regexp_extract(b, FEED_LINK_HREF_RE, 1))
    )
    link = F.when(l_txt != "", l_txt).otherwise(l_href)
    return (
        per_item.withColumn("_fd_ti", F.nullif(title, F.lit("")))
        .withColumn("_fd_ln", F.nullif(link, F.lit("")))
        .select(
            "doc_id",
            F.col("item_no").cast("long").alias("item_no"),
            (
                F.lower(
                    F.element_at(
                        F.col("_fd_tg"),
                        (F.col("item_no") + 1).cast("int"),
                    )
                )
                == "entry"
            ).alias("is_atom"),
            F.col("_fd_ti").alias("title"),
            F.col("_fd_ln").alias("link"),
            F.nullif(
                F.trim(F.regexp_extract(b, FEED_DATE_RE, 1)), F.lit("")
            ).alias("pub_date"),
            host_of(F.col("_fd_ln")).alias("host"),
        )
    )


def canonical_dedup(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-aware URL dedup — the crawl-dedup rule publishers
    opt into: a page declaring ``<link rel="canonical">`` to another
    url IS that url for dedup purposes (CommonCrawl-style pipelines
    fold mobile/AMP/print/session variants this way BEFORE any
    content hashing).  Composes :func:`html.metadata`'s canonical
    extraction (keep_cols-threading the crawl url through its narrow
    chain) with :func:`canonicalize_url` over the EFFECTIVE url.

    One row per document::

        (doc_id, url, canon_key, keep_id, n_members, used_canonical,
         is_dup)

    A canonical declaration is honored only when ABSOLUTE http(s)
    (relative hrefs would need base-url resolution — a parser-free
    deterministic trade: they fall back to the crawl url, flagged by
    ``used_canonical`` = false); ``canon_key`` =
    canonicalize_url(honored canonical ELSE crawl url);
    ``keep_id`` = min doc_id per key; ``is_dup`` marks every other
    member.

    100 TB shape: the metadata extraction stays narrow (zero
    exchanges); ONE hash exchange on canon_key for the count agg;
    the count-back join PINS shuffle_hash — the counts table scales
    with the corpus, so an AQE broadcast would serialize the build
    on the driver (the dedup_soft_weights trap, NOTES r05 #19).
    """
    from .html import metadata

    m = metadata(
        df, html_col=html_col, id_col=id_col, keep_cols=(url_col,)
    )
    cano = F.col("canonical_url")
    honored = F.coalesce(
        cano.rlike("(?i)^https?://"), F.lit(False)
    )
    d = m.select(
        "doc_id",
        F.col(url_col).alias("url"),
        honored.alias("used_canonical"),
        canonicalize_url(
            F.when(honored, cano).otherwise(F.col(url_col))
        ).alias("canon_key"),
    )
    counts = d.groupBy("canon_key").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return d.join(counts.hint("shuffle_hash"), "canon_key").select(
        "doc_id",
        "url",
        "canon_key",
        "keep_id",
        "n_members",
        "used_canonical",
        (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-over-crawl page diff — per-url change detection between
    two snapshots, the REFETCH/freshness signal (public practice:
    incremental crawlers schedule recrawls from observed change rates,
    Cho & Garcia-Molina 2003; the page-level complement of
    `dedup.incremental_lsh_flags` (near-dup vs the previous crawl) and
    `corpus_drift` (token-level distribution shift)).  One row per url
    seen in EITHER snapshot::

        (url, status, old_digest, new_digest)

    ``status``: 'added' (new only), 'removed' (old only), 'changed'
    (both, md5(text) differs), 'unchanged' (both, equal).  NULL text
    digests as '' (the c4_filters convention); the digest of the
    missing side is NULL.  Each side is pre-deduped to one digest per
    url (MIN — a url crawled twice in one snapshot resolves
    deterministically).

    100 TB shape: two url-keyed map-side-partial MIN aggs + ONE
    full-outer join PINNED shuffle_hash (both snapshots are
    corpus-scaled — the AQE-broadcast trap); digests are computed
    narrow BEFORE the aggs so only (url, md5) shuffles, never text.
    """
    def digested(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(url_col).alias(f"_cd_url_{side}"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(
                f"_cd_md5_{side}"
            ),
        ).groupBy(f"_cd_url_{side}").agg(
            F.min(f"_cd_md5_{side}").alias(f"{side}_digest")
        )

    o, n = digested(old, "old"), digested(new, "new")
    j = o.join(
        n.hint("shuffle_hash"),
        o["_cd_url_old"] == n["_cd_url_new"],
        "full_outer",
    )
    od, nd = F.col("old_digest"), F.col("new_digest")
    return j.select(
        F.coalesce(F.col("_cd_url_old"), F.col("_cd_url_new")).alias(
            "url"
        ),
        F.when(od.isNull(), F.lit("added"))
        .when(nd.isNull(), F.lit("removed"))
        .when(od == nd, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        od.alias("old_digest"),
        nd.alias("new_digest"),
    )


def robots_rules(
    df: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """robots.txt parsing into relational rule rows — the ingestion
    step UPSTREAM of `robots_filter` (which consumes a (host, prefix,
    allow) rules table; this op produces it from the raw fetched
    files).  RFC 9309 grouping: consecutive ``User-agent`` lines form
    one group header and the rules that follow bind to EVERY agent of
    that group, so the output joins each rule line to each of its
    group's agents.  Rules appearing before any group header are
    invalid per the RFC and are dropped (group_no 0 never joins);
    ``Sitemap`` lines are group-independent and emit agent-NULL rows.

    Line discipline (all cross-engine-exact): CR stripped (CRLF
    files), ``#`` comments cut, space/tab trimmed EXPLICITLY via
    ``[ \\t]`` classes (native trim() is space-only — the
    line_stats lesson), directive names lowercased (case-insensitive
    per RFC), agent names lowercased, values kept verbatim (path
    prefixes are case-sensitive).  An EMPTY Disallow value is the
    allow-all idiom and keeps its row.

    Plan shape: ONE host-keyed exchange for the group-numbering
    window (lag + cumsum over line order); the agents/rules branches
    re-derive the cheap line subtree (the tfidf shape) and join with
    PINNED shuffle_hash on (host, group_no) — both tables scale with
    the crawl, never broadcast.  100 TB: robots files are KB-bounded
    by convention, so per-host line counts cannot skew a task.
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col).cast("string"), F.lit("")),
                "\n",
            )
        ).alias("_rl_no", "_rl_raw"),
    )
    s = F.replace(F.col("_rl_raw"), F.lit("\r"), F.lit(""))
    s = F.regexp_replace(s, "#.*", "")
    s = F.regexp_replace(s, "^[ \\t]+|[ \\t]+$", "")
    staged = lines.select(
        "host",
        (F.col("_rl_no") + 1).cast("long").alias("line_no"),
        F.lower(
            F.regexp_extract(s, "^([A-Za-z][A-Za-z-]*)[ \\t]*:", 1)
        ).alias("directive"),
        F.regexp_replace(
            F.regexp_extract(
                s, "^[A-Za-z][A-Za-z-]*[ \\t]*:(.*)$", 1
            ),
            "^[ \\t]+|[ \\t]+$",
            "",
        ).alias("value"),
    )
    w = Window.partitionBy("host").orderBy(F.col("line_no").asc())
    is_ua = F.col("directive") == "user-agent"
    boundary = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = staged.withColumn(
        "group_no",
        F.sum(boundary.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    agents = grouped.filter(is_ua).select(
        "host",
        "group_no",
        F.lower(F.col("value")).alias("agent"),
    )
    rules = grouped.filter(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
        & (F.col("group_no") >= 1)
    ).select("host", "group_no", "line_no", "directive", "value")
    joined = rules.join(
        agents.hint("shuffle_hash"), on=["host", "group_no"]
    ).select("host", "group_no", "agent", "line_no", "directive", "value")
    sitemaps = grouped.filter(F.col("directive") == "sitemap").select(
        "host",
        F.lit(None).cast("long").alias("group_no"),
        F.lit(None).cast("string").alias("agent"),
        "line_no",
        F.lit("sitemap").alias("directive"),
        "value",
    )
    return joined.unionByName(sitemaps)


def sitemap_coverage(
    entries: DataFrame,
    crawled: DataFrame,
    loc_col: str = "loc",
    url_col: str = "url",
) -> DataFrame:
    """Coverage diff between sitemap-DECLARED pages and actually
    CRAWLED urls — the crawl-completeness audit that closes the seed
    loop: `sitemap_entries` tells the crawler what a site claims to
    have; this op reports what that claim is worth.

        uncrawled_seed  declared but never fetched (frontier gap)
        orphan_page     fetched but not declared (discovery-only page
                        — or a stale sitemap)
        covered         both

    Index entries (``is_index``) are pointers to child sitemaps, not
    pages, and are excluded.  Both sides are DISTINCT'd before the
    FULL OUTER join (a url crawled twice is still one page), and the
    join pins shuffle_hash — both sides scale with the crawl (the
    soft_weights AQE-broadcast trap).  The per-side distinct aggs
    key by url, so the join reuses their partitioning (the
    crawl_diff shape: only url strings ever shuffle).
    """
    s = (
        entries.filter(~F.col("is_index"))
        .select(F.col(loc_col).alias("url"))
        .distinct()
        .withColumn("_sc_s", F.lit(True))
    )
    c = (
        crawled.select(F.col(url_col).alias("url"))
        .distinct()
        .withColumn("_sc_c", F.lit(True))
    )
    j = s.join(c.hint("shuffle_hash"), on="url", how="full_outer")
    in_s = F.coalesce(F.col("_sc_s"), F.lit(False))
    in_c = F.coalesce(F.col("_sc_c"), F.lit(False))
    return j.select(
        "url",
        in_s.alias("in_sitemap"),
        in_c.alias("crawled"),
        F.when(in_s & in_c, F.lit("covered"))
        .when(in_s, F.lit("uncrawled_seed"))
        .otherwise(F.lit("orphan_page"))
        .alias("status"),
    )


# bounded dot-segment normalization passes (RFC 3986 §5.2.4 as a
# FIXED number of regex sweeps — deterministic and cross-engine
# identical; chains deeper than the pass budget stay un-squashed,
# unit-pinned).  One site: the oracle regenerates from these.
RESOLVE_DOT_PASSES = 2
RESOLVE_DOTDOT_PASSES = 4
_DOT_RE = "/\\./"
_DOTDOT_RE = "/[^/]+/\\.\\./"
_UNDERFLOW_RE = "^/\\.\\./"


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve an href against its page url (RFC 3986 §5 reference
    resolution, the crawl-frontier step between `html.links` and
    `canonicalize_url`): absolute hrefs pass through; protocol-
    relative take the base scheme; rooted replace the path; query-
    only keep the base path; fragment-only resolve to the base
    itself (fragments are client-side); plain/dotted relatives merge
    against the base directory with bounded dot-segment removal
    (leading ``../`` underflow clamps at the root, the browser
    behavior).  The FRAGMENT is dropped from every result — a crawl
    frontier never refetches by fragment.

    NULL base or NULL/empty href resolve to NULL (no evidence).
    Pure narrow expression — no UDF, no shuffle; malformed bases
    (no scheme://host) yield NULL via the same guard.
    """
    b = F.coalesce(base.cast("string"), F.lit(""))
    h = F.coalesce(href.cast("string"), F.lit(""))
    origin = F.regexp_extract(
        b, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1
    )
    scheme = F.regexp_extract(b, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    bpath = F.regexp_replace(
        F.regexp_extract(b, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
        "^$",
        "/",
    )
    bdir = F.regexp_replace(bpath, "[^/]*$", "")
    bdir = F.when(bdir == "", F.lit("/")).otherwise(bdir)
    base_no_frag = F.regexp_replace(b, "#.*", "")
    joined = (
        F.when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("#"), base_no_frag)
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        .otherwise(F.concat(origin, bdir, h))
    )
    u = F.regexp_replace(joined, "#.*", "")
    res_origin = F.regexp_extract(
        u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1
    )
    rest = F.substr(u, F.length(res_origin) + 1)
    for _ in range(RESOLVE_DOT_PASSES):
        rest = F.regexp_replace(rest, _DOT_RE, "/")
    for _ in range(RESOLVE_DOTDOT_PASSES):
        rest = F.regexp_replace(rest, _DOTDOT_RE, "/")
    for _ in range(2):
        rest = F.regexp_replace(rest, _UNDERFLOW_RE, "/")
    out = F.concat(res_origin, rest)
    valid = (origin != "") & (h != "")
    return F.when(valid & (res_origin != ""), out)


def cdx_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """CDX-style capture index over (url, fetch_ts, digest) rows —
    the web-archive lookup table (SURT-keyed capture summaries; the
    pyWB/OpenWayback index shape, public knowledge) that pairs with
    `warc_records`: WARC stores the records, CDX finds them.

    SURT key = reversed lowered host labels comma-joined + ')' +
    the url's path?query (fragment stripped, bare path -> '/', kept
    case-sensitive) — e.g. ``https://www.Ex.org/a?q=1`` ->
    ``org,ex)/a?q=1`` (www stripped by the shared host_of).  Rows
    with no parseable host carry no archive key and are dropped.

    Per key: capture count, distinct-digest version count,
    first/latest fetch_ts (STRINGS — CDX timestamps are sortable
    14-digit text; the pub_date rule), and the digest of the latest
    capture (ties at the latest timestamp break by max digest — the
    max(struct) ordering, deterministic).

    100 TB shape: narrow key construction + ONE map-side-partial
    exchange keyed by surt_key; hot keys are bounded by per-url
    recrawl counts.
    """
    host = host_of(F.col(url_col))
    rest = F.regexp_replace(
        F.regexp_extract(
            F.col(url_col),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$",
            1,
        ),
        "#.*",
        "",
    )
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.lit(")"),
        rest,
    )
    ts = F.col(ts_col).cast("string")
    dg = F.col(digest_col).cast("string")
    staged = df.filter(host.isNotNull()).select(
        surt.alias("surt_key"), ts.alias("_cx_ts"), dg.alias("_cx_d")
    )
    agg = staged.groupBy("surt_key").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.count_distinct(F.col("_cx_d")).alias("n_versions"),
        F.min("_cx_ts").alias("first_ts"),
        F.max("_cx_ts").alias("latest_ts"),
        F.max(F.struct(F.col("_cx_ts"), F.col("_cx_d")))
        .getField("_cx_d")
        .alias("latest_digest"),
    )
    return agg


# Curated public-suffix stand-in (the URL_WORD_WEIGHTS convention:
# deployments swap in the full Mozilla PSL snapshot; the operator
# shape — longest-suffix argmax over a bounded literal vocabulary —
# is the production plan either way).  Includes multi-label suffixes
# (co.uk beats uk) and PSL private-section entries (github.io), the
# two rules a naive last-two-labels split gets wrong.
PUBLIC_SUFFIXES = [
    "com", "org", "net", "io", "edu", "gov", "mil", "info", "biz",
    "dev", "app", "de", "fr", "it", "nl", "es", "se", "ch", "at",
    "be", "ca", "us", "ru", "pl", "jp", "cn", "uk", "in", "br", "au",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "co.in",
    "github.io", "blogspot.com", "wordpress.com",
]


def with_registered_domain(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds (host, public_suffix, registered_domain) — the pay-level-
    domain key every per-site corpus decision should group on
    (raw-host grouping treats every blogspot subdomain as its own
    site; PLD grouping is what quota/stats/link-graph ops want).

    Longest matching suffix via an order-based array_max over
    (length, suffix) structs — NEVER a sequential best-so-far
    when()-chain (the NOTES gotcha-2 codegen lesson; ties are
    impossible since a fixed-length host tail is unique, and the
    struct order rule documents the argmax anyway).  The host is
    staged + pinned so the HOF predicate references an ATTRIBUTE
    (gotcha-3: an inline child expression re-evaluates per element).

    Semantics: no matching suffix -> both NULL (IPs, intranet hosts,
    unknown TLDs — downstream groups them per raw host); host EQUAL
    to a suffix -> public_suffix set, registered_domain NULL (there
    is no registrable label); junk url -> host NULL.  Pure narrow
    expressions, zero exchanges.
    """
    for n in ("host", "public_suffix", "registered_domain", "_rd_host"):
        if n in df.columns:
            raise ValueError(f"output/staging column {n!r} already exists")
    from ..functions.numeric import pin

    out = df.withColumn("_rd_host", pin(host_of(F.col(url_col))))
    host = F.col("_rd_host")
    cands = F.array(
        *[
            F.struct(F.lit(len(s)).alias("l"), F.lit(s).alias("s"))
            for s in PUBLIC_SUFFIXES
        ]
    )
    best = F.array_max(
        F.filter(
            cands,
            lambda c: (host == c["s"])
            | host.endswith(F.concat(F.lit("."), c["s"])),
        )
    )
    out = out.withColumn("public_suffix", best["s"])
    suf = F.col("public_suffix")
    label = F.regexp_extract(
        F.substring(
            host, F.lit(1), F.length(host) - F.length(suf) - 1
        ),
        r"([^.]+)$",
        1,
    )
    reg = F.when(
        suf.isNotNull() & (host != suf) & (label != ""),
        F.concat(label, F.lit("."), suf),
    )
    return (
        out.withColumn("registered_domain", reg)
        .withColumn("host", host)
        .drop("_rd_host")
    )


def registered_domains(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-PLD rollup of a url table:

      (registered_domain, public_suffix, n_urls, n_hosts)

    n_hosts > 1 is the subdomain-collapse signal (how many raw hosts
    the PLD key merges).  Unmatched-TLD hosts group under (NULL,
    NULL); suffix-only hosts under (NULL, suffix).  Junk urls (no
    host) are dropped.

    100 TB shape: narrow suffix argmax + ONE aggregation — the
    count-distinct plans as the standard two-level partial agg
    (first on (registered_domain, public_suffix, host), then final),
    map-side-combined on both levels.
    """
    return (
        with_registered_domain(df, url_col)
        .filter(F.col("host").isNotNull())
        .groupBy("registered_domain", "public_suffix")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


def with_host_safety(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-frontier host-safety classification — the SSRF /
    internal-network guard every fetcher runs before touching a
    candidate url (public practice: crawlers must never fetch
    loopback, RFC-1918 private, or link-local addresses, and skip
    .onion / mDNS .local names).  Adds::

        (host, host_class, fetch_ok)

    host_class priority (first match wins, the CASE order IS the
    rule): no_host < loopback (localhost name or 127/8) <
    ip6_literal (any ':'/'['-bearing host — range-checking IPv6 is
    out of scope, so the guard FAILS CLOSED: '[::1]' and
    '[::ffff:127.0.0.1]' must never be fetchable) < ambiguous_ip
    (digits-and-dots hosts that are NOT a plain decimal quad —
    leading-zero octets like 0177.0.0.1 parse as OCTAL in standard
    clients and resolve to loopback; also fail-closed) < private_ip
    for 0/8 ("this network" — connects to localhost on Linux) <
    loopback 127/8 < private_ip (10/8, 192.168/16, 172.16/12) <
    link_local (169.254/16) < public_ip (any other plain decimal
    quad — fetchable but flagged: IP-literal urls are
    policy-routable) < onion < mdns_local (.local) < bare (dot-less
    intranet name) < name (fetchable).
    An INVALID plain quad (octet > 255, too many labels, '127.1'
    shorthand) never reaches the arms: Spark's try_parse_url rejects
    those at the parser and the url lands in no_host (verified
    against the 999.1.2.3 fixture arm) — but it ACCEPTS leading-zero
    octets, hence the explicit ambiguous_ip arm.

    Octets are extracted via anchored regexp groups and NULLIF-guarded
    before the int cast (ANSI: a bare cast of '' THROWS — the
    epoch_plan lesson); the four ints ride ONE pinned STRUCT (the
    pub_date staging rule) and the class/flag pair is ONE when-chain
    producing a struct, so no predicate is evaluated twice.  Pure
    narrow expressions, zero exchanges.
    """
    for n in ("host", "host_class", "fetch_ok", "_hs_host", "_hs_o", "_hs_d"):
        if n in df.columns:
            raise ValueError(f"output/staging column {n!r} already exists")
    from ..functions.numeric import pin

    ip_re = r"^([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})$"
    # ADVICE r05: a root-anchored trailing dot ('localhost.',
    # 'printer.local.', '*.onion.') resolves identically in DNS, so it
    # must not fall through the suffix arms to fetchable 'name' — strip
    # ONE trailing dot before classification (dotted quads with a
    # trailing dot never get here: try_parse_url rejects them to
    # no_host, verified empirically).  The mirrored rule lives in the
    # hypothesis model and the unit fixture arms.
    out = df.withColumn(
        "_hs_host",
        pin(F.regexp_replace(host_of(F.col(url_col)), r"\.$", "")),
    )
    host = F.col("_hs_host")
    out = out.withColumn(
        "_hs_o",
        pin(
            F.struct(
                *[
                    F.nullif(
                        F.regexp_extract(host, ip_re, i + 1), F.lit("")
                    )
                    .cast("int")
                    .alias(f"o{i + 1}")
                    for i in range(4)
                ]
            )
        ),
    )
    o = [F.col("_hs_o")[f"o{i + 1}"] for i in range(4)]
    # try_parse_url has already rejected malformed quads (octet >
    # 255, wrong label count), so for PLAIN DECIMAL quads shape ==
    # valid; leading-zero octets survive the parser and are handled
    # by the ambiguous_ip arm BEFORE these octet tests fire
    ip_valid = o[0].isNotNull()
    # digits-and-dots host with a leading-zero octet (octal in
    # standard clients) or any non-quad numeric shape the parser let
    # through: never trust the decimal reading
    numericish = host.rlike(r"^[0-9.]+$")
    leading_zero = host.rlike(r"(^|\.)0[0-9]")

    def cls(name: str, ok: bool):
        return F.struct(
            F.lit(name).alias("c"), F.lit(ok).alias("ok")
        )

    decided = (
        F.when(host.isNull(), cls("no_host", False))
        .when(
            (host == "localhost") | host.endswith(".localhost"),
            cls("loopback", False),
        )
        .when(
            host.contains(":") | host.startswith("["),
            cls("ip6_literal", False),
        )
        .when(
            numericish & (leading_zero | ~ip_valid),
            cls("ambiguous_ip", False),
        )
        .when(ip_valid & (o[0] == 127), cls("loopback", False))
        .when(
            ip_valid & (o[0] == 0), cls("private_ip", False)
        )
        .when(ip_valid & (o[0] == 10), cls("private_ip", False))
        .when(
            ip_valid & (o[0] == 192) & (o[1] == 168),
            cls("private_ip", False),
        )
        .when(
            ip_valid & (o[0] == 172) & o[1].between(16, 31),
            cls("private_ip", False),
        )
        .when(
            ip_valid & (o[0] == 169) & (o[1] == 254),
            cls("link_local", False),
        )
        .when(ip_valid, cls("public_ip", True))
        .when(host.endswith(".onion"), cls("onion", False))
        .when(host.endswith(".local"), cls("mdns_local", False))
        .when(~host.contains("."), cls("bare", False))
        .otherwise(cls("name", True))
    )
    # the decision struct is referenced twice (class + flag): pin it
    # so the when-chain evaluates once per row, not once per field
    return (
        out.withColumn("_hs_d", pin(decided))
        .withColumn("host", host)
        .withColumn("host_class", F.col("_hs_d")["c"])
        .withColumn("fetch_ok", F.col("_hs_d")["ok"])
        .drop("_hs_host", "_hs_o", "_hs_d")
    )
