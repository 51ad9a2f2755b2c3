"""Arrow-batch extraction stage: document -> table-cell rows.

This is the engine's one custom physical operator (SURVEY.md §2.11): a
``mapInPandas`` stage that replaces the reference's per-PDF tabula/camelot
subprocess calls with vectorized pandas string ops over Arrow batches:

  S4 page-text scan         aviva/parser.py:70-75 (keyword page location)
  S5 column-grid slicer     crelan/parser.py:96-103 (tabula columns=[x...])
                            -> fixed char-offset slicing
  S7 whitespace-gap split   four/parser.py:196-218 (camelot stream)
                            -> split on runs of >=2 spaces
  U3 half-page split        mandarin/parser.py:102-114 (two-up restack)
  ToC scan                  crelan/parser.py:41-56 (pages 2-5, 2-col grid)

Output rows (one per table line / ToC entry / section header):

  url STRING, doc_class STRING, lang STRING,
  page_no INT, row_idx INT,              -- the total order the window
                                         -- operators depend on (§2.5)
  kind STRING,                           -- 'row' | 'toc' | 'meta'
  c0..c3 STRING, shape INT               -- named cells + raw token count

Cells come out POSITIONAL-NAMED (not an array): c0..c3 are the 4 payload
cells after the D4 shape dispatch (four/parser.py:16-32) — for gap-split
rows with a leading quantity token (shape 5) the shift happens here in
the batch, so downstream Catalyst projections stay small (big CASE/
element_at chains previously blew generated code past janino's 64KB
method limit and forced interpreted fallback).  ``shape`` preserves the
raw token count for the P11 filter.  ToC rows use c0=fund, c1=page;
meta rows use c0=fund.

Everything inside the batch is pandas-vectorized (``.str`` ops on exploded
line frames) — no per-row Python at the Spark level, in line with the
input_hint ("vectorized pandas/Arrow UDFs (no per-row Python)").

Scale notes: the expensive page/line explosion happens *after* the cheap
section-regex page filter (predicate-before-UDF, SURVEY.md §4), so filler
pages never reach the slicer.  One input row (document) expands to O(rows
per table) output rows; Arrow batch size is capped in session.py because
input rows carry whole documents.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..config import ARCHETYPES, COUNTRIES, CURRENCIES, TWO_UP_SPLIT

EXTRACT_SCHEMA = (
    "url string, doc_class string, lang string, "
    "page_no int, row_idx int, kind string, "
    "c0 string, c1 string, c2 string, c3 string, shape int"
)

OUT_COLS = [
    "url", "doc_class", "lang", "page_no", "row_idx", "kind",
    "c0", "c1", "c2", "c3", "shape",
]

# resolved variant: fund assignment done in-batch (see extract_resolved)
RESOLVED_SCHEMA = (
    "url string, doc_class string, lang string, "
    "page_no int, row_idx int, fund string, "
    "c0 string, c1 string, c2 string, c3 string, shape int"
)

RESOLVED_COLS = [
    "url", "doc_class", "lang", "page_no", "row_idx", "fund",
    "c0", "c1", "c2", "c3", "shape",
]

TOC_GRID = (0, 60)  # fund name / page-number split for ToC pages
TOC_MARKER = "SOMMAIRE"


def _slice_cells(lines: pd.Series, grid: tuple[int, ...]) -> pd.DataFrame:
    """S5: cut each line into cells at fixed character offsets (the
    tabula ``columns=[x1..xk]`` semantics, crelan/parser.py:96-103).
    Returns a frame with c0..c3 + shape (== len(grid), always complete).

    One fused slice+strip comprehension per column: pandas ``.str`` ops
    are per-element Python lambdas with NaN handling, and the accessor
    form cost 2 passes per column (measured ~1.6x slower end-to-end for
    the whole extract batch)."""
    vals = lines.to_numpy()
    out = pd.DataFrame(index=lines.index)
    for i, start in enumerate(grid):
        end = grid[i + 1] if i + 1 < len(grid) else None
        out[f"c{i}"] = [s[start:end].strip() for s in vals]
    out["shape"] = len(grid)
    return out


_GAP_RE = None  # compiled lazily so workers don't pay import-order costs


def _gap_cells(lines: pd.Series) -> pd.DataFrame:
    """S7: whitespace-gap split (camelot stream, four/parser.py:196-218)
    + D4 shape dispatch: a 5-token row's leading quantity is dropped here
    (four/parser.py:16-32), ``shape`` keeps the raw token count.

    Single split pass + per-column extraction (see _slice_cells note)."""
    global _GAP_RE
    if _GAP_RE is None:
        import re

        _GAP_RE = re.compile(r" {2,}")
    toks = [_GAP_RE.split(s.strip()) for s in lines.to_numpy()]
    shape = [len(t) for t in toks]
    toks = [t[1:] if n == 5 else t for t, n in zip(toks, shape)]
    out = pd.DataFrame(index=lines.index)
    for i in range(4):
        out[f"c{i}"] = [t[i] if len(t) > i else "" for t in toks]
    out["shape"] = shape
    return out


def _explode_pages(grp: pd.DataFrame) -> pd.DataFrame:
    ex = grp[["url", "lang"]].copy()
    ex["page"] = grp["text"].str.split("\f")
    ex = ex.explode("page", ignore_index=True)
    ex["page_no"] = ex.groupby("url").cumcount()
    return ex


def _explode_lines(pages: pd.DataFrame) -> pd.DataFrame:
    ln = pages.copy()
    ln["line"] = ln["page"].str.split("\n")
    ln = ln.drop(columns=["page"]).explode("line", ignore_index=True)
    ln["row_idx"] = ln.groupby(["url", "page_no"]).cumcount()
    return ln


def _extract_one_class(
    grp: pd.DataFrame, doc_class: str, resolve: bool = False
) -> list[pd.DataFrame]:
    """One archetype's extraction; with ``resolve=True`` the fund
    assignment (ToC interval lookup / header meta) happens HERE, inside
    the batch, and only resolved table rows are emitted.

    Rationale: a mapInPandas batch holds whole documents, so the
    reference's per-file ToC lookup (crelan/parser.py:57-95) needs no
    relational recombination — resolving in-batch removes a second pass
    over the extract output (persist), a url-shuffle window, and a
    broadcast (measured in BENCH).  The relational formulation (J2
    interval join + W2 ffill) remains in operators/joins.py for when
    ToC and body rows arrive from different sources.
    """
    cfg = ARCHETYPES[doc_class]
    out: list[pd.DataFrame] = []
    ex = _explode_pages(grp)
    toc_entries: pd.DataFrame | None = None
    meta_funds: pd.DataFrame | None = None

    def emit(frame: pd.DataFrame, kind: str, cells: pd.DataFrame) -> None:
        if frame.empty:
            return
        r = frame[["url", "lang", "page_no", "row_idx"]].copy()
        r["doc_class"] = doc_class
        r["kind"] = kind
        for c in ("c0", "c1", "c2", "c3", "shape"):
            r[c] = cells[c] if c in cells.columns else (
                0 if c == "shape" else None
            )
        out.append(r[OUT_COLS])

    # ---- ToC pages (crelan/parser.py:41-56) ----
    if cfg.has_toc:
        toc_pages = ex[
            (ex["page_no"] < cfg.toc_page_limit)
            & ex["page"].str.contains(TOC_MARKER, regex=False, na=False)
        ]
        toc_ln = _explode_lines(toc_pages)
        toc_ln = toc_ln[toc_ln["row_idx"] > 0]  # skip the SOMMAIRE header
        fund = toc_ln["line"].str.slice(0, TOC_GRID[1]).str.strip()
        pg = toc_ln["line"].str.slice(TOC_GRID[1]).str.strip()
        ok = pg.str.fullmatch(r"[0-9]+", na=False)
        if not ok.all():
            # W5 ToC line repair (tobam/parser.py:88-94, same alternation
            # semantics as operators/toc_repair.py): an unnumbered entry
            # grafts the NEXT line's last whitespace token as its page and
            # consumes that line; consumed lines (the reference's "0")
            # never consume their own successor, so consumption alternates
            # within runs of unnumbered lines.
            url_s = toc_ln["url"]
            pos = toc_ln.groupby("url").cumcount()
            last_ok_before = (
                pos.where(ok).groupby(url_s).ffill().groupby(url_s).shift(1)
            )
            streak = pos - 1 - last_ok_before.fillna(-1)
            consumed = (streak % 2).eq(1)
            next_tok = (
                toc_ln["line"]
                .groupby(url_s)
                .shift(-1)
                .str.extract(r"(\S+)\s*$", expand=False)
            )
            graft = ~consumed & ~ok & next_tok.notna()
            pg = pg.mask(graft, next_tok)
            keep = ~consumed
            toc_ln, fund, pg = toc_ln[keep], fund[keep], pg[keep]
            ok = pg.str.fullmatch(r"[0-9]+", na=False)
        toc_ln = toc_ln[ok]  # entries still unnumbered after repair drop
        if resolve:
            toc_entries = pd.DataFrame(
                {
                    "url": toc_ln["url"],
                    "pg": pg[ok].astype("int64"),
                    "fund": fund[ok],
                }
            )
        else:
            cells = pd.DataFrame(
                {"c0": fund[ok], "c1": pg[ok], "shape": 2},
                index=toc_ln.index,
            )
            emit(toc_ln, "toc", cells)

    # ---- section pages (S4 keyword pre-filter) ----
    sec_mask = ex["page"].str.contains(cfg.section_regex, regex=True, na=False)
    if cfg.tail_pages is not None:
        # O4 bounded reverse scan (varenna/parser.py:70-74)
        max_pg = ex.groupby("url")["page_no"].transform("max")
        sec_mask &= ex["page_no"] > (max_pg - cfg.tail_pages)
    sec = ex[sec_mask]
    if sec.empty:
        return out
    ln = _explode_lines(sec)

    # line 0 of a section page is the header: a 'meta' row when the fund
    # name is printed there (F17, scor/parser.py:111-114), else dropped
    hdr = ln[ln["row_idx"] == 0]
    if cfg.fund_regex is not None and not hdr.empty:
        fund = hdr["line"].str.extract(cfg.fund_regex, expand=False)
        got = fund.notna()
        if resolve:
            # per-(url, page) fund, forward-filled across header-less
            # continuation pages within the url (W2 semantics, in-batch)
            meta_funds = hdr[["url", "page_no"]].copy()
            meta_funds["fund"] = fund
            meta_funds = meta_funds.sort_values(["url", "page_no"])
            meta_funds["fund"] = meta_funds.groupby("url")["fund"].ffill()
        else:
            emit(
                hdr[got],
                "meta",
                pd.DataFrame(
                    {"c0": fund[got], "shape": 1}, index=hdr[got].index
                ),
            )

    body = ln[(ln["row_idx"] > 0) & (ln["line"].str.strip() != "")]
    if body.empty:
        return out

    if doc_class == "two_up_fr":
        # U3: left/right half-tables restacked left-above-right per page
        # (mandarin/parser.py:102-114); right block keeps page order via
        # a +1000 row_idx offset
        left = body.copy()
        left["line"] = left["line"].str.slice(0, TWO_UP_SPLIT)
        right = body.copy()
        right["line"] = right["line"].str.slice(TWO_UP_SPLIT)
        right["row_idx"] = right["row_idx"] + 1000
        body = pd.concat([left, right], ignore_index=True)
        body = body[body["line"].str.strip() != ""]

    if cfg.variants is not None:
        # D3 (banque/parser.py:48-121): per-page layout generation chosen
        # by the column-header regex; each variant has its own grid and
        # its own positional filler columns to drop.  shape is the
        # POST-dispatch payload width (always 4).
        page_variant = pd.Series(-1, index=sec.index)
        for vi, (hregex, _g, _keep) in enumerate(cfg.variants):
            hit = sec["page"].str.contains(hregex, regex=True, na=False)
            page_variant = page_variant.mask(
                (page_variant == -1) & hit, vi
            )
        vmap = sec[["url", "page_no"]].copy()
        # W2-style forward-fill: continuation pages of a multi-page table
        # carry no column-header line, so they inherit the last matched
        # variant within the url (otherwise their rows silently vanish)
        vmap["_variant"] = page_variant.where(page_variant != -1)
        vmap = vmap.sort_values(["url", "page_no"], kind="stable")
        vmap["_variant"] = (
            vmap.groupby("url")["_variant"].ffill().fillna(-1).astype(int)
        )
        body = body.merge(vmap, on=["url", "page_no"], how="left")
        parts, bodies = [], []
        for vi, (_h, grid, keep) in enumerate(cfg.variants):
            sub = body[body["_variant"] == vi]
            if sub.empty:
                continue
            sliced = _slice_cells(sub["line"], grid)
            kept = pd.DataFrame(index=sub.index)
            for j, src_idx in enumerate(keep):
                kept[f"c{j}"] = sliced[f"c{src_idx}"]
            kept["shape"] = 4
            parts.append(kept)
            bodies.append(sub)
        if not parts:
            return out
        cells = pd.concat(parts)
        body = pd.concat(bodies)
    elif cfg.grid is not None:
        cells = _slice_cells(body["line"], cfg.grid)
        # A3/D5 threshold-retry (crelan/parser.py:132-135): when the
        # primary grid mis-slices a document (currency cells don't look
        # like currencies), re-slice that document with the alternate
        # grid.  The reference's trigger is the fund's net_assets sum
        # < 15.0 after parsing; ours fires earlier on the same signal
        # class — a per-document slice-quality fraction — so the retry
        # stays inside the Arrow batch (no second pass over the corpus).
        if cfg.retry_grid is not None:
            ok = cells["c1"].isin(CURRENCIES) | (cells["c1"] == "")
            frac = ok.groupby(body["url"]).transform("mean")
            bad = frac < 0.5
            if bad.any():
                cells.loc[bad, :] = _slice_cells(
                    body.loc[bad, "line"], cfg.retry_grid
                )
    else:
        cells = _gap_cells(body["line"])
    # drop rows whose cells are all empty (blank grid lines)
    nonempty = (
        (cells["c0"] != "") | (cells["c1"] != "")
        | (cells["c2"] != "") | (cells["c3"] != "")
    )
    body, cells = body[nonempty], cells[nonempty]
    if not resolve:
        emit(body, "row", cells)
        return out

    # ---- in-batch fund resolution ----
    r = body[["url", "lang", "page_no", "row_idx"]].copy()
    r["doc_class"] = doc_class
    for c in ("c0", "c1", "c2", "c3", "shape"):
        r[c] = cells[c]

    if toc_entries is not None and not toc_entries.empty:
        # J2 interval semantics [pg, next_pg): the last ToC entry whose
        # page <= row's page — exactly merge_asof backward per url
        r = r.sort_values("page_no", kind="stable")
        toc_entries = toc_entries.sort_values("pg", kind="stable")
        r = pd.merge_asof(
            r,
            toc_entries,
            left_on="page_no",
            right_on="pg",
            by="url",
            direction="backward",
        ).drop(columns=["pg"])
    elif meta_funds is not None and not meta_funds.empty:
        r = r.merge(meta_funds, on=["url", "page_no"], how="left")
    else:
        r["fund"] = None
    r = r[r["fund"].notna()]
    # P9 in-batch (aviva/parser.py:276-284): drop the FIRST occurrence of
    # each country heading per page-table.  Per-page logic belongs here —
    # the document is whole in the batch — and doing it relationally would
    # cost a dedicated (url, fund, page, name) sort of every extracted
    # row.  Runs AFTER fund resolution with fund in the dedup key: the
    # reference resets its country list per table WITHIN a fund's page
    # range, so if one page ever carried two funds' tables each fund's
    # first occurrence is dropped independently (this is the single P9
    # implementation — the oracle simulate_cleanup keys (page, name)
    # per fund the same way).  Commutes with the later junk/shape
    # filters: junk rows are never countries and country rows always
    # slice to the full shape.
    is_c = r["c0"].isin(COUNTRIES)
    if is_c.any():
        c_rows = r[is_c]
        firsts = ~c_rows.duplicated(subset=["url", "fund", "page_no", "c0"])
        r = r.drop(index=c_rows.index[firsts])
    out.append(r[RESOLVED_COLS])
    return out


def extract_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (url, text, lang, doc_class) -> cell rows with
    toc/meta rows for relational fund assignment."""
    for pdf in it:
        frames: list[pd.DataFrame] = []
        for doc_class, grp in pdf.groupby("doc_class"):
            if doc_class in ARCHETYPES:
                frames.extend(_extract_one_class(grp, doc_class))
        if frames:
            yield pd.concat(frames, ignore_index=True)


def extract_batches_resolved(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: table rows with fund already assigned."""
    for pdf in it:
        frames: list[pd.DataFrame] = []
        for doc_class, grp in pdf.groupby("doc_class"):
            if doc_class in ARCHETYPES:
                frames.extend(
                    _extract_one_class(grp, doc_class, resolve=True)
                )
        if frames:
            yield pd.concat(frames, ignore_index=True)


PAGE_LINES_SCHEMA = "url string, page_no int, row_idx int, line string"


def explode_page_lines(df):
    """S4 as a standalone operator: document text -> one row per page
    line, via the SAME ``_explode_pages``/``_explode_lines`` the extract
    stage uses (form-feed page breaks, newline lines) — the driver-gate
    surface for the explode mechanics (oracle: UNNEST in SQL)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ex = _explode_pages(pdf.assign(lang=""))
            ln = _explode_lines(ex)
            yield ln[["url", "page_no", "row_idx", "line"]]

    return df.select("url", "text").mapInPandas(run, PAGE_LINES_SCHEMA)


LINE_CELLS_SCHEMA = (
    "line_id bigint, c0 string, c1 string, c2 string, c3 string, shape int"
)


def slice_lines(df, grid: tuple[int, ...]):
    """S5 as a standalone DataFrame operator: (line_id, line) -> cells cut
    at fixed character offsets via the SAME ``_slice_cells`` the pipeline's
    extract stage uses — this is the driver-gate surface for the slicer
    itself (oracle: substr/trim in SQL)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cells = _slice_cells(pdf["line"], grid)
            cells.insert(0, "line_id", pdf["line_id"].values)
            yield cells[["line_id", "c0", "c1", "c2", "c3", "shape"]]

    return df.select("line_id", "line").mapInPandas(run, LINE_CELLS_SCHEMA)


def gap_split_lines(df):
    """S7 (+ its D4 shape shift) as a standalone operator: (line_id, line)
    -> cells split on runs of >=2 spaces via the pipeline's ``_gap_cells``
    (oracle: regexp_split_to_array in SQL)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cells = _gap_cells(pdf["line"])
            cells.insert(0, "line_id", pdf["line_id"].values)
            cells["shape"] = cells["shape"].astype("int32")
            yield cells[["line_id", "c0", "c1", "c2", "c3", "shape"]]

    return df.select("line_id", "line").mapInPandas(run, LINE_CELLS_SCHEMA)


def extract_rows(pages_df):
    """DataFrame-level wrapper: pages (with doc_class) -> cell rows."""
    cols = ["url", "text", "lang", "doc_class"]
    return pages_df.select(*cols).mapInPandas(extract_batches, EXTRACT_SCHEMA)


def extract_resolved(pages_df):
    """pages (with doc_class) -> table rows with ``fund`` resolved
    in-batch (the production pipeline path; see _extract_one_class)."""
    cols = ["url", "text", "lang", "doc_class"]
    return pages_df.select(*cols).mapInPandas(
        extract_batches_resolved, RESOLVED_SCHEMA
    )
