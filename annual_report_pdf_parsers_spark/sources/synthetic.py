"""Deterministic synthetic corpus: pages + manifest + exact expected output.

Phase 0 of SURVEY.md §7.  Emits three tables:

  pages    (url, warc_ts, html, text, lang)          — BASELINE.json input_hint
  manifest (name, pdf_url, isin)                      — reference input CSV shape
                                                        (reference README.md:6-11)
  expected (the 9-column output contract)             — reference README.md:25-35

The generator first draws the *intended* holdings, renders them into
fixed-width / gap-separated page grids (the stand-in for the reference's PDF
layouts, FIXTURES.md §3), and computes the expected output with
``simulate_cleanup`` — a pure-Python re-statement of the engine's cleanup
semantics.  The e2e test then demands the Spark pipeline reproduce
``expected`` byte-identically per url.

Every value is a pure function of (seed, doc index): no wall clock, no
global RNG.
"""

from __future__ import annotations

import random
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

from ..config import (
    ARCHETYPES,
    COUNTRIES,
    CURRENCIES,
    DISPATCH_ORDER,
    JUNK_MARKERS,
    KEEP_LIST,
    TWO_UP_SPLIT,
    ArchetypeConfig,
)

PROVIDER_OF = {
    "toc_grid_fr": "PROVIDER_TOC_FR",
    # roth family (roth/parser.py:395-445): ToC intervals + the
    # Euro->Europe manifest rename retry
    "toc_rename_fr": "PROVIDER_ROTH_FR",
    "header_grid_fr": "PROVIDER_BANQUE_FR",
    "keyword_scan_en": "PROVIDER_KEYWORD_EN",
    # the oddo-style within-provider type family (oddo/parser.py:427-435):
    # a second page-0 type of the SAME provider, own grid/section marker
    "keyword_scan_en_t2": "PROVIDER_KEYWORD_EN",
    # the family's catch-all type (oddo/parser.py:427-435 else-branch):
    # page-0 carries no marker, dispatch comes from the manifest-name
    # family fallback
    "keyword_scan_en_t3": "PROVIDER_KEYWORD_EN",
    "reverse_scan_fr": "PROVIDER_REVERSE_FR",
    "gap_split_en": "PROVIDER_GAP_EN",
    "fragment_fusion_en": "PROVIDER_FRAGMENT_EN",
    "two_up_fr": "PROVIDER_TWO_UP_FR",
    # manifest-name-routed family (crelan/parser.py:736-763): page-0 text
    # is ambiguous by design, D1 routes on the METROPOLITAN token in the
    # manifest names
    "manifest_grid_fr": "PROVIDER_CRELAN_FR",
}

_WORDS = (
    "ALPHA BETA GAMMA DELTA OMEGA NOVA ORION VEGA ATLAS TITAN "
    "SOLAR LUNAR POLAR AZURE COBALT AMBER ONYX JADE IVORY CORAL "
    "SUMMIT HARBOR MERIDIAN PIONEER VANGUARD CITADEL BEACON FORGE "
    "QUANTUM VERTEX ZENITH HALCYON BOREAL AUSTRAL CASCADE PRAIRIE"
).split()

_SUFFIXES = ["HOLDINGS", "CORP", "GROUP", "INDUSTRIES", "PARTNERS", "SA", "NV"]


# ---------------------------------------------------------------------------
# logical model
# ---------------------------------------------------------------------------


@dataclass
class Cell4:
    """One rendered table row: the four cell strings as the slicer sees them."""

    name: str
    cur: str
    mv: str
    na: str
    qty: str = ""  # leading token for 5-shape gap rows / keyword archetype


@dataclass
class Fund:
    title: str           # as printed in ToC / section headers (UPPER)
    rows: list[Cell4] = field(default_factory=list)
    manifest: list[tuple[str, str | None]] = field(default_factory=list)
    # ^ (website name, isin) share classes; empty => no manifest match
    # ToC entry wraps onto two lines, the page number on the second
    # (the W5 tobam repair case) — the repaired entry keeps line 1's text
    toc_wrap: bool = False


@dataclass
class Doc:
    idx: int
    url: str
    warc_ts: datetime
    doc_class: str
    lang: str
    funds: list[Fund] = field(default_factory=list)
    text: str = ""


# ---------------------------------------------------------------------------
# number rendering (inverse of functions/numeric.py F1/F2/F4/F6/F7)
# ---------------------------------------------------------------------------


def fmt_number(cents: int, locale: str, paren_neg: bool) -> str:
    """Render integer cents the way the source PDFs print them."""
    v = abs(cents) / 100.0
    s = f"{v:,.2f}"  # 1,234.56
    if locale == "fr":
        s = s.replace(",", "\0").replace(".", ",").replace("\0", ".")
    if cents < 0:
        s = f"({s})" if paren_neg else f"-{s}"
    return s


def parse_number(cell: str, locale: str) -> float | None:
    """Python-side oracle for the engine's numeric normalization chain.

    Mirrors functions/numeric.py exactly (F1/F2/F4/F5/F6/F7, SURVEY.md §2.8).
    Returns None when the cell is not numeric (P6 drops the row).
    """
    s = cell.strip()
    neg = s.startswith("(") and s.endswith(")")              # F4
    s = s.replace("\u2013", "-")                             # F5 en-dash
    for ch in "%()" + " \u00a0\u2009\u202f":                 # F7+F4+spaces
        s = s.replace(ch, "")
    if locale == "fr":                                       # F1
        s = s.replace(".", "").replace(",", ".")
    elif locale == "en":                                     # F2
        s = s.replace(",", "")
    elif "." in s and "," in s:                              # F3 'auto':
        s = s.replace(",", "")                               # ',' thousands
    else:                                                    # F3 'auto':
        s = s.replace(",", ".")                              # ',' decimal
    # F6 sentinel AFTER locale normalization \u2014 exactly where the engine
    # checks it (double_from_normalized receives the normalized string);
    # property-tested equal on adversarial inputs (tests/test_property.py)
    if s in ("", "-", "nan"):
        return 0.0
    # P6: the engine uses try_cast (NULL on failure) — mirror Python's
    # float() acceptance, which is what the reference itself used
    try:
        v = float(s)
    except ValueError:
        return None
    return -abs(v) + 0.0 if neg else v


_ISIN_RE = re.compile(r"[A-Z]{2}[A-Z0-9]{9}[0-9]")


def report_name(fund: Fund, cfg: ArchetypeConfig) -> str:
    """Oracle for the engine's fund_name_report derivation: the W5-repaired
    ToC text (line 1 only for wrapped entries), then the archetype's F16
    rewrites (plans/dispatch.py::report_name_col), then trim + lower."""
    title = fund.title
    if fund.toc_wrap:
        title = " ".join(title.split()[:2])
    for pat, repl in cfg.name_rewrites:
        title = re.sub(pat, repl, title)
    return title.strip().lower()


def _row_pages(cfg: ArchetypeConfig, n_rows: int) -> list[int]:
    """Page-table index of each fund row, mirroring _render_doc's chunking
    exactly (the P9 per-page country reset needs page identity in the
    oracle).  MUST stay in lockstep with _render_doc."""
    if cfg.has_toc:
        return [i // 8 for i in range(n_rows)]
    if cfg.name == "two_up_fr":
        half = (n_rows + 1) // 2
        return [(i % half) // 60 for i in range(n_rows)]
    # all other archetypes render [column-header, *rows] in 12-line pages
    return [(i + 1) // 12 for i in range(n_rows)]


def hard_clean_ref(text: str) -> str:
    """Verbatim restatement of the crelan hard ``clean()``
    (crelan/parser.py:644-656) minus its final strip (the engine's F18
    handles trimming) — the oracle half of functions/strings.py::
    hard_clean_crelan, also the property-fuzz reference."""
    if text == "nan":
        return "_"
    text = re.sub(r"(?<!\d)%|[a-z]|%(?! )", "", text)
    text = re.sub(r"(?<=\d)[a-zA-Z](?! )|(?<=\.)[a-zA-Z](?! )", "", text)
    text = re.sub(r"(?<=[0-9/]) (?=[0-9/])", "", text)
    return text


def clean_name(
    name: str,
    strip_leading_token: bool,
    deep_clean: bool = False,
    hard_clean: bool = False,
) -> str:
    """Oracle for the name-cleanup chain: F13 leading-token drop, F9 ISIN
    strip, optional aviva deep clean (F10 charset purge then F11 multi-%
    truncation, aviva/parser.py:673-680) or crelan hard clean
    (crelan/parser.py:644-656), F18 whitespace collapse + trim
    (SURVEY.md §2.8)."""
    s = name
    if strip_leading_token:
        s = re.sub(r"^\S+ +", "", s, count=1)
    s = _ISIN_RE.sub("", s)                     # F9
    if deep_clean:
        s = re.sub(r"[^0-9a-zA-Z/ %)(]", "", s)  # F10
        if s.count("%") > 1:                     # F11 (aviva-exact)
            m = re.search(r"% {0,3}[0-9/]+", s)
            if m:
                s = s[: m.end()]
    if hard_clean:
        s = hard_clean_ref(s)
    s = re.sub(r"\s+", " ", s).strip()          # F18
    return s


# ---------------------------------------------------------------------------
# cleanup oracle — the engine's semantics, restated in plain Python
# ---------------------------------------------------------------------------


def simulate_cleanup(
    rows: list[Cell4], cfg: ArchetypeConfig
) -> list[tuple[str, float, str, float]]:
    """Apply the canonical cleanup order to one fund's rendered rows.

    Canonical order (documented contract, see plans/pipeline.py):
      P7 junk drop -> P9 country first-occurrence drop -> W3 block fusion ->
      F12 embedded-currency rescue -> P3 currency filter -> W1 ffill
      currency -> numeric parse (F*) + P6 -> P12 summary drop ->
      name cleanup (F9/F13/F18) -> P5/P8 name predicates.
    Returns [(holding_name, market_value, currency, net_assets)].
    """
    # P7: junk rows (pages threaded through for P9's per-page reset)
    pages = _row_pages(cfg, len(rows))
    paged = [
        (p, r)
        for p, r in zip(pages, rows)
        if not any(m in r.name for m in JUNK_MARKERS)
    ]

    # P9: drop only the FIRST occurrence of each country name PER
    # PAGE-TABLE (aviva/parser.py:276-284 resets '_countries' per table,
    # so a country repeated on a later page is dropped again)
    seen: set[tuple[int, str]] = set()
    out: list[Cell4] = []
    for p, r in paged:
        if r.name in COUNTRIES and (p, r.name) not in seen:
            seen.add((p, r.name))
            continue
        out.append(r)

    # W3: block fusion — fragment rows (mv=='' and na=='') concat into the
    # next complete row's name; trailing fragments are dropped
    fused: list[Cell4] = []
    frag: list[str] = []
    for r in out:
        if r.mv == "" and r.na == "":
            frag.append(r.name)
            continue
        if frag:
            r = Cell4(" ".join([*frag, r.name]), r.cur, r.mv, r.na, r.qty)
            frag = []
        fused.append(r)
    out = fused

    # F12: rescue a whitelisted currency token embedded in the name cell
    # (aviva/parser.py:259-268) — first match moves to the currency
    # column, ALL embedded tokens stripped from the name
    cur_alt = "|".join(CURRENCIES)
    cur_re = re.compile(rf"(?:^| )({cur_alt})(?= |$)")
    for r in out:
        if r.cur == "":
            m = cur_re.search(r.name)
            if m:
                r.cur = m.group(1)
                r.name = cur_re.sub(" ", r.name)

    # P3: currency whitelist (empty allowed pending ffill; keep-list anchors)
    keep = set(KEEP_LIST)
    out = [
        r
        for r in out
        if r.cur in CURRENCIES or r.cur == "" or r.name in keep
    ]

    # W1: forward-fill empty currency from previous surviving row.
    # A1 fallback (impute_currency_mode archetypes, amundi:104-110):
    # unfillable LEADING rows take the most-frequent currency among the
    # post-P3 non-empty values (pandas mode()[0]: smallest among ties).
    mode_cur = ""
    if cfg.impute_currency_mode:
        from collections import Counter

        cnt = Counter(r.cur for r in out if r.cur != "")
        if cnt:
            top = max(cnt.values())
            mode_cur = min(c for c, n in cnt.items() if n == top)
    last_cur = ""
    for r in out:
        if r.cur == "":
            r.cur = last_cur if last_cur else mode_cur
        else:
            last_cur = r.cur
    out = [r for r in out if r.cur != ""]  # no seed row -> unfillable, drop

    result: list[tuple[str, float, str, float]] = []
    for r in out:
        mv = parse_number(r.mv, cfg.number_locale)
        na = parse_number(r.na, cfg.number_locale)
        if mv is None or na is None:       # P6
            continue
        if na == 100.0:                     # P12 fund-total row
            continue
        # qty tokens are either a separate cell dropped by D4 realign
        # (gap shape-5) or embedded in the name cell and removed by the
        # F13 leading-token strip (keyword archetype) — either way the
        # expected name is the bare holding name
        name = clean_name(
            r.name, strip_leading_token=False,
            deep_clean=cfg.deep_name_clean,
            hard_clean=cfg.hard_name_clean,
        )
        if not name or len(name) >= 90:     # P5 / P8
            continue
        result.append((name, mv, r.cur, na))
    return result


# ---------------------------------------------------------------------------
# corpus generation
# ---------------------------------------------------------------------------


def _mk_name(rng: random.Random, max_len: int) -> str:
    while True:
        n = f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} {rng.choice(_SUFFIXES)}"
        if len(n) <= max_len and n not in COUNTRIES:
            return n


def _mk_isin(rng: random.Random) -> str:
    return "LU" + "".join(rng.choice("0123456789") for _ in range(10))


def _mk_bond_name(rng: random.Random, max_len: int) -> str:
    """Bond-code-shaped names exercising every branch of the crelan hard
    clean(): lowercase pollution, '%' kept/removed by context, digit-space
    collapse, glued unit suffixes."""
    w = rng.choice(_WORDS)
    pct = f"{rng.randrange(1, 9)},{rng.randrange(10, 99)}%"
    dd = f"{rng.randrange(1, 28):02d}/{rng.randrange(1, 13):02d}"
    v = rng.randrange(4)
    if v == 0:
        n = f"{w} {pct} {dd}"                      # surviving '%'
    elif v == 1:
        n = f"{w} Bond {pct} {dd} {rng.randrange(20, 40)}"  # lc + collapse
    elif v == 2:
        n = f"{w} {pct}{dd}"                       # '%' glued -> removed
    else:
        n = f"{w} {rng.randrange(1, 9)}y {pct} {dd} series"  # unit suffix
    return n[:max_len].strip()


def _build_fund_rows(
    rng: random.Random, cfg: ArchetypeConfig, name_width: int
) -> list[Cell4]:
    """Draw one fund's rendered rows, edge cases included."""
    rows: list[Cell4] = []
    # header_grid_fr funds run long enough to spill onto continuation
    # pages (which carry no variant-header line — the D3 ffill case)
    n_hold = (
        rng.randint(4, 14)
        if cfg.name == "header_grid_fr"
        else rng.randint(4, 9)
    )
    allow_isin = name_width >= 38
    frag_ok = cfg.name == "fragment_fusion_en"
    country_pool = rng.sample(COUNTRIES, k=3)
    dup_country = rng.random() < 0.5
    first_country: str | None = None
    # cap market values so they fit the archetype's mv field width
    # (grid slot [grid[2], grid[3]) minus 2 chars for the F4 parens)
    if cfg.grid is not None:
        mv_digits = cfg.grid[3] - cfg.grid[2] - 2
        mv_max = min(200_000_000, 10 ** (mv_digits - mv_digits // 4))
    else:
        mv_max = 200_000_000

    # W6 seed: first row always carries a currency
    for h in range(n_hold):
        cur = rng.choice(CURRENCIES[:8])
        # gap-split pages cannot render an empty cell (a >=2-space split
        # swallows it and shifts the columns), so currency is always present.
        # impute_currency_mode archetypes also blank the FIRST row's
        # currency sometimes — the A1 mode-imputation case (no W1 seed)
        missing_cur = (
            cfg.grid is not None
            and (h > 0 or cfg.impute_currency_mode)
            and rng.random() < 0.18
        )
        base = _mk_name(rng, name_width - 15 if allow_isin else name_width)
        isin_tag = allow_isin and rng.random() < 0.15
        name_cell = f"{base} {_mk_isin(rng)}" if isin_tag else base
        if cfg.hard_name_clean and rng.random() < 0.7:
            # crelan family: bond-code names through the hard clean()
            base = name_cell = _mk_bond_name(rng, name_width)
            isin_tag = False
        dash = rng.random() < 0.06
        if dash:
            mv_cell, na_cell = "-", "0,00%" if cfg.number_locale == "fr" else "0.00%"
        else:
            cents = rng.randrange(10_000, mv_max)
            if rng.random() < 0.08:
                cents = -cents
            mv_cell = fmt_number(cents, cfg.number_locale, paren_neg=True)
            na_c = rng.randrange(1, 9_999)
            na_cell = fmt_number(na_c, cfg.number_locale, paren_neg=False) + "%"

        # interleave country heading rows (fragment archetype, P9)
        if frag_ok and h in (1, 3) and country_pool:
            c = country_pool.pop()
            if first_country is None:
                first_country = c
            rows.append(Cell4(c, "", "", ""))
            if dup_country and h == 1:
                # second occurrence: NOT removed by P9 -> becomes a fragment
                rows.append(Cell4(c, "", "", ""))
                name_cell = base = _mk_name(rng, name_width - len(c) - 12)
                isin_tag = False

        # F10/F11 deep-clean fixtures (aviva:673-680) — fragment archetype
        # renders some names with purged-charset pollution or a junk tail
        # after a second '%' token; the oracle's clean_name applies the
        # same chain
        if frag_ok and not isin_tag and not dash:
            roll = rng.random()
            if roll < 0.15:
                name_cell = f"{base[:4]}«™{base[4:]}"
            elif roll < 0.3 and len(base) < 25:
                name_cell = f"{base} 4% 26 SR {rng.randrange(1, 9)}%"

        # F12: embed the currency in the name cell, leave currency empty
        # (the aviva corrupt-table shape) — fragment archetype only
        if (
            frag_ok
            and not isin_tag
            and not dash
            and rng.random() < 0.2
            and " " in base
        ):
            head, rest = base.split(" ", 1)
            rows.append(Cell4(f"{head} {cur} {rest}", "", mv_cell, na_cell))
            continue

        # fragment split of the holding name (W3)
        if frag_ok and rng.random() < 0.4 and len(base) > 14 and not isin_tag:
            cut = len(base) // 2
            head, tail = base[:cut].strip(), base[cut:].strip()
            rows.append(Cell4(head, "", "", ""))
            rows.append(Cell4(tail, "" if missing_cur else cur, mv_cell, na_cell))
        else:
            qty = ""
            if cfg.name == "keyword_scan_en" or (
                cfg.name == "gap_split_en" and rng.random() < 0.4
            ):
                qty = f"{rng.randrange(1, 99_999):,}"
            rows.append(
                Cell4(name_cell, "" if missing_cur else cur, mv_cell, na_cell, qty)
            )

    # P9 per-page reset fixture: repeat an earlier country near the tail,
    # followed by a real holding.  When the repeat lands on a LATER page
    # it is dropped again (aviva's per-table list reset); on the SAME page
    # it survives and fuses into the next holding's name — both paths are
    # exercised across seeds, and the oracle's page mapping decides which.
    if frag_ok and first_country is not None and rng.random() < 0.6:
        rows.append(Cell4(first_country, "", "", ""))
        extra = _mk_name(rng, name_width - 14)
        c2 = rng.randrange(10_000, mv_max)
        rows.append(
            Cell4(
                extra,
                rng.choice(CURRENCIES[:8]),
                fmt_number(c2, cfg.number_locale, paren_neg=True),
                fmt_number(rng.randrange(1, 9_999), cfg.number_locale, False)
                + "%",
            )
        )

    # keep-list anchor rows: values present, currency empty -> P3 keeps them
    # via the anchor list, W1 ffill supplies the currency
    # (crelan/parser.py:121-125 + :782-784)
    for kl in cfg.keep_list[:2]:
        kc = rng.randrange(1_000, min(5_000_000, mv_max))
        rows.append(
            Cell4(
                kl,
                "",
                fmt_number(kc, cfg.number_locale, paren_neg=True),
                fmt_number(rng.randrange(1, 999), cfg.number_locale, False) + "%",
            )
        )

    # mid-table column-header repeat (P3 exercise)
    hdr = _header_cells(cfg)
    rows.insert(rng.randrange(2, len(rows)), hdr)

    # P7 junk total row
    tot = fmt_number(rng.randrange(mv_max // 10, mv_max), cfg.number_locale, False)
    rows.append(Cell4("Total portefeuille", rng.choice(CURRENCIES[:4]), tot, ""))

    # P12 summary row: net assets == 100.00
    hundred = "100,00%" if cfg.number_locale == "fr" else "100.00%"
    rows.append(Cell4("Actif net", "", tot, hundred))
    return rows


def _header_cells(cfg: ArchetypeConfig) -> Cell4:
    if cfg.number_locale == "fr":
        return Cell4("Libellé", "Devise", "Valeur", "% Actif")
    return Cell4("Holding", "Ccy", "Market Value", "%NAV")


# ---------------------------------------------------------------------------
# page rendering
# ---------------------------------------------------------------------------


def _pad(s: str, w: int) -> str:
    return s[:w].ljust(w)


def _render_grid_line(r: Cell4, grid: tuple[int, ...], qty_in_name: bool) -> str:
    widths = [grid[i + 1] - grid[i] for i in range(len(grid) - 1)]
    name = f"{r.qty} {r.name}" if (qty_in_name and r.qty) else r.name
    cells = [name, r.cur, r.mv, r.na]
    line = ""
    for c, w in zip(cells[:-1], widths):
        line += _pad(c, w)
    line += cells[-1]
    return line.rstrip()


def _render_gap_line(r: Cell4) -> str:
    toks = [r.name, r.cur, r.mv, r.na]
    if r.qty:
        toks = [r.qty, *toks]
    return "  ".join(toks)


def _render_doc(doc: Doc, cfg: ArchetypeConfig, rng: random.Random) -> str:
    pages: list[str] = []
    provider = PROVIDER_OF[cfg.name]

    def filler(n: int) -> list[str]:
        return [
            "\n".join(
                " ".join(rng.choice(_WORDS).lower() for _ in range(8))
                for _ in range(rng.randint(3, 6))
            )
            for _ in range(n)
        ]

    # page 0: classification marker (D2)
    title = {
        "toc_grid_fr": f"RAPPORT ANNUEL {provider}",
        "toc_rename_fr": f"RAPPORT ANNUEL CONSOLIDE {provider}",
        "header_grid_fr": f"ETATS FINANCIERS {provider}",
        "keyword_scan_en": f"ANNUAL REPORT {provider}",
        "keyword_scan_en_t2": f"SEMI-ANNUAL REPORT {provider}",
        # NO recognizable marker on purpose — only the family fallback
        # (manifest token) can dispatch these
        "keyword_scan_en_t3": f"FUND FACTS {provider}",
        "reverse_scan_fr": f"RAPPORT ANNUEL REVISE {provider}",
        "gap_split_en": f"INTERIM REPORT {provider}",
        "fragment_fusion_en": f"AUDITED ANNUAL REPORT {provider}",
        "two_up_fr": f"RAPPORT DE GESTION {provider}",
        # deliberately AMBIGUOUS page-0: matches toc_grid_fr's classify
        # regex — only the D1 manifest route (METROPOLITAN) can dispatch
        # these documents correctly (crelan/parser.py:736-763)
        "manifest_grid_fr": f"RAPPORT ANNUEL {provider}",
    }[cfg.name]
    pages.append(title + "\n" + filler(1)[0])

    if cfg.has_toc:
        # ToC page + per-fund sections; ToC pg values are 0-based page_no
        section_pages: list[str] = []
        toc_lines = ["SOMMAIRE"]
        pg = 2  # pages 0,1 are title+ToC
        for f in doc.funds:
            if f.toc_wrap:
                # W5 fixture (tobam:88-94): the entry wraps onto two lines,
                # page number on the second — repair grafts it onto line 1
                # and consumes line 2
                words = f.title.split()
                toc_lines.append(_pad(" ".join(words[:2]), 60).rstrip())
                toc_lines.append(_pad(" ".join(words[2:]), 60) + str(pg))
            else:
                toc_lines.append(_pad(f.title, 60) + str(pg))
            body = [
                "Composition des actifs au 31.12.2025",
                _render_grid_line(_header_cells(cfg), cfg.grid, False),
            ]
            per_page = 8
            lines = [_render_grid_line(r, cfg.grid, False) for r in f.rows]
            chunks = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]
            for ci, chunk in enumerate(chunks):
                head = (
                    body
                    if ci == 0
                    else ["Composition des actifs au 31.12.2025 (suite)"]
                )
                section_pages.append("\n".join(head + chunk))
            pg += len(chunks)
        toc_lines.append(_pad("INFORMATIONS COMPLEMENTAIRES", 60) + str(pg))
        pages.append("\n".join(toc_lines))
        pages.extend(section_pages)
        pages.extend(filler(1))  # the page INFORMATIONS points at
        return "\f".join(pages)

    if cfg.tail_pages is not None:
        pages.extend(filler(rng.randint(2, 4)))  # leading filler to skip

    for f in doc.funds:
        hdr_txt = {
            "keyword_scan_en": f"SCHEDULE OF INVESTMENTS - {f.title}",
            "keyword_scan_en_t2": f"INVESTMENT PORTFOLIO - {f.title}",
            "keyword_scan_en_t3": f"HOLDINGS AS OF - {f.title}",
            "header_grid_fr": f"ETAT DU PATRIMOINE - {f.title}",
            "reverse_scan_fr": (
                f"INVENTAIRE DETAILLE DES INSTRUMENTS FINANCIERS - {f.title}"
            ),
            "gap_split_en": f"PORTFOLIO STATEMENT - {f.title}",
            "fragment_fusion_en": f"STATEMENT OF INVESTMENTS - {f.title}",
            "two_up_fr": f"INVENTAIRE - {f.title}",
            "manifest_grid_fr": f"COMPOSITION DU PORTEFEUILLE - {f.title}",
        }[cfg.name]
        if cfg.name == "gap_split_en":
            lines = ["  ".join(["Holding", "Ccy", "Market Value", "%NAV"])]
            lines += [_render_gap_line(r) for r in f.rows]
        elif cfg.name == "header_grid_fr":
            # D3: one layout generation per document, chosen deterministically
            vi = doc.idx % 2
            if vi == 0:
                lines = [
                    _pad("Désignation des valeurs", 34) + _pad("Devise", 8)
                    + _pad("Qté Nbreou", 10) + _pad("Valeur", 18) + "% Actif"
                ]
                for r in f.rows:
                    qty = str(rng.randrange(1, 99999))
                    lines.append(
                        (_pad(r.name, 34) + _pad(r.cur, 8) + _pad(qty, 10)
                         + _pad(r.mv, 18) + r.na).rstrip()
                    )
            else:
                lines = [
                    _pad("Désignation des valeurs", 30) + _pad("Quantité", 8)
                    + _pad("Cours", 8) + _pad("Devise", 8)
                    + _pad("Valeur", 18) + "% Actif"
                ]
                for r in f.rows:
                    qty = str(rng.randrange(1, 9999))
                    cours = fmt_number(rng.randrange(100, 99999), "fr", False)
                    lines.append(
                        (_pad(r.name, 30) + _pad(qty, 8) + _pad(cours, 8)
                         + _pad(r.cur, 8) + _pad(r.mv, 18) + r.na).rstrip()
                    )
        elif cfg.name == "two_up_fr":
            rows = [_render_grid_line(r, cfg.grid, False) for r in f.rows]
            half = (len(rows) + 1) // 2
            left, right = rows[:half], rows[half:]
            lines = []
            for i in range(half):
                l = left[i] if i < len(left) else ""
                rgt = right[i] if i < len(right) else ""
                lines.append(_pad(l, TWO_UP_SPLIT) + rgt if rgt else l)
        else:
            lines = [_render_grid_line(_header_cells(cfg), cfg.grid, False)]
            lines += [
                _render_grid_line(r, cfg.grid, cfg.name == "keyword_scan_en")
                for r in f.rows
            ]
        per_page = 60 if cfg.name == "two_up_fr" else 12
        chunks = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]
        for chunk in chunks:
            pages.append("\n".join([hdr_txt, *chunk]))

    if cfg.tail_pages is None and cfg.name != "reverse_scan_fr":
        pages.extend(filler(1))
    return "\f".join(pages)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _gen_doc(i: int, seed: int, classes: list[str] | None = None):
    """Generate one document's (page_row, manifest_rows, expected_rows).

    Pure function of (seed, i) — make_corpus and make_corpus_parallel
    produce identical corpora.  ``classes`` pins the archetype rotation
    (bench.py keeps the round-2 7-class mix so docs/sec stays comparable
    across rounds; tests default to all of DISPATCH_ORDER)."""
    page_rows, manifest_rows, expected_rows = [], [], []
    t0 = datetime(2025, 12, 31, 0, 0, 0)

    if True:
        rng = random.Random(f"{seed}:{i}")
        rotation = classes or DISPATCH_ORDER
        doc_class = rotation[i % len(rotation)]
        cfg = ARCHETYPES[doc_class]
        provider = PROVIDER_OF[doc_class]
        # deliberate host skew: ~30% of docs on one hot host (FIXTURES.md §1)
        host = "hot.example.com" if i % 10 < 3 else f"host{i % 17}.example.org"
        url = f"https://{host}/reports/{provider.lower()}/{i}.pdf"
        doc = Doc(
            idx=i,
            url=url,
            warc_ts=t0 + timedelta(seconds=37 * i),
            doc_class=doc_class,
            lang=cfg.lang,
        )
        # every ~10th ToC doc prints its tables at the ALTERNATE grid
        # offsets, exercising the A3 slice-quality retry
        alt_grid = doc_class == "toc_grid_fr" and i % 10 == 3

        n_funds = rng.randint(1, 3 if doc_class == "toc_grid_fr" else 2)
        words = rng.sample(_WORDS, k=n_funds)
        name_width = (cfg.grid[1] - 2) if cfg.grid else 36
        if doc_class == "two_up_fr":
            name_width = cfg.grid[1] - 1
        elif doc_class == "keyword_scan_en":
            # leave room for the leading qty token ("99,999 ") in the cell
            name_width = cfg.grid[1] - 9
        elif doc_class == "header_grid_fr":
            name_width = 28  # fits both variant grids (30/34 name slots)
        for k in range(n_funds):
            title = f"{provider} {words[k]} FUND {k + 1}"
            web_title = title
            if doc_class == "toc_rename_fr" and k == 0:
                # roth fixture: the ToC says EUROPE, the website says
                # EURO — only the rename-retry join can match them; the
                # output must keep the website's EURO spelling
                title = f"{provider} EUROPE {words[k]} FUND {k + 1}"
                web_title = f"{provider} EURO {words[k]} FUND {k + 1}"
            fund = Fund(title=title)
            # every 4th toc doc wraps its first fund's ToC entry (W5)
            fund.toc_wrap = (
                doc_class == "toc_grid_fr" and k == 0 and i % 4 == 1
            )
            fund.rows = _build_fund_rows(rng, cfg, name_width)
            # manifest share classes: most funds 1 (Cap); some 2 (Cap+Dis,
            # exercising the J4 fan-back); every 11th doc's funds beyond the
            # first have NO manifest row (left-join null path)
            if not (i % 11 == 7 and k >= 1):
                share_cls = ["Cap"] + (["Dis"] if rng.random() < 0.25 else [])
                # D1 route token: the reference's "Metropolitan Rentastro"
                # website substring (crelan/parser.py:754) — the ONLY
                # signal that identifies a manifest_grid_fr document
                prefix = (
                    "METROPOLITAN " if doc_class == "manifest_grid_fr" else ""
                )
                for cls in share_cls:
                    fund.manifest.append(
                        (f"{prefix}{web_title} - {cls}", _mk_isin(rng))
                    )
            doc.funds.append(fund)

        render_cfg = cfg
        if alt_grid:
            from dataclasses import replace as _dc_replace

            render_cfg = _dc_replace(cfg, grid=cfg.retry_grid)
        doc.text = _render_doc(doc, render_cfg, rng)
        page_rows.append(
            {
                "url": url,
                "warc_ts": doc.warc_ts,
                "html": doc.text.encode("utf-8"),
                "text": doc.text,
                "lang": doc.lang,
            }
        )
        for fund in doc.funds:
            for website, isin in fund.manifest:
                manifest_rows.append(
                    {"name": website, "pdf_url": url, "isin": isin}
                )
            cleaned = simulate_cleanup(fund.rows, cfg)
            targets = fund.manifest or [(None, None)]
            for website, isin in targets:
                for name, mv, cur, na in cleaned:
                    expected_rows.append(
                        {
                            "fund_provider": provider,
                            "fund_name_report": report_name(fund, cfg),
                            "fund_name_website": website,
                            "isin": isin,
                            "holding_name": name,
                            "market_value": mv,
                            "currency": cur,
                            "net_assets": na,
                            "pdf_url": url,
                        }
                    )
        # P10 sentinel manifest rows
        if i % 13 == 5:
            manifest_rows.append(
                {"name": "ghost fund", "pdf_url": "nan", "isin": None}
            )
            manifest_rows.append(
                {
                    "name": "ghost fund 2",
                    "pdf_url": "annual_report_does_not_exists",
                    "isin": None,
                }
            )

    return page_rows[0], manifest_rows, expected_rows


def _gen_range(args):
    lo, hi, seed, *rest = args
    classes = rest[0] if rest else None
    pages, manifest, expected = [], [], []
    for i in range(lo, hi):
        p, m, e = _gen_doc(i, seed, classes)
        pages.append(p)
        manifest.extend(m)
        expected.extend(e)
    return pages, manifest, expected


def make_corpus(
    n_docs: int, seed: int = 42, classes: list[str] | None = None
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Build (pages, manifest, expected) pandas frames deterministically."""
    pages, manifest, expected = _gen_range((0, n_docs, seed, classes))
    return (
        pd.DataFrame(pages),
        pd.DataFrame(manifest),
        pd.DataFrame(expected),
    )


def make_corpus_parallel(
    n_docs: int,
    seed: int = 42,
    workers: int = 16,
    classes: list[str] | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Multiprocess corpus generation — identical output to make_corpus
    (per-doc determinism), used by the bench for large corpora."""
    from concurrent.futures import ProcessPoolExecutor

    step = max(1, n_docs // workers)
    chunks = [
        (lo, min(lo + step, n_docs), seed, classes)
        for lo in range(0, n_docs, step)
    ]
    pages, manifest, expected = [], [], []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for p, m, e in ex.map(_gen_range, chunks):
            pages.extend(p)
            manifest.extend(m)
            expected.extend(e)
    return (
        pd.DataFrame(pages),
        pd.DataFrame(manifest),
        pd.DataFrame(expected),
    )


def pages_to_spark(spark, pages_pdf: pd.DataFrame):
    """pandas pages -> Spark DataFrame with the input_hint schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(pages_pdf, schema=schema)


def manifest_to_spark(spark, manifest_pdf: pd.DataFrame):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("pdf_url", T.StringType()),
            T.StructField("isin", T.StringType()),
        ]
    )
    return spark.createDataFrame(manifest_pdf, schema=schema)
