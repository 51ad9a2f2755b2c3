"""Provider / archetype configuration — DATA, not code branches.

The reference encodes per-provider knowledge (tabula column x-coordinates,
keyword anchors, keep-lists, currency whitelists, fund-name rewrites) inside
19 separate scripts.  Here it is one table of configs consumed by the single
dispatch + extraction pipeline (SURVEY.md §7 design stance).

Citations (reference, /root/reference/src/...):
  - currency whitelist file:      crelan/currencies.txt, crelan/parser.py:21-24
  - keep-list keyword anchors:    crelan/parser.py:121-125 (to_keep),
                                  amundi/parser.py:73-79, oddo/parser.py:110-116
  - fixed column grids:           crelan/parser.py:96-103 (columns=[...] pts),
                                  banque/parser.py:83-121 (two grids by header)
  - whitespace-gap splitting:     four/parser.py:196-218
  - country heading rows:         aviva/parser.py:23-33, 276-284
  - header regex dispatch:        banque/parser.py:48-80; oddo/parser.py:427-435
"""

from __future__ import annotations

from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Reference data (broadcast-side lists)
# ---------------------------------------------------------------------------

# Space-separated one-line whitelist in the reference (crelan/currencies.txt);
# we keep it as a Python list → broadcast literal / isin().
CURRENCIES: list[str] = [
    "EUR", "USD", "GBP", "CHF", "JPY", "SEK", "NOK", "DKK", "CAD", "AUD",
    "HKD", "SGD", "PLN", "CZK", "HUF", "CNH", "NZD", "ZAR",
]

# Country heading rows dropped from holdings tables (aviva/parser.py:23-33).
COUNTRIES: list[str] = [
    "France", "Germany", "Belgium", "Netherlands", "Spain", "Italy",
    "United States", "Japan", "Switzerland", "United Kingdom", "Ireland",
    "Luxembourg", "Portugal", "Austria", "Denmark", "Sweden", "Norway",
    "Finland", "Canada", "Australia",
]

# Rows kept even with a non-whitelisted/empty currency cell
# (crelan/parser.py:121-125, 739-742 to_keep; amundi/parser.py:73-79).
KEEP_LIST: list[str] = [
    "CREANCES ET DETTES DIVERSES", "AUTRES",
    "Créances", "Dettes", "Comptes financiers",
    "Cash at bank", "Other assets and liabilities",
    "Te ontvangen interesten", "Te betalen kosten",
]

# Junk-row markers (P7 — aviva/parser.py:168-180, capitalatwork:275-289).
JUNK_MARKERS: list[str] = [
    "Total", "TOTAL", "transferable securities", "VALEURS MOBILIERES",
    "____", "----",
]

# Sentinel manifest URLs to discard (P10 — aviva/parser.py:553-564).
URL_SENTINELS: list[str] = ["nan", "annual_report_does_not_exists", ""]

# ---------------------------------------------------------------------------
# Archetype configs (the generalized 19 parsers)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ArchetypeConfig:
    """One document-layout family = one dispatch target.

    grid: character offsets where columns start, replacing tabula's
          x-coordinate ``columns=[...]`` (crelan/parser.py:96-103).  A grid
          of k offsets yields k cells: [o0:o1], [o1:o2], ..., [ok-1:].
          None → whitespace-gap splitting (four/parser.py:196-218).
    """

    name: str
    lang: str
    # regex on page-0 text that classifies the document (D2,
    # oddo/parser.py:427-435 style)
    classify_regex: str
    # regex identifying a holdings-table page (S4 keyword pre-filter,
    # aviva/parser.py:70-75)
    section_regex: str
    # char-offset column grid; None = gap split
    grid: tuple[int, ...] | None
    # expected cell count after slicing/splitting (P11 shape filter)
    shapes: tuple[int, ...] = (4,)
    # ToC-driven page intervals (crelan) vs header meta rows (scor/amundi)
    has_toc: bool = False
    toc_page_limit: int = 5          # ToC searched in first N pages
    # bounded reverse scan: section only in last N pages (varenna:70-74)
    tail_pages: int | None = None
    # regex extracting the fund name from a section-header page (F17,
    # scor/parser.py:111-114)
    fund_regex: str | None = None
    # numeric locale: 'fr' => 1.234,56 ; 'en' => 1,234.56 (F1/F2);
    # 'auto' => content-inferred per cell (F3, mirova/parser.py:213-218:
    # both '.' and ',' present -> ',' is thousands, else ',' is decimal)
    number_locale: str = "fr"
    keep_list: tuple[str, ...] = ()
    # alternate grid used by the threshold-retry (A3, crelan/parser.py:132-135)
    retry_grid: tuple[int, ...] | None = None
    # D3 header-regex grid variants (banque/parser.py:48-121): per-PAGE
    # choice of (header_regex, grid offsets, payload cell indices to keep)
    variants: tuple[tuple[str, tuple[int, ...], tuple[int, ...]], ...] | None = None
    # F16 fund-name rewrites applied to fund_name_report, in order
    # (regex, replacement) — the reference's provider-specific prefix
    # removals (roth/parser.py:191 "EdR Fund"; bnp/parser.py:69-77;
    # crelan/parser.py:711-717)
    name_rewrites: tuple[tuple[str, str], ...] = ()
    # A1 currency mode-imputation for unfillable leading rows
    # (amundi/parser.py:104-110: missing currency falls back to the
    # table's most-frequent currency when W1 ffill has no seed)
    impute_currency_mode: bool = False
    # F10 charset purge + F11 multi-% truncation in the name cleanup
    # (aviva/parser.py:673-680; capitalatwork:345-359 — always co-occur)
    deep_name_clean: bool = False
    # crelan hard clean() (crelan/parser.py:644-656): three sequential
    # per-character passes over the holding name (lowercase purge,
    # conditional '%' removal, post-digit letter removal, digit-space
    # collapse) — the bond-code normalization family
    hard_name_clean: bool = False
    # D1 manifest-name routing (crelan/parser.py:736-763): the reference
    # dispatches on the MANIFEST's website name substring, not page
    # content; a non-None regex routes any document whose manifest names
    # match it to this archetype, taking priority over page-0 dispatch
    manifest_route_regex: str | None = None
    # D2 family fallback (oddo/parser.py:427-435 ELSE branch): oddo's
    # page-0 dispatch has a catch-all type — documents of the provider
    # whose first page matches NO marker still parse, with type 3.  A
    # non-None regex here routes a document to this archetype when its
    # manifest names match AND the page-0 when-chain matched nothing
    # (page-0 and explicit manifest routes take priority) — the
    # provider-scoped default the reference's per-provider scripts get
    # for free from their file layout.
    manifest_fallback_regex: str | None = None
    # D5 token-rename retry (roth/parser.py:418-427): when the report
    # name fails to match the manifest website name, retry with these
    # (old, new) lowercase token renames applied to the website side —
    # the reference's "Euro"->"Europe" rename-and-recurse; the output
    # keeps the website's ORIGINAL spelling (it restores the name after
    # the retry, roth/parser.py:428)
    name_rename_retry: tuple[tuple[str, str], ...] = ()


ARCHETYPES: dict[str, ArchetypeConfig] = {
    # crelan/bnp/pictet family: ToC page intervals + fixed FR grid
    # (crelan/parser.py:41-103)
    "toc_grid_fr": ArchetypeConfig(
        name="toc_grid_fr",
        lang="fr",
        classify_regex=r"^RAPPORT ANNUEL",
        section_regex=r"Composition des actifs au",
        grid=(0, 40, 48, 66),
        shapes=(4,),
        has_toc=True,
        fund_regex=None,
        number_locale="fr",
        keep_list=("CREANCES ET DETTES DIVERSES", "AUTRES"),
        # A3 alternate grid: some crelan-family reports shift the table
        # right; the slice-quality retry re-cuts with these offsets
        # (crelan/parser.py:132-135 second columns=[...] list)
        retry_grid=(0, 46, 54, 72),
    ),
    # scor/mirova family: keyword header pages, EN numerals, fund name on
    # the header line (scor/parser.py:31-37, 111-114)
    "keyword_scan_en": ArchetypeConfig(
        name="keyword_scan_en",
        lang="en",
        classify_regex=r"^ANNUAL REPORT",
        section_regex=r"SCHEDULE OF INVESTMENTS",
        grid=(0, 42, 50, 68),
        shapes=(4,),
        has_toc=False,
        fund_regex=r"SCHEDULE OF INVESTMENTS - (.+?) *$",
        # mirova family: locale inferred from cell content (F3)
        number_locale="auto",
        # roth/parser.py:191-style brand-prefix strip ("EdR Fund ...")
        name_rewrites=((r"^PROVIDER_KEYWORD_EN\s+", ""),),
    ),
    # varenna/carmignac family: inventory section only near document tail
    # (varenna/parser.py:70-74; carmignac_fr/parser.py:119-135)
    "reverse_scan_fr": ArchetypeConfig(
        name="reverse_scan_fr",
        lang="fr",
        classify_regex=r"^RAPPORT ANNUEL REVISE",
        section_regex=r"INVENTAIRE DETAILLE DES INSTRUMENTS FINANCIERS",
        grid=(0, 40, 48, 66),
        shapes=(4,),
        has_toc=False,
        tail_pages=15,
        fund_regex=r"INVENTAIRE DETAILLE DES INSTRUMENTS FINANCIERS - (.+?) *$",
        number_locale="fr",
        keep_list=("Créances", "Dettes", "Comptes financiers"),
    ),
    # four family: no geometry, columns split on runs of >=2 spaces
    # (four/parser.py:196-218); token count drives shape dispatch (D4)
    "gap_split_en": ArchetypeConfig(
        name="gap_split_en",
        lang="en",
        classify_regex=r"^INTERIM REPORT",
        section_regex=r"PORTFOLIO STATEMENT",
        grid=None,
        shapes=(4, 5),
        has_toc=False,
        fund_regex=r"PORTFOLIO STATEMENT - (.+?) *$",
        number_locale="en",
    ),
    # aviva/capitalatwork family: names fragmented over 2-3 rows, values on
    # the last fragment; country heading rows interleaved
    # (aviva/parser.py:183-199, 276-284)
    "fragment_fusion_en": ArchetypeConfig(
        name="fragment_fusion_en",
        lang="en",
        classify_regex=r"^AUDITED ANNUAL REPORT",
        section_regex=r"STATEMENT OF INVESTMENTS",
        grid=(0, 42, 50, 68),
        shapes=(4,),
        has_toc=False,
        fund_regex=r"STATEMENT OF INVESTMENTS - (.+?) *$",
        number_locale="en",
        deep_name_clean=True,  # aviva F10+F11 final name cleanup
    ),
    # banque family: two layout generations distinguished by the column
    # header on each table page; each has its own grid and its own
    # positional filler columns to drop (banque/parser.py:48-121)
    "header_grid_fr": ArchetypeConfig(
        name="header_grid_fr",
        lang="fr",
        classify_regex=r"^ETATS FINANCIERS",
        section_regex=r"ETAT DU PATRIMOINE",
        grid=None,
        shapes=(4,),
        has_toc=False,
        tail_pages=15,
        fund_regex=r"ETAT DU PATRIMOINE - (.+?) *$",
        number_locale="fr",
        variants=(
            # typ 1: name, currency, qty(drop), mv, na
            # (banque columns=[339,366,436,514] -> 5 slots, drop _1)
            (r"Désignation.*Devise.*Qté", (0, 34, 42, 52, 70), (0, 1, 3, 4)),
            # typ 2: name, qty(drop), cours(drop), currency, mv, na
            # (banque columns=[308,369,421,448,516,560] -> 7 slots)
            (
                r"Désignation.*Quantité.*Cours.*Devise",
                (0, 30, 38, 46, 54, 72),
                (0, 3, 4, 5),
            ),
        ),
    ),
    # mandarin/bnp/amundi two-up family: each physical line carries a left
    # and a right half-table (mandarin/parser.py:102-114)
    "two_up_fr": ArchetypeConfig(
        name="two_up_fr",
        lang="fr",
        classify_regex=r"^RAPPORT DE GESTION",
        section_regex=r"INVENTAIRE - ",
        grid=(0, 22, 28, 38),       # applied per half after the mid split
        shapes=(4,),
        has_toc=False,
        fund_regex=r"INVENTAIRE - (.+?) *$",
        number_locale="fr",
        # bnp/parser.py:69-77-style brand-prefix strip
        name_rewrites=((r"^PROVIDER_TWO_UP_FR\s+", ""),),
        # amundi/parser.py:104-110: leading rows with no currency seed take
        # the fund's most-frequent currency instead of being dropped
        impute_currency_mode=True,
    ),
    # oddo/scor/mirova family SECOND page-0 type (oddo/parser.py:427-435
    # routes one provider's documents into 4 per-type parsers): same
    # provider as keyword_scan_en, different page-0 marker, section
    # keyword, grid offsets — the within-provider type-family mechanic
    "keyword_scan_en_t2": ArchetypeConfig(
        name="keyword_scan_en_t2",
        lang="en",
        classify_regex=r"^SEMI-ANNUAL REPORT",
        section_regex=r"INVESTMENT PORTFOLIO",
        grid=(0, 45, 53, 71),
        shapes=(4,),
        has_toc=False,
        fund_regex=r"INVESTMENT PORTFOLIO - (.+?) *$",
        number_locale="en",
        name_rewrites=((r"^PROVIDER_KEYWORD_EN\s+", ""),),
    ),
    # oddo family THIRD type (oddo/parser.py:427-435 ELSE branch): same
    # provider as keyword_scan_en/_t2, but these documents' first page
    # carries NO recognizable marker — the reference still parses them
    # via its catch-all type 3.  Routed by the family fallback: manifest
    # names carry the provider token and page-0 matched nothing.
    "keyword_scan_en_t3": ArchetypeConfig(
        name="keyword_scan_en_t3",
        lang="en",
        classify_regex=r"(?!x)x",  # page-0 cannot identify these
        section_regex=r"HOLDINGS AS OF",
        grid=(0, 44, 52, 70),
        shapes=(4,),
        has_toc=False,
        fund_regex=r"HOLDINGS AS OF - (.+?) *$",
        number_locale="en",
        name_rewrites=((r"^PROVIDER_KEYWORD_EN\s+", ""),),
        manifest_fallback_regex="PROVIDER_KEYWORD_EN",
    ),
    # roth family (roth/parser.py:395-445): ToC page intervals like the
    # crelan family, but the manifest website name may spell "Euro"
    # where the ToC says "Europe" — the reference retries its ToC match
    # once with the token renamed (and restores the original spelling
    # in the output).  Our relational form: the manifest-join residual
    # gets a rename-retry alternative for this archetype
    # (operators/joins.py::join_manifest).
    "toc_rename_fr": ArchetypeConfig(
        name="toc_rename_fr",
        lang="fr",
        classify_regex=r"^RAPPORT ANNUEL CONSOLIDE",
        section_regex=r"Composition des actifs au",
        grid=(0, 40, 48, 66),
        shapes=(4,),
        has_toc=True,
        fund_regex=None,
        number_locale="fr",
        keep_list=("CREANCES ET DETTES DIVERSES", "AUTRES"),
        name_rename_retry=(("euro ", "europe "),),
    ),
    # crelan hard-clean family (crelan/parser.py:644-656, 736-763): the
    # page-0 title is the AMBIGUOUS "RAPPORT ANNUEL ..." (classify_regex
    # never fires — page-0 dispatch alone would misroute these documents
    # to toc_grid_fr and extract nothing); routing comes from the
    # manifest name containing the METROPOLITAN token, exactly the
    # reference's website-substring dispatch.  Holding names are
    # bond-code shaped and go through the hard clean() chain.
    "manifest_grid_fr": ArchetypeConfig(
        name="manifest_grid_fr",
        lang="fr",
        classify_regex=r"(?!x)x",  # page-0 content cannot identify these
        section_regex=r"COMPOSITION DU PORTEFEUILLE",
        grid=(0, 40, 48, 66),
        shapes=(4,),
        has_toc=False,
        fund_regex=r"COMPOSITION DU PORTEFEUILLE - (.+?) *$",
        number_locale="fr",
        keep_list=("Te ontvangen interesten", "Te betalen kosten"),
        hard_name_clean=True,
        manifest_route_regex="METROPOLITAN",
    ),
}

# Classification order matters (first match wins) — keep deterministic.
DISPATCH_ORDER: list[str] = [
    # longest/most-specific markers first: several are superstrings of
    # shorter ones (anchored regexes make this robust either way)
    "reverse_scan_fr",
    "fragment_fusion_en",
    "toc_rename_fr",   # ^RAPPORT ANNUEL CONSOLIDE before ^RAPPORT ANNUEL
    "toc_grid_fr",
    "keyword_scan_en_t2",
    "keyword_scan_en",
    "gap_split_en",
    "two_up_fr",
    "header_grid_fr",
    "manifest_grid_fr",
    "keyword_scan_en_t3",  # family fallback only — classify never fires
]

TWO_UP_SPLIT = 80  # char offset separating left/right halves (two_up_fr)

# Final 9-column output contract (reference README.md:25-35).
OUTPUT_COLUMNS: list[str] = [
    "fund_provider",
    "fund_name_report",
    "fund_name_website",
    "isin",
    "holding_name",
    "market_value",
    "currency",
    "net_assets",
    "pdf_url",
]
