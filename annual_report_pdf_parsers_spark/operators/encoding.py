"""Encoding repair for web-text corpora — fixed-order repair of the
classic UTF-8-bytes-decoded-as-Windows-1252 mojibake sequences
("â€™" for a right quote, "Ã©" for é; public knowledge: ftfy, Speer
2019 "ftfy: fixes text for you", and the equivalent pass every
CommonCrawl curation pipeline runs before language ID).

The pair table is DERIVED, not hand-typed: for each curated target
character, the pattern is its UTF-8 byte sequence decoded with SLOPPY
windows-1252 (cp1252 with the five unmapped bytes falling back to
their Latin-1 control chars — ftfy's sloppy-windows-1252, which is
what real-world mojibake looks like; the right-double-quote pattern
really does contain U+009D).  Both the engine and the DuckDB oracle
iterate THIS list in THIS order — one site to edit.

Semantics: ONE fixed-order pass, no recursion — double-mojibake
(UTF-8 mis-decoded twice) is left partially repaired, identically in
both engines.  The order is punctuation (3-byte patterns, leading â)
before accents/symbols (2-byte, leading Ã/Â): an accent repair can
mint a fresh 'â' and no later pattern starts with it.  The chain IS
order-dependent on already-corrupt partial sequences (a repaired '“'
can complete a later 'â€“' match — cp1252 maps 0x93 to '“', so that
char is genuinely part of the en-dash pattern); the oracle iterates
the same list in the same order, so the result is deterministic and
cross-engine identical either way.  All matching is plain substring
replace (the url_quality length-trick counts) — no regex, no
escaping hazards.

100 TB shape: narrow per-row projection — one bounded replace chain
in whole-stage codegen directly above the scan; no shuffle, no UDF.
Each stage is a pin()-ned named cell (the scrub_pii pattern:
CollapseProject would otherwise re-inline the whole chain into every
count reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import pin


def _sloppy_cp1252(bs: bytes) -> str:
    """Decode bytes as windows-1252 with the five unmapped bytes
    (0x81 0x8D 0x8F 0x90 0x9D) falling back to their Latin-1 control
    chars — ftfy's sloppy-windows-1252."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# curated repair targets, in APPLICATION order: 3-byte punctuation
# first, then 2-byte accents and symbols (see module doc for why the
# order makes the single pass confluent).
MOJIBAKE_TARGETS = (
    "’‘“”–—…€•™"
    "éèêëáàâäç"
    "íîïñóôöúûü"
    "«»°·½©® "
)
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    (_sloppy_cp1252(c.encode("utf-8")), c) for c in MOJIBAKE_TARGETS
]


def fix_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair mojibake in ``text_col`` and count the repairs.

    Replaces ``text_col`` with the repaired text and adds ``n_fixes``
    (LONG — total replaced occurrences, each pair counted on that
    pass's INPUT, the scrub_pii convention) and ``had_mojibake``.
    NULL text behaves as '' (the html-operator convention).
    """
    clash = sorted(
        {f"_mj_{i}" for i in range(len(MOJIBAKE_PAIRS) + 1)}
        & set(df.columns)
    )
    if clash:
        raise ValueError(f"fix_mojibake staging columns clash: {clash}")
    out = df.withColumn(
        "_mj_0", pin(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    )
    counts = []
    prev = F.col("_mj_0")
    for i, (pat, rep) in enumerate(MOJIBAKE_PAIRS, start=1):
        counts.append(
            (
                (
                    F.length(prev)
                    - F.length(F.replace(prev, F.lit(pat), F.lit("")))
                )
                / F.lit(len(pat))
            ).cast("long")
        )
        out = out.withColumn(
            f"_mj_{i}",
            pin(F.replace(prev, F.lit(pat), F.lit(rep))),
        )
        prev = F.col(f"_mj_{i}")
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    out = (
        out.withColumn("n_fixes", total)
        .withColumn("had_mojibake", F.col("n_fixes") > F.lit(0))
        .withColumn(text_col, prev)
    )
    return out.drop(
        *[f"_mj_{i}" for i in range(len(MOJIBAKE_PAIRS) + 1)]
    )


# de-hyphenation passes, in APPLICATION order (module-level one-site
# constants: the oracle restates exactly these)
SOFT_HYPHEN = "­"
# letter '-' newline letter — lowercase ONLY on both sides: list-item
# dashes (" - item"), uppercase compounds ("A-\nB") and numeric ranges
# ("3-\n4") are NOT wrap artifacts and must survive
DEHYPHEN_JOIN_RE = "([a-z])-\\n([a-z])"
TRAIL_WS_RE = "[ \\t]+\\n"


def dehyphenate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repair PDF/OCR text-extraction wrap artifacts — the webtext
    twin of the reference's numeric de-noising (its extracted columns
    never carry wraps because tabula re-flows cells; free text does).
    Three fixed-order passes, each counted on its own INPUT:

    1. soft hyphens (U+00AD) removed outright — including at line
       breaks, where removal deliberately leaves the break unjoined
       (a soft hyphen alone is a RENDERING hint, not evidence the
       line was wrapped mid-word);
    2. line-break hyphenation joined: lowercase-letter '-' newline
       lowercase-letter -> the two letters (the wrap artifact proper);
       consecutive wraps ("a-\\nb-\\nc") repair only the FIRST break —
       both engines' regexp scans resume AFTER the match in the
       ORIGINAL string, so the behavior is deterministic and
       cross-engine identical (unit-pinned);
    3. trailing spaces/tabs before a newline trimmed (n counted in
       CHARS removed, honest naming — match counts would hide width).

    Only regex constructs identical in Java + RE2 are used (character
    classes, groups); replacement backreferences differ by SYNTAX only
    ($1 Java / \\1 RE2) — each side states its own.

    100 TB shape: narrow bounded replace chain in whole-stage codegen
    above the scan, pin()-staged per pass (the fix_mojibake pattern);
    no shuffle, no UDF.  NULL text behaves as ''.
    """
    clash = sorted({f"_dh_{i}" for i in range(4)} & set(df.columns))
    if clash:
        raise ValueError(f"dehyphenate staging columns clash: {clash}")
    out = df.withColumn(
        "_dh_0",
        pin(F.coalesce(F.col(text_col).cast("string"), F.lit(""))),
    )
    s0 = F.col("_dh_0")
    n_soft = (
        F.length(s0)
        - F.length(F.replace(s0, F.lit(SOFT_HYPHEN), F.lit("")))
    ).cast("long")
    out = out.withColumn(
        "_dh_1", pin(F.replace(s0, F.lit(SOFT_HYPHEN), F.lit("")))
    )
    s1 = F.col("_dh_1")
    joined = F.regexp_replace(s1, DEHYPHEN_JOIN_RE, "$1$2")
    n_joins = ((F.length(s1) - F.length(joined)) / F.lit(2)).cast(
        "long"
    )
    out = out.withColumn("_dh_2", pin(joined))
    s2 = F.col("_dh_2")
    trimmed = F.regexp_replace(s2, TRAIL_WS_RE, "\n")
    n_trail = (F.length(s2) - F.length(trimmed)).cast("long")
    out = (
        out.withColumn("_dh_3", pin(trimmed))
        .withColumn("n_soft_hyphens", n_soft)
        .withColumn("n_line_joins", n_joins)
        .withColumn("n_trail_ws", n_trail)
        .withColumn("had_hyphenation", n_joins > F.lit(0))
        .withColumn(text_col, F.col("_dh_3"))
    )
    return out.drop(*[f"_dh_{i}" for i in range(4)])
