"""WARC record parsing — the crawl-archive ingestion format (ISO
28500; Common Crawl's storage layout, public knowledge).  The
reference ingests pre-fetched PDFs from a directory manifest
(parsers/run.py's file loop); a web-scale corpus arrives instead as
concatenated WARC records, and THIS is the record-boundary scan that
turns one archive string into relational rows.

Spark-first shape: record boundaries via ONE split on the version
line, posexplode to (rec_no, block), then per-record header regexes
on the already-exploded fragment only (the NOTES gotcha-3 rule: a
regex over the full archive re-scans it per field).  The payload is
the CONTENT-LENGTH-BOUNDED substring after the first blank line —
trailing record separators are never part of the payload, and a
Content-Length shorter than the raw tail truncates exactly like a
real WARC reader's bounded read (both engines cut by the same
integer, unit-pinned).

Header fields are matched as `Name: value-to-CR/LF` with the header
area limited to the text BEFORE the first blank line (a payload that
happens to contain `WARC-Target-URI:` must not leak into the
header); absent AND blank both yield NULL (the html_metadata rule —
regexp_extract cannot tell them apart).

100 TB shape: zero-exchange narrow chain (split + one Generate +
per-fragment regexes in codegen); archives are splittable at record
boundaries in production readers, here each archive string is one
row and parallelism comes from the archive table's own partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import pin

CRLF = "\r\n"
BLANK = CRLF + CRLF
# version line anchor; the literal dot is escaped in both engines
WARC_SPLIT_RE = "WARC/1\\.0"
_TYPE_RE = "WARC-Type: ([^\\r\\n]+)"
_URI_RE = "WARC-Target-URI: ([^\\r\\n]+)"
_DATE_RE = "WARC-Date: ([^\\r\\n]+)"
_CLEN_RE = "Content-Length: ([0-9]+)"


def warc_records(
    df: DataFrame,
    warc_col: str = "warc",
    id_col: str = "doc_id",
    keep_payload: bool = False,
) -> DataFrame:
    """Explode concatenated WARC/1.0 records into one row per record:
    ``(id, rec_no, warc_type, target_uri, warc_date, content_length,
    payload_md5, is_valid)``.

    ``keep_payload=True`` additionally carries the bounded payload
    TEXT (valid records only) for in-pipeline extraction — the
    archive -> main-content composition consumes it in the same
    narrow chain, so the payload still never crosses an exchange;
    the default hashes-only form is the ingestion AUDIT shape.

    rec_no is 1-based in ARCHIVE order and keeps gaps for blocks that
    fail validation (the sitemap convention: source position is data).
    ``is_valid`` requires a target URI, a parseable Content-Length and
    a blank line; invalid records keep their row with NULL fields so
    corruption is countable — a crawl-health signal, not a silent
    drop.  ``warc_date`` stays a STRING (the pub_date rule: cross-
    engine timestamp parsing diverges long before the data does).
    """
    clash = sorted({"_wr_blocks", "_wr_b", "_wr_hdr"} & set(df.columns))
    if clash:
        raise ValueError(f"warc_records staging columns clash: {clash}")
    out = df.withColumn(
        "_wr_blocks",
        pin(
            F.split(
                F.coalesce(F.col(warc_col).cast("string"), F.lit("")),
                WARC_SPLIT_RE,
            )
        ),
    )
    # element 1 of the split is the pre-archive preamble (normally
    # empty); records are elements 2..n — posexplode keeps their order
    out = out.select(
        F.col(id_col),
        F.posexplode(
            F.slice(
                F.col("_wr_blocks"),
                2,
                F.greatest(
                    F.size(F.col("_wr_blocks")) - 1, F.lit(0)
                ),
            )
        ).alias("_wr_no", "_wr_b"),
    )
    b = F.col("_wr_b")
    blank_at = F.instr(b, BLANK)
    hdr = F.when(blank_at > 0, F.substring(b, 1, blank_at - 1)).otherwise(b)
    out = out.select(
        F.col(id_col),
        (F.col("_wr_no") + 1).cast("long").alias("rec_no"),
        b.alias("_wr_b"),
        pin(hdr).alias("_wr_hdr"),
        blank_at.alias("_wr_blank"),
    )
    h = F.col("_wr_hdr")

    def field(rx: str) -> Column:
        v = F.regexp_extract(h, rx, 1)
        return F.when(v != "", v)

    clen = field(_CLEN_RE).cast("long")
    payload = F.when(
        (F.col("_wr_blank") > 0) & clen.isNotNull(),
        F.substring(
            F.substring(F.col("_wr_b"), F.col("_wr_blank") + 4, 1 << 30),
            1,
            clen,
        ),
    )
    valid = (
        field(_URI_RE).isNotNull()
        & clen.isNotNull()
        & (F.col("_wr_blank") > 0)
    )
    return out.select(
        id_col,
        "rec_no",
        field(_TYPE_RE).alias("warc_type"),
        field(_URI_RE).alias("target_uri"),
        field(_DATE_RE).alias("warc_date"),
        clen.alias("content_length"),
        F.when(valid, F.md5(payload)).alias("payload_md5"),
        *(
            [F.when(valid, payload).alias("payload")]
            if keep_payload
            else []
        ),
        valid.alias("is_valid"),
    )
