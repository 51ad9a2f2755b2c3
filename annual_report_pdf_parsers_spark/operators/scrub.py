"""PII scrubbing for web-text corpora (training-data pipeline op).

C4/RefinedWeb-style redaction of personally identifiable tokens before
text lands in a training set: emails, IPv4 addresses, international
phone numbers.  Pure JVM ``regexp_replace``/``regexp_count`` expressions
(no UDFs), patterns restricted to syntax shared by Java regex and RE2
(no lookarounds, no backrefs) so the driver's DuckDB oracle applies the
byte-identical transformation.

The passes run SEQUENTIALLY (email -> ipv4 -> phone) and each category's
count is taken on that pass's INPUT — an email contains dots and digits,
so counting IPs before emails are removed would double-count.  Counts
are part of the output contract: redaction metrics per document feed the
corpus metrics table (a document with hundreds of redactions is usually
a directory page worth dropping entirely).

100 TB shape: narrow per-row projection — no shuffle, no state, sits in
whole-stage codegen directly above the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import pin

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,6}"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails/IPv4s/phones to ``<EMAIL>``/``<IP>``/``<PHONE>``.

    Adds ``n_emails``, ``n_ips``, ``n_phones`` (counts on each pass's
    input) and replaces ``text_col`` with the scrubbed text.  Each pass
    is a pin()-ned named cell: the three-deep regexp_replace composition
    would otherwise be re-inlined into every count reference
    (CollapseProject; same no-CSE issue as cleanup.clean_names).
    """
    t0 = F.col(text_col)
    return (
        df.withColumn(
            "n_emails", F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long")
        )
        .withColumn(
            "_t1", pin(F.regexp_replace(t0, EMAIL_RE, "<EMAIL>"))
        )
        .withColumn(
            "n_ips",
            F.regexp_count(F.col("_t1"), F.lit(IPV4_RE)).cast("long"),
        )
        .withColumn(
            "_t2", pin(F.regexp_replace(F.col("_t1"), IPV4_RE, "<IP>"))
        )
        .withColumn(
            "n_phones",
            F.regexp_count(F.col("_t2"), F.lit(PHONE_RE)).cast("long"),
        )
        .withColumn(
            text_col, F.regexp_replace(F.col("_t2"), PHONE_RE, "<PHONE>")
        )
        .drop("_t1", "_t2")
    )
