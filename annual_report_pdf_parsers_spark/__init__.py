"""annual_report_pdf_parsers_spark — a PySpark-native extraction engine.

A from-scratch reimplementation of the capabilities of the reference repo
``themistysky/annual_report_PDF_parsers`` (19 per-provider CLI scripts,
pandas + tabula/camelot) as ONE distributed Spark pipeline:

    pages table (url, warc_ts, html, text, lang)
      -> dispatch (classify document layout, SURVEY.md §2.9)
      -> Arrow-batch extraction (column-grid slicer / whitespace-gap split,
         SURVEY.md §2.1 S4/S5/S7) via mapInPandas
      -> relational realign + cleanup (SURVEY.md §2.2/2.5/2.8) in pure
         Spark SQL expressions, Catalyst-planned
      -> fixed 9-column holdings schema + lineage/metrics sinks

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"
