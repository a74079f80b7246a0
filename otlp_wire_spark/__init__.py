"""otlp_wire_spark — a PySpark-native parse → enrich → route → aggregate
log/telemetry pipeline.

Brand-new engine (not a port) re-expressing what ``ollygarden/otlp-wire``
computes — exact record/byte counting, deterministic FNV-64a shard fan-out,
selective field extraction with pinned resolution semantics (first-match /
last-value-wins / merge, absent vs present-but-empty), and severity-band
classification with lookup-context enrichment — as idiomatic Spark DataFrame
stages over tables of Common-Crawl-style web pages
``(url, warc_ts, html:binary, text, lang)``.

Reference parity map lives in SURVEY.md §2; each module cites the reference
file:line whose semantics it reproduces.
"""

__version__ = "0.1.0"
