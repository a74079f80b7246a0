"""Exact counting — the reference's flagship zero-cost operation.

``LogRecordCount``/``DataPointCount``/``SpanCount`` (reference
logs.go:12-14, metrics.go:56-58, traces.go:9-11) count nested records
without materializing them. The Spark analog of "skip bodies, read only
length prefixes" is metadata-only aggregate pushdown: ``COUNT(*)`` over
parquet/Iceberg is answered from row-group stats without reading payload
bytes, and counting parsed sub-records reads ONLY the ``record_count``
struct field (nested-schema pruning) — never the attrs/text fields.

All counts are exact (``F.count``/``F.sum``), never approximate — count
conservation under split is THE pinned invariant (otlpwire_test.go:129-225).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_counts(parsed: DataFrame) -> DataFrame:
    """Batch-level totals (A1-A3 analog): pages, sub-records, payload bytes."""
    return parsed.agg(
        F.count(F.lit(1)).alias("page_count"),
        F.sum(F.col("parsed.record_count")).cast("long").alias("record_count"),
        F.sum(F.length("html")).cast("long").alias("byte_count"),
    )


def per_group_counts(parsed: DataFrame, group_col: str) -> DataFrame:
    """Resource-scoped counts (A4 analog — logs.go:22-24): same counters
    per grouping container (host, lang, shard, ...)."""
    return (
        parsed.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("page_count"),
            F.sum(F.col("parsed.record_count")).cast("long").alias("record_count"),
            F.sum(F.length("html")).cast("long").alias("byte_count"),
        )
        .orderBy(group_col)
    )


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — per-row error semantics replacing the
    reference's batch abort (wire.go:40-42); exact quarantine counts are
    part of the correctness contract (SURVEY.md §7 'Error semantics')."""
    err = F.col("parsed.parse_error")
    return parsed.filter(err.isNull()), parsed.filter(err.isNotNull())
