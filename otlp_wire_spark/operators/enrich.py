"""Enrichment stage — broadcast hash join on (lang, url_host).

The reference's only join-like computation is the per-resource context
lookup in the flagship workload (benchmark_comparison_test.go:360-369): a
key-value probe of a small dimension per fact row. Spark-first that is a
LEFT broadcast hash join — no shuffle of the fact side, dimension shipped
once per executor (SURVEY.md §2.3). Skewed hosts are irrelevant under
broadcast (no partitioning by the join key at all); for non-broadcastable
dims see route.salted_host_stats for the salting pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_url_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive the join key: host of the page URL.

    regexp_extract, not parse_url — parse_url drags each row through Java
    URI parsing (~4× slower in our profile) for a fixed-shape extraction a
    simple anchored regex does inside codegen."""
    return df.withColumn(
        "url_host", F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    )


def enrich(df: DataFrame, lookup: DataFrame) -> DataFrame:
    """LEFT broadcast join; absent dimension row → NULL context (the
    'absent' leg of present/empty/absent — logs.go:121-132 analog)."""
    if "url_host" not in df.columns:
        df = with_url_host(df)
    return df.join(F.broadcast(lookup), on=["lang", "url_host"], how="left")
