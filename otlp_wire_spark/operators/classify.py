"""Severity-band classification — pure CASE WHEN, JVM-side, codegen'd.

Band map pinned by the reference's flagship consumer workload
(benchmark_comparison_test.go:419-434): ``<1→0, ≤4→1, ≤8→2, ≤12→3, ≤16→4,
else→5``. Absent severity arrives as 0 from the parse stage (logs.go:116)
→ band 0. No UDF: this stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_BANDS = 6


def severity_band_col(severity: Column) -> Column:
    return (
        F.when(severity < 1, 0)
        .when(severity <= 4, 1)
        .when(severity <= 8, 2)
        .when(severity <= 12, 3)
        .when(severity <= 16, 4)
        .otherwise(5)
    ).cast("int")


def band_histogram(df: DataFrame, severity_col: str = "severity") -> DataFrame:
    """groupBy(band).count() — partial+final hash aggregate, one shuffle of
    ≤6 rows per partition (A6, SURVEY.md §2.4)."""
    return (
        df.withColumn("band", severity_band_col(F.col(severity_col)))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("band")
    )


def context_stats(df: DataFrame, context_col: str = "context") -> DataFrame:
    """count + total byte size of found context strings (A7; reference
    benchmark_comparison_test.go:360-369). NULL = absent (not counted),
    '' = present-but-empty (counted, 0 bytes)."""
    c = F.col(context_col)
    return df.agg(
        F.count(c).alias("context_count"),
        F.coalesce(F.sum(F.length(c)), F.lit(0)).cast("long").alias("context_bytes"),
    )
