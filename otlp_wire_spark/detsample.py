"""Deterministic bounded driver-side sampling.

Two-job-consistency rule (CLAUDE.md): any value collected on the driver
and rejoined to the data must be derived from the DATA — never from
physical execution metadata. ``rand(seed)`` ordering violates this (it
seeds per PARTITION INDEX, so the sample changes when the layout does);
``.rdd.takeSample`` additionally pays a Python serialization round-trip.

``hash_order_sample`` is the one blessed idiom: the k smallest rows by
``(xxhash64(key), key)``. xxhash64 is a pure function of the value and
~uniform, so the result is an effectively-random sample that is a pure
function of the data, fully parallel (TakeOrdered — no full sort), and
Tungsten-side end to end. Callers needing null/validity filtering or
dedup apply it to ``df`` BEFORE calling (the helper must not guess which
columns define validity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def hash_order_sample(df: DataFrame, key_col: str, k: int) -> list[Row]:
    """Collect the k smallest rows of ``df`` by (xxhash64(key), key) —
    bounded driver traffic, deterministic for fixed data regardless of
    partitioning. Returns full rows of ``df`` (select first to narrow)."""
    return (
        df.orderBy(F.xxhash64(F.col(key_col)), F.col(key_col))
        .limit(k)
        .collect()
    )
