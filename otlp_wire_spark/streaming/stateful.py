"""Custom stateful streaming operator: per-host running counters via
applyInPandasWithState (the Structured Streaming hook for operators Spark
lacks natively — SURVEY.md §2.8 / build-prompt 'custom stateful
operators').

Semantics: for every url_host, maintain (pages_total, records_total,
bytes_total) across ALL micro-batches and emit the updated running totals
each time the host appears in a batch. This is the streaming analog of the
reference's per-resource counters (logs.go:22-24) with state carried
between batches instead of per-request.

State is a 3-field tuple per host; GroupStateTimeout is off (counters are
eternal) — at 100 TB-scale streams you'd bound state with a TTL or move
cold hosts to a compacted table; noted, not needed for parity tests."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "pages LONG, records LONG, bytes LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url_host", T.StringType()),
        T.StructField("pages_total", T.LongType()),
        T.StructField("records_total", T.LongType()),
        T.StructField("bytes_total", T.LongType()),
    ]
)


def _update_host_counters(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    pages = records = nbytes = 0
    for pdf in pdfs:
        pages += len(pdf)
        records += int(pdf["record_count"].fillna(0).sum())
        nbytes += int(pdf["byte_count"].fillna(0).sum())
    if state.exists:
        p0, r0, b0 = state.get
    else:
        p0 = r0 = b0 = 0
    new = (p0 + pages, r0 + records, b0 + nbytes)
    state.update(new)
    yield pd.DataFrame(
        {
            "url_host": [key[0]],
            "pages_total": [new[0]],
            "records_total": [new[1]],
            "bytes_total": [new[2]],
        }
    )


def running_host_counters(parsed_stream: DataFrame) -> DataFrame:
    """parsed pages stream → running per-host counters (update mode)."""
    slim = parsed_stream.where(F.col("parsed.parse_error").isNull()).select(
        F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1).alias("url_host"),
        F.col("parsed.record_count").alias("record_count"),
        F.length("html").alias("byte_count"),
    )
    return slim.groupBy("url_host").applyInPandasWithState(
        _update_host_counters,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
