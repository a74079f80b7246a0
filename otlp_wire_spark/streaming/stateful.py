"""Custom stateful streaming operator: per-host running counters via
applyInPandasWithState (the Structured Streaming hook for operators Spark
lacks natively — SURVEY.md §2.8 / build-prompt 'custom stateful
operators').

Semantics: for every url_host, maintain (pages_total, records_total,
bytes_total) across ALL micro-batches and emit the updated running totals
each time the host appears in a batch. This is the streaming analog of the
reference's per-resource counters (logs.go:22-24) with state carried
between batches instead of per-request.

State is a 3-field tuple per host. Two variants:

- ``running_host_counters``: GroupStateTimeout off — counters are eternal
  (the parity-test shape).
- ``running_host_counters_ttl``: the 100 TB form — a processing-time TTL
  bounds state. A host idle past the TTL has its timer fire on the next
  micro-batch: the final totals are emitted once with ``expired=true``
  (the hand-off row a compaction sink consumes) and the state is REMOVED,
  so an unbounded host space (Common-Crawl has ~100M hosts) cannot grow
  the state store without bound; a returning host restarts from zero
  (expiry + restart pinned by tests/test_streaming.py). Timers checkpoint
  with the state, so expiry also survives query restarts."""

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


OUTPUT_SCHEMA_TTL = T.StructType(
    list(OUTPUT_SCHEMA.fields) + [T.StructField("expired", T.BooleanType())]
)


def _make_ttl_updater(ttl_ms: int):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # cold host: emit the final totals ONCE (the hand-off row a
            # compaction sink consumes) and drop the state
            p0, r0, b0 = state.get if state.exists else (0, 0, 0)
            state.remove()
            yield pd.DataFrame(
                {
                    "url_host": [key[0]],
                    "pages_total": [p0],
                    "records_total": [r0],
                    "bytes_total": [b0],
                    "expired": [True],
                }
            )
            return
        pages = records = nbytes = 0
        for pdf in pdfs:
            pages += len(pdf)
            records += int(pdf["record_count"].fillna(0).sum())
            nbytes += int(pdf["byte_count"].fillna(0).sum())
        p0, r0, b0 = state.get if state.exists else (0, 0, 0)
        new = (p0 + pages, r0 + records, b0 + nbytes)
        state.update(new)
        state.setTimeoutDuration(ttl_ms)  # re-arm on every touch
        yield pd.DataFrame(
            {
                "url_host": [key[0]],
                "pages_total": [new[0]],
                "records_total": [new[1]],
                "bytes_total": [new[2]],
                "expired": [False],
            }
        )

    return update


def running_host_counters_ttl(
    parsed_stream: DataFrame, ttl_ms: int = 3_600_000
) -> DataFrame:
    """TTL-bounded variant of ``running_host_counters`` — the 100 TB shape.

    Every touch re-arms a processing-time timer; a host idle past
    ``ttl_ms`` fires on a subsequent micro-batch (the engine runs timer-
    service batches even without new data for the group), emits its final
    totals with ``expired=true`` and is REMOVED from the state store.
    Keeps state proportional to the ACTIVE host set instead of every host
    ever seen; timers checkpoint with the state."""
    slim = parsed_stream.where(F.col("parsed.parse_error").isNull()).select(
        F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1).alias("url_host"),
        F.col("parsed.record_count").alias("record_count"),
        F.length("html").alias("byte_count"),
    )
    return slim.groupBy("url_host").applyInPandasWithState(
        _make_ttl_updater(ttl_ms),
        outputStructType=OUTPUT_SCHEMA_TTL,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
