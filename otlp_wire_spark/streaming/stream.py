"""Structured Streaming wrapper — the same DataFrame stages under
readStream (SURVEY.md §2.8: the reference is stateless; batching and
acknowledgement are consumer-owned, so the batch stages lift directly).

Design:
- parse / classify / enrich / shard are narrow transforms → applied to the
  streaming DataFrame unchanged.
- the per-shard sink write + exact per-batch manifests run inside
  ``foreachBatch``: each micro-batch is routed with the SAME batch code
  (route → partitionBy sink → manifest read-back), keyed by epoch id, so
  per-sink counters stay exact under retries (foreachBatch may re-run an
  epoch; the manifest write is idempotent per epoch — the streaming analog
  of the count-conservation invariant, otlpwire_test.go:188-222).
- optional event-time windowed band histogram with a watermark on warc_ts
  handles late pages.

Tests drive this with Trigger.AvailableNow over a directory source
(tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from otlp_wire_spark.operators.classify import severity_band_col
from otlp_wire_spark.operators.counting import quarantine_split
from otlp_wire_spark.operators.enrich import enrich, with_url_host
from otlp_wire_spark.operators.parse import parse_pages
from otlp_wire_spark.operators.route import route, write_sharded_with_manifest


def read_pages_stream(
    spark: SparkSession, src_dir: str, schema, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def streaming_route(
    pages_stream: DataFrame,
    lookup: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    num_shards: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Route a page stream to per-shard sinks with exact per-epoch manifests."""
    # fields-limited parse: same slim sink payload as the batch pipeline —
    # unlisted extractors' regex scans never enter the streaming plan either
    parsed = parse_pages(
        pages_stream, fields=["severity", "severity_text", "record_count"]
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        clean, quarantined = quarantine_split(batch_df)
        n_quarantined = quarantined.count()
        enriched = enrich(with_url_host(clean), lookup)
        routed = route(enriched, route_key_col="url", num_shards=num_shards)
        epoch_path = os.path.join(out_dir, f"epoch={epoch_id}")
        # counters observed during the epoch's write job (no sink re-read)
        per_shard = write_sharded_with_manifest(routed, epoch_path, num_shards)
        manifest = {
            "epoch": epoch_id,
            "quarantined": n_quarantined,
            "per_shard": {str(k): v for k, v in per_shard.items()},
        }
        tmp = os.path.join(out_dir, f"_manifest_epoch_{epoch_id}.json.tmp")
        final = os.path.join(out_dir, f"_manifest_epoch_{epoch_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, final)  # idempotent per-epoch commit

    writer = (
        parsed.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(
    pages_stream: DataFrame,
    text_col: str = "text",
    watermark_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first-seen row per byte-identical text,
    state maintained ACROSS micro-batches via dropDuplicates.

    Pass ``watermark_col`` in production so Spark can expire state for
    texts older than the watermark (unbounded state otherwise — fine for
    bounded replays/tests, fatal for an unbounded stream). Note the
    batch/stream semantic difference, by design: batch exact_dedup keeps
    the MIN-id representative (retry-idempotent); a stream cannot know the
    min id before seeing all rows, so the streaming contract is FIRST-SEEN
    (stable under replays of the same file order)."""
    keyed = pages_stream.withColumn("_h", F.md5(F.col(text_col)))
    if watermark_col is not None:
        # state expires once the event-time watermark passes a key
        keyed = keyed.withWatermark(watermark_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
    return keyed.dropDuplicates(["_h"]).drop("_h")


def windowed_band_counts(
    pages_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time severity-band histogram with late-data handling: counts
    per (event-time window, band); late pages beyond the watermark are
    dropped deterministically."""
    parsed = parse_pages(pages_stream)
    clean = parsed.where(F.col("parsed.parse_error").isNull())
    return (
        clean.withWatermark("warc_ts", watermark)
        .withColumn("band", severity_band_col(F.col("parsed.severity")))
        .groupBy(F.window("warc_ts", window).alias("w"), "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "band",
            "n",
        )
    )
