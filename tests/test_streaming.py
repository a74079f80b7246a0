"""Structured Streaming tests: availableNow micro-batches through the same
stages, per-epoch manifest exactness, windowed band counts with watermark."""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from otlp_wire_spark.fixtures import oracle
from otlp_wire_spark.fixtures.pages import generate_lookup, generate_pages
from otlp_wire_spark.streaming.stream import (
    read_pages_stream,
    streaming_route,
    windowed_band_counts,
)

N = 1500
NUM_SHARDS = 8


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    # several files so availableNow produces multiple micro-batches
    generate_pages(spark, N).repartition(6).write.mode("overwrite").parquet(d)
    return d


def test_streaming_route_conserves_counts(spark, src_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    schema = spark.read.parquet(src_dir).schema
    stream = read_pages_stream(spark, src_dir, schema, max_files_per_trigger=2)
    q = streaming_route(stream, generate_lookup(spark), out, ckpt,
                        num_shards=NUM_SHARDS)
    q.awaitTermination(180)

    manifests = sorted(glob.glob(os.path.join(out, "_manifest_epoch_*.json")))
    assert len(manifests) >= 2, "expected multiple micro-batches"
    per_shard = {k: {"page_count": 0, "record_count": 0, "byte_count": 0}
                 for k in range(NUM_SHARDS)}
    quarantined = 0
    for m in manifests:
        data = json.load(open(m))
        quarantined += data["quarantined"]
        for k, v in data["per_shard"].items():
            for f in v:
                per_shard[int(k)][f] += v[f]

    want = oracle.expected_pipeline(N, NUM_SHARDS)
    assert quarantined == want["quarantined"]
    for k in range(NUM_SHARDS):
        assert per_shard[k] == want["per_shard"][k], f"shard {k}"

    # routed rows on disk equal the batch answer too (read the sink root:
    # epoch=*/shard=* partition discovery; _manifest_* files are ignored
    # by Spark's underscore convention)
    rows = spark.read.parquet(out).count()
    assert rows == N - want["quarantined"]


def test_stateful_running_host_counters(spark, src_dir):
    """Custom stateful operator (applyInPandasWithState): after draining
    the stream, the LAST emitted running total per host equals the batch
    answer — state survived across micro-batches."""
    from otlp_wire_spark.operators.parse import parse_pages
    from otlp_wire_spark.streaming.stateful import running_host_counters

    schema = spark.read.parquet(src_dir).schema
    stream = read_pages_stream(spark, src_dir, schema, max_files_per_trigger=2)
    counters = running_host_counters(parse_pages(stream))
    q = (
        counters.writeStream.format("memory")
        .queryName("host_counters")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per (host, batch); the max running total
    # per host is the final state
    got = {
        r["url_host"]: (r["pages"], r["records"], r["bytes"])
        for r in spark.sql(
            "SELECT url_host, max(pages_total) AS pages, "
            "max(records_total) AS records, max(bytes_total) AS bytes "
            "FROM host_counters GROUP BY url_host"
        ).collect()
    }
    want: dict[str, list[int]] = {}
    for i in range(N):
        e = oracle.extract(oracle.html(i))
        if e.parse_error is not None:
            continue
        h = oracle.host(i)
        w = want.setdefault(h, [0, 0, 0])
        w[0] += 1
        w[1] += e.record_count
        w[2] += len(oracle.html(i))
    assert got == {k: tuple(v) for k, v in want.items()}


def test_streaming_exact_dedup_across_microbatches(spark, src_dir):
    """Dedup state must survive across micro-batches: the drained output
    has exactly one row per distinct text (same count as the batch
    answer), each a genuine input row for that text."""
    from otlp_wire_spark.streaming.stream import streaming_exact_dedup

    schema = spark.read.parquet(src_dir).schema
    stream = read_pages_stream(spark, src_dir, schema, max_files_per_trigger=2)
    q = (
        streaming_exact_dedup(stream, text_col="text")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT page_id, text FROM dedup_stream").collect()
    batch = spark.read.parquet(src_dir)
    n_distinct = batch.select(F.md5("text")).distinct().count()
    assert len(got) == n_distinct
    # each surviving row is a true (page_id, text) pair, one per text
    want = {r["page_id"]: r["text"] for r in batch.select("page_id", "text").collect()}
    texts = [r["text"] for r in got]
    assert len(set(texts)) == len(texts)
    for r in got:
        assert want[r["page_id"]] == r["text"]


def test_windowed_band_counts_with_watermark(spark, src_dir, tmp_path_factory):
    schema = spark.read.parquet(src_dir).schema
    stream = read_pages_stream(spark, src_dir, schema, max_files_per_trigger=3)
    agg = windowed_band_counts(stream, window="10 minutes", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("band_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT band, sum(n) AS n FROM band_windows GROUP BY band ORDER BY band"
    ).collect()
    want = oracle.expected_pipeline(N, NUM_SHARDS)["band_counts"]
    got_list = [0] * 6
    for r in got:
        got_list[int(r["band"])] = int(r["n"])
    assert got_list == want


def test_stateful_ttl_expires_cold_hosts(spark, tmp_path_factory):
    """TTL variant: a host idle past the TTL is emitted once with
    expired=true (final totals — the hand-off row) and its state REMOVED,
    so a returning host restarts from zero. One continuous query with a
    processing-time trigger; files dropped into the source dir between
    phases."""
    import time

    from otlp_wire_spark.operators.parse import parse_pages
    from otlp_wire_spark.streaming.stateful import running_host_counters_ttl

    src = str(tmp_path_factory.mktemp("ttl_src"))
    ckpt = str(tmp_path_factory.mktemp("ttl_ckpt"))
    schema = "url string, html binary"

    def write_batch(host: str, n: int) -> None:
        rows = [
            (f"http://{host}/p{i}", bytearray(b"severity=1;<rec>r</rec>"))
            for i in range(n)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def rows():
        return spark.sql("SELECT * FROM ttl_counters").collect()

    def wait_for(pred, what: str, deadline_s: float = 60.0):
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline_s:
            got = [r for r in rows() if pred(r)]
            if got:
                return got
            time.sleep(0.3)
        raise AssertionError(f"timed out waiting for {what}: {rows()}")

    write_batch("a.example.com", 3)  # source dir must exist before start
    stream = spark.readStream.schema(schema).parquet(src)
    counters = running_host_counters_ttl(parse_pages(stream), ttl_ms=1000)
    q = (
        counters.writeStream.format("memory")
        .queryName("ttl_counters")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        first = wait_for(
            lambda r: r["url_host"] == "a.example.com" and not r["expired"],
            "host a first totals",
        )
        assert first[0]["pages_total"] == 3

        # go cold past the TTL, then hand-off: expired=true with FINAL totals
        expired = wait_for(
            lambda r: r["url_host"] == "a.example.com" and r["expired"],
            "host a expiry hand-off",
        )
        assert expired[0]["pages_total"] == 3

        # state was removed: the returning host restarts from zero
        write_batch("a.example.com", 4)
        wait_for(
            lambda r: r["url_host"] == "a.example.com"
            and not r["expired"]
            and r["pages_total"] == 4,
            "host a restarted from zero (4, not 7)",
        )
        # and never accumulated across the expiry boundary
        assert not any(
            r["url_host"] == "a.example.com" and r["pages_total"] == 7
            for r in rows()
        )
    finally:
        q.stop()
