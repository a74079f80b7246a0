"""Exactness under task retries — the distributed analog of the
reference's count-conservation invariant (otlpwire_test.go:188-222;
SURVEY.md §7 'Exactness under retries').

A task in the sink-write stage is made to fail on its first attempt
(local[4,2] allows one retry). The per-shard counters collected from that
same job via Observation metrics must still match the pure-Python oracle
EXACTLY — failed attempts must not double-count."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark import TaskContext
from pyspark.sql.types import IntegerType

from otlp_wire_spark.fixtures import oracle
from otlp_wire_spark.fixtures.pages import generate_lookup, generate_pages
from otlp_wire_spark.operators.counting import quarantine_split
from otlp_wire_spark.operators.enrich import enrich, with_url_host
from otlp_wire_spark.operators.parse import parse_pages
from otlp_wire_spark.operators.route import route, write_sharded_with_manifest
from otlp_wire_spark.session import get_spark

N = 2000
NUM_SHARDS = 8


@pytest.fixture(scope="module")
def retry_spark():
    # dedicated session: local[4,2] == 4 threads, maxFailures=2
    s = get_spark(app_name="retry-tests", master="local[4,2]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@F.udf(IntegerType())
def _flaky_passthrough(x):
    tc = TaskContext.get()
    if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    return x


def test_per_shard_counters_exact_under_task_retry(retry_spark, tmp_path):
    pages = generate_pages(retry_spark, N)
    parsed = parse_pages(pages)
    clean, _ = quarantine_split(parsed)
    enriched = enrich(with_url_host(clean), generate_lookup(retry_spark))
    routed = route(enriched, "url", NUM_SHARDS).withColumn(
        "_flaky", _flaky_passthrough(F.lit(1))
    )
    per_shard = write_sharded_with_manifest(
        routed, str(tmp_path / "data"), NUM_SHARDS
    )
    want = oracle.expected_pipeline(N, NUM_SHARDS)["per_shard"]
    assert per_shard == want  # no loss, no double count

    # and the committed sink rows themselves are exact
    rows = retry_spark.read.parquet(str(tmp_path / "data")).count()
    assert rows == sum(v["page_count"] for v in want.values())
