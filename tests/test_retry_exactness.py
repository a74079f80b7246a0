"""Exactness under task retries — the distributed analog of the
reference's count-conservation invariant (otlpwire_test.go:188-222;
SURVEY.md §7 'Exactness under retries').

A task in the sink-write stage fails on its first attempt (local[4,2]
allows one retry). The per-shard counters collected from that same job via
Observation metrics must still match the pure-Python oracle EXACTLY —
failed attempts must not double-count.

Runs in a SUBPROCESS: maxFailures is a SparkContext property and
getOrCreate() would otherwise reuse (and stopping would kill) the shared
test session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import json, sys, tempfile
    sys.path.insert(0, %(repo)r)
    import pyspark.sql.functions as F
    from pyspark import TaskContext
    from pyspark.sql.types import IntegerType
    from otlp_wire_spark.session import get_spark
    from otlp_wire_spark.fixtures import oracle
    from otlp_wire_spark.fixtures.pages import generate_lookup, generate_pages
    from otlp_wire_spark.operators.counting import quarantine_split
    from otlp_wire_spark.operators.enrich import enrich, with_url_host
    from otlp_wire_spark.operators.parse import parse_pages
    from otlp_wire_spark.operators.route import route, write_sharded_with_manifest

    N, NUM_SHARDS = 2000, 8
    spark = get_spark(app_name="retry-test", master="local[4,2]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    marker = tempfile.mkdtemp() + "/fired"

    @F.udf(IntegerType())
    def flaky(x):
        tc = TaskContext.get()
        # fail the FIRST attempt of every task in this stage (some shard
        # hash buckets can be empty, so a single-partition trigger may
        # never run); retries then recompute every partition once
        if tc is not None and tc.attemptNumber() == 0:
            open(marker, "w").write("fired")  # prove the failure happened
            raise RuntimeError("injected first-attempt failure")
        return x

    pages = generate_pages(spark, N)
    clean, _ = quarantine_split(parse_pages(pages))
    enriched = enrich(with_url_host(clean), generate_lookup(spark))
    routed = route(enriched, "url", NUM_SHARDS).withColumn(
        "_flaky", flaky(F.lit(1)))
    out = tempfile.mkdtemp()
    per_shard = write_sharded_with_manifest(routed, out + "/data", NUM_SHARDS)
    rows = spark.read.parquet(out + "/data").count()
    want = oracle.expected_pipeline(N, NUM_SHARDS)["per_shard"]
    import os as _os
    print(json.dumps({
        "match": per_shard == want,
        "rows": rows,
        "want_rows": sum(v["page_count"] for v in want.values()),
        "failure_fired": _os.path.exists(marker),
    }))
    spark.stop()
    """
)


def test_per_shard_counters_exact_under_task_retry():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=420,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no result line; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["match"] is True
    assert res["rows"] == res["want_rows"]
    # the injected failure must actually have fired (a retry happened)
    assert res["failure_fired"] is True


_FUSED_SCRIPT = textwrap.dedent(
    """
    import json, sys, tempfile
    sys.path.insert(0, %(repo)r)
    import pyspark.sql.functions as F
    from pyspark import TaskContext
    from pyspark.sql.types import IntegerType
    from otlp_wire_spark.session import get_spark
    from otlp_wire_spark.fixtures import oracle
    from otlp_wire_spark.fixtures.pages import generate_lookup, generate_pages
    from otlp_wire_spark.pipeline import run_pipeline

    N, NUM_SHARDS = 2000, 8
    spark = get_spark(app_name="retry-fused-test", master="local[4,2]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    marker = tempfile.mkdtemp() + "/fired"

    @F.udf(IntegerType())
    def flaky(x):
        tc = TaskContext.get()
        if tc is not None and tc.attemptNumber() == 0:
            open(marker, "w").write("fired")
            raise RuntimeError("injected first-attempt failure")
        return x

    # inject the flaky column into the SOURCE so the failure hits inside
    # the fused single-pass job (whose Observation carries ALL aggregates)
    pages = generate_pages(spark, N).withColumn("_flaky", flaky(F.lit(1)))
    res = run_pipeline(spark, pages, generate_lookup(spark),
                       tempfile.mkdtemp(), num_shards=NUM_SHARDS,
                       fingerprint="retry-fused", persist_stages=False)
    want = oracle.expected_pipeline(N, NUM_SHARDS)
    import os as _os
    print(json.dumps({
        "shards_match": res.per_shard == want["per_shard"],
        "bands_match": res.band_counts == want["band_counts"],
        "ctx_match": (res.context_count == want["context_count"]
                      and res.context_bytes == want["context_bytes"]),
        "quarantined_match": res.quarantined == want["quarantined"],
        "failure_fired": _os.path.exists(marker),
    }))
    spark.stop()
    """
)


def test_fused_observed_aggregates_exact_under_task_retry():
    """Fused mode puts EVERY aggregate (bands, context, quarantine count,
    per-shard counters) on Observation metrics of the one write job — they
    must not double-count when tasks fail and retry."""
    out = subprocess.run(
        [sys.executable, "-c", _FUSED_SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=420,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no result line; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["shards_match"] and res["bands_match"], res
    assert res["ctx_match"] and res["quarantined_match"], res
    assert res["failure_fired"] is True
