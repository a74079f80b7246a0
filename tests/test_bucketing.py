"""Bucketed co-located joins — the 'pre-partition the recurring join'
scale technique: both sides bucketed on the join key with the same bucket
count join with ZERO shuffle exchanges (SURVEY.md §2.3 / 100 TB notes).

Uses its own derby metastore + warehouse under tmp (saveAsTable needs a
catalog); runs in a subprocess so the shared test session keeps its own
(warehouse-less) config.
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
    sys.path.insert(0, __REPO__)
    import pyspark.sql.functions as F
    from otlp_wire_spark.session import get_spark
    from otlp_wire_spark.fixtures.pages import generate_pages
    from otlp_wire_spark.operators.route import write_bucketed
    from otlp_wire_spark.plans.asserts import count_shuffles

    wh = tempfile.mkdtemp(prefix="owspark_wh_")
    spark = get_spark(
        app_name="bucketing-test", master="local[4]", shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            "javax.jdo.option.ConnectionURL":
                f"jdbc:derby:;databaseName={wh}/metastore_db;create=true",
            # the point is the bucketed SMJ shape — keep broadcast out
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = generate_pages(spark, 5000).select("page_id", "url", "lang")
    stats = spark.range(5000).select(
        F.col("id").alias("page_id"), (F.col("id") % 97).alias("score"))
    write_bucketed(pages, "pages_b", "page_id", num_buckets=8, sort_col="page_id")
    write_bucketed(stats, "stats_b", "page_id", num_buckets=8, sort_col="page_id")

    a = spark.table("pages_b")
    b = spark.table("stats_b")
    joined = a.join(b, "page_id").select("page_id", "lang", "score")
    shuffles = count_shuffles(joined)
    n = joined.count()
    # control: the same join over non-bucketed parquet MUST shuffle
    raw = tempfile.mkdtemp(prefix="owspark_raw_")
    pages.write.parquet(raw + "/p"); stats.write.parquet(raw + "/s")
    control = spark.read.parquet(raw + "/p").join(
        spark.read.parquet(raw + "/s"), "page_id")
    control_shuffles = count_shuffles(control)
    print(json.dumps({"bucketed_shuffles": shuffles, "rows": n,
                      "control_shuffles": control_shuffles}))
    spark.stop()
    """
)


def test_bucketed_join_has_zero_shuffles():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repr(REPO))],
        capture_output=True, text=True, timeout=420,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no result; stderr tail: {out.stderr[-2000:]}"
    res = json.loads(lines[-1])
    assert res["bucketed_shuffles"] == 0, res
    assert res["rows"] == 5000
    assert res["control_shuffles"] >= 1, res  # proves the test can detect one
