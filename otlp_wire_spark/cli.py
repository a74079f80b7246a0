"""spark-submit entry point.

Cluster usage (north_rule packaging):

    zip -r otlp_wire_spark.zip otlp_wire_spark
    spark-submit --py-files otlp_wire_spark.zip \
        --master <cluster> \
        -m otlp_wire_spark.cli run \
        --input iceberg:warehouse.pages --output s3://sinks/run42 \
        --num-shards 64 --fingerprint snapshot-12345

Local smoke:

    python -m otlp_wire_spark.cli run --synthetic 100000 \
        --output /tmp/owspark_run --num-shards 8
"""

from __future__ import annotations

import argparse
import json
import sys

from otlp_wire_spark.session import get_spark


def _load_input(spark, args):
    if args.synthetic:
        from otlp_wire_spark.fixtures.pages import generate_pages

        return generate_pages(spark, args.synthetic)
    if args.input.startswith("iceberg:"):
        return spark.read.format("iceberg").load(args.input[len("iceberg:"):])
    return spark.read.parquet(args.input)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="otlp_wire_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the parse→enrich→route→aggregate pipeline")
    run.add_argument("--input", help="parquet path or iceberg:<table>")
    run.add_argument("--synthetic", type=int, default=0,
                     help="generate N synthetic pages instead of reading input")
    run.add_argument("--lookup", help="parquet path of the enrichment dim "
                                      "(default: built-in synthetic lookup)")
    run.add_argument("--output", required=True, help="run directory (sinks+manifests)")
    run.add_argument("--num-shards", type=int, default=8)
    run.add_argument("--fingerprint", default="default",
                     help="input snapshot id; same value resumes completed stages")
    run.add_argument("--sink-format", default="parquet",
                     choices=["parquet", "iceberg"])
    run.add_argument("--fused", action="store_true",
                     help="single-pass mode: no parsed-stage materialization;"
                          " quarantine routes to its own shard=-1 sink and all"
                          " counters ride the one write (resume granularity ="
                          " whole run)")

    args = ap.parse_args(argv)
    spark = get_spark(app_name="otlp-wire-spark-cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "run":
        if not args.synthetic and not args.input:
            ap.error("one of --input / --synthetic is required")
        from otlp_wire_spark.fixtures.pages import generate_lookup
        from otlp_wire_spark.pipeline import run_pipeline

        pages = _load_input(spark, args)
        lookup = (
            spark.read.parquet(args.lookup) if args.lookup else generate_lookup(spark)
        )
        res = run_pipeline(
            spark, pages, lookup, args.output,
            num_shards=args.num_shards,
            fingerprint=args.fingerprint,
            sink_format=args.sink_format,
            persist_stages=not args.fused,
        )
        print(json.dumps({
            "band_counts": res.band_counts,
            "context_count": res.context_count,
            "context_bytes": res.context_bytes,
            "per_shard": {str(k): v for k, v in res.per_shard.items()},
            "quarantined": res.quarantined,
            "total_pages": res.total_pages,
            "stages_skipped": res.stages_skipped,
            "elapsed_sec": round(res.elapsed_sec, 2),
        }, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
