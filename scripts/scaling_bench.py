#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json criterion).

The north_rule's real-cluster criterion — throughput scaling efficiency
≥ 0.8 from N to 4N executors — cannot use a real cluster in this sandbox,
so per the driver instruction it is evidenced by running the IDENTICAL
job at two parallelism levels on the same input and reporting throughput
at both plus the efficiency.

Methodology (adopted from the reference, operations.md:97-103 /
docs/BENCHMARKS.md:554-566): alternate the two arms run-for-run (never
back-to-back batches), one warm-up iteration inside each JVM before
timing, median across trials. Each arm is a fresh JVM (subprocess) so
neither arm inherits the other's JIT/page-cache state.

Writes BENCH/BASELINE.md. Usage:
    python scripts/scaling_bench.py [--n-lo 2 --n-hi 8] [--pages 2000000]
                                    [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(cpus: int, pages: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MODE="pipeline",
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_PAGES=str(pages),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        SPARK_GRAFT_BENCH_TRIALS=os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"),
    )
    # shuffle + sink on tmpfs: measure the pipeline, not local-disk
    # writeback (a real cluster's shuffle/sinks are not one shared vda)
    if os.path.isdir("/dev/shm"):
        env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-lo", type=int, default=2)
    ap.add_argument("--n-hi", type=int, default=8)
    ap.add_argument("--also", type=str, default="8:32",
                    help="extra pair lo:hi to report for context, '' to skip")
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    pairs = [(args.n_lo, args.n_hi)]
    if args.also:
        lo, hi = args.also.split(":")
        pairs.append((int(lo), int(hi)))

    report: list[str] = []
    results = {}
    for lo, hi in pairs:
        tputs: dict[int, list[float]] = {lo: [], hi: []}
        degraded_arms = 0
        for trial in range(args.trials):
            # alternate arms within each trial (interleaved pairs)
            for cpus in (lo, hi) if trial % 2 == 0 else (hi, lo):
                r = run_arm(cpus, args.pages, args.sf_dir)
                tputs[cpus].append(r["routed_docs_per_sec"])
                ok = r.get("host_ok", True)
                degraded_arms += 0 if ok else 1
                print(f"trial {trial} local[{cpus}]: "
                      f"{r['routed_docs_per_sec']:.0f} docs/s"
                      f"{'' if ok else '  [HOST DEGRADED]'}", flush=True)
        med_lo = statistics.median(tputs[lo])
        med_hi = statistics.median(tputs[hi])
        eff = med_hi / (med_lo * (hi / lo))
        results[f"{lo}->{hi}"] = {
            "median_docs_per_sec": {str(lo): med_lo, str(hi): med_hi},
            "all": {str(k): v for k, v in tputs.items()},
            "speedup": round(med_hi / med_lo, 3),
            "efficiency": round(eff, 3),
            "degraded_arms": degraded_arms,
        }
        report.append(
            f"| local[{lo}] → local[{hi}] | {med_lo:,.0f} | {med_hi:,.0f} | "
            f"{med_hi / med_lo:.2f}× | **{eff:.2f}** |"
        )

    now = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH — two-parallelism scaling evidence

Criterion (BASELINE.json): throughput scaling efficiency ≥ 0.8 from N to
4N executors. Evidenced here per driver instruction by running the
identical end-to-end routed-pages pipeline (generate → parse → enrich →
route → per-shard parquet sinks + exact manifests) at two local
parallelism levels on the same input.

- job: {args.pages:,} synthetic pages, 8 shards, fresh JVM per arm,
  1 warm-up iteration per JVM (JIT steady state), {args.trials} timed
  trials per arm, arms interleaved, median reported
  (reference methodology: operations.md:97-103).
- host-health: every arm self-stamps a single-thread CPU control and a
  full-width steal probe (otlp_wire_spark/hosthealth.py); arms with
  host_ok=false are flagged in the raw results ("degraded_arms" per
  pair — rerun the pair in a quiet window if nonzero).
- host: {platform.processor() or platform.machine()}, {os.cpu_count()} vCPUs
  (SMT: 4N threads above ~half the vCPUs share physical cores — the
  honest N→4N pair is the one that fits physical cores).
- generated: {now}

| pair | median docs/s (N) | median docs/s (4N) | speedup | efficiency |
|---|---|---|---|---|
{chr(10).join(report)}

Raw results:

```json
{json.dumps(results, indent=2)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
