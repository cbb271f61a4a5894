#!/usr/bin/env python
"""One-off scale-linearity evidence: the headline 3-micro-batch CDC
apply on a 25x input (1M convs x 10 turns + 5M updates = 15.1M change
events). See BENCH.md "Round 5: 25x input one-off" for recorded
numbers (515k ev/s cold page cache, 858k warm, vs 120k ev/s on the
standard 610k-event row) — fixed per-micro-batch costs amortize and
the marginal per-event cost is what scales to the 10^10-event target.

Usage:  python scripts/bench_scale25x.py          # local[32]
        PW_SCALE_RUNS=3 python scripts/bench_scale25x.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PW_BENCH_CONVS", "1000000")
os.environ.setdefault("PW_BENCH_UPDATES", "5000000")

import bench  # noqa: E402  (env must be set before the module reads it)


def main() -> None:
    spark = bench._spark(f"local[{bench.CPUS}]")
    events_path = os.path.join("/tmp", "pw-bench-events-25x")
    bench.generate_events(spark, events_path)
    n = spark.read.parquet(events_path).count()
    bench.cdc_apply_bench(spark, events_path)  # warm-up (JIT/codegen)
    runs = int(os.environ.get("PW_SCALE_RUNS", "2"))
    out = []
    for i in range(runs):
        r = bench.cdc_apply_bench(spark, events_path)
        out.append(
            {
                "run": i,
                "sec": round(r["sec"], 2),
                "events_per_sec": round(r["events_per_sec"]),
                "final_rows": r["final_rows"],
            }
        )
    print(json.dumps({"n_events": n, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
