#!/usr/bin/env python
"""Full-registry latency sweep: time EVERY registry entry once (reps=1,
one untimed warm rep) at an sf dir — the safety net that catches
pathological latencies hiding outside bench.py's headline list (e.g. a
state-equivalence double-join or a double-BFS that quietly went
quadratic).  Streaming entries run their real micro-batch pipelines
inside the call, so they are timed like everything else.

Usage: python scripts/bench_full.py [SF_DIR] [--skip NAME ...]
Prints one JSON line: {"sf_dir": ..., "n": N, "total_sec": T,
"queries": {name: sec}, "slowest": [[name, sec] x 10], "skipped": [...]}.
Per-entry timings also stream to stderr so a killed run still yields data.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    skip: list[str] = []
    if "--skip" in args:
        i = args.index("--skip")
        skip = args[i + 1 :]
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("bench-full")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # pre-build shared GraphAr layouts so ga* rows time reads, not writes
    E._orders_graphar(spark, sf_dir)
    E._multi_edge_graphar(spark, sf_dir)

    results: dict[str, float] = {}
    for name in qs:
        if name in skip:
            continue
        try:
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            results[name] = round(time.time() - t0, 3)
            print(f"[bench-full] {name} {results[name]}", file=sys.stderr, flush=True)
        except Exception as ex:  # a sweep must report, not die
            print(f"[bench-full] {name} FAILED: {ex}", file=sys.stderr, flush=True)
            results[name] = -1.0
    ok = {k: v for k, v in results.items() if v >= 0}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n": len(results),
                "failed": sorted(k for k, v in results.items() if v < 0),
                "total_sec": round(sum(ok.values()), 3),
                "queries": results,
                "slowest": sorted(ok.items(), key=lambda kv: -kv[1])[:10],
                "skipped": skip,
            }
        )
    )


if __name__ == "__main__":
    main()
