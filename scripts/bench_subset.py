#!/usr/bin/env python
"""Time a SUBSET of registry queries at an arbitrary sf dir — the scale
probe harness (bench.py keeps the fixed headline list; this takes the
queries on the command line so 10x/100x probes only pay for the plans
under investigation).

Usage: python scripts/bench_subset.py SF_DIR QUERY [QUERY...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: median_sec},
"queries_min": {name: min_sec}, "reps": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: bench_subset.py SF_DIR QUERY [QUERY...]")

    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    results: dict[str, float] = {}
    results_min: dict[str, float] = {}
    for name in names:
        print(f"[bench-subset] {name}", file=sys.stderr, flush=True)
        # one untimed warm rep (codegen + file cache)
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
        times.sort()
        results[name] = round(times[len(times) // 2], 3)
        results_min[name] = round(times[0], 3)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "queries": results,
                "queries_min": results_min,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
