#!/usr/bin/env python
"""Count Spark JOBS (and wall time) per registry entry — the iterative
graph family runs at the local scheduler floor, so the number of jobs an
entry triggers (checkpoint materializations, convergence probes, the
final action) is the structural metric its cost scales with, and unlike
wall time it is exact under ambient load.

Usage: python scripts/probe_job_counts.py SF_DIR QUERY [QUERY...]
Prints one JSON line: {"sf_dir": ..., "entries": {name: {"jobs": N,
"sec": t}}}.
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
        raise SystemExit("usage: probe_job_counts.py SF_DIR QUERY [QUERY...]")

    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("probe-job-counts")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = E.queries()

    out: dict[str, dict] = {}
    for name in names:
        print(f"[probe] {name}", file=sys.stderr, flush=True)
        # warm rep (codegen + page cache) outside the counted group
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        sec = time.time() - t0
        # PySpark's SparkContext has no clearJobGroup wrapper (the typed
        # JVM API does) — clear via the JVM context rather than passing
        # Nones to setJobGroup, which expects strings
        sc._jsc.clearJobGroup()
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        out[name] = {"jobs": len(jobs), "sec": round(sec, 3)}
        print(f"[probe] {name}: jobs={len(jobs)} sec={sec:.2f}", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": sf_dir, "entries": out}))


if __name__ == "__main__":
    main()
