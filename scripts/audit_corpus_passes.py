#!/usr/bin/env python
"""Measured corpus-pass audit: for each registry entry, execute the plan
and report how many times each input table was ACTUALLY read off storage
(sum of numOutputRows over executed file-scan leaves, deduped through
AQE stage/exchange reuse, divided by the table's row count).

Plan text lies about this — reused subtrees print multiple times and
broken reuse looks identical to working reuse.  The only trustworthy
counter is the runtime scan metric (the method that found q102's
5-pass regression in round 12: pruning pushed through a repartition and
an inferred isnotnull() both silently break exchange canonical
equality, and a narrow projection over an aggregate can degenerate it
to DISTINCT straight over the raw scan).

Usage: python scripts/audit_corpus_passes.py SF_DIR [NAME...]
  (no names = the bench.py headline list)
Prints one JSON line per entry: {"entry": ..., "passes": {table: N.NN},
"worst": N.NN}; a summary line ranks entries by worst table passes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def executed_scan_rows_by_path(df) -> dict[str, int]:
    """Rows read per input location over the final (post-AQE) plan,
    deduped by node id so reused exchanges/stages count once."""
    out: dict[str, int] = {}
    seen: set[int] = set()
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name or "BatchScan" in name:
            rows = 0
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows = kv._2().value()
            if rows:
                loc = node.toString()
                key = "?"
                for t in TABLES:
                    if f"/{t}.parquet" in loc or f"/{t}/" in loc:
                        key = t
                        break
                out[key] = out.get(key, 0) + rows
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
        elif "QueryStageExec" in name:
            stack.append(node.plan())
        else:
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import bench
    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("pass-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    if not names:
        names = list(bench.BENCH_QUERIES)
    E._orders_graphar(spark, sf_dir)

    counts: dict[str, int] = {}
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            counts[t] = spark.read.parquet(p).count()

    ranked = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            # collect(), not a noop write: the write runs as a SEPARATE
            # command execution and leaves the walked frame's scan
            # metrics at zero
            df.collect()
            per = executed_scan_rows_by_path(df)
        except Exception as ex:  # keep auditing the rest
            print(json.dumps({"entry": name, "error": str(ex)[:200]}), flush=True)
            continue
        passes = {
            t: round(r / counts[t], 2)
            for t, r in per.items()
            if t in counts and counts[t] > 0
        }
        worst = max(passes.values(), default=0.0)
        ranked.append((worst, name, passes))
        print(json.dumps({"entry": name, "passes": passes, "worst": worst}), flush=True)
    ranked.sort(reverse=True)
    print(json.dumps({
        "summary_worst_first": [
            {"entry": n, "worst": w, "passes": p} for w, n, p in ranked[:20]
        ]
    }), flush=True)


if __name__ == "__main__":
    main()
