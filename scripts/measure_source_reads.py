#!/usr/bin/env python
"""Cross-execution source-read meter for entries whose builders
materialize intermediates eagerly (localCheckpoint): the pass-audit
walk of the FINAL frame's executed plan cannot see scans that ran
inside the builder's own jobs, so this script meters HADOOP FILESYSTEM
bytesRead (every parquet read goes through it; in local mode all tasks
share the JVM so the counter is global), which checkpoint-block reads
do NOT touch (block-manager storage bypasses the Hadoop FS layer).

passes ≈ (bytesRead during run) / (on-disk size of the entry's input
parquet) — exact enough at one-table entries to distinguish 1 pass
from 4 or 6.

Usage: python scripts/measure_source_reads.py SF_DIR NAME [NAME...]
Prints one JSON line per entry:
  {"entry": ..., "fs_bytes_read": N, "passes_vs": {table: N.NN},
   "wall_s": S}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("source-read-meter")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()

    jfs = spark._jvm.org.apache.hadoop.fs.FileSystem

    def fs_bytes_read() -> int:
        total = 0
        it = jfs.getAllStatistics().iterator()
        while it.hasNext():
            s = it.next()
            if s.getScheme() in ("file", "local"):
                total += s.getBytesRead()
        return total

    sizes: dict[str, int] = {}
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            sizes[t] = os.path.getsize(p)

    for name in names:
        full = next((k for k in qs if k == name or k.startswith(name + "_")), None)
        if full is None:
            print(json.dumps({"entry": name, "error": "not in registry"}), flush=True)
            continue
        # one untimed warm run (codegen + file cache), then the metered run
        qs[full](spark, sf_dir).write.mode("overwrite").format("noop").save()
        base = fs_bytes_read()
        t0 = time.time()
        qs[full](spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        read = fs_bytes_read() - base
        print(
            json.dumps(
                {
                    "entry": full,
                    "fs_bytes_read": read,
                    "passes_vs": {
                        t: round(read / b, 2) for t, b in sizes.items() if b
                    },
                    "wall_s": round(wall, 3),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
