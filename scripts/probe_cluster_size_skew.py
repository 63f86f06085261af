#!/usr/bin/env python
"""Measure the d07/d09/d10 cluster_size rewrite on the fixture it
exists for: ONE giant near-dup cluster (boilerplate/template text at
corpus scale).  A `count() OVER (PARTITION BY label)` buffers the whole
cluster in a single window task; `groupBy(label).count()` + join is
map-side combinable and spreads the same rows across the cluster.  The
probe labels N vertices into one component (plus a uniform background)
and times both plans over the identical labels frame.

Usage: python scripts/probe_cluster_size_skew.py [n_giant] [n_background]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from duckdb_graphar_spark.session import get_spark


def main() -> None:
    n_giant = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark("cluster-size-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # labels frame shaped exactly like connected_components output:
    # one giant label 0 with n_giant members, background singletons
    giant = spark.range(n_giant).select(
        F.col("id").alias("v"), F.lit(0).cast("long").alias("label")
    )
    bg = spark.range(n_giant, n_giant + n_bg).select(
        F.col("id").alias("v"), F.col("id").alias("label")
    )
    cc = giant.unionAll(bg).localCheckpoint(eager=True)

    def window_plan():
        w = Window.partitionBy("label")
        return cc.select(
            "v", "label",
            F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        )

    def join_plan():
        sizes = cc.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size")
        )
        return cc.join(sizes, "label").select("v", "label", "cluster_size")

    def consume(df):
        # JVM-side noop sink: times the PLAN, not Python row iteration
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name, fn in (("count_window", window_plan), ("groupby_join", join_plan)):
        consume(fn())  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            consume(fn())
            ts.append(time.time() - t0)
        ts.sort()
        out[name] = {"median_sec": round(ts[1], 3), "min_sec": round(ts[0], 3)}

    out.update(
        {
            "n_giant_cluster": n_giant,
            "n_background_singletons": n_bg,
            "note": (
                "labels frame shaped like connected_components output;"
                " the window plan funnels the giant label through ONE"
                " buffered window task, the groupBy+join plan is"
                " map-side combinable — identical output"
            ),
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
