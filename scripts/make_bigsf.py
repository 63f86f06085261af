"""Scale a testdata sf directory by an integer factor (default 10) by
replicating every table with consistent key shifts — a cheap way to probe
whether the bench plans hold an order of magnitude up without touching the
read-only driver fixtures.

Key consistency: every foreign key is shifted by `replica * (max_key+1)`
of its referenced table, so joins behave exactly as at the source scale
(each replica is a closed world).  region/nation are shared dimensions and
stay as-is.  documents/embeddings keep their content verbatim, which makes
every doc/vector a 10-way exact duplicate across replicas — deliberately:
that is what a dedup/ANN workload looks like at scale, and it pushes the
pair graph past the driver union-find threshold onto the distributed CC
path.

Usage: python scripts/make_bigsf.py [--src /root/testdata/sf0.1] \
           [--out /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def _replicate(df: DataFrame, factor: int, shifts: dict[str, int]) -> DataFrame:
    """Union `factor` copies, adding `replica * shift` to each keyed column."""
    r = df.crossJoin(
        df.sparkSession.range(factor).select(F.col("id").alias("__replica"))
    )
    for col, base in shifts.items():
        r = r.withColumn(col, F.col(col) + F.col("__replica") * F.lit(base))
    return r.drop("__replica")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    # r11 verdict defect: the default writer block size (128 MB) put a
    # whole 10M-row table into ONE row group — parquet splits on row
    # groups, so every sf10 full scan ran as a single straggler task
    # and scale probes measured a fixture floor, not the plan.  Small
    # row groups keep the single-file layout (events streaming needs
    # one file == one micro-batch) while restoring splittability.
    ap.add_argument("--rowgroup-mb", type=int, default=8)
    args = ap.parse_args()

    import duckdb_graphar_spark as dgs

    spark = dgs.get_spark("make_bigsf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    t = {name: spark.read.parquet(f"{args.src}/{name}.parquet")
         for name in ["region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents", "embeddings"]}
    # base = max+1 per keyed table so shifted keys stay dense/disjoint
    base = {
        "c": t["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "s": t["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "p": t["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "o": t["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "e": t["events"].agg(F.max("event_id")).first()[0] + 1,
        "d": t["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "v": t["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
    }
    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": base["c"]},
        "supplier": {"s_suppkey": base["s"]},
        "part": {"p_partkey": base["p"]},
        "orders": {"o_orderkey": base["o"], "o_custkey": base["c"]},
        "lineitem": {"l_orderkey": base["o"], "l_partkey": base["p"],
                     "l_suppkey": base["s"]},
        "events": {"event_id": base["e"], "user_id": base["c"]},
        "documents": {"doc_id": base["d"]},
        "embeddings": {"vec_id": base["v"]},
    }
    for name, shifts in plans.items():
        out = f"{args.out}/{name}.parquet"
        df = t[name] if not shifts else _replicate(t[name], args.factor, shifts)
        # single file per table to mirror the source layout (events
        # streaming relies on one-file == one micro-batch), but with
        # --rowgroup-mb row groups so the scan stays splittable
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.block.size", args.rowgroup_mb * 1024 * 1024)
            .parquet(out + ".dir")
        )
        part = [f for f in os.listdir(out + ".dir") if f.endswith(".parquet")][0]
        os.replace(os.path.join(out + ".dir", part), out)
        import shutil

        shutil.rmtree(out + ".dir")
        import pyarrow.parquet as pq

        rg = pq.ParquetFile(out).metadata.num_row_groups
        print(name, "rows:", spark.read.parquet(out).count(), "row_groups:", rg)


if __name__ == "__main__":
    main()
