"""Generate a POWER-LAW (Zipf α≈2) graph fixture in the testdata layout.

Every driver fixture graph is degree-uniform (orders→customer modular
arithmetic, max undirected degree ~35 at every SF), so the hot-vertex
behavior of the wedge-join family (g10/g20/g22) and of LPA/PageRank hub
contributions is never exercised — while power-law is precisely what a
real 100 TB graph looks like (the reference benches on LDBC/Twitter-shaped
data, `docs/benchmarks.md:64-74`).  This script writes a MINIMAL sf-dir
(customer.parquet + orders.parquet — the only tables the graph entries
read) whose derived edge set `src = o_custkey, dst = o_orderkey % |customer|`
has Zipf-distributed source degrees:

    u    = xxhash64-derived uniform in [0,1)          (deterministic, seeded)
    rank = min(floor(1/u), V) - 1                     (P(rank=r) ∝ 1/r²)
    src  = (rank * 99991 + 12373) % V                 (id scramble, see below)
    dst  = o_orderkey % V                             (uniform cycling)

The multiplicative scramble (99991 is prime and coprime to both default
V values, so it permutes 0..V-1) decorrelates DEGREE from VERTEX ID:
without it the celebrity is vertex 0 and any id-ordered plan (triangle
counting's a<b<c orientation) looks accidentally healthy because the hub
has no lower-id neighbors — the adversarial case a real graph presents
is a hub at an arbitrary id.

Vertex 0 receives ~half of all edge endpoints (the celebrity), vertex 1
~1/6, …: at --edges 1500000 / --vertices 150000 (sf1-equivalent orders
count) the hub's distinct undirected degree is ~10⁵ vs the fixture's 35 —
three orders of magnitude of skew, which is what the capped/oriented
graph plans are graded against (BENCH_skew.json).

Usage: python scripts/make_skewgraph.py [--out /tmp/skew1]
           [--vertices 150000] [--edges 1500000] [--seed skew]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/skew1")
    ap.add_argument("--vertices", type=int, default=150_000)
    ap.add_argument("--edges", type=int, default=1_500_000)
    ap.add_argument("--seed", default="skew")
    args = ap.parse_args()

    import duckdb_graphar_spark as dgs

    spark = dgs.get_spark("make_skewgraph")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    V, E = args.vertices, args.edges
    # u in [0,1) from the top 40 bits of a seeded xxhash64 — deterministic
    # across partitionings/reruns (content-addressed randomness, the t36
    # discipline), never 0 thanks to the +1 offset.
    u = (
        (F.pmod(F.xxhash64(F.col("id"), F.lit(args.seed)), F.lit(1 << 40)) + 1)
        / F.lit(float(1 << 40))
    )
    orders = spark.range(E).select(
        F.col("id").alias("o_orderkey"),
        F.least(F.floor(1.0 / u).cast("long"), F.lit(V)).alias("__r"),
    ).select(
        "o_orderkey",
        F.pmod((F.col("__r") - 1) * F.lit(99991) + F.lit(12373), F.lit(V)).alias(
            "o_custkey"
        ),
    )
    customer = spark.range(V).select(F.col("id").alias("c_custkey"))

    for name, df in [("customer", customer), ("orders", orders)]:
        out = f"{args.out}/{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(out + ".dir")
        part = [f for f in os.listdir(out + ".dir") if f.endswith(".parquet")][0]
        os.replace(os.path.join(out + ".dir", part), out)
        shutil.rmtree(out + ".dir")
        print(name, "rows:", spark.read.parquet(out).count())

    # degree profile of the derived undirected simple graph — the honesty
    # check that the fixture actually IS skewed
    e = spark.read.parquet(f"{args.out}/orders.parquet").select(
        F.col("o_custkey").alias("src"), (F.col("o_orderkey") % V).alias("dst")
    )
    canon = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    top = deg.orderBy(F.col("d").desc()).limit(5).collect()
    print("top-5 undirected degrees:", [(r.v, r.d) for r in top])
    print("edges (canonical):", canon.count(), "vertices:", deg.count())


if __name__ == "__main__":
    main()
