"""Generate a POWER-LAW (Zipf α≈2) EVENTS fixture in the testdata layout.

The driver's events fixture is user-uniform (~67 events per user at every
SF), so the hot-key behavior of the warehouse event operators — funnel's
sorted per-user fold (and its ``max_events_per_user`` safety valve),
SCD2's gaps-and-islands windows, sessionization, the q86 incremental
apply — is never exercised, while a real 100 TB event log is exactly
Zipf-by-user (bots, test accounts, integration users).  This is the
relational sibling of scripts/make_skewgraph.py, graded in
BENCH_skew_r07.json the way the graph lane is graded in BENCH_skew.json.

Construction (content-addressed, the t36 discipline):

    u       = xxhash64-derived uniform in [0,1)  (seeded, deterministic)
    rank    = min(floor(1/u), U) - 1             (P(rank=r) ∝ 1/r²)
    user_id = (rank * 99991 + 12373) % U         (id scramble — the hot
                                                  user sits at an
                                                  arbitrary id, not 0)
    ts      = 2024-01-01 + (id * 2654435761 mod N) seconds-ish spread
              over ~30 days (crosses q86's 2024-01-20 CDC cutoff)
    event_type cycles {view, click, purchase, signup, error} by a
              second hash so every user hits every funnel stage
    value   = ((id * 31 + 7) mod 10000) / 100.0  (exact two-decimal)

The hot user receives ~half of all events (at --events 1000000 /
--users 10000 that is ~5×10⁵ events for one window partition vs the
fixture's 67) — three-plus orders of magnitude of skew.

Usage: python scripts/make_skewevents.py [--out /tmp/skewev1]
           [--users 10000] [--events 1000000] [--seed skewev]
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
    ap.add_argument("--out", default="/tmp/skewev1")
    ap.add_argument("--users", type=int, default=10_000)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--seed", default="skewev")
    args = ap.parse_args()

    import duckdb_graphar_spark as dgs

    spark = dgs.get_spark("make_skewevents")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    U, N = args.users, args.events
    u = (
        (F.pmod(F.xxhash64(F.col("id"), F.lit(args.seed)), F.lit(1 << 40)) + 1)
        / F.lit(float(1 << 40))
    )
    types = F.array(
        F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("signup"),
        F.lit("error"),
    )
    # ~30 days of spread: a scrambled permutation of 0..N-1 scaled onto
    # 2,592,000 seconds, plus a microsecond lane from the raw id so ts
    # ties are rare but (ts, event_id) ordering still gets exercised
    sec = F.pmod(F.col("id") * F.lit(2654435761), F.lit(N)) * F.lit(2_592_000) / F.lit(N)
    events = spark.range(N).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.round(sec, 0) + F.pmod(F.col("id"), 1000) / 1000.0)
        ).alias("ts"),
        F.pmod(
            (F.least(F.floor(1.0 / u).cast("long"), F.lit(U)) - 1) * F.lit(99991)
            + F.lit(12373),
            F.lit(U),
        ).alias("user_id"),
        F.element_at(
            types,
            (F.pmod(F.xxhash64(F.col("id"), F.lit("etype")), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id") * 31 + 7, F.lit(10_000)) / F.lit(100.0)).alias("value"),
        F.concat(F.lit('{"k":'), F.pmod(F.col("id"), F.lit(97)), F.lit("}")).alias(
            "props"
        ),
    )

    out = f"{args.out}/events.parquet"
    events.coalesce(4).write.mode("overwrite").parquet(out + ".dir")
    # single-file layout like the driver fixtures is NOT required here
    # (the entries read the directory just as well), but keep the flat
    # .parquet name the loaders expect
    parts = [f for f in os.listdir(out + ".dir") if f.endswith(".parquet")]
    if len(parts) == 1:
        os.replace(os.path.join(out + ".dir", parts[0]), out)
        shutil.rmtree(out + ".dir")
    else:
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.replace(out + ".dir", out)

    df = spark.read.parquet(out)
    top = (
        df.groupBy("user_id").count().orderBy(F.col("count").desc()).limit(5).collect()
    )
    print("events:", df.count(), "users:", df.select("user_id").distinct().count())
    print("top-5 user event counts:", [(r.user_id, r["count"]) for r in top])


if __name__ == "__main__":
    main()
