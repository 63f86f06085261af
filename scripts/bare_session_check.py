#!/usr/bin/env python
"""Harness-proofing: run every registry entry + oracle under a BARE
SparkSession — no factory confs (session.py) — exactly like the
correctness driver, which constructs its own session.  Round 1 lost 3
slots to a factory-only conf (nanos timestamps); this catches the class.

Usage: python scripts/bare_session_check.py [sf_dir] [name_prefix...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_driver_canon import check_driver_family_parity
from test_oracle import _canon_rows, _duck  # reuse the driver-mirror canonicalization

import __spark_entry__ as entrymod


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    # deliberately NOT session.get_spark(): the point is to mimic a
    # foreign session with default confs (TZ, shuffle partitions, arrow,
    # parquet handling all at Spark defaults)
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("bare-session-check")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    oracle = entrymod.oracle_sql()
    queries = entrymod.queries()
    names = [n for n in queries if not prefixes or n.startswith(prefixes)]
    con = _duck(sf_dir)

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracle:
                print(f"ROWS_ONLY {name}: {len(srows)} rows", flush=True)
                continue
            # driver-canon parity: unhashable cells / numeric-family
            # mismatch fail here before they can cost a driver slot
            check_driver_family_parity(name, con, oracle[name], sdf.schema)
            res = con.execute(oracle[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            assert sorted(scols) == sorted(dcols), f"columns {scols} vs {dcols}"
            assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
            sc, dc = _canon_rows(scols, srows), _canon_rows(dcols, drows)
            assert sc == dc, f"value mismatch: {[(a, b) for a, b in zip(sc, dc) if a != b][:3]}"
            n_pass += 1
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            n_fail += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)} run")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
