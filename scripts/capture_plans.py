#!/usr/bin/env python
"""Capture .explain("formatted") output for a list of registry entries.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX [entry ...]

Writes OUTDIR/<entry>_<SUFFIX>.txt for each entry (batch entries only;
streaming entries are skipped with a note, since their builder executes
the query against a memory sink and the plan of record is the batch twin).
Run from the repo root whose __spark_entry__.py should be measured.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"capture-plans-{suffix}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as E

    qs = E.queries()
    for name in wanted:
        matches = [k for k in qs if k == name or k.startswith(name + "_")]
        if not matches:
            print(f"SKIP {name}: not in registry", flush=True)
            continue
        full = matches[0]
        path = os.path.join(outdir, f"{full}_{suffix}.txt")
        try:
            df = qs[full](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"OK   {full} -> {path}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {full}: {type(exc).__name__}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
