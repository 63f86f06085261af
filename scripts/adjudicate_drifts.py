#!/usr/bin/env python
"""Interleaved-control drift adjudication (the r10 ga02/ga20 method,
now a reusable script per the r10 verdict items 2-3).

Runs N interleaved reps of {controls} + {suspects} inside ONE session
at $SPARK_GRAFT_SF_DIR so every rep of every entry samples the same
host-contention distribution; reports per-entry median/min plus the
inflation factor vs reference medians passed via a JSON file
({entry: seconds}).  A suspect whose inflation tracks the controls'
is contention; one that exceeds them after discounting the ambient
factor is a real cost.

Usage:
  python scripts/adjudicate_drifts.py REF_JSON OUT_JSON suspect [suspect...]
  (controls q01/g02/q14 always included; SPARK_GRAFT_ADJ_REPS, default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

CONTROLS = ["q01_pricing_summary", "g02_degrees", "q14_window_rownum"]


def main() -> None:
    ref_path, out_path, *suspects = sys.argv[1:]
    refs = json.load(open(ref_path))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_ADJ_REPS", "5"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    import __spark_entry__ as E
    from duckdb_graphar_spark.session import get_spark

    spark = get_spark("adjudicate")
    qs = E.queries()
    E._orders_graphar(spark, sf_dir)
    # the Python-worker control (r12): a fixed arrow-batched mapInPandas
    # identity+sum, interleaved like the JVM controls so pandas-UDF /
    # driver-python-heavy suspects get a like-for-like meter
    py_df = bench._ControlNormalizer._build_py_control(spark)
    controls = CONTROLS + [bench.PY_CONTROL]
    names = controls + [s for s in suspects if s not in controls]
    times: dict[str, list[float]] = {n: [] for n in names}

    def _run(n: str) -> None:
        if n == bench.PY_CONTROL:
            py_df.write.mode("overwrite").format("noop").save()
        else:
            qs[n](spark, sf_dir).write.mode("overwrite").format("noop").save()

    for n in names:  # one untimed warm rep each
        _run(n)
    for _ in range(reps):  # interleave: every rep samples the same window
        for n in names:
            t0 = time.time()
            _run(n)
            times[n].append(time.time() - t0)
    out: dict[str, dict] = {}
    for n in names:
        ts = sorted(times[n])
        med = ts[len(ts) // 2]
        rec = {"median_sec": round(med, 3), "min_sec": round(ts[0], 3)}
        if n in refs:
            rec["ref_sec"] = refs[n]
            rec["inflation_vs_ref"] = round(med / refs[n], 2)
        out[n] = rec
    ctrl_inf = sorted(
        out[c]["inflation_vs_ref"] for c in CONTROLS if "inflation_vs_ref" in out[c]
    )
    ambient = ctrl_inf[len(ctrl_inf) // 2] if ctrl_inf else None
    # py-control ambient: med/floor within this run (no historical ref
    # exists for it yet; its in-run scatter IS the python-lane meter),
    # unless the ref file carries a py00 entry from a prior run
    pyo = out[bench.PY_CONTROL]
    py_ambient = (
        pyo.get("inflation_vs_ref")
        or round(pyo["median_sec"] / pyo["min_sec"], 2)
    )
    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "controls": CONTROLS,
        "py_control": bench.PY_CONTROL,
        "ambient_control_inflation_median": ambient,
        "ambient_py_control_inflation": py_ambient,
        "interleaved": out,
        "discounted": {
            s: round(out[s]["inflation_vs_ref"] / ambient, 2)
            for s in suspects
            if "inflation_vs_ref" in out.get(s, {}) and ambient
        },
        "discounted_py": {
            s: round(out[s]["inflation_vs_ref"] / py_ambient, 2)
            for s in suspects
            if "inflation_vs_ref" in out.get(s, {}) and py_ambient
        },
    }
    json.dump(result, open(out_path, "w"), indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "interleaved"}))


if __name__ == "__main__":
    main()
