"""Unit tests: exact_quantiles, table_stats, apply_changes."""

import pytest
from pyspark.sql import functions as F


def test_exact_quantiles_matches_sorted_reference(spark):
    from duckdb_graphar_spark.operators.quantiles import exact_quantiles

    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(997)]
    # duplicates + a null on purpose
    vals += vals[:50]
    rows = [(i, v) for i, v in enumerate(vals)] + [(len(vals), None)]
    df = spark.createDataFrame(rows, "id long, x double")

    probs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = {r.prob: (r.value, r.target_rank, r.n) for r in
           exact_quantiles(df, "x", probs, n_buckets=7).collect()}

    s = sorted(vals)
    n = len(s)
    for p in probs:
        idx = int((n - 1) * p)  # floor on exact values used here
        assert got[p][2] == n
        assert got[p][1] == idx + 1
        assert got[p][0] == pytest.approx(s[idx], abs=1e-9)


def test_exact_quantiles_single_value_and_validation(spark):
    from duckdb_graphar_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([(1, 5.0)] * 10, "id long, x double")
    got = exact_quantiles(df, "x", [0.5]).collect()
    assert got[0].value == 5.0 and got[0].n == 10

    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])

    empty = spark.createDataFrame([], "id long, x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0


def test_table_stats_hand_checked(spark):
    from duckdb_graphar_spark.operators.stats import table_stats

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 30.0), (3, 10.0)], "k long, v double"
    )
    got = {r.col_name: r for r in table_stats(df, ["k", "v"]).collect()}
    assert got["k"].n_nulls == 0 and got["k"].n_distinct == 3
    assert got["k"].min_v == 1.0 and got["k"].max_v == 3.0
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert got["v"].min_v == 10.0 and got["v"].max_v == 30.0
    # approx path returns the same shape (values are HLL estimates)
    approx = {r.col_name: r for r in
              table_stats(df, ["k", "v"], exact_ndv=False).collect()}
    assert approx["k"].n_distinct >= 1
    with pytest.raises(ValueError):
        table_stats(df, [])


def test_apply_changes_semantics(spark):
    from duckdb_graphar_spark.operators.cdc import apply_changes

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
    )
    # key 1: two updates, latest (seq 5) wins; key 2: delete;
    # key 4: insert; key 3: untouched
    changes = spark.createDataFrame(
        [
            (1, 4, False, "a2"),
            (1, 5, False, "a3"),
            (2, 6, True, "xx"),
            (4, 7, False, "d"),
        ],
        "k long, seq long, is_del boolean, val string",
    )
    got = {r.k: (r.val, r.op) for r in apply_changes(
        snapshot, changes, key_col="k", seq_col="seq",
        delete_col="is_del", payload_cols=["val"]).collect()}
    assert got == {1: ("a3", "update"), 3: ("c", "keep"), 4: ("d", "insert")}


def test_apply_changes_delete_then_reinsert_latest_wins(spark):
    from duckdb_graphar_spark.operators.cdc import apply_changes

    snapshot = spark.createDataFrame([(1, "a")], "k long, val string")
    changes = spark.createDataFrame(
        [(1, 10, True, None), (1, 11, False, "re")],
        "k long, seq long, is_del boolean, val string",
    )
    got = apply_changes(
        snapshot, changes, key_col="k", seq_col="seq",
        delete_col="is_del", payload_cols=["val"]).collect()
    assert [(r.k, r.val, r.op) for r in got] == [(1, "re", "update")]


def test_cohort_retention_hand_computed(spark):
    """Three users, weekly buckets pinned by hand."""
    import datetime as dt

    from duckdb_graphar_spark.operators.events import cohort_retention

    W = 604800

    def ts(week, extra=0):
        return dt.datetime.utcfromtimestamp(week * W + extra)

    rows = [
        # user 1: first week 100, active weeks 100, 101, 103
        (1, ts(100)), (1, ts(100, 30)), (1, ts(101)), (1, ts(103)),
        # user 2: first week 100, active weeks 100, 101
        (2, ts(100, 60)), (2, ts(101, 5)),
        # user 3: first week 101, active week 101 only
        (3, ts(101, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_start, r.week_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    c100, c101 = ts(100), ts(101)
    assert got == {
        (c100, 0): 2,  # users 1+2 in their cohort week
        (c100, 1): 2,  # both active the next week
        (c100, 3): 1,  # only user 1
        (c101, 0): 1,  # user 3's cohort
    }


def test_exact_corr_matches_numpy(spark):
    """Fixed-point exact corr vs numpy's corrcoef on 2-decimal data."""
    import numpy as np

    from duckdb_graphar_spark.operators.stats import exact_corr

    rng = np.random.default_rng(2)
    x = np.round(rng.normal(10, 3, 200), 2)
    y = np.round(x * 1.5 + rng.normal(0, 2, 200), 2)
    rows = [("a", float(x[i]), float(y[i])) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = exact_corr(df, "x", "y", ["g"]).collect()[0]
    assert r.n == 200
    # the fixed-point rounding IS the operator's contract: compare
    # against numpy on the same scaled-integer values
    xs, ys = np.round(x * 100), np.round(y * 100)
    expected = np.corrcoef(xs, ys)[0, 1]
    assert abs(r.corr - expected) < 1e-6


def test_exact_corr_degenerate_group_is_null(spark):
    from duckdb_graphar_spark.operators.stats import exact_corr

    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 1.0, 7.0)], "g string, x double, y double"
    )
    r = exact_corr(df, "x", "y", ["g"]).collect()[0]
    assert r.corr is None  # zero x-variance -> undefined, not NaN/crash


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    import numpy as np

    from duckdb_graphar_spark.operators.stats import bootstrap_mean_ci

    rng = np.random.default_rng(7)
    rows = [("g", int(i), float(np.round(rng.normal(50, 5), 2))) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out1 = bootstrap_mean_ci(df, "v", ["grp"], ["id"]).collect()[0]
    out2 = bootstrap_mean_ci(df, "v", ["grp"], ["id"]).collect()[0]
    assert out1 == out2  # content-addressed: identical across runs
    assert out1.n == 400
    assert out1.ci_lo <= out1.est_mean <= out1.ci_hi
    # CI width should be a few standard errors (5/sqrt(400) = 0.25)
    assert 0.05 < out1.ci_hi - out1.ci_lo < 2.0


def test_bootstrap_ci_rejects_small_b(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame([("g", 1, 1.0)], "grp string, id long, v double")
    with _pt.raises(ValueError, match="n_replicates"):
        bootstrap_mean_ci(df, "v", ["grp"], ["id"], n_replicates=3)


def test_maintain_agg_insert_delete_cancellation(spark):
    from duckdb_graphar_spark.operators.cdc import maintain_agg
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [("a", 2, 300), ("b", 1, 50)], "k string, n long, sum_scaled long"
    )
    changes = spark.createDataFrame(
        [
            ("a", 100, "insert"),
            ("a", 100, "delete"),  # cancels bit-exactly
            ("b", 50, "delete"),   # b drops to zero -> removed
            ("c", 7, "insert"),    # new key appears
        ],
        "k string, x long, op string",
    )
    got = {
        r.k: (r.n, r.sum_scaled)
        for r in maintain_agg(base, changes, ["k"]).collect()
    }
    assert got == {"a": (2, 300), "c": (1, 7)}


def test_maintain_agg_unknown_op_raises(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.cdc import maintain_agg

    base = spark.createDataFrame([("a", 1, 1)], "k string, n long, sum_scaled long")
    ch = spark.createDataFrame([("a", 1, "upsert")], "k string, x long, op string")
    with _pt.raises(Exception, match="unknown op"):
        maintain_agg(base, ch, ["k"]).collect()


def test_maintain_agg_negative_count_raises(spark):
    """A delete with no matching insert (corrupt CDC feed) must SURFACE,
    not silently vanish with the legitimate reached-zero keys."""
    import pytest as _pt

    from duckdb_graphar_spark.operators.cdc import maintain_agg

    base = spark.createDataFrame([("a", 1, 10)], "k string, n long, sum_scaled long")
    ch = spark.createDataFrame(
        [("a", 10, "delete"), ("a", 10, "delete")], "k string, x long, op string"
    )
    with _pt.raises(Exception, match="negative merged count"):
        maintain_agg(base, ch, ["k"]).collect()


def test_value_histogram_bins_and_degenerate_key(spark):
    from duckdb_graphar_spark.operators.stats import value_histogram

    rows = [("a", 0.0), ("a", 5.0), ("a", 10.0), ("a", 9.99), ("b", 3.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {(r.event_type, r.bin): r.n for r in value_histogram(df, n_bins=10).collect()}
    # a: range [0,10] → width 1; 0.0→bin 0, 5.0→bin 5, 9.99→bin 9, 10.0→clamped to 9
    assert got == {("a", 0): 1, ("a", 5): 1, ("a", 9): 2, ("b", 0): 2}
    import pytest as _pt

    with _pt.raises(ValueError, match="n_bins"):
        value_histogram(df, n_bins=0)


def test_maintain_join_equals_full_join(spark):
    """The IVM identity must reproduce the direct join exactly,
    including the delta-delta cross term (counted once)."""
    from duckdb_graphar_spark.operators.cdc import maintain_join

    a = spark.createDataFrame([(i, i % 4) for i in range(20)], "aid long, k long")
    b = spark.createDataFrame([(k, 100 + k) for k in range(4)], "k long, payload long")
    a_old, a_delta = a.filter("aid % 5 < 4"), a.filter("aid % 5 >= 4")
    b_old, b_delta = b.filter("k < 3"), b.filter("k >= 3")
    view = a_old.join(b_old, "k").select("aid", "k", "payload")
    got = maintain_join(view, a_old, a_delta, b_old, b_delta, "k")
    want = a.join(b, "k").select("aid", "k", "payload")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_exact_quantiles_cont_matches_numpy(spark):
    """numpy's linear interpolation IS percentile_cont; bucket count
    must not change the answer."""
    import numpy as np

    from duckdb_graphar_spark.operators.quantiles import exact_quantiles_cont

    rng = np.random.default_rng(11)
    xs = rng.normal(size=101).round(4)
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    probs = [0.0, 0.25, 0.5, 0.913, 1.0]
    for nb in (3, 7, 32):
        got = {
            r.prob: r.value
            for r in exact_quantiles_cont(df, "x", probs, n_buckets=nb).collect()
        }
        for p in probs:
            want = float(np.quantile(xs, p, method="linear"))
            assert abs(got[p] - want) < 1e-9, (nb, p, got[p], want)
        assert all(
            r.n == 101
            for r in exact_quantiles_cont(df, "x", probs, n_buckets=nb).collect()
        )


def test_exact_quantiles_cont_interpolates_between_values(spark):
    """4 values [0, 10, 20, 30]: p=0.5 -> pos 1.5 -> 15.0 (a value NOT
    in the data — the defining difference from percentile_disc)."""
    from duckdb_graphar_spark.operators.quantiles import (
        exact_quantiles,
        exact_quantiles_cont,
    )

    df = spark.createDataFrame([(0.0,), (10.0,), (20.0,), (30.0,)], "x double")
    cont = exact_quantiles_cont(df, "x", [0.5]).collect()[0]
    disc = exact_quantiles(df, "x", [0.5]).collect()[0]
    assert cont.value == 15.0 and disc.value == 10.0


def test_exact_quantiles_cont_guards_and_empty(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.quantiles import exact_quantiles_cont

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError, match="probs"):
        exact_quantiles_cont(df, "x", [])
    with _pt.raises(ValueError, match="outside"):
        exact_quantiles_cont(df, "x", [1.5])
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles_cont(empty, "x", [0.5]).count() == 0


def test_grouped_quantile_disc_matches_sorted_selection(spark):
    """Per-group two-phase rank == per-group sorted element at
    floor((n-1)*p), across uneven group sizes, duplicate values, and a
    single-value group; NULLs excluded; empty input returns no rows."""
    from pyspark.sql import functions as F

    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    rows = []
    data = {
        "a": [5, 1, 9, 1, 7, 3, 3],     # n=7, median idx 3 -> sorted[3]=3
        "b": [10, 20],                  # n=2, idx floor(0.5)=0 -> 10
        "c": [4],                       # n=1 -> 4
    }
    for g, vals in data.items():
        rows += [(g, float(v)) for v in vals]
    rows.append(("a", None))
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.value, r.target_rank, r.n)
        for r in grouped_quantile_disc(df, ["g"], "v", 0.5, n_buckets=3).collect()
    }
    import math

    want = {}
    for g, vals in data.items():
        s = sorted(vals)
        n = len(s)
        idx = math.floor((n - 1) * 0.5)
        want[g] = (float(s[idx]), idx + 1, n)
    assert got == want

    empty = spark.createDataFrame([], "g string, v double")
    assert grouped_quantile_disc(empty, ["g"], "v", 0.5).count() == 0


def test_grouped_quantile_disc_null_group_key_survives(spark):
    """A NULL group key is a real group (PARTITION BY semantics): the
    null-safe stamp joins must carry it to the output instead of
    dropping it at the first equi-join."""
    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", 5.0),
        (None, 10.0), (None, 20.0), (None, 40.0), (None, 40.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.value, r.target_rank, r.n)
        for r in grouped_quantile_disc(df, ["g"], "v", 0.5, n_buckets=3).collect()
    }
    # NULL group: sorted [10, 20, 40, 40], n=4, idx floor(1.5)=1 -> 20
    assert got == {"a": (3.0, 2, 3), None: (20.0, 2, 4)}


def test_grouped_quantile_disc_multi_prob_matches_per_prob(spark):
    """A prob LIST shares one machinery pass and must return exactly the
    per-prob calls' rows (plus the prob column); scalar callers see the
    unchanged schema; duplicate/empty lists are rejected."""
    import pytest as _pt

    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    rows = [
        ("a", float(v)) for v in [5, 1, 9, 1, 7, 3, 3]
    ] + [("b", 10.0), ("b", 20.0), (None, 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = [0.05, 0.5, 0.95]
    multi = {
        (r.g, r.prob): (r.value, r.target_rank, r.n)
        for r in grouped_quantile_disc(df, ["g"], "v", probs, n_buckets=3).collect()
    }
    for p in probs:
        single = {
            (r.g, p): (r.value, r.target_rank, r.n)
            for r in grouped_quantile_disc(df, ["g"], "v", p, n_buckets=3).collect()
        }
        assert {k: v for k, v in multi.items() if k[1] == p} == single
    assert "prob" not in grouped_quantile_disc(df, ["g"], "v", 0.5).columns
    with _pt.raises(ValueError, match="non-empty"):
        grouped_quantile_disc(df, ["g"], "v", [])
    with _pt.raises(ValueError, match="duplicates"):
        grouped_quantile_disc(df, ["g"], "v", [0.5, 0.5])
    empty = spark.createDataFrame([], "g string, v double")
    assert grouped_quantile_disc(empty, ["g"], "v", [0.1, 0.9]).columns == [
        "g", "prob", "value", "target_rank", "n"
    ]


def test_grouped_quantile_disc_other_probs(spark):
    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "g string, v double"
    )
    for p, want in ((0.0, 1.0), (0.25, 3.0), (0.9, 9.0), (1.0, 10.0)):
        r = grouped_quantile_disc(df, ["g"], "v", p, n_buckets=4).collect()[0]
        assert r.value == want, (p, r.value)


def test_grouped_quantile_weighted_matches_expansion(spark):
    """Weighted quantile == unweighted quantile over the weight-expanded
    multiset (the definition, checked by literally expanding)."""
    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    rows = [("g", 10.0, 3), ("g", 20.0, 1), ("g", 30.0, 2), ("h", 5.0, 1)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    expanded = spark.createDataFrame(
        [(g, v) for g, v, w in rows for _ in range(w)], "g string, v double"
    )
    wq = {
        r.g: (r.value, r.target_rank, r.n)
        for r in grouped_quantile_disc(
            df, ["g"], "v", 0.5, weight_col="w", n_buckets=2
        ).collect()
    }
    uq = {
        r.g: (r.value, r.target_rank, r.n)
        for r in grouped_quantile_disc(expanded, ["g"], "v", 0.5, n_buckets=2).collect()
    }
    assert wq == uq
    # W=6 for g -> rank floor(5*0.5)+1 = 3 -> third expanded element = 10.0
    assert wq["g"] == (10.0, 3, 6)


def test_grouped_quantile_weight_contract(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.quantiles import grouped_quantile_disc

    fdf = spark.createDataFrame([("g", 1.0, 1.5)], "g string, v double, w double")
    with _pt.raises(TypeError, match="integral"):
        grouped_quantile_disc(fdf, ["g"], "v", 0.5, weight_col="w")
    missing = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with _pt.raises(ValueError, match="not in schema"):
        grouped_quantile_disc(missing, ["g"], "v", 0.5, weight_col="w")
    bad = spark.createDataFrame([("g", 1.0, 0)], "g string, v double, w long")
    with _pt.raises(Exception, match="non-positive weight"):
        grouped_quantile_disc(bad, ["g"], "v", 0.5, weight_col="w").collect()


def test_winsorize_entry_clamps_hand_fixture(spark):
    """q100's composition on a hand fixture: fences at floor((n-1)p)+1,
    values outside clamp to the fence, inside pass through."""
    import __spark_entry__ as entry

    # use the registry callable against the real sf0.001 fixture and
    # verify the clamp INVARIANTS (fences are group data elements,
    # winsorized in [p05, p95], inliers untouched)
    df = entry.queries()["q100_winsorize"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.p05_cents <= r.winsorized_cents <= r.p95_cents
        if r.p05_cents <= r.cents <= r.p95_cents:
            assert r.winsorized_cents == r.cents
        elif r.cents < r.p05_cents:
            assert r.winsorized_cents == r.p05_cents
        else:
            assert r.winsorized_cents == r.p95_cents
