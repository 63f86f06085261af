"""As-of (point-in-time) join — the canonical timeseries operator Spark
has no built-in for.

Semantics (match DuckDB's `ASOF JOIN`): for each left row, attach the
single right row with the same key and the greatest right-timestamp
``<=`` the left timestamp; left rows with no prior right row are kept
with nulls (left variant) or dropped (inner variant).

Implementation is the UNION + ORDERED CARRY-FORWARD composition, not a
range join:

    tag left/right rows, union them, window over
    (key ORDER BY ts, right-before-left tiebreak) carrying the last
    right payload forward, keep the left rows.

Scale design (100 TB): exactly ONE shuffle (the window partitioning on
the key) regardless of timestamp distribution.  A range join
(`l.ts >= r.ts`) would be a broadcast-nested-loop or an interval
explosion; per-key `applyInPandas` merge-asof would move every byte
through Python.  The union keeps everything JVM-side: Tungsten sort
within partitions + `last(..., ignorenulls)` over a growing frame is
whole-stage-codegen'd.  Skewed keys behave like any window skew (one
key = one partition's sort run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join: left enriched with right_cols from the single
    matching right row per ``on`` key.

    ``direction``:
      - 'backward' (default): latest right row with right_ts <= left_ts
        (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``)
      - 'forward': earliest right row with right_ts >= left_ts
        (DuckDB ``ON l.ts <= r.ts``)
      - 'nearest': whichever of the two is closer in time; exact ties
        take the backward match (pandas merge_asof convention)

    ``how``: 'left' keeps unmatched left rows (null payload), 'inner'
    drops them — mirroring DuckDB `ASOF [LEFT] JOIN`.

    All three directions keep the single-shuffle shape: one window
    partitioning on the key; 'nearest' adds a second sort (descending)
    over the SAME partitioning — Catalyst plans both window nodes inside
    one exchange.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join direction must be backward/forward/nearest, got {direction!r}"
        )
    lcols = left.columns
    # the carried payload embeds the right timestamp (coerced to the
    # LEFT timestamp's type — long stays long, date widens to the left's
    # timestamp type) so 'nearest' can compare distances after both
    # carries without any session-TZ-dependent epoch conversion
    lts_type = left.schema[left_ts].dataType
    payload = F.struct(
        F.col(right_ts).cast(lts_type).alias("__rts"),
        F.struct(*right_cols).alias("__p"),
    )
    # __side orders right rows BEFORE left rows at equal timestamps so a
    # right row with ts == left ts is visible to that left row (ASOF's
    # inclusive contract, both directions)
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None)
        .cast(right.select(payload.alias("s")).schema["s"].dataType)
        .alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )
    u = l.unionByName(r)
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = Window.partitionBy("__k").orderBy("__ts", "__side").rowsBetween(*frame)
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), "__side")
        .rowsBetween(*frame)
    )
    if direction == "backward":
        u = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w_back))
    elif direction == "forward":
        u = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w_fwd))
    else:
        u = (
            u.withColumn("__b", F.last("__r", ignorenulls=True).over(w_back))
            .withColumn("__f", F.last("__r", ignorenulls=True).over(w_fwd))
            .withColumn(
                "__match",
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(
                    # tie → backward; same-type subtraction: numeric ts
                    # stays numeric, timestamp_ntz yields exact day-time
                    # intervals — no session-TZ involvement either way
                    (F.col("__l." + left_ts) - F.col("__b.__rts"))
                    <= (F.col("__f.__rts") - F.col("__l." + left_ts)),
                    F.col("__b"),
                )
                .otherwise(F.col("__f")),
            )
        )
    carried = u.filter(F.col("__side") == 1)
    if how == "inner":
        carried = carried.filter(F.col("__match").isNotNull())
    out_cols = [F.col(f"__l.{c}").alias(c) for c in lcols] + [
        F.col(f"__match.__p.{c}").alias(c) for c in right_cols
    ]
    return carried.select(*out_cols)


def gap_fill_interpolate(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Hypertable-style gap filling with linear interpolation
    (TimescaleDB's time_bucket_gapfill + interpolate, re-expressed):
    bucket each series, build the dense per-key grid between its first
    and last actual bucket, and fill missing buckets by interpolating
    between the ROUNDED neighboring actuals → (key, bucket_start, kind
    'actual'|'interp', value).

    Grid spans [min(actual), max(actual)] per key, so every gap has
    both neighbors — no edge-extrapolation policy to pin.  Using the
    published (round-6) actuals as interpolation endpoints makes the
    result independent of accumulation order on BOTH engines.

    Scale shape: one map-combinable bucket aggregate, a per-key bounds
    aggregate + sequence explode for the grid (grid size = key's time
    span, not row count), and per-key ordered windows for the
    neighbor carry — windows partition on the series key, the accepted
    time-series shape (per-key cardinality = buckets in range, bounded
    by retention, never by corpus size)."""
    sec = F.lit(int(bucket_seconds))
    k, b = F.col("__k"), F.col("__b")
    actual = (
        df.select(
            F.col(key_col).alias("__k"),
            F.floor(F.unix_timestamp(ts_col) / sec).alias("__b"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("__k", "__b")
        .agg(
            F.round(F.sum(F.col("__v").cast("decimal(26,8)")).cast("double"), 6).alias(
                "__v"
            )
        )
    )
    grid = (
        actual.groupBy("__k")
        .agg(F.min("__b").alias("__mn"), F.max("__b").alias("__mx"))
        .select("__k", F.explode(F.sequence("__mn", "__mx")).alias("__b"))
    )
    g = grid.join(actual, ["__k", "__b"], "left")
    w_prev = (
        Window.partitionBy("__k").orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # next-value lookup as a DESC-ordered RUNNING frame (last non-null
    # over [unbounded preceding, -1]): identical row set to the literal
    # [1, unbounded following] frame, but Spark re-scans the tail per
    # row for unbounded-FOLLOWING frames (O(rows²) on a hot key's
    # grid) while running frames are incremental O(rows)
    w_next = (
        Window.partitionBy("__k").orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hb = F.when(F.col("__v").isNotNull(), F.col("__b"))
    pv = F.last("__v", ignorenulls=True).over(w_prev)
    ph = F.last(hb, ignorenulls=True).over(w_prev)
    nv = F.last("__v", ignorenulls=True).over(w_next)
    nh = F.last(hb, ignorenulls=True).over(w_next)
    frac = (b - ph).cast("double") / (nh - ph).cast("double")
    # interp is published UNROUNDED: the endpoints are already round-6
    # engine-identical doubles and the op sequence is mirrored, so the
    # value is bit-identical across engines — while an engine-side
    # ROUND(x, 6) would SPLIT on exact .5e-6 boundaries (Spark HALF_UP
    # vs DuckDB's rounding of the same double disagreed on
    # 65.4046875 in the fixture)
    interp = pv + (nv - pv) * frac
    return g.select(
        F.col("__k").alias(key_col),
        F.timestamp_seconds(b * sec).alias("bucket_start"),
        F.when(F.col("__v").isNotNull(), F.lit("actual"))
        .otherwise(F.lit("interp"))
        .alias("kind"),
        F.coalesce("__v", interp).alias("value"),
    )
