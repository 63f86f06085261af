"""Skew mitigation: explicit key salting for shuffles AQE can't fix.

AQE's skew-join split (enabled in `session.py`) handles sort-merge
joins by splitting oversized partitions at runtime, but it cannot help
(a) shuffle-based aggregations whose accumulators are non-algebraic
(collect_list/collect_set carry every row to one reducer per key) or
(b) joins where one key holds so much of the data that even a split
partition's build side is a single hot task.  Explicit salting spreads
ONE logical key over ``salt`` shuffle partitions:

- `salted_join`: the skewed (probe) side gets a uniform per-row salt;
  the other side is replicated ``salt`` times (explode over a
  sequence), and the join key becomes (key, salt).  Output rows are
  identical to the unsalted join — salt only changes partitioning —
  so the operator is oracle-checkable against the plain join.
- `salted_collect_list`: two-phase list aggregation — partial
  collect_list per (key, salt), then flatten per key — so no single
  task materializes a hot key's full row set while shuffling.

Scale notes (100 TB): replication multiplies the small side by
``salt`` — keep `salt * |small|` well under the fact side (for a
broadcast-sized small side, prefer `broadcast()`; salting is for
mid-sized build sides that shuffle).  Salt values come from a uniform
deterministic-per-run source (`rand(seed)`), never from the key itself
— salting by a key-derived hash would map each hot key back to a
single salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salt: int, *, seed: int = 42, col: str = "__salt") -> DataFrame:
    """Uniform int salt column in [0, salt)."""
    return df.withColumn(col, (F.rand(seed) * salt).cast("int"))


def replicate_for_salt(df: DataFrame, salt: int, *, col: str = "__salt") -> DataFrame:
    """Each row repeated once per salt value (build-side replication)."""
    return df.withColumn(col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt``
    partitions; result rows equal the unsalted ``skewed.join(other, on,
    how)``.  Supported ``how``: inner / left (the replicated side must
    be the non-preserved side)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    a = with_salt(skewed, salt, seed=seed)
    b = replicate_for_salt(other, salt)
    joined = a.join(b, keys + ["__salt"], how)
    return joined.drop("__salt")


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    *,
    salt: int = 16,
    seed: int = 42,
    sort_result: bool = True,
) -> DataFrame:
    """(key, list<value>) with two-phase collection: partial lists per
    (key, salt) bound each task's state to ~1/salt of a hot key's rows;
    the final phase flattens ``salt`` small lists per key.  With
    ``sort_result`` the array is sorted, making the output independent
    of salt assignment (deterministic, oracle-checkable)."""
    partial = (
        with_salt(df, salt, seed=seed)
        .groupBy(key, "__salt")
        .agg(F.collect_list(value).alias("__part"))
    )
    out = partial.groupBy(key).agg(
        F.flatten(F.collect_list("__part")).alias("values")
    )
    if sort_result:
        out = out.withColumn("values", F.sort_array("values"))
    return out
