"""CDC upsert: apply a change feed to a snapshot (MERGE semantics).

The warehouse companion to `events.scd2_intervals`: where SCD2 keeps
every historical state as a validity interval, `apply_changes` produces
the CURRENT snapshot — latest-change-wins per key, with deletes.  This
is the core of every lakehouse MERGE INTO / CDC-compaction job.

Scale shape: the change feed collapses to latest-per-key with ONE
map-combinable aggregate — ``max_by(struct(payload...), seq)`` — not a
window sort (partial aggregation discards superseded changes executor-
side before the shuffle, which matters when the feed has hot keys: a
key with 10⁶ updates ships O(partitions) rows, not 10⁶).  Then one
full-outer hash join against the snapshot on the key.  Both sides
shuffle on the same key; no broadcast assumption — at 100 TB both the
snapshot and the day's feed are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    *,
    key_col: str,
    seq_col: str,
    delete_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply ``changes`` to ``snapshot`` → the new snapshot:
    (key, payload..., op) where op ∈ {'keep', 'update', 'insert'}.

    - latest change per key wins (greatest ``seq_col``; ``seq_col`` must
      be unique per key — a CDC log sequence number is);
    - a latest change with ``delete_col`` true removes the key;
    - keys untouched by the feed pass through as 'keep'.
    """
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    latest = changes.groupBy(F.col(key_col).alias("__k")).agg(
        F.max_by(
            F.struct(
                F.col(delete_col).alias("__del"),
                *[F.col(c).alias(c) for c in payload_cols],
            ),
            F.col(seq_col),
        ).alias("__ch")
    )
    c = latest.select(
        "__k",
        F.lit(1).alias("__in_c"),
        F.col("__ch.__del").alias("__del"),
        *[F.col(f"__ch.{p}").alias(f"__c_{p}") for p in payload_cols],
    )
    s = snapshot.select(
        F.col(key_col).alias("__k"),
        F.lit(1).alias("__in_s"),
        *[F.col(p).alias(f"__s_{p}") for p in payload_cols],
    )
    j = s.join(c, "__k", "full_outer")
    alive = j.filter(F.col("__del").isNull() | ~F.col("__del"))
    op = (
        F.when(F.col("__in_c").isNull(), F.lit("keep"))
        .when(F.col("__in_s").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return alive.select(
        F.col("__k").alias(key_col),
        *[
            F.when(F.col("__in_c").isNotNull(), F.col(f"__c_{p}"))
            .otherwise(F.col(f"__s_{p}"))
            .alias(p)
            for p in payload_cols
        ],
        op.alias("op"),
    )


def maintain_agg(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    n_col: str = "n",
    sum_col: str = "sum_scaled",
    value_col: str = "x",
    op_col: str = "op",
) -> DataFrame:
    """Incremental aggregate (materialized-view) maintenance: apply a
    CDC change batch to a pre-aggregated (keys..., n, sum_scaled) base
    WITHOUT rescanning the base fact table — the warehouse pattern that
    turns an O(fact) refresh into O(delta).

    ``changes`` rows carry ``op`` ∈ {'insert', 'delete'} and a
    fixed-point LONG ``value_col``; count and sum deltas are signed
    integer aggregates (map-combinable, exact — insert-then-delete of
    the same row cancels bit-exactly, which float sums cannot
    guarantee).  Keys whose count reaches zero drop out; new keys
    appear via the full outer join.  Raises on any unknown op at plan
    time via a guarded CASE (no silent row drops).

    Scale shape: one groupBy over the DELTA only + one key-keyed outer
    join against the (already small) aggregate table."""
    s = F.when(F.col(op_col) == "insert", F.lit(1)).when(
        F.col(op_col) == "delete", F.lit(-1)
    ).otherwise(
        F.raise_error(F.concat(F.lit("maintain_agg: unknown op "), F.col(op_col)))
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(s).alias("__dn"),
        F.sum(s * F.col(value_col)).alias("__dsum"),
    )
    merged = base.join(delta, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce("__dn", F.lit(0)))
        .cast("long")
        .alias(n_col),
        (F.coalesce(F.col(sum_col), F.lit(0)) + F.coalesce("__dsum", F.lit(0)))
        .cast("long")
        .alias(sum_col),
    )
    # A key whose merged count goes NEGATIVE means the CDC feed is
    # corrupt (a delete without its matching insert) — surface it
    # rather than silently dropping the key with the legitimate
    # reached-zero rows.
    checked = merged.withColumn(
        n_col,
        F.when(
            F.col(n_col) < 0,
            F.raise_error(
                F.concat(
                    F.lit("maintain_agg: negative merged count "),
                    F.col(n_col).cast("string"),
                    F.lit(" (delete without matching insert)"),
                )
            ).cast("long"),
        ).otherwise(F.col(n_col)),
    )
    return checked.filter(F.col(n_col) > 0)


def maintain_join(
    view: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Insert-only incremental JOIN view maintenance (the IVM identity
    Δ(A⋈B) = ΔA⋈B' ∪ A⋈ΔB with B' = B∪ΔB — the ΔA⋈ΔB cross term
    lands exactly once, inside the first delta join):

        new_view = view ∪ (ΔA ⋈ (B ∪ ΔB)) ∪ (A ⋈ ΔB)

    Callers pass the PRE-update ``b_old`` and its delta; the post-update
    B' union happens here, so the identity cannot be misapplied (passing
    a stale B would silently lose every ΔA⋈ΔB cross-term row, with no
    error to catch it).

    Refreshing A⋈B costs two DELTA-sized joins instead of re-joining
    the full tables — at 100 TB the difference between touching the
    day's increment and recomputing the warehouse.  All inputs must
    share the view's projected columns after the join; deletes need
    the signed-multiplicity generalization (see :func:`maintain_agg`
    for the signed pattern) and are out of scope here.

    Scale shape: the delta sides are small by construction — Spark's
    planner (AQE) broadcasts them, so neither full table reshuffles."""
    cols = view.columns
    t1 = a_delta.join(b_old.unionByName(b_delta), on).select(*cols)
    t2 = a_old.join(b_delta, on).select(*cols)
    return view.unionByName(t1).unionByName(t2)
