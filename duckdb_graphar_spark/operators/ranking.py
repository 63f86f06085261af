"""Distributed global ranking: NTILE over a full table without the
single-task sort.

``NTILE(t) OVER (ORDER BY ...)`` — no PARTITION BY — is the canonical
warehouse scoring primitive (RFM quintiles, decile reports, equal-depth
binning).  Spark executes an unpartitioned window on ONE task: the
entire table shuffles to a single partition and sorts there, a
non-starter at 100 TB.  The ranking itself is embarrassingly
distributable, though, because a global rank is just

    rank(row) = (rows in earlier key ranges) + (rank within own range)

— the same two-phase decomposition as ``packing.pack_offsets``:

1. ``repartitionByRange`` on the full ordering key (value, id) —
   Spark's range partitioner samples boundaries, so skewed values
   spread across partitions as long as the composite key is unique
   (``id`` disambiguates ties: a single hot value CANNOT pin one
   partition);
2. pin the partitioning with a lazy ``localCheckpoint`` (the per-
   partition counts job materializes it) so pass 2 sees the SAME
   placement the counts were taken from;
3. per-partition counts — ``n_buckets`` rows — collected, turned into
   exclusive prefix offsets, broadcast back;
4. a PER-PARTITION window (partitionBy the partition id — parallel,
   bounded sorts) gives local row numbers; global 0-based rank =
   offset + local − 1;
5. the NTILE bucket is pure arithmetic on (rank, n, tiles) — the SQL
   standard's "first n MOD t buckets get one extra row" split.

Deterministic: the output depends only on the total order of
(value, id), never on where the sampled boundaries landed, so a plain
``NTILE() OVER (ORDER BY value, id)`` oracle verifies it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_ntile(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str,
    tiles: int,
    n_buckets: int | None = None,
    out_col: str = "tile",
) -> DataFrame:
    """Equal-depth bucket 1..``tiles`` per row by ascending
    (``value_col``, ``id_col``) → input columns + ``out_col``.

    ``id_col`` must be unique: it makes the ordering total, which is
    both what makes the result well-defined and what lets the range
    partitioner split a hot value across partitions."""
    if tiles < 1:
        raise ValueError("tiles must be >= 1")
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    part = (
        df.repartitionByRange(
            n_buckets, F.col(value_col).asc(), F.col(id_col).asc()
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["c"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offsets, acc = [], 0
    for pid in range(max(counts) + 1):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")

    w = Window.partitionBy("__pid").orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    size, extra = divmod(n, tiles)
    ranked = part.join(F.broadcast(off_df), "__pid").withColumn(
        "__r", F.col("__off") + F.row_number().over(w) - 1
    )
    if size == 0:
        # fewer rows than tiles: every row is its own bucket
        tile = F.col("__r") + 1
    else:
        # integer DIV, never double division: a double quotient can
        # misround at the bucket boundary once ranks pass 2^53-ish
        head = extra * (size + 1)
        tile = (
            F.when(
                F.col("__r") < F.lit(head).cast("long"),
                F.expr(f"__r DIV {size + 1}"),
            ).otherwise(F.lit(extra) + F.expr(f"(__r - {head}) DIV {size}"))
            + 1
        )
    return ranked.withColumn(out_col, tile.cast("long")).drop(
        "__pid", "__off", "__r"
    )
