"""GraphAr vertex/edge scans as Spark DataFrames.

Replaces the reference's table functions `read_vertices` / `read_edges`
(`src/functions/table/read_vertices.cpp:35-140`,
`src/functions/table/read_edges.cpp:34-170`) with a metadata-driven file
listing feeding Spark's vectorized Parquet reader.

Design notes (Spark-first, 100 TB-aware):

- **Index reconstruction.** GraphAr stores no row ids; a row's vertex
  index is `chunk_no * chunk_size + position_in_chunk`
  (`include/utils/func.hpp:68-72`).  We recover it distributedly from the
  Parquet reader's hidden `_metadata.file_path` + `_metadata.row_index`
  columns — never `monotonically_increasing_id()`, so the result is
  deterministic under any task scheduling / file-split combination.
- **Property-group zip.** Each group is a separate chunked column file
  set; groups are re-joined on the computed index.  Only the groups
  containing requested columns are read at all (projection pushdown one
  step beyond the reference, which materializes selected columns but
  still opens every group reader — `read_base.hpp:309-311`).
- **CSR seek → file pruning.** A point lookup on the aligned index
  (`WHERE _graphArSrcIndex = k`) reads one offset chunk to get the row
  range, then lists only the adj_list chunk files covering that range —
  the Spark equivalent of the reference's offset-seek
  (`read_edges.cpp:114-153`).  At 100 TB this turns a full scan into
  O(range/chunk_size) file reads.
- **Layout selection.** Filtering on dst prefers the `ordered_by_dest`
  (CSC) layout, mirroring `read_edges.cpp:85-91`.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, functions as F

from duckdb_graphar_spark.graphar.metadata import (
    DST_INDEX_COL,
    GraphInfo,
    OFFSET_COL,
    SRC_INDEX_COL,
    VERTEX_INDEX_COL,
    EdgeInfo,
    Property,
    VertexInfo,
    arrow_type_for,
    chunk_index_of,
    list_chunks,
    list_parts,
)

from pyspark.sql import types as T

_CHUNK_NO = r"chunk(\d+)$"
_PART_NO = r"part(\d+)/[^/]*$"

_ADJ_FIELDS = [Property(SRC_INDEX_COL, "int64"), Property(DST_INDEX_COL, "int64")]
_OFFSET_FIELDS = [Property(OFFSET_COL, "int64")]


def _as_graph(graph: GraphInfo | str) -> GraphInfo:
    return graph if isinstance(graph, GraphInfo) else GraphInfo.load(graph)


def _with_chunk_cols(df: DataFrame) -> DataFrame:
    """Attach chunk number and in-chunk row position from file metadata."""
    return df.withColumns(
        {
            "__chunk": F.regexp_extract(F.col("_metadata.file_path"), _CHUNK_NO, 1).cast("long"),
            "__row": F.col("_metadata.row_index"),
        }
    )


def _arrow_read_table(path: str, file_type: str, fields: list[Property]):
    """Read one non-parquet chunk file through Arrow with the declared
    schema — parity with the reference's `fs->ReadFileToTable(path,
    file_type)` (`src/functions/table/edges_vertex.cpp:162-165`)."""
    import pyarrow as pa

    target = pa.schema([(p.name, arrow_type_for(p.data_type)) for p in fields])
    if file_type == "orc":
        from pyarrow import orc

        tbl = orc.read_table(path)
    elif file_type == "csv":
        from pyarrow import csv as pacsv

        tbl = pacsv.read_csv(
            path,
            convert_options=pacsv.ConvertOptions(
                column_types={p.name: arrow_type_for(p.data_type) for p in fields}
            ),
        )
    elif file_type == "json":
        from pyarrow import json as pajson

        tbl = pajson.read_json(path)
    else:
        raise NotImplementedError(f"chunk file_type {file_type!r}")
    return tbl.select([p.name for p in fields]).cast(target)


def _chunked_df(
    spark, files: list[str], file_type: str, fields: list[Property], *, with_part: bool = False
) -> DataFrame:
    """Chunk files → DataFrame(props..., __chunk long, __row long).

    Parquet goes through Spark's vectorized reader with the hidden
    `_metadata` columns providing the deterministic (chunk, row) address.
    ORC/CSV/JSON file sources don't expose `_metadata.row_index`, so those
    formats distribute the *file list* and read whole chunk files through
    Arrow inside `mapInPandas` — the row position is the enumeration
    order within one file, deterministic under any task scheduling, and
    memory is bounded by chunk_size rows per file."""
    extra = ["__chunk", "__row"] + (["__part"] if with_part else [])
    if file_type == "parquet":
        from duckdb_graphar_spark.graphar.metadata import spark_url

        # schema comes from the GraphAr metadata, not footer inference:
        # .schema(...) skips the planning-time footer read (~80 ms per
        # reader on a point lookup — most of the old sub-100 ms-query
        # floor); parquet columns resolve by name, and the hidden
        # _metadata struct is still available under an explicit schema
        sch = T.StructType(
            [T.StructField(p.name, p.spark_type, True) for p in fields]
        )
        df = _with_chunk_cols(
            spark.read.schema(sch).parquet(*[spark_url(f) for f in files])
        )
        if with_part:
            df = df.withColumn(
                "__part",
                F.regexp_extract(F.col("_metadata.file_path"), _PART_NO, 1).cast("long"),
            )
        return df.select(*[p.name for p in fields], *extra)

    import re as _re

    out_schema = T.StructType(
        [T.StructField(p.name, p.spark_type, True) for p in fields]
        + [T.StructField(c, T.LongType(), False) for c in extra]
    )
    pairs = [(f, chunk_index_of(f)) for f in files]
    parallelism = spark.sparkContext.defaultParallelism
    paths = spark.createDataFrame(pairs, "__path string, __chunkno long").repartition(
        min(len(pairs), parallelism), "__path"
    )

    def read_files(batches):
        for b in batches:
            for path, chunkno in zip(b["__path"], b["__chunkno"]):
                out = _arrow_read_table(path, file_type, fields).to_pandas()
                out["__chunk"] = int(chunkno)
                out["__row"] = range(len(out))
                if with_part:
                    m = _re.search(_PART_NO, path)
                    out["__part"] = int(m.group(1)) if m else 0
                yield out

    return paths.mapInPandas(read_files, out_schema)


def read_vertices(
    spark,
    graph: GraphInfo | str,
    vtype: str,
    *,
    columns: list[str] | None = None,
    vid: int | None = None,
) -> DataFrame:
    """Scan one vertex type → DataFrame(`_graphArVertexIndex` long, props...).

    Parity: reference `read_vertices(path, type=...)`
    (`src/functions/table/read_vertices.cpp:35-89`, output schema
    `:65-68`).  `vid=` replicates the pushed-down equality filter on the
    implicit index (`:98-108`) as chunk-file pruning; `columns=`
    replicates projection pushdown (`:124-125`) as property-group pruning.
    """
    g = _as_graph(graph)
    vi = g.vertices[vtype]
    n = g.vertex_count(vtype)
    if vid is not None and not (0 <= vid < n):
        # reference raises BinderException for out-of-range vid (read_vertices.cpp:101-104)
        raise ValueError(f"vertex id {vid} out of range [0, {n})")

    groups = vi.property_groups
    if columns is not None:
        wanted = set(columns) - {VERTEX_INDEX_COL}
        groups = [pg for pg in groups if any(p.name in wanted for p in pg.properties)]
        missing = wanted - {p.name for pg in groups for p in pg.properties}
        if missing:
            raise ValueError(f"unknown vertex properties: {sorted(missing)}")

    result: DataFrame | None = None
    for pg in groups:
        files = list_chunks(g.vertex_dir(vi, pg))
        if vid is not None:
            target = vid // vi.chunk_size
            files = [f for f in files if f.endswith(f"chunk{target}")]
        pdf = _chunked_df(spark, files, pg.file_type, pg.properties)
        pdf = pdf.select(
            (F.col("__chunk") * F.lit(vi.chunk_size) + F.col("__row")).alias(VERTEX_INDEX_COL),
            *[p.name for p in pg.properties],
        )
        if vid is not None:
            pdf = pdf.filter(F.col(VERTEX_INDEX_COL) == vid)
        result = pdf if result is None else result.join(pdf, VERTEX_INDEX_COL)

    if result is None:
        # no property groups requested → index-only frame from metadata
        result = spark.range(n).select(F.col("id").alias(VERTEX_INDEX_COL))
        if vid is not None:
            result = result.filter(F.col(VERTEX_INDEX_COL) == vid)

    order = [VERTEX_INDEX_COL] + [
        p.name for pg in groups for p in pg.properties
        if columns is None or p.name in columns
    ]
    return result.select(*order)


# offset-chunk cache: path -> (stat token, numpy offsets array); the
# array is one vertex-chunk of int64s (bounded), FIFO-capped at 16;
# mutations lock-guarded (concurrent driver threads both planning
# point lookups must not race the eviction)
import threading as _threading

_OFFSET_CACHE: dict[str, tuple[tuple, "object"]] = {}
_OFFSET_CACHE_LOCK = _threading.Lock()


def _offset_range(g: GraphInfo, ei: EdgeInfo, aligned_by: str, vid: int) -> tuple[int, int, int]:
    """Read one offset chunk (driver-side, tiny) → (part, lo, hi) row range
    relative to the part start.  Mirrors `read_edges.cpp:121-151`.

    The decoded offsets array is CACHED per chunk file (stat-validated,
    like `GraphInfo.load`'s cache): repeated point lookups on the same
    graph re-seek without re-reading the offset file."""
    from duckdb_graphar_spark.graphar.metadata import stat_token

    chunk_size = ei.src_chunk_size if aligned_by == "src" else ei.dst_chunk_size
    part = vid // chunk_size
    pos = vid % chunk_size
    path = g.offset_chunk_path(ei, aligned_by, part)
    tok = stat_token(path)
    if tok is not None:
        with _OFFSET_CACHE_LOCK:
            hit = _OFFSET_CACHE.get(path)
    else:
        hit = None
    if hit is not None and hit[0] == tok:
        offs = hit[1]
    else:
        ftype = ei.adj_list(aligned_by).file_type
        if ftype == "parquet":
            tbl = pq.read_table(path)
        else:
            tbl = _arrow_read_table(path, ftype, _OFFSET_FIELDS)
        offs = tbl.column(OFFSET_COL).to_numpy()
        if tok is not None:
            with _OFFSET_CACHE_LOCK:
                if len(_OFFSET_CACHE) >= 16:
                    _OFFSET_CACHE.pop(next(iter(_OFFSET_CACHE)), None)
                _OFFSET_CACHE[path] = (tok, offs)
    return part, int(offs[pos]), int(offs[pos + 1])


def read_edges(
    spark,
    graph: GraphInfo | str,
    src: str,
    edge_type: str,
    dst: str,
    *,
    src_vid: int | None = None,
    dst_vid: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan one edge triple → DataFrame(`_graphArSrcIndex`,
    `_graphArDstIndex` long, props...).

    Parity: reference `read_edges(path, src=, type=, dst=)`
    (`src/functions/table/read_edges.cpp:34-110`).  A point filter on
    src/dst picks the CSR/CSC layout (`:85-91`) and prunes to the adj_list
    chunk files covering `[offset[vid], offset[vid+1])` (`:114-153`).
    """
    g = _as_graph(graph)
    ei = g.edges[(src, edge_type, dst)]

    # Chunk pruning can use ONE point predicate (the one whose layout
    # exists); any other point predicate given is applied below as a row
    # filter — never silently dropped.
    if dst_vid is not None and ei.has_layout("dst"):
        aligned_by = "dst"
        point = dst_vid
    elif src_vid is not None and ei.has_layout("src"):
        aligned_by = "src"
        point = src_vid
    else:
        aligned_by = "src" if ei.has_layout("src") else "dst"
        point = None

    adj_root = os.path.join(g.adj_dir(ei, aligned_by), "adj_list")
    adj_ftype = ei.adj_list(aligned_by).file_type

    if point is not None:
        n = g.edge_aligned_vertex_count(ei, aligned_by)
        if not (0 <= point < n):
            raise ValueError(f"vertex id {point} out of range [0, {n})")
        part, lo, hi = _offset_range(g, ei, aligned_by, point)
        if lo >= hi:
            return spark.createDataFrame([], ei.schema())
        first, last = lo // ei.chunk_size, (hi - 1) // ei.chunk_size
        part_dir = os.path.join(adj_root, f"part{part}")
        files = [
            f for f in list_chunks(part_dir)
            if first <= int(f.rsplit("chunk", 1)[1]) <= last
        ]
        df = _chunked_df(spark, files, adj_ftype, _ADJ_FIELDS)
        df = df.withColumn("__erow", F.col("__chunk") * F.lit(ei.chunk_size) + F.col("__row"))
        df = df.filter((F.col("__erow") >= lo) & (F.col("__erow") < hi))
        df = df.withColumn("__part", F.lit(part))
    else:
        parts = list_parts(adj_root)
        files = [f for p in parts for f in list_chunks(os.path.join(adj_root, f"part{p}"))]
        df = _chunked_df(spark, files, adj_ftype, _ADJ_FIELDS, with_part=True)
        df = df.withColumn(
            "__erow", F.col("__chunk") * F.lit(ei.chunk_size) + F.col("__row")
        )

    # residual point predicates (the side NOT used for chunk pruning)
    if src_vid is not None and not (point is not None and aligned_by == "src"):
        df = df.filter(F.col(SRC_INDEX_COL) == src_vid)
    if dst_vid is not None and not (point is not None and aligned_by == "dst"):
        df = df.filter(F.col(DST_INDEX_COL) == dst_vid)

    groups = ei.property_groups
    if columns is not None:
        wanted = set(columns) - {SRC_INDEX_COL, DST_INDEX_COL}
        groups = [pg for pg in groups if any(p.name in wanted for p in pg.properties)]

    for pg in groups:
        pg_root = os.path.join(g.adj_dir(ei, aligned_by), pg.prefix)
        if point is not None:
            pfiles = [
                f for f in list_chunks(os.path.join(pg_root, f"part{part}"))
                if first <= int(f.rsplit("chunk", 1)[1]) <= last
            ]
            pdf = _chunked_df(spark, pfiles, pg.file_type, pg.properties).withColumns(
                {
                    "__erow": F.col("__chunk") * F.lit(ei.chunk_size) + F.col("__row"),
                    "__part": F.lit(part),
                }
            )
        else:
            pparts = list_parts(pg_root)
            pfiles = [f for p in pparts for f in list_chunks(os.path.join(pg_root, f"part{p}"))]
            pdf = _chunked_df(
                spark, pfiles, pg.file_type, pg.properties, with_part=True
            ).withColumn("__erow", F.col("__chunk") * F.lit(ei.chunk_size) + F.col("__row"))
        pdf = pdf.select("__part", "__erow", *[p.name for p in pg.properties])
        df = df.join(pdf, ["__part", "__erow"])

    prop_cols = [
        p.name for pg in groups for p in pg.properties
        if columns is None or p.name in columns
    ]
    out_cols = [SRC_INDEX_COL, DST_INDEX_COL] + prop_cols
    if columns is not None:
        out_cols = [c for c in out_cols if c in columns or c in (SRC_INDEX_COL, DST_INDEX_COL)]
    return df.select(*out_cols)
