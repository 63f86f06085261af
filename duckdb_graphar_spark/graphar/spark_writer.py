"""Distributed GraphAr writer: DataFrame → GraphAr `gar/v1` layout.

The reference has NO write path at all (every write throws,
`src/storage/graphar_catalog.cpp:61-81`, `graphar_transaction.cpp:28-34`);
this module exceeds parity with a Spark-first sink so a pipeline can
round-trip graph data at scale (SURVEY §2.A6: "Spark writer would be
`df.write.parquet` plus YAML emit").

Scale design (100 TB):

- **Vertices: one shuffle total.**  Rows are grouped by chunk id
  (``vid // chunk_size``) and each group — a complete chunk — is written
  by one task via ``applyInPandas``: every property group's chunk file
  comes out of the same pandas frame, so adding property groups costs no
  extra shuffle or scan.
- **Edges: one shuffle per layout.**  Rows are grouped by part id
  (aligned-vertex chunk); inside a part one task sorts by (key, other),
  slices the adjacency chunks, the per-column property chunks, computes
  the CSR/CSC offset array from within-part degrees, and writes the
  ``edge_count{i}`` file.  Parts are the format's own parallelism unit —
  at 1000 executors, 1000 parts write concurrently.  Per-task memory is
  bounded by ``src_chunk_size × max_degree`` rows; shrink the aligned
  chunk size for very hot graphs.
- **Empty parts/chunks still materialize** (sentinel seeding) — the
  layout requires offset/adjacency files for every vertex chunk.
- Executors write directly to the (shared) filesystem; no driver-side
  data movement.  Only YAML metadata and count files are driver-written.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import yaml

from pyspark.sql import DataFrame, functions as F, types as T

from duckdb_graphar_spark.graphar.metadata import (
    DST_INDEX_COL,
    OFFSET_COL,
    SRC_INDEX_COL,
    VERTEX_INDEX_COL,
)
from duckdb_graphar_spark.graphar.writer import _write_chunk_file

# Spark type -> GraphAr declared type (inverse of metadata.GRAPHAR_TO_SPARK;
# reference map src/utils/func.cpp:18-28 — anything else is unsupported).
_SPARK_TO_GRAPHAR = {
    T.BooleanType(): "bool",
    T.IntegerType(): "int32",
    T.LongType(): "int64",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.DateType(): "date",
}

_GRAPHAR_TO_ARROW = {
    "bool": pa.bool_(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "date": pa.date32(),
}


def _graphar_type_of(spark_type: T.DataType) -> str:
    for k, v in _SPARK_TO_GRAPHAR.items():
        if spark_type == k:
            return v
    raise NotImplementedError(
        f"Spark type {spark_type} has no GraphAr mapping "
        "(reference supports bool/int32/int64/float/double/string/date, "
        "src/utils/func.cpp:27)"
    )


def _arrow_table(pdf, cols: list[str], types: list[str]) -> pa.Table:
    arrays = [
        pa.array(pdf[c].tolist(), _GRAPHAR_TO_ARROW[t]) for c, t in zip(cols, types)
    ]
    return pa.table(dict(zip(cols, arrays)))


def with_dense_index(
    df: DataFrame, order_by: list[str], index_col: str = VERTEX_INDEX_COL
) -> DataFrame:
    """Attach a dense 0..n-1 int64 index ordered by ``order_by`` WITHOUT a
    single-partition global sort: range-repartition on the key, count
    rows per partition (tiny driver state: one long per partition), then
    add each partition's base offset to a partition-local running index.
    The classic zipWithIndex two-pass, Arrow-vectorized."""
    from pyspark.sql.functions import spark_partition_id

    rp = (
        df.repartitionByRange(*[F.col(c) for c in order_by])
        .sortWithinPartitions(*order_by)
        .persist()
    )
    sizes = {
        r["pid"]: r["n"]
        for r in rp.groupBy(spark_partition_id().alias("pid")).count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    bases = {}
    acc = 0
    for pid in sorted(sizes):
        bases[pid] = acc
        acc += sizes[pid]
    bases_bc = df.sparkSession.sparkContext.broadcast(bases)

    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(index_col, T.LongType(), False)])

    def assign(pdf_iter):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bases_bc.value.get(pid, 0)
        seen = 0
        for pdf in pdf_iter:
            pdf = pdf.copy()
            pdf[index_col] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return rp.mapInPandas(assign, out_schema)


def write_vertices_dist(
    df: DataFrame,
    out_dir: str,
    vtype: str,
    *,
    index_col: str = VERTEX_INDEX_COL,
    chunk_size: int = 1024,
    property_groups: list[list[str]] | None = None,
    file_type: str = "parquet",
) -> str:
    """Write one vertex type distributedly; returns the vertex YAML name.

    ``df`` must carry a dense 0..n-1 ``index_col`` (use
    :func:`with_dense_index` to create one).  Property columns = all
    columns except the index."""
    prop_cols = [c for c in df.columns if c != index_col]
    groups = property_groups or [[c] for c in prop_cols]
    gtypes = {
        f.name: _graphar_type_of(f.dataType) for f in df.schema.fields if f.name != index_col
    }
    prefix = f"vertex/{vtype}/"
    vdir = os.path.join(out_dir, prefix)
    os.makedirs(vdir, exist_ok=True)
    n = df.count()

    group_specs = [("_".join(cols) + "/", cols, [gtypes[c] for c in cols]) for cols in groups]

    def write_chunk(key, pdf):
        import pandas as pd

        chunk = int(key[0])
        pdf = pdf.sort_values(index_col)
        for pg_prefix, cols, types in group_specs:
            d = os.path.join(vdir, pg_prefix)
            os.makedirs(d, exist_ok=True)
            _write_chunk_file(_arrow_table(pdf, cols, types), os.path.join(d, f"chunk{chunk}"), file_type)
        return pd.DataFrame({"chunk": [chunk], "rows": [len(pdf)]})

    written = (
        df.withColumn("__chunk", (F.col(index_col) / chunk_size).cast("long"))
        .groupBy("__chunk")
        .applyInPandas(write_chunk, "chunk long, rows long")
    )
    n_written = written.agg(F.sum("rows")).first()[0]
    assert n_written == n, f"wrote {n_written} vertex rows, expected {n}"

    with open(os.path.join(vdir, "vertex_count"), "w") as f:
        f.write(str(n))

    vy = f"{vtype}.vertex.yaml"
    with open(os.path.join(out_dir, vy), "w") as f:
        yaml.safe_dump(
            {
                "type": vtype,
                "version": "gar/v1",
                "chunk_size": chunk_size,
                "prefix": prefix,
                "property_groups": [
                    {
                        "prefix": pg_prefix,
                        "file_type": file_type,
                        "properties": [
                            {"name": c, "data_type": t, "is_primary": False, "is_nullable": True}
                            for c, t in zip(cols, types)
                        ],
                    }
                    for pg_prefix, cols, types in group_specs
                ],
            },
            f,
        )
    return vy


def write_edges_dist(
    edges: DataFrame,
    out_dir: str,
    triple: tuple[str, str, str],
    vcounts: dict[str, int],
    *,
    src_col: str = SRC_INDEX_COL,
    dst_col: str = DST_INDEX_COL,
    chunk_size: int = 4096,
    src_chunk_size: int = 1024,
    dst_chunk_size: int = 1024,
    layouts: tuple[str, ...] = ("src", "dst"),
    directed: bool = True,
    file_type: str = "parquet",
) -> str:
    """Write one edge triple distributedly (CSR and/or CSC layout);
    returns the edge YAML name.  Property columns = all columns except
    src/dst."""
    src_type, edge_type, dst_type = triple
    prefix = f"edge/{src_type}_{edge_type}_{dst_type}/"
    prop_cols = [c for c in edges.columns if c not in (src_col, dst_col)]
    ptypes = {
        f.name: _graphar_type_of(f.dataType) for f in edges.schema.fields if f.name in prop_cols
    }

    base = edges.select(
        F.col(src_col).cast("long").alias("__s"),
        F.col(dst_col).cast("long").alias("__d"),
        *[F.col(c) for c in prop_cols],
    )

    for aligned_by in layouts:
        adj_prefix = "ordered_by_source/" if aligned_by == "src" else "ordered_by_dest/"
        adir = os.path.join(out_dir, prefix, adj_prefix)
        os.makedirs(adir, exist_ok=True)
        aligned_chunk = src_chunk_size if aligned_by == "src" else dst_chunk_size
        n_aligned = vcounts[src_type if aligned_by == "src" else dst_type]
        n_parts = max(1, -(-n_aligned // aligned_chunk))
        key, other = ("__s", "__d") if aligned_by == "src" else ("__d", "__s")

        # sentinel row per part so empty parts still write their (empty)
        # adjacency chunk, all-zero offset chunk, and edge_count file
        sentinels = (
            edges.sparkSession.range(n_parts)
            .select(
                (F.col("id") * aligned_chunk).alias("__s"),
                F.lit(-1).cast("long").alias("__d"),
                *[F.lit(None).cast(dict(edges.dtypes)[c]).alias(c) for c in prop_cols],
            )
            if aligned_by == "src"
            else edges.sparkSession.range(n_parts).select(
                F.lit(-1).cast("long").alias("__s"),
                (F.col("id") * aligned_chunk).alias("__d"),
                *[F.lit(None).cast(dict(edges.dtypes)[c]).alias(c) for c in prop_cols],
            )
        )
        seeded = base.unionByName(sentinels)

        pcols = list(prop_cols)

        def make_write_part(_adir, _aligned_chunk, _n_aligned, _key, _other):
            # applyInPandas requires exactly (key, pdf) — bind the per-layout
            # values through this factory's closure
            def write_part(pkey, pdf):
                return _write_part_impl(pkey, pdf, _adir, _aligned_chunk, _n_aligned, _key, _other)

            return write_part

        def _write_part_impl(pkey, pdf, _adir, _aligned_chunk, _n_aligned, _key, _other):
            import pandas as pd

            part = int(pkey[0])
            real = pdf[pdf["__d" if _key == "__s" else "__s"] >= 0].sort_values(
                [_key, _other], kind="mergesort"
            )
            n_edges = len(real)
            # adjacency + property chunks
            n_chunks = max(1, -(-n_edges // chunk_size))
            part_dir = os.path.join(_adir, "adj_list", f"part{part}")
            os.makedirs(part_dir, exist_ok=True)
            for j in range(n_chunks):
                sl = real.iloc[j * chunk_size : (j + 1) * chunk_size]
                adj = pa.table(
                    {
                        SRC_INDEX_COL: pa.array(sl["__s"].to_numpy(dtype=np.int64), pa.int64()),
                        DST_INDEX_COL: pa.array(sl["__d"].to_numpy(dtype=np.int64), pa.int64()),
                    }
                )
                _write_chunk_file(adj, os.path.join(part_dir, f"chunk{j}"), file_type)
                for c in pcols:
                    pdir = os.path.join(_adir, f"{c}/", f"part{part}")
                    os.makedirs(pdir, exist_ok=True)
                    _write_chunk_file(
                        _arrow_table(sl, [c], [ptypes[c]]), os.path.join(pdir, f"chunk{j}"), file_type
                    )
            # offset chunk: aligned_chunk+1 part-relative cumulative counts
            vlo = part * _aligned_chunk
            vhi = min(vlo + _aligned_chunk, _n_aligned)
            keys = real[_key].to_numpy(dtype=np.int64)
            offs = np.searchsorted(keys, np.arange(vlo, vhi + 1))
            odir = os.path.join(_adir, "offset")
            os.makedirs(odir, exist_ok=True)
            _write_chunk_file(
                pa.table({OFFSET_COL: pa.array(offs, pa.int64())}),
                os.path.join(odir, f"chunk{part}"),
                file_type,
            )
            with open(os.path.join(_adir, f"edge_count{part}"), "w") as fh:
                fh.write(str(n_edges))
            return pd.DataFrame({"part": [part], "edges": [n_edges]})

        stats = (
            seeded.withColumn("__part", (F.col(key) / aligned_chunk).cast("long"))
            .groupBy("__part")
            .applyInPandas(
                make_write_part(adir, aligned_chunk, n_aligned, key, other),
                "part long, edges long",
            )
        )
        stats.agg(F.sum("edges")).first()  # trigger the distributed write

        with open(os.path.join(adir, "vertex_count"), "w") as f:
            f.write(str(n_aligned))

    ey = f"{src_type}_{edge_type}_{dst_type}.edge.yaml"
    with open(os.path.join(out_dir, ey), "w") as f:
        yaml.safe_dump(
            {
                "src_type": src_type,
                "edge_type": edge_type,
                "dst_type": dst_type,
                "version": "gar/v1",
                "directed": directed,
                "chunk_size": chunk_size,
                "src_chunk_size": src_chunk_size,
                "dst_chunk_size": dst_chunk_size,
                "prefix": prefix,
                "adj_lists": [
                    {
                        "aligned_by": ab,
                        "ordered": True,
                        "file_type": file_type,
                        "prefix": "ordered_by_source/" if ab == "src" else "ordered_by_dest/",
                    }
                    for ab in layouts
                ],
                "property_groups": [
                    {
                        "prefix": f"{c}/",
                        "file_type": file_type,
                        "properties": [
                            {
                                "name": c,
                                "data_type": ptypes[c],
                                "is_primary": False,
                                "is_nullable": True,
                            }
                        ],
                    }
                    for c in prop_cols
                ],
            },
            f,
        )
    return ey


def write_graph_dist(
    out_dir: str,
    name: str,
    vertices: dict[str, DataFrame],
    edges: dict[tuple[str, str, str], DataFrame] | None = None,
    *,
    vertex_chunk_size: int = 1024,
    edge_chunk_size: int = 4096,
    aligned_chunk_size: int = 1024,
    layouts: tuple[str, ...] = ("src", "dst"),
    file_type: str = "parquet",
    vertex_property_groups: dict[str, list[list[str]]] | None = None,
) -> str:
    """Write a whole graph distributedly; returns the graph YAML path.

    ``vertices[vtype]`` must carry a dense ``_graphArVertexIndex``
    (see :func:`with_dense_index`); ``edges[(src,etype,dst)]`` carries
    ``_graphArSrcIndex``/``_graphArDstIndex`` plus property columns.
    ``vertex_property_groups[vtype]`` optionally splits that type's
    property columns into column groups (default: one group per
    column)."""
    os.makedirs(out_dir, exist_ok=True)
    vertex_yamls, edge_yamls = [], []
    vcounts: dict[str, int] = {}
    for vtype, vdf in vertices.items():
        vertex_yamls.append(
            write_vertices_dist(
                vdf,
                out_dir,
                vtype,
                chunk_size=vertex_chunk_size,
                property_groups=(vertex_property_groups or {}).get(vtype),
                file_type=file_type,
            )
        )
        vcounts[vtype] = vdf.count()
    for triple, edf in (edges or {}).items():
        edge_yamls.append(
            write_edges_dist(
                edf,
                out_dir,
                triple,
                vcounts,
                chunk_size=edge_chunk_size,
                src_chunk_size=aligned_chunk_size,
                dst_chunk_size=aligned_chunk_size,
                layouts=layouts,
                file_type=file_type,
            )
        )
    graph_yaml = os.path.join(out_dir, f"{name}.yaml")
    with open(graph_yaml, "w") as f:
        yaml.safe_dump(
            {"name": name, "version": "gar/v1", "vertices": vertex_yamls, "edges": edge_yamls},
            f,
        )
    return graph_yaml
