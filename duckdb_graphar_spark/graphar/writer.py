"""GraphAr `gar/v1` fixture writer.

The reference is read-only (every write throws,
`src/storage/graphar_catalog.cpp:61-81`), but its test data blobs are
stripped from the snapshot, so we need a writer to produce GraphAr-layout
fixtures for our own tests.  This is a driver-side pyarrow utility sized
for test fixtures; a distributed writer would be `df.write.parquet` +
chunk renaming and is out of parity scope (SURVEY §2.A6).

Layout written (see metadata.py docstring): parquet chunk files,
ASCII-int count files, `gar/v1` YAML metadata.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import yaml

from duckdb_graphar_spark.graphar.metadata import (
    DST_INDEX_COL,
    OFFSET_COL,
    SRC_INDEX_COL,
)

# Arrow type -> GraphAr declared type (reference map src/utils/func.cpp:30-40).
_ARROW_TO_GRAPHAR = {
    pa.bool_(): "bool",
    pa.int32(): "int32",
    pa.int64(): "int64",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.date32(): "date",
    pa.date64(): "date",
}


def _graphar_type(t: pa.DataType) -> str:
    for k, v in _ARROW_TO_GRAPHAR.items():
        if t.equals(k):
            return v
    raise NotImplementedError(f"arrow type {t} has no GraphAr mapping")


@dataclass
class VertexSpec:
    """One vertex type: `table` holds property columns in vertex-index order
    (row r == vertex index r). `property_groups` optionally splits columns
    into groups (list of column-name lists); default = one group per column,
    mirroring the reference fixture (one group `hash_phone_no/`).
    `file_type` ∈ parquet|orc|csv|json (reference A4: any Arrow-readable
    chunk format, `edges_vertex.cpp:162-165`)."""

    table: pa.Table
    chunk_size: int = 1024
    property_groups: list[list[str]] | None = None
    file_type: str = "parquet"


@dataclass
class EdgeSpec:
    """One edge triple: parallel int64 arrays src/dst (any order; the writer
    sorts per layout), plus optional property columns aligned with the
    *input* edge order."""

    src: np.ndarray
    dst: np.ndarray
    chunk_size: int = 4096
    src_chunk_size: int = 1024
    dst_chunk_size: int = 1024
    layouts: tuple[str, ...] = ("src", "dst")  # ordered_by_source / ordered_by_dest
    properties: pa.Table | None = None
    directed: bool = True
    file_type: str = "parquet"


def _write_chunk_file(table: pa.Table, path: str, file_type: str) -> None:
    """Write one chunk in any of the reference-supported formats (A4)."""
    if file_type == "parquet":
        pq.write_table(table, path)
    elif file_type == "orc":
        from pyarrow import orc

        orc.write_table(table, path)
    elif file_type == "csv":
        from pyarrow import csv as pacsv

        pacsv.write_csv(table, path)
    elif file_type == "json":
        # GraphAr json = line-delimited records; dates serialized ISO
        cols = {}
        for name in table.column_names:
            col = table.column(name)
            cols[name] = col.cast(pa.string()) if pa.types.is_date(col.type) else col
        pa.table(cols).to_pandas().to_json(path, orient="records", lines=True)
    else:
        raise NotImplementedError(f"chunk file_type {file_type!r}")


def write_graph(
    out_dir: str,
    name: str,
    vertices: dict[str, VertexSpec],
    edges: dict[tuple[str, str, str], EdgeSpec] | None = None,
) -> str:
    """Write a GraphAr graph; returns the path of the graph YAML."""
    os.makedirs(out_dir, exist_ok=True)
    vertex_yamls, edge_yamls = [], []

    for vtype, spec in vertices.items():
        vertex_yamls.append(_write_vertex(out_dir, vtype, spec))

    vcounts = {vtype: spec.table.num_rows for vtype, spec in vertices.items()}
    for triple, spec in (edges or {}).items():
        edge_yamls.append(_write_edge(out_dir, triple, spec, vcounts))

    graph_yaml = os.path.join(out_dir, f"{name}.yaml")
    with open(graph_yaml, "w") as f:
        yaml.safe_dump(
            {
                "name": name,
                "version": "gar/v1",
                "vertices": vertex_yamls,
                "edges": edge_yamls,
            },
            f,
        )
    return graph_yaml


def _write_chunks(
    table: pa.Table, directory: str, chunk_size: int, file_type: str = "parquet"
) -> None:
    os.makedirs(directory, exist_ok=True)
    n = table.num_rows
    nchunks = max(1, -(-n // chunk_size))
    for i in range(nchunks):
        chunk = table.slice(i * chunk_size, chunk_size)
        _write_chunk_file(chunk, os.path.join(directory, f"chunk{i}"), file_type)


def _write_count(path: str, value: int) -> None:
    with open(path, "w") as f:
        f.write(str(value))


def _write_vertex(out_dir: str, vtype: str, spec: VertexSpec) -> str:
    prefix = f"vertex/{vtype}/"
    vdir = os.path.join(out_dir, prefix)
    os.makedirs(vdir, exist_ok=True)
    groups = spec.property_groups or [[c] for c in spec.table.column_names]
    pg_meta = []
    for cols in groups:
        pg_prefix = "_".join(cols) + "/"
        sub = spec.table.select(cols)
        _write_chunks(sub, os.path.join(vdir, pg_prefix), spec.chunk_size, spec.file_type)
        pg_meta.append(
            {
                "prefix": pg_prefix,
                "file_type": spec.file_type,
                "properties": [
                    {
                        "name": c,
                        "data_type": _graphar_type(sub.schema.field(c).type),
                        "is_primary": False,
                        "is_nullable": True,
                    }
                    for c in cols
                ],
            }
        )
    _write_count(os.path.join(vdir, "vertex_count"), spec.table.num_rows)

    vy = f"{vtype}.vertex.yaml"
    with open(os.path.join(out_dir, vy), "w") as f:
        yaml.safe_dump(
            {
                "type": vtype,
                "version": "gar/v1",
                "chunk_size": spec.chunk_size,
                "prefix": prefix,
                "property_groups": pg_meta,
            },
            f,
        )
    return vy


def _write_edge(
    out_dir: str,
    triple: tuple[str, str, str],
    spec: EdgeSpec,
    vcounts: dict[str, int],
) -> str:
    src_type, edge_type, dst_type = triple
    prefix = f"edge/{src_type}_{edge_type}_{dst_type}/"
    src = np.asarray(spec.src, dtype=np.int64)
    dst = np.asarray(spec.dst, dtype=np.int64)

    for aligned_by in spec.layouts:
        adj_prefix = "ordered_by_source/" if aligned_by == "src" else "ordered_by_dest/"
        adir = os.path.join(out_dir, prefix, adj_prefix)
        key, other = (src, dst) if aligned_by == "src" else (dst, src)
        aligned_chunk = spec.src_chunk_size if aligned_by == "src" else spec.dst_chunk_size
        n_aligned_vertices = vcounts[src_type if aligned_by == "src" else dst_type]

        order = np.lexsort((other, key))
        s_sorted, d_sorted = src[order], dst[order]
        key_sorted = key[order]
        props_sorted = spec.properties.take(pa.array(order)) if spec.properties is not None else None

        n_parts = max(1, -(-n_aligned_vertices // aligned_chunk))
        # part i = edges whose aligned vertex is in vertex chunk i
        part_bounds = np.searchsorted(key_sorted, np.arange(0, (n_parts + 1) * aligned_chunk, aligned_chunk))
        for part in range(n_parts):
            lo, hi = int(part_bounds[part]), int(part_bounds[part + 1])
            part_tbl = pa.table(
                {
                    SRC_INDEX_COL: pa.array(s_sorted[lo:hi], pa.int64()),
                    DST_INDEX_COL: pa.array(d_sorted[lo:hi], pa.int64()),
                }
            )
            _write_chunks(part_tbl, os.path.join(adir, "adj_list", f"part{part}"), spec.chunk_size, spec.file_type)
            _write_count(os.path.join(adir, f"edge_count{part}"), hi - lo)
            if props_sorted is not None:
                for col in props_sorted.column_names:
                    _write_chunks(
                        props_sorted.select([col]).slice(lo, hi - lo),
                        os.path.join(adir, f"{col}/", f"part{part}"),
                        spec.chunk_size,
                        spec.file_type,
                    )
            # offset chunk: aligned_chunk+1 cumulative counts relative to part start
            vlo = part * aligned_chunk
            vhi = min(vlo + aligned_chunk, n_aligned_vertices)
            offs = np.searchsorted(key_sorted[lo:hi], np.arange(vlo, vhi + 1))
            off_tbl = pa.table({OFFSET_COL: pa.array(offs, pa.int64())})
            odir = os.path.join(adir, "offset")
            os.makedirs(odir, exist_ok=True)
            _write_chunk_file(off_tbl, os.path.join(odir, f"chunk{part}"), spec.file_type)
        _write_count(os.path.join(adir, "vertex_count"), n_aligned_vertices)

    pg_meta = []
    if spec.properties is not None:
        for col in spec.properties.column_names:
            pg_meta.append(
                {
                    "prefix": f"{col}/",
                    "file_type": spec.file_type,
                    "properties": [
                        {
                            "name": col,
                            "data_type": _graphar_type(spec.properties.schema.field(col).type),
                            "is_primary": False,
                            "is_nullable": True,
                        }
                    ],
                }
            )

    ey = f"{src_type}_{edge_type}_{dst_type}.edge.yaml"
    with open(os.path.join(out_dir, ey), "w") as f:
        yaml.safe_dump(
            {
                "src_type": src_type,
                "edge_type": edge_type,
                "dst_type": dst_type,
                "version": "gar/v1",
                "directed": spec.directed,
                "chunk_size": spec.chunk_size,
                "src_chunk_size": spec.src_chunk_size,
                "dst_chunk_size": spec.dst_chunk_size,
                "prefix": prefix,
                "adj_lists": [
                    {
                        "aligned_by": ab,
                        "ordered": True,
                        "file_type": spec.file_type,
                        "prefix": "ordered_by_source/" if ab == "src" else "ordered_by_dest/",
                    }
                    for ab in spec.layouts
                ],
                "property_groups": pg_meta,
            },
            f,
        )
    return ey
