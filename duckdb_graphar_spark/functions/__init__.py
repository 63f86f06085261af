"""Scalar functions mirroring the reference's scalar surface."""

from pyspark.sql import Column, functions as F


def duckdb_graphar(name: Column | str) -> Column:
    """Demo scalar function: `duckdb_graphar('Sam') = 'DuckDB_Graphar Sam 🐥'`
    (reference: `src/duckdb_graphar_extension.cpp:23-34`, test
    `config/test/sql/graphar/graphar_duck.test:14-18`).  Pure JVM-side
    expression — no Python UDF."""
    col = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lit("DuckDB_Graphar "), col, F.lit(" \U0001F425"))
