"""Scalar functions mirroring the reference's scalar surface."""

from pyspark.sql import Column, functions as F


def duckdb_graphar(name: Column | str) -> Column:
    """Demo scalar function: `duckdb_graphar('Sam') = 'DuckDB_Graphar Sam 🐥'`
    (reference: `src/duckdb_graphar_extension.cpp:23-34`, test
    `config/test/sql/graphar/graphar_duck.test:14-18`).  Pure JVM-side
    expression — no Python UDF."""
    col = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lit("DuckDB_Graphar "), col, F.lit(" \U0001F425"))


def bal_span_udaf():
    """Grouped-agg pandas UDF (UDAF surface, SURVEY §2.D 'UDF surface'):
    max-min span of a long column — Arrow-batched, one scalar per group.
    Defined here (module WITHOUT `from __future__ import annotations`)
    because pandas_udf resolves the signature from live annotations."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def bal_span(v: pd.Series) -> int:
        return int(v.max() - v.min())

    return bal_span
