"""duckdb_graphar_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the ``lithium-tech/duckdb-graphar``
DuckDB extension, re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is a DuckDB extension that
reads Apache GraphAr graph data and adds graph-traversal operators; all
relational processing is delegated to the host engine.  Here the host
engine is Spark SQL / Catalyst:

- ``graphar`` — GraphAr metadata parsing, vertex/edge readers with
  chunk-level file pruning (the CSR "seek" equivalent), catalog attach.
- ``operators`` — graph algorithms (degrees, k-hop, BFS) as DataFrame
  pipelines, plus LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``streaming`` — Structured Streaming operators (windows, watermark,
  stateful dedup).
- ``functions`` — scalar helpers mirroring the reference's scalar UDFs.
"""

from duckdb_graphar_spark.session import get_spark

__all__ = ["get_spark", "ship_to_workers"]
__version__ = "0.1.0"


def ship_to_workers(spark) -> None:
    """Make this package importable inside Spark's Python workers even when
    the driver's session was built without the repo on PYTHONPATH (e.g. the
    correctness harness constructs its own bare SparkSession).

    Worker-side code — the GraphAr Python DataSource, pandas UDFs, UDTFs —
    is cloudpickled *by reference* to module-level definitions, so the
    worker process must be able to ``import duckdb_graphar_spark``.  A
    runtime ``sc.addPyFile`` of a package zip (plus ``__spark_entry__.py``
    for the registry-defined UDTF classes) is the session-agnostic fix:
    files added this way land on every executor's python path, locally and
    on a real cluster alike.  Idempotent per SparkContext.
    """
    import hashlib
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_dgs_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    members = []
    digest = hashlib.sha256()
    for dirpath, _dirs, files in os.walk(pkg_dir):
        for fname in sorted(files):
            if fname.endswith(".py"):
                full = os.path.join(dirpath, fname)
                members.append(full)
                digest.update(full.encode())
                with open(full, "rb") as fh:
                    digest.update(fh.read())
    # Content-addressed name: executors fetch from this path lazily (it
    # must outlive the session, so it is NOT deleted), and every process
    # shipping identical package bytes reuses the same file — one zip per
    # package version on disk, never one per process, and no
    # same-name/different-content clash across concurrent sessions.
    zpath = os.path.join(
        tempfile.gettempdir(), f"dgs_pkg_{digest.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full in members:
                # fixed timestamp → byte-identical zips from identical
                # sources, so concurrent builders can't race Spark's
                # fetched-copy content check
                info = zipfile.ZipInfo(os.path.relpath(full, root), (2020, 1, 1, 0, 0, 0))
                with open(full, "rb") as fh:
                    z.writestr(info, fh.read())
        os.replace(tmp, zpath)  # atomic: concurrent builders agree
    sc.addPyFile(zpath)
    entry = os.path.join(root, "__spark_entry__.py")
    if os.path.exists(entry):
        sc.addPyFile(entry)
    sc._dgs_pkg_shipped = True
