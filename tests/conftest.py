import os

import numpy as np
import pyarrow as pa
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from duckdb_graphar_spark.session import get_spark

    s = get_spark("tests")
    yield s


def make_graph_arrays(n: int = 2000):
    """Deterministic graph per FIXTURES.md §A: power-law-ish out-degrees,
    dst = (src*31 + k*17 + 7) mod N, hubs at v % 997 == 0."""
    deg = 1 + (np.arange(n) ** 2 % 37) % 20
    deg[np.arange(n) % 997 == 0] = 500
    src = np.repeat(np.arange(n), deg)
    k = np.concatenate([np.arange(d) for d in deg])
    dst = (src * 31 + k * 17 + 7) % n
    return src.astype(np.int64), dst.astype(np.int64)


@pytest.fixture(scope="session")
def graph_fixture(tmp_path_factory):
    """A written GraphAr graph (FIXTURES.md §A1/§A2) + its ground-truth
    numpy arrays."""
    from duckdb_graphar_spark.graphar import EdgeSpec, VertexSpec, write_graph
    import datetime

    n = 2000
    src, dst = make_graph_arrays(n)
    idx = np.arange(n)
    vt = pa.table(
        {
            "hash_phone_no": pa.array(idx, pa.int64()),
            "name": pa.array([f"p{i}" for i in idx], pa.string()),
            "score": pa.array(np.round((idx * 7919 % 100000) / 1000.0, 6), pa.float64()),
            "signup_date": pa.array(
                [datetime.date(2020, 1, 1) + datetime.timedelta(days=int(i % 1460)) for i in idx],
                pa.date32(),
            ),
        }
    )
    out = tmp_path_factory.mktemp("graphar")
    gy = write_graph(
        str(out),
        "Fixture",
        {
            "Person": VertexSpec(
                vt, chunk_size=256, property_groups=[["hash_phone_no", "name"], ["score", "signup_date"]]
            )
        },
        {
            ("Person", "knows", "Person"): EdgeSpec(
                src, dst, chunk_size=1024, src_chunk_size=256, dst_chunk_size=256
            )
        },
    )
    return {"yaml": gy, "n": n, "src": src, "dst": dst, "vtable": vt}


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
