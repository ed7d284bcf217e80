"""The DuckDB oracle for permute/randweights/hash-partition queries
relies on a HUGEINT transcription of splitmix64 (__ray_entry__._sm64_*).
Lock it bit-exact against the numpy implementation across the full
int64 id range — a transcription drift would silently flip those
oracles from 'verifying the engine' to 'agreeing with nothing'."""

import sys

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry  # noqa: E402
from totem_ray.hashing import as_u64, splitmix64  # noqa: E402


def _run_sm64_sql(ids: np.ndarray) -> np.ndarray:
    """Evaluate the SQL splitmix64 chain over int64 bit patterns and
    return the resulting int64 bit patterns."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(k, int(v)) for k, v in enumerate(ids)])
    ctes, last = entry._sm64_ctes("u", [("xu", "z")], "s")
    q = (f"WITH u AS (SELECT i, {entry._u64_sql('x')} AS xu FROM t),\n"
         f"{ctes}\n"
         f"SELECT i, {entry._i64_sql('z5')} AS y FROM {last} ORDER BY i")
    df = con.execute(q).fetchdf()
    return df["y"].to_numpy().astype(np.int64)


EDGE_IDS = np.array([0, 1, -1, 2**63 - 1, -(2**63), 42, -42,
                     0x9E3779B97F4A7C15 - 2**64, 2**62 + 12345],
                    dtype=np.int64)


def test_sm64_sql_matches_numpy_edge_cases():
    got = _run_sm64_sql(EDGE_IDS)
    exp = splitmix64(as_u64(EDGE_IDS)).view(np.int64)
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_sm64_sql_matches_numpy_property(vals):
    ids = np.array(vals, dtype=np.int64)
    got = _run_sm64_sql(ids)
    exp = splitmix64(as_u64(ids)).view(np.int64)
    np.testing.assert_array_equal(got, exp)


def test_randweights_double_conversion_matches_numpy():
    """The weight = h / 2^64 double conversion must round identically
    in DuckDB (CAST ... AS DOUBLE) and numpy (uint64 -> float64)."""
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(k, int(v)) for k, v in enumerate(h.view(np.int64))])
    df = con.execute(
        f"SELECT i, CAST({entry._u64_sql('x')} AS DOUBLE) / "
        f"18446744073709551616.0 AS w FROM t ORDER BY i").fetchdf()
    exp = h / np.float64(2**64)
    np.testing.assert_array_equal(df["w"].to_numpy(), exp)


def test_oracle_sql_strings_parse():
    """Every oracle statement must at least PREPARE against the table
    views (catches SQL syntax drift without running the heavy ones)."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'/root/testdata/sf0.001/{t}.parquet')")
    bad = []
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"PREPARE q AS {sql}")
            con.execute("DEALLOCATE q")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad
