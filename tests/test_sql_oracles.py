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


# ----------------------------------------------------------------------
# tabulation string hash (minhash/simhash token hashing) — the SQL
# transcription in _tok_hash_ctes must stay bit-exact with
# totem_ray.hashing.tab_hash_strings, and both must match a
# per-string pure-python reference of the published construction.
# ----------------------------------------------------------------------
def _ref_tab_hash(s: str, seed: int = 42) -> int:
    M = (1 << 64) - 1

    def sm(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & M
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & M
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & M
        x ^= x >> 31
        return x

    b = s.encode("utf-8")
    acc = 0
    for j, byte in enumerate(b):
        acc ^= sm((j << 8) | byte)
    h = sm(acc ^ sm(len(b) + seed))
    return h - (1 << 64) if h >= (1 << 63) else h


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_tab_hash_strings_matches_reference(strs):
    import pyarrow as pa

    from totem_ray.hashing import tab_hash_strings

    got = tab_hash_strings(pa.array(strs, type=pa.string()))
    exp = np.array([_ref_tab_hash(s) for s in strs], dtype=np.int64)
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_tok_hash_sql_matches_python():
    """_tok_hash_ctes (tokenize + tabulation hash in DuckDB) must
    reproduce the Python \\s+ token stream hashes exactly — this is
    the shared front-end of the doc_minhash_dedup / doc_simhash_pairs
    full-data oracles."""
    import re

    import pyarrow as pa

    from totem_ray.hashing import tab_hash_strings

    docs = [(1, "The quick  Brown fox\tjumps over the lazy dog"),
            (2, "  pad START mid END pad  "),
            (3, "one"),
            (4, ""),
            (5, "repeat repeat repeat xyzzy"),
            # unicode whitespace: VT, NBSP, U+2028 must all SPLIT in
            # both engines (RE2's bare \s would miss them — the
            # explicit TOKEN_SPLIT_RE class is what keeps parity)
            (6, "a\x0bb\u2028c\xa0d e\u3000f"),
            (7, "long" * 200 + " tail")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    frag, last = entry._tok_hash_ctes()
    df = con.execute(
        f"WITH {frag} SELECT doc_id, ord, {entry._i64_sql('th')} AS th "
        f"FROM {last} ORDER BY doc_id, ord").fetchdf()
    got = [(int(r.doc_id), int(r.ord), int(r.th))
           for r in df.itertuples()]
    from totem_ray.functions.dedup import TOKEN_SPLIT_RE

    exp = []
    for did, txt in docs:
        toks = [w for w in re.split(TOKEN_SPLIT_RE, txt.lower()) if w]
        if toks:
            hs = tab_hash_strings(pa.array(toks, type=pa.string()))
            exp += [(did, o, int(h)) for o, h in enumerate(hs, 1)]
    assert got == exp


@pytest.mark.parametrize("qname, oracle_fn", [
    ("doc_minhash_dedup", entry._minhash_dedup_oracle_sql),
    ("doc_simhash_pairs", entry._simhash_pairs_oracle_sql),
])
def test_dedup_full_data_oracles_match_pipeline(ray_session, qname, oracle_fn):
    """Run the REAL Ray pipeline and its full-data DuckDB oracle side
    by side at sf0.001 and require exact frame equality — the same
    check the driver performs at sf0.01."""
    sf = "/root/testdata/sf0.001"
    res = entry.queries()[qname](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    odf = con.execute(oracle_fn()).fetchdf()
    cols = sorted(res.columns)
    assert cols == sorted(odf.columns)
    a = res[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes)
    assert a.equals(b), f"{qname}: {len(a)} vs {len(b)} rows"


def test_tab_hash_nulls_ignore_masked_bytes():
    """Arrow permits null slots whose offsets still span garbage bytes
    (e.g. from if_else) — the hash must consult the validity bitmap
    and treat nulls as empty strings regardless of provenance."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from totem_ray.hashing import tab_hash_strings

    masked = pc.if_else(pa.array([True, False, True]),
                        pa.array(["abc", "def", "ghi"]),
                        pa.array([None, None, None], type=pa.string()))
    clean = pa.array(["abc", None, "ghi"], type=pa.string())
    np.testing.assert_array_equal(np.asarray(tab_hash_strings(masked)),
                                  np.asarray(tab_hash_strings(clean)))
    assert int(tab_hash_strings(masked)[1]) == _ref_tab_hash("")
