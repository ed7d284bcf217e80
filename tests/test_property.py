"""Property-based checks (hypothesis) on small random graphs:
BSP results vs tiny serial oracles, join semantics vs pandas.

Strategy sizes stay small (<= 24 vertices) so each example runs in a
fraction of a second on the session-scoped Ray; deadline disabled
because first-example worker warm-up is slow.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from totem_ray.graph.edges import edges_from_arrays


def _edges_strategy(max_n=24, max_m=60):
    return st.integers(2, max_n).flatmap(
        lambda n: st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=1, max_size=max_m).map(
            lambda pairs: (n, [(a, b) for a, b in pairs if a != b])))


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


_SET = settings(max_examples=15, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@given(_edges_strategy())
@_SET
def test_cc_matches_union_find(ne):
    n, pairs = ne
    if not pairs:
        return
    from totem_ray.algs import connected_components

    e = np.array(_sym(pairs), dtype=np.uint64)
    out = connected_components(edges_from_arrays(e), num_partitions=3)
    got = out["result"].to_pandas().set_index("v")["label"].to_dict()
    out["engine"].shutdown()

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp_min = {}
    verts = sorted({v for p in pairs for v in p})
    for v in verts:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    for v in verts:
        assert got[v] == comp_min[find(v)], (v, got[v])


@given(_edges_strategy())
@_SET
def test_pagerank_sums_to_one(ne):
    n, pairs = ne
    if not pairs:
        return
    from totem_ray.algs import pagerank

    e = np.array(_sym(pairs), dtype=np.uint64)
    out = pagerank(edges_from_arrays(e), num_partitions=3)
    r = out["result"].to_pandas()["rank"].to_numpy()
    out["engine"].shutdown()
    assert abs(r.sum() - 1.0) < 1e-9
    assert (r > 0).all()


@given(_edges_strategy(max_n=14, max_m=40))
@_SET
def test_triangles_match_bruteforce(ne):
    n, pairs = ne
    if not pairs:
        return
    from totem_ray.algs import triangle_counts

    sym = _sym(pairs)
    e = np.array(sym, dtype=np.uint64)
    gdf = triangle_counts(edges_from_arrays(e), num_buckets=4,
                          num_join_partitions=4).to_pandas()
    got = gdf.set_index("v")["triangles"].to_dict() if len(gdf) else {}
    adj = {v: set() for v in range(n)}
    for a, b in sym:
        adj[a].add(b)
    exp = {}
    for v in adj:
        cnt = 0
        nb = sorted(adj[v])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if nb[j] in adj[nb[i]]:
                    cnt += 1
        if cnt:
            exp[v] = cnt
    assert got == exp


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(-5, 5)),
                min_size=0, max_size=20),
       st.lists(st.tuples(st.integers(0, 6), st.integers(-5, 5)),
                min_size=0, max_size=20))
@_SET
def test_hash_join_matches_pandas(lrows, rrows):
    import pyarrow as pa
    import ray.data as rd
    from totem_ray.graph.joins import hash_join

    if not lrows or not rrows:
        return
    l = pd.DataFrame(lrows, columns=["k", "lv"])
    r = pd.DataFrame(rrows, columns=["k", "rv"])
    lds = rd.from_arrow(pa.Table.from_pandas(l, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(r, preserve_index=False))
    got = hash_join(lds, rds, on="k", num_buckets=4).to_pandas()
    exp = l.merge(r, on="k", how="inner")
    if not len(exp):
        assert len(got) == 0
        return
    key = ["k", "lv", "rv"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    exp_s = exp[key].sort_values(key).reset_index(drop=True)
    assert got_s.equals(exp_s)


@given(_edges_strategy(max_n=16, max_m=40),
       st.lists(st.integers(1, 9), min_size=40, max_size=40))
@_SET
def test_sssp_matches_dijkstra(ne, ws):
    n, pairs = ne
    if not pairs:
        return
    import heapq

    from totem_ray.algs import sssp

    e = np.array(pairs, dtype=np.int64)
    w = np.array(ws[:len(pairs)], dtype=np.float64)
    src = int(e[:, 0].min())
    out = sssp(edges_from_arrays(e, weights=w), source=src,
               num_partitions=3)
    got = out["result"].to_pandas().set_index("v")["dist"].to_dict()
    out["engine"].shutdown()

    adj = {}
    for (a, b), wt in zip(pairs, w):
        adj.setdefault(a, []).append((b, float(wt)))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, np.inf):
            continue
        for v, wt in adj.get(u, ()):
            nd = d + wt
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    for v in {x for p in pairs for x in p}:
        want = dist.get(v, np.inf)
        g = got.get(v, np.inf)
        if np.isinf(want):
            assert g is None or np.isinf(g) or g != g, (v, g)
        else:
            assert abs(g - want) < 1e-9, (v, g, want)


@given(_edges_strategy(max_n=16, max_m=40))
@_SET
def test_bfs_dirop_matches_bfs(ne):
    """Direction-optimizing BFS must equal plain BFS level-for-level
    on any symmetrized graph (the dirop bottom-up phase's documented
    symmetric-input assumption)."""
    n, pairs = ne
    if not pairs:
        return
    from totem_ray.algs import bfs
    from totem_ray.algs.traversal import bfs_stepwise

    e = np.array(_sym(pairs), dtype=np.int64)
    src = int(e[:, 0].min())
    a = bfs(edges_from_arrays(e), source=src, num_partitions=3)
    want = a["result"].to_pandas().set_index("v")["cost"].to_dict()
    a["engine"].shutdown()
    # low switch threshold forces bottom-up supersteps to engage even
    # on these tiny graphs
    b = bfs_stepwise(edges_from_arrays(e), source=src, num_partitions=3,
                     undirected=True, alpha=0.01)
    got = b["result"].to_pandas().set_index("v")["cost"].to_dict()
    b["engine"].shutdown()
    assert got == want


@given(st.lists(st.tuples(st.integers(-50, 50),
                          st.integers(-1_000_000, 1_000_000)),
                min_size=0, max_size=200),
       st.integers(1, 4))
@_SET
def test_sum_partials_by_v_both_plans_match(rows, nblocks):
    """Driver-merge plan == distributed groupby plan == pandas sum."""
    import pyarrow as pa
    import ray.data

    from totem_ray.algs.triangles import _sum_partials_by_v

    tbl = pa.table({"v": pa.array([a for a, _ in rows], type=pa.int64()),
                    "_t": pa.array([b for _, b in rows], type=pa.int64())})
    step = max((tbl.num_rows + nblocks - 1) // nblocks, 1)
    parts = ray.data.from_arrow(
        [tbl.slice(i, step) for i in range(0, max(tbl.num_rows, 1), step)])
    exp = (pd.DataFrame({"v": [a for a, _ in rows],
                         "t": [b for _, b in rows]})
           .groupby("v")["t"].sum().sort_index())
    for gate in (10**9, 0):  # driver plan, then forced groupby plan
        got = _sum_partials_by_v(parts, "_t", "t",
                                 driver_merge_max=gate).to_pandas()
        if not rows:
            # ray loses columns in to_pandas() of an empty dataset;
            # the contract is simply zero rows
            assert len(got) == 0
            continue
        got = got.set_index("v")["t"].sort_index()
        assert list(got.index) == list(exp.index)
        assert list(got.values) == list(exp.values)


@given(st.lists(st.tuples(st.integers(-5, 5), st.integers(0, 3),
                          st.integers(-100, 100),
                          st.floats(-10, 10, allow_nan=False)),
                min_size=0, max_size=120),
       st.integers(1, 5))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grouped_reduce_matches_pandas(rows, nblocks):
    """joins.grouped_reduce (hash-bucket lexsort/reduceat) must equal
    the pandas groupby for sum AND min, with mixed int/float value
    columns, any key cardinality, and any block layout."""
    import pyarrow as pa
    import ray.data as rd

    from totem_ray.graph.joins import grouped_reduce

    if not rows:
        return
    k1 = np.array([r[0] for r in rows], dtype=np.int64)
    k2 = np.array([r[1] for r in rows], dtype=np.int64)
    vi = np.array([r[2] for r in rows], dtype=np.int64)
    vf = np.array([r[3] for r in rows], dtype=np.float64)
    t = pa.table({"a": pa.array(k1), "b": pa.array(k2),
                  "vi": pa.array(vi), "vf": pa.array(vf)})
    step = max(1, len(rows) // nblocks)
    ds = rd.from_arrow([t.slice(i, step)
                        for i in range(0, len(rows), step)])
    got = grouped_reduce(ds, ["a", "b"], ["vi", "vf"],
                         how=["sum", "min"],
                         out_names=["si", "mf"]).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    pdf = pd.DataFrame({"a": k1, "b": k2, "vi": vi, "vf": vf})
    want = pdf.groupby(["a", "b"], as_index=False) \
        .agg(si=("vi", "sum"), mf=("vf", "min")) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(st.lists(st.tuples(st.integers(0, 4),
                          st.integers(0, 20_000),
                          st.floats(-5, 5, allow_nan=False)),
                min_size=1, max_size=80),
       st.sampled_from([(3600, 900), (3600, 1800), (60, 20)]),
       st.integers(1, 4))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hopping_window_matches_pandas(rows, wh, nblocks):
    """hopping_window (explode + pre-aggregate + one shuffle) must
    equal the brute-force pandas recomputation — every event in
    exactly width/hop windows — for any key/ts/value set, any
    width/hop pair, any block layout."""
    import pyarrow as pa
    import ray.data as rd

    from totem_ray.functions.windows import hopping_window

    width_s, hop_s = wh
    k = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64) * 1_000_000
    v = np.array([r[2] for r in rows], dtype=np.float64)
    t = pa.table({"user_id": pa.array(k),
                  "ts": pa.array(ts.astype("datetime64[us]")),
                  "value": pa.array(v)})
    step = max(1, len(rows) // nblocks)
    ds = rd.from_arrow([t.slice(i, step)
                        for i in range(0, len(rows), step)])
    got = hopping_window(ds, width_s=width_s, hop_s=hop_s).to_pandas()
    got["w"] = got["window_start"].astype("int64")
    got = got[["user_id", "w", "n_events", "sum_value"]] \
        .sort_values(["user_id", "w"]).reset_index(drop=True)

    k_h = width_s // hop_s
    hop_us = hop_s * 1_000_000
    base = (ts // hop_us) * hop_us
    kk = np.repeat(k, k_h)
    ww = np.repeat(base, k_h) - np.tile(
        np.arange(k_h, dtype=np.int64) * hop_us, len(ts))
    vv = np.repeat(v, k_h)
    want = pd.DataFrame({"user_id": kk, "w": ww, "value": vv}) \
        .groupby(["user_id", "w"], as_index=False) \
        .agg(n_events=("value", "size"), sum_value=("value", "sum")) \
        .sort_values(["user_id", "w"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(st.lists(st.lists(st.sampled_from("abcdefg"), min_size=0,
                         max_size=12),
                min_size=1, max_size=25),
       st.integers(1, 4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_shingle_fraction_matches_brute(docs_words, nblocks):
    """Random small corpora vs a pure-Python recomputation of the
    duplicated-k-gram-fraction definition, any block layout."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from totem_ray.functions.dedup import duplicate_shingle_fraction

    texts = [" ".join(ws) for ws in docs_words]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)),
                                     type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    step = max(1, len(texts) // nblocks)
    ds = rd.from_arrow([t.slice(i, step)
                        for i in range(0, len(texts), step)])
    out_df = duplicate_shingle_fraction(ds).to_pandas()

    per_doc = {}
    for i, ws in enumerate(docs_words):
        toks = [w for w in ws if w]
        grams = {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}
        if grams:
            per_doc[i] = grams
    if not per_doc:
        # no doc has >= 3 tokens: no shingle identity exists and the
        # output is empty (column-less empty frame is acceptable)
        assert len(out_df) == 0
        return
    out = out_df.sort_values("doc_id").reset_index(drop=True)
    dfc = collections.Counter(g for gs in per_doc.values() for g in gs)
    assert set(out["doc_id"]) == set(per_doc)
    for _, r in out.iterrows():
        grams = per_doc[int(r["doc_id"])]
        nd = sum(1 for g in grams if dfc[g] >= 2)
        assert int(r["n_shingles"]) == len(grams)
        assert int(r["n_dup_shingles"]) == nd
