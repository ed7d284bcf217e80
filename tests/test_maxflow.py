"""Max-flow vs a serial Edmonds-Karp oracle (flow VALUE — per-edge
assignments may legitimately differ; src/alg/totem_maxflow.cu
converges to the same value via [Hong08] push-relabel)."""

import numpy as np
import pytest

from totem_ray.algs import maxflow
from totem_ray.graph.edges import edges_from_arrays


def edmonds_karp(n, edges_w, s, t):
    cap = {}
    adj = [[] for _ in range(n)]
    for u, v, w in edges_w:
        u, v = int(u), int(v)
        if (u, v) not in cap:
            adj[u].append(v)
            adj[v].append(u)
            cap[(u, v)] = 0.0
            cap.setdefault((v, u), 0.0)
        cap[(u, v)] += float(w)
    flow = 0.0
    while True:
        parent = {s: None}
        q = [s]
        while q and t not in parent:
            u = q.pop(0)
            for v in adj[u]:
                if v not in parent and cap[(u, v)] > 1e-12:
                    parent[v] = u
                    q.append(v)
        if t not in parent:
            return flow
        amt = np.inf
        v = t
        while parent[v] is not None:
            amt = min(amt, cap[(parent[v], v)])
            v = parent[v]
        v = t
        while parent[v] is not None:
            cap[(parent[v], v)] -= amt
            cap[(v, parent[v])] += amt
            v = parent[v]
        flow += amt


def _ds(edges_w):
    import pyarrow as pa
    import ray.data as rd
    a = np.asarray(edges_w, dtype=np.float64)
    return rd.from_arrow(pa.table({
        "src": pa.array(a[:, 0].astype(np.int64)),
        "dst": pa.array(a[:, 1].astype(np.int64)),
        "weight": pa.array(a[:, 2], type=pa.float64()),
    }))


CLRS = [(0, 1, 16), (0, 2, 13), (1, 2, 10), (2, 1, 4), (1, 3, 12),
        (3, 2, 9), (2, 4, 14), (4, 3, 7), (3, 5, 20), (4, 5, 4)]


@pytest.mark.parametrize("P", [1, 2, 4])
def test_maxflow_clrs_network(P):
    # the classic CLRS figure-26 network: max flow 23
    out = maxflow(_ds(CLRS), source=0, sink=5, num_partitions=P)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(23.0)
    assert edmonds_karp(6, CLRS, 0, 5) == pytest.approx(23.0)


def test_maxflow_disconnected_sink():
    e = [(0, 1, 5), (2, 3, 7)]
    out = maxflow(_ds(e), source=0, sink=3, num_partitions=2)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(0.0)


def test_maxflow_single_path_bottleneck():
    e = [(0, 1, 9), (1, 2, 3), (2, 3, 8)]
    out = maxflow(_ds(e), source=0, sink=3, num_partitions=2)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(3.0)


@pytest.mark.parametrize("seed,P", [(1, 2), (2, 4), (3, 3)])
def test_maxflow_random_vs_edmonds_karp(seed, P):
    rng = np.random.default_rng(seed)
    n = 24
    m = 120
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    w = rng.integers(1, 20, len(u)).astype(np.float64)
    edges_w = list(zip(u.tolist(), v.tolist(), w.tolist()))
    exp = edmonds_karp(n, edges_w, 0, n - 1)
    out = maxflow(_ds(edges_w), source=0, sink=n - 1, num_partitions=P)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(exp)


def test_maxflow_antiparallel_pair():
    # capacities both ways between the same pair
    e = [(0, 1, 5), (1, 0, 3), (1, 2, 4)]
    out = maxflow(_ds(e), source=0, sink=2, num_partitions=2)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(4.0)


REF_DATA = "/root/reference/data"


@pytest.mark.parametrize("fname,src,sink_from_end,expect", [
    ("source_sink_maxflow.totem", 0, 1, 4.0),      # unittest.cu:75-77
    ("rmf_100_nodes.totem", 0, 1, 174.0),          # unittest.cu:105-113
    ("acyclic_100_nodes.totem", 0, 1, 45333.0),    # unittest.cu:116-124
])
def test_maxflow_reference_fixtures(fname, src, sink_from_end, expect):
    import os
    path = os.path.join(REF_DATA, fname)
    if not os.path.exists(path):
        pytest.skip("reference data not available")
    from totem_ray.sources.totem_format import (parse_totem_file,
                                                read_totem_edges)
    meta = parse_totem_file(path)
    sink = meta["num_vertices"] - sink_from_end
    out = maxflow(read_totem_edges(path, num_blocks=2),
                  source=src, sink=sink, num_partitions=4)
    out["engine"].shutdown()
    assert out["max_flow"] == pytest.approx(expect)
