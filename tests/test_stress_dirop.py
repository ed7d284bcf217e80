"""Stress centrality vs a serial oracle (src/alg/totem_stress.cu:
307-400 semantics: delta(v) = sum over successors of (1 + delta),
stress += sigma * delta, source excluded) and direction-optimizing
BFS parity (src/alg/totem_bfs_stepwise_hybrid.cu)."""

import numpy as np
import pandas as pd
import pytest

from totem_ray.algs import apsp, bfs, bfs_stepwise, stress
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def np_stress(n, e, sources):
    adj = [[] for _ in range(n)]
    for s, d in e.astype(int):
        adj[s].append(d)
    sc = np.zeros(n)
    for s in sources:
        dist = np.full(n, -1)
        sigma = np.zeros(n)
        dist[s] = 0
        sigma[s] = 1.0
        order = [s]
        q = [s]
        while q:
            nq = []
            for v in q:
                for w in adj[v]:
                    if dist[w] == -1:
                        dist[w] = dist[v] + 1
                        nq.append(w)
                        order.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
            q = nq
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] - 1:
                    delta[v] += 1.0 + delta[w]
        contrib = sigma * delta
        contrib[s] = 0.0
        sc += contrib
    return sc


@pytest.mark.parametrize("name,P,step", [("grid_15", 3, 1),
                                         ("chain_100", 2, 11)])
def test_stress_exact_oracle(name, P, step):
    n, e = topology_edges(name)
    srcs = list(range(0, n, step))
    out = stress(edges_from_arrays(e, num_blocks=2),
                 sources=srcs, num_partitions=P)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    got = np.zeros(n)
    got[df["v"].to_numpy()] = df["stress"].to_numpy()
    assert np.allclose(got, np_stress(n, e, srcs), rtol=1e-9, atol=1e-9)


def test_stress_star_hub_dominates():
    n, e = topology_edges("star_1000")
    srcs = [3, 7, 11]
    out = stress(edges_from_arrays(e), sources=srcs, num_partitions=4)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    got = np.zeros(n)
    got[df["v"].to_numpy()] = df["stress"].to_numpy()
    assert np.allclose(got, np_stress(n, e, srcs), rtol=1e-9, atol=1e-9)
    assert got[0] > got[1:].max()


@pytest.mark.parametrize("name,P", [("chain_100", 2), ("grid_15", 3),
                                    ("star_1000", 4),
                                    ("chain_4_comp_40", 2)])
def test_dirop_bfs_matches_bfs(name, P):
    n, e = topology_edges(name)
    a = bfs(edges_from_arrays(e), source=0, num_partitions=P)
    b = bfs_stepwise(edges_from_arrays(e), source=0, num_partitions=P)
    da = a["result"].to_pandas().sort_values("v").reset_index(drop=True)
    db = b["result"].to_pandas().sort_values("v").reset_index(drop=True)
    a["engine"].shutdown()
    b["engine"].shutdown()
    assert da.equals(db)


def test_dirop_bfs_goes_bottom_up_on_star():
    # level 1 of a star is 99.9% of V -> the superstep after it must
    # run bottom-up (frontier > alpha * |V|)
    n, e = topology_edges("star_1000")
    out = bfs_stepwise(edges_from_arrays(e), source=0, num_partitions=4)
    bu = sum(m.get("bu_steps", 0) for m in out["metrics"])
    out["engine"].shutdown()
    assert bu > 0


def test_dirop_bfs_directed_graph_stays_correct():
    # a DIRECTED graph where bottom-up would traverse edges backwards:
    # 0 -> 1..20 (big frontier at level 1 triggers the switch), plus
    # 30 -> 5 (an edge INTO the frontier from an unreachable vertex).
    # With undirected=False the optimization never engages and vertex
    # 30 must stay unreachable (cost -1).
    src = np.array([0] * 20 + [30], dtype=np.int64)
    dst = np.array(list(range(1, 21)) + [5], dtype=np.int64)
    e = np.stack([src, dst], axis=1)
    a = bfs(edges_from_arrays(e), source=0, num_partitions=4)
    b = bfs_stepwise(edges_from_arrays(e), source=0, num_partitions=4,
                     undirected=False)
    da = a["result"].to_pandas().sort_values("v").reset_index(drop=True)
    db = b["result"].to_pandas().sort_values("v").reset_index(drop=True)
    a["engine"].shutdown()
    b["engine"].shutdown()
    assert da.equals(db)
    assert int(db.loc[db["v"] == 30, "cost"].iloc[0]) == -1


def test_apsp_chain_small():
    n, e = topology_edges("chain_100")
    srcs = [0, 50]
    out = apsp(edges_from_arrays(e), sources=srcs, num_partitions=2)
    df = out["result"].to_pandas()
    out["engine"].shutdown()
    for s in srcs:
        d = df[df["source"] == s].sort_values("v")
        assert np.array_equal(d["v"].to_numpy(), np.arange(n))
        assert np.allclose(d["dist"].to_numpy(),
                           np.abs(np.arange(n) - s))


@pytest.mark.parametrize("name,P", [("chain_100", 2), ("grid_15", 3),
                                    ("star_1000", 4),
                                    ("chain_4_comp_40", 2)])
def test_graph500_stepwise_matches_bfs_tree(name, P):
    # graph500_stepwise parity: identical (v, cost, parent) to the
    # always-top-down bfs_tree under every direction schedule
    from totem_ray.algs import bfs_tree, bfs_tree_stepwise

    n, e = topology_edges(name)
    a = bfs_tree(edges_from_arrays(e), source=0, num_partitions=P)
    b = bfs_tree_stepwise(edges_from_arrays(e), source=0, num_partitions=P)
    da = a["result"].to_pandas().sort_values("v").reset_index(drop=True)
    db = b["result"].to_pandas().sort_values("v").reset_index(drop=True)
    a["engine"].shutdown()
    b["engine"].shutdown()
    assert da.equals(db)


def test_graph500_stepwise_goes_bottom_up_on_star():
    from totem_ray.algs import bfs_tree_stepwise

    n, e = topology_edges("star_1000")
    out = bfs_tree_stepwise(edges_from_arrays(e), source=0,
                            num_partitions=4)
    bu = sum(m.get("bu_steps", 0) for m in out["metrics"])
    df = out["result"].to_pandas().sort_values("v").reset_index(drop=True)
    out["engine"].shutdown()
    assert bu > 0
    # star parents: every leaf's parent is the hub; hub's parent = hub
    assert (df.loc[df["v"] != 0, "parent"] == 0).all()
    assert df.loc[df["v"] == 0, "parent"].iloc[0] == 0


def test_bottom_up_trailing_isolated_vertex():
    """Regression: the bottom-up segmented reduction used a clamped
    reduceat start (min(indptr, ne-1)) that TRUNCATED the last
    edge-owning vertex's adjacency segment whenever trailing
    zero-out-degree vertices existed — a vertex whose only frontier
    neighbor sat in the final adjacency slot was never discovered
    (wrong cost / parent, or -1)."""
    import pyarrow as pa
    import ray.data

    from totem_ray.algs.traversal import bfs_tree, bfs_tree_stepwise

    pairs = np.array([[0, 1], [1, 2], [2, 3], [1, 3]])
    e = np.concatenate([pairs, pairs[:, ::-1]])
    # isolated vertex 9 sorts LAST on the single shard -> trailing
    # zero-degree CSR rows after vertex 3's adjacency
    verts = ray.data.from_arrow(pa.table({"v": pa.array(
        [0, 1, 2, 3, 9], type=pa.int64())}))

    want = bfs(edges_from_arrays(e), source=0, num_partitions=1,
               vertices=verts)
    w = want["result"].to_pandas().set_index("v")["cost"].to_dict()
    want["engine"].shutdown()
    assert w == {0: 0, 1: 1, 2: 2, 3: 2, 9: -1}

    # alpha=0.01 forces bottom-up supersteps immediately
    got = bfs_stepwise(edges_from_arrays(e), source=0, num_partitions=1,
                       vertices=verts, alpha=0.01)
    g = got["result"].to_pandas().set_index("v")["cost"].to_dict()
    assert any(m.get("bu_steps", 0) > 0 for m in got["metrics"])
    got["engine"].shutdown()
    assert g == w

    wt = bfs_tree(edges_from_arrays(e), source=0, num_partitions=1,
                  vertices=verts)
    wtree = wt["result"].to_pandas().set_index("v")[["cost", "parent"]]
    wt["engine"].shutdown()
    gt = bfs_tree_stepwise(edges_from_arrays(e), source=0,
                           num_partitions=1, vertices=verts, alpha=0.01)
    gtree = gt["result"].to_pandas().set_index("v")[["cost", "parent"]]
    assert any(m.get("bu_steps", 0) > 0 for m in gt["metrics"])
    gt["engine"].shutdown()
    assert (wtree.sort_index() == gtree.sort_index()).all().all()


def test_apsp_full_universe_streams_sources():
    """sources=None runs every vertex via the streamed iterator (no
    driver-side take_all of the vertex universe) and reports the
    count; distances must match the explicit-sources run."""
    e = np.array([[0, 1], [1, 2], [2, 3]])
    out = apsp(edges_from_arrays(e), num_partitions=2)
    try:
        got = out["result"].to_pandas() \
            .sort_values(["source", "v"]).reset_index(drop=True)
        assert out["sources"] is None and out["num_sources"] == 4
        exp = apsp(edges_from_arrays(e), sources=[0, 1, 2, 3],
                   num_partitions=2, engine=out["engine"])
        expdf = exp["result"].to_pandas() \
            .sort_values(["source", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expdf)
    finally:
        out["engine"].shutdown()
