"""BFS / BFS-tree / SSSP tests: numpy oracles + closed forms across
physical plans (the reference's bfs/graph500/sssp unit-test morals,
src/test/totem_bfs_unittest.cu etc.)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from totem_ray.algs import bfs, bfs_tree, sssp
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def np_bfs(n, e, source):
    cost = np.full(n, -1, dtype=np.int64)
    cost[source] = 0
    frontier = [source]
    level = 0
    adj = [[] for _ in range(n)]
    for s, d in e.astype(int):
        adj[s].append(d)
    while frontier:
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if cost[u] == -1:
                    cost[u] = level + 1
                    nxt.append(u)
        frontier = nxt
        level += 1
    return cost


def np_sssp(n, e, w, source):
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    src = e[:, 0].astype(int)
    dst = e[:, 1].astype(int)
    for _ in range(n):
        cand = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(new, dist, equal_nan=True):
            break
        dist = new
    return dist


@pytest.mark.parametrize("name,P", [("chain_100", 1), ("chain_100", 4),
                                    ("grid_15", 3), ("star_1000", 4),
                                    ("chain_4_comp_40", 2)])
def test_bfs_oracle(name, P):
    n, e = topology_edges(name)
    out = bfs(edges_from_arrays(e, num_blocks=2), source=0, num_partitions=P)
    got = out["result"].to_pandas().sort_values("v")["cost"].to_numpy()
    assert np.array_equal(got, np_bfs(n, e, 0))
    out["engine"].shutdown()


def test_bfs_star_levels():
    n, e = topology_edges("star_1000")
    out = bfs(edges_from_arrays(e), source=0, num_partitions=4)
    df = out["result"].to_pandas().set_index("v")
    assert df.loc[0, "cost"] == 0
    assert (df.drop(0)["cost"] == 1).all()
    assert out["iterations"] == 2  # one push round + one empty vote
    out["engine"].shutdown()


def test_bfs_unreachable():
    n, e = topology_edges("chain_4_comp_40")
    out = bfs(edges_from_arrays(e), source=0, num_partitions=3)
    df = out["result"].to_pandas().sort_values("v").set_index("v")
    assert (df.loc[0:9, "cost"].to_numpy() == np.arange(10)).all()
    assert (df.loc[10:, "cost"] == -1).all()
    out["engine"].shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_bfs_tree_parents(P):
    n, e = topology_edges("grid_15")
    out = bfs_tree(edges_from_arrays(e), source=0, num_partitions=P)
    df = out["result"].to_pandas().sort_values("v")
    cost = df["cost"].to_numpy()
    parent = df["parent"].to_numpy()
    assert np.array_equal(cost, np_bfs(n, e, 0))
    assert parent[0] == 0
    # every non-root reachable vertex: parent is a real predecessor one
    # level up, and the MINIMUM such id
    adj_in = [[] for _ in range(n)]
    for s, d in e.astype(int):
        adj_in[d].append(s)
    for v in range(1, n):
        if cost[v] < 0:
            assert parent[v] == -1
            continue
        preds = [u for u in adj_in[v] if cost[u] == cost[v] - 1]
        assert parent[v] == min(preds)
    out["engine"].shutdown()


@pytest.mark.parametrize("P", [1, 3])
def test_sssp_weighted_oracle(P):
    rng = np.random.default_rng(7)
    n, e = topology_edges("grid_15")
    w = rng.uniform(0.1, 5.0, size=len(e))
    t = pd.DataFrame({"src": e[:, 0].astype(np.int64),
                      "dst": e[:, 1].astype(np.int64), "weight": w})
    ds = ray.data.from_pandas(t).repartition(3)
    out = sssp(ds, source=0, num_partitions=P)
    got = out["result"].to_pandas().sort_values("v")["dist"].to_numpy()
    assert np.allclose(got, np_sssp(n, e, w, 0), rtol=1e-12, atol=1e-12)
    out["engine"].shutdown()


def test_sssp_unweighted_equals_bfs():
    n, e = topology_edges("chain_100")
    out = sssp(edges_from_arrays(e), source=0, num_partitions=2)
    got = out["result"].to_pandas().sort_values("v")["dist"].to_numpy()
    assert np.array_equal(got.astype(np.int64), np_bfs(n, e, 0))
    out["engine"].shutdown()


def test_bfs_resume(tmp_path):
    """Kill-and-resume mid-traversal: identical final costs."""
    n, e = topology_edges("chain_100")
    ck = str(tmp_path / "ck")
    full = bfs(edges_from_arrays(e), source=0, num_partitions=2)
    exp = full["result"].to_pandas().sort_values("v")["cost"].to_numpy()
    full["engine"].shutdown()

    part = bfs(edges_from_arrays(e), source=0, num_partitions=2,
               max_supersteps=20, checkpoint_dir=ck, checkpoint_every=5)
    assert not part["converged"]
    part["engine"].shutdown()

    res = bfs(edges_from_arrays(e), source=0, num_partitions=2,
              checkpoint_dir=ck, resume=True)
    assert res["resumed_from"] is not None and res["resumed_from"] > 0
    got = res["result"].to_pandas().sort_values("v")["cost"].to_numpy()
    assert np.array_equal(got, exp)
    res["engine"].shutdown()


def test_st_connectivity():
    from totem_ray.algs import st_connectivity

    n, e = topology_edges("chain_4_comp_40")
    r = st_connectivity(edges_from_arrays(e), source=0, target=9,
                        num_partitions=2)
    assert r["connected"] and r["cost"] == 9
    r2 = st_connectivity(edges_from_arrays(e), source=0, target=15,
                         num_partitions=2)
    assert not r2["connected"] and r2["cost"] == -1


def test_closeness_exact_all_sources():
    from totem_ray.algs import closeness

    n, e = topology_edges("grid_15")
    out = closeness(edges_from_arrays(e), sources=list(range(n)),
                    num_partitions=3)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()

    # numpy oracle: all-pairs BFS
    dist_sum = np.zeros(n)
    reached = np.zeros(n)
    for s in range(n):
        cost = np_bfs(n, e, s)
        m = cost >= 0
        dist_sum[m] += cost[m]
        reached[m] += 1
    cc = np.where(dist_sum > 0, (reached - 1) / np.maximum(dist_sum, 1), 0.0)
    assert np.array_equal(df["dist_sum"].to_numpy(), dist_sum.astype(np.int64))
    assert np.allclose(df["closeness"].to_numpy(), cc)
