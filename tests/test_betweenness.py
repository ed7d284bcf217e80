"""Betweenness tests vs a serial Brandes oracle
(reference: src/alg/totem_betweenness.cu semantics — raw per-source
dependency sums, V/num_samples scaling when sampled)."""

import numpy as np
import pytest

from totem_ray.algs.betweenness import betweenness
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def np_brandes(n, e, sources):
    adj = [[] for _ in range(n)]
    for s, d in e.astype(int):
        adj[s].append(d)
    bc = np.zeros(n)
    for s in sources:
        # forward
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
        # backward
        delta = np.zeros(n)
        for w in reversed(order):
            for v in adj[w]:
                if dist[v] == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        delta[s] = 0.0
        bc += delta
    return bc


@pytest.mark.parametrize("name,P,step", [("grid_15", 3, 1),
                                         ("chain_100", 2, 11)])
def test_betweenness_exact_oracle(name, P, step):
    n, e = topology_edges(name)
    srcs = list(range(0, n, step))
    out = betweenness(edges_from_arrays(e, num_blocks=2),
                      sources=srcs, num_partitions=P)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    got = np.zeros(n)
    got[df["v"].to_numpy()] = df["betweenness"].to_numpy()
    scale = 1.0 if len(srcs) == n else n / len(srcs)
    exp = np_brandes(n, e, srcs) * scale
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_betweenness_star_sampled():
    n, e = topology_edges("star_1000")
    srcs = [0, 3, 7]
    out = betweenness(edges_from_arrays(e), sources=srcs, num_partitions=4)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    got = np.zeros(n)
    got[df["v"].to_numpy()] = df["betweenness"].to_numpy()
    exp = np_brandes(n, e, srcs) * (n / len(srcs))
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-9)
    # hub carries all shortest spoke-spoke paths
    assert got[0] > got[1:].max()


def test_betweenness_sampled_scales():
    n, e = topology_edges("grid_15")
    out = betweenness(edges_from_arrays(e), sources=[0, 1], num_partitions=2)
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    got = np.zeros(n)
    got[df["v"].to_numpy()] = df["betweenness"].to_numpy()
    exp = np_brandes(n, e, [0, 1]) * (n / 2.0)
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-9)
