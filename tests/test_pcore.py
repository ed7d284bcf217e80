"""p-core tests pinning the reference unit-test expectations
(src/test/totem_pcore_unittest.cu: chain -> 1, complete_300 -> 299,
star -> 1, edgeless -> 0, single loop -> edge_count)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from totem_ray.algs import pcore
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def _rounds(out):
    df = out["result"].to_pandas().sort_values("v")
    out["engine"].shutdown()
    return df["round"].to_numpy()


@pytest.mark.parametrize("P", [1, 4])
def test_pcore_chain(P):
    n, e = topology_edges("chain_1000")
    r = _rounds(pcore(edges_from_arrays(e), num_partitions=P))
    assert (r == 1).all()


def test_pcore_complete():
    n, e = topology_edges("complete_300")
    r = _rounds(pcore(edges_from_arrays(e), num_partitions=4))
    assert (r == 299).all()


def test_pcore_star():
    n, e = topology_edges("star_1000")
    r = _rounds(pcore(edges_from_arrays(e), num_partitions=4))
    assert (r == 1).all()


def test_pcore_edgeless():
    vs = ray.data.from_pandas(
        pd.DataFrame({"v": np.arange(100, dtype=np.int64)}))
    out = pcore(edges_from_arrays(np.empty((0, 2), dtype=np.uint64)),
                vertices=vs, num_partitions=2)
    assert (_rounds(out) == 0).all()


def test_pcore_single_node_loop():
    n, e = topology_edges("single_node_loop")
    out = pcore(edges_from_arrays(e), num_partitions=2)
    df = out["result"].to_pandas()
    out["engine"].shutdown()
    assert len(df) == 1 and df["round"].iloc[0] == 1


def test_pcore_core_number_oracle():
    """grid_15: compare against a serial Batagelj-Zaversnik peel."""
    n, e = topology_edges("grid_15")
    r = _rounds(pcore(edges_from_arrays(e, num_blocks=3), num_partitions=3))

    # serial oracle with identical semantics (thr <=, cascade, round++)
    deg = np.bincount(e[:, 0].astype(int), minlength=n).astype(float)
    adj = [[] for _ in range(n)]
    for s, d in e.astype(int):
        adj[s].append(d)
    active = np.ones(n, dtype=bool)
    rounds = np.full(n, -1)
    thr, cur = 0, 0
    while active.any():
        removed_any = True
        while removed_any:
            newly = np.flatnonzero(active & (deg <= thr))
            removed_any = len(newly) > 0
            for v in newly:
                active[v] = False
                rounds[v] = cur
                for u in adj[v]:
                    deg[u] -= 1
        thr += 1
        cur += 1
    assert np.array_equal(r, rounds)
