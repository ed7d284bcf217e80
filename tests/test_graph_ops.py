"""Edge-table transform / analysis tests (SURVEY.md §2.2-2.4 operators)."""

import numpy as np
import pytest

from totem_ray.graph import (
    DegreePartitioner,
    HashPartitioner,
    check_symmetry,
    count_repeated_edges,
    dedup_edges,
    degree_histogram,
    degree_table,
    edges_from_arrays,
    partition_stats,
    permute_ids,
    repeated_edges,
    reverse_edges,
    singleton_count,
    subgraph,
    symmetrize,
    vertex_degrees,
    add_random_weights,
    modularity,
)
from totem_ray.sources.fixtures import topology_edges


def _edges(name, blocks=4):
    n, e = topology_edges(name)
    return n, e, edges_from_arrays(e, num_blocks=blocks)


def test_degree_table_star():
    n, e, ds = _edges("star_1000")
    deg = degree_table(ds).to_pandas().set_index("v")["degree"]
    assert deg[0] == 999
    assert (deg.drop(0) == 1).all()


def test_vertex_degrees_directed():
    e = np.array([[0, 1], [0, 2], [3, 0]], dtype=np.uint64)
    ds = edges_from_arrays(e)
    df = vertex_degrees(ds).to_pandas().set_index("v")
    assert df.loc[0, "out_degree"] == 2 and df.loc[0, "in_degree"] == 1
    assert df.loc[1, "out_degree"] == 0 and df.loc[1, "in_degree"] == 1
    assert df.loc[3, "out_degree"] == 1 and df.loc[3, "in_degree"] == 0


def test_symmetrize_reverse_dedup():
    e = np.array([[0, 1], [1, 2], [0, 1]], dtype=np.uint64)
    ds = edges_from_arrays(e)
    assert symmetrize(ds).count() == 6  # keeps duplicates
    assert symmetrize(ds, dedup=True).count() == 4
    rev = reverse_edges(ds).to_pandas()
    assert sorted(zip(rev["src"], rev["dst"])) == [(1, 0), (1, 0), (2, 1)]
    assert dedup_edges(ds).count() == 2


def test_repeated_edges():
    e = np.array([[0, 1], [0, 1], [0, 1], [1, 2]], dtype=np.uint64)
    ds = edges_from_arrays(ds if False else e)
    rep = repeated_edges(ds).to_pandas()
    assert len(rep) == 1 and rep.iloc[0]["multiplicity"] == 3
    assert count_repeated_edges(ds) == 2


def test_check_symmetry():
    n, e, ds = _edges("chain_100")
    assert check_symmetry(ds).count() == 0
    bad = edges_from_arrays(np.array([[0, 1]], dtype=np.uint64))
    assert check_symmetry(bad).count() == 2  # both key rows unbalanced


def test_degree_histogram_chain():
    n, e, ds = _edges("chain_100")
    h = degree_histogram(ds).to_pandas().set_index("degree")["num_vertices"]
    assert h[1] == 2 and h[2] == 98


def test_singletons():
    n, e = topology_edges("chain_4_comp_40")
    ds = edges_from_arrays(e)
    assert singleton_count(ds, n) == 0
    assert singleton_count(ds, n + 5) == 5


def test_subgraph():
    n, e, ds = _edges("chain_100")
    sub = subgraph(ds, np.arange(10, dtype=np.uint64)).to_pandas()
    # intra-mask edges of vertices 0..9: chain 0-9 symmetrized
    assert len(sub) == 18
    assert sub["src"].max() <= 9 and sub["dst"].max() <= 9


def test_permute_preserves_structure():
    n, e, ds = _edges("chain_100")
    p = permute_ids(ds, seed=7)
    assert p.count() == len(e)
    assert check_symmetry(p).count() == 0
    assert degree_histogram(p).to_pandas().sort_values("degree").values.tolist() == \
        degree_histogram(ds).to_pandas().sort_values("degree").values.tolist()


def test_random_weights_deterministic():
    n, e, ds = _edges("grid_15")
    w1 = add_random_weights(ds, seed=3).to_pandas().sort_values(["src", "dst"])
    w2 = add_random_weights(edges_from_arrays(e, num_blocks=2), seed=3) \
        .to_pandas().sort_values(["src", "dst"])
    assert np.allclose(w1["weight"].values, w2["weight"].values)
    assert (w1["weight"] >= 0).all() and (w1["weight"] <= 1).all()


@pytest.mark.parametrize("P", [1, 2, 4, 8])
def test_hash_partitioner_covers(P):
    ids = np.arange(1000, dtype=np.uint64)
    pid = HashPartitioner(P).pid_np(ids)
    assert pid.min() >= 0 and pid.max() < P
    if P > 1:
        assert len(np.unique(pid)) == P


def test_degree_partitioner_hubs():
    n, e, ds = _edges("star_1000")
    deg = degree_table(ds)
    part = DegreePartitioner.from_degrees(deg, num_partitions=4, alpha=0.4)
    # hub 0 carries ~half the edges -> must be selected
    assert 0 in set(part.hub_ids.tolist())
    assert part.pid_np(np.array([0], dtype=np.uint64))[0] == 0
    stats = partition_stats(ds, part)
    assert stats["total_edges"] == len(e)


def test_degree_partitioner_matches_sorted_walk():
    """from_degrees selects hubs with per-block partial top-k + one
    reduce (no ds.sort all-to-all); the hub set must equal the
    reference degree-sorted budget walk (ties by ascending vertex id)
    regardless of block layout or direction."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(17)
    v = np.arange(500, dtype=np.int64)
    deg = rng.integers(1, 100, size=500).astype(np.int64)
    deg[::50] = 1000  # a few clear hubs + plenty of ties
    df = pd.DataFrame({"v": v, "degree": deg})

    for descending in (True, False):
        for alpha, max_hubs in ((0.3, 1_000_000), (0.9, 25)):
            sign = -1 if descending else 1
            order = np.lexsort((v, sign * deg))
            cum = np.cumsum(deg[order].astype(np.float64))
            budget = alpha * float(deg.sum())
            take = min(int(np.searchsorted(cum, budget, "left")) + 1,
                       len(v), max_hubs)
            expect = np.sort(v[order][:take])
            for nb in (1, 7):
                ds = ray.data.from_pandas(df).repartition(nb)
                part = DegreePartitioner.from_degrees(
                    ds, num_partitions=4, alpha=alpha,
                    descending=descending, max_hubs=max_hubs)
                got = np.sort(part.hub_ids)
                assert got.tolist() == expect.tolist(), (
                    descending, alpha, max_hubs, nb)


def test_modularity_two_cliques():
    # two triangles joined by one edge: strong communities -> Q > 0.3
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    und = np.array(tri1 + tri2 + bridge, dtype=np.uint64)
    e = np.concatenate([und, und[:, ::-1]])
    ds = edges_from_arrays(e)
    import ray.data
    import pandas as pd
    labels = ray.data.from_pandas(pd.DataFrame(
        {"v": np.arange(6, dtype=np.uint64), "label": [0, 0, 0, 1, 1, 1]}))
    q = modularity(ds, labels)
    assert 0.3 < q < 0.5
    # forced distributed (hash-join) plan must agree exactly with the
    # broadcast plan
    q2 = modularity(ds, labels, broadcast_max_labels=0)
    assert abs(q - q2) < 1e-12


def test_sort_vertices_by_degree_dense_rank():
    from totem_ray.graph.edges import sort_vertices_by_degree

    n, e, ds = _edges("star_1000")
    m = sort_vertices_by_degree(ds).to_pandas()
    # hub first, then spokes by id; new ids dense 0..n-1
    assert m.loc[m["v"] == 0, "new_id"].iloc[0] == 0
    assert sorted(m["new_id"].tolist()) == list(range(n))
    spokes = m[m["v"] != 0].sort_values("v")
    assert (spokes["new_id"].to_numpy() == np.arange(1, n)).all()


def test_sort_vertices_matches_rownumber_oracle():
    from totem_ray.graph.edges import sort_vertices_by_degree

    n, e, ds = _edges("grid_15")
    m = sort_vertices_by_degree(ds).to_pandas()
    deg = np.bincount(e[:, 0].astype(int), minlength=n)
    order = np.lexsort((np.arange(n), -deg))  # degree desc, id asc
    exp = np.empty(n, dtype=np.int64)
    exp[order] = np.arange(n)
    got = m.sort_values("v")["new_id"].to_numpy()
    assert np.array_equal(got, exp)


def test_remap_vertex_ids_roundtrip():
    import ray.data
    import pandas as pd
    from totem_ray.graph.edges import remap_vertex_ids, sort_vertices_by_degree

    n, e, ds = _edges("chain_100")
    mapping = sort_vertices_by_degree(ds)
    remapped = remap_vertex_ids(ds, mapping).to_pandas()
    assert len(remapped) == len(e)
    # degree multiset is invariant under relabeling
    old_hist = np.sort(np.bincount(e[:, 0].astype(int)))
    new_hist = np.sort(np.bincount(remapped["src"].to_numpy()))
    assert np.array_equal(old_hist[old_hist > 0], new_hist[new_hist > 0])


def test_create_bidirectional_residual():
    from totem_ray.graph.edges import create_bidirectional

    # directed edges with weights; (1->2) has no reverse, (3<->4) both
    e = np.array([[1, 2], [3, 4], [4, 3]], dtype=np.uint64)
    w = np.array([5.0, 7.0, 2.0])
    ds = edges_from_arrays(e, weights=w)
    out = create_bidirectional(ds).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(out) == 4
    rev = out[(out["src"] == 2) & (out["dst"] == 1)]
    assert len(rev) == 1 and rev["weight"].iloc[0] == 0.0 \
        and bool(rev["is_reverse"].iloc[0])
    both = out[(out["src"] == 3) & (out["dst"] == 4)]
    assert both["weight"].iloc[0] == 7.0 and not bool(both["is_reverse"].iloc[0])


def test_remove_singletons_and_counts():
    import pandas as pd
    import ray.data
    from totem_ray.graph.edges import (count_singletons_and_leafs,
                                       remove_singletons)

    # 0->1, 1->0, 2->3 (3 is a leaf); 4,5 singletons
    e = np.array([[0, 1], [1, 0], [2, 3]], dtype=np.uint64)
    ds = edges_from_arrays(e)
    verts = ray.data.from_pandas(pd.DataFrame(
        {"v": np.arange(6, dtype=np.int64)}))
    kept = remove_singletons(ds, verts).to_pandas()["v"].tolist()
    assert sorted(kept) == [0, 1, 2, 3]
    kept2 = remove_singletons(ds, verts, broadcast_max_vertices=0) \
        .to_pandas()["v"].tolist()
    assert sorted(kept2) == [0, 1, 2, 3]
    c = count_singletons_and_leafs(ds, num_vertices=6)
    assert c == {"singletons": 2, "leafs": 1, "vertices": 6}


def test_sort_neighbors_by_degree_star_plus_chain():
    # graph_sort_nbrs_by_degree (totem_graph.cu:935-976): hub first
    from totem_ray.graph.edges import sort_neighbors_by_degree
    # vertex 0 -> {1, 2, 3}; 1 is on a chain (deg 2), 2 is a hub (deg 3),
    # 3 is a leaf (deg 0 out)
    e = np.array([[0, 1], [0, 2], [0, 3],
                  [1, 4], [1, 5],
                  [2, 6], [2, 7], [2, 8]], dtype=np.uint64)
    out = sort_neighbors_by_degree(edges_from_arrays(e)).to_pandas()
    nbrs0 = out[out["src"] == 0]
    # descending neighbor out-degree: 2 (deg 3), 1 (deg 2), 3 (deg 0)
    assert nbrs0["dst"].tolist() == [2, 1, 3]
    assert nbrs0["nbr_degree"].tolist() == [3, 2, 0]


def test_subgraph_empty_vertex_set():
    # no vertex qualifying must yield an empty edge set, not an
    # IndexError inside every filter task
    ds = edges_from_arrays(np.array([[0, 1], [1, 2]]))
    out = subgraph(ds, np.array([], dtype=np.int64))
    assert out.count() == 0


def test_degree_histogram_includes_sinks():
    # directed edges 0->1, 0->2: vertices 1 and 2 have out-degree 0 and
    # must appear in the degree-0 bucket (reference degreeDist bins
    # every CSR vertex, totem_generator.cc:520-571)
    ds = edges_from_arrays(np.array([[0, 1], [0, 2]], dtype=np.uint64))
    h = degree_histogram(ds).to_pandas().set_index("degree")["num_vertices"]
    assert h[0] == 2 and h[2] == 1


def test_random_weights_preserve_attrs():
    import pyarrow as pa
    import ray.data

    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([10, 20], pa.int64())})
    out = add_random_weights(ray.data.from_arrow(t)).to_pandas()
    assert set(out.columns) == {"src", "dst", "ts", "weight"}
    assert sorted(out["ts"].tolist()) == [10, 20]


def test_remap_vertex_ids_missing_raises():
    import pandas as pd
    import ray.data
    from totem_ray.graph.edges import remap_vertex_ids

    ds = edges_from_arrays(np.array([[0, 1], [1, 2]], dtype=np.uint64))
    mapping = ray.data.from_pandas(
        pd.DataFrame({"v": [0, 1], "new_id": [10, 11]}))  # 2 unmapped
    with pytest.raises(Exception, match="remap_vertex_ids"):
        remap_vertex_ids(ds, mapping).to_pandas()


def test_lookup_sorted_and_in_sorted():
    from totem_ray.nputil import in_sorted, lookup_sorted

    keys = np.array([2, 5, 9], dtype=np.int64)
    vals = np.array([20, 50, 90], dtype=np.int64)
    assert lookup_sorted(keys, vals, np.array([9, 2, 5])).tolist() == [90, 20, 50]
    with pytest.raises(ValueError, match="absent"):
        lookup_sorted(keys, vals, np.array([2, 3]))
    with pytest.raises(ValueError, match="empty"):
        lookup_sorted(keys[:0], vals[:0], np.array([2]))
    assert lookup_sorted(keys[:0], vals[:0], np.array([], dtype=np.int64)).size == 0
    assert in_sorted(keys, np.array([1, 2, 10, 9])).tolist() == \
        [False, True, False, True]
    assert in_sorted(keys[:0], np.array([1])).tolist() == [False]


def test_triangle_orient_missing_degree_raises():
    # assume_simple=True on a one-sided (non-symmetrized) edge list:
    # dst 2 never appears as src, so its degree is unknown — the
    # orientation must fail loudly, not mis-read a neighbor's degree
    from totem_ray.algs.triangles import triangle_counts

    ds = edges_from_arrays(np.array([[0, 1], [1, 0], [1, 2]], dtype=np.uint64))
    with pytest.raises(Exception, match="triangle orientation"):
        triangle_counts(ds, num_buckets=2, assume_simple=True,
                        broadcast_max_edges=0, driver_degrees_max=0) \
            .to_pandas()


def test_component_set_two_triangles():
    # two directed 3-cycles + a pendant edge off the second:
    # components {0,1,2} (3 edges) and {10,11,12,13} (4 edges)
    e = np.array([[0, 1], [1, 2], [2, 0],
                  [10, 11], [11, 12], [12, 10], [12, 13]], dtype=np.int64)
    ds = edges_from_arrays(e, num_blocks=3)
    from totem_ray.algs.components import component_set, connected_components

    cc = connected_components(ds, num_partitions=2)
    out = component_set(ds, cc["result"]).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    cc["engine"].shutdown()
    assert out["label"].tolist() == [0, 10]
    assert out["num_vertices"].tolist() == [3, 4]
    assert out["num_edges"].tolist() == [3, 4]
    assert out["is_biggest"].tolist() == [False, True]
