"""Triangle counting / clustering coefficient tests — exact counts vs
closed forms and a brute-force oracle
(clustering_coefficient_sorted_neighbours semantics,
totem_clustering.cu:368-431; cc formula :422-426)."""

import numpy as np
import pytest

from totem_ray.algs import clustering_coefficient, triangle_counts
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def brute_triangles(n, e):
    adj = [set() for _ in range(n)]
    for s, d in e:
        if s != d:
            adj[int(s)].add(int(d))
            adj[int(d)].add(int(s))
    T = np.zeros(n, dtype=np.int64)
    for v in range(n):
        for w in adj[v]:
            if w > v:
                for u in adj[v] & adj[w]:
                    if u > w:
                        T[v] += 1
                        T[w] += 1
                        T[u] += 1
    return T


def test_complete_graph():
    n, e = topology_edges("complete_300")
    cc = clustering_coefficient(edges_from_arrays(e, num_blocks=4),
                                num_buckets=8, num_join_partitions=4).to_pandas()
    assert len(cc) == 300
    assert (cc["triangles"] == 299 * 298 // 2).all()
    assert np.allclose(cc["cc"], 1.0)


def test_wheel():
    n, e = topology_edges("wheel_1000")
    cc = clustering_coefficient(edges_from_arrays(e), num_buckets=8,
                                num_join_partitions=4).to_pandas().set_index("v")
    assert cc.loc[0, "triangles"] == 999      # one per rim edge
    assert (cc.drop(0)["triangles"] == 2).all()
    assert np.allclose(cc.drop(0)["cc"], 2 / 3)


@pytest.mark.parametrize("name", ["chain_1000", "star_1000", "grid_15"])
def test_triangle_free(name):
    n, e = topology_edges(name)
    cc = clustering_coefficient(edges_from_arrays(e), num_buckets=8,
                                num_join_partitions=4).to_pandas()
    assert (cc["triangles"] == 0).all()
    assert (cc["cc"] == 0).all()


def test_rmat_brute_force_oracle():
    n, e = topology_edges("rmat_s8_ef8")
    T = brute_triangles(n, e)
    tri = triangle_counts(edges_from_arrays(e, num_blocks=3), num_buckets=8,
                          num_join_partitions=4).to_pandas().set_index("v")
    got = np.zeros(n, dtype=np.int64)
    got[tri.index.to_numpy()] = tri["triangles"].to_numpy()
    assert np.array_equal(got, T)


def test_multigraph_and_self_loops_ignored():
    # duplicates + self loops must not change counts (simple-graph
    # semantics; the reference pre-sorts/dedups via alter sortNbrs)
    tri_e = np.array([[0, 1], [1, 2], [0, 2]], dtype=np.uint64)
    noisy = np.concatenate([tri_e, tri_e, [[0, 0], [1, 1]]]).astype(np.uint64)
    cc = clustering_coefficient(edges_from_arrays(noisy), num_buckets=4,
                                num_join_partitions=2).to_pandas()
    assert (cc["triangles"] == 1).all()
    assert np.allclose(cc["cc"], 1.0)


def test_both_physical_plans_agree():
    """Broadcast fast path vs distributed join path — same counts
    (the 24-config matrix moral applied to plan selection)."""
    from totem_ray.algs.triangles import triangle_counts
    from totem_ray.graph.edges import edges_from_arrays
    from totem_ray.sources.fixtures import topology_edges

    n, e = topology_edges("rmat_s10_ef8")
    fast = triangle_counts(edges_from_arrays(e), num_buckets=8,
                           num_join_partitions=8).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    join = triangle_counts(edges_from_arrays(e), num_buckets=8,
                           num_join_partitions=8,
                           broadcast_max_edges=0).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert fast.equals(join)
    assert fast["triangles"].sum() > 0
    # degree attachment via distributed hash joins (past the
    # driver-degrees gate) must agree as well
    joind = triangle_counts(edges_from_arrays(e), num_buckets=8,
                            num_join_partitions=8,
                            broadcast_max_edges=0,
                            driver_degrees_max=0).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert fast.equals(joind)


def test_block_splitting_does_not_fragment_sources():
    # Ray's dynamic block splitting (target_max_block_size) can break
    # the src-grouped-block contract in-place wedge generation relies
    # on; _ensure_src_whole must detect the split and repair it. Force
    # splitting with a tiny block target and check exact counts on a
    # graph big enough to split (complete_100 at a 16 KiB target).
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # 16 KiB
        from totem_ray.sources.fixtures import complete
        n, e = complete(100)
        got = triangle_counts(edges_from_arrays(e), num_buckets=4) \
            .to_pandas().sort_values("v")
        expect = (n - 1) * (n - 2) // 2
        assert len(got) == n and (got["triangles"] == expect).all()
        # the forced-join plan under splitting as well
        gotj = triangle_counts(edges_from_arrays(e), num_buckets=4,
                               broadcast_max_edges=0) \
            .to_pandas().sort_values("v")
        assert len(gotj) == n and (gotj["triangles"] == expect).all()
    finally:
        ctx.target_max_block_size = old


def test_wedge_chunks_split_inside_hub_group():
    """Element-sliced chunking: a chunk boundary may fall INSIDE one
    source's group (the old group-sliced loop materialized a hub's
    whole quadratic wedge set at once); counts must stay exact."""
    from totem_ray.algs.triangles import _wedge_chunks

    # one source with forward degree 9 -> 36 pairs
    a = np.full(9, 7, dtype=np.int64)
    b = np.arange(10, 19, dtype=np.int64)
    chunks = list(_wedge_chunks(a, b, wedge_chunk=5))
    assert len(chunks) > 3                     # split within the group
    tot = sum(len(u) for u, _, _ in chunks)
    assert tot == 9 * 8 // 2
    seen = set()
    for u, lo, hi in chunks:
        assert (u == 7).all() and (lo < hi).all()
        seen.update(zip(lo.tolist(), hi.tolist()))
    assert len(seen) == 36                     # all distinct pairs, once

    # end-to-end: K8 counts stay exact with a tiny chunk
    import pyarrow as pa
    import ray.data

    from totem_ray.algs.triangles import triangle_counts
    from totem_ray.graph.edges import edges_from_arrays

    e = np.array([[x, y] for x in range(8) for y in range(8) if x != y])
    for kw in ({}, {"broadcast_max_edges": 0}):
        got = triangle_counts(edges_from_arrays(e), num_buckets=4, **kw)
        df = got.to_pandas()
        assert (df["triangles"] == 21).all() and len(df) == 8, (kw, df)


def test_triangle_counts_empty_input():
    import pyarrow as pa
    import ray.data

    from totem_ray.algs.triangles import triangle_counts

    e = pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64())})
    for kw in ({}, {"broadcast_max_edges": 0}):
        ds = triangle_counts(ray.data.from_arrow(e), assume_simple=True,
                             **kw)
        assert ds.schema().names == ["v", "triangles"]
        assert ds.count() == 0


def test_wave_limited_join_agrees():
    """The wave-limited join (wedge_wave_bytes bounds per-wave shuffle
    spill; wedges keyed by hash(source) across waves) must reproduce
    the single-exchange plans exactly — counts AND edge supports."""
    from totem_ray.algs.triangles import edge_supports, triangle_counts
    from totem_ray.graph.edges import edges_from_arrays
    from totem_ray.sources.fixtures import topology_edges

    n, e = topology_edges("rmat_s10_ef8")
    fast = triangle_counts(edges_from_arrays(e), num_buckets=8,
                           num_join_partitions=8).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    # ~1 KB per wave forces many waves on this fixture
    waved = triangle_counts(edges_from_arrays(e), num_buckets=8,
                            num_join_partitions=8,
                            broadcast_max_edges=0,
                            wedge_wave_bytes=200_000).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert fast.equals(waved)
    assert fast["triangles"].sum() > 0
    sup_fast = edge_supports(edges_from_arrays(e), num_buckets=8,
                             num_join_partitions=8).to_pandas() \
        .sort_values(["lo", "hi"]).reset_index(drop=True)
    sup_waved = edge_supports(edges_from_arrays(e), num_buckets=8,
                              num_join_partitions=8,
                              broadcast_max_edges=0,
                              wedge_wave_bytes=200_000).to_pandas() \
        .sort_values(["lo", "hi"]).reset_index(drop=True)
    assert sup_fast.equals(sup_waved)


def test_wave_limited_join_resumes(tmp_path):
    """With checkpoint_dir, each finished wave's reduced partial
    persists atomically; a re-run loads every finished wave (markers
    untouched), and clearing one wave's marker recomputes only that
    wave — final counts identical throughout."""
    import os

    from totem_ray.algs.triangles import triangle_counts
    from totem_ray.graph.edges import edges_from_arrays
    from totem_ray.sources.fixtures import topology_edges

    n, e = topology_edges("rmat_s8_ef8")
    ck = str(tmp_path / "ck")
    kw = dict(num_buckets=4, num_join_partitions=4,
              broadcast_max_edges=0, wedge_wave_bytes=100_000,
              checkpoint_dir=ck)
    first = triangle_counts(edges_from_arrays(e), **kw).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    base = os.path.join(ck, os.listdir(ck)[0])
    waves = sorted(d for d in os.listdir(base) if d.startswith("wave-"))
    assert len(waves) >= 2
    mtimes = {w: os.path.getmtime(os.path.join(base, w, "_DONE"))
              for w in waves}
    again = triangle_counts(edges_from_arrays(e), **kw).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert first.equals(again)
    for w in waves:  # loaded, not recomputed
        assert os.path.getmtime(os.path.join(base, w, "_DONE")) \
            == mtimes[w]
    # crash simulation: one wave's completion lost
    os.remove(os.path.join(base, waves[1], "_DONE"))
    resumed = triangle_counts(edges_from_arrays(e), **kw).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert first.equals(resumed)
    assert os.path.getmtime(os.path.join(base, waves[1], "_DONE")) \
        > mtimes[waves[1]]
    assert os.path.getmtime(os.path.join(base, waves[0], "_DONE")) \
        == mtimes[waves[0]]
