"""BSP engine tests: PageRank + CC parity with numpy oracles and the
reference's closed-form assertions, across physical plans
(FIXTURES.md §4 — the moral of the reference's 24-config matrix,
totem_common_unittest.h:65-241)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from totem_ray.algs import connected_components, pagerank
from totem_ray.engine.bsp import BspEngine
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.graph.partition import DegreePartitioner, HashPartitioner
from totem_ray.sources.fixtures import topology_edges


def np_pagerank_rounds(n, e, rounds=5, d=0.85):
    rank = np.full(n, 1.0 / n)
    deg = np.bincount(e[:, 0].astype(int), minlength=n)
    for r in range(rounds):
        mail = np.zeros(n)
        np.add.at(mail, e[:, 1].astype(int), rank[e[:, 0].astype(int)])
        new = (1 - d) / n + d * mail
        if r < rounds - 1:
            stored = new.copy()
            nz = deg > 0
            stored[nz] = new[nz] / deg[nz]
            rank = stored
        else:
            rank = new
    return rank


def np_pagerank_converge(n, e, d=0.85, tol=1e-6):
    rank = np.full(n, 1.0 / n)
    deg = np.bincount(e[:, 0].astype(int), minlength=n)
    while True:
        contrib = np.zeros(n)
        nz = deg > 0
        contrib[nz] = rank[nz] / deg[nz]
        mail = np.zeros(n)
        np.add.at(mail, e[:, 1].astype(int), contrib[e[:, 0].astype(int)])
        new = (1 - d) / n + d * mail
        if np.abs(new - rank).sum() <= tol:
            return new
        rank = new


def _ranks(out):
    return out["result"].to_pandas().sort_values("v")["rank"].to_numpy()


@pytest.mark.parametrize("P,partkind", [(1, "hash"), (2, "hash"),
                                        (4, "hash"), (4, "degree"),
                                        (8, "hash")])
def test_pagerank_physical_plan_invariance(P, partkind):
    n, e = topology_edges("star_1000")
    ds = edges_from_arrays(e, num_blocks=3)
    if partkind == "degree":
        from totem_ray.graph.edges import degree_table
        part = DegreePartitioner.from_degrees(degree_table(ds), P, alpha=0.3)
    else:
        part = HashPartitioner(P)
    out = pagerank(ds, num_partitions=P, partitioner=part, mode="rounds")
    got = _ranks(out)
    exp = np_pagerank_rounds(n, e)
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12)
    out["engine"].shutdown()


@pytest.mark.parametrize("name", ["chain_100", "grid_15", "star_1000"])
def test_pagerank_convergence_oracle(name):
    n, e = topology_edges(name)
    out = pagerank(edges_from_arrays(e, num_blocks=2), num_partitions=3)
    assert out["converged"]
    assert np.allclose(_ranks(out), np_pagerank_converge(n, e),
                       rtol=0, atol=1e-6)
    out["engine"].shutdown()


def test_pagerank_closed_forms():
    # chain symmetry (totem_page_rank_unittest.cu:97-104)
    n, e = topology_edges("chain_100")
    out = pagerank(edges_from_arrays(e), mode="rounds")
    r = _ranks(out)
    assert np.allclose(r, r[::-1])
    out["engine"].shutdown()
    # complete graph: all equal (:107-115)
    n, e = topology_edges("complete_300")
    out = pagerank(edges_from_arrays(e), mode="rounds")
    r = _ranks(out)
    assert np.allclose(r, r[0])
    out["engine"].shutdown()
    # star: hub strictly greater, spokes equal (:118-127)
    n, e = topology_edges("star_1000")
    out = pagerank(edges_from_arrays(e), mode="rounds")
    df = out["result"].to_pandas().set_index("v")
    assert df.loc[0, "rank"] > df.drop(0)["rank"].max()
    spokes = df.drop(0)["rank"].to_numpy()
    assert np.allclose(spokes, spokes[0])
    out["engine"].shutdown()


def test_pagerank_single_vertex():
    # single-vertex graph -> rank 1.0 (totem_page_rank_unittest.cu:88-94)
    n, e = topology_edges("single_node_loop")
    out = pagerank(edges_from_arrays(e), num_partitions=2)
    df = out["result"].to_pandas()
    assert len(df) == 1 and df.iloc[0]["rank"] == 1.0


def test_cc_exact_labels():
    # 4-component chain: labels {0, 10, 20, 31}
    # (totem_cc_unittest.cu:114-142)
    n, e = topology_edges("chain_4_comp_40")
    out = connected_components(edges_from_arrays(e, num_blocks=3),
                               num_partitions=4)
    lab = out["result"].to_pandas().sort_values("v")["label"].to_numpy()
    exp = np.concatenate([np.full(10, 0), np.full(10, 10),
                          np.full(11, 20), np.full(9, 31)])
    assert np.array_equal(lab, exp)
    out["engine"].shutdown()


@pytest.mark.parametrize("P", [1, 2, 4])
def test_cc_chain_single_component(P):
    n, e = topology_edges("chain_1000")
    out = connected_components(edges_from_arrays(e), num_partitions=P)
    lab = out["result"].to_pandas()["label"].to_numpy()
    assert (lab == 0).all()
    out["engine"].shutdown()


def test_cc_frontier_shrinks_star():
    # frontier discipline (totem_cc_hybrid.cu:51-79): after the star's
    # spokes adopt the hub-propagated min label, nothing re-sends —
    # per-superstep changed counts must collapse, not stay at O(V)
    n, e = topology_edges("star_1000")
    out = connected_components(edges_from_arrays(e), num_partitions=4)
    changed = [m["changed"] for m in out["metrics"]]
    assert changed[-1] == 0
    # every superstep after the first touches far fewer than V vertices
    assert all(c < n / 2 for c in changed[1:])
    out["engine"].shutdown()


def test_cc_disconnected_self_labels():
    # edgeless graph -> label[v] = v (totem_cc_unittest.cu:90-100)
    vs = ray.data.from_pandas(
        pd.DataFrame({"v": np.arange(1000, dtype=np.int64)}))
    out = connected_components(
        edges_from_arrays(np.empty((0, 2), dtype=np.uint64)),
        vertices=vs, num_partitions=4)
    df = out["result"].to_pandas().sort_values("v")
    assert np.array_equal(df["v"].to_numpy(), df["label"].to_numpy())
    out["engine"].shutdown()


def test_engine_reuse_and_degree_kernel():
    # one engine, two algorithms (engine reuse is a reference design
    # goal, totem_engine.cuh:6-10); degree kernel mirrors the engine
    # unit test's toy algorithm (totem_engine_unittest.cu:159-174)
    n, e = topology_edges("star_1000")
    eng = BspEngine(4).build(edges_from_arrays(e))
    out1 = eng.run("degree", {})
    df = out1["result"].to_pandas().set_index("v")
    assert df.loc[0, "in_degree"] == 999
    assert (df.drop(0)["in_degree"] == 1).all()
    out2 = eng.run("pagerank", {"mode": "rounds"})
    assert len(out2["result"].to_pandas()) == n
    eng.shutdown()


@pytest.mark.parametrize("mode", ["rounds", "converge"])
def test_pagerank_pull_matches_push(mode):
    """Pull (broadcast contrib, GROOVES_PULL) and push engines produce
    identical ranks (the reference runs the incoming/pull variant in
    its benchmark, totem_benchmark_binary.cu:202-205)."""
    n, e = topology_edges("rmat_s10_ef8")
    push = pagerank(edges_from_arrays(e, num_blocks=2), num_partitions=4,
                    mode=mode)
    pull = pagerank(edges_from_arrays(e, num_blocks=2), num_partitions=4,
                    mode=mode, direction="pull")
    rp = _ranks(push)
    rq = _ranks(pull)
    assert np.allclose(rp, rq, rtol=0, atol=1e-12)
    assert push["result"].to_pandas()["v"].sort_values().equals(
        pull["result"].to_pandas()["v"].sort_values())
    push["engine"].shutdown()
    pull["engine"].shutdown()


def test_ingest_blocks_idempotent_and_sliced():
    # routing is pure: rows are tagged with _pid and materialized, and
    # each shard keeps only its own rows from the shared block refs —
    # re-delivery is impossible because materialize() emits each routed
    # row exactly once (totem_ray/engine/bsp.py build)
    import pyarrow as pa
    import ray as _ray
    from totem_ray.engine.shard import GraphShard
    from totem_ray.graph.partition import HashPartitioner

    t = pa.table({"src": pa.array([0, 1, 3], pa.int64()),
                  "dst": pa.array([2, 5, 7], pa.int64()),
                  "_pid": pa.array([0, 1, 1], pa.int32())})
    ref = _ray.put(t)
    sh = GraphShard(1, 2)
    assert sh.ingest_edge_blocks([ref]) == 2       # keeps only pid-1 rows
    sh.prepare(HashPartitioner(2))
    info = sh.finalize({})
    assert info["ne"] == 2

    sh0 = GraphShard(0, 2)
    assert sh0.ingest_edge_blocks([ref]) == 1
    vs = pa.table({"v": pa.array([4, 9], pa.int64()),
                   "_pid": pa.array([0, 1], pa.int32())})
    assert sh0.ingest_vertex_blocks([_ray.put(vs)]) == 1
    sh0.prepare(HashPartitioner(2))
    info0 = sh0.finalize({})
    assert info0["ne"] == 1 and info0["nv"] >= 2


def test_split_edge_block_is_shard_selective():
    # round-3 build path: each shard receives ONLY its own rows — the
    # split task partitions a routed block into P per-shard sub-tables
    # (bsp._split_edge_block), so a shard never fetches another
    # shard's bytes (no P-way broadcast of the edge table)
    import pyarrow as pa
    import ray as _ray
    from totem_ray.engine.bsp import _split_edge_block, _split_vertex_block
    from totem_ray.graph.partition import HashPartitioner

    P = 4
    part = HashPartitioner(P)
    rng = np.random.default_rng(7)
    src = rng.integers(0, 1000, 500).astype(np.int64)
    dst = rng.integers(0, 1000, 500).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    parts = _ray.get(list(_split_edge_block.options(num_returns=P)
                          .remote([t], part, "src", P)))
    total = 0
    for p, sub in enumerate(parts):
        if sub is None:
            continue
        # payload is a dict of numpy column slices (see
        # bsp._split_edge_block: numpy slices pickle only their bytes)
        pids = part.pid_np(np.asarray(sub["src"]))
        assert (pids == p).all()          # strictly this shard's rows
        total += len(sub["src"])
    assert total == 500                    # nothing lost, nothing doubled

    vparts = _ray.get(list(_split_vertex_block.options(num_returns=P)
                           .remote([pa.table({"id": pa.array(src)})],
                                   part, P)))
    vtotal = 0
    for p, sub in enumerate(vparts):
        if sub is None:
            continue
        v = np.asarray(sub["v"])
        assert (part.pid_np(v) == p).all()
        assert len(np.unique(v)) == len(v)
        vtotal += len(v)
    assert vtotal == len(np.unique(src))

    # empty block → all-None split
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    eparts = _ray.get(list(_split_edge_block.options(num_returns=P)
                           .remote([empty], part, "src", P)))
    assert all(s is None for s in eparts)


def test_build_from_pandas_block_dataset():
    # upstream operators (e.g. Ray's aggregate reduce) produce PANDAS
    # blocks; to_arrow_refs hands the raw block to the shards, so
    # ingest must normalize (the minhash CC path hit this)
    import pandas as pd
    import ray.data as rd
    from totem_ray.algs import connected_components

    df = pd.DataFrame({"src": np.array([0, 1, 5], dtype=np.int64),
                       "dst": np.array([1, 2, 6], dtype=np.int64)})
    out = connected_components(rd.from_pandas(df), num_partitions=2)
    lab = out["result"].to_pandas().set_index("v")["label"]
    out["engine"].shutdown()
    assert lab[0] == lab[1] == lab[2]
    assert lab[5] == lab[6] != lab[0]


def test_build_from_aggregate_filtered_edges():
    # the minhash-CC shape: candidate pairs from a pandas-block
    # aggregate, filtered (possibly to nothing), mapped to (src, dst).
    # Must build whether the filter keeps rows or empties the dataset
    # (an empty derived dataset reports schema() None).
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min
    from totem_ray.algs import connected_components

    pairs = rd.from_arrow(pa.table({
        "a": pa.array([0, 0, 5], type=pa.int64()),
        "b": pa.array([1, 1, 6], type=pa.int64()),
        "est": pa.array([1.0, 1.0, 0.95], type=pa.float64())}))
    cand = pairs.groupby(["a", "b"]).aggregate(Min("est", alias_name="est"))

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a"].combine_chunks().cast(pa.int64()),
                         "dst": t["b"].combine_chunks().cast(pa.int64())})

    verts = rd.from_arrow(pa.table({"v": pa.array([0, 1, 5, 6],
                                                  type=pa.int64())}))
    kept = cand.filter(expr="est >= 0.9").map_batches(
        as_edges, batch_format="pyarrow")
    out = connected_components(kept, vertices=verts, num_partitions=2)
    lab = out["result"].to_pandas().set_index("v")["label"]
    out["engine"].shutdown()
    assert lab[0] == lab[1] and lab[5] == lab[6] and lab[0] != lab[5]

    none = cand.filter(expr="est >= 2.0").map_batches(
        as_edges, batch_format="pyarrow")
    out2 = connected_components(none, vertices=verts, num_partitions=2)
    lab2 = out2["result"].to_pandas().set_index("v")["label"]
    out2["engine"].shutdown()
    assert (lab2.index.to_numpy() == lab2.to_numpy()).all()  # all self


def test_cc_dense_frontier_message_format():
    # early dense rounds ship ONE per-slot array (8 B/slot), late thin
    # rounds ship sparse pairs (16 B/pair) — reference bitmap scatter
    # (totem_cc_hybrid.cu:239-263); both formats must min-combine to
    # identical candidates
    from types import SimpleNamespace

    from totem_ray.engine.kernels import (ConnectedComponentsKernel,
                                          _apply_min_inbox, _min_outbox)

    I64MAX = np.iinfo(np.int64).max
    size = 100
    # every slot touched -> dense
    src = np.arange(100, dtype=np.int64)
    dst = np.arange(100, dtype=np.int64)   # ghost-slot ids, sorted
    sh = SimpleNamespace(pid=0, nv=100,
                         tgt={1: {"src": src, "dst": dst, "size": size}})
    st = {"label": np.arange(100, dtype=np.int64) * 7,
          "frontier": np.ones(100, dtype=bool)}
    out = ConnectedComponentsKernel.compute(sh, st, 0)
    assert isinstance(out[1], np.ndarray) and len(out[1]) == size
    # dense message is strictly smaller than the sparse pair encoding
    assert out[1].nbytes < 16 * size

    # thin frontier -> sparse pairs
    st2 = {"label": np.arange(100, dtype=np.int64) * 7,
           "frontier": np.zeros(100, dtype=bool)}
    st2["frontier"][:3] = True
    out2 = ConnectedComponentsKernel.compute(sh, st2, 0)
    assert isinstance(out2[1], tuple) and len(out2[1][0]) == 3

    # both formats apply identically
    rng = np.random.default_rng(3)
    ud = np.unique(rng.integers(0, size, 70))
    red = rng.integers(0, 1000, len(ud)).astype(np.int64)
    imap = rng.permutation(200)[:size]          # unique local indices
    dense = _min_outbox(ud, red, size, I64MAX)
    assert isinstance(dense, np.ndarray)
    ca = np.full(200, I64MAX, dtype=np.int64)
    cb = np.full(200, I64MAX, dtype=np.int64)
    _apply_min_inbox(ca, imap, dense, I64MAX)
    _apply_min_inbox(cb, imap, (ud, red), I64MAX)
    assert (ca == cb).all()


def test_build_empty_dataset_zero_blocks():
    """A derived dataset that kept nothing materializes to zero blocks;
    build must produce an empty graph, not crash in _ref_groups."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2], type=pa.int64()),
        "dst": pa.array([2, 3], type=pa.int64())}))
    empty = ds.filter(lambda r: False)
    eng = BspEngine(2)
    eng.build(empty)
    assert eng.total_vertices == 0 and eng.total_edges == 0
    eng.shutdown()


def test_shard_pool_recycles_actors():
    """shutdown() parks reset actors; the next same-shaped engine must
    reuse the SAME actor handles (skipping respawn) and still compute
    correct results on a different graph."""
    from totem_ray.engine import bsp

    n, e = topology_edges("chain_100")
    eng1 = BspEngine(3).build(edges_from_arrays(e))
    out1 = eng1.run("connected_components", {})
    assert len(out1["result"].to_pandas()) == n
    ids1 = {s._actor_id for s in eng1.shards}
    key = eng1._pool_key
    eng1.shutdown()
    assert len(bsp._SHARD_POOL.get(key, [])) == 1  # parked, not killed

    n2, e2 = topology_edges("star_1000")
    eng2 = BspEngine(3).build(edges_from_arrays(e2))
    ids2 = {s._actor_id for s in eng2.shards}
    assert ids1 == ids2  # recycled, not respawned
    df = eng2.run("degree", {})["result"].to_pandas().set_index("v")
    assert df.loc[0, "in_degree"] == 999  # no state leaked from graph 1
    assert len(df) == n2
    eng2.shutdown(pool=False)  # killed: pool must stay empty
    assert len(bsp._SHARD_POOL.get(key, [])) == 0
