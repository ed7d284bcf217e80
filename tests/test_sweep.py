"""Per-source sweep checkpointing (algs/sweep.py): resumability for
closeness / betweenness / stress / APSP source loops."""

import os

import numpy as np
import pyarrow as pa
import pytest

from totem_ray.algs.betweenness import betweenness
from totem_ray.algs.sweep import sweep_sources
from totem_ray.algs.traversal import apsp, closeness
from totem_ray.engine.bsp import BspEngine
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def _mk_engine(name="grid_15", P=2):
    n, e = topology_edges(name)
    eng = BspEngine(P)
    eng.build(edges_from_arrays(e, num_blocks=2))
    return n, e, eng


def test_sweep_writes_and_skips(tmp_path):
    import ray.data

    n, e, eng = _mk_engine()
    calls = []

    def run_one(s):
        calls.append(s)
        return ray.data.from_arrow(pa.table({
            "v": pa.array([s], type=pa.int64()),
            "_d": pa.array([float(s)], type=pa.float64())}))

    ck = str(tmp_path / "sweep")
    parts, info = sweep_sources(eng, "toy", [0, 1, 2], run_one,
                                checkpoint_dir=ck)
    assert calls == [0, 1, 2]
    assert info["sources_run"] == 3 and info["sources_loaded"] == 0
    for s in (0, 1, 2):
        assert os.path.exists(os.path.join(info["checkpoint"],
                                           f"source={s}", "_DONE"))

    # resume with a SUPERSET: finished sources load, only 3 runs
    calls.clear()
    parts, info = sweep_sources(eng, "toy", [0, 1, 2, 3], run_one,
                                checkpoint_dir=ck, resume=True)
    assert calls == [3]
    assert info["sources_loaded"] == 3 and info["sources_run"] == 1
    got = sorted(int(r["v"]) for p in parts for r in p.take_all())
    assert got == [0, 1, 2, 3]
    eng.shutdown()


def test_sweep_wipes_incomplete_partial(tmp_path):
    import ray.data

    n, e, eng = _mk_engine()
    ck = str(tmp_path / "sweep")

    def run_one(s):
        return ray.data.from_arrow(pa.table({
            "v": pa.array([s], type=pa.int64())}))

    _, info = sweep_sources(eng, "toy", [5], run_one, checkpoint_dir=ck)
    d = os.path.join(info["checkpoint"], "source=5")
    # simulate a crash mid-write: data present, marker missing
    os.remove(os.path.join(d, "_DONE"))
    parts, info2 = sweep_sources(eng, "toy", [5], run_one,
                                 checkpoint_dir=ck, resume=True)
    assert info2["sources_run"] == 1 and info2["sources_loaded"] == 0
    assert os.path.exists(os.path.join(d, "_DONE"))
    eng.shutdown()


def test_sweep_lineage_isolation(tmp_path):
    """A checkpoint from another algorithm or graph never mixes in."""
    import ray.data

    n, e, eng = _mk_engine()
    ck = str(tmp_path / "sweep")

    def run_one(s):
        return ray.data.from_arrow(pa.table({
            "v": pa.array([s], type=pa.int64())}))

    _, a = sweep_sources(eng, "algA", [1], run_one, checkpoint_dir=ck)
    _, b = sweep_sources(eng, "algB", [1], run_one, checkpoint_dir=ck,
                         resume=True)
    assert a["checkpoint"] != b["checkpoint"]
    assert b["sources_run"] == 1  # algB did not reuse algA's partial
    eng.shutdown()


@pytest.mark.parametrize("alg", ["betweenness", "closeness", "apsp"])
def test_sweep_resume_identical_result(tmp_path, alg):
    """checkpointed + resumed == plain run, value-identical."""
    n, e = topology_edges("grid_15")
    fns = {"betweenness": betweenness, "closeness": closeness,
           "apsp": apsp}
    kw = {"sources": [0, 1, 2, 3]}
    plain = fns[alg](edges_from_arrays(e, num_blocks=2),
                     num_partitions=2, **kw)
    want = plain["result"].to_pandas()
    plain["engine"].shutdown()

    ck = str(tmp_path / alg)
    first = fns[alg](edges_from_arrays(e, num_blocks=2), num_partitions=2,
                     checkpoint_dir=ck, sources=[0, 1])
    first["result"].materialize()
    assert first["sweep"]["sources_run"] == 2
    first["engine"].shutdown()

    resumed = fns[alg](edges_from_arrays(e, num_blocks=2), num_partitions=2,
                       checkpoint_dir=ck, resume=True, **kw)
    assert resumed["sweep"]["sources_loaded"] == 2
    assert resumed["sweep"]["sources_run"] == 2
    got = resumed["result"].to_pandas()
    resumed["engine"].shutdown()

    sort_cols = [c for c in ("source", "v") if c in want.columns]
    want = want.sort_values(sort_cols).reset_index(drop=True)
    got = got.sort_values(sort_cols).reset_index(drop=True)
    assert list(want.columns) == list(got.columns)
    for c in want.columns:
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(),
                                   rtol=1e-12, err_msg=f"{alg}.{c}")


def test_sweep_lineage_tracks_graph_content(tmp_path):
    """Two graphs with equal |V|,|E| but different edges (or weights)
    must not share a sweep lineage — |V|,|E|-only identity let a
    checkpoint from a different graph silently mix into a resume."""
    import ray.data

    def run_one(s):
        return ray.data.from_arrow(pa.table({
            "v": pa.array([s], type=pa.int64())}))

    e1 = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    e2 = np.array([[0, 2], [2, 1], [1, 3], [3, 0]])  # same counts
    eng1 = BspEngine(2)
    eng1.build(edges_from_arrays(e1, num_blocks=2))
    eng2 = BspEngine(2)
    eng2.build(edges_from_arrays(e2, num_blocks=2))
    assert eng1.total_vertices == eng2.total_vertices
    assert eng1.total_edges == eng2.total_edges
    ck = str(tmp_path / "lin")
    _, i1 = sweep_sources(eng1, "toy", [0], run_one, checkpoint_dir=ck)
    _, i2 = sweep_sources(eng2, "toy", [0], run_one, checkpoint_dir=ck,
                          resume=True)
    assert i1["lineage"] != i2["lineage"]
    assert i2["sources_loaded"] == 0 and i2["sources_run"] == 1

    # weights-only change must also fork the lineage
    w1 = np.ones(4)
    w2 = np.array([1.0, 1.0, 2.0, 1.0])
    eng3 = BspEngine(2)
    eng3.build(edges_from_arrays(e1, weights=w1, num_blocks=2))
    eng4 = BspEngine(2)
    eng4.build(edges_from_arrays(e1, weights=w2, num_blocks=2))
    _, i3 = sweep_sources(eng3, "toy", [0], run_one, checkpoint_dir=ck)
    _, i4 = sweep_sources(eng4, "toy", [0], run_one, checkpoint_dir=ck,
                          resume=True)
    assert i3["lineage"] != i4["lineage"]
    for e in (eng1, eng2, eng3, eng4):
        e.shutdown()


def test_graph_fp_partition_count_invariant():
    """The content fingerprint is a sum over shard-exclusive slices,
    so it must not depend on the partition count (a resume at a
    different P reuses the same per-source partials)."""
    n, e = topology_edges("grid_15")
    fps = []
    for P in (1, 2, 4):
        eng = BspEngine(P)
        eng.build(edges_from_arrays(e, num_blocks=3))
        fps.append(eng.graph_fp)
        eng.shutdown()
    assert fps[0] == fps[1] == fps[2] != 0


def test_graph_fp_duplicate_vertex_blocks_invariant():
    """A vertex id repeated across input blocks must hash into the
    content fingerprint ONCE: the split tasks dedupe only within
    their block group, so the shard-side fp dedupes across chunks —
    otherwise the fp (and so checkpoint lineage) would depend on the
    block layout / partition count."""
    import pyarrow as pa
    import ray.data

    n, e = topology_edges("grid_15")
    vt = pa.table({"v": pa.array([7, 300, 7, 301], type=pa.int64())})
    fps = []
    for nb in (1, 4):
        eng = BspEngine(2)
        eng.build(edges_from_arrays(e, num_blocks=3),
                  vertices_ds=ray.data.from_arrow(vt).repartition(nb))
        fps.append(eng.graph_fp)
        eng.shutdown()
    assert fps[0] == fps[1] != 0
