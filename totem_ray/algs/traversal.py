"""Traversal algorithms: BFS, BFS tree (Graph500), SSSP.

Reference: bfs_hybrid (src/alg/totem_bfs.cu, totem_bfs_hybrid.cu),
graph500_hybrid (src/alg/totem_graph500*.cu), sssp_hybrid
(src/alg/totem_sssp.cu, totem_sssp_hybrid.cu). Semantics notes in
engine/kernels.{BfsKernel,Graph500Kernel,SsspKernel}.
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def _run(alg: str, edges, source: int, num_partitions, partitioner,
         vertices, engine, max_supersteps, checkpoint_dir,
         checkpoint_every, resume) -> dict:
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run(alg, {"source": int(source)},
                     max_supersteps=max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def bfs(edges, source: int, num_partitions: int = 4, partitioner=None,
        vertices=None, engine: BspEngine | None = None,
        max_supersteps: int = 100_000, checkpoint_dir: str | None = None,
        checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, cost), ...}; cost = hop count from
    ``source``, -1 if unreachable (INF_COST, totem_alg.h:21-22)."""
    return _run("bfs", edges, source, num_partitions, partitioner,
                vertices, engine, max_supersteps, checkpoint_dir,
                checkpoint_every, resume)


def bfs_tree(edges, source: int, num_partitions: int = 4, partitioner=None,
             vertices=None, engine: BspEngine | None = None,
             max_supersteps: int = 100_000,
             checkpoint_dir: str | None = None,
             checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Graph500 BFS tree: Dataset(v, cost, parent); parent = minimum-id
    level-(cost-1) predecessor (deterministic), root's parent = root,
    -1 if unreachable."""
    return _run("bfs_tree", edges, source, num_partitions, partitioner,
                vertices, engine, max_supersteps, checkpoint_dir,
                checkpoint_every, resume)


def bfs_tree_stepwise(edges, source: int, num_partitions: int = 4,
                      partitioner=None, vertices=None,
                      engine: BspEngine | None = None, alpha: float = 0.1,
                      undirected: bool = True,
                      max_supersteps: int = 100_000) -> dict:
    """Direction-optimizing Graph500 BFS tree
    (graph500_stepwise_hybrid, src/alg/totem_graph500_stepwise_hybrid
    .cu): ``bfs_tree``'s (cost, min-id parent) output with
    ``bfs_stepwise``'s bottom-up switch when the global frontier
    exceeds ``alpha`` * |V|. Output is identical to ``bfs_tree`` on
    every input; same symmetric-graph assumption as ``bfs_stepwise``
    (pass ``undirected=False`` on directed graphs — every superstep
    then runs top-down)."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run("bfs_tree_dirop",
                     {"source": int(source),
                      "alpha": float(alpha) if undirected else 2.0,
                      "total_vertices": engine.total_vertices},
                     max_supersteps=max_supersteps)
    out["engine"] = engine
    return out


def bfs_stepwise(edges, source: int, num_partitions: int = 4,
                 partitioner=None, vertices=None,
                 engine: BspEngine | None = None, alpha: float = 0.1,
                 undirected: bool = True,
                 max_supersteps: int = 100_000) -> dict:
    """Direction-optimizing BFS (bfs_stepwise_hybrid,
    src/alg/totem_bfs_stepwise_hybrid.cu:984-1005): level-synchronous
    BFS that runs a superstep bottom-up whenever the global frontier
    exceeds ``alpha`` * |V| (the 10% switch, totem_alg.h:37).
    Identical costs to ``bfs`` on every graph; per-superstep
    ``bu_steps`` in metrics counts how many shards ran bottom-up.

    The bottom-up step scans each unvisited vertex's stored adjacency
    for a frontier member, which traverses edges AGAINST their
    direction — sound only on symmetric (undirected) edge tables, the
    same Graph500-style inputs the reference's stepwise variant
    targets. Pass ``undirected=False`` for a directed graph: every
    superstep then runs top-down (identical to ``bfs``, the
    optimization simply never engages).
    """
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run("bfs_dirop",
                     {"source": int(source),
                      "alpha": float(alpha) if undirected else 2.0,
                      "total_vertices": engine.total_vertices},
                     max_supersteps=max_supersteps)
    out["engine"] = engine
    return out


def apsp(edges, sources=None, num_partitions: int = 4, partitioner=None,
         vertices=None, engine: BspEngine | None = None,
         checkpoint_dir: str | None = None, resume: bool = False) -> dict:
    """All-pairs shortest paths (apsp_cpu/gpu, src/alg/totem_apsp.cu:
    one Dijkstra/SSSP per vertex into a |V|^2 distance matrix).

    At web scale a dense |V|^2 output is infeasible, so the output is
    the sparse reachable-pairs table Dataset(source, v, dist) and
    ``sources`` defaults to the full vertex set only when the caller
    passes it explicitly — ``sources=None`` runs every vertex of the
    graph (the reference semantics; intended for small graphs or
    source batches of a driver loop). One engine is reused across all
    runs (engine reuse, totem_engine.cuh:6-10). Weighted iff the edge
    table has a ``weight`` column (default weight 1, totem_graph.h:95).
    """
    import numpy as np
    import pyarrow as pa

    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    explicit_sources = sources is not None
    if sources is None:
        # the full vertex universe — sink-only vertices included (the
        # reference loops every vertex, totem_apsp.cu: their rows are
        # just (v, v, 0)) — STREAMED to the per-source loop one block
        # at a time (iter_batches over the sorted distinct-vertex
        # Dataset), never materialized whole on the driver; the
        # per-source checkpoint loop already bounds live state to one
        # source at a time
        def verts(t: pa.Table) -> pa.Table:
            u = np.unique(np.concatenate([np.asarray(t["src"]),
                                          np.asarray(t["dst"])]))
            return pa.table({"v": pa.array(u, type=pa.int64())})

        vert_ds = edges.select_columns(["src", "dst"]) \
            .map_batches(verts, batch_format="pyarrow") \
            .groupby("v").count().sort("v")

        def _stream_sources():
            for b in vert_ds.iter_batches(batch_format="pyarrow",
                                          batch_size=65536):
                yield from np.asarray(b["v"]).tolist()

        sources = _stream_sources()

    from totem_ray.algs.sweep import sweep_sources, union_all

    def run_one(src_id: int):
        out = engine.run("sssp", {"source": src_id})

        def tag(t: pa.Table, _s=src_id) -> pa.Table:
            d = np.asarray(t["dist"], dtype=np.float64)
            keep = np.isfinite(d)
            return pa.table({
                "source": pa.array(np.full(int(keep.sum()), _s,
                                           dtype=np.int64)),
                "v": pa.array(np.asarray(t["v"])[keep], type=pa.int64()),
                "dist": pa.array(d[keep], type=pa.float64()),
            })

        return out["result"].map_batches(tag, batch_format="pyarrow")

    per_source, sweep_info = sweep_sources(
        engine, "apsp", sources, run_one,
        checkpoint_dir=checkpoint_dir, resume=resume)
    return {"result": union_all(per_source),
            # the id list is only echoed back when the caller provided
            # one; the streamed full-universe path reports the count
            # (re-listing it would re-materialize what we just avoided)
            "sources": (list(map(int, sources)) if explicit_sources
                        else None),
            "num_sources": (sweep_info["sources_loaded"]
                            + sweep_info["sources_run"]),
            "engine": engine, "sweep": sweep_info}


def st_connectivity(edges, source: int, target: int,
                    num_partitions: int = 4, partitioner=None,
                    vertices=None, engine: BspEngine | None = None) -> dict:
    """s-t connectivity (stcon_cpu/gpu, decl totem_alg.h:281-285):
    {connected: bool, cost: hop distance or -1}. Implemented as BFS
    from ``source`` (the reference's bidirectional search is a
    constant-factor optimization)."""
    own_engine = engine is None
    out = bfs(edges, source, num_partitions, partitioner, vertices, engine)
    row = out["result"].filter(expr=f"v == {int(target)}").take(1)
    if own_engine:
        # only tear down an engine this call created — a caller-
        # provided engine stays alive for reuse (the module's
        # engine-reuse contract)
        out["engine"].shutdown()
    cost = int(row[0]["cost"]) if row else -1
    return {"connected": cost >= 0, "cost": cost,
            "engine": None if own_engine else out["engine"]}


def closeness(edges, sources=None, sample: int = 8,
              num_partitions: int = 4, partitioner=None, vertices=None,
              engine: BspEngine | None = None,
              checkpoint_dir: str | None = None,
              resume: bool = False) -> dict:
    """Closeness centrality (closeness_unweighted_cpu/gpu,
    src/alg/totem_closeness.cu): cc(v) = (reached(v) - 1) / sum of
    hop distances from the source set to v.

    The reference runs one BFS per vertex; at scale that is O(V)
    traversals, so ``sources=None`` uses the ``sample`` smallest
    vertex ids as a deterministic source sample (pass an explicit id
    list — e.g. every vertex — for the exact reference semantics).
    One engine is built once and reused across all per-source BFS
    runs (engine reuse, totem_engine.cuh:6-10).

    Returns {result: Dataset(v, dist_sum, reached, closeness),
    sources: [...], engine}.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    if sources is None:
        first = edges.select_columns(["src"]) \
            .groupby("src").count().sort("src").limit(sample).take_all()
        sources = [r["src"] for r in first]

    import numpy as np

    def as_partial(t: pa.Table) -> pa.Table:
        cost = np.asarray(t["cost"])
        return pa.table({
            "v": t["v"],
            "_d": pa.array(np.maximum(cost, 0), type=pa.int64()),
            "_r": pa.array((cost >= 0).astype(np.int64), type=pa.int64()),
        })

    from totem_ray.algs.sweep import sweep_sources, union_all

    def run_one(src_id: int):
        out = engine.run("bfs", {"source": src_id})
        return out["result"].map_batches(as_partial,
                                         batch_format="pyarrow")

    per_source, sweep_info = sweep_sources(
        engine, "closeness", sources, run_one,
        checkpoint_dir=checkpoint_dir, resume=resume)
    agg = union_all(per_source) \
        .groupby("v").aggregate(Sum("_d", alias_name="dist_sum"),
                                Sum("_r", alias_name="reached"))

    def fin(t: pa.Table) -> pa.Table:
        import numpy as np
        ds_ = np.asarray(t["dist_sum"], dtype=np.float64)
        rc = np.asarray(t["reached"], dtype=np.float64)
        cc = np.where(ds_ > 0, (rc - 1.0) / np.maximum(ds_, 1.0), 0.0)
        return pa.table({"v": t["v"], "dist_sum": t["dist_sum"],
                         "reached": t["reached"],
                         "closeness": pa.array(cc, type=pa.float64())})

    return {"result": agg.map_batches(fin, batch_format="pyarrow"),
            "sources": list(sources), "engine": engine,
            "sweep": sweep_info}


def sssp(edges, source: int, num_partitions: int = 4, partitioner=None,
         vertices=None, engine: BspEngine | None = None,
         max_supersteps: int = 100_000, checkpoint_dir: str | None = None,
         checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, dist), ...}; dist = min sum of edge
    weights from ``source`` (weight column optional, default 1), +inf
    if unreachable."""
    return _run("sssp", edges, source, num_partitions, partitioner,
                vertices, engine, max_supersteps, checkpoint_dir,
                checkpoint_every, resume)
