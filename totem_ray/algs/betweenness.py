"""Betweenness centrality (Brandes), exact or source-sampled.

Reference: betweenness_cpu/gpu/hybrid (src/alg/totem_betweenness.cu,
totem_betweenness_hybrid.cu): per source, a forward shortest-path-
counting BFS then a backward level-by-level dependency accumulation;
``epsilon`` selects a source sample and scores scale by
V / num_samples (totem_betweenness.cu:795-805). The reference sums
raw per-source dependencies (no 1/2 undirected correction) — matched
here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from totem_ray.engine.bsp import BspEngine


def betweenness(edges, sources=None, sample: int = 8,
                num_partitions: int = 4, partitioner=None, vertices=None,
                engine: BspEngine | None = None,
                checkpoint_dir: str | None = None,
                resume: bool = False) -> dict:
    """Returns {result: Dataset(v, betweenness), sources, engine}.

    ``sources=None`` uses the ``sample`` smallest vertex ids
    (deterministic sampling stand-in for the reference's RNG sample);
    pass every vertex id for exact scores. Sampled scores scale by
    V / num_samples per the reference.

    With ``checkpoint_dir`` every finished source's dependency partial
    is persisted atomically; ``resume=True`` skips finished sources
    (algs/sweep.py).
    """
    from ray.data.aggregate import Sum

    from totem_ray.algs.sweep import sweep_sources, union_all

    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    if sources is None:
        first = edges.select_columns(["src"]) \
            .groupby("src").count().sort("src").limit(sample).take_all()
        sources = [r["src"] for r in first]

    def run_one(src_id: int):
        fwd = engine.run("bfs_sigma", {"source": src_id})
        max_level = fwd["result"].max("cost")
        back = engine.run("brandes_back", {"max_level": int(max_level)},
                          max_supersteps=max(int(max_level), 1))

        def drop_source(t: pa.Table, _s=src_id) -> pa.Table:
            keep = np.asarray(t["v"]) != _s
            return pa.table({"v": pa.array(np.asarray(t["v"])[keep]),
                             "_d": pa.array(
                                 np.asarray(t["delta"],
                                            dtype=np.float64)[keep])})

        return back["result"].map_batches(drop_source,
                                          batch_format="pyarrow")

    per_source, sweep_info = sweep_sources(
        engine, "betweenness", sources, run_one,
        checkpoint_dir=checkpoint_dir, resume=resume)
    agg = union_all(per_source) \
        .groupby("v").aggregate(Sum("_d", alias_name="betweenness"))

    scale = 1.0
    if len(sources) < engine.total_vertices:
        scale = engine.total_vertices / len(sources)

    def fin(t: pa.Table, _sc=scale) -> pa.Table:
        return pa.table({
            "v": t["v"],
            "betweenness": pa.array(
                np.asarray(t["betweenness"], dtype=np.float64) * _sc,
                type=pa.float64()),
        })

    return {"result": agg.map_batches(fin, batch_format="pyarrow"),
            "sources": list(map(int, sources)), "engine": engine,
            "sweep": sweep_info}
