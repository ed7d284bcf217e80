"""Stress centrality (sampled or exact over a source list).

Reference: stress_cpu/gpu (src/alg/totem_stress.cu:307-400): per
source a shortest-path-counting forward BFS, then a backward sweep
where delta(v) = sum over successors u of (1 + delta(u)) and the
per-source contribution is sigma(v) * delta(v) for v != source
(totem_stress.cu:386,393). Reuses the betweenness chaining pattern:
BfsSigmaKernel forward, StressBackKernel backward, one engine for
every source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from totem_ray.engine.bsp import BspEngine


def stress(edges, sources=None, sample: int = 8, num_partitions: int = 4,
           partitioner=None, vertices=None,
           engine: BspEngine | None = None,
           checkpoint_dir: str | None = None,
           resume: bool = False) -> dict:
    """Returns {result: Dataset(v, stress), sources, engine}.

    ``sources=None`` uses the ``sample`` smallest vertex ids
    (deterministic stand-in for full-source exactness — the reference
    loops every source, totem_stress.cu:330). ``stress`` is the raw
    sum of per-source contributions over the chosen sources (the
    reference applies no sampling scale).

    With ``checkpoint_dir`` every finished source's contribution
    partial is persisted atomically; ``resume=True`` skips finished
    sources (algs/sweep.py)."""
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
        back = engine.run("stress_back", {"max_level": int(max_level)},
                          max_supersteps=max(int(max_level), 1))

        def drop_source(t: pa.Table, _s=src_id) -> pa.Table:
            keep = np.asarray(t["v"]) != _s
            return pa.table({"v": pa.array(np.asarray(t["v"])[keep]),
                             "_c": pa.array(
                                 np.asarray(t["contrib"],
                                            dtype=np.float64)[keep])})

        return back["result"].map_batches(drop_source,
                                          batch_format="pyarrow")

    per_source, sweep_info = sweep_sources(
        engine, "stress", sources, run_one,
        checkpoint_dir=checkpoint_dir, resume=resume)
    agg = union_all(per_source) \
        .groupby("v").aggregate(Sum("_c", alias_name="stress"))
    return {"result": agg, "sources": list(map(int, sources)),
            "engine": engine, "sweep": sweep_info}
