"""PageRank over an edge Dataset (user-facing wrapper).

Reference: page_rank_cpu (src/alg/totem_page_rank.cu:351-409) /
page_rank_incoming_hybrid (the benchmark variant,
src/benchmark/totem_benchmark_binary.cu:202-205). Semantics notes in
engine/kernels.PageRankKernel.
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def pagerank(edges, num_partitions: int = 4, partitioner=None,
             mode: str = "converge", damping: float = 0.85,
             rounds: int = 5, tol: float = 1e-6,
             max_supersteps: int = 200,
             vertices=None, engine: BspEngine | None = None,
             checkpoint_dir: str | None = None,
             checkpoint_every: int = 0, resume: bool = False,
             direction: str = "push") -> dict:
    """Returns {result: Dataset(v, rank), iterations, converged,
    metrics, ...}. ``mode='rounds'`` = reference 5-round parity;
    ``mode='converge'`` = iterate to L1 residual <= tol (north rule).
    ``direction='pull'`` uses the broadcast-contrib pull engine (the
    reference benchmark's page_rank_incoming_hybrid variant) — faster
    for dense power-law graphs; results identical.

    Special case mirroring check_special_cases
    (totem_page_rank.cu — single-vertex graph): |V| == 1 -> rank 1.0.
    """
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices,
                     route_by="dst" if direction == "pull" else "src")
    if engine.total_vertices == 1:
        import pandas as pd
        import ray.data

        ids = edges.take(1)
        vid = ids[0]["src"] if ids else None
        if vid is None and vertices is not None:
            row = vertices.take(1)[0]
            vid = row[next(iter(row))]
        result = ray.data.from_pandas(pd.DataFrame({"v": [vid], "rank": [1.0]}))
        return {"result": result, "iterations": 0, "converged": True,
                "metrics": [], "lineage": "special-single-vertex",
                "engine": engine}
    params = {"mode": mode, "damping": damping, "rounds": rounds, "tol": tol}
    alg = "pagerank_pull" if direction == "pull" else "pagerank"
    out = engine.run(alg, params,
                     max_supersteps=rounds if mode == "rounds" else max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out
