"""p-core (weighted k-core) decomposition wrapper.

Reference: pcore_cpu/gpu (src/alg/totem_pcores.cu, [Batagelj &
Zaversnik 2002] peel). Returns per-vertex ``round`` — the outer
p-round (threshold = start + round*step) at which the vertex was
peeled; with start=0, step=1 on an unweighted symmetrized graph this
is the standard core number. Semantics notes in
engine/kernels.PCoreKernel.
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def pcore(edges, start: int = 0, step: int = 1, num_partitions: int = 4,
          partitioner=None, vertices=None, engine: BspEngine | None = None,
          max_supersteps: int = 100_000, checkpoint_dir: str | None = None,
          checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, round), ...}.

    Single-vertex special case mirrors pcore_cpu (totem_pcores.cu:
    |V| == 1 -> round = edge_count).
    """
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    if engine.total_vertices == 1:
        import pandas as pd
        import ray.data

        ids = edges.take(1)
        vid = ids[0]["src"] if ids else None
        if vid is None and vertices is not None:
            # edgeless single-vertex graph: recover the id from the
            # explicit vertex universe (same fallback as pagerank's
            # special case) instead of emitting a null row
            row = vertices.take(1)[0]
            vid = row[next(iter(row))]
        result = ray.data.from_pandas(pd.DataFrame(
            {"v": [vid], "round": [engine.total_edges]}))
        return {"result": result, "iterations": 0, "converged": True,
                "metrics": [], "lineage": "special-single-vertex",
                "engine": engine}
    out = engine.run("pcore", {"start": start, "step": step},
                     max_supersteps=max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out
