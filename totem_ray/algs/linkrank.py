"""Link-analysis wrappers beyond the reference kernel set: HITS,
personalized PageRank, edge-weighted PageRank (user-facing, same
shape as algs.pagerank). Semantics notes live on the kernels
(engine/kernels.py HitsKernel / PersonalizedPageRankKernel /
WeightedPageRankKernel)."""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def hits(edges, num_partitions: int = 4, partitioner=None,
         rounds: int = 5, engine: BspEngine | None = None,
         tagged: bool = False,
         checkpoint_dir: str | None = None,
         checkpoint_every: int = 0, resume: bool = False) -> dict:
    """HITS hubs/authorities. ``edges`` is a plain directed edge
    table — the direction-tagged double cover the kernel needs is
    built here (pass ``tagged=True`` if it already is). Returns
    {result: Dataset(v, auth, hub), iterations, ...}."""
    if engine is None:
        from totem_ray.graph.edges import tag_directions

        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges if tagged else tag_directions(edges))
    out = engine.run("hits", {"rounds": rounds},
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def personalized_pagerank(edges, seeds, num_partitions: int = 4,
                          partitioner=None, mode: str = "converge",
                          damping: float = 0.85, rounds: int = 4,
                          tol: float = 1e-6, max_supersteps: int = 200,
                          engine: BspEngine | None = None,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 0,
                          resume: bool = False) -> dict:
    """Random-walk-with-restart from ``seeds``. Returns
    {result: Dataset(v, rank), iterations, ...}."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges)
    params = {"seeds": tuple(int(s) for s in seeds), "damping": damping,
              "mode": mode, "rounds": rounds, "tol": tol}
    out = engine.run("ppr", params,
                     max_supersteps=rounds if mode == "rounds"
                     else max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def pagerank_weighted(edges, num_partitions: int = 4, partitioner=None,
                      mode: str = "converge", damping: float = 0.85,
                      rounds: int = 4, tol: float = 1e-6,
                      max_supersteps: int = 200,
                      engine: BspEngine | None = None,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 0,
                      resume: bool = False) -> dict:
    """Edge-weighted PageRank over a weighted edge table
    (src, dst, weight). Returns {result: Dataset(v, rank), ...}."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges)
    params = {"damping": damping, "mode": mode, "rounds": rounds,
              "tol": tol}
    out = engine.run("pagerank_weighted", params,
                     max_supersteps=rounds if mode == "rounds"
                     else max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out
