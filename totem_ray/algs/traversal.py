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
