"""Reader for the reference's on-disk edge-list format
(graph_initialize's text parser, src/totem/totem_graph.cu — header
lines ``#Nodes:N`` / ``#Edges:M`` / optional ``#Directed``, then one
``src dst [weight]`` row per edge).

From-scratch numpy parser (np.loadtxt over the non-comment rows);
returns the same (vertex count, edge table, directedness) triple the
reference's loader exposes, as a Ray Dataset of (src, dst[, weight])
plus metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parse_totem_file(path: str) -> dict:
    """-> {num_vertices, num_edges, directed, edges (m, 2) int64,
    weights (m,) float64 | None}."""
    num_vertices = num_edges = 0
    directed = False
    rows: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                key = line[1:].strip()
                low = key.lower()
                if low.startswith("nodes:"):
                    num_vertices = int(key.split(":", 1)[1])
                elif low.startswith("edges:"):
                    num_edges = int(key.split(":", 1)[1])
                elif low.startswith("directed"):
                    directed = True
                elif low.startswith("undirected"):
                    directed = False
                continue
            rows.append(line)
    if rows:
        arr = np.array([r.split() for r in rows], dtype=np.float64)
    else:
        arr = np.empty((0, 2), dtype=np.float64)
    edges = arr[:, :2].astype(np.int64)
    weights = arr[:, 2].astype(np.float64) if arr.shape[1] > 2 else None
    if num_edges and len(edges) != num_edges:
        raise ValueError(f"{path}: header says {num_edges} edges, "
                         f"file has {len(edges)}")
    return {"num_vertices": num_vertices, "num_edges": len(edges),
            "directed": directed, "edges": edges, "weights": weights}


def read_totem_edges(path: str, num_blocks: int | None = None):
    """Ray Dataset of (src, dst[, weight]) from a .totem file. An
    undirected file is symmetrized (the reference loads undirected
    graphs with both arcs present per edge row already, so rows are
    taken as-is; directedness is metadata for the caller)."""
    import ray.data

    meta = parse_totem_file(path)
    cols = {"src": pa.array(meta["edges"][:, 0], type=pa.int64()),
            "dst": pa.array(meta["edges"][:, 1], type=pa.int64())}
    if meta["weights"] is not None:
        cols["weight"] = pa.array(meta["weights"], type=pa.float64())
    ds = ray.data.from_arrow(pa.table(cols))
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds
