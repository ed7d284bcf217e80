"""Max flow (push-relabel, [Hong08]).

Reference: maxflow_cpu/gpu (src/alg/totem_maxflow.cu): residual graph
via graph_create_bidirectional, preflow from the source, batched
push-relabel kernel cycles until no operation applies; the max flow
is the sink's excess (totem_maxflow.cu:570). Kernel semantics in
engine/kernels.MaxflowKernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


from totem_ray.engine.bsp import BspEngine
from totem_ray.graph.edges import create_bidirectional


def maxflow(edges, source: int, sink: int, num_partitions: int = 4,
            partitioner=None, engine: BspEngine | None = None,
            max_supersteps: int = 100_000, cycles: int = 0) -> dict:
    """Returns {max_flow: float, result: Dataset(v, excess, height),
    engine}. ``edges`` is a weighted directed edge table (capacity =
    weight, default 1); parallel edges are combined by capacity sum
    (flow-equivalent) and the residual reverse edges are added here
    (graph_create_bidirectional, totem_graph.cu:486-585)."""
    cols = ["src", "dst"] + (["weight"]
                             if "weight" in (edges.schema().names or [])
                             else [])
    e = edges.select_columns(cols)
    if "weight" not in cols:
        def add_w(t: pa.Table) -> pa.Table:
            return t.append_column(
                "weight", pa.array(np.ones(t.num_rows), type=pa.float64()))
        e = e.map_batches(add_w, batch_format="pyarrow")
    # combine parallel edges: the mirror of (u, v) must be the UNIQUE
    # (v, u) row (MaxflowKernel's pair-identified reverse indices)
    from totem_ray.graph.joins import grouped_reduce

    e = grouped_reduce(e, ["src", "dst"], ["weight"], how="sum")
    residual = create_bidirectional(e).select_columns(["src", "dst",
                                                       "weight"])
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(residual)
    out = engine.run("maxflow",
                     {"source": int(source), "sink": int(sink),
                      "total_vertices": engine.total_vertices,
                      "cycles": cycles},
                     max_supersteps=max_supersteps)
    sink_row = out["result"].filter(expr=f"v == {int(sink)}").take(1)
    out["max_flow"] = float(sink_row[0]["excess"]) if sink_row else 0.0
    out["engine"] = engine
    return out
