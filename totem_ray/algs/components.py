"""Connected components (hash-min label propagation) wrapper.

Reference: cc_hybrid (src/alg/totem_cc_hybrid.cu) — labels converge to
the minimum vertex id of each component over the adjacency as given
(exact-label tests, src/test/totem_cc_unittest.cu:114-142). Edgeless
graphs naturally yield label[v] = v (:33-49's special case falls out
of min-propagation with no messages).
"""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def connected_components(edges, num_partitions: int = 4, partitioner=None,
                         vertices=None, engine: BspEngine | None = None,
                         max_supersteps: int = 100_000,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 0, resume: bool = False) -> dict:
    """Returns {result: Dataset(v, label), iterations, ...}; label =
    min vertex id (int64 order) in the component."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges, vertices_ds=vertices)
    out = engine.run("connected_components", {},
                     max_supersteps=max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def component_sizes(cc_result_ds):
    """Per-component vertex counts + the biggest component — the
    component_set_t summary (get_components_cpu,
    src/totem/totem_components.cu:105-146)."""
    from ray.data.aggregate import Count

    sizes = cc_result_ds.groupby("label").aggregate(Count(alias_name="size"))
    biggest = sizes.sort("size", descending=True).take(1)
    return sizes, (biggest[0] if biggest else None)


def component_set(edges, cc_result_ds, num_buckets: int = 64):
    """Full component_set_t table (component_set_t,
    src/totem/totem_graph.h:175-182; get_components_cpu,
    totem_components.cu:105-146): per component label, the vertex
    count, the edge count (edge rows whose src lies in the component —
    on a symmetrized table each undirected edge counts twice, matching
    the CSR edge accounting), and the biggest-component flag (most
    vertices; smallest label on ties).

    Distributed: labels reach the edges through a hash join keyed on
    src; only the per-label count table (≤ #components rows) is
    reduced. The biggest flag costs one bounded driver take(1)."""
    import pyarrow as pa
    from ray.data.aggregate import Count

    from totem_ray.graph.joins import hash_join

    def as_src(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["v"], "label": t["label"]})

    lab_src = cc_result_ds.map_batches(as_src, batch_format="pyarrow")
    vc = cc_result_ds.groupby("label") \
        .aggregate(Count(alias_name="num_vertices"))
    ec = hash_join(edges.select_columns(["src", "dst"]), lab_src,
                   on="src", num_buckets=num_buckets) \
        .groupby("label").aggregate(Count(alias_name="num_edges"))
    # left join: an edgeless component has a vertex row but no edge row
    joined = hash_join(vc, ec, on="label", how="left",
                       num_buckets=num_buckets)

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ne = pc.fill_null(t["num_edges"], 0).cast(pa.int64())
        return t.set_column(t.column_names.index("num_edges"),
                            "num_edges", ne)

    joined = joined.map_batches(fill, batch_format="pyarrow").materialize()
    top = joined.sort(["num_vertices", "label"],
                      descending=[True, False]).take(1)
    big = int(top[0]["label"]) if top else None

    def flag(t: pa.Table) -> pa.Table:
        import numpy as np
        lbl = np.asarray(t["label"])
        return t.append_column(
            "is_biggest", pa.array(lbl == big if big is not None
                                   else np.zeros(len(lbl), bool)))

    return joined.map_batches(flag, batch_format="pyarrow")
