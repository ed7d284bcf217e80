"""Graph analysis / validation passes (``analyze summary`` family,
src/generator/totem_generator.cc:499-571 and the check_* validators
totem_generator.cc:161-375), as Dataset aggregations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Sum

from totem_ray.graph.edges import vertex_degrees


def degree_histogram(edges):
    """(degree, num_vertices) out-degree histogram (analyze degreeDist,
    totem_generator.cc:520-571). The reference bins EVERY vertex of the
    CSR including hist[0], so the universe here is the union of edge
    endpoints: in-only (sink) vertices contribute to the degree-0
    bucket. Two-level aggregate: per-vertex degree, then count per
    degree value."""
    from totem_ray.graph.joins import grouped_reduce

    deg = vertex_degrees(edges).select_columns(["out_degree"])

    def partial(t: pa.Table) -> pa.Table:
        d, c = np.unique(np.asarray(t["out_degree"]), return_counts=True)
        return pa.table({"degree": pa.array(d, type=pa.int64()),
                         "_n": pa.array(c, type=pa.int64())})

    part = deg.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(part, ["degree"], ["_n"], how="sum",
                          out_names=["num_vertices"])


def _sum_by_pair(ds, value_cols: list[str], out_names: list[str]):
    """groupby (src, dst) summing ``value_cols`` -> Dataset (src, dst,
    *out_names); hash-bucket combine (see joins.grouped_reduce for
    why this is not Ray's two-key sort aggregate)."""
    from totem_ray.graph.joins import grouped_reduce

    return grouped_reduce(ds, ["src", "dst"], value_cols, how="sum",
                          out_names=out_names)


def repeated_edges(edges):
    """(src, dst, multiplicity) for edges appearing more than once
    (count_repeated_edges, totem_generator.cc:298-318)."""
    def partial(t: pa.Table) -> pa.Table:
        return t.select(["src", "dst"]).group_by(["src", "dst"]) \
                .aggregate([([], "count_all")]) \
                .rename_columns(["src", "dst", "_c"])

    part = edges.map_batches(partial, batch_format="pyarrow")
    counts = _sum_by_pair(part, ["_c"], ["multiplicity"])
    return counts.filter(expr="multiplicity > 1")


def count_repeated_edges(edges) -> int:
    """Total surplus multi-edge rows (scalar)."""
    rep = repeated_edges(edges)
    agg = rep.aggregate(Sum("multiplicity"), Count(alias_name="n"))
    total = agg.get("sum(multiplicity)") or 0
    n = agg.get("n") or 0
    return int(total - n)


def vertex_universe(edges):
    """Distinct vertex ids touched by any edge — the complement drives
    singleton removal (graph_remove_singletons,
    totem_graph.cu:468-484)."""
    return vertex_degrees(edges).select_columns(["v"])


def singleton_count(edges, num_vertices: int) -> int:
    """Vertices (of a dense 0..n-1 id space) with no in- or out-edges
    (count_singletons_and_leafs, totem_generator.cc:339-375)."""
    touched = vertex_universe(edges).count()
    return int(num_vertices - touched)


def check_symmetry(edges):
    """Rows whose reverse edge is missing or has mismatched
    multiplicity (check_direction, totem_generator.cc:235-273).
    Empty result == graph is symmetric. Implemented as a tagged-union
    self-join: forward rows carry _fwd=1, reversed rows _rev=1; a
    symmetric graph has equal sums per (src, dst) key."""
    def tag(flip: bool):
        def fn(t: pa.Table) -> pa.Table:
            src, dst = (t["dst"], t["src"]) if flip else (t["src"], t["dst"])
            n = t.num_rows
            one = np.ones(n, dtype=np.int64)
            zero = np.zeros(n, dtype=np.int64)
            return pa.table({
                "src": src, "dst": dst,
                "_fwd": pa.array(zero if flip else one),
                "_rev": pa.array(one if flip else zero),
            })
        return fn

    fwd = edges.map_batches(tag(False), batch_format="pyarrow")
    rev = edges.map_batches(tag(True), batch_format="pyarrow")
    both = fwd.union(rev)
    sums = _sum_by_pair(both, ["_fwd", "_rev"], ["fwd", "rev"])
    return sums.filter(expr="fwd != rev")


def modularity(edges, labels_ds, num_partitions_hint: int = 64,
               broadcast_max_labels: int = 5_000_000):
    """Newman-Girvan modularity of a vertex labeling
    (partition_modularity, src/totem/totem_partition.cu:109-140):
    Q = sum_c [ e_c/m - (deg_c / 2m)^2 ] over the symmetrized edge
    table. ``labels_ds`` is a Dataset (v, label).

    Dual plan (the triangles idiom): below ``broadcast_max_labels``
    the labeling is broadcast as a sorted lookup (one ``ray.put``,
    read in every task); above it the per-edge endpoint labels come
    from two distributed hash joins — V rows never stage through the
    driver heap."""
    # materialize once: the count gate and the collect (or joins)
    # below are separate consumers of the same labeling pipeline
    labels_ds = labels_ds.materialize()
    if labels_ds.count() <= broadcast_max_labels:
        lab = labels_ds.to_pandas()
        order = np.argsort(lab["v"].to_numpy())
        vs = lab["v"].to_numpy()[order].astype(np.int64)
        ls = lab["label"].to_numpy()[order]
        ref = ray.put((vs, ls))

        def fn(t: pa.Table) -> pa.Table:
            v_sorted, l_sorted = ray.get(ref)
            s = np.asarray(t["src"])
            d = np.asarray(t["dst"])
            if not len(v_sorted):
                return _modularity_partial(np.empty(0, np.int64),
                                           np.empty(0, np.int64))
            # clamp + equality check (the broadcast_lookup idiom):
            # an endpoint missing from labels_ds must DROP the edge
            # (matching the join plan's inner-join semantics), not
            # crash on an out-of-range index or silently take the
            # next vertex's label
            si = np.minimum(np.searchsorted(v_sorted, s),
                            len(v_sorted) - 1)
            di = np.minimum(np.searchsorted(v_sorted, d),
                            len(v_sorted) - 1)
            ok = (v_sorted[si] == s) & (v_sorted[di] == d)
            return _modularity_partial(l_sorted[si[ok]], l_sorted[di[ok]])

        part = edges.map_batches(fn, batch_format="pyarrow")
    else:
        from totem_ray.graph.joins import hash_join

        def as_src(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["v"], "_ls": t["label"]})

        def as_dst(t: pa.Table) -> pa.Table:
            return pa.table({"dst": t["v"], "_ld": t["label"]})

        lab_s = labels_ds.map_batches(as_src, batch_format="pyarrow")
        lab_d = labels_ds.map_batches(as_dst, batch_format="pyarrow")
        tagged = hash_join(
            hash_join(edges.select_columns(["src", "dst"]), lab_s,
                      on="src", num_buckets=num_partitions_hint),
            lab_d, on="dst", num_buckets=num_partitions_hint)

        def fn2(t: pa.Table) -> pa.Table:
            return _modularity_partial(np.asarray(t["_ls"]),
                                       np.asarray(t["_ld"]))

        part = tagged.map_batches(fn2, batch_format="pyarrow")

    per_label = part.groupby("label").aggregate(
        Sum("_deg", alias_name="deg"), Sum("_intra", alias_name="intra"))
    pdf = per_label.to_pandas()
    m = float(pdf["deg"].sum())  # = directed edge rows = 2m_undirected
    if m == 0:
        return 0.0
    return float((pdf["intra"] / m - (pdf["deg"] / m) ** 2).sum())


def _modularity_partial(ls_: np.ndarray, ld_: np.ndarray) -> pa.Table:
    """Per-batch combiner: per-label degree and intra-edge counts."""
    intra = (ls_ == ld_)
    lab_u, deg_c = np.unique(ls_, return_counts=True)
    lab_i, e_c = np.unique(ls_[intra], return_counts=True)
    return pa.table({
        "label": pa.array(np.concatenate([lab_u, lab_i])),
        "_deg": pa.array(np.concatenate([deg_c, np.zeros_like(e_c)]),
                         type=pa.int64()),
        "_intra": pa.array(np.concatenate([np.zeros_like(deg_c), e_c]),
                           type=pa.int64()),
    })


def graph_summary(edges) -> "pa.Table":
    """One-row summary (analyze summary, totem_generator.cc:499-518):
    edge count, distinct vertices, self loops, duplicate (src,dst)
    pairs, asymmetric pair count. All counts from vectorized per-batch
    partials + one small reduce per statistic."""
    # five statistics consume the same pipeline — run it once
    edges = edges.materialize()
    n_edges = edges.count()

    def partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        return pa.table({"n_self": pa.array([int((s == d).sum())],
                                            type=pa.int64())})

    n_self = int(edges.map_batches(partial, batch_format="pyarrow")
                 .sum("n_self") or 0)
    n_vertices = vertex_universe(edges).count()
    dup_pairs = repeated_edges(edges).count()
    n_asym = check_symmetry(edges).count()
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_vertices": pa.array([n_vertices], type=pa.int64()),
        "n_self_loops": pa.array([n_self], type=pa.int64()),
        "n_duplicate_pairs": pa.array([dup_pairs], type=pa.int64()),
        "n_asymmetric_pairs": pa.array([n_asym], type=pa.int64()),
    })
