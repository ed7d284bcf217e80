"""Edge-table transforms — the engine's one true IR.

The edge table (``src: int64, dst: int64`` [+ ``weight: float64``] —
ids are 64-bit url-hash bit patterns stored signed; see hashing.as_u64)
replaces the reference's in-memory CSR (graph_t,
src/totem/totem_graph.h:127-170) as the inter-operator representation;
CSR exists only inside partition actors (engine/shard.py). Each
transform here mirrors a reference graph transformation
(src/generator/totem_generator.cc, src/totem/totem_graph.cu) as a
stateless vectorized ``map_batches`` / ``groupby`` pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from totem_ray.hashing import as_u64, splitmix64

EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def edges_from_arrays(edges: np.ndarray, num_blocks: int | None = None,
                      weights: np.ndarray | None = None) -> "ray.data.Dataset":
    """numpy (m,2) -> edge Dataset (test/fixture helper)."""
    e = np.ascontiguousarray(edges)
    e = e.view(np.int64) if e.dtype == np.uint64 else e.astype(np.int64, copy=False)
    cols = {"src": pa.array(e[:, 0], type=pa.int64()),
            "dst": pa.array(e[:, 1], type=pa.int64())}
    if weights is not None:
        cols["weight"] = pa.array(weights, type=pa.float64())
    t = pa.table(cols)
    ds = ray.data.from_arrow(t)
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds


def symmetrize(edges, dedup: bool = False):
    """Emit both directions of every edge (``alter undirected``,
    totem_generator.cc:631-680 — the reference keeps duplicates;
    pass dedup=True for distinct rows)."""
    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            cols[name] = t["dst"] if name == "src" else t["src"] if name == "dst" else t[name]
        return pa.concat_tables([t, pa.table(cols).select(t.column_names)])

    out = edges.map_batches(fn, batch_format="pyarrow")
    if not dedup:
        return out
    sch = edges.schema()
    extra = [c for c in (sch.names if sch else [])
             if c not in ("src", "dst")]
    if extra:
        # dedup_edges keys on (src, dst) only and would silently drop
        # the attribute columns (e.g. weight) this function's own map
        # carefully preserves
        raise ValueError(
            f"symmetrize(dedup=True) would drop column(s) {extra}; "
            "dedup before attaching attributes or pass dedup=False")
    return dedup_edges(out)


def reverse_edges(edges):
    """Swap src/dst (``alter reverse``, totem_generator.cc:594-628)."""
    def fn(t: pa.Table) -> pa.Table:
        cols = {"src": t["dst"], "dst": t["src"]}
        for name in t.column_names:
            if name not in ("src", "dst"):
                cols[name] = t[name]
        return pa.table(cols)

    return edges.map_batches(fn, batch_format="pyarrow")


def tag_directions(edges):
    """Direction-tagged double cover for bidirectional BSP kernels
    (HitsKernel): every edge (u,v) becomes (u,v,weight=1.0) [forward]
    and (v,u,weight=2.0) [reverse], so a push-mode engine can move
    messages both WITH the original edges (tag 1) and AGAINST them
    (tag 2) from one CSR. One stateless map_batches pass; any existing
    weight column is replaced by the tag."""
    def fn(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks()
        dst = t["dst"].combine_chunks()
        n = t.num_rows
        tags = pa.chunked_array([
            pa.array(np.ones(n, dtype=np.float64)),
            pa.array(np.full(n, 2.0, dtype=np.float64))])
        return pa.table({"src": pa.chunked_array([src, dst]),
                         "dst": pa.chunked_array([dst, src]),
                         "weight": tags})

    return edges.map_batches(fn, batch_format="pyarrow")


def dedup_edges(edges, num_buckets: int = 64):
    """Distinct (src, dst) rows — exact dedup by hash-partitioned
    per-bucket unique (count_repeated_edges dedup pattern,
    totem_generator.cc:298-318). Per-batch pre-dedup bounds shuffle
    volume; the shuffle key is a single small-cardinality int (a
    composite-key groupby would sort on both 64-bit columns)."""
    from totem_ray.hashing import as_u64, splitmix64

    def pre(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        u = np.unique(np.stack([s, d], axis=1), axis=0)
        b = (splitmix64(splitmix64(as_u64(u[:, 0])) ^ as_u64(u[:, 1]))
             % int(num_buckets)).astype(np.int64)
        return pa.table({"src": pa.array(u[:, 0], type=pa.int64()),
                         "dst": pa.array(u[:, 1], type=pa.int64()),
                         "_b": pa.array(b)})

    def uniq(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        u = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.table({"src": pa.array(u[:, 0], type=pa.int64()),
                         "dst": pa.array(u[:, 1], type=pa.int64())})

    return edges.select_columns(["src", "dst"]) \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby("_b").map_groups(uniq, batch_format="pyarrow")


def drop_self_loops(edges):
    return edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))),
        batch_format="pyarrow")


def degree_table(edges, alias: str = "degree"):
    """Out-degree per src vertex (node_degree, totem_alg.h:294-295).

    Pre-aggregates per batch (partial combine) before the groupby so
    the shuffle carries one row per (batch, vertex), not per edge —
    the grooves dense-compression moral
    (totem_grooves_internal.cc:111-128).
    """
    def partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(np.asarray(t["src"]), return_counts=True)
        return pa.table({"v": pa.array(v, type=pa.int64()),
                         "_c": pa.array(c, type=pa.int64())})

    from totem_ray.graph.joins import grouped_reduce

    part = edges.select_columns(["src"]).map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(part, ["v"], ["_c"], how="sum",
                          out_names=[alias])


def vertex_degrees(edges):
    """Per-vertex (out_degree, in_degree) over the vertex universe
    (union of endpoints). In-only vertices appear with out_degree 0."""
    def partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        vs, cs = np.unique(s, return_counts=True)
        vd, cd = np.unique(d, return_counts=True)
        v = np.concatenate([vs, vd])
        return pa.table({
            "v": pa.array(v, type=pa.int64()),
            "_out": pa.array(np.concatenate([cs, np.zeros_like(cd)]), type=pa.int64()),
            "_in": pa.array(np.concatenate([np.zeros_like(cs), cd]), type=pa.int64()),
        })

    from totem_ray.graph.joins import grouped_reduce

    part = edges.select_columns(["src", "dst"]).map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(part, ["v"], ["_out", "_in"], how="sum",
                          out_names=["out_degree", "in_degree"])


def subgraph(edges, keep_vertices: np.ndarray):
    """Keep edges whose BOTH endpoints are in the vertex set
    (get_subgraph, totem_graph.cu:409-466). The set is broadcast once
    via ``ray.put`` and probed with sorted-array searchsorted — the
    broadcast-small-side semi-join."""
    keep_sorted = np.sort(np.asarray(keep_vertices).astype(np.int64, copy=False))
    ref = ray.put(keep_sorted)

    class Filter:
        def __init__(self):
            self.keep = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from totem_ray.nputil import in_sorted
            ok_s = in_sorted(self.keep, np.asarray(t["src"]))
            ok_d = in_sorted(self.keep, np.asarray(t["dst"]))
            return t.filter(pa.array(ok_s & ok_d))

    return edges.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))


def permute_ids(edges, seed: int = 42):
    """Hash-permute vertex ids (``alter permute``,
    totem_generator.cc:143-158,576-592): ids mapped through an
    injective-whp 64-bit mix instead of a materialized permutation
    array — no broadcast state, works at any scale."""
    s = np.uint64(splitmix64(np.array([seed], dtype=np.uint64))[0])

    def fn(t: pa.Table) -> pa.Table:
        cols = {"src": pa.array(splitmix64(as_u64(np.asarray(t["src"])) ^ s).view(np.int64), type=pa.int64()),
                "dst": pa.array(splitmix64(as_u64(np.asarray(t["dst"])) ^ s).view(np.int64), type=pa.int64())}
        for name in t.column_names:
            if name not in ("src", "dst"):
                cols[name] = t[name]
        return pa.table(cols)

    return edges.map_batches(fn, batch_format="pyarrow")


def add_random_weights(edges, seed: int = 42, max_weight: float = 1.0):
    """Attach deterministic pseudo-random weights in [0, max_weight]
    (``alter randWeights``, totem_generator.cc:772-784). Weight is a
    pure function of (src, dst, seed) so the result is independent of
    partitioning / block boundaries."""
    s = np.uint64(seed)

    def fn(t: pa.Table) -> pa.Table:
        src = as_u64(np.asarray(t["src"]))
        dst = as_u64(np.asarray(t["dst"]))
        h = splitmix64(splitmix64(src ^ s) ^ dst)
        w = (h / np.float64(2**64)) * max_weight
        out = t.drop(["weight"]) if "weight" in t.column_names else t
        return out.append_column("weight", pa.array(w, type=pa.float64()))

    return edges.map_batches(fn, batch_format="pyarrow")


def create_bidirectional(edges, num_buckets: int = 64):
    """Max-flow residual-graph transform (graph_create_bidirectional,
    totem_graph.cu:486-585): for every edge (u, v, w) ensure the
    reverse edge exists; added reverse edges get weight 0. Existing
    reverse edges keep their weight. Output columns (src, dst, weight,
    is_reverse) — is_reverse marks the residual (added) rows, playing
    the role of the reference's reverse-edge index."""
    from totem_ray.hashing import as_u64, splitmix64

    has_w = "weight" in (edges.schema().names or [])

    def tag(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        w = np.asarray(t["weight"], dtype=np.float64) if has_w \
            else np.ones(len(s), dtype=np.float64)
        b = (splitmix64(splitmix64(as_u64(np.minimum(s, d)))
                        ^ as_u64(np.maximum(s, d)))
             % int(num_buckets)).astype(np.int64)
        return pa.table({"src": pa.array(s, type=pa.int64()),
                         "dst": pa.array(d, type=pa.int64()),
                         "weight": pa.array(w, type=pa.float64()),
                         "_b": pa.array(b)})

    def _rows(a2: np.ndarray):
        # structured view: row-wise lexicographic compare/searchsorted
        a2 = np.ascontiguousarray(a2.astype(np.int64, copy=False))
        return a2.view([("s", np.int64), ("d", np.int64)]).ravel()

    def residual(t: pa.Table) -> pa.Table:
        # one bucket holds every edge of each unordered pair; the
        # reverse-existence probe is a sorted-rows membership test
        # (no per-row Python sets — module contract: vectorized)
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        w = np.asarray(t["weight"], dtype=np.float64)
        up = np.unique(np.stack([s, d], axis=1), axis=0)
        upv = _rows(up)
        revv = _rows(up[:, ::-1])
        pos = np.minimum(np.searchsorted(upv, revv), len(upv) - 1)
        missing = upv[pos] != revv          # reverse not present
        ns = up[missing][:, 1]
        nd = up[missing][:, 0]
        return pa.table({
            "src": pa.array(np.concatenate([s, ns]), type=pa.int64()),
            "dst": pa.array(np.concatenate([d, nd]), type=pa.int64()),
            "weight": pa.array(np.concatenate([w, np.zeros(len(ns))]),
                               type=pa.float64()),
            "is_reverse": pa.array(np.concatenate(
                [np.zeros(len(s), dtype=bool),
                 np.ones(len(ns), dtype=bool)])),
        })

    return edges.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(residual, batch_format="pyarrow")


def remove_singletons(edges, vertices, broadcast_max_vertices: int = 5_000_000):
    """Drop vertices with no in- or out-edges from a vertex Dataset
    (graph_remove_singletons, totem_graph.cu:468-484): semi-join of
    the vertex universe against distinct edge endpoints. Returns the
    surviving vertex Dataset (the edge table is unchanged by
    construction — singletons have no edges).

    Dual plan: a broadcast key set below ``broadcast_max_vertices``
    touched endpoints; a distributed semi hash-join above it (the
    endpoint set never stages through the driver heap)."""
    from totem_ray.graph.analysis import vertex_universe
    from totem_ray.graph.joins import hash_join, semi_join_broadcast

    # materialize once: the count gate and the collect/semi-join below
    # would otherwise each execute the full endpoint pipeline
    uni = vertex_universe(edges).materialize()
    col = vertices.schema().names[0]
    if uni.count() <= broadcast_max_vertices:
        endpoints = uni.to_pandas()["v"].to_numpy()
        return semi_join_broadcast(vertices, endpoints, on=col)
    if col != "v":
        uni = uni.map_batches(
            lambda t, _c=col: pa.table({_c: t["v"]}),
            batch_format="pyarrow")
    return hash_join(vertices, uni, on=col, how="semi")


def count_singletons_and_leafs(edges, num_vertices: int | None = None,
                               vertices=None) -> dict:
    """Singleton (no edges at all) and leaf (in-edges only, no
    out-edges) counts (count_singletons_and_leafs,
    totem_generator.cc:339-375). The universe is 0..num_vertices-1 or
    an explicit vertex Dataset."""
    degs = vertex_degrees(edges).materialize()  # two consumers below
    touched = degs.count()

    def leaf_partial(t: pa.Table) -> pa.Table:
        out_d = np.asarray(t["out_degree"])
        in_d = np.asarray(t["in_degree"])
        n = int(((out_d == 0) & (in_d > 0)).sum())
        return pa.table({"n": pa.array([n], type=pa.int64())})

    leafs = int(degs.map_batches(leaf_partial, batch_format="pyarrow")
                .sum("n") or 0)
    if vertices is not None:
        total = vertices.count()
    elif num_vertices is not None:
        total = int(num_vertices)
    else:
        total = touched
    return {"singletons": total - touched, "leafs": leafs,
            "vertices": total}


def sort_vertices_by_degree(edges, bucket_bits: int = 12):
    """Degree-ordered dense relabel (``alter sortVertices``,
    totem_generator.cc:682-748): new_id 0..V-1 assigned in
    (out-degree DESC, vertex id ASC) order — the degree-aware id
    assignment reused for skew handling (SURVEY.md §2.2).

    Distributed-rank construction (no global zip-with-index):
    vertices are bucketed by the top ``bucket_bits`` bits of the id
    (order-preserving ranges in signed int64 order), the per
    (degree, bucket) counts — a small table — come to the driver for a
    cumulative-offset map, and each (degree, bucket) group sorts by id
    and adds its offset. Group size is bounded by the degree group /
    2^bucket_bits, so hub-degree groups stay block-sized at scale.

    Returns Dataset(v, degree, new_id).
    """
    from totem_ray.hashing import as_u64  # noqa: F401 (doc symmetry)

    degs = vertex_degrees(edges)  # (v, out_degree, in_degree)
    shift = 64 - bucket_bits

    def add_bucket(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"])
        b = (v >> shift) + (1 << (bucket_bits - 1))  # signed-order-preserving
        return pa.table({"v": t["v"], "degree": t["out_degree"],
                         "_b": pa.array(b, type=pa.int64())})

    # two consumers (count pass + relabel pass): materialize so the
    # vertex_degrees shuffle and upstream lineage run once
    db = degs.map_batches(add_bucket, batch_format="pyarrow").materialize()
    counts = db.groupby(["degree", "_b"]).aggregate(Count(alias_name="n")) \
               .to_pandas()
    counts = counts.sort_values(["degree", "_b"],
                                ascending=[False, True], kind="stable")
    offs = np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]])
    offset_map = {(int(d), int(b)): int(o) for d, b, o in
                  zip(counts["degree"], counts["_b"], offs)}

    def relabel(t: pa.Table) -> pa.Table:
        from totem_ray.nputil import col_np
        v = col_np(t, "v")
        deg = col_np(t, "degree")
        key = (int(deg[0]), int(col_np(t, "_b")[0]))
        order = np.argsort(v, kind="stable")
        return pa.table({
            "v": pa.array(v[order]),
            "degree": pa.array(deg[order]),
            "new_id": pa.array(offset_map[key]
                               + np.arange(t.num_rows, dtype=np.int64)),
        })

    return db.groupby(["degree", "_b"]).map_groups(relabel,
                                                   batch_format="pyarrow")


def remap_vertex_ids(edges, mapping, num_buckets: int = 32):
    """Apply a (v, new_id) relabel mapping to an edge table via a
    hash join on each endpoint (map_vertices_by_degree's application
    step, totem_partition.cu:55-107).

    The mapping must cover EVERY endpoint: an edge touching an
    unmapped vertex raises ValueError (left join + null check) rather
    than silently vanishing from the output."""
    from totem_ray.graph.joins import hash_join

    m = mapping.select_columns(["v", "new_id"])

    # hash_join joins on equal column names; rename around it
    def _ren(name_from, name_to):
        def fn(t: pa.Table) -> pa.Table:
            cols = {name_to if c == name_from else c: t[c]
                    for c in t.column_names}
            return pa.table(cols)
        return fn

    e = edges.select_columns(["src", "dst"])
    e = e.map_batches(_ren("src", "v"), batch_format="pyarrow")
    e = hash_join(e, m, on="v", how="left", num_buckets=num_buckets)
    e = e.map_batches(_ren("new_id", "new_src"), batch_format="pyarrow") \
         .select_columns(["new_src", "dst"]) \
         .map_batches(_ren("dst", "v"), batch_format="pyarrow")
    e = hash_join(e, m, on="v", how="left", num_buckets=num_buckets)
    e = e.map_batches(_ren("new_id", "new_dst"), batch_format="pyarrow") \
         .select_columns(["new_src", "new_dst"])
    def _fin(t: pa.Table) -> pa.Table:
        ns = t["new_src"].combine_chunks()
        nd = t["new_dst"].combine_chunks()
        misses = ns.null_count + nd.null_count
        if misses:
            raise ValueError(
                f"remap_vertex_ids: {misses} edge endpoints absent "
                "from the mapping (it must cover every vertex)")
        return pa.table({
            "src": ns.cast(pa.int64()),
            "dst": nd.cast(pa.int64()),
        })

    return e.map_batches(_fin, batch_format="pyarrow")


def sort_neighbors_by_degree(edges, descending: bool = True,
                             num_buckets: int = 32):
    """graph_sort_nbrs_by_degree (totem_graph.cu:935-976): order each
    vertex's adjacency by neighbor degree (descending by default, the
    reference's edge-degree sort for vwarp load balance), ties by
    neighbor id. Output (src, dst, nbr_degree) globally sorted by
    (src, rank): degree attach via one distributed hash join against
    the degree table, then an Arrow-native sort.

    The edge table feeds two consumers (degree aggregate + join
    probe); materialize it once so the upstream lineage is not
    re-executed per consumer — O(E) object-store blocks, spillable."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    deg = degree_table(edges, alias="nbr_degree")

    def ren(t: pa.Table) -> pa.Table:
        return pa.table({"dst": t["v"], "nbr_degree": t["nbr_degree"]})

    from totem_ray.graph.joins import hash_join

    joined = hash_join(edges,
                       deg.map_batches(ren, batch_format="pyarrow"),
                       on="dst", how="left", num_buckets=num_buckets)

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nd = t["nbr_degree"].combine_chunks()
        if pa.types.is_null(nd.type):
            nd = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        else:
            nd = pc.fill_null(nd, 0).cast(pa.int64())
        key = pc.multiply(nd, -1) if descending else nd
        return pa.table({"src": t["src"], "dst": t["dst"],
                         "nbr_degree": nd, "_k": key})

    out = joined.map_batches(fill, batch_format="pyarrow") \
        .sort(["src", "_k", "dst"])
    return out.drop_columns(["_k"])


def sort_edges(edges, descending: bool = False):
    """Global (src, dst) sort (graph_sort_nbrs, totem_graph.cu:923-933
    — adjacency-sortedness is enforced per-shard at CSR build time in
    the engine; this global sort exists for export/inspection)."""
    return edges.sort(["src", "dst"], descending=descending)
