"""Per-vertex triangle counting / clustering coefficient.

Reference: clustering_coefficient_sorted_neighbours_cpu — the
"working" variant the benchmark runs
(src/alg/totem_clustering.cu:368-431;
src/benchmark/totem_benchmark_binary.cu:241-252): per directed edge,
merge-intersect the two sorted adjacency lists; cc(v) =
2*T(v) / (deg(v) * (deg(v)-1)), 0 when T(v)=0 (:422-426).

Ray-Data-first, NON-iterative design (SURVEY.md §2.6): instead of a
per-edge adjacency intersection over shared CSR state, a one-shot
pipeline on the deduped symmetrized edge table:

1. attach degrees, orient every undirected edge toward the higher
   (degree, id) endpoint — the classic degree-ordered orientation;
   each triangle becomes exactly one (a -> b -> c) path with
   rank(a) < rank(b) < rank(c), and per-source forward fan-out is
   bounded (hub adjacency splits go the low-rank way), which is the
   skew story Totem solves with virtual warps + degree buckets
   (totem_vwarp.cuh:21-36).
2. wedge generation per source bucket (hash(src) % B buckets so each
   ``map_groups`` call is one vectorized batch, not one vertex).
3. hash-join wedges against oriented edges => closed triangles.
4. scatter +1 credit to all three corners, partial-aggregated per
   batch before the final groupby (each corner counts every triangle
   once — the same accounting as the reference's
   intersection-sum per vertex on sorted lists).

Triangle counts are exact on the simple graph (duplicates and self
loops dropped); degree for the cc formula is the deduped symmetrized
degree, matching the reference's neighbor-list degree
(totem_clustering.cu:385).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum

from totem_ray.graph.edges import dedup_edges, drop_self_loops, degree_table, symmetrize
from totem_ray.graph.joins import hash_join
from totem_ray.hashing import hash_partition
from totem_ray.nputil import slice_offsets


def _rename(ds, mapping: dict):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _simple_undirected(edges):
    """Symmetrize + drop self loops + dedup: the simple undirected
    graph the sorted-neighbours variant assumes
    (totem_clustering.cu:433-465 requires symmetrized sorted input)."""
    return dedup_edges(drop_self_loops(symmetrize(edges)))


def _oriented_edges(simple_und, num_join_partitions: int):
    """Orient each undirected edge toward the higher (degree, id)
    endpoint; keep one row per undirected edge.

    Degrees are attached with two hash joins against the degree table
    (both sides large => no broadcast; Dataset.join hash-partitions on
    the key)."""
    deg_s = _rename(degree_table(simple_und, alias="deg_s"), {"v": "src"})
    deg_d = _rename(degree_table(simple_und, alias="deg_d"), {"v": "dst"})
    with_s = hash_join(simple_und, deg_s, on="src",
                       num_buckets=num_join_partitions)
    with_sd = hash_join(with_s, deg_d, on="dst",
                        num_buckets=num_join_partitions)

    def orient(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        ds_ = np.asarray(t["deg_s"])
        dd = np.asarray(t["deg_d"])
        # both directions of each undirected edge are present; keeping
        # only the forward rows keeps each edge exactly once
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        return pa.table({
            "a": pa.array(s[fwd], type=pa.int64()),
            "b": pa.array(d[fwd], type=pa.int64()),
        })

    return with_sd.map_batches(orient, batch_format="pyarrow")


def triangle_counts(edges, num_buckets: int = 64,
                    num_join_partitions: int = 32,
                    _simple_und=None):
    """Dataset (v, triangles) — exact per-vertex triangle counts.

    Vertices in no triangle are absent (join back / fill 0 downstream,
    as clustering_coefficient does)."""
    simple_und = _simple_und if _simple_und is not None else \
        _simple_undirected(edges).materialize()
    # oriented is consumed by BOTH the wedge stage and the closing
    # join; materialize once so the upstream dedup+joins don't run
    # twice (Ray Data re-executes shared lineage per consumer)
    oriented = _oriented_edges(simple_und, num_join_partitions).materialize()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(hash_partition(np.asarray(t["a"]), num_buckets)))

    bucketed = oriented.map_batches(add_bucket, batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        # one bucket's full forward-edge set, vectorized
        a = np.asarray(t["a"])
        b = np.asarray(t["b"])
        # group by a; within group order by (rank) — rank order among
        # forward nbrs only matters for consistent pair direction, and
        # (deg, id) rank is not available here; order pairs by the
        # GLOBAL orientation rule instead at emission below.
        order = np.argsort(a, kind="stable")
        a, b = a[order], b[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(a) != 0) + 1])
        sizes = np.diff(np.concatenate([starts, [len(a)]]))
        ords = np.arange(len(a)) - np.repeat(starts, sizes)
        second = np.repeat(np.arange(len(a)), ords)
        first = np.repeat(np.repeat(starts, sizes), ords) + slice_offsets(ords)
        u = a[second]          # wedge center (== a[first])
        x = b[first]
        y = b[second]
        return pa.table({
            "u": pa.array(u, type=pa.int64()),
            "x": pa.array(x, type=pa.int64()),
            "y": pa.array(y, type=pa.int64()),
        })

    wedge_ds = bucketed.groupby("bucket").map_groups(
        wedges, batch_format="pyarrow")

    # a wedge (u; x, y) closes iff the oriented edge x->y or y->x
    # exists. Canonicalize wedge pair by plain id order and join
    # against oriented edges canonicalized the same way.
    def canon_wedge(t: pa.Table) -> pa.Table:
        x = np.asarray(t["x"])
        y = np.asarray(t["y"])
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.table({"u": t["u"],
                         "lo": pa.array(lo, type=pa.int64()),
                         "hi": pa.array(hi, type=pa.int64())})

    def canon_edge(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"])
        b = np.asarray(t["b"])
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({"lo": pa.array(lo, type=pa.int64()),
                         "hi": pa.array(hi, type=pa.int64()),
                         "_e": pa.array(np.ones(len(a), dtype=np.int64))})

    wc = wedge_ds.map_batches(canon_wedge, batch_format="pyarrow")
    ec = oriented.map_batches(canon_edge, batch_format="pyarrow")
    closed = hash_join(wc, ec, on=["lo", "hi"],
                       num_buckets=num_join_partitions,
                       left_cols=["u", "lo", "hi"],
                       right_cols=["lo", "hi", "_e"])

    def credits(t: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(t["u"]), np.asarray(t["lo"]),
                            np.asarray(t["hi"])])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vu, type=pa.int64()),
                         "_t": pa.array(cnt, type=pa.int64())})

    per_batch = closed.map_batches(credits, batch_format="pyarrow")
    return per_batch.groupby("v").aggregate(Sum("_t", alias_name="triangles"))


def clustering_coefficient(edges, num_buckets: int = 64,
                           num_join_partitions: int = 32):
    """Dataset (v, triangles, degree, cc) over ALL vertices of the
    simple graph; cc = 2T/(d(d-1)), 0 if T=0 or d<2
    (totem_clustering.cu:422-426)."""
    import pyarrow.compute as pc

    simple_und = _simple_undirected(edges).materialize()
    deg = degree_table(simple_und, alias="degree")
    tri = triangle_counts(edges, num_buckets, num_join_partitions,
                          _simple_und=simple_und)
    joined = hash_join(deg, tri, on="v", how="left",
                        num_buckets=num_join_partitions,
                        left_cols=["v", "degree"],
                        right_cols=["v", "triangles"])

    def finish(t: pa.Table) -> pa.Table:
        d = np.asarray(t["degree"], dtype=np.float64)
        tri_col = t["triangles"].combine_chunks()
        if pa.types.is_null(tri_col.type):
            tr = np.zeros(t.num_rows, dtype=np.float64)
        else:
            tr = np.asarray(pc.fill_null(tri_col, 0).cast(pa.int64()),
                            dtype=np.float64)
        denom = d * (d - 1.0)
        cc = np.where((denom > 0) & (tr > 0), 2.0 * tr / np.maximum(denom, 1.0), 0.0)
        return pa.table({
            "v": t["v"],
            "triangles": pa.array(tr.astype(np.int64)),
            "degree": pa.array(d.astype(np.int64)),
            "cc": pa.array(cc, type=pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
