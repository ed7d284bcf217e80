"""Per-vertex triangle counting / clustering coefficient.

Reference: clustering_coefficient_sorted_neighbours_cpu — the
"working" variant the benchmark runs
(src/alg/totem_clustering.cu:368-431;
src/benchmark/totem_benchmark_binary.cu:241-252): per directed edge,
merge-intersect the two sorted adjacency lists; cc(v) =
2*T(v) / (deg(v) * (deg(v)-1)), 0 when T(v)=0 (:422-426).

Ray-Data-first, NON-iterative design (SURVEY.md §2.6): instead of a
per-edge adjacency intersection over shared CSR state, a one-shot
pipeline with a SINGLE edge shuffle:

1. group edges by hash(src) with in-bucket dedup — global dedup,
   exact per-block source degrees, and (after orientation) a
   src-contiguous forward adjacency, all from one exchange;
2. orient every undirected edge toward the higher (degree, id)
   endpoint — the classic degree-ordered orientation; each triangle
   becomes exactly one (a -> b -> c) path with rank(a) < rank(b) <
   rank(c), and per-source forward fan-out is bounded (hub adjacency
   splits go the low-rank way), the skew story Totem solves with
   virtual warps + degree buckets (totem_vwarp.cuh:21-36);
3. close wedges in place: the broadcast plan probes a bucket-indexed
   sorted 128-bit edge-fingerprint array (one object-store copy per
   node); past the broadcast gate a distributed wedge/edge hash join
   closes them instead;
4. scatter +1 credit to all three corners, partial-aggregated per
   batch before the final groupby (each corner counts every triangle
   once — the same accounting as the reference's intersection-sum
   per vertex on sorted lists).

Triangle counts are exact on the simple graph (duplicates and self
loops dropped); degree for the cc formula is the deduped symmetrized
degree, matching the reference's neighbor-list degree
(totem_clustering.cu:385).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.aggregate import Sum

from totem_ray.graph.edges import drop_self_loops, degree_table, symmetrize
from totem_ray.graph.joins import hash_join
from totem_ray.hashing import hash_partition
from totem_ray.nputil import group_starts_sizes, lookup_sorted, slice_offsets


# driver-merge gate for the partial-sum dual plans, in BYTES of
# driver heap (row gates derive from the per-row footprint). 256 MB:
# a shared driver on a multi-tenant cluster head should not absorb
# the old 50M-row (~1.2 GB) worst case.
_DRIVER_MERGE_MAX_BYTES = 256 << 20


def _sum_partials_by_v(partials, value_col: str, alias: str,
                       driver_merge_max: int | None = None):
    """Sum per-vertex int64 partials -> Dataset (v, alias).

    Dual plan (the module's broadcast/distributed idiom): when the
    partial stream fits the driver-merge byte budget
    (``_DRIVER_MERGE_MAX_BYTES``, 16 B/row here — the same footprint
    class as the broadcast plans' fingerprint/degree arrays), merge
    with one vectorized sort+reduceat on the driver and re-emit as
    Dataset blocks. Ray Data's sort-based groupby costs seconds of
    fixed shuffle overhead even on tiny inputs (measured 4-6 s on
    566k partial rows at P=32 — half the triangle pipeline's wall
    time); past the gate it is still the right tool and we fall back
    to it. ``driver_merge_max`` (rows) overrides the byte-derived
    gate, mainly for tests pinning plan equality."""
    import ray as _ray
    import ray.data as _rd

    if driver_merge_max is None:
        driver_merge_max = _DRIVER_MERGE_MAX_BYTES // 16
    parts = partials.materialize()
    if parts.count() > driver_merge_max:
        from totem_ray.graph.joins import grouped_reduce

        return grouped_reduce(parts, ["v"], [value_col], how="sum",
                              out_names=[alias])
    vs, cs = [], []
    for blk in _ray.get(parts.to_arrow_refs()):
        if blk.num_rows:
            vs.append(np.asarray(blk["v"]))
            cs.append(np.asarray(blk[value_col]))
    if not vs:
        return _rd.from_arrow(pa.table({
            "v": pa.array([], type=pa.int64()),
            alias: pa.array([], type=pa.int64())}))
    v = np.concatenate(vs)
    c = np.concatenate(cs)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    starts, _sizes = group_starts_sizes(v)  # exact int64 accumulation
    out = pa.table({"v": pa.array(v[starts], type=pa.int64()),
                    alias: pa.array(np.add.reduceat(c, starts),
                                    type=pa.int64())})
    blk_rows = 4_000_000  # keep downstream consumers parallel
    return _rd.from_arrow([out.slice(i, blk_rows)
                           for i in range(0, out.num_rows, blk_rows)])


def _edge_credit_triples(u: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Closing wedge (u; lo, hi) = triangle {u, lo, hi}: the 3
    canonicalized edges it credits, concatenated ((lo, hi) is already
    canonical from _wedge_chunks)."""
    alo = np.concatenate([np.minimum(u, lo), np.minimum(u, hi), lo])
    ahi = np.concatenate([np.maximum(u, lo), np.maximum(u, hi), hi])
    return alo, ahi


def _combine_edge_credits(alo: np.ndarray, ahi: np.ndarray,
                          cnt: np.ndarray | None = None):
    """Sum credits per unique (lo, hi) pair — the 2-key twin of the
    per-vertex np.unique combine (nputil.group_sum_pairs)."""
    from totem_ray.nputil import group_sum_pairs

    if not len(alo):
        z = np.empty(0, np.int64)
        return z, z, z
    if cnt is None:
        cnt = np.ones(len(alo), dtype=np.int64)
    return group_sum_pairs(alo, ahi, cnt)


def _sum_partials_by_edge(partials, value_col: str, alias: str,
                          driver_merge_max: int | None = None):
    """Sum per-edge int64 partials -> Dataset (lo, hi, alias): the
    2-key twin of _sum_partials_by_v (same byte-budgeted driver-merge
    / groupby dual plan, at 24 B/row)."""
    import ray as _ray
    import ray.data as _rd

    if driver_merge_max is None:
        driver_merge_max = _DRIVER_MERGE_MAX_BYTES // 24
    parts = partials.materialize()
    if parts.count() > driver_merge_max:
        from totem_ray.graph.joins import grouped_reduce

        return grouped_reduce(parts, ["lo", "hi"], [value_col],
                              how="sum", out_names=[alias])
    los, his, cs = [], [], []
    for blk in _ray.get(parts.to_arrow_refs()):
        if blk.num_rows:
            los.append(np.asarray(blk["lo"]))
            his.append(np.asarray(blk["hi"]))
            cs.append(np.asarray(blk[value_col]))
    if not los:
        return _rd.from_arrow(pa.table({
            "lo": pa.array([], type=pa.int64()),
            "hi": pa.array([], type=pa.int64()),
            alias: pa.array([], type=pa.int64())}))
    lo, hi, c = _combine_edge_credits(np.concatenate(los),
                                      np.concatenate(his),
                                      np.concatenate(cs))
    out = pa.table({"lo": pa.array(lo, type=pa.int64()),
                    "hi": pa.array(hi, type=pa.int64()),
                    alias: pa.array(c, type=pa.int64())})
    blk_rows = 4_000_000
    return _rd.from_arrow([out.slice(i, blk_rows)
                           for i in range(0, out.num_rows, blk_rows)])


def _wedge_chunks(a: np.ndarray, b: np.ndarray, wedge_chunk: int):
    """Yield (u, lo, hi) candidate-wedge arrays in <= ~wedge_chunk-pair
    chunks from one src-grouped block's forward edges.

    ELEMENT-sliced, not group-sliced: a chunk boundary may fall inside
    a source group (element e contributes its pairs with the group's
    earlier elements only — at most the group size, which degree
    orientation bounds by ~sqrt(2E)). The previous group-sliced loop
    forced at least one WHOLE group per chunk, so a single hub's
    quadratic wedge set (~7e7 wedges for a forward degree of 12k)
    materialized at once regardless of wedge_chunk."""
    order = np.argsort(a, kind="stable")
    a, b = a[order], b[order]
    starts, sizes = group_starts_sizes(a)
    gstart = np.repeat(starts, sizes)            # group start per element
    ords = np.arange(len(a), dtype=np.int64) - gstart
    cum = np.concatenate([[0], np.cumsum(ords)])
    e0, n = 0, len(a)
    while e0 < n:
        e1 = int(np.searchsorted(cum, cum[e0] + wedge_chunk, "right")) - 1
        e1 = max(e1, e0 + 1)
        cnt = ords[e0:e1]
        second = np.repeat(np.arange(e0, e1, dtype=np.int64), cnt)
        if len(second):
            first = np.repeat(gstart[e0:e1], cnt) + slice_offsets(cnt)
            x, y = b[first], b[second]
            yield a[second], np.minimum(x, y), np.maximum(x, y)
        e0 = e1


def _rename(ds, mapping: dict):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _bucket_dedup_by_src(edges, num_buckets: int):
    """ONE shuffle that serves three later needs: group edges by
    hash(src) and dedup (src, dst) within each bucket. Because every
    edge of a source lands in that source's bucket, (1) the dedup is
    global, (2) per-source degrees are EXACT per block (no degree
    shuffle), and (3) after orientation the forward adjacency of each
    source stays contiguous in its block (no wedge shuffle)."""
    def add_b(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"].combine_chunks().cast(pa.int64()),
            "dst": t["dst"].combine_chunks().cast(pa.int64()),
            "_tb": pa.array(hash_partition(np.asarray(t["src"]),
                                           num_buckets)),
        })

    def dedup_b(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        if len(s):
            u = np.unique(np.stack([s, d], axis=1), axis=0)
            s, d = u[:, 0], u[:, 1]
        return pa.table({"src": pa.array(s, type=pa.int64()),
                         "dst": pa.array(d, type=pa.int64())})

    return edges.map_batches(add_b, batch_format="pyarrow") \
        .groupby("_tb").map_groups(dedup_b, batch_format="pyarrow") \
        .materialize()


def _block_degrees(bucketed, max_vertices: int | None = None):
    """Exact (verts, degree) from src-bucketed deduped edges: per-block
    partial counts, combined on the driver (a map + small collect, no
    groupby shuffle). The combine makes this exact even when Ray's
    dynamic block splitting fragments a bucket across blocks
    (target_max_block_size) — a source then contributes partials from
    more than one block.

    With ``max_vertices`` the collect streams with an early abort and
    returns ``None`` once the vertex universe outgrows the driver gate
    (the caller falls back to the distributed degree joins)."""
    def part(t: pa.Table) -> pa.Table:
        v, c = np.unique(np.asarray(t["src"]), return_counts=True)
        return pa.table({"v": pa.array(v, type=pa.int64()),
                         "deg": pa.array(c, type=pa.int64())})

    vs_parts, dg_parts, total = [], [], 0
    stream = bucketed.map_batches(part, batch_size=None,
                                  batch_format="pyarrow")
    for blk in stream.iter_batches(batch_format="pyarrow"):
        if blk.num_rows == 0:
            continue
        vs_parts.append(np.asarray(blk.column("v").combine_chunks()))
        dg_parts.append(np.asarray(blk.column("deg").combine_chunks()))
        total += blk.num_rows
        # abort before the driver heap outgrows the gate (partials can
        # repeat a src only when block splitting fragmented a bucket,
        # so 2x the vertex cap bounds the raw stream)
        if max_vertices is not None and total > 2 * max_vertices:
            return None
    if not vs_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vs, inv = np.unique(np.concatenate(vs_parts), return_inverse=True)
    if max_vertices is not None and len(vs) > max_vertices:
        return None
    deg = np.zeros(len(vs), dtype=np.int64)
    np.add.at(deg, inv, np.concatenate(dg_parts))
    return vs, deg


def _oriented_edges(simple_und, num_join_partitions: int,
                    broadcast_max_vertices: int = 50_000_000,
                    src_bucket_of=None, degrees=None):
    """Orient each undirected edge toward the higher (degree, id)
    endpoint; keep one row per undirected edge.

    Degree attachment picks a physical plan: a broadcast sorted
    (v, degree) array when the vertex set fits (16 B/vertex, one
    object-store copy per node), else two distributed hash joins
    against the degree table. Callers holding a src-bucketed layout
    can pass ``degrees=(sorted_verts, deg)`` (from ``_block_degrees``
    — a map + driver combine) to skip the degree groupby shuffle
    entirely.

    Returns (oriented_ds, bucket_of): ``bucket_of`` is the src keying
    that produced the output blocks (``src_bucket_of`` of the caller's
    layout for the broadcast branch — orientation is 1:1 per block —
    or hash_join's bucket hash for the join branch), for downstream
    split detection."""
    if degrees is not None:
        import ray as _ray

        ref = _ray.put(degrees)

        def orient_d(t: pa.Table) -> pa.Table:
            verts, deg = _ray.get(ref)
            s = np.asarray(t["src"])
            d = np.asarray(t["dst"])
            # raise-on-miss: a missing endpoint means the input was
            # not the symmetrized simple graph the degrees were built
            # from (e.g. assume_simple=True on a one-sided edge list)
            ds_ = lookup_sorted(verts, deg, s, what="triangle orientation (src)")
            dd = lookup_sorted(verts, deg, d, what="triangle orientation (dst)")
            fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
            return pa.table({
                "a": pa.array(s[fwd], type=pa.int64()),
                "b": pa.array(d[fwd], type=pa.int64()),
            })

        return simple_und.map_batches(orient_d, batch_size=None,
                                      batch_format="pyarrow"), src_bucket_of

    deg_ds = degree_table(simple_und, alias="degree").materialize()
    if deg_ds.count() <= broadcast_max_vertices:
        import ray as _ray

        degp = deg_ds.to_pandas()
        vs = degp["v"].to_numpy()
        order = np.argsort(vs)
        ref = _ray.put((vs[order], degp["degree"].to_numpy()[order]))

        def orient_b(t: pa.Table) -> pa.Table:
            verts, deg = _ray.get(ref)
            s = np.asarray(t["src"])
            d = np.asarray(t["dst"])
            ds_ = lookup_sorted(verts, deg, s, what="triangle orientation (src)")
            dd = lookup_sorted(verts, deg, d, what="triangle orientation (dst)")
            fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
            return pa.table({
                "a": pa.array(s[fwd], type=pa.int64()),
                "b": pa.array(d[fwd], type=pa.int64()),
            })

        # batch_size=None keeps block == batch, preserving the
        # caller's src-grouped layout through orientation
        return simple_und.map_batches(orient_b, batch_size=None,
                                      batch_format="pyarrow"), src_bucket_of

    deg_s = _rename(degree_table(simple_und, alias="deg_s"), {"v": "src"})
    deg_d = _rename(degree_table(simple_und, alias="deg_d"), {"v": "dst"})
    # dst join FIRST, src join LAST: hash_join's merge emits one block
    # per hash(key) bucket, so ending on the src join leaves every
    # source's rows whole within one block — the src-grouped layout
    # wedge generation consumes with no further shuffle.
    # left joins: degree_table covers only src vertices, so a dst with
    # no matching degree row means the input was not symmetrized —
    # surface it (null check below) instead of inner-join-dropping the
    # edge and silently undercounting
    with_d = hash_join(simple_und, deg_d, on="dst", how="left",
                       num_buckets=num_join_partitions)
    with_sd = hash_join(with_d, deg_s, on="src", how="left",
                        num_buckets=num_join_partitions)

    def orient(t: pa.Table) -> pa.Table:
        miss = t["deg_s"].null_count + t["deg_d"].null_count
        if miss:
            raise ValueError(
                f"triangle orientation: {miss} edge endpoints have no "
                "degree row — input is not a symmetrized simple graph")
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        ds_ = np.asarray(t["deg_s"].combine_chunks().cast(pa.int64()))
        dd = np.asarray(t["deg_d"].combine_chunks().cast(pa.int64()))
        # both directions of each undirected edge are present; keeping
        # only the forward rows keeps each edge exactly once
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        return pa.table({
            "a": pa.array(s[fwd], type=pa.int64()),
            "b": pa.array(d[fwd], type=pa.int64()),
        })

    from totem_ray.graph.joins import _key_hash as _jk

    def _join_bucket_of(a):
        return _jk(pa.table({"a": pa.array(a, type=pa.int64())}),
                   ["a"], num_join_partitions)

    # batch_size=None: one batch per src-join bucket block, so the
    # src-grouped layout survives into the oriented output (the
    # contract _triangle_counts_join's in-place wedge generation
    # relies on)
    return with_sd.map_batches(orient, batch_size=None,
                               batch_format="pyarrow"), _join_bucket_of


def _ensure_src_whole(oriented, num_buckets: int, n_edges: int,
                      bucket_of=None):
    """Guarantee the wedge-generation contract: every source's forward
    adjacency whole within one block. Returns ``(ds, n_wedges)`` —
    the exact candidate-wedge count (sum of C(forward_degree, 2))
    rides the SAME metadata pass for free (per-block counts are exact
    once blocks keep each source whole), so the join plan's
    Bloom-or-not gate costs no extra execution.

    Ray's dynamic block splitting (DataContext.target_max_block_size,
    128 MiB default) can fragment a bucket's output block once the
    bucket outgrows the target — silently breaking in-place pair
    enumeration. Detection is a metadata pass (per block, the distinct
    src-hash bucket ids it contains — a bucket id seen in two blocks
    means a split; ``bucket_of`` must be the SAME keying that produced
    the blocks, else every block looks split). Repair is ONE regroup
    shuffle into buckets sized ~2M edges (32 MiB), always under the
    split threshold: a single source's forward adjacency is
    degree-orientation-bounded by ~sqrt(2E) rows, so no group can
    outgrow a block again."""
    from totem_ray.nputil import unique_counts

    if bucket_of is None:
        def bucket_of(a):
            return hash_partition(a, num_buckets)

    def check(ds_, key_of):
        """(fragmented?, n_wedges). The wedge count is only valid when
        not fragmented (a split source would double-count partials) —
        the repair loop recomputes it on the repaired layout."""
        def meta(t: pa.Table) -> pa.Table:
            a = np.asarray(t["a"])
            bids = np.unique(key_of(a))
            if len(a):
                _, c = unique_counts(a)
                w = int((c * (c - 1) // 2).sum())
            else:
                w = 0
            return pa.table({
                "bid": pa.array(bids, type=pa.int64()),
                "w": pa.array(np.r_[np.int64(w),
                                    np.zeros(len(bids) - 1, np.int64)]
                              if len(bids) else
                              np.empty(0, np.int64), type=pa.int64()),
            })
        pdf = ds_.map_batches(meta, batch_size=None,
                              batch_format="pyarrow").to_pandas()
        if "bid" not in pdf.columns:  # empty dataset -> no columns
            return False, 0
        return bool(pdf["bid"].duplicated().any()), int(pdf["w"].sum())

    frag, n_wedges = check(oriented, bucket_of)
    if not frag:
        return oriented, n_wedges

    # size repair buckets to a quarter of the LIVE block-split target
    # (16 B/row), so regrouped blocks stay whole; a single source's
    # group is orientation-bounded by ~sqrt(2E) rows and fits too.
    # Detect -> repair loops with doubling bucket counts until the
    # duplication check passes — if Ray's output-buffer slicing ever
    # split a repaired block mid-group, a single unverified repair
    # would silently undercount triangles.
    import ray.data as _rd

    target = _rd.DataContext.get_current().target_max_block_size \
        or (128 << 20)
    rows_per_bucket = max(int(target) // (4 * 16), 64)
    nb2 = max(num_buckets * 2, int(np.ceil(n_edges / rows_per_bucket)))

    for _attempt in range(4):
        def add_b(t: pa.Table, _nb=nb2) -> pa.Table:
            return t.append_column(
                "_rb", pa.array(hash_partition(np.asarray(t["a"]), _nb)))

        def strip(t: pa.Table) -> pa.Table:
            return t.select(["a", "b"])

        repaired = oriented.map_batches(add_b, batch_format="pyarrow") \
            .groupby("_rb").map_groups(strip, batch_format="pyarrow") \
            .materialize()
        frag, n_wedges = check(repaired,
                               lambda a, _nb=nb2: hash_partition(a, _nb))
        if not frag:
            return repaired, n_wedges
        nb2 *= 2
    raise RuntimeError(
        "_ensure_src_whole: could not produce an unfragmented "
        f"src-grouped layout after 4 repair attempts (n_edges={n_edges}); "
        "raise DataContext.target_max_block_size or num_buckets")


def _edge_fingerprints(lo: np.ndarray, hi: np.ndarray):
    """Two independent 64-bit fingerprints of an undirected edge."""
    from totem_ray.hashing import as_u64, splitmix64

    ulo, uhi = as_u64(lo), as_u64(hi)
    h1 = splitmix64(splitmix64(ulo) ^ uhi)
    h2 = splitmix64(splitmix64(uhi ^ np.uint64(0x9E3779B97F4A7C15)) ^ ulo)
    return h1, h2


def _triangle_counts_broadcast(oriented,
                               wedge_chunk: int = 8_000_000,
                               n_edges: int | None = None,
                               emit: str = "vertex"):
    """Fast path: close wedges inline against a broadcast sorted
    edge-fingerprint array — no wedge shuffle, no join. Each source
    bucket generates its wedges in bounded chunks and emits only
    per-vertex credit partials.

    The membership probe uses a 128-bit fingerprint (two independent
    64-bit halves, grouped by the first): a false positive needs both
    halves to collide (~E * wedges / 2^128 — never). Duplicate-h1 runs
    of any length are exact — the probe scans a run to its end
    (``for k in range(max_run)`` bounded by the run's bucket).

    Fingerprinting and sorting run DISTRIBUTED (map_batches + Dataset
    sort); the driver only concatenates the range-partitioned sorted
    blocks (one memcpy, no hashing/sorting) before the single
    ``ray.put``. This is the Ray analog of Totem keeping the whole
    sorted adjacency resident and merge-intersecting per edge
    (totem_clustering.cu:368-431): one immutable object-store copy of
    the edge set per node, wedge scan fully vectorized.
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    def fingerprint(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"])
        bb = np.asarray(t["b"])
        lo = np.minimum(a, bb)
        hi = np.maximum(a, bb)
        h1, h2 = _edge_fingerprints(lo, hi)
        return pa.table({"h1": pa.array(h1, type=pa.uint64()),
                         "h2": pa.array(h2, type=pa.uint64())})

    # the driver concatenates all E fingerprints either way (that IS
    # the broadcast plan's footprint, 16 B/edge under the
    # broadcast_max_edges gate); below ~20M edges the driver hashes
    # and argsorts the (already materialized) oriented blocks itself —
    # one driver-side pass beats a whole extra Dataset stage plus an
    # all-to-all sort's fixed cost; above it the distributed
    # fingerprint map + sort do the O(E log E) work and the driver
    # only memcpy-concatenates the range-partitioned sorted blocks
    driver_sort_max = 20_000_000
    if n_edges is None:  # caller usually knows the count already
        n_edges = oriented.count()
    distributed = n_edges > driver_sort_max
    h1_parts, h2_parts = [], []
    if distributed:
        fp = oriented.map_batches(fingerprint, batch_format="pyarrow")
        for blk in _ray.get(fp.sort("h1").to_arrow_refs()):
            if blk.num_rows:
                h1_parts.append(np.asarray(blk["h1"], dtype=np.uint64))
                h2_parts.append(np.asarray(blk["h2"], dtype=np.uint64))
    else:
        for blk in _ray.get(oriented.to_arrow_refs()):
            if blk.num_rows:
                p1, p2 = _edge_fingerprints(
                    np.minimum(np.asarray(blk["a"]), np.asarray(blk["b"])),
                    np.maximum(np.asarray(blk["a"]), np.asarray(blk["b"])))
                h1_parts.append(p1)
                h2_parts.append(p2)
    h1 = np.concatenate(h1_parts) if h1_parts else np.empty(0, np.uint64)
    h2 = np.concatenate(h2_parts) if h2_parts else np.empty(0, np.uint64)
    if not distributed and len(h1):
        order = np.argsort(h1, kind="stable")
        h1, h2 = h1[order], h2[order]
    # bucket index over the top bits of h1: probes become ONE random
    # access into the index + a <= max_run linear check, instead of a
    # log2(E) binary search (each step a cache miss)
    B = max(int(np.ceil(np.log2(max(len(h1), 1) * 2))), 4)
    B = min(B, 26)
    shift = np.uint64(64 - B)
    bounds = (np.arange((1 << B) + 1, dtype=np.uint64)) << shift
    bidx = np.searchsorted(h1, bounds).astype(np.int64)
    bidx[-1] = len(h1)  # top bound wraps to 0 in uint64 — pin the end
    max_run = int(np.diff(bidx).max()) if len(h1) else 0
    # Bloom pre-test (2 B/edge, k=2): rejects the ~97% of wedges that
    # cannot close with two byte-gathers each, before the exact
    # bucket-indexed fingerprint probe touches the big arrays
    blm, bmask = _bloom_alloc(len(h1))
    _bloom_set(blm, bmask, h1, h2)
    ref1, ref2 = _ray.put(h1), _ray.put(h2)
    ref_idx = _ray.put(bidx)
    ref_blm = _ray.put((blm, bmask))

    def close_wedges(t: pa.Table) -> pa.Table:
        eh1: np.ndarray = _ray.get(ref1)
        eh2: np.ndarray = _ray.get(ref2)
        ebidx: np.ndarray = _ray.get(ref_idx)
        eblm, ebmask = _ray.get(ref_blm)
        a = np.asarray(t["a"])
        b = np.asarray(t["b"])
        out_v, out_t = [], []
        out_lo, out_hi = [], []
        for u_arr, lo, hi in _wedge_chunks(a, b, wedge_chunk):
            wh1, wh2 = _edge_fingerprints(lo, hi)
            n = len(eh1)
            hit = np.zeros(len(wh1), dtype=bool)
            if n:
                ci = np.flatnonzero(_bloom_probe(eblm, ebmask, wh1, wh2))
                w1c, w2c = wh1[ci], wh2[ci]
                bkt = (w1c >> shift).astype(np.int64)
                start = ebidx[bkt]
                end = ebidx[bkt + 1]
                hitc = np.zeros(len(ci), dtype=bool)
                for k in range(max_run):
                    pk = np.minimum(start + k, n - 1)
                    mk = (start + k < end) & ~hitc
                    mk &= eh1[pk] == w1c
                    # verify h2 only where h1 matched (hits are sparse)
                    m = np.flatnonzero(mk)
                    mk[m] = eh2[pk[m]] == w2c[m]
                    hitc |= mk
                hit[ci] = hitc
            if hit.any():
                if emit == "edge":
                    elo, ehi, ec = _combine_edge_credits(
                        *_edge_credit_triples(u_arr[hit], lo[hit],
                                              hi[hit]))
                    out_lo.append(elo)
                    out_hi.append(ehi)
                    out_t.append(ec)
                    continue
                v = np.concatenate([u_arr[hit], lo[hit], hi[hit]])
                vu, cnt = np.unique(v, return_counts=True)
                out_v.append(vu)
                out_t.append(cnt)
        if emit == "edge":
            if out_lo:
                elo, ehi, ec = _combine_edge_credits(
                    np.concatenate(out_lo), np.concatenate(out_hi),
                    np.concatenate(out_t))
            else:
                elo = ehi = ec = np.empty(0, np.int64)
            return pa.table({"lo": pa.array(elo, type=pa.int64()),
                             "hi": pa.array(ehi, type=pa.int64()),
                             "_t": pa.array(ec, type=pa.int64())})
        if out_v:
            v = np.concatenate(out_v)
            c = np.concatenate(out_t)
            vu, inv = np.unique(v, return_inverse=True)
            cc = np.bincount(inv, weights=c).astype(np.int64)
        else:
            vu = np.empty(0, np.int64)
            cc = np.empty(0, np.int64)
        return pa.table({"v": pa.array(vu, type=pa.int64()),
                         "_t": pa.array(cc, type=pa.int64())})

    # oriented is src-grouped per block (the _bucket_dedup_by_src
    # layout), so each source's forward adjacency is whole within one
    # batch — wedges close with NO further shuffle
    partials = oriented.map_batches(close_wedges, batch_size=None,
                                    batch_format="pyarrow")
    if emit == "edge":
        return _sum_partials_by_edge(partials, "_t", "support")
    return _sum_partials_by_v(partials, "_t", "triangles")


def triangle_counts(edges, num_buckets: int = 64,
                    num_join_partitions: int = 32,
                    _simple_und=None, _bucketed=None,
                    broadcast_max_edges: int = 100_000_000,
                    driver_degrees_max: int = 50_000_000,
                    assume_simple: bool = False,
                    emit: str = "vertex",
                    wedge_wave_bytes: int | None = None,
                    checkpoint_dir: str | None = None):
    """Dataset (v, triangles) — exact per-vertex triangle counts
    (``emit="edge"``: Dataset (lo, hi, support) per-EDGE counts
    instead — see edge_supports).

    ONE edge shuffle feeds everything: edges are grouped by hash(src)
    with in-bucket dedup (global, since (u, v) always lands in u's
    bucket); per-source degrees are then exact per block (no degree
    shuffle) and the degree-oriented forward adjacency stays
    src-contiguous (no wedge shuffle). Two physical plans for the
    closing probe (platform selection, the totem_attr_t.platform
    moral): a broadcast sorted-fingerprint array when the oriented
    edge set fits (< ``broadcast_max_edges``, 16 B/edge), else a fully
    distributed wedge/edge hash join.

    Vertices in no triangle are absent (join back / fill 0 downstream,
    as clustering_coefficient does). Pass ``assume_simple=True`` when
    the input is already a symmetrized simple graph (skips the
    symmetrize pass). ``wedge_wave_bytes`` (join plan only) bounds the
    in-flight wedge-shuffle spill by running the exchange in waves;
    ``checkpoint_dir`` makes the wave loop resumable (each wave's
    reduced partial persists atomically) — see
    _triangle_counts_join."""
    import ray as _ray

    if _bucketed is not None:
        bucketed = _bucketed
    else:
        if _simple_und is not None:
            simple_und = _simple_und
        elif assume_simple:
            simple_und = edges.select_columns(["src", "dst"])
        else:
            simple_und = drop_self_loops(symmetrize(edges))
        bucketed = _bucket_dedup_by_src(simple_und, num_buckets)

    n_bucketed = bucketed.count()
    # closing-probe plan: broadcast fingerprint array when the oriented
    # edge set fits (16 B/edge), else the distributed semi-join
    use_broadcast_close = n_bucketed // 2 <= broadcast_max_edges
    # degrees fit the driver whenever the VERTEX universe is modest
    # (power-law web graphs: V << E): stream the per-block partials
    # with an early abort at ``driver_degrees_max`` vertices
    # (16 B/vertex on the driver) and skip the degree groupby shuffle.
    # Past the gate _block_degrees returns None and _oriented_edges
    # falls back to its distributed degree joins — independently of
    # which closing plan runs.
    degs = _block_degrees(bucketed, max_vertices=driver_degrees_max)
    oriented, bucket_of = _oriented_edges(
        bucketed, num_join_partitions,
        broadcast_max_vertices=driver_degrees_max,
        src_bucket_of=lambda a: hash_partition(a, num_buckets),
        degrees=degs)
    oriented = oriented.materialize()
    n_oriented = oriented.count()
    layout_buckets = num_buckets if degs is not None else num_join_partitions
    oriented, n_wedges = _ensure_src_whole(oriented, layout_buckets,
                                           n_oriented, bucket_of=bucket_of)
    if use_broadcast_close:
        return _triangle_counts_broadcast(oriented, n_edges=n_oriented,
                                          emit=emit)
    return _triangle_counts_join(oriented, num_join_partitions,
                                 n_edges=n_oriented, emit=emit,
                                 n_wedges=n_wedges,
                                 wedge_wave_bytes=wedge_wave_bytes,
                                 checkpoint_dir=checkpoint_dir)


def edge_supports(edges, num_buckets: int = 64,
                  num_join_partitions: int = 32,
                  broadcast_max_edges: int = 100_000_000,
                  driver_degrees_max: int = 50_000_000,
                  assume_simple: bool = False,
                  wedge_wave_bytes: int | None = None,
                  checkpoint_dir: str | None = None):
    """Dataset (lo, hi, support) — per-EDGE triangle counts over the
    simple undirected graph, edges canonicalized lo < hi. Edges in no
    triangle are absent (support 0). Exactly triangle_counts'
    one-shuffle pipeline and closing plans (it IS triangle_counts
    with ``emit="edge"``) — each discovered triangle credits its 3
    edges instead of its 3 corners. Feeds the k-truss peel
    (algs/ktruss.py)."""
    return triangle_counts(edges, num_buckets=num_buckets,
                           num_join_partitions=num_join_partitions,
                           broadcast_max_edges=broadcast_max_edges,
                           driver_degrees_max=driver_degrees_max,
                           assume_simple=assume_simple, emit="edge",
                           wedge_wave_bytes=wedge_wave_bytes,
                           checkpoint_dir=checkpoint_dir)


def _bloom_alloc(n_edges: int, bits_per_edge: int = 16):
    m = 1 << max(int(np.ceil(np.log2(max(n_edges, 1) * bits_per_edge))), 10)
    return np.zeros(m >> 3, dtype=np.uint8), np.uint64(m - 1)


_BLOOM_ONES = np.left_shift(np.uint8(1), np.arange(8, dtype=np.uint8))

# bit-position scatter strategy gate: below this a boolean temp array +
# np.packbits(bitorder='little') replaces np.bitwise_or.at (an
# unbuffered ufunc loop, ~20x slower) — 2^30 bits = a 128 MB bool temp
_BLOOM_BOOL_MAX_BITS = 1 << 30


def _bloom_scatter(bloom: np.ndarray, positions: np.ndarray) -> None:
    """Set bit ``p`` of the packed little-endian bitmap for every p in
    ``positions`` (duplicates fine)."""
    m_bits = len(bloom) << 3
    if m_bits <= _BLOOM_BOOL_MAX_BITS:
        tmp = np.zeros(m_bits, dtype=bool)
        tmp[positions.astype(np.int64)] = True
        bloom |= np.packbits(tmp, bitorder="little")
    else:
        np.bitwise_or.at(
            bloom, (positions >> np.uint64(3)).astype(np.int64),
            _BLOOM_ONES[(positions & np.uint64(7)).astype(np.int64)])


def _bloom_set(bloom: np.ndarray, mask: np.uint64,
               h1: np.ndarray, h2: np.ndarray) -> None:
    _bloom_scatter(bloom, np.concatenate([h1 & mask, h2 & mask])
                   if len(h1) else np.empty(0, np.uint64))


def _edge_bloom(oriented, n_edges: int, bits_per_edge: int = 16):
    """Bit-packed Bloom filter (k=2, positions from the two 64-bit
    edge-fingerprint halves) over the canonicalized oriented edge set.
    ~2 bytes/edge, ~1.4% false-positive rate — 8x smaller than the
    16 B/edge exact-fingerprint broadcast, so it stays broadcastable
    well past the broadcast gate.

    Built distributed: each block hashes its own edges and emits only
    its UNIQUE set-bit positions (<= 8 B/position after per-block
    dedup, vs 16 B/edge of raw fingerprints), and the driver scatters
    them into the bitmap vectorized (bool temp + packbits under
    ``_BLOOM_BOOL_MAX_BITS``). At 2e9 edges the position stream is
    ~16 GB into a 4 GB bitmap — past ``bloom_max_edges`` the caller
    skips the pre-filter entirely and the semi join runs unpruned."""
    bloom, mask = _bloom_alloc(n_edges, bits_per_edge)

    def positions(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"])
        b = np.asarray(t["b"])
        h1, h2 = _edge_fingerprints(np.minimum(a, b), np.maximum(a, b))
        p = np.unique(np.concatenate([h1 & mask, h2 & mask]))
        return pa.table({"p": pa.array(p, type=pa.uint64())})

    # batch_size=None on BOTH sides: whole blocks in, whole blocks out
    # (the default 256-row iter batches would re-run the scatter — and
    # its bool temp allocation — thousands of times per million edges).
    # Buffer the incoming position arrays and scatter in a few big
    # flushes: one scatter pays the bool-temp + packbits cost once,
    # not once per block (64 blocks x a 2^25-bit temp dominated the
    # whole build at bench scale). The buffer is bounded: flush at
    # ~m_bits/4 positions (the temp's own size), so driver heap stays
    # O(bitmap), never O(position stream).
    m_bits = len(bloom) << 3
    flush_at = max(m_bits >> 2, 4_000_000)
    buf: list[np.ndarray] = []
    buffered = 0
    for blk in oriented.map_batches(positions, batch_size=None,
                                    batch_format="pyarrow") \
                       .iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
        if blk.num_rows:
            buf.append(np.asarray(blk.column("p").combine_chunks()))
            buffered += blk.num_rows
            if buffered >= flush_at:
                _bloom_scatter(bloom, np.concatenate(buf))
                buf, buffered = [], 0
    if buf:
        _bloom_scatter(bloom, np.concatenate(buf))
    return bloom, mask


def _bloom_probe(bloom: np.ndarray, mask: np.uint64,
                 h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    hit = np.ones(len(h1), dtype=bool)
    for h in (h1, h2):
        p = h & mask
        byte = bloom[(p >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (p & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return hit


def _count_wedges(oriented) -> int:
    """Exact total candidate-wedge count: sum over sources of
    C(forward_degree, 2). Cheap one-pass partial per block (blocks
    keep each source's forward adjacency whole, so per-block counts
    are exact) — used to decide whether the Bloom pre-filter pays."""
    from totem_ray.nputil import unique_counts

    def partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"])
        if not len(a):
            return pa.table({"w": pa.array([0], type=pa.int64())})
        _, c = unique_counts(a)  # dense-id bincount fast path, no sort
        return pa.table({"w": pa.array([int((c * (c - 1) // 2).sum())],
                                       type=pa.int64())})

    return int(oriented.map_batches(partial, batch_size=None,
                                    batch_format="pyarrow")
               .sum("w") or 0)


def _triangle_counts_join(oriented, num_join_partitions: int,
                          wedge_chunk: int = 4_000_000,
                          bloom_max_edges: int = 2_000_000_000,
                          n_edges: int | None = None,
                          emit: str = "vertex",
                          n_wedges: int | None = None,
                          wedge_wave_bytes: int | None = None,
                          checkpoint_dir: str | None = None):
    """Distributed path: wedges generated IN PLACE from the
    src-grouped oriented blocks (both producers — ``orient_b`` over
    the src-bucketed layout and ``_oriented_edges`` ending on its src
    join — keep every source's forward adjacency whole within one
    block), pruned against a broadcast Bloom filter of the edge set
    (~97% of wedges do not close; dropping them at generation shrinks
    the one wedge-volume shuffle ~30x), then a hash SEMI join against
    the canonicalized oriented edges confirms exactly. Past
    ``bloom_max_edges`` the pre-filter is skipped (no broadcast state
    at all) and the same semi join runs unpruned — scales past any
    object-store gate, just with the full wedge shuffle.

    Disk budget: the exchange ships every SURVIVING wedge once
    (~33 B/row), and on triangle-dense graphs the survivors are
    dominated by TRUE closures, which no filter can prune — RMAT s21
    ef16 (2.98B candidate wedges, measured) wants tens of GB of
    aggregate shuffle spill. ``wedge_wave_bytes`` bounds the
    IN-FLIGHT spill instead of the total: wedges are generated in
    ``ceil(total_wedge_bytes / wedge_wave_bytes)`` waves keyed by
    hash(wedge source) — each wave runs its own bounded
    shuffle+close, reduces its credits to <= one row per touched
    key, and materializes that small partial so the wave's shuffle
    spill is garbage-collected before the next wave starts. Each
    wave re-scans the oriented blocks and re-ships the 16 B/edge
    fingerprint side (the price of the bound: W extra edge-side
    passes for a W-fold smaller disk high-water mark); the per-wave
    credit partials stay <= |touched keys| rows. ``None`` (default)
    keeps the single-exchange plan — right for a multi-node cluster
    where the spill is ~hundreds of MB per node; set it when one
    box's disk must absorb the whole exchange. The broadcast plan
    (in-place counting, nothing materialized, ~43M wedges/s
    measured) remains the right choice whenever the fingerprint
    table fits the object store."""
    import ray as _ray

    if n_edges is None:
        n_edges = oriented.count()
    waves = 1
    if wedge_wave_bytes:
        if n_wedges is None:
            n_wedges = _count_wedges(oriented)
        # ~33 B per surviving wedge row in the exchange; candidates
        # upper-bound survivors, so the wave count is conservative
        waves = max(1, -(-(n_wedges * 33) // int(wedge_wave_bytes)))
    bloom_ref = None
    if 0 < n_edges <= bloom_max_edges:
        # The Bloom's only job is shrinking the wedge SHUFFLE (~97%
        # of candidate wedges do not close); building it costs a full
        # extra pass over the oriented edges. Skip it when the exact
        # wedge count (riding _ensure_src_whole's metadata pass, else
        # one cheap counting pass here) says the unpruned shuffle is
        # small anyway — at bench scale the Bloom build was pure
        # constant overhead on the distributed plan. The skip is
        # capped in ABSOLUTE wedges: past ~50M candidate rows the
        # shuffle bytes dwarf the Bloom build even at low wedge/edge
        # ratios (a 2e9-edge graph at ratio 4 would otherwise shuffle
        # ~190 GB of wedges to save a ~4 GB Bloom pass).
        if n_wedges is None:
            n_wedges = _count_wedges(oriented)
        if n_wedges > min(max(8 * n_edges, 4_000_000), 50_000_000):
            bloom, bmask = _edge_bloom(oriented, n_edges)
            bloom_ref = _ray.put((bloom, bmask))

    # A wedge (u; lo, hi) closes iff the edge between lo and hi
    # exists. Instead of a generic row join, both sides exchange on
    # the same fingerprint-hash bucket and the per-bucket merge is a
    # sorted-fingerprint membership probe (numpy searchsorted +
    # duplicate-run scan — the distributed twin of the broadcast
    # plan's probe). Edge rows ship 16 B of fingerprint; a false
    # positive needs both 64-bit halves to collide (~never). Credits
    # are emitted straight from the merge — no second pass. ONE
    # generator pass over the oriented blocks produces BOTH exchange
    # sides: the block's edge-fingerprint rows (_side=1) and its
    # surviving candidate wedges (_side=0), each tagged with its join
    # bucket at creation (the wedge fingerprints are already in hand
    # for the Bloom probe). A separate edge pass + tagging stage +
    # union added two map stages of pure overhead.
    def make_both_sides(wave: int):
        def both_sides(t: pa.Table):
            a = np.asarray(t["a"])
            b = np.asarray(t["b"])
            # edge side: fingerprint halves ride the id columns
            # (re-shipped every wave — the probe side must be complete
            # in every wave's buckets)
            elo = np.minimum(a, b)
            ehi = np.maximum(a, b)
            h1, h2 = _edge_fingerprints(elo, ehi)
            yield pa.table({
                "u": pa.array(np.zeros(len(a), dtype=np.int64)),
                "lo": pa.array(h1.view(np.int64)),
                "hi": pa.array(h2.view(np.int64)),
                "_side": pa.array(np.ones(len(a), dtype=np.int8)),
                "_b": pa.array((h1 % int(num_join_partitions))
                               .astype(np.int64)),
            })
            if waves > 1:
                # this wave generates only the wedges whose CENTER
                # source hashes to it: each wedge is produced exactly
                # once across waves, and a wave's wedge volume is
                # ~1/waves of the total (hash-spread sources; forward
                # degree is already sqrt-bounded by the orientation)
                keep = hash_partition(a, waves) == wave
                a, b = a[keep], b[keep]
            # wedge side: one src-grouped block's forward-edge set ->
            # canonicalized candidate wedges, yielded in bounded
            # chunks (a hub block can expand quadratically; never
            # materialize all its wedges)
            blm = _ray.get(bloom_ref) if bloom_ref is not None else None
            for u, lo, hi in _wedge_chunks(a, b, wedge_chunk):
                wh1 = None
                if blm is not None and len(lo):
                    wh1, wh2 = _edge_fingerprints(lo, hi)
                    keep = _bloom_probe(blm[0], blm[1], wh1, wh2)
                    lo, hi, u, wh1 = lo[keep], hi[keep], u[keep], wh1[keep]
                if len(lo):
                    if wh1 is None:
                        wh1, _ = _edge_fingerprints(lo, hi)
                    yield pa.table({
                        "u": pa.array(u, type=pa.int64()),
                        "lo": pa.array(lo, type=pa.int64()),
                        "hi": pa.array(hi, type=pa.int64()),
                        "_side": pa.array(np.zeros(len(lo),
                                                   dtype=np.int8)),
                        "_b": pa.array((wh1 % int(num_join_partitions))
                                       .astype(np.int64)),
                    })
        return both_sides

    def close(t: pa.Table) -> pa.Table:
        side = np.asarray(t["_side"])
        lo = np.asarray(t["lo"])
        hi = np.asarray(t["hi"])
        em = side == 1
        eh1 = lo[em].view(np.uint64)
        eh2 = hi[em].view(np.uint64)
        order = np.lexsort((eh2, eh1))
        eh1, eh2 = eh1[order], eh2[order]
        wm = ~em
        wlo, whi = lo[wm], hi[wm]
        u = np.asarray(t["u"])[wm]
        wh1, wh2 = _edge_fingerprints(wlo, whi)
        hit = _probe_fp_sorted(eh1, eh2, wh1, wh2)
        if emit == "edge":
            elo, ehi, ec = _combine_edge_credits(
                *_edge_credit_triples(u[hit], wlo[hit], whi[hit]))
            return pa.table({"lo": pa.array(elo, type=pa.int64()),
                             "hi": pa.array(ehi, type=pa.int64()),
                             "_t": pa.array(ec, type=pa.int64())})
        if not hit.any():
            return pa.table({"v": pa.array([], type=pa.int64()),
                             "_t": pa.array([], type=pa.int64())})
        v = np.concatenate([u[hit], wlo[hit], whi[hit]])
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(vu, type=pa.int64()),
                         "_t": pa.array(cnt, type=pa.int64())})

    def wave_partials(wave: int):
        # batch_size=None: a batch IS one src-grouped block
        tagged = oriented.map_batches(make_both_sides(wave),
                                      batch_size=None,
                                      batch_format="pyarrow")
        return tagged.groupby("_b").map_groups(close,
                                               batch_format="pyarrow")

    if waves == 1:
        per_bucket = wave_partials(0)
        if emit == "edge":
            return _sum_partials_by_edge(per_bucket, "_t", "support")
        return _sum_partials_by_v(per_bucket, "_t", "triangles")

    # wave loop: each wave's shuffle runs to completion, its credits
    # collapse to <= one row per touched key (grouped_reduce), and the
    # materialize() barrier lets Ray free the wave's shuffle spill
    # before the next wave shuffles — the disk high-water mark is one
    # wave's exchange, not the whole wedge volume. With
    # ``checkpoint_dir`` each wave's reduced partial lands atomically
    # in a lineage-keyed subdirectory (parquet first, then a durable
    # _DONE — the sweep discipline), so a preempted multi-hour
    # exchange resumes at the first unfinished wave instead of wave 0;
    # the lineage key pins graph identity + wave plan, so a checkpoint
    # from a different graph or wave count can never silently mix in.
    import os
    import shutil

    import ray.data as _rd

    from totem_ray.graph.joins import grouped_reduce

    keys = ["lo", "hi"] if emit == "edge" else ["v"]
    base = None
    if checkpoint_dir:
        from totem_ray.algs.sweep import _write_done
        from totem_ray.hashing import lineage_hash

        # counts alone cannot key the checkpoint: a vertex-permuted
        # copy of the graph preserves BOTH the edge count and the
        # wedge count, and would silently reuse the first graph's
        # wave partials. One narrow xor-fingerprint pass over the
        # oriented edge content (order-independent, so block layout
        # doesn't change it) pins graph identity — the same
        # discipline as sweep.py's graph_fp.
        def _fp(t: pa.Table) -> pa.Table:
            from totem_ray.hashing import as_u64, splitmix64
            h = splitmix64(as_u64(np.asarray(t["a"]))
                           ^ splitmix64(as_u64(np.asarray(t["b"]))))
            x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
            return pa.table({"x": pa.array([int(x)], type=pa.uint64())})

        acc_fp = np.uint64(0)
        for blk in oriented.map_batches(
                _fp, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for v in np.asarray(blk["x"]):
                acc_fp ^= np.uint64(v)
        lineage = lineage_hash("triangle_waves", n_edges, n_wedges,
                               waves, emit, num_join_partitions,
                               int(acc_fp))
        base = os.path.join(checkpoint_dir, lineage)
        os.makedirs(base, exist_ok=True)
    wave_sums = []
    for w in range(waves):
        if base is None:
            wave_sums.append(
                grouped_reduce(wave_partials(w), keys, ["_t"],
                               how="sum").materialize())
            continue
        d = os.path.join(base, f"wave-{w:05d}")
        marker = os.path.join(d, "_DONE")
        if os.path.exists(marker):
            wave_sums.append(_rd.read_parquet(d))
            continue
        if os.path.isdir(d):
            # incomplete partial from a crashed run
            shutil.rmtree(d)
        reduced = grouped_reduce(wave_partials(w), keys, ["_t"],
                                 how="sum").materialize()
        if reduced.count() == 0:
            # a zero-credit wave still needs a readable file, or the
            # resume read_parquet would fail on an empty directory
            import pyarrow.parquet as _pq
            os.makedirs(d, exist_ok=True)
            cols = {k: pa.array([], type=pa.int64()) for k in keys}
            cols["_t"] = pa.array([], type=pa.int64())
            _pq.write_table(pa.table(cols),
                            os.path.join(d, "empty.parquet"))
        else:
            reduced.write_parquet(d)
        _write_done(marker, f"wave {w}")
        # consume the SAME bytes a resumed run would (no live/restored
        # skew), and free the wave's shuffle state either way
        wave_sums.append(_rd.read_parquet(d))
    acc = wave_sums[0]
    for part in wave_sums[1:]:
        acc = acc.union(part)
    if emit == "edge":
        return _sum_partials_by_edge(acc, "_t", "support")
    return _sum_partials_by_v(acc, "_t", "triangles")


def _probe_fp_sorted(eh1: np.ndarray, eh2: np.ndarray,
                     wh1: np.ndarray, wh2: np.ndarray) -> np.ndarray:
    """Membership of (wh1, wh2) in the (eh1, eh2)-lexsorted
    fingerprint table: one searchsorted, then a vectorized scan along
    each duplicate-h1 run (runs are ~1 long — independent 64-bit
    hashes)."""
    n = len(eh1)
    hit = np.zeros(len(wh1), dtype=bool)
    if n == 0 or len(wh1) == 0:
        return hit
    pos = np.searchsorted(eh1, wh1, side="left")
    active = np.flatnonzero(pos < n)
    k = 0
    while len(active):
        p = pos[active] + k
        ok = p < n
        active, p = active[ok], p[ok]
        m1 = eh1[p] == wh1[active]
        active, p = active[m1], p[m1]
        m2 = eh2[p] == wh2[active]
        hit[active[m2]] = True
        active = active[~m2]
        k += 1
    return hit


def clustering_coefficient(edges, num_buckets: int = 64,
                           num_join_partitions: int = 32,
                           assume_simple: bool = False):
    """Dataset (v, triangles, degree, cc) over ALL vertices of the
    simple graph; cc = 2T/(d(d-1)), 0 if T=0 or d<2
    (totem_clustering.cu:422-426)."""
    import pyarrow.compute as pc

    simple_und = edges.select_columns(["src", "dst"]) if assume_simple \
        else drop_self_loops(symmetrize(edges))
    bucketed = _bucket_dedup_by_src(simple_und, num_buckets)

    # per-block degree partials + a V-row Sum — exact even when block
    # splitting fragments a bucket (same hazard _block_degrees guards)
    def blk_deg(t: pa.Table) -> pa.Table:
        v, c = np.unique(np.asarray(t["src"]), return_counts=True)
        return pa.table({"v": pa.array(v, type=pa.int64()),
                         "_dp": pa.array(c, type=pa.int64())})

    deg = _sum_partials_by_v(
        bucketed.map_batches(blk_deg, batch_size=None,
                             batch_format="pyarrow"),
        "_dp", "degree")
    tri = triangle_counts(None, num_buckets, num_join_partitions,
                          _bucketed=bucketed)
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
