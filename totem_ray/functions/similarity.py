"""Approximate-nearest-neighbor search over an embedding column
(list<float>).

* ``knn_brute_force`` — baseline: broadcast the query matrix
  (``ray.put`` once), per-batch numpy matmul partial top-k, tiny
  driver-side final merge. Exact.
* ``knn_ivf`` — the scale path: IVF coarse quantizer (k-means-lite
  centroids fit on a driver-side sample), vectors assigned to their
  nearest centroid ONCE (partitioned layout), queries probe the
  ``nprobe`` nearest centroid lists only. Approximate; recall grows
  with nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _as_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> / fixed_size_list
    column — zero-copy from the Arrow buffer (one cast), never a
    per-row Python list round-trip."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # a null row would fall through to an opaque numpy
        # inhomogeneous-shape error deep inside the matmul
        raise ValueError(
            "embedding column contains null rows; drop or impute "
            "them before kNN/near-dup search")
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        vals = np.asarray(col.values, dtype=np.float64)
        off = col.offset * d
        return vals[off:off + len(col) * d].reshape(len(col), d)
    if isinstance(col, pa.ListArray) and len(col):
        offs = np.asarray(col.offsets)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            d = int(widths[0])
            vals = np.asarray(col.values, dtype=np.float64)
            return vals[offs[0]:offs[0] + len(col) * d].reshape(len(col), d)
    lst = col.to_pylist()
    if not lst:
        return np.empty((0, 0), dtype=np.float64)
    return np.asarray(lst, dtype=np.float64)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


_EMPTY_TOPK = pa.table({"query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "cos_sim": pa.array([], type=pa.float64())})


def _final_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Vectorized driver-side merge of the per-block partial top-k
    rows (bounded: Q x k x num_blocks): one lexsort by (query_id,
    -cos_sim, neighbor_id), then the first k rows per query with a
    running within-group rank — no per-query pandas groupby loop."""
    if not len(partials) or "cos_sim" not in partials.columns:
        # a fully-empty input dataset converts to a column-less frame
        return pd.DataFrame(columns=["query_id", "neighbor_id",
                                     "cos_sim", "knn_rank"])
    p = partials[np.isfinite(partials["cos_sim"].to_numpy())]
    if not len(p):
        return pd.DataFrame(columns=["query_id", "neighbor_id",
                                     "cos_sim", "knn_rank"])
    q = p["query_id"].to_numpy()
    s = p["cos_sim"].to_numpy()
    n = p["neighbor_id"].to_numpy()
    order = np.lexsort((n, -s, q))
    q, s, n = q[order], s[order], n[order]
    starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
    lens = np.diff(np.r_[starts, len(q)])
    rank = np.arange(len(q)) - np.repeat(starts, lens)
    keep = rank < k
    return pd.DataFrame({"query_id": q[keep], "neighbor_id": n[keep],
                         "cos_sim": s[keep],
                         "knn_rank": rank[keep] + 1})


def knn_brute_force(emb, queries: np.ndarray, query_ids: np.ndarray,
                    k: int = 10, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    exclude_self: bool = True) -> pd.DataFrame:
    """Exact cosine top-k: -> DataFrame (query_id, neighbor_id,
    cos_sim, knn_rank), rank 1 = nearest."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qn, qids))

    class PartialTopK:
        def __init__(self):
            self.qn, self.qids = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:   # empty block: typed empty partial
                return _EMPTY_TOPK
            ids = np.asarray(t[id_col]).astype(np.int64)
            x = _normalize(_as_matrix(t[emb_col]))
            sims = self.qn @ x.T                      # (Q, n)
            if exclude_self:
                sims[self.qids[:, None] == ids[None, :]] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(self.qids)), kk)
            cols = idx.reshape(-1)
            return pa.table({
                "query_id": pa.array(self.qids[rows]),
                "neighbor_id": pa.array(ids[cols]),
                "cos_sim": pa.array(sims[rows, cols], type=pa.float64()),
            })

    partials = emb.map_batches(PartialTopK, batch_format="pyarrow",
                               concurrency=(1, 8)).to_pandas()
    return _final_topk(partials, k)


def _seed_centroids(emb, ncells: int, id_col: str,
                    emb_col: str) -> np.ndarray:
    """Deterministic IVF seeds: the embeddings of the ``ncells``
    smallest ids — a pure function of the data (no RNG, no iterative
    fit), so the whole IVF pipeline including the approximate
    partial-probe path is SQL-transcribable for the oracle gate.
    Computed distributed: each batch contributes its ncells
    smallest-id rows (a valid partial — each of the global ncells
    smallest ids is among its own batch's ncells smallest), then one
    single-block reduce pass shrinks the merge the driver sees to
    ~ncells rows regardless of how many blocks the input has."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([id_col, emb_col])
        if t.num_rows <= ncells:
            return t
        ids = np.asarray(t[id_col])
        idx = np.argpartition(ids, ncells - 1)[:ncells]
        return t.take(pa.array(np.sort(idx)))

    parts = emb.map_batches(partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .to_pandas()
    parts = parts.sort_values(id_col, kind="stable").head(ncells)
    return np.stack(parts[emb_col].to_numpy()).astype(np.float64)


def _kmeans_lite(x: np.ndarray, ncells: int, iters: int = 8,
                 seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(ncells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(_normalize(x) @ _normalize(cent).T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def _fit_centroids(emb, ncells: int, fit: str, seed: int, sample_n: int,
                   total: int, id_col: str, emb_col: str) -> np.ndarray:
    """Normalized (ncells, d) centroid matrix. ``fit='kmeans'`` fits
    k-means-lite on a deterministic id-hash sample spread over the
    WHOLE dataset (limit(n) would take the first rows — on clustered /
    label-sorted storage the centroids then miss most of the space and
    recall collapses). ``fit='seeded'`` takes the embeddings of the
    ncells smallest ids as centroids directly: lower recall per probe,
    but a pure function of the data, so the approximate partial-probe
    result itself is exactly reproducible by the SQL oracle. Both fits
    are deterministic, which is what lets an interrupted
    ``build_ivf_index`` resume: a re-run re-derives identical
    centroids, hence identical cell assignments."""
    from totem_ray.hashing import as_u64, splitmix64

    if fit == "seeded":
        return _normalize(_seed_centroids(emb, ncells, id_col, emb_col))
    ratio = 1.25 * sample_n / total if total else 1.0
    # ratio >= 1 means "keep everything" — skip the filter, both
    # to save a pass and because ratio*(2^64-1) rounds to exactly
    # 2^64 at ratio=1.0, which overflows np.uint64
    if total > sample_n and ratio < 1.0:
        thresh = np.uint64(ratio * (2.0 ** 64 - 1))

        def samp(t: pa.Table) -> pa.Table:
            h = splitmix64(as_u64(np.asarray(t[id_col]))
                           ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
            return t.filter(pa.array(h <= thresh))

        sample = emb.map_batches(samp, batch_format="pyarrow").to_pandas()
        if not len(sample):  # degenerate fallback
            sample = emb.limit(sample_n).to_pandas()
    else:
        sample = emb.to_pandas()
    xs = np.stack(sample[emb_col].to_numpy()).astype(np.float64)
    return _normalize(_kmeans_lite(xs, ncells, seed=seed))


def _probes_for(cent: np.ndarray, qn: np.ndarray,
                nprobe: int) -> np.ndarray:
    # stable sort: probe-order ties between equal-similarity centroids
    # resolve to the lower cell index, matching the oracle's
    # (sim DESC, cid ASC) tie-break
    return np.argsort(-(qn @ cent.T), axis=1,
                      kind="stable")[:, :min(nprobe, len(cent))]


class _ProbeTopK:
    """Actor-pool batch fn: per-cell partial top-k of the probing
    queries against the batch's rows. Constructor args ride a single
    ``ray.put`` ref so the (possibly large) query matrix is broadcast
    once per actor, not per batch."""

    def __init__(self, ref, k, id_col, emb_col, exclude_self):
        self.cent, self.qn, self.qids, probes = ray.get(ref)
        self.k, self.id_col, self.emb_col = k, id_col, emb_col
        self.exclude_self = exclude_self
        # (ncells, Q) probe-membership table: one bool lookup per
        # cell group replaces a per-QUERY python loop with np.isin
        # over the whole batch (which made IVF slower than brute
        # force at moderate Q)
        self.probed_by = np.zeros((len(self.cent), len(self.qids)),
                                  dtype=bool)
        self.probed_by[probes, np.arange(len(self.qids))[:, None]] = True

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_TOPK
        ids = np.asarray(t[self.id_col]).astype(np.int64)
        x = _normalize(_as_matrix(t[self.emb_col]))
        if "ivf_cell" in t.column_names:
            # indexed layout: the persisted assignment (identical to
            # the recompute — same centroids, same float ops)
            cell = np.asarray(t["ivf_cell"]).astype(np.int64)
        else:
            cell = np.argmax(x @ self.cent.T, axis=1)
        # group rows by cell: per PRESENT CELL (<= ncells, not Q)
        # one dense matmul of the probing queries x the cell's rows
        # — the IVF sparsity is preserved, the loop bound is small
        order = np.argsort(cell, kind="stable")
        cell_s, ids_s, x_s = cell[order], ids[order], x[order]
        starts = np.flatnonzero(np.r_[True, cell_s[1:] != cell_s[:-1]])
        ends = np.r_[starts[1:], len(cell_s)]
        outs = []
        for g0, g1 in zip(starts, ends):
            qsel = np.flatnonzero(self.probed_by[cell_s[g0]])
            if not len(qsel):
                continue
            sub_ids = ids_s[g0:g1]
            sims = self.qn[qsel] @ x_s[g0:g1].T        # (q_c, n_c)
            if self.exclude_self:
                sims[self.qids[qsel][:, None] == sub_ids[None, :]] \
                    = -np.inf
            kk = min(self.k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            qrows = np.repeat(np.arange(len(qsel)), kk)
            outs.append((self.qids[qsel][qrows],
                         sub_ids[idx.reshape(-1)],
                         sims[qrows, idx.reshape(-1)]))
        if not outs:
            return _EMPTY_TOPK
        q = np.concatenate([o[0] for o in outs])
        n = np.concatenate([o[1] for o in outs])
        s = np.concatenate([o[2] for o in outs])
        return pa.table({"query_id": pa.array(q, type=pa.int64()),
                         "neighbor_id": pa.array(n, type=pa.int64()),
                         "cos_sim": pa.array(s, type=pa.float64())})


def knn_ivf(emb, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
            ncells: int = 16, nprobe: int = 4, sample_n: int = 10_000,
            id_col: str = "vec_id", emb_col: str = "embedding",
            exclude_self: bool = True, seed: int = 42,
            fit: str = "kmeans") -> pd.DataFrame:
    """IVF ANN: centroids from a sample, assignment via broadcast
    centroid matrix, probe only the nprobe closest cells per query.

    Probing prunes COMPUTE but still scans the full dataset's bytes
    every call; for index-once / probe-few I/O over a persistent
    corpus use ``build_ivf_index`` + ``knn_ivf_indexed``."""
    # count() is metadata-only for parquet sources; a DERIVED input
    # pays one extra pass here — pre-materialize it if that matters
    total = emb.count()
    if total == 0:
        # same typed empty result as knn_brute_force on empty input
        return _final_topk(_EMPTY_TOPK.to_pandas(), k)
    cent = _fit_centroids(emb, ncells, fit, seed, sample_n, total,
                          id_col, emb_col)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    probes = _probes_for(cent, qn, nprobe)  # (Q, nprobe)
    ref = ray.put((cent, qn, qids, probes))
    partials = emb.map_batches(
        _ProbeTopK, fn_constructor_args=(ref, k, id_col, emb_col,
                                         exclude_self),
        batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    return _final_topk(partials, k)


class _AssignCell:
    def __init__(self, ref, emb_col):
        self.cent = ray.get(ref)
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("ivf_cell",
                                   pa.array([], type=pa.int64()))
        x = _normalize(_as_matrix(t[self.emb_col]))
        cell = np.argmax(x @ self.cent.T, axis=1).astype(np.int64)
        return t.append_column("ivf_cell", pa.array(cell))


def _ivf_input_fingerprint(emb, id_col: str, total: int) -> str:
    """Order-independent fingerprint of the indexed id set: xor of
    splitmix64(id) over all rows, plus the row count. One narrow
    column scan; commutative, so block layout / parallelism don't
    change it. Used to refuse resuming an IVF layout over CHANGED
    input (same params, different rows), where the resumable sink
    would otherwise skip every _DONE cell and leave refit centroids
    pointing at stale files."""
    from totem_ray.hashing import as_u64, splitmix64

    def fp(t: pa.Table) -> pa.Table:
        h = splitmix64(as_u64(np.asarray(t[id_col])))
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"x": pa.array([int(x)], type=pa.uint64())})

    parts = emb.select_columns([id_col]) \
        .map_batches(fp, batch_format="pyarrow").to_pandas()
    acc = np.uint64(0)
    for v in parts["x"].to_numpy():
        acc ^= np.uint64(v)
    return f"{int(acc):016x}-{total}"


def build_ivf_index(emb, path: str, ncells: int = 16,
                    fit: str = "kmeans", seed: int = 42,
                    sample_n: int = 10_000, id_col: str = "vec_id",
                    emb_col: str = "embedding") -> dict:
    """Persist an IVF cell-partitioned layout: fit centroids once,
    assign every vector to its argmax-cosine cell, and write the
    vectors grouped by cell — one ``part-{cell:05d}/`` parquet
    directory per cell via the resumable sink — plus the centroid
    matrix (``_centroids.npy``) and index metadata
    (``_IVF_META.json``).

    This is the index-once / probe-few I/O shape an ANN index needs at
    corpus scale: ``knn_ivf_indexed`` then reads ONLY the probed
    cells' files per query set instead of re-scanning and re-assigning
    the whole dataset per call (which is what plain ``knn_ivf`` does —
    fine for one-shot queries, wrong for a served index). The
    reference has no ANN operator; the layout mirrors its
    partition-then-place design (src/totem/totem_partition.cu) applied
    to vector cells instead of graph partitions.

    Resumable: both fits are deterministic, so an interrupted build
    re-derives identical centroids and assignments, and the sink skips
    cells already marked ``_DONE``. On a multi-node cluster ``path``
    must be shared storage (same contract as the sink)."""
    import json
    import os

    from totem_ray.sources.sink import write_parquet_resumable

    total = emb.count()
    if total == 0:
        raise ValueError("cannot build an IVF index over an empty dataset")
    cent = _fit_centroids(emb, ncells, fit, seed, sample_n, total,
                          id_col, emb_col)
    meta = {"ncells": int(len(cent)), "dim": int(cent.shape[1]),
            "fit": fit, "seed": seed, "id_col": id_col,
            "emb_col": emb_col,
            "input_fingerprint": _ivf_input_fingerprint(emb, id_col,
                                                        total)}
    # validate BEFORE mutating anything on disk: a rebuild with
    # different params (or over changed input) against an existing
    # layout must refuse up front — writing new centroids first and
    # letting the sink raise later would leave _ALL_DONE intact with
    # centroids that no longer match the cell files, and
    # knn_ivf_indexed would then return silently wrong neighbors
    meta_file = os.path.join(path, "_IVF_META.json")
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            prev = json.load(f)
        # prev.get(k, v): layouts written before a meta key existed
        # (e.g. input_fingerprint) can't be validated on it — accept
        # them; this run records the full meta going forward
        stale = {k: (prev.get(k, v), v) for k, v in meta.items()
                 if prev.get(k, v) != v}
        if stale:
            raise ValueError(
                f"IVF layout at {path!r} was built with different "
                f"parameters or input: "
                + ", ".join(f"{k}={old!r} (requested {new!r})"
                            for k, (old, new) in sorted(stale.items()))
                + "; delete the directory to rebuild from scratch")
    os.makedirs(path, exist_ok=True)
    # centroids + meta before the data shuffle: a resumed build
    # overwrites them with bit-identical values (deterministic fit)
    tmp = os.path.join(path, ".centroids.tmp")
    with open(tmp, "wb") as f:
        np.save(f, cent)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "_centroids.npy"))
    tmp = os.path.join(path, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "_IVF_META.json"))
    ref = ray.put(cent)
    assigned = emb.map_batches(
        _AssignCell, fn_constructor_args=(ref, emb_col),
        batch_format="pyarrow", concurrency=(1, 8))
    res = write_parquet_resumable(assigned, path, key="ivf_cell",
                                  num_partitions=int(len(cent)),
                                  partitioner="identity")
    return {**res, **meta}


def load_ivf_index(path: str):
    """(centroids, meta) for a completed ``build_ivf_index`` layout;
    raises if the build never finished (re-run build_ivf_index — it
    resumes from the finished cells)."""
    import json
    import os

    if not os.path.exists(os.path.join(path, "_ALL_DONE")):
        raise ValueError(
            f"IVF index at {path!r} is incomplete or missing; run "
            "build_ivf_index(emb, path) to (re)build it — an "
            "interrupted build resumes from the finished cells")
    with open(os.path.join(path, "_IVF_META.json")) as f:
        meta = json.load(f)
    cent = np.load(os.path.join(path, "_centroids.npy"))
    return cent, meta


def knn_ivf_indexed(index_path: str, queries: np.ndarray,
                    query_ids: np.ndarray, k: int = 10, nprobe: int = 4,
                    exclude_self: bool = True,
                    stats: dict | None = None) -> pd.DataFrame:
    """ANN top-k against a persisted ``build_ivf_index`` layout:
    reads ONLY the ``nprobe`` probed cells' parquet files per query
    set (cells with no file were empty), so I/O scales with the
    probed fraction, not corpus size. With nprobe == ncells this is
    exact (reproduces brute force); results are identical to
    ``knn_ivf`` with the same fit/ncells/nprobe on the same data.

    Pass ``stats={}`` to receive bytes_probed / bytes_total /
    probed_cells / total_cells for the probed-I/O accounting."""
    import os

    cent, meta = load_ivf_index(index_path)
    ncells = meta["ncells"]
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    probes = _probes_for(cent, qn, nprobe)
    cells = np.unique(probes)

    def cell_file(c: int) -> str:
        return os.path.join(index_path, f"part-{c:05d}", "data.parquet")

    files = [cell_file(c) for c in cells if os.path.exists(cell_file(c))]
    if stats is not None:
        all_files = [cell_file(c) for c in range(ncells)
                     if os.path.exists(cell_file(c))]
        stats.update(
            probed_cells=int(len(cells)), total_cells=int(ncells),
            bytes_probed=sum(os.path.getsize(f) for f in files),
            bytes_total=sum(os.path.getsize(f) for f in all_files))
    if not files:
        return _final_topk(_EMPTY_TOPK.to_pandas(), k)
    ds = ray.data.read_parquet(files)
    ref = ray.put((cent, qn, qids, probes))
    partials = ds.map_batches(
        _ProbeTopK, fn_constructor_args=(ref, k, meta["id_col"],
                                         meta["emb_col"], exclude_self),
        batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    return _final_topk(partials, k)
