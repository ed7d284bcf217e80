"""Small vectorized numpy helpers shared by kernels and pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def col_np(t: pa.Table, name: str, what: str = "column") -> np.ndarray:
    """Null-checked numpy view of an Arrow table column (zero-copy for
    null-free numeric arrays). The vectorized combine paths work on
    raw numpy views of the Arrow buffers, where a null would silently
    degrade int64 to float64 — so a null here is an error, not a NaN."""
    col = t[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            f"{what} {name!r} contains {col.null_count} null(s); drop "
            "or fill them first (this vectorized path refuses the "
            "silent int64->float64 degrade a null would cause)")
    return np.asarray(col)


def col_i64(t: pa.Table, name: str, what: str = "key column") -> np.ndarray:
    """`col_np` + integer-dtype check: grouping/hashing keys must be
    integers (string keys would crash deep inside the uint64 mix with
    an opaque cast error — fail here with the fix spelled out)."""
    v = col_np(t, name, what)
    if not np.issubdtype(v.dtype, np.integer):
        raise ValueError(
            f"{what} {name!r} must be integer-typed (got {v.dtype}); "
            "hash string keys to int64 first "
            "(totem_ray.hashing.hash_strings_i64)")
    return v


def slice_offsets(counts: np.ndarray) -> np.ndarray:
    """Per-slice offsets for vectorized slice-gather:
    [3, 0, 2] -> [0, 1, 2, 0, 1]. Zero counts allowed."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    grp = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - starts[grp]


def slice_gather(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Indices gathering [starts[i], starts[i]+counts[i]) slices,
    concatenated."""
    return np.repeat(np.asarray(starts, dtype=np.int64), counts) + \
        slice_offsets(counts)


def group_starts_sizes(keys_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, sizes) of contiguous equal-key runs in a sorted array."""
    n = len(keys_sorted)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(keys_sorted) != 0) + 1])
    sizes = np.diff(np.concatenate([starts, [n]]))
    return starts, sizes


def pairs_within_groups(starts: np.ndarray, sizes: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j) row-index pairs with i < j inside each contiguous
    group [starts[g], starts[g]+sizes[g]). Vectorized; groups of size
    < 2 contribute nothing."""
    starts = np.asarray(starts, dtype=np.int64)
    sizes = np.asarray(sizes, dtype=np.int64)
    n = int(sizes.sum())
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # ordinal of each row within its group = number of earlier rows it
    # pairs with (as the 'second' element)
    ords = slice_offsets(sizes)
    row_start = np.repeat(starts, sizes)
    rows = row_start + ords
    second = np.repeat(rows, ords)
    first = np.repeat(row_start, ords) + slice_offsets(ords)
    return first, second


def composite_group_starts(*keys_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, sizes) of runs where ALL key arrays are constant
    (arrays must be sorted by the composite key)."""
    n = len(keys_sorted[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys_sorted:
        change |= np.asarray(k)[1:] != np.asarray(k)[:-1]
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    sizes = np.diff(np.concatenate([starts, [n]]))
    return starts, sizes


def group_ordinal(keys_sorted: np.ndarray) -> np.ndarray:
    """Position of each row within its (sorted, contiguous) key group."""
    n = len(keys_sorted)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    starts, sizes = group_starts_sizes(keys_sorted)
    return np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)


def unique_concat(parts) -> np.ndarray:
    """Sorted unique of the concatenation of int id arrays.

    Dense-id fast path: when the ids span at most ~8x their count (the
    reference's graphs always carry dense 0..N-1 vertex ids —
    totem_graph.cu requires them, and RMAT/uniform generators emit
    them), a presence bitmap + flatnonzero replaces the O(n log n)
    multi-pass sort. The win is not big-O but memory traffic: P
    partition actors run this concurrently during an engine build, and
    32 simultaneous 10 MB sorts contend for the shared LLC/DRAM
    (measured 1.8 s each vs 0.03 s solo; the bitmap path is 0.2 s at
    the same concurrency). Sparse ids (64-bit url hashes) fall back to
    np.unique."""
    arrs = [np.asarray(p) for p in parts if len(p)]
    if not arrs:
        return np.empty(0, dtype=np.int64)
    n = sum(map(len, arrs))
    lo = min(int(a.min()) for a in arrs)
    hi = max(int(a.max()) for a in arrs)
    span = hi - lo + 1
    if span <= max(8 * n, 1 << 20):
        seen = np.zeros(span, dtype=bool)
        for a in arrs:
            seen[a - lo] = True
        return (np.flatnonzero(seen) + lo).astype(np.int64)
    return np.unique(np.concatenate(arrs) if len(arrs) > 1 else arrs[0])


def unique_counts(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique ids, counts) — np.unique(return_counts=True)
    with the same dense-id bitmap fast path as unique_concat (bincount
    over the offset ids instead of a sort)."""
    a = np.asarray(a)
    if not len(a):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    lo = int(a.min())
    span = int(a.max()) - lo + 1
    if span <= max(8 * len(a), 1 << 20):
        cnt = np.bincount(a - lo, minlength=span)
        ids = np.flatnonzero(cnt)
        return (ids + lo).astype(np.int64), cnt[ids]
    ids, counts = np.unique(a, return_counts=True)
    return ids.astype(np.int64), counts


def in_sorted(sorted_vals: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean membership mask of ``keys`` in the SORTED array
    ``sorted_vals`` (clamped searchsorted + equality check — the
    broadcast semi-join probe)."""
    keys = np.asarray(keys)
    if len(sorted_vals) == 0:
        return np.zeros(len(keys), dtype=bool)
    idx = np.searchsorted(sorted_vals, keys)
    np.clip(idx, 0, len(sorted_vals) - 1, out=idx)
    return sorted_vals[idx] == keys


def lookup_sorted(sorted_keys: np.ndarray, values: np.ndarray,
                  keys: np.ndarray, what: str = "lookup_sorted"):
    """``values`` gathered at the position of each ``keys`` entry in
    the SORTED array ``sorted_keys``. Raises ValueError (naming
    ``what``) if any key is absent — never silently reads a
    neighboring entry the way an unclamped/unchecked searchsorted
    would."""
    keys = np.asarray(keys)
    if len(sorted_keys) == 0:
        if len(keys) == 0:
            return np.asarray(values)[:0]
        raise ValueError(f"{what}: lookup table is empty but "
                         f"{len(keys)} keys were probed")
    idx = np.searchsorted(sorted_keys, keys)
    np.clip(idx, 0, len(sorted_keys) - 1, out=idx)
    miss = sorted_keys[idx] != keys
    if miss.any():
        raise ValueError(
            f"{what}: {int(np.count_nonzero(miss))} of {len(keys)} ids "
            "absent from the lookup table (first missing: "
            f"{np.asarray(keys)[miss][:3].tolist()})")
    return values[idx]


_POW2_U64 = None


def bit_length_u64(w: "np.ndarray") -> "np.ndarray":
    """Exact vectorized bit_length of uint64 values (0 -> 0) — float
    log2 misrounds at the 54-bit edge, so compare against a
    powers-of-two table instead."""
    global _POW2_U64
    if _POW2_U64 is None:
        _POW2_U64 = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return np.searchsorted(_POW2_U64, w, side="right").astype(np.int64)


def group_sum_pairs(a: np.ndarray, b: np.ndarray, w: np.ndarray):
    """Sum w per unique (a, b) pair (lexsort + run-boundary reduceat).
    Returns (a_unique, b_unique, sums); empty inputs pass through."""
    if not len(a):
        return a, b, w
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    chg = np.empty(len(a), dtype=bool)
    chg[0] = True
    chg[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(chg)
    return a[starts], b[starts], np.add.reduceat(w, starts)
