"""Stable 64-bit hashing for vertex ids and partition keys.

The reference uses dense ``uint32`` vertex ids (``vid_t``,
totem_graph.h:64) with partition id packed in the high 2 bits
(totem_partition.h:22-57). At web scale we keep 64-bit url hashes as
global ids and derive partition ids with a mix function instead of a
renumber pass; partition count is not limited to 4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64

# splitmix64 constants (public domain, Steele et al. / xorshift family)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    x += _SM_GAMMA
    x ^= x >> _U64(30)
    x *= _SM_M1
    x ^= x >> _U64(27)
    x *= _SM_M2
    x ^= x >> _U64(31)
    return x


def as_u64(ids) -> np.ndarray:
    """Reinterpret an int64 id array as uint64 (no copy when possible).

    Vertex ids are stored as int64 in Arrow tables (native Arrow/DuckDB
    type — uint64 > 2^63 degrades to pickled-object columns in Ray's
    aggregate path) but hashed/mixed as uint64 bit patterns.
    """
    arr = np.asarray(ids)
    if arr.dtype == np.uint64:
        return arr
    return np.ascontiguousarray(arr, dtype=np.int64).view(np.uint64)


def hash_partition(ids: np.ndarray, num_partitions: int, salt: int = 0) -> np.ndarray:
    """Deterministic partition label for vertex ids.

    Replaces Totem's seeded-random per-vertex partition labels
    (partition_random, totem_partition.cu:179-252) with a pure hash so
    that routing is a stateless function of the id — any task anywhere
    on the cluster computes the same owner without a lookup table.
    """
    mixed = splitmix64(as_u64(ids) + _U64(salt & 0xFFFFFFFFFFFFFFFF))
    # modulo by a PYTHON int: numpy's uint64-array % uint64-scalar ufunc
    # is ~50x slower than the int-scalar path (measured 840 ms vs 12 ms
    # per 2M keys); results are bit-identical
    return (mixed % int(num_partitions)).astype(np.int64)


def hash_strings_u64(arr, seed: int = 42) -> np.ndarray:
    """Stable 64-bit hash of a string column (url -> vertex id).

    pandas' vectorized siphash (hash_array with a fixed key derived
    from the seed) — stable across processes (no PYTHONHASHSEED
    dependence), thread-safe, C-speed. Accepts a pyarrow
    Array/ChunkedArray or a sequence of python strings; returns uint64.
    """
    import pandas as pd

    if isinstance(arr, pa.ChunkedArray):
        vals = arr.combine_chunks().to_numpy(zero_copy_only=False)
    elif isinstance(arr, pa.Array):
        vals = arr.to_numpy(zero_copy_only=False)
    else:
        vals = np.asarray(list(arr), dtype=object)
    key = f"{seed:016d}"[:16]
    return pd.util.hash_array(vals, hash_key=key, categorize=False) \
        .astype(np.uint64)


def hash_strings_i64(arr, seed: int = 42) -> np.ndarray:
    """Stable 64-bit string hash as int64 (the edge-table id dtype)."""
    return hash_strings_u64(arr, seed=seed).view(np.int64)


def _utf8_bytes_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of a utf8/large_utf8 Array's byte payload:
    -> (data bytes uint8, per-string start offsets int64, lengths int64).
    Handles sliced arrays (non-zero ``arr.offset``); null entries are
    forced to length 0 (same hash as the empty string) — Arrow permits
    null slots whose offsets still span garbage bytes, so the validity
    bitmap must be consulted, not just the offsets."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        odt = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        odt = np.int32
    else:
        raise TypeError(f"expected a (large_)utf8/binary array, got {arr.type}")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    if arr.null_count:
        lens = np.where(np.asarray(arr.is_null()), 0, lens)
    return data, starts, lens


def tab_hash_strings(arr, seed: int = 42) -> np.ndarray:
    """Tabulation-style 64-bit string hash as int64 — SQL-transcribable.

    Construction (Zobrist/tabulation hashing, Patrascu & Thorup
    SICOMP'12 — position-keyed random terms combined with XOR, here
    with splitmix64 as the per-(position, byte) table):

        term_j = splitmix64((j << 8) | byte_j)        # utf8 byte j
        acc    = XOR_j term_j                         # 0 for ""
        hash   = splitmix64(acc ^ splitmix64(len + seed))

    Unlike :func:`hash_strings_i64` (pandas siphash — no SQL
    equivalent), every step here maps to DuckDB HUGEINT/bit_xor SQL,
    so pipelines built on it (minhash / simhash shingling) are
    value-checkable end-to-end by the driver's DuckDB oracle.
    Fully vectorized: one splitmix64 pass over the corpus bytes plus a
    ``bitwise_xor.reduceat`` segment reduction — no per-string loop.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array([None if x is None else str(x) for x in arr],
                       type=pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    data, starts, lens = _utf8_bytes_offsets(arr)
    h_len = splitmix64(lens.astype(np.uint64) + _U64(seed & 0xFFFFFFFFFFFFFFFF))
    acc = np.zeros(n, dtype=np.uint64)
    total = int(lens.sum())
    if total:
        prefix = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos_in_tok = np.arange(total, dtype=np.int64) - np.repeat(prefix, lens)
        byte_idx = np.repeat(starts, lens) + pos_in_tok
        terms = splitmix64((pos_in_tok.astype(np.uint64) << _U64(8))
                           | data[byte_idx].astype(np.uint64))
        nz = lens > 0
        acc[nz] = np.bitwise_xor.reduceat(terms, prefix[nz])
    return splitmix64(acc ^ h_len).view(np.int64)


def lineage_hash(*parts: object) -> str:
    """Deterministic lineage fingerprint for checkpoint manifests.

    Stable across processes (no PYTHONHASHSEED dependence).
    """
    import hashlib

    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]
