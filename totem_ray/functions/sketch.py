"""Sketch / sampling operators for 100-TB-scale corpora.

* HyperLogLog distinct counting (Flajolet et al. 2007, the standard
  practical variant with linear-counting small-range correction):
  per-batch partial registers merged with an m-row max-groupby —
  the whole corpus reduces to 2^p tiny rows, no driver pass over
  data. The register state is an EXACT integer function of the
  tabulation token hashes (hashing.tab_hash_strings), so the driver's
  DuckDB oracle can value-check the sketch itself, not just a row
  count.
* Deterministic hash-threshold sampling: keep rows whose
  splitmix64(key ^ splitmix64(seed)) falls under rate * 2^64 —
  the scalable reproducible-sample pattern (no RNG state, stable
  under repartitioning/retries, SQL-transcribable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from totem_ray.hashing import as_u64, splitmix64
from totem_ray.nputil import bit_length_u64 as _bit_length_u64


def hll_alpha(m: int) -> float:
    """The HLL bias-correction constant alpha_m (Flajolet et al. 2007,
    Fig. 3) — shared by the corpus sketch and HyperBall estimators."""
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_token_registers(docs, p: int = 10):
    """Dataset (bucket, rho) — HyperLogLog registers (2^p buckets)
    over the corpus token stream (lower + whitespace split, the dedup
    tokenizer; hash = tab_hash_strings, SQL-transcribable). Only
    buckets with a nonzero register appear. bucket = top p hash bits,
    rho = leading-zero count of the remaining 64-p bits + 1."""
    from ray.data.aggregate import Max

    from totem_ray.functions.dedup import _shingle_rows

    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    low_bits = 64 - p
    mask = (np.uint64(1) << np.uint64(low_bits)) - np.uint64(1)

    def partial(t: pa.Table) -> pa.Table:
        _, th = _shingle_rows(t, k=1)  # k=1 shingle = raw token hash
        h = th.view(np.uint64)
        reg = np.zeros(m, dtype=np.int64)
        if len(h):
            bucket = (h >> np.uint64(low_bits)).astype(np.int64)
            w = h & mask
            rho = low_bits - _bit_length_u64(w) + 1
            np.maximum.at(reg, bucket, rho)
        nz = np.flatnonzero(reg)
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "rho": pa.array(reg[nz], type=pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bucket").aggregate(
        Max("rho", alias_name="rho"))


def hll_estimate(registers, p: int = 10) -> float:
    """Cardinality estimate from an (bucket, rho) register table
    (pandas / pyarrow / Dataset): alpha_m * m^2 / sum(2^-rho) with the
    linear-counting small-range correction (E <= 2.5m and empty
    registers present)."""
    import pandas as pd

    if not isinstance(registers, pd.DataFrame):
        registers = registers.to_pandas()  # ray Dataset / pyarrow Table
    m = 1 << p
    reg = np.zeros(m, dtype=np.int64)
    if len(registers):
        reg[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    e = hll_alpha(m) * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


SAMPLE_SEED = 7


def hash_sample(ds, key_col: str, rate: float, seed: int = SAMPLE_SEED):
    """Deterministic hash-threshold sample: keep rows where
    splitmix64(as_u64(key) ^ splitmix64(seed)) < rate * 2^64.
    Reproducible across runs/partitionings; expected fraction = rate;
    a row's fate depends only on (key, seed)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    threshold = np.uint64(min(int(rate * (1 << 64)), (1 << 64) - 1))
    # array form: numpy warns on intended uint64 wraparound for scalars
    seed_c = splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF],
                                 dtype=np.uint64))[0]

    def keep(t: pa.Table) -> pa.Table:
        k = as_u64(np.asarray(t[key_col]))
        v = splitmix64(k ^ seed_c)
        return t.filter(pa.array(v < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def top_k_per_key(ds, key_col: str, order_col: str, k: int,
                  descending: bool = True, tie_col: str | None = None,
                  num_buckets: int = 64):
    """Keep the top ``k`` rows per key by ``order_col`` — the per-key
    quota / cap of corpus curation (e.g. at most N documents per host,
    ranked by quality, so one spam domain cannot dominate a shard).
    The reference has no relational operators; this is the
    training-data extension of its per-vertex top-degree selections
    (partition_by_sorted_degree's alpha walk, totem_partition.cu).

    Deterministic: rows order by (order_col DESC|ASC, tie_col ASC,
    input order); ``tie_col`` defaults to ``key_col`` (pass a unique
    id column for full determinism under equal order values). All
    original columns ride through. One hash(key) shuffle; the
    per-bucket pick is a vectorized lexsort + per-group ordinal cut.
    int64 order columns sort EXACTLY (sign-bit-flip descending key,
    no float round-trip); float columns must be NaN-free."""
    from totem_ray.hashing import hash_partition
    from totem_ray.nputil import col_i64, col_np, group_starts_sizes

    tie_col = tie_col or key_col

    def sort_key(o: np.ndarray) -> np.ndarray:
        if np.issubdtype(o.dtype, np.unsignedinteger):
            # already unsigned-ordered: a sign-bit flip here would
            # invert the order of values >= 2^63 vs < 2^63
            u = o.astype(np.uint64)
            return ~u if descending else u
        if np.issubdtype(o.dtype, np.integer):
            u = as_u64(o.astype(np.int64)) ^ np.uint64(1 << 63)
            return ~u if descending else u
        o = o.astype(np.float64)
        if np.isnan(o).any():
            raise ValueError(f"top_k_per_key: {order_col!r} contains "
                             "NaN; drop or fill first")
        return -o if descending else o

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(hash_partition(
            col_i64(t, key_col, "top_k_per_key key"), num_buckets)))

    def pick(t: pa.Table) -> pa.Table:
        kv = col_np(t, key_col)
        order = np.lexsort((col_np(t, tie_col),
                            sort_key(col_np(t, order_col)), kv))
        kv_s = kv[order]
        starts, sizes = group_starts_sizes(kv_s)
        ords = np.arange(len(kv_s)) - np.repeat(starts, sizes)
        keep = order[ords < k]
        return t.take(pa.array(np.sort(keep))).drop_columns(["_g"])

    return ds.map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(pick, batch_format="pyarrow")


def hash_split(ds, key_col: str, fractions: dict[str, float],
               seed: int = SAMPLE_SEED, label_col: str = "split"):
    """Deterministic dataset split (train/val/test): each row gets the
    label whose cumulative-fraction interval contains
    splitmix64(as_u64(key) ^ splitmix64(seed)) / 2^64. A row's split
    depends only on (key, seed) — stable across runs, partitionings
    and even machines — and fractions need not sum to 1 (the
    remainder gets no label and is dropped; pass fractions summing to
    1.0 to keep every row). Label assignment follows ``fractions``'
    insertion order."""
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    if sum(fractions.values()) > 1.0 + 1e-12:
        raise ValueError("fractions sum to more than 1")
    labels = list(fractions)
    cum, edges_hi = 0.0, []
    for name in labels:
        cum += fractions[name]
        edges_hi.append(np.uint64(min(int(cum * (1 << 64)),
                                      (1 << 64) - 1)))
    bounds = np.array(edges_hi, dtype=np.uint64)
    # fractions summing to 1 must keep EVERY row: the last bound is
    # clamped to 2^64-1, which side="right" would exclude for the one
    # hash value equal to it — make the last interval closed instead
    full_cover = cum >= 1.0 - 1e-12
    seed_c = splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF],
                                 dtype=np.uint64))[0]

    def assign(t: pa.Table) -> pa.Table:
        v = splitmix64(as_u64(np.asarray(t[key_col])) ^ seed_c)
        idx = np.searchsorted(bounds, v, side="right")
        if full_cover:
            idx = np.minimum(idx, len(labels) - 1)
        keep = idx < len(labels)
        t = t.filter(pa.array(keep))
        lab = pa.array(np.asarray(labels, dtype=object)[idx[keep]],
                       type=pa.string())
        return t.append_column(label_col, lab)

    return ds.map_batches(assign, batch_format="pyarrow")
