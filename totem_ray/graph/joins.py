"""Distributed joins / lookups.

The reference's joins are dense-array hash lookups
(``id_in_partition``, totem_partition.cu:476-490; ghost renumbering,
totem_grooves_internal.cc:44-62 — literally a hash-join build side).
Here:

* ``broadcast_lookup`` — small side broadcast via ``ray.put`` +
  sorted-array searchsorted per batch (the get_subgraph mask pattern,
  totem_graph.cu:409-466). No shuffle.
* ``hash_join`` — both sides large: explicit partitioned hash join.
  Both inputs get a ``bucket = hash(key) % B`` column, are unioned
  with a side tag, shuffled ONCE by bucket, and each bucket is merged
  with ``pyarrow.Table.join`` inside ``map_groups`` (zero pandas:
  int64 keys never degrade to float64, so 64-bit url-hash ids above
  2^53 survive bit-exactly). This is the portable pattern; Ray's
  native ``Dataset.join`` (2.49) mis-handles empty blocks, so we
  keep our own.

Skew note: a hot join key salts into sub-buckets only if the caller
pre-salts; for graph workloads our keys are (vertex id) or (id pair),
whose hash distribution is uniform by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from totem_ray.hashing import splitmix64, as_u64
from totem_ray.nputil import col_i64, col_np, in_sorted


def broadcast_lookup(ds, small_df: pd.DataFrame, key: str, on: str,
                     columns: list[str] | None = None):
    """Attach columns of a SMALL table (one ray.put, read per actor)
    to a large Dataset by equality on ``on`` == small[key]."""
    small = small_df.sort_values(key)
    keys = small[key].to_numpy()
    cols = {c: small[c].to_numpy() for c in (columns or
                                             [c for c in small.columns if c != key])}
    sch = ds.schema()
    if sch is not None:
        clash = [c for c in cols if c in sch.names]
        if clash:
            # append_column would create DUPLICATE field names — a
            # far-from-the-join-site failure on the first downstream
            # select; fail here instead
            raise ValueError(
                f"broadcast_lookup: column(s) {clash} already exist on "
                "the Dataset; rename the small-table columns or pass "
                "columns=[...] excluding them")
    ref = ray.put((keys, cols))

    class Lookup:
        def __init__(self):
            self.keys, self.cols = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = np.asarray(t[on])
            idx = np.searchsorted(self.keys, v)
            idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
            ok = (len(self.keys) > 0) & (self.keys[idx_c] == v) if len(self.keys) \
                else np.zeros(len(v), dtype=bool)
            out = t
            ok = np.asarray(ok, dtype=bool)
            for name, arr in self.cols.items():
                vals = arr[idx_c] if len(self.keys) else np.zeros(len(v), arr.dtype)
                out = out.append_column(name, pa.array(vals, mask=~ok))
            return out

    return ds.map_batches(Lookup, batch_format="pyarrow", concurrency=(1, 8))


def _key_hash(t: pa.Table, on: list[str], num_buckets: int) -> np.ndarray:
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in on:
        h = splitmix64(h ^ as_u64(np.asarray(t[c])))
    return (h % int(num_buckets)).astype(np.int64)


def hash_join(left, right, on: list[str] | str, how: str = "inner",
              num_buckets: int = 64,
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None):
    """Partitioned hash join of two Datasets on equality of ``on``
    columns (same names both sides). Non-key column names must be
    disjoint. ``how`` in {'inner', 'left', 'semi', 'anti'} — 'semi'
    keeps the LEFT rows whose key exists on the right, 'anti' the
    LEFT rows whose key does NOT (both are exact existence checks; no
    right payload ships through the merge). Pass
    left_cols/right_cols when a side may be empty (schema
    unavailable)."""
    on = [on] if isinstance(on, str) else list(on)
    lschema = left.schema()
    rschema = right.schema()
    lcols = left_cols or (lschema.names if lschema else None)
    rcols = right_cols or (rschema.names if rschema else None)
    if lcols is None or rcols is None:
        raise ValueError("empty side with unknown schema: pass "
                         "left_cols/right_cols explicitly")
    lval = [c for c in lcols if c not in on]
    rval = [] if how in ("semi", "anti") else \
        [c for c in rcols if c not in on]
    clash = set(lval) & set(rval)
    if clash:
        raise ValueError(f"non-key column clash: {clash}")

    _arrow_types = {}
    for sch in (lschema, rschema):
        if sch is not None and getattr(sch, "names", None) is not None:
            _arrow_types.update(dict(zip(sch.names, sch.types)))

    def tagger(side: int, other_vals: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in t.column_names}
            for c in other_vals:
                # typed nulls so blocks concat cleanly with the other
                # side (untyped null columns crash tensor/list sorts)
                typ = _arrow_types.get(c)
                try:
                    cols[c] = pa.nulls(t.num_rows, type=typ)
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid,
                        TypeError):
                    cols[c] = pa.nulls(t.num_rows)
            cols["_side"] = pa.array(np.full(t.num_rows, side, dtype=np.int8))
            cols["_bucket"] = pa.array(_key_hash(t, on, num_buckets))
            order = on + lval + rval + ["_side", "_bucket"]
            return pa.table({c: cols[c] for c in order})
        return fn

    tagged = left.map_batches(tagger(0, rval), batch_format="pyarrow").union(
        right.map_batches(tagger(1, lval), batch_format="pyarrow"))

    out_cols = on + lval + rval
    join_type = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]
    known_types = dict(_arrow_types)

    def merge(t: pa.Table) -> pa.Table:
        # all-null padding columns come through as type `null`, which
        # Acero rejects as join payload; they carry no data, so drop
        # them for the join and re-append typed nulls after.
        null_cols = {f.name for f in t.schema if pa.types.is_null(f.type)}
        if any(c in null_cols for c in on):
            # key column entirely null => no matches possible
            fields = {f.name: known_types.get(f.name, f.type)
                      for f in t.schema}
            return pa.table({c: pa.array([], type=fields[c])
                             for c in out_cols})
        lmask = pc.equal(t["_side"], 0)
        l = t.filter(lmask).select(
            on + [c for c in lval if c not in null_cols]).combine_chunks()
        r = t.filter(pc.invert(lmask)).select(
            on + [c for c in rval if c not in null_cols]).combine_chunks()
        joined = l.join(r, keys=on, join_type=join_type)
        for c in null_cols - set(on):
            joined = joined.append_column(
                c, pa.nulls(joined.num_rows, known_types.get(c)))
        return joined.select(out_cols)

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def semi_join_broadcast(ds, keys: np.ndarray, on: str, anti: bool = False):
    """Semi/anti join against a broadcast key set (frontier/mask
    pattern)."""
    ks = np.sort(np.asarray(keys))
    ref = ray.put(ks)

    class F:
        def __init__(self):
            self.ks = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ok = in_sorted(self.ks, np.asarray(t[on]))
            return t.filter(pa.array(~ok if anti else ok))

    return ds.map_batches(F, batch_format="pyarrow", concurrency=(1, 8))


def grouped_reduce(ds, key_cols: list[str], value_cols: list[str],
                   how: list[str] | str = "sum",
                   out_names: list[str] | None = None,
                   num_buckets: int = 64):
    """Hash-bucket grouped sum/min over integer key columns ->
    Dataset (*key_cols, *out_names).

    One hash(keys) shuffle group + a vectorized lexsort/reduceat per
    group. This exists because Ray Data's sort-based
    ``groupby(keys).aggregate(...)`` measured ~8 s (one key) to
    ~16-115 s (two keys) on 2M-row inputs where the data justifies
    ~1 s — at corpus scale that aggregate is the difference between a
    combine and a stall. All keys must be integer-typed and all
    columns null-free (checked — this combine works on raw numpy
    views of the Arrow buffers, where a null would otherwise degrade
    int64 to float64 silently); ``how`` is "sum" or "min", scalar or
    per-value-column."""
    from totem_ray.hashing import as_u64, splitmix64
    from totem_ray.nputil import composite_group_starts

    out_names = out_names or value_cols
    hows = [how] * len(value_cols) if isinstance(how, str) else list(how)
    if len(hows) != len(value_cols) or len(out_names) != len(value_cols):
        raise ValueError("value_cols / how / out_names length mismatch")

    def add_g(t: pa.Table) -> pa.Table:
        g = np.zeros(t.num_rows, dtype=np.uint64)
        for c in key_cols:
            g = splitmix64(g ^ as_u64(col_i64(t, c, "grouped_reduce key")))
        return t.append_column(
            "_g", pa.array((g % num_buckets).astype(np.int64)))

    def combine(t: pa.Table) -> pa.Table:
        keys = [col_i64(t, c, "grouped_reduce key") for c in key_cols]
        order = np.lexsort(tuple(reversed(keys)))
        keys = [k[order] for k in keys]
        starts, _ = composite_group_starts(*keys)
        out = {c: pa.array(k[starts]) for c, k in zip(key_cols, keys)}
        for c, name, h in zip(value_cols, out_names, hows):
            v = col_np(t, c, "grouped_reduce value")[order]
            red = np.minimum if h == "min" else np.add
            out[name] = pa.array(red.reduceat(v, starts))
        return pa.table(out)

    return ds.map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(combine, batch_format="pyarrow")
