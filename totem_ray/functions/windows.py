"""Windowed aggregates / sessionization / as-of join over the events
table (event_id, ts, user_id, event_type, value, props).

The reference is strictly batch (SURVEY.md §2.10) — these are the
stream-shaped batch operators a training-data pipeline needs. Ordering
assumption: windows/sessions are computed per key after an in-bucket
sort by ts; buckets are hash(key) so each key's events land in one
``map_groups`` call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from totem_ray.hashing import as_u64, hash_partition, splitmix64
from totem_ray.nputil import (col_i64, col_np, composite_group_starts,
                              group_starts_sizes)


def tumbling_window(events, width_s: int = 3600, key: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    num_buckets: int = 64):
    """Per (key, window-start) count + sum + mean. Window start is the
    epoch-truncated timestamp (== DuckDB date_trunc semantics for
    3600s / 60s widths).

    Combiner shape: each batch pre-aggregates its own (key, window)
    groups (lexsort + reduceat), then ONE hash(key, window) shuffle of
    the small partial rows sums them — at event-stream scale the
    shuffle moves one row per (key, window, batch), never one per
    event, and Ray's two-key sort aggregate (measured ~50x slower
    than the data justifies) is avoided entirely.

    ``key`` must be an integer column (the partial/combine path hashes
    and lexsorts it as int64); hash a string key to int64 first
    (``totem_ray.hashing.hash_strings_i64``) — a non-integer key
    raises up front."""
    us = width_s * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], type=pa.int64()),
                             "_w": pa.array([], type=pa.int64()),
                             "_n": pa.array([], type=pa.int64()),
                             "_s": pa.array([], type=pa.float64())})
        k = col_i64(t, key, "tumbling_window key")
        ts = np.asarray(t[ts_col].combine_chunks().cast(pa.int64()))
        w = (ts // us) * us
        v = np.asarray(t[value_col], dtype=np.float64)
        order = np.lexsort((w, k))
        k, w, v = k[order], w[order], v[order]
        starts, sizes = composite_group_starts(k, w)
        return pa.table({key: pa.array(k[starts], type=pa.int64()),
                         "_w": pa.array(w[starts], type=pa.int64()),
                         "_n": pa.array(sizes, type=pa.int64()),
                         "_s": pa.array(np.add.reduceat(v, starts),
                                        type=pa.float64())})

    def add_g(t: pa.Table) -> pa.Table:
        g = splitmix64(splitmix64(as_u64(np.asarray(t[key])))
                       ^ as_u64(np.asarray(t["_w"])))
        return t.append_column(
            "_g", pa.array((g % num_buckets).astype(np.int64)))

    def combine(t: pa.Table) -> pa.Table:
        k = col_np(t, key)
        w = col_np(t, "_w")
        n = col_np(t, "_n")
        s = col_np(t, "_s")
        order = np.lexsort((w, k))
        k, w, n, s = k[order], w[order], n[order], s[order]
        starts, _ = composite_group_starts(k, w)
        tot_n = np.add.reduceat(n, starts)
        tot_s = np.add.reduceat(s, starts)
        return pa.table({
            key: pa.array(k[starts]),
            "window_start": pa.array(w[starts].astype("datetime64[us]")),
            "n_events": pa.array(tot_n),
            "sum_value": pa.array(tot_s),
            "avg_value": pa.array(tot_s / tot_n)})

    return events.map_batches(partial, batch_format="pyarrow") \
        .map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(combine, batch_format="pyarrow")


def hopping_window(events, width_s: int = 3600, hop_s: int = 900,
                   key: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", num_buckets: int = 64):
    """Hopping (sliding) window aggregate: per (key, window-start)
    count + sum + mean over windows of ``width_s`` starting every
    ``hop_s`` (width must be a multiple of hop). Each event lands in
    width/hop overlapping windows; window starts are epoch-aligned
    (the width_s == hop_s case degenerates to tumbling_window).

    Same combiner shape as tumbling_window — the per-batch explode to
    (key, window) rows pre-aggregates before the ONE hash(key, window)
    shuffle, so shuffle volume is bounded by touched (key, window,
    batch) triples, not events x windows. ``key`` must be an integer
    column (hash strings first)."""
    if width_s % hop_s != 0:
        raise ValueError(f"width_s ({width_s}) must be a multiple of "
                         f"hop_s ({hop_s})")
    k_h = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], type=pa.int64()),
                             "_w": pa.array([], type=pa.int64()),
                             "_n": pa.array([], type=pa.int64()),
                             "_s": pa.array([], type=pa.float64())})
        k = col_i64(t, key, "hopping_window key")
        ts = np.asarray(t[ts_col].combine_chunks().cast(pa.int64()))
        v = np.asarray(t[value_col], dtype=np.float64)
        # the k_h windows containing ts start at
        # floor(ts/hop)*hop - j*hop, j = 0..k_h-1
        base = (ts // hop_us) * hop_us
        k = np.repeat(k, k_h)
        w = np.repeat(base, k_h) - np.tile(
            np.arange(k_h, dtype=np.int64) * hop_us, len(ts))
        v = np.repeat(v, k_h)
        order = np.lexsort((w, k))
        k, w, v = k[order], w[order], v[order]
        starts, sizes = composite_group_starts(k, w)
        return pa.table({key: pa.array(k[starts], type=pa.int64()),
                         "_w": pa.array(w[starts], type=pa.int64()),
                         "_n": pa.array(sizes, type=pa.int64()),
                         "_s": pa.array(np.add.reduceat(v, starts),
                                        type=pa.float64())})

    def add_g(t: pa.Table) -> pa.Table:
        g = splitmix64(splitmix64(as_u64(np.asarray(t[key])))
                       ^ as_u64(np.asarray(t["_w"])))
        return t.append_column(
            "_g", pa.array((g % num_buckets).astype(np.int64)))

    def combine(t: pa.Table) -> pa.Table:
        k = col_np(t, key)
        w = col_np(t, "_w")
        n = col_np(t, "_n")
        s = col_np(t, "_s")
        order = np.lexsort((w, k))
        k, w, n, s = k[order], w[order], n[order], s[order]
        starts, _ = composite_group_starts(k, w)
        tot_n = np.add.reduceat(n, starts)
        tot_s = np.add.reduceat(s, starts)
        return pa.table({
            key: pa.array(k[starts]),
            "window_start": pa.array(w[starts].astype("datetime64[us]")),
            "n_events": pa.array(tot_n),
            "sum_value": pa.array(tot_s),
            "avg_value": pa.array(tot_s / tot_n)})

    return events.map_batches(partial, batch_format="pyarrow") \
        .map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(combine, batch_format="pyarrow")


def session_windows(events, gap_s: int = 1800, key: str = "user_id",
                    ts_col: str = "ts", num_buckets: int = 32):
    """Session windows: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_s``. Output one row
    per session: (key, session_id, n_events, start_ts, end_ts), with
    session_id = per-key ordinal starting at 1 (matches the SQL
    lag+cumsum idiom). ``key`` must be an integer column (hash string
    keys with ``totem_ray.hashing.hash_strings_i64`` first)."""
    gap_us = gap_s * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        k = col_i64(t, key, "session_windows key")
        return pa.table({
            key: t[key],
            "_ts": t[ts_col].combine_chunks().cast(pa.int64()),
            "_b": pa.array(hash_partition(k, num_buckets)),
        })

    def sessions(t: pa.Table) -> pa.Table:
        k = col_np(t, key)
        ts = col_np(t, "_ts")
        order = np.lexsort((ts, k))
        k, ts = k[order], ts[order]
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        big_gap = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_sess = new_key | big_gap
        sess_ord = np.cumsum(new_sess)          # global ordinal
        # per-key session id starting at 1
        starts, sizes = group_starts_sizes(sess_ord)
        keys_of_sess = k[starts]
        kstarts, ksizes = group_starts_sizes(keys_of_sess)
        sid = np.arange(len(starts)) - np.repeat(kstarts, ksizes) + 1
        ends = np.concatenate([starts[1:], [len(k)]]) - 1
        return pa.table({
            key: pa.array(keys_of_sess),
            "session_id": pa.array(sid.astype(np.int64)),
            "n_events": pa.array(sizes.astype(np.int64)),
            "start_ts": pa.array(ts[starts].astype("datetime64[us]")),
            "end_ts": pa.array(ts[ends].astype("datetime64[us]")),
        })

    return events.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(sessions, batch_format="pyarrow")


def as_of_join(left, right, key: str, ts_left: str, ts_right: str,
               value_cols: list[str], num_buckets: int = 32):
    """As-of (backward) join: for each left row, the latest right row
    of the same key with ts_right <= ts_left (ties inclusive).
    Implemented as bucketed union + a fully Arrow/numpy per-bucket
    merge: both sides of a bucket are lexsorted by (key, ts,
    right-before-left), a running ``maximum.accumulate`` of right-row
    positions finds each left row's match, and right payloads are
    gathered with a null-masked Arrow ``take`` — no pandas hop, so
    int64 payloads (ids beyond 2^53, nullable columns) stay exact and
    typed nulls pad unmatched rows. Output columns are prefixed
    ``l_`` / ``r_``. Keys and both ts columns must be null-free
    (enforced); among several right rows with the SAME (key, ts) the
    match is unspecified (pre-dedup ties for determinism)."""
    lsch = left.schema()
    rsch = right.schema()
    if lsch is None or rsch is None:
        # a derived dataset that kept nothing can report no schema at
        # all — the unified output schema is unknowable, so refuse
        # clearly instead of crashing on schema access
        raise ValueError(
            "as_of_join input has no schema (zero-block dataset); pass "
            "an empty dataset that carries a schema (e.g. from a 0-row "
            "Arrow table) instead")
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    lplain = [c for c in lsch.names if c not in (key, ts_left)]

    lcols = [f"l_{c}" for c in lplain]
    rcols = [f"r_{c}" for c in value_cols]

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            # both sides carry the FULL unified schema (typed nulls for
            # the other side) so every bucket block is homogeneous
            cols = {key: t[key], "_side": pa.array(
                np.full(t.num_rows, side, dtype=np.int8)),
                "_b": pa.array(hash_partition(np.asarray(t[key]), num_buckets))}
            if side == 0:
                cols["_ts"] = t[ts_left].combine_chunks().cast(pa.int64())
                for c in lplain:
                    cols[f"l_{c}"] = t[c]
                for c in value_cols:
                    cols[f"r_{c}"] = pa.nulls(t.num_rows, type=rtypes[c])
            else:
                cols["_ts"] = t[ts_right].combine_chunks().cast(pa.int64())
                for c in lplain:
                    cols[f"l_{c}"] = pa.nulls(t.num_rows, type=ltypes[c])
                for c in value_cols:
                    cols[f"r_{c}"] = t[c]
            order = [key, "_ts"] + lcols + rcols + ["_side", "_b"]
            return pa.table({c: cols[c] for c in order})
        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        tsc = t["_ts"].combine_chunks()
        kc = t[key].combine_chunks()
        if tsc.null_count or kc.null_count:
            raise ValueError("as_of_join: key / ts columns must be "
                             "null-free")
        side = np.asarray(t["_side"].combine_chunks())
        ts = np.asarray(tsc)
        # factorize the key (np.unique handles ints and, via the
        # object-dtype path, strings) so the sort key is always numeric
        _, kcode = np.unique(np.asarray(kc), return_inverse=True)
        # right rows sort BEFORE left rows at equal (key, ts): backward
        # as-of is tie-inclusive (ts_right == ts_left matches)
        order = np.lexsort((1 - side, ts, kcode))
        side_s = side[order]
        kcode_s = kcode[order]
        n = len(order)
        # latest right-row position at or before each sorted position
        acc = np.maximum.accumulate(
            np.where(side_s == 1, np.arange(n), -1))
        lpos = np.flatnonzero(side_s == 0)
        m = acc[lpos]
        valid = m >= 0
        mm = np.where(valid, m, 0)
        # a match from a PREVIOUS key group is not a match (keys are
        # contiguous in the sort, so one equality check suffices)
        valid &= kcode_s[mm] == kcode_s[lpos]
        left_rows = pa.array(order[lpos], type=pa.int64())
        match_rows = pa.array(np.where(valid, order[mm], 0),
                              type=pa.int64(), mask=~valid)
        cols = {key: pc.take(kc, left_rows),
                ts_left: pc.take(tsc, left_rows).cast(pa.timestamp("us"))}
        for c in lcols:
            cols[c] = pc.take(t[c].combine_chunks(), left_rows)
        for c in rcols:
            # null index -> typed null: unmatched rows keep the true
            # value dtype (string/datetime/int64) in every bucket
            cols[c] = pc.take(t[c].combine_chunks(), match_rows)
        return pa.table(cols)

    return tagged.groupby("_b").map_groups(merge, batch_format="pyarrow")
