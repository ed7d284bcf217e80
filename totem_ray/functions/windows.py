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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum, Mean

from totem_ray.hashing import hash_partition
from totem_ray.nputil import group_starts_sizes


def tumbling_window(events, width_s: int = 3600, key: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value"):
    """Per (key, window-start) count + sum + mean. Window start is the
    epoch-truncated timestamp (== DuckDB date_trunc semantics for
    3600s / 60s widths)."""
    us = width_s * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].combine_chunks().cast(pa.int64()))
        w = (ts // us) * us
        return pa.table({
            key: t[key],
            "window_start": pa.array(w).cast(pa.timestamp("us")),
            value_col: t[value_col],
        })

    win = events.map_batches(add_window, batch_format="pyarrow")
    return win.groupby([key, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="avg_value"))


def session_windows(events, gap_s: int = 1800, key: str = "user_id",
                    ts_col: str = "ts", num_buckets: int = 32):
    """Session windows: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_s``. Output one row
    per session: (key, session_id, n_events, start_ts, end_ts), with
    session_id = per-key ordinal starting at 1 (matches the SQL
    lag+cumsum idiom)."""
    gap_us = gap_s * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            "_ts": t[ts_col].combine_chunks().cast(pa.int64()),
            "_b": pa.array(hash_partition(np.asarray(t[key]), num_buckets)),
        })

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "_ts"], kind="stable")
        k = df[key].to_numpy()
        ts = df["_ts"].to_numpy()
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
        return pd.DataFrame({
            key: keys_of_sess,
            "session_id": sid.astype(np.int64),
            "n_events": sizes.astype(np.int64),
            "start_ts": ts[starts].astype("datetime64[us]"),
            "end_ts": ts[ends].astype("datetime64[us]"),
        })

    return events.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(sessions, batch_format="pandas")


def as_of_join(left, right, key: str, ts_left: str, ts_right: str,
               value_cols: list[str], num_buckets: int = 32):
    """As-of (backward) join: for each left row, the latest right row
    of the same key with ts_right <= ts_left. Implemented as bucketed
    union + per-bucket pandas merge_asof (sorted within bucket).
    Output columns are prefixed ``l_`` / ``r_``.

    Precision note: ``merge_asof`` has no Arrow equivalent, so payload
    columns hop Arrow -> pandas -> Arrow per bucket. An int64 column
    that contains nulls degrades to float64 in that hop and loses
    exactness above 2^53 — and BOTH sides get null padding here (left
    payload columns are null on right-side rows of a bucket block and
    vice versa), so the guard checks the int64 payload columns of BOTH
    inputs and raises rather than silently corrupting ids (keys and
    the two ``ts`` columns are required null-free by the sort
    anyway). The check runs per batch inside the tag pass — an eager
    pre-scan would re-execute each input's upstream pipeline — so the
    ValueError surfaces when the joined dataset is consumed."""
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

    def _i64_cols(types, cols):
        return [c for c in cols
                if (t := types.get(c)) is not None
                and pa.types.is_integer(t) and t.bit_width == 64]

    guard_cols = {0: _i64_cols(ltypes, lplain),
                  1: _i64_cols(rtypes, value_cols)}

    def _check_i64(t: pa.Table, cols, side):
        # runs per batch INSIDE the tag pass (a separate pre-scan of
        # each input would re-execute its whole upstream pipeline) —
        # min/max compared directly against +-2^53 rather than via
        # pc.abs, which silently wraps INT64_MIN back to a negative
        # and let it escape the guard
        lim = 1 << 53
        for c in cols:
            col = t[c].combine_chunks().cast(pa.int64())
            mx = pc.max(col).as_py()
            mn = pc.min(col).as_py()
            bad = mx if (mx is not None and mx > lim) else \
                (mn if (mn is not None and mn < -lim) else None)
            if bad is not None:
                raise ValueError(
                    f"as_of_join {side} column {c!r} holds int64 ids "
                    f"beyond +-2^53 ({bad}); the pandas merge_asof hop "
                    "would degrade them to float64 — pre-map ids to a "
                    "dense range or join on a separate pass")

    lcols = [f"l_{c}" for c in lplain]
    rcols = [f"r_{c}" for c in value_cols]

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            _check_i64(t, guard_cols[side],
                       "left payload" if side == 0 else "value")
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

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        lcols = [c for c in df.columns if c.startswith("l_")]
        rcols = [c for c in df.columns if c.startswith("r_")]
        l = df.loc[df["_side"] == 0, [key, "_ts"] + lcols] \
            .sort_values("_ts", kind="stable")
        r = df.loc[df["_side"] == 1, [key, "_ts"] + rcols] \
            .sort_values("_ts", kind="stable")
        if len(r):
            out = pd.merge_asof(l, r, on="_ts", by=key, direction="backward")
        else:
            out = l.copy()
            for c in rcols:
                # dtype-preserving empty padding: a bare np.nan would
                # make this bucket's r_ columns float64 while matched
                # buckets keep the true dtype (string/datetime/...),
                # and the blocks' schemas would no longer unify
                out[c] = pd.Series(index=out.index, dtype=r[c].dtype)
        out = out.rename(columns={"_ts": ts_left})
        out[ts_left] = out[ts_left].astype("datetime64[us]")
        return out

    return tagged.groupby("_b").map_groups(merge, batch_format="pandas")
