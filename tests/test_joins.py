"""hash_join / broadcast_lookup correctness, incl. 64-bit id fidelity.

The engine's vertex ids are 64-bit url-hash bit patterns (splitmix64
of the url, totem_ray/sources/extract.py), so join keys and payloads
routinely exceed 2^53 — the float64-exact integer range. These tests
pin the Arrow-native merge path: no pandas, no float64 round-trip.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from totem_ray.graph.joins import hash_join, broadcast_lookup

BIG = 4611686018427400249  # > 2^53; float64 would round to ...0192


def test_hash_join_preserves_large_int64_keys_and_payloads():
    keys = [1, 2, BIG, BIG + 1, BIG + 7]  # BIG and BIG+1 collide in f64
    l = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "lv": pa.array([BIG + i for i in range(5)], pa.int64()),
    }))
    r = rd.from_arrow(pa.table({
        "k": pa.array([2, BIG, BIG + 1, 999], pa.int64()),
        "rv": pa.array([20, 30, 31, 99], pa.int64()),
    }))
    out = hash_join(l, r, on="k").to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, BIG, BIG + 1]
    assert out["rv"].tolist() == [20, 30, 31]
    assert out["lv"].dtype == np.int64 and out["k"].dtype == np.int64


def test_hash_join_left_nulls_stay_typed():
    l = rd.from_arrow(pa.table({"k": pa.array([1, BIG], pa.int64()),
                                "lv": pa.array([5, 6], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([BIG], pa.int64()),
                                "rv": pa.array([b"\x00" * 8], pa.binary())}))
    out = hash_join(l, r, on="k", how="left").to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, BIG]
    assert out["rv"].tolist()[1] == b"\x00" * 8 and out["rv"].tolist()[0] is None


def test_hash_join_duplicate_keys_cartesian_within_key():
    l = rd.from_arrow(pa.table({"k": pa.array([7, 7, 8], pa.int64()),
                                "lv": pa.array([1, 2, 3], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([7, 7], pa.int64()),
                                "rv": pa.array([10, 20], pa.int64())}))
    out = hash_join(l, r, on="k").to_pandas()
    assert len(out) == 4
    assert sorted(zip(out["lv"], out["rv"])) == [(1, 10), (1, 20),
                                                 (2, 10), (2, 20)]


def test_hash_join_fixed_size_binary_payload():
    # minhash signatures ride joins as fixed_size_binary — must survive
    sig = pa.array([b"a" * 16, b"b" * 16], pa.binary(16))
    l = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "sig_a": sig}))
    r = rd.from_arrow(pa.table({"k": pa.array([2], pa.int64()),
                                "rv": pa.array([9], pa.int64())}))
    out = hash_join(l, r, on="k").to_pandas()
    assert out["sig_a"].tolist() == [b"b" * 16]


def test_broadcast_lookup_large_ids():
    import pandas as pd
    ds = rd.from_arrow(pa.table({"v": pa.array([BIG, BIG + 1, 3], pa.int64())}))
    small = pd.DataFrame({"v": np.array([BIG + 1, BIG], dtype=np.int64),
                          "tag": np.array([11, 10], dtype=np.int64)})
    out = broadcast_lookup(ds, small, key="v", on="v").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert out["v"].tolist() == [3, BIG, BIG + 1]
    assert out["tag"].tolist()[1:] == [10, 11]


def test_hash_semi_join():
    # semi: left rows whose key exists on the right, each at most once
    # even when the right has duplicate keys; right payload dropped
    l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                                "lv": pa.array([10, 20, 21, 30], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([2, 2, 4], pa.int64()),
                                "rv": pa.array([0, 0, 0], pa.int64())}))
    out = hash_join(l, r, on="k", how="semi").to_pandas().sort_values("lv")
    assert out.columns.tolist() == ["k", "lv"]
    assert out["lv"].tolist() == [20, 21]


def test_hash_semi_join_composite_large_ids():
    pairs_l = [(1, BIG), (BIG, BIG + 1), (5, 6)]
    pairs_r = [(BIG, BIG + 1), (7, 8)]
    l = rd.from_arrow(pa.table({
        "lo": pa.array([p[0] for p in pairs_l], pa.int64()),
        "hi": pa.array([p[1] for p in pairs_l], pa.int64()),
        "u": pa.array([100, 101, 102], pa.int64())}))
    r = rd.from_arrow(pa.table({
        "lo": pa.array([p[0] for p in pairs_r], pa.int64()),
        "hi": pa.array([p[1] for p in pairs_r], pa.int64())}))
    out = hash_join(l, r, on=["lo", "hi"], how="semi",
                    right_cols=["lo", "hi"]).to_pandas()
    assert out["u"].tolist() == [101]
    assert out["lo"].tolist() == [BIG] and out["hi"].tolist() == [BIG + 1]


def test_grouped_reduce_null_value_raises():
    """A null in a value column must raise, not silently degrade the
    int64 values to float64 (the combine works on raw numpy views of
    the Arrow buffers)."""
    import pytest

    from totem_ray.graph.joins import grouped_reduce

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([10, None, 30], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        grouped_reduce(ds, ["k"], ["v"], how="sum").to_pandas()


def test_grouped_reduce_string_key_raises():
    from totem_ray.graph.joins import grouped_reduce

    import pytest

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["x", "y"], pa.string()),
        "v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(Exception, match="integer-typed"):
        grouped_reduce(ds, ["k"], ["v"], how="sum").to_pandas()


def test_hash_anti_join():
    l = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                "lv": pa.array([10, 20, 30], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([2, 4], pa.int64()),
                                "rv": pa.array([0, 0], pa.int64())}))
    out = hash_join(l, r, on="k", how="anti").to_pandas().sort_values("k")
    assert out.columns.tolist() == ["k", "lv"]
    assert out["k"].tolist() == [1, 3]
    # anti vs semi partition the left rows
    semi = hash_join(l, r, on="k", how="semi").to_pandas()
    assert sorted(semi["k"].tolist() + out["k"].tolist()) == [1, 2, 3]


def test_hash_anti_join_large_ids():
    l = rd.from_arrow(pa.table({"k": pa.array([BIG, BIG + 1], pa.int64()),
                                "lv": pa.array([1, 2], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([BIG], pa.int64())}))
    out = hash_join(l, r, on="k", how="anti",
                    right_cols=["k"]).to_pandas()
    assert out["k"].tolist() == [BIG + 1]
