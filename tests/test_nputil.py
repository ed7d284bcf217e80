"""Property tests for the dense-id bitmap unique helpers (they must be
indistinguishable from np.unique across id regimes — the engine build
uses them on every shard)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from totem_ray.nputil import unique_concat, unique_counts

ids = st.one_of(
    st.integers(min_value=0, max_value=50),              # dense small
    st.integers(min_value=-30, max_value=10),            # negative
    st.integers(min_value=0, max_value=2**62),           # sparse huge
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(ids, max_size=40), max_size=5))
def test_unique_concat_matches_np(parts):
    arrs = [np.array(p, dtype=np.int64) for p in parts]
    got = unique_concat(arrs)
    flat = [a for a in arrs if len(a)]
    want = np.unique(np.concatenate(flat)) if flat else np.empty(0, np.int64)
    assert got.dtype == np.int64
    assert np.array_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(st.lists(ids, max_size=60))
def test_unique_counts_matches_np(vals):
    a = np.array(vals, dtype=np.int64)
    u, c = unique_counts(a)
    if len(a):
        wu, wc = np.unique(a, return_counts=True)
    else:
        wu = wc = np.empty(0, np.int64)
    assert np.array_equal(u, wu) and np.array_equal(c, wc)


def test_unique_concat_bitmap_path_exact_boundary():
    # span exactly at / just over the dense gate both stay correct
    a = np.arange(0, 1 << 20, 7, dtype=np.int64)
    got = unique_concat([a, a[::3]])
    assert np.array_equal(got, a)
