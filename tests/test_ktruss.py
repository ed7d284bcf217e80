"""edge_supports / k-truss tests: brute-force parity on random
graphs, closed forms, bounded-round semantics, and the distributed
closing plan."""

import numpy as np
import pytest

from totem_ray.algs import edge_supports, ktruss
from totem_ray.graph.edges import edges_from_arrays


def _rand_canonical(seed: int, nv: int, ne: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, nv, ne)
    dst = rng.integers(0, nv, ne)
    m = src != dst
    return np.unique(np.stack([np.minimum(src[m], dst[m]),
                               np.maximum(src[m], dst[m])], axis=1), axis=0)


def brute_supports(pairs: np.ndarray) -> dict:
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    out = {}
    for a, b in pairs:
        s = len(adj[int(a)] & adj[int(b)])
        if s:
            out[(int(a), int(b))] = s
    return out


def brute_ktruss(pairs: np.ndarray, k: int) -> set:
    cur = set(map(tuple, pairs.tolist()))
    while True:
        sup = brute_supports(np.array(sorted(cur)).reshape(-1, 2)) \
            if cur else {}
        nxt = {e for e in cur if sup.get(e, 0) >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


@pytest.mark.parametrize("seed", [3, 17])
def test_edge_supports_matches_brute(seed):
    pairs = _rand_canonical(seed, 30, 140)
    sup = edge_supports(edges_from_arrays(pairs)).to_pandas()
    got = {(int(r.lo), int(r.hi)): int(r.support)
           for r in sup.itertuples()}
    assert got == brute_supports(pairs)


def test_edge_supports_distributed_plan_agrees():
    # force the join plan (broadcast_max_edges=0) — same supports
    pairs = _rand_canonical(29, 40, 220)
    a = edge_supports(edges_from_arrays(pairs)).to_pandas()
    b = edge_supports(edges_from_arrays(pairs),
                      broadcast_max_edges=0).to_pandas()
    ga = {(int(r.lo), int(r.hi)): int(r.support) for r in a.itertuples()}
    gb = {(int(r.lo), int(r.hi)): int(r.support) for r in b.itertuples()}
    assert ga == gb == brute_supports(pairs)


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_fixpoint_matches_brute(k):
    pairs = _rand_canonical(11, 30, 150)
    df = ktruss(edges_from_arrays(pairs), k).to_pandas()
    got = set(map(tuple, df[["src", "dst"]].to_numpy().tolist())) \
        if len(df) else set()
    assert got == brute_ktruss(pairs, k)


def test_ktruss_k4_clique():
    # K4 is exactly a 4-truss; adding a pendant edge changes nothing
    e = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3],
                  [3, 9]])
    df = ktruss(edges_from_arrays(e), 4).to_pandas()
    got = set(map(tuple, df[["src", "dst"]].to_numpy().tolist()))
    assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_ktruss_empty_result_typed():
    # a triangle has no 5-truss — result must still carry the schema
    e = np.array([[0, 1], [1, 2], [0, 2]])
    out = ktruss(edges_from_arrays(e), 5)
    assert out.count() == 0
    assert set(out.schema().names) == {"src", "dst"}


def test_ktruss_bounded_rounds_noop_past_fixpoint():
    # K4: already a 4-truss, so rounds=1 and rounds=5 agree
    e = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    a = ktruss(edges_from_arrays(e), 4, rounds=1).to_pandas()
    b = ktruss(edges_from_arrays(e), 4, rounds=5).to_pandas()
    assert sorted(map(tuple, a.to_numpy().tolist())) == \
        sorted(map(tuple, b.to_numpy().tolist()))


def test_ktruss_rejects_k2():
    with pytest.raises(ValueError, match="k >= 3"):
        ktruss(edges_from_arrays(np.array([[0, 1]])), 2)
