"""HITS and personalized-PageRank kernel tests: numpy-oracle parity
across partition counts, direction-tag plumbing, seed handling, and
prev_agg re-seeding on resume (the global-hook checkpoint contract)."""

import numpy as np
import pytest

from totem_ray.engine.bsp import BspEngine
from totem_ray.graph.edges import edges_from_arrays, tag_directions


def _rand_edges(seed: int, nv: int, ne: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, nv, ne)
    dst = rng.integers(0, nv, ne)
    m = src != dst
    pairs = np.unique(np.stack([src[m], dst[m]], axis=1), axis=0)
    return pairs


def np_hits(nv: int, e: np.ndarray, rounds: int):
    """Dense HITS with per-half-step L1 normalization, h0 = 1."""
    src, dst = e[:, 0], e[:, 1]
    hub = np.ones(nv)
    auth = np.zeros(nv)
    for _ in range(rounds):
        auth = np.zeros(nv)
        np.add.at(auth, dst, hub[src])
        s = auth.sum()
        if s > 0:
            auth /= s
        hub = np.zeros(nv)
        np.add.at(hub, src, auth[dst])
        s = hub.sum()
        if s > 0:
            hub /= s
    return auth, hub


def np_ppr(nv: int, e: np.ndarray, seeds, rounds: int, d: float = 0.85):
    src, dst = e[:, 0], e[:, 1]
    deg = np.bincount(src, minlength=nv)
    tele = np.zeros(nv)
    tele[np.asarray(seeds)] = 1.0 / len(seeds)
    rank = tele.copy()
    for _ in range(rounds):
        contrib = np.zeros(nv)
        nz = deg > 0
        contrib[nz] = rank[nz] / deg[nz]
        mail = np.zeros(nv)
        np.add.at(mail, dst, contrib[src])
        rank = (1 - d) * tele + d * mail
    return rank


def _run_hits(e: np.ndarray, P: int, rounds: int):
    eng = BspEngine(P).build(tag_directions(edges_from_arrays(e)))
    out = eng.run("hits", {"rounds": rounds})
    df = out["result"].to_pandas().sort_values("v")
    eng.shutdown()
    return df


@pytest.mark.parametrize("P", [1, 4])
def test_hits_matches_numpy(P):
    e = _rand_edges(7, 60, 300)
    nv = 60
    present = np.unique(e)
    auth, hub = np_hits(nv, e, rounds=5)
    df = _run_hits(e, P, rounds=5)
    assert np.array_equal(df["v"].to_numpy(), present)
    np.testing.assert_allclose(df["auth"].to_numpy(), auth[present],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(df["hub"].to_numpy(), hub[present],
                               rtol=0, atol=1e-12)


def test_hits_partition_invariance():
    e = _rand_edges(11, 40, 200)
    a = _run_hits(e, 1, rounds=4)
    b = _run_hits(e, 5, rounds=4)
    np.testing.assert_allclose(a["auth"].to_numpy(), b["auth"].to_numpy(),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(a["hub"].to_numpy(), b["hub"].to_numpy(),
                               rtol=0, atol=1e-12)


def test_hits_star():
    # all spokes point at the center: center is the sole authority,
    # every spoke an equal hub
    e = np.array([[i, 0] for i in range(1, 6)])
    df = _run_hits(e, 2, rounds=3)
    byv = df.set_index("v")
    assert byv.loc[0, "auth"] == pytest.approx(1.0)
    assert byv.loc[0, "hub"] == pytest.approx(0.0)
    for i in range(1, 6):
        assert byv.loc[i, "hub"] == pytest.approx(0.2)
        assert byv.loc[i, "auth"] == pytest.approx(0.0)


def test_hits_rejects_untagged_graph():
    e = _rand_edges(3, 10, 30)
    eng = BspEngine(2).build(edges_from_arrays(e))
    with pytest.raises(Exception, match="tag_directions"):
        eng.run("hits", {"rounds": 2})
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 3])
def test_ppr_matches_numpy(P):
    e = _rand_edges(19, 50, 260)
    nv = 50
    present = np.unique(e)
    seeds = [int(present[0]), int(present[3]), int(present[7])]
    ref = np_ppr(nv, e, seeds, rounds=4)
    eng = BspEngine(P).build(edges_from_arrays(e))
    out = eng.run("ppr", {"seeds": tuple(seeds), "rounds": 4})
    df = out["result"].to_pandas().sort_values("v")
    eng.shutdown()
    assert np.array_equal(df["v"].to_numpy(), present)
    np.testing.assert_allclose(df["rank"].to_numpy(), ref[present],
                               rtol=0, atol=1e-12)


def test_ppr_unreachable_stays_zero():
    # two components; seed only in the first -> second stays all-zero
    e = np.array([[0, 1], [1, 0], [5, 6], [6, 5]])
    eng = BspEngine(2).build(edges_from_arrays(e))
    out = eng.run("ppr", {"seeds": (0,), "rounds": 6})
    df = out["result"].to_pandas().set_index("v")
    eng.shutdown()
    assert df.loc[5, "rank"] == 0.0
    assert df.loc[6, "rank"] == 0.0
    assert df.loc[0, "rank"] > 0.0


def test_ppr_duplicate_seeds_accumulate():
    # a seed listed twice carries 2/|S| teleport mass — total mass
    # stays 1 for any in-graph seed multiset
    e = np.array([[0, 1], [1, 0], [1, 2], [2, 1]])
    eng = BspEngine(2).build(edges_from_arrays(e))
    out = eng.run("ppr", {"seeds": (0, 0, 2), "mode": "converge",
                          "tol": 1e-13})
    df = out["result"].to_pandas()
    eng.shutdown()
    assert df["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_ppr_missing_seed_mass_dropped():
    # seed 99 is not in the graph: |S| still 2, so total mass < 1
    e = np.array([[0, 1], [1, 0]])
    eng = BspEngine(1).build(edges_from_arrays(e))
    out = eng.run("ppr", {"seeds": (0, 99), "mode": "converge",
                          "tol": 1e-12})
    df = out["result"].to_pandas()
    eng.shutdown()
    assert 0 < df["rank"].sum() < 1.0


def np_weighted_pr(nv: int, e: np.ndarray, w: np.ndarray, rounds: int,
                   d: float = 0.85, n_universe: int | None = None):
    src, dst = e[:, 0], e[:, 1]
    wdeg = np.zeros(nv)
    np.add.at(wdeg, src, w)
    n = n_universe if n_universe is not None else nv
    rank = np.full(nv, 1.0 / n)
    for _ in range(rounds):
        contrib = np.zeros(nv)
        nz = wdeg > 0
        contrib[nz] = rank[nz] / wdeg[nz]
        mail = np.zeros(nv)
        np.add.at(mail, dst, contrib[src] * w)
        rank = (1 - d) / n + d * mail
    return rank


@pytest.mark.parametrize("P", [1, 4])
def test_weighted_pagerank_matches_numpy(P):
    e = _rand_edges(31, 40, 220)
    rng = np.random.default_rng(5)
    w = rng.random(len(e)) + 0.1
    present = np.unique(e)
    ref = np_weighted_pr(40, e, w, rounds=4, n_universe=len(present))
    eng = BspEngine(P).build(edges_from_arrays(e, weights=w))
    out = eng.run("pagerank_weighted", {"mode": "rounds", "rounds": 4})
    df = out["result"].to_pandas().sort_values("v")
    eng.shutdown()
    assert np.array_equal(df["v"].to_numpy(), present)
    np.testing.assert_allclose(df["rank"].to_numpy(), ref[present],
                               rtol=0, atol=1e-12)


def test_weighted_pagerank_rejects_unweighted():
    e = _rand_edges(3, 10, 30)
    eng = BspEngine(2).build(edges_from_arrays(e))
    with pytest.raises(Exception, match="weighted"):
        eng.run("pagerank_weighted", {"rounds": 2})
    eng.shutdown()


def test_hits_resume_identical(tmp_path):
    """Resume must reproduce the uninterrupted run bitwise — exercises
    the engine's prev_agg manifest re-seed (a resumed global-hook
    compute needs the interrupted superstep's global sums)."""
    ckpt = str(tmp_path / "ckpt")
    e = _rand_edges(23, 30, 150)

    eng = BspEngine(3).build(tag_directions(edges_from_arrays(e)))
    full = eng.run("hits", {"rounds": 4})
    ref = full["result"].to_pandas().sort_values("v")
    eng.shutdown()

    eng = BspEngine(3).build(tag_directions(edges_from_arrays(e)))
    partial = eng.run("hits", {"rounds": 4}, checkpoint_dir=ckpt,
                      checkpoint_every=1, max_supersteps=3)
    assert not partial["converged"]
    eng.shutdown()

    eng = BspEngine(3).build(tag_directions(edges_from_arrays(e)))
    resumed = eng.run("hits", {"rounds": 4}, checkpoint_dir=ckpt,
                      checkpoint_every=1, resume=True)
    got = resumed["result"].to_pandas().sort_values("v")
    eng.shutdown()
    assert resumed["resumed_from"] == 3
    assert resumed["converged"]
    assert np.array_equal(got["auth"].to_numpy(), ref["auth"].to_numpy())
    assert np.array_equal(got["hub"].to_numpy(), ref["hub"].to_numpy())
