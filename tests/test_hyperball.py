"""HyperBall kernel tests: register parity with a dense numpy
transcription, fixpoint = transitive closure, estimate sanity, and
partition invariance."""

import numpy as np
import pytest

from totem_ray.algs import hyperball, hyperball_estimates
from totem_ray.engine.kernels import HyperBallKernel
from totem_ray.graph.edges import edges_from_arrays


def _rand_edges(seed: int, nv: int, ne: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, nv, ne)
    dst = rng.integers(0, nv, ne)
    m = src != dst
    return np.unique(np.stack([src[m], dst[m]], axis=1), axis=0)


def np_hyperball(verts: np.ndarray, e: np.ndarray, p: int,
                 rounds: int) -> np.ndarray:
    """Dense reference: seed with the kernel's own seeder, then
    per round reg(v) = max(reg(v), reg(u) for u -> v)."""
    idx = {int(v): i for i, v in enumerate(verts)}
    reg = HyperBallKernel._seed_registers(verts, p)
    for _ in range(rounds):
        new = reg.copy()
        for u, v in e:
            iu, iv = idx[int(u)], idx[int(v)]
            new[iv] = np.maximum(new[iv], reg[iu])
        reg = new
    return reg


def _to_dense(df, verts, p):
    idx = {int(v): i for i, v in enumerate(verts)}
    reg = np.zeros((len(verts), 1 << p), dtype=np.uint8)
    for r in df.itertuples():
        reg[idx[int(r.v)], int(r.bucket)] = r.rho
    return reg


@pytest.mark.parametrize("P", [1, 4])
def test_hyperball_registers_match_numpy(P):
    e = _rand_edges(13, 40, 200)
    verts = np.unique(e)
    out = hyperball(edges_from_arrays(e), num_partitions=P, p=6, radius=2)
    df = out["result"].to_pandas()
    out["engine"].shutdown()
    assert np.array_equal(_to_dense(df, verts, 6),
                          np_hyperball(verts, e, 6, 2))


def test_hyperball_fixpoint_is_transitive_closure():
    # directed path 0 -> 1 -> 2 -> 3: at the fixpoint, v's registers
    # are the HLL union of seeds of all ancestors (incl. itself)
    e = np.array([[0, 1], [1, 2], [2, 3]])
    out = hyperball(edges_from_arrays(e), num_partitions=2, p=6,
                    radius=None)
    df = out["result"].to_pandas()
    out["engine"].shutdown()
    verts = np.unique(e)
    seeds = HyperBallKernel._seed_registers(verts, 6)
    exp = np.zeros_like(seeds)
    for i in range(4):  # ancestors of vertex i are 0..i
        exp[i] = seeds[: i + 1].max(axis=0)
    assert np.array_equal(_to_dense(df, verts, 6), exp)


def test_hyperball_estimates_accuracy():
    # a hub pointed at by 300 spokes: its in-ball at r=1 is ~301,
    # a spoke's stays 1. p=10 -> ~3% relative error band, allow 15%.
    spokes = np.arange(1, 301)
    e = np.stack([spokes, np.zeros_like(spokes)], axis=1)
    out = hyperball(edges_from_arrays(e), num_partitions=2, p=10,
                    radius=1)
    est = hyperball_estimates(out["result"], p=10).to_pandas() \
        .set_index("v")
    out["engine"].shutdown()
    assert abs(est.loc[0, "ball_size"] - 301) / 301 < 0.15
    assert abs(est.loc[5, "ball_size"] - 1.0) < 0.3


def test_hyperball_rejects_huge_p():
    e = _rand_edges(3, 10, 30)
    out = None
    with pytest.raises(Exception, match="p must be"):
        out = hyperball(edges_from_arrays(e), num_partitions=1, p=20)
    if out is not None:  # pragma: no cover
        out["engine"].shutdown()


def test_neighborhood_function_path():
    """Directed path 0->1->...->5: exact N(t) = sum_v min(t, depth(v))
    + V; with p=12 the tiny-set linear-counting estimates are within
    a few percent."""
    from totem_ray.algs import neighborhood_function

    n = 6
    e = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    res = neighborhood_function(edges_from_arrays(e), num_partitions=2,
                                p=12)
    res["engine"].shutdown()
    # exact pair counts: vertex i's in-ball at radius t has min(i,t)+1
    exact = [sum(min(i, t) + 1 for i in range(n)) for t in range(n)]
    assert res["radius"] == n - 1  # growth stops exactly at the path length
    got = res["nf"]
    assert len(got) == n
    for g, x in zip(got, exact):
        assert abs(g - x) / x < 0.05


def test_effective_diameter_star_and_path():
    from totem_ray.algs import effective_diameter

    # symmetric star: every pair within 2 hops, most within... the
    # 0.9-quantile lands between 1 and 2
    spokes = np.arange(1, 30)
    e = np.concatenate([np.stack([spokes, np.zeros_like(spokes)], 1),
                        np.stack([np.zeros_like(spokes), spokes], 1)])
    d = effective_diameter(edges_from_arrays(e), num_partitions=2, p=12)
    assert 1.0 <= d["effective_diameter"] <= 2.0

    # directed path of length 9: diameter grows with the path
    n = 10
    ep = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    dp = effective_diameter(edges_from_arrays(ep), num_partitions=2,
                            p=12)
    assert dp["radius"] == n - 1
    assert 6.0 <= dp["effective_diameter"] <= 9.0


def test_hyperball_estimates_rejects_mismatched_p():
    """A register table built with a larger p than the estimator's p
    must fail loudly, not skew estimates (the table carries no p)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from totem_ray.algs.linkrank import hyperball_estimates

    regs = ray.data.from_pandas(pd.DataFrame({
        "v": np.zeros(70, dtype=np.int64),
        "bucket": np.arange(70, dtype=np.int64),   # needs p >= 7
        "rho": np.ones(70, dtype=np.int64)}))
    with pytest.raises(Exception, match="larger p"):
        hyperball_estimates(regs, p=6).to_pandas()


def test_hyperball_estimates_infers_and_verifies_p():
    """The register table carries its own p: p=None reads it, and a
    WRONG explicit p (smaller or larger) raises instead of silently
    skewing every estimate through the wrong m (ADVICE r4: the old
    guard only caught the too-large direction)."""
    spokes = np.arange(1, 51)
    e = np.stack([spokes, np.zeros_like(spokes)], axis=1)
    out = hyperball(edges_from_arrays(e), num_partitions=2, p=8,
                    radius=1)
    try:
        inferred = hyperball_estimates(out["result"]).to_pandas() \
            .set_index("v")
        explicit = hyperball_estimates(out["result"], p=8).to_pandas() \
            .set_index("v")
        assert np.allclose(inferred["ball_size"], explicit["ball_size"])
        # smaller p than the registers were built with: previously
        # passed silently whenever max bucket < 2^p
        with pytest.raises(Exception, match="carries p=8"):
            hyperball_estimates(out["result"], p=10).to_pandas()
        with pytest.raises(Exception, match="carries p=8"):
            hyperball_estimates(out["result"], p=4).to_pandas()
    finally:
        out["engine"].shutdown()
