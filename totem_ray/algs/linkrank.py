"""Link-analysis wrappers beyond the reference kernel set: HITS,
personalized PageRank, edge-weighted PageRank (user-facing, same
shape as algs.pagerank). Semantics notes live on the kernels
(engine/kernels.py HitsKernel / PersonalizedPageRankKernel /
WeightedPageRankKernel)."""

from __future__ import annotations

from totem_ray.engine.bsp import BspEngine


def hits(edges, num_partitions: int = 4, partitioner=None,
         rounds: int = 5, engine: BspEngine | None = None,
         tagged: bool = False,
         checkpoint_dir: str | None = None,
         checkpoint_every: int = 0, resume: bool = False) -> dict:
    """HITS hubs/authorities. ``edges`` is a plain directed edge
    table — the direction-tagged double cover the kernel needs is
    built here (pass ``tagged=True`` if it already is). Returns
    {result: Dataset(v, auth, hub), iterations, ...}."""
    if engine is None:
        from totem_ray.graph.edges import tag_directions

        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges if tagged else tag_directions(edges))
    out = engine.run("hits", {"rounds": rounds},
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def personalized_pagerank(edges, seeds, num_partitions: int = 4,
                          partitioner=None, mode: str = "converge",
                          damping: float = 0.85, rounds: int = 4,
                          tol: float = 1e-6, max_supersteps: int = 200,
                          engine: BspEngine | None = None,
                          checkpoint_dir: str | None = None,
                          checkpoint_every: int = 0,
                          resume: bool = False) -> dict:
    """Random-walk-with-restart from ``seeds``. Returns
    {result: Dataset(v, rank), iterations, ...}."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges)
    params = {"seeds": tuple(int(s) for s in seeds), "damping": damping,
              "mode": mode, "rounds": rounds, "tol": tol}
    out = engine.run("ppr", params,
                     max_supersteps=rounds if mode == "rounds"
                     else max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def pagerank_weighted(edges, num_partitions: int = 4, partitioner=None,
                      mode: str = "converge", damping: float = 0.85,
                      rounds: int = 4, tol: float = 1e-6,
                      max_supersteps: int = 200,
                      engine: BspEngine | None = None,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 0,
                      resume: bool = False) -> dict:
    """Edge-weighted PageRank over a weighted edge table
    (src, dst, weight). Returns {result: Dataset(v, rank), ...}."""
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges)
    params = {"damping": damping, "mode": mode, "rounds": rounds,
              "tol": tol}
    out = engine.run("pagerank_weighted", params,
                     max_supersteps=rounds if mode == "rounds"
                     else max_supersteps,
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    return out


def hyperball(edges, num_partitions: int = 4, partitioner=None,
              p: int = 6, radius: int | None = 2,
              engine: BspEngine | None = None,
              checkpoint_dir: str | None = None,
              checkpoint_every: int = 0, resume: bool = False) -> dict:
    """HyperBall neighborhood sketches (HyperBallKernel): after
    ``radius`` supersteps, vertex v's registers sketch its radius-hop
    in-ball (= out-ball on symmetric graphs). ``radius=None`` iterates
    to the transitive-closure fixpoint. Returns {result:
    Dataset(v, bucket, rho), iterations, ...}; feed the result to
    hyperball_estimates for per-vertex ball sizes."""
    if radius is not None and radius < 1:
        raise ValueError("hyperball radius must be >= 1 (radius 0 is "
                         "just the seed registers) or None for the "
                         "fixpoint")
    if engine is None:
        engine = BspEngine(num_partitions, partitioner)
        engine.build(edges)
    out = engine.run("hyperball", {"p": p, "rounds": radius},
                     checkpoint_dir=checkpoint_dir,
                     checkpoint_every=checkpoint_every, resume=resume)
    out["engine"] = engine
    out["p"] = p

    # persist p IN the register table (constant column) so
    # hyperball_estimates can verify it instead of trusting the
    # caller — a wrong p silently skews every estimate via the wrong
    # m in the alpha_m / linear-counting math, in BOTH directions
    # (registers built with a larger p overflow the bucket range;
    # with a smaller p they underfill it undetectably). int8 (p is
    # always < 30): 1 B/row, ~4% of the 24 B register row, vs the
    # 33% an int64 column would add to every downstream shuffle
    def addp(t):
        import numpy as np
        import pyarrow as pa
        return t.append_column(
            "p", pa.array(np.full(t.num_rows, p, dtype=np.int8)))

    out["result"] = out["result"].map_batches(addp,
                                              batch_format="pyarrow")
    return out


def hyperball_estimates(registers, p: int | None = None):
    """Dataset (v, ball_size) — HLL cardinality estimate per vertex
    from a (v, bucket, rho) register table. Two vectorized aggregates
    (sum of 2^-rho and register count per vertex), then the standard
    alpha_m correction with linear counting for the small range — no
    per-vertex Python.

    Register tables written by :func:`hyperball` carry their own ``p``
    column; with ``p=None`` (default) it is read from the table, and
    an explicitly-passed ``p`` is verified against it (a wrong m
    silently skews EVERY estimate, in both directions). For a legacy
    table without the column, ``p`` must be passed and only the
    too-large direction (bucket >= 2^p) is detectable."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from totem_ray.functions.sketch import hll_alpha

    sch = registers.schema()
    has_p = sch is not None and "p" in sch.names
    if p is None:
        if not has_p:
            raise ValueError(
                "register table has no 'p' column (built before p was "
                "persisted?) — pass the run's own p explicitly "
                "(hyperball(...)['p'])")
        first = registers.limit(1).to_pandas()
        if not len(first):
            raise ValueError("empty register table: cannot infer p")
        p = int(first["p"].iloc[0])
    m = 1 << p
    alpha = hll_alpha(m)

    def powcol(t: pa.Table) -> pa.Table:
        if "p" in t.column_names:
            tp = np.asarray(t["p"])
            if len(tp) and ((tp.min() != p) or (tp.max() != p)):
                raise ValueError(
                    f"register table carries p={int(tp[0])} but "
                    f"p={p} was passed to hyperball_estimates — use "
                    "the run's own p (hyperball(...)['p']) or omit p")
        b = np.asarray(t["bucket"])
        if len(b) and int(b.max()) >= m:
            raise ValueError(
                f"register bucket {int(b.max())} >= 2^p={m}: these "
                f"registers were built with a larger p than the "
                f"p={p} passed to hyperball_estimates — pass the "
                "run's own p (hyperball(...)['p'])")
        rho = np.asarray(t["rho"], dtype=np.float64)
        return pa.table({"v": t["v"],
                         "pw": pa.array(np.exp2(-rho))})

    agg = registers.map_batches(powcol, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("pw", alias_name="s"),
                                Count(alias_name="nnz"))

    def estimate(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"], dtype=np.float64)
        nnz = np.asarray(t["nnz"], dtype=np.float64)
        zeros = m - nnz
        e = alpha * m * m / (s + zeros)  # empty registers add 2^0
        lc = m * np.log(np.maximum(m / np.maximum(zeros, 1e-12), 1.0))
        e = np.where((e <= 2.5 * m) & (zeros > 0), lc, e)
        return pa.table({"v": t["v"],
                         "ball_size": pa.array(e, type=pa.float64())})

    return agg.map_batches(estimate, batch_format="pyarrow")


def neighborhood_function(edges, num_partitions: int = 4,
                          partitioner=None, p: int = 10,
                          max_radius: int | None = None) -> dict:
    """HyperANF-style neighborhood function (Boldi-Vigna): N(t) =
    estimated number of (u, v) pairs with a path u -> v of length
    <= t, for t = 0..T. One HyperBall run supplies every N(t) — each
    superstep's global ball-size sum rides the engine's reduced stats
    (zero extra passes). Returns {"nf": [N(0), N(1), ...],
    "radius": T, "num_vertices": V, "engine": ...}."""
    out = hyperball(edges, num_partitions=num_partitions,
                    partitioner=partitioner, p=p, radius=max_radius)
    v = out["engine"].total_vertices
    nf = [float(v)]  # N(0): every ball is exactly {v}
    nf.extend(m["ball_sum"] for m in out["metrics"])
    # past the fixpoint the sums repeat; trim trailing duplicates so
    # radius reflects when growth actually stopped
    while len(nf) > 1 and nf[-1] == nf[-2]:
        nf.pop()
    return {"nf": nf, "radius": len(nf) - 1, "num_vertices": v,
            "engine": out["engine"], "iterations": out["iterations"]}


def effective_diameter(edges, num_partitions: int = 4, partitioner=None,
                       p: int = 10, quantile: float = 0.9,
                       max_radius: int | None = None) -> dict:
    """Effective diameter: the (interpolated) smallest t such that
    N(t) >= quantile * N(T), with N the neighborhood function at its
    fixpoint — the standard HyperANF summary statistic for web-graph
    distance distributions."""
    res = neighborhood_function(edges, num_partitions=num_partitions,
                                partitioner=partitioner, p=p,
                                max_radius=max_radius)
    res["engine"].shutdown()
    nf = res["nf"]
    target = quantile * nf[-1]
    d = 0.0
    for t, n in enumerate(nf):
        if n >= target:
            if t == 0 or nf[t] == nf[t - 1]:
                d = float(t)
            else:  # linear interpolation between t-1 and t
                d = (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
            break
    return {"effective_diameter": d, "nf": nf, "radius": res["radius"],
            "num_vertices": res["num_vertices"]}
