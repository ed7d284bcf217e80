"""k-truss (per-edge triangle-support peel) over the edge-table IR.

Beyond the reference's kernel set (its triangle machinery stops at
per-vertex counts, src/alg/totem_clustering.cu:368-431) — k-truss is
the standard cohesion operator on web link graphs: the maximal
subgraph in which every edge closes at least k-2 triangles.

Ray-Data-first design: each peel round recomputes per-edge supports
with the triangles module's one-shuffle wedge pipeline
(algs/triangles.py edge_supports — same broadcast/distributed closing
plans) and drops edges below the threshold; the edge set shrinks
monotonically, so round cost decays. No shared mutable state — each
round is a pure Dataset -> Dataset transform, materialized once to
cut the lineage.

``rounds=N`` runs exactly N peel rounds (bounded-round semantics, the
SQL-oracle form — once the peel reaches its fixpoint further rounds
are no-ops on both sides); ``rounds=None`` peels to the fixpoint,
detected by the per-round edge count the loop needs anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from totem_ray.algs.triangles import edge_supports
from totem_ray.graph.edges import dedup_edges, drop_self_loops


def _canonicalize(edges):
    """(src, dst) -> undirected-canonical (src=min, dst=max), distinct,
    self loops dropped."""
    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        return pa.table({"src": pa.array(np.minimum(s, d), type=pa.int64()),
                         "dst": pa.array(np.maximum(s, d), type=pa.int64())})

    return dedup_edges(drop_self_loops(
        edges.map_batches(canon, batch_format="pyarrow")))


def ktruss(edges, k: int, rounds: int | None = None,
           num_buckets: int = 64, num_join_partitions: int = 32,
           max_rounds: int = 10_000):
    """Dataset (src, dst) — the canonical (src < dst) edge set of the
    k-truss of the simple undirected graph of ``edges``.

    k >= 3: every surviving edge participates in >= k-2 triangles
    within the surviving subgraph. Support recomputation is exact
    integer counting, so the peel is deterministic."""
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3 "
                         "(k=2 is the whole simple graph)")
    thresh = k - 2
    cur = _canonicalize(edges).materialize()
    n_cur = cur.count()
    total = rounds if rounds is not None else max_rounds
    converged = rounds is not None  # bounded-round mode has no fixpoint claim
    for _ in range(total):
        if n_cur == 0:
            converged = True
            break
        sup = edge_supports(cur, num_buckets=num_buckets,
                            num_join_partitions=num_join_partitions)
        # edges in no triangle are absent from sup -> dropped, which
        # is exactly the thresh >= 1 rule that k >= 3 guarantees
        nxt = sup.filter(expr=f"support >= {thresh}") \
                 .select_columns(["lo", "hi"])

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["lo"], "dst": t["hi"]})

        nxt = nxt.map_batches(rename, batch_format="pyarrow").materialize()
        n_new = nxt.count()
        if rounds is None and n_new == n_cur:
            converged = True
            break
        cur, n_cur = nxt, n_new
    if n_cur == 0:  # an empty edge set is definitionally the fixpoint
        converged = True
    if not converged:
        # never return an intermediate peel as if it were the truss
        raise RuntimeError(
            f"ktruss(k={k}) did not reach its fixpoint within "
            f"max_rounds={max_rounds} peel rounds ({n_cur} edges "
            "remain) — raise max_rounds or use bounded-round "
            "semantics (rounds=N)")
    if n_cur == 0:
        # an empty Dataset loses its schema through map_batches —
        # return a typed empty table so downstream selects still work
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64())}))
    return cur
