"""Partitioning strategies — the shuffle-key choice.

Mirrors the reference's partitioning plugin surface (PARTITION_FUNC,
src/totem/totem_partition.h:216-221) with two strategies:

* ``HashPartitioner`` — stateless hash of the vertex id, replacing
  Totem's seeded-random labels (partition_random,
  totem_partition.cu:179-252). Pure function of the id: every task
  computes the owner with no lookup state.
* ``DegreePartitioner`` — degree-aware placement, the Ray analog of
  Totem's alpha edge-share walk over the degree-sorted vertex list
  (partition_by_asc/dsc_sorted_degree, totem_partition.cu:264-397):
  the vertices covering an ``alpha`` share of edges (the hubs, for
  descending order) are pinned to partition 0 — Totem's "big CPU
  partition" — and the long tail is hash-split across the rest. Only
  the hub id set is broadcast (small by power-law construction).

Unlike the reference we are not limited to 4 partitions (2-bit pid,
totem_partition.h:22-29); pid is a full int64 column.
"""

from __future__ import annotations

import numpy as np

from totem_ray.hashing import hash_partition


class HashPartitioner:
    kind = "hash"

    def __init__(self, num_partitions: int, salt: int = 0):
        self.num_partitions = int(num_partitions)
        self.salt = salt

    def pid_np(self, ids: np.ndarray) -> np.ndarray:
        return hash_partition(ids, self.num_partitions, self.salt)

    def describe(self):
        return {"kind": self.kind, "num_partitions": self.num_partitions,
                "salt": self.salt}


class DegreePartitioner:
    kind = "degree"

    def __init__(self, num_partitions: int, hub_ids: np.ndarray,
                 descending: bool = True, salt: int = 0):
        self.num_partitions = int(num_partitions)
        self.hub_ids = np.sort(np.asarray(hub_ids).astype(np.int64, copy=False))
        self.descending = descending
        self.salt = salt

    @classmethod
    def from_degrees(cls, degree_ds, num_partitions: int, alpha: float = 0.2,
                     descending: bool = True, max_hubs: int = 1_000_000,
                     salt: int = 0):
        """Build from a (v, degree) Dataset: walk the degree-ordered
        vertex list until the cumulative degree reaches ``alpha`` of
        total edges (totem_partition.cu:322-339's edge-budget walk),
        capped at ``max_hubs``.

        The walk only ever needs the extreme-degree prefix, so there
        is NO global sort (``ds.sort`` is an all-to-all range
        exchange): each block contributes its own top-``max_hubs``
        rows by (degree, v) — a valid partial, since every vertex of
        the global prefix is inside its block's prefix — then one
        single-block reduce pass shrinks what the driver sees to
        <= max_hubs rows (the _seed_centroids idiom,
        functions/similarity.py). Ties at the boundary degree break by
        ascending vertex id, making the hub set a deterministic
        function of the data (the sort-based walk inherited whatever
        tie order the distributed sort produced)."""
        import pyarrow as pa

        total = degree_ds.sum("degree")
        budget = alpha * float(total or 0)
        sign = -1 if descending else 1

        def partial(t: pa.Table) -> pa.Table:
            t = t.select(["v", "degree"])
            if t.num_rows <= max_hubs:
                return t
            v = np.asarray(t["v"])
            d = np.asarray(t["degree"])
            order = np.lexsort((v, sign * d))[:max_hubs]
            return t.take(pa.array(np.sort(order)))

        parts = degree_ds.map_batches(partial, batch_format="pyarrow") \
            .repartition(1) \
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None) \
            .to_pandas()
        if not len(parts):
            return cls(num_partitions, np.empty(0, dtype=np.int64),
                       descending=descending, salt=salt)
        v = parts["v"].to_numpy()
        d = parts["degree"].to_numpy()
        order = np.lexsort((v, sign * d))
        v, d = v[order], d[order].astype(np.float64)
        take = int(np.searchsorted(np.cumsum(d), budget, side="left")) + 1
        take = min(take, len(v), max_hubs)
        return cls(num_partitions, v[:take], descending=descending,
                   salt=salt)

    def pid_np(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids).astype(np.int64, copy=False)
        if self.num_partitions == 1:
            return np.zeros(len(ids), dtype=np.int64)
        from totem_ray.nputil import in_sorted
        is_hub = in_sorted(self.hub_ids, ids)
        rest = hash_partition(ids, self.num_partitions - 1, self.salt) + 1
        return np.where(is_hub, 0, rest).astype(np.int64)

    def describe(self):
        return {"kind": self.kind, "num_partitions": self.num_partitions,
                "num_hubs": int(len(self.hub_ids)),
                "descending": self.descending, "salt": self.salt}


def partition_stats(edges, partitioner) -> dict:
    """Cut quality + load balance: fraction of remote (cross-partition)
    edges — Totem's rmt_edge metric (print_header,
    src/benchmark/totem_benchmark_print.cu:71-82) — and per-shard
    out-edge counts (edges live with their src owner in the BSP
    engine), whose max/mean ratio is the power-law skew a partitioner
    must tame: the busiest shard bounds every superstep."""
    import pyarrow as pa

    P = partitioner.num_partitions

    def fn(t: pa.Table) -> pa.Table:
        s = partitioner.pid_np(np.asarray(t["src"]))
        d = partitioner.pid_np(np.asarray(t["dst"]))
        return pa.table({
            "_pid": pa.array(np.arange(P, dtype=np.int64)),
            "_n": pa.array(np.bincount(s, minlength=P).astype(np.int64)),
            "_rmt": pa.array(np.bincount(s[s != d], minlength=P)
                             .astype(np.int64)),
        })

    # each batch already reduces to exactly P rows — stream the tiny
    # partials to the driver and sum there (no groupby shuffle; also
    # avoids Ray's aggregate emitting empty-schema blocks, the
    # "_pid/n/rmt vs <empty>" warning recorded in BENCH_r04)
    counts = np.zeros(P, dtype=np.int64)
    rmts = np.zeros(P, dtype=np.int64)
    for blk in edges.map_batches(fn, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if blk.num_rows == 0:
            continue
        pid = np.asarray(blk["_pid"])
        np.add.at(counts, pid, np.asarray(blk["_n"]))
        np.add.at(rmts, pid, np.asarray(blk["_rmt"]))
    rmt = int(rmts.sum())
    tot = int(counts.sum())
    mean = tot / P if P else 0.0
    return {"remote_edges": rmt, "total_edges": tot,
            "rmt_edge_frac": rmt / tot if tot else 0.0,
            "max_shard_edges": int(counts.max()) if P else 0,
            "load_imbalance": float(counts.max() / mean) if tot else 0.0,
            **partitioner.describe()}
