"""GraphShard — the stateful partition actor.

One shard owns one graph partition, playing the role of Totem's
``partition_t`` (src/totem/totem_partition.h:72-122): a local CSR over
the partition's vertices plus the message plumbing Totem calls Grooves
(src/totem/totem_grooves.h:39-50). Concretely:

* ``verts``            — sorted global ids owned by this shard
  (ownership = partitioner.pid_np(id); replaces Totem's dense
  renumbering + ``id_in_partition`` map, totem_partition.cu:476-490 —
  local index = ``searchsorted(verts, id)``).
* per-target edge groups — for every target partition t, the edges
  whose dst is owned by t, sorted by destination index with reduceat
  segment boundaries: the vectorized equivalent of Totem's
  per-remote-partition outbox tables with contiguously renumbered
  remote neighbors (init_get_rmt_nbrs,
  totem_grooves_internal.cc:111-150). Message payloads are DENSE
  arrays aligned to the sorted ghost-id list, so a superstep ships
  one float per (shard, remote-vertex) pair — the pre-aggregation
  that tames power-law fan-in (SURVEY.md §7.0).
* ``inbox_maps[p]``    — local indices of the vertices shard p
  references, aligned to p's ghost list (the scatter side of
  engine_scatter_inbox_*, totem_engine_internal.cuh:116-183).
* src-major adjacency  — (owner, idx) per edge for pull-style kernels
  (label propagation), mirroring GROOVES_PULL
  (totem_page_rank_incoming_hybrid.cu:244-294).

The actor builds all of this ONCE (engine reuse across algorithms is
an explicit reference design goal, totem_engine.cuh:6-10) and then
runs any registered kernel's supersteps over it.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import ray

from totem_ray.engine.kernels import KERNELS
from totem_ray.nputil import unique_concat, unique_counts


def _content_fp(src, dst, w, vert_chunks) -> int:
    """Order-independent multiset fingerprint of this shard's slice of
    the graph (wrap-around uint64 sum of per-edge / per-vertex
    splitmix64 hashes). Each edge and each explicitly-routed vertex
    lands on exactly one shard, so the SUM across shards is a
    partition-count-independent content hash of the whole graph —
    lineage identity for checkpoints (two graphs with equal |V|,|E|
    but different edges/weights must not share a lineage)."""
    from totem_ray.hashing import as_u64, splitmix64

    # accumulate in Python ints mod 2^64: numpy uint64 SCALAR adds
    # raise RuntimeWarning on (intended) wraparound; values identical
    fp = 0
    if len(src):
        h = splitmix64(splitmix64(as_u64(src)) ^ as_u64(dst))
        if w is not None:
            h = splitmix64(h ^ np.asarray(w, dtype=np.float64)
                           .view(np.uint64))
        fp = (fp + int(h.sum(dtype=np.uint64))) & 0xFFFFFFFFFFFFFFFF
    if vert_chunks:
        # dedupe across chunks: a vertex id repeated across input
        # blocks may reach this shard in separate chunks (the split
        # tasks dedupe only within their ~2P-block group), and hashing
        # it twice would make the fp depend on block layout / P
        vu = unique_concat([np.asarray(v, dtype=np.int64)
                            for v in vert_chunks])
        fp = (fp + int(splitmix64(as_u64(vu)).sum(dtype=np.uint64))) \
            & 0xFFFFFFFFFFFFFFFF
    return fp


class GraphShard:
    def __init__(self, pid: int, num_partitions: int, group_size: int = 8):
        self.pid = pid
        self.P = num_partitions
        # destination groups: outboxes for one group ship as ONE
        # object-store bundle (the per-remote-NODE grooves table — at
        # multi-node scale a group = the shards co-located on one
        # node, so a bundle is exactly the bytes that node receives;
        # locally it cuts ray.put round-trips from P-1 to P/group)
        self.group_size = max(1, int(group_size))
        self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._vert_chunks: list[np.ndarray] = []
        self.state: dict[str, dict[str, Any]] = {}

    # ------------------------------------------------------------------
    # build phase
    # ------------------------------------------------------------------
    def ingest_edges(self, src: np.ndarray, dst: np.ndarray,
                     w: np.ndarray | None = None) -> int:
        """Direct ingest of one edge chunk (tests / small inputs)."""
        self._edge_chunks.append((np.asarray(src, dtype=np.int64),
                                  np.asarray(dst, dtype=np.int64),
                                  None if w is None else
                                  np.asarray(w, dtype=np.float64)))
        return len(src)

    @staticmethod
    def _np(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(col)

    @staticmethod
    def _as_table(blk) -> pa.Table:
        """to_arrow_refs() hands back the raw block, which is a pandas
        DataFrame when the upstream operator was a pandas-block
        producer (e.g. Ray's aggregate reduce) — normalize here."""
        if isinstance(blk, pa.Table):
            return blk
        import pandas as pd

        if isinstance(blk, pd.DataFrame):
            return pa.Table.from_pandas(blk, preserve_index=False)
        return pa.table(blk)

    def ingest_edge_blocks(self, refs: list) -> int:
        """Pull-based bulk ingest: the driver hands every shard the
        SAME list of refs to the MATERIALIZED routed blocks (each row
        tagged with its destination shard in ``_pid``); the shard
        reads each block zero-copy from plasma and keeps its rows.
        Materialization upstream runs each routing task's output into
        the dataset exactly once, so re-delivery cannot happen —
        idempotent by construction, with no per-chunk bookkeeping."""
        n = 0
        for r in refs:
            t = self._as_table(ray.get(r))
            # empty inputs can surface untagged empty blocks (the map
            # never ran) — nothing to ingest either way
            if t.num_rows == 0 or "_pid" not in t.column_names:
                continue
            m = self._np(t["_pid"]) == self.pid
            if not m.any():
                continue
            # boolean indexing copies into the actor heap, so the
            # plasma block is not pinned past this loop iteration
            src = self._np(t["src"])[m]
            dst = self._np(t["dst"])[m]
            w = self._np(t["weight"])[m].astype(np.float64) \
                if "weight" in t.column_names else None
            self._edge_chunks.append((src.astype(np.int64),
                                      dst.astype(np.int64), w))
            n += len(src)
        return n

    def ingest_edge_parts(self, refs: list) -> int:
        """Shard-selective ingest: each ref is THIS shard's pre-split
        sub-part of one routed block (a dict of numpy columns from
        bsp._split_edge_block, or an Arrow table from older callers;
        None when the block had no rows for this shard). The shard
        fetches only its 1/P share. One batched get (sequential gets
        would serialize on RPC latency).

        Chunks are kept as ZERO-COPY plasma views: prepare()'s
        consolidation pass concatenates them into the actor heap once
        and drops the views — the build path touches each edge byte
        once here instead of copy-per-chunk + concat (the plasma
        sub-parts stay pinned only until prepare runs, which in
        BspEngine.build is the immediately following RPC)."""
        n = 0
        for t in ray.get(list(refs)):
            if t is None:
                continue
            if isinstance(t, dict):
                src = np.asarray(t["src"], dtype=np.int64)
                dst = np.asarray(t["dst"], dtype=np.int64)
                w = np.asarray(t["weight"], dtype=np.float64) \
                    if "weight" in t else None
            else:
                t = self._as_table(t)
                if t.num_rows == 0:
                    continue
                src = self._np(t["src"]).astype(np.int64, copy=False)
                dst = self._np(t["dst"]).astype(np.int64, copy=False)
                w = self._np(t["weight"]).astype(np.float64, copy=False) \
                    if "weight" in t.column_names else None
            if not len(src):
                continue
            self._edge_chunks.append((src, dst, w))
            n += len(src)
        return n

    def ingest_vertex_parts(self, refs: list) -> int:
        """Shard-selective vertex-universe ingest (column ``v``)."""
        n = 0
        for t in ray.get(list(refs)):
            if t is None:
                continue
            t = self._as_table(t)
            if t.num_rows == 0:
                continue
            ids = self._np(t["v"]).astype(np.int64, copy=False)
            self._vert_chunks.append(ids.copy())
            n += len(ids)
        return n

    def ingest_vertex_blocks(self, refs: list) -> int:
        """Same pull-based contract as ingest_edge_blocks, for an
        explicit vertex universe (column ``v`` + ``_pid``)."""
        n = 0
        for r in refs:
            t = self._as_table(ray.get(r))
            if t.num_rows == 0 or "_pid" not in t.column_names:
                continue
            m = self._np(t["_pid"]) == self.pid
            if not m.any():
                continue
            ids = self._np(t["v"])[m].astype(np.int64)
            self._vert_chunks.append(ids)
            n += len(ids)
        return n

    def ingest_vertices(self, ids: np.ndarray) -> int:
        self._vert_chunks.append(np.asarray(ids, dtype=np.int64))
        return len(ids)

    def prepare(self, partitioner) -> dict[int, np.ndarray]:
        """Phase 1: classify edge destinations by owner; return the
        sorted unique ghost-id list per remote partition (this shard's
        outbox registration, grooves_internal.cc:21-109)."""
        if self._edge_chunks:
            self._src = np.concatenate([c[0] for c in self._edge_chunks])
            self._dst = np.concatenate([c[1] for c in self._edge_chunks])
            # weighted iff any chunk carried weights (default weight 1,
            # totem_graph.h:95)
            if any(c[2] is not None for c in self._edge_chunks):
                self._w = np.concatenate(
                    [c[2] if c[2] is not None
                     else np.ones(len(c[0]), dtype=np.float64)
                     for c in self._edge_chunks])
            else:
                self._w = None
        else:
            self._src = np.empty(0, dtype=np.int64)
            self._dst = np.empty(0, dtype=np.int64)
            self._w = None
        self._edge_chunks = []
        self._dst_owner = partitioner.pid_np(self._dst) if len(self._dst) \
            else np.empty(0, dtype=np.int64)
        # ONE stable sort by owner replaces P masked scans here and in
        # finalize: edges of owner q live at order[bounds[q]:bounds[q+1]]
        self._owner_order = np.argsort(self._dst_owner, kind="stable")
        self._owner_bounds = np.searchsorted(
            self._dst_owner[self._owner_order], np.arange(self.P + 1))
        ghosts: dict[int, np.ndarray] = {}
        for q in range(self.P):
            if q == self.pid:
                continue
            sel = self._owner_order[self._owner_bounds[q]:
                                    self._owner_bounds[q + 1]]
            if len(sel):
                ghosts[q] = unique_concat([self._dst[sel]])
        self.ghosts = ghosts
        # payloads go to the object store; the driver relays only the
        # refs, and each owner pulls directly from this shard's plasma
        # (peer-to-peer — ghost lists never ride a driver RPC; at 10^10
        # vertices the driver heap cannot stage P x ghost-list bytes)
        return {q: ray.put(ids) for q, ids in ghosts.items()}

    @staticmethod
    def _resolve_refs(d: dict) -> dict:
        """Replace ObjectRef values with their objects (one batched
        get); plain arrays pass through (direct-call tests)."""
        keys = [k for k, v in d.items() if isinstance(v, ray.ObjectRef)]
        if not keys:
            return d
        vals = ray.get([d[k] for k in keys])
        out = dict(d)
        out.update(zip(keys, vals))
        return out

    def finalize(self, incoming: dict[int, np.ndarray]) -> dict:
        """Phase 2: fix the owned vertex set (srcs + locally-owned dsts
        + explicitly routed vertices + vertices other shards reference),
        build the CSR views and inbox maps. ``incoming`` values may be
        ObjectRefs (pulled directly from the sender's plasma)."""
        incoming = self._resolve_refs(incoming)
        _sel_local = self._owner_order[self._owner_bounds[self.pid]:
                                       self._owner_bounds[self.pid + 1]]
        parts = [self._src]
        if len(self._dst):
            parts.append(self._dst[_sel_local])
        if self._vert_chunks:
            parts.extend(self._vert_chunks)
        parts.extend(incoming.values())
        # dense-id bitmap fast path: P concurrent np.unique sorts
        # thrash the shared cache (see nputil.unique_concat)
        self.verts = unique_concat(parts)
        self.nv = len(self.verts)
        self.ne = len(self._src)
        self.edge_fp = _content_fp(self._src, self._dst, self._w,
                                   self._vert_chunks)
        self._vert_chunks = []

        # inbox maps: p's ghost list order -> my local indices
        self.inbox_maps = {p: np.searchsorted(self.verts, ids)
                           for p, ids in incoming.items()}

        src_idx = np.searchsorted(self.verts, self._src)
        self.out_deg = np.bincount(src_idx, minlength=self.nv).astype(np.int64)

        # per-target dst-sorted edge groups (push direction)
        self.tgt: dict[int, dict[str, np.ndarray]] = {}
        # src-major adjacency with (owner, idx) codes (pull direction)
        order_src = np.argsort(src_idx, kind="stable")
        self.adj_indptr = np.searchsorted(src_idx[order_src],
                                          np.arange(self.nv + 1))
        self.adj_owner = self._dst_owner[order_src].astype(np.int32)
        adj_idx = np.empty(self.ne, dtype=np.int64)

        tmp_idx = np.empty(self.ne, dtype=np.int64)
        for t in range(self.P):
            sel = self._owner_order[self._owner_bounds[t]:
                                    self._owner_bounds[t + 1]]
            if not len(sel):
                continue
            e_s = src_idx[sel]
            if t == self.pid:
                e_d = np.searchsorted(self.verts, self._dst[sel])
                size = self.nv
            else:
                e_d = np.searchsorted(self.ghosts[t], self._dst[sel])
                size = len(self.ghosts[t])
            tmp_idx[sel] = e_d  # adjacency idx codes, same pass
            order = np.argsort(e_d, kind="stable")
            self.tgt[t] = {"src": e_s[order], "dst": e_d[order], "size": size}
            if self._w is not None:
                self.tgt[t]["w"] = self._w[sel][order]

        # adjacency idx codes in src-major order
        adj_idx[:] = tmp_idx[order_src]
        self.adj_idx = adj_idx

        # free raw edge arrays except what's needed
        self.weighted = self._w is not None
        del self._src, self._dst, self._dst_owner, self._w
        del self._owner_order, self._owner_bounds
        return {"pid": self.pid, "nv": self.nv, "ne": self.ne,
                "edge_fp": self.edge_fp,
                "ghost_vertices": int(sum(len(g) for g in self.ghosts.values()))}

    # ------------------------------------------------------------------
    # pull-mode build (GROOVES_PULL, the message structure of
    # page_rank_incoming_hybrid, totem_page_rank_incoming_hybrid.cu:
    # 244-294): edges are routed by DST owner; each superstep a shard
    # publishes ONE dense contrib vector over its own vertices and
    # every shard gathers from the P vectors it needs — per-superstep
    # message volume is V floats total (not P*V ghost slots), and
    # co-located readers share the object zero-copy.
    # ------------------------------------------------------------------
    def prepare_pull(self, partitioner) -> dict[int, tuple]:
        """Phase 1 (pull): classify edge SOURCES by owner; return per
        remote owner (sorted unique src ids, local edge counts per id)
        — the counts let owners reconstruct global out-degrees."""
        if self._edge_chunks:
            self._src = np.concatenate([c[0] for c in self._edge_chunks])
            self._dst = np.concatenate([c[1] for c in self._edge_chunks])
        else:
            self._src = np.empty(0, dtype=np.int64)
            self._dst = np.empty(0, dtype=np.int64)
        self._edge_chunks = []
        self._src_owner = partitioner.pid_np(self._src) if len(self._src) \
            else np.empty(0, dtype=np.int64)
        self.pid_fn = partitioner.pid_np
        # ONE stable sort by owner replaces P masked scans here and in
        # adopt_pull_indices (same idiom as prepare)
        self._pull_order = np.argsort(self._src_owner, kind="stable")
        self._pull_bounds = np.searchsorted(
            self._src_owner[self._pull_order], np.arange(self.P + 1))
        self._pull_ghost_ids: dict[int, np.ndarray] = {}
        out: dict[int, tuple] = {}
        for p in range(self.P):
            sel = self._pull_order[self._pull_bounds[p]:
                                   self._pull_bounds[p + 1]]
            if p == self.pid or not len(sel):
                continue
            ids, counts = unique_counts(self._src[sel])
            self._pull_ghost_ids[p] = ids
            out[p] = (ids, counts)
        # object-store refs, not values: the driver relays refs and
        # each owner pulls the payload peer-to-peer (see prepare)
        return {p: ray.put(v) for p, v in out.items()}

    def finalize_pull(self, incoming: dict[int, tuple]) -> dict:
        """Phase 2 (pull): fix the owned vertex set, accumulate global
        out-degrees, and return per-requester index arrays into this
        shard's vertex order (so requesters can address the contrib
        vector directly). ``incoming`` values may be ObjectRefs;
        replies are returned as refs for the same peer-to-peer
        reason."""
        incoming = self._resolve_refs(incoming)
        parts = [self._dst]
        sel_own = self._pull_order[self._pull_bounds[self.pid]:
                                   self._pull_bounds[self.pid + 1]]
        parts.append(self._src[sel_own])
        if self._vert_chunks:
            parts.extend(self._vert_chunks)
        parts.extend(ids for ids, _ in incoming.values())
        self.verts = unique_concat(parts)
        # only vertices THIS shard owns (dst-routing may deposit
        # remote-owned dsts here — they belong to their owner)
        own = self.pid_fn(self.verts) == self.pid
        self.verts = self.verts[own]
        self.nv = len(self.verts)
        self.ne = len(self._src)
        self.edge_fp = _content_fp(self._src, self._dst, None,
                                   self._vert_chunks)

        # bincount, not np.add.at: same reduction, ~20x faster (add.at
        # is an unbuffered ufunc loop; this runs once per build but over
        # every owned vertex)
        out_deg = np.zeros(self.nv, dtype=np.int64)
        if len(sel_own):
            # sel_own selects edges whose src OWNER == self.pid by
            # construction, so every id here is locally owned; bincount
            # the raw searchsorted positions directly — a pre-unique
            # here would just re-sort 1M ids to save bincount nothing
            out_deg += np.bincount(np.searchsorted(self.verts,
                                                   self._src[sel_own]),
                                   minlength=self.nv).astype(np.int64)
        replies: dict[int, np.ndarray] = {}
        agg_idx: list[np.ndarray] = []
        agg_cnt: list[np.ndarray] = []
        for q, (ids, counts) in incoming.items():
            idx = np.searchsorted(self.verts, ids)
            agg_idx.append(idx)
            agg_cnt.append(counts)
            replies[q] = ray.put(idx)
        if agg_idx:
            # ONE fused bincount over all requesters (P-1 separate
            # minlength=nv bincounts allocate and sweep P-1 nv-sized
            # temporaries)
            out_deg += np.bincount(np.concatenate(agg_idx),
                                   weights=np.concatenate(agg_cnt),
                                   minlength=self.nv).astype(np.int64)
        self.pull_out_deg = out_deg
        self._vert_chunks = []
        return {"pid": self.pid, "nv": self.nv, "ne": self.ne,
                "edge_fp": self.edge_fp, "replies": replies}

    def adopt_pull_indices(self, idx_by_owner: dict[int, np.ndarray]) -> dict:
        """Phase 3 (pull): build per-source-owner in-edge groups
        (src index into the OWNER's vertex order, dst local index).
        ``idx_by_owner`` values may be ObjectRefs."""
        idx_by_owner = self._resolve_refs(idx_by_owner)
        # dst may be owned by a peer? No: edges were routed by dst
        # owner, so every local dst is owned here.
        dst_local = np.searchsorted(self.verts, self._dst)
        self.pull_src: dict[int, dict[str, np.ndarray]] = {}
        for p in range(self.P):
            sel = self._pull_order[self._pull_bounds[p]:
                                   self._pull_bounds[p + 1]]
            if not len(sel):
                continue
            if p == self.pid:
                sidx = np.searchsorted(self.verts, self._src[sel])
            else:
                ghost_ids = self._pull_ghost_ids[p]
                pos = np.searchsorted(ghost_ids, self._src[sel])
                sidx = idx_by_owner[p][pos]
            self.pull_src[p] = {"sidx": sidx, "dst": dst_local[sel]}
        self.weighted = False
        del self._src, self._dst, self._src_owner
        del self._pull_order, self._pull_bounds, self._pull_ghost_ids
        return {"pid": self.pid}

    # ------------------------------------------------------------------
    # kernel dispatch (the engine_config callback surface,
    # totem_engine.cuh:114-124)
    # ------------------------------------------------------------------
    def k_init(self, alg: str, **params) -> dict:
        st: dict[str, Any] = {}
        KERNELS[alg].init(self, st, **params)
        self.state[alg] = st
        return {"pid": self.pid}

    def k_compute(self, alg: str, superstep: int,
                  prev_agg: dict | None = None) -> dict[int, Any]:
        """Compute phase: returns {target_group: bundle_ref} where a
        bundle is {target_pid: outbox} for one destination group.
        Bundles go straight into the object store (``ray.put``) so the
        driver only relays references — data moves shard-to-shard.
        ``prev_agg`` is the previous superstep's GLOBAL reduced stats
        (Totem's superstep-global ss_kernel hook,
        totem_engine.cuh:114-124), readable by kernels as
        ``sh.prev_agg``."""
        self.prev_agg = prev_agg
        kernel = KERNELS[alg]
        out = kernel.compute(self, self.state[alg], superstep)
        if out is None or (isinstance(out, dict) and not out):
            return {}
        if getattr(kernel, "broadcast_outbox", False):
            # ONE object read by every shard (pull-mode contrib vector)
            ref = ray.put(out)
            ngroups = (self.P + self.group_size - 1) // self.group_size
            return {g: ref for g in range(ngroups)}
        bundles: dict[int, dict[int, Any]] = {}
        for q, v in out.items():
            bundles.setdefault(q // self.group_size, {})[q] = v
        return {g: ray.put(b) for g, b in bundles.items()}

    def k_step(self, alg: str, superstep: int,
               inboxes: dict[int, Any] | None,
               prev_agg: dict | None = None):
        """Fused superstep: apply the PREVIOUS superstep's inboxes,
        then compute this superstep's outboxes — one RPC round per
        superstep instead of two (the apply of step k-1 and the
        compute of step k have no barrier between them for kernels
        without the global hook). Returns (outbox_refs, apply_stats |
        None)."""
        stats = None
        if inboxes is not None:
            stats = self.k_apply(alg, inboxes, superstep - 1)
        refs = self.k_compute(alg, superstep, prev_agg)
        return refs, stats

    def k_apply(self, alg: str, inboxes: dict[int, Any], superstep: int) -> dict:
        """``inboxes`` = {sender_pid: bundle_ref of THIS shard's
        group}. One batched get (sequential gets would serialize on
        RPC latency), then each bundle is sliced to this shard's
        entry — bundles live in shared plasma memory, so co-located
        shards reading the same bundle do not copy it."""
        keys = list(inboxes.keys())
        vals = ray.get([inboxes[k] for k in keys]) if keys else []
        if getattr(KERNELS[alg], "broadcast_outbox", False):
            fetched = dict(zip(keys, vals))
        else:
            fetched = {p: b[self.pid] for p, b in zip(keys, vals)
                       if self.pid in b}
        return KERNELS[alg].apply(self, self.state[alg], fetched, superstep)

    def k_result(self, alg: str) -> pa.Table:
        return KERNELS[alg].result(self, self.state[alg])

    # ------------------------------------------------------------------
    # checkpoint / resume (north rule: resumable with per-partition
    # lineage; the reference has no equivalent — fail-stop, SURVEY §4.1)
    # ------------------------------------------------------------------
    def checkpoint(self, alg: str, ckpt_dir: str, superstep: int,
                   lineage: str) -> str:
        import pyarrow.parquet as pq

        t = KERNELS[alg].state_table(self, self.state[alg])
        t = t.replace_schema_metadata({b"superstep": str(superstep).encode(),
                                       b"lineage": lineage.encode()})
        d = os.path.join(ckpt_dir, f"superstep={superstep}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{self.pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)  # atomic publish
        return path

    def restore(self, alg: str, ckpt_dir: str, superstep: int,
                lineage: str | None = None, **params) -> dict:
        import pyarrow.parquet as pq

        path = os.path.join(ckpt_dir, f"superstep={superstep}",
                            f"part-{self.pid:05d}.parquet")
        t = pq.read_table(path)
        meta = t.schema.metadata or {}
        if lineage is not None:
            # the manifest can lag the part files (a crash between the
            # atomic part overwrites and the manifest rewrite leaves
            # run A's manifest over run B's parts) — the per-part
            # embedded lineage is the authoritative check
            got = meta.get(b"lineage", b"").decode()
            got_step = meta.get(b"superstep", b"").decode()
            if got != lineage or got_step != str(superstep):
                raise ValueError(
                    f"checkpoint part {path} carries lineage "
                    f"{got!r}/step {got_step!r}, expected "
                    f"{lineage!r}/step {superstep} — mixed runs in one "
                    "checkpoint_dir; delete it and rerun")
        st = self.state.setdefault(alg, {})
        KERNELS[alg].init(self, st, **params)
        KERNELS[alg].load_state(self, st, t)
        return {"pid": self.pid, "superstep": superstep}

    # ------------------------------------------------------------------
    def reset(self) -> int:
        """Drop ALL per-graph and per-algorithm state (frees the CSR /
        kernel arrays) but keep the actor process alive — the engine
        pool (bsp._SHARD_POOL) recycles the actor for the next build,
        skipping the ~60 ms/actor Ray spawn latency. Identity params
        survive; everything else is rebuilt by the next ingest."""
        pid, P, gs = self.pid, self.P, self.group_size
        self.__dict__.clear()
        self.__init__(pid, P, gs)
        return pid

    def info(self) -> dict:
        return {"pid": self.pid, "nv": self.nv, "ne": self.ne}
