"""BspEngine — driver-orchestrated superstep loop over GraphShard actors.

The Ray analog of Totem's engine lifecycle
(engine_init -> engine_config -> engine_execute,
src/totem/totem_engine.cu:379-436,214-234):

* ``build`` — route the edge Dataset into P GraphShard actors via a
  stateless ``map_batches`` router (data flows worker -> actor through
  the object store, never through the driver), then a two-phase ghost
  exchange fixes vertex ownership and inbox maps
  (partition_set_initialize, totem_partition.cu:596-636).
* ``run``   — per superstep: every shard computes and publishes dense
  per-target outboxes to the object store; the driver relays only the
  ObjectRefs; shards apply their inboxes and vote on termination
  (superstep_execute + engine_report_not_finished,
  totem_engine.cu:95-195). Per-superstep comp/comm timers mirror
  print_timing (totem_benchmark_print.cu:85-105).
* checkpoints — every ``checkpoint_every`` supersteps each shard
  atomically writes its state vector with a lineage hash; ``run`` with
  ``resume=True`` restarts from the newest complete superstep (the
  north rule's resumable-with-lineage requirement; the reference is
  fail-stop, SURVEY.md §4.1).

Messages deliberately bypass a Dataset groupby: with P shards the
exchange is a dense P^2 transfer of pre-reduced arrays — exactly
Totem's Grooves design (totem_grooves.cu:355-414) — which for
power-law graphs is strictly less data than an all-to-all row shuffle.
The object store still provides spilling and node-to-node transfer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data

from totem_ray.engine.kernels import KERNELS
from totem_ray.engine.shard import GraphShard
from totem_ray.graph.partition import HashPartitioner
from totem_ray.hashing import lineage_hash


def _resolve_blocks(blks) -> list:
    """A split task receives either raw blocks or a LIST of ObjectRefs
    (refs nested in a container are not auto-resolved by Ray)."""
    if blks and isinstance(blks[0], ray.ObjectRef):
        blks = ray.get(list(blks))
    return blks


@ray.remote
def _split_edge_block(blks, partitioner, key: str, P: int):
    """Split a GROUP of routed blocks into P per-shard sub-tables
    (None when a shard gets no rows). A pure function of its input
    blocks, so Ray task retries are idempotent; with
    ``num_returns=P`` each sub-table is its own object and a shard
    fetches ONLY its 1/P share — the multi-node analog of
    partition_set_initialize (totem_partition.cu:596-636), where each
    partition holds only its subgraph (no P-way broadcast of the full
    edge table). Grouping ~2P tasks over all input blocks keeps the
    object count at O(P^2) regardless of how many blocks the upstream
    read produced (208 input blocks x 32 shards was 6.6k tiny plasma
    objects; grouped it is ~2k right-sized ones)."""
    ts = [GraphShard._as_table(b) for b in _resolve_blocks(blks)]
    ts = [t for t in ts if t.num_rows > 0 and key in t.column_names]
    if not ts:
        return tuple([None] * P) if P > 1 else None
    t = pa.concat_tables(ts) if len(ts) > 1 else ts[0]
    k = t[key]
    k = np.asarray(k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k)
    pid = partitioner.pid_np(k)
    order = np.argsort(pid, kind="stable")
    bounds = np.searchsorted(pid[order], np.arange(P + 1))
    # ONE gather per column, then contiguous numpy slices per shard:
    # pickling a numpy slice copies exactly the slice's bytes, where a
    # sliced Arrow table pickles its FULL parent buffers (measured:
    # a 1000-row slice of a 1M-row table serializes all 16 MB) and a
    # per-partition Table.take is P separate gathers
    cols = [np.asarray(c.combine_chunks()
                       if isinstance(c, pa.ChunkedArray) else c)[order]
            for c in (t[n] for n in t.column_names)]
    names = t.column_names
    out = [dict(zip(names, (c[bounds[p]:bounds[p + 1]] for c in cols)))
           if bounds[p + 1] > bounds[p] else None for p in range(P)]
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _split_vertex_block(blks, partitioner, P: int):
    """Same contract for an explicit vertex universe: first column is
    the vertex id; emit per-shard unique ``v`` tables."""
    ts = [GraphShard._as_table(b) for b in _resolve_blocks(blks)]
    ts = [t for t in ts if t.num_rows > 0]
    if not ts:
        return tuple([None] * P) if P > 1 else None
    cols = [t[t.column_names[0]] for t in ts]
    from totem_ray.nputil import unique_concat
    v = unique_concat(
        [np.asarray(c.combine_chunks()
                    if isinstance(c, pa.ChunkedArray) else c)
         .astype(np.int64) for c in cols])
    pid = partitioner.pid_np(v)
    order = np.argsort(pid, kind="stable")
    bounds = np.searchsorted(pid[order], np.arange(P + 1))
    out = [pa.table({"v": pa.array(v[order[bounds[p]:bounds[p + 1]]],
                                   type=pa.int64())})
           if bounds[p + 1] > bounds[p] else None for p in range(P)]
    return tuple(out) if P > 1 else out[0]


def _ref_groups(refs: list, P: int, total_bytes: int | None = None,
                group_bytes: int = 16 << 20) -> list[list]:
    """Slice the block-ref list into contiguous groups (one split task
    each). Contiguous slices preserve locality: consecutive blocks of
    a materialized dataset tend to live on the same node.

    The group count is capped at 2P as before, and additionally by
    BYTES for small inputs: each split task emits P part-objects, so
    a tiny input sliced into 2P groups yields 2P^2 sub-KB plasma
    objects whose fixed put/get/scheduling costs dominate.
    ``group_bytes`` (~16 MB of input per split task) keeps parts
    ~0.5 MB+ at P=32 while leaving enough split parallelism that the
    split finishes inside the shard-actor startup window it overlaps
    with (measured on s20 ef16, 500 MB: 31 groups -> 0.6 s split vs
    ~1.9 s actor spinup; 2 groups serialized the split to 2.3 s and
    became the critical path)."""
    if not refs:  # zero-block dataset (e.g. a filter kept nothing)
        return []
    ntasks = max(1, min(len(refs), 2 * P))
    if total_bytes is not None and total_bytes > 0:
        by_bytes = (total_bytes + group_bytes - 1) // group_bytes
        ntasks = max(1, min(ntasks, by_bytes))
    env = os.environ.get("BSP_SPLIT_TASKS")
    if env:
        ntasks = max(1, min(len(refs), int(env)))
    per = (len(refs) + ntasks - 1) // ntasks
    return [refs[i:i + per] for i in range(0, len(refs), per)]


# Idle GraphShard actors, keyed by (job_id, P, group_size) and
# reused across engines: spawning 32 actor processes costs ~1.9 s of
# Ray control-plane latency regardless of graph size, and the
# reference's time_init likewise measures graph load + partition on an
# ALREADY-RUNNING process (totem_benchmark runs many graphs/algorithms
# per binary launch). shutdown() resets each actor's state (freeing
# its arrays) and parks it here; the next same-shaped engine reuses
# the warm pool. Actors that fail the reset RPC are killed, not pooled.
_SHARD_POOL: dict[tuple, list] = {}  # key -> list of pid-ordered actor SETS
_POOL_MAX_SETS = 2  # per key; each set is one engine's worth of actors


class BspEngine:
    def __init__(self, num_partitions: int = 4, partitioner=None,
                 num_cpus_per_shard: float = 0, group_size: int = 8):
        """``num_cpus_per_shard=0`` (default) lets shard actors
        coexist with Dataset tasks without deadlocking the CPU budget
        (BSP phases are turn-based; each actor still runs on its own
        worker process). Reserve real CPUs (e.g. 1.0) for dedicated
        benchmark runs. ``group_size`` = shards per destination
        bundle (one message object per target node at multi-node
        scale; see GraphShard.k_compute)."""
        self.P = int(num_partitions)
        self.group_size = max(1, int(group_size))
        self.partitioner = partitioner or HashPartitioner(self.P)
        assert self.partitioner.num_partitions == self.P
        # Pooling is gated three ways: (1) job id in the key — a
        # ray.shutdown()/init() cycle in one process invalidates pooled
        # handles, and a new job must never see them; if the job id is
        # unavailable (Ray not yet initialized) pooling is disabled for
        # this engine rather than aliasing lifetimes under a None key.
        # (2) only num_cpus=0 actors are pooled — parked actors with
        # real CPU reservations would hold the cluster's CPUs hostage.
        # (3) popped sets are health-checked before use; a set with a
        # dead actor is killed and replaced by a fresh spawn.
        self._pool_key = None
        self._num_cpus_per_shard = float(num_cpus_per_shard)
        if float(num_cpus_per_shard) == 0.0:
            try:
                job = ray.get_runtime_context().get_job_id()
                self._pool_key = (job, self.P, self.group_size)
            except Exception:
                pass
        self.shards = []
        pooled = _SHARD_POOL.get(self._pool_key, []) \
            if self._pool_key else []
        while pooled and not self.shards:
            cand = pooled.pop()
            try:
                ray.get([s.__ray_ready__.remote() for s in cand],
                        timeout=10)
                self.shards = cand
            except Exception:
                for s in cand:
                    ray.kill(s, no_restart=True)
        if not self.shards:
            shard_cls = ray.remote(num_cpus=num_cpus_per_shard)(GraphShard)
            self.shards = [shard_cls.remote(p, self.P, self.group_size)
                           for p in range(self.P)]
        self.total_vertices = 0
        self.total_edges = 0
        self.build_info: list[dict] = []

    def shutdown(self, pool: bool = True):
        """Release the shard actors: reset their state (freeing the
        graph arrays) and park them for reuse by the next same-shaped
        engine, or kill them (``pool=False``, or when the reset RPC
        fails — a dead/wedged actor must not be recycled)."""
        shards, self.shards = self.shards, []
        if not shards:
            return
        if self._pool_key is None:
            pool = False
            idle = []
        else:
            idle = _SHARD_POOL.setdefault(self._pool_key, [])
        if pool and len(idle) < _POOL_MAX_SETS:
            try:
                ray.get([s.reset.remote() for s in shards], timeout=60)
                idle.append(shards)
                return
            except Exception:
                pass  # fall through and kill
        for s in shards:
            ray.kill(s, no_restart=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # ------------------------------------------------------------------
    def _respawn_shards(self):
        """Kill the current shard set and spawn a fresh one — the
        build-time recovery path when an actor turns out dead on first
        contact (``ray.kill`` is asynchronous, so a pooled set can
        pass its ``__ray_ready__`` validation while one member is
        already dying)."""
        for s in self.shards:
            ray.kill(s, no_restart=True)
        shard_cls = ray.remote(num_cpus=self._num_cpus_per_shard)(GraphShard)
        self.shards = [shard_cls.remote(p, self.P, self.group_size)
                       for p in range(self.P)]

    def build(self, edges_ds, vertices_ds=None,
              route_by: str = "src") -> "BspEngine":
        """Route edges (and optionally an explicit vertex universe, for
        graphs with isolated vertices) into the shards and build CSRs.

        ``route_by='src'`` (default) builds the push-mode structures
        every kernel uses; ``route_by='dst'`` builds the pull-mode
        in-edge groups (GROOVES_PULL) used by ``pagerank_pull``.

        If a shard actor dies during the build (a pooled actor whose
        in-flight kill outran validation, or a real worker loss), the
        whole set is replaced and the build retried once from the
        materialized input — no kernel state exists yet, so
        replacement is clean. A death during ``run`` is NOT absorbed:
        it surfaces, and recovery is ``resume=True`` from the last
        checkpoint."""
        try:
            return self._build_once(edges_ds, vertices_ds, route_by)
        except ray.exceptions.RayActorError:
            self._respawn_shards()
            return self._build_once(edges_ds, vertices_ds, route_by)

    def _build_once(self, edges_ds, vertices_ds=None,
                    route_by: str = "src") -> "BspEngine":
        self.mode = route_by
        shards = self.shards
        partitioner = self.partitioner
        sch = edges_ds.schema()
        # an empty derived dataset (e.g. a filter that kept nothing)
        # reports schema() None — treat as unweighted with no rows
        weighted = sch is not None and "weight" in sch.names
        key = "src" if route_by == "src" else "dst"

        cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
        # Shard-selective routing: MATERIALIZE the selected columns
        # (any Ray Data retry resolves inside materialize, so every row
        # exists exactly once), then split each block into P per-shard
        # sub-tables with a ``num_returns=P`` task — a pure function of
        # the block, so task retries are idempotent. Each shard fetches
        # ONLY its own sub-tables (1/P of the bytes on a real cluster;
        # the old design handed every shard every block — a P-way
        # broadcast of the full edge table). Split tasks schedule next
        # to their input block, so the only cross-node traffic is the
        # actual shuffle.
        t_start = time.perf_counter()
        part_ref = ray.put(partitioner)
        if sch is not None and set(sch.names) == set(cols):
            # skip the projection pass (a second full copy through
            # plasma) when the schema already matches
            ds = edges_ds.materialize()
        else:
            ds = edges_ds.select_columns(cols).materialize()
        refs = ds.to_arrow_refs()
        t_mat = time.perf_counter()
        split = [_split_edge_block.options(num_returns=self.P)
                 .remote(g, part_ref, key, self.P)
                 for g in _ref_groups(refs, self.P, ds.size_bytes())]
        if self.P == 1:
            per_shard = [split]
        else:
            per_shard = [[s[p] for s in split] for p in range(self.P)]
        ray.get([s.ingest_edge_parts.remote(per_shard[p])
                 for p, s in enumerate(shards)])
        del ds, refs, split, per_shard  # unpin before CSR build
        t_ingest = time.perf_counter()
        self.build_timings = {"materialize_sec": t_mat - t_start,
                              "split_ingest_sec": t_ingest - t_mat}

        if vertices_ds is not None:
            vds = vertices_ds.materialize()
            vrefs = vds.to_arrow_refs()
            vsplit = [_split_vertex_block.options(num_returns=self.P)
                      .remote(g, part_ref, self.P)
                      for g in _ref_groups(vrefs, self.P, vds.size_bytes())]
            if self.P == 1:
                vper = [vsplit]
            else:
                vper = [[s[p] for s in vsplit] for p in range(self.P)]
            ray.get([s.ingest_vertex_parts.remote(vper[p])
                     for p, s in enumerate(shards)])
            del vds, vrefs, vsplit, vper

        if route_by == "dst":
            # three-phase pull exchange: (1) requesters announce the
            # src ids they reference per owner (+ counts for global
            # out-degrees), (2) owners fix vertex order and reply with
            # index arrays, (3) requesters adopt the indices
            announced = ray.get([s.prepare_pull.remote(partitioner)
                                 for s in shards])
            t_prep = time.perf_counter()
            incoming_p: list[dict] = [dict() for _ in range(self.P)]
            for q, by_owner in enumerate(announced):
                for p, payload in by_owner.items():
                    incoming_p[p][q] = payload
            infos = ray.get([s.finalize_pull.remote(incoming_p[p])
                             for p, s in enumerate(shards)])
            t_fin = time.perf_counter()
            idx_for: list[dict[int, np.ndarray]] = [dict()
                                                    for _ in range(self.P)]
            for p, info in enumerate(infos):
                for q, idx in info.pop("replies").items():
                    idx_for[q][p] = idx
            ray.get([s.adopt_pull_indices.remote(idx_for[q])
                     for q, s in enumerate(shards)])
            t_adopt = time.perf_counter()
            self.build_timings.update(
                prepare_sec=t_prep - t_ingest,
                finalize_sec=t_fin - t_prep,
                adopt_sec=t_adopt - t_fin)
            self.build_info = infos
            self.total_vertices = sum(i["nv"] for i in infos)
            self.total_edges = sum(i["ne"] for i in infos)
            self.graph_fp = sum(i.get("edge_fp", 0)
                                for i in infos) % (1 << 64)
            self.build_timings["exchange_sec"] = \
                time.perf_counter() - t_ingest
            return self

        # two-phase ghost exchange
        ghosts = ray.get([s.prepare.remote(partitioner) for s in shards])
        incoming: list[dict[int, np.ndarray]] = [dict() for _ in range(self.P)]
        for p, g in enumerate(ghosts):
            for q, ids in g.items():
                incoming[q][p] = ids
        self.build_info = ray.get([s.finalize.remote(incoming[p])
                                   for p, s in enumerate(shards)])
        self.total_vertices = sum(i["nv"] for i in self.build_info)
        self.total_edges = sum(i["ne"] for i in self.build_info)
        self.graph_fp = sum(i.get("edge_fp", 0)
                            for i in self.build_info) % (1 << 64)
        self.build_timings["exchange_sec"] = time.perf_counter() - t_ingest
        return self

    # ------------------------------------------------------------------
    def run(self, alg: str, params: dict | None = None,
            max_supersteps: int = 10_000,
            checkpoint_dir: str | None = None,
            checkpoint_every: int = 0,
            resume: bool = False) -> dict[str, Any]:
        """Execute a kernel's BSP loop. Returns
        {result: Dataset, iterations, converged, metrics, lineage}."""
        params = dict(params or {})
        kernel = KERNELS[alg]
        mode = getattr(self, "mode", "src")
        if getattr(kernel, "broadcast_outbox", False) and mode != "dst":
            raise ValueError(f"{alg} needs a pull-built engine: "
                             "build(..., route_by='dst')")
        if not getattr(kernel, "broadcast_outbox", False) and mode == "dst":
            raise ValueError(f"{alg} needs a push-built engine: "
                             "build(..., route_by='src')")
        if getattr(kernel, "needs_total_vertices", False) and \
                "total_vertices" not in params:
            params["total_vertices"] = self.total_vertices
        lineage = lineage_hash(alg, sorted(params.items()),
                               self.partitioner.describe(),
                               self.total_vertices, self.total_edges,
                               getattr(self, "graph_fp", 0))

        start_step = 0
        restored = False
        prev_agg_seed: dict | None = None
        if resume and checkpoint_dir:
            step = self._latest_checkpoint(checkpoint_dir, lineage)
            if step is not None:
                ray.get([s.restore.remote(alg, checkpoint_dir, step,
                                          lineage=lineage, **params)
                         for s in self.shards])
                start_step = step + 1
                restored = True
                # re-seed the global superstep hook: the manifest keeps
                # the checkpointed superstep's reduced stats, so a
                # global-hook kernel's first resumed compute sees the
                # same prev_agg an uninterrupted run would have
                prev_agg_seed = self._manifest_agg(checkpoint_dir, step)
        if not restored:
            ray.get([s.k_init.remote(alg, **params) for s in self.shards])

        metrics: list[dict] = []
        converged = False

        # Fused path: one RPC round per superstep (apply k-1 + compute
        # k in one call). Needs no per-superstep checkpoint barrier and
        # no global prev-agg hook; otherwise fall back to two-phase.
        fused = not (checkpoint_dir and checkpoint_every) and \
            not getattr(kernel, "needs_global_hook", False)

        def _inbox_for(outs, q):
            g = q // self.group_size
            return {p: outs[p][g] for p in range(self.P) if g in outs[p]}

        if fused:
            prev_inboxes = [None] * self.P
            step = start_step
            done_static = getattr(kernel, "done_static", None)
            while step < max_supersteps:
                if step > start_step and done_static is not None \
                        and done_static(step - 1, params):
                    # step-1 is statically the last superstep: skip the
                    # k_step round whose compute would be discarded and
                    # let the absorb block below apply its messages
                    break
                t0 = time.perf_counter()
                res = ray.get([s.k_step.remote(alg, step, prev_inboxes[q])
                               for q, s in enumerate(self.shards)])
                t1 = time.perf_counter()
                if step > start_step:
                    agg = _agg_stats([r[1] for r in res])
                    metrics.append({"superstep": step - 1,
                                    "step_ms": (t1 - t0) * 1e3, **agg})
                    if kernel.done(agg, step - 1, params):
                        converged = True
                        break
                outs = [r[0] for r in res]
                prev_inboxes = [_inbox_for(outs, q) for q in range(self.P)]
                step += 1
            if not converged and step > start_step:
                # absorb the final computed superstep's messages
                t0 = time.perf_counter()
                stats = ray.get([
                    s.k_apply.remote(alg, prev_inboxes[q], step - 1)
                    for q, s in enumerate(self.shards)])
                agg = _agg_stats(stats)
                metrics.append({"superstep": step - 1,
                                "step_ms": (time.perf_counter() - t0) * 1e3,
                                **agg})
                converged = kernel.done(agg, step - 1, params)
            refs = [s.k_result.remote(alg) for s in self.shards]
            result = ray.data.from_arrow_refs(refs)
            return {"result": result, "iterations": step,
                    "supersteps_run": step - start_step,
                    "converged": converged, "metrics": metrics,
                    "lineage": lineage,
                    "resumed_from": start_step if restored else None}

        step = start_step
        prev_agg: dict | None = prev_agg_seed
        while step < max_supersteps:
            t0 = time.perf_counter()
            outs = ray.get([s.k_compute.remote(alg, step, prev_agg)
                            for s in self.shards])
            t1 = time.perf_counter()
            applies = []
            for q, s in enumerate(self.shards):
                applies.append(s.k_apply.remote(alg, _inbox_for(outs, q), step))
            stats = ray.get(applies)
            t2 = time.perf_counter()
            agg = _agg_stats(stats)
            prev_agg = agg
            m = {"superstep": step, "comp_ms": (t1 - t0) * 1e3,
                 "apply_ms": (t2 - t1) * 1e3, **agg}
            if checkpoint_dir and checkpoint_every and \
                    (step + 1) % checkpoint_every == 0:
                ray.get([s.checkpoint.remote(alg, checkpoint_dir, step, lineage)
                         for s in self.shards])
                self._write_manifest(checkpoint_dir, step, lineage, m,
                                     agg=agg)
                m["checkpointed"] = True
            metrics.append(m)
            if kernel.done(agg, step, params):
                converged = True
                step += 1
                break
            step += 1

        refs = [s.k_result.remote(alg) for s in self.shards]
        result = ray.data.from_arrow_refs(refs)
        return {"result": result, "iterations": step,
                "supersteps_run": step - start_step,
                "converged": converged, "metrics": metrics,
                "lineage": lineage, "resumed_from": start_step if restored else None}

    # ------------------------------------------------------------------
    @staticmethod
    def _manifest_path(ckpt_dir: str, step: int) -> str:
        return os.path.join(ckpt_dir, f"superstep={step}", "MANIFEST.json")

    def _write_manifest(self, ckpt_dir: str, step: int, lineage: str,
                        metrics: dict, agg: dict | None = None):
        path = self._manifest_path(ckpt_dir, step)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            # ``agg`` is stored verbatim as its own field — it is the
            # prev_agg a resumed global-hook kernel must observe, and
            # must not be entangled with display metrics
            json.dump({"superstep": step, "lineage": lineage,
                       "num_partitions": self.P, "metrics": metrics,
                       "agg": agg}, f)
        os.replace(tmp, path)

    def _manifest_agg(self, ckpt_dir: str, step: int) -> dict | None:
        """The checkpointed superstep's reduced kernel stats — the
        prev_agg a resumed run must see. Reads the dedicated ``agg``
        field; manifests from before that field existed fall back to
        stripping known bookkeeping keys from the metrics blob."""
        try:
            with open(self._manifest_path(ckpt_dir, step)) as f:
                man = json.load(f)
        except (OSError, ValueError):
            return None
        agg = man.get("agg")
        if agg:
            return agg
        m = man.get("metrics", {})
        skip = {"superstep", "comp_ms", "apply_ms", "step_ms",
                "checkpointed"}
        agg = {k: v for k, v in m.items() if k not in skip}
        return agg or None

    def _latest_checkpoint(self, ckpt_dir: str, lineage: str) -> int | None:
        if not os.path.isdir(ckpt_dir):
            return None
        best = None
        for name in os.listdir(ckpt_dir):
            if not name.startswith("superstep="):
                continue
            step = int(name.split("=", 1)[1])
            mp = self._manifest_path(ckpt_dir, step)
            if not os.path.exists(mp):
                continue  # incomplete checkpoint (shard died mid-write)
            with open(mp) as f:
                man = json.load(f)
            if man.get("lineage") != lineage or man.get("num_partitions") != self.P:
                continue
            parts = [f"part-{p:05d}.parquet" for p in range(self.P)]
            d = os.path.join(ckpt_dir, name)
            if all(os.path.exists(os.path.join(d, fp)) for fp in parts):
                best = step if best is None else max(best, step)
        return best


def _agg_stats(stats: list[dict]) -> dict:
    """Per-superstep global reduction of shard stats. Keys are SUMMED
    across shards, except ``max_*`` keys which take the max (e.g.
    BfsSigmaKernel's ``max_level`` is per-shard max semantics —
    summing it inflated the reported level up to P-fold)."""
    agg: dict[str, float] = {}
    for s in stats:
        for k, v in s.items():
            if k.startswith("max_"):
                agg[k] = max(agg.get(k, v), v)
            else:
                agg[k] = agg.get(k, 0) + v
    return agg
