"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "extra": {...gteps/iterations/build times...}}

Headline = PageRank-to-convergence GTEPS on the web-scale stand-in
graph (RMAT s20 ef16, ~1M vertices / ~29M directed deduped edges —
FIXTURES.md bench tier), with Totem's traversed-edges accounting
(trv_edges = E x iterations; rate = trv_edges / alg_exec_sec / 1e9,
src/benchmark/totem_benchmark_print.cu:103,
totem_benchmark_binary.cu:157-159) — algorithm execution time only,
build/partition time reported separately (Totem's time_init/time_par
split).

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default sf0.1).
``--scaling`` runs the headline at every SCALING_CPUS leg (default
2,8,32) in taskset-pinned fresh processes and appends one
self-contained efficiency table to BASELINE.md: the 2->8 pair is the
box's linear region (the N -> 4N-node proxy), while 8->32 runs into
the measured ~40 GB/s single-box memory-bandwidth ceiling, an
emulation artifact that does not exist across real N -> 4N NODES,
where each node brings its own memory channels (see BASELINE.md
methodology). Both pairs are always reported together.
``--wedge-join-study`` runs the distributed triangle join at RMAT
s{BENCH_WJS_SCALE:-21} ef16 under the wave-limited spill bound
(BENCH_WJS_WAVE_BYTES, default 12 GiB) and appends wall time + disk
high-water mark to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/totem_ray_bench"
RMAT_SCALE = int(os.environ.get("BENCH_RMAT_SCALE", "20"))
RMAT_EF = int(os.environ.get("BENCH_RMAT_EF", "16"))
PAGES_SCALE = int(os.environ.get("BENCH_PAGES_SCALE", "14"))
# scaling runs need compute >> per-superstep orchestration floor
# (~60 ms), i.e. ~10^9 edges
SCALING_SCALE = int(os.environ.get("BENCH_SCALING_SCALE", "23"))
SCALING_EF = int(os.environ.get("BENCH_SCALING_EF", "64"))


def _ensure_repo_on_path():
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)


def ensure_rmat_edges(scale: int, ef: int) -> str:
    """Deterministic cached RMAT edge parquet (partitioned files)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(BENCH_DIR, f"rmat_s{scale}_ef{ef}_edges")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    from totem_ray.sources.fixtures import rmat_edges

    n, e = rmat_edges(scale, ef)
    os.makedirs(path, exist_ok=True)
    rows_per_file = 2_000_000
    for i, lo in enumerate(range(0, len(e), rows_per_file)):
        chunk = e[lo:lo + rows_per_file]
        pq.write_table(pa.table({
            "src": pa.array(chunk[:, 0].view(np.int64), type=pa.int64()),
            "dst": pa.array(chunk[:, 1].view(np.int64), type=pa.int64()),
        }), os.path.join(path, f"part-{i:05d}.parquet"))
    with open(done, "w") as f:
        f.write(str(len(e)))
    return path


def ensure_rmat_edges_distributed(scale: int, ef: int,
                                  num_blocks: int = 128) -> str:
    """Deterministic cached RMAT edge parquet, generated IN PARALLEL
    (one independently-seeded chunk per block via map_batches — the
    scale path: single-process generation of 10^9 edges takes ~45 min,
    this takes ~2). Directed, self-loops rejected, no global dedup
    (multi-edges are fine for a throughput benchmark; accounting uses
    the actual edge count)."""
    import ray
    import ray.data
    import pyarrow as pa

    path = os.path.join(BENCH_DIR, f"rmat_s{scale}_ef{ef}_dist")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    if os.path.isdir(path):
        # crash-safe regeneration: write_parquet uses fresh unique
        # filenames, so stale partial files from an interrupted run
        # would survive NEXT to the new set and inflate the edge count
        import shutil
        shutil.rmtree(path)
    from totem_ray.sources.fixtures import rmat_chunk

    own_ray = not ray.is_initialized()
    if own_ray:
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32),
                 include_dashboard=False, logging_level="ERROR")
    m = (ef << scale)
    per = m // num_blocks

    def gen(batch) -> "pa.Table":
        import numpy as np
        outs, outd = [], []
        for bid in np.asarray(batch["id"]):
            s, d = rmat_chunk(scale, per, seed=1985 * 1_000_003 + int(bid))
            outs.append(s)
            outd.append(d)
        s = np.concatenate(outs)
        d = np.concatenate(outd)
        return pa.table({"src": pa.array(s.view(np.int64), type=pa.int64()),
                         "dst": pa.array(d.view(np.int64), type=pa.int64())})

    os.makedirs(path, exist_ok=True)
    ray.data.range(num_blocks, override_num_blocks=num_blocks) \
        .map_batches(gen, batch_size=1, batch_format="pyarrow") \
        .write_parquet(path)
    with open(done, "w") as f:
        f.write(str(m))
    if own_ray:
        ray.shutdown()
    return path


def ensure_pages(scale: int, ef: int = 8, num_hosts: int = 17) -> str:
    from totem_ray.sources.fixtures import rmat_edges
    from totem_ray.sources.pages import write_pages_parquet

    suffix = "" if num_hosts == 17 else f"_h{num_hosts}"
    path = os.path.join(BENCH_DIR, f"pages_s{scale}_ef{ef}{suffix}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    n, e = rmat_edges(scale, ef)
    write_pages_parquet(path, n, e, num_hosts=num_hosts)
    with open(done, "w") as f:
        f.write(str(n))
    return path


def warm_cluster(ncpu: int):
    """Spin up the Ray worker pool and import the library in every
    worker BEFORE any timed phase: a tiny end-to-end build+run. The
    first build of a fresh session otherwise absorbs worker-process
    launch + ray/numpy/pyarrow imports (measured 10x the steady-state
    build on this host) — cold-start cost that Totem's time_init does
    not include either (its process is already running when the timer
    starts, src/benchmark/totem_benchmark_binary.cu:177-204)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from totem_ray.engine.bsp import BspEngine

    rng = np.random.default_rng(3)
    # sized to fault in the object-store pages the headline build will
    # use (~16 B/edge x 3 passes): the FIRST pass over fresh plasma
    # pages pays the page-fault + zeroing cost (measured ~2x on the
    # whole build at s20), which a long-lived cluster never sees again
    n = 8_000_000 if ncpu >= 16 else 500_000
    t = pa.table({"src": pa.array(rng.integers(0, 1 << 19, n),
                                  type=pa.int64()),
                  "dst": pa.array(rng.integers(0, 1 << 19, n),
                                  type=pa.int64())})
    ds = ray.data.from_arrow(t).repartition(max(4, 2 * ncpu)).materialize()
    with BspEngine(max(4, min(32, ncpu))) as eng:
        eng.build(ds, route_by="dst").run(
            "pagerank_pull", {"mode": "rounds", "rounds": 2,
                              "total_vertices": 1 << 19})
    with BspEngine(max(4, min(32, ncpu))) as eng:
        eng.build(ds).run("pagerank", {"mode": "rounds", "rounds": 2})


def bench_headline(ncpu: int, scale: int = None, ef: int = None,
                   num_partitions: int = None) -> dict:
    """RMAT PageRank to convergence: GTEPS + iterations.

    Runs the pull-direction engine (broadcast contrib vectors — the
    reference benchmark's page_rank_incoming_hybrid variant): one
    warm-up run (build caches, worker import), then the timed run.
    """
    import ray
    import ray.data
    from totem_ray.engine.bsp import BspEngine

    scale = scale if scale is not None else RMAT_SCALE
    ef = ef if ef is not None else RMAT_EF
    if os.environ.get("BENCH_DIST_EDGES"):
        edges_path = ensure_rmat_edges_distributed(scale, ef)
    else:
        edges_path = ensure_rmat_edges(scale, ef)
    ds = ray.data.read_parquet(edges_path)
    if not os.environ.get("BENCH_STREAM_READ"):
        # small graphs: pre-materialize so read time stays out of the
        # build measurement; 1B-edge scaling inputs stream instead
        # (materialized input + routed slices would double-book plasma)
        ds = ds.materialize()
    P = num_partitions \
        or int(os.environ.get("BENCH_NUM_PARTITIONS", "0") or 0) \
        or max(4, min(32, ncpu))
    eng = None
    t_build = float("inf")
    build_timings = {}
    for _ in range(REPEATS):
        if eng is not None:
            eng.shutdown()
        t0 = time.perf_counter()
        eng = BspEngine(P).build(ds, route_by="dst")
        dt = time.perf_counter() - t0
        if dt < t_build:
            # keep the phase breakdown of the SAME build the reported
            # min came from (a mismatched pair would not sum up)
            t_build = dt
            build_timings = {k: round(v, 3) for k, v in
                             getattr(eng, "build_timings", {}).items()}
    eng.run("pagerank_pull", {"mode": "converge", "tol": 1e-6},
            max_supersteps=200)  # warm-up
    # best of 3 timed runs: single-node supersteps are ~50 ms, so one
    # scheduler hiccup skews a single measurement by 2x
    t_exec = float("inf")
    out = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = eng.run("pagerank_pull", {"mode": "converge", "tol": 1e-6},
                    max_supersteps=200)
        dt = time.perf_counter() - t0
        if dt < t_exec:
            t_exec, out = dt, o
    iters = out["iterations"]
    edges = eng.total_edges
    verts = eng.total_vertices
    eng.shutdown()
    gteps = edges * iters / t_exec / 1e9
    return {"sec": t_exec, "build_sec": t_build, "iterations": iters,
            "edges": edges, "vertices": verts, "gteps": gteps,
            "converged": out["converged"], "num_partitions": P,
            "build_timings": build_timings}


def bench_partition_quality(ncpu: int) -> dict:
    """Totem's cut-quality header metric (rmt_edge, the fraction of
    cross-partition edges — print_header,
    src/benchmark/totem_benchmark_print.cu:71-82) for the random-hash
    vs degree-aware partitioners on the RMAT headline graph, plus the
    PageRank exec effect. The reference's LOW/HIGH alpha walk
    (totem_partition.cu:322-339) places the hub set together — on a
    power-law graph that turns the hub<->hub core into intra-partition
    edges, which is the skew-taming claim this measures."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from totem_ray.engine.bsp import BspEngine
    from totem_ray.graph.edges import vertex_degrees
    from totem_ray.graph.partition import (DegreePartitioner,
                                           HashPartitioner,
                                           partition_stats)

    edges_path = ensure_rmat_edges(RMAT_SCALE, RMAT_EF)
    ds = ray.data.read_parquet(edges_path).materialize()
    P = max(4, min(32, ncpu))
    out = {}

    def total_deg(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["v"],
                         "degree": pc.add(t["out_degree"], t["in_degree"])})

    degs = vertex_degrees(ds).map_batches(total_deg, batch_format="pyarrow")
    parts = {
        "hash": HashPartitioner(P),
        "degree_high_a20": DegreePartitioner.from_degrees(
            degs, P, alpha=0.2, descending=True),
    }
    for name, part in parts.items():
        st = partition_stats(ds, part)
        t_exec = float("inf")
        with BspEngine(P, partitioner=part) as eng:
            eng.build(ds)
            eng.run("pagerank", {"mode": "converge", "tol": 1e-6},
                    max_supersteps=200)  # warm-up
            for _ in range(2):
                t0 = time.perf_counter()
                o = eng.run("pagerank", {"mode": "converge", "tol": 1e-6},
                            max_supersteps=200)
                t_exec = min(t_exec, time.perf_counter() - t0)
        out[name] = {"rmt_edge_frac": round(st["rmt_edge_frac"], 4),
                     "load_imbalance": round(st["load_imbalance"], 3),
                     "max_shard_edges": st["max_shard_edges"],
                     "pagerank_exec_sec": round(t_exec, 3),
                     "iterations": o["iterations"]}
    return out


REPEATS = max(1, int(os.environ.get("BENCH_REPEATS", "2") or "2"))


#: per-measurement raw samples, keyed by pipeline name — lets a reader
#: distinguish 'genuinely slow' from 'one contention spike' (this host
#: oscillates on a minutes scale, so a min-of-2 can still catch two
#: bad windows back to back)
SAMPLES: dict[str, list[float]] = {}


def best_time(fn, repeats: int | None = None, label: str | None = None) -> float:
    """Min wall time over n runs. This sandbox host is multi-tenant
    and contention spikes only ever ADD time, so the min of a few
    samples is the estimate closest to code truth (the canary bracket
    still records how noisy the window was). All samples are recorded
    in SAMPLES[label] for the JSON output."""
    samples = []
    for _ in range(repeats or REPEATS):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    if label:
        SAMPLES[label] = samples
    return min(samples)


def bench_sf_queries(sf_dir: str, ncpu: int) -> dict:
    """Per-pipeline wall times over the driver's sf tables
    (min of BENCH_REPEATS runs each, see best_time)."""
    from totem_ray.algs import triangle_counts
    from totem_ray.engine.bsp import BspEngine
    from totem_ray.pipelines.tpch_graph import (copurchase_edges,
                                                copurchase_pair_stream)

    times = {}
    P = max(4, ncpu // 2)

    eng = None
    best = float("inf")
    for _ in range(REPEATS):
        if eng is not None:
            eng.shutdown()
        t0 = time.perf_counter()
        eng = BspEngine(P).build(copurchase_edges(sf_dir))
        best = min(best, time.perf_counter() - t0)
    times["copurchase_build"] = best

    pr_iters = []

    def run_pr():
        pr = eng.run("pagerank", {"mode": "converge", "tol": 1e-6},
                     max_supersteps=200)
        pr_iters.append(pr["iterations"])

    times["copurchase_pagerank"] = best_time(run_pr, label="copurchase_pagerank")
    times["copurchase_pagerank_iters"] = pr_iters[-1]

    times["copurchase_cc"] = best_time(
        lambda: eng.run("connected_components", {}),
        label="copurchase_cc")
    eng.shutdown()

    times["copurchase_triangles"] = best_time(
        lambda: triangle_counts(copurchase_pair_stream(sf_dir),
                                num_buckets=64, num_join_partitions=32,
                                assume_simple=True).count(),
        label="copurchase_triangles")

    # the distributed join path is what 100-TB runs take (past the
    # broadcast gate) — time it explicitly (broadcast_max_edges=0)
    times["copurchase_triangles_join"] = best_time(
        lambda: triangle_counts(copurchase_pair_stream(sf_dir),
                                num_buckets=64, num_join_partitions=32,
                                assume_simple=True,
                                broadcast_max_edges=0).count(),
        label="copurchase_triangles_join")
    return times


def bench_extraction(ncpu: int) -> dict:
    """Pages -> text + links throughput (the ingest front-end)."""
    import ray.data
    from totem_ray.sources.extract import pages_to_edges, pages_to_text

    pages_path = ensure_pages(PAGES_SCALE)
    ds = ray.data.read_parquet(pages_path, columns=["url", "html"])
    counts = {}
    t_links = best_time(
        lambda: counts.__setitem__("links", pages_to_edges(ds).count()),
        label="link_extract")
    t_text = best_time(
        lambda: counts.__setitem__("pages", pages_to_text(ds).count()),
        label="text_extract")
    return {"link_extract_sec": t_links, "text_extract_sec": t_text,
            "n_links": counts["links"], "n_pages": counts["pages"]}


def bench_dedup(sf_dir: str) -> dict:
    from totem_ray.functions.dedup import minhash_dedup_groups
    from totem_ray.pipelines.tpch_graph import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    counts = {}
    t = best_time(
        lambda: counts.__setitem__("n",
                                   minhash_dedup_groups(docs,
                                                        tau=0.5).count()),
        label="minhash_dedup")
    return {"minhash_dedup_sec": t, "n_docs": counts["n"]}


def bench_corpus_pipeline(scale: int | None = None,
                          num_hosts: int = 1024) -> dict:
    """End-to-end corpus pipeline — the composed run a 100-TB user
    actually executes, timed per stage in ONE pass (not best-of;
    composition cost IS the metric): pages -> host-level weighted
    link graph (sources/extract.pages_to_host_edges) -> weighted
    PageRank to convergence -> per-doc duplicated-shingle repetition
    score -> MinHash near-dup groups over the pages' own extracted
    text (dup groups via the engine's BSP CC). Every stage consumes
    the previous stage's Dataset."""
    import ray.data

    from totem_ray.algs import pagerank_weighted
    from totem_ray.functions.dedup import (duplicate_shingle_fraction,
                                           minhash_dedup_groups)
    from totem_ray.hashing import hash_strings_i64
    from totem_ray.sources.extract import (pages_to_host_edges,
                                           pages_to_text)

    if scale is None:
        scale = int(os.environ.get("BENCH_CORPUS_SCALE", "17"))
    pages_path = ensure_pages(scale, num_hosts=num_hosts)
    stages = {}
    t_all = time.perf_counter()

    pages = ray.data.read_parquet(pages_path, columns=["url", "html"])
    t0 = time.perf_counter()
    host_edges = pages_to_host_edges(pages).materialize()
    n_host_edges = host_edges.count()
    stages["host_graph_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pr = pagerank_weighted(host_edges, num_partitions=8)
    n_hosts = pr["result"].count()
    pr["engine"].shutdown()
    stages["weighted_pagerank_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()

    def add_doc_id(t):
        import pyarrow as _pa
        return t.append_column(
            "doc_id", _pa.array(hash_strings_i64(t["url"]),
                                type=_pa.int64()))

    docs = pages_to_text(pages) \
        .map_batches(add_doc_id, batch_format="pyarrow") \
        .select_columns(["doc_id", "text"]).materialize()
    stages["text_extract_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_scored = duplicate_shingle_fraction(docs).count()
    stages["dup_shingle_score_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_groups = minhash_dedup_groups(docs, tau=0.5).count()
    stages["minhash_dedup_sec"] = round(time.perf_counter() - t0, 3)

    stages["total_sec"] = round(time.perf_counter() - t_all, 3)
    return {**stages, "n_pages": 1 << scale, "n_hosts": int(n_hosts),
            "n_host_edges": int(n_host_edges),
            "n_scored_docs": int(n_scored),
            "n_doc_rows": int(n_groups), "scale": scale,
            "num_hosts_cap": num_hosts}


def run_corpus_1m():
    """The 1M-page composed corpus pipeline (BENCH_CORPUS_SCALE=20),
    recorded once per round in BASELINE.md — the per-round driver
    bench runs the same pipeline at s17 (131k pages) to keep its
    wall time bounded."""
    import ray

    _ensure_repo_on_path()
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    out = bench_corpus_pipeline(scale=20)
    out["metric"] = "corpus_pipeline_1m"
    out["num_cpus"] = ncpu
    out["cpu_canary_sort10m_sec"] = cpu_canary()
    print(json.dumps(out))
    stamp = __import__("datetime").datetime.now().isoformat(
        timespec="seconds")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write(f"""
## Composed corpus pipeline at 1M pages (bench.py --corpus-1m, {stamp})

pages (2^20 = 1,048,576, {out['num_hosts_cap']} hosts) -> host-level
weighted link graph ({out['n_host_edges']:,} host edges) -> weighted
PageRank to convergence ({out['n_hosts']:,} hosts) -> MinHash
near-dup groups over the extracted text ({out['n_doc_rows']:,}
doc rows), num_cpus={out['num_cpus']}, canary
{out['cpu_canary_sort10m_sec']}:

| stage | sec |
|---|---|
| host graph (extract + aggregate) | {out['host_graph_sec']} |
| weighted PageRank | {out['weighted_pagerank_sec']} |
| text extract (+ doc ids) | {out['text_extract_sec']} |
| duplicated-shingle repetition score | {out['dup_shingle_score_sec']} |
| minhash dedup (incl. BSP-CC groups) | {out['minhash_dedup_sec']} |
| **composed total** | **{out['total_sec']}** |
""")
    ray.shutdown()


def cpu_canary() -> float:
    """Single-core machine-speed canary: seconds to np.sort 10M
    doubles (fixed seed). Recorded in ``extra`` so runs on this
    sandbox are comparable across sessions — the host is multi-tenant
    and its per-core speed has been observed to swing >10x between
    sessions (reference-era value on a healthy host: ~0.9 s). Divide
    wall-times by (canary / 0.9) to normalize."""
    import numpy as np

    a = np.random.default_rng(7).random(10_000_000)
    t0 = time.perf_counter()
    np.sort(a)
    return round(time.perf_counter() - t0, 3)


def canary_summary(samples: list) -> dict:
    """Min/median/max + a reliability verdict over canary samples
    taken before, during, and after the run. A one-shot canary at
    bench start cannot capture contention DURING the run (round-2's
    BENCH_r02.json had a 0.277 s start canary alongside pipelines 2-5x
    slower than a healthy host — internally inconsistent); a spread
    > 2x between samples marks the whole run unreliable."""
    import statistics

    s = sorted(samples)
    spread = (s[-1] / s[0]) if s[0] > 0 else float("inf")
    return {"samples": samples,
            "min": s[0], "median": round(statistics.median(s), 3),
            "max": s[-1], "spread": round(spread, 2),
            "reliable": spread <= 2.0}


def run_once(headline_only: bool = False) -> dict:
    _ensure_repo_on_path()
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    canaries = [cpu_canary()]

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm page cache: one untimed read (same path selection as
    # bench_headline — the distributed artifact when BENCH_DIST_EDGES)
    import pyarrow.parquet as pq
    if os.environ.get("BENCH_DIST_EDGES"):
        edges_path = ensure_rmat_edges_distributed(RMAT_SCALE, RMAT_EF)
    else:
        edges_path = ensure_rmat_edges(RMAT_SCALE, RMAT_EF)
    for f in sorted(os.listdir(edges_path)):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(edges_path, f))
    warm_cluster(ncpu)

    head = bench_headline(ncpu)
    queries = {"rmat_pagerank": head["sec"],
               "rmat_pagerank_build": head["build_sec"]}
    extra = {"headline": head}
    canaries.append(cpu_canary())  # mid-run: after the headline
    if not headline_only:
        q = bench_sf_queries(sf_dir, ncpu)
        queries.update({k: v for k, v in q.items() if not k.endswith("_iters")})
        canaries.append(cpu_canary())  # mid-run: after sf queries
        ext = bench_extraction(ncpu)
        queries["link_extract"] = ext["link_extract_sec"]
        queries["text_extract"] = ext["text_extract_sec"]
        dd = bench_dedup(sf_dir)
        queries["minhash_dedup"] = dd["minhash_dedup_sec"]
        cp = bench_corpus_pipeline()
        queries["corpus_pipeline"] = cp["total_sec"]
        extra["corpus_pipeline"] = cp
        extra["sf_queries"] = q
        extra["extraction"] = ext
        extra["dedup"] = dd
        extra["samples"] = dict(SAMPLES)
        try:
            extra["partition_quality"] = bench_partition_quality(ncpu)
        except Exception as e:  # diagnostic section must not sink the run
            extra["partition_quality"] = {"error": f"{type(e).__name__}: {e}"}
    canaries.append(cpu_canary())  # end of run

    total = sum(v for v in queries.values())
    result = {
        "metric": "pagerank_gteps_and_pipeline_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir,
        "num_cpus": ncpu,
        "extra": {"gteps": round(head["gteps"], 4),
                  "cpu_canary_sort10m_sec": canaries[0],
                  "cpu_canary": canary_summary(canaries),
                  "build_timings": head.get("build_timings"),
                  "iterations": head["iterations"],
                  "edges": head["edges"],
                  "vertices": head["vertices"],
                  "rmat_scale": RMAT_SCALE,
                  **{k: v for k, v in extra.items() if k != "headline"}},
    }
    ray.shutdown()
    return result


def run_scaling():
    """Fresh-process runs at every SCALING_CPUS leg (default 2,8,32)
    on the SAME input (RMAT s{SCALING_SCALE} ef{SCALING_EF}, fixed
    P=32 partitioning — at two cluster sizes the partitioning stays
    fixed and nodes vary); reports throughput at every leg plus the
    scaling efficiency of EACH consecutive pair, so one run records
    both the in-linear-region 2->8 evidence and the 8->32 leg against
    the documented single-box memory-bandwidth ceiling (one block in
    BASELINE.md is self-contained — no favorable-pair selection).

    The small run is pinned with ``taskset`` to n PHYSICAL cores:
    shard actors are num_cpus=0 (they coexist with Dataset tasks), so
    Ray's logical CPU budget alone would not constrain the BSP exec
    phase — OS-level affinity is what actually emulates the smaller
    cluster."""
    _ensure_repo_on_path()
    # shared input, generated once in parallel
    ensure_rmat_edges_distributed(SCALING_SCALE, SCALING_EF)
    have_taskset = os.path.exists("/usr/bin/taskset")
    cpus = sorted({int(x) for x in
                   os.environ.get("SCALING_CPUS", "2,8,32").split(",")})
    if len(cpus) < 2:
        raise SystemExit("SCALING_CPUS needs at least two cpu counts")
    results = {}
    for ncpu in cpus:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   BENCH_RMAT_SCALE=str(SCALING_SCALE),
                   BENCH_RMAT_EF=str(SCALING_EF),
                   BENCH_NUM_PARTITIONS="32",
                   BENCH_DIST_EDGES="1",
                   # stream the 8+ GB input: materialized input +
                   # routed per-shard slices would double-book plasma
                   # and spill during the timed exec phase
                   BENCH_STREAM_READ="1",
                   # efficiency is an exec-phase ratio; a second
                   # 100s+ build per leg would only add noise exposure
                   BENCH_REPEATS="1")
        cmd = [sys.executable, os.path.abspath(__file__), "--headline-only"]
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    legs = [{"cpus": n,
             "gteps": results[n]["extra"]["gteps"],
             "sec": results[n]["queries"]["rmat_pagerank"],
             "cpu_canary_sort10m_sec":
                 results[n]["extra"].get("cpu_canary_sort10m_sec"),
             "cpu_canary": results[n]["extra"].get("cpu_canary")}
            for n in cpus]
    pairs = [{"cpus_low": lo, "cpus_high": hi,
              "scaling_efficiency": round(
                  (results[hi]["extra"]["gteps"]
                   / results[lo]["extra"]["gteps"]) / (hi / lo), 3)}
             for lo, hi in zip(cpus, cpus[1:])]
    summary = {
        "metric": "pagerank_scaling_efficiency",
        "scale": SCALING_SCALE, "ef": SCALING_EF,
        "legs": legs, "pairs": pairs,
        "iterations": results[cpus[-1]]["extra"]["iterations"],
        "edges": results[cpus[-1]]["extra"]["edges"],
        # headline criterion number = the N->4N proxy pair in the
        # linear region (the smallest pair); the rest are context
        "scaling_efficiency": pairs[0]["scaling_efficiency"],
        "cpus_low": pairs[0]["cpus_low"],
        "cpus_high": pairs[0]["cpus_high"],
    }
    print(json.dumps(summary))
    _append_baseline(summary)


def _append_baseline(s: dict):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    import datetime

    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    leg_rows = "\n".join(
        f"| {leg['cpus']} | {leg['sec']} | {leg['gteps']} |"
        for leg in s["legs"])
    pair_rows = "\n".join(
        f"| {p['cpus_low']} -> {p['cpus_high']} | "
        f"{p['scaling_efficiency']} |"
        for p in s["pairs"])
    block = f"""
## Measured scaling (this engine, bench.py --scaling, {stamp})

RMAT s{s.get('scale', RMAT_SCALE)} ef{s.get('ef', RMAT_EF)} ({s['edges']:,} directed edges, multi-edges preserved),
pull-direction engine (pagerank_pull, broadcast contrib vectors), P=32,
PageRank to convergence (L1 residual <= 1e-6, {s['iterations']} iterations),
GTEPS = edges x iterations / alg_exec_sec / 1e9 (Totem accounting);
taskset-pinned fresh processes, same input per leg:

| num_cpus | alg_exec sec | GTEPS |
|---|---|---|
{leg_rows}

| pair | scaling efficiency (1.0 = linear) |
|---|---|
{pair_rows}

The smallest pair is the N -> 4N-node proxy (in the linear region of
this box). The highest leg runs into the measured ~40 GB/s single-box
memory-bandwidth ceiling (validated by the 2x-graph constant-GB/s
test, BASELINE.md r4 section) — a shared-memory emulation artifact
that a real multi-node cluster, with per-node memory channels, does
not share.
"""
    with open(path, "a") as f:
        f.write(block)


def run_wedge_join_study():
    """Distributed triangle join at RMAT s{BENCH_WJS_SCALE} ef16 with
    the wave-limited spill bound — the >100M-edge regime where the
    join plan is the only plan, demonstrated within one box's disk.
    Tracks the disk high-water mark (free-space delta on the spill
    filesystem, polled) alongside wall time; appends both to
    BASELINE.md's wedge-volume table context and prints one JSON
    line."""
    import shutil
    import threading

    _ensure_repo_on_path()
    scale = int(os.environ.get("BENCH_WJS_SCALE", "21"))
    ef = int(os.environ.get("BENCH_WJS_EF", "16"))
    wave_bytes = int(os.environ.get("BENCH_WJS_WAVE_BYTES",
                                    str(12 << 30)))
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32") or 32)
    path = ensure_rmat_edges_distributed(scale, ef)

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from totem_ray.algs.triangles import triangle_counts

    free0 = shutil.disk_usage("/tmp").free
    peak = {"used": 0}
    stop = threading.Event()

    def monitor():
        while not stop.is_set():
            used = free0 - shutil.disk_usage("/tmp").free
            if used > peak["used"]:
                peak["used"] = used
            stop.wait(2.0)

    th = threading.Thread(target=monitor, daemon=True)
    th.start()
    edges = ray.data.read_parquet(path)
    t0 = time.perf_counter()
    tri = triangle_counts(edges, num_buckets=64,
                          num_join_partitions=32,
                          broadcast_max_edges=0,
                          wedge_wave_bytes=wave_bytes)
    import numpy as _np
    import pyarrow as _pa

    def _part_sum(t):
        return _pa.table({"s": _pa.array(
            [int(_np.asarray(t["triangles"]).sum())], type=_pa.int64())})

    total = int(tri.map_batches(_part_sum,
                                batch_format="pyarrow").sum("s"))
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=5)
    canary = cpu_canary()
    out = {
        "metric": "wedge_join_study",
        "scale": scale, "ef": ef,
        "wedge_wave_bytes": wave_bytes,
        "num_cpus": ncpu,
        "join_wall_sec": round(wall, 1),
        "triangle_credit_sum": total,
        "peak_disk_used_bytes": int(peak["used"]),
        "peak_disk_used_gb": round(peak["used"] / (1 << 30), 2),
        "cpu_canary_sort10m_sec": canary,
    }
    print(json.dumps(out))
    stamp = __import__("datetime").datetime.now().isoformat(
        timespec="seconds")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.md"), "a") as f:
        f.write(f"""
## Wave-limited distributed triangle join (bench.py --wedge-join-study, {stamp})

RMAT s{scale} ef{ef}, join plan forced (broadcast_max_edges=0),
wedge_wave_bytes={wave_bytes >> 30} GiB, num_cpus={ncpu}:
wall **{out['join_wall_sec']} s**, disk high-water mark
**{out['peak_disk_used_gb']} GB** (free-space delta on the spill
filesystem, 2 s poll), per-vertex triangle credit sum
{total:,} (canary {canary}).
""")
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--wedge-join-study" in sys.argv:
        run_wedge_join_study()
    elif "--corpus-1m" in sys.argv:
        run_corpus_1m()
    else:
        print(json.dumps(run_once(headline_only="--headline-only" in sys.argv)))
