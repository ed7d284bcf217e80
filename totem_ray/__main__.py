"""CLI entry — the Ray analog of the reference's totem_benchmark
binary (src/benchmark/totem_benchmark_binary.cu:329-335 /
totem_benchmark_cmdline.cu:115-227): pick an algorithm, an input, a
partition count and an output directory; run; print one metrics JSON
line (the TSV print_timing analog, totem_benchmark_print.cu:85-105).

    python -m totem_ray pagerank --edges /data/edges_parquet \\
        --partitions 32 --out /tmp/pr_out
    python -m totem_ray bfs --pages /data/pages_parquet --source 0
    python -m totem_ray cc --edges ... --resume   # checkpoint resume

Inputs: --edges (parquet with src/dst[/weight]) or --pages (parquet
web pages: url/html — links are extracted and url-hashed first).
Outputs land as parquet under --out (resumable partitioned layout via
--resumable-out). Designed for ``ray job submit -- python -m
totem_ray ...`` on a cluster; locally it starts a local Ray.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

ALGS = ["pagerank", "pagerank_pull", "cc", "labelprop", "bfs",
        "bfs_tree", "bfs_dirop", "bfs_tree_dirop", "sssp", "apsp",
        "closeness", "betweenness", "stress", "pcore", "maxflow",
        "triangles", "clustering_coefficient",
        "hits", "ppr", "pagerank_weighted", "ktruss", "hyperball"]

# source-loop sweeps: --resume/--checkpoint-dir mean per-source
# partial checkpoints (algs/sweep.py), not per-superstep ones
SWEEP_ALGS = ("closeness", "betweenness", "stress", "apsp")


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m totem_ray",
        description="Ray-Data-native Totem-capability graph engine")
    p.add_argument("alg", choices=ALGS)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--edges", help="parquet dir/file with src,dst[,weight]")
    src.add_argument("--pages", help="parquet dir/file with url,html pages")
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--partitioner", choices=["hash", "degree-high",
                                             "degree-low"],
                   default="hash",
                   help="vertex-placement strategy (the reference "
                        "CLI's partitioning algorithm: RANDOM / "
                        "sorted-degree walks, "
                        "totem_benchmark_cmdline.cu): hash = stateless "
                        "id hash; degree-high/low = pin the vertices "
                        "covering an --alpha share of edges (walked "
                        "from the high/low end of the degree order) "
                        "to partition 0, Totem's big-partition "
                        "placement")
    p.add_argument("--alpha", type=float, default=0.2,
                   help="edge share for the degree partitioner's "
                        "pinned partition (reference -a)")
    p.add_argument("--partition-stats", action="store_true",
                   help="also report the remote-edge fraction of the "
                        "chosen partitioning (Totem's rmt_edge header "
                        "column; costs one extra edge scan)")
    p.add_argument("--source", type=int, default=None,
                   help="source vertex (bfs/sssp/...); default: min src")
    p.add_argument("--sink", type=int, default=None, help="maxflow sink")
    p.add_argument("--sample", type=int, default=None,
                   help="source-sample size for closeness/betweenness/"
                        "stress (default 8) and apsp (default: every "
                        "vertex)")
    p.add_argument("--out", default=None,
                   help="output parquet dir (omit to print row count only)")
    p.add_argument("--resumable-out", action="store_true",
                   help="write via the resumable partitioned sink")
    p.add_argument("--resume", action="store_true",
                   help="resume the BSP run from the newest checkpoint")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--max-supersteps", type=int, default=10_000)
    p.add_argument("--directed", action="store_true",
                   help="bfs_dirop: treat the input as directed (disables "
                        "the bottom-up phase, which traverses edges against "
                        "their direction and is only sound on symmetric "
                        "edge tables — the default assumes Graph500-style "
                        "undirected input)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus for standalone local runs")
    p.add_argument("--seeds", default=None,
                   help="ppr: comma-separated seed vertex ids")
    p.add_argument("--k", type=int, default=None,
                   help="ktruss: the k (>= 3)")
    p.add_argument("--rounds", type=int, default=None,
                   help="hits: iteration count (default 5); ktruss: "
                        "bounded peel rounds (default: peel to the "
                        "fixpoint); hyperball: sketch radius in hops "
                        "(default 2; must be >= 1 — radius 0 is just "
                        "the seed registers)")
    return p


def main(argv=None) -> int:
    args = _parser().parse_args(argv)
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    if args.pages:
        from totem_ray.sources.extract import pages_to_edges

        edges = pages_to_edges(rd.read_parquet(args.pages,
                                               columns=["url", "html"]))
    else:
        import os

        totem_file = False
        if os.path.isfile(args.edges) and not args.edges.endswith(".parquet"):
            # sniff, don't assume: an extensionless parquet file (PAR1
            # magic) must still go to read_parquet, not the totem parser
            with open(args.edges, "rb") as f:
                totem_file = f.read(4) != b"PAR1"
        if totem_file:
            # reference-format graph file (.totem text or .tbin binary,
            # dispatched by magic sniff — graph_initialize parity)
            from totem_ray.sources.totem_format import read_totem_graph

            edges = read_totem_graph(args.edges)
        elif os.path.isfile(args.edges):
            # future Ray versions default file_extensions=['parquet'],
            # which would silently skip an extensionless file
            edges = rd.read_parquet(args.edges, file_extensions=None)
        else:
            edges = rd.read_parquet(args.edges)
        if not totem_file:
            # pandas-written parquet embeds unhashable schema metadata
            # (see tpch_graph._strip_schema_meta)
            from totem_ray.pipelines.tpch_graph import _strip_schema_meta
            edges = edges.map_batches(_strip_schema_meta,
                                      batch_format="pyarrow")

    source = args.source
    if source is None and args.alg in ("bfs", "bfs_tree", "bfs_dirop",
                                       "bfs_tree_dirop", "sssp", "maxflow"):
        source = int(edges.min("src"))

    from totem_ray import algs

    partitioner = None
    part_stats = None
    if args.partitioner != "hash" or args.partition_stats:
        # the degree walk / stats scan and the engine build each
        # consume the edge pipeline — materialize once
        edges = edges.materialize()
    if args.partitioner != "hash":
        from totem_ray.graph.edges import degree_table
        from totem_ray.graph.partition import DegreePartitioner

        partitioner = DegreePartitioner.from_degrees(
            degree_table(edges), args.partitions, alpha=args.alpha,
            descending=args.partitioner == "degree-high")
    if args.partition_stats:
        from totem_ray.graph.partition import (HashPartitioner,
                                               partition_stats)

        part_stats = partition_stats(
            edges, partitioner or HashPartitioner(args.partitions))

    kw: dict = {"num_partitions": args.partitions,
                "partitioner": partitioner}
    run_kw: dict = {}
    sweep_kw: dict = {}
    if args.checkpoint_every or args.resume or args.checkpoint_dir:
        if args.alg in ("bfs_dirop", "bfs_tree_dirop", "maxflow",
                        "triangles", "clustering_coefficient", "ktruss"):
            raise SystemExit(
                f"--resume/--checkpoint-every are not supported for "
                f"{args.alg}; a run would silently recompute from scratch")
        if args.alg in SWEEP_ALGS:
            if not args.checkpoint_dir:
                raise SystemExit(f"{args.alg} checkpointing is per-source "
                                 "and needs an explicit --checkpoint-dir")
            sweep_kw = {"checkpoint_dir": args.checkpoint_dir,
                        "resume": args.resume}
        else:
            run_kw = {"checkpoint_dir": args.checkpoint_dir,
                      "checkpoint_every": args.checkpoint_every or 10,
                      "resume": args.resume}

    if args.alg in ("pagerank", "pagerank_pull"):
        out = algs.pagerank(edges, direction="pull"
                            if args.alg == "pagerank_pull" else "push",
                            **kw, **run_kw)
    elif args.alg == "cc":
        out = algs.connected_components(edges, **kw, **run_kw)
    elif args.alg == "labelprop":
        out = algs.label_propagation(edges, **kw, **run_kw)
    elif args.alg == "bfs":
        out = algs.bfs(edges, source=source, **kw, **run_kw)
    elif args.alg == "bfs_tree":
        out = algs.bfs_tree(edges, source=source, **kw, **run_kw)
    elif args.alg == "bfs_dirop":
        out = algs.bfs_stepwise(edges, source=source,
                                undirected=not args.directed, **kw)
    elif args.alg == "bfs_tree_dirop":
        out = algs.bfs_tree_stepwise(edges, source=source,
                                     undirected=not args.directed, **kw)
    elif args.alg == "sssp":
        out = algs.sssp(edges, source=source, **kw, **run_kw)
    elif args.alg == "apsp":
        srcs = None
        if args.sample:
            first = edges.select_columns(["src"]).groupby("src").count() \
                .sort("src").limit(args.sample).take_all()
            srcs = [r["src"] for r in first]
        out = algs.apsp(edges, sources=srcs, **kw, **sweep_kw)
    elif args.alg == "closeness":
        out = algs.closeness(edges, sample=args.sample or 8,
                             **kw, **sweep_kw)
    elif args.alg == "betweenness":
        out = algs.betweenness(edges, sample=args.sample or 8,
                               **kw, **sweep_kw)
    elif args.alg == "stress":
        out = algs.stress(edges, sample=args.sample or 8,
                          **kw, **sweep_kw)
    elif args.alg == "pcore":
        out = algs.pcore(edges, **kw, **run_kw)
    elif args.alg == "maxflow":
        sink = args.sink if args.sink is not None else int(edges.max("dst"))
        out = algs.maxflow(edges, source=source, sink=sink, **kw)
    elif args.alg == "triangles":
        out = {"result": algs.triangle_counts(edges)}
    elif args.alg == "clustering_coefficient":
        out = {"result": algs.clustering_coefficient(edges)}
    elif args.alg == "hits":
        out = algs.hits(edges, rounds=5 if args.rounds is None
                        else args.rounds, **kw, **run_kw)
    elif args.alg == "ppr":
        if not args.seeds:
            raise SystemExit("ppr needs --seeds (comma-separated ids)")
        seeds = tuple(int(s) for s in args.seeds.split(","))
        out = algs.personalized_pagerank(edges, seeds=seeds, **kw, **run_kw)
    elif args.alg == "pagerank_weighted":
        out = algs.pagerank_weighted(edges, **kw, **run_kw)
    elif args.alg == "ktruss":
        if not args.k:
            raise SystemExit("ktruss needs --k (>= 3)")
        out = {"result": algs.ktruss(edges, k=args.k, rounds=args.rounds)}
    elif args.alg == "hyperball":
        hb = algs.hyperball(edges, radius=2 if args.rounds is None
                            else args.rounds, **kw, **run_kw)
        from totem_ray.algs import hyperball_estimates

        out = dict(hb, result=hyperball_estimates(hb["result"],
                                                  p=hb["p"]))
    else:  # pragma: no cover — argparse choices guard this
        raise SystemExit(f"unknown alg {args.alg}")

    res = out["result"]
    if args.out and args.resumable_out:
        from totem_ray.sources.sink import write_parquet_resumable

        key = res.schema().names[0]
        sink_info = write_parquet_resumable(res, args.out, key=key)
        n = rd.read_parquet(args.out).count()
    elif args.out:
        res.write_parquet(args.out)
        sink_info = {"path": args.out}
        n = rd.read_parquet(args.out).count()
    else:
        sink_info = None
        n = res.count()

    metrics = {k: v for k, v in out.items()
               if k in ("iterations", "max_flow", "sources", "sweep")}
    if part_stats is not None:
        metrics["partition_stats"] = part_stats
    eng = out.get("engine")
    if eng is not None:
        metrics["total_vertices"] = eng.total_vertices
        metrics["total_edges"] = eng.total_edges
        eng.shutdown()
    print(json.dumps({"alg": args.alg, "rows": int(n),
                      "sec": round(time.perf_counter() - t0, 3),
                      "partitions": args.partitions,
                      "sink": sink_info, **metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
