"""Per-source checkpointed sweeps for the source-loop algorithms.

closeness / betweenness / stress / APSP run one traversal per source
and union (then aggregate) per-source partial tables. The reference
loops sources fail-stop (totem_betweenness.cu:795-805,
totem_stress.cu:330, totem_apsp.cu); at web scale a sweep over
thousands of sources must survive preemption, so each completed
source's partial lands in ``<checkpoint_dir>/<lineage>/source=<id>/``
atomically (parquet files first, then a durable ``_DONE`` marker; a
directory without the marker is wiped and recomputed). ``resume=True``
reloads finished sources with ``read_parquet`` and traverses only the
remainder. The lineage key is the (algorithm, graph-identity)
fingerprint — a checkpoint from a different graph or algorithm can
never silently mix in — and each source keys its own subdirectory, so
resuming with a superset of sources reuses every finished one.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from totem_ray.hashing import lineage_hash


def sweep_sources(engine, alg: str, sources, run_one: Callable,
                  checkpoint_dir: str | None = None,
                  resume: bool = False) -> tuple[list, dict]:
    """Run ``run_one(source) -> Dataset`` for every source, with
    optional per-source checkpointing.

    Returns ``(partials, info)`` where ``partials`` is one Dataset per
    source (checkpointed sources are ``read_parquet`` of their saved
    partial — byte-stable parquet, not a recompute) and ``info``
    reports ``{sources_loaded, sources_run, lineage, checkpoint}``.

    Without ``checkpoint_dir`` the partials stay fully lazy (no
    mid-sweep materialization) — identical to the plain loop.
    """
    import ray.data

    # graph_fp is a content fingerprint of the edge multiset (weights
    # included) — |V|,|E| alone would let a different graph with equal
    # counts silently mix into a resumed sweep
    lineage = lineage_hash("sweep", alg, engine.total_vertices,
                           engine.total_edges,
                           getattr(engine, "graph_fp", 0))
    base = None
    if checkpoint_dir:
        base = os.path.join(checkpoint_dir, lineage)
        os.makedirs(base, exist_ok=True)

    parts: list = []
    loaded = ran = 0
    for s in sources:
        s = int(s)
        if base is None:
            parts.append(run_one(s))
            ran += 1
            continue
        d = os.path.join(base, f"source={s}")
        marker = os.path.join(d, "_DONE")
        if resume and os.path.exists(marker):
            parts.append(ray.data.read_parquet(d))
            loaded += 1
            continue
        if os.path.isdir(d):
            # incomplete partial from a crashed/duplicated run
            shutil.rmtree(d)
        run_one(s).write_parquet(d)
        _write_done(marker, alg)
        # read back the saved partial so the downstream union consumes
        # the SAME bytes a resumed run would (no live/restored skew)
        parts.append(ray.data.read_parquet(d))
        ran += 1
    return parts, {"sources_loaded": loaded, "sources_run": ran,
                   "lineage": lineage, "checkpoint": base}


def _write_done(marker: str, content: str):
    """Durable marker write: fsync every data FILE (write_parquet runs
    in worker processes and does not fsync), then the directory, then
    the marker — same crash discipline as sources/sink.py. Otherwise a
    host crash could make _DONE durable while the parquet pages are
    not, and resume would permanently skip a corrupt partial."""
    d = os.path.dirname(marker)
    for name in os.listdir(d):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            fd = os.open(p, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
    fd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    with open(marker, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())


def union_all(parts: list):
    if not parts:
        raise ValueError(
            "sweep produced no per-source partials (empty source list "
            "— an empty or src-less edge table derives zero sources); "
            "pass explicit sources= or check the input)")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
