"""Resumable partitioned Parquet sink.

The reference persists graphs/results as single binary artifacts
(graph_store_binary, src/totem/totem_graph.cu:680-740) and its runs
are fail-stop. At 100 TB a sink must instead be RESTARTABLE: output
is split into key-hash partition directories, each written atomically
(tmp file -> rename + ``_DONE`` marker), so a re-run of the same job
skips every partition that already finished and recomputes only the
missing ones.

Layout:

    path/
      part-00000/ data.parquet  _DONE
      part-00001/ ...
      _ALL_DONE            (written when every partition is complete)

Readers use ``ray.data.read_parquet(path)`` (the marker files are not
``.parquet`` and are ignored by the reader's extension filter).
Partition dirs deliberately contain no ``=``: a ``part=NNNNN`` name
would be parsed by the reader's default hive partitioning into a
spurious extra ``part`` column on read-back.

Durability: each data file is fsync'd before its atomic rename, and
the partition directory is fsync'd before the ``_DONE`` marker is
written (likewise for ``_ALL_DONE``) — otherwise a host crash could
make the marker durable while the data is not, and the next resume
would permanently skip the corrupt partition.

On a multi-node cluster ``path`` must be shared storage (the same
requirement as ray.data.Dataset.write_parquet with a local path).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from totem_ray.hashing import hash_partition


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def _fsync_dir(path: str):
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _write_marker(path: str, content: str):
    """Durably write a marker file: fsync the containing directory
    FIRST (so the data rename is durable before the marker can be),
    then fsync the marker itself."""
    _fsync_dir(os.path.dirname(path))
    with open(path, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())


def write_parquet_resumable(ds, path: str, key: str,
                            num_partitions: int = 64,
                            partitioner: str = "hash") -> dict:
    """Write ``ds`` to ``path`` as ``num_partitions`` key-hash
    partition directories, skipping partitions already marked done by
    a previous (possibly failed) run.

    With ``partitioner='hash'`` (default) the partition function is
    the deterministic ``hash_partition`` of the ``key`` column, so a
    re-run over the SAME input produces the same rows per partition —
    the property resumability needs. ``partitioner='identity'`` uses
    the ``key`` column value itself as the partition id (values must
    lie in [0, num_partitions)); this is how a layout whose reader
    must know which directory holds which key — e.g. an IVF cell
    index that reads only probed cells — is persisted. Rows route to
    their partition in one groupby shuffle; each partition group
    writes its file atomically from inside the map task (tmp ->
    rename, then the ``_DONE`` marker), so a task killed mid-write
    never leaves a partition half-visible.

    Returns {written: n_partitions_written, skipped:
    n_partitions_skipped, path}.
    """
    import uuid

    import pyarrow.parquet as pq

    if partitioner not in ("hash", "identity"):
        raise ValueError(f"unknown partitioner {partitioner!r}")
    sch = ds.schema()
    if sch is not None and key in sch.names:
        ktype = dict(zip(sch.names, sch.types))[key]
        if not (pa.types.is_integer(ktype) or pa.types.is_temporal(ktype)):
            raise ValueError(
                f"write_parquet_resumable key column {key!r} must be an "
                f"integer id (got {ktype}); hash string keys to int64 "
                f"first (totem_ray.hashing.hash_strings_i64)")
    os.makedirs(path, exist_ok=True)
    # migrate a pre-rename layout (partition dirs were once named
    # part=NNNNN, which read_parquet's hive partitioning mis-parses
    # into a spurious 'part' column): identical content, new name —
    # rename in place so resume still skips the finished partitions
    # instead of rewriting them next to stale duplicates
    migrated = 0
    for name in sorted(os.listdir(path)):
        old = os.path.join(path, name)
        if not (name.startswith("part=") and os.path.isdir(old)):
            continue
        new = os.path.join(path, "part-" + name.split("=", 1)[1])
        if os.path.exists(new):
            raise ValueError(
                f"{path} contains both {name} and {os.path.basename(new)}; "
                "remove one before resuming")
        os.rename(old, new)
        migrated += 1
    if migrated:
        _fsync_dir(path)
    # the partition count AND key column ARE the resume contract:
    # persist both and refuse a mismatched re-run (a different count
    # or key would silently skip/duplicate rows against the old
    # partition files — rows hashing into a partition completed under
    # the old key would be dropped with no error)
    meta_path = os.path.join(path, "_META")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            lines = f.read().splitlines()
        prev = int((lines[0] if lines else "").strip() or 0)
        prev_key = lines[1].strip() if len(lines) > 1 else None
        prev_part = lines[2].strip() if len(lines) > 2 else "hash"
        if prev != num_partitions:
            raise ValueError(
                f"{path} was written with num_partitions={prev}; resume "
                f"with the same value (got {num_partitions})")
        # pre-key _META files (count only) can't validate the key —
        # accept them; every new write records it
        if prev_key is not None and prev_key != key:
            raise ValueError(
                f"{path} was written with key={prev_key!r}; resume "
                f"with the same key (got {key!r})")
        if prev_part != partitioner:
            raise ValueError(
                f"{path} was written with partitioner={prev_part!r}; "
                f"resume with the same value (got {partitioner!r})")
    else:
        with open(meta_path, "w") as f:
            f.write(f"{num_partitions}\n{key}\n{partitioner}")
    done = np.array([_done(os.path.join(path, f"part-{p:05d}"))
                     for p in range(num_partitions)])
    if done.all():
        # self-heal the aggregate marker if a prior run crashed
        # between the last partition _DONE and the _ALL_DONE write
        _write_marker(os.path.join(path, "_ALL_DONE"), str(num_partitions))
        return {"written": 0, "skipped": int(num_partitions), "path": path}

    def add_part(t: pa.Table) -> pa.Table:
        if partitioner == "identity":
            pid = np.asarray(t[key]).astype(np.int64)
            if len(pid) and (pid.min() < 0 or pid.max() >= num_partitions):
                raise ValueError(
                    f"identity partition key {key!r} has values outside "
                    f"[0, {num_partitions})")
        else:
            pid = hash_partition(np.asarray(t[key]), num_partitions)
        keep = ~done[pid]
        t = t.filter(pa.array(keep))
        return t.append_column("_part", pa.array(pid[keep]))

    def write_group(t: pa.Table) -> pa.Table:
        p = int(t["_part"][0].as_py())
        pdir = os.path.join(path, f"part-{p:05d}")
        os.makedirs(pdir, exist_ok=True)
        # unique tmp name: concurrent duplicate runs (an orchestrator
        # retrying a "hung" job) must not interleave into one file
        tmp = os.path.join(pdir, f".data.parquet.{uuid.uuid4().hex}.tmp")
        with pq.ParquetWriter(tmp, t.drop_columns(["_part"]).schema) as w:
            w.write_table(t.drop_columns(["_part"]))
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        _write_marker(os.path.join(pdir, "_DONE"), str(t.num_rows))
        return pa.table({"part": pa.array([p], type=pa.int64()),
                         "rows": pa.array([t.num_rows], type=pa.int64())})

    written = ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(write_group, batch_format="pyarrow") \
        .count()

    # empty partitions (no rows hashed to them) still need markers so
    # the next run knows they are complete
    for p in range(num_partitions):
        pdir = os.path.join(path, f"part-{p:05d}")
        if not done[p] and not _done(pdir):
            os.makedirs(pdir, exist_ok=True)
            _write_marker(os.path.join(pdir, "_DONE"), "0")
    _write_marker(os.path.join(path, "_ALL_DONE"), str(num_partitions))
    return {"written": int(written), "skipped": int(done.sum()),
            "path": path}
