"""Deterministic graph derivation from the driver's testdata tables.

The correctness harness compares Ray pipelines against DuckDB SQL over
the same parquet tables (see __ray_entry__.py). The graph under test
is the **co-purchase part graph**: parts are vertices; two parts are
linked iff they appear in the same order (lineitem self-pairs within
``l_orderkey``). It is symmetric by construction, has triangles and a
power-law-ish degree profile — a faithful small-scale stand-in for the
web link graph the engine targets.

SQL equivalent of the pair stream::

    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey

The Ray side implements the self-join as a bucketed groupby (orders
are small, bounded groups) with a fully vectorized per-bucket cross
product — no per-order Python.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from totem_ray.graph.edges import dedup_edges
from totem_ray.hashing import hash_partition
from totem_ray.nputil import group_starts_sizes, slice_offsets


def _strip_schema_meta(t: pa.Table) -> pa.Table:
    """Drop file-level schema metadata (pandas-written parquet embeds a
    b'pandas' dict that makes pa.Schema UNHASHABLE — every downstream
    sort/groupby reduce then logs 'Failed to hash the schemas' and
    loses Ray's early-exit schema dedup). Zero-copy; fuses with the
    read task."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_table(sf_dir: str, name: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns) \
        .map_batches(_strip_schema_meta, batch_format="pyarrow")


def copurchase_pair_stream(sf_dir: str, num_buckets: int = 32):
    """Non-distinct (src, dst) part pairs per order — the multi-edge
    stream (one row per ordered lineitem pair with different parts)."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_b", pa.array(
            hash_partition(np.asarray(t["l_orderkey"]), num_buckets)))

    def pairs(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"])
        pk = np.asarray(t["l_partkey"])
        order = np.argsort(ok, kind="stable")
        ok, pk = ok[order], pk[order]
        starts, sizes = group_starts_sizes(ok)
        sq = sizes * sizes
        grp = np.repeat(np.arange(len(starts)), sq)
        o = slice_offsets(sq)
        k = sizes[grp]
        a = starts[grp] + o // k
        b = starts[grp] + o % k
        keep = pk[a] != pk[b]
        return pa.table({"src": pa.array(pk[a][keep], type=pa.int64()),
                         "dst": pa.array(pk[b][keep], type=pa.int64())})

    return li.map_batches(add_bucket, batch_format="pyarrow") \
             .groupby("_b").map_groups(pairs, batch_format="pyarrow")


def copurchase_edges(sf_dir: str, num_buckets: int = 32):
    """Distinct co-purchase edges (symmetric simple graph)."""
    return dedup_edges(copurchase_pair_stream(sf_dir, num_buckets))
