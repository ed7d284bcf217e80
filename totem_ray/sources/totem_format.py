"""Reader for the reference's on-disk edge-list format
(graph_initialize's text parser, src/totem/totem_graph.cu — header
lines ``#Nodes:N`` / ``#Edges:M`` / optional ``#Directed``, then one
``src dst [weight]`` row per edge).

From-scratch numpy parser (np.loadtxt over the non-comment rows);
returns the same (vertex count, edge table, directedness) triple the
reference's loader exposes, as a Ray Dataset of (src, dst[, weight])
plus metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parse_totem_file(path: str) -> dict:
    """-> {num_vertices, num_edges, directed, edges (m, 2) int64,
    weights (m,) float64 | None}."""
    num_vertices = num_edges = 0
    directed = False
    rows: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                key = line[1:].strip()
                low = key.lower()
                if low.startswith("nodes:"):
                    num_vertices = int(key.split(":", 1)[1])
                elif low.startswith("edges:"):
                    num_edges = int(key.split(":", 1)[1])
                elif low.startswith("directed"):
                    directed = True
                elif low.startswith("undirected"):
                    directed = False
                continue
            rows.append(line)
    if rows:
        arr = np.array([r.split() for r in rows])
        if arr.dtype == object or arr.ndim != 2:
            raise ValueError(
                f"{path}: inconsistent column counts across edge rows "
                "(mixed weighted/unweighted lines)")
        if arr.shape[1] not in (2, 3):
            raise ValueError(f"{path}: edge rows must be 'src dst "
                             f"[weight]' (got {arr.shape[1]} columns)")
        # ids parse string -> int64 directly: a float64 hop would
        # silently round ids above 2^53
        edges = arr[:, :2].astype(np.int64)
        weights = arr[:, 2].astype(np.float64) if arr.shape[1] > 2 else None
    else:
        edges = np.empty((0, 2), dtype=np.int64)
        weights = None
    if num_edges and len(edges) != num_edges:
        raise ValueError(f"{path}: header says {num_edges} edges, "
                         f"file has {len(edges)}")
    return {"num_vertices": num_vertices, "num_edges": len(edges),
            "directed": directed, "edges": edges, "weights": weights}


def read_totem_edges(path: str, num_blocks: int | None = None):
    """Ray Dataset of (src, dst[, weight]) from a .totem file. An
    undirected file is symmetrized (the reference loads undirected
    graphs with both arcs present per edge row already, so rows are
    taken as-is; directedness is metadata for the caller)."""
    import ray.data

    meta = parse_totem_file(path)
    cols = {"src": pa.array(meta["edges"][:, 0], type=pa.int64()),
            "dst": pa.array(meta["edges"][:, 1], type=pa.int64())}
    if meta["weights"] is not None:
        cols["weight"] = pa.array(meta["weights"], type=pa.float64())
    ds = ray.data.from_arrow(pa.table(cols))
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds


# ----------------------------------------------------------------------
# Totem binary (.tbin) format — graph_initialize_binary /
# graph_store_binary (src/totem/totem_graph.cu:253-310,881-921; magic
# sniff in graph_initialize, :386-407). Little-endian CSR layout:
#
#   uint32 magic = 0x10102048
#   uint32 vid_size          (sizeof(vid_t), 4 in the default build)
#   uint32 eid_size          (sizeof(eid_t), 4; 8 with EID=64)
#   vid_t  vertex_count
#   eid_t  edge_count
#   bool   valued, weighted, directed   (1 byte each)
#   eid_t  vertices[vertex_count + 1]   (CSR row offsets)
#   [valued]   weight_t values[vertex_count]    (uint32)
#   vid_t  edges[edge_count]            (CSR neighbor list)
#   [weighted] weight_t weights[edge_count]     (uint32)
# ----------------------------------------------------------------------
TOTEM_BINARY_MAGIC = 0x10102048


def is_totem_binary(path: str) -> bool:
    """The reference's magic sniff (graph_initialize,
    totem_graph.cu:386-407): first 4 bytes == BINARY_MAGIC_WORD."""
    with open(path, "rb") as f:
        head = f.read(4)
    return len(head) == 4 and \
        int(np.frombuffer(head, dtype="<u4")[0]) == TOTEM_BINARY_MAGIC


def parse_totem_binary(path: str) -> dict:
    """-> same dict shape as parse_totem_file: {num_vertices,
    num_edges, directed, edges (m, 2) int64, weights | None, values |
    None}. The CSR is expanded to an edge table (src via np.repeat of
    the row extents) — the engine's IR is the edge table, not CSR."""
    with open(path, "rb") as f:
        buf = f.read()
    off = 0

    def take(dtype, n):
        nonlocal off
        a = np.frombuffer(buf, dtype=dtype, count=n, offset=off)
        if len(a) != n:
            raise ValueError(f"{path}: truncated .tbin "
                             f"(wanted {n} x {dtype} at offset {off})")
        off += a.nbytes
        return a

    magic, vid_size, eid_size = (int(x) for x in take("<u4", 3))
    if magic != TOTEM_BINARY_MAGIC:
        raise ValueError(f"{path}: not a Totem binary graph "
                         f"(magic {magic:#x})")
    if vid_size != 4 or eid_size not in (4, 8):
        raise ValueError(f"{path}: unsupported vid/eid sizes "
                         f"({vid_size}/{eid_size}); the reference "
                         "builds with vid=4 and eid=4 (or 8 with EID=64)")
    eid_dt = "<u4" if eid_size == 4 else "<u8"
    nv = int(take("<u4", 1)[0])
    ne = int(take(eid_dt, 1)[0])
    valued, weighted, directed = (bool(x) for x in take("u1", 3))
    vertices = take(eid_dt, nv + 1).astype(np.int64)
    values = take("<u4", nv).astype(np.float64) if valued else None
    nbrs = take("<u4", ne).astype(np.int64)
    weights = take("<u4", ne).astype(np.float64) if weighted else None
    src = np.repeat(np.arange(nv, dtype=np.int64), np.diff(vertices))
    edges = np.column_stack([src, nbrs]) if ne else \
        np.empty((0, 2), dtype=np.int64)
    return {"num_vertices": nv, "num_edges": ne, "directed": directed,
            "edges": edges, "weights": weights, "values": values}


def write_totem_binary(path: str, num_vertices: int, edges: np.ndarray,
                       weights: np.ndarray | None = None,
                       values: np.ndarray | None = None,
                       directed: bool = True):
    """graph_store_binary analog (totem_graph.cu:881-921): build the
    CSR from an (m, 2) edge array and write the reference's little-
    endian layout. eid_size is 4 unless the edge count (or any offset)
    needs 64 bits — matching the EID=64 build."""
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    nv, ne = int(num_vertices), len(edges)
    if nv >= (1 << 32):
        # vid_size is fixed at 4 (the reference's VID=32 build): a
        # larger vertex count would silently wrap in the '<u4' header
        # and in the neighbor-id astype below (ids pass the id<nv
        # guard yet exceed 2^32-1)
        raise ValueError(f"num_vertices {nv} >= 2^32; .tbin vertex ids "
                         "are uint32")
    if edges.size and int(edges.min()) < 0:
        # astype('<u4') would silently wrap a negative id (url-hash
        # ids are routinely negative int64 bit patterns)
        raise ValueError(f"vertex id {int(edges.min())} is negative; "
                         ".tbin ids are dense 0..N-1 — remap first")
    if nv and edges.size and int(edges.max()) >= nv:
        raise ValueError(f"vertex id {int(edges.max())} >= "
                         f"num_vertices {nv}; .tbin ids are dense 0..N-1")

    def _check_u32(a, what: str) -> np.ndarray:
        # the format's weight_t is uint32 — a fractional / negative /
        # >= 2^32 value would be silently truncated by astype, so
        # refuse out-of-domain data (same contract as the dense-id
        # guard above)
        a = np.asarray(a, dtype=np.float64)
        bad = ~np.isfinite(a) | (a < 0) | (a >= 2 ** 32) | (a != np.floor(a))
        if bad.any():
            raise ValueError(
                f".tbin {what} are uint32; value "
                f"{a[bad][0]!r} is not representable (must be an "
                "integer in [0, 2^32))")
        return a
    # length contracts: the header promises nv values and ne weights;
    # a mismatch would either write a corrupt file (the reader then
    # consumes edge bytes as values) or silently truncate via the
    # [order] fancy-index below
    if weights is not None and len(np.asarray(weights)) != ne:
        raise ValueError(f"weights has {len(np.asarray(weights))} entries, "
                         f"expected one per edge ({ne})")
    if values is not None and len(np.asarray(values)) != nv:
        raise ValueError(f"values has {len(np.asarray(values))} entries, "
                         f"expected one per vertex ({nv})")
    order = np.argsort(edges[:, 0], kind="stable")
    srt = edges[order]
    w = None if weights is None else _check_u32(weights, "weights")[order]
    if values is not None:
        values = _check_u32(values, "values")
    counts = np.bincount(srt[:, 0], minlength=nv) if ne else \
        np.zeros(nv, dtype=np.int64)
    vertices = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(counts, out=vertices[1:])
    eid_dt = "<u4" if ne < (1 << 32) else "<u8"
    eid_size = 4 if eid_dt == "<u4" else 8
    with open(path, "wb") as f:
        f.write(np.array([TOTEM_BINARY_MAGIC, 4, eid_size],
                         dtype="<u4").tobytes())
        f.write(np.array([nv], dtype="<u4").tobytes())
        f.write(np.array([ne], dtype=eid_dt).tobytes())
        f.write(np.array([values is not None, w is not None,
                          bool(directed)], dtype="u1").tobytes())
        f.write(vertices.astype(eid_dt).tobytes())
        if values is not None:
            f.write(np.asarray(values).astype("<u4").tobytes())
        f.write(srt[:, 1].astype("<u4").tobytes())
        if w is not None:
            f.write(w.astype("<u4").tobytes())


def read_totem_graph(path: str, num_blocks: int | None = None):
    """graph_initialize analog: sniff the magic word and dispatch to
    the binary or text parser; returns a Ray Dataset of
    (src, dst[, weight])."""
    import ray.data

    meta = parse_totem_binary(path) if is_totem_binary(path) \
        else parse_totem_file(path)
    cols = {"src": pa.array(meta["edges"][:, 0], type=pa.int64()),
            "dst": pa.array(meta["edges"][:, 1], type=pa.int64())}
    if meta.get("weights") is not None:
        cols["weight"] = pa.array(meta["weights"], type=pa.float64())
    ds = ray.data.from_arrow(pa.table(cols))
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds
