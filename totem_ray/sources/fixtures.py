"""Deterministic topology fixtures mirroring the reference test corpus.

Each generator returns ``(num_vertices, edges)`` where ``edges`` is an
``(m, 2) uint64`` array of directed rows. Undirected topologies are
stored symmetrized (both directions present), mirroring the reference
storage convention (/root/reference data fixtures, e.g.
``data/chain_4_comp_40_nodes.totem``; generator ``alter undirected``,
src/generator/totem_generator.cc:631-680).

See FIXTURES.md for the fixture table and the expected closed-form
outputs each one pins.
"""

from __future__ import annotations

import numpy as np

SEED = 42


def _sym(pairs: np.ndarray) -> np.ndarray:
    """Symmetrize: emit both directions for each undirected pair."""
    return np.concatenate([pairs, pairs[:, ::-1]], axis=0).astype(np.uint64)


def single_node():
    return 1, np.empty((0, 2), dtype=np.uint64)


def single_node_loop():
    return 1, np.array([[0, 0]], dtype=np.uint64)


def chain(n: int):
    i = np.arange(n - 1, dtype=np.uint64)
    return n, _sym(np.stack([i, i + 1], axis=1))


def chain_4_comp_40():
    """4 chains over vertices 0-9, 10-19, 20-30, 31-39
    (data/chain_4_comp_40_nodes.totem)."""
    segs = [(0, 9), (10, 19), (20, 30), (31, 39)]
    pairs = []
    for lo, hi in segs:
        i = np.arange(lo, hi, dtype=np.uint64)
        pairs.append(np.stack([i, i + 1], axis=1))
    return 40, _sym(np.concatenate(pairs, axis=0))


def star(n: int):
    i = np.arange(1, n, dtype=np.uint64)
    return n, _sym(np.stack([np.zeros(n - 1, dtype=np.uint64), i], axis=1))


def complete(n: int):
    a = np.arange(n, dtype=np.uint64)
    src = np.repeat(a, n)
    dst = np.tile(a, n)
    mask = src != dst
    return n, np.stack([src[mask], dst[mask]], axis=1)


def wheel(n: int):
    """Hub 0 + rim cycle over 1..n-1 (data/wheel_graph_1000_nodes.totem)."""
    rim = np.arange(1, n, dtype=np.uint64)
    nxt = np.roll(rim, -1)
    spokes = np.stack([np.zeros(n - 1, dtype=np.uint64), rim], axis=1)
    cycle = np.stack([rim, nxt], axis=1)
    return n, _sym(np.concatenate([spokes, cycle], axis=0))


def grid(rows: int = 3, cols: int = 5):
    """Row-major 4-neighborhood grid (data/grid_graph_15_nodes_weight.totem)."""
    pairs = []
    for r in range(rows):
        for c in range(cols):
            v = r * cols + c
            if c + 1 < cols:
                pairs.append((v, v + 1))
            if r + 1 < rows:
                pairs.append((v, v + cols))
    return rows * cols, _sym(np.array(pairs, dtype=np.uint64))


def disconnected(n: int):
    return n, np.empty((0, 2), dtype=np.uint64)


def rmat_chunk(scale: int, m: int, seed: int,
               a: float = 0.57, b: float = 0.19, c: float = 0.19):
    """One independently-seeded chunk of ``m`` RMAT edge draws
    (directed, self-loops rejected, ids NOT permuted). Building block
    for distributed generation: a full graph is the union of chunks
    with distinct seeds — deterministic in (scale, per-chunk m, seed
    schedule)."""
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.uint64)
    dst = np.zeros(m, dtype=np.uint64)
    for _ in range(scale):
        r = rng.random(m)
        src_bit = (r >= a + b).astype(np.uint64)
        r2 = rng.random(m)
        dst_bit = np.where(src_bit == 0, (r >= a).astype(np.uint64),
                           (r2 >= c / max(c + (1 - a - b - c), 1e-12))
                           .astype(np.uint64))
        src = (src << np.uint64(1)) | src_bit
        dst = (dst << np.uint64(1)) | dst_bit
    keep = src != dst
    return src[keep], dst[keep]


def rmat_edges(scale: int, edge_factor: int = 16, seed: int = SEED,
               a: float = 0.57, b: float = 0.19, c: float = 0.19,
               symmetrize: bool = True, dedup: bool = True):
    """RMAT generator (SNAP-style A/B/C/D quadrant recursion).

    Mirrors the reference generator semantics (create rmat,
    src/generator/totem_generator.cc:377-468: A/B/C/D=.57/.19/.19/.05,
    self-loops rejected, vertex ids permuted) but is a from-scratch
    vectorized numpy implementation with its own fixed seed — the
    fixture is defined by THIS function, not by bitwise parity with
    the reference's rand() stream.
    """
    rng = np.random.default_rng(seed)
    n = 1 << scale
    m = edge_factor * n
    src = np.zeros(m, dtype=np.uint64)
    dst = np.zeros(m, dtype=np.uint64)
    for level in range(scale):
        r = rng.random(m)
        # quadrant draw: a=(0,0) b=(0,1) c=(1,0) d=(1,1)
        src_bit = (r >= a + b).astype(np.uint64)
        r2 = rng.random(m)
        dst_bit = np.where(src_bit == 0, (r >= a).astype(np.uint64),
                           (r2 >= c / max(c + (1 - a - b - c), 1e-12)).astype(np.uint64))
        src = (src << np.uint64(1)) | src_bit
        dst = (dst << np.uint64(1)) | dst_bit
    keep = src != dst  # reject self loops (totem_generator.cc:418-421)
    src, dst = src[keep], dst[keep]
    # permute vertex ids to anonymize hubs (totem_generator.cc:143-158)
    perm = rng.permutation(n).astype(np.uint64)
    src, dst = perm[src.astype(np.int64)], perm[dst.astype(np.int64)]
    if scale <= 31 and (symmetrize or dedup):
        # pack (src, dst) into one u64 key: 1-D sort/unique is radix
        # friendly — the 2-column void-dtype unique is ~10x slower at
        # 10^9 rows
        key = (src << np.uint64(32)) | dst
        if symmetrize:
            key = np.concatenate([key, (dst << np.uint64(32)) | src])
        if dedup:
            key = np.unique(key)
        edges = np.empty((len(key), 2), dtype=np.uint64)
        edges[:, 0] = key >> np.uint64(32)
        edges[:, 1] = key & np.uint64(0xFFFFFFFF)
        return n, edges
    edges = np.stack([src, dst], axis=1)
    if symmetrize:
        edges = _sym(edges)
    if dedup:
        edges = np.unique(edges, axis=0)
    return n, edges.astype(np.uint64)


def uniform_edges(scale: int, edge_factor: int = 16, seed: int = SEED,
                  symmetrize: bool = True, dedup: bool = True):
    """Uniform random edges, no self loops (totem_generator.cc:470-495)."""
    rng = np.random.default_rng(seed)
    n = 1 << scale
    m = edge_factor * n
    src = rng.integers(0, n, size=m, dtype=np.uint64)
    dst = rng.integers(0, n, size=m, dtype=np.uint64)
    keep = src != dst
    edges = np.stack([src[keep], dst[keep]], axis=1)
    if symmetrize:
        edges = _sym(edges)
    if dedup:
        edges = np.unique(edges, axis=0)
    return n, edges.astype(np.uint64)


TOPOLOGIES = {
    "single_node": single_node,
    "single_node_loop": single_node_loop,
    "chain_100": lambda: chain(100),
    "chain_1000": lambda: chain(1000),
    "chain_4_comp_40": chain_4_comp_40,
    "star_1000": lambda: star(1000),
    "complete_300": lambda: complete(300),
    "wheel_1000": lambda: wheel(1000),
    "grid_15": lambda: grid(3, 5),
    "disconnected_1000": lambda: disconnected(1000),
}


def topology_edges(name: str):
    """Return (num_vertices, edges) for a named fixture topology."""
    if name in TOPOLOGIES:
        return TOPOLOGIES[name]()
    if name.startswith("rmat_s"):
        # e.g. rmat_s14_ef16
        body = name[len("rmat_s"):]
        s, ef = body.split("_ef")
        return rmat_edges(int(s), int(ef))
    if name.startswith("uniform_s"):
        body = name[len("uniform_s"):]
        s, ef = body.split("_ef")
        return uniform_edges(int(s), int(ef))
    raise KeyError(name)
