"""Common-Crawl-style pages table (url, warc_ts, html, text, lang).

The engine's primary input (BASELINE.json input_hint). Fixture pages
embed a topology's link structure as ``<a href>`` anchors, one per
out-edge in adjacency order; the ``text`` column is the exact byte
sequence the extractor (sources/extract.py) must recover from ``html``
(the per-row byte-identical invariant).

Plays the role the reference's generator tool plays for its own test
corpus (src/generator/totem_generator_binary.cc), re-targeted at the
web-pages data model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from totem_ray.hashing import splitmix64

_WORDS = (
    "graph link rank crawl page web data node edge partition shuffle "
    "batch arrow stream actor block vertex label propagate component "
    "triangle cluster degree hash index table query engine superstep"
).split()

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00 in microseconds


def url_of(v: int, num_hosts: int = 17) -> str:
    """Fixture url for page v. ``num_hosts`` spreads pages over that
    many synthetic hosts (default 17 — the long-standing fixture
    value every byte-identity test pins); the corpus-pipeline bench
    raises it so the derived host graph has real fan-out."""
    return f"https://site{v % num_hosts}.example/p/{v}"


def _body_text(v: int) -> str:
    """Deterministic pseudo-text for page v (10 words, seed-free)."""
    idx = splitmix64(np.arange(10, dtype=np.uint64) + np.uint64(v) * np.uint64(1000003))
    words = [_WORDS[int(i) % len(_WORDS)] for i in idx]
    return f"page {v}: " + " ".join(words)


def render_pages_table(num_vertices: int, edges: np.ndarray,
                       lang: str = "en",
                       num_hosts: int = 17) -> pa.Table:
    """Render a topology into a pages Arrow table.

    ``edges`` is the (m, 2) directed edge array; page v gets one
    anchor per out-edge of v, in adjacency (dst-ascending) order.
    """
    if len(edges):
        order = np.lexsort((edges[:, 1], edges[:, 0]))
        e = edges[order]
        srcs = e[:, 0].astype(np.int64)
        dsts = e[:, 1].astype(np.int64)
        starts = np.searchsorted(srcs, np.arange(num_vertices + 1))
    else:
        dsts = np.empty(0, dtype=np.int64)
        starts = np.zeros(num_vertices + 1, dtype=np.int64)

    urls, htmls, texts = [], [], []
    for v in range(num_vertices):
        text = _body_text(v)
        anchors = "".join(
            f'<a href="{url_of(int(d), num_hosts)}">l</a>'
            for d in dsts[starts[v]:starts[v + 1]]
        )
        html = (f"<html><head><title>p{v}</title></head>"
                f"<body>{text}{anchors}</body></html>")
        urls.append(url_of(v, num_hosts))
        htmls.append(html.encode())
        texts.append(text)

    ts = pa.array(BASE_TS_US + np.arange(num_vertices, dtype=np.int64) * 1_000_000,
                  type=pa.timestamp("us"))
    return pa.table({
        "url": pa.array(urls, type=pa.large_string()),
        "warc_ts": ts,
        "html": pa.array(htmls, type=pa.large_binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array([lang] * num_vertices, type=pa.string()),
    })


def write_pages_parquet(path: str, num_vertices: int, edges: np.ndarray,
                        rows_per_file: int = 200_000,
                        num_hosts: int = 17) -> str:
    """Write a pages table as partitioned parquet (one dir, N part files)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    tbl = render_pages_table(num_vertices, edges, num_hosts=num_hosts)
    n = tbl.num_rows
    part = 0
    for lo in range(0, max(n, 1), rows_per_file):
        pq.write_table(tbl.slice(lo, rows_per_file),
                       os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return path
