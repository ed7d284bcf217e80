"""Vectorized text + link extraction from the pages table.

Replaces the reference's edge-list parser front-end
(parse_edge_list, src/totem/totem_graph.cu:180-251) with a web-native
one: html -> (text, out-links) -> url-hashed edge table. All kernels
are RE2-vectorized (pyarrow.compute / polars) — no per-row Python in
the hot path.

Per-row invariant (BASELINE.json input_hint): ``extract_text`` is
byte-identical to the fixture's stored ``text`` column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from totem_ray.hashing import hash_strings_i64

_ANCHOR_RE = r'(?s)<a href="[^"]*">.*?</a>'
_TAG_RE = r"(?s)<[^>]*>"
_BODY_RE = r"(?s)<body>(?P<body>.*)</body>"
_HREF_RE = r'href="[^"]*"'

URL_HASH_SEED = 42


def _as_large_string(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = col.type
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return col.cast(pa.large_string())
    return col


def extract_text(html_col) -> pa.Array:
    """html (binary) -> extracted text (string).

    Semantics (fixed contract of this engine): take the ``<body>``
    element, drop every ``<a ...>...</a>`` anchor element entirely,
    then strip any remaining tags. Byte-identical to the fixture's
    ``text`` column by construction (sources/pages.py).
    """
    s = _as_large_string(html_col)
    body = pc.struct_field(pc.extract_regex(s, _BODY_RE), "body")
    no_anchors = pc.replace_substring_regex(body, _ANCHOR_RE, "")
    return pc.replace_substring_regex(no_anchors, _TAG_RE, "")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: pages -> (url, text)."""
    return pa.table({
        "url": batch["url"],
        "text": extract_text(batch["html"]).cast(pa.string()),
    })


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: pages -> flat (src_url, dst_url) link rows."""
    from totem_ray._polars_compat import pl

    s = _as_large_string(batch["html"])
    df = pl.DataFrame({
        "src_url": pl.from_arrow(batch["url"].cast(pa.large_string())),
        "html": pl.from_arrow(s),
    })
    out = (
        df.with_columns(
            pl.col("html").str.extract_all(_HREF_RE).alias("hrefs")
        )
        .drop("html")
        # empty_as_null=False: pages with no links emit no rows directly
        # (the polars<2.0 default emitted a null row that drop_nulls then
        # removed — same result, minus a deprecation warning)
        .explode("hrefs", empty_as_null=False)
        .drop_nulls("hrefs")
        .with_columns(pl.col("hrefs").str.slice(6, None).str.head(-1).alias("dst_url"))
        .select(["src_url", "dst_url"])
    )
    t = out.to_arrow()
    return pa.table({
        "src_url": t["src_url"].cast(pa.large_string()),
        "dst_url": t["dst_url"].cast(pa.large_string()),
    })


def links_to_ids_batch(batch: pa.Table) -> pa.Table:
    """(src_url, dst_url) -> (src, dst) int64 via stable url hashing."""
    src = hash_strings_i64(batch["src_url"], seed=URL_HASH_SEED)
    dst = hash_strings_i64(batch["dst_url"], seed=URL_HASH_SEED)
    return pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
    })


def extract_edges_batch(batch: pa.Table) -> pa.Table:
    """pages -> (src, dst) hashed edge rows in one stage."""
    return links_to_ids_batch(extract_links_batch(batch))


def pages_to_edges(pages_ds, hashed: bool = True):
    """Dataset pipeline: pages -> edge table.

    ``ray.data.read_parquet(pages_dir, columns=['url','html'])`` is the
    caller's job (prune at the read); this just applies the stateless
    extraction stages.
    """
    fn = extract_edges_batch if hashed else extract_links_batch
    return pages_ds.map_batches(fn, batch_format="pyarrow")


def pages_to_text(pages_ds):
    """Dataset pipeline: pages -> (url, text)."""
    return pages_ds.map_batches(extract_text_batch, batch_format="pyarrow")


def url_ids(num_vertices: int) -> np.ndarray:
    """Hashed ids of the fixture urls for vertices 0..n-1 (test helper)."""
    from totem_ray.sources.pages import url_of

    return hash_strings_i64([url_of(v) for v in range(num_vertices)],
                            seed=URL_HASH_SEED)
