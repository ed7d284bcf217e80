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


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/?#]+)"


def url_host(col) -> pa.Array:
    """url strings -> NORMALIZED host component (scheme://HOST/...);
    null where the url has no scheme://host prefix. RE2-vectorized.

    Normalization follows the conventional Common-Crawl host-graph
    treatment: the authority is lowercased and stripped of an optional
    'userinfo@' prefix and ':port' suffix, so 'HTTP://A.example',
    'http://a.example:80' and 'http://u@a.example' all hash to ONE
    host vertex instead of splitting a logical host's PageRank mass."""
    h = pc.struct_field(pc.extract_regex(_as_large_string(col),
                                         _HOST_RE), "host")
    h = pc.replace_substring_regex(h, r"^[^@/\[\]]*@", "")
    h = pc.replace_substring_regex(h, r":\d+$", "")
    return pc.utf8_lower(h)


def extract_host_edges_batch(batch: pa.Table) -> pa.Table:
    """pages -> per-batch partial host-graph rows
    (src, dst, weight=in-batch link count): project every extracted
    link to (src_host, dst_host), drop intra-host links and
    non-url hrefs, hash hosts with the same stable url hash, and
    pre-aggregate counts within the batch (bounds shuffle volume the
    same way dedup_edges' per-batch unique does)."""
    links = extract_links_batch(batch)
    sh = url_host(links["src_url"])
    dh = url_host(links["dst_url"])
    keep = pc.and_kleene(pc.is_valid(sh), pc.is_valid(dh))
    sh, dh = sh.filter(keep), dh.filter(keep)
    inter = pc.invert(pc.equal(sh, dh))
    sh, dh = sh.filter(inter), dh.filter(inter)
    from totem_ray.nputil import group_sum_pairs

    src = hash_strings_i64(sh, seed=URL_HASH_SEED)
    dst = hash_strings_i64(dh, seed=URL_HASH_SEED)
    src, dst, cnt = group_sum_pairs(src, dst,
                                    np.ones(len(src), dtype=np.float64))
    return pa.table({"src": pa.array(src, type=pa.int64()),
                     "dst": pa.array(dst, type=pa.int64()),
                     "weight": pa.array(cnt, type=pa.float64())})


def pages_to_host_edges(pages_ds, num_buckets: int = 64):
    """Dataset pipeline: pages -> HOST-level weighted link graph
    (src, dst, weight = total inter-host link count) — the classic
    Common-Crawl aggregation (host graph over the page graph). Host
    ids use the same stable hash/seed as page urls; recover the
    strings via host_id_map. One hash-bucket exchange over the
    pre-aggregated partials; weight is float64, ready for
    pagerank_weighted / SSSP."""
    from totem_ray.hashing import as_u64, splitmix64

    partial = pages_ds.map_batches(extract_host_edges_batch,
                                   batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"])
        d = np.asarray(t["dst"])
        b = (splitmix64(splitmix64(as_u64(s)) ^ as_u64(d))
             % int(num_buckets)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def combine(t: pa.Table) -> pa.Table:
        from totem_ray.nputil import group_sum_pairs

        s, d, w = group_sum_pairs(np.asarray(t["src"]),
                                  np.asarray(t["dst"]),
                                  np.asarray(t["weight"]))
        return pa.table({
            "src": pa.array(s, type=pa.int64()),
            "dst": pa.array(d, type=pa.int64()),
            "weight": pa.array(w, type=pa.float64())})

    return partial.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_b").map_groups(combine, batch_format="pyarrow")


def host_id_map(pages_ds, num_buckets: int = 64):
    """Dataset (host_id, host) — distinct hosts with their stable ids,
    for joining host-graph results back to names. Covers EVERY vertex
    pages_to_host_edges can emit: hosts of the page urls AND hosts of
    the link targets (an external host that is linked to but never
    crawled is still a dst vertex). host_id is a pure hash of host,
    so identical rows dedup exactly; one small bucketed exchange
    (dedup_edges' pattern), not a per-key groupby."""
    def hosts(t: pa.Table) -> pa.Table:
        links = extract_links_batch(t)
        parts = [url_host(t["url"]), url_host(links["dst_url"])]
        arrs = []
        for h in parts:
            h = h.filter(pc.is_valid(h))
            if isinstance(h, pa.ChunkedArray):
                h = h.combine_chunks()
            arrs.append(h.cast(pa.large_string()))
        hu = pc.unique(pa.concat_arrays(arrs))
        ids = hash_strings_i64(hu, seed=URL_HASH_SEED)
        b = (ids.view(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"host_id": pa.array(ids, type=pa.int64()),
                         "host": hu.cast(pa.string()),
                         "_b": pa.array(b)})

    def dedup(t: pa.Table) -> pa.Table:
        gi = t.group_by("host_id").aggregate([("host", "min")])
        return pa.table({"host_id": gi["host_id"],
                         "host": gi["host_min"]})

    return pages_ds.map_batches(hosts, batch_format="pyarrow") \
        .groupby("_b").map_groups(dedup, batch_format="pyarrow")


def pages_to_text(pages_ds):
    """Dataset pipeline: pages -> (url, text)."""
    return pages_ds.map_batches(extract_text_batch, batch_format="pyarrow")


def url_ids(num_vertices: int) -> np.ndarray:
    """Hashed ids of the fixture urls for vertices 0..n-1 (test helper)."""
    from totem_ray.sources.pages import url_of

    return hash_strings_i64([url_of(v) for v in range(num_vertices)],
                            seed=URL_HASH_SEED)
