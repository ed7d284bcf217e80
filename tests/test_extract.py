"""Pipeline front-end tests (SURVEY.md §5.2 item 4): byte-identical
text extraction and deterministic link extraction vs the embedded
topology."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from totem_ray.sources.extract import (
    extract_edges_batch,
    extract_text,
    pages_to_edges,
    pages_to_text,
    url_ids,
)
from totem_ray.sources.fixtures import topology_edges
from totem_ray.sources.pages import render_pages_table

FIXTURES = ["single_node", "single_node_loop", "chain_100", "chain_4_comp_40",
            "star_1000", "grid_15", "disconnected_1000", "rmat_s10_ef8"]


@pytest.mark.parametrize("name", FIXTURES)
def test_text_extraction_byte_identical(name):
    n, e = topology_edges(name)
    pages = render_pages_table(n, e)
    got = extract_text(pages["html"]).cast(pa.string())
    assert got.to_pylist() == pages["text"].to_pylist()


@pytest.mark.parametrize("name", ["chain_100", "grid_15", "star_1000", "rmat_s10_ef8"])
def test_link_extraction_matches_topology(name):
    n, e = topology_edges(name)
    pages = render_pages_table(n, e)
    out = extract_edges_batch(pages)
    ids = url_ids(n)
    got = sorted(zip(out["src"].to_pylist(), out["dst"].to_pylist()))
    exp = sorted((int(ids[s]), int(ids[d])) for s, d in e)
    assert got == exp


def test_pages_to_edges_dataset_pipeline():
    n, e = topology_edges("grid_15")
    pages_ds = ray.data.from_arrow(render_pages_table(n, e)).repartition(3)
    edges = pages_to_edges(pages_ds)
    assert edges.count() == len(e)
    assert edges.schema().names == ["src", "dst"]
    txt = pages_to_text(pages_ds)
    assert txt.count() == n


def test_multiplicity_preserved():
    # duplicate edges must yield duplicate links (Totem keeps dups,
    # totem_generator.cc:631-680)
    e = np.array([[0, 1], [0, 1], [1, 0]], dtype=np.uint64)
    pages = render_pages_table(2, e)
    out = extract_edges_batch(pages)
    assert out.num_rows == 3


# ------------------------------------------------------- .tbin format
def test_tbin_roundtrip_reference_fixtures():
    # graph_initialize_binary parity (totem_graph.cu:253-310): text
    # fixture -> write_totem_binary -> parse_totem_binary must give
    # back the identical edge set, weights, and flags
    import os

    from totem_ray.sources.totem_format import (is_totem_binary,
                                                parse_totem_binary,
                                                parse_totem_file,
                                                write_totem_binary)

    for name in ("chain_100_nodes_weight_directed.totem",
                 "star_1000_nodes_weight.totem",
                 "chain_1000_nodes.totem",
                 "single_node.totem"):
        src = os.path.join("/root/reference/data", name)
        meta = parse_totem_file(src)
        out = f"/tmp/tbin_{name}.tbin"
        write_totem_binary(out, meta["num_vertices"], meta["edges"],
                           weights=meta["weights"],
                           directed=meta["directed"])
        assert is_totem_binary(out)
        back = parse_totem_binary(out)
        assert back["num_vertices"] == meta["num_vertices"]
        assert back["num_edges"] == meta["num_edges"]
        assert back["directed"] == meta["directed"]
        # binary stores CSR (src-sorted); compare as sorted edge sets
        import numpy as np

        def key(m):
            e = m["edges"]
            w = m["weights"] if m["weights"] is not None \
                else np.zeros(len(e))
            o = np.lexsort((w, e[:, 1], e[:, 0]))
            return e[o], w[o]
        ea, wa = key(meta)
        eb, wb = key(back)
        assert (ea == eb).all()
        assert (wa == wb).all()


def test_tbin_magic_sniff_dispatch():
    import numpy as np

    from totem_ray.sources.totem_format import (read_totem_graph,
                                                write_totem_binary)

    e = np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int64)
    write_totem_binary("/tmp/tri.tbin", 3, e)
    ds = read_totem_graph("/tmp/tri.tbin")
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert df["src"].tolist() == [0, 1, 2]
    assert df["dst"].tolist() == [1, 2, 0]
    # text path still dispatches through the same entry
    ds2 = read_totem_graph("/root/reference/data/chain_100_nodes.totem")
    assert ds2.count() > 0


def test_tbin_writer_rejects_nonu32_weights(tmp_path):
    """weight_t is uint32 — fractional / negative / >=2^32 weights must
    raise instead of silently truncating through astype."""
    import pytest

    from totem_ray.sources.totem_format import write_totem_binary

    e = np.array([[0, 1], [1, 2]])
    for bad in ([0.5, 1.0], [-1.0, 1.0], [2.0 ** 32, 1.0],
                [np.nan, 1.0]):
        with pytest.raises(ValueError, match="uint32"):
            write_totem_binary(str(tmp_path / "g.tbin"), 3, e,
                               weights=np.array(bad))
    with pytest.raises(ValueError, match="uint32"):
        write_totem_binary(str(tmp_path / "g.tbin"), 3, e,
                           values=np.array([1.5, 2.0, 3.0]))
    # in-domain floats that ARE integers round-trip fine
    write_totem_binary(str(tmp_path / "ok.tbin"), 3, e,
                       weights=np.array([3.0, 4.0]))


def test_write_totem_binary_rejects_huge_vertex_count(tmp_path):
    # vid_size is fixed at 4: num_vertices >= 2^32 would silently wrap
    # in the '<u4' header (and neighbor ids passing the id<nv guard
    # could exceed uint32) — must refuse, not corrupt
    import pytest

    from totem_ray.sources.totem_format import write_totem_binary

    with pytest.raises(ValueError, match="2\\^32"):
        write_totem_binary(str(tmp_path / "g.tbin"), 1 << 32,
                           np.array([[0, 1]]))


def test_host_graph_and_id_map(tmp_path):
    """pages -> host-level weighted link graph: weights equal the
    inter-host link counts of the raw edge list; host_id_map ids are
    the stable string hashes of the host names."""
    import ray.data

    from totem_ray.hashing import hash_strings_i64
    from totem_ray.sources.extract import host_id_map, pages_to_host_edges
    from totem_ray.sources.fixtures import topology_edges
    from totem_ray.sources.pages import write_pages_parquet

    d = str(tmp_path / "pages")
    n, e = topology_edges("grid_15")
    write_pages_parquet(d, n, e)
    pages = ray.data.read_parquet(d, columns=["url", "html"])

    hg = pages_to_host_edges(pages).to_pandas()
    hm = host_id_map(pages).to_pandas()
    name_of = dict(zip(hm["host_id"], hm["host"]))

    exp: dict = {}
    for a, b in e.astype(int):
        ha, hb = f"site{a % 17}.example", f"site{b % 17}.example"
        if ha != hb:
            exp[(ha, hb)] = exp.get((ha, hb), 0) + 1.0
    got: dict = {}
    for r in hg.itertuples():
        k = (name_of[r.src], name_of[r.dst])
        got[k] = got.get(k, 0) + r.weight
    assert got == exp
    # no intra-host rows survive
    assert all(s != t for s, t in got)
    # id stability: map ids ARE the host-string hashes
    ids = hash_strings_i64(pa.array(hm["host"].tolist(),
                                    type=pa.large_string()))
    assert set(ids.tolist()) == set(hm["host_id"].tolist())


def test_host_graph_skips_unparseable_urls(tmp_path):
    """hrefs without a scheme://host prefix are dropped, not crashed
    on, and intra-host links never surface."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from totem_ray.sources.extract import pages_to_host_edges

    d = str(tmp_path / "pages")
    os.makedirs(d)
    html = ('<html><body>'
            '<a href="https://b.example/x">l</a>'
            '<a href="/relative/path">l</a>'
            '<a href="https://a.example/self">l</a>'
            '</body></html>')
    pq.write_table(pa.table({
        "url": pa.array(["https://a.example/p/1"], type=pa.large_string()),
        "html": pa.array([html.encode()], type=pa.large_binary())}),
        os.path.join(d, "p.parquet"))
    hg = pages_to_host_edges(
        ray.data.read_parquet(d, columns=["url", "html"])).to_pandas()
    assert len(hg) == 1 and hg["weight"].iloc[0] == 1.0


def test_host_id_map_covers_external_hosts(tmp_path):
    """A host that is linked to but never crawled must still get a
    name row (it IS a dst vertex of the host graph)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from totem_ray.sources.extract import host_id_map, pages_to_host_edges

    d = str(tmp_path / "pages")
    os.makedirs(d)
    html = ('<html><body><a href="https://external.example/x">l</a>'
            '</body></html>')
    pq.write_table(pa.table({
        "url": pa.array(["https://crawled.example/p/1"],
                        type=pa.large_string()),
        "html": pa.array([html.encode()], type=pa.large_binary())}),
        os.path.join(d, "p.parquet"))
    pages = ray.data.read_parquet(d, columns=["url", "html"])
    hm = host_id_map(pages).to_pandas()
    hg = pages_to_host_edges(pages).to_pandas()
    assert set(hm["host"]) == {"crawled.example", "external.example"}
    name_of = dict(zip(hm["host_id"], hm["host"]))
    assert name_of[hg["src"].iloc[0]] == "crawled.example"
    assert name_of[hg["dst"].iloc[0]] == "external.example"


def test_url_host_normalization():
    """Case, userinfo and port variants of one logical host must map
    to a single host vertex (Common-Crawl host-graph convention);
    IPv6 literals keep their brackets."""
    import pyarrow as pa

    from totem_ray.sources.extract import url_host

    urls = pa.array([
        "HTTP://A.Example/x",
        "http://a.example:80/y",
        "https://user@A.EXAMPLE/z",
        "http://u:pw@a.example:8080/q",
        "http://[2001:DB8::1]:443/v6",
        "not a url",
    ])
    got = url_host(urls).to_pylist()
    assert got[:4] == ["a.example"] * 4
    assert got[4] == "[2001:db8::1]"
    assert got[5] is None


def test_pages_fixture_num_hosts_param():
    """num_hosts spreads fixture pages over that many synthetic hosts
    (corpus-pipeline bench); the default stays 17 so every
    byte-identity fixture is unchanged."""
    import numpy as np

    from totem_ray.sources.pages import render_pages_table, url_of

    assert url_of(40) == url_of(40, 17)
    e = np.array([[0, 1], [1, 2], [2, 0]])
    t17 = render_pages_table(3, e)
    t64 = render_pages_table(3, e, num_hosts=64)
    assert t17["text"].to_pylist() == t64["text"].to_pylist()
    assert t64["url"].to_pylist() == [url_of(v, 64) for v in range(3)]
    # anchors must point at the num_hosts-consistent urls
    assert url_of(1, 64).encode() in t64["html"][0].as_py()
