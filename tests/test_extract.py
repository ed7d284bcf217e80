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
