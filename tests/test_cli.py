"""CLI entry tests (python -m totem_ray — the totem_benchmark analog)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from totem_ray.__main__ import main
from totem_ray.sources.fixtures import topology_edges


def _edges_dir(tmp_path, name="grid_15"):
    n, e = topology_edges(name)
    d = str(tmp_path / "edges")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({"src": pa.array(e[:, 0].astype(np.int64)),
                             "dst": pa.array(e[:, 1].astype(np.int64))}),
                   os.path.join(d, "part-0.parquet"))
    return d


def test_cli_bfs_and_cc(tmp_path, capsys):
    d = _edges_dir(tmp_path)
    assert main(["bfs", "--edges", d, "--partitions", "2",
                 "--source", "0"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "bfs" and row["rows"] == 15

    out = str(tmp_path / "cc_out")
    assert main(["cc", "--edges", d, "--partitions", "2",
                 "--out", out, "--resumable-out"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["rows"] == 15 and row["sink"]["path"] == out
    assert os.path.exists(os.path.join(out, "_ALL_DONE"))


def test_cli_triangles_from_pages(tmp_path, capsys):
    from totem_ray.sources.pages import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, *topology_edges("wheel_1000"))
    assert main(["clustering_coefficient", "--pages", pages,
                 "--partitions", "2"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["rows"] == 1000


def test_cli_degree_partitioner_same_results(tmp_path, capsys):
    """--partitioner degree-high must change only PLACEMENT: pagerank
    output is partitioner-invariant, and the stats report Totem's
    rmt_edge metric for the chosen strategy."""
    d = _edges_dir(tmp_path)
    outs = {}
    for part in ("hash", "degree-high"):
        out = str(tmp_path / f"pr_{part}")
        assert main(["pagerank", "--edges", d, "--partitions", "4",
                     "--partitioner", part, "--alpha", "0.3",
                     "--partition-stats", "--out", out]) == 0
        row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert row["partition_stats"]["kind"] == \
            ("hash" if part == "hash" else "degree")
        assert 0.0 <= row["partition_stats"]["rmt_edge_frac"] <= 1.0
        import ray.data

        outs[part] = ray.data.read_parquet(out).to_pandas() \
            .sort_values("v").reset_index(drop=True)
    assert (outs["hash"]["v"] == outs["degree-high"]["v"]).all()
    np.testing.assert_allclose(outs["hash"]["rank"],
                               outs["degree-high"]["rank"], rtol=1e-12)


def test_cli_extensionless_parquet_file(tmp_path, capsys):
    # a single parquet FILE without the .parquet suffix must sniff as
    # parquet (PAR1 magic) and route to read_parquet, not the totem
    # text/binary parser
    n, e = topology_edges("grid_15")
    f = str(tmp_path / "edges_file")
    pq.write_table(pa.table({"src": pa.array(e[:, 0].astype(np.int64)),
                             "dst": pa.array(e[:, 1].astype(np.int64))}),
                   f)
    assert main(["cc", "--edges", f, "--partitions", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n


def test_cli_linkrank_algs(tmp_path, capsys):
    d = _edges_dir(tmp_path)

    assert main(["hits", "--edges", d, "--partitions", "2",
                 "--rounds", "3"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "hits" and row["rows"] == 15

    assert main(["ppr", "--edges", d, "--partitions", "2",
                 "--seeds", "0,1"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "ppr" and row["rows"] == 15

    assert main(["ktruss", "--edges", d, "--partitions", "2",
                 "--k", "3"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "ktruss"  # grid has no triangles -> 0 rows
    assert row["rows"] == 0


def test_cli_pagerank_weighted(tmp_path, capsys):
    n, e = topology_edges("grid_15")
    d = str(tmp_path / "wedges")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    pq.write_table(
        pa.table({"src": pa.array(e[:, 0].astype(np.int64)),
                  "dst": pa.array(e[:, 1].astype(np.int64)),
                  "weight": pa.array(rng.random(len(e)) + 0.5)}),
        os.path.join(d, "part-0.parquet"))
    assert main(["pagerank_weighted", "--edges", d,
                 "--partitions", "2"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "pagerank_weighted" and row["rows"] == 15


def test_cli_ppr_requires_seeds(tmp_path):
    d = _edges_dir(tmp_path)
    import pytest
    with pytest.raises(SystemExit, match="--seeds"):
        main(["ppr", "--edges", d])
    with pytest.raises(SystemExit, match="--k"):
        main(["ktruss", "--edges", d])


def test_cli_hyperball(tmp_path, capsys):
    d = _edges_dir(tmp_path)
    assert main(["hyperball", "--edges", d, "--partitions", "2",
                 "--rounds", "2"]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["alg"] == "hyperball" and row["rows"] == 15


def test_registry_consistency():
    """Every oracle_sql() key must name a queries() entry, and every
    query except the RNG-fit knn_ivf must carry an oracle. (The
    rotation policy's 'changed queries sit in the driver prefix'
    invariant is editorial — it cannot be checked mechanically here.)"""
    import importlib.util
    import os
    import sys

    entry = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_test", entry)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ray_entry_for_test"] = mod
    spec.loader.exec_module(mod)
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    assert len(qs) >= 50
    # only knn_ivf (RNG fit) is allowed to lack an oracle by design
    missing = set(qs) - set(oracles)
    assert missing <= {"knn_ivf"}, missing
