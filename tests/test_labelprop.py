"""Label propagation parity tests — expected community labels pinned
by the reference's unit tests
(totem_label_propagation_unittest.cu:71-149)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from totem_ray.algs import label_propagation
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def _labels(out):
    return out["result"].to_pandas().sort_values("v")["label"].to_numpy()


@pytest.mark.parametrize("P", [1, 2, 4])
def test_grid_communities(P):
    # grid 3x5: {0,1,5,6,10,11}->6, {2,7,12}->7, {3,4,8,9,13,14}->8
    # (totem_label_propagation_unittest.cu:85-103)
    n, e = topology_edges("grid_15")
    out = label_propagation(edges_from_arrays(e, num_blocks=2),
                            num_partitions=P)
    exp = np.array([6, 6, 7, 8, 8, 6, 6, 7, 8, 8, 6, 6, 7, 8, 8])
    assert np.array_equal(_labels(out), exp)
    out["engine"].shutdown()


def test_complete_and_star_all_zero():
    # complete graph: all 0 (:71-82); star: all 0 (:124-136) — the
    # closed form is size-independent, so small instances keep the
    # suite fast
    from totem_ray.sources.fixtures import complete, star

    for n, e in [complete(60), star(200)]:
        out = label_propagation(edges_from_arrays(e), num_partitions=4)
        assert (_labels(out) == 0).all()
        out["engine"].shutdown()


def test_chain_head_converges_to_one():
    # chain_1000: vertices 0..5 -> label 1 after 25 iterations (:106-121)
    n, e = topology_edges("chain_1000")
    out = label_propagation(edges_from_arrays(e), num_partitions=4)
    lab = _labels(out)
    assert (lab[:6] == 1).all()
    assert out["iterations"] == 25
    out["engine"].shutdown()


def test_disconnected_self_labels():
    # edgeless -> label[v] = v (:138-149)
    vs = ray.data.from_pandas(
        pd.DataFrame({"v": np.arange(100, dtype=np.int64)}))
    out = label_propagation(
        edges_from_arrays(np.empty((0, 2), dtype=np.uint64)),
        vertices=vs, num_partitions=3)
    df = out["result"].to_pandas().sort_values("v")
    assert np.array_equal(df["v"].to_numpy(), df["label"].to_numpy())
    out["engine"].shutdown()


def test_support_cap_mode_runs():
    # web-scale truncation mode still produces labels for every vertex
    n, e = topology_edges("grid_15")
    out = label_propagation(edges_from_arrays(e), num_partitions=2,
                            max_support=4)
    assert len(_labels(out)) == n
    out["engine"].shutdown()
