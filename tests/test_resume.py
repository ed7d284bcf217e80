"""Checkpoint/resume tests (SURVEY.md §5.2 item 5): stop after
superstep k, restart from checkpoint, identical final vectors."""

import os
import shutil

import numpy as np

from totem_ray.engine.bsp import BspEngine
from totem_ray.graph.edges import edges_from_arrays
from totem_ray.sources.fixtures import topology_edges


def _run(eng, **kw):
    return eng.run("pagerank", {"mode": "converge", "tol": 1e-10}, **kw)


def test_resume_identical_result(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    n, e = topology_edges("grid_15")

    # uninterrupted reference run
    eng = BspEngine(3).build(edges_from_arrays(e))
    full = _run(eng)
    ref = full["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    total_iters = full["iterations"]
    eng.shutdown()

    # interrupted run: checkpoint every 2 steps, stop after 6
    eng = BspEngine(3).build(edges_from_arrays(e))
    partial = _run(eng, checkpoint_dir=ckpt, checkpoint_every=2,
                   max_supersteps=6)
    assert not partial["converged"]
    eng.shutdown()  # simulate the job dying

    # fresh engine resumes from the newest complete checkpoint
    eng = BspEngine(3).build(edges_from_arrays(e))
    resumed = _run(eng, checkpoint_dir=ckpt, checkpoint_every=2, resume=True)
    assert resumed["resumed_from"] == 6  # checkpoints at steps 1,3,5
    got = resumed["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    assert resumed["converged"]
    assert np.array_equal(got, ref)  # bitwise-identical continuation
    assert resumed["iterations"] == total_iters
    eng.shutdown()


def test_resume_ignores_other_lineage(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    n, e = topology_edges("grid_15")
    eng = BspEngine(2).build(edges_from_arrays(e))
    eng.run("pagerank", {"mode": "converge", "tol": 1e-6},
            checkpoint_dir=ckpt, checkpoint_every=1, max_supersteps=3)
    eng.shutdown()
    # different params -> different lineage -> no resume
    eng = BspEngine(2).build(edges_from_arrays(e))
    out = eng.run("pagerank", {"mode": "converge", "tol": 1e-8},
                  checkpoint_dir=ckpt, resume=True, max_supersteps=50)
    assert out["resumed_from"] is None
    eng.shutdown()


def test_incomplete_checkpoint_skipped(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    n, e = topology_edges("grid_15")
    eng = BspEngine(2).build(edges_from_arrays(e))
    eng.run("pagerank", {"mode": "converge", "tol": 1e-10},
            checkpoint_dir=ckpt, checkpoint_every=2, max_supersteps=6)
    eng.shutdown()
    # corrupt the newest checkpoint: delete one shard file
    steps = sorted(int(d.split("=")[1]) for d in os.listdir(ckpt)
                   if d.startswith("superstep="))
    newest = steps[-1]
    os.remove(os.path.join(ckpt, f"superstep={newest}", "part-00001.parquet"))
    eng = BspEngine(2).build(edges_from_arrays(e))
    out = eng.run("pagerank", {"mode": "converge", "tol": 1e-10},
                  checkpoint_dir=ckpt, resume=True)
    # fell back to the previous complete superstep
    assert out["resumed_from"] == steps[-2] + 1
    eng.shutdown()


def test_labelprop_resume_identical_result(tmp_path):
    """Regression: label_propagation restore crashed with a TypeError
    (per-scalar np.asarray over pyarrow list scalars) — the list
    columns now round-trip via LargeListArray offsets + flatten."""
    ckpt = str(tmp_path / "lp_ckpt")
    n, e = topology_edges("grid_15")
    params = {"max_support": None, "max_iterations": None}

    eng = BspEngine(3).build(edges_from_arrays(e))
    full = eng.run("label_propagation", params)
    ref = full["result"].to_pandas().sort_values("v")["label"].to_numpy()
    total_iters = full["iterations"]
    eng.shutdown()

    # interrupted run: same params (lineage match), cut at superstep 4
    eng = BspEngine(3).build(edges_from_arrays(e))
    partial = eng.run("label_propagation", params, max_supersteps=4,
                      checkpoint_dir=ckpt, checkpoint_every=2)
    assert not partial["converged"]
    eng.shutdown()

    eng = BspEngine(3).build(edges_from_arrays(e))
    resumed = eng.run("label_propagation", params, checkpoint_dir=ckpt,
                      checkpoint_every=2, resume=True)
    assert resumed["resumed_from"] == 4  # checkpoints at steps 1, 3
    got = resumed["result"].to_pandas().sort_values("v")["label"].to_numpy()
    eng.shutdown()
    assert np.array_equal(got, ref)
    assert resumed["iterations"] == total_iters


def test_actor_death_mid_run_resume(tmp_path):
    """Multi-node failure shape: a shard actor dies HARD (ray.kill, no
    graceful shutdown) partway through a checkpointed job. The running
    job must surface the failure (not hang or silently drop a shard),
    and a fresh engine with resume=True must continue from the last
    complete checkpoint to the bitwise-identical converged result."""
    import pytest
    import ray

    ckpt = str(tmp_path / "ckpt")
    n, e = topology_edges("grid_15")

    eng = BspEngine(3).build(edges_from_arrays(e))
    full = _run(eng)
    ref = full["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    total_iters = full["iterations"]
    eng.shutdown()

    eng = BspEngine(3).build(edges_from_arrays(e))
    partial = _run(eng, checkpoint_dir=ckpt, checkpoint_every=2,
                   max_supersteps=6)
    assert not partial["converged"]
    ray.kill(eng.shards[1], no_restart=True)
    with pytest.raises(ray.exceptions.RayError):
        _run(eng, checkpoint_dir=ckpt, checkpoint_every=2)
    # the "crashed" job never shuts down cleanly; reap the survivors
    # without pooling them (a dead set must not be recycled)
    eng.shutdown(pool=False)

    eng2 = BspEngine(3).build(edges_from_arrays(e))
    resumed = _run(eng2, checkpoint_dir=ckpt, checkpoint_every=2,
                   resume=True)
    assert resumed["resumed_from"] == 6  # checkpoints at steps 1,3,5
    got = resumed["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    assert resumed["converged"]
    assert np.array_equal(got, ref)
    assert resumed["iterations"] == total_iters
    eng2.shutdown()

    # pool hygiene: kill one actor of the PARKED set; the next engine
    # must detect the dead candidate set, replace it, and still work
    import totem_ray.engine.bsp as bspmod
    for sets in bspmod._SHARD_POOL.values():
        if sets:
            ray.kill(sets[-1][0], no_restart=True)
            break
    eng3 = BspEngine(3).build(edges_from_arrays(e))
    again = _run(eng3)
    got3 = again["result"].to_pandas().sort_values("v")["rank"].to_numpy()
    assert np.array_equal(got3, ref)
    eng3.shutdown()
