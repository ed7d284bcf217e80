"""Resumable partitioned Parquet sink tests."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from totem_ray.sources.sink import write_parquet_resumable


def _mkds(n=1000):
    return rd.from_arrow(pa.table({
        "v": pa.array(np.arange(n), type=pa.int64()),
        "val": pa.array(np.arange(n) * 2, type=pa.int64())}))


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "out")
    res = write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    assert res["skipped"] == 0
    back = rd.read_parquet(path).to_pandas().sort_values("v")         .reset_index(drop=True)
    assert len(back) == 1000
    assert (back["val"].to_numpy() == back["v"].to_numpy() * 2).all()
    # partition dirs must not hive-parse into a spurious extra column
    # (a part=NNNNN layout would read back as schema [v, val, part])
    assert sorted(back.columns) == ["v", "val"]
    assert os.path.exists(os.path.join(path, "_ALL_DONE"))


def test_resume_skips_finished_partitions(tmp_path):
    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    # simulate a partial failure: drop two partitions' data + markers
    for p in (1, 5):
        pdir = os.path.join(path, f"part-{p:05d}")
        os.remove(os.path.join(pdir, "_DONE"))
        f = os.path.join(pdir, "data.parquet")
        if os.path.exists(f):
            os.remove(f)
    res = write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    assert res["skipped"] == 6
    back = rd.read_parquet(path).to_pandas().sort_values("v")         .reset_index(drop=True)
    assert len(back) == 1000
    assert (back["val"].to_numpy() == back["v"].to_numpy() * 2).all()


def test_fully_done_is_noop(tmp_path):
    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=4)
    res = write_parquet_resumable(_mkds(), path, key="v", num_partitions=4)
    assert res == {"written": 0, "skipped": 4, "path": path}


def test_mismatched_partition_count_rejected(tmp_path):
    import pytest

    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    with pytest.raises(ValueError, match="num_partitions=8"):
        write_parquet_resumable(_mkds(), path, key="v", num_partitions=16)


def test_all_done_marker_self_heals(tmp_path):
    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=4)
    os.remove(os.path.join(path, "_ALL_DONE"))
    res = write_parquet_resumable(_mkds(), path, key="v", num_partitions=4)
    assert res["skipped"] == 4
    assert os.path.exists(os.path.join(path, "_ALL_DONE"))


def test_string_key_rejected_early(tmp_path):
    import pytest

    ds = rd.from_arrow(pa.table({"k": pa.array(["a", "b"]),
                                 "val": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="integer id"):
        write_parquet_resumable(ds, str(tmp_path / "out"), key="k")


def test_legacy_hive_layout_migrates(tmp_path):
    """A sink written by the old part=NNNNN layout must migrate in
    place on the next run (rename, not rewrite-next-to-stale-dups)."""
    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    # simulate the pre-rename layout
    os.remove(os.path.join(path, "_ALL_DONE"))
    for p in range(8):
        os.rename(os.path.join(path, f"part-{p:05d}"),
                  os.path.join(path, f"part={p:05d}"))
    res = write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    assert res["written"] == 0 and res["skipped"] == 8
    assert not any(n.startswith("part=") for n in os.listdir(path))
    back = rd.read_parquet(path).to_pandas()
    assert len(back) == 1000 and sorted(back.columns) == ["v", "val"]


def test_mixed_legacy_and_new_layout_rejected(tmp_path):
    path = str(tmp_path / "out")
    write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
    os.remove(os.path.join(path, "_ALL_DONE"))
    # a legacy dir whose migrated name collides with an existing one
    os.makedirs(os.path.join(path, "part=00003"))
    import pytest

    with pytest.raises(ValueError, match="both"):
        write_parquet_resumable(_mkds(), path, key="v", num_partitions=8)
