"""Unit tests for the LLM-data-pipeline operators (functions/):
dedup sketches, similarity search, text analysis, windows, multimodal
plumbing. These complement the driver's SQL-oracle gate with local
closed-form checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _docs(texts, ids=None):
    ids = np.arange(len(texts)) if ids is None else np.asarray(ids)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(list(texts), type=pa.string())}))


# ---------------------------------------------------------------- dedup
def test_exact_dedup_groups_identical_text():
    from totem_ray.functions.dedup import exact_dedup

    txts = ["alpha beta", "gamma", "alpha beta", "alpha  beta "]
    out = exact_dedup(_docs(txts)).to_pandas()
    # survivors = min(doc_id) per distinct text: doc 2 dedupes into 0;
    # doc 3 differs (spacing, normalize=False) and survives
    assert sorted(out["doc_id"].tolist()) == [0, 1, 3]


def test_minhash_identical_docs_est_one_and_disjoint_absent():
    from totem_ray.functions.dedup import minhash_lsh_candidates

    same = "the quick brown fox jumps over the lazy dog " * 3
    other = "completely different words entirely unrelated text here " * 3
    cand = minhash_lsh_candidates(
        _docs([same, same, other])).to_pandas()
    pair = cand[(cand["a"] == 0) & (cand["b"] == 1)]
    assert len(pair) == 1 and pair["jaccard_est"].iloc[0] == 1.0
    assert not ((cand["a"] == 0) & (cand["b"] == 2)).any() or \
        cand[(cand["a"] == 0) & (cand["b"] == 2)]["jaccard_est"].max() < 0.5


def test_minhash_tokenizes_all_whitespace():
    # tabs/newlines are token boundaries (TOKEN_SPLIT_RE = \s+): the
    # same text with different whitespace must produce est 1.0
    from totem_ray.functions.dedup import minhash_lsh_candidates

    a = "one two three four five six seven eight nine ten"
    b = "one\ttwo three\nfour five six seven eight nine ten"
    cand = minhash_lsh_candidates(_docs([a, b])).to_pandas()
    pair = cand[(cand["a"] == 0) & (cand["b"] == 1)]
    assert len(pair) == 1 and pair["jaccard_est"].iloc[0] == 1.0


def test_simhash_identical_docs_pair():
    from totem_ray.functions.dedup import simhash_near_dup_pairs

    same = "a rose is a rose is a rose and so on forever " * 2
    out = simhash_near_dup_pairs(_docs([same, same, "zzz yyy xxx www"])) \
        .to_pandas()
    pair = out[(out["a"] == 0) & (out["b"] == 1)]
    assert len(pair) == 1 and pair["hamming"].iloc[0] == 0


def test_ngram_jaccard_exact_small():
    from totem_ray.functions.dedup import ngram_jaccard_pairs

    # doc0/doc1: known 3-shingle overlap; doc2 disjoint
    d0 = "a b c d e"          # shingles: abc bcd cde
    d1 = "a b c d x"          # shingles: abc bcd cdx
    d2 = "p q r s t"
    out = ngram_jaccard_pairs(_docs([d0, d1, d2]), tau=0.1).to_pandas()
    pair = out[(out["a"] == 0) & (out["b"] == 1)]
    assert len(pair) == 1
    assert pair["jaccard"].iloc[0] == pytest.approx(2 / 4)  # |∩|=2 |∪|=4
    assert not ((out["a"] == 0) & (out["b"] == 2)).any()


def test_embedding_near_dup_pairs():
    from totem_ray.functions.dedup import embedding_near_dup_pairs

    v = np.array([[1.0, 0.0], [1.0, 0.01], [0.0, 1.0]])
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([10, 11, 12], type=pa.int64()),
        "embedding": pa.array(list(v), type=pa.list_(pa.float64()))}))
    out = embedding_near_dup_pairs(emb, tau=0.99).to_pandas()
    assert set(map(tuple, out[["a", "b"]].to_numpy())) == {(10, 11)}


# ----------------------------------------------------------- similarity
def _emb_table(n=200, d=8, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array(list(x), type=pa.list_(pa.float64()))})), x


def test_knn_brute_force_matches_numpy():
    from totem_ray.functions.similarity import knn_brute_force

    emb, x = _emb_table()
    q = x[:3]
    out = knn_brute_force(emb, q, np.arange(3), k=5)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for qi in range(3):
        sims = xn @ xn[qi]
        sims[qi] = -np.inf                       # exclude_self
        expect = np.argsort(-sims, kind="stable")[:5]
        got = out[out["query_id"] == qi].sort_values("knn_rank")
        assert got["neighbor_id"].tolist() == expect.tolist()
        assert np.allclose(got["cos_sim"].to_numpy(), sims[expect])


def test_knn_ivf_recall_vs_brute_force():
    from totem_ray.functions.similarity import knn_brute_force, knn_ivf

    emb, x = _emb_table(n=400)
    q = x[:5]
    bf = knn_brute_force(emb, q, np.arange(5), k=10)
    ivf = knn_ivf(emb, q, np.arange(5), k=10, ncells=8, nprobe=4)
    recalls = []
    for qi in range(5):
        b = set(bf[bf["query_id"] == qi]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == qi]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6   # nprobe=4/8 cells: high recall


def test_knn_ivf_seeded_matches_independent_transcription():
    """fit='seeded' is the SQL-oracled IVF path: centroids are the
    embeddings of the ncells smallest ids, so the approximate result
    is a pure function of the data. Reproduce the whole plan (seed
    centroids, argmax-cosine assignment, nprobe cells per query,
    within-cell brute force) independently in numpy and require
    EXACT agreement — rank-for-rank, not recall-level."""
    from totem_ray.functions.similarity import knn_ivf

    ncells, nprobe, k = 6, 2, 7
    emb, x = _emb_table(n=300, seed=11)
    q = x[:4]
    out = knn_ivf(emb, q, np.arange(4), k=k, ncells=ncells,
                  nprobe=nprobe, fit="seeded")

    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = xn[:ncells]                         # ids 0..ncells-1
    cell = np.argmax(xn @ cent.T, axis=1)      # first-max = low cid
    for qi in range(4):
        probed = np.argsort(-(xn[qi] @ cent.T), kind="stable")[:nprobe]
        cand = np.flatnonzero(np.isin(cell, probed))
        cand = cand[cand != qi]                # exclude_self
        sims = xn[cand] @ xn[qi]
        order = np.lexsort((cand, -sims))[:k]
        expect = cand[order]
        got = out[out["query_id"] == qi].sort_values("knn_rank")
        assert got["neighbor_id"].tolist() == expect.tolist()
        assert np.allclose(got["cos_sim"].to_numpy(), sims[order])


def test_knn_ivf_seeded_block_layout_invariant():
    """The seed-centroid selection is a per-block partial min-k plus a
    driver merge — its result (and hence the whole approximate IVF
    output) must not depend on how the input is split into blocks."""
    from totem_ray.functions.similarity import knn_ivf

    emb, x = _emb_table(n=250, seed=5)
    q = x[:3]
    outs = []
    for nb in (1, 7):
        ds = emb.repartition(nb)
        out = knn_ivf(ds, q, np.arange(3), k=5, ncells=5, nprobe=2,
                      fit="seeded")
        outs.append(out.sort_values(["query_id", "knn_rank"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_knn_ivf_indexed_matches_knn_ivf(tmp_path):
    """The persisted cell-partitioned index must reproduce the
    scan-based knn_ivf exactly (same fit / ncells / nprobe): same
    centroids, same assignment, same probe order."""
    from totem_ray.functions.similarity import (build_ivf_index, knn_ivf,
                                                knn_ivf_indexed)

    emb, x = _emb_table(n=300, seed=11)
    q = x[:4]
    scan = knn_ivf(emb, q, np.arange(4), k=7, ncells=6, nprobe=2,
                   fit="seeded")
    res = build_ivf_index(emb, str(tmp_path / "ivf"), ncells=6,
                          fit="seeded")
    assert res["ncells"] == 6
    idx = knn_ivf_indexed(str(tmp_path / "ivf"), q, np.arange(4),
                          k=7, nprobe=2)
    key = ["query_id", "knn_rank"]
    pd.testing.assert_frame_equal(
        scan.sort_values(key).reset_index(drop=True),
        idx.sort_values(key).reset_index(drop=True))


def test_knn_ivf_indexed_full_probe_is_exact(tmp_path):
    from totem_ray.functions.similarity import (build_ivf_index,
                                                knn_brute_force,
                                                knn_ivf_indexed)

    emb, x = _emb_table(n=250, seed=5)
    q = x[:3]
    bf = knn_brute_force(emb, q, np.arange(3), k=5)
    build_ivf_index(emb, str(tmp_path / "ivf"), ncells=5, fit="kmeans")
    idx = knn_ivf_indexed(str(tmp_path / "ivf"), q, np.arange(3),
                          k=5, nprobe=5)
    key = ["query_id", "knn_rank"]
    pd.testing.assert_frame_equal(
        bf.sort_values(key).reset_index(drop=True),
        idx.sort_values(key).reset_index(drop=True))


def test_knn_ivf_indexed_reads_only_probed_cells(tmp_path):
    """The point of the persisted layout: a partial probe must read
    strictly fewer bytes (and cells) than the full index."""
    from totem_ray.functions.similarity import (build_ivf_index,
                                                knn_ivf_indexed)

    emb, x = _emb_table(n=400, seed=7)
    build_ivf_index(emb, str(tmp_path / "ivf"), ncells=8, fit="seeded")
    stats: dict = {}
    knn_ivf_indexed(str(tmp_path / "ivf"), x[:2], np.arange(2),
                    k=5, nprobe=2, stats=stats)
    # 2 queries x nprobe=2 touch at most 4 of the 8 cells
    assert stats["probed_cells"] <= 4 < stats["total_cells"]
    assert 0 < stats["bytes_probed"] < stats["bytes_total"]


def test_build_ivf_index_resumes(tmp_path):
    """A second build over the same input skips every finished cell;
    clearing one cell's marker re-writes only that cell, and the
    probe result is unchanged."""
    import os

    from totem_ray.functions.similarity import (build_ivf_index,
                                                knn_ivf_indexed)

    emb, x = _emb_table(n=200, seed=3)
    path = str(tmp_path / "ivf")
    first = build_ivf_index(emb, path, ncells=4, fit="seeded")
    assert first["written"] + first["skipped"] == 4
    before = knn_ivf_indexed(path, x[:2], np.arange(2), k=5, nprobe=4)
    again = build_ivf_index(emb, path, ncells=4, fit="seeded")
    assert again["skipped"] == 4 and again["written"] == 0
    # simulate a crash that lost one cell's completion
    os.remove(os.path.join(path, "part-00002", "_DONE"))
    os.remove(os.path.join(path, "_ALL_DONE"))
    resumed = build_ivf_index(emb, path, ncells=4, fit="seeded")
    assert resumed["skipped"] == 3
    after = knn_ivf_indexed(path, x[:2], np.arange(2), k=5, nprobe=4)
    key = ["query_id", "knn_rank"]
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        after.sort_values(key).reset_index(drop=True))


def test_build_ivf_index_refuses_param_mismatch(tmp_path):
    """Rebuilding an existing layout with different params must
    refuse BEFORE mutating anything — previously new centroids were
    written first, the sink then raised on the partition-count
    mismatch, and the intact _ALL_DONE left knn_ivf_indexed serving
    new centroids over the old cell files (silently wrong)."""
    import os

    import pytest

    from totem_ray.functions.similarity import (build_ivf_index,
                                                knn_ivf_indexed)

    emb, x = _emb_table(n=200, seed=3)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, ncells=4, fit="seeded")
    cent_before = open(os.path.join(path, "_centroids.npy"), "rb").read()
    before = knn_ivf_indexed(path, x[:2], np.arange(2), k=5, nprobe=4)
    with pytest.raises(ValueError, match="different parameters"):
        build_ivf_index(emb, path, ncells=8, fit="seeded")
    # nothing on disk changed: centroids bit-identical, probes intact
    assert open(os.path.join(path, "_centroids.npy"),
                "rb").read() == cent_before
    after = knn_ivf_indexed(path, x[:2], np.arange(2), k=5, nprobe=4)
    key = ["query_id", "knn_rank"]
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        after.sort_values(key).reset_index(drop=True))


def test_build_ivf_index_refuses_changed_input(tmp_path):
    """Same params, different rows: the resumable sink would skip
    every _DONE cell and leave refit centroids over stale files — the
    input fingerprint in _IVF_META.json must catch it up front."""
    import pytest

    from totem_ray.functions.similarity import build_ivf_index

    emb, x = _emb_table(n=200, seed=3)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, ncells=4, fit="seeded")
    other, _ = _emb_table(n=150, seed=9)
    with pytest.raises(ValueError, match="input_fingerprint"):
        build_ivf_index(other, path, ncells=4, fit="seeded")


def test_load_ivf_index_incomplete_raises(tmp_path):
    import pytest

    from totem_ray.functions.similarity import load_ivf_index

    with pytest.raises(ValueError, match="incomplete or missing"):
        load_ivf_index(str(tmp_path / "nope"))


# ----------------------------------------------------------------- text
def test_token_stats_closed_form():
    from totem_ray.functions.text import token_stats

    out = token_stats(_docs(["one two  three", "a,b.c!", ""])) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[1, "punct_count"] == 3
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "n_chars_measured"] == 0


def test_quality_and_lang_id_run_and_are_deterministic():
    from totem_ray.functions.text import lang_id, quality_scores

    docs = _docs(["The quick brown fox jumps over the lazy dog.",
                  "zzzz qqqq xxxx", ""])
    q1 = quality_scores(docs).to_pandas().sort_values("doc_id")
    q2 = quality_scores(docs).to_pandas().sort_values("doc_id")
    assert np.allclose(q1["quality"].to_numpy(), q2["quality"].to_numpy())
    # a real sentence scores above keyboard mash
    assert q1["quality"].iloc[0] > q1["quality"].iloc[1]
    l1 = lang_id(docs).to_pandas().sort_values("doc_id")
    assert l1["pred_lang"].iloc[0] == "en"
    assert l1["pred_lang"].iloc[1] == "und"   # zero stopword evidence


# -------------------------------------------------------------- windows
def _events():
    ts = pa.array(np.array([0, 10, 3_700, 3_800, 10_000], dtype=np.int64)
                  * 1_000_000, type=pa.timestamp("us"))
    return rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 1], type=pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], type=pa.float64())}))


def test_tumbling_window_counts():
    from totem_ray.functions.windows import tumbling_window

    out = tumbling_window(_events(), width_s=3600).to_pandas()
    out["w"] = out["window_start"].astype("datetime64[s]").astype("int64")
    k = out.set_index(["user_id", "w"])
    assert k.loc[(1, 0), "n_events"] == 2
    assert k.loc[(1, 0), "sum_value"] == 3.0
    assert k.loc[(1, 3600), "n_events"] == 1
    assert k.loc[(2, 3600), "n_events"] == 1
    assert k.loc[(1, 7200), "n_events"] == 1


def test_tumbling_window_string_key_raises():
    """Non-integer keys must fail with the fix spelled out, not crash
    deep inside the uint64 mix (ADVICE r4: the int64 cast silently
    restricted the key domain)."""
    import pytest

    from totem_ray.functions.windows import tumbling_window

    ev = rd.from_arrow(pa.table({
        "user_id": pa.array(["alice", "bob"], type=pa.string()),
        "ts": pa.array(np.array([0, 1], dtype="datetime64[us]")),
        "value": pa.array([1.0, 2.0], type=pa.float64())}))
    with pytest.raises(Exception, match="integer-typed"):
        tumbling_window(ev, width_s=3600).to_pandas()


def test_session_windows_gap_split():
    from totem_ray.functions.windows import session_windows

    out = session_windows(_events(), gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1]
    # user 1: events at 0,10 | 3700 | 10000 -> 3 sessions
    assert len(u1) == 3
    assert sorted(u1["n_events"].tolist()) == [1, 1, 2]


def test_as_of_join_last_value():
    from totem_ray.functions.windows import as_of_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "lt": pa.array(np.array([100, 5], dtype=np.int64) * 1_000_000,
                       type=pa.timestamp("us"))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "rt": pa.array(np.array([10, 50], dtype=np.int64) * 1_000_000,
                       type=pa.timestamp("us")),
        "rv": pa.array([7.0, 9.0], type=pa.float64())}))
    out = as_of_join(left, right, key="k", ts_left="lt", ts_right="rt",
                     value_cols=["rv"]) \
        .to_pandas().sort_values("lt").reset_index(drop=True)
    # lt=5: no right row at/before -> null; lt=100: last is rt=50 (9.0)
    rv = [c for c in out.columns if c.endswith("rv")][0]
    assert pd.isna(out.loc[0, rv])
    assert out.loc[1, rv] == 9.0


# ----------------------------------------------------------- multimodal
def test_multimodal_fake_decode_deterministic():
    from totem_ray.functions.multimodal import (decode_images,
                                                synthetic_media_table)

    media = rd.from_arrow(synthetic_media_table(8))
    a = decode_images(media).to_pandas().sort_values("media_id") \
        .reset_index(drop=True)
    b = decode_images(media).to_pandas().sort_values("media_id") \
        .reset_index(drop=True)
    assert len(a) == 8
    for c in ("mean_r", "mean_g", "mean_b"):
        assert np.allclose(a[c].to_numpy(), b[c].to_numpy())
    assert (a["height"] > 0).all() and (a["width"] > 0).all()


def test_multimodal_decode_matches_independent_oracle():
    # the driver-grade value check: the fake decode is a pure function
    # of the payload, so the DuckDB VALUES oracle built from an
    # independent pure-python splitmix64 transcription must agree
    # exactly (same compare the driver runs at sf0.01)
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    mine = e.q_multimodal_decode("/root/testdata/sf0.01").to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    orc = duckdb.sql(e.oracle_sql()["multimodal_decode"]).df() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(mine) == len(orc) == 32
    cols = sorted(mine.columns)
    assert cols == sorted(orc.columns)
    pd.testing.assert_frame_equal(mine[cols], orc[cols])


def test_asof_join_preserves_big_int64_value_columns():
    # the merge is Arrow/numpy end to end — int64 ids beyond 2^53
    # (which a pandas hop would degrade to float64) survive exactly,
    # even though the column is nullable (null-padded on left rows)
    import ray.data as _rd

    from totem_ray.functions.windows import as_of_join

    big = (1 << 60) + 7
    left = _rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 20], pa.int64())}))
    right = _rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([5], pa.int64()),
        "big_id": pa.array([big], pa.int64())}))
    out = as_of_join(left, right, key="k", ts_left="ts", ts_right="rts",
                     value_cols=["big_id"]).to_pandas()
    assert len(out) == 2
    assert sorted(out["r_big_id"].tolist()) == [big, big]
    assert str(out["r_big_id"].dtype) in ("int64", "Int64")


def test_asof_join_preserves_big_int64_left_payload():
    # the LEFT side's payload columns get null-padded on right rows of
    # a bucket block — they must keep int64 exactness too
    import ray.data as _rd

    from totem_ray.functions.windows import as_of_join

    big = (1 << 60) + 1
    left = _rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 20], pa.int64()),
        "event_id": pa.array([big, 2], pa.int64())}))
    right = _rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([5], pa.int64()),
        "v": pa.array([1.5], pa.float64())}))
    out = as_of_join(left, right, key="k", ts_left="ts", ts_right="rts",
                     value_cols=["v"]).to_pandas()
    assert sorted(out["l_event_id"].tolist()) == [2, big]
    assert (out["r_v"] == 1.5).all()


def test_asof_join_backward_tie_inclusive():
    # ts_right == ts_left must match (backward as-of tie semantics)
    import ray.data as _rd

    from totem_ray.functions.windows import as_of_join

    left = _rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 9], pa.int64())}))
    right = _rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([10], pa.int64()),
        "v": pa.array([4.0], pa.float64())}))
    out = as_of_join(left, right, key="k", ts_left="ts", ts_right="rts",
                     value_cols=["v"]).to_pandas().sort_values("ts")
    assert pd.isna(out["r_v"].iloc[0])    # ts=9: before the right row
    assert out["r_v"].iloc[1] == 4.0      # ts=10: tie matches


def test_asof_join_empty_bucket_keeps_value_dtype():
    # a bucket with zero right rows must pad value columns with TYPED
    # nulls: a bare np.nan made string columns float64 in that bucket
    # and the blocks' schemas no longer unified
    import ray.data as _rd

    from totem_ray.functions.windows import as_of_join

    # many keys so some hash buckets have left rows but no right rows
    n = 64
    left = _rd.from_arrow(pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(np.full(n, 100), pa.int64())}))
    right = _rd.from_arrow(pa.table({
        "k": pa.array([0], pa.int64()),
        "rts": pa.array([5], pa.int64()),
        "name": pa.array(["x"], pa.string())}))
    out = as_of_join(left, right, key="k", ts_left="ts", ts_right="rts",
                     value_cols=["name"]).to_pandas()
    assert len(out) == n
    assert (out["r_name"].dropna() == "x").all()
    assert out["r_name"].notna().sum() == 1


def test_minhash_short_docs_not_merged():
    # docs with fewer than shingle_k tokens have no shingles and used
    # to keep the all-sentinel signature — every pair of unrelated
    # short docs matched with jaccard_est 1.0 and merged
    from totem_ray.functions.dedup import (minhash_dedup_groups,
                                           minhash_lsh_candidates)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["foo bar", "baz qux",
                          "a long enough document with many words",
                          "a long enough document with many words"]),
    }))
    cand = minhash_lsh_candidates(docs).to_pandas()
    short_pairs = cand[(cand["a"] == 1) & (cand["b"] == 2)]
    assert len(short_pairs) == 0
    groups = minhash_dedup_groups(docs, tau=0.8).to_pandas() \
        .set_index("doc_id")["dup_group"].to_dict()
    assert groups[1] == 1 and groups[2] == 2     # own groups
    assert groups[3] == groups[4] == 3           # real clones merge


def test_simhash_blocking_full_recall_at_radius_8():
    # pigeonhole blocking: pairs differing 2-2-2-2 across the old
    # fixed 16-bit chunks were missed at max_hamming=8
    from totem_ray.functions import dedup as dd
    from totem_ray.functions.dedup import simhash_near_dup_pairs

    base = np.uint64(0x0123456789ABCDEF)
    # flip 2 bits in each 16-bit quarter -> hamming 8, no shared quarter
    flip = np.uint64(0)
    for q in range(4):
        flip |= np.uint64(0b11) << np.uint64(16 * q + 3)
    other = base ^ flip

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a", "b"])}))

    import totem_ray.functions.dedup as dmod

    def fake_sigs(docs_, id_col="doc_id"):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "simhash": pa.array(np.array([base, other]).view(np.int64)),
        }))

    orig = dmod.simhash_signatures
    dmod.simhash_signatures = fake_sigs
    try:
        pairs = simhash_near_dup_pairs(docs, max_hamming=8).to_pandas()
    finally:
        dmod.simhash_signatures = orig
    assert len(pairs) == 1
    assert int(pairs.iloc[0]["hamming"]) == 8


def test_exact_dedup_custom_id_col():
    from totem_ray.functions.dedup import exact_dedup

    docs = rd.from_arrow(pa.table({
        "my_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array(["same", "same", "other"])}))
    out = exact_dedup(docs, id_col="my_id").to_pandas()
    assert sorted(out["my_id"]) == [10, 30]


def test_sample_frames_video_only():
    # image/audio rows (n_frames null) used to emit one bogus
    # whole-payload frame each; only video rows may produce frames
    from totem_ray.functions.multimodal import (sample_frames,
                                                synthetic_media_table)

    tbl = synthetic_media_table(24)
    media = rd.from_arrow(tbl)
    out = sample_frames(media, every_n=5).to_pandas()
    types = {r["media_id"]: r["media_type"] for r in tbl.to_pylist()}
    assert len(out) > 0
    assert all(types[m] == "video" for m in out["media_id"])
    nf = {r["media_id"]: r["n_frames"] for r in tbl.to_pylist()
          if r["media_type"] == "video"}
    import math
    want = sum(math.ceil(max(v, 1) / 5) for v in nf.values())
    assert len(out) == want


def test_knn_ivf_sample_ratio_at_one():
    # total in (sample_n, 1.25*sample_n]: the keep-ratio clamps to 1.0,
    # which used to overflow np.uint64 (1.0*(2^64-1) rounds to 2^64) —
    # now the filter is skipped entirely and every row feeds the fit
    from totem_ray.functions.similarity import knn_brute_force, knn_ivf

    emb, x = _emb_table(n=45)
    q = x[:2]
    out = knn_ivf(emb, q, np.arange(2), k=5, ncells=4, nprobe=4,
                  sample_n=40)
    bf = knn_brute_force(emb, q, np.arange(2), k=5)
    # nprobe == ncells -> must equal brute force exactly
    for qi in range(2):
        a = out[out["query_id"] == qi].sort_values("knn_rank")
        b = bf[bf["query_id"] == qi].sort_values("knn_rank")
        assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()


def test_as_of_join_empty_side():
    # an empty (0-row, schema-bearing) side: the int64-magnitude guard
    # used to call .get on the None that Dataset.max() returns there;
    # a schema-LESS zero-block side must raise clearly, not crash
    import pytest

    from totem_ray.functions.windows import as_of_join

    lt = pa.table({
        "k": pa.array([1], type=pa.int64()),
        "lt": pa.array(np.array([100], dtype=np.int64) * 1_000_000,
                       type=pa.timestamp("us")),
        "payload": pa.array([7], type=pa.int64())})
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()),
        "rt": pa.array(np.array([10], dtype=np.int64) * 1_000_000,
                       type=pa.timestamp("us")),
        "rv": pa.array([7], type=pa.int64())}))
    out = as_of_join(rd.from_arrow(lt.slice(0, 0)), right,
                     key="k", ts_left="lt", ts_right="rt",
                     value_cols=["rv"])
    assert out.count() == 0
    with pytest.raises(ValueError, match="no schema"):
        as_of_join(rd.from_arrow(lt).filter(lambda r: False), right,
                   key="k", ts_left="lt", ts_right="rt",
                   value_cols=["rv"])


def test_asof_join_preserves_int64_min_sentinel():
    # INT64_MIN sentinels round-trip bit-exact through the Arrow merge
    # (the old pandas hop degraded nullable int64 to float64)
    import ray.data as _rd

    from totem_ray.functions.windows import as_of_join

    sent = -(1 << 63)
    left = _rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([10], pa.int64())}))
    right = _rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([5], pa.int64()),
        "sent": pa.array([sent], pa.int64())}))
    out = as_of_join(left, right, key="k", ts_left="ts", ts_right="rts",
                     value_cols=["sent"]).to_pandas()
    assert out["r_sent"].tolist() == [sent]


def test_simhash_excludes_tokenless_docs():
    # empty / whitespace-only docs keep the default signature 0; they
    # must not pair with each other (hamming 0) nor with real docs
    import ray.data as _rd

    from totem_ray.functions.dedup import simhash_near_dup_pairs

    docs = _rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "   ", "alpha beta gamma delta",
                          "alpha beta gamma delta"], pa.string()),
    }))
    out = simhash_near_dup_pairs(docs, max_hamming=3).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert (3, 4) in pairs          # identical real docs still found
    assert all(1 not in p and 2 not in p for p in pairs)  # empties never


def test_sink_rejects_key_change(tmp_path):
    import pytest
    import ray.data as _rd

    from totem_ray.sources.sink import write_parquet_resumable

    ds = _rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "b": pa.array([4, 5, 6], pa.int64())}))
    out = str(tmp_path / "sink")
    write_parquet_resumable(ds, out, key="a", num_partitions=4)
    with pytest.raises(ValueError, match="key"):
        write_parquet_resumable(ds, out, key="b", num_partitions=4)


def test_knn_ivf_empty_dataset():
    import ray.data as _rd

    from totem_ray.functions.similarity import knn_ivf

    empty = _rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    q = np.random.default_rng(0).normal(size=(2, 4))
    out = knn_ivf(empty, q, np.array([100, 101]), k=3)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "neighbor_id",
                                 "cos_sim", "knn_rank"]


def test_multimodal_null_payload_rows():
    import pyarrow as pa
    import ray.data
    from totem_ray.functions.multimodal import (decode_images,
                                                resize_images,
                                                sample_frames,
                                                synthetic_media_table)

    t = synthetic_media_table(4)
    # null out one payload (missing media must not crash the stage)
    pays = t["payload"].to_pylist()
    pays[1] = None
    t = t.set_column(t.schema.get_field_index("payload"), "payload",
                     pa.array(pays, type=pa.large_binary()))
    ds = ray.data.from_arrow(t)

    dec = decode_images(ds, batch_size=4).to_pandas()
    assert len(dec) == 4
    assert dec["mean_r"].isna().sum() == 1 and dec["height"].isna().sum() == 1

    res = resize_images(ds, out_h=4, out_w=4, batch_size=4).to_pandas()
    assert len(res) == 4 and res["payload"].isna().sum() == 1

    # frames: null-payload video rows are skipped, others still sampled
    fr = sample_frames(ds, every_n=1, batch_size=4).to_pandas()
    vids = t.filter(pa.compute.equal(t["media_type"], "video"))
    assert set(fr["media_id"]).issubset(set(vids["media_id"].to_pylist()))


def test_minhash_clone_family_collapses_to_star():
    """A family of f identical docs must emit O(f) candidate rows (a
    star to the min id, est 1.0), not the C(f,2) clique — and the dup
    groups must equal the all-pairs mode's."""
    from totem_ray.functions.dedup import (minhash_dedup_groups,
                                           minhash_lsh_candidates)

    f = 30
    text = "many words of shared boilerplate content flowing onward " * 4
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(f), type=pa.int64()),
        "text": pa.array([text] * f)}))
    cand = minhash_lsh_candidates(docs).to_pandas()
    # star: exactly f-1 distinct pairs, all (0, j), est 1.0
    assert len(cand) == f - 1
    assert set(cand["a"]) == {0}
    assert (cand["jaccard_est"] == 1.0).all()
    allp = minhash_lsh_candidates(
        docs, collapse_identical=False).to_pandas()
    assert len(allp) == f * (f - 1) // 2
    g1 = minhash_dedup_groups(docs, tau=0.8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (g1["dup_group"] == 0).all()


def test_duplicate_shingle_fraction_closed_form():
    """3-doc corpus with known 3-gram overlap: docs 1/2 share exactly
    one of their two shingles (frac 0.5), doc 3 shares none, and a
    2-token doc has no shingle identity (absent from output)."""
    from totem_ray.functions.dedup import duplicate_shingle_fraction

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["a b c d", "a b c x", "q r s t", "a b"],
                         type=pa.string())}))
    out = duplicate_shingle_fraction(docs).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")
    assert out.index.tolist() == [1, 2, 3]
    assert out.loc[1, "n_shingles"] == 2 and out.loc[1, "n_dup_shingles"] == 1
    assert out.loc[2, "dup_frac"] == 0.5
    assert out.loc[3, "n_dup_shingles"] == 0 and out.loc[3, "dup_frac"] == 0.0


def test_duplicate_shingle_fraction_matches_brute_force():
    """Fixture docs vs a pure-Python recomputation of the same
    definition (distinct k-grams per doc; duplicated = in >= 2 docs)."""
    from totem_ray.functions.dedup import duplicate_shingle_fraction
    from totem_ray.pipelines.tpch_graph import read_table

    docs = read_table("/root/testdata/sf0.001", "documents",
                      columns=["doc_id", "text"])
    out = duplicate_shingle_fraction(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pdf = docs.to_pandas()
    import collections
    per_doc = {}
    for _, r in pdf.iterrows():
        toks = [t for t in r["text"].lower().split() if t]
        grams = {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if grams:
            per_doc[int(r["doc_id"])] = grams
    df_count = collections.Counter(g for gs in per_doc.values() for g in gs)
    for _, r in out.iterrows():
        grams = per_doc[int(r["doc_id"])]
        nd = sum(1 for g in grams if df_count[g] >= 2)
        assert int(r["n_shingles"]) == len(grams)
        assert int(r["n_dup_shingles"]) == nd
    assert set(out["doc_id"]) == set(per_doc)


def test_hopping_window_overlap():
    """width 1h, hop 15min: each event appears in exactly 4 windows;
    the window aligned at the event's hop boundary and the 3 before."""
    from totem_ray.functions.windows import hopping_window, tumbling_window

    out = hopping_window(_events(), width_s=3600, hop_s=900).to_pandas()
    out["w"] = out["window_start"].astype("datetime64[s]").astype("int64")
    # event at t=0 (user 1) is in windows starting -2700,-1800,-900,0
    u1 = out[out["user_id"] == 1]
    for ws in (-2700, -1800, -900, 0):
        assert (u1["w"] == ws).any(), ws
    # window [0, 3600) for user 1 contains events at 0 and 10 only
    k = out.set_index(["user_id", "w"])
    assert k.loc[(1, 0), "n_events"] == 2
    assert k.loc[(1, 0), "sum_value"] == 3.0
    # degenerate case hop == width equals tumbling
    hp = hopping_window(_events(), width_s=3600, hop_s=3600).to_pandas() \
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    tw = tumbling_window(_events(), width_s=3600).to_pandas() \
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(hp, tw)


def test_hopping_window_rejects_bad_hop():
    import pytest

    from totem_ray.functions.windows import hopping_window

    with pytest.raises(ValueError, match="multiple"):
        hopping_window(_events(), width_s=3600, hop_s=1000)


def test_duplicate_shingle_fraction_plans_agree():
    """Broadcast flag set vs hash-join fallback (forced with a zero
    broadcast gate) must produce identical rows."""
    from totem_ray.functions.dedup import duplicate_shingle_fraction
    from totem_ray.pipelines.tpch_graph import read_table

    docs = read_table("/root/testdata/sf0.001", "documents",
                      columns=["doc_id", "text"])
    a = duplicate_shingle_fraction(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = duplicate_shingle_fraction(docs, broadcast_max_shingles=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup_shingles"] <= a["n_shingles"]).all()


def test_contamination_fraction_closed_form():
    """Reference = doc 0; doc 1 shares half its shingles with it, doc
    2 none; the reference doc itself scores 1.0 (self-overlap,
    documented)."""
    from totem_ray.functions.dedup import contamination_fraction

    docs = _docs(["a b c d", "a b c x", "q r s t"])
    ref = _docs(["a b c d"], ids=[0])
    out = contamination_fraction(docs, ref).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")
    assert out.loc[0, "contamination_frac"] == 1.0
    assert out.loc[1, "contamination_frac"] == 0.5
    assert out.loc[2, "contamination_frac"] == 0.0
    assert out.loc[1, "n_shingles"] == 2
    assert out.loc[1, "n_contaminated"] == 1


def test_contamination_fraction_plans_agree():
    from totem_ray.functions.dedup import contamination_fraction
    from totem_ray.pipelines.tpch_graph import read_table

    docs = read_table("/root/testdata/sf0.001", "documents",
                      columns=["doc_id", "text"])

    def ref_filter(t):
        return t.filter(pa.array(np.asarray(t["doc_id"]) % 17 == 0))

    ref = docs.map_batches(ref_filter, batch_format="pyarrow")
    a = contamination_fraction(docs, ref).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = contamination_fraction(docs, ref, broadcast_max_shingles=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # every ref doc fully overlaps itself
    refs = a[a["doc_id"] % 17 == 0]
    assert (refs["contamination_frac"] == 1.0).all()


def test_contamination_fraction_empty_ref():
    """An empty reference corpus contaminates nothing."""
    from totem_ray.functions.dedup import contamination_fraction

    docs = _docs(["a b c d", "q r s t"])
    ref = _docs([], ids=[])
    out = contamination_fraction(docs, ref).to_pandas()
    assert (out["contamination_frac"] == 0.0).all()
    assert (out["n_contaminated"] == 0).all()
