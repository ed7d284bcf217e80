"""HyperLogLog + hash-threshold sampling tests: register parity with
a direct transcription, estimate accuracy on corpora with known
cardinality, sampling determinism / rate / repartition-invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
import ray.data as rd

from totem_ray.functions.sketch import (_bit_length_u64, hash_sample,
                                        hll_estimate, hll_token_registers)
from totem_ray.hashing import splitmix64, tab_hash_strings


def _docs_ds(texts, num_blocks=4):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return ray.data.from_arrow(t).repartition(num_blocks)


def _expected_registers(texts, p):
    toks = [w for s in texts for w in s.lower().split() if w]
    h = tab_hash_strings(pa.array(toks, type=pa.string())).view(np.uint64)
    low = 64 - p
    reg = np.zeros(1 << p, dtype=np.int64)
    for v in h:
        b = int(v >> np.uint64(low))
        w = int(v & ((np.uint64(1) << np.uint64(low)) - np.uint64(1)))
        rho = low - w.bit_length() + 1
        reg[b] = max(reg[b], rho)
    return reg


def test_bit_length_exact():
    vals = np.array([0, 1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 54) - 1],
                    dtype=np.uint64)
    assert _bit_length_u64(vals).tolist() == \
        [int(v).bit_length() for v in vals]


@pytest.mark.parametrize("p", [4, 10])
def test_hll_registers_match_direct(p):
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    regs = hll_token_registers(_docs_ds(texts), p=p).to_pandas()
    exp = _expected_registers(texts, p)
    got = np.zeros(1 << p, dtype=np.int64)
    got[regs["bucket"].to_numpy()] = regs["rho"].to_numpy()
    assert np.array_equal(got, exp)


def test_hll_estimate_accuracy():
    # 2000 distinct tokens -> estimate within ~10% (1.04/sqrt(1024) ~ 3%)
    rng = np.random.default_rng(9)
    vocab = [f"w{i:05d}" for i in range(2000)]
    texts = [" ".join(rng.choice(vocab, 200)) for _ in range(200)]
    toks = {w for s in texts for w in s.split()}
    regs = hll_token_registers(_docs_ds(texts), p=10)
    est = hll_estimate(regs, p=10)
    assert abs(est - len(toks)) / len(toks) < 0.10


def test_hll_empty_corpus():
    regs = hll_token_registers(_docs_ds(["", "   "]), p=10)
    assert regs.count() == 0
    assert hll_estimate(regs.to_pandas(), p=10) == 0.0


def test_hash_sample_deterministic_and_partition_invariant():
    ids = np.arange(20_000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    a = hash_sample(ray.data.from_arrow(t).repartition(2),
                    "doc_id", 0.1).to_pandas()["doc_id"].to_numpy()
    b = hash_sample(ray.data.from_arrow(t).repartition(16),
                    "doc_id", 0.1).to_pandas()["doc_id"].to_numpy()
    assert np.array_equal(np.sort(a), np.sort(b))
    # expected fraction: 0.1 +- a generous binomial band
    assert 0.08 < len(a) / len(ids) < 0.12
    # membership is a pure function of (key, seed)
    seed_c = splitmix64(np.array([7], dtype=np.uint64))[0]
    v = splitmix64(ids.view(np.uint64) ^ seed_c)
    exp = ids[v < np.uint64(int(0.1 * (1 << 64)))]
    assert np.array_equal(np.sort(a), exp)


def test_hash_sample_rate_bounds():
    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64))})
    assert hash_sample(ray.data.from_arrow(t), "doc_id", 0.0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(ray.data.from_arrow(t), "doc_id", 1.5)


def test_top_tokens_exact():
    from totem_ray.functions.text import top_tokens

    texts = ["b b b a a c", "a a d  d", "e", ""]
    df = top_tokens(_docs_ds(texts, num_blocks=3), k=3).to_pandas()
    assert list(zip(df["tok"], df["cnt"])) == [("a", 4), ("b", 3), ("d", 2)]


def test_top_tokens_tie_break_token_asc():
    from totem_ray.functions.text import top_tokens

    texts = ["z y x", "x y z"]
    df = top_tokens(_docs_ds(texts), k=2).to_pandas()
    assert list(df["tok"]) == ["x", "y"]


def test_top_k_per_key_closed_form():
    """Per-key cap: top-2 by value desc, ties by id asc; keys with
    fewer rows keep them all; payload columns ride through."""
    from totem_ray.functions.sketch import top_k_per_key

    ds = rd.from_arrow(pa.table({
        "host": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "doc": pa.array([10, 11, 12, 20, 21, 30], type=pa.int64()),
        "score": pa.array([5.0, 9.0, 9.0, 1.0, 2.0, 7.0]),
        "text": pa.array(list("abcdef"), type=pa.string())}))
    out = top_k_per_key(ds, "host", "score", k=2, tie_col="doc") \
        .to_pandas().sort_values(["host", "doc"]).reset_index(drop=True)
    # host 1: scores 9,9,5 -> docs 11,12 (tie id asc); host 2: both;
    # host 3: its single row
    assert out["doc"].tolist() == [11, 12, 20, 21, 30]
    assert out.columns.tolist() == ["host", "doc", "score", "text"]
    assert out[out["doc"] == 11]["text"].iloc[0] == "b"


def test_top_k_per_key_int64_exact_order():
    """int64 order columns must sort exactly (sign-bit-flip key, no
    float64 round-trip): values beyond 2^53 differing by 1 pick the
    true maximum."""
    from totem_ray.functions.sketch import top_k_per_key

    big = (1 << 60) + 10
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1], type=pa.int64()),
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "v": pa.array([big, big + 1, -big], type=pa.int64())}))
    out = top_k_per_key(ds, "k", "v", k=1, tie_col="id").to_pandas()
    assert out["id"].tolist() == [2]
    asc = top_k_per_key(ds, "k", "v", k=1, tie_col="id",
                        descending=False).to_pandas()
    assert asc["id"].tolist() == [3]


def test_top_k_per_key_rejects_nan():
    import pytest

    from totem_ray.functions.sketch import top_k_per_key

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "v": pa.array([1.0, float("nan")])}))
    with pytest.raises(Exception, match="NaN"):
        top_k_per_key(ds, "k", "v", k=1).to_pandas()


def test_hash_split_deterministic_partition():
    """Every row gets exactly one label; labels are a pure function
    of (key, seed) — stable across block layouts; fractions
    approximately honored; disjoint with hash_sample semantics."""
    from totem_ray.functions.sketch import hash_split

    ids = np.arange(5000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    outs = []
    for nb in (1, 7):
        ds = rd.from_arrow([t.slice(i, max(1, len(ids) // nb))
                            for i in range(0, len(ids),
                                           max(1, len(ids) // nb))])
        out = hash_split(ds, "doc_id", fr).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    assert len(out) == len(ids)                      # fractions sum to 1
    counts = out["split"].value_counts()
    assert abs(counts["train"] / len(ids) - 0.8) < 0.03
    assert abs(counts["val"] / len(ids) - 0.1) < 0.02
    assert abs(counts["test"] / len(ids) - 0.1) < 0.02


def test_hash_split_partial_fractions_drop_remainder():
    from totem_ray.functions.sketch import hash_split

    ids = np.arange(2000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    out = hash_split(ds, "doc_id", {"sample": 0.25}).to_pandas()
    assert 0 < len(out) < len(ids)
    assert (out["split"] == "sample").all()
    import pytest
    with pytest.raises(ValueError, match="more than 1"):
        hash_split(ds, "doc_id", {"a": 0.9, "b": 0.2})


def test_top_k_per_key_uint64_order():
    """uint64 order columns take the unsigned branch: values >= 2^63
    must rank above small values (the int64 sign-bit flip would
    invert them)."""
    from totem_ray.functions.sketch import top_k_per_key

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "id": pa.array([1, 2], type=pa.int64()),
        "v": pa.array([1, 1 << 63], type=pa.uint64())}))
    out = top_k_per_key(ds, "k", "v", k=1, tie_col="id").to_pandas()
    assert out["id"].tolist() == [2]
