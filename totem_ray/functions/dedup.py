"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

The reference's only dedup is exact repeated-edge counting after sort
(totem_generator.cc:298-318); the near-dup family here is the
large-scale training-data extension (MinHash/LSH per Broder '97,
SimHash per Charikar '02 — public algorithms, from-scratch numpy
implementations).

Design rules:
* shingling / signatures are vectorized per batch (explode to token
  rows, shifted-array k-grams, matrix min-reduce) — no per-doc Python;
* candidate generation is a (band, bucket) groupby — one shuffle of
  small signature rows, never of document text;
* duplicate GROUPS come from running our own BSP connected-components
  over the candidate-pair edge list (dedup at 100 TB is a graph
  problem; the label is the minimum doc_id of the cluster).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Min

from totem_ray.graph.joins import hash_join
from totem_ray.hashing import as_u64, splitmix64, tab_hash_strings
from totem_ray.nputil import (col_np, composite_group_starts,
                              group_starts_sizes, in_sorted,
                              pairs_within_groups)

# The Unicode White_Space set written as an EXPLICIT character class
# (literal code points, resolved by the Python string literal): the
# pipeline tokenizer runs on polars (Rust regex, where \s is
# Unicode-aware) while the DuckDB oracle runs on RE2 (where \s is
# ASCII-only [\t\n\f\r ]) — a bare \s+ would silently tokenize
# differently on vertical tab / NBSP / U+2028 etc. An explicit class
# is interpreted identically by both engines.
TOKEN_SPLIT_RE = ("[\t\n\x0b\x0c\r \x85\xa0\u1680"
                  "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+")

_SENTINEL = np.iinfo(np.int64).max


def _shuffle_group(*cols, buckets: int = 64) -> np.ndarray:
    """Deterministic shuffle-bucket id from one or more int64 columns
    (splitmix64 fold) — the shared keying for the candidate-pair
    groupbys below."""
    g = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        g = splitmix64(g ^ as_u64(np.asarray(c)))
    return (g % buckets).astype(np.int64)


def _combine_pairs(pairs, value_col: str, how: str):
    """Distinct (a, b) with min/sum of ``value_col`` — the cross-band
    pair combine (see joins.grouped_reduce for why this is not Ray's
    two-key sort aggregate, which measured 115 s on a 2M-row
    distinct)."""
    from totem_ray.graph.joins import grouped_reduce

    return grouped_reduce(pairs, ["a", "b"], [value_col], how=how)


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def exact_dedup(docs, id_col: str = "doc_id"):
    """Survivor ids: min(doc_id) per distinct text (hash-partition +
    per-group first — SURVEY.md §2.9's exact-dedup pattern). Groups on
    a 64-bit content fingerprint so the shuffle moves 16 bytes per
    doc, not the text."""
    from totem_ray.functions.text import doc_fingerprints

    from totem_ray.graph.joins import grouped_reduce

    fps = doc_fingerprints(docs, normalize=False, id_col=id_col)
    return grouped_reduce(fps, ["fingerprint"], [id_col], how="min") \
        .select_columns([id_col])


# ----------------------------------------------------------------------
# shingling (shared by minhash / jaccard)
# ----------------------------------------------------------------------
def _shingle_rows(t: pa.Table, k: int, id_col: str = "doc_id") -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_id_row, shingle_hash_row): one row per word k-gram,
    vectorized via explode + shifted-array combination."""
    from totem_ray._polars_compat import pl

    df = pl.DataFrame({
        "doc": pl.from_arrow(t[id_col].combine_chunks()),
        "tok": pl.from_arrow(pc.utf8_lower(t["text"]).combine_chunks()),
    }).with_columns(
        # \s+ tokenization (TOKEN_SPLIT_RE semantics, matching
        # text.py's \S+ token counting): polars split() is literal,
        # so collapse runs of whitespace to one space first
        pl.col("tok").str.replace_all(TOKEN_SPLIT_RE, " ")
          .str.split(" ").alias("toks")) \
      .drop("tok").explode("toks") \
      .filter(pl.col("toks").str.len_chars() > 0)
    doc = df["doc"].to_numpy()
    # tabulation-style hash (NOT siphash): every step transcribes to
    # DuckDB SQL, so the minhash/simhash oracles can value-check the
    # full pipeline on the real documents table (see tab_hash_strings)
    tok_hash = as_u64(tab_hash_strings(df["toks"].to_arrow()))
    if len(doc) == 0 or k <= 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    n = len(doc)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h = tok_hash[: n - k + 1].copy()
    same = doc[: n - k + 1] == doc[k - 1:]
    for j in range(1, k):
        h = splitmix64(h) ^ tok_hash[j: n - k + 1 + j]
    return doc[: n - k + 1][same].astype(np.int64), h[same].view(np.int64)


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
def minhash_signatures(docs, num_perm: int = 64, shingle_k: int = 3,
                       id_col: str = "doc_id"):
    """(doc_id, sig: list<int64>[num_perm]) — one permutation = one
    seeded splitmix64; signature = column-min over the doc's shingle
    hashes (matrix min-reduce per batch)."""
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))

    def fn(t: pa.Table) -> pa.Table:
        doc, sh = _shingle_rows(t, shingle_k, id_col)
        ids = np.unique(np.asarray(t[id_col]))
        sig = np.full((len(ids), num_perm), np.iinfo(np.int64).max,
                      dtype=np.int64)
        if len(doc):
            order = np.argsort(doc, kind="stable")
            doc_s, sh_s = doc[order], as_u64(sh[order])
            starts, _ = group_starts_sizes(doc_s)
            mixed = splitmix64(sh_s[:, None] ^ seeds[None, :]).view(np.int64)
            mins = np.minimum.reduceat(mixed, starts, axis=0)
            rows = np.searchsorted(ids, doc_s[starts])
            sig[rows] = mins
        # fixed-width binary (num_perm little-endian int64s): survives
        # every join/shuffle as plain bytes — no list/tensor extension
        # types in flight; built from one contiguous buffer, no
        # per-row Python bytes
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "sig": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(num_perm * 8), len(sig),
                [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())]),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _decode_sigs(col, num_perm: int) -> np.ndarray:
    """binary sig column -> (n, num_perm) int64 matrix — zero-copy
    from the fixed-size-binary Arrow buffer when possible."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and pa.types.is_fixed_size_binary(col.type) \
            and col.null_count == 0 and col.type.byte_width == num_perm * 8:
        flat = np.frombuffer(col.buffers()[1], dtype=np.int64)
        off = col.offset * num_perm
        return flat[off:off + len(col) * num_perm].reshape(len(col), num_perm)
    vals = col.to_pylist() if not isinstance(col, (list, np.ndarray)) else col
    if not len(vals):
        return np.empty((0, num_perm), np.int64)
    return np.frombuffer(b"".join(vals), dtype=np.int64) \
             .reshape(len(vals), num_perm)


def minhash_lsh_candidates(docs, num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 3, id_col: str = "doc_id",
                           max_bucket: int = 2000,
                           collapse_identical: bool = True):
    """(a, b, jaccard_est) candidate near-dup pairs.

    signatures -> explode to (band_id, band_hash, doc, sig) rows ->
    groupby(band, hash) buckets -> pairs + estimated Jaccard
    (= matching-minhash fraction, computed IN the bucket from the
    carried signatures) -> distinct. Two shuffles total: the band-row
    exchange and the cross-band pair dedupe — no signature re-join
    (each band row carries the full num_perm*8-byte signature; the
    extra bytes ride the one shuffle that already moves the rows).
    Buckets larger than ``max_bucket`` are truncated — the standard
    guard against degenerate buckets.

    ``collapse_identical`` (default True): docs whose signatures are
    bit-identical within a bucket (boilerplate clone families — the
    dominant shape of a web corpus) are represented by a STAR to
    their min-id member (est exactly 1.0) plus cross pairs between
    representatives only, instead of the full C(f, 2) clique. A
    clone family of f docs emits O(f) rows instead of O(f^2) —
    without this a 200-member family costs ~20k pair rows PER BAND.
    Connectivity (and therefore minhash_dedup_groups / the dup-group
    oracle) is exactly preserved: est is a pure function of the two
    signatures, so member->rep->other paths carry the same >= tau
    reachability as the dropped member-member edges. Pass False for
    the literal all-pairs set."""
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by "
                         f"bands ({bands}) — a remainder would silently "
                         "drop signature rows from the banding")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_k, id_col)

    def to_bands(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col])
        sig = _decode_sigs(t["sig"], num_perm)
        # a doc with fewer than shingle_k tokens has NO shingles and
        # keeps the all-sentinel signature; two such docs would match
        # on every band with jaccard_est 1.0 and merge unrelated short
        # docs — no shingles means no MinHash identity, so emit no
        # band rows (exact_dedup still catches identical short texts)
        real = sig[:, 0] != _SENTINEL
        ids, sig = ids[real], sig[real]
        bh = np.empty((len(ids), bands), dtype=np.int64)
        for b in range(bands):
            chunk = as_u64(np.ascontiguousarray(
                sig[:, b * rows_per_band:(b + 1) * rows_per_band]))
            h = np.zeros(len(ids), dtype=np.uint64)
            for j in range(rows_per_band):
                h = splitmix64(h ^ chunk[:, j])
            bh[:, b] = h.view(np.int64)
        # fixed-width binary column built from ONE contiguous buffer
        # (each signature row repeated `bands` times) — no per-row
        # Python bytes objects
        rep = np.repeat(np.ascontiguousarray(sig), bands, axis=0)
        sig_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(num_perm * 8), len(rep),
            [None, pa.py_buffer(rep.tobytes())])
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(np.tile(np.arange(bands), len(ids)), type=pa.int64()),
            "bhash": pa.array(bh.reshape(-1), type=pa.int64()),
            "sig": sig_col,
        })

    band_rows = sigs.map_batches(to_bands, batch_format="pyarrow")

    def add_g(t: pa.Table) -> pa.Table:
        g = _shuffle_group(t["bhash"], t["band"])
        return t.append_column("_g", pa.array(g))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # all (band, bhash) groups of one shuffle bucket, vectorized
        band = col_np(t, "band")
        bh = col_np(t, "bhash")
        ids = col_np(t, id_col)
        sig = _decode_sigs(t["sig"], num_perm)
        order = np.lexsort((ids, bh, band))
        band, bh, ids, sig = band[order], bh[order], ids[order], sig[order]
        starts, sizes = composite_group_starts(band, bh)
        ords = np.arange(len(ids)) - np.repeat(starts, sizes)
        keep = ords < max_bucket                 # truncate huge buckets
        band, bh, ids, sig = band[keep], bh[keep], ids[keep], sig[keep]
        if not collapse_identical:
            starts, sizes = composite_group_starts(band, bh)
            first, second = pairs_within_groups(starts, sizes)
            est = (sig[first] == sig[second]).mean(axis=1) \
                if len(first) else np.empty(0, np.float64)
            return pa.table({
                "a": pa.array(ids[first], type=pa.int64()),
                "b": pa.array(ids[second], type=pa.int64()),
                "jaccard_est": pa.array(est, type=pa.float64())})
        # collapse identical signatures per bucket: a 128-bit fold of
        # the signature row identifies clones (two independent 64-bit
        # halves — same collision class as the triangle edge
        # fingerprints); runs of one fold value collapse to their
        # min-id representative
        f1 = np.zeros(len(ids), dtype=np.uint64)
        f2 = np.full(len(ids), np.uint64(0x9E3779B97F4A7C15))
        for j in range(num_perm):
            c = as_u64(np.ascontiguousarray(sig[:, j]))
            f1 = splitmix64(f1 ^ c)
            f2 = splitmix64(f2 ^ c)
        order = np.lexsort((ids, f2.view(np.int64), f1.view(np.int64),
                            bh, band))
        band, bh, ids, sig = band[order], bh[order], ids[order], sig[order]
        f1, f2 = f1[order], f2[order]
        # runs of identical (band, bhash, sigfold): star to the first
        # (= min id) member
        run_starts, run_sizes = composite_group_starts(
            band, bh, f1.view(np.int64), f2.view(np.int64))
        rep_of = np.repeat(run_starts, run_sizes)
        member = np.flatnonzero(np.arange(len(ids)) != rep_of)
        star_a = ids[rep_of[member]]
        star_b = ids[member]
        # cross pairs between the representatives of each bucket
        reps = run_starts
        rband, rbh, rids, rsig = band[reps], bh[reps], ids[reps], sig[reps]
        bstarts, bsizes = composite_group_starts(rband, rbh)
        first, second = pairs_within_groups(bstarts, bsizes)
        est = (rsig[first] == rsig[second]).mean(axis=1) \
            if len(first) else np.empty(0, np.float64)
        a = np.concatenate([star_a, np.minimum(rids[first], rids[second])])
        b = np.concatenate([star_b, np.maximum(rids[first], rids[second])])
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
            "jaccard_est": pa.array(np.concatenate(
                [np.ones(len(star_a), dtype=np.float64), est]),
                type=pa.float64())})

    pairs = band_rows.map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(bucket_pairs, batch_format="pyarrow")
    # a pair found in multiple bands appears multiple times (same est
    # each time) -> distinct via min
    return _combine_pairs(pairs, "jaccard_est", "min")


def minhash_dedup_groups(docs, tau: float = 0.8, num_perm: int = 64,
                         bands: int = 16, shingle_k: int = 3,
                         id_col: str = "doc_id", num_partitions: int = 4):
    """(doc_id, dup_group): connected components over the >= tau
    candidate graph, computed with THIS ENGINE's BSP CC kernel —
    dup_group = min doc_id of the duplicate cluster. Docs with no
    near-dup get their own id."""
    from totem_ray.algs import connected_components

    cand = minhash_lsh_candidates(docs, num_perm, bands, shingle_k, id_col)
    edges = cand.filter(expr=f"jaccard_est >= {tau}")

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a"].combine_chunks().cast(pa.int64()),
                         "dst": t["b"].combine_chunks().cast(pa.int64())})

    edge_ds = edges.map_batches(as_edges, batch_format="pyarrow")
    all_ids = docs.select_columns([id_col])
    out = connected_components(edge_ds, vertices=all_ids,
                               num_partitions=num_partitions)
    # materialize BEFORE releasing the engine: the result dataset's
    # blocks come from pending k_result actor tasks, and shutdown()'s
    # kill path (pool full/disabled, reset failure) would cancel them,
    # poisoning a lazily-consumed return value with RayActorError
    res = out["result"].materialize()
    out["engine"].shutdown()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["v"], "dup_group": t["label"]})

    return res.map_batches(rename, batch_format="pyarrow")


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def simhash_signatures(docs, id_col: str = "doc_id"):
    """(doc_id, simhash: int64) — 64-bit Charikar signature over
    unigram token hashes (vote per bit, vectorized bit-matrix
    reduceat)."""
    def fn(t: pa.Table) -> pa.Table:
        doc, tok = _shingle_rows(t, 1, id_col)
        ids = np.unique(np.asarray(t[id_col]))
        out = np.zeros(len(ids), dtype=np.int64)
        has = np.zeros(len(ids), dtype=bool)
        if len(doc):
            order = np.argsort(doc, kind="stable")
            doc_s = doc[order]
            h = as_u64(tok[order])
            # int32 halves the transient (n_tokens, 64) matrix vs
            # int64; reduceat accumulates in the same dtype, safe to
            # 2^31 tokens per batch group
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32) * 2 - 1
            starts, _ = group_starts_sizes(doc_s)
            votes = np.add.reduceat(bits, starts, axis=0)
            sig = (votes > 0).astype(np.uint64)
            packed = np.zeros(sig.shape[0], dtype=np.uint64)
            for j in range(64):
                packed |= sig[:, j] << np.uint64(j)
            rows = np.searchsorted(ids, doc_s[starts])
            out[rows] = packed.view(np.int64)
            has[rows] = True
        # has_tokens marks empty/whitespace-only docs: they keep the
        # default signature 0, and without the flag every such doc
        # would pair at hamming 0 with every other one (and with any
        # real doc whose signature has <= max_hamming set bits) —
        # no tokens means no SimHash identity, the same rule as the
        # MinHash all-sentinel exclusion above
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "simhash": pa.array(out, type=pa.int64()),
                         "has_tokens": pa.array(has)})

    return docs.map_batches(fn, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1) \
        if len(x) else np.empty(0, np.int64)


def simhash_near_dup_pairs(docs, max_hamming: int = 3,
                           id_col: str = "doc_id", max_bucket: int = 2000):
    """(a, b, hamming) pairs with hamming distance <= max_hamming.

    Candidates blocked on ``max_hamming + 1`` disjoint signature bit
    chunks: by pigeonhole, two signatures within ``max_hamming`` bits
    of each other agree EXACTLY on at least one chunk, so the blocking
    has full recall for ANY radius (the previous fixed 4x16-bit split
    only guaranteed recall to hamming 3 — a pair differing 2-2-2-2
    across the four chunks was silently missed at max_hamming=8).
    Narrower chunks at larger radii mean more candidates per bucket —
    the standard recall/cost tradeoff (HmSearch)."""
    sigs = simhash_signatures(docs, id_col)
    n_chunks = int(max_hamming) + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63] (got {max_hamming})")
    widths = np.full(n_chunks, 64 // n_chunks, dtype=np.int64)
    widths[:64 % n_chunks] += 1
    offs = np.concatenate([[0], np.cumsum(widths)[:-1]])

    def to_chunks(t: pa.Table) -> pa.Table:
        if "has_tokens" in t.column_names:
            # token-less docs have no SimHash identity — emit no
            # chunk rows for them (see simhash_signatures)
            t = t.filter(pc.equal(t["has_tokens"], True))
        ids = np.asarray(t[id_col])
        h = as_u64(np.asarray(t["simhash"]))
        rows = []
        chunk_ids = []
        for c in range(n_chunks):
            mask = np.uint64((1 << int(widths[c])) - 1)
            rows.append(((h >> np.uint64(int(offs[c]))) & mask).view(np.int64))
            chunk_ids.append(np.full(len(ids), c, dtype=np.int64))
        return pa.table({
            id_col: pa.array(np.tile(ids, n_chunks), type=pa.int64()),
            "sig": pa.array(np.tile(np.asarray(t["simhash"]), n_chunks),
                            type=pa.int64()),
            "chunk": pa.array(np.concatenate(chunk_ids)),
            "chash": pa.array(np.concatenate(rows)),
        })

    chunk_rows = sigs.map_batches(to_chunks, batch_format="pyarrow")

    def add_g(t: pa.Table) -> pa.Table:
        g = _shuffle_group(t["chash"], t["chunk"])
        return t.append_column("_g", pa.array(g))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ch = col_np(t, "chunk")
        bh = col_np(t, "chash")
        ids = col_np(t, id_col)
        sig = as_u64(col_np(t, "sig"))
        order = np.lexsort((ids, bh, ch))
        ch, bh, ids, sig = ch[order], bh[order], ids[order], sig[order]
        # distinct (chunk, chash, id): sorted, so runs collapse to
        # their first row (replaces pandas drop_duplicates)
        rstarts, _ = composite_group_starts(ch, bh, ids)
        ch, bh, ids, sig = ch[rstarts], bh[rstarts], ids[rstarts], \
            sig[rstarts]
        starts, sizes = composite_group_starts(ch, bh)
        ords = np.arange(len(ids)) - np.repeat(starts, sizes)
        keep = ords < max_bucket
        ch, bh, ids, sig = ch[keep], bh[keep], ids[keep], sig[keep]
        starts, sizes = composite_group_starts(ch, bh)
        first, second = pairs_within_groups(starts, sizes)
        ham = _popcount64(sig[first] ^ sig[second]).astype(np.int64)
        ok = ham <= max_hamming
        return pa.table({
            "a": pa.array(ids[first][ok], type=pa.int64()),
            "b": pa.array(ids[second][ok], type=pa.int64()),
            "hamming": pa.array(ham[ok], type=pa.int64())})

    pairs = chunk_rows.map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(bucket_pairs, batch_format="pyarrow")
    return _combine_pairs(pairs, "hamming", "min")


# ----------------------------------------------------------------------
# exact n-gram Jaccard
# ----------------------------------------------------------------------
def ngram_jaccard_pairs(docs, tau: float = 0.5, shingle_k: int = 3,
                        id_col: str = "doc_id", max_df: int = 1000):
    """(a, b, jaccard) EXACT word-k-gram Jaccard for pairs sharing at
    least one shingle. Shingles appearing in more than ``max_df`` docs
    are dropped (stop-shingle cut — the standard df guard; exact for
    corpora under the cap)."""
    rows = _distinct_shingle_rows(docs, shingle_k, id_col)
    # per-doc distinct shingle counts
    doc_counts = rows.groupby("doc").aggregate(Count(alias_name="nsh"))

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(_shuffle_group(t["sh"])))

    def group_pairs(t: pa.Table) -> pa.Table:
        # all shingle groups of one shuffle bucket, vectorized
        sh = col_np(t, "sh")
        ids = col_np(t, "doc")
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        starts, sizes = group_starts_sizes(sh)
        # df cut: drop stop-shingles (> max_df docs)
        ok_grp = sizes <= max_df
        keep = np.repeat(ok_grp, sizes)
        sh, ids = sh[keep], ids[keep]
        starts, sizes = group_starts_sizes(sh)
        first, second = pairs_within_groups(starts, sizes)
        return pa.table({
            "a": pa.array(ids[first], type=pa.int64()),
            "b": pa.array(ids[second], type=pa.int64()),
            "common": pa.array(np.ones(len(first), dtype=np.int64))})

    pair_partials = rows.map_batches(add_g, batch_format="pyarrow") \
        .groupby("_g").map_groups(group_pairs, batch_format="pyarrow")
    commons = _combine_pairs(pair_partials, "common", "sum")

    na = _count_renamed(doc_counts, "a", "na")
    nb = _count_renamed(doc_counts, "b", "nb")
    j1 = hash_join(commons, na, on="a",
                   left_cols=["a", "b", "common"], right_cols=["a", "na"])
    j2 = hash_join(j1, nb, on="b",
                   left_cols=["a", "b", "common", "na"], right_cols=["b", "nb"])

    def finish(t: pa.Table) -> pa.Table:
        c = np.asarray(t["common"], dtype=np.float64)
        na_ = np.asarray(t["na"], dtype=np.float64)
        nb_ = np.asarray(t["nb"], dtype=np.float64)
        j = c / (na_ + nb_ - c)
        keep = j >= tau
        return pa.table({
            "a": pa.array(np.asarray(t["a"])[keep].astype(np.int64)),
            "b": pa.array(np.asarray(t["b"])[keep].astype(np.int64)),
            "jaccard": pa.array(j[keep], type=pa.float64()),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def _distinct_shingle_rows(docs, shingle_k: int, id_col: str):
    """Dataset (doc, sh): one row per DISTINCT (doc, word-k-gram-hash)
    — the shared shingle front-end of ngram_jaccard_pairs /
    duplicate_shingle_fraction / contamination_fraction. Per-batch
    distinctness is global because each doc's text is one row (its
    shingles cannot span batches)."""
    def fn(t: pa.Table) -> pa.Table:
        doc, sh = _shingle_rows(t, shingle_k, id_col)
        if len(doc):
            u = np.unique(np.stack([doc, sh], axis=1), axis=0)
            doc, sh = u[:, 0], u[:, 1]
        return pa.table({"doc": pa.array(doc, type=pa.int64()),
                         "sh": pa.array(sh, type=pa.int64())})

    return docs.map_batches(fn, batch_format="pyarrow")


def _add_one(name: str = "one"):
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            name, pa.array(np.ones(t.num_rows, dtype=np.int64)))

    return fn


def _flag_shingle_membership(rows, flag_sh, flag_name: str,
                             broadcast_max: int, num_buckets: int):
    """Dataset (doc, one, <flag_name>): flag=1 iff the row's shingle
    is in ``flag_sh`` (a Dataset with a distinct ``sh`` column) — the
    dual-plan flag-back shared by duplicate_shingle_fraction and
    contamination_fraction. When the flag set fits ``broadcast_max``
    (8 B per shingle) it broadcasts once (ray.put) and flags with a
    sorted membership probe; past the gate a bucketed LEFT hash_join
    runs — scales to any flag-set size, just with a shuffle."""
    flag_ds = flag_sh.select_columns(["sh"]).materialize()
    if flag_ds.count() <= broadcast_max:
        parts = [np.asarray(b["sh"]) for b in
                 flag_ds.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        flag_sorted = np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)
        ref = ray.put(flag_sorted)

        class Flag:
            def __init__(self):
                self.sh = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                hit = in_sorted(self.sh, np.asarray(t["sh"]))
                return pa.table({
                    "doc": t["doc"].combine_chunks().cast(pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    flag_name: pa.array(hit.astype(np.int64)),
                })

        return rows.map_batches(Flag, batch_format="pyarrow",
                                concurrency=(1, 8))
    joined = hash_join(
        rows.select_columns(["doc", "sh"]),
        flag_ds.map_batches(_add_one("_m"), batch_format="pyarrow"),
        on="sh", how="left", left_cols=["doc", "sh"],
        right_cols=["sh", "_m"], num_buckets=num_buckets)

    def flag(t: pa.Table) -> pa.Table:
        m = t["_m"].combine_chunks()
        return pa.table({
            "doc": t["doc"].combine_chunks().cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            flag_name: pa.array(np.asarray(m.is_valid())
                                .astype(np.int64)),
        })

    return joined.map_batches(flag, batch_format="pyarrow")


def _per_doc_flag_fraction(flagged, id_col: str, flag_name: str,
                           count_name: str, frac_name: str,
                           num_buckets: int):
    """(doc, one, <flag>) rows -> Dataset (id_col, n_shingles,
    <count_name>, <frac_name>) via one grouped_reduce per doc."""
    from totem_ray.graph.joins import grouped_reduce

    per_doc = grouped_reduce(flagged, ["doc"], ["one", flag_name],
                             how="sum",
                             out_names=["n_shingles", count_name],
                             num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_shingles"], dtype=np.float64)
        d = np.asarray(t[count_name], dtype=np.float64)
        return pa.table({
            id_col: t["doc"].combine_chunks().cast(pa.int64()),
            "n_shingles": t["n_shingles"],
            count_name: t[count_name],
            frac_name: pa.array(d / n, type=pa.float64()),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow")



def duplicate_shingle_fraction(docs, shingle_k: int = 3,
                               id_col: str = "doc_id",
                               num_buckets: int = 64,
                               broadcast_max_shingles: int = 20_000_000):
    """Per-doc repetition / contamination score: the fraction of a
    document's DISTINCT word-k-gram shingles that also appear in at
    least one OTHER document — the standard boilerplate /
    cross-document-repetition signal web-corpus curation filters on
    (the C4 / RefinedWeb-family "duplicated n-gram fraction"). The
    reference has no text operators; this extends the training-data
    dedup family with the scoring (rather than pairing) view of the
    same shingle table.

    Dataset (doc_id, n_shingles, n_dup_shingles, dup_frac), one row
    per doc with >= shingle_k tokens (shorter docs have no k-gram
    identity — same exclusion as minhash). Scale shape: shuffles
    16 B (doc, shingle-hash) rows, never text; per-shingle doc counts
    come from one grouped_reduce; the flag-back is the shared
    dual-plan ``_flag_shingle_membership`` (broadcast probe when the
    duplicated-shingle set fits ``broadcast_max_shingles``, bucketed
    left hash_join past the gate). Shingle hashing is
    tabulation-based (hashing.tab_hash_strings), so the whole
    pipeline is SQL-transcribable for the value oracle."""
    from totem_ray.graph.joins import grouped_reduce

    rows = _distinct_shingle_rows(docs, shingle_k, id_col).materialize()
    # docs per shingle (rows are distinct per (doc, sh)), kept to the
    # duplicated ones only — the flag set
    dup_sh = grouped_reduce(
        rows.map_batches(_add_one(), batch_format="pyarrow"),
        ["sh"], ["one"], how="sum", out_names=["ndocs"],
        num_buckets=num_buckets).filter(expr="ndocs >= 2")
    flagged = _flag_shingle_membership(rows, dup_sh, "dup",
                                       broadcast_max_shingles,
                                       num_buckets)
    return _per_doc_flag_fraction(flagged, id_col, "dup",
                                  "n_dup_shingles", "dup_frac",
                                  num_buckets)


def contamination_fraction(docs, ref_docs, shingle_k: int = 3,
                           id_col: str = "doc_id",
                           num_buckets: int = 64,
                           broadcast_max_shingles: int = 20_000_000):
    """Test-set decontamination score: for each document, the fraction
    of its DISTINCT word-k-gram shingles that appear ANYWHERE in the
    ``ref_docs`` corpus (a benchmark / evaluation set) — the standard
    n-gram-overlap signal used to drop training documents that leak
    evaluation data. A document present in both sets overlaps itself
    (fraction 1.0) — filter the ref ids out of ``docs`` first if that
    is not wanted.

    Dataset (doc_id, n_shingles, n_contaminated, contamination_frac),
    one row per doc with >= shingle_k tokens. Same shared dual-plan
    flag-back as duplicate_shingle_fraction (benchmark sets are small
    — usually thousands of docs — so the reference shingle set
    usually broadcasts once) and the same tabulation shingle hashing,
    so the pipeline is SQL-transcribable."""
    from totem_ray.graph.joins import grouped_reduce

    rows = _distinct_shingle_rows(docs, shingle_k, id_col)
    # distinct reference shingles (dedup across ref docs)
    ref_sh = grouped_reduce(
        _distinct_shingle_rows(ref_docs, shingle_k, id_col)
        .map_batches(_add_one(), batch_format="pyarrow"),
        ["sh"], ["one"], how="min", out_names=["one"],
        num_buckets=num_buckets)
    flagged = _flag_shingle_membership(rows, ref_sh, "hit",
                                       broadcast_max_shingles,
                                       num_buckets)
    return _per_doc_flag_fraction(flagged, id_col, "hit",
                                  "n_contaminated",
                                  "contamination_frac", num_buckets)


def _count_renamed(doc_counts, new_id, new_n):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({new_id: t["doc"], new_n: t["nsh"]})

    return doc_counts.map_batches(fn, batch_format="pyarrow")


# ----------------------------------------------------------------------
# embedding cosine near-dup
# ----------------------------------------------------------------------
def embedding_near_dup_pairs(emb, tau: float = 0.9, block_col: str | None = None,
                             id_col: str = "vec_id", emb_col: str = "embedding",
                             lsh_planes: int = 0, seed: int = 42):
    """(a, b, cos_sim) pairs with cosine >= tau.

    Blocking: either an explicit ``block_col`` (exact within blocks),
    or random-hyperplane LSH buckets when ``lsh_planes`` > 0 (the
    scale path — approximate: only same-bucket pairs are compared).
    With neither, one global block (brute force; small inputs only).
    """
    from totem_ray.functions.similarity import _as_matrix, _normalize

    def add_block(t: pa.Table) -> pa.Table:
        if block_col:
            blk = np.asarray(t[block_col]).astype(np.int64)
        elif lsh_planes > 0:
            x = _as_matrix(t[emb_col])
            rng = np.random.default_rng(seed)
            planes = rng.standard_normal((x.shape[1], lsh_planes))
            bits = (x @ planes) > 0
            blk = np.zeros(len(x), dtype=np.int64)
            for j in range(lsh_planes):
                blk |= bits[:, j].astype(np.int64) << j
        else:
            blk = np.zeros(t.num_rows, dtype=np.int64)
        return pa.table({id_col: t[id_col], emb_col: t[emb_col],
                         "_blk": pa.array(blk)})

    blocked = emb.map_batches(add_block, batch_format="pyarrow")

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        ids = np.asarray(t[id_col]).astype(np.int64)
        xn = _normalize(_as_matrix(t[emb_col]))
        sims = xn @ xn.T
        iu = np.triu_indices(len(ids), k=1)
        s = sims[iu]
        keep = s >= tau
        a, b = ids[iu[0]][keep], ids[iu[1]][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": pa.array(lo, type=pa.int64()),
                         "b": pa.array(hi, type=pa.int64()),
                         "cos_sim": pa.array(s[keep], type=pa.float64())})

    return blocked.groupby("_blk").map_groups(pairs, batch_format="pyarrow")
