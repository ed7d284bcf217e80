"""Text analysis operators over the documents table
(doc_id, text, lang, source, n_chars).

All kernels are vectorized (pyarrow.compute RE2 / polars); stateful
pieces (compiled lexicon regexes) live in actor-pool classes with
setup in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from totem_ray.hashing import hash_strings_i64

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,!?;:]"

# tiny per-language function-word lexicons for the n-gram/stopword
# language-ID heuristic (public common-word lists)
_LEXICONS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "que", "une", "sur"],
}


def token_stats(docs):
    """(doc_id, n_tokens, n_chars_measured, punct_count) — exact
    whitespace tokenization (count of \\S+ runs) + unicode char count
    + punctuation count. SQL-oracle-checkable (RE2 semantics match
    DuckDB's regexp_extract_all)."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.count_substring_regex(txt, TOKEN_RE).combine_chunks().cast(pa.int64()),
            "n_chars_measured": pc.utf8_length(txt).combine_chunks().cast(pa.int64()),
            "punct_count": pc.count_substring_regex(txt, PUNCT_RE).combine_chunks().cast(pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


class QualityScorer:
    """Actor-pool stage: heuristic quality scoring
    (length / punctuation / stopword ratios). Regexes compiled once
    per actor."""

    def __init__(self, stop_lang: str = "en"):
        words = _LEXICONS[stop_lang]
        self.stop_re = r"(?i)\b(" + "|".join(words) + r")\b"

    def __call__(self, t: pa.Table) -> pa.Table:
        # null text counts as empty: a null propagates NaN through the
        # regex counts and casts to INT64_MIN downstream
        txt = pc.fill_null(t["text"].combine_chunks(), "")
        n_tok = pc.count_substring_regex(txt, TOKEN_RE).to_numpy().astype(np.float64)
        n_chr = pc.utf8_length(txt).to_numpy().astype(np.float64)
        n_pun = pc.count_substring_regex(txt, PUNCT_RE).to_numpy().astype(np.float64)
        n_stp = pc.count_substring_regex(txt, self.stop_re).to_numpy().astype(np.float64)
        tok_safe = np.maximum(n_tok, 1.0)
        mean_tok_len = (n_chr - (n_tok - 1).clip(0)) / tok_safe
        stop_ratio = n_stp / tok_safe
        punct_ratio = n_pun / tok_safe
        # length saturates at 50 tokens; penalize punctuation soup;
        # small stopword bonus (natural prose signal)
        quality = np.minimum(1.0, n_tok / 50.0) * \
            (1.0 - np.minimum(1.0, punct_ratio)) * \
            (0.5 + 0.5 * np.minimum(1.0, 4.0 * stop_ratio))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "mean_token_len": pa.array(mean_tok_len, type=pa.float64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "quality": pa.array(quality, type=pa.float64()),
        })


def quality_scores(docs, concurrency=(1, 8), batch_size: int = 4096):
    return docs.map_batches(QualityScorer, batch_format="pyarrow",
                            concurrency=concurrency, batch_size=batch_size)


class LangId:
    """Actor-pool stage: stopword-hit language ID. One RE2 alternation
    per language, compiled once; argmax hits, ties / no hits -> 'und'."""

    def __init__(self):
        self.patterns = {lang: r"(?i)\b(" + "|".join(ws) + r")\b"
                         for lang, ws in _LEXICONS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        # null text -> zero evidence -> 'und' (a null count becomes
        # NaN, argmax then picked the first language with garbage
        # evidence and both guards missed it)
        txt = pc.fill_null(t["text"].combine_chunks(), "")
        langs = list(self.patterns)
        hits = np.stack([pc.count_substring_regex(txt, p).to_numpy()
                         for p in self.patterns.values()])  # (L, n)
        best = np.argmax(hits, axis=0)
        best_hits = hits[best, np.arange(hits.shape[1])]
        # tie or zero evidence -> undetermined
        sorted_hits = np.sort(hits, axis=0)
        tie = (hits.shape[0] > 1) & (sorted_hits[-1] == sorted_hits[-2])
        pred = np.array(langs, dtype=object)[best]
        pred[(best_hits == 0) | tie] = "und"
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(pred.tolist(), type=pa.string()),
            "evidence": pa.array(best_hits.astype(np.int64)),
        })


def lang_id(docs, concurrency=(1, 8), batch_size: int = 4096):
    return docs.map_batches(LangId, batch_format="pyarrow",
                            concurrency=concurrency, batch_size=batch_size)


def doc_fingerprints(docs, normalize: bool = True,
                     id_col: str = "doc_id"):
    """(id_col, fingerprint) — stable 64-bit content fingerprint of
    the (optionally whitespace-normalized, lowercased) text. The
    exact-dedup key."""
    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"]
        if normalize:
            txt = pc.utf8_lower(txt)
            txt = pc.replace_substring_regex(txt, r"\s+", " ")
            txt = pc.utf8_trim_whitespace(txt)
        fp = hash_strings_i64(txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt)
        return pa.table({id_col: t[id_col],
                         "fingerprint": pa.array(fp, type=pa.int64())})

    return docs.map_batches(fn, batch_format="pyarrow")


def token_counts(docs):
    """(tok, cnt) — exact corpus-wide token frequencies (lower +
    whitespace split, the dedup tokenizer, so the oracle's
    string_split_regex matches byte-for-byte). Per-batch value counts
    bound the shuffle to (distinct-tokens-per-batch) rows before the
    global string-key sum."""
    from ray.data.aggregate import Sum

    from totem_ray._polars_compat import pl
    from totem_ray.functions.dedup import TOKEN_SPLIT_RE

    def partial(t: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "tok": pl.from_arrow(pc.utf8_lower(t["text"]).combine_chunks()),
        }).with_columns(
            pl.col("tok").str.replace_all(TOKEN_SPLIT_RE, " ")
              .str.split(" ")
        ).explode("tok") \
         .filter(pl.col("tok").str.len_chars() > 0) \
         .group_by("tok").len(name="cnt")
        out = df.to_arrow()
        return pa.table({"tok": out["tok"].cast(pa.string()),
                         "cnt": out["cnt"].cast(pa.int64())})

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt"))


def top_tokens(docs, k: int = 20):
    """(tok, cnt) — the k most frequent tokens, ties broken by token
    ascending (deterministic, matches an ORDER BY cnt DESC, tok
    LIMIT k oracle)."""
    return token_counts(docs).sort(
        ["cnt", "tok"], descending=[True, False]).limit(k)
