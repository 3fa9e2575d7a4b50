"""Text-analysis column expressions — pure Catalyst, no Python in the hot path.

Each builder mirrors the executable spec in kernels/textstats.py exactly and
has a line-for-line ANSI-SQL equivalent used by the DuckDB oracle (see
__spark_entry__.py). All of it codegens: regexp_count, array lambdas
(filter/transform/aggregate), md5 — no UDF round-trips for 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.kernels.textstats import (
    BPE_TOKEN_RE,
    FP_BASE,
    FP_HEX_CHARS,
    FP_MOD,
    PUNCT_RE,
    STOPWORDS_EN,
    STOPWORDS_ID,
)


def ws_tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (== str.split() semantics).
    (?U) makes Java's \\s match ALL Unicode whitespace like Python's —
    without it NBSP-joined words (ubiquitous in real web text) stay fused
    here while the kernel splits them. The DuckDB oracles keep RE2's
    ASCII-only \\s: the SQL contract is exact on ASCII fixtures; the
    kernel (Python) is the authority on full Unicode."""
    return F.filter(F.split(text, r"(?U)\s+"), lambda t: t != "")


def token_count_ws_col(text: Column) -> Column:
    return F.size(ws_tokens_col(text))


def token_count_bpe_col(text: Column) -> Column:
    # (?U): the kernel's Python \s inside the class is Unicode-aware
    return F.regexp_count(text, F.lit("(?U)" + BPE_TOKEN_RE))


def punct_ratio_col(text: Column) -> Column:
    # (?U): without it Java counts NBSP as punctuation ([^...\s] with an
    # ASCII-only \s), inflating the penalty on real web text
    return F.when(
        F.length(text) > 0,
        F.regexp_count(text, F.lit("(?U)" + PUNCT_RE)) / F.length(text),
    ).otherwise(0.0)


def stopword_hits_col(text: Column, stopwords: tuple[str, ...]) -> Column:
    stoplist = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(ws_tokens_col(text), lambda t: F.array_contains(stoplist, F.lower(t))))


def lang_id_col(text: Column) -> Column:
    id_hits = stopword_hits_col(text, STOPWORDS_ID)
    en_hits = stopword_hits_col(text, STOPWORDS_EN)
    return (
        F.when(id_hits > en_hits, "id").when(en_hits > id_hits, "en").otherwise("und")
    )


def quality_score_col(text: Column) -> Column:
    # coalesce: F.least SKIPS nulls, so length(NULL) would make len_score
    # 2000/2000 = 1.0 and score NULL text 0.6 — the kernel scores it 0.2
    n = F.coalesce(F.length(text), F.lit(0))
    ntok = token_count_ws_col(text)
    len_score = F.least(n, F.lit(2000)).cast("double") / 2000.0
    hits = (stopword_hits_col(text, STOPWORDS_ID) + stopword_hits_col(text, STOPWORDS_EN)).cast("double")
    stop_ratio = F.when(ntok > 0, F.least(hits / ntok, F.lit(0.4)) / 0.4).otherwise(0.0)
    punct_pen = F.lit(1.0) - F.least(punct_ratio_col(text) * 5.0, F.lit(1.0))
    return F.round(0.4 * len_score + 0.4 * stop_ratio + 0.2 * punct_pen, 4)


def token_hash60_col(token: Column) -> Column:
    """60-bit md5-substring hash (big-endian), kept < 2^63 so the rolling-hash
    products stay in int64."""
    return F.conv(F.substring(F.md5(token), 17, FP_HEX_CHARS), 16, 10).cast("long")


def doc_fingerprint_col(text: Column, max_tokens: int = 64) -> Column:
    """Order-sensitive polynomial rolling hash over the first `max_tokens`
    tokens (kernels.textstats.doc_fingerprint)."""
    hashed = F.transform(F.slice(ws_tokens_col(text), 1, max_tokens), token_hash60_col)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_BASE) + t) % F.lit(FP_MOD),
    )


def word_ngrams_col(text: Column, k: int) -> Column:
    """ALL k-word ngrams in order (NOT distinct — repetition statistics need
    the multiset)."""
    toks = ws_tokens_col(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    ngrams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    # guard: sequence(1, m) with m < 1 generates a DESCENDING sequence in Spark
    return F.when(n >= k, ngrams).otherwise(F.array().cast("array<string>"))


def word_shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined): the distinct form of
    word_ngrams_col — ONE construction for both so the tokenize/slice/guard
    logic the DuckDB oracles mirror lives in a single place. array_distinct
    preserves first-occurrence order, matching the kernel."""
    return F.array_distinct(word_ngrams_col(text, k))


def md5_60bit_col(col: Column) -> Column:
    """60-bit md5-PREFIX hash as a non-negative int64 (< 2^60): the shared
    join/bucket key for decontamination, stratified splits, and the curation
    bench. 15 hex chars exactly — 16 would overflow BIGINT — and the width
    is load-bearing for DuckDB oracle parity (the oracles compute the same
    prefix), so every consumer must use THIS helper. Distinct from
    token_hash60_col, which takes the md5 SUFFIX (fingerprint domain
    separation)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def mean_word_len_col(text: Column) -> Column:
    """Mean token length (0.0 for empty text) — a Gopher-rule signal."""
    toks = ws_tokens_col(text)
    total = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def alpha_word_ratio_col(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter (0.0 for
    empty text) — a Gopher-rule signal."""
    toks = ws_tokens_col(text)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(
        F.size(toks) > 0, n_alpha.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))
