"""Text-analysis kernels for the training-data pipeline operators.

These define the *spec* for language-ID, quality scoring, token counting and
document fingerprinting. Each formula is deliberately expressible both as
Spark built-in column expressions (see crawler_spark/functions/text.py) and as
ANSI SQL for the DuckDB oracle — the pure-Python forms here are the executable
spec used in unit tests.

All heuristics operate on whitespace/regex tokens; no model downloads.
"""

from __future__ import annotations

import hashlib
import re

# Small public stopword sets (top function words). Used for the language-ID
# heuristic and the stopword-ratio quality signal.
STOPWORDS_ID = (
    "yang", "dan", "di", "ke", "dari", "untuk", "pada", "dengan", "ini", "itu",
    "adalah", "dalam", "tidak", "akan", "atau", "juga", "sebagai", "oleh",
    "karena", "telah",
)
STOPWORDS_EN = (
    "the", "and", "of", "to", "in", "a", "is", "that", "for", "it",
    "on", "was", "with", "as", "at", "by", "be", "this", "have", "from",
)

# BPE-ish token regex: letter runs, digit runs, single non-alnum glyphs.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

FP_BASE = 1000003           # polynomial rolling-hash base
FP_MOD = 2147483647         # 2^31 - 1
FP_HEX_CHARS = 15           # 60-bit per-token hashes keep products in int64


def ws_tokens(text: str) -> list[str]:
    return text.split() if text else []


def token_count_ws(text: str) -> int:
    return len(ws_tokens(text))


def token_count_bpe(text: str) -> int:
    return len(re.findall(BPE_TOKEN_RE, text or ""))


def punct_ratio(text: str) -> float:
    if not text:
        return 0.0
    return len(re.findall(PUNCT_RE, text)) / len(text)


def stopword_hits(text: str, stopwords: tuple[str, ...]) -> int:
    toks = [t.lower() for t in ws_tokens(text)]
    sset = set(stopwords)
    return sum(1 for t in toks if t in sset)


def lang_id(text: str) -> str:
    """'id' / 'en' by stopword-hit majority; 'und' on a tie (incl. zero)."""
    id_hits = stopword_hits(text, STOPWORDS_ID)
    en_hits = stopword_hits(text, STOPWORDS_EN)
    if id_hits > en_hits:
        return "id"
    if en_hits > id_hits:
        return "en"
    return "und"


def quality_score(text: str) -> float:
    """Composite [0,1] quality: length saturation (40%), stopword density
    (40%, saturating at 0.4 ratio), punctuation penalty (20%). Rounded to 4dp
    so float addition order can never flip the oracle comparison."""
    n = len(text) if text else 0
    ntok = token_count_ws(text)
    len_score = min(n, 2000) / 2000.0
    stop_ratio = (
        min((stopword_hits(text, STOPWORDS_ID) + stopword_hits(text, STOPWORDS_EN)) / ntok, 0.4) / 0.4
        if ntok
        else 0.0
    )
    punct_pen = 1.0 - min(punct_ratio(text) * 5.0, 1.0)
    return round(0.4 * len_score + 0.4 * stop_ratio + 0.2 * punct_pen, 4)


def token_hash60(token: str) -> int:
    """60-bit hash: md5 hex chars [16:16+15] (big-endian), mod FP_MOD applied
    by the fingerprint fold, not here."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[16 : 16 + FP_HEX_CHARS], 16)


def doc_fingerprint(text: str, max_tokens: int = 64) -> int:
    """Order-sensitive polynomial rolling hash over the first `max_tokens`
    whitespace tokens: h <- (h * FP_BASE + hash60(tok)) % FP_MOD."""
    h = 0
    for tok in ws_tokens(text)[:max_tokens]:
        h = (h * FP_BASE + token_hash60(tok)) % FP_MOD
    return h


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Distinct k-word shingles (space-joined), in first-occurrence order."""
    toks = ws_tokens(text)
    seen: dict[str, None] = {}
    for i in range(max(0, len(toks) - k + 1)):
        seen.setdefault(" ".join(toks[i : i + k]), None)
    return list(seen)
