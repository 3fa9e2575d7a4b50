"""Content-side query surface: dedup family (C1-C9 + MinHash/Jaccard), span
extraction (the input_hint invariant), similarity search, text analysis,
multimodal plumbing — each with a DuckDB oracle that re-derives the result.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.parse_udfs import parse_page_udf
from crawler_spark.functions.simhash_udfs import simhash64_udf
from crawler_spark.functions.text import (
    alpha_word_ratio_col,
    doc_fingerprint_col,
    lang_id_col,
    md5_60bit_col,
    mean_word_len_col,
    punct_ratio_col,
    quality_score_col,
    token_count_bpe_col,
    token_count_ws_col,
    word_ngrams_col,
    word_shingles_col,
    ws_tokens_col,
)
from crawler_spark.operators.dedup import (
    MINHASH_M31,
    content_hash_stats,
    jaccard_pairs,
    mark_exact_duplicates,
    minhash_coeffs,
    minhash_incremental_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    simhash_incremental_near_dup,
    simhash_near_dup_join,
)

# the oracle's minhash aggregate arms, generated from the SAME coefficients
# the Spark operator uses (one source of truth — see minhash_coeffs)
_MINHASH_MINS_SQL = ",\n         ".join(
    f"min(((h60 % {MINHASH_M31}) * {a} + {b}) % {MINHASH_M31}) AS mh_{i}"
    for i, (a, b) in enumerate(minhash_coeffs(16))
)
from crawler_spark.operators.similarity import brute_force_topk


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file table -> single scan partition; spread so parse/shingle
    # stages parallelize (at real scale the multi-file scan does this itself)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embeddings stay un-repartitioned: the table is small and every consumer
    # immediately joins/broadcasts it — an extra shuffle only adds latency
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- exact dedup

def q_exact_dup_marking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8/Q2: canonical-page election per content hash + duplicate marking.
    Content key = sha256 of the first 40 chars (prefix collisions give real
    duplicate groups in the synthetic corpus)."""
    pages = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("page_id"),
        F.sha2(F.substring("text", 1, 40), 256).alias("content_sha256"),
        F.col("doc_id").alias("crawled_at"),  # deterministic crawl order proxy
    )
    out = mark_exact_duplicates(pages)
    return out.select(
        "page_id", "content_sha256", "is_duplicate", "duplicate_of", "similarity_score"
    )


O_EXACT_DUP_MARKING = """
WITH p AS (
  SELECT doc_id AS page_id, sha256(substr(text,1,40)) AS content_sha256
  FROM documents
),
w AS (
  SELECT *,
    row_number() OVER (PARTITION BY content_sha256 ORDER BY page_id) AS rn,
    min(page_id) OVER (PARTITION BY content_sha256) AS canon
  FROM p
)
SELECT page_id, content_sha256,
       rn > 1 AS is_duplicate,
       CASE WHEN rn > 1 THEN canon END AS duplicate_of,
       CAST(CASE WHEN rn > 1 THEN 100 END AS INT) AS similarity_score
FROM w
"""


def q_content_hash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7/Q5: per-content-hash occurrence counts (the MERGE INTO source)."""
    pages = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("page_id"),
        F.sha2(F.substring("text", 1, 40), 256).alias("content_sha256"),
        F.lit(None).cast("long").alias("simhash"),
    )
    return content_hash_stats(pages).select(
        "content_sha256", "occurrence_count", "first_seen_page_id"
    )


O_CONTENT_HASH_STATS = """
SELECT sha256(substr(text,1,40)) AS content_sha256,
       count(*) AS occurrence_count,
       min(doc_id) AS first_seen_page_id
FROM documents GROUP BY 1
"""


def q_page_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: unique/duplicate counts + conditional average similarity."""
    marked = q_exact_dup_marking(spark, sf_dir)
    return marked.agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("is_duplicate"), 1).otherwise(0)).alias("n_duplicates"),
        F.sum(F.when(~F.col("is_duplicate"), 1).otherwise(0)).alias("n_unique"),
        F.avg(F.when(F.col("is_duplicate"), F.col("similarity_score"))).alias("avg_similarity"),
    )


O_PAGE_STATS = """
WITH w AS (
  SELECT row_number() OVER (PARTITION BY sha256(substr(text,1,40)) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT count(*) AS n_pages,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicates,
       CAST(sum(CASE WHEN rn > 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_unique,
       avg(CASE WHEN rn > 1 THEN 100 END) AS avg_similarity
FROM w
"""


# ------------------------------------------------------------------- simhash

def q_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: vectorized simhash (md5 token votes), stored signed-int64. The
    oracle replays the full algorithm in SQL (unnest -> md5 -> bit votes)."""
    return _docs(spark, sf_dir).select(
        "doc_id", simhash64_udf(F.col("text")).alias("simhash")
    )


O_SIMHASH_FINGERPRINT = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(regexp_replace(text,'[^\w\s]',' ','g')),'\s+'),
                x -> x <> '')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok),17,16))::UBIGINT AS th FROM toks
), votes AS (
  SELECT doc_id, b, sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, LATERAL unnest(generate_series(0,63)) AS g(b)
  GROUP BY doc_id, b
), fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (CAST(1 AS UBIGINT) << b)::HUGEINT ELSE 0::HUGEINT END) AS ufp
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN ufp >= 9223372036854775808::HUGEINT
                 THEN ufp - 18446744073709551616::HUGEINT ELSE ufp END AS BIGINT) AS simhash
FROM documents d LEFT JOIN fp USING (doc_id)
"""


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C6 banded near-dup join. Fingerprints: portable 60-bit sha-derived
    hash per doc plus a planted copy at Hamming distance (doc_id%4)+1 — so
    distances 1-3 pass the threshold and distance 4 is correctly dropped."""
    base = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("fp"),
    )
    flips = (F.col("doc_id") % 4 + 1).cast("int")
    # perturb `flips` low bits: fp XOR (2^flips - 1)
    copies = _docs(spark, sf_dir).select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        (
            F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10).cast("long")
            .bitwiseXOR(F.pow(F.lit(2.0), flips).cast("long") - 1)
        ).alias("fp"),
    )
    both = base.unionByName(copies)
    return simhash_near_dup_join(both, id_col="id", fp_col="fp", threshold=3)


O_SIMHASH_NEAR_DUP = """
WITH base AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT) AS fp
  FROM documents
),
copies AS (
  SELECT doc_id + 1000000 AS id,
         xor(CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT),
             CAST(power(2, CAST(doc_id % 4 AS INT) + 1) AS BIGINT) - 1) AS fp
  FROM documents
),
all_fp AS (SELECT * FROM base UNION ALL SELECT * FROM copies),
banded AS (
  SELECT id, fp, b AS band_idx,
         (fp >> (b * 16)) & 65535 AS band
  FROM all_fp, LATERAL unnest(generate_series(0,3)) AS g(b)
),
pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.fp AS fp_a, r.fp AS fp_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band = r.band AND l.id < r.id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS distance,
       (1 - bit_count(xor(fp_a, fp_b)) / 64.0) * 100.0 AS similarity_pct
FROM pairs WHERE bit_count(xor(fp_a, fp_b)) <= 3
"""


def q_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 incremental (the reference's production shape: each new page's
    fingerprint is probed against the STORED corpus at persist time,
    content_hash.sql:67-78 / result_persistence.py:231-264). Corpus = the
    documents table; delta = two planted batches (doc_id%3 copies at Hamming
    distance doc_id%5, doc_id%6 copies at distance 1) so the result covers
    corpus-delta probes AND within-delta pairs. The oracle independently
    states the contract as full-join(corpus+delta) restricted to pairs with
    a delta member; Spark computes it without ever self-joining the corpus."""
    fp = (
        F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10)
        .cast("long")
    )
    docs = _docs(spark, sf_dir)
    corpus = docs.select(F.col("doc_id").alias("id"), fp.alias("fp"))
    mask_a = F.pow(F.lit(2.0), (F.col("doc_id") % 5).cast("int")).cast("long") - 1
    delta_a = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"), fp.bitwiseXOR(mask_a).alias("fp")
    )
    delta_b = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("id"), fp.bitwiseXOR(F.lit(1)).alias("fp")
    )
    return simhash_incremental_near_dup(
        corpus, delta_a.unionByName(delta_b), id_col="id", fp_col="fp", threshold=3
    )


O_SIMHASH_INCREMENTAL = """
WITH base AS (
  SELECT doc_id AS id,
         CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT) AS fp
  FROM documents
),
delta_a AS (
  SELECT doc_id + 1000000 AS id,
         xor(CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT),
             CAST(power(2, CAST(doc_id % 5 AS INT)) AS BIGINT) - 1) AS fp
  FROM documents WHERE doc_id % 3 = 0
),
delta_b AS (
  SELECT doc_id + 2000000 AS id,
         xor(CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT), 1) AS fp
  FROM documents WHERE doc_id % 6 = 0
),
all_fp AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta_a UNION ALL SELECT * FROM delta_b
),
banded AS (
  SELECT id, fp, b AS band_idx,
         (fp >> (b * 16)) & 65535 AS band
  FROM all_fp, LATERAL unnest(generate_series(0,3)) AS g(b)
),
pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.fp AS fp_a, r.fp AS fp_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band = r.band AND l.id < r.id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(fp_a, fp_b)) AS INT) AS distance,
       (1 - bit_count(xor(fp_a, fp_b)) / 64.0) * 100.0 AS similarity_pct
FROM pairs
WHERE bit_count(xor(fp_a, fp_b)) <= 3 AND id_b >= 1000000
"""


# ------------------------------------------------------------------- minhash

def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: 16 permutations over 3-word shingles, 4 bands x 4
    rows; corpus = docs + planted variants (same text + 3 extra tokens).
    Candidate pairs verified with exact token-set Jaccard."""
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("id"), F.col("text"))
    b = docs.select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        F.concat(F.col("text"), F.lit(" tambahan akhir dokumen")).alias("text"),
    )
    corpus = a.unionByName(b)
    sigs = minhash_signature(corpus, "id", "text", k=16, shingle_words=3)
    pairs = minhash_lsh_pairs(sigs, bands=4, rows_per_band=4)
    return jaccard_pairs(corpus, pairs, "id", "text").select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


O_MINHASH_LSH = r"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, text || ' tambahan akhir dokumen' AS text FROM documents
),
toks AS (
  SELECT id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS t FROM corpus
),
sh AS (
  SELECT id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in generate_series(1, len(t) - 2)])) AS shingle
  FROM toks WHERE len(t) >= 3
),
h AS (
  SELECT id, CAST(('0x' || substr(md5(shingle),17,10)) AS BIGINT) AS h60 FROM sh
),
sig AS (
  SELECT id,
         {mins}
  FROM h GROUP BY id
),
banded AS (
  SELECT id, b AS band_idx,
         CASE b
           WHEN 0 THEN mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3
           WHEN 1 THEN mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7
           WHEN 2 THEN mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11
           ELSE mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15
         END AS band_key
  FROM sig, LATERAL unnest(generate_series(0,3)) AS g(b)
),
pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.id < r.id
),
tsets AS (
  SELECT id, list_distinct(list_filter(string_split_regex(text,'\s+'), x -> x <> '')) AS ts
  FROM corpus
)
SELECT p.id_a, p.id_b,
       round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ts, b.ts))), 4) AS jaccard
FROM pairs p JOIN tsets a ON p.id_a = a.id JOIN tsets b ON p.id_b = b.id
""".replace("{mins}", _MINHASH_MINS_SQL)


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH incremental maintenance (the persist-time duplicate lookup
    of result_persistence.py:231-264, set-at-a-time, MinHash family): corpus
    = documents; delta = two planted batches (doc_id%4 + ' tambahan akhir
    dokumen' at +1M, doc_id%8 + ' salinan resmi berkas' at +2M) so the
    result covers corpus-delta probes AND within-delta pairs. Spark probes
    only the delta against the corpus band index; the oracle independently
    states the contract as the FULL banded join on corpus+delta restricted
    to pairs with a delta member. Candidates verified with exact Jaccard."""
    docs = _docs(spark, sf_dir)
    corpus = docs.select(F.col("doc_id").alias("id"), F.col("text"))
    delta = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        F.concat(F.col("text"), F.lit(" tambahan akhir dokumen")).alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 8 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("id"),
            F.concat(F.col("text"), F.lit(" salinan resmi berkas")).alias("text"),
        )
    )
    corpus_sigs = minhash_signature(corpus, "id", "text", k=16, shingle_words=3)
    delta_sigs = minhash_signature(delta, "id", "text", k=16, shingle_words=3)
    pairs = minhash_incremental_pairs(corpus_sigs, delta_sigs, bands=4, rows_per_band=4)
    return jaccard_pairs(corpus.unionByName(delta), pairs, "id", "text").select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


O_MINHASH_INCREMENTAL = r"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, text || ' tambahan akhir dokumen' AS text
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS id, text || ' salinan resmi berkas' AS text
  FROM documents WHERE doc_id % 8 = 0
),
toks AS (
  SELECT id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS t FROM corpus
),
sh AS (
  SELECT id,
         unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                               for i in generate_series(1, len(t) - 2)])) AS shingle
  FROM toks WHERE len(t) >= 3
),
h AS (
  SELECT id, CAST(('0x' || substr(md5(shingle),17,10)) AS BIGINT) AS h60 FROM sh
),
sig AS (
  SELECT id,
         {mins}
  FROM h GROUP BY id
),
banded AS (
  SELECT id, b AS band_idx,
         CASE b
           WHEN 0 THEN mh_0 || '|' || mh_1 || '|' || mh_2 || '|' || mh_3
           WHEN 1 THEN mh_4 || '|' || mh_5 || '|' || mh_6 || '|' || mh_7
           WHEN 2 THEN mh_8 || '|' || mh_9 || '|' || mh_10 || '|' || mh_11
           ELSE mh_12 || '|' || mh_13 || '|' || mh_14 || '|' || mh_15
         END AS band_key
  FROM sig, LATERAL unnest(generate_series(0,3)) AS g(b)
),
pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key AND l.id < r.id
),
tsets AS (
  SELECT id, list_distinct(list_filter(string_split_regex(text,'\s+'), x -> x <> '')) AS ts
  FROM corpus
)
SELECT p.id_a, p.id_b,
       round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ts, b.ts))), 4) AS jaccard
FROM pairs p JOIN tsets a ON p.id_a = a.id JOIN tsets b ON p.id_b = b.id
WHERE p.id_b >= 1000000
""".replace("{mins}", _MINHASH_MINS_SQL)


# ---------------------------------------------------------------- similarity

def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for 5 query vectors (the ANN baseline);
    scores rounded to 4dp so the fold order can never flip the comparison."""
    corpus = _embs(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(corpus, queries, k=5)


O_ANN_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 4) AS cosine
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM s)
WHERE rn <= 5
"""


# -------------------------------------------------------------- text analysis

def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID, quality score, token counts, punctuation ratio — all
    JVM-side column expressions (every third doc gets '!!!' appended so the
    punctuation path is exercised)."""
    docs = _docs(spark, sf_dir).withColumn(
        "t",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" !!!"))).otherwise(
            F.col("text")
        ),
    )
    return docs.select(
        "doc_id",
        token_count_ws_col(F.col("t")).alias("n_tokens_ws"),
        token_count_bpe_col(F.col("t")).alias("n_tokens_bpe"),
        F.round(punct_ratio_col(F.col("t")), 4).alias("punct_ratio"),
        lang_id_col(F.col("t")).alias("lang_pred"),
        quality_score_col(F.col("t")).alias("quality"),
    )


def _sql_stopword_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _text_profile_oracle() -> str:
    from crawler_spark.kernels.textstats import STOPWORDS_EN, STOPWORDS_ID

    sid = _sql_stopword_list(STOPWORDS_ID)
    sen = _sql_stopword_list(STOPWORDS_EN)
    return rf"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' !!!' ELSE text END AS t
  FROM documents
),
tok AS (
  SELECT doc_id, t, list_filter(string_split_regex(t,'\s+'), x -> x <> '') AS toks
  FROM d
),
m AS (
  SELECT doc_id, t, toks,
         len(toks) AS n_ws,
         len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
         CASE WHEN length(t) > 0
              THEN CAST(len(regexp_extract_all(t, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(t)
              ELSE 0.0 END AS pr,
         len(list_filter(toks, x -> list_contains({sid}, lower(x)))) AS id_hits,
         len(list_filter(toks, x -> list_contains({sen}, lower(x)))) AS en_hits
  FROM tok
)
SELECT doc_id,
       CAST(n_ws AS INT) AS n_tokens_ws,
       CAST(n_bpe AS INT) AS n_tokens_bpe,
       round(pr, 4) AS punct_ratio,
       CASE WHEN id_hits > en_hits THEN 'id'
            WHEN en_hits > id_hits THEN 'en' ELSE 'und' END AS lang_pred,
       round(0.4 * (least(length(t), 2000) / 2000.0)
           + 0.4 * (CASE WHEN n_ws > 0
                         THEN least(CAST(id_hits + en_hits AS DOUBLE) / n_ws, 0.4) / 0.4
                         ELSE 0.0 END)
           + 0.2 * (1.0 - least(pr * 5.0, 1.0)), 4) AS quality
FROM m
"""


O_TEXT_PROFILE = _text_profile_oracle()


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (first 64 tokens),
    fully JVM-side (md5 + aggregate fold)."""
    return _docs(spark, sf_dir).select(
        "doc_id", doc_fingerprint_col(F.col("text")).alias("fingerprint")
    )


O_DOC_FINGERPRINT = r"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(toks[1:64],
             t -> CAST(('0x' || substr(md5(t),17,15)) AS BIGINT))),
         (acc, t) -> (acc * 1000003 + t) % 2147483647) AS fingerprint
FROM tok
"""


# ------------------------------------------------------------ spans (X1-X7)

def q_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input_hint invariant: HTML built from each doc, parsed by the
    vectorized parse UDF into the interleaved text+media span sequence; the
    oracle constructs the expected spans directly. Checks (kind, text,
    media_ref, order) per row."""
    docs = _docs(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), ids, F.lit("</title></head><body><h1>Doc "),
        ids, F.lit("</h1><p>"), F.substring("text", 1, 80),
        F.lit('</p><a class="download-pdf" href="/files/'), ids,
        F.lit('.pdf">Unduh</a><p>'), F.substring("text", 81, 80),
        F.lit('</p><img src="/img/'), ids, F.lit('.png"></body></html>'),
    )
    parsed = docs.select("doc_id", parse_page_udf(html).alias("p"))
    return parsed.select("doc_id", F.explode("p.spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("span_text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("span_offset"),
    )


O_SPAN_EXTRACT = r"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(substr(text, 1, 80), '\s+', ' ', 'g')) AS p1,
         trim(regexp_replace(substr(text, 81, 80), '\s+', ' ', 'g')) AS p2
  FROM documents
)
SELECT doc_id, 'text' AS kind, 'Doc ' || doc_id AS span_text,
       CAST(NULL AS VARCHAR) AS media_ref, 0 AS span_offset FROM d
UNION ALL
SELECT doc_id, 'text', 'Doc ' || doc_id, NULL, 1 FROM d
UNION ALL
SELECT doc_id, 'text', p1, NULL, 2 FROM d WHERE p1 <> ''
UNION ALL
SELECT doc_id, 'media', NULL, '/files/' || doc_id || '.pdf',
       CASE WHEN p1 <> '' THEN 3 ELSE 2 END FROM d
UNION ALL
SELECT doc_id, 'text', p2, NULL,
       CASE WHEN p1 <> '' THEN 4 ELSE 3 END FROM d WHERE p2 <> ''
UNION ALL
SELECT doc_id, 'media', NULL, '/img/' || doc_id || '.png',
       (CASE WHEN p1 <> '' THEN 4 ELSE 3 END) + (CASE WHEN p2 <> '' THEN 1 ELSE 0 END)
FROM d
"""


# ------------------------------------------------- config-driven selectors

def _selector_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page per document for the selector-extraction oracles:
    the shape mirrors the reference's BPK regulation config
    (`/root/reference/PRD.md:2699-2713` — title/nomor/content selectors plus
    a download-pdf documents array)."""
    docs = _docs(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    t1 = F.trim(F.regexp_replace(F.substring("text", 1, 60), r"\s+", " "))
    html = F.concat(
        F.lit('<html><head><meta property="og:lang" content="id-'), F.col("lang"),
        F.lit('"></head><body><div id="main" class="regulation detail">'),
        F.lit('<h1 class="regulation-title">Peraturan '), ids, F.lit("</h1>"),
        F.lit('<span class="nomor">NO-'), ids, F.lit("/2024</span>"),
        F.lit('<div class="regulation-content"><p>'), t1,
        F.lit("</p><p>Pasal "), ids, F.lit("</p></div>"),
        F.lit('<a class="download-pdf" href="/files/'), ids, F.lit('_1.pdf">L1</a>'),
        F.lit('<a class="download-pdf" href="/files/'), ids, F.lit('_2.pdf">L2</a>'),
        F.lit("</div></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def _selector_long(e: DataFrame, singles: list[str], arrays: list[str]) -> DataFrame:
    """Struct-of-fields -> long (doc_id, field, idx, value) rows so the
    driver's sort-based canonicalizer never sees an array cell. Missing
    single fields keep an explicit NULL row (the reference's error->None
    contract is part of the checked surface); NULL arrays (config errors)
    produce one (NULL, NULL) row via posexplode_outer; empty arrays produce
    no rows (reference returns [])."""
    parts = [
        e.select(
            "doc_id",
            F.lit(name).alias("field"),
            F.lit(0).alias("idx"),
            F.col(name).alias("value"),
        )
        for name in singles
    ]
    for name in arrays:
        parts.append(
            e.select("doc_id", F.lit(name).alias("field"), F.posexplode_outer(name))
            .select("doc_id", "field", F.col("pos").alias("idx"), F.col("col").alias("value"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_selector_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+X5: config-driven {field: selector} CSS extraction — text fields,
    an attribute field, an array field, a no-match field, and an invalid
    config (error->None), all through ONE pandas UDF with one DOM build per
    page (selector_processor.py:34-91 semantics)."""
    from crawler_spark.functions.selector_udfs import extract_with_selectors

    selectors = {
        "title": "h1.regulation-title",
        "nomor": {"selector": "#main span.nomor"},
        "first_par": {"selector": "div.regulation-content > p"},
        "lang": {"selector": "meta[property='og:lang']", "attribute": "content"},
        "missing": "div.nonexistent",
        "documents": {"selector": "a.download-pdf", "attribute": "href", "type": "array"},
        "invalid": {"type": "array"},  # no 'selector' key -> error -> None
    }
    e = extract_with_selectors(
        _selector_corpus(spark, sf_dir), "html", selectors
    ).select("doc_id", "extracted.*")
    return _selector_long(
        e, ["title", "nomor", "first_par", "lang", "missing"], ["documents", "invalid"]
    )


O_SELECTOR_EXTRACT = r"""
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids, lang,
         trim(regexp_replace(substr(text, 1, 60), '\s+', ' ', 'g')) AS t1
  FROM documents
)
SELECT doc_id, 'title' AS field, CAST(0 AS INT) AS idx,
       'Peraturan ' || ids AS value FROM d
UNION ALL SELECT doc_id, 'nomor', 0, 'NO-' || ids || '/2024' FROM d
UNION ALL SELECT doc_id, 'first_par', 0,
       CASE WHEN t1 = '' THEN NULL ELSE t1 END FROM d
UNION ALL SELECT doc_id, 'lang', 0, 'id-' || lang FROM d
UNION ALL SELECT doc_id, 'missing', 0, NULL FROM d
UNION ALL SELECT doc_id, 'documents', 0, '/files/' || ids || '_1.pdf' FROM d
UNION ALL SELECT doc_id, 'documents', 1, '/files/' || ids || '_2.pdf' FROM d
UNION ALL SELECT doc_id, 'invalid', NULL, NULL FROM d
"""


def q_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+X3: XPath subset (//tag[@attr='v'], /text(), /@attr, child steps)
    plus the //-prefix auto-detect dispatch mixing CSS and XPath fields in
    one config (html_parser.py:191-303, selector_processor.py:228-243)."""
    from crawler_spark.functions.selector_udfs import extract_with_selectors

    selectors = {
        "title_x": "//h1[@class='regulation-title']/text()",
        "nomor_x": "//span[@class='nomor']",
        "first_p": {"selector": "//div[@class='regulation-content']/p"},
        "css_title": "h1.regulation-title",  # same config, CSS dispatch
        "hrefs": {"selector": "//a[@class='download-pdf']/@href", "type": "array"},
    }
    e = extract_with_selectors(
        _selector_corpus(spark, sf_dir), "html", selectors
    ).select("doc_id", "extracted.*")
    return _selector_long(
        e, ["title_x", "nomor_x", "first_p", "css_title"], ["hrefs"]
    )


O_XPATH_EXTRACT = r"""
WITH d AS (
  SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids,
         trim(regexp_replace(substr(text, 1, 60), '\s+', ' ', 'g')) AS t1
  FROM documents
)
SELECT doc_id, 'title_x' AS field, CAST(0 AS INT) AS idx,
       'Peraturan ' || ids AS value FROM d
UNION ALL SELECT doc_id, 'nomor_x', 0, 'NO-' || ids || '/2024' FROM d
-- xpath element results skip empty-text elements BEFORE taking the first,
-- so an empty first <p> falls through to the second (html_parser.py:246-250)
UNION ALL SELECT doc_id, 'first_p', 0,
       CASE WHEN t1 = '' THEN 'Pasal ' || ids ELSE t1 END FROM d
UNION ALL SELECT doc_id, 'css_title', 0, 'Peraturan ' || ids FROM d
UNION ALL SELECT doc_id, 'hrefs', 0, '/files/' || ids || '_1.pdf' FROM d
UNION ALL SELECT doc_id, 'hrefs', 1, '/files/' || ids || '_2.pdf' FROM d
"""


def q_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-LD structured-data extraction (kernels/jsonld.py): every page
    carries a schema.org node (LegalDocument/Article alternating) with a
    nested author object, an int identifier, and a keyword array; every 3rd
    page adds an @graph block with two items; every 4th page adds a BROKEN
    block (`{broken`) that must be skipped without shifting extraction. The
    real parser (tolerant DOM -> stdlib json -> deterministic flatten) runs
    through the vectorized pandas UDF; the oracle reconstructs the expected
    (block_idx, item_idx, item_type, field, idx, value) rows in SQL, so a
    parser that drops nested paths, misorders list idx, mishandles non-string
    scalars, or dies on the broken block fails the hash."""
    from crawler_spark.functions.selector_udfs import extract_jsonld

    docs = _docs(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    typ = F.when(F.col("doc_id") % 2 == 0, "LegalDocument").otherwise("Article")
    block0 = F.concat(
        F.lit('<script type="application/ld+json">{"@context":"https://schema.org",'
              '"@type":"'), typ,
        F.lit('","name":"Doc '), ids,
        F.lit('","identifier":'), ids,
        F.lit(',"datePublished":"2024-01-'), dd,
        F.lit('","author":{"@type":"Organization","name":"Portal '),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('"},"keywords":["k'), (F.col("doc_id") % 3).cast("string"),
        F.lit('","k'), (F.col("doc_id") % 4 + 1).cast("string"),
        F.lit('"]}</script>'),
    )
    block1 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit('<script type="application/ld+json">{"@graph":[{"@type":"WebPage",'
                  '"url":"https://portal'), (F.col("doc_id") % 5).cast("string"),
            F.lit(".go.id/p/"), ids,
            F.lit('"},{"@type":"BreadcrumbList","numberOfItems":'),
            (F.col("doc_id") % 4 + 1).cast("string"),
            F.lit("}]}</script>"),
        ),
    ).otherwise(F.lit(""))
    broken = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit('<script type="application/ld+json">{broken</script>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), block0, block1, broken,
        F.lit("</head><body><p>body</p></body></html>"),
    )
    out = extract_jsonld(docs.select("doc_id", html.alias("html")), "html")
    return out.select("doc_id", F.explode("jsonld").alias("r")).select(
        "doc_id", "r.block_idx", "r.item_idx", "r.item_type",
        "r.field", "r.idx", "r.value",
    )


O_JSONLD_EXTRACT = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'LegalDocument' ELSE 'Article' END AS typ,
         CAST(doc_id AS VARCHAR) AS ids,
         lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
  FROM documents
),
rows0 AS (
  SELECT doc_id, 0 AS block_idx, 0 AS item_idx, typ AS item_type,
         '@context' AS field, 0 AS idx, 'https://schema.org' AS value FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'name', 0, 'Doc ' || ids FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'identifier', 0, ids FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'datePublished', 0, '2024-01-' || dd FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'author.@type', 0, 'Organization' FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'author.name', 0,
         'Portal ' || CAST(doc_id % 7 AS VARCHAR) FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'keywords', 0,
         'k' || CAST(doc_id % 3 AS VARCHAR) FROM d
  UNION ALL SELECT doc_id, 0, 0, typ, 'keywords', 1,
         'k' || CAST(doc_id % 4 + 1 AS VARCHAR) FROM d
  UNION ALL SELECT doc_id, 1, 0, 'WebPage', 'url', 0,
         'https://portal' || CAST(doc_id % 5 AS VARCHAR) || '.go.id/p/' || ids
         FROM d WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, 1, 1, 'BreadcrumbList', 'numberOfItems', 0,
         CAST(doc_id % 4 + 1 AS VARCHAR) FROM d WHERE doc_id % 3 = 0
)
SELECT doc_id, CAST(block_idx AS INT) AS block_idx,
       CAST(item_idx AS INT) AS item_idx, item_type, field,
       CAST(idx AS INT) AS idx, value
FROM rows0
"""


def q_content_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: the full ContentNormalizer pipeline (content_normalizer.py:
    37-97,122-186,278-397) over synthetic pages exercising every stage —
    boilerplate tags (nav/footer), ad-pattern containers, HTML comments,
    <main> vs content-div extraction, timestamp + view-count stripping,
    whitespace collapse, lowercase — plus the resulting content hash (C1).
    Runs through the SAME parse UDF the engine uses."""
    docs = _docs(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    open_tag = F.when(F.col("doc_id") % 2 == 0, F.lit("<main>")).otherwise(
        F.lit('<div class="content">')
    )
    close_tag = F.when(F.col("doc_id") % 2 == 0, F.lit("</main>")).otherwise(
        F.lit("</div>")
    )
    html = F.concat(
        F.lit('<html><body><nav><a href="/home">Beranda</a></nav>'),
        F.lit('<div class="ad-banner">Iklan promo</div>'),
        F.lit("<!-- build 123 -->"),
        open_tag,
        F.lit("<p>Putusan Nomor "), ids, F.lit(" Tahun 2024</p>"),
        F.lit("<p>Sumber "), F.col("source"), F.lit(" bahasa "), F.col("lang"),
        F.lit("</p><span>Updated 2024-01-15 10:30</span><span>"),
        (F.col("doc_id") % 100).cast("string"), F.lit(" views</span>"),
        close_tag,
        F.lit("<footer>Hak cipta</footer></body></html>"),
    )
    parsed = docs.select("doc_id", parse_page_udf(html).alias("p"))
    return parsed.select(
        "doc_id",
        F.col("p.norm_text").alias("norm_text"),
        F.col("p.content_sha256").alias("content_sha256"),
    )


O_CONTENT_NORMALIZE = """
WITH d AS (
  SELECT doc_id,
         'putusan nomor ' || doc_id || ' tahun 2024 sumber ' || source
           || ' bahasa ' || lang || ' updated' AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, sha256(norm_text) AS content_sha256 FROM d
"""


# ---------------------------------------------------------------- multimodal

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: documents carry an opaque binary payload
    (encoded text prefix as the deterministic stand-in); typed metadata =
    byte length + content digest. Decode/feature-extraction stubs live in
    operators/multimodal.py."""
    docs = _docs(spark, sf_dir)
    payload = F.encode(F.substring("text", 1, 64), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(F.substring("text", 1, 64), 256).alias("payload_sha256"),
    )


O_MULTIMODAL_META = """
SELECT doc_id,
       CAST(octet_length(encode(substr(text,1,64))) AS INT) AS n_bytes,
       sha256(substr(text,1,64)) AS payload_sha256
FROM documents
"""


# ------------------------------------------------- embedding dedup + LSH ANN

def adaptive_n_bits(n_vectors: int, dim: int, target_bucket: int = 64) -> int:
    """Bucket width scaled to the corpus (VERDICT r01: a fixed 8-bit bucket
    leaves ~n/256 rows per bucket — quadratic again at 10^9 vectors). Picks
    the smallest width whose expected bucket occupancy is ~target_bucket,
    clamped to [8, min(24, dim)]: 10^3 vectors -> 8 bits (256 buckets),
    10^9 -> 24 bits (16.7M buckets, ~60 rows each)."""
    import math

    want = math.ceil(math.log2(max(n_vectors, 1) / target_bucket)) if n_vectors > target_bucket else 8
    return int(min(max(8, want), 24, dim))


def _sign_bucket_spark(vec, n_bits: int = 8):
    """Deterministic LSH bucket: sign bits of the first n dims — engine-
    portable (scaling-invariant, reproducible in ANSI SQL), the test stand-in
    for the hash-seeded random-hyperplane bucket in operators/similarity.py."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b.cast("int")


def _sign_bucket_sql_adaptive(col: str = "embedding", n_expr: str = "2 * count(*)") -> str:
    """DuckDB form of the adaptive sign bucket: width from the SAME
    corpus-size formula as adaptive_n_bits, bits via list_transform."""
    return (
        f"CAST(list_sum(list_transform(range(1, (SELECT n_bits FROM nb) + 1), "
        f"i -> CASE WHEN {col}[i] >= 0 THEN power(2, i - 1) ELSE 0 END)) AS INT)"
    )


_NB_CTE = """
nb AS (
  SELECT CAST(least(greatest(8, CASE WHEN {n_expr} > 64
                                 THEN ceil(log2(({n_expr}) / 64.0)) ELSE 8 END),
              24, (SELECT min(len(embedding)) FROM embeddings)) AS INT) AS n_bits
  FROM embeddings
)
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: corpus + scaled copies (2x => cosine 1.0);
    sign-LSH bucket join prunes candidates (scaling preserves signs), exact
    cosine >= 0.999 verifies. The 100 TB plan: bucket equality turns the
    O(n^2) scan into per-bucket joins, with the bucket WIDTH scaled to the
    corpus (adaptive_n_bits) so occupancy stays ~constant at any n."""
    base = _embs(spark, sf_dir).select("vec_id", "embedding")
    n = base.count() * 2  # tiny stats action; at scale: table metadata
    dim = base.select(F.size("embedding")).first()[0]
    n_bits = adaptive_n_bits(n, dim)
    copies = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2).alias("embedding"),
    )
    corpus = base.unionByName(copies).withColumn(
        "bucket", _sign_bucket_spark("embedding", n_bits)
    )
    l, r = corpus.alias("l"), corpus.alias("r")
    from crawler_spark.functions.vectors import cosine_col

    pairs = l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vec_id") < F.col("r.vec_id"))).select(
        F.col("l.vec_id").alias("id_a"),
        F.col("r.vec_id").alias("id_b"),
        F.round(cosine_col(F.col("l.embedding"), F.col("r.embedding")), 4).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= 0.999)


O_DEDUP_EMBEDDING_COSINE = f"""
WITH {_NB_CTE.format(n_expr="2 * count(*)")},
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) FROM embeddings
),
b AS (SELECT vec_id, embedding, {_sign_bucket_sql_adaptive()} AS bucket FROM corpus)
SELECT l.vec_id AS id_a, r.vec_id AS id_b,
       round(list_cosine_similarity(l.embedding, r.embedding), 4) AS cosine
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.embedding, r.embedding), 4) >= 0.999
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF/LSH-bucketed ANN (the scale path next to brute force): probe only
    the query's bucket, exact cosine + top-3 within it; bucket width scales
    with the corpus (adaptive_n_bits)."""
    base = _embs(spark, sf_dir)
    n = base.count()
    dim = base.select(F.size("embedding")).first()[0]
    corpus = base.withColumn(
        "bucket", _sign_bucket_spark("embedding", adaptive_n_bits(n, dim))
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"), "bucket"
    )
    from pyspark.sql import Window

    from crawler_spark.functions.vectors import cosine_col

    scored = corpus.join(F.broadcast(queries), "bucket").select(
        "query_id", "vec_id",
        F.round(cosine_col(F.col("embedding"), F.col("qvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


O_ANN_LSH_TOPK = f"""
WITH {_NB_CTE.format(n_expr="count(*)")},
b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding,
         {_sign_bucket_sql_adaptive()} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qvec, bucket FROM b WHERE vec_id < 5),
s AS (
  SELECT q.query_id, b.vec_id,
         round(list_cosine_similarity(b.embedding, q.qvec), 4) AS cosine
  FROM b JOIN q USING (bucket)
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM s)
WHERE rn <= 3
"""


def q_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 + duplicate_relationship tables: per content-hash duplicate group
    (canonical page, trigger-maintained size as a recomputed agg) and one
    relationship row per member with detection_method='exact_hash'
    (current_schema.sql:471-497,103-120 semantics)."""
    pages = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("page_id"),
        F.sha2(F.substring("text", 1, 40), 256).alias("content_sha256"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("content_sha256")
    grouped = (
        pages.withColumn("group_size", F.count("*").over(w))
        .withColumn("canonical_page_id", F.min("page_id").over(w))
        .filter(F.col("group_size") > 1)
    )
    return grouped.select(
        F.col("content_sha256").alias("group_key"),
        "canonical_page_id",
        F.col("group_size").cast("long").alias("group_size"),
        "page_id",
        F.lit("exact_hash").alias("detection_method"),
        (F.col("page_id") == F.col("canonical_page_id")).alias("is_canonical"),
    )


O_DUPLICATE_GROUPS = """
WITH p AS (
  SELECT doc_id AS page_id, sha256(substr(text,1,40)) AS content_sha256
  FROM documents
),
g AS (
  SELECT *, count(*) OVER (PARTITION BY content_sha256) AS group_size,
         min(page_id) OVER (PARTITION BY content_sha256) AS canonical_page_id
  FROM p
)
SELECT content_sha256 AS group_key, canonical_page_id,
       CAST(group_size AS BIGINT) AS group_size, page_id,
       'exact_hash' AS detection_method,
       page_id = canonical_page_id AS is_canonical
FROM g WHERE group_size > 1
"""


def q_duplicate_groups_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 provenance: duplicate_relationship rows with detection_method in
    {exact_hash, fuzzy_match, url_match} and reference precedence exact >
    fuzzy > url (current_schema.sql:485-497; the reference's dedup service
    checks the content hash first, then fuzzy similarity, then URL identity).
    Corpus = base pages + a re-crawled variant per page (same URL, perturbed
    fingerprint at Hamming distance doc_id%4+1, distinct content hash) — so
    all three methods fire deterministically: 40-char-prefix collisions give
    exact groups, planted distances 1-3 give fuzzy pairs (distance 4 falls
    through), and the shared URL gives url_match for the rest. One row per
    non-canonical page: (page_id, canonical_page_id, method, similarity)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    fp60 = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10).cast("long")
    url_key = (F.col("doc_id") - F.col("doc_id") % 2).alias("url_key")
    base = docs.select(
        F.col("doc_id").alias("page_id"),
        url_key,
        F.sha2(F.substring("text", 1, 40), 256).alias("content_key"),
        fp60.alias("fp"),
    )
    flips = (F.col("doc_id") % 4 + 1).cast("int")
    variants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("page_id"),
        url_key,
        F.sha2(F.concat(F.substring("text", 1, 40), F.lit("v")), 256).alias(
            "content_key"
        ),
        fp60.bitwiseXOR(F.pow(F.lit(2.0), flips).cast("long") - 1).alias("fp"),
    )
    corpus = base.unionByName(variants)
    with_canon = corpus.withColumn(
        "canon_exact", F.min("page_id").over(Window.partitionBy("content_key"))
    ).withColumn(
        "canon_url", F.min("page_id").over(Window.partitionBy("url_key"))
    )
    pairs = simhash_near_dup_join(
        corpus.select(F.col("page_id").alias("id"), "fp"),
        id_col="id", fp_col="fp", threshold=3,
    )
    # per page: smallest-id fuzzy partner (and that pair's distance)
    fuzzy = (
        pairs.groupBy(F.col("id_b").alias("page_id"))
        .agg(F.min(F.struct("id_a", "distance")).alias("m"))
        .select(
            "page_id",
            F.col("m.id_a").alias("canon_fuzzy"),
            F.col("m.distance").alias("fuzzy_distance"),
        )
    )
    joined = with_canon.join(fuzzy, "page_id", "left")
    is_exact = F.col("canon_exact") < F.col("page_id")
    is_fuzzy = F.col("canon_fuzzy").isNotNull()
    is_url = F.col("canon_url") < F.col("page_id")
    return joined.select(
        "page_id",
        F.when(is_exact, F.col("canon_exact"))
        .when(is_fuzzy, F.col("canon_fuzzy"))
        .otherwise(F.col("canon_url"))
        .alias("canonical_page_id"),
        F.when(is_exact, "exact_hash")
        .when(is_fuzzy, "fuzzy_match")
        .when(is_url, "url_match")
        .alias("detection_method"),
        F.when(is_exact, F.lit(100.0))
        .when(is_fuzzy, (1 - F.col("fuzzy_distance") / 64.0) * 100.0)
        .cast("double")
        .alias("similarity_pct"),
    ).filter(F.col("detection_method").isNotNull())


O_DUPLICATE_GROUPS_PROVENANCE = """
WITH corpus AS (
  SELECT doc_id AS page_id,
         doc_id - doc_id % 2 AS url_key,
         sha256(substr(text,1,40)) AS content_key,
         CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT) AS fp
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS page_id,
         doc_id - doc_id % 2 AS url_key,
         sha256(substr(text,1,40) || 'v') AS content_key,
         xor(CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT),
             CAST(power(2, CAST(doc_id % 4 AS INT) + 1) AS BIGINT) - 1) AS fp
  FROM documents
),
with_canon AS (
  SELECT *,
         min(page_id) OVER (PARTITION BY content_key) AS canon_exact,
         min(page_id) OVER (PARTITION BY url_key) AS canon_url
  FROM corpus
),
banded AS (
  SELECT page_id AS id, fp, b AS band_idx, (fp >> (b * 16)) & 65535 AS band
  FROM corpus, LATERAL unnest(generate_series(0,3)) AS g(b)
),
near_pairs AS (
  SELECT id_a, id_b, bit_count(xor(fp_a, fp_b)) AS distance
  FROM (
    SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.fp AS fp_a, r.fp AS fp_b
    FROM banded l JOIN banded r
      ON l.band_idx = r.band_idx AND l.band = r.band AND l.id < r.id
  ) WHERE bit_count(xor(fp_a, fp_b)) <= 3
),
fuzzy AS (
  SELECT id_b AS page_id, min(id_a) AS canon_fuzzy,
         arg_min(distance, id_a) AS fuzzy_distance
  FROM near_pairs GROUP BY id_b
)
SELECT page_id,
       CASE WHEN canon_exact < page_id THEN canon_exact
            WHEN canon_fuzzy IS NOT NULL THEN canon_fuzzy
            ELSE canon_url END AS canonical_page_id,
       CASE WHEN canon_exact < page_id THEN 'exact_hash'
            WHEN canon_fuzzy IS NOT NULL THEN 'fuzzy_match'
            WHEN canon_url < page_id THEN 'url_match' END AS detection_method,
       CAST(CASE WHEN canon_exact < page_id THEN 100.0
                 WHEN canon_fuzzy IS NOT NULL
                   THEN (1 - fuzzy_distance / 64.0) * 100.0 END
            AS DOUBLE) AS similarity_pct
FROM with_canon LEFT JOIN fuzzy USING (page_id)
WHERE (CASE WHEN canon_exact < page_id THEN 'exact_hash'
            WHEN canon_fuzzy IS NOT NULL THEN 'fuzzy_match'
            WHEN canon_url < page_id THEN 'url_match' END) IS NOT NULL
"""


def q_duplicate_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 transitive closure: pairwise duplicate evidence (exact-hash edges
    + banded-simhash fuzzy edges, the same corpus as
    duplicate_groups_provenance) folded into connected components via
    distributed min-label propagation (operators/dedup.connected_components;
    one shuffle per iteration, converges in diameter rounds). The oracle
    replays the closure with a recursive CTE — so a propagation that stops
    one hop short fails the hash. Output: every page with its canonical
    component id (min page_id reachable) and the component size."""
    from crawler_spark.operators.dedup import connected_components

    docs = _docs(spark, sf_dir)
    fp60 = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 15), 16, 10).cast("long")
    base = docs.select(
        F.col("doc_id").alias("page_id"),
        F.sha2(F.substring("text", 1, 40), 256).alias("content_key"),
        fp60.alias("fp"),
    )
    flips = (F.col("doc_id") % 4 + 1).cast("int")
    variants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("page_id"),
        F.sha2(F.concat(F.substring("text", 1, 40), F.lit("v")), 256).alias(
            "content_key"
        ),
        fp60.bitwiseXOR(F.pow(F.lit(2.0), flips).cast("long") - 1).alias("fp"),
    )
    corpus = base.unionByName(variants)
    from pyspark.sql import Window

    canon = F.min("page_id").over(Window.partitionBy("content_key"))
    exact_edges = (
        corpus.withColumn("canon", canon)
        .filter(F.col("page_id") > F.col("canon"))
        .select(F.col("canon").alias("id_a"), F.col("page_id").alias("id_b"))
    )
    fuzzy_edges = simhash_near_dup_join(
        corpus.select(F.col("page_id").alias("id"), "fp"),
        id_col="id", fp_col="fp", threshold=3,
    ).select("id_a", "id_b")
    comps = connected_components(
        exact_edges.unionByName(fuzzy_edges),
        nodes=corpus.select(F.col("page_id").alias("id")),
    )
    sizes = comps.groupBy("component_id").agg(
        F.count("*").cast("long").alias("component_size")
    )
    return comps.join(sizes, "component_id").select(
        F.col("id").alias("page_id"), "component_id", "component_size"
    )


O_DUPLICATE_COMPONENTS = """
WITH RECURSIVE corpus AS (
  SELECT doc_id AS page_id,
         sha256(substr(text,1,40)) AS content_key,
         CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT) AS fp
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS page_id,
         sha256(substr(text,1,40) || 'v') AS content_key,
         xor(CAST(('0x' || substr(sha256(text),1,15)) AS BIGINT),
             CAST(power(2, CAST(doc_id % 4 AS INT) + 1) AS BIGINT) - 1) AS fp
  FROM documents
),
exact_edges AS (
  SELECT min(page_id) OVER (PARTITION BY content_key) AS id_a, page_id AS id_b
  FROM corpus
  QUALIFY page_id > id_a
),
banded AS (
  SELECT page_id AS id, fp, b AS band_idx, (fp >> (b * 16)) & 65535 AS band
  FROM corpus, LATERAL unnest(generate_series(0,3)) AS g(b)
),
fuzzy_edges AS (
  SELECT id_a, id_b FROM (
    SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.fp AS fp_a, r.fp AS fp_b
    FROM banded l JOIN banded r
      ON l.band_idx = r.band_idx AND l.band = r.band AND l.id < r.id
  ) WHERE bit_count(xor(fp_a, fp_b)) <= 3
),
edges AS (
  SELECT id_a AS s, id_b AS t FROM exact_edges
  UNION SELECT id_b, id_a FROM exact_edges
  UNION SELECT id_a, id_b FROM fuzzy_edges
  UNION SELECT id_b, id_a FROM fuzzy_edges
),
reach AS (
  SELECT page_id AS id, page_id AS r FROM corpus
  UNION
  SELECT reach.id, e.t FROM reach JOIN edges e ON e.s = reach.r
),
comp AS (
  SELECT id AS page_id, min(r) AS component_id FROM reach GROUP BY id
)
SELECT page_id, component_id,
       CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
         AS component_size
FROM comp
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard near-dup verification (the n-gram flavor of
    the dedup family): each doc vs a suffixed twin, all JVM-side array ops.
    High-Jaccard pairs (>= 0.8) are the near-dup verdicts."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.substring("text", 1, 200).alias("t")
    )
    twins = docs.select(
        "doc_id", F.concat("t", F.lit(" ditambahkan teks baru")).alias("t2")
    )
    paired = docs.join(twins, "doc_id")

    def grams(col):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(col) - 2, F.lit(1))),
                lambda i: col.substr(i, F.lit(3)),
            )
        )

    g = paired.select(
        "doc_id", grams(F.col("t")).alias("ga"), grams(F.col("t2")).alias("gb")
    )
    jac = F.size(F.array_intersect("ga", "gb")) / F.size(F.array_union("ga", "gb"))
    return g.select(
        "doc_id", F.round(jac, 4).alias("jaccard"), (jac >= 0.8).alias("is_near_dup")
    )


O_NGRAM_JACCARD = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 200) AS t,
         substr(text, 1, 200) || ' ditambahkan teks baru' AS t2
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(length(t) - 2, 1)),
                                      i -> substr(t, i, 3))) AS ga,
         list_distinct(list_transform(generate_series(1, greatest(length(t2) - 2, 1)),
                                      i -> substr(t2, i, 3))) AS gb
  FROM d
)
SELECT doc_id,
       round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
             / len(list_distinct(list_concat(ga, gb))), 4) AS jaccard,
       CAST(len(list_intersect(ga, gb)) AS DOUBLE)
             / len(list_distinct(list_concat(ga, gb))) >= 0.8 AS is_near_dup
FROM g
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse-quantized lists + nprobe): centroids = the first 16
    corpus vectors (deterministic, engine-portable), queries probe their 2
    nearest lists, exact cosine top-3 inside them."""
    from crawler_spark.operators.similarity import ivf_topk

    corpus = _embs(spark, sf_dir)
    centroids = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(corpus, queries, centroids, k=3, nprobe=2)


def q_ann_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF centroid TRAINING (the missing train half of the IVF path):
    distributed Lloyd's k-means, k=8, 2 iterations, deterministic init (k
    lowest-id vectors) and rounded means/similarities so DuckDB replays the
    full fit bit-for-bit. Output: every trained centroid dimension plus the
    final assignment's member counts."""
    from crawler_spark.operators.similarity import kmeans_fit

    corpus = _embs(spark, sf_dir)
    centroids, sizes = kmeans_fit(corpus, k=8, n_iter=2)
    return (
        centroids.select(
            "centroid_id", F.posexplode("embedding").alias("dim_idx", "value")
        )
        .join(sizes, "centroid_id")
        .select("centroid_id", "dim_idx", "value", "n_members")
    )


O_ANN_IVF_TRAIN = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, v AS cv
  FROM e ORDER BY vec_id LIMIT 8
),
a1 AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
                      c.centroid_id) AS rn
    FROM e CROSS JOIN init c) WHERE rn = 1
),
m1 AS (
  SELECT centroid_id, i, round(avg(v[i]), 6) AS val
  FROM a1, LATERAL unnest(generate_series(1, 64)) AS g(i)
  GROUP BY centroid_id, i
),
c1 AS (SELECT centroid_id, list(val ORDER BY i) AS cv FROM m1 GROUP BY centroid_id),
a2 AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
                      c.centroid_id) AS rn
    FROM e CROSS JOIN c1 c) WHERE rn = 1
),
m2 AS (
  SELECT centroid_id, i, round(avg(v[i]), 6) AS val
  FROM a2, LATERAL unnest(generate_series(1, 64)) AS g(i)
  GROUP BY centroid_id, i
),
sizes AS (
  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_members
  FROM a2 GROUP BY centroid_id
)
SELECT m2.centroid_id, CAST(i - 1 AS INT) AS dim_idx, val AS value, n_members
FROM m2 JOIN sizes USING (centroid_id)
"""


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (PQ-ADC): 64-dim vectors -> 4 subspaces x 8
    codewords, one deterministic Lloyd refinement per subspace, then the
    compressed-domain asymmetric scan — queries score against CODES via a
    broadcast lookup table; raw corpus vectors are never read at query time.
    The 100 TB shape: 16x compression here (64 doubles -> 4 codes), ~1000x
    at production dims. Oracle replays the full fit+encode+scan."""
    from crawler_spark.operators.similarity import pq_adc_topk

    corpus = _embs(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(corpus, queries, dim=64, m=4, ksub=8, k=3)


# the oracle replays: sub-slicing, init codebooks (8 lowest-id vectors), one
# L2-argmin Lloyd pass (argmin key = round(<cv,cv> - 2<sv,cv>, 6) — the
# |sv|^2-free expansion), re-assignment, per-query LUT, and the ADC cosine.
# _PQ_FIT_CTES is the single source of truth for the fit+encode replay —
# O_ANN_PQ_TOPK and O_ANN_IVFPQ_TOPK must stay byte-equivalent there or
# their parities diverge confusingly.
_PQ_SUBS = "(VALUES (0,1,16),(1,17,32),(2,33,48),(3,49,64)) AS j(sub_idx, lo, hi)"
_PQ_FIT_CTES = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sub AS (
  SELECT vec_id, j.sub_idx, v[j.lo:j.hi] AS sv
  FROM e, {_PQ_SUBS}
),
init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec_id
  FROM e ORDER BY vec_id LIMIT 8
),
icb AS (
  SELECT s.sub_idx, i.code, s.sv AS cv
  FROM init i JOIN sub s ON s.vec_id = i.vec_id
),
a1 AS (
  SELECT vec_id, sub_idx, code, sv FROM (
    SELECT s.vec_id, s.sub_idx, c.code, s.sv,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
             ORDER BY round(list_inner_product(c.cv, c.cv)
                            - 2 * list_inner_product(s.sv, c.cv), 6),
                      c.code) AS rn
    FROM sub s JOIN icb c USING (sub_idx)) WHERE rn = 1
),
m1 AS (
  SELECT sub_idx, code, i, round(avg(sv[i]), 6) AS val
  FROM a1, LATERAL unnest(generate_series(1, 16)) AS g(i)
  GROUP BY sub_idx, code, i
),
cb AS (SELECT sub_idx, code, list(val ORDER BY i) AS cv FROM m1
       GROUP BY sub_idx, code),
codes AS (
  SELECT vec_id, sub_idx, code FROM (
    SELECT s.vec_id, s.sub_idx, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.sub_idx
             ORDER BY round(list_inner_product(c.cv, c.cv)
                            - 2 * list_inner_product(s.sv, c.cv), 6),
                      c.code) AS rn
    FROM sub s JOIN cb c USING (sub_idx)) WHERE rn = 1
)"""
O_ANN_PQ_TOPK = _PQ_FIT_CTES + f"""
, q AS (SELECT vec_id AS query_id, v AS qv,
             sqrt(list_inner_product(v, v)) AS qnorm
      FROM e WHERE vec_id < 5),
qsub AS (
  SELECT query_id, qnorm, j.sub_idx, qv[j.lo:j.hi] AS qsv
  FROM q, {_PQ_SUBS}
),
lut AS (
  SELECT qs.query_id, qs.qnorm, c.sub_idx, c.code,
         round(list_inner_product(qs.qsv, c.cv), 6) AS partial,
         round(list_inner_product(c.cv, c.cv), 6) AS cnorm2
  FROM qsub qs JOIN cb c ON c.sub_idx = qs.sub_idx
),
s AS (
  SELECT l.query_id, k.vec_id,
         round(sum(l.partial) / (max(l.qnorm) * sqrt(sum(l.cnorm2))), 4)
           AS cosine
  FROM codes k JOIN lut l ON l.sub_idx = k.sub_idx AND l.code = k.code
  GROUP BY l.query_id, k.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM s)
WHERE rn <= 3
"""


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition: coarse lists (first-16-vector centroids, nprobe=2)
    prune which CODES are scanned; PQ-ADC (4x8 codebooks) scores them — the
    billion-scale layout where query time touches neither raw vectors nor
    unprobed lists. Oracle replays lists + fit + encode + probe + ADC."""
    from crawler_spark.operators.similarity import ivfpq_topk

    corpus = _embs(spark, sf_dir)
    centroids = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivfpq_topk(
        corpus, queries, centroids, dim=64, m=4, ksub=8, k=3, nprobe=2
    )


O_ANN_IVFPQ_TOPK = _PQ_FIT_CTES + f"""
, cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
lists AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
                      c.centroid_id) AS rn
    FROM e CROSS JOIN cent c) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv,
             sqrt(list_inner_product(v, v)) AS qnorm
      FROM e WHERE vec_id < 5),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, c.cv), 4) DESC,
                      c.centroid_id) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= 2
),
qsub AS (
  SELECT query_id, qnorm, j.sub_idx, qv[j.lo:j.hi] AS qsv
  FROM q, {_PQ_SUBS}
),
lut AS (
  SELECT qs.query_id, qs.qnorm, c.sub_idx, c.code,
         round(list_inner_product(qs.qsv, c.cv), 6) AS partial,
         round(list_inner_product(c.cv, c.cv), 6) AS cnorm2
  FROM qsub qs JOIN cb c ON c.sub_idx = qs.sub_idx
),
s AS (
  SELECT l.query_id, k.vec_id,
         round(sum(l.partial) / (max(l.qnorm) * sqrt(sum(l.cnorm2))), 4)
           AS cosine
  FROM codes k
  JOIN lists ls ON ls.vec_id = k.vec_id
  JOIN probes p ON p.centroid_id = ls.centroid_id
  JOIN lut l ON l.query_id = p.query_id
            AND l.sub_idx = k.sub_idx AND l.code = k.code
  GROUP BY l.query_id, k.vec_id
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM s)
WHERE rn <= 3
"""


O_ANN_IVF_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
assign_scored AS (
  SELECT e.vec_id, e.v, c.centroid_id,
         round(list_cosine_similarity(e.v, c.cv), 4) AS sim,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
                                     c.centroid_id) AS rn
  FROM e CROSS JOIN cent c
),
assigned AS (SELECT vec_id, v, centroid_id FROM assign_scored WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
probe_scored AS (
  SELECT q.query_id, q.qv, c.centroid_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY round(list_cosine_similarity(q.qv, c.cv), 4) DESC,
                                     c.centroid_id) AS rn
  FROM q CROSS JOIN cent c
),
probes AS (SELECT query_id, qv, centroid_id FROM probe_scored WHERE rn <= 2),
s AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(a.v, p.qv), 4) AS cosine
  FROM assigned a JOIN probes p USING (centroid_id)
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS rn FROM s)
WHERE rn <= 3
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode path end-to-end (deterministic stand-in codec):
    binary payload -> dims + feature vector; features re-emitted as rounded
    doubles so the oracle can replay the digest arithmetic exactly."""
    from crawler_spark.operators.multimodal import decode_media

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("/img/"), F.col("doc_id").cast("string"), F.lit(".png")).alias("media_ref"),
        F.encode(F.substring("text", 1, 64), "UTF-8").alias("payload"),
    )
    out = decode_media(docs, fake=True, n_features=8)
    # Features exploded to one row per index: the driver's canonicalizer
    # sorts columns, and pandas cannot factorize array cells.
    return out.select(
        "doc_id", "media_ref", "width", "height", F.posexplode("features")
    ).select(
        "doc_id", "media_ref", "width", "height",
        F.col("pos").cast("int").alias("feature_idx"),
        F.round(F.col("col").cast("double"), 4).alias("feature_val"),
    )


O_MULTIMODAL_DECODE = """
WITH d AS (
  SELECT doc_id,
         '/img/' || doc_id || '.png' AS media_ref,
         sha256(substr(text, 1, 64)) AS dig
  FROM documents
)
SELECT doc_id, media_ref,
       CAST(64 + ('0x' || substr(dig, 1, 2))::INT % 192 AS INT) AS width,
       CAST(64 + ('0x' || substr(dig, 3, 2))::INT % 192 AS INT) AS height,
       CAST(t.i AS INT) AS feature_idx,
       round(CAST((('0x' || substr(dig, 2*(t.i % 32)+1, 2))::INT * 31 + t.i) % 256
             AS DOUBLE) / 255.0, 4) AS feature_val
FROM d CROSS JOIN generate_series(0, 7) t(i)
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing composed onto the decode path: aspect-preserving fit
    into a 64x64 box (floor, min 1) over the fake-decoded dimensions; the
    oracle replays the decode digest arithmetic plus the fit math."""
    from crawler_spark.operators.multimodal import decode_media, resize_media

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("/img/"), F.col("doc_id").cast("string"), F.lit(".png")).alias("media_ref"),
        F.encode(F.substring("text", 1, 64), "UTF-8").alias("payload"),
    )
    decoded = decode_media(docs, fake=True, n_features=8)
    return resize_media(decoded, target=64, fake=True)


O_MULTIMODAL_RESIZE = """
WITH d AS (
  SELECT doc_id,
         '/img/' || doc_id || '.png' AS media_ref,
         sha256(substr(text, 1, 64)) AS dig
  FROM documents
),
dims AS (
  SELECT doc_id, media_ref,
         CAST(64 + ('0x' || substr(dig, 1, 2))::INT % 192 AS INT) AS width,
         CAST(64 + ('0x' || substr(dig, 3, 2))::INT % 192 AS INT) AS height
  FROM d
)
SELECT doc_id, media_ref, width, height,
       CAST(greatest(1, width * 64 // greatest(width, height)) AS INT) AS out_width,
       CAST(greatest(1, height * 64 // greatest(width, height)) AS INT) AS out_height
FROM dims
"""


def q_multimodal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resample end-to-end (the r04 PIL stub is gone): a genuine
    24-bit BMP is encoded per doc (same pixel formula as the BMP decode
    oracle), decoded by the spec-driven BMP parser, area-average (box)
    resampled into a 3x3 fit box by integer weight matrices
    (operators/multimodal.py resample_plane), and the per-channel means of
    the RESAMPLED image are emitted. Both up- and downsampling occur across
    the fixture dims (w 2..7, h 1..5 -> out dims 1..3). The oracle replays
    the exact integer overlap-weight formula in SQL — a resample that
    misweights partial overlaps, flips axes, or averages in float fails the
    hash. Channel order is BMP stored order (BGR = c0,c1,c2)."""
    import numpy as np

    from crawler_spark.operators.multimodal import encode_bmp, resize_media

    @F.pandas_udf(T.BinaryType())
    def bmp_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            w, h = 2 + did % 6, 1 + did % 5
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (did + 3 * x + 7 * y) % 256,
                    (2 * did + 5 * x + 11 * y) % 256,
                    (3 * did + x + 13 * y) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            out.append(encode_bmp(w, h, px))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", bmp_payload(F.col("doc_id")).alias("payload")
    )
    out = resize_media(docs, target=3, fake=False)
    return out.select(
        "doc_id", "width", "height", "out_width", "out_height",
        F.round("out_mean_c0", 4).alias("out_mean_c0"),
        F.round("out_mean_c1", 4).alias("out_mean_c1"),
        F.round("out_mean_c2", 4).alias("out_mean_c2"),
    )


O_MULTIMODAL_RESAMPLE = """
WITH d AS (
  SELECT doc_id,
         2 + doc_id % 6 AS w, 1 + doc_id % 5 AS h,
         greatest(1, (2 + doc_id % 6) * 3 // greatest(2 + doc_id % 6, 1 + doc_id % 5)) AS ow,
         greatest(1, (1 + doc_id % 5) * 3 // greatest(2 + doc_id % 6, 1 + doc_id % 5)) AS oh
  FROM documents
),
cells AS (
  SELECT doc_id, w, h, ow, oh,
         greatest(0, least((gi.i + 1) * h, (gy.y + 1) * oh) - greatest(gi.i * h, gy.y * oh))
           * greatest(0, least((gj.j + 1) * w, (gx.x + 1) * ow) - greatest(gj.j * w, gx.x * ow))
           AS wt,
         (doc_id + 3*gx.x + 7*gy.y) % 256 AS c0,
         (2*doc_id + 5*gx.x + 11*gy.y) % 256 AS c1,
         (3*doc_id + gx.x + 13*gy.y) % 256 AS c2
  FROM d,
       LATERAL unnest(generate_series(0, CAST(oh - 1 AS INT))) AS gi(i),
       LATERAL unnest(generate_series(0, CAST(ow - 1 AS INT))) AS gj(j),
       LATERAL unnest(generate_series(0, CAST(h - 1 AS INT))) AS gy(y),
       LATERAL unnest(generate_series(0, CAST(w - 1 AS INT))) AS gx(x)
)
SELECT doc_id,
       CAST(any_value(w) AS INT) AS width,
       CAST(any_value(h) AS INT) AS height,
       CAST(any_value(ow) AS INT) AS out_width,
       CAST(any_value(oh) AS INT) AS out_height,
       round(CAST(sum(wt * c0) AS DOUBLE) / (any_value(w) * any_value(h) * any_value(ow) * any_value(oh)), 4) AS out_mean_c0,
       round(CAST(sum(wt * c1) AS DOUBLE) / (any_value(w) * any_value(h) * any_value(ow) * any_value(oh)), 4) AS out_mean_c1,
       round(CAST(sum(wt * c2) AS DOUBLE) / (any_value(w) * any_value(h) * any_value(ow) * any_value(oh)), 4) AS out_mean_c2
FROM cells GROUP BY doc_id
"""


def q_multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata end-to-end (the honest half of the video
    stub — frame extraction still needs ffmpeg, but dims/duration/track
    count live in the ISO-BMFF box tree): a genuine MP4 ftyp+moov(mvhd+trak
    (tkhd)*) stream is encoded per doc — every 5th doc gets a version-1
    (64-bit duration) mvhd — and parsed back by the bounds-checked box walk
    in operators/multimodal.py (parse_mp4_meta). The oracle re-derives
    brand/track-count/timescale/duration/dims from the fixture formulas, so
    a parser that misreads the mvhd version branch, the 16.16 fixed-point
    dims, or the trak recursion fails the hash."""
    from crawler_spark.operators.multimodal import encode_mp4_meta, parse_mp4

    @F.pandas_udf(T.BinaryType())
    def mp4_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            brand = b"isom" if did % 2 == 0 else b"mp42"
            n_tracks = 1 + did % 3
            dims = [
                (16 * (1 + (did + t) % 20), 16 * (1 + (did + 2 * t) % 15))
                for t in range(n_tracks)
            ]
            wide = did % 5 == 0
            duration = 100000 + did * 37 + ((1 << 32) if wide else 0)
            out.append(
                encode_mp4_meta(
                    brand, 1000 * (1 + did % 3), duration, dims, wide_mvhd=wide
                )
            )
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", mp4_payload(F.col("doc_id")).alias("payload")
    )
    return parse_mp4(docs)


O_MULTIMODAL_VIDEO_META = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
         CAST(1 + doc_id % 3 AS INT) AS n_tracks,
         CAST(1000 * (1 + doc_id % 3) AS BIGINT) AS timescale,
         CAST(100000 + doc_id * 37
              + CASE WHEN doc_id % 5 = 0 THEN 4294967296 ELSE 0 END
              AS BIGINT) AS duration
  FROM documents
),
t AS (
  SELECT doc_id,
         16 * (1 + (doc_id + g.t) % 20) AS tw,
         16 * (1 + (doc_id + 2 * g.t) % 15) AS th
  FROM d, LATERAL unnest(generate_series(0, CAST(n_tracks - 1 AS INT))) AS g(t)
)
SELECT d.doc_id,
       any_value(d.brand) AS brand,
       any_value(d.n_tracks) AS n_tracks,
       any_value(d.timescale) AS timescale,
       any_value(d.duration) AS duration,
       CAST(any_value(d.duration) * 1000 // any_value(d.timescale) AS BIGINT) AS duration_ms,
       CAST(max(t.tw) AS INT) AS width,
       CAST(max(t.th) AS INT) AS height
FROM d JOIN t ON d.doc_id = t.doc_id
GROUP BY d.doc_id
"""


def q_multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3 metadata end-to-end: a genuine MPEG-1 Layer III frame
    sequence is encoded per doc — every 4th doc behind an ID3v2 tag
    (syncsafe size, must be skipped) — and walked back frame-by-frame by
    the bounds-checked header parser (operators/multimodal.py
    parse_mp3_meta). The oracle re-derives bitrate/samplerate/frame-count/
    integer duration from the fixture formulas, so a parser that misreads
    the bitrate table, the syncsafe ID3 size, or the frame-length formula
    (144000*kbps/samplerate) fails the hash."""
    from crawler_spark.operators.multimodal import (
        MP3_BITRATES_V1L3, MP3_RATES_V1, encode_mp3, parse_mp3,
    )

    @F.pandas_udf(T.BinaryType())
    def mp3_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            out.append(
                encode_mp3(
                    MP3_BITRATES_V1L3[1 + did % 14],
                    MP3_RATES_V1[did % 3],
                    10 + did % 30,
                    id3_bytes=(100 + did % 50) if did % 4 == 0 else 0,
                )
            )
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", mp3_payload(F.col("doc_id")).alias("payload")
    )
    return parse_mp3(docs)


O_MULTIMODAL_AUDIO_META = """
WITH d AS (
  SELECT doc_id,
         ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[1 + doc_id % 14] AS br,
         ([44100,48000,32000])[1 + doc_id % 3] AS sr,
         10 + doc_id % 30 AS nf
  FROM documents
)
SELECT doc_id,
       CAST(br AS INT) AS bitrate_kbps,
       CAST(sr AS INT) AS sample_rate,
       CAST(nf AS INT) AS n_frames,
       CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms
FROM d
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: metadata-driven frame count, every-10th
    index exploded to rows (the per-frame decode is the stubbed codec)."""
    from crawler_spark.operators.multimodal import frame_sample_plan, with_media_metadata

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.encode(F.substring("text", 1, 96), "UTF-8").alias("payload"),
    )
    meta = with_media_metadata(docs)
    frames = frame_sample_plan(meta, every_n=10)
    return frames.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("frame_idx").cast("int").alias("frame_idx"),
    )


O_MULTIMODAL_FRAMES = """
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(substr(text, 1, 96))) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT doc_id, n_bytes, CAST(t.i AS INT) AS frame_idx
FROM m, LATERAL unnest(range(0, CAST(n_bytes % 300 + 30 AS INT), 10)) AS t(i)
"""


def q_multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: a genuine 24-bit BMP byte stream is
    encoded per doc (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding), then parsed back by the spec-driven decoder in
    operators/multimodal.py (struct + numpy, no image library) which computes
    per-channel pixel means. The oracle re-derives the expected stats from
    the pixel formula alone — so a decoder that misreads padding, row order,
    or channel order fails the hash. pixel(x, y) BGR = ((doc_id + 3x + 7y),
    (2*doc_id + 5x + 11y), (3*doc_id + x + 13y)) % 256; w = 2 + doc_id%6,
    h = 1 + doc_id%5."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_bmp, encode_bmp

    @F.pandas_udf(T.BinaryType())
    def bmp_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            w, h = 2 + did % 6, 1 + did % 5
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (did + 3 * x + 7 * y) % 256,
                    (2 * did + 5 * x + 11 * y) % 256,
                    (3 * did + x + 13 * y) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            out.append(encode_bmp(w, h, px))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", bmp_payload(F.col("doc_id")).alias("payload")
    )
    return decode_bmp(docs).select(
        "doc_id", "width", "height", "bpp",
        F.round("mean_b", 4).alias("mean_b"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_r", 4).alias("mean_r"),
    )


O_MULTIMODAL_DECODE_BMP = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 6 AS w, 1 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id + 3*gx.x + 7*gy.y) % 256 AS b,
         (2*doc_id + 5*gx.x + 11*gy.y) % 256 AS g,
         (3*doc_id + gx.x + 13*gy.y) % 256 AS r
  FROM d,
       LATERAL unnest(generate_series(0, CAST(w - 1 AS INT))) AS gx(x),
       LATERAL unnest(generate_series(0, CAST(h - 1 AS INT))) AS gy(y)
)
SELECT doc_id,
       CAST(any_value(w) AS INT) AS width,
       CAST(any_value(h) AS INT) AS height,
       CAST(24 AS INT) AS bpp,
       round(CAST(sum(b) AS DOUBLE) / count(*), 4) AS mean_b,
       round(CAST(sum(g) AS DOUBLE) / count(*), 4) AS mean_g,
       round(CAST(sum(r) AS DOUBLE) / count(*), 4) AS mean_r
FROM px GROUP BY doc_id
"""


def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: a genuine RIFF/WAVE PCM16 container is
    encoded per doc and parsed back by the chunk-walking decoder (struct +
    numpy, no audio library), which computes mean amplitude and RMS in
    int64/float64. The oracle replays the sample formula in SQL.
    rate = 8000*(1 + doc_id%3); n = 32 + doc_id%33;
    sample[i] = (doc_id*131 + i*7919) % 65536 - 32768."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_wav, encode_wav

    @F.pandas_udf(T.BinaryType())
    def wav_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            rate = 8000 * (1 + did % 3)
            n = 32 + did % 33
            i = np.arange(n, dtype=np.int64)
            samples = (did * 131 + i * 7919) % 65536 - 32768
            out.append(encode_wav(rate, samples.astype(np.int16)))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", wav_payload(F.col("doc_id")).alias("payload")
    )
    return decode_wav(docs).select(
        "doc_id", "sample_rate", "n_channels", "bits_per_sample", "n_samples",
        F.round("mean_amp", 4).alias("mean_amp"),
        F.round("rms", 4).alias("rms"),
    )


O_MULTIMODAL_DECODE_WAV = """
WITH d AS (
  SELECT doc_id,
         8000 * (1 + doc_id % 3) AS rate,
         32 + doc_id % 33 AS n
  FROM documents
),
s AS (
  SELECT doc_id, rate, n,
         (doc_id * 131 + g.i * 7919) % 65536 - 32768 AS samp
  FROM d, LATERAL unnest(generate_series(0, CAST(n - 1 AS INT))) AS g(i)
)
SELECT doc_id,
       CAST(any_value(rate) AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(16 AS INT) AS bits_per_sample,
       CAST(any_value(n) AS BIGINT) AS n_samples,
       round(CAST(sum(samp) AS DOUBLE) / count(*), 4) AS mean_amp,
       round(sqrt(CAST(sum(samp * samp) AS DOUBLE) / count(*)), 4) AS rms
FROM s GROUP BY doc_id
"""


def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end with only stdlib zlib (no PIL): a genuine
    PNG byte stream — IHDR, a multi-chunk zlib-compressed IDAT stream whose
    scanlines cycle through ALL FIVE filter types (None/Sub/Up/Average/Paeth,
    RFC 2083 §6), CRC-32 per chunk — is encoded per doc and parsed back by
    the spec-driven decoder in operators/multimodal.py, which verifies CRCs,
    inflates, reverses the filters, and computes per-channel means. The
    oracle re-derives the stats from the pixel formula alone, so a decoder
    that botches the Paeth predictor, filter bytes, or row order fails the
    hash. pixel(x, y) RGB = ((doc_id + 5x + 3y), (2*doc_id + 7x + y),
    (3*doc_id + 2x + 9y)) % 256; w = 2 + doc_id%7, h = 1 + doc_id%6 (so
    heights reach 6 rows — every filter type appears)."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_png, encode_png

    @F.pandas_udf(T.BinaryType())
    def png_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            w, h = 2 + did % 7, 1 + did % 6
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (did + 5 * x + 3 * y) % 256,
                    (2 * did + 7 * x + y) % 256,
                    (3 * did + 2 * x + 9 * y) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            out.append(encode_png(w, h, px))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", png_payload(F.col("doc_id")).alias("payload")
    )
    return decode_png(docs).select(
        "doc_id", "width", "height", "color_type",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


O_MULTIMODAL_DECODE_PNG = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 7 AS w, 1 + doc_id % 6 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id + 5*gx.x + 3*gy.y) % 256 AS r,
         (2*doc_id + 7*gx.x + gy.y) % 256 AS g,
         (3*doc_id + 2*gx.x + 9*gy.y) % 256 AS b
  FROM d,
       LATERAL unnest(generate_series(0, CAST(w - 1 AS INT))) AS gx(x),
       LATERAL unnest(generate_series(0, CAST(h - 1 AS INT))) AS gy(y)
)
SELECT doc_id,
       CAST(any_value(w) AS INT) AS width,
       CAST(any_value(h) AS INT) AS height,
       CAST(2 AS INT) AS color_type,
       round(CAST(sum(r) AS DOUBLE) / count(*), 4) AS mean_r,
       round(CAST(sum(g) AS DOUBLE) / count(*), 4) AS mean_g,
       round(CAST(sum(b) AS DOUBLE) / count(*), 4) AS mean_b
FROM px GROUP BY doc_id
"""


def q_multimodal_decode_jpg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JFIF decode end-to-end with stdlib + numpy (no PIL):
    a genuine JPEG byte stream — SOI/APP0/DQT/SOF0/DHT/SOS segments, DCT +
    quantization + zigzag + DC-diff/AC-run Huffman entropy coding, byte
    stuffing — is encoded per doc (kernels/jpeg.py) and parsed back by the
    full baseline decoder (marker walk, canonical Huffman decode, dequant,
    exact float IDCT, level shift). The fixture images are grayscale with a
    CONSTANT value per 8x8 block, which round-trips EXACTLY at the all-ones
    quantization table (a constant block's DCT has the single integer
    coefficient 8*(v-128); q=1 preserves it), so the oracle re-derives the
    decoded stats from the block-value formula alone — a decoder that
    botches the Huffman tables, DC prediction chain, dequant, zigzag, or
    IDCT scaling fails the hash. block(bx, by) value = (doc_id + 17*bx +
    29*by) % 256; w = 8*(1 + doc_id%3), h = 8*(1 + doc_id%2)."""
    import numpy as np

    from crawler_spark.kernels.jpeg import encode_jpeg
    from crawler_spark.operators.multimodal import decode_jpeg

    @F.pandas_udf(T.BinaryType())
    def jpg_payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for did in doc_id:
            did = int(did)
            bw, bh = 1 + did % 3, 1 + did % 2
            by, bx = np.mgrid[0:bh, 0:bw]
            vals = ((did + 17 * bx + 29 * by) % 256).astype(np.uint8)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
            out.append(encode_jpeg(img))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", jpg_payload(F.col("doc_id")).alias("payload")
    )
    return decode_jpeg(docs).select(
        "doc_id", "width", "height", "n_components",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


O_MULTIMODAL_DECODE_JPG = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh FROM documents
),
blocks AS (
  SELECT doc_id, bw, bh,
         (doc_id + 17*gx.x + 29*gy.y) % 256 AS v
  FROM d,
       LATERAL unnest(generate_series(0, CAST(bw - 1 AS INT))) AS gx(x),
       LATERAL unnest(generate_series(0, CAST(bh - 1 AS INT))) AS gy(y)
)
SELECT doc_id,
       CAST(8 * any_value(bw) AS INT) AS width,
       CAST(8 * any_value(bh) AS INT) AS height,
       CAST(1 AS INT) AS n_components,
       round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS mean_r,
       round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS mean_g,
       round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS mean_b
FROM blocks GROUP BY doc_id
"""


def q_multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end with zero codec libraries: a genuine GIF89a
    stream — logical screen descriptor, 256-entry global color table, and an
    image whose pixel data is REALLY LZW-compressed (dictionary-building
    encoder, variable-width codes, CLEAR/EOI, 255-byte sub-block framing) —
    is encoded per doc and parsed back by the spec-driven decoder in
    operators/multimodal.py, which reassembles sub-blocks, runs the full
    variable-width LZW decode (incl. the KwKwK case), maps indices through
    the palette, and computes per-channel means. The oracle re-derives the
    stats from the index/palette formulas alone. idx(x, y) =
    (doc_id + 3x + 5y) % 256; palette[i] = (i, 2i%256, 3i%256);
    w = 2 + doc_id%8, h = 1 + doc_id%7."""
    import numpy as np

    from crawler_spark.operators.multimodal import decode_gif, encode_gif

    @F.pandas_udf(T.BinaryType())
    def gif_payload(doc_id: pd.Series) -> pd.Series:
        pal = np.stack(
            [
                np.arange(256),
                (2 * np.arange(256)) % 256,
                (3 * np.arange(256)) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        out = []
        for did in doc_id:
            did = int(did)
            w, h = 2 + did % 8, 1 + did % 7
            y, x = np.mgrid[0:h, 0:w]
            idx = ((did + 3 * x + 5 * y) % 256).astype(np.uint8)
            out.append(encode_gif(w, h, idx, pal))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", gif_payload(F.col("doc_id")).alias("payload")
    )
    return decode_gif(docs).select(
        "doc_id", "width", "height", "n_colors",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_g", 4).alias("mean_g"),
        F.round("mean_b", 4).alias("mean_b"),
    )


O_MULTIMODAL_DECODE_GIF = """
WITH d AS (
  SELECT doc_id, 2 + doc_id % 8 AS w, 1 + doc_id % 7 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id + 3*gx.x + 5*gy.y) % 256 AS i
  FROM d,
       LATERAL unnest(generate_series(0, CAST(w - 1 AS INT))) AS gx(x),
       LATERAL unnest(generate_series(0, CAST(h - 1 AS INT))) AS gy(y)
)
SELECT doc_id,
       CAST(any_value(w) AS INT) AS width,
       CAST(any_value(h) AS INT) AS height,
       CAST(256 AS INT) AS n_colors,
       round(CAST(sum(i) AS DOUBLE) / count(*), 4) AS mean_r,
       round(CAST(sum((2*i) % 256) AS DOUBLE) / count(*), 4) AS mean_g,
       round(CAST(sum((3*i) % 256) AS DOUBLE) / count(*), 4) AS mean_b
FROM px GROUP BY doc_id
"""


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WARC archive round-trip (ISO 28500 — the interchange format of
    web-scale crawls; Common Crawl ships .warc.gz): per doc, a genuine
    WARC/1.1 archive (warcinfo + HTTP response record, exact
    Content-Length framing, sha-256-labelled payload digests; odd doc_ids
    use PER-RECORD gzip members — the seekable Common Crawl layout) is
    built and parsed back by the spec-driven reader in operators/warc.py
    (member-wise inflate, strict CRLF framing, Content-Length slicing,
    HTTP status/body split). The oracle reconstructs every field —
    lengths, sha-256 digests, status, body — constructively, so a parser
    that misframes a record, miscounts a length, or mangles the gzip
    member walk fails the hash."""
    import gzip as _gzip

    from crawler_spark.operators.warc import (
        build_warc, build_warc_record, warc_records,
    )

    @F.pandas_udf(T.BinaryType())
    def warc_payload(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for did, txt in zip(doc_id, text):
            did = int(did)
            part = (txt or "")[:120]
            uri = f"https://portal{did % 20}.go.id/arsip/{did}"
            info = build_warc_record(
                "warcinfo", {"WARC-Record-ID": f"<urn:uuid:{did}>"},
                b"software: lexi-spark",
            )
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + part.encode("utf-8")
            )
            resp = build_warc_record(
                "response", {"WARC-Target-URI": uri}, http
            )
            out.append(build_warc([info, resp], gzip_per_record=did % 2 == 1))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).select(
        "doc_id", warc_payload(F.col("doc_id"), F.col("text")).alias("payload")
    )
    return warc_records(docs).select(
        "doc_id", "rec_idx", "rec_type", "target_uri", "content_length",
        "payload_digest", "http_status",
        F.length("body").alias("body_chars"),
    )


O_WARC_INGEST = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 120) AS part FROM documents
)
SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS rec_type,
       CAST(NULL AS VARCHAR) AS target_uri,
       CAST(20 AS BIGINT) AS content_length,
       'sha-256:' || sha256('software: lexi-spark') AS payload_digest,
       CAST(NULL AS INT) AS http_status,
       CAST(20 AS INT) AS body_chars
FROM d
UNION ALL
SELECT doc_id, 1 AS rec_idx, 'response' AS rec_type,
       'https://portal' || (doc_id % 20) || '.go.id/arsip/' || doc_id
         AS target_uri,
       CAST(44 + octet_length(encode(part)) AS BIGINT) AS content_length,
       'sha-256:' || sha256('HTTP/1.1 200 OK' || chr(13) || chr(10)
           || 'Content-Type: text/html' || chr(13) || chr(10)
           || chr(13) || chr(10) || part) AS payload_digest,
       CAST(200 AS INT) AS http_status,
       CAST(length(part) AS INT) AS body_chars
FROM d
"""


# ----------------------------------------------- training-data curation ops

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM method, public):
    flag training documents that share any k-word shingle with an eval/
    benchmark set. Benchmark stand-in = every 97th doc (deterministic).

    Plan shape for 100 TB: the benchmark shingle set is tiny relative to the
    corpus (eval suites are ~10^6 shingles), so it is BROADCAST to the
    corpus-side explode; the per-doc overlap count is one map-side-combinable
    aggregation. No corpus self-join, no window, one shuffle total. The join
    key is a 60-bit hash of the shingle, not the string — the broadcast
    table is 8 B/entry instead of ~50 B (a 10^7-shingle eval suite fits in
    tens of MB per executor), and the probe compares fixed-width ints. A
    hash collision only OVER-flags a doc (~1e-9 per pair at 60 bits) —
    decontamination is deliberately recall-biased.

    hit_ratio is a raw double from a single (double)/int division — both
    engines produce bit-identical IEEE results, so no round() tie risk.
    """
    K = 4

    _h = md5_60bit_col  # 60-bit md5-prefix hash, identical on the DuckDB side

    docs = _docs(spark, sf_dir).select(
        "doc_id", word_shingles_col(F.col("text"), K).alias("sh")
    )
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("sh").alias("shingle"))
        .select(_h(F.col("shingle")).alias("sh_h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            F.size("sh").alias("n_shingles"),
            F.explode_outer("sh").alias("shingle"),
        )
        .select("doc_id", "n_shingles", _h(F.col("shingle")).alias("sh_h"))
    )
    return (
        corpus.join(F.broadcast(bench), "sh_h", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hits"))
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_hits").cast("double") / F.col("n_shingles"),
            )
            .otherwise(F.lit(0.0))
            .alias("hit_ratio"),
            (F.col("n_hits") >= 1).alias("contaminated"),
        )
    )


O_DECONTAMINATE = r"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 4
              THEN list_distinct(list_transform(generate_series(1, len(toks)-3),
                                                i -> array_to_string(toks[i:i+3], ' ')))
              ELSE CAST([] AS VARCHAR[]) END AS sh
  FROM tok
),
bench AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
  FROM (SELECT unnest(sh) AS shingle FROM sh WHERE doc_id % 97 = 0)
),
corpus AS (
  SELECT doc_id, n_shingles,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh_h
  FROM (
    SELECT doc_id, len(sh) AS n_shingles,
           unnest(CASE WHEN len(sh) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE sh END) AS shingle
    FROM sh WHERE doc_id % 97 <> 0
  )
)
SELECT c.doc_id,
       CAST(c.n_shingles AS INT) AS n_shingles,
       CAST(count(b.sh_h) AS INT) AS n_hits,
       CASE WHEN c.n_shingles > 0
            THEN CAST(CAST(count(b.sh_h) AS INT) AS DOUBLE) / c.n_shingles
            ELSE 0.0 END AS hit_ratio,
       count(b.sh_h) >= 1 AS contaminated
FROM corpus c LEFT JOIN bench b USING (sh_h)
GROUP BY c.doc_id, c.n_shingles
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality filter signals (Rae et al. 2021,
    public; thresholds adapted to the fixture corpus): word count, mean word
    length, alpha-word fraction, symbol-to-word ratio, and the fraction of
    characters covered by the most repeated word bigram. Docs with
    doc_id % 5 == 0 get ' ## #' appended so the symbol/alpha paths are
    exercised (same trick as text_profile's '!!!').

    Plan shape for 100 TB: per-doc scalar signals are pure column
    expressions; the top-bigram signal is explode -> two map-side-combinable
    aggregations on (doc_id[, bigram]) -> join back on doc_id. All shuffles
    hash on doc_id (no skew: one output row per doc). Ratios are raw doubles
    from single (double)/int divisions — bit-identical across engines.
    """
    base = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" ## #"))
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    n_words = token_count_ws_col(F.col("t"))
    stats = base.select(
        "doc_id",
        F.length("t").alias("n_chars"),
        n_words.alias("n_words"),
        mean_word_len_col(F.col("t")).alias("mean_word_len"),
        alpha_word_ratio_col(F.col("t")).alias("alpha_word_ratio"),
        F.when(
            n_words > 0,
            F.regexp_count(F.col("t"), F.lit("#")).cast("double") / n_words,
        )
        .otherwise(F.lit(0.0))
        .alias("symbol_word_ratio"),
    )
    bigrams = base.select(
        "doc_id", F.explode(word_ngrams_col(F.col("t"), 2)).alias("bg")
    )
    bg_top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("c") >= 2, F.col("c") * F.length("bg")).otherwise(0)
            ).alias("dup_chars")
        )
    )
    out = stats.join(bg_top, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_ratio",
        "symbol_word_ratio",
        F.when(
            F.col("n_chars") > 0,
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("double")
            / F.col("n_chars"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_char_frac"),
    )
    keep = (
        (F.col("n_words") >= 5)
        & (F.col("n_words") <= 10000)
        & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0)
        & (F.col("alpha_word_ratio") >= 0.7)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("dup_bigram_char_frac") <= 0.2)
    )
    return out.withColumn("keep", keep)


O_GOPHER_QUALITY = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' ## #' ELSE text END AS t
  FROM documents
),
tok AS (
  SELECT doc_id, t, list_filter(string_split_regex(t,'\s+'), x -> x <> '') AS toks
  FROM d
),
stats AS (
  SELECT doc_id, length(t) AS n_chars, len(toks) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
                                    (a, b) -> a + b) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS alpha_word_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len(regexp_extract_all(t, '#')) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS symbol_word_ratio
  FROM tok
),
bg AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
                                       i -> array_to_string(toks[i:i+1], ' '))) AS bg
  FROM tok WHERE len(toks) >= 2
),
bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
bgt AS (
  SELECT doc_id,
         max(CASE WHEN c >= 2 THEN c * length(bg) ELSE 0 END) AS dup_chars
  FROM bgc GROUP BY doc_id
),
m AS (
  SELECT s.doc_id, CAST(s.n_words AS INT) AS n_words,
         s.mean_word_len, s.alpha_word_ratio, s.symbol_word_ratio,
         CASE WHEN s.n_chars > 0
              THEN CAST(COALESCE(b.dup_chars, 0) AS DOUBLE) / s.n_chars
              ELSE 0.0 END AS dup_bigram_char_frac
  FROM stats s LEFT JOIN bgt b USING (doc_id)
)
SELECT *,
       (n_words >= 5 AND n_words <= 10000
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND alpha_word_ratio >= 0.7
        AND symbol_word_ratio <= 0.1
        AND dup_bigram_char_frac <= 0.2) AS keep
FROM m
"""


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + rate-based sampling flag, the
    shapes large-scale curation actually uses (DataComp/Dolma style): both
    are pure hash functions of the row key — MAP-ONLY, zero shuffle, and
    any engine (Spark, DuckDB, a backfill script) assigns the same row to
    the same split. Exact-quota per-stratum sampling is deliberately NOT the
    headline: it needs a total order per stratum (one reducer per stratum —
    5 langs would serialize 100 TB); rate-based hashing gives binomial
    quotas with no coordination. Two INDEPENDENT hashes (domain-separated by
    a prefix) decide split membership and sampling so the 5% sample is
    unbiased within every split."""
    d = _docs(spark, sf_dir)
    bucket = (md5_60bit_col(F.col("doc_id").cast("string")) % 100).cast("int")
    smp = (
        md5_60bit_col(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
        % 10000
    ).cast("int")
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        (smp < 500).alias("sampled_5pct"),
    )


O_STRATIFIED_SPLIT = r"""
WITH h AS (
  SELECT doc_id, lang,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 100 AS INT) AS bucket,
         CAST(CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 10000 AS INT) AS smp
  FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       smp < 500 AS sampled_5pct
FROM h
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set materialization — the composition the other
    curation queries define in isolation: exact dedup (canonical doc per
    full-text sha256) -> Gopher quality filter (keep) -> benchmark
    decontamination (docs sharing eval shingles drop; the benchmark docs
    themselves never enter the training set) -> deterministic split
    assignment. One output row per SURVIVING training document.

    Plan shape for 100 TB: the canonical election is one content-hash
    aggregation; every later stage is one row per doc_id, so the joins all
    hash-partition on doc_id with no skew and no fan-out. The decontaminate
    stage still broadcasts the eval shingles (plan-gated there)."""
    docs = _docs(spark, sf_dir)
    canon = (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    quality = (
        q_gopher_quality(spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id", "n_words", "mean_word_len")
    )
    clean = (
        q_decontaminate(spark, sf_dir)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    split = q_stratified_split(spark, sf_dir).select("doc_id", "lang", "split")
    return (
        split.join(canon, "doc_id")
        .join(quality, "doc_id")
        .join(clean, "doc_id")
    )


O_CURATION_PIPELINE = rf"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
),
quality AS (
  SELECT doc_id, n_words, mean_word_len
  FROM ({O_GOPHER_QUALITY}) WHERE keep
),
clean AS (
  SELECT doc_id FROM ({O_DECONTAMINATE}) WHERE NOT contaminated
),
split AS ({O_STRATIFIED_SPLIT})
SELECT s.doc_id, s.lang, s.split, q.n_words, q.mean_word_len
FROM split s
JOIN canon USING (doc_id)
JOIN quality q USING (doc_id)
JOIN clean USING (doc_id)
"""


_SUBSTR_HDR = "putusan mahkamah agung republik indonesia nomor tahun berkekuatan"


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring (8-token window) duplication statistics — the
    Lee et al. dedup criterion restricted to fixed-length windows
    (operators/dedup.py duplicated_window_stats). Duplication is planted
    in-query so both duplication modes provably occur: a shared 8-token
    header is PREPENDED to even doc_ids (cross-document duplication) and
    APPENDED to doc_id % 5 == 0 (within-document repetition for doc_ids
    divisible by 10, where the same doc carries the header twice). The
    oracle replays tokenization, window slicing, the 60-bit md5-prefix
    hash, and the global occurrence counts in SQL — an implementation that
    dedupes per-document, drops boundary-straddling windows, or counts
    distinct docs instead of occurrences fails the hash."""
    from crawler_spark.operators.dedup import duplicated_window_stats

    docs = _docs(spark, sf_dir)
    text2 = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit(_SUBSTR_HDR + " ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" " + _SUBSTR_HDR)).otherwise(F.lit("")),
    )
    return duplicated_window_stats(
        docs.select("doc_id", text2.alias("text")), k=8
    )


O_SUBSTRING_DEDUP = r"""
WITH d AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0
               THEN 'putusan mahkamah agung republik indonesia nomor tahun berkekuatan '
               ELSE '' END)
         || text
         || (CASE WHEN doc_id % 5 = 0
               THEN ' putusan mahkamah agung republik indonesia nomor tahun berkekuatan'
               ELSE '' END) AS text
  FROM documents
),
tok AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS toks
  FROM d
),
win AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8
              THEN list_transform(generate_series(1, len(toks)-7),
                                  i -> array_to_string(toks[i:i+7], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS wins
  FROM tok
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(wins) AS w FROM win)
),
occ AS (
  SELECT h, count(*) AS n_occ FROM h GROUP BY h
),
per_doc AS (
  SELECT h.doc_id,
         count(*) AS n_windows,
         sum(CASE WHEN occ.n_occ >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
  FROM h JOIN occ USING (h)
  GROUP BY h.doc_id
)
SELECT w.doc_id,
       CAST(coalesce(p.n_windows, 0) AS INT) AS n_windows,
       CAST(coalesce(p.n_dup_windows, 0) AS INT) AS n_dup_windows,
       round(coalesce(CAST(p.n_dup_windows AS DOUBLE) / p.n_windows, 0.0), 4)
         AS dup_frac
FROM win w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
"""


def q_substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the window-occurrence index behind
    substring_dedup (the standing-corpus production flow): the corpus
    (doc_id % 10 != 0) owns a STANDING (window_hash, n_occ) count table; a
    new round's delta docs (doc_id % 10 == 0) contribute their own counts;
    occurrence counts are ADDITIVE so the merge is one map-side-combinable
    SUM over delta + standing — never a corpus rescan — and the delta docs'
    duplication stats are computed against the MERGED index (a window that
    only becomes duplicated because the delta re-introduced it must already
    count as duplicated for the delta doc that did). Standing index
    recomputed from the corpus split here (no persisted state in the
    oracle harness — same convention as line_dedup_incremental /
    minhash_incremental); in the engine it is a snapshot table and the
    per-round cost is O(delta windows). Output: the delta docs' rows."""
    from crawler_spark.functions.text import md5_60bit_col, word_ngrams_col

    docs = _docs(spark, sf_dir)
    text2 = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit(_SUBSTR_HDR + " ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" " + _SUBSTR_HDR)).otherwise(F.lit("")),
    )
    base = docs.select(
        "doc_id", word_ngrams_col(text2, 8).alias("wins")
    )
    exploded = base.select("doc_id", F.explode("wins").alias("w")).select(
        "doc_id", md5_60bit_col(F.col("w")).alias("h")
    )
    standing = (
        exploded.filter(F.col("doc_id") % 10 != 0)
        .groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    )
    delta = exploded.filter(F.col("doc_id") % 10 == 0)
    delta_counts = delta.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    merged = (
        standing.unionByName(delta_counts)
        .groupBy("h").agg(F.sum("n_occ").alias("n_occ"))
    )
    per_doc = (
        delta.join(merged, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("n_occ") >= 2).cast("int")).alias("n_dup_windows"),
        )
    )
    return (
        base.filter(F.col("doc_id") % 10 == 0).select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("int").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("int").alias("n_dup_windows"),
            F.round(
                F.coalesce(
                    F.col("n_dup_windows") / F.col("n_windows"), F.lit(0.0)
                ),
                4,
            ).alias("dup_frac"),
        )
    )


O_SUBSTRING_DEDUP_INCREMENTAL = r"""
WITH d AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0
               THEN 'putusan mahkamah agung republik indonesia nomor tahun berkekuatan '
               ELSE '' END)
         || text
         || (CASE WHEN doc_id % 5 = 0
               THEN ' putusan mahkamah agung republik indonesia nomor tahun berkekuatan'
               ELSE '' END) AS text
  FROM documents
),
tok AS (
  SELECT doc_id, list_filter(string_split_regex(text,'\s+'), x -> x <> '') AS toks
  FROM d
),
win AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8
              THEN list_transform(generate_series(1, len(toks)-7),
                                  i -> array_to_string(toks[i:i+7], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS wins
  FROM tok
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(wins) AS w FROM win)
),
occ AS (
  SELECT h, count(*) AS n_occ FROM h GROUP BY h
),
per_doc AS (
  SELECT h.doc_id,
         count(*) AS n_windows,
         sum(CASE WHEN occ.n_occ >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
  FROM h JOIN occ USING (h)
  WHERE h.doc_id % 10 = 0
  GROUP BY h.doc_id
)
SELECT w.doc_id,
       CAST(coalesce(p.n_windows, 0) AS INT) AS n_windows,
       CAST(coalesce(p.n_dup_windows, 0) AS INT) AS n_dup_windows,
       round(coalesce(CAST(p.n_dup_windows AS DOUBLE) / p.n_windows, 0.0), 4)
         AS dup_frac
FROM win w LEFT JOIN per_doc p ON w.doc_id = p.doc_id
WHERE w.doc_id % 10 = 0
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus repeated-line removal (CCNet-style boilerplate dedup):
    hash every line, count the DISTINCT documents it appears in, and strip
    lines above the threshold from every document — the standard pass that
    removes nav bars / cookie banners / copyright footers before training.
    The fixture corpus has no newlines, so "lines" are deterministic
    10-token chunks (the chunker stands in for the line splitter; the
    dataflow is identical), and boilerplate is planted in-query: a shared
    10-token header on even doc_ids and a footer on doc_id % 3 == 0 (the
    footer only chunk-aligns when the preceding token count is a multiple
    of 10 — exercising the partial-line path).

    100 TB plan: ONE aggregation (line -> distinct-doc count) feeds a
    collect_list of just the ABOVE-THRESHOLD lines (the boilerplate set —
    bounded by threshold selectivity at ~1e5-1e6 lines, CCNet-scale) which
    broadcasts to a per-row array filter: the corpus is never exploded a
    second time and never re-shuffled for reconstruction — removal is a
    map-side lambda that preserves line order and multiplicity. For an
    unbounded boilerplate set, swap the lambda for explode -> broadcast
    anti-join -> regroup (one more shuffle). Zero UDF."""
    chunked = _docs(spark, sf_dir).select(
        "doc_id", _planted_lines_col().alias("lines")
    )
    boiler = (
        chunked.select("doc_id", F.explode("lines").alias("line"))
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= _LINE_DEDUP_T)
        .agg(F.collect_list("line").alias("bl"))
    )
    return _strip_boilerplate(chunked, boiler)


_LINE_DEDUP_T = 3


def _planted_lines_col(k: int = 10) -> Column:
    """The line_dedup fixture construction: plant a shared 10-token header
    (even doc_ids) / footer (doc_id % 3 == 0) into the newline-free corpus,
    then chunk into k-token "lines"."""
    hdr = (
        "putusan ini dilindungi hak cipta pengadilan negeri republik"
        " indonesia portal"
    )
    ftr = (
        "salinan resmi diterbitkan oleh kepaniteraan mahkamah agung republik"
        " indonesia jakarta"
    )
    text2 = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit(hdr + " "), F.col("text"))
    ).otherwise(F.col("text"))
    text2 = F.when(
        F.col("doc_id") % 3 == 0, F.concat(text2, F.lit(" " + ftr))
    ).otherwise(text2)
    toks = ws_tokens_col(text2)
    nch = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nch - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _strip_boilerplate(chunked: DataFrame, boiler: DataFrame) -> DataFrame:
    """Broadcast the one-row boilerplate list and strip its lines map-side
    (order/multiplicity preserving) — shared by the batch and incremental
    line-dedup queries."""
    empty = F.array().cast("array<string>")
    return (
        chunked.crossJoin(F.broadcast(boiler))
        .select(
            "doc_id",
            F.size("lines").alias("n_lines"),
            F.filter(
                "lines",
                lambda c: ~F.array_contains(F.coalesce(F.col("bl"), empty), c),
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.size("kept")).alias("n_removed"),
            F.array_join("kept", " ").alias("cleaned"),
        )
    )


def q_line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the boilerplate line index (the
    production flow behind line_dedup): the corpus (doc_id % 10 != 0) owns
    a STANDING (line, n_docs) count table; a new round's delta docs
    (doc_id % 10 == 0) contribute their own counts, the index merges by SUM
    — counts are additive, so the merge is a map-side-combinable aggregation
    over the DELTA plus the standing table, never a corpus rescan — and the
    DELTA docs are cleaned against the UPDATED index (a header that only
    crosses the boilerplate threshold once the delta's occurrences land
    must already be stripped from the delta that pushed it over).

    Here the standing index is recomputed from the corpus split because the
    fixture has no persisted state (same convention as simhash_incremental
    / minhash_incremental); in the engine it is a snapshot table and the
    per-round cost is O(delta lines). Output: the delta docs' line_dedup
    rows."""
    chunked = _docs(spark, sf_dir).select(
        "doc_id", _planted_lines_col().alias("lines")
    )
    per_doc_lines = chunked.select(
        "doc_id", F.explode("lines").alias("line")
    )
    standing = (
        per_doc_lines.filter(F.col("doc_id") % 10 != 0)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    delta_counts = (
        per_doc_lines.filter(F.col("doc_id") % 10 == 0)
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    boiler = (
        standing.unionByName(delta_counts)
        .groupBy("line")
        .agg(F.sum("n_docs").alias("n_docs"))
        .filter(F.col("n_docs") >= _LINE_DEDUP_T)
        .agg(F.collect_list("line").alias("bl"))
    )
    return _strip_boilerplate(
        chunked.filter(F.col("doc_id") % 10 == 0), boiler
    )


O_LINE_DEDUP = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(
           CASE WHEN doc_id % 3 = 0 THEN base || ' salinan resmi diterbitkan oleh kepaniteraan mahkamah agung republik indonesia jakarta'
                ELSE base END, '\s+'), x -> x <> '') AS toks
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'putusan ini dilindungi hak cipta pengadilan negeri republik indonesia portal ' || text
                ELSE text END AS base
    FROM documents
  )
),
chunked AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0
              THEN list_transform(generate_series(0, CAST(ceil(len(toks)/10.0) AS INT) - 1),
                                  i -> array_to_string(toks[i*10+1 : i*10+10], ' '))
              ELSE CAST([] AS VARCHAR[]) END AS lines
  FROM tok
),
boiler AS (
  SELECT coalesce(list(line), CAST([] AS VARCHAR[])) AS bl
  FROM (
    SELECT line FROM (SELECT doc_id, unnest(lines) AS line FROM chunked)
    GROUP BY line HAVING count(DISTINCT doc_id) >= 3
  )
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(lines) - len(kept) AS INT) AS n_removed,
       array_to_string(kept, ' ') AS cleaned
FROM (
  SELECT doc_id, lines,
         list_filter(lines, c -> NOT list_contains(b.bl, c)) AS kept
  FROM chunked, boiler b
)
"""

# standing-corpus counts + delta counts summed == distinct-doc counts over
# the whole corpus (the splits are disjoint), so the incremental query's
# oracle is the batch oracle restricted to the delta docs — the additivity
# that MAKES the incremental maintenance correct is exactly what the shared
# boiler CTE encodes.
O_LINE_DEDUP_INCREMENTAL = (
    O_LINE_DEDUP.rstrip() + "\nWHERE doc_id % 10 = 0\n"
)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training data: count and replace emails, Indonesian
    phone numbers (+62...), and 16-digit national identity numbers (NIK —
    routinely present in the court decisions the reference crawls) with
    typed placeholders. The fixture text carries no PII, so deterministic
    specimens are planted in-query (email on doc_id % 3 == 0, phone on % 5,
    NIK on % 7) — redaction counts then vary 0-3 per doc and a regex that
    over- or under-matches fails the value hash.

    100 TB plan: MAP-ONLY — three regexp counts + a chained
    regexp_replace, all JVM codegen, no shuffle, no UDF; replacement order
    (email, then 16-digit ID, then phone) is fixed so the engines transform
    identical strings. Each count is taken on ITS stage's input (emails on
    the raw text, IDs on the email-scrubbed text, phones on the ID-scrubbed
    text), so counts always equal the placeholders that stage inserted even
    when patterns overlap (a 16-digit run inside a phone/email is consumed
    by the earlier stage, not double-counted). Patterns avoid
    lookarounds/backrefs so Java regex (Spark) and RE2 (DuckDB) agree."""
    re_email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    re_nik = "[0-9]{16}"
    re_phone = "\\+62[0-9]{6,13}"
    t = F.col("text")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            t,
            F.lit(" hubungi petugas"),
            F.col("doc_id").cast("string"),
            F.lit("@pengadilan.go.id"),
        ),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(t, F.lit(" telp +628123"), F.col("doc_id").cast("string")),
    ).otherwise(t)
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            t, F.lit(" nik "), F.lpad(F.col("doc_id").cast("string"), 16, "3")
        ),
    ).otherwise(t)
    after_email = F.regexp_replace(t, re_email, "<EMAIL>")
    after_nik = F.regexp_replace(after_email, re_nik, "<ID>")
    scrub = F.regexp_replace(after_nik, re_phone, "<PHONE>")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(re_email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(re_nik), 0)).alias(
            "n_ids"
        ),
        F.size(F.regexp_extract_all(after_nik, F.lit(re_phone), 0)).alias(
            "n_phones"
        ),
        scrub.alias("scrubbed"),
    )


O_PII_SCRUB = r"""
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN t2 || ' nik ' || lpad(CAST(doc_id AS VARCHAR), 16, '3') ELSE t2 END AS t
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN t1 || ' telp +628123' || CAST(doc_id AS VARCHAR) ELSE t1 END AS t2
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' hubungi petugas' || CAST(doc_id AS VARCHAR) || '@pengadilan.go.id' ELSE text END AS t1
      FROM documents
    )
  )
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(after_email, '[0-9]{16}')) AS INT) AS n_ids,
       CAST(len(regexp_extract_all(after_nik, '\+62[0-9]{6,13}')) AS INT) AS n_phones,
       regexp_replace(after_nik, '\+62[0-9]{6,13}', '<PHONE>', 'g') AS scrubbed
FROM (
  SELECT doc_id, t, after_email,
         regexp_replace(after_email, '[0-9]{16}', '<ID>', 'g') AS after_nik
  FROM (
    SELECT doc_id, t,
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
    FROM inj
  )
)
"""


QUERIES = {
    "exact_dup_marking": q_exact_dup_marking,
    "content_hash_stats": q_content_hash_stats,
    "page_stats": q_page_stats,
    "simhash_fingerprint": q_simhash_fingerprint,
    "simhash_near_dup": q_simhash_near_dup,
    "simhash_incremental": q_simhash_incremental,
    "minhash_incremental": q_minhash_incremental,
    "dedup_minhash_lsh": q_minhash_lsh,
    "ann_cosine_topk": q_ann_cosine_topk,
    "text_profile": q_text_profile,
    "doc_fingerprint": q_doc_fingerprint,
    "span_extract": q_span_extract,
    "multimodal_meta": q_multimodal_meta,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_lsh_topk": q_ann_lsh_topk,
    "multimodal_decode": q_multimodal_decode,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "duplicate_groups": q_duplicate_groups,
    "duplicate_groups_provenance": q_duplicate_groups_provenance,
    "duplicate_components": q_duplicate_components,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "ann_ivf_train": q_ann_ivf_train,
    "selector_extract": q_selector_extract,
    "xpath_extract": q_xpath_extract,
    "content_normalize": q_content_normalize,
    "jsonld_extract": q_jsonld_extract,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_resample": q_multimodal_resample,
    "multimodal_video_meta": q_multimodal_video_meta,
    "multimodal_audio_meta": q_multimodal_audio_meta,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_decode_bmp": q_multimodal_decode_bmp,
    "multimodal_decode_wav": q_multimodal_decode_wav,
    "multimodal_decode_png": q_multimodal_decode_png,
    "multimodal_decode_jpg": q_multimodal_decode_jpg,
    "multimodal_decode_gif": q_multimodal_decode_gif,
    "warc_ingest": q_warc_ingest,
    "decontaminate": q_decontaminate,
    "gopher_quality": q_gopher_quality,
    "stratified_split": q_stratified_split,
    "curation_pipeline": q_curation_pipeline,
    "substring_dedup": q_substring_dedup,
    "substring_dedup_incremental": q_substring_dedup_incremental,
    "line_dedup": q_line_dedup,
    "line_dedup_incremental": q_line_dedup_incremental,
    "pii_scrub": q_pii_scrub,
}

ORACLES = {
    "exact_dup_marking": O_EXACT_DUP_MARKING,
    "content_hash_stats": O_CONTENT_HASH_STATS,
    "page_stats": O_PAGE_STATS,
    "simhash_fingerprint": O_SIMHASH_FINGERPRINT,
    "simhash_near_dup": O_SIMHASH_NEAR_DUP,
    "simhash_incremental": O_SIMHASH_INCREMENTAL,
    "minhash_incremental": O_MINHASH_INCREMENTAL,
    "dedup_minhash_lsh": O_MINHASH_LSH,
    "ann_cosine_topk": O_ANN_COSINE_TOPK,
    "text_profile": O_TEXT_PROFILE,
    "doc_fingerprint": O_DOC_FINGERPRINT,
    "span_extract": O_SPAN_EXTRACT,
    "multimodal_meta": O_MULTIMODAL_META,
    "dedup_embedding_cosine": O_DEDUP_EMBEDDING_COSINE,
    "ann_lsh_topk": O_ANN_LSH_TOPK,
    "multimodal_decode": O_MULTIMODAL_DECODE,
    "dedup_ngram_jaccard": O_NGRAM_JACCARD,
    "duplicate_groups": O_DUPLICATE_GROUPS,
    "duplicate_groups_provenance": O_DUPLICATE_GROUPS_PROVENANCE,
    "duplicate_components": O_DUPLICATE_COMPONENTS,
    "ann_ivf_topk": O_ANN_IVF_TOPK,
    "ann_pq_topk": O_ANN_PQ_TOPK,
    "ann_ivfpq_topk": O_ANN_IVFPQ_TOPK,
    "ann_ivf_train": O_ANN_IVF_TRAIN,
    "selector_extract": O_SELECTOR_EXTRACT,
    "xpath_extract": O_XPATH_EXTRACT,
    "content_normalize": O_CONTENT_NORMALIZE,
    "jsonld_extract": O_JSONLD_EXTRACT,
    "multimodal_resize": O_MULTIMODAL_RESIZE,
    "multimodal_resample": O_MULTIMODAL_RESAMPLE,
    "multimodal_video_meta": O_MULTIMODAL_VIDEO_META,
    "multimodal_audio_meta": O_MULTIMODAL_AUDIO_META,
    "multimodal_frames": O_MULTIMODAL_FRAMES,
    "multimodal_decode_bmp": O_MULTIMODAL_DECODE_BMP,
    "multimodal_decode_wav": O_MULTIMODAL_DECODE_WAV,
    "multimodal_decode_png": O_MULTIMODAL_DECODE_PNG,
    "multimodal_decode_jpg": O_MULTIMODAL_DECODE_JPG,
    "multimodal_decode_gif": O_MULTIMODAL_DECODE_GIF,
    "warc_ingest": O_WARC_INGEST,
    "decontaminate": O_DECONTAMINATE,
    "gopher_quality": O_GOPHER_QUALITY,
    "stratified_split": O_STRATIFIED_SPLIT,
    "substring_dedup": O_SUBSTRING_DEDUP,
    "substring_dedup_incremental": O_SUBSTRING_DEDUP_INCREMENTAL,
    "line_dedup": O_LINE_DEDUP,
    "line_dedup_incremental": O_LINE_DEDUP_INCREMENTAL,
    "pii_scrub": O_PII_SCRUB,
    "curation_pipeline": O_CURATION_PIPELINE,
}
