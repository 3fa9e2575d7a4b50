"""Product-quantization ANN unit gates (operators/similarity.py pq_*).

The oracle parity test proves cross-engine determinism; these pin the
SEMANTIC properties — code-domain compression shape, encode totality, and
that the compressed scan actually approximates the exact ranking (recall vs
brute force), which no equality oracle can express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk,
    pq_fit_encode,
)

SF = "/root/testdata/sf0.001"
DIM, M, KSUB = 64, 4, 8


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def fitted(embs):
    return pq_fit_encode(embs, dim=DIM, m=M, ksub=KSUB)


class TestPQEncode:
    def test_codebook_shape(self, fitted):
        codebooks, _ = fitted
        rows = codebooks.collect()
        # one Lloyd pass can only lose codewords (empty clusters), never add
        assert 0 < len(rows) <= M * KSUB
        assert {r.sub_idx for r in rows} == set(range(M))
        for r in rows:
            assert 0 <= r.code < KSUB
            assert len(r.cv) == DIM // M

    def test_every_vector_encoded_exactly_once_per_subspace(self, embs, fitted):
        _, codes = fitted
        n = embs.count()
        assert codes.count() == n * M
        bad = codes.groupBy("vec_id").count().filter(F.col("count") != M)
        assert bad.count() == 0

    def test_codes_in_range(self, fitted):
        _, codes = fitted
        assert codes.filter((F.col("code") < 0) | (F.col("code") >= KSUB)).count() == 0

    def test_compression_is_code_domain(self, fitted):
        """The encode output carries NO raw vector column — the scan side of
        PQ must be able to run from (id, sub_idx, code) alone."""
        _, codes = fitted
        assert set(codes.columns) == {"vec_id", "sub_idx", "code"}


class TestPQRecall:
    def test_adc_top3_recall_vs_brute_force(self, embs):
        """The compressed scan must rank like the exact scan. The fixture
        embeddings are near-uniform — the worst case for any quantizer
        (neighbors are nearly equidistant, so a 32-byte code can't fully
        order them) — so the bar is calibrated against chance, not
        perfection: random top-3 overlap is 3/500 = 0.006; measured PQ-ADC
        overlap on this fixture is ~0.46. Assert >= 0.25 (40x chance) so a
        broken LUT/encode fails loudly while quantization noise doesn't."""
        queries = embs.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = brute_force_topk(embs, queries, k=3)
        approx = pq_adc_topk(embs, queries, dim=DIM, m=M, ksub=KSUB, k=3)
        ex = {}
        for r in exact.collect():
            ex.setdefault(r.query_id, set()).add(r.vec_id)
        ap = {}
        for r in approx.collect():
            ap.setdefault(r.query_id, set()).add(r.vec_id)
        assert set(ex) == set(ap)
        overlaps = [len(ex[q] & ap[q]) / 3.0 for q in ex]
        assert sum(overlaps) / len(overlaps) >= 0.25, overlaps

    def test_ivfpq_equals_adc_restricted_to_probed_lists(self, embs):
        """IVF-PQ must be EXACTLY pq_adc_topk computed over the union of the
        query's probed lists — pruning changes which codes are scanned,
        never how they score. Replays the probe set independently and
        compares scores per (query, vec)."""
        from crawler_spark.operators.similarity import ivf_assign, ivfpq_topk

        centroids = embs.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        queries = embs.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = {
            (r.query_id, r.vec_id): r.cosine
            for r in ivfpq_topk(
                embs, queries, centroids, dim=DIM, m=M, ksub=KSUB, k=3, nprobe=2
            ).collect()
        }
        # independent recomputation: full ADC scores + probe membership
        lists = {
            r.vec_id: r.centroid_id
            for r in ivf_assign(embs, centroids).select("vec_id", "centroid_id").collect()
        }
        probes = {}
        qassign = ivf_assign(
            queries.select(F.col("query_id").alias("vec_id"), "embedding"),
            centroids,
        )
        # nprobe=2: take the two best lists per query the same way the op does
        from crawler_spark.functions.vectors import cosine_col
        from pyspark.sql import Window

        cq = centroids.select("centroid_id", F.col("embedding").alias("cv"))
        qs = queries.crossJoin(F.broadcast(cq)).withColumn(
            "sim", F.round(cosine_col(F.col("embedding"), F.col("cv")), 4)
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("centroid_id").asc()
        )
        for r in (
            qs.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= 2)
            .select("query_id", "centroid_id")
            .collect()
        ):
            probes.setdefault(r.query_id, set()).add(r.centroid_id)
        full = pq_adc_topk(embs, queries, dim=DIM, m=M, ksub=KSUB, k=len(lists))
        want = {}
        for r in full.collect():
            if lists[r.vec_id] in probes[r.query_id]:
                want.setdefault(r.query_id, []).append((r.cosine, r.vec_id))
        expect = {}
        for qid, scored in want.items():
            for cos, vid in sorted(scored, key=lambda t: (-t[0], t[1]))[:3]:
                expect[(qid, vid)] = cos
        assert got == expect

    def test_self_is_top1(self, embs):
        """A query that IS a corpus vector must retrieve itself first — its
        codes reconstruct to the nearest cell by construction."""
        queries = embs.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        approx = pq_adc_topk(embs, queries, dim=DIM, m=M, ksub=KSUB, k=1)
        for r in approx.collect():
            assert r.vec_id == r.query_id, (r.query_id, r.vec_id)
