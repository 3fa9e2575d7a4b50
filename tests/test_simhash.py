"""Golden + property tests for the simhash kernel (C3-C6).

Fingerprint goldens minted from the reference simhash implementation
(/root/reference/crawler/utils/simhash.py) by direct execution.
"""

from __future__ import annotations

import pytest

from crawler_spark.kernels.simhash import (
    bands,
    from_signed64,
    hamming,
    similarity_pct,
    simhash64,
    simhash64_signed,
    to_signed64,
    tokenize,
)

GOLDENS = {
    "The quick brown fox jumps over the lazy dog": 3279303472042380063,
    "The quick brown fox jumps over a lazy dog": 3279233653056375355,
    "Peraturan Pemerintah Republik Indonesia Nomor 12 Tahun 2021": 735952415407866384,
    "a": 3585878926028121697,
    "Hello, World! Hello... world?": 1243275522156529026,
    "tok1 tok2 tok3 tok1": 5784222811388379681,
}


@pytest.mark.parametrize("text,fp", list(GOLDENS.items()))
def test_fingerprint_golden(text, fp):
    assert simhash64(text) == fp


def test_distance_and_similarity_golden():
    a = simhash64("The quick brown fox jumps over the lazy dog")
    b = simhash64("The quick brown fox jumps over a lazy dog")
    assert hamming(a, b) == 7
    assert similarity_pct(a, b) == pytest.approx(89.0625)


def test_tokenize_matches_reference_semantics():
    assert tokenize("Hello, World! it's 42 äöü-test") == [
        "hello", "world", "it", "s", "42", "äöü", "test",
    ]


def test_order_invariance():
    # bag-of-words: token order does not change the fingerprint
    assert simhash64("alpha beta gamma") == simhash64("gamma alpha beta")


def test_multiset_sensitivity():
    # repeated tokens vote more than once
    assert simhash64("tok1 tok2 tok3 tok1") != simhash64("tok1 tok2 tok3")


def test_empty_returns_none():
    assert simhash64("") is None
    assert simhash64("   ") is None
    assert simhash64("!!! ...") is None  # punctuation-only -> no tokens


def test_signed_roundtrip():
    for u in [0, 1, (1 << 63) - 1, 1 << 63, (1 << 64) - 1, 9223372036854775808]:
        assert from_signed64(to_signed64(u)) == u
    assert to_signed64((1 << 64) - 1) == -1
    assert to_signed64(1 << 63) == -9223372036854775808
    assert simhash64_signed("a") == to_signed64(3585878926028121697)


def test_band_pigeonhole():
    # if hamming(a,b) <= 3, at least one of the 4 16-bit bands is identical
    a = GOLDENS["The quick brown fox jumps over the lazy dog"]
    for flip in [(0,), (1, 17), (2, 30, 63)]:
        b = a
        for bit in flip:
            b ^= 1 << bit
        assert hamming(a, b) == len(flip)
        shared = set(enumerate(bands(a))) & set(enumerate(bands(b)))
        assert shared, f"no shared band at distance {len(flip)}"


def test_incremental_near_dup_invariant(spark):
    """The index-maintenance contract: incremental(corpus, delta) emits
    exactly the pairs full(corpus UNION delta) adds over full(corpus) —
    corpus-delta probes and within-delta pairs, never corpus-corpus ones."""
    from crawler_spark.operators.dedup import (
        simhash_incremental_near_dup,
        simhash_near_dup_join,
    )

    base = 0x0123456789ABCDEF
    corpus_rows = [(1, base), (2, base ^ 0b11), (3, base ^ (0xFF << 40))]
    # delta: near-dup of corpus doc 1 (d=1), far from everything (d=8 spread
    # over all bands), exact copy of corpus doc 3, and a within-delta pair
    delta_rows = [
        (10, base ^ 0b100),
        (11, base ^ 0x0101010101010101),
        (12, base ^ (0xFF << 40)),
        (13, base ^ (0xFF << 40) ^ 0b1),
    ]
    corpus = spark.createDataFrame(corpus_rows, "id long, simhash long")
    delta = spark.createDataFrame(delta_rows, "id long, simhash long")
    inc = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in simhash_incremental_near_dup(corpus, delta).collect()
    }
    full_union = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in simhash_near_dup_join(corpus.unionByName(delta)).collect()
    }
    full_corpus = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in simhash_near_dup_join(corpus).collect()
    }
    assert inc == full_union - full_corpus
    # sanity on the fixture: at least one probe pair, one exact copy,
    # and one within-delta pair actually exercised
    assert (1, 10, 1) in inc and (3, 12, 0) in inc and (12, 13, 1) in inc
    assert all(a >= 10 or b >= 10 for a, b, _ in inc)


def test_minhash_incremental_invariant(spark):
    """MinHash sibling of the simhash index-maintenance contract:
    incremental(corpus, delta) emits exactly the candidate pairs
    full-LSH(corpus UNION delta) adds over full-LSH(corpus) — corpus-delta
    band probes and within-delta bucket pairs, never corpus-corpus ones."""
    from crawler_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signature,
    )

    t = "putusan pengadilan negeri nomor satu dua tiga tentang perkara perdata"
    corpus_rows = [
        (1, t),
        (2, t + " tambahan"),
        (3, "dokumen lain yang sama sekali berbeda isinya dari semua naskah"),
    ]
    delta_rows = [
        (10, t),  # exact copy of corpus doc 1
        (11, t + " salinan"),  # near corpus + near delta 10
        (12, "teks unik ketiga belas tanpa pasangan dalam korpus manapun x"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "id long, text string")
    delta = spark.createDataFrame(delta_rows, "id long, text string")
    c_sigs = minhash_signature(corpus, "id", "text")
    d_sigs = minhash_signature(delta, "id", "text")
    inc = {
        (r["id_a"], r["id_b"])
        for r in minhash_incremental_pairs(c_sigs, d_sigs).collect()
    }
    both = minhash_signature(corpus.unionByName(delta), "id", "text")
    full_union = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(both).collect()}
    full_corpus = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(c_sigs).collect()}
    assert inc == full_union - full_corpus
    # fixture exercises a probe pair and a within-delta pair; no corpus-only
    assert (1, 10) in inc and (10, 11) in inc
    assert all(b >= 10 for _a, b in inc)


def test_connected_components_multi_hop(spark):
    """A 4-node path graph needs 3 propagation hops — catches a closure that
    stops after one round; isolated node keeps its own label."""
    from crawler_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,), (6,), (9,)],
                                  "id long")
    got = {r["id"]: r["component_id"]
           for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 9: 9}


def test_connected_components_nonconvergence_raises(spark):
    from crawler_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_a long, id_b long")
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_kmeans_recovers_separated_clusters(spark):
    """kmeans_fit on three orthogonal-direction blobs: the trained centroids
    partition the points exactly by blob, sizes match, and every centroid
    points in its blob's direction (cosine > 0.99). Deterministic — no RNG."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import ivf_assign, kmeans_fit

    rows = []
    for blob, axis in enumerate([0, 3, 6]):
        for j in range(20):
            v = [0.0] * 9
            v[axis] = 10.0
            v[(axis + 1) % 9] = 0.1 * (j % 5)  # small within-blob jitter
            # ids interleave blobs so the deterministic lowest-k init spans
            # all three (all-one-blob init can't split — Lloyd's is local)
            rows.append((j * 10 + blob, v))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids, sizes = kmeans_fit(corpus, k=3, n_iter=3)
    got_sizes = sorted(r["n_members"] for r in sizes.collect())
    assert got_sizes == [20, 20, 20]
    assigned = ivf_assign(corpus, centroids)
    # every blob maps to exactly one centroid and vice versa
    pairs = {
        (r["vec_id"] % 10, r["centroid_id"]) for r in assigned.collect()
    }
    assert len(pairs) == 3
    assert len({c for _, c in pairs}) == 3
    # the three centroids' dominant dimensions are exactly the blob axes
    argmaxes = {
        r["embedding"].index(max(r["embedding"])) for r in centroids.collect()
    }
    assert argmaxes == {0, 3, 6}


class TestIncrementalInvariantRandomized:
    """Hypothesis-randomized form of the index-maintenance contract: for ANY
    corpus/delta split of ANY fingerprint multiset (planted near-dups plus
    noise, empty sides included), incremental(corpus, delta) ==
    full(corpus UNION delta) - full(corpus). The fixed-fixture tests above
    pin known shapes; this sweeps the split boundary and distance spectrum."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def _fp_split(draw):
        st_ = TestIncrementalInvariantRandomized.st
        bases = draw(st_.lists(
            st_.integers(0, 2**64 - 1), min_size=1, max_size=4))
        rows = []
        for b in bases:
            rows.append(b)
            for _ in range(draw(st_.integers(0, 2))):
                mask = 0
                for bit in draw(st_.lists(st_.integers(0, 63), max_size=5)):
                    mask |= 1 << bit
                rows.append(b ^ mask)
        # full unsigned-64 spectrum, stored as the signed longs the engine
        # uses (simhash64_signed)
        rows = [(i, to_signed64(fp)) for i, fp in enumerate(rows)]
        cut = draw(st_.integers(0, len(rows)))
        return rows[:cut], rows[cut:]

    @given(split=_fp_split())
    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_simhash_incremental_matches_full_diff(self, spark, split):
        from crawler_spark.operators.dedup import (
            simhash_incremental_near_dup,
            simhash_near_dup_join,
        )

        corpus_rows, delta_rows = split
        schema = "id long, simhash long"
        corpus = spark.createDataFrame(corpus_rows, schema)
        delta = spark.createDataFrame(delta_rows, schema)
        inc = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in simhash_incremental_near_dup(corpus, delta).collect()
        }
        full_union = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in simhash_near_dup_join(corpus.unionByName(delta)).collect()
        }
        full_corpus = {
            (r["id_a"], r["id_b"], r["distance"])
            for r in simhash_near_dup_join(corpus).collect()
        }
        assert inc == full_union - full_corpus

    @st.composite
    def _text_split(draw):
        st_ = TestIncrementalInvariantRandomized.st
        vocab = ["putusan", "nomor", "tahun", "perkara", "pasal", "hakim"]
        docs = draw(st_.lists(
            st_.lists(st_.sampled_from(vocab), min_size=3, max_size=8),
            min_size=1, max_size=6,
        ))
        rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
        cut = draw(st_.integers(0, len(rows)))
        return rows[:cut], rows[cut:]

    @given(split=_text_split())
    @settings(max_examples=3, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_minhash_incremental_matches_full_diff(self, spark, split):
        """Tiny shared vocabulary forces shingle collisions, so random docs
        land in shared LSH buckets across arbitrary corpus/delta splits."""
        from crawler_spark.operators.dedup import (
            minhash_incremental_pairs,
            minhash_lsh_pairs,
            minhash_signature,
        )

        corpus_rows, delta_rows = split
        schema = "id long, text string"
        corpus = spark.createDataFrame(corpus_rows, schema)
        delta = spark.createDataFrame(delta_rows, schema)
        c_sigs = minhash_signature(corpus, "id", "text")
        d_sigs = minhash_signature(delta, "id", "text")
        inc = {
            (r["id_a"], r["id_b"])
            for r in minhash_incremental_pairs(c_sigs, d_sigs).collect()
        }
        both = minhash_signature(corpus.unionByName(delta), "id", "text")
        full_union = {
            (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(both).collect()
        }
        full_corpus = {
            (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(c_sigs).collect()
        }
        assert inc == full_union - full_corpus


def test_minhash_components_are_independent_permutations(spark):
    """Review regression: with small multipliers the k 'permutations' never
    wrapped their modulus, so every component tracked the SAME min shingle
    and two signatures agreed on all 16 components or none. Proper universal
    hashing must give partial agreement on partially-overlapping docs, and
    different components must pick different argmin shingles."""
    from crawler_spark.operators.dedup import minhash_signature

    shared = " ".join(f"kata{i} umum{i} bersama{i}" for i in range(12))
    a_only = " ".join(f"alpha{i} satu{i} unik{i}" for i in range(12))
    b_only = " ".join(f"beta{i} dua{i} lain{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, f"{shared} {a_only}"), (2, f"{shared} {b_only}")],
        "id long, text string",
    )
    sig = {r["id"]: [r[f"mh_{i}"] for i in range(16)]
           for r in minhash_signature(docs, "id", "text").collect()}
    agree = sum(x == y for x, y in zip(sig[1], sig[2]))
    # J ~ 0.5 -> expected agreement ~8/16; 0 and 16 each have p ~ 2^-16
    # under independent permutations but were CERTAIN outcomes before
    assert 0 < agree < 16, f"degenerate signature: {agree}/16 components"
    # and within one doc, the 16 mins must not all be transforms of one
    # shingle: their ranks over the shingle set must differ, which shows
    # as non-constant pairwise ordering across docs
    diffs = {x - y for x, y in zip(sig[1], sig[2])}
    assert len(diffs) > 1
