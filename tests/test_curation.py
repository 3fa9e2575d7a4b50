"""Internal-consistency properties of the curation queries that the
cross-engine oracle CANNOT catch (both engines would agree on a shared
defect): pii_scrub's counts must equal the placeholders actually inserted,
line_dedup's removals must hit exactly the planted boilerplate."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

HDR = (
    "putusan ini dilindungi hak cipta pengadilan negeri republik"
    " indonesia portal"
)


def test_pii_counts_equal_inserted_placeholders(spark):
    from crawler_spark.queries_content import q_pii_scrub

    rows = q_pii_scrub(spark, SF).collect()
    assert len(rows) > 0
    assert sum(r.n_emails for r in rows) > 0
    assert sum(r.n_ids for r in rows) > 0
    assert sum(r.n_phones for r in rows) > 0
    for r in rows:
        # stage-sequential counting: each count is taken on its stage's
        # input, so it equals that stage's insertions even when patterns
        # overlap (a 16-digit run inside an email/phone is consumed by the
        # earlier stage, never double-counted)
        assert r.scrubbed.count("<EMAIL>") == r.n_emails, r.doc_id
        assert r.scrubbed.count("<ID>") == r.n_ids, r.doc_id
        assert r.scrubbed.count("<PHONE>") == r.n_phones, r.doc_id


def test_line_dedup_removes_exactly_the_boilerplate(spark):
    from crawler_spark.queries_content import q_line_dedup

    rows = {r.doc_id: r for r in q_line_dedup(spark, SF).collect()}
    assert len(rows) > 0
    removed_total = sum(r.n_removed for r in rows.values())
    assert removed_total > 0
    for doc_id, r in rows.items():
        # the planted 10-token header chunk-aligns on every even doc and
        # appears in ~half the corpus -> always above threshold, always gone
        assert HDR not in r.cleaned
        if doc_id % 2 == 0:
            assert r.n_removed >= 1, doc_id
        # removal never exceeds the line count and cleaned shrinks with it
        assert 0 <= r.n_removed <= r.n_lines


def test_duplicated_window_stats_exact(spark):
    """Known tiny corpus, k=3: window multiset semantics (within-doc
    repetition counts), cross-doc duplication, zero-window short docs."""
    from crawler_spark.operators.dedup import duplicated_window_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c"),     # windows: abc bcd cda dab abc -> abc x2
            (2, "a b c x y"),         # abc (dup w/ doc1), bcx, cxy
            (3, "q r"),               # < k tokens -> zero windows
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in duplicated_window_stats(docs, k=3).collect()}
    assert (got[1].n_windows, got[1].n_dup_windows) == (5, 2)  # both "a b c"
    assert got[1].dup_frac == 0.4
    assert (got[2].n_windows, got[2].n_dup_windows) == (3, 1)
    assert (got[3].n_windows, got[3].n_dup_windows, got[3].dup_frac) == (0, 0, 0.0)
