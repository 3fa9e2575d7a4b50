"""Tests for the text-analysis kernels and the HTML->spans parser."""

from __future__ import annotations

from crawler_spark.kernels.htmlparse import extract_page, normalize_text
from crawler_spark.kernels.textstats import (
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    token_count_bpe,
    token_count_ws,
    word_shingles,
)


def test_token_counts():
    assert token_count_ws("satu dua  tiga") == 3
    assert token_count_ws("") == 0
    assert token_count_bpe("don't stop99!") == 6  # don ' t stop 99 !
    assert token_count_bpe("") == 0


def test_punct_ratio():
    assert punct_ratio("") == 0.0
    assert punct_ratio("abcd") == 0.0
    assert punct_ratio("a!b!") == 0.5


def test_lang_id():
    assert lang_id("peraturan ini adalah undang undang yang berlaku di indonesia") == "id"
    assert lang_id("the court issued a ruling that is binding on the parties") == "en"
    assert lang_id("lorem ipsum dolor sit amet") == "und"


def test_quality_score_bounds_and_determinism():
    texts = ["", "x", "yang dan di " * 100, "!!!???" * 50]
    for t in texts:
        s = quality_score(t)
        assert 0.0 <= s <= 1.0
        assert s == quality_score(t)


def test_doc_fingerprint():
    assert doc_fingerprint("a b c") == doc_fingerprint("a b c")
    assert doc_fingerprint("a b c") != doc_fingerprint("c b a")  # order-sensitive
    assert doc_fingerprint("") == 0
    assert 0 <= doc_fingerprint("x " * 200) < 2147483647


def test_word_shingles():
    assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
    assert word_shingles("a b", 3) == []
    assert word_shingles("a b a b a b", 2) == ["a b", "b a"]  # distinct, first-seen order


FIXTURE_HTML = """
<html><head><title>Putusan 123</title><script>var x=1;</script></head>
<body>
<nav><a href="/skip-me">nav link</a></nav>
<h1>Putusan Nomor 123</h1>
<p>Paragraf pertama tentang peraturan.</p>
<div class="doc"><a class="download-pdf" href="/files/putusan-123.pdf">Unduh PDF</a></div>
<p>Paragraf kedua.</p>
<img src="/img/logo.png">
<a href="/detail/456">Detail berikutnya</a>
<footer><p>boilerplate footer</p></footer>
</body></html>
"""


def test_extract_page_spans_in_dom_order():
    page = extract_page(FIXTURE_HTML)
    assert page["title"] == "Putusan 123"
    assert page["spans"] == [
        ("text", "Putusan 123", None, 0),
        ("text", "Putusan Nomor 123", None, 1),
        ("text", "Paragraf pertama tentang peraturan.", None, 2),
        ("media", None, "/files/putusan-123.pdf", 3),
        ("text", "Paragraf kedua.", None, 4),
        ("media", None, "/img/logo.png", 5),
    ]
    # links: nav/footer are skipped; media + plain anchors both captured;
    # preview = innermost container's full text (X6), None outside containers
    assert page["links"] == [
        ("/files/putusan-123.pdf", "Unduh PDF", "Unduh PDF", 0),
        ("/detail/456", "Detail berikutnya", None, 1),
    ]


def test_extract_media_by_extension():
    page = extract_page('<p>x</p><a href="/d/file.PDF?v=1">doc</a>')
    assert ("media", None, "/d/file.PDF?v=1", 1) in page["spans"]


def test_extract_malformed_html_no_crash():
    page = extract_page("<p>ok<p></div></a><a href=")
    assert isinstance(page["spans"], list)


def test_normalize_text():
    out = normalize_text(FIXTURE_HTML)
    assert "var x=1" not in out           # script stripped
    assert "boilerplate footer" not in out  # footer stripped
    assert "putusan nomor 123" in out
    assert "  " not in out
    assert out == out.lower()


def test_normalize_text_empty():
    assert normalize_text("") == ""
    assert normalize_text(None) == ""


class TestKernelSparkParityEdges:
    """Review regressions: the Spark column expressions must match the
    Python kernel spec on NULL text and Unicode whitespace (NBSP is
    everywhere in real web text; Java's default \\s is ASCII-only)."""

    def test_null_text_quality_matches_kernel(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import quality_score_col
        from crawler_spark.kernels.textstats import quality_score

        df = spark.createDataFrame([(1, None)], "id long, text string")
        got = df.select(quality_score_col(F.col("text")).alias("q")).head()["q"]
        assert got == quality_score(None) == 0.2

    def test_nbsp_tokens_match_kernel(self, spark):
        from pyspark.sql import functions as F

        from crawler_spark.functions.text import (
            punct_ratio_col, token_count_ws_col,
        )
        from crawler_spark.kernels.textstats import punct_ratio, token_count_ws

        s = "yang\u00a0dan\u2003di akhir"  # NBSP + EM-space + ASCII space
        df = spark.createDataFrame([(1, s)], "id long, text string")
        row = df.select(
            token_count_ws_col(F.col("text")).alias("n"),
            punct_ratio_col(F.col("text")).alias("p"),
        ).head()
        assert row["n"] == token_count_ws(s) == 4
        assert punct_ratio(s) == 0.0 and abs(row["p"]) < 1e-12
