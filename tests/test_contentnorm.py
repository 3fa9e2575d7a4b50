"""C2 content-normalizer goldens — case shapes mirror the reference's
test_content_normalizer.py suite (boilerplate, ads, comments, main-content
preference, timestamp families, hash stability) without copying code."""

import hashlib

from crawler_spark.kernels.contentnorm import normalize_for_hash, remove_timestamps


class TestBoilerplateRemoval:
    def test_nav_header_footer_stripped(self):
        html = """<html><body>
        <nav>Home | About</nav><header>Site Title</header>
        <p>Real content here</p>
        <footer>Copyright 2024 Corp</footer></body></html>"""
        assert normalize_for_hash(html) == "real content here"

    def test_script_style_stripped(self):
        html = "<body><script>var x=1;</script><style>p{}</style><p>Text</p></body>"
        assert normalize_for_hash(html) == "text"

    def test_comments_stripped(self):
        assert normalize_for_hash("<body><!-- hidden -->visible</body>") == "visible"


class TestAdRemoval:
    def test_ad_class_elements_removed(self):
        html = """<body><div class="ad-banner">Buy now!</div>
        <div class="sponsor-box">Sponsored</div>
        <div class="cookie-notice">We use cookies</div>
        <p>Article text</p></body>"""
        assert normalize_for_hash(html) == "article text"

    def test_ad_id_elements_removed(self):
        html = '<body><div id="popup-modal">Subscribe!</div><p>Body</p></body>'
        assert normalize_for_hash(html) == "body"

    def test_social_share_removed(self):
        html = '<body><div class="social_share">Share</div><p>Keep</p></body>'
        assert normalize_for_hash(html) == "keep"

    def test_plain_divs_kept(self):
        html = '<body><div class="story">Keep me</div></body>'
        assert normalize_for_hash(html) == "keep me"


class TestMainContentExtraction:
    def test_main_tag_preferred(self):
        html = """<body><div>Sidebar junk</div>
        <main><p>The article</p></main>
        <div>More junk</div></body>"""
        assert normalize_for_hash(html) == "the article"

    def test_article_tag_preferred(self):
        html = "<body><div>noise</div><article>Story text</article></body>"
        assert normalize_for_hash(html) == "story text"

    def test_content_div_fallback(self):
        html = '<body><div class="wrapper">x</div><div class="post-content">Real</div></body>'
        assert normalize_for_hash(html) == "real"

    def test_body_fallback(self):
        assert normalize_for_hash("<body><span>All of it</span></body>") == "all of it"


class TestTimestampRemoval:
    def test_iso_datetime(self):
        assert "2024" not in remove_timestamps("Posted 2024-01-15T14:30:00Z here")

    def test_iso_date(self):
        assert remove_timestamps("on 2024/01/15 we met").strip() == "on  we met".strip()

    def test_bare_time(self):
        assert "14:30" not in remove_timestamps("at 14:30:05 sharp")

    def test_month_name_date(self):
        assert "January" not in remove_timestamps("January 15, 2024 report")

    def test_relative_ago(self):
        assert "ago" not in remove_timestamps("posted 2 hours ago")

    def test_view_counts(self):
        out = remove_timestamps("1.2K views and 500 likes and sold 500 shares")
        assert "views" not in out and "likes" not in out
        assert "500 shares" in out  # business text preserved

    def test_updated_relative_word(self):
        assert "yesterday" not in remove_timestamps("Updated yesterday by admin")


class TestHashStability:
    def test_dynamic_chrome_does_not_change_hash(self):
        """Same article, different ads/timestamps/nav -> identical hash."""
        core = "<main><h1>Putusan 42</h1><p>Isi putusan tetap sama.</p></main>"
        v1 = f'<body><nav>v1 nav</nav>{core}<footer>14:30</footer></body>'
        v2 = (
            '<body><div class="ad-banner">NEW AD</div>'
            f"{core}"
            "<div class=\"cookie-consent\">accept?</div></body>"
        )
        h1 = hashlib.sha256(normalize_for_hash(v1).encode()).hexdigest()
        h2 = hashlib.sha256(normalize_for_hash(v2).encode()).hexdigest()
        assert h1 == h2

    def test_case_and_whitespace_insensitive(self):
        a = normalize_for_hash("<body><p>Satu   Dua\n\nTiga</p></body>")
        b = normalize_for_hash("<body><p>satu dua tiga</p></body>")
        assert a == b

    def test_empty_and_none(self):
        assert normalize_for_hash("") == ""
        assert normalize_for_hash(None) == ""
        assert normalize_for_hash(b"<body><p>bytes ok</p></body>") == "bytes ok"

    def test_malformed_html_tolerated(self):
        assert "broken" in normalize_for_hash("<body><p>broken<div></p></body")
