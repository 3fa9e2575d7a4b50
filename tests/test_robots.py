"""Golden tests for the robots.txt kernel (RFC 9309 semantics).

No reference analogue (the reference has no robots handling — SURVEY.md
header); cases derived from RFC 9309 §2.2/§5 examples and the Google
robots.txt spec's published longest-match examples.
"""

from crawler_spark.kernels.robots import crawl_delay, is_allowed, parse_robots

BASIC = """
User-agent: *
Disallow: /private/
Allow: /private/open/
Crawl-delay: 2.5

User-agent: lexi-spark
Disallow: /tenders/
Crawl-delay: 0.5
"""


def test_group_selection_specific_over_star():
    assert not is_allowed(BASIC, "lexi-spark", "/tenders/1")
    # the specific group replaces '*' entirely: /private/ is NOT disallowed for lexi-spark
    assert is_allowed(BASIC, "lexi-spark", "/private/x")
    assert not is_allowed(BASIC, "otherbot", "/private/x")


def test_longest_match_allow_wins():
    assert is_allowed(BASIC, "otherbot", "/private/open/doc.pdf")
    assert not is_allowed(BASIC, "otherbot", "/private/closed")


def test_crawl_delay_per_group():
    assert crawl_delay(BASIC, "lexi-spark") == 0.5
    assert crawl_delay(BASIC, "anything") == 2.5


def test_wildcard_and_anchor():
    txt = """
User-agent: *
Disallow: /*.pdf$
Disallow: /search*
Allow: /searchable
"""
    assert not is_allowed(txt, "x", "/files/a.pdf")
    assert is_allowed(txt, "x", "/files/a.pdf?x=1")  # $ anchors the end
    assert not is_allowed(txt, "x", "/search?q=1")
    # /searchable matches both; Allow pattern is longer -> wins
    assert is_allowed(txt, "x", "/searchable")


def test_empty_disallow_allows_all():
    txt = "User-agent: *\nDisallow:\n"
    assert is_allowed(txt, "x", "/anything")


def test_no_matching_group_allows():
    txt = "User-agent: googlebot\nDisallow: /\n"
    assert is_allowed(txt, "lexi-spark", "/x")
    assert not is_allowed(txt, "googlebot", "/x")


def test_consecutive_ua_lines_share_group():
    txt = """
User-agent: a
User-agent: b
Disallow: /x/
"""
    assert not is_allowed(txt, "a", "/x/1")
    assert not is_allowed(txt, "b", "/x/1")


def test_tie_allow_wins_same_length():
    txt = """
User-agent: *
Allow: /page
Disallow: /page
"""
    assert is_allowed(txt, "x", "/page")


def test_root_disallow():
    txt = "User-agent: *\nDisallow: /\n"
    assert not is_allowed(txt, "x", "/")
    assert not is_allowed(txt, "x", "/a/b")


def test_parse_ignores_comments_and_garbage():
    txt = """
# header comment
User-agent: *   # trailing
Disallow: /a  # keep /a only
not-a-directive
Crawl-delay: abc
"""
    pol = parse_robots(txt)
    assert pol.groups[0].rules == [("/a", False)]
    assert pol.groups[0].crawl_delay is None


def test_spark_robots_filter(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.robots_udfs import apply_robots_filter, url_path_col

    robots = {
        "a.go.id": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
        "b.go.id": "User-agent: *\nDisallow: /\n",
        # c.go.id: no robots.txt -> allow all
    }
    rows = [
        ("a.go.id", "https://a.go.id/public/1"),
        ("a.go.id", "https://a.go.id/private/1"),
        ("b.go.id", "https://b.go.id/x"),
        ("c.go.id", "https://c.go.id/y"),
        ("c.go.id", "https://c.go.id"),
    ]
    df = spark.createDataFrame(rows, "host string, url string").withColumn(
        "path", url_path_col(F.col("url"))
    )
    out = apply_robots_filter(df, robots).select("host", "path", "crawl_delay_s").collect()
    got = {(r.host, r.path): r.crawl_delay_s for r in out}
    assert got == {
        ("a.go.id", "/public/1"): 2.0,
        ("c.go.id", "/y"): None,
        ("c.go.id", "/"): None,
    }


def test_multiple_matching_groups_combine():
    # RFC 9309 §2.2.1: two '*' groups act as one combined rule set
    txt = """
User-agent: *
Disallow: /a

User-agent: *
Disallow: /b
"""
    assert not is_allowed(txt, "bot", "/a")
    assert not is_allowed(txt, "bot", "/b")
    assert is_allowed(txt, "bot", "/c")


def test_prefix_match_not_substring():
    # a longer token for a DIFFERENT crawler must not beat an exact match
    txt = """
User-agent: bot
Disallow: /mine

User-agent: botsearch-extended
Disallow: /theirs
"""
    assert not is_allowed(txt, "bot/1.0", "/mine")
    assert is_allowed(txt, "bot/1.0", "/theirs")  # not our group
    assert not is_allowed(txt, "botsearch-extended", "/theirs")
    # and an empty UA matches no named token (falls through to none here)
    assert is_allowed(txt, "", "/mine")


def test_unknown_directives_do_not_split_groups():
    # RFC 9309 §2.2.4: Sitemap between UA lines must not interfere —
    # both agents share the one group and its Disallow
    txt = """
User-agent: googlebot
Sitemap: https://x.go.id/sitemap.xml
User-agent: otherbot
Disallow: /
"""
    assert not is_allowed(txt, "googlebot", "/x")
    assert not is_allowed(txt, "otherbot", "/x")


def test_crawl_delay_combined_groups_first_wins():
    txt = """
User-agent: *
Disallow: /a

User-agent: *
Crawl-delay: 3
"""
    assert crawl_delay(txt, "any") == 3.0
    assert not is_allowed(txt, "any", "/a")
