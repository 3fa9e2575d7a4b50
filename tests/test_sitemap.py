"""Sitemap kernel goldens + the new crawl-tier queries' plan shapes.

Oracle parity for crawl_traps / host_circuit_breaker / sitemap_expand /
conditional_recrawl rides the shared harness (tests/test_oracle_parity.py);
this file pins the kernel semantics the oracle cannot see (the oracle
regenerates entries constructively — it never parses XML) and the plan
shapes that make the queries scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.kernels.sitemap import (
    parse_sitemap,
    sitemap_priority_to_frontier,
    sitemap_urls,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


class TestSitemapDiscovery:
    def test_robots_sitemap_lines_global_and_case_insensitive(self):
        txt = (
            "User-agent: a\nDisallow: /x\n"
            "Sitemap: https://h/s1.xml\n"
            "User-agent: b\n"
            "sitemap: https://h/s2.xml\n"  # inside another group: still global
            "SITEMAP:https://h/s3.xml\n"
        )
        assert sitemap_urls(txt) == [
            "https://h/s1.xml", "https://h/s2.xml", "https://h/s3.xml",
        ]

    def test_comments_blanks_and_empty_values_skipped(self):
        txt = "# Sitemap: https://h/no.xml\n\nSitemap:\nSitemap: https://h/a.xml # trail\n"
        assert sitemap_urls(txt) == ["https://h/a.xml"]

    def test_duplicates_kept_in_file_order(self):
        txt = "Sitemap: https://h/a.xml\nSitemap: https://h/a.xml\n"
        assert sitemap_urls(txt) == ["https://h/a.xml", "https://h/a.xml"]


class TestSitemapParse:
    def test_urlset_namespaced_full_fields(self):
        xml = (
            f'<?xml version="1.0"?><urlset {NS}>'
            "<url><loc>https://h/a</loc><lastmod>2025-01-01</lastmod>"
            "<changefreq>daily</changefreq><priority>0.8</priority></url>"
            "<url><loc>https://h/b</loc></url></urlset>"
        )
        es = parse_sitemap(xml)
        assert [(e.kind, e.loc, e.lastmod, e.changefreq, e.priority) for e in es] == [
            ("url", "https://h/a", "2025-01-01", "daily", 0.8),
            ("url", "https://h/b", None, None, 0.5),
        ]

    def test_urlset_without_namespace(self):
        es = parse_sitemap("<urlset><url><loc>https://h/a</loc></url></urlset>")
        assert [e.loc for e in es] == ["https://h/a"]

    def test_sitemapindex_children(self):
        xml = (
            f"<sitemapindex {NS}><sitemap><loc>https://h/p1.xml</loc>"
            "<lastmod>2025-02-01</lastmod></sitemap>"
            "<sitemap><loc>https://h/p2.xml</loc></sitemap></sitemapindex>"
        )
        es = parse_sitemap(xml)
        assert [(e.kind, e.loc, e.lastmod) for e in es] == [
            ("sitemap", "https://h/p1.xml", "2025-02-01"),
            ("sitemap", "https://h/p2.xml", None),
        ]

    def test_locless_entry_dropped_order_preserved(self):
        xml = (
            "<urlset><url><loc>https://h/1</loc></url>"
            "<url><priority>0.9</priority></url>"
            "<url><loc>https://h/2</loc></url></urlset>"
        )
        assert [e.loc for e in parse_sitemap(xml)] == ["https://h/1", "https://h/2"]

    def test_priority_out_of_range_or_junk_defaults(self):
        xml = (
            "<urlset><url><loc>a</loc><priority>9.9</priority></url>"
            "<url><loc>b</loc><priority>-1</priority></url>"
            "<url><loc>c</loc><priority>high</priority></url>"
            "<url><loc>d</loc><priority> 0.3 </priority></url></urlset>"
        )
        assert [e.priority for e in parse_sitemap(xml)] == [0.5, 0.5, 0.5, 0.3]

    def test_malformed_and_foreign_roots_yield_empty(self):
        assert parse_sitemap("<urlset><url>") == []
        assert parse_sitemap("") == []
        assert parse_sitemap("<rss><channel/></rss>") == []

    def test_unknown_child_tags_ignored(self):
        xml = (
            "<urlset><totally-new/><url><loc>https://h/a</loc>"
            "<image>x</image></url></urlset>"
        )
        assert [e.loc for e in parse_sitemap(xml)] == ["https://h/a"]


class TestSitemapRoundTrip:
    """Property: any entry list serialized to urlset XML parses back
    exactly (loc/lastmod/changefreq preserved, priority clamped)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    loc_st = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="/-._~"
        ),
        min_size=1,
        max_size=40,
    ).map(lambda s: "https://h.go.id/" + s)

    @given(
        st.lists(
            st.tuples(
                loc_st,
                st.one_of(st.none(), st.just("2025-03-01")),
                st.one_of(st.none(), st.sampled_from(["daily", "weekly", "never"])),
                st.floats(min_value=-2, max_value=2, allow_nan=False).map(
                    lambda p: round(p, 2)
                ),
            ),
            max_size=20,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, entries):
        from crawler_spark.kernels.sitemap import DEFAULT_PRIORITY

        parts = ["<urlset>"]
        for loc, lastmod, chf, pr in entries:
            parts.append("<url>")
            parts.append(f"<loc>{loc}</loc>")
            if lastmod is not None:
                parts.append(f"<lastmod>{lastmod}</lastmod>")
            if chf is not None:
                parts.append(f"<changefreq>{chf}</changefreq>")
            parts.append(f"<priority>{pr}</priority>")
            parts.append("</url>")
        parts.append("</urlset>")
        got = parse_sitemap("".join(parts))
        assert [
            (e.loc, e.lastmod, e.changefreq, e.priority) for e in got
        ] == [
            (
                loc,
                lastmod,
                chf,
                pr if 0.0 <= pr <= 1.0 else DEFAULT_PRIORITY,
            )
            for loc, lastmod, chf, pr in entries
        ]


class TestFrontierPriorityMapping:
    def test_kernel_grid(self):
        # protocol 1.0 (most important) -> frontier 10 (S1: higher drains
        # first — the reference's 10 = manual/highest)
        assert sitemap_priority_to_frontier(1.0) == 10
        assert sitemap_priority_to_frontier(0.0) == 0
        assert sitemap_priority_to_frontier(0.5) == 5

    def test_jvm_expr_equals_kernel_on_grid(self, spark):
        """q_sitemap_expand computes the mapping JVM-side (F.round HALF_UP);
        the kernel uses Python round (banker's). The 0.0-1.0 x 0.1 grid has
        no .5 ties, so they must agree everywhere — pinned here so a future
        grid change that introduces a tie fails loudly."""
        grid = [i / 10.0 for i in range(11)]
        df = spark.createDataFrame([(p,) for p in grid], "priority double")
        got = {
            r["priority"]: r["fp"]
            for r in df.select(
                "priority",
                F.round(F.col("priority") * 10, 0).cast("int").alias("fp"),
            ).collect()
        }
        assert got == {p: sitemap_priority_to_frontier(p) for p in grid}


class TestNewQueryPlanShapes:
    def test_crawl_traps_no_join_bounded_shuffles(self, spark):
        from crawler_spark.queries_crawl import q_crawl_traps

        plan = q_crawl_traps(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        # template agg: countDistinct is two-phase over ONE logical grouping
        # (the RoundRobin exchange is _events' fixture-spreading repartition)
        assert plan.count("Exchange hashpartitioning") <= 2

    def test_circuit_breaker_one_agg_one_window(self, spark):
        from crawler_spark.queries_crawl import q_host_circuit_breaker

        plan = q_host_circuit_breaker(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        # agg shuffle on (host, rnd) + window repartition on host
        assert plan.count("Exchange") <= 3

    def test_sitemap_expand_map_only_after_distinct(self, spark):
        from crawler_spark.queries_crawl import q_sitemap_expand

        plan = q_sitemap_expand(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "CartesianProduct" not in plan
        # the only exchange is the distinct-host aggregate; parse + explode
        # stay map-side
        assert plan.count("Exchange") <= 2

    def test_conditional_recrawl_single_equijoin(self, spark):
        from crawler_spark.queries_crawl import q_conditional_recrawl

        plan = q_conditional_recrawl(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("Join") >= 1  # the pages<->candidates identity join


class TestConditionalRecrawlSemantics:
    def test_parse_needed_follows_change_rate(self, spark):
        """The economic claim: parse work == changed + new rows only."""
        from crawler_spark.queries_crawl import q_conditional_recrawl

        rows = q_conditional_recrawl(spark, "/root/testdata/sf0.001").collect()
        by_action = {}
        for r in rows:
            by_action.setdefault(r["action"], []).append(r)
        assert all(r["parse_needed"] == 0 for r in by_action["not_modified"])
        assert all(r["parse_needed"] == 1 for r in by_action["modified"])
        assert all(
            r["parse_needed"] == 1 and r["stored_etag"] is None
            for r in by_action["new"]
        )
        # modified rows really differ; not_modified really match
        assert all(
            r["stored_etag"] != r["live_etag"] for r in by_action["modified"]
        )
        assert all(
            r["stored_etag"] == r["live_etag"] for r in by_action["not_modified"]
        )
