"""Crawl-control operators: robots.txt parse/apply, frontier, sitemaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from ir_spark.operators.crawl import (apply_robots, crawl_frontier,
                                      extract_sitemap_urls, parse_robots,
                                      revisit_stats)


def _rules(spark, txt, host="h.example"):
    df = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    return {(r.rule_path, r.allow)
            for r in parse_robots(df).collect()}


class TestParseRobots:
    def test_star_group_rules(self, spark):
        got = _rules(spark, "User-agent: *\nDisallow: /a\nAllow: /a/b\n")
        assert got == {("/a", 0), ("/a/b", 1)}

    def test_non_star_group_ignored(self, spark):
        got = _rules(spark, "User-agent: googlebot\nDisallow: /\n\n"
                            "User-agent: *\nDisallow: /x\n")
        assert got == {("/x", 0)}

    def test_stacked_agents_share_rules(self, spark):
        got = _rules(spark, "User-agent: a\nUser-agent: *\nUser-agent: b\n"
                            "Disallow: /s\n")
        assert got == {("/s", 0)}

    def test_multiple_star_groups_union(self, spark):
        got = _rules(spark, "User-agent: *\nDisallow: /one\n\n"
                            "User-agent: *\nDisallow: /two\n")
        assert got == {("/one", 0), ("/two", 0)}

    def test_comments_unknown_directives_empty_disallow(self, spark):
        got = _rules(spark, "User-agent: *\n# note\nCrawl-delay: 7\n"
                            "Sitemap: https://h/s.xml\nDisallow:\n"
                            "Disallow: /keep  # trailing comment\n")
        assert got == {("/keep", 0)}

    def test_rules_before_any_group_dropped(self, spark):
        got = _rules(spark, "Disallow: /orphan\nUser-agent: *\nAllow: /ok\n")
        assert got == {("/ok", 1)}

    def test_multi_token_agent_starts_its_own_group(self, spark):
        # "Some Bot" contains a space; the line must still open a new
        # group, or its Disallow:/ would fold into the open * group and
        # block the whole site for everyone
        got = _rules(spark, "User-agent: *\nDisallow: /private\n"
                            "User-agent: Some Bot\nDisallow: /\n")
        assert got == {("/private", 0)}

    def test_case_insensitive_directives(self, spark):
        got = _rules(spark, "USER-AGENT: *\nDISALLOW: /up\nallow: /up/ok\n")
        assert got == {("/up", 0), ("/up/ok", 1)}


class TestApplyRobots:
    def _apply(self, spark, urls, txt):
        rules = parse_robots(spark.createDataFrame(
            [("h.example", txt)], "host string, robots_txt string"))
        udf_ = spark.createDataFrame([(u,) for u in urls], "url string")
        return {r.url: (r.allowed, r.matched_path)
                for r in apply_robots(udf_, rules).collect()}

    def test_longest_prefix_wins_allow_beats_disallow(self, spark):
        got = self._apply(
            spark,
            ["https://h.example/a/b/c", "https://h.example/a/x",
             "https://h.example/free"],
            "User-agent: *\nDisallow: /a\nAllow: /a/b\n")
        assert got["https://h.example/a/b/c"] == (1, "/a/b")
        assert got["https://h.example/a/x"] == (0, "/a")
        assert got["https://h.example/free"] == (1, "")

    def test_allow_wins_equal_length_tie(self, spark):
        # same path listed both ways: RFC 9309 least-restrictive wins
        got = self._apply(spark, ["https://h.example/t/x"],
                          "User-agent: *\nDisallow: /t\nAllow: /t\n")
        assert got["https://h.example/t/x"] == (1, "/t")

    def test_unknown_host_allowed(self, spark):
        rules = parse_robots(spark.createDataFrame(
            [("other.example", "User-agent: *\nDisallow: /\n")],
            "host string, robots_txt string"))
        urls = spark.createDataFrame([("https://h.example/p",)],
                                     "url string")
        rows = apply_robots(urls, rules).collect()
        assert rows[0].allowed == 1 and rows[0].matched_path == ""

    def test_root_disallow_blocks_everything(self, spark):
        got = self._apply(spark, ["https://h.example/", "https://h.example/x"],
                          "User-agent: *\nDisallow: /\n")
        assert set(got.values()) == {(0, "/")}

    def test_duplicate_url_rows_preserved(self, spark):
        # a frontier may carry the same url twice (two discovery
        # sources, pre-dedup); apply_robots must keep BOTH rows
        rules = parse_robots(spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /a\n")],
            "host string, robots_txt string"))
        urls = spark.createDataFrame(
            [("https://h.example/a/x", "seed"),
             ("https://h.example/a/x", "link"),
             ("https://h.example/ok", "seed")],
            "url string, source string")
        rows = apply_robots(urls, rules).collect()
        assert len(rows) == 3
        assert sorted((r.url, r.source, r.allowed) for r in rows) == [
            ("https://h.example/a/x", "link", 0),
            ("https://h.example/a/x", "seed", 0),
            ("https://h.example/ok", "seed", 1)]


class TestCrawlDelays:
    def test_star_group_delay_max_decoy_ignored(self, spark):
        from ir_spark.operators.crawl import parse_crawl_delays

        robots = spark.createDataFrame(
            [("a.example",
              "User-agent: bot\nCrawl-delay: 99\n\n"
              "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
              "User-agent: *\nCrawl-delay: 3.5\n"),
             ("b.example", "User-agent: *\nDisallow: /\n")],  # no delay
            "host string, robots_txt string")
        got = {r.host: r.delay_sec
               for r in parse_crawl_delays(robots).collect()}
        # max of the *-group delays; the bot group's 99 ignored;
        # delay-less host absent
        assert got == {"a.example": 3.5}

    def test_frontier_uses_per_host_delay(self, spark):
        from ir_spark.operators.crawl import crawl_frontier

        urls = spark.createDataFrame(
            [("https://a/1", 2), ("https://a/2", 1), ("https://b/1", 1),
             ("https://b/2", 2)],
            "url string, priority long")
        delays = spark.createDataFrame([("a", 2.5)],
                                       "host string, delay_sec double")
        rows = {r.url: r.eta_ms
                for r in crawl_frontier(urls, delay_ms=1000,
                                        host_delays=delays).collect()}
        assert rows["https://a/2"] == 2500   # rank 2 at 2.5 s/host
        assert rows["https://b/1"] == 1000   # rank 2 at default 1 s


class TestFrontier:
    def test_waves_per_host_and_eta(self, spark):
        urls = spark.createDataFrame(
            [("https://a/1", 5), ("https://a/2", 9), ("https://a/3", 9),
             ("https://b/1", 1)],
            "url string, priority long")
        rows = {r.url: (r.host_rank, r.eta_ms)
                for r in crawl_frontier(urls, delay_ms=250).collect()}
        # priority desc, url asc tie-break; one slot per host per wave
        assert rows["https://a/2"] == (1, 0)
        assert rows["https://a/3"] == (2, 250)
        assert rows["https://a/1"] == (3, 500)
        assert rows["https://b/1"] == (1, 0)


class TestRevisitStats:
    def test_changes_counted_against_previous_capture(self, spark):
        caps = spark.createDataFrame(
            [("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"), ("u1", 4, "b"),
             ("u1", 5, "a"),   # a -> b -> b -> a: 2 changes over 4 revisits
             ("u2", 1, "x")],  # single capture: rate 0
            "url string, ts long, content_md5 string")
        rows = {r.url: (r.n_captures, r.n_changes, r.change_rate_micro)
                for r in revisit_stats(caps).collect()}
        assert rows["u1"] == (5, 2, 500000)
        assert rows["u2"] == (1, 0, 0)

    def test_first_capture_is_never_a_change(self, spark):
        caps = spark.createDataFrame(
            [("u", 1, "a"), ("u", 2, "b")],
            "url string, ts long, content_md5 string")
        r = revisit_stats(caps).collect()[0]
        assert (r.n_captures, r.n_changes, r.change_rate_micro) \
            == (2, 1, 1000000)


class TestSitemap:
    def test_entries_parsed_loc_mandatory_lastmod_optional(self, spark):
        xml = ("<urlset><url><loc>https://h/p1</loc>"
               "<lastmod>2024-02-03</lastmod></url>"
               "<url><loc>https://h/p2</loc></url>"
               "<url><lastmod>2024-02-04</lastmod></url></urlset>")
        df = spark.createDataFrame([("h", xml)], "host string, xml string")
        rows = {r.url: r.lastmod
                for r in extract_sitemap_urls(df).collect()}
        assert rows == {"https://h/p1": "2024-02-03", "https://h/p2": ""}

    def test_pretty_printed_multiline_sitemap(self, spark):
        # real sitemaps are pretty-printed: <url> blocks span lines,
        # which needs DOTALL in the block regex
        xml = ("<urlset>\n  <url>\n    <loc>https://h/p1</loc>\n"
               "    <lastmod>2024-02-03</lastmod>\n  </url>\n"
               "  <url>\n    <loc>https://h/p2</loc>\n  </url>\n"
               "</urlset>\n")
        df = spark.createDataFrame([("h", xml)], "host string, xml string")
        rows = {r.url: r.lastmod
                for r in extract_sitemap_urls(df).collect()}
        assert rows == {"https://h/p1": "2024-02-03", "https://h/p2": ""}
