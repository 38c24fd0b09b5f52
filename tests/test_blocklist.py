"""(host, path_prefix) blocklist filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.operators.crawl import blocklist_filter


def _links(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def _bl(spark, rows):
    return spark.createDataFrame(rows, "host string, path_prefix string")


class TestBlocklistFilter:
    def test_host_and_prefix_semantics(self, spark):
        links = _links(
            spark,
            [
                "https://bad.com/ads/x",       # host+prefix hit -> drop
                "https://bad.com/ok",          # host hit, prefix miss -> keep
                "https://www.bad.com/ads/y",   # www-stripped hit -> drop
                "https://BAD.com/ads/z",       # case-folded hit -> drop
                "https://good.com/ads/x",      # host miss -> keep
            ],
        )
        bl = _bl(spark, [("bad.com", "/ads")])
        got = {r.doc_id for r in blocklist_filter(links, bl).collect()}
        assert got == {1, 4}

    def test_empty_prefix_blocks_whole_host(self, spark):
        links = _links(
            spark, ["https://spam.net/a", "https://spam.net", "https://ok.net/a"]
        )
        bl = _bl(spark, [("spam.net", "")])
        got = {r.doc_id for r in blocklist_filter(links, bl).collect()}
        assert got == {2}

    def test_unparseable_urls_kept(self, spark):
        links = _links(spark, ["not a url", "https://bad.com/x"])
        bl = _bl(spark, [("bad.com", "")])
        got = {r.doc_id for r in blocklist_filter(links, bl).collect()}
        assert got == {0}

    def test_helper_columns_dropped(self, spark):
        links = _links(spark, ["https://a.com/x"])
        bl = _bl(spark, [("b.com", "")])
        assert blocklist_filter(links, bl).columns == ["doc_id", "url"]

    def test_plan_broadcast_anti_no_shuffle(self, spark):
        links = _links(spark, ["https://a.com/x"])
        bl = _bl(spark, [("b.com", "")])
        plan = (
            blocklist_filter(links, bl)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftAnti" in plan and "Broadcast" in plan
        assert "hashpartitioning" not in plan


class TestRobotsRules:
    def _robots(self, spark, body, host="a.com"):
        return spark.createDataFrame(
            [(host, body)], "host string, robots string"
        )

    def test_star_group_rules_extracted(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        body = (
            "User-agent: googlebot\nDisallow: /g\n\n"
            "User-agent: *\nDisallow: /private\nDisallow: /tmp\n"
            "Allow: /pub\nCrawl-delay: 3\n"
        )
        got = {
            (r.host, r.path_prefix)
            for r in robots_rules(self._robots(spark, body)).collect()
        }
        assert got == {("a.com", "/private"), ("a.com", "/tmp")}

    def test_consecutive_agent_lines_share_one_group(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        # '*' listed FIRST, another agent after it: the Disallow still
        # applies to '*' (one group, any-match) — the case a
        # last-agent-wins shortcut gets wrong
        body = "User-agent: *\nUser-agent: bingbot\nDisallow: /x\n"
        got = {
            r.path_prefix
            for r in robots_rules(self._robots(spark, body)).collect()
        }
        assert got == {"/x"}

    def test_comments_blank_and_empty_disallow_dropped(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        body = (
            "# top comment\n\nUser-agent: *\n"
            "Disallow: /keep  # trailing comment\n"
            "Disallow:\n\n# done\n"
        )
        got = [
            r.path_prefix
            for r in robots_rules(self._robots(spark, body)).collect()
        ]
        assert got == ["/keep"]

    def test_specific_agent_selection(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        body = (
            "User-agent: mybot\nDisallow: /mine\n\n"
            "User-agent: *\nDisallow: /all\n"
        )
        got = {
            r.path_prefix
            for r in robots_rules(
                self._robots(spark, body), user_agent="mybot"
            ).collect()
        }
        assert got == {"/mine"}

    def test_composes_with_blocklist_filter(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            blocklist_filter,
            robots_rules,
        )

        body = "User-agent: *\nDisallow: /secret\n"
        rules = robots_rules(self._robots(spark, body, host="a.com"))
        links = spark.createDataFrame(
            [
                (1, "https://a.com/secret/page"),
                (2, "https://a.com/open/page"),
                (3, "https://b.com/secret/page"),
            ],
            "doc_id long, url string",
        )
        got = {r.doc_id for r in blocklist_filter(links, rules).collect()}
        assert got == {2, 3}


class TestSitemapUrls:
    def test_urlset_extraction_with_padding_and_distractors(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        body = (
            "<urlset><url><loc> https://a.com/x </loc>"
            "<lastmod>2026-01-01</lastmod></url>"
            "<url><loc>https://a.com/y</loc></url>"
            "<url><loc></loc></url></urlset>"
        )
        maps = spark.createDataFrame(
            [("a.com", body)], "host string, sitemap string"
        )
        got = {(r.url, r.is_index) for r in sitemap_urls(maps).collect()}
        assert got == {
            ("https://a.com/x", False),
            ("https://a.com/y", False),
        }

    def test_sitemapindex_flagged(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        body = (
            "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        maps = spark.createDataFrame(
            [("a.com", body)], "host string, sitemap string"
        )
        got = sitemap_urls(maps).collect()
        assert [(r.url, r.is_index) for r in got] == [
            ("https://a.com/s1.xml", True)
        ]

    def test_duplicate_locs_deduped(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        body = (
            "<urlset><url><loc>https://a.com/x</loc></url>"
            "<url><loc>https://a.com/x</loc></url></urlset>"
        )
        maps = spark.createDataFrame(
            [("a.com", body)], "host string, sitemap string"
        )
        assert sitemap_urls(maps).count() == 1

    def test_entities_cdata_and_comments(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        # the sitemap spec REQUIRES entity-escaped URLs: &amp; in a
        # <loc> is a literal & in the URL; CDATA wraps verbatim URLs;
        # commented-out entries are not entries
        body = (
            "<urlset>"
            "<url><loc>https://a.com/?a=1&amp;b=2</loc></url>"
            "<url><loc><![CDATA[https://a.com/raw?x=1&y=2]]></loc></url>"
            "<url><loc>https://a.com/esc&amp;lt;</loc></url>"
            "<!-- <url><loc>https://a.com/commented</loc></url> -->"
            "</urlset>"
        )
        maps = spark.createDataFrame(
            [("a.com", body)], "host string, sitemap string"
        )
        got = {r.url for r in sitemap_urls(maps).collect()}
        assert got == {
            "https://a.com/?a=1&b=2",
            "https://a.com/raw?x=1&y=2",
            "https://a.com/esc&lt;",   # &amp;lt; is the ESCAPED '&lt;'
        }

    def test_cdata_content_is_verbatim_and_strips_are_paired(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        # CDATA is unparsed character data: '&amp;' inside it is a
        # LITERAL '&amp;' (xml.etree agrees); and a plain URL that
        # merely ENDS in ']]' must not be truncated by the wrapper
        # strip (the strips are paired, not independent)
        body = (
            "<urlset>"
            "<url><loc><![CDATA[https://a.com/?q=&amp;x]]></loc></url>"
            "<url><loc>https://a.com/x]]</loc></url>"
            "</urlset>"
        )
        import xml.etree.ElementTree as ET

        ref = {e.text.strip() for e in ET.fromstring(body).iter("loc")}
        assert ref == {"https://a.com/?q=&amp;x", "https://a.com/x]]"}
        got = {r.url for r in sitemap_urls(
            spark.createDataFrame([("a.com", body)],
                                  "host string, sitemap string")
        ).collect()}
        assert got == ref

    def test_commented_sitemapindex_not_an_index(self, spark):
        from web_content_extractor_spark.operators.crawl import sitemap_urls

        body = (
            "<!-- was a <sitemapindex> once -->"
            "<urlset><url><loc>https://a.com/x</loc></url></urlset>"
        )
        maps = spark.createDataFrame(
            [("a.com", body)], "host string, sitemap string"
        )
        rows = sitemap_urls(maps).collect()
        assert [(r.url, r.is_index) for r in rows] == [
            ("https://a.com/x", False)
        ]

    def test_differential_vs_elementtree(self, spark):
        """Seeded fuzz: generated sitemaps (entities, CDATA, comments,
        whitespace, lastmod distractors, index variants) parsed by
        xml.etree as the independent reference."""
        import random
        import xml.etree.ElementTree as ET

        from web_content_extractor_spark.operators.crawl import sitemap_urls

        rng = random.Random(11)
        rows, expected = [], {}
        for h in range(25):
            host = f"h{h}.com"
            is_index = rng.random() < 0.3
            tag, child = (
                ("sitemapindex", "sitemap") if is_index
                else ("urlset", "url")
            )
            entries, parts = [], []
            for i in range(rng.randint(1, 5)):
                q = rng.choice(["", "?a=1&b=2", "?x=<y>", ""])
                url = f"https://{host}/p{i}{q}"
                esc = (
                    url.replace("&", "&amp;")
                    .replace("<", "&lt;").replace(">", "&gt;")
                )
                loc = (
                    f"<![CDATA[{url}]]>" if rng.random() < 0.3 else esc
                )
                ws = rng.choice(["", " ", "\n  "])
                parts.append(
                    f"<{child}><loc>{ws}{loc}{ws}</loc>"
                    f"<lastmod>2026-01-0{i+1}</lastmod></{child}>"
                )
                entries.append(url)
            if rng.random() < 0.4:
                parts.insert(
                    rng.randint(0, len(parts)),
                    f"<!-- <{child}><loc>https://{host}/dead</loc>"
                    f"</{child}> -->",
                )
            body = f"<{tag}>" + "".join(parts) + f"</{tag}>"
            # independent reference: real XML parse
            root = ET.fromstring(body)
            ref = {
                e.text.strip() for e in root.iter("loc") if e.text
            }
            assert ref == set(entries)  # the generator is itself sound
            rows.append((host, body))
            expected[host] = {(u, is_index) for u in ref}
        maps = spark.createDataFrame(rows, "host string, sitemap string")
        got = {}
        for r in sitemap_urls(maps).collect():
            got.setdefault(r.host, set()).add((r.url, r.is_index))
        assert got == expected


class TestBlocklistNormalization:
    def test_www_prefixed_blocklist_entries_match(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            blocklist_filter,
        )

        links = _links(
            spark, ["https://bad.com/x", "https://www.bad.com/y",
                    "https://ok.com/z"]
        )
        bl = _bl(spark, [("www.bad.com", "")])  # UT1 lists ship both forms
        got = {r.doc_id for r in blocklist_filter(links, bl).collect()}
        assert got == {2}


class TestRobotsAgentFallback:
    def test_specific_agent_falls_back_to_star_group(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        robots = spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private\n")],
            "host string, robots string",
        )
        got = {
            r.path_prefix
            for r in robots_rules(robots, user_agent="mybot").collect()
        }
        assert got == {"/private"}

    def test_product_token_substring_match(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        body = (
            "User-agent: mybot\nDisallow: /mine\n\n"
            "User-agent: *\nDisallow: /all\n"
        )
        robots = spark.createDataFrame(
            [("a.com", body)], "host string, robots string"
        )
        # full crawler UA string matches the group's product token
        got = {
            r.path_prefix
            for r in robots_rules(
                robots, user_agent="MyBot/1.2 (+https://example.com)"
            ).collect()
        }
        assert got == {"/mine"}

    def test_specific_groups_suppress_star_fallback(self, spark):
        from web_content_extractor_spark.operators.crawl import robots_rules

        body = (
            "User-agent: mybot\nDisallow: /mine\n\n"
            "User-agent: *\nDisallow: /all\n"
        )
        robots = spark.createDataFrame(
            [("a.com", body)], "host string, robots string"
        )
        got = {
            r.path_prefix
            for r in robots_rules(robots, user_agent="mybot").collect()
        }
        assert got == {"/mine"}

    # ---- seeded differential fuzz of the shared group machinery ----
    #
    # _robots_groups (windows: lag + cumsum + running max) backs
    # robots_rules, crawl_delays AND robots_decisions; the reference
    # below re-implements the documented group semantics with a plain
    # line loop, so any window-machinery bug (group splits, rule
    # attachment, tier selection) diverges.

    @staticmethod
    def _ref_disallows(body: str, ua: str) -> set:
        import re as _re

        groups = []  # (agent_values, rules)
        prev_agent = False
        for line in body.split("\n"):
            line = _re.sub(r"#.*$", "", line).strip()
            m = _re.match(r"^([A-Za-z-]+)\s*:\s*(.*)$", line)
            if not m:
                # comment/blank/junk lines are invisible to grouping
                # (RFC 9309: only rule lines end a user-agent run)
                continue
            f, v = m.group(1).lower(), m.group(2).strip()
            if f == "user-agent":
                if not prev_agent:
                    groups.append(([], []))
                groups[-1][0].append(v)
                prev_agent = True
            else:
                if groups:
                    groups[-1][1].append((f, v))
                prev_agent = False
        ua_l = ua.lower()

        def tok(v):
            return v.split("/", 1)[0].lower()

        if ua_l == "*":
            spec = []
        else:
            spec = [
                g for g in groups
                if any(tok(a) != "*" and tok(a) in ua_l for a in g[0])
            ]
        star = [
            g for g in groups if any(a.lower() == "*" for a in g[0])
        ]
        chosen = spec if spec else star
        return {
            v for g in chosen for (f, v) in g[1] if f == "disallow" and v
        }

    def test_group_machinery_differential_fuzz(self, spark):
        import random

        from web_content_extractor_spark.operators.crawl import robots_rules

        rng = random.Random(7)
        agents = ["*", "googlebot", "mybot", "my", "otherbot",
                  "MyBot/2.1", "bot"]
        uas = ["*", "mybot", "googlebot-news", "MyBot/1.0"]
        hosts, bodies = [], {}
        for h in range(30):
            host = f"h{h}.com"
            lines = []
            for _ in range(rng.randint(1, 4)):  # groups
                for _ in range(rng.randint(1, 3)):  # agent run
                    lines.append(f"User-agent: {rng.choice(agents)}")
                for _ in range(rng.randint(0, 3)):  # rule run
                    f = rng.choice(
                        ["Disallow", "Disallow", "Allow", "Crawl-delay"]
                    )
                    v = (
                        "3" if f == "Crawl-delay"
                        else rng.choice(["/a", "/b/c", "/tmp", "", "/x#c"])
                    )
                    lines.append(f"{f}: {v}")
                if rng.random() < 0.4:
                    lines.append(rng.choice(["", "# comment", "junk line"]))
            body = "\n".join(lines) + "\n"
            hosts.append((host, body))
            bodies[host] = body
        robots = self._robots_many(spark, hosts)
        for ua in uas:
            got = {}
            for r in robots_rules(robots, user_agent=ua).collect():
                got.setdefault(r.host, set()).add(r.path_prefix)
            exp = {
                h: self._ref_disallows(b, ua) for h, b in bodies.items()
            }
            exp = {h: v for h, v in exp.items() if v}
            assert got == exp, f"ua={ua}"

    def _robots_many(self, spark, rows):
        return spark.createDataFrame(rows, "host string, robots string")


class TestCrawlDelaysAndPoliteness:
    def _robots(self, spark, rows):
        return spark.createDataFrame(rows, "host string, robots string")

    def test_crawl_delay_group_semantics(self, spark):
        from web_content_extractor_spark.operators.crawl import crawl_delays

        robots = self._robots(
            spark,
            [
                # '*' group delay applies; googlebot group's does not
                ("a.com", "User-agent: googlebot\nCrawl-delay: 60\n\n"
                          "User-agent: *\nCrawl-delay: 2.5\n"),
                # two applicable values -> conservative max
                ("b.com", "User-agent: *\nCrawl-delay: 1\n\n"
                          "User-agent: *\nCrawl-delay: 4\n"),
                # no delay line at all -> no row
                ("c.com", "User-agent: *\nDisallow: /x\n"),
                # non-numeric -> dropped -> no row
                ("d.com", "User-agent: *\nCrawl-delay: soon\n"),
            ],
        )
        got = {r.host: r.delay_s for r in crawl_delays(robots).collect()}
        assert got == {"a.com": 2.5, "b.com": 4.0}

    def test_crawl_delay_specific_agent(self, spark):
        from web_content_extractor_spark.operators.crawl import crawl_delays

        robots = self._robots(
            spark,
            [("a.com", "User-agent: mybot\nCrawl-delay: 7\n\n"
                       "User-agent: *\nCrawl-delay: 1\n")],
        )
        got = {r.host: r.delay_s
               for r in crawl_delays(robots, user_agent="mybot").collect()}
        assert got == {"a.com": 7.0}

    def _frontier(self, spark, rows):
        return spark.createDataFrame(
            rows, "host string, url string, priority int"
        )

    def test_schedule_slots_delays_and_default(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            politeness_schedule,
        )

        frontier = self._frontier(
            spark,
            [("a.com", f"https://a.com/{i}", i) for i in range(4)]
            + [("b.com", "https://b.com/x", 0), ("b.com", "https://b.com/y", 0)],
        )
        delays = spark.createDataFrame(
            [("a.com", 2.5)], "host string, delay_s double"
        )
        out = {
            (r.host, r.url): r
            for r in politeness_schedule(
                frontier, delays, default_delay_s=1.0, priority_col="priority"
            ).collect()
        }
        # a.com: priority desc -> /3 first at t=0, /0 last at slot 3
        assert out[("a.com", "https://a.com/3")].slot == 0
        assert out[("a.com", "https://a.com/0")].slot == 3
        assert out[("a.com", "https://a.com/0")].fetch_at_s == 7.5
        assert all(out[("a.com", u)].delay_s == 2.5 for u in
                   [f"https://a.com/{i}" for i in range(4)])
        # b.com missing from delays -> default 1.0; url tie-break
        assert out[("b.com", "https://b.com/x")].slot == 0
        assert out[("b.com", "https://b.com/y")].fetch_at_s == 1.0

    def test_schedule_without_delay_table_and_determinism(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            politeness_schedule,
        )

        frontier = self._frontier(
            spark, [("a.com", f"https://a.com/{c}", 0) for c in "dcba"]
        )
        a = politeness_schedule(frontier, default_delay_s=0.5).collect()
        b = politeness_schedule(frontier, default_delay_s=0.5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        by_url = {r.url: r for r in a}
        assert by_url["https://a.com/a"].slot == 0
        assert by_url["https://a.com/d"].fetch_at_s == 1.5

    def test_schedule_composes_with_robots_delays(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            crawl_delays,
            politeness_schedule,
        )

        robots = self._robots(
            spark, [("a.com", "User-agent: *\nCrawl-delay: 10\n")]
        )
        frontier = self._frontier(
            spark,
            [("a.com", "https://a.com/1", 0), ("a.com", "https://a.com/2", 0)],
        )
        out = {r.url: r for r in politeness_schedule(
            frontier, crawl_delays(robots)
        ).collect()}
        assert out["https://a.com/2"].fetch_at_s == 10.0

    def test_host_form_consistency_rules_and_delays(self, spark):
        """A robots table keyed 'www.Foo.com' must govern frontier
        host 'foo.com' for BOTH its rules and its Crawl-delay — the
        seam where decisions joined normalized but delays joined raw
        (delay silently defaulting) used to hide."""
        from web_content_extractor_spark.operators.crawl import (
            crawl_delays,
            politeness_schedule,
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("www.Foo.com",
              "User-agent: *\nDisallow: /x\nCrawl-delay: 5\n")],
        )
        frontier = self._frontier(
            spark,
            [("foo.com", "https://foo.com/x", 0),
             ("foo.com", "https://foo.com/ok", 0)],
        )
        dec = {r.url: r.allowed
               for r in robots_decisions(robots, frontier).collect()}
        assert dec == {"https://foo.com/x": False,
                       "https://foo.com/ok": True}
        delays = crawl_delays(robots)
        assert {r.host: r.delay_s for r in delays.collect()} == {
            "foo.com": 5.0
        }
        sched = {r.url: r for r in politeness_schedule(
            frontier, delays
        ).collect()}
        # both URLs get the robots delay, not the 1.0 default
        assert all(r.delay_s == 5.0 for r in sched.values())
        # and a mixed-form user delay table collapses, never fans out
        mixed = spark.createDataFrame(
            [("www.Foo.com", 5.0), ("foo.com", 3.0)],
            "host string, delay_s double",
        )
        rows = politeness_schedule(frontier, mixed).collect()
        assert len(rows) == 2  # no join fan-out
        assert all(r.delay_s == 5.0 for r in rows)  # conservative max

    def test_host_key_idempotent_doubled_www(self, spark):
        """_host_key must be IDEMPOTENT: politeness_schedule
        re-normalizes crawl_delays' already-normalized output, so a
        single-strip key would send 'www.www.foo.com' to
        'www.foo.com' on the delay side but 'foo.com'... on a second
        pass — rules apply while the delay silently defaults, the
        exact seam the shared key exists to close."""
        from web_content_extractor_spark.operators.crawl import (
            crawl_delays,
            politeness_schedule,
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("www.www.Foo.com",
              "User-agent: *\nDisallow: /x\nCrawl-delay: 7\n")],
        )
        frontier = self._frontier(
            spark,
            [("www.www.foo.com", "https://www.www.foo.com/x", 0),
             ("www.www.foo.com", "https://www.www.foo.com/ok", 0)],
        )
        dec = {r.url: r.allowed
               for r in robots_decisions(robots, frontier).collect()}
        assert dec == {"https://www.www.foo.com/x": False,
                       "https://www.www.foo.com/ok": True}
        sched = politeness_schedule(frontier, crawl_delays(robots))
        # BOTH rules and delay govern: no silent 1.0 default
        assert all(r.delay_s == 7.0 for r in sched.collect())

    def test_delays_canonical_skips_regroup_same_schedule(self, spark):
        """crawl_delays output is already canonically keyed;
        delays_canonical=True must give the identical schedule while
        dropping the defensive re-aggregation (one exchange fewer —
        a whole shuffle of a host-cardinality table at 10^8 hosts)."""
        from web_content_extractor_spark.operators.crawl import (
            crawl_delays,
            politeness_schedule,
        )

        robots = self._robots(
            spark,
            [("www.Foo.com", "User-agent: *\nCrawl-delay: 5\n"),
             ("b.com", "User-agent: *\nCrawl-delay: 2\n")],
        )
        frontier = self._frontier(
            spark,
            [("foo.com", "https://foo.com/1", 0),
             ("foo.com", "https://foo.com/2", 1),
             ("b.com", "https://b.com/1", 0),
             ("c.com", "https://c.com/1", 0)],
        )
        delays = crawl_delays(robots)
        slow = politeness_schedule(frontier, delays)
        fast = politeness_schedule(frontier, delays, delays_canonical=True)
        assert sorted(map(tuple, slow.collect())) == sorted(
            map(tuple, fast.collect())
        )
        n_ex_slow = slow._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )
        n_ex_fast = fast._jdf.queryExecution().executedPlan().toString().count(
            "Exchange hashpartitioning"
        )
        assert n_ex_fast < n_ex_slow

    def test_crawl_delay_drops_nan_inf_negative(self, spark):
        from web_content_extractor_spark.operators.crawl import crawl_delays

        robots = self._robots(
            spark,
            [
                # NaN must not win the conservative max
                ("a.com", "User-agent: *\nCrawl-delay: NaN\n\n"
                          "User-agent: *\nCrawl-delay: 2\n"),
                ("b.com", "User-agent: *\nCrawl-delay: Infinity\n"),
                ("c.com", "User-agent: *\nCrawl-delay: -5\n"),
            ],
        )
        got = {r.host: r.delay_s for r in crawl_delays(robots).collect()}
        assert got == {"a.com": 2.0}

    def test_schedule_reschedules_its_own_output(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            politeness_schedule,
        )

        frontier = self._frontier(
            spark,
            [("a.com", "https://a.com/1", 0), ("a.com", "https://a.com/2", 0)],
        )
        delays = spark.createDataFrame(
            [("a.com", 3.0)], "host string, delay_s double"
        )
        first = politeness_schedule(frontier, delays)
        # feeding the output back in (crawl-loop pattern) must not
        # raise AMBIGUOUS_REFERENCE on the carried delay_s column
        again = {r.url: r for r in politeness_schedule(
            first, delays.withColumn("delay_s", F.lit(5.0))
        ).collect()}
        assert again["https://a.com/2"].fetch_at_s == 5.0


class TestRobotsDecisions:
    def _robots(self, spark, rows):
        return spark.createDataFrame(rows, "host string, robots string")

    def _urls(self, spark, rows):
        return spark.createDataFrame(rows, "host string, url string")

    def test_allow_reopens_subpath_longest_match_wins(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com", "User-agent: *\nDisallow: /a\nAllow: /a/b\n")],
        )
        urls = self._urls(
            spark,
            [
                ("a.com", "https://a.com/a/x"),      # /a disallows
                ("a.com", "https://a.com/a/b/c"),    # /a/b re-allows
                ("a.com", "https://a.com/free"),     # no rule -> allowed
                ("b.com", "https://b.com/a/x"),      # no robots -> allowed
            ],
        )
        got = {
            r.url: (r.allowed, r.matched_prefix)
            for r in robots_decisions(robots, urls).collect()
        }
        assert got["https://a.com/a/x"] == (False, "/a")
        assert got["https://a.com/a/b/c"] == (True, "/a/b")
        assert got["https://a.com/free"] == (True, None)
        assert got["https://b.com/a/x"] == (True, None)

    def test_allow_wins_length_tie(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com", "User-agent: *\nDisallow: /p/\nAllow: /q/\n")],
        )
        # construct a genuine tie: same-length allow+disallow matching
        robots_tie = self._robots(
            spark,
            [("a.com", "User-agent: *\nDisallow: /dir\nAllow: /dir\n")],
        )
        urls = self._urls(spark, [("a.com", "https://a.com/dir/page")])
        got = robots_decisions(robots_tie, urls).collect()[0]
        assert got.allowed and got.matched_prefix == "/dir"
        got2 = {
            r.url: r.allowed
            for r in robots_decisions(
                robots,
                self._urls(
                    spark,
                    [("a.com", "https://a.com/p/1"),
                     ("a.com", "https://a.com/q/1")],
                ),
            ).collect()
        }
        assert got2 == {
            "https://a.com/p/1": False, "https://a.com/q/1": True
        }

    def test_specific_agent_group_selected(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com", "User-agent: mybot\nDisallow: /mine\n\n"
                       "User-agent: *\nDisallow: /all\n")],
        )
        urls = self._urls(
            spark,
            [("a.com", "https://a.com/mine/x"),
             ("a.com", "https://a.com/all/x")],
        )
        got = {
            r.url: r.allowed
            for r in robots_decisions(
                robots, urls, user_agent="mybot"
            ).collect()
        }
        # mybot's group applies; the '*' group is suppressed
        assert got == {
            "https://a.com/mine/x": False, "https://a.com/all/x": True
        }

    def test_empty_path_evaluates_as_root(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark, [("a.com", "User-agent: *\nDisallow: /\n")]
        )
        urls = self._urls(
            spark,
            [("a.com", "https://a.com"), ("a.com", "https://a.com?x=1")],
        )
        got = [r.allowed for r in robots_decisions(robots, urls).collect()]
        assert got == [False, False]

    def test_host_join_normalizes_case_and_www(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark, [("WWW.A.com", "User-agent: *\nDisallow: /x\n")]
        )
        urls = self._urls(spark, [("a.com", "https://a.com/x/1")])
        got = robots_decisions(robots, urls).collect()[0]
        assert not got.allowed and got.matched_prefix == "/x"

    def test_rep_wildcards_star_and_anchor(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com",
              "User-agent: *\n"
              "Disallow: /*.pdf$\n"        # any path ending .pdf
              "Disallow: /private*/data\n"  # mid-pattern star
              "Allow: /private-ok/data\n")],
        )
        urls = self._urls(
            spark,
            [
                ("a.com", "https://a.com/docs/x.pdf"),       # anchored hit
                ("a.com", "https://a.com/docs/x.pdf.html"),  # NOT anchored
                ("a.com", "https://a.com/private123/data"),  # star hit
                # allow (16 octets) beats the star disallow (14)
                ("a.com", "https://a.com/private-ok/data"),
                ("a.com", "https://a.com/else"),
            ],
        )
        got = {
            r.url: (r.allowed, r.matched_prefix)
            for r in robots_decisions(robots, urls).collect()
        }
        assert got["https://a.com/docs/x.pdf"] == (False, "/*.pdf$")
        assert got["https://a.com/docs/x.pdf.html"] == (True, None)
        assert got["https://a.com/private123/data"] == (
            False, "/private*/data"
        )
        assert got["https://a.com/private-ok/data"] == (
            True, "/private-ok/data"
        )
        assert got["https://a.com/else"] == (True, None)

    def test_rep_regex_metachars_are_literal(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com", "User-agent: *\nDisallow: /a+(b)/c.d\n"
                       "Disallow: /x$y\n")],
        )
        urls = self._urls(
            spark,
            [
                ("a.com", "https://a.com/a+(b)/c.d"),   # literal hit
                ("a.com", "https://a.com/aa(b)/cXd"),   # regex semantics would hit
                ("a.com", "https://a.com/x$y/z"),       # mid-pattern $ literal
            ],
        )
        got = {
            r.url: r.allowed
            for r in robots_decisions(robots, urls).collect()
        }
        assert got == {
            "https://a.com/a+(b)/c.d": False,
            "https://a.com/aa(b)/cXd": True,
            "https://a.com/x$y/z": False,
        }

    def test_rep_matches_query_string(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        robots = self._robots(
            spark,
            [("a.com",
              "User-agent: *\n"
              "Disallow: /*?sessionid=\n"   # query-targeting wildcard
              "Disallow: /a$\n")],          # anchored: query breaks it
        )
        urls = self._urls(
            spark,
            [
                ("a.com", "https://a.com/page?sessionid=abc"),
                # '&sessionid=' is NOT '?sessionid=': no match
                ("a.com", "https://a.com/page?x=1&sessionid=abc"),
                ("a.com", "https://a.com/page"),
                ("a.com", "https://a.com/a"),        # exact hit
                ("a.com", "https://a.com/a?x=1"),    # '$' must NOT match
            ],
        )
        got = {
            r.url: r.allowed
            for r in robots_decisions(robots, urls).collect()
        }
        assert got == {
            "https://a.com/page?sessionid=abc": False,
            "https://a.com/page?x=1&sessionid=abc": True,
            "https://a.com/page": True,
            "https://a.com/a": False,
            "https://a.com/a?x=1": True,
        }

    def test_rep_mixed_host_forms_single_decision_row(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        # both host forms in the rule table -> ONE rule array per
        # normalized host (union of rules), never duplicate rows
        robots = self._robots(
            spark,
            [
                ("www.a.com", "User-agent: *\nDisallow: /x\n"),
                ("a.com", "User-agent: *\nAllow: /x/ok\n"),
            ],
        )
        urls = self._urls(
            spark,
            [
                ("a.com", "https://a.com/x/1"),
                ("a.com", "https://a.com/x/ok/1"),
            ],
        )
        rows = robots_decisions(robots, urls).collect()
        assert len(rows) == 2  # no join fan-out
        got = {r.url: r.allowed for r in rows}
        assert got == {
            "https://a.com/x/1": False,     # www-form Disallow applies
            "https://a.com/x/ok/1": True,   # bare-form Allow re-opens
        }

    def test_rep_specificity_is_octets_not_chars(self, spark):
        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        # '/café' = 5 chars / 6 UTF-8 octets; '/caf*x' = 6 chars /
        # 6 octets.  Both match '/caféx'.  Char-length ranking picks
        # the disallow (6 > 5); the RFC's octet rule is a 6 = 6 tie,
        # which allow wins.
        robots = self._robots(
            spark,
            [("a.com",
              "User-agent: *\nAllow: /café\nDisallow: /caf*x\n")],
        )
        urls = self._urls(spark, [("a.com", "https://a.com/caféx")])
        got = robots_decisions(robots, urls).collect()[0]
        assert got.allowed and got.matched_prefix == "/café"

    # ---- seeded differential fuzz vs an independent REP matcher ----
    #
    # The engine translates REP patterns to Java regexes; the reference
    # matcher below uses *-split segment search (no regex at all), so a
    # translation bug (escaping, anchoring, greediness) diverges.

    @staticmethod
    def _rep_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        segs = body.split("*")
        if len(segs) == 1:
            return path == segs[0] if anchored else path.startswith(segs[0])
        if not path.startswith(segs[0]):
            return False
        i = len(segs[0])
        last = segs[-1]
        for s in segs[1:-1]:
            j = path.find(s, i)
            if j < 0:
                return False
            i = j + len(s)
        if anchored:
            return len(path) - len(last) >= i and path.endswith(last)
        j = path.find(last, i)
        return j >= 0

    @classmethod
    def _rep_decide(cls, rules, target):
        # rules: [(pattern, is_allow)], deduped; REP pick = most
        # specific (OCTET length, UTF-8 bytes) wins, allow wins ties —
        # mirrors the documented tie-break incl. the lexicographic
        # prefix fallback; target = path [+ '?' + query]
        hits = [
            (len(p.encode("utf-8")), a, p)
            for (p, a) in set(rules)
            if cls._rep_match(p, target)
        ]
        if not hits:
            return True, None
        ln, a, p = max(hits)
        return a, p

    def test_rep_differential_fuzz(self, spark):
        import random

        from web_content_extractor_spark.operators.crawl import (
            robots_decisions,
        )

        rng = random.Random(42)
        seg_alpha = "abc123.+()"
        hosts, robot_rows, url_rows, expected = [], [], [], {}

        def rand_path():
            parts = [
                "".join(rng.choices(seg_alpha, k=rng.randint(1, 4)))
                for _ in range(rng.randint(1, 3))
            ]
            p = "/" + "/".join(parts)
            if rng.random() < 0.3:  # query-bearing targets (REP
                p += "?" + "".join(  # matches path PLUS query)
                    rng.choices("abc123", k=rng.randint(1, 3))
                ) + "=" + "".join(rng.choices("xyz9", k=rng.randint(1, 3)))
            return p

        def rand_pattern(paths):
            # mutate a real path (high hit density) or invent one
            p = rng.choice(paths) if rng.random() < 0.7 else rand_path()
            chars = list(p)
            for _ in range(rng.randint(0, 2)):
                pos = rng.randint(1, len(chars))
                chars.insert(pos, "*")
            pat = "".join(chars)
            if rng.random() < 0.3:
                pat = pat[: rng.randint(1, len(pat))] or "/"
            if rng.random() < 0.25:
                pat += "$"
            return pat

        for h in range(40):
            host = f"h{h}.example.com"
            paths = [rand_path() for _ in range(6)]
            rules = [
                (rand_pattern(paths), rng.random() < 0.5)
                for _ in range(rng.randint(1, 6))
            ]
            body = "User-agent: *\n" + "".join(
                f"{'Allow' if a else 'Disallow'}: {p}\n" for p, a in rules
            )
            robot_rows.append((host, body))
            for path in rng.sample(paths, 4) + [rand_path()]:
                url = f"https://{host}{path}"
                url_rows.append((host, url))
                expected[url] = self._rep_decide(rules, path)

        robots = self._robots(spark, robot_rows)
        urls = self._urls(spark, url_rows)
        got = {
            r.url: (r.allowed, r.matched_prefix)
            for r in robots_decisions(robots, urls).collect()
        }
        assert len(got) == len(expected)
        diverged = {
            u: (got[u], expected[u])
            for u in expected
            if got[u] != expected[u]
        }
        assert not diverged, f"{len(diverged)} divergences: {diverged}"
