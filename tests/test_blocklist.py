"""(host, path_prefix) blocklist filtering."""

from __future__ import annotations

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
