"""Native-Column URL canonicalization (corpus-scale URL dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_content_extractor_spark.functions.urlnorm import canonical_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    return {r.url: r.c for r in rows}


def test_case_port_fragment_and_param_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/Path?b=2&utm_source=x&a=1#frag",
            "https://example.com:443/p",
            "https://example.com:8080/p",
            "https://example.com",
            "https://example.com?utm_campaign=y&gclid=123",
            "https://user:pw@example.com/secret",
        ],
    )
    # scheme/host lowered, default port + fragment dropped, tracking
    # stripped, params sorted; path case preserved
    assert got[
        "HTTP://WWW.Example.COM:80/Path?b=2&utm_source=x&a=1#frag"
    ] == "http://www.example.com/Path?a=1&b=2"
    assert got["https://example.com:443/p"] == "https://example.com/p"
    assert got["https://example.com:8080/p"] == "https://example.com:8080/p"
    assert got["https://example.com"] == "https://example.com/"
    # tracking-only query -> no '?' at all
    assert got[
        "https://example.com?utm_campaign=y&gclid=123"
    ] == "https://example.com/"
    # userinfo dropped
    assert got[
        "https://user:pw@example.com/secret"
    ] == "https://example.com/secret"


def test_non_http_and_garbage_canonicalize_to_null(spark):
    got = _canon(
        spark,
        ["ftp://example.com/x", "mailto:a@b.com", "not a url", ""],
    )
    assert all(v is None for v in got.values())


def test_tracking_match_is_case_insensitive_and_anchored(spark):
    got = _canon(
        spark,
        [
            "https://e.com/p?UTM_SOURCE=x&a=1",   # case-insensitive strip
            "https://e.com/p?myutm_source=x",     # anchored: kept
            "https://e.com/p?gclid2=x",           # 'gclid' must match whole key
        ],
    )
    assert got["https://e.com/p?UTM_SOURCE=x&a=1"] == "https://e.com/p?a=1"
    assert got["https://e.com/p?myutm_source=x"] == (
        "https://e.com/p?myutm_source=x"
    )
    assert got["https://e.com/p?gclid2=x"] == "https://e.com/p?gclid2=x"


def test_click_noise_twins_canonicalize_equal(spark):
    a = "https://Shop.Example.com/item/7?color=red&utm_medium=email"
    b = "HTTPS://shop.example.com:443/item/7?utm_source=nl&color=red#top"
    got = _canon(spark, [a, b])
    assert got[a] == got[b] == "https://shop.example.com/item/7?color=red"
