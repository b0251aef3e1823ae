"""robots.txt matcher (functions/robots.py) against RFC 9309's own
examples: longest-match precedence, allow-on-tie, wildcards and end
anchors, group selection/merging, and the distributed kernel."""

from __future__ import annotations

from vearch_spark.functions.robots import parse_robots, robots_allowed_udf


def test_rfc_longest_match_examples():
    """RFC 9309 §5.2 example table: longest-match precedence with
    allow winning octet-length ties."""
    r = parse_robots(
        "user-agent: *\n"
        "allow: /example/page/\n"
        "disallow: /example/\n"
    )
    assert r.is_allowed("/example/page/") is True
    assert r.is_allowed("/example/other") is False
    assert r.is_allowed("/elsewhere") is True

    r = parse_robots(
        "user-agent: *\n"
        "allow: /example/page/\n"
        "disallow: /example/page/index.html\n"
    )
    assert r.is_allowed("/example/page/index.html") is False
    assert r.is_allowed("/example/page/other.html") is True

    # equal octet length -> allow wins (RFC: /page vs /*.ph class)
    r = parse_robots("user-agent: *\nallow: /page\ndisallow: /*.ph\n")
    assert r.is_allowed("/page") is True
    r = parse_robots("user-agent: *\nallow: /folder\ndisallow: /folder\n")
    assert r.is_allowed("/folder/page") is True  # tie -> allow


def test_wildcards_and_end_anchor():
    r = parse_robots(
        "user-agent: *\n"
        "disallow: /*.gif$\n"
        "disallow: /private*\n"
        "allow: /private/public\n"
    )
    assert r.is_allowed("/img/x.gif") is False
    assert r.is_allowed("/img/x.gif?cache=1") is True  # $ anchors the end
    assert r.is_allowed("/private/secret") is False
    assert r.is_allowed("/private/public") is True  # longer pattern wins
    assert r.is_allowed("/public") is True


def test_group_selection_and_merge():
    txt = (
        "user-agent: examplebot\n"
        "disallow: /only-example\n"
        "user-agent: *\n"
        "disallow: /everyone\n"
        "user-agent: examplebot\n"
        "disallow: /also-example\n"
        "user-agent: examplebot-news\n"
        "disallow: /news-only\n"
    )
    r = parse_robots(txt)
    # groups with the winning token MERGE (RFC 2.2.1)
    assert r.is_allowed("/only-example", "ExampleBot/1.2") is False
    assert r.is_allowed("/also-example", "ExampleBot/1.2") is False
    assert r.is_allowed("/everyone", "ExampleBot/1.2") is True  # not its group
    # most specific token wins over shorter prefix
    assert r.is_allowed("/news-only", "examplebot-news") is False
    assert r.is_allowed("/only-example", "examplebot-news") is True
    # unmatched agent falls back to *
    assert r.is_allowed("/everyone", "otherbot") is False
    assert r.is_allowed("/only-example", "otherbot") is True


def test_permissive_parse_and_edges():
    r = parse_robots(
        "# comment only\n"
        "disallow: /orphan-rule-before-any-group\n"
        "User-Agent: *\n"
        "Disallow:\n"            # empty pattern -> ignored
        "junk line without colon\n"
        "Crawl-delay: 2.5\n"
        "Sitemap: https://e.test/sitemap.xml\n"
        "disallow: /x # trailing comment\n"
    )
    assert r.is_allowed("/orphan-rule-before-any-group") is True
    assert r.is_allowed("/anything") is True
    assert r.is_allowed("/x/sub") is False
    assert r.crawl_delay("anybot") == 2.5
    assert r.sitemaps == ["https://e.test/sitemap.xml"]
    # empty robots / no matching group -> everything allowed
    assert parse_robots("").is_allowed("/a") is True


def test_distributed_kernel(spark):
    """robots_allowed_udf: domain-joined evaluation with a per-batch
    parse cache; NULL robots (no robots.txt) allows."""
    robots_a = "user-agent: *\ndisallow: /private\nallow: /private/ok\n"
    rows = [
        (0, robots_a, "/private/x", False),
        (1, robots_a, "/private/ok", True),
        (2, robots_a, "/public", True),
        (3, None, "/anything", True),
    ]
    df = spark.createDataFrame(
        [(i, rb, p) for i, rb, p, _ in rows],
        "id long, robots string, path string",
    )
    fn = robots_allowed_udf("testbot")
    got = {r.id: r.ok for r in df.select(
        "id", fn("robots", "path").alias("ok")).collect()}
    for i, _, _, want in rows:
        assert got[i] is want, (i, got[i])


def test_sitemap_parse_round_trip():
    from vearch_spark.functions.robots import parse_sitemap, sitemap_xml

    locs = ["https://e.test/a?x=1&y=2", "https://e.test/b", "https://e.test/<odd>"]
    lastmods = ["2024-01-02", None, "2024-03-04T05:06:07+00:00"]
    sm = parse_sitemap(sitemap_xml(locs, lastmods))
    assert sm["kind"] == "urlset"
    assert [e["loc"] for e in sm["entries"]] == locs  # entities round-trip
    assert [e["lastmod"] for e in sm["entries"]] == lastmods
    # sitemapindex kind + priority/changefreq fields
    idx = parse_sitemap(sitemap_xml(["https://e.test/s1.xml"], index=True))
    assert idx["kind"] == "sitemapindex" and len(idx["entries"]) == 1
    rich = parse_sitemap(
        "<urlset><url><loc>https://e.test/p</loc>"
        "<changefreq>daily</changefreq><priority>0.8</priority>"
        "</url><url><priority>0.1</priority></url></urlset>"
    )
    assert rich["entries"][0]["changefreq"] == "daily"
    assert rich["entries"][0]["priority"] == 0.8
    assert len(rich["entries"]) == 1  # loc-less entries dropped


def test_sitemap_typed_reject():
    import pytest as _pytest

    from vearch_spark.functions.robots import parse_sitemap

    with _pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html><body>nope</body></html>")
