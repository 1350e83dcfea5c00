"""Sitemap source parsing + WARC-style sharded sink layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from openreviewcrawler_spark.sources.sitemap import parse_sitemaps
from openreviewcrawler_spark.sources.warc import warc_layout


def test_parse_sitemaps_grammar(spark):
    """Entries keep document order per host; optional fields go NULL; a
    loc-less entry is dropped (but still consumes a position — the index is
    the raw entry position, stable regardless of later filtering)."""
    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.example/1</loc>"
        "<lastmod>2026-03-04</lastmod><priority>0.8</priority></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: dropped
        "<url><loc>https://a.example/2</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("a", body), ("b", "<urlset></urlset>")],
                               "host string, body string")
    rows = {(r["host"], r["pos"]): r for r in parse_sitemaps(df).collect()}
    assert set(rows) == {("a", 0), ("a", 2)}
    assert rows[("a", 0)]["lastmod"] == "2026-03-04"
    assert rows[("a", 0)]["priority"] == 0.8
    assert rows[("a", 2)]["url"] == "https://a.example/2"
    assert rows[("a", 2)]["lastmod"] is None and rows[("a", 2)]["priority"] is None


def test_warc_layout_offsets_contiguous(spark):
    """Within every shard, offsets tile the file exactly: record k+1 starts
    where record k ends, first record at 0 — the property that lets the
    index be written in the same pass as the archive bytes."""
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.repeat(F.lit("x"), (F.col("id") % 17 + 1).cast("int")).alias("text"),
    )
    out = warc_layout(docs, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["offset"] == pos, (shard, r)
            assert r["record_len"] > 0
            pos += r["record_len"]


def test_warc_layout_deterministic_across_parallelism(spark):
    """The layout must be identical however the input is partitioned."""
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.lit("payload text").alias("text"),
    )
    a = sorted(map(tuple, warc_layout(docs.repartition(1), 4).collect()))
    b = sorted(map(tuple, warc_layout(docs.repartition(13), 4).collect()))
    assert a == b


def test_sitemap_rows_feed_frontier(spark):
    """parse_sitemaps output plugs straight into seeds_to_frontier: urls
    canonicalize, dedup by canonical form, and get host/priority columns —
    the sitemap bootstrap path end to end."""
    from openreviewcrawler_spark.plans.crawl import seeds_to_frontier

    body = (
        "<urlset>"
        "<url><loc>HTTPS://A.example/x#frag</loc></url>"  # dirty spelling
        "<url><loc>https://a.example/x</loc></url>"  # same canonical url
        "<url><loc>https://b.example/y</loc></url>"
        "</urlset>"
    )
    sm = parse_sitemaps(
        spark.createDataFrame([("a.example", body)], "host string, body string")
    )
    seeds = sm.select(F.col("pos").cast("int").alias("seed_index"), "url")
    frontier = seeds_to_frontier(seeds).collect()
    got = {(r["url"], r["host"], r["seed_index"]) for r in frontier}
    # both spellings collapse to one canonical row keeping the smaller pos
    assert got == {
        ("https://a.example/x", "a.example", 0),
        ("https://b.example/y", "b.example", 2),
    }


def test_resolve_redirects_chains_and_loops(spark):
    """Chains resolve to their terminal with true hop counts; members of a
    redirect loop (and chains feeding one) come back resolved=false and are
    never followed forever. Pointer doubling: 5 rounds cover 32-hop chains."""
    from openreviewcrawler_spark.operators.redirects import resolve_redirects

    edges = [("a", "b"), ("b", "c"), ("c", "d"),  # 3-hop chain to terminal d
             ("x", "y"), ("y", "x"),              # 2-loop
             ("w", "x")]                          # feeder into the loop
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = {r["src"]: r for r in resolve_redirects(df, rounds=5).collect()}
    assert rows["a"]["final_url"] == "d" and rows["a"]["hops"] == 3
    assert rows["b"]["final_url"] == "d" and rows["b"]["hops"] == 2
    assert rows["c"]["final_url"] == "d" and rows["c"]["hops"] == 1
    assert rows["a"]["resolved"] and rows["b"]["resolved"] and rows["c"]["resolved"]
    for loop_member in ("x", "y", "w"):
        assert not rows[loop_member]["resolved"]


def test_parse_sitemaps_pretty_printed_multiline(spark):
    """Real sitemaps are pretty-printed: <url> entries span lines. Default-mode
    '.' matches no newline in Java regex or RE2, so without (?s) a multi-line
    entry silently yields zero rows (r4 ADVICE finding)."""
    body = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url>\n    <loc>https://m.example/a</loc>\n"
        "    <lastmod>2026-03-01</lastmod>\n    <priority>0.8</priority>\n  </url>\n"
        "  <url>\n    <loc>https://m.example/b</loc>\n  </url>\n"
        "</urlset>\n"
    )
    df = spark.createDataFrame([("m.example", body)], "host string, body string")
    rows = sorted(parse_sitemaps(df).collect(), key=lambda r: r["pos"])
    assert [r["url"] for r in rows] == ["https://m.example/a", "https://m.example/b"]
    assert rows[0]["lastmod"].strip() == "2026-03-01"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] is None


def test_parse_sitemap_index_grammar(spark):
    from openreviewcrawler_spark.sources.sitemap import parse_sitemap_index

    body = (
        '<?xml version="1.0"?><sitemapindex>\n'
        "<sitemap>\n  <loc>https://a.example/sm-1.xml</loc>\n"
        "  <lastmod>2026-03-01</lastmod>\n</sitemap>\n"
        "<sitemap><lastmod>2026-03-02</lastmod></sitemap>\n"  # no loc: dropped
        "<sitemap><loc>https://a.example/sm-2.xml</loc></sitemap>\n"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([("a", body), ("b", "<html>no index</html>")],
                               "host string, body string")
    rows = {(r["host"], r["pos"]): r for r in parse_sitemap_index(df).collect()}
    # multiline entry parses (the (?s) lesson); pos counts RAW entries
    assert rows[("a", 0)]["sitemap_url"] == "https://a.example/sm-1.xml"
    assert rows[("a", 0)]["lastmod"] == "2026-03-01"
    assert rows[("a", 2)]["sitemap_url"] == "https://a.example/sm-2.xml"
    assert rows[("a", 2)]["lastmod"] is None
    assert ("a", 1) not in rows  # loc-less entry dropped
    assert not any(h == "b" for h, _ in rows)  # non-index body: zero rows
