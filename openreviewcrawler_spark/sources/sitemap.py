"""Sitemap source — parse sitemap.xml bodies into seed/frontier rows.

The reference discovers work from a fixed config grid
(/root/reference/crawler.py:41-45); a web-scale crawler additionally
bootstraps its frontier from each host's sitemap. This parser turns raw
``sitemap.xml`` bodies (one row per host, fetched like any other page) into
``(host, pos, url, lastmod, priority)`` rows ready for
``plans.crawl.seeds_to_frontier`` — ``lastmod`` feeds the recrawl-freshness
scheduler (operators/freshness), ``priority`` the frontier ranking.

Scale shape: pure JVM regexp column expressions over the body string —
no XML library, no Python UDF, no shuffle (the explode is map-side). A
100 TB pages table yields sitemap rows in the same scan that classifies
content types; hosts without a sitemap simply emit zero rows.

The grammar is the minimal sitemap-protocol subset: ``<url>`` entries with
``<loc>`` (required; entries without it are dropped), optional ``<lastmod>``
and ``<priority>``. Non-greedy ``<url>(.*?)</url>`` matching keeps entries
separate; both Java regex (Spark) and RE2 (DuckDB oracle) support lazy
quantifiers with identical semantics on this grammar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_sitemaps(bodies: DataFrame) -> DataFrame:
    """bodies(host, body) -> (host, pos, url, lastmod, priority).

    ``pos`` is the 0-based entry position within the host's sitemap (document
    order is meaningful: large sites list important URLs first, and the
    frontier tie-break wants a deterministic intra-host order). ``lastmod``
    stays a string (ISO date) — casting is the consumer's choice; empty
    optional fields surface as NULL.
    """
    # (?s): real sitemaps are pretty-printed, so a <url> entry spans lines;
    # default-mode '.' matches no newline in BOTH Java regex and RE2, and a
    # single-line-only fixture would silently yield zero/partial rows on real
    # input. (?s) is supported identically by Java regex (Spark) and RE2
    # (DuckDB oracle).
    entries = F.regexp_extract_all(F.col("body"), F.lit(r"(?s)<url>(.*?)</url>"), 1)
    e = bodies.select("host", F.posexplode(entries).alias("pos", "entry"))
    loc = F.regexp_extract(F.col("entry"), r"<loc>([^<]*)</loc>", 1)
    lastmod = F.regexp_extract(F.col("entry"), r"<lastmod>([^<]*)</lastmod>", 1)
    prio = F.regexp_extract(F.col("entry"), r"<priority>([^<]*)</priority>", 1)
    return (
        e.select(
            "host",
            "pos",
            loc.alias("url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(prio != "", prio).cast("double").alias("priority"),
        )
        .filter(F.col("url") != "")
    )


def parse_sitemap_index(bodies: DataFrame) -> DataFrame:
    """bodies(host, body) -> (host, pos, sitemap_url, lastmod).

    The sitemap-protocol INDEX layer: sites past the 50k-URL /
    50 MB per-file limit shard their sitemaps and publish a
    ``<sitemapindex>`` of ``<sitemap><loc>...</loc>`` entries — exactly
    what large hosts (the ones a 10^10-URL frontier cares about) serve.
    The crawler fetches the children this parser emits, then feeds each
    child body through ``parse_sitemaps``; ``lastmod`` lets the scheduler
    skip child sitemaps unchanged since the last crawl (pairs with
    ``crawl_conditional_get`` to spend revalidation headers, not bodies).

    Same scale shape and grammar discipline as ``parse_sitemaps``: pure
    JVM regexp expressions, map-side posexplode, no shuffle, ``(?s)`` on
    the entry splitter because real indexes are pretty-printed (the r4
    ADVICE lesson), entries without ``<loc>`` dropped.
    """
    entries = F.regexp_extract_all(
        F.col("body"), F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1
    )
    e = bodies.select("host", F.posexplode(entries).alias("pos", "entry"))
    loc = F.regexp_extract(F.col("entry"), r"<loc>([^<]*)</loc>", 1)
    lastmod = F.regexp_extract(F.col("entry"), r"<lastmod>([^<]*)</lastmod>", 1)
    return (
        e.select(
            "host",
            "pos",
            loc.alias("sitemap_url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("sitemap_url") != "")
    )
