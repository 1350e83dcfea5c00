"""Distributed synthetic crawl corpus for benchmarking.

Unlike ``fixtures.build_fixture`` (driver-side pandas, sized for parity
tests), this generator builds ``pages`` / ``seeds`` / ``robots`` entirely
with column expressions over ``spark.range`` — no driver materialization, so
it scales to any row count (the 10^10 design point is the same plan with a
bigger range). Fully deterministic: content derives from the row id only.

The generated HTML round-trips through ``functions.htmltext.extract_text``
to exactly the expected text (title + 2 paragraphs), so the parse stage does
real work per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EPOCH_S = 1767225600  # 2026-01-01 UTC, fixed (engine bans wall-clock)


def _host(i, n_hosts: int):
    return F.concat(
        F.lit("host"), F.lpad((i % n_hosts).cast("string"), 5, "0"), F.lit(".example")
    )


def _url(i, n_hosts: int):
    return F.concat(F.lit("https://"), _host(i, n_hosts), F.lit("/p/"), i.cast("string"))


def synth_pages(
    spark: SparkSession, n_pages: int, n_hosts: int, n_paras: int = 8
) -> DataFrame:
    """pages(url, warc_ts, html binary, text, lang) — generated distributively.

    ``n_paras`` scales per-page size/parse cost (8 paras ~ 1.3 KB html;
    real web pages are an order larger — the bench raises this so the parse
    stage carries realistic CPU weight)."""
    i = F.col("id")
    host = _host(i, n_hosts)
    url = _url(i, n_hosts)
    l1 = _url((i * 7 + 1) % n_pages, n_hosts)
    l2 = _url((i * 13 + 5) % n_pages, n_hosts)
    istr = i.cast("string")
    title = F.concat(F.lit("T"), istr, F.lit(" "), host, F.lit(" page"))
    # paragraphs with inner markup + entities so the parse stage does
    # realistic per-page work (tag strip, entity decode, ws collapse)
    filler = "lorem ipsum dolor sit amet " * 4
    paras_html = []
    paras_text = []
    for p in range(n_paras):
        ph = F.concat(
            F.lit(f"para {p} <b>bold"), istr, F.lit(f"</b> {filler}&amp;tail")
        )
        pt = F.concat(
            F.lit(f"para {p} bold"), istr, F.lit(f" {filler}&tail")
        )
        paras_html.append(ph)
        paras_text.append(pt)
    body_parts = [F.lit("<html><head><title>"), title, F.lit("</title></head><body>")]
    for ph in paras_html:
        body_parts += [F.lit("<p>"), ph, F.lit("</p>")]
    body_parts += [F.lit('<a href="'), l1, F.lit('">x</a><a href="'), l2,
                   F.lit('">x</a></body></html>')]
    html = F.concat(*body_parts)
    text_parts = [title]
    for pt in paras_text:
        text_parts += [F.lit("\n"), pt]
    text = F.concat(*text_parts)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("en", "en", "en", "de", "fr")]),
        (i % 5 + 1).cast("int"),
    )
    return spark.range(n_pages).select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_S) + i % 86400).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def synth_seeds(spark: SparkSession, n_pages: int, n_hosts: int) -> DataFrame:
    """seeds(seed_index, url) — every page seeded; half the spellings dirty
    (uppercase scheme/host) so canonicalization does real work."""
    i = F.col("id")
    clean = _url(i, n_hosts)
    dirty = F.concat(
        F.lit("HTTPS://"),
        F.upper(_host(i, n_hosts)),
        F.lit("/p/"),
        i.cast("string"),
        F.lit("#frag"),
    )
    return spark.range(n_pages).select(
        (i % 997).cast("int").alias("seed_index"),
        F.when(i % 2 == 0, clean).otherwise(dirty).alias("url"),
    )


def synth_seen(spark: SparkSession, n_pages: int, n_hosts: int, every: int = 5) -> DataFrame:
    """seen(url, url_hash, round) — every ``every``-th url pre-seen."""
    i = F.col("id") * every
    url = _url(i, n_hosts)
    return spark.range(n_pages // every).select(
        url.alias("url"),
        F.hash(url).alias("url_hash"),
        F.lit(0).cast("int").alias("round"),
    )


def synth_robots(spark: SparkSession, n_hosts: int, budget: int) -> DataFrame:
    """robots dim — one rule per host; 1-in-16 hosts disallow /p/1 prefixes,
    the rest carry an explicit per-round cap."""
    h = F.col("id")
    host = F.concat(F.lit("host"), F.lpad(h.cast("string"), 5, "0"), F.lit(".example"))
    return spark.range(n_hosts).select(
        host.alias("host"),
        F.when(h % 16 == 0, F.array(F.lit("/p/1"))).alias("disallow_prefix"),
        F.lit(None).cast("double").alias("crawl_delay_s"),
        F.lit(budget).cast("int").alias("max_per_round"),
    )
