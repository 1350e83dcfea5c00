"""Deterministic synthetic crawl fixtures (FIXTURES.md §1-3).

Generates the ``pages`` / ``seeds`` / ``robots`` tables used by the parity
tests and the bench: Common-Crawl-style pages with Zipf host skew, embedded
outlinks, dirty URL variants that canonicalize to clean twins, and expected
extracted text constructed *alongside* the HTML (so oracle-vs-engine byte
equality is a real check, not a tautology).

Everything is seeded (seed=42 default), wall-clock-free.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

from ..functions.urls import canonicalize_url

_EPOCH = datetime(2026, 1, 1, 0, 0, 0)
_LANGS = ["en"] * 8 + ["de", "fr"]


@dataclass
class CrawlFixture:
    pages: pd.DataFrame  # url, warc_ts, html(bytes), text, lang
    seeds: pd.DataFrame  # seed_index, url
    robots: pd.DataFrame  # host, disallow_prefix, crawl_delay_s, max_per_round
    n_hosts: int = 0
    outlinks: dict[str, list[str]] = field(default_factory=dict)  # canon url -> raw hrefs


def _dirtify(url: str, variant: int) -> str:
    """Produce a dirty spelling that canonicalizes back to ``url``."""
    if variant == 0:
        scheme, rest = url.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if variant == 1:
        return url.replace(".example/", ".example:443/", 1)
    if variant == 2:
        return url + "#frag"
    if variant == 3:
        return url.replace("/p/", "/%70/", 1)
    return url


def _page_content(i: int, host: str) -> tuple[str, str]:
    """Return (body_html_without_links, expected_clean_text)."""
    title_txt = f"T{i} {host} page"
    paras_txt = [f"para {i} alpha", f"para {i} beta"]
    if i % 7 == 0:
        # entity + inner-tag + whitespace noise that cleans back to the text
        title_html = f"T{i}   {host}&nbsp;page"
        para_html = [f"para&nbsp;{i} <b>alpha</b>", f"para \n {i}\tbeta"]
        paras_txt = [f"para {i} alpha", f"para {i} beta"]
    elif i % 7 == 3:
        title_html = f"T{i} {host} page"
        para_html = [f"para {i} &amp;alpha", f"para {i} &lt;beta&gt;"]
        paras_txt = [f"para {i} &alpha", f"para {i} <beta>"]
    else:
        title_html = title_txt
        para_html = list(paras_txt)
    tag_t, tag_p = ("TITLE", "P") if i % 11 == 0 else ("title", "p")
    body = f"<{tag_t}>{title_html}</{tag_t}></head><body>" + "".join(
        f"<{tag_p}>{p}</{tag_p}>" for p in para_html
    )
    text = "\n".join([title_txt] + paras_txt)
    return body, text


def build_fixture(
    n_pages: int = 2000,
    n_hosts: int = 120,
    n_seeds: int = 40,
    seed: int = 42,
    max_outlinks: int = 3,
) -> CrawlFixture:
    rng = random.Random(seed)

    # Zipf-ish host skew: weight 1/(h+1)^1.3 — host0000 is deliberately hot.
    weights = [1.0 / (h + 1) ** 1.3 for h in range(n_hosts)]
    host_idx = rng.choices(range(n_hosts), weights=weights, k=n_pages)

    urls = [f"https://host{host_idx[i]:04d}.example/p/{i}" for i in range(n_pages)]

    rows = []
    outlink_map: dict[str, list[str]] = {}
    for i in range(n_pages):
        host = f"host{host_idx[i]:04d}.example"
        body, text = _page_content(i, host)
        n_links = rng.randint(0, max_outlinks)
        hrefs = []
        for _ in range(n_links):
            j = rng.randrange(n_pages)
            raw = urls[j]
            v = rng.randint(0, 6)  # ~4/7 links are dirty spellings
            if v < 4:
                raw = _dirtify(raw, v)
            hrefs.append(raw)
        links_html = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        html = f"<html><head>{body}{links_html}</body></html>"
        rows.append(
            {
                "url": urls[i],
                "warc_ts": _EPOCH + timedelta(seconds=17 * i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": _LANGS[i % 10],
            }
        )
        outlink_map[urls[i]] = hrefs
    pages = pd.DataFrame(rows)

    # seeds: sampled urls, some dirty, some duplicate post-canonicalization,
    # two absent from pages (fetch-miss path)
    seed_urls: list[str] = []
    picks = rng.sample(range(n_pages), min(n_seeds - 2, n_pages))
    for idx, j in enumerate(picks):
        u = urls[j]
        v = rng.randint(0, 7)
        if v < 4:
            u = _dirtify(u, v)
        seed_urls.append(u)
        if idx % 9 == 0:  # duplicate under canonicalization
            seed_urls.append(_dirtify(urls[j], (v + 1) % 4))
    seed_urls = seed_urls[: n_seeds - 2]
    seed_urls.append("https://host9999.example/p/1000001")  # fetch misses
    seed_urls.append("https://host9998.example/p/1000002")
    seeds = pd.DataFrame({"seed_index": range(len(seed_urls)), "url": seed_urls})

    # robots: every 10th host + the 3 hottest
    robot_hosts = sorted({*range(0, n_hosts, 10), 0, 1, 2})
    rob_rows = []
    for n, h in enumerate(robot_hosts):
        rob_rows.append(
            {
                "host": f"host{h:04d}.example",
                "disallow_prefix": ["/p/1"] if n % 2 == 0 else [],
                "crawl_delay_s": 5.0 if n in (1, 3) else 0.0,
                "max_per_round": [2, 5, 50][n % 3],
            }
        )
    robots = pd.DataFrame(rob_rows)

    for u in urls:
        assert canonicalize_url(u) == u
    return CrawlFixture(pages, seeds, robots, n_hosts=n_hosts, outlinks=outlink_map)


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
SEEDS_SCHEMA = "seed_index int, url string"
ROBOTS_SCHEMA = (
    "host string, disallow_prefix array<string>, crawl_delay_s double, max_per_round int"
)


def fixture_to_spark(spark, fx: CrawlFixture):
    pages = spark.createDataFrame(fx.pages, schema=PAGES_SCHEMA)
    seeds = spark.createDataFrame(fx.seeds, schema=SEEDS_SCHEMA)
    robots = spark.createDataFrame(fx.robots, schema=ROBOTS_SCHEMA)
    return pages, seeds, robots
