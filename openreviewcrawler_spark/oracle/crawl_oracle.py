"""Single-threaded pure-Python crawl oracle.

Transliterates the reference crawler's sequential semantics
(/root/reference/crawler.py:15-111 — deterministic frontier order, seen-set
skip, fetch, parse, expand) into the web-crawl domain, with zero Spark. The
engine's distributed output must equal this oracle exactly: same ``fetch_seq``
sequence, same seen-set, byte-identical extracted text per url (BASELINE.json
north_rule / input_hint).

Shared primitives (canonicalize_url, extract_text, murmur3_str,
effective_budget_py) are imported from the engine modules so both sides
evaluate one definition — the *distribution* is what is under test.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.htmltext import extract_outlinks, extract_text
from ..functions.urls import canonicalize_url, host_of, path_of
from ..hashing import murmur3_str
from ..operators.robots import effective_budget_py, is_disallowed_py


@dataclass
class OracleResult:
    fetched: list[dict] = field(default_factory=list)  # fetch order rows
    seen: dict[str, int] = field(default_factory=dict)  # url -> round
    frontier: dict[str, tuple[int, int]] = field(default_factory=dict)  # url -> (seed, depth)
    metrics: list[dict] = field(default_factory=list)
    rounds_run: int = 0


def crawl_oracle(
    pages_rows: list[dict],
    seeds_rows: list[dict],
    robots_rows: list[dict],
    max_rounds: int = 5,
    default_budget: int = 8,
    round_seconds: float = 60.0,
    max_depth: int = 3,
    n_buckets: int = 32,
) -> OracleResult:
    pages = {p["url"]: p for p in pages_rows}
    robots = {r["host"]: r for r in robots_rows}

    res = OracleResult()
    frontier = res.frontier
    for s in sorted(seeds_rows, key=lambda r: r["seed_index"]):
        u = canonicalize_url(s["url"])
        if not host_of(u):
            continue
        cand = (int(s["seed_index"]), 0)
        if u not in frontier or cand < frontier[u]:
            frontier[u] = cand

    seq = 0
    for rnd in range(1, max_rounds + 1):
        candidates = [u for u in frontier if u not in res.seen]
        if not candidates:
            break
        res.rounds_run = rnd

        denied: list[str] = []
        allowed: list[str] = []
        for u in candidates:
            rule = robots.get(host_of(u))
            if rule is not None and is_disallowed_py(path_of(u), rule["disallow_prefix"]):
                denied.append(u)
            else:
                allowed.append(u)

        by_host: dict[str, list[str]] = {}
        for u in allowed:
            by_host.setdefault(host_of(u), []).append(u)

        admitted: list[str] = []
        for host, us in by_host.items():
            rule = robots.get(host)
            budget = effective_budget_py(
                rule["max_per_round"] if rule else None,
                rule["crawl_delay_s"] if rule else None,
                default_budget,
                round_seconds,
            )
            us.sort(key=lambda u: (frontier[u][0], frontier[u][1], u))
            admitted.extend(us[:budget])

        admitted.sort(key=lambda u: (frontier[u][0], frontier[u][1], u))

        n_fetched_by_bucket: dict[int, int] = {}
        n_sched_by_bucket: dict[int, int] = {}
        new_links: dict[str, tuple[int, int]] = {}
        for u in admitted:
            seed_index, depth = frontier[u]
            res.seen[u] = rnd
            bucket = murmur3_str(host_of(u)) % n_buckets
            n_sched_by_bucket[bucket] = n_sched_by_bucket.get(bucket, 0) + 1
            page = pages.get(u)
            if page is not None:
                n_fetched_by_bucket[bucket] = n_fetched_by_bucket.get(bucket, 0) + 1
                res.fetched.append(
                    {
                        "url": u,
                        "fetch_seq": seq,
                        "round": rnd,
                        "host": host_of(u),
                        "text": extract_text(page["html"]),
                        "lang": page["lang"],
                        "warc_ts": page["warc_ts"],
                    }
                )
                if depth < max_depth:
                    for raw in extract_outlinks(page["html"]):
                        link = canonicalize_url(raw)
                        if not host_of(link):
                            continue
                        cand = (seed_index, depth + 1)
                        if link not in new_links or cand < new_links[link]:
                            new_links[link] = cand
            seq += 1

        for u in denied:
            res.seen[u] = rnd
            del frontier[u]
        for u in admitted:
            del frontier[u]
        for link, cand in new_links.items():
            if link in res.seen:
                continue
            if link not in frontier or cand < frontier[link]:
                frontier[link] = cand

        buckets = sorted(set(n_sched_by_bucket) | set(n_fetched_by_bucket))
        for b in buckets:
            res.metrics.append(
                {
                    "round": rnd,
                    "host_bucket": b,
                    "n_scheduled": n_sched_by_bucket.get(b, 0),
                    "n_fetched": n_fetched_by_bucket.get(b, 0),
                }
            )
    return res
