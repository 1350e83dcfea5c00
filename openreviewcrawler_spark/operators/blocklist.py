"""Domain-suffix blocklist filtering — drop pages whose host, or any parent
domain of it, is on a block list.

Reference analog: the crawler restricts discovery with invitation pattern
filters (/root/reference/crawler.py:41-45 only follows configured venue
invitations); a web-scale corpus applies the same gate as a DOMAIN policy:
adult/malware/spam domain lists block a host and every subdomain under it
(``cdn.bad.example`` is blocked by a ``bad.example`` rule).

Matching semantics (exact): a host matches a rule iff the rule equals the
host or equals a dot-boundary suffix of it — i.e. one of the host's label
suffixes (``a.b.example`` -> {``a.b.example``, ``b.example``, ``example``}).
Plain substring matching would be wrong twice over (``notbad.example``
must NOT match ``bad.example``; ``bad.example.org`` must not match
``bad.example``).

Scale shape: policy blocklists are config artifacts (10^4-10^6 rules, far
under broadcast size), so the filter is a PURE PROJECTION — the label
suffixes are built with ``transform`` over the split host and probed
against a broadcast literal array; no shuffle, no join, rides the page
scan inside whole-stage codegen. For corpus-derived blocklists that
outgrow a broadcast, ``filter_blocklist_join`` explodes the (bounded,
~label-count) suffix list and anti-joins — the same two-shuffle shape as
the seen filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes_col(host: Column) -> Column:
    """Array of dot-boundary suffixes of ``host``, longest first."""
    labels = F.split(host, "[.]")
    # the lambda references `labels`/its size — plain attribute-backed
    # expressions, so the per-element re-inline is a couple of cheap nodes
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels) - i + 1), "."),
    )


def filter_blocklist(
    pages: DataFrame, blocked: list[str], host_col: str = "host"
) -> DataFrame:
    """Keep pages whose host matches no blocklist rule. Pure projection."""
    rules = F.array(*[F.lit(b) for b in sorted(blocked)])
    suffixes = host_suffixes_col(F.col(host_col))
    return pages.filter(F.size(F.array_intersect(suffixes, rules)) == 0)


def blocklist_verdict(
    pages: DataFrame, blocked: list[str], host_col: str = "host"
) -> DataFrame:
    """Explainable variant: every page with ``matched_rule`` (the longest —
    most specific — matching rule, '' if none) and a ``kept`` flag."""
    rules = F.array(*[F.lit(b) for b in sorted(blocked)])
    suffixes = host_suffixes_col(F.col(host_col))
    hits = F.array_intersect(suffixes, rules)
    # host_suffixes_col emits longest-first and array_intersect preserves
    # the first argument's order, so hits[0] is the most specific rule
    # (try_element_at: ANSI mode errors on element_at of an empty array)
    return pages.withColumn(
        "matched_rule", F.coalesce(F.try_element_at(hits, F.lit(1)), F.lit(""))
    ).withColumn("kept", F.size(hits) == 0)


def filter_blocklist_join(
    pages: DataFrame, rules: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Anti-join variant for blocklists too large to broadcast as a literal:
    explode each page's ~|labels| suffixes, semi-match against the rule
    table, anti-join the hit ids back. ``rules`` has one column ``rule``."""
    keyed = pages.withColumn("__suffix", F.explode(host_suffixes_col(F.col(host_col))))
    hit_ids = (
        keyed.join(rules, keyed["__suffix"] == rules["rule"], "leftsemi")
        .select(host_col)
        .distinct()
    )
    return pages.join(hit_ids, host_col, "left_anti")
