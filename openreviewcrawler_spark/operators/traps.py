"""Crawl-trap detection — URL-shape heuristics flagging spider traps.

A 10^10-URL frontier inevitably contains *trap* hosts: CGI calendars that
mint a fresh page per day forever, session-id query explosions, and symlink
loops that grow the path by a repeating segment pair on every hop. The
reference crawler never met these (OpenReview's API space is finite), but a
Common-Crawl-style frontier (BASELINE.json north_star) must shed them BEFORE
fetch, or politeness budgets are spent on garbage. Standard heuristics per
Heydon & Najork's Mercator paper (PAPERS.md) — all implemented as codegen'd
column expressions over the URL string, no UDF, no shuffle:

* **segment repetition** — the same path segment appearing k extra times is
  the signature of a loop trap (``/cat/p/cat/p/cat/p``): measured as
  ``n_segments - n_distinct_segments``.
* **calendar trap** — two or more ``/YYYY/``-shaped segments.
* **query explosion** — parameter count past a threshold.
* **pathological depth / length** — ``n_segments`` and raw URL length caps.

``trap_score`` is an integer vote over those signals; the verdict buckets
(ok / suspect / trap) feed the frontier as a priority demotion (suspect) or
a drop (trap), both plain filters that Catalyst pushes into the frontier
scan. Every expression here is per-row and engine-deterministic (integer
arithmetic only), so the DuckDB oracle states the same algebra independently
(catalog.SQL_CRAWL_TRAP_DETECT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: signal thresholds (module constants so the SQL oracle can mirror them)
DUP_SEGMENTS = 2  #: >= 2 repeated path segments -> loop suspicion
MAX_PARAMS = 6  #: >= 6 query parameters -> query explosion
DATE_SEGMENTS = 2  #: >= 2 /YYYY/ segments -> calendar trap
MAX_DEPTH = 12  #: >= 12 path segments -> pathological depth
MAX_URL_LEN = 300  #: >= 300 chars -> pathological length

#: no backslash (CLAUDE.md: Spark SQL literals eat them); RE2- and Java-safe
_DATE_SEG_RE = "/(19|20)[0-9][0-9]/"


def _path(url: Column) -> Column:
    # path only (no query/fragment) from a canonical URL
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)


def _query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def trap_signal_cols(url: Column) -> dict[str, Column]:
    """The five trap signals as named integer columns (all codegen)."""
    path, query = _path(url), _query(url)
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    n_seg = F.size(segs)
    return {
        "n_segments": n_seg.cast("int"),
        "n_dup_segments": (n_seg - F.size(F.array_distinct(segs))).cast("int"),
        "n_params": F.when(query == "", F.lit(0))
        .otherwise(F.size(F.split(query, "&")))
        .cast("int"),
        "n_date_segments": F.regexp_count(path, F.lit(_DATE_SEG_RE)).cast("int"),
        "url_len": F.length(url).cast("int"),
    }


def trap_score_col(s: dict[str, Column]) -> Column:
    """Integer vote: loop and query-explosion signals weigh 2, the rest 1."""
    return (
        2 * (s["n_dup_segments"] >= DUP_SEGMENTS).cast("int")
        + 2 * (s["n_params"] >= MAX_PARAMS).cast("int")
        + (s["n_date_segments"] >= DATE_SEGMENTS).cast("int")
        + (s["n_segments"] >= MAX_DEPTH).cast("int")
        + (s["url_len"] >= MAX_URL_LEN).cast("int")
    ).cast("int")


def classify_traps(frontier: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the signals, ``trap_score`` and a ``verdict`` bucket.

    ``trap`` rows are dropped from the fetch batch; ``suspect`` rows keep
    crawling at demoted priority (the admit stage already orders by
    priority, operators/scheduler.py). Pure projection — at 100 TB this
    rides the frontier scan with zero extra shuffle.
    """
    sig = trap_signal_cols(F.col(url_col))
    out = frontier
    for name, col in sig.items():
        out = out.withColumn(name, col)
    score = trap_score_col({k: F.col(k) for k in sig})
    return out.withColumn("trap_score", score).withColumn(
        "verdict",
        F.when(F.col("trap_score") >= 3, F.lit("trap"))
        .when(F.col("trap_score") >= 1, F.lit("suspect"))
        .otherwise(F.lit("ok")),
    )
