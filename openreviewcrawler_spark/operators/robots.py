"""Robots/politeness rules — broadcast host->rule map (north rule).

The reference needed no politeness (OpenReview allows unlimited request rate,
/root/reference/README.md:164-167), so the budget is a *parameter* whose
reference value is infinity; tests pin finite values.

``robots`` is a small dimension table ``(host, disallow_prefix array<string>,
crawl_delay_s double, max_per_round int)``. We broadcast-join it onto the
candidate set (Catalyst's broadcast hash join IS the host->rule map broadcast)
and evaluate the prefix-disallow predicate with built-in array expressions —
fully JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import path_col

ROBOTS_COLS = ("disallow_prefix", "crawl_delay_s", "max_per_round")


def effective_budget_col(default_budget: int, round_seconds: float) -> Column:
    """Per-host admit budget for one scheduling round.

    budget = min(max_per_round, floor(round_seconds / crawl_delay_s)),
    each term defaulting to ``default_budget`` when the rule is absent.
    Deterministic — derived from config, never from wall-clock.
    """
    cap = F.coalesce(F.col("max_per_round"), F.lit(default_budget))
    delay_cap = F.when(
        F.col("crawl_delay_s").isNotNull() & (F.col("crawl_delay_s") > 0),
        F.greatest(F.lit(1), F.floor(F.lit(round_seconds) / F.col("crawl_delay_s"))),
    ).otherwise(F.lit(default_budget))
    return F.least(cap, delay_cap).cast("int")


def effective_budget_py(
    max_per_round: int | None,
    crawl_delay_s: float | None,
    default_budget: int,
    round_seconds: float,
) -> int:
    """Python twin of :func:`effective_budget_col` (oracle side)."""
    cap = max_per_round if max_per_round is not None else default_budget
    if crawl_delay_s is not None and crawl_delay_s > 0:
        delay_cap = max(1, int(round_seconds // crawl_delay_s))
    else:
        delay_cap = default_budget
    return min(cap, delay_cap)


def apply_robots(
    candidates: DataFrame,
    robots: DataFrame,
    default_budget: int,
    round_seconds: float,
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """Return (allowed_with_budget, denied).

    ``allowed`` gains a ``budget`` int column; ``denied`` keeps the candidate
    schema (rows matching a disallow prefix). Hosts with no robots row are
    fully allowed at the default budget.
    """
    joined = candidates.join(
        F.broadcast(robots.select("host", *ROBOTS_COLS)), "host", "left"
    )
    path = path_col(F.col(url_col))
    disallowed = F.when(F.col("disallow_prefix").isNull(), F.lit(False)).otherwise(
        F.exists("disallow_prefix", lambda p: path.startswith(p))
    )
    flagged = joined.withColumn("__denied", disallowed)
    denied = flagged.filter(F.col("__denied")).select(*candidates.columns)
    allowed = (
        flagged.filter(~F.col("__denied"))
        .withColumn("budget", effective_budget_col(default_budget, round_seconds))
        .select(*candidates.columns, "budget")
    )
    return allowed, denied


def is_disallowed_py(path: str, disallow_prefix: list[str] | None) -> bool:
    """Python twin of the disallow predicate (oracle side)."""
    if not disallow_prefix:
        return False
    return any(path.startswith(p) for p in disallow_prefix)
