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

from pyspark.sql import Column, DataFrame, Window
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


def parse_robots(bodies: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """(host, disallow_prefix, crawl_delay_s) — parse raw robots.txt bodies
    into the rule-table schema ``apply_robots`` broadcasts (north rule: the
    host->rule map is *derived from fetched robots.txt*, not handed in).

    Pure column expressions end to end — line split, comment strip, block
    tracking and directive extraction are all JVM-side (posexplode + one
    window per host ordered by line index); nothing row-at-a-time.

    Simplified-but-standard grammar (documented deviation from the full
    RFC 9309 longest-match model, which needs per-URL rule resolution):

      * lines split on ``\\r?\\n`` (CRLF-safe); ``#`` comments stripped; surrounding blanks
        trimmed; directive keys case-insensitive.
      * a *block header* is a maximal run of consecutive ``User-agent:``
        lines; the block's rules apply to us iff any header line names
        ``*`` (we crawl as the generic agent).
      * inside an applicable block, non-empty ``Disallow:`` values collect
        into ``disallow_prefix`` (sorted, distinct) and the last
        ``Crawl-delay:`` value (numeric) becomes ``crawl_delay_s``.
      * hosts whose body yields no applicable rules still emit a row with
        an empty prefix array (fully allowed), matching a missing rule row.

    Scale shape: robots bodies are small (<500 KB by convention) and one
    per host — the explode produces O(lines-per-host) rows shuffled once on
    host for the block window; output is the tiny dimension table the
    scheduling round broadcasts.
    """
    # split on \r?\n, not \n: most real servers serve CRLF robots.txt, and
    # trim() strips only spaces, so a bare-\n split would leave '\r' on every
    # value ('*' would never match and each CRLF host would silently parse
    # as fully allowed — a politeness regression). F.split takes a regex.
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("idx", "raw"),
    ).select(
        "host",
        "idx",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "idx",
        F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("key"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1, length(line))")
        ).alias("val"),
        (F.instr(F.col("line"), ":") > 0).alias("has_colon"),
    ).filter(F.col("has_colon"))
    is_ua = F.col("key") == "user-agent"
    w = Window.partitionBy("host").orderBy("idx")
    # block id: increments at each UA line that does NOT directly follow
    # another UA line (a maximal UA run is ONE header)
    blocked = parsed.withColumn(
        "__new_block",
        (is_ua & ~F.coalesce(F.lag(is_ua.cast("boolean")).over(w), F.lit(False)))
        .cast("int"),
    ).withColumn("block", F.sum("__new_block").over(w))
    # a block applies iff any of its header UA lines names '*'
    star_blocks = (
        blocked.filter(is_ua & (F.col("val") == "*"))
        .select("host", "block")
        .distinct()
    )
    rules = blocked.join(star_blocks, ["host", "block"], "left_semi").filter(~is_ua)
    agg = rules.groupBy("host").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        (F.col("key") == "disallow") & (F.col("val") != ""),
                        F.col("val"),
                    )
                )
            )
        ).alias("disallow_prefix"),
        F.expr(
            "max_by(case when key = 'crawl-delay' then try_cast(val as double) end,"
            " case when key = 'crawl-delay' then idx end)"
        ).alias("crawl_delay_s"),
    )
    # hosts with a body but no applicable block: fully-allowed row
    return (
        bodies.select(F.col(host_col).alias("host"))
        .distinct()
        .join(agg, "host", "left")
        .select(
            "host",
            F.coalesce("disallow_prefix", F.array().cast("array<string>")).alias(
                "disallow_prefix"
            ),
            "crawl_delay_s",
        )
    )


def sitemap_directives(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` directives from raw robots.txt.

    Per RFC 9309 §2.3 sitemap references stand OUTSIDE User-agent groups,
    so unlike ``parse_robots`` no block tracking is needed: every
    ``Sitemap:`` line applies regardless of position. This is the discovery
    link the crawl bootstrap chains: robots fetch -> sitemap URLs ->
    ``sources/sitemap.parse_sitemaps`` -> frontier seeds.

    Same line grammar as ``parse_robots`` (CRLF-safe split, ``#`` comment
    strip, case-insensitive keys, value = everything after the FIRST colon
    so the URL's own ``://`` survives). Duplicate directives collapse.

    Scale shape: map-side explode of small per-host bodies + one distinct;
    output is the tiny host->sitemap dimension the fetcher consumes.
    """
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("key"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1, length(line))")
        ).alias("val"),
        (F.instr(F.col("line"), ":") > 0).alias("has_colon"),
    ).filter(F.col("has_colon"))
    return (
        parsed.filter((F.col("key") == "sitemap") & (F.col("val") != ""))
        .select("host", F.col("val").alias("sitemap_url"))
        .distinct()
    )


#: LIKE-translation of the Google-robots wildcard grammar, shared VERBATIM
#: by both engines ('{r}' = the rule column). Escape LIKE metacharacters
#: with '!', turn '*' into '%', and honor a trailing '$' end-anchor by NOT
#: appending the implicit prefix-match '%'. Documented subset: '$' is only
#: meaningful at the end of a rule (elsewhere it matches literally, as in
#: the robots spec); no backslashes anywhere (the cross-engine escaping
#: trap).
WILDCARD_LIKE_EXPR = """case
  when right({r}, 1) = '$' then
    replace(replace(replace(replace(
      left({r}, length({r}) - 1),
      '!', '!!'), '%', '!%'), '_', '!_'), '*', '%')
  else
    replace(replace(replace(replace(
      {r},
      '!', '!!'), '%', '!%'), '_', '!_'), '*', '%') || '%'
end"""


def apply_robots_wildcard(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Wildcard-grammar robots evaluation — (url, allowed, winning_rule).

    The full (Google) robots match the prefix tier can't express: rules
    may contain ``*`` (any run) and a trailing ``$`` (end anchor);
    precedence is longest-rule-wins, allow beating disallow on ties —
    evaluated by translating each rule ONCE to a SQL LIKE pattern
    (``WILDCARD_LIKE_EXPR``, escape '!') and matching JVM-side — no
    Python anywhere. Spark's column-pattern LIKE compiles its matcher per
    evaluation, but the fan-out is bounded by the host's handful of rules
    (a hot literal rule can always be pivoted to a foldable predicate).

    ``rules``: (host, rule, allow boolean) — a small dimension, broadcast
    (the host->rule map of the north rule). Scale shape: broadcast equi
    join on host fans each URL out to only ITS host's handful of rules;
    the winner window partitions by url over that bounded fan-out (never
    the frontier alone). URLs of hosts with no matching rule default to
    allowed with an empty winning_rule.
    """
    from ..functions.urls import host_col as _host, path_col as _path

    f = frontier.select(
        url_col, _host(F.col(url_col)).alias("__h"), _path(F.col(url_col)).alias("__p")
    )
    r = rules.select(
        F.col("host").alias("__h"),
        "rule",
        "allow",
        F.expr(WILDCARD_LIKE_EXPR.format(r="rule")).alias("__pat"),
        F.length("rule").alias("__rlen"),
    )
    joined = f.join(F.broadcast(r), "__h", "left").withColumn(
        "__match",
        F.expr("__p like __pat escape '!'"),
    )
    w = Window.partitionBy(url_col).orderBy(
        F.desc("__rlen"), F.desc("allow"), F.asc("rule")
    )
    matched = (
        joined.filter(F.col("__match").eqNullSafe(F.lit(True)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(url_col, F.col("allow").alias("allowed"), F.col("rule").alias("winning_rule"))
    )
    return (
        f.select(url_col)
        .join(matched, url_col, "left")
        .select(
            url_col,
            F.coalesce("allowed", F.lit(True)).alias("allowed"),
            F.coalesce("winning_rule", F.lit("")).alias("winning_rule"),
        )
    )


def apply_robots_wildcard_sql(
    frontier_cte: str, rules_cte: str, host_expr: str, path_expr: str
) -> str:
    """Oracle twin: identical translation, LIKE match, and precedence.
    ``host_expr``/``path_expr`` extract host and path from f.url."""
    pat = WILDCARD_LIKE_EXPR.format(r="rule")
    return f"""
with f as ({frontier_cte}),
fx as (select url, {host_expr} as h, {path_expr} as p from f),
r as (
  select host as h, rule, allow, {pat} as pat, length(rule) as rlen
  from ({rules_cte})
),
m as (
  select fx.url, r.allow, r.rule,
         row_number() over (
           partition by fx.url
           order by r.rlen desc, r.allow desc, r.rule asc
         ) as rn
  from fx join r on fx.h = r.h
  where fx.p like r.pat escape '!'
)
select fx.url,
       coalesce(m.allow, true) as allowed,
       coalesce(m.rule, '') as winning_rule
from fx left join m on fx.url = m.url and m.rn = 1
"""
