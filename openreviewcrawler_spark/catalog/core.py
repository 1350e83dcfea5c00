"""core family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

from __future__ import annotations
from collections.abc import Callable
from dataclasses import dataclass
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.urls import canonicalize_col, host_col
from ..operators import dedup, multimodal, similarity
from ..operators.labeling import label_row
from ..operators.comment_tree import reply_forest
from ..operators.ordering import assign_seq_scalable
from ..operators.robots import apply_robots
from ..operators.scheduler import admit
from ..operators.seen import anti_join_seen
from ..operators.stats import (
    attach_notes_with_misses,
    count_histogram,
    note_type_col,
    orphan_metrics,
)
from ..operators.textstats import (
    fingerprint_cols,
    lang_id_col,
    quality_score_cols,
    token_count_cols,
)
from ..plans.crawl import seeds_to_frontier
from ._shared import (
    _H32,
    _SQL_TOKENS,
    _t,
)



def q_anchor_text_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation — the classic web-search signal: the text of
    inbound links describes the TARGET page (often better than the page
    itself), feeding ranking and quality features. Per destination:
    inlink count, distinct anchor count, and the dominant anchor
    (max count, ties broken by lexicographically smallest anchor).

    Scale shape: one groupBy(dst, anchor) with map-side partial counts over
    the raw link table, then the top-1 window runs over the ALREADY
    AGGREGATED (dst, anchor) table — orders of magnitude smaller than the
    link table, so the per-dst sort never touches raw 100 TB rows. Edges
    reuse the link_rank synthesis; anchors = the source doc's first two
    tokens."""
    from ..operators.textstats import tokens_col

    docs = _t(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    links = docs.select(
        ((F.col("doc_id") * 7 + 3) % 100).alias("dst"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("anchor"),
    )
    per = links.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    top = (
        per.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("dst", F.col("anchor").alias("top_anchor"), F.col("cnt").alias("top_anchor_cnt"))
    )
    tot = links.groupBy("dst").agg(
        F.count("*").alias("n_inlinks"),
        F.count_distinct("anchor").alias("n_distinct_anchors"),
    )
    return tot.join(top, "dst").select(
        F.col("dst").cast("long").alias("dst"),
        "n_inlinks",
        "n_distinct_anchors",
        "top_anchor",
        "top_anchor_cnt",
    )


SQL_ANCHOR_TEXT_ROLLUP = f"""
with links as (
  select (doc_id * 7 + 3) % 100 as dst,
         array_to_string(({_SQL_TOKENS})[1:2], ' ') as anchor
  from documents
), per as (
  select dst, anchor, count(*)::BIGINT as cnt from links group by 1, 2
), ranked as (
  select *, row_number() over (partition by dst order by cnt desc, anchor asc) as rn
  from per
), tot as (
  select dst, count(*)::BIGINT as n_inlinks,
         count(distinct anchor)::BIGINT as n_distinct_anchors
  from links group by 1
)
select t.dst::BIGINT as dst, t.n_inlinks, t.n_distinct_anchors,
       r.anchor as top_anchor, r.cnt as top_anchor_cnt
from tot t join ranked r on t.dst = r.dst and r.rn = 1
"""


# ---------------------------------------------------------------------------
# OpenReview analytics parity (P6, P8, P9, A1-A8, O1, J5, F3-F8)
# ---------------------------------------------------------------------------

_INV_MAP_EXPR = """case event_type
  when 'click' then 'Conf/-/Paper12/Official_Review'
  when 'view' then 'Conf/-/Paper12/Public_Comment'
  when 'purchase' then 'Conf/-/Paper12/Acceptance_Decision'
  when 'signup' then 'Conf/-/Paper12/Desk_Rejection'
  else 'Conf/-/Paper12/Withdrawn_Submission'
end"""


def q_note_type_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — invitation-substring note-type classifier (stats.note_type_col),
    reference precedence review > comment > decision|acceptance > other."""
    ev = _t(spark, sf_dir, "events").withColumn("invitation", F.expr(_INV_MAP_EXPR))
    return (
        ev.select(note_type_col(F.col("invitation")).alias("note_type"))
        .groupBy("note_type")
        .agg(F.count("*").alias("n"))
    )


SQL_NOTE_TYPE_CLASSIFY = f"""
with inv as (select {_INV_MAP_EXPR} as invitation from events)
select case
  when contains(lower(invitation), 'review') then 'review'
  when contains(lower(invitation), 'comment') then 'plain_comment'
  when contains(lower(invitation), 'decision') or contains(lower(invitation), 'acceptance')
       then 'decision'
  else 'other' end as note_type,
  count(*)::BIGINT as n
from inv group by 1
"""

_SUB_VENUE_EXPR = "case when doc_id % 7 = 0 then 'ICLR.cc' else 'Conf' || cast(doc_id % 3 as varchar(10)) end"
_SUB_YEAR_EXPR = "case when doc_id % 7 = 0 then 2014 else 2020 + cast(doc_id % 3 as int) end"
_SUB_INV_EXPR = (
    "case when doc_id % 6 = 0 then 'Conf/-/Withdrawn_Submission'"
    " else 'Conf/-/Blind_Submission' end"
)
_SUB_DECISION_EXPR = """case cast(doc_id % 5 as int)
  when 0 then 'Accept (Oral)'
  when 1 then 'Reject'
  when 2 then 'Accept and Reject unclear'
  when 3 then 'Borderline'
end"""


def q_label_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — the reference's acceptance-labeling cascade
    (/root/reference/acceptance_labeling.py:10-96) through the engine's
    real ``label_row`` in an Arrow batch UDF; the decision-content rule
    branches (rule 1 + rule 2 incl. the ICLR.cc-2014 quirk) are
    SQL-expressible, so the oracle replays them declaratively. (The
    ordered-notes-scan branch is golden-file-tested in tests/.)"""
    subs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_SUB_VENUE_EXPR).alias("venue"),
        F.expr(_SUB_YEAR_EXPR).alias("year"),
        F.expr(_SUB_INV_EXPR).alias("invitation"),
        F.expr(_SUB_DECISION_EXPR).alias("decision"),
    )
    subs = subs.withColumn(
        "content_json",
        F.when(
            F.col("decision").isNotNull(),
            F.concat(F.lit('{"decision": "'), F.col("decision"), F.lit('"}')),
        ).otherwise(F.lit("{}")),
    )

    @F.pandas_udf("string")
    def _label(inv: pd.Series, cj: pd.Series, venue: pd.Series, year: pd.Series) -> pd.Series:
        return pd.Series(
            [
                label_row(inv.iloc[i], cj.iloc[i], venue.iloc[i], int(year.iloc[i]), [])
                for i in range(len(inv))
            ]
        )

    return subs.select(
        "doc_id",
        _label(
            F.col("invitation"), F.col("content_json"), F.col("venue"), F.col("year")
        ).alias("acceptance_tag"),
    )


SQL_LABEL_CASCADE = f"""
with subs as (
  select doc_id, {_SUB_VENUE_EXPR} as venue, {_SUB_YEAR_EXPR} as year,
         {_SUB_INV_EXPR} as invitation, {_SUB_DECISION_EXPR} as decision
  from documents
)
select doc_id, case
  when contains(lower(invitation), 'withdraw') then 'withdrawn'
  when decision is null then 'unknown'
  when contains(lower(decision), 'reject') and contains(lower(decision), 'accept') then 'unknown'
  when contains(lower(decision), 'reject') then 'rejected'
  when contains(lower(decision), 'accept') then 'accepted'
  when venue = 'ICLR.cc' and year = 2014 then 'unknown'
  else 'accepted' end as acceptance_tag
from subs
"""


def q_venue_year_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analog — per (year, group) conditional counts, one shuffle with
    map-side partials (stats.venue_year_rollup shape)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(
            F.count("*").alias("n_orders"),
            *[
                F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
                .cast("long")
                .alias(f"n_{s.lower()}")
                for s in ("O", "F", "P")
            ],
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


SQL_VENUE_YEAR_ROLLUP = """
select year(o_orderdate)::BIGINT as year, count(*)::BIGINT as n_orders,
  sum(case when o_orderstatus = 'O' then 1 else 0 end)::BIGINT as n_o,
  sum(case when o_orderstatus = 'F' then 1 else 0 end)::BIGINT as n_f,
  sum(case when o_orderstatus = 'P' then 1 else 0 end)::BIGINT as n_p,
  round(sum(o_totalprice), 2) as revenue
from orders group by 1
"""


def q_label_share_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 — pivot-style share matrix with div-by-zero guard (try_divide)."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy(F.year("o_orderdate").cast("long").alias("year")).agg(
        F.count("*").alias("total"),
        *[
            F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).alias(f"c_{s}")
            for s in ("O", "F", "P")
        ],
    )
    return counts.select(
        "year",
        *[
            F.round(F.try_divide(F.col(f"c_{s}"), F.col("total")), 4).alias(
                f"{s.lower()}_share"
            )
            for s in ("O", "F", "P")
        ],
    )


SQL_LABEL_SHARE_PIVOT = """
with c as (
  select year(o_orderdate)::BIGINT as year, count(*) as total,
    sum(case when o_orderstatus = 'O' then 1 else 0 end) as c_o,
    sum(case when o_orderstatus = 'F' then 1 else 0 end) as c_f,
    sum(case when o_orderstatus = 'P' then 1 else 0 end) as c_p
  from orders group by 1
)
select year, round(c_o / total::DOUBLE, 4) as o_share,
       round(c_f / total::DOUBLE, 4) as f_share,
       round(c_p / total::DOUBLE, 4) as p_share
from c
"""


def q_comment_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/F8 — unit-bin histogram with outlier cap and density normalization
    (stats.count_histogram over per-customer order counts)."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    hist = count_histogram(per_cust, "cnt", cap=30)
    return hist.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.round("density", 4).alias("density"),
    )


SQL_COMMENT_HISTOGRAM = """
with per_cust as (
  select o_custkey, count(*) as cnt from orders group by 1
), hist as (
  select cnt as bin, count(*) as n from per_cust where cnt <= 30 group by 1
)
select bin::BIGINT as bin, n::BIGINT as n,
       round(n / (sum(n) over ())::DOUBLE, 4) as density
from hist
"""


def q_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — exact (interpolated) median per group."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price")
    )


SQL_MEDIAN_BY_GROUP = """
select o_orderpriority, round(median(o_totalprice), 4) as median_price
from orders group by 1
"""


def q_revision_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — newest-first ordering: latest event per user (window + row_number
    with explicit tie-break, the revision-ordering plan)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC so
            # the cast is an identity relabel, matching DuckDB epoch_ms
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        )
    )


SQL_REVISION_LATEST = """
with r as (
  select user_id, event_id, epoch_ms(ts) as ts_ms,
         row_number() over (partition by user_id order by ts desc, event_id desc) as rn
  from events
)
select user_id, event_id, ts_ms from r where rn = 1
"""

_FORUM_EXPR = "'f' || cast(doc_id % 25 as varchar(10))"
_NOTE_ID_EXPR = "'n' || cast(doc_id as varchar(30))"
_REPLYTO_EXPR = (
    "case when doc_id < 25 then 'f' || cast(doc_id % 25 as varchar(10))"
    " else 'n' || cast(doc_id - 25 as varchar(30)) end"
)


def q_reply_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — reply-forest assembly with broken-chain dropping
    (operators/comment_tree.reply_forest, applyInPandas per forum); oracle is
    a recursive CTE. Docs with doc_id % 37 == 0 are withheld, so their
    descendants' chains break and are silently dropped — the reference's
    lone-leaf semantics (/root/reference/comment_tree.py:56-60)."""
    notes = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 37 != 0)
        .select(
            F.expr(_FORUM_EXPR).alias("forum"),
            F.expr(_NOTE_ID_EXPR).alias("id"),
            F.expr(_REPLYTO_EXPR).alias("replyto"),
            F.col("doc_id").cast("int").alias("rec_order"),
        )
    )
    out = reply_forest(notes)
    return out.select(
        "forum", "id", "parent_id", "root_id", F.col("depth").cast("long").alias("depth")
    )


SQL_REPLY_FOREST = f"""
with recursive notes as (
  select {_FORUM_EXPR} as forum, {_NOTE_ID_EXPR} as id, {_REPLYTO_EXPR} as replyto
  from documents where doc_id % 37 <> 0
), kept as (
  select forum, id, replyto as parent_id, id as root_id, 0 as depth
  from notes where replyto = forum
  union all
  select n.forum, n.id, n.replyto, k.root_id, k.depth + 1
  from notes n join kept k on n.replyto = k.id and n.forum = k.forum
)
select forum, id, parent_id, root_id, depth::BIGINT as depth from kept
"""


def q_forum_ascii_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """draw_forum as a distributed render (/root/reference/comment_tree.py:
    119-137): one header line per forum (``-->  {forum} : {title}``,
    comment_tree.py:126) plus one ``'    ' * depth + '|--- ' + id`` note line
    per kept note (``__draw_note``, comment_tree.py:131-137). ``sort_key``
    is the DFS path of zero-padded rec_orders — ordering by
    (forum, sort_key) reproduces the reference's log line-for-line, because
    the reference's recursion visits children in recording order. Same
    withheld-doc fixture as ``reply_forest``, so broken chains drop."""
    from ..operators.render import forum_ascii_lines, reply_forest_paths

    notes = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 37 != 0)
        .select(
            F.expr(_FORUM_EXPR).alias("forum"),
            F.expr(_NOTE_ID_EXPR).alias("id"),
            F.expr(_REPLYTO_EXPR).alias("replyto"),
            F.col("doc_id").cast("long").alias("rec_order"),
        )
    )
    titles = (
        notes.select("forum")
        .distinct()
        .select("forum", F.concat(F.lit("Forum "), F.col("forum")).alias("title"))
    )
    return forum_ascii_lines(reply_forest_paths(notes), titles)


SQL_FORUM_ASCII_RENDER = f"""
with recursive notes as (
  select {_FORUM_EXPR} as forum, {_NOTE_ID_EXPR} as id, {_REPLYTO_EXPR} as replyto,
         doc_id as rec_order
  from documents where doc_id % 37 <> 0
), kept as (
  select forum, id, 0 as depth,
         lpad(cast(rec_order as varchar), 10, '0') as path
  from notes where replyto = forum
  union all
  select n.forum, n.id, k.depth + 1,
         k.path || '/' || lpad(cast(n.rec_order as varchar), 10, '0')
  from notes n join kept k on n.replyto = k.id and n.forum = k.forum
)
select forum, '' as sort_key, '-->  ' || forum || ' : Forum ' || forum as line
from (select distinct forum from notes)
union all
select forum, path as sort_key, repeat('    ', depth) || '|--- ' || id as line
from kept
"""


def q_venue_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — venue listing (reference --help_venues: members of the root
    'venues' group, crawler.py:219-230). Groups table derived from
    documents: the 'venues' group holds two venue ids per source; a decoy
    group must be filtered out."""
    from ..sources.openreview_json import list_venues

    src = _t(spark, sf_dir, "documents").select("source").distinct()
    groups = src.select(
        F.lit("venues").alias("group_id"),
        F.array(
            F.concat(F.col("source"), F.lit(".cc/2019/Conference")),
            F.concat(F.col("source"), F.lit(".cc/2020/Workshop")),
        ).alias("members"),
    ).unionByName(
        src.select(
            F.lit("hosts").alias("group_id"),
            F.array(F.concat(F.col("source"), F.lit(".example"))).alias("members"),
        )
    )
    return list_venues(groups)


SQL_VENUE_LISTING = """
with src as (select distinct source from documents),
groups as (
  select 'venues' as group_id,
         [source || '.cc/2019/Conference', source || '.cc/2020/Workshop'] as members
  from src
  union all
  select 'hosts' as group_id, [source || '.example'] as members from src
)
select distinct unnest(members) as venue from groups where group_id = 'venues'
"""


def q_orphan_note_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — other-notes whose forum has no crawled submission, counted to a
    metrics table instead of the reference's silent debug-log drop
    (/root/reference/crawler.py:104-108). Submissions exist for forums
    f0..f19; notes land on f0..f24, so f20..f24 are known misses."""
    docs = _t(spark, sf_dir, "documents")
    notes = docs.select(
        F.expr(_NOTE_ID_EXPR).alias("id"), F.expr(_FORUM_EXPR).alias("forum")
    )
    subs = (
        docs.filter(F.col("doc_id") % 25 < 20)
        .select(F.expr(_FORUM_EXPR).alias("id"))
        .distinct()
    )
    _attached, orphans = attach_notes_with_misses(subs, notes)
    return orphan_metrics(orphans)


SQL_ORPHAN_NOTE_METRICS = f"""
with notes as (
  select {_NOTE_ID_EXPR} as id, {_FORUM_EXPR} as forum from documents
), subs as (
  select distinct {_FORUM_EXPR} as id from documents where doc_id % 25 < 20
)
select forum, count(*)::BIGINT as n_orphans, min(id) as first_orphan_id
from notes where not exists (select 1 from subs where subs.id = notes.forum)
group by 1
"""


def q_flatten_authors_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — positional list->column pivot with truncation (the reference's
    author0..author12 flattening, database.py:129-133), on part names."""
    p = _t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        *[F.try_element_at(toks, F.lit(i + 1)).alias(f"author{i}") for i in range(4)],
    )


SQL_FLATTEN_AUTHORS_PIVOT = """
with t as (select p_partkey, string_split(p_name, ' ') as toks from part)
select p_partkey, toks[1] as author0, toks[2] as author1,
       toks[3] as author2, toks[4] as author3
from t
"""


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 twin — extract the numeric field out of the stringified props dict,
    aggregate per event type."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r"([0-9]+)", 1).cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count("*").alias("n")
    )


SQL_PROPS_EXTRACT = """
select event_type, sum(regexp_extract(props, '([0-9]+)', 1)::BIGINT)::BIGINT as sum_k,
       count(*)::BIGINT as n
from events group by 1
"""


def q_venue_id_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — stable-id dim upsert (sources/sinks.assign_venue_ids): existing
    (venue, year) keys keep their id (the reference's resume guarantee,
    /root/reference/crawler.py:46-53, README.md:105-107); new keys get
    max(id) + row_number() over key order — deterministic, replayable."""
    from ..sources.sinks import assign_venue_ids

    src = _t(spark, sf_dir, "documents").select("source").distinct()
    existing = src.filter(
        F.expr("cast(substr(source, 4) as int) % 2 = 0")
    ).select(
        (F.expr("cast(substr(source, 4) as int)") + 1).cast("int").alias("venue_id"),
        F.col("source").alias("venue"),
        F.lit(2020).cast("int").alias("year"),
    )
    keys = src.select(F.col("source").alias("venue"), F.lit(2020).cast("int").alias("year"))
    out = assign_venue_ids(existing, keys)
    return out.select(F.col("venue_id").cast("long").alias("venue_id"), "venue", F.col("year").cast("long").alias("year"))


SQL_VENUE_ID_ASSIGN = """
with src as (select distinct source from documents),
existing as (
  select substr(source, 4)::INT + 1 as venue_id, source as venue, 2020 as year
  from src where substr(source, 4)::INT % 2 = 0
),
keys as (select source as venue, 2020 as year from src),
known as (
  select e.venue_id, k.venue, k.year from keys k join existing e using (venue, year)
),
newk as (
  select k.venue, k.year from keys k
  where not exists (select 1 from existing e where e.venue = k.venue and e.year = k.year)
),
alloc as (
  select (select coalesce(max(venue_id), 0) from existing)
         + row_number() over (order by venue, year) as venue_id, venue, year
  from newk
)
select venue_id::BIGINT as venue_id, venue, year::BIGINT as year from known
union all
select venue_id::BIGINT, venue, year::BIGINT from alloc
"""


def q_merge_invitations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/D2 — the reference's invitation wildcard-merge + set dedup
    (/root/reference/crawler.py:147-158) via functions.urls.merge_invitations_col:
    numbered per-paper path segments collapse to wildcards, then distinct."""
    from ..functions.urls import merge_invitations_col

    ev = _t(spark, sf_dir, "events")
    inv = ev.select(
        F.concat(
            F.lit("Conf/Paper"),
            (F.col("event_id") % 40).cast("string"),
            F.lit("/-/"),
            F.col("event_type"),
        ).alias("invitation")
    )
    return (
        inv.select(merge_invitations_col(F.col("invitation")).alias("merged"))
        .groupBy("merged")
        .agg(F.count("*").alias("n"))
    )


SQL_MERGE_INVITATIONS = r"""
with inv as (
  select 'Conf/Paper' || cast(event_id % 40 as varchar(20)) || '/-/' || event_type
         as invitation
  from events
)
select regexp_replace(regexp_replace(invitation, '/(P|p)aper[0-9]+/', '/\1aper.*/'),
                      '/(P|p)aper/[0-9]+/', '/\1aper/.*/') as merged,
       count(*)::BIGINT as n
from inv group by 1
"""


def q_global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — one-row cross-table totals (statistics_from_json.py:304-312
    shape), via cheap single-row crossJoins."""
    o = _t(spark, sf_dir, "orders").agg(F.count("*").alias("total_orders"))
    li = _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("total_lineitems"))
    c = _t(spark, sf_dir, "customer").agg(
        F.countDistinct("c_custkey").alias("total_customers")
    )
    return o.crossJoin(li).crossJoin(c)


SQL_GLOBAL_TOTALS = """
select (select count(*) from orders)::BIGINT as total_orders,
       (select count(*) from lineitem)::BIGINT as total_lineitems,
       (select count(distinct c_custkey) from customer)::BIGINT as total_customers
"""


def q_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-group note-type share matrix with div-by-zero guard
    (stats.type_share shape; statistics_from_json.py:79-82)."""
    ev = _t(spark, sf_dir, "events").withColumn("invitation", F.expr(_INV_MAP_EXPR))
    typed = ev.select(
        F.dayofmonth("ts").cast("long").alias("day"),
        note_type_col(F.col("invitation")).alias("t"),
    )
    counts = typed.groupBy("day").agg(
        *[
            F.sum(F.when(F.col("t") == t, 1).otherwise(0)).alias(f"c_{t}")
            for t in ("review", "plain_comment", "decision", "other")
        ]
    )
    total = sum(F.col(f"c_{t}") for t in ("review", "plain_comment", "decision", "other"))
    return counts.select(
        "day",
        *[
            F.round(F.try_divide(F.col(f"c_{t}"), total), 4).alias(f"{t}_share")
            for t in ("review", "plain_comment", "decision", "other")
        ],
    )


SQL_TYPE_SHARE = f"""
with inv as (select day(ts) as day, {_INV_MAP_EXPR} as invitation from events),
typed as (
  select day, case
    when contains(lower(invitation), 'review') then 'review'
    when contains(lower(invitation), 'comment') then 'plain_comment'
    when contains(lower(invitation), 'decision') or contains(lower(invitation), 'acceptance')
         then 'decision'
    else 'other' end as t
  from inv
), c as (
  select day,
    sum(case when t = 'review' then 1 else 0 end) as c_review,
    sum(case when t = 'plain_comment' then 1 else 0 end) as c_plain,
    sum(case when t = 'decision' then 1 else 0 end) as c_decision,
    sum(case when t = 'other' then 1 else 0 end) as c_other
  from typed group by 1
)
select day::BIGINT as day,
  round(c_review / nullif(c_review + c_plain + c_decision + c_other, 0)::DOUBLE, 4) as review_share,
  round(c_plain / nullif(c_review + c_plain + c_decision + c_other, 0)::DOUBLE, 4) as plain_comment_share,
  round(c_decision / nullif(c_review + c_plain + c_decision + c_other, 0)::DOUBLE, 4) as decision_share,
  round(c_other / nullif(c_review + c_plain + c_decision + c_other, 0)::DOUBLE, 4) as other_share
from c
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rnk").cast("long").alias("rnk"))
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
with r as (
  select o_custkey, o_orderkey,
         row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey asc) as rnk
  from orders
)
select o_custkey, o_orderkey, rnk::BIGINT as rnk from r where rnk <= 3
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cols = fingerprint_cols(F.col("text"))
    return docs.select("doc_id", *[c.alias(k) for k, c in cols.items()])


SQL_DOC_FINGERPRINT = f"""
with norm as (
  select doc_id, lower(regexp_replace(trim(text), ' +', ' ', 'g')) as t from documents
)
select doc_id, md5(t) as fp_md5,
  list_reduce(
    list_transform(string_split(t, ' '), tok -> {_H32.format(x='tok')}),
    (a, b) -> (a * 31 + b) % 2147483647
  ) as fp_roll
from norm
"""
