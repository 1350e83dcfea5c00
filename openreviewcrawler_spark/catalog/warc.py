"""warc family query builders + DuckDB oracles (mechanically split from the catalog monolith)."""

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
    CORPUS_SQL,
    _CHANGE_EXPR,
    _CHANGE_SNAPS,
    _corpus,
    _t,
)



def q_warc_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded WARC-style sink layout (sources/warc.warc_layout): per-record
    shard + byte offset + record length, computed distributively (one
    shuffle on shard, per-shard window — no global funnel)."""
    from ..sources.warc import warc_layout

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return warc_layout(docs, n_shards=8)


SQL_WARC_EXPORT = """
with recs as (
  select doc_id,
         'https://h' || cast(doc_id % 7 as varchar(10)) || '.example/p/'
           || cast(doc_id as varchar(30)) as url,
         length(text)::BIGINT as plen
  from documents
), sized as (
  select (doc_id % 8)::INT as shard, doc_id, url,
         (length('WARC/1.0' || chr(10) || 'WARC-Target-URI: ' || url || chr(10)
                 || 'Content-Length: ' || cast(plen as varchar(30))
                 || chr(10) || chr(10)) + plen + 2)::BIGINT as record_len
  from recs
)
select shard, doc_id, url, record_len,
       (sum(record_len) over (partition by shard order by doc_id)
        - record_len)::BIGINT as offset
from sized
"""


def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index built in the SAME pass as the WARC shard layout
    (sources/warc.cdx_index): SURT key, shard, byte offset, record length,
    payload digest — the seek index a 100 TB archive reader needs, with no
    second scan of the payload bytes."""
    from ..sources.warc import cdx_index

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return cdx_index(docs, n_shards=8)


SQL_WARC_CDX_INDEX = """
with recs as (
  select doc_id, text,
         'https://h' || cast(doc_id % 7 as varchar(10)) || '.example/p/'
           || cast(doc_id as varchar(30)) as url
  from documents
), sized as (
  select (doc_id % 8)::INT as shard, doc_id, url, md5(text) as digest,
         (length('WARC/1.0' || chr(10) || 'WARC-Target-URI: ' || url || chr(10)
                 || 'Content-Length: ' || cast(length(text) as varchar(30))
                 || chr(10) || chr(10)) + length(text) + 2)::BIGINT as record_len
  from recs
)
select 'example,h' || cast(doc_id % 7 as varchar(10)) || ')/p/'
         || cast(doc_id as varchar(30)) as surt,
       shard,
       (sum(record_len) over (partition by shard order by doc_id)
        - record_len)::BIGINT as offset,
       record_len, digest, doc_id
from sized
"""


def q_warc_revisit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit-record dedup (sources/warc.revisit_records): identical
    payload digests stored once; later captures become zero-payload
    'revisit' records pointing at the earliest capture. One shuffle on
    digest, windows stay inside dup clusters."""
    from ..sources.warc import revisit_records

    caps = _corpus(spark, sf_dir).select(
        F.concat(F.lit("https://cap.example/d/"), F.col("doc_id").cast("string")).alias("url"),
        F.col("doc_id").cast("long").alias("capture_ts"),
        "text",
    )
    return revisit_records(caps)


SQL_WARC_REVISIT_DEDUP = f"""
with c as ({CORPUS_SQL}),
u as (
  select 'https://cap.example/d/' || cast(doc_id as varchar(30)) as url,
         doc_id::BIGINT as capture_ts, text
  from c
),
d as (select url, capture_ts, md5(text) as digest, text from u),
w as (
  select url, capture_ts, digest,
         first_value(url) over (
           partition by digest order by capture_ts asc, url asc
           rows between unbounded preceding and current row) as original_url,
         first_value(capture_ts) over (
           partition by digest order by capture_ts asc, url asc
           rows between unbounded preceding and current row) as original_ts,
         length(text) as len
  from d
)
select url, capture_ts, digest,
       case when url = original_url and capture_ts = original_ts
            then 'response' else 'revisit' end as record_type,
       original_url, original_ts,
       (case when url = original_url and capture_ts = original_ts
             then len else 0 end)::BIGINT as stored_len
from w
"""


def q_warc_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive byte-range integrity audit (sources/warc.cdx_gap_audit)
    over the CDX index with PLANTED record losses (every 17th capture
    dropped post-indexing, simulating shard truncation): per shard, gap
    count + lost bytes + overlap count + the contiguous verdict."""
    from ..sources.warc import cdx_gap_audit, cdx_index

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    cdx = cdx_index(docs, n_shards=8).filter(F.col("doc_id") % 17 != 0)
    return cdx_gap_audit(cdx)


SQL_WARC_GAP_AUDIT = f"""
with cdx as ({SQL_WARC_CDX_INDEX}),
kept as (select * from cdx where doc_id % 17 <> 0),
g as (
  select shard,
         coalesce(lead("offset") over (partition by shard order by "offset" asc)
                  - ("offset" + record_len), 0)::BIGINT as gap_bytes
  from kept
)
select shard,
       count(*)::BIGINT as n_records,
       sum(case when gap_bytes > 0 then 1 else 0 end)::BIGINT as n_gaps,
       sum(case when gap_bytes > 0 then gap_bytes else 0 end)::BIGINT
         as lost_bytes,
       sum(case when gap_bytes < 0 then 1 else 0 end)::BIGINT as n_overlaps,
       sum(case when gap_bytes <> 0 then 1 else 0 end) = 0 as contiguous
from g group by shard
"""


def q_warc_replay_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC replay locality audit: how many bytes of seeking a reader
    pays when records are replayed in CRAWL-ARRIVAL order vs the CDX
    (shard, offset)-sorted order — the measured argument for sorting CDX
    before bulk re-parse (sorted replay is sequential by construction,
    so seek_bytes IS the savings). Shape: per-shard prefix-sum window
    assigns offsets, a second window over arrival order takes the |gap|
    between consecutive reads, one groupBy rolls up — all three share
    the shard-key shuffle. Integer-only output."""
    recs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 4).alias("shard"),
        (F.col("n_chars") + 200).cast("long").alias("len"),
        ((F.col("doc_id") * 7919) % 999983).alias("arrival"),
    )
    w_off = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = recs.withColumn(
        "off_b", F.coalesce(F.sum("len").over(w_off), F.lit(0))
    )
    w_arr = Window.partitionBy("shard").orderBy("arrival", "doc_id")
    gaps = offs.withColumn(
        "gap",
        F.abs(F.col("off_b") - F.lag(F.col("off_b") + F.col("len")).over(w_arr)),
    )
    agg = gaps.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("len").cast("long").alias("total_bytes"),
        F.sum(F.coalesce(F.col("gap"), F.lit(0)))
        .cast("long")
        .alias("seek_bytes"),
    )
    return agg.select(
        "shard",
        "n_records",
        "total_bytes",
        "seek_bytes",
        F.expr(
            "cast((total_bytes * cast(1000000 as bigint))"
            " div (total_bytes + seek_bytes) as bigint)"
        ).alias("locality_ppm"),
    )


SQL_WARC_REPLAY_LOCALITY = """
with recs as (
  select doc_id, doc_id % 4 as shard,
         (n_chars + 200)::BIGINT as len,
         (doc_id * 7919) % 999983 as arrival
  from documents
),
offs as (
  select *, coalesce(sum(len) over (
           partition by shard order by doc_id
           rows between unbounded preceding and 1 preceding), 0) as off_b
  from recs
),
gaps as (
  select shard, len, off_b,
         abs(off_b - lag(off_b + len) over (
           partition by shard order by arrival, doc_id)) as gap
  from offs
)
select shard::BIGINT as shard, count(*)::BIGINT as n_records,
       sum(len)::BIGINT as total_bytes,
       sum(coalesce(gap, 0))::BIGINT as seek_bytes,
       ((sum(len) * 1000000) // (sum(len) + sum(coalesce(gap, 0))))::BIGINT
         as locality_ppm
from gaps group by shard
"""


#: target archive payload bytes for WARC compaction (synthetic corpus is
#: ~150 KB text + 512 B/record headers -> ~6 archives at the test SFs)
WARC_COMPACT_TARGET = 65536
WARC_HEADER_BYTES = 512


def q_warc_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan for a sharded WARC archive: lay records
    out in (host, doc) order — preserving the replay locality that
    warc_replay_locality audits — and cut archive boundaries every
    WARC_COMPACT_TARGET cumulative bytes (the Iceberg
    rewrite-data-files / bin-pack analog for raw crawl archives). Shape:
    the global byte offset is packing.prefix_sum_scalable — ONE counting
    job + per-partition offsets, never a global window funnel — and the
    archive id is a pure projection (offset div target), so the plan
    costs one shuffle at any corpus size. Per-archive rollup reports
    record count, payload bytes and host span (locality: contiguous
    (host, doc) order keeps hosts-per-archive minimal)."""
    from ..operators.packing import prefix_sum_scalable

    recs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "concat('h', cast(doc_id % 7 as string)) as host",
        f"n_chars + {WARC_HEADER_BYTES} as rbytes",
    )
    placed = prefix_sum_scalable(recs, "rbytes", ["host", "doc_id"], "start_off")
    return (
        placed.selectExpr(
            f"cast(start_off div {WARC_COMPACT_TARGET} as bigint) as archive_id",
            "host",
            "rbytes",
        )
        .groupBy("archive_id")
        .agg(
            F.count("*").cast("long").alias("n_records"),
            F.sum("rbytes").cast("long").alias("total_bytes"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
        )
    )


SQL_WARC_COMPACTION_PLAN = f"""
with recs as (
  select doc_id, 'h' || cast(doc_id % 7 as varchar(10)) as host,
         n_chars + {WARC_HEADER_BYTES} as rbytes
  from documents
),
placed as (
  select host, rbytes,
         coalesce(sum(rbytes) over (
           order by host, doc_id
           rows between unbounded preceding and 1 preceding
         ), 0) as start_off
  from recs
)
select (start_off // {WARC_COMPACT_TARGET})::BIGINT as archive_id,
       count(*)::BIGINT as n_records,
       sum(rbytes)::BIGINT as total_bytes,
       count(distinct host)::BIGINT as n_hosts
from placed group by archive_id
"""


def q_warc_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte ledger of WARC revisit dedup, per host: across revisit
    snapshots (the crawl_change_rate synthesis — _CHANGE_SNAPS captures
    per URL, a capture's payload changes per the shared propensity
    predicate), every UNCHANGED capture stores as a zero-payload revisit
    record — this is the storage the archive saves, quoted per host
    before provisioning. A capture is unchanged iff the change predicate
    is 0 at that snapshot (snapshot 1 is always a full store). One
    projection + one bounded per-host rollup; integer ppm."""
    docs = _t(spark, sf_dir, "documents")
    caps = docs.select(
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(1), F.lit(_CHANGE_SNAPS))).alias("snap"),
    ).selectExpr(
        "host",
        "n_chars",
        f"case when snap = 1 then 0 else 1 - ({_CHANGE_EXPR}) end"
        " as is_unchanged",
    )
    return caps.groupBy("host").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.sum("is_unchanged").cast("long").alias("n_revisit"),
        F.sum("n_chars").cast("long").alias("bytes_fetched"),
        F.sum(F.col("is_unchanged") * F.col("n_chars"))
        .cast("long")
        .alias("bytes_saved"),
    ).selectExpr(
        "host",
        "n_captures",
        "n_revisit",
        "bytes_fetched",
        "bytes_saved",
        "cast((bytes_saved * cast(1000000 as bigint)) div bytes_fetched"
        " as bigint) as savings_ppm",
    )


SQL_WARC_DEDUP_SAVINGS = f"""
with caps as (
  select source || '.example' as host, doc_id, n_chars,
         unnest(range(1, {_CHANGE_SNAPS} + 1)) as snap
  from documents
),
f as (
  select host, n_chars,
         (case when snap = 1 then 0
               else 1 - ({_CHANGE_EXPR}) end)::BIGINT as is_unchanged
  from caps
)
select host, count(*)::BIGINT as n_captures,
       sum(is_unchanged)::BIGINT as n_revisit,
       sum(n_chars)::BIGINT as bytes_fetched,
       sum(is_unchanged * n_chars)::BIGINT as bytes_saved,
       ((sum(is_unchanged * n_chars) * 1000000) // sum(n_chars))::BIGINT
         as savings_ppm
from f group by host
"""


# --- session-36: range coalescing, winnowing, parallelism plan --------------

#: coalesce byte ranges whose inter-record gap is at most this many bytes
_RANGE_GAP = 4096


def q_warc_range_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range read coalescing over the WARC archive: given a
    requested record subset (here: host h3's replay set) and the CDX
    offsets, merge records whose gap is ≤ {_RANGE_GAP} B into single
    range requests — object stores bill per request and S3-style GETs
    dominate small-record replay, so the reader wants few fat ranges
    with bounded waste. Gaps-and-islands per shard: a new range opens
    when the offset jumps past prev_end + gap (explicit ROWS frames,
    offset order is unique per shard by construction). Output: one row
    per coalesced range with record count, payload bytes and waste."""
    from ..sources.warc import cdx_index

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    req = cdx_index(docs, n_shards=8).filter(F.col("doc_id") % 7 == 3)
    w = Window.partitionBy("shard").orderBy("offset")
    run = (
        Window.partitionBy("shard")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = req.withColumn(
        "prev_end", F.lag(F.col("offset") + F.col("record_len")).over(w)
    ).withColumn(
        "new_range",
        F.expr(
            "case when prev_end is null"
            f" or offset - prev_end > {_RANGE_GAP} then 1 else 0 end"
        ),
    ).withColumn("range_id", F.sum("new_range").over(run))
    return marked.groupBy("shard", "range_id").agg(
        F.min("offset").cast("long").alias("range_start"),
        F.max(F.col("offset") + F.col("record_len")).cast("long").alias("range_end"),
        F.count("*").cast("long").alias("n_records"),
        F.sum("record_len").cast("long").alias("payload_bytes"),
    ).selectExpr(
        "cast(shard as bigint) as shard",
        "cast(range_id as bigint) as range_id",
        "range_start",
        "range_end",
        "n_records",
        "payload_bytes",
        "range_end - range_start - payload_bytes as waste_bytes",
    )


def _sql_warc_range_coalesce() -> str:
    return f"""
with cdx as ({SQL_WARC_CDX_INDEX}),
req as (select * from cdx where doc_id % 7 = 3),
marked as (
  select shard, "offset", record_len,
         lag("offset" + record_len) over (
           partition by shard order by "offset"
         ) as prev_end
  from req
),
flagged as (
  select shard, "offset", record_len,
         case when prev_end is null
              or "offset" - prev_end > {_RANGE_GAP} then 1 else 0 end
           as new_range
  from marked
),
ranged as (
  select shard, "offset", record_len,
         sum(new_range) over (
           partition by shard order by "offset"
           rows between unbounded preceding and current row
         ) as range_id
  from flagged
),
agg as (
  select shard, range_id,
         min("offset")::BIGINT as range_start,
         max("offset" + record_len)::BIGINT as range_end,
         count(*)::BIGINT as n_records,
         sum(record_len)::BIGINT as payload_bytes
  from ranged group by shard, range_id
)
select shard::BIGINT as shard, range_id::BIGINT as range_id,
       range_start, range_end, n_records, payload_bytes,
       (range_end - range_start - payload_bytes)::BIGINT as waste_bytes
from agg
"""


#: replay target timestamp and capture synthesis bounds
_SNAP_TARGET_TS = 1025000


def q_warc_nearest_snapshot_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal nearest-snapshot selection (the Wayback replay rule):
    per URL, the capture closest to the requested timestamp, earlier
    capture winning ties — argmin WITHOUT min_by/struct-compare (their
    tie semantics differ across engines): distance, timestamp and
    capture id pack into ONE BIGINT (fields are bounded, shifts keep
    every intermediate far below 2^63 — DuckDB errors on overflow),
    integer MIN picks the winner, div/mod decode it. One groupBy."""
    caps = _t(spark, sf_dir, "documents").selectExpr(
        "cast(doc_id % 120 as bigint) as url_key",
        "cast(1000000 + (doc_id * 37) % 50000 as bigint) as cap_ts",
        "doc_id",
    )
    t = _SNAP_TARGET_TS
    packed = caps.selectExpr(
        "url_key",
        "cap_ts",
        "doc_id",
        f"abs(cap_ts - {t}) * cast(1099511627776 as bigint)"
        " + cap_ts * cast(1048576 as bigint) + doc_id as packed",
    )
    return packed.groupBy("url_key").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.min("packed").alias("__p"),
    ).selectExpr(
        "url_key",
        "n_captures",
        "cast(__p div 1099511627776 as bigint) as best_dist",
        "cast((__p % 1099511627776) div 1048576 as bigint) as best_ts",
        "cast(__p % 1048576 as bigint) as best_doc",
    )


SQL_WARC_NEAREST_SNAPSHOT_SELECT = f"""
with caps as (
  select (doc_id % 120)::BIGINT as url_key,
         (1000000 + (doc_id * 37) % 50000)::BIGINT as cap_ts,
         doc_id
  from documents
),
packed as (
  select url_key, cap_ts, doc_id,
         abs(cap_ts - {_SNAP_TARGET_TS}) * 1099511627776
           + cap_ts * 1048576 + doc_id as packed
  from caps
)
select url_key, count(*)::BIGINT as n_captures,
       (min(packed) // 1099511627776)::BIGINT as best_dist,
       ((min(packed) % 1099511627776) // 1048576)::BIGINT as best_ts,
       (min(packed) % 1048576)::BIGINT as best_doc
from packed group by url_key
"""


#: planted corruption point inside every shard (byte offset)
_CORRUPT_AT = 2000


def q_warc_corruption_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive corruption-resync plan: given a corruption at byte
    {_CORRUPT_AT} of every shard, where does the reader re-sync — the
    first record boundary PAST the corruption point (CDX offsets make
    this a filter + min, no byte scanning), how many records and bytes
    are lost in the gap, and the survivor count. The recovery math an
    archive operator runs before deciding between re-fetch and
    accept-loss. Reuses the cdx layout, two bounded rollups."""
    from ..sources.warc import cdx_index

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    cdx = cdx_index(docs, n_shards=8).select("shard", "offset", "record_len")
    c = _CORRUPT_AT
    return cdx.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_records"),
        F.min(
            F.when(F.col("offset") >= c, F.col("offset"))
        ).cast("long").alias("resync_offset"),
        F.sum(
            F.expr(
                f"case when offset < {c} and offset + record_len > {c}"
                " then 1 else 0 end"
            )
        ).cast("long").alias("n_torn"),
        F.sum(
            F.expr(f"case when offset >= {c} then 1 else 0 end")
        ).cast("long").alias("n_recoverable"),
    ).selectExpr(
        "cast(shard as bigint) as shard",
        "n_records",
        "resync_offset",
        f"cast(resync_offset - {c} as bigint) as bytes_skipped",
        "n_torn",
        "n_recoverable",
    )


SQL_WARC_CORRUPTION_RESYNC = f"""
with cdx as ({SQL_WARC_CDX_INDEX})
select shard::BIGINT as shard, count(*)::BIGINT as n_records,
       min(case when "offset" >= {_CORRUPT_AT} then "offset" end)::BIGINT
         as resync_offset,
       (min(case when "offset" >= {_CORRUPT_AT} then "offset" end)
        - {_CORRUPT_AT})::BIGINT as bytes_skipped,
       sum(case when "offset" < {_CORRUPT_AT}
                 and "offset" + record_len > {_CORRUPT_AT}
                then 1 else 0 end)::BIGINT as n_torn,
       sum(case when "offset" >= {_CORRUPT_AT} then 1 else 0 end)::BIGINT
         as n_recoverable
from cdx group by shard
"""
