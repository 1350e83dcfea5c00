"""WARC-style record sink layout — deterministic sharded archive offsets.

The reference writes one JSON file per venue from the driver
(/root/reference/crawler.py:246-253); a 100 TB fetched corpus instead lands
as sharded WARC-like archives, and every record's (shard, byte offset,
record length) must be known AT PLAN TIME so the index is written in the
same pass as the data — re-scanning 100 TB to build the index afterwards is
the failure mode this avoids.

Scale shape: records are assigned to shards by key hash, and offsets are a
running sum of record lengths within each shard — ONE shuffle on shard, a
window partitioned BY SHARD (thousands of independent partitions, no global
funnel), all string/length math JVM-side. The actual byte concatenation
into archive files is the trivial last map step; what's worth testing
cross-engine is the layout arithmetic, which is exactly what the oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: record grammar (WARC-flavored, simplified): header + payload + separator.
#: Lengths are in characters == bytes for the ASCII fixture corpus; a binary
#: corpus would swap length() for octet_length() on both engines.
_SEP_LEN = 2  # trailing "\n\n" after the payload


def warc_header_col(url: Column, payload_len: Column) -> Column:
    """The record header string: deterministic, no wall-clock fields."""
    return F.concat(
        F.lit("WARC/1.0\nWARC-Target-URI: "),
        url,
        F.lit("\nContent-Length: "),
        payload_len.cast("string"),
        F.lit("\n\n"),
    )


def warc_layout(
    records: DataFrame,
    n_shards: int,
    url_col: str = "url",
    payload_col: str = "text",
    order_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(shard, doc_id, url, record_len, offset[, extras]) — byte layout of
    the sharded archive. ``offset`` is the record's start position within
    its shard file; records are laid out in ``order_col`` order
    (deterministic at any parallelism — never partition/task order).
    ``extra_cols`` are carried through unchanged (e.g. a payload digest
    computed in the same scan for the CDX index)."""
    payload_len = F.length(F.col(payload_col)).cast("long")
    header = warc_header_col(F.col(url_col), payload_len)
    record_len = (F.length(header).cast("long") + payload_len + F.lit(_SEP_LEN)).alias(
        "record_len"
    )
    shard = F.pmod(F.col(order_col), F.lit(n_shards)).cast("int").alias("shard")
    extra = [F.col(c) for c in (extra_cols or [])]
    base = records.select(shard, F.col(order_col), F.col(url_col), record_len, *extra)
    w = Window.partitionBy("shard").orderBy(order_col)
    return base.withColumn(
        "offset", (F.sum("record_len").over(w) - F.col("record_len")).cast("long")
    )


def surt_key_col(url: Column) -> Column:
    """SURT-style sort key for a CDX index: hostname components reversed and
    comma-joined, then ``)`` + path — ``https://b.a.example/p/1`` becomes
    ``example,a,b)/p/1``. Pure string/array expressions (split on ``[.]`` —
    regex split, no backslash; see CLAUDE.md escaping rule)."""
    no_scheme = F.substring_index(url, "://", -1)
    host = F.substring_index(no_scheme, "/", 1)
    path = F.substring(no_scheme, F.length(host) + 1, F.lit(1 << 30))
    rev_host = F.array_join(F.reverse(F.split(host, "[.]")), ",")
    return F.concat(rev_host, F.lit(")"), path)


def cdx_index(
    records: DataFrame,
    n_shards: int,
    url_col: str = "url",
    payload_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """CDX-style capture index over the sharded WARC layout: one row per
    record with ``(surt, shard, offset, record_len, digest)`` — everything a
    reader needs to seek straight to a record without scanning the archive.
    Built in the SAME pass as the layout (the whole point of plan-time
    offsets, see module docstring): the digest rides ``warc_layout`` as an
    extra column, so no second scan of the payload bytes and no join.
    Deterministic — no wall-clock capture timestamp (the corpus fixture has
    none); a live crawl would thread ``fetched_at`` through unchanged."""
    with_digest = records.withColumn("digest", F.md5(F.col(payload_col)))
    layout = warc_layout(
        with_digest, n_shards, url_col=url_col, payload_col=payload_col,
        order_col=order_col, extra_cols=["digest"],
    )
    return layout.select(
        surt_key_col(F.col(url_col)).alias("surt"),
        "shard",
        "offset",
        "record_len",
        "digest",
        F.col(order_col),
    )


def revisit_records(
    captures: DataFrame,
    url_col: str = "url",
    payload_col: str = "text",
    ts_col: str = "capture_ts",
) -> DataFrame:
    """WARC revisit-record dedup — store identical payload bytes ONCE.

    Real archive writers (Heritrix/wget WARC mode) replace a capture whose
    payload digest was already written by a zero-payload ``revisit`` record
    pointing at the original capture. Per payload digest, the earliest
    capture (ties broken by url — deterministic) is the ``response`` record;
    every later capture becomes ``revisit`` carrying (original_url,
    original_ts) and stores 0 payload bytes.

    Output: (url, capture_ts, digest, record_type, original_url,
    stored_len) with stored_len = payload length for the original, 0 for
    revisits — sum(stored_len) is the archive's dedup win.

    Scale shape: ONE shuffle on digest; the window partitions by digest
    (dup-cluster-sized groups, no global funnel), `first` over the ordered
    window is the running minimum = group minimum. Digest is md5 JVM-side.
    """
    d = captures.withColumn("digest", F.md5(F.col(payload_col)))
    w = (
        Window.partitionBy("digest")
        .orderBy(F.col(ts_col).asc(), F.col(url_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        d.withColumn("original_url", F.first(url_col).over(w))
        .withColumn("original_ts", F.first(ts_col).over(w))
        .withColumn(
            "record_type",
            F.when(
                (F.col(url_col) == F.col("original_url"))
                & (F.col(ts_col) == F.col("original_ts")),
                F.lit("response"),
            ).otherwise(F.lit("revisit")),
        )
        .withColumn(
            "stored_len",
            F.when(
                F.col("record_type") == "response", F.length(F.col(payload_col))
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
    return out.select(
        url_col, ts_col, "digest", "record_type", "original_url", "original_ts", "stored_len"
    )


def cdx_gap_audit(cdx: DataFrame) -> DataFrame:
    """Archive-integrity audit over a CDX index — per shard: are the
    byte ranges contiguous? (shard, n_records, n_gaps, lost_bytes,
    n_overlaps, contiguous). A gap means records were lost after
    indexing (truncated shard, failed upload); an overlap means the
    index itself is corrupt. This is the read-side invariant check a
    100 TB archive runs before serving seeks — the WARC sibling of the
    charset QA gate.

    Shape: ONE lead() window per shard ordered by offset (exactly the
    order a CDX file is stored in; per-shard volume = corpus/shards and
    the shard count scales with the corpus), then a map-side-partial
    groupBy(shard). Pure integer byte arithmetic."""
    w = Window.partitionBy("shard").orderBy(F.col("offset").asc())
    nxt = F.lead("offset").over(w)
    gap = F.when(nxt.isNull(), F.lit(0).cast("long")).otherwise(
        nxt - (F.col("offset") + F.col("record_len"))
    )
    per = cdx.select("shard", gap.alias("gap_bytes"))
    return per.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum((F.col("gap_bytes") > 0).cast("long")).cast("long").alias("n_gaps"),
        F.sum(
            F.when(F.col("gap_bytes") > 0, F.col("gap_bytes")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("lost_bytes"),
        F.sum((F.col("gap_bytes") < 0).cast("long")).cast("long").alias("n_overlaps"),
        (
            F.sum((F.col("gap_bytes") != 0).cast("long")) == F.lit(0)
        ).alias("contiguous"),
    )
