"""Statistics aggregations (A1-A8) + the note-type classifier (P9) —
/root/reference/statistics_from_json.py, as declarative groupBy plans.

All of these are single-shuffle aggregations with map-side partials; the
pivot-style share matrices use explicit ``sum(when(...))`` so output column
names are stable across engines (driver oracle-compare hashes by name).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NOTE_TYPES = ("review", "plain_comment", "decision", "other")
LABELS = ("accepted", "rejected", "withdrawn", "unknown")


def note_type_col(invitation: Column) -> Column:
    """P9 — substring classifier with the reference's precedence
    (statistics_from_json.py:37-45)."""
    inv = F.lower(invitation)
    return (
        F.when(inv.contains("review"), F.lit("review"))
        .when(inv.contains("comment"), F.lit("plain_comment"))
        .when(inv.contains("decision") | inv.contains("acceptance"), F.lit("decision"))
        .otherwise(F.lit("other"))
    )


def venue_year_rollup(labeled_submissions: DataFrame, notes: DataFrame) -> DataFrame:
    """A1 — per (venue, year): submission count, label counts, note-type
    counts, and per-submission comment/revision count arrays (in submission
    order, matching the reference's list append order)."""
    note_counts = notes.groupBy("parent_id").agg(F.count("*").alias("n_notes"))
    typed = notes.select("venue", "year", note_type_col(F.col("invitation")).alias("t"))
    type_counts = typed.groupBy("venue", "year").agg(
        *[
            F.sum(F.when(F.col("t") == t, 1).otherwise(0)).alias(t)
            for t in NOTE_TYPES
        ]
    )
    subs = labeled_submissions.join(
        note_counts, labeled_submissions["id"] == note_counts["parent_id"], "left"
    ).withColumn("n_notes", F.coalesce("n_notes", F.lit(0)))
    per_vy = subs.groupBy("venue", "year").agg(
        F.count("*").alias("sub"),
        *[
            F.sum(F.when(F.col("acceptance_tag") == lab, 1).otherwise(0)).alias(lab)
            for lab in LABELS
        ],
        F.transform(
            F.sort_array(F.collect_list(F.struct("rec_order", "n_notes"))),
            lambda s: s["n_notes"],
        ).alias("comments_per_submission"),
    )
    return per_vy.join(type_counts, ["venue", "year"], "left").fillna(
        0, subset=list(NOTE_TYPES)
    )


def revisions_per_submission(
    submissions: DataFrame, revisions: DataFrame
) -> DataFrame:
    """A2 — revision count per submission (0 for none)."""
    rev_counts = revisions.groupBy("parent_id").agg(F.count("*").alias("n_revisions"))
    return (
        submissions.join(
            rev_counts, submissions["id"] == rev_counts["parent_id"], "left"
        )
        .withColumn("n_revisions", F.coalesce("n_revisions", F.lit(0)))
        .select("venue", "year", "id", "rec_order", "n_revisions")
    )


def global_totals(
    labeled_submissions: DataFrame, notes: DataFrame, revisions: DataFrame
) -> DataFrame:
    """A3 — one-row totals (statistics_from_json.py:304-312)."""
    s = labeled_submissions.agg(F.count("*").alias("total_submissions"))
    n = notes.agg(F.count("*").alias("total_comments"))
    r = revisions.agg(F.count("*").alias("total_revisions"))
    return s.crossJoin(n).crossJoin(r)


def label_share(rollup: DataFrame) -> DataFrame:
    """A4 — label_count / submissions per venue-year."""
    return rollup.select(
        "venue",
        "year",
        *[(F.col(lab) / F.col("sub")).alias(f"{lab}_share") for lab in LABELS],
    )


def type_share(rollup: DataFrame) -> DataFrame:
    """A5 — type_count / total comments per venue-year, div-by-0 guarded
    (statistics_from_json.py:79-82)."""
    total = sum(F.col(t) for t in NOTE_TYPES)
    return rollup.select(
        "venue",
        "year",
        *[F.try_divide(F.col(t), total).alias(f"{t}_share") for t in NOTE_TYPES],
    )


def count_histogram(df: DataFrame, count_col: str, cap: int = 30) -> DataFrame:
    """A7/F8 — unit-bin histogram of an integer count column, outliers > cap
    dropped (statistics_from_json.py:264,285), density-normalized."""
    filtered = df.filter(F.col(count_col) <= cap)
    hist = filtered.groupBy(F.col(count_col).alias("bin")).agg(
        F.count("*").alias("n")
    )
    total = Window.partitionBy()
    return hist.select(
        "bin", "n", (F.col("n") / F.sum("n").over(total)).alias("density")
    )


def median_of(df: DataFrame, col: str, by: list[str] | None = None) -> DataFrame:
    """A8 — exact median (reference: violinplot medians)."""
    if by:
        return df.groupBy(*by).agg(F.median(col).alias("median"))
    return df.agg(F.median(col).alias("median"))


def attach_notes_with_misses(
    submissions: DataFrame, other_notes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """J2 — attach other-notes to their forum's submission, SURFACING misses.

    The reference drops a note whose forum has no crawled submission with a
    debug log (/root/reference/crawler.py:104-108: ``KeyError`` on
    ``forum_idx_map`` -> ``log.debug``); a silent drop is exactly the row
    loss a crawl operator must count. Returns ``(attached, orphans)``:
    ``attached`` = notes whose forum exists (left-semi, note columns
    unchanged), ``orphans`` = the left-anti complement, ready for a metrics
    sink. Both joins are key-equi on the submission id — co-partitioned at
    scale, one shuffle shared by AQE."""
    sub_ids = submissions.select(F.col("id").alias("__sub_id"))
    attached = other_notes.join(
        sub_ids, other_notes["forum"] == sub_ids["__sub_id"], "left_semi"
    )
    orphans = other_notes.join(
        sub_ids, other_notes["forum"] == sub_ids["__sub_id"], "left_anti"
    )
    return attached, orphans


def orphan_metrics(orphans: DataFrame) -> DataFrame:
    """Per-forum orphan counts — the metrics table J2 promises (SURVEY.md):
    what the reference logs at debug level and forgets, kept queryable."""
    return orphans.groupBy("forum").agg(
        F.count("*").cast("long").alias("n_orphans"),
        F.min("id").alias("first_orphan_id"),
    )


def rate_timeseries(
    events: DataFrame,
    bucket_s: int = 60,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window fetch-rate rollup — events per time bucket per type.

    The crawl dashboard's counts-over-time: one groupBy on the (bucket,
    type) pair where bucket = epoch_millis div (bucket_s*1000) — an
    integral projection, so the whole rollup is a single map-side-combined
    aggregation (the streaming twin is ``streaming/ingest.py``'s windowed
    metrics; this is the batch/backfill path over the same event log).

    Value sums follow the float-parity recipe (CLAUDE.md): summands cast
    to DECIMAL(18,4) — exact, associative, fold-order independent — sum
    cast back to DOUBLE, rounded. Parquet timestamps arrive NTZ in Spark;
    the cast to timestamp is an identity relabel under the UTC session TZ.
    """
    bucket = F.expr(
        f"unix_millis(cast({ts_col} as timestamp)) div {bucket_s * 1000}"
    ).alias("bucket")
    return (
        events.groupBy(bucket, F.col(type_col).alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_value"),
        )
    )
