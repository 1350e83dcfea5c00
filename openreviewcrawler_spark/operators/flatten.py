"""Normalize/flatten projection (P8) — nested model -> the reference's
5-table SQL schema (/root/reference/database/database.py:104-186,
database/database_model.py:14-155), as pure ``select`` projections.

Faithfully reproduced reference quirks (each is a deliberate bug-parity
choice, cited):
  * author lists truncated at 12 and pivoted to positional columns
    author0..author11 / authorid0..authorid11 (database.py:129-133); the
    model declares 13 columns (model lines 35-60), so author12/authorid12
    exist but are always NULL.
  * ``submission.replyto`` reads the *note field* but is gated on the key
    being present in **content** (database.py:122: ``s["replyto"] if
    "replyto" in s['content'].keys() else ""``) — in practice always "".
  * ``note_revision.note_content`` stringifies the **parent note's** content,
    not the revision's (database.py:186: ``str(n["content"])``).
  * ``str(dict)`` serialization is replaced by ``content_json`` (valid JSON;
    documented deviation, SURVEY.md F4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_AUTHOR_COLS = 13  # model declares 13; reference fills at most 12
_TRUNCATE_AT = 12


def _author_cols(prefix: str, key: str) -> list[Column]:
    cols = []
    for i in range(N_AUTHOR_COLS):
        if i < _TRUNCATE_AT:
            c = F.try_element_at(F.col("content_lists").getItem(key), F.lit(i + 1))
        else:
            c = F.lit(None).cast("string")
        cols.append(c.alias(f"{prefix}{i}"))
    return cols


def _content_str(col_if_present: str, default: str = "") -> Column:
    return F.coalesce(F.col("content").getItem(col_if_present), F.lit(default))


def flatten_venues(venues: DataFrame) -> DataFrame:
    """venue(id, venue, year) — year stored as string (model line 17)."""
    return venues.select(
        F.col("venue_id").alias("id"),
        "venue",
        F.col("year").cast("string").alias("year"),
    )


def flatten_submissions(labeled_submissions: DataFrame) -> DataFrame:
    df = labeled_submissions
    has_tag = "acceptance_tag" in df.columns
    return df.select(
        "id",
        F.col("venue_id").alias("venue"),
        "original",
        "cdate",
        "tcdate",
        "tmdate",
        "ddate",
        "number",
        _content_str("title").alias("title"),
        _content_str("abstract").alias("abstract"),
        # bug-parity: gate on content key, read the note field (database.py:122)
        F.when(F.map_contains_key("content", "replyto"), F.col("replyto"))
        .otherwise(F.lit(""))
        .alias("replyto"),
        (F.coalesce(F.col("acceptance_tag"), F.lit("")) if has_tag else F.lit("")).alias(
            "acceptance_tag"
        ),
        _content_str("pdf").alias("pdf_ref"),
        "forum",
        "referent",
        "invitation",
        F.col("reply_count").alias("replyCount"),
        F.col("content_json").alias("submission_content"),
        *_author_cols("authorid", "authorids"),
        *_author_cols("author", "authors"),
    )


def flatten_revisions(revisions: DataFrame) -> DataFrame:
    return revisions.select(
        "id",
        F.col("parent_id").alias("submission"),
        "original",
        "cdate",
        "tcdate",
        "tmdate",
        "ddate",
        "number",
        _content_str("title").alias("title"),
        _content_str("abstract").alias("abstract"),
        F.when(F.map_contains_key("content", "replyto"), F.col("replyto"))
        .otherwise(F.lit(""))
        .alias("replyto"),
        _content_str("pdf").alias("pdf_ref"),
        "forum",
        "referent",
        "invitation",
        F.col("content_json").alias("revision_content"),
        *_author_cols("authorid", "authorids"),
        *_author_cols("author", "authors"),
    )


def flatten_notes(notes: DataFrame) -> DataFrame:
    return notes.select(
        "id",
        F.col("parent_id").alias("submission"),
        "original",
        "cdate",
        "tcdate",
        "tmdate",
        "ddate",
        "number",
        _content_str("title").alias("title"),
        _content_str("decision").alias("decision"),
        "forum",
        "referent",
        "invitation",
        "replyto",
        F.col("reply_count").alias("replyCount"),
        F.col("content_json").alias("note_content"),
    )


def flatten_note_revisions(note_revisions: DataFrame, notes: DataFrame) -> DataFrame:
    parent_content = notes.select(
        F.col("id").alias("__note_id"), F.col("content_json").alias("__parent_content")
    )
    return (
        note_revisions.join(
            F.broadcast(parent_content),
            note_revisions["parent_id"] == parent_content["__note_id"],
            "left",
        )
        .select(
            "id",
            F.col("parent_id").alias("submission"),
            "original",
            "cdate",
            "tcdate",
            "tmdate",
            "ddate",
            "number",
            _content_str("title").alias("title"),
            _content_str("decision").alias("decision"),
            "forum",
            "referent",
            "invitation",
            "replyto",
            F.col("reply_count").alias("replyCount"),
            # bug-parity: parent note's content (database.py:186)
            F.col("__parent_content").alias("note_content"),
        )
    )


def flatten_all(
    venues: DataFrame,
    labeled_submissions: DataFrame,
    revisions: DataFrame,
    notes: DataFrame,
    note_revisions: DataFrame,
) -> dict[str, DataFrame]:
    return {
        "venue": flatten_venues(venues),
        "submission": flatten_submissions(labeled_submissions),
        "revisions": flatten_revisions(revisions),
        "notes": flatten_notes(notes),
        "note_revision": flatten_note_revisions(note_revisions, notes),
    }
