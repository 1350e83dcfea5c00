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


def drop_original_refs(raw_refs: DataFrame) -> DataFrame:
    """O1 ``refs[1:]`` semantics (/root/reference/crawler.py:86-87): element
    0 of a note's references list is the note itself (the "original");
    ``revisions`` excludes it. ``raw_refs`` carries ``rec_order`` = position
    in the raw references list; revision rows keep their RAW position, so a
    revision's pdf index below equals its rec_order (enumerate over refs[1:]
    is rec_order - 1, and the reference names pdfs with enumerate + 1)."""
    return raw_refs.filter(F.col("rec_order") >= 1)


def _set_map_key(m: Column, key: str, val: Column) -> Column:
    """content[key] = val without relying on a map-key dedup policy."""
    return F.map_concat(
        F.map_filter(m, lambda k, _v: k != F.lit(key)),
        F.create_map(F.lit(key), val),
    )


def _set_json_key(content_json: Column, key: str, val: Column) -> Column:
    """``d[key] = val`` on the serialized content (the reference mutates the
    dict BEFORE the JSON dump, crawler.py:116-117, so the sink JSON carries
    the local path too). Mirrors Python dict semantics: an existing key is
    rewritten in place, a missing key appends at the end. Pdf values are
    URL-ish paths — never embedded quotes — so the regex surgery is exact."""
    quoted = F.concat(F.lit(f'"{key}": "'), val, F.lit('"'))
    replaced = F.regexp_replace(content_json, f'"{key}": "[^"]*"', quoted)
    appended = F.when(
        content_json == "{}", F.concat(F.lit("{"), quoted, F.lit("}"))
    ).otherwise(
        F.concat(F.regexp_replace(content_json, r"\}$", ""), F.lit(", "), quoted, F.lit("}"))
    )
    return F.when(content_json.contains(f'"{key}": "'), replaced).otherwise(appended)


def pdf_eligible_parents(raw_refs: DataFrame) -> DataFrame:
    """(parent_id) of notes whose ORIGINAL reference carries a pdf — the
    reference's rewrite/download gate (crawler.py:90-94: ``"pdf" in
    refs[0].to_json()['content']``)."""
    return (
        raw_refs.filter(
            (F.col("rec_order") == 0) & F.map_contains_key("content", "pdf")
        )
        .select(F.col("parent_id").alias("__pdf_parent"))
        .distinct()
    )


def rewrite_pdf_paths(
    submissions: DataFrame, raw_refs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """P10 pdf path rewrite (/root/reference/crawler.py:116-117,132-133):
    for every pdf-eligible submission, point the pdf refs at the local crawl
    layout — submission content['pdf'] = '/pdf/{id}_0.pdf', revision at raw
    list position j (j >= 1) = '/pdf/{id}_{j}.pdf'. Returns the rewritten
    (submissions, revisions) pair; revisions come out refs[1:]-filtered.

    Both the queryable ``content`` map and the serialized ``content_json``
    are rewritten (the reference mutates the dict before the JSON dump).
    The joins are key-equi on the submission id — co-partitioned at scale,
    no broadcast needed for the big sides."""
    eligible = pdf_eligible_parents(raw_refs)
    sub_path = F.concat(F.lit("/pdf/"), F.col("id"), F.lit("_0.pdf"))
    subs = (
        submissions.join(
            eligible, submissions["id"] == eligible["__pdf_parent"], "left"
        )
        .withColumn(
            "content",
            F.when(
                F.col("__pdf_parent").isNotNull(),
                _set_map_key(F.col("content"), "pdf", sub_path),
            ).otherwise(F.col("content")),
        )
        .withColumn(
            "content_json",
            F.when(
                F.col("__pdf_parent").isNotNull(),
                _set_json_key(F.col("content_json"), "pdf", sub_path),
            ).otherwise(F.col("content_json")),
        )
        .drop("__pdf_parent")
    )
    rev_path = F.concat(
        F.lit("/pdf/"), F.col("parent_id"), F.lit("_"),
        F.col("rec_order").cast("string"), F.lit(".pdf"),
    )
    revs = (
        drop_original_refs(raw_refs)
        .join(eligible, F.col("parent_id") == eligible["__pdf_parent"], "left")
        .withColumn(
            "content",
            F.when(
                F.col("__pdf_parent").isNotNull(),
                _set_map_key(F.col("content"), "pdf", rev_path),
            ).otherwise(F.col("content")),
        )
        .withColumn(
            "content_json",
            F.when(
                F.col("__pdf_parent").isNotNull(),
                _set_json_key(F.col("content_json"), "pdf", rev_path),
            ).otherwise(F.col("content_json")),
        )
        .drop("__pdf_parent")
    )
    return subs, revs


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


def _with_pdf_binary(df: DataFrame, pdf_blobs: DataFrame | None) -> DataFrame:
    """Attach the fetched PDF blob column (database_model.py:62
    ``LargeBinary``; database.py stores the downloaded bytes on the
    submission/revision row). ``pdf_blobs`` = (note_id, pdf_binary); rows
    without a fetched blob carry NULL — the reference's timeout failure mode
    (README.md:159-162) leaves the same hole. Equi-join on the row key."""
    if pdf_blobs is None:
        return df.withColumn("pdf_binary", F.lit(None).cast("binary"))
    blobs = pdf_blobs.select(
        F.col("note_id").alias("__blob_id"), F.col("pdf_binary")
    )
    return df.join(blobs, df["id"] == blobs["__blob_id"], "left").drop("__blob_id")


def flatten_submissions(
    labeled_submissions: DataFrame, pdf_blobs: DataFrame | None = None
) -> DataFrame:
    df = _with_pdf_binary(labeled_submissions, pdf_blobs)
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
        "pdf_binary",
        "forum",
        "referent",
        "invitation",
        F.col("reply_count").alias("replyCount"),
        F.col("content_json").alias("submission_content"),
        *_author_cols("authorid", "authorids"),
        *_author_cols("author", "authors"),
    )


def flatten_revisions(
    revisions: DataFrame, pdf_blobs: DataFrame | None = None
) -> DataFrame:
    return _with_pdf_binary(revisions, pdf_blobs).select(
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
        "pdf_binary",
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
    # no forced broadcast: parent_content is one row per NOTE (corpus-sized,
    # wide content_json column) — the no-forced-broadcast-of-scaling-
    # relations rule (r3 verdict #2). AQE broadcasts when actually small.
    return (
        note_revisions.join(
            parent_content,
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
    pdf_blobs: DataFrame | None = None,
) -> dict[str, DataFrame]:
    return {
        "venue": flatten_venues(venues),
        "submission": flatten_submissions(labeled_submissions, pdf_blobs),
        "revisions": flatten_revisions(revisions, pdf_blobs),
        "notes": flatten_notes(notes),
        "note_revision": flatten_note_revisions(note_revisions, notes),
    }
