"""Presentation surface — the reference's driver-side rendering, re-expressed
so the *data* layout is computed distributed and only string/byte emission
happens on the driver.

Covers the two reference components previously documented out of scope:

* ``draw_forum`` ASCII tree (/root/reference/comment_tree.py:119-137): the
  reference logs ``-->  {forum} : {title}`` then one ``{prefix}|--- {id}``
  line per note, DFS order, ``prefix`` growing by four spaces per level.
  Here the whole render is a DataFrame: each note's line *text* and its DFS
  *sort key* are column expressions over the reply-forest edges, so a forum
  with 10^8 notes renders as a distributed sort, not a driver recursion.
  (The reference recurses per note on the driver and overflows Python's
  stack around depth ~1000; the column form has no depth limit.)

* chart "sinks" (/root/reference/statistics_from_json.py:48-302): the
  reference feeds driver-side dict loops into matplotlib. Here every chart's
  data matrix comes from the already-covered A1-A8 aggregation plans
  (tiny after aggregation — one row per venue/bin), and
  :mod:`..sources.chart_svg` emits standalone SVG bytes with no plotting
  dependency (matplotlib is unavailable in this environment; the SVG layout
  is therefore ours, the *numbers in the figure* are the reference's).

DFS ordering contract: the reference iterates notes in file order and
appends replies in that order, so its DFS visits children by recording
order. ``path`` = '/'-joined zero-padded rec_orders of the root->note chain;
lexicographic sort on it IS that DFS order (zero-padding makes the
per-segment string order numeric). Sorting (forum, path) reproduces the
reference's line order per forum, and is a plain distributed sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .comment_tree import forest_rows

PATH_PAD = 10  # zero-pad width per path segment; rec_order < 10^10

EDGES_PATH_SCHEMA = (
    "forum string, id string, parent_id string, root_id string, depth int,"
    " path string"
)


def forest_rows_with_path(
    forum: str, notes: list[tuple[str, str, int]]
) -> list[tuple]:
    """:func:`~.comment_tree.forest_rows` plus the DFS ``path`` key.

    ``notes`` = (id, replyto, rec_order) in recording order. The kept-note
    logic is delegated to ``forest_rows`` (single source of truth for the
    broken-chain / cycle-drop semantics); this wrapper only re-walks each
    kept note's ancestor chain to attach rec_order path segments."""
    parent = {nid: rt for nid, rt, _ in notes}
    order = {nid: ro for nid, _, ro in notes}
    kept = forest_rows(forum, [(nid, rt) for nid, rt, _ in notes])
    out = []
    for forum_, nid, parent_id, root_id, depth in kept:
        chain = [nid]
        cur = nid
        while parent[cur] != forum:
            cur = parent[cur]
            chain.append(cur)
        path = "/".join(str(order[x]).zfill(PATH_PAD) for x in reversed(chain))
        out.append((forum_, nid, parent_id, root_id, depth, path))
    return out


def reply_forest_paths(notes: DataFrame) -> DataFrame:
    """Reply-forest edges + DFS path key; input (forum, id, replyto,
    rec_order). Same per-forum Arrow shuffle as ``reply_forest``."""

    def _per_forum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rec_order", kind="mergesort")
        forum = pdf["forum"].iloc[0]
        rows = forest_rows_with_path(
            forum, list(zip(pdf["id"], pdf["replyto"], pdf["rec_order"]))
        )
        return pd.DataFrame(
            rows, columns=["forum", "id", "parent_id", "root_id", "depth", "path"]
        )

    return (
        notes.select("forum", "id", "replyto", "rec_order")
        .groupBy("forum")
        .applyInPandas(_per_forum, EDGES_PATH_SCHEMA)
    )


def forum_ascii_lines(edges_with_path: DataFrame, titles: DataFrame) -> DataFrame:
    """(forum, sort_key, line) — the draw_forum render as a DataFrame.

    ``titles``: (forum, title) one row per forum to render (the reference
    prints the submission's content title, comment_tree.py:126). Header rows
    get sort_key '' so they sort before every note path; note lines are
    ``'    ' * depth + '|--- ' + id`` exactly as ``__draw_note`` emits them
    (comment_tree.py:131-137 — prefix starts '' and grows 4 spaces/level).
    Collecting ordered by (forum, sort_key) — or writing partitioned by
    forum sorted within partitions — reproduces the reference log verbatim.
    """
    headers = titles.select(
        "forum",
        F.lit("").alias("sort_key"),
        F.concat(F.lit("-->  "), F.col("forum"), F.lit(" : "), F.col("title")).alias(
            "line"
        ),
    )
    note_lines = edges_with_path.select(
        "forum",
        F.col("path").alias("sort_key"),
        F.concat(
            F.repeat(F.lit("    "), F.col("depth")), F.lit("|--- "), F.col("id")
        ).alias("line"),
    )
    return headers.unionByName(note_lines)


def draw_forum(edges_with_path: DataFrame, forum: str, title: str) -> list[str]:
    """Driver-side convenience matching the reference entry point: the
    rendered lines for ONE forum, in order. The heavy work (forest assembly,
    DFS sort) ran distributed; this collects only the target forum's lines."""
    one = edges_with_path.filter(F.col("forum") == forum)
    spark = edges_with_path.sparkSession
    titles = spark.createDataFrame([(forum, title)], "forum string, title string")
    rows = (
        forum_ascii_lines(one, titles)
        .orderBy("sort_key")
        .select("line")
        .collect()
    )
    return [r["line"] for r in rows]
