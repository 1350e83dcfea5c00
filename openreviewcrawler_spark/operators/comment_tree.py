"""Reply-forest assembly (J5) — the reference's comment_tree fixpoint
(/root/reference/comment_tree.py:32-92), distributed.

Reference semantics for acyclic inputs: a note is kept iff its ``replyto``
chain reaches the forum root through existing notes; kept notes form a forest
rooted at the notes whose ``replyto == forum``; *lone leaves* — notes whose
chain breaks — are silently dropped ("assume mistake in crawling",
comment_tree.py:56-60). (On cyclic input the reference never terminates; the
engine drops cycle members, documented deviation.)

Two implementations of one contract, equality-tested:

* ``reply_forest`` — ``applyInPandas`` per forum (the idiomatic choice:
  forums are small, median <10 notes; one shuffle on forum).
* ``reply_forest_global`` — BFS by iterative self-join, depth-synchronous,
  for the adversarial giant-forum case where one forum exceeds a task.

Output: (forum, id, parent_id, root_id, depth) edge rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGES_SCHEMA = "forum string, id string, parent_id string, root_id string, depth int"


def forest_rows(forum: str, notes: list[tuple[str, str]]) -> list[tuple]:
    """Chain-walk for one forum. ``notes`` = (id, replyto) pairs in list
    order. Engine-side algorithm (independent of the oracle's fixpoint)."""
    parent = dict(notes)
    rows = []
    for nid, _ in notes:
        chain = [nid]
        cur = nid
        ok = False
        seen = {nid}
        while True:
            p = parent.get(cur)
            if p == forum:
                ok = True
                break
            if p is None or p not in parent or p in seen:
                break  # broken chain or cycle -> dropped
            seen.add(p)
            chain.append(p)
            cur = p
        if ok:
            root = chain[-1]
            rows.append((forum, nid, parent[nid], root, len(chain) - 1))
    return rows


def reply_forest(notes: DataFrame) -> DataFrame:
    """Per-forum Arrow UDF assembly; input needs (forum, id, replyto, rec_order)."""

    def _per_forum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rec_order", kind="mergesort")
        forum = pdf["forum"].iloc[0]
        rows = forest_rows(forum, list(zip(pdf["id"], pdf["replyto"])))
        return pd.DataFrame(rows, columns=["forum", "id", "parent_id", "root_id", "depth"])

    return (
        notes.select("forum", "id", "replyto", "rec_order")
        .groupBy("forum")
        .applyInPandas(_per_forum, EDGES_SCHEMA)
    )


def reply_forest_global(notes: DataFrame, max_depth: int = 32) -> DataFrame:
    """Depth-synchronous BFS via iterative self-join — scales past any single
    forum's size. Each level is one equi-join child.replyto == parent.id."""
    base = notes.select("forum", "id", "replyto")
    roots = base.filter(F.col("replyto") == F.col("forum")).select(
        "forum",
        "id",
        F.col("replyto").alias("parent_id"),
        F.col("id").alias("root_id"),
        F.lit(0).cast("int").alias("depth"),
    )
    from ..caching import track_persist

    levels = [roots]
    # tracked: every level stays referenced by the returned union, so the
    # handles must outlive the call (released between queries by the caller)
    current = track_persist(roots)
    for depth in range(1, max_depth + 1):
        nxt = (
            base.alias("c")
            .join(
                current.select(
                    F.col("id").alias("__pid"), F.col("root_id").alias("__root")
                ),
                F.col("c.replyto") == F.col("__pid"),
                "inner",
            )
            .select(
                "c.forum",
                "c.id",
                F.col("c.replyto").alias("parent_id"),
                F.col("__root").alias("root_id"),
                F.lit(depth).cast("int").alias("depth"),
            )
        )
        nxt = track_persist(nxt)
        if nxt.isEmpty():
            nxt.unpersist()
            break
        levels.append(nxt)
        current = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
