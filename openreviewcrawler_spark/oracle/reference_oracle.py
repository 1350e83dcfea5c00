"""Single-node transliterations of the reference's parse/label/tree/stats
loops, operating on the nested dict model exactly like the reference does.

These are the *oracles* for the distributed operators — deliberately written
in the reference's imperative style (mutate nested dicts, nested loops) so the
engine's vectorized implementations are checked against an independent code
path, not against themselves.

Semantics sources:
  * labeling cascade  — /root/reference/acceptance_labeling.py:10-96
  * reply forest      — /root/reference/comment_tree.py:32-92
  * per-venue rollup  — /root/reference/statistics_from_json.py:8-46
"""

from __future__ import annotations


def label_nested(data: list[dict]) -> None:
    """Mutates each submission with ``acceptance_tag`` (reference rule order)."""
    for vy in data:
        for sub in vy["submissions"]:
            if "withdraw" in sub["invitation"].lower():
                sub["acceptance_tag"] = "withdrawn"
                continue
            if "decision" in sub["content"]:
                d = sub["content"]["decision"].lower()
                if "reject" in d and "accept" in d:
                    sub["acceptance_tag"] = "unknown"
                elif "reject" in d:
                    sub["acceptance_tag"] = "rejected"
                elif "accept" in d:
                    sub["acceptance_tag"] = "accepted"
                else:
                    if not (vy["venue"] == "ICLR.cc" and vy["year"] == 2014):
                        sub["acceptance_tag"] = "accepted"
                    else:
                        sub["acceptance_tag"] = "unknown"
            else:
                for note in sub["notes"]:
                    inv = note["invitation"].lower()
                    if "desk_reject" in inv:
                        sub["acceptance_tag"] = "rejected"
                    if "decision" in inv or "acceptance" in inv:
                        for key in note["content"]:
                            if "decision" in key.lower():
                                val = note["content"][key].lower()
                                if "reject" in val and "accept" in val:
                                    sub["acceptance_tag"] = "unknown"
                                elif "reject" in val:
                                    sub["acceptance_tag"] = "rejected"
                                elif "accept" in val:
                                    sub["acceptance_tag"] = "accepted"
                                else:
                                    sub["acceptance_tag"] = "accepted"
                        break
                    elif "meta" in inv:
                        try:
                            rec = note["content"]["recommendation"].lower()
                            if "reject" in rec:
                                sub["acceptance_tag"] = "rejected"
                            elif "accept" in rec:
                                sub["acceptance_tag"] = "accepted"
                            else:
                                sub["acceptance_tag"] = "unknown"
                        except KeyError:
                            sub["acceptance_tag"] = "unknown"
            if "acceptance_tag" not in sub:
                sub["acceptance_tag"] = "unknown"


def forest_nested(forum_notes: list[dict]) -> list[dict]:
    """Reference fixpoint forest assembly; returns nested root notes with
    ``replies`` lists; lone leaves silently dropped (comment_tree.py:56-60)."""
    roots, pending = [], []
    for note in forum_notes:
        note = dict(note)
        note["replies"] = []
        (roots if note["replyto"] == note["forum"] else pending).append(note)

    done = False
    while not done and pending:
        is_parent = {
            n["id"]: any(m["replyto"] == n["id"] for m in pending) for n in pending
        }
        done = not any(is_parent.values())
        remaining = list(pending)
        for n in pending:
            if not is_parent[n["id"]]:
                for candidate in remaining:
                    if candidate["id"] == n["replyto"]:
                        candidate["replies"].append(n)
                        remaining.remove(n)
                        break
        pending = remaining

    for leaf in pending:
        for r in roots:
            if r["id"] == leaf["replyto"]:
                r["replies"].append(leaf)
    return roots


def forest_edges(forum: str, forum_notes: list[dict]) -> set[tuple]:
    """Flatten the oracle forest into (id, parent_id, root_id, depth) edges."""
    edges: set[tuple] = set()

    def walk(note: dict, parent: str, root: str, depth: int) -> None:
        edges.add((note["id"], parent, root, depth))
        for child in note["replies"]:
            walk(child, note["id"], root, depth + 1)

    for root in forest_nested(forum_notes):
        walk(root, forum, root["id"], 0)
    return edges


def rollup_nested(data: list[dict]) -> dict[tuple, dict]:
    """Reference get_info aggregation (statistics_from_json.py:8-46):
    per (venue, year) with >0 submissions: label counts, note-type counts,
    comments/revisions-per-submission lists."""
    out: dict[tuple, dict] = {}
    for vy in data:
        if not vy["submissions"]:
            continue
        info = out.setdefault(
            (vy["venue"], vy["year"]),
            {
                "sub": 0, "accepted": 0, "rejected": 0, "withdrawn": 0, "unknown": 0,
                "comments_per_submission": [], "revisions_per_submission": [],
                "plain_comment": 0, "review": 0, "decision": 0, "other": 0,
            },
        )
        info["sub"] += len(vy["submissions"])
        for s in vy["submissions"]:
            info["comments_per_submission"].append(len(s["notes"]))
            info["revisions_per_submission"].append(len(s["revisions"]))
            tag = s.get("acceptance_tag")
            if tag in ("accepted", "rejected", "withdrawn", "unknown"):
                info[tag] += 1
            for n in s["notes"]:
                inv = n["invitation"].lower()
                if "review" in inv:
                    info["review"] += 1
                elif "comment" in inv:
                    info["plain_comment"] += 1
                elif "decision" in inv or "acceptance" in inv:
                    info["decision"] += 1
                else:
                    info["other"] += 1
    return out
