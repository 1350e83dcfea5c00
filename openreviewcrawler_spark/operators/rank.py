"""Link-based frontier prioritization — fixed-iteration PageRank.

The crawl plan ranks candidates by (seed_index, depth) — provenance order.
A web-scale frontier wants link evidence too: pages many crawled pages point
at should be fetched before deep orphans. This is the standard PageRank
recurrence run a FIXED number of iterations (not to convergence), which is
(a) how crawl schedulers actually use it (fresh scores per scheduling epoch
over a changing graph; convergence buys nothing), and (b) what makes the
computation exactly expressible in unrolled SQL for the DuckDB oracle.

Cross-engine exactness (the float parity recipe, see CLAUDE.md): per-row
double arithmetic (rank/out_degree, 0.15 + 0.85*s) is bit-identical across
engines; only the per-destination SUM is order-sensitive, so summands are
cast to DECIMAL(28,12) (exact, associative) and the sum cast back to
double. Ranks therefore stay bit-identical through every iteration, and the
final output is rounded once.

Scale shape per iteration: one shuffle joining ranks onto edges by src
(co-partitioned with the out-degree join on the same key, shared by AQE),
one map-side-combined groupBy on dst. Rank and degree tables are O(nodes);
edges stream. Dangling mass (nodes with no outlinks) is dropped, not
redistributed — documented deviation from the normalized eigenvector
formulation; ordering, which is what a scheduler consumes, is preserved for
the fixed-iteration use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def link_rank(
    edges: DataFrame, nodes: DataFrame, n_iter: int = 3, damping: float = DAMPING
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank iterations from
    rank0 = 1.0. ``edges``: (src, dst), self-loops excluded by the caller;
    ``nodes``: (node) — the full universe, so sinks keep rows."""
    deg = edges.groupBy("src").agg(F.count("*").alias("__d"))
    ranks = nodes.select("node", F.lit(1.0).alias("r"))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("__d")).alias("c"))
        )
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast("decimal(28,12)")).cast("double").alias("s")
        )
        ranks = (
            nodes.join(sums.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round(F.col("r"), 6).alias("rank"))


def link_rank_sql(
    edges_cte: str, nodes_cte: str, n_iter: int = 3, damping: float = DAMPING
) -> str:
    """The identical recurrence, unrolled as SQL CTE layers for the oracle.
    ``edges_cte`` / ``nodes_cte`` are CTE bodies yielding (src, dst) and
    (node)."""
    base = 1.0 - damping
    parts = [
        f"edges as ({edges_cte})",
        f"nodes as ({nodes_cte})",
        "deg as (select src, count(*) as d from edges group by src)",
        "r0 as (select node, cast(1.0 as double) as r from nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"c{i + 1} as (select e.dst as node,"
            f" cast(sum(cast(r.r / deg.d as decimal(28,12))) as double) as s"
            f" from edges e join r{i} r on e.src = r.node"
            f" join deg on deg.src = e.src group by e.dst)"
        )
        parts.append(
            f"r{i + 1} as (select n.node,"
            f" cast({base} as double) + cast({damping} as double)"
            f" * coalesce(c{i + 1}.s, cast(0.0 as double)) as r"
            f" from nodes n left join c{i + 1} using (node))"
        )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect node, round(r, 6) as rank from r{n_iter}"
    )
