"""openreviewcrawler_spark — a from-scratch PySpark-native crawl/analytics engine.

Re-expresses the query and data-processing capabilities of the reference
fetch-and-parse pipeline (ErikBird/OpenReviewCrawler, /root/reference) as a
distributed URL-frontier + fetch scheduler over Common-Crawl-style web-page
tables, plus the reference's parse/label/tree/flatten/statistics operators and
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs only where built-in operators cannot express the
semantics (HTML parsing, the reference's ordered labeling cascade, the reply
forest fixpoint). No per-row Python UDFs anywhere in the hot path.
"""

__version__ = "0.1.0"
