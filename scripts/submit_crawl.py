"""spark-submit entry point for the crawl engine.

Usage (the north-rule launch path):

    cd /root/repo && zip -qr /tmp/orc_spark.zip openreviewcrawler_spark
    spark-submit --master local[32] \
        --py-files /tmp/orc_spark.zip \
        scripts/submit_crawl.py --pages 50000 --hosts 512 --rounds 2 \
        --store /tmp/crawl_store

On a real cluster only --master changes (yarn/k8s); the py-files zip ships
the package to executors. Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=50000)
    ap.add_argument("--hosts", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--store", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    # SparkSession comes from spark-submit's conf; the factory only fills
    # gaps when run standalone.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from openreviewcrawler_spark.plans.crawl import CrawlConfig, run_crawl
    from openreviewcrawler_spark.sources.bench_data import (
        synth_pages,
        synth_robots,
        synth_seeds,
    )
    from openreviewcrawler_spark.sources.checkpoint import SnapshotStore

    pages = synth_pages(spark, args.pages, args.hosts)
    seeds = synth_seeds(spark, args.pages, args.hosts)
    robots = synth_robots(spark, args.hosts, args.budget)
    cfg = CrawlConfig(max_rounds=args.rounds, default_budget=args.budget)
    store = SnapshotStore(args.store) if args.store else None

    t0 = time.time()
    state = run_crawl(spark, pages, seeds, robots, cfg, store=store, resume=args.resume)
    wall = time.time() - t0
    fetched = state.store.read(spark, "fetched")
    n_fetched = fetched.count() if fetched is not None else 0
    print(
        json.dumps(
            {
                "rounds_run": state.rounds_run,
                "n_fetched": n_fetched,
                "wall_s": round(wall, 2),
                "rounds": state.round_counts,
                "store": state.store.root,
            }
        )
    )


if __name__ == "__main__":
    main()
