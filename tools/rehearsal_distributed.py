"""Large-scale rehearsal of every forced-distributed branch in one run.

The driver thresholds that pick driver-side combines are all forced to 0,
so the branches that would actually execute at the north_rule's
10^10-frontier scale are the ones measured here:

- frontier dedupe: staged parquet + hash-partitioned drop_duplicates
  (frontier_driver_threshold=0) every epoch,
- seen-mark/counter commit: the distributed commit pass
  (commit_driver_threshold=0),
- exact dedup over the crawled span texts: one hash-shuffle on text_md5 +
  vectorized per-partition keep-min (broadcast_threshold=0).

Prints ONE JSON line with wall seconds per stage, throughput, and peak
driver RSS. Defaults: 1,000,000 seeds, max_rows=2 (shallow payloads — the
point is frontier/commit pressure, not parse volume).

    python tools/rehearsal_distributed.py
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n_seeds = int(os.environ.get("GRAFT_REH_SEEDS", "1000000"))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from outage_data_scraper_ray.functions.dedup import exact_dedup
    from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

    workdir = "/tmp/odsr_rehearsal"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(
        n_seeds=n_seeds,
        workdir=workdir,
        max_epochs=4,
        max_rows=2,
        politeness_rate=1e9,
        politeness_burst=1e9,
        failure_rate=0.01,
        batch_size=1024,
        fetch_concurrency=max(2, num_cpus - 4),
        n_seen_shards=8,
        n_sched_shards=4,
        seen_capacity=1 << 22,
        # force every distributed branch
        commit_driver_threshold=0,
        frontier_driver_threshold=0,
        dedupe_frontier=True,
    )
    t0 = time.perf_counter()
    job = CrawlJob(cfg)
    stats = job.run()
    crawl_sec = time.perf_counter() - t0

    fetched = int(stats["counters"].get("fetched", 0))
    spans = int(stats["counters"].get("spans", 0))

    # forced-join exact dedup over the crawled span texts
    docs = job.docs_dataset().map_batches(
        lambda t: t.select(["doc_id", "url"]).rename_columns(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    t0 = time.perf_counter()
    n_kept = exact_dedup(
        docs, broadcast_threshold=0, row_hint=fetched
    ).count()
    dedup_sec = time.perf_counter() - t0

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    shutil.rmtree(workdir, ignore_errors=True)
    ray.shutdown()

    print(json.dumps({
        "seeds": n_seeds,
        "num_cpus": num_cpus,
        "epochs": stats["epochs"],
        "urls": fetched,
        "spans": spans,
        "crawl_sec": round(crawl_sec, 1),
        "urls_per_sec": round(fetched / crawl_sec, 1),
        "exact_dedup_sec": round(dedup_sec, 1),
        "exact_dedup_kept": int(n_kept),
        "peak_driver_rss_mb": round(peak_rss_mb, 1),
        "forced": ["frontier_driver_threshold=0", "commit_driver_threshold=0",
                   "exact_dedup broadcast_threshold=0"],
    }))


if __name__ == "__main__":
    main()
