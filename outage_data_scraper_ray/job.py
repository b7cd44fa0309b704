"""Cluster job entry point: ``ray job submit -- python -m outage_data_scraper_ray.job``.

The north_star runs the crawl via ``ray job submit`` on fixed N-node and
4N-node clusters. This module is that entry: it connects to the cluster the
job runner provides (``RAY_ADDRESS``, set by ``ray job submit``; falls back
to a local session for development), runs the epoch crawl loop to
completion (resumable — re-submitting with the same --workdir continues
from the last complete epoch checkpoint), and prints one JSON line of
counters + throughput.

Examples
--------
Local dev run::

    python -m outage_data_scraper_ray.job --seeds 1000 --workdir /tmp/crawl1

Cluster run (the only process that owns a Ray session is this driver)::

    ray job submit --working-dir . -- python -m outage_data_scraper_ray.job \
        --seeds 10000000 --workdir /mnt/shared/crawl1 --epoch-capacity 2000000

The workdir must be on storage every node can read (the frontier / docs /
checkpoint parquet lives there); per-epoch output is partitioned one
directory per epoch so a resumed run skips finished epochs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=285)
    p.add_argument("--workdir", required=True)
    p.add_argument("--max-epochs", type=int, default=50)
    p.add_argument("--epoch-capacity", type=int, default=None)
    p.add_argument("--politeness-rate", type=float, default=64.0)
    p.add_argument("--politeness-burst", type=float, default=64.0)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--max-rows", type=int, default=8)
    p.add_argument("--failure-rate", type=float, default=0.02)
    p.add_argument("--seen-shards", type=int, default=8)
    p.add_argument("--seen-capacity", type=int, default=1 << 20)
    p.add_argument("--resume", action="store_true",
                   help="continue from the last complete epoch checkpoint")
    args = p.parse_args(argv)

    import ray

    started_session = False
    if not ray.is_initialized():
        # under `ray job submit`, RAY_ADDRESS points at the cluster; standalone
        # it starts a local session
        ray.init(include_dashboard=False)
        started_session = True

    from .pipelines.crawl import CrawlConfig, CrawlJob

    cfg = CrawlConfig(
        n_seeds=args.seeds,
        workdir=args.workdir,
        max_epochs=args.max_epochs,
        epoch_capacity=args.epoch_capacity,
        politeness_rate=args.politeness_rate,
        politeness_burst=args.politeness_burst,
        batch_size=args.batch_size,
        max_rows=args.max_rows,
        failure_rate=args.failure_rate,
        n_seen_shards=args.seen_shards,
        seen_capacity=args.seen_capacity,
    )
    t0 = time.perf_counter()
    job = CrawlJob(cfg)
    stats = job.run(resume=args.resume)
    wall = time.perf_counter() - t0
    fetched = stats["counters"].get("fetched", 0)
    print(
        json.dumps(
            {
                "epochs": stats["epochs"],
                "counters": stats["counters"],
                "wall_sec": round(wall, 3),
                "urls_per_sec": round(fetched / wall, 1) if wall else 0.0,
                "docs_paths": stats["docs_paths"],
            }
        )
    )
    if started_session:  # only tear down a session this entry point owns
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
