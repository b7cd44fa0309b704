"""Crawl linearity one step past r4 (VERDICT r4 #5 option B): the
politeness-bound hot-host gate at 2M AND 4M pending URLs in ONE quota
window (r4 measured 500k -> 2M = 2.1x wall at 4x rows; this extends the
trend 2M -> 4M). One host holds the pending mass against a 1,000/epoch
budget, so every epoch re-gates the full frontier — the worst-case gate
shape. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import pyarrow as pa


def _hot_seeds(n_hot: int) -> "pa.Table":
    from outage_data_scraper_ray.schemas import SEEDS
    from outage_data_scraper_ray.synth import make_seed_registry

    hot = pd.DataFrame(
        {
            "url": [f"https://hot.synthgrid.example/p{i:07d}" for i in range(n_hot)],
            "host": "hot.synthgrid.example",
            "emc": "HOT EMC",
            "state": "ga",
            "layout": "wov",
            "seed_index": np.arange(n_hot, dtype=np.int32),
            "utility_tier": (np.arange(n_hot) % 3).astype(np.int32),
            "refresh_deadline": pd.to_datetime(1_700_000_000_000, unit="ms")
            + pd.to_timedelta((np.arange(n_hot) * 7) % 9973, unit="s"),
        }
    )
    cold = make_seed_registry(2000, 7).to_pandas()
    cold["seed_index"] = (cold["seed_index"] + n_hot).astype("int32")
    return pa.Table.from_pandas(
        pd.concat([hot, cold], ignore_index=True), preserve_index=False
    ).cast(SEEDS)


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

    res = {"num_cpus": num_cpus, "budget_per_epoch": 1000, "epochs": 2}
    for n_hot in (2_000_000, 4_000_000):
        seeds = _hot_seeds(n_hot)
        workdir = f"/tmp/odsr_hot4m_{n_hot}"
        shutil.rmtree(workdir, ignore_errors=True)
        cfg = CrawlConfig(
            seeds_table=seeds, workdir=workdir, max_epochs=2, max_rows=2,
            failure_rate=0.0, politeness_rate=1000.0, politeness_burst=1000.0,
            politeness_dt=1.0, batch_size=2048,
            fetch_concurrency=max(2, num_cpus - 4),
            n_seen_shards=8, n_sched_shards=2,
        )
        t0 = time.perf_counter()
        stats = CrawlJob(cfg).run()
        res[f"hot_{n_hot}"] = {
            "sec": round(time.perf_counter() - t0, 1),
            "fetched": stats["counters"].get("fetched", 0),
        }
        shutil.rmtree(workdir, ignore_errors=True)
    res["ratio_4m_over_2m"] = round(
        res["hot_4000000"]["sec"] / res["hot_2000000"]["sec"], 2
    )
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
