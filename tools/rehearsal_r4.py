"""Round-4 rehearsals: the measurements VERDICT r3's "Next round" asks for.

Subcommands (each prints ONE JSON line):

  highdup    — 500k-doc minhash dedup at ~35% duplication with EVERY driver
               fast path forced off (driver_threshold=0 AND
               label_broadcast_threshold=0): the distributed label join is
               the branch that runs in the high-dup 100-TB regime (#1).
  embed      — 500k-vector embedding_dedup, forced-distributed
               (driver_threshold=0): the new scalar-bucket-row shuffle (#5).
  events     — relational battery trio at 1M and 4M rows with group count
               proportional to rows: per-query wall must stay ~flat per row
               as groups scale (#2).
  fetchpool  — 150k-seed crawl with stateless_fetch=False (the real-
               webdriver actor-pool configuration, S8/ST1) vs stateless (#6).
  discovery  — 150k-seed, max_rows=8 discovery-heavy crawl: exercises the
               vectorized children_to_frontier on a wide children stream
               (#4); commit timing comes from the same run's epochs (#3).

Usage: python tools/rehearsal_r4.py <subcommand>
Env: RAY_GRAFT_CPUS (default 32), GRAFT_REH_ROWS scales highdup/embed.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _init():
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, num_cpus


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def _dup_corpus(n_rows: int, dup_rate: float, path: str):
    """Deterministic corpus with ~dup_rate of rows duplicating an earlier
    row (group id = hash % n_groups with n_groups = rows * (1 - dup_rate)).
    Returns (docs_dataset, ground_truth_dup_count)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    n_groups = max(1, int(n_rows * (1.0 - dup_rate)))

    def _mk(batch: pd.DataFrame, _ng=n_groups) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        gid = (
            pd.util.hash_array(i, categorize=False) % np.uint64(_ng)
        ).astype(np.int64)
        text = None
        for j in range(12):
            wj = (
                (gid.astype(np.uint64) * np.uint64(2654435761) + np.uint64(j))
                * np.uint64(0x9E3779B97F4A7C15)
            ) % np.uint64(10**12)
            piece = np.char.add("w", wj.astype(str))
            text = piece if text is None else np.char.add(
                np.char.add(text, " "), piece
            )
        return pd.DataFrame({"doc_id": i, "text": text, "gid": gid})

    shutil.rmtree(path, ignore_errors=True)
    rd.range(n_rows).map_batches(_mk, batch_format="pandas").write_parquet(path)
    import duckdb

    gt = duckdb.sql(
        f"SELECT COUNT(*) - COUNT(DISTINCT gid) FROM read_parquet('{path}/*.parquet')"
    ).fetchone()[0]
    return rd.read_parquet(path, columns=["doc_id", "text"]), int(gt)


def cmd_highdup() -> dict:
    ray, num_cpus = _init()
    import pandas as pd

    from outage_data_scraper_ray.functions.dedup import minhash_lsh_dedup

    n_rows = int(os.environ.get("GRAFT_REH_ROWS", "500000"))
    corpus, gt = _dup_corpus(n_rows, 0.35, "/tmp/odsr_r4_highdup")

    def _counts(labeled):
        def _cnt(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n": [len(b)], "d": [int((b["dup_group"] != b["doc_id"]).sum())]}
            )

        agg = labeled.map_batches(_cnt, batch_format="pandas").to_pandas()
        return int(agg["n"].sum()), int(agg["d"].sum())

    t0 = time.perf_counter()
    n, d = _counts(
        minhash_lsh_dedup(
            corpus, driver_threshold=0, row_hint=n_rows,
            label_broadcast_threshold=0,  # force the distributed label join
        )
    )
    sec = time.perf_counter() - t0
    out = {
        "rehearsal": "highdup_minhash_forced_label_join",
        "rows": n_rows, "dup_rate": 0.35, "ground_truth_dups": gt,
        "labeled_rows": n, "dups_found": d,
        "recall": round(d / gt, 4) if gt else None,
        "sec": round(sec, 1), "num_cpus": num_cpus,
        "peak_driver_rss_mb": round(_rss_mb(), 1),
        "forced": ["driver_threshold=0", "label_broadcast_threshold=0"],
    }
    shutil.rmtree("/tmp/odsr_r4_highdup", ignore_errors=True)
    ray.shutdown()
    return out


def cmd_embed() -> dict:
    ray, num_cpus = _init()
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from outage_data_scraper_ray.functions.dedup import embedding_dedup

    n_rows = int(os.environ.get("GRAFT_REH_ROWS", "500000"))
    n_groups = max(1, int(n_rows * 0.9))

    def _mk(batch: pd.DataFrame, _ng=n_groups) -> pd.DataFrame:
        i = batch["id"].to_numpy()
        h = pd.util.hash_array(i, categorize=False)
        gid = (h % np.uint64(_ng)).astype(np.int64)
        bits = (
            (gid[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.arange(16, 48, dtype=np.uint64)[None, :]
        ) & np.uint64(1)
        vecs = bits.astype(np.float32) * 2.0 - 1.0
        out = pd.DataFrame({"vec_id": h.view(np.int64), "gid": gid})
        out["embedding"] = list(vecs)
        return out

    path = "/tmp/odsr_r4_embed"
    shutil.rmtree(path, ignore_errors=True)
    rd.range(n_rows).map_batches(_mk, batch_format="pandas").write_parquet(path)
    import duckdb

    gt = duckdb.sql(
        f"SELECT COUNT(*) - COUNT(DISTINCT gid) FROM read_parquet('{path}/*.parquet')"
    ).fetchone()[0]
    emb = rd.read_parquet(path, columns=["vec_id", "embedding"])

    t0 = time.perf_counter()
    labeled = embedding_dedup(emb, driver_threshold=0, row_hint=n_rows)

    def _cnt(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [len(b)], "d": [int((b["dup_group"] != b["vec_id"]).sum())]}
        )

    agg = labeled.map_batches(_cnt, batch_format="pandas").to_pandas()
    sec = time.perf_counter() - t0
    out = {
        "rehearsal": "embedding_dedup_forced_f16_bucket_rows",
        "rows": n_rows, "ground_truth_dups": int(gt),
        "labeled_rows": int(agg["n"].sum()), "dups_found": int(agg["d"].sum()),
        "sec": round(sec, 1), "num_cpus": num_cpus,
        "peak_driver_rss_mb": round(_rss_mb(), 1),
        "forced": ["driver_threshold=0"],
    }
    shutil.rmtree(path, ignore_errors=True)
    ray.shutdown()
    return out


def cmd_events() -> dict:
    """Battery trio at 1M and 4M rows; group count scales with rows, so a
    per-group-dispatch implementation would scale superlinearly. The
    vectorized per-block kernels must keep sec/Mrow ~flat."""
    ray, num_cpus = _init()
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from outage_data_scraper_ray.functions import relational as R

    results = {}
    for n_rows in (1_000_000, 4_000_000):
        n_users = n_rows // 50  # ~50 events/user; groups scale with rows
        sf_dir = f"/tmp/odsr_r4_events_{n_rows}"
        shutil.rmtree(sf_dir, ignore_errors=True)
        os.makedirs(sf_dir)

        def _mk(batch: pd.DataFrame, _nu=n_users) -> pd.DataFrame:
            i = batch["id"].to_numpy()
            rngv = pd.util.hash_array(i, categorize=False)
            return pd.DataFrame(
                {
                    "event_id": i.astype("int64"),
                    "user_id": (rngv % np.uint64(_nu)).astype("int64"),
                    "event_type": (rngv % np.uint64(7)).astype("int64"),
                    "ts": pd.to_datetime(1_700_000_000_000, unit="ms")
                    + pd.to_timedelta((rngv % np.uint64(10**6)).astype("int64"), unit="s"),
                    "value": ((rngv % np.uint64(100000)).astype("int64") / 100.0),
                }
            )

        rd.range(n_rows).map_batches(_mk, batch_format="pandas").write_parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        row = {}
        for qname in ("window_end_ts", "minidx_dedup", "outage_metrics"):
            fn = getattr(R, qname)
            t0 = time.perf_counter()
            ds = fn(sf_dir)
            n_out = ds.count() if hasattr(ds, "count") else len(ds)
            row[qname] = {"sec": round(time.perf_counter() - t0, 2), "rows": int(n_out)}
        results[str(n_rows)] = row
        shutil.rmtree(sf_dir, ignore_errors=True)
    ray.shutdown()
    return {"rehearsal": "events_battery_group_scaling", "num_cpus": num_cpus,
            "results": results}


def _crawl(n_seeds: int, stateless: bool, max_rows: int, num_cpus: int) -> dict:
    import ray

    from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

    workdir = "/tmp/odsr_r4_crawl"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(
        n_seeds=n_seeds, workdir=workdir, max_epochs=4, max_rows=max_rows,
        politeness_rate=1e9, politeness_burst=1e9, failure_rate=0.01,
        batch_size=1024, fetch_concurrency=max(2, num_cpus - 4),
        seen_capacity=1 << 22, stateless_fetch=stateless,
    )
    t0 = time.perf_counter()
    job = CrawlJob(cfg)
    stats = job.run()
    sec = time.perf_counter() - t0
    fetched = int(stats["counters"].get("fetched", 0))
    out = {
        "seeds": n_seeds, "stateless_fetch": stateless, "max_rows": max_rows,
        "epochs": stats["epochs"], "urls": fetched,
        "spans": int(stats["counters"].get("spans", 0)),
        "sec": round(sec, 1), "urls_per_sec": round(fetched / sec, 1),
        "peak_driver_rss_mb": round(_rss_mb(), 1),
    }
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def cmd_fetchpool() -> dict:
    ray, num_cpus = _init()
    n_seeds = int(os.environ.get("GRAFT_REH_SEEDS", "150000"))
    # same-window pair: actor-pool configuration vs stateless tasks
    pool = _crawl(n_seeds, stateless=False, max_rows=2, num_cpus=num_cpus)
    stateless = _crawl(n_seeds, stateless=True, max_rows=2, num_cpus=num_cpus)
    ray.shutdown()
    return {"rehearsal": "fetch_actor_pool_vs_stateless", "num_cpus": num_cpus,
            "actor_pool": pool, "stateless": stateless}


def cmd_discovery() -> dict:
    ray, num_cpus = _init()
    n_seeds = int(os.environ.get("GRAFT_REH_SEEDS", "150000"))
    out = _crawl(n_seeds, stateless=True, max_rows=8, num_cpus=num_cpus)
    ray.shutdown()
    return {"rehearsal": "discovery_heavy_crawl", "num_cpus": num_cpus, **out}


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "highdup"
    fn = {"highdup": cmd_highdup, "embed": cmd_embed, "events": cmd_events,
          "fetchpool": cmd_fetchpool, "discovery": cmd_discovery}[cmd]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
