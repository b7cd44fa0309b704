"""Round-5 rehearsals: the measurements VERDICT r4's "Next round" asks for.

Subcommands (each prints ONE JSON line):

  sessionize — 1M+ rows / 50k+ groups threshold sessionization, same-window
               A/B: the new hash-partitioned per-block group loop vs the
               legacy groupby().map_groups per-GROUP dispatch (#1). Also a
               group-count ladder at fixed rows: wall must stay roughly
               flat as groups grow (the dispatch, not the merge, was the
               group-scaled term).
  endurance  — 20+ crawl epochs on a modest frontier: per-epoch wall and
               driver RSS must stay flat over time (manifests, cuckoo
               dumps, token-bucket checkpoints) (#8).

Usage: python tools/rehearsal_r5.py <subcommand>
Env: RAY_GRAFT_CPUS (default 32), GRAFT_REH_ROWS scales sessionize.
"""

from __future__ import annotations

import json
import os
import resource
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


def _pous_frame(n_rows: int, n_groups: int, seed: int = 7):
    """Synthetic POUS feed: n_groups (utility,county,city) groups, rows
    spread evenly, CustomersOut a seeded random walk with zero resets (so
    runs split and all merger cases fire)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    gid = np.repeat(np.arange(n_groups), n_rows // n_groups)
    gid = np.concatenate([gid, np.zeros(n_rows - len(gid), dtype=np.int64)])
    gid.sort(kind="stable")
    step = rng.integers(-300, 320, n_rows)
    out = np.abs(np.cumsum(step))
    out[rng.random(n_rows) < 0.02] = 0
    # within-group ordinal, vectorized: arange - repeated group starts
    counts = np.bincount(gid, minlength=n_groups)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ordinal = np.arange(n_rows, dtype=np.int64) - np.repeat(starts, counts)
    ts = pd.Timestamp("2023-01-01") + pd.to_timedelta(ordinal * 900, unit="s")
    g = pd.Series(gid)
    return pd.DataFrame(
        {
            "UtilityName": "U" + (g % 97).astype(str),
            "StateName": "ga",
            "CountyName": "C" + (g % 991).astype(str),
            "CityName": "X" + g.astype(str),
            "CountyFIPS": (g % 991).astype(str),
            "CustomersTracked": np.int64(100_000),
            "RecordDateTime": ts,
            "CustomersOut": out.astype("int64"),
        }
    )


def _legacy_sessionize(ds, *, threshold: float, abs_diff: float):
    """The pre-r5 shape: groupby(GROUP_KEYS).map_groups — one Python
    dispatch per (utility,state,county,city) group. Kept here only as the
    rehearsal's A-side."""
    import pandas as pd

    from outage_data_scraper_ray.pipelines.sessionize import (
        GROUP_KEYS,
        _empty_events,
        _split_runs,
        merge_threshold_sessions,
    )

    def _per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("CustomersOut", kind="mergesort").drop_duplicates(
            subset=GROUP_KEYS + ["RecordDateTime"], keep="first"
        )
        g = g.sort_values("RecordDateTime", kind="mergesort")
        events = []
        for run in _split_runs(g):
            events.extend(
                merge_threshold_sessions(run.to_dict("records"), threshold, abs_diff)
            )
        if not events:
            return _empty_events()
        out = pd.DataFrame(events)[
            ["UtilityName", "StateName", "CountyName", "CityName", "CountyFIPS",
             "CustomersTracked", "start_time", "end_time", "duration",
             "customer_affected_mean"]
        ]
        return out[out["duration"] > pd.Timedelta(seconds=0)]

    return ds.groupby(GROUP_KEYS).map_groups(_per_group, batch_format="pandas")


def cmd_sessionize():
    import ray.data as rd

    from outage_data_scraper_ray.pipelines.sessionize import sessionize

    ray, num_cpus = _init()
    n_rows = int(os.environ.get("GRAFT_REH_ROWS", "1200000"))
    res = {"rows": n_rows, "num_cpus": num_cpus}

    # A/B at 60k groups (>=50k bar), same window, new path first and last
    # (ABA guards against quota drift inside the window)
    df = _pous_frame(n_rows, 60_000)
    walls = {}
    for tag, run in (
        ("new", lambda d: sessionize(d, method="threshold", threshold=0.1)),
        ("legacy", lambda d: _legacy_sessionize(d, threshold=0.1, abs_diff=0.0)),
        ("new2", lambda d: sessionize(d, method="threshold", threshold=0.1)),
    ):
        ds = rd.from_pandas(df).repartition(num_cpus)
        t0 = time.perf_counter()
        n_events = run(ds).count()
        walls[tag] = round(time.perf_counter() - t0, 2)
        res.setdefault("events", n_events)
        assert n_events == res["events"], (tag, n_events, res["events"])
    res["ab_60k_groups"] = walls

    # group ladder at fixed rows: wall must stay ~flat vs group count
    ladder = {}
    for n_groups in (6_000, 60_000, 240_000):
        df = _pous_frame(n_rows, n_groups)
        ds = rd.from_pandas(df).repartition(num_cpus)
        t0 = time.perf_counter()
        n_events = sessionize(ds, method="threshold", threshold=0.1).count()
        ladder[str(n_groups)] = {
            "sec": round(time.perf_counter() - t0, 2), "events": n_events,
        }
    res["group_ladder"] = ladder
    res["rss_mb"] = round(_rss_mb(), 1)
    print(json.dumps(res))
    ray.shutdown()


def cmd_endurance():
    import shutil

    from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

    ray, num_cpus = _init()
    workdir = "/tmp/odsr_reh_endurance"
    shutil.rmtree(workdir, ignore_errors=True)
    # modest frontier drained by a fixed per-epoch capacity so the crawl
    # runs 24+ epochs with a STEADY fetch load per epoch: per-epoch
    # overhead (manifest write, cuckoo dump, token-bucket checkpoint,
    # commit pass, seen-set growth) is the thing under test
    n_seeds = 40_000
    job = CrawlJob(
        CrawlConfig(
            n_seeds=n_seeds, workdir=workdir, exact_seen=True,
            politeness_rate=64.0, politeness_burst=64.0, politeness_dt=1.0,
            epoch_capacity=1_500, max_epochs=26, failure_rate=0.0, max_rows=2,
        )
    )
    epochs = []
    t_prev = time.perf_counter()

    def _tick(epoch: int) -> None:
        nonlocal t_prev
        now = time.perf_counter()
        epochs.append(
            {"epoch": epoch, "sec": round(now - t_prev, 2),
             "rss_mb": round(_rss_mb(), 1)}
        )
        t_prev = now

    stats = job.run(epoch_callback=_tick)
    print(json.dumps({
        "seeds": n_seeds, "num_cpus": num_cpus, "epochs": stats["epochs"],
        "counters": stats["counters"], "per_epoch": epochs,
    }))
    ray.shutdown()


if __name__ == "__main__":
    {"sessionize": cmd_sessionize, "endurance": cmd_endurance}[sys.argv[1]]()
