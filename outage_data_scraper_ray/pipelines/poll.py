"""Polling rounds: the reference's refresh loop on top of the crawl engine.

The reference re-scrapes every EMC on a cron cadence and appends each
snapshot to the accumulated CSVs (app/main.py + util.py:38-53); the
refresh_deadline priority key in the seed registry models the next-poll
schedule. Here one "poll round" = one full crawl of the registry with

- a round-salted canonical hash (url#r<N>), so the URL-seen set dedups
  within a round but every round re-fetches (exactly the reference's
  run-twice-append-twice behavior),
- a per-round virtual scrape timestamp (base + N * cadence), giving the
  accumulated table a real time series per EMC, and
- a per-round workdir under the job root: rounds resume independently
  (a killed round restarts at its last complete epoch).

``flagship_outage_pipeline`` wires the whole reference data path end to
end: poll rounds -> interleaved span docs -> explode -> per_outage level
table (nisc layout) -> GA1TX8 standardize -> 16-column unified table.
"""

from __future__ import annotations

import os
from dataclasses import replace
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..kernels.common import SCRAPE_TS_FORMAT
from .accumulate import explode_spans, level_table
from .crawl import CrawlConfig, CrawlJob
from .standardize import standardize_ga1tx8, synth_zip_county_map

BASE_SCRAPE_TS = datetime(2023, 10, 5, 8, 0, 0)


def round_ts(round_idx: int, cadence_min: int = 15) -> str:
    return (BASE_SCRAPE_TS + timedelta(minutes=cadence_min * round_idx)).strftime(
        SCRAPE_TS_FORMAT
    )


def run_poll_rounds(
    cfg: CrawlConfig, rounds: int, *, cadence_min: int = 15, resume: bool = False
) -> list[CrawlJob]:
    """Run N poll rounds; returns the per-round jobs (docs live in each
    round's workdir)."""
    jobs = []
    for r in range(rounds):
        rcfg = replace(
            cfg,
            workdir=os.path.join(cfg.workdir, f"round-{r:03d}"),
            scrape_ts=round_ts(r, cadence_min),
            hash_salt=f"#r{r}",
        )
        job = CrawlJob(rcfg)
        job.run(resume=resume)
        jobs.append(job)
    return jobs


def poll_docs(jobs: list[CrawlJob]) -> rd.Dataset:
    ds = jobs[0].docs_dataset()
    for j in jobs[1:]:
        ds = ds.union(j.docs_dataset())
    return ds


def flagship_outage_pipeline(
    workdir: str, *, n_seeds: int = 48, rounds: int = 4, seed: int = 42
) -> rd.Dataset:
    """The reference's full data path, Ray-Data-first, end to end."""
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(
        n_seeds=n_seeds, seed=seed, workdir=workdir, max_epochs=8,
        politeness_rate=32.0, politeness_burst=32.0, failure_rate=0.0,
    )
    jobs = run_poll_rounds(cfg, rounds)
    spans = explode_spans(poll_docs(jobs))
    acc = level_table(spans, "nisc", "per_outage")
    # per-batch distinct partials -> driver set union (the distinct_flags
    # pattern): the driver sees <= n_zip_values rows per batch, never the
    # full zip column
    zip_parts = (
        acc.select_columns(["zip"])
        .map_batches(
            lambda t: pa.table({"zip": pc.unique(t["zip"])}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    zips = sorted(set(zip_parts["zip"]))
    return standardize_ga1tx8(
        acc.drop_columns(["doc_id"]),
        utility_provider="synthgrid",
        state="ga",
        zip_county=synth_zip_county_map(zips),
    )
