"""Readers (S14, incl. utf-16 POUS), failure table (K3), event sink (K4)."""

import os
import shutil

import pandas as pd
import ray.data as rd

from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob
from outage_data_scraper_ray.pipelines.sessionize import sessionize, write_events
from outage_data_scraper_ray.sources import (
    failures_table,
    read_accumulated_csv,
    read_pous_csv,
)
from outage_data_scraper_ray.synth import synth_pous


def test_read_pous_utf16(ray_session, tmp_path):
    df = synth_pous(3, 10, 1)
    p = str(tmp_path / "pous.csv")
    df.to_csv(p, index=False, encoding="utf-16")
    back = read_pous_csv(p).to_pandas()
    assert len(back) == len(df)
    assert set(back.columns) == set(df.columns)


def test_read_accumulated_csv(ray_session, tmp_path):
    df = pd.DataFrame({"a": [1, 2], "timestamp": ["x", "y"], "EMC": ["e", "e"]})
    p = str(tmp_path / "per_outage_e.csv")
    df.to_csv(p, index=False)
    assert read_accumulated_csv(p).count() == 2


def test_failures_table(ray_session):
    workdir = "/tmp/odsr_test_fail"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(
        CrawlConfig(n_seeds=80, workdir=workdir, max_epochs=8,
                    politeness_rate=16.0, politeness_burst=16.0, failure_rate=0.2)
    )
    stats = job.run()
    ft = failures_table(job.docs_dataset()).to_pandas()
    assert len(ft) == stats["counters"]["fetch_failed"] > 0
    assert list(ft.columns) == ["state", "layout", "emc", "reason", "timestamp"]
    assert (ft["reason"] != "").all()


def test_write_events_param_keyed(ray_session, tmp_path):
    ev = sessionize(rd.from_pandas(synth_pous(4, 30, 2)), method="threshold",
                    threshold=0.1)
    path = write_events(ev, str(tmp_path), method="threshold", threshold=0.1)
    assert "threshold/t0.1_a0.0" in path
    back = rd.read_parquet(path).to_pandas()
    assert len(back) > 0 and "duration_sec" in back.columns
