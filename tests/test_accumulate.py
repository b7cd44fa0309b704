"""Span explode, per-level tables, partitioned sink, TableIO, robots."""

import glob
import os
import shutil

import pandas as pd
import pytest
import ray.data as rd

from outage_data_scraper_ray.io import TableIO
from outage_data_scraper_ray.pipelines.accumulate import (
    explode_spans,
    level_table,
    write_accumulated,
)
from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob
from outage_data_scraper_ray.synth import robots_allows, robots_rules


@pytest.fixture(scope="module")
def crawl_docs(ray_session):
    workdir = "/tmp/odsr_test_acc"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(
        CrawlConfig(
            n_seeds=64, workdir=workdir, max_epochs=10,
            politeness_rate=16.0, politeness_burst=16.0, failure_rate=0.0,
        )
    )
    stats = job.run()
    return job.docs_dataset(), stats


def test_explode_counts(crawl_docs):
    docs, _ = crawl_docs
    pdf = docs.to_pandas()
    want = pdf["spans"].map(len).sum()
    got = explode_spans(docs).count()
    assert got == want > 0


def test_explode_preserves_offsets(crawl_docs):
    docs, _ = crawl_docs
    rows = explode_spans(docs).to_pandas()
    for _, g in rows.groupby("doc_id"):
        assert sorted(g["offset"]) == list(range(len(g)))


def test_level_table_columns(crawl_docs):
    docs, _ = crawl_docs
    rows = explode_spans(docs)
    lt = level_table(rows, "nisc", "per_outage").to_pandas()
    assert len(lt) > 0
    for col in ("outageRecID", "zip", "timestamp", "EMC"):
        assert col in lt.columns


def test_partitioned_sink(crawl_docs, tmp_path):
    docs, _ = crawl_docs
    out = str(tmp_path / "acc")
    write_accumulated(explode_spans(docs), out, run_id="r1")
    parts = glob.glob(os.path.join(out, "state=*", "layout=*", "kind=*"))
    assert len(parts) > 3
    back = rd.read_parquet(out)
    assert back.count() == explode_spans(docs).count()


def test_tableio_idempotent_append(crawl_docs, tmp_path):
    docs, _ = crawl_docs
    rows = explode_spans(docs)
    path = str(tmp_path / "tio")
    TableIO.write(rows, path, partition_cols=["state"], run_id="r1")
    n1 = TableIO.read(path).count()
    # same run_id again: no duplicate data
    TableIO.write(rows, path, partition_cols=["state"], run_id="r1")
    assert TableIO.read(path).count() == n1
    assert TableIO.manifest(path)["runs"] == ["r1"]


def test_tableio_lance_backend(crawl_docs, tmp_path):
    """Dual-backend TableIO: the Lance branch (write -> append -> idempotent
    retry -> read) — runs only where pylance is installed (absent in this
    sandbox; `pip install pylance` has no route, verified at build time)."""
    import pytest

    from outage_data_scraper_ray.io import HAVE_LANCE

    if not HAVE_LANCE:
        pytest.skip("pylance not installed")
    docs, _ = crawl_docs
    rows = explode_spans(docs)
    path = str(tmp_path / "tio_lance")
    TableIO.write(rows, path, run_id="r1")
    n1 = TableIO.read(path).count()
    TableIO.write(rows, path, run_id="r2")  # real append
    assert TableIO.read(path).count() == 2 * n1
    TableIO.write(rows, path, run_id="r2")  # manifest-level skip
    assert TableIO.read(path).count() == 2 * n1
    # crash-window retry: wipe r2 from the manifest only -> the probe path
    # must delete r2's rows and re-append exactly once
    import json

    mp = TableIO._manifest_path(path)
    man = json.load(open(mp))
    man["runs"] = ["r1"]
    json.dump(man, open(mp, "w"))
    TableIO.write(rows, path, run_id="r2")
    assert TableIO.read(path).count() == 2 * n1


def test_robots_rules_applied(ray_session):
    """Hosts spread over rule classes; the crawl must skip disallowed URLs
    and count them."""
    workdir = "/tmp/odsr_test_robots"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(
        CrawlConfig(
            n_seeds=400, workdir=workdir, max_epochs=6,
            politeness_rate=64.0, politeness_burst=64.0, failure_rate=0.0,
        )
    )
    stats = job.run()
    assert stats["counters"].get("robots_skipped", 0) > 0
    docs = job.docs_dataset().to_pandas()
    for url in docs["url"]:
        host = url.split("://", 1)[-1].split("/", 1)[0]
        assert robots_allows(url, robots_rules(host, 42))


def test_flagship_poll_pipeline(ray_session):
    """Poll rounds -> spans -> per_outage level table -> standardize:
    the reference's full data path end to end."""
    from outage_data_scraper_ray.pipelines.poll import flagship_outage_pipeline
    from outage_data_scraper_ray.schemas import STANDARDIZED_COLUMNS

    out = flagship_outage_pipeline("/tmp/odsr_flagship", n_seeds=30, rounds=3).to_pandas()
    assert list(out.columns) == STANDARDIZED_COLUMNS
    assert len(out) > 0
    # multiple poll rounds -> durations reflect the 15-min cadence
    assert (out["duration"] >= 0).all()
    assert out["outage_id"].notna().all()
