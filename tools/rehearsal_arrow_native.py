"""Same-window A/B for the r5 arrow-native conversion pass (VERDICT r4 #4):
tz_convert / token_counts / quality_counts / quality_filter, new pyarrow
kernels vs the pre-r5 pandas bodies, over $GRAFT_SF_DIR (default the sf1
battery at /tmp/odsr_sf1). Prints ONE JSON line with per-stage
{new, legacy, new2} walls (ABA within one quota window).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf = os.environ.get("GRAFT_SF_DIR", "/tmp/odsr_sf1")
    from outage_data_scraper_ray.functions import relational as R
    from outage_data_scraper_ray.functions import text as T
    from outage_data_scraper_ray.io import read_parquet_clean

    # pre-r5 pandas bodies, inlined as the legacy side of the A/B
    def legacy_tz(sf_dir):
        ds = R._read(sf_dir, "events", ["event_id", "ts"])

        def _conv(batch):
            east = (batch["ts"].dt.tz_localize("UTC")
                    .dt.tz_convert("US/Eastern").dt.tz_localize(None))
            return pd.DataFrame({"event_id": batch["event_id"], "ts_east": east})

        return ds.map_batches(_conv, batch_format="pandas")

    def legacy_tokens(sf_dir):
        docs = R._read(sf_dir, "documents", ["doc_id", "text"])
        tok = re.compile(r"\S+")

        def _count(batch):
            return pd.DataFrame({
                "doc_id": batch["doc_id"],
                "token_count": batch["text"].fillna("").str.findall(tok)
                .str.len().astype("int64"),
            })

        return docs.map_batches(_count, batch_format="pandas")

    def legacy_quality(sf_dir):
        docs = R._read(sf_dir, "documents", ["doc_id", "text"])
        stop_re = re.compile(r"\b(?:the|and|of|to|in|is|it|that|for)\b")
        punct_re = re.compile(r"[.,!?;:]")

        def _q(batch):
            text = batch["text"].fillna("")
            return pd.DataFrame({
                "doc_id": batch["doc_id"],
                "char_count": text.str.len().astype("int64"),
                "punct_count": text.str.count(punct_re).astype("int64"),
                "stop_en_count": text.str.lower().str.count(stop_re).astype("int64"),
            })

        return docs.map_batches(_q, batch_format="pandas")

    def legacy_qfilter(sf_dir):
        def _keep(batch):
            return batch[
                (batch["char_count"] >= 150)
                & (batch["stop_en_count"] >= 1)
                & (batch["punct_count"] * 20 <= batch["char_count"])
            ]

        return legacy_quality(sf_dir).map_batches(_keep, batch_format="pandas")

    stages = {
        "tz_convert": (lambda: R.tz_convert(sf), lambda: legacy_tz(sf)),
        "token_counts": (
            lambda: T.token_counts(
                read_parquet_clean(os.path.join(sf, "documents.parquet"),
                                   columns=["doc_id", "text"])),
            lambda: legacy_tokens(sf),
        ),
        "quality_counts": (lambda: R.quality_counts(sf), lambda: legacy_quality(sf)),
        "quality_filter": (lambda: R.quality_filter(sf), lambda: legacy_qfilter(sf)),
    }

    res = {"sf_dir": sf, "num_cpus": num_cpus, "stages": {}}
    for name, (new, legacy) in stages.items():
        walls, counts = {}, set()
        for tag, mk in (("new", new), ("legacy", legacy), ("new2", new)):
            t0 = time.perf_counter()
            counts.add(mk().count())
            walls[tag] = round(time.perf_counter() - t0, 2)
        assert len(counts) == 1, (name, counts)
        res["stages"][name] = {**walls, "rows": counts.pop()}
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
