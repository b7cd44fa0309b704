"""Standardize pipeline: per-provider accumulated scrape series -> the
16-column unified outage schema.

Reference: BasePipeline.standardize + GA1TX8.transform
(app/pipeline/pipeline.py:53-125). Re-expressed Ray-Data-first:

- the vectorized transform (tz convert, stringified-JSON point extraction,
  renames — M7/M9/M10) is one pandas ``map_batches``;
- the order-sensitive per-outage metric block (A1, pipeline.py:79-98) plus
  the detail re-join (J2, pipeline.py:57-58) run inside ONE
  ``groupby("outage_id").map_groups``: the group function computes the
  metrics and emits the already-joined detail rows whose timestamp equals
  the outage's end_time — the inner merge on [outage_id, timestamp] without
  a second shuffle;
- the zipcode->county lookup (J1, pipeline.py:62 + ga_mapping.json) is a
  broadcast dict captured in the batch closure, never a shuffle join.

Ordering note (SURVEY.md section 7.4): the reference relies on CSV append
order; we sort each group by timestamp explicitly so distributed execution
matches.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

import ray.data as rd

from ..schemas import STANDARDIZED_COLUMNS
from ..synth import hash64


def synth_zip_county_map(zips: list[str]) -> dict[str, str]:
    """Deterministic stand-in for ga_mapping.json (zipcode->county)."""
    counties = ["BALDWIN", "WASHINGTON", "WILKINSON", "HANCOCK", "JONES", "PUTNAM"]
    return {z: counties[hash64("county:" + z) % len(counties)] for z in zips}


def synth_accumulated(n_outages: int = 40, snapshots: int = 5, seed: int = 42) -> pd.DataFrame:
    """Deterministic accumulated per_outage scrape series shaped like the
    CSV the reference's save() builds up (util.py:21-60, FIXTURES.md F4)."""
    from ..kernels.common import ZIP_SENTINEL

    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2023-10-01 06:00:00")
    for i in range(n_outages):
        rec_id = f"O{100000 + i}"
        start = base + pd.Timedelta(minutes=int(rng.integers(0, 600)))
        # ~10% sentinel zips (the reference's >=10-row geocode guard,
        # ga_scraper.py:241-249) — they also keep the CSV zip column string-
        # typed, which is what makes the reference's county map land at all
        zipc = (
            ZIP_SENTINEL
            if rng.random() < 0.1
            else str(30000 + int(rng.integers(0, 50)))
        )
        lat = round(32.0 + float(rng.random()), 6)
        lng = round(-83.5 + float(rng.random()), 6)
        n_snap = int(rng.integers(2, snapshots + 1))
        for s in range(n_snap):
            ts = start + pd.Timedelta(minutes=15 * (s + 1))
            rows.append(
                {
                    "outageRecID": rec_id,
                    "outageStartTime": start.strftime("%Y-%m-%d %H:%M:%S"),
                    "customersOutNow": int(rng.integers(1, 300)),
                    "zip": zipc,
                    "outagePoint": f"{{'lat': {lat}, 'lng': {lng}}}",
                    "timestamp": ts.strftime("%Y-%m-%d %H:%M:%S"),
                    "EMC": "Washington EMC",
                }
            )
    return pd.DataFrame(rows)


def _transform_ga1tx8(batch: pd.DataFrame) -> pd.DataFrame:
    """GA1TX8.transform (pipeline.py:105-123) minus the grouped end_time,
    which must see the whole outage and therefore lives in the group step."""
    eastern = "US/Eastern"
    batch = batch.copy()
    batch["timestamp"] = (
        pd.to_datetime(batch["timestamp"], utc=True).dt.tz_convert(eastern)
    )
    batch["outageStartTime"] = (
        pd.to_datetime(batch["outageStartTime"], utc=True).dt.tz_convert(eastern)
    )
    pts = batch["outagePoint"].map(
        lambda x: x if isinstance(x, dict) else json.loads(x.replace("'", '"'))
    )
    batch["lat"] = pts.map(lambda p: p["lat"])
    batch["lng"] = pts.map(lambda p: p["lng"])
    return batch.rename(
        columns={
            "outageRecID": "outage_id",
            "outageStartTime": "start_time",
            "customersOutNow": "customer_affected",
            "zip": "zipcode",
        }
    )


def _metrics_and_join(group: pd.DataFrame) -> pd.DataFrame:
    """_compute_metrics (pipeline.py:79-98) + the [outage_id, timestamp]
    inner merge (pipeline.py:57-58), emitted per group. Sorted by timestamp
    to pin down the reference's implicit append order."""
    g = group.sort_values("timestamp", kind="mergesort")
    g = g.assign(end_time=g["timestamp"].max())  # A2 transform('max'), pipeline.py:112

    minutes = (g["end_time"] - g["start_time"]).dt.total_seconds() / 60
    duration = minutes.iloc[-1]
    duration_max = duration + 15
    affected = g["customer_affected"]
    first_gap_min = (g["timestamp"].iloc[0] - g["start_time"].iloc[0]).total_seconds() / 60
    tcot = 15 * (affected.sum() - affected.iloc[0]) + first_gap_min * affected.iloc[0]
    tcot_max = tcot + 15 * affected.iloc[-1]

    metrics = {
        "duration": round(duration, 2),
        "duration_max": round(duration_max, 2),
        "duration_mean": round((duration + duration_max) / 2, 2),
        "customer_affected_mean": round(float(affected.mean()), 2),
        "total_customer_outage_time": round(float(tcot), 2),
        "total_customer_outage_time_max": round(float(tcot_max), 2),
        "total_customer_outage_time_mean": round(float((tcot + tcot_max) / 2), 2),
    }
    out = g[g["timestamp"] == g["end_time"].iloc[-1]].copy()
    for k, v in metrics.items():
        out[k] = v
    return out


def standardize_ga1tx8(
    accumulated: rd.Dataset,
    *,
    utility_provider: str,
    state: str,
    zip_county: dict[str, str],
) -> rd.Dataset:
    """Full standardize: Dataset of accumulated per_outage rows in, Dataset
    with the 16 standardized columns out (pipeline.py:64-68)."""
    transformed = accumulated.map_batches(_transform_ga1tx8, batch_format="pandas")
    joined = transformed.groupby("outage_id").map_groups(
        _metrics_and_join, batch_format="pandas"
    )

    def _finalize(batch: pd.DataFrame, _map=zip_county) -> pd.DataFrame:
        batch = batch.copy()
        batch["utility_provider"] = utility_provider
        batch["state"] = state
        batch["county"] = batch["zipcode"].map(_map)
        return batch[STANDARDIZED_COLUMNS]

    return joined.map_batches(_finalize, batch_format="pandas")


def standardize_oracle(
    accumulated: pd.DataFrame,
    *,
    utility_provider: str,
    state: str,
    zip_county: dict[str, str],
) -> pd.DataFrame:
    """Sequential pandas oracle mirroring BasePipeline.standardize
    (pipeline.py:53-70) for the conformance test."""
    df = _transform_ga1tx8(accumulated)
    df["end_time"] = df.groupby("outage_id")["timestamp"].transform("max")

    def _metrics(group: pd.DataFrame) -> pd.Series:
        group = group.sort_values("timestamp", kind="mergesort")
        duration = (group["end_time"] - group["start_time"]).dt.total_seconds() / 60
        duration_max = duration + 15
        duration_mean = (duration + duration_max) / 2
        aff = group["customer_affected"]
        tcot = 15 * (aff.sum() - aff.iloc[0]) + (
            group["timestamp"].iloc[0] - group["start_time"].iloc[0]
        ).total_seconds() / 60 * aff.iloc[0]
        tcot_max = tcot + 15 * aff.iloc[-1]
        return pd.Series(
            {
                "timestamp": group["end_time"].iloc[-1],
                "duration": duration.iloc[-1],
                "duration_max": duration_max.iloc[-1],
                "duration_mean": duration_mean.iloc[-1],
                "customer_affected_mean": aff.mean(),
                "total_customer_outage_time": tcot,
                "total_customer_outage_time_max": tcot_max,
                "total_customer_outage_time_mean": (tcot + tcot_max) / 2,
            }
        )

    grouped = (
        df.groupby("outage_id").apply(_metrics, include_groups=False).reset_index().round(2)
    )
    merged = pd.merge(grouped, df, on=["outage_id", "timestamp"], how="inner")
    merged["utility_provider"] = utility_provider
    merged["state"] = state
    merged["county"] = merged["zipcode"].map(zip_county)
    return merged[STANDARDIZED_COLUMNS]
