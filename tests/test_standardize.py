"""Standardize pipeline (GA1TX8, app/pipeline/pipeline.py:53-125):
distributed groupby/map_groups result must equal the sequential pandas
oracle that mirrors the reference's groupby().apply + merge."""

import pandas as pd
import ray.data as rd

from outage_data_scraper_ray.pipelines.standardize import (
    standardize_ga1tx8,
    standardize_oracle,
    synth_accumulated,
    synth_zip_county_map,
)
from outage_data_scraper_ray.schemas import STANDARDIZED_COLUMNS


def test_standardize_matches_oracle(ray_session):
    acc = synth_accumulated(n_outages=30, snapshots=6, seed=7)
    zmap = synth_zip_county_map(sorted(acc["zip"].unique()))
    got = (
        standardize_ga1tx8(
            rd.from_pandas(acc), utility_provider="Washington EMC",
            state="ga", zip_county=zmap,
        )
        .to_pandas()
        .sort_values(["outage_id"])
        .reset_index(drop=True)
    )
    want = (
        standardize_oracle(
            acc, utility_provider="Washington EMC", state="ga", zip_county=zmap
        )
        .sort_values(["outage_id"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == STANDARDIZED_COLUMNS
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_metrics_by_hand(ray_session):
    """One outage, two snapshots 15 min apart, hand-computed metrics."""
    acc = pd.DataFrame(
        [
            {
                "outageRecID": "O1",
                "outageStartTime": "2023-10-01 06:00:00",
                "customersOutNow": 100,
                "zip": "30001",
                "outagePoint": "{'lat': 32.5, 'lng': -83.1}",
                "timestamp": "2023-10-01 06:15:00",
                "EMC": "X",
            },
            {
                "outageRecID": "O1",
                "outageStartTime": "2023-10-01 06:00:00",
                "customersOutNow": 60,
                "zip": "30001",
                "outagePoint": "{'lat': 32.5, 'lng': -83.1}",
                "timestamp": "2023-10-01 06:30:00",
                "EMC": "X",
            },
        ]
    )
    out = standardize_ga1tx8(
        rd.from_pandas(acc), utility_provider="X", state="ga",
        zip_county={"30001": "BALDWIN"},
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # duration: end 06:30 - start 06:00 = 30 min
    assert r["duration"] == 30.0
    assert r["duration_max"] == 45.0
    assert r["duration_mean"] == 37.5
    assert r["customer_affected_mean"] == 80.0
    # tcot = 15*(160-100) + 15*100 = 900 + 1500 = 2400
    assert r["total_customer_outage_time"] == 2400.0
    # tcot_max = 2400 + 15*60 = 3300
    assert r["total_customer_outage_time_max"] == 3300.0
    assert r["total_customer_outage_time_mean"] == 2850.0
    assert r["county"] == "BALDWIN"
    assert r["zipcode"] == "30001"
