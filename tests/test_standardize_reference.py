"""TRUE reference-equality test for the standardize pipeline.

app/pipeline/pipeline.py is pure pandas and imports cleanly, so the REAL
GA1TX8.standardize() runs in-process on a synthetic accumulated CSV and our
Ray pipeline must reproduce its 16-column output exactly.

Skipped automatically if the reference checkout is absent.
"""

import json
import os
import sys

import pandas as pd
import pytest
import ray.data as rd

from outage_data_scraper_ray.pipelines.standardize import (
    standardize_ga1tx8,
    synth_accumulated,
    synth_zip_county_map,
)
from outage_data_scraper_ray.schemas import STANDARDIZED_COLUMNS

REF = "/root/reference/app/pipeline"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not available"
)


def _run_reference(acc: pd.DataFrame, zmap: dict, tmp_path) -> pd.DataFrame:
    sys.path.insert(0, REF)
    try:
        import pipeline as ref_pipeline
    finally:
        sys.path.remove(REF)

    # lay out the file tree load_data() expects (pipeline.py:32-47): the
    # accumulated CSV at <base>/<state>/layout_<l>/per_outage_<name>.csv and
    # <state>_mapping.json in the CWD
    base = tmp_path / "acc"
    d = base / "ga" / "layout_1"
    d.mkdir(parents=True)
    acc.to_csv(d / "per_outage_washington.csv", index=False)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with open("ga_mapping.json", "w") as f:
            json.dump(zmap, f)
        cfg = {"state": "ga", "layout": 1, "type": "o", "name": "washington"}
        ref = ref_pipeline.GA1TX8(cfg, str(base))
        out = ref.standardize()
    finally:
        os.chdir(cwd)
    return out


def test_standardize_matches_reference(ray_session, tmp_path):
    acc = synth_accumulated(n_outages=35, snapshots=6, seed=17)
    zmap = synth_zip_county_map(sorted(acc["zip"].unique()))

    want = _run_reference(acc, zmap, tmp_path)
    # reference sets utility_provider from config name
    got = (
        standardize_ga1tx8(
            rd.from_pandas(acc), utility_provider="washington", state="ga",
            zip_county=zmap,
        )
        .to_pandas()
    )

    assert list(got.columns) == list(want.columns) == STANDARDIZED_COLUMNS
    key = ["outage_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    # reference reads from CSV, so tz-aware timestamps come back as strings
    # of the same instants; normalize both sides to naive eastern wall time
    for c in ("start_time", "end_time"):
        got[c] = pd.to_datetime(got[c]).dt.tz_localize(None)
        want[c] = pd.to_datetime(want[c]).map(lambda x: x.tz_localize(None) if x.tzinfo else x)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
