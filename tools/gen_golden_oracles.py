"""Generate golden VALUES oracles from the EXECUTED reference implementation.

The gate inputs for sessionize_threshold / standardize_16col are seeded
synthetic frames, so their expected outputs are fixed tables. This script:

1. executes the REAL reference code on those inputs —
   scripts/bluefire/step1_threshold.py merger() and
   app/pipeline/pipeline.py GA1TX8.standardize() from /root/reference —
2. canonicalizes exactly like the __ray_entry__ query wrappers
   (outage_data_scraper_ray.golden.canon_*),
3. verifies our Ray pipeline reproduces the reference output bit-exactly
   under that canonicalization (fails loudly otherwise),
4. writes the reference output as typed VALUES SQL into
   outage_data_scraper_ray/golden/<name>.sql for oracle_sql() to serve.

Run from /root/repo with the reference checkout present:
    python tools/gen_golden_oracles.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from outage_data_scraper_ray.golden import (  # noqa: E402
    EVENT_CANON_COLS,
    canon_events,
    canon_standardized,
    values_sql,
)

REF = "/root/reference"
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "outage_data_scraper_ray", "golden"
)


def _load_reference_fn(filename: str, fn_name: str):
    """Execute only the definition prefix of a reference bluefire CLI script
    (cut before the module-level argparse) and return the named function."""
    src = open(os.path.join(REF, "scripts", "bluefire", filename)).read()
    cut = src.index("parser = argparse.ArgumentParser()")
    ns: dict = {}
    exec(compile(src[:cut], filename, "exec"), ns)
    return ns[fn_name]


def reference_threshold_events() -> pd.DataFrame:
    """Reference merger() over the gate input: synth_pous(10, 40, 42),
    idxmin dedup, per-group time sort, zero-run split — the same
    segmentation sessionize() applies — threshold=0.1, abs_diff=0.0."""
    from outage_data_scraper_ray.synth import synth_pous

    merger = _load_reference_fn("step1_threshold.py", "merger")
    df = synth_pous(10, 40, 42)
    keys = ["UtilityName", "StateName", "CountyName", "CityName"]
    idx = df.groupby(keys + ["RecordDateTime"])["CustomersOut"].idxmin()
    df = df.loc[idx].sort_values(keys + ["RecordDateTime"])
    events: list[dict] = []
    for _, g in df.groupby(keys):
        zero_before = g["CustomersOut"].shift(1).fillna(1).eq(0)
        for _, run in g.groupby(zero_before.cumsum()):
            rows = run.copy()
            rows["RecordDateTime"] = rows["RecordDateTime"].astype(str)
            events.extend(
                e for e in merger(rows.to_dict("records"), 0.1, 0.0) if e
            )
    out = pd.DataFrame(events)
    out["start_time"] = pd.to_datetime(out["start_time"])
    out["end_time"] = pd.to_datetime(out["end_time"])
    out["duration"] = pd.to_timedelta(out["duration"])
    out = out[out["duration"] > pd.Timedelta(0)]
    cols = [c for c in EVENT_CANON_COLS if c != "duration_sec"] + ["duration"]
    return out[cols].reset_index(drop=True)


def reference_standardized() -> pd.DataFrame:
    """Reference GA1TX8.standardize() over the gate input:
    synth_accumulated(40, 5, 42) with provider name 'Washington EMC'."""
    from outage_data_scraper_ray.pipelines.standardize import (
        synth_accumulated,
        synth_zip_county_map,
    )

    acc = synth_accumulated(40, 5, 42)
    zmap = synth_zip_county_map(sorted(acc["zip"].unique()))

    ref_dir = os.path.join(REF, "app", "pipeline")
    sys.path.insert(0, ref_dir)
    try:
        import pipeline as ref_pipeline
    finally:
        sys.path.remove(ref_dir)

    with tempfile.TemporaryDirectory() as tmp:
        base = os.path.join(tmp, "acc")
        d = os.path.join(base, "ga", "layout_1")
        os.makedirs(d)
        acc.to_csv(os.path.join(d, "per_outage_Washington EMC.csv"), index=False)
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            with open("ga_mapping.json", "w") as f:
                json.dump(zmap, f)
            cfg = {"state": "ga", "layout": 1, "type": "o",
                   "name": "Washington EMC"}
            out = ref_pipeline.GA1TX8(cfg, base).standardize()
        finally:
            os.chdir(cwd)
    return out


def _compare(name: str, ours: pd.DataFrame, ref: pd.DataFrame) -> None:
    key = sorted(ours.columns)
    a = ours[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    b = ref[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in key:
        g, w = a[c], b[c]
        if pd.api.types.is_datetime64_any_dtype(g):
            ok = (g.astype("datetime64[us]") == w.astype("datetime64[us]")).all()
        elif pd.api.types.is_float_dtype(g):
            ok = np.array_equal(g.to_numpy(), w.to_numpy())  # bit-exact
        else:
            ok = (g.astype(str) == w.astype(str)).all()
        assert ok, f"{name}: column {c} diverges between ours and reference"
    print(f"{name}: ours == reference on all {len(a)} rows (bit-exact)")


# ---------------------------------------------------------------------------
# Determinism pins: the crawl/flagship/media gate queries take NO input from
# sf_dir (fixed seeded configs), and their outputs are deterministic across
# fresh Ray sessions and parallelism levels. Pin each output as a golden
# VALUES oracle AFTER proving that: run the full set in two subprocesses at
# different num_cpus and require bit-exact equality before writing.

PIN_QUERIES = [
    "crawl_docs", "crawl_level_table", "flagship_outage_e2e",
    "media_decode", "media_features", "media_resize", "media_frames",
    "media_phash_dedup",
]

# These two DO read sf_dir, so their pins are generated at the driver gate's
# scale (sf0.01) and are only valid for that input — the pin header records
# this. They are the two queries COVERAGE.md carried as rows-only: simhash
# signatures are pandas SipHash (deterministic, fixed key, but not
# SQL-recomputable) and ivf_knn is approximate by design (recall < 1, so no
# exact SQL reformulation exists). Both are bit-deterministic across
# parallelism now that centroid training samples by a content-keyed hash of
# vec_id rather than Dataset.random_sample (block-layout-dependent).
PIN_QUERIES_SF001 = ["simhash_dedup", "ivf_knn"]

_PIN_RUNNER = r"""
import pickle, sys
import pandas as pd
import ray

ncpu, sf_dir, names_json, out_path = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
)
import json
names = json.loads(names_json)
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

qs = E.queries()
res = {}
for name in names:
    r = qs[name](sf_dir)
    if not isinstance(r, pd.DataFrame):
        r = r.to_pandas()
    res[name] = r.reset_index(drop=True)
with open(out_path, "wb") as f:
    pickle.dump(res, f)
ray.shutdown()
"""


def _col_spec(df: pd.DataFrame) -> dict:
    """Derive the values_sql typed-cast sets from the frame's dtypes."""
    spec = {"int_cols": set(), "float_cols": set(), "ts_cols": set(),
            "bool_cols": set()}
    for c, dt in df.dtypes.items():
        if pd.api.types.is_bool_dtype(dt):
            spec["bool_cols"].add(c)
        elif pd.api.types.is_integer_dtype(dt):
            spec["int_cols"].add(c)
        elif pd.api.types.is_float_dtype(dt):
            spec["float_cols"].add(c)
        elif pd.api.types.is_datetime64_any_dtype(dt):
            spec["ts_cols"].add(c)
    return spec


def generate_determinism_pins(
    queries: list[str] = PIN_QUERIES, sf_dir: str = "/root/testdata/sf0.001",
    header_note: str = "",
) -> None:
    import subprocess

    with tempfile.TemporaryDirectory() as tmp:
        outs = []
        for ncpu in (4, 16):
            path = os.path.join(tmp, f"pin_{ncpu}.pkl")
            script = os.path.join(tmp, f"run_{ncpu}.py")
            with open(script, "w") as f:
                f.write(_PIN_RUNNER)
            subprocess.run(
                [sys.executable, script, str(ncpu), sf_dir,
                 json.dumps(queries), path],
                check=True, cwd="/root/repo",
            )
            import pickle

            with open(path, "rb") as f:
                outs.append(pickle.load(f))
    for name in queries:
        a, b = outs[0][name], outs[1][name]
        _compare(f"{name} (4 vs 16 cpus)", a, b)
        spec = _col_spec(a)
        key = sorted(a.columns)
        canon = a[key].sort_values(key, kind="mergesort").reset_index(drop=True)
        sql = values_sql(canon, **spec)
        with open(os.path.join(OUT_DIR, f"{name}.sql"), "w") as f:
            f.write(
                "-- GENERATED by tools/gen_golden_oracles.py "
                "(generate_determinism_pins):\n"
                f"-- the fixed seeded gate config's output for {name}, "
                "proven bit-exact\n"
                "-- across fresh Ray sessions at num_cpus=4 and 16 before "
                "pinning.\n" + header_note + sql + "\n"
            )
        print(f"{name}: pinned {len(canon)} rows")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as E

    qs = E.queries()

    # ---- sessionize_threshold -------------------------------------------
    ref_ev = canon_events(reference_threshold_events())
    ours_ev = qs["sessionize_threshold"]("/root/testdata/sf0.001")
    _compare("sessionize_threshold", ours_ev, ref_ev)
    sql = values_sql(
        ref_ev,
        int_cols={"CustomersTracked", "duration_sec"},
        float_cols={"customer_affected_mean"},
        ts_cols={"start_time", "end_time"},
    )
    with open(os.path.join(OUT_DIR, "sessionize_threshold.sql"), "w") as f:
        f.write(
            "-- GENERATED by tools/gen_golden_oracles.py: reference merger()\n"
            "-- (scripts/bluefire/step1_threshold.py) output on the seeded\n"
            "-- gate input synth_pous(10, 40, 42), t=0.1, abs_diff=0.\n"
            + sql + "\n"
        )

    # ---- standardize_16col ----------------------------------------------
    ref_st = canon_standardized(reference_standardized())
    ours_st = qs["standardize_16col"]("/root/testdata/sf0.001")
    _compare("standardize_16col", ours_st, ref_st)
    floats = {c for c, d in ref_st.dtypes.items() if d == "float64"}
    sql = values_sql(
        ref_st, int_cols=set(), float_cols=floats,
        ts_cols={"start_time", "end_time"},
    )
    with open(os.path.join(OUT_DIR, "standardize_16col.sql"), "w") as f:
        f.write(
            "-- GENERATED by tools/gen_golden_oracles.py: reference\n"
            "-- GA1TX8.standardize() (app/pipeline/pipeline.py) output on the\n"
            "-- seeded gate input synth_accumulated(40, 5, 42).\n"
            + sql + "\n"
        )

    ray.shutdown()
    generate_determinism_pins()
    generate_determinism_pins(
        queries=PIN_QUERIES_SF001,
        sf_dir="/root/testdata/sf0.01",
        header_note=(
            "-- INPUT-SPECIFIC pin: this query reads sf_dir; the pin records\n"
            "-- its output for the driver gate's input (sf0.01) only.\n"
        ),
    )
    print("golden oracles written to", os.path.abspath(OUT_DIR))


if __name__ == "__main__":
    main()
