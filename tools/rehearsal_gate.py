"""Driver-gate dress rehearsal: run every queries() entry AND its
oracle_sql() SQL side-by-side at sf0.01 and compare rows / schema /
values the way the driver does (columns sorted by name, floats rounded
to 6dp, rows sorted, then hashed).

    python tools/rehearsal_gate.py               # all queries
    python tools/rehearsal_gate.py knn_topk ...  # subset

Prints one line per query plus a JSON summary line. Exits nonzero on any
mismatch so it can gate a commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("GRAFT_GATE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df):
    """Driver-style canonicalisation: sort columns by name, round floats
    to 6dp, sort rows, stringify."""
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = np.round(df[c].astype("float64"), 6)
            df[c] = df[c] + 0.0  # normalise -0.0
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    body = df.astype(str).to_csv(index=False)
    return df, hashlib.sha256(body.encode()).hexdigest()


def main() -> None:
    import duckdb
    import ray

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
        )

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    q = mod.queries()
    o = mod.oracle_sql()
    only = set(sys.argv[1:])
    t_all = time.time()
    n_pass = n_fail = 0
    failures = []
    for name, fn in q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine, h1 = _canon(_to_pandas(fn(SF_DIR)))
            sql = o.get(name)
            if sql is None:
                status = "rows-only"
                ok = True
            else:
                ref, h2 = _canon(con.execute(sql).fetchdf())
                rows = len(mine) == len(ref)
                schema = list(mine.columns) == list(ref.columns)
                ok = rows and schema and h1 == h2
                status = "green" if ok else (
                    f"ROWS {len(mine)}!={len(ref)}" if not rows
                    else ("SCHEMA " + str((list(mine.columns), list(ref.columns))) if not schema else "HASH")
                )
        except Exception as e:  # noqa: BLE001
            ok = False
            status = f"ERR {type(e).__name__}: {e}"
        dt = time.time() - t0
        n_pass += ok
        n_fail += not ok
        if not ok:
            failures.append(name)
        print(f"{name:32s} {status:12s} {dt:6.2f}s", flush=True)
    print(
        json.dumps(
            {
                "gate_pass": n_pass,
                "gate_fail": n_fail,
                "failures": failures,
                "total_s": round(time.time() - t_all, 1),
                "sf_dir": SF_DIR,
            }
        )
    )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
