"""Bluefire sessionization: county-level CustomersOut series -> discrete
outage events.

Reference: scripts/bluefire/step1_threshold.py (delta-threshold segmentation
with an open-outage tracking list, cases A-D) and step1_ganz.py
(level-crossing windows), fed by the idxmin dedup (A4,
step1_threshold.py:385-388) and consumed by step2_property.py global
aggregates (A5).

Ray-Data-first shape (SURVEY.md section 3.3): the group key is
(UtilityName, StateName, CountyName, CityName). ONE hash shuffle
co-locates each key's complete row set, then a single per-BLOCK callable
sorts the block by (keys, RecordDateTime) — the reference assumes stored
file order, step1_threshold.py:400 — splits it into runs at group changes
and zero rows (is_new, step1_threshold.py:13-25), and feeds each run's
record slice to the sequential merger. The per-run session state (the
``tracking`` list) lives entirely inside the merger, bounded by run
length; Ray pays one Python dispatch per block, not per group
(VERDICT r4 #1 — rehearsal: wall flat from 6k to 240k groups at 1.2M
rows, BASELINE.md "Sessionizer dispatch amortization").
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

import ray.data as rd

GROUP_KEYS = ["UtilityName", "StateName", "CountyName", "CityName"]


# ---------------------------------------------------------------------------
# A4: exact dedup keeping the min-CustomersOut row per (keys, RecordDateTime)

def dedup_min_customers_out(ds: rd.Dataset) -> rd.Dataset:
    """Keep the row with minimal CustomersOut per (keys, RecordDateTime)
    (step1_threshold.py:385-388 idxmin). The key is near-unique (one group
    per timestamp), so a groupby().map_groups would pay a Python dispatch
    per ROW; instead one hash-shuffle co-locates each key's rows and a
    single vectorized stable-sort + drop_duplicates runs per BLOCK
    (mergesort keeps block order among equal CustomersOut, matching
    idxmin's first-minimum tie-break within the co-located group)."""
    from ..shuffle import hash_partitioned_map_batches

    keys = GROUP_KEYS + ["RecordDateTime"]

    def _keep_min_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("CustomersOut", kind="mergesort").drop_duplicates(
            subset=keys, keep="first"
        )

    return hash_partitioned_map_batches(ds, keys, _keep_min_block)


# ---------------------------------------------------------------------------
# sub-series split: consecutive runs ending after a zero (is_new semantics)

def _split_runs(g: pd.DataFrame) -> list[pd.DataFrame]:
    """Split one key-group (already time-sorted) into the sub-series the
    reference's row loop produces: a new run starts after any row with
    CustomersOut == 0 (step1_threshold.py:23-24) — the zero row itself
    closes the previous run."""
    zero_before = g["CustomersOut"].shift(1).fillna(1).eq(0)
    run_id = zero_before.cumsum()
    return [sub for _, sub in g.groupby(run_id)]


# ---------------------------------------------------------------------------
# threshold merger: delta segmentation with open-outage tracking

def merge_threshold_sessions(
    rows: list[dict[str, Any]], threshold: float, abs_diff: float
) -> list[dict[str, Any]]:
    """Session segmentation over one ordered sub-series.

    Semantics re-derived from step1_threshold.py:37-331: a list of open
    outages ("tracking") absorbs small deltas (cases A/C), opens a new
    outage on a big increase (case B), and on a big decrease closes the
    open outage whose size is closest to the drop (case D) — splitting or
    closing several when no single one matches. customer_affected_mean is
    the time-weighted average of each outage's share of CustomersOut.
    """
    if not rows:
        return []
    head = rows[0]
    base = {
        "UtilityName": head["UtilityName"],
        "StateName": head["StateName"],
        "CountyName": head["CountyName"],
        "CityName": head["CityName"],
        "CountyFIPS": head["CountyFIPS"],
        "CustomersTracked": head["CustomersTracked"],
    }

    results: list[dict[str, Any]] = []
    tracking: list[dict[str, Any]] = []
    prev = None

    def _accrue(o: dict[str, Any], now: pd.Timestamp) -> None:
        o["_total"] += (now - o["end_time"]).total_seconds() * o["_size"]

    for row in rows:
        now = pd.to_datetime(row["RecordDateTime"])
        out = row["CustomersOut"]

        if not tracking:
            tracking.append(
                dict(base, start_time=now, end_time=now, _size=out,
                     _total=0.0, customer_affected_mean=out)
            )
            prev = row
            continue

        delta = out - prev["CustomersOut"]
        last = tracking[-1]

        if delta >= 0 and (delta < threshold * last["_size"] or abs(delta) < abs_diff):
            # case A: absorb the increase into the last open outage
            _accrue(last, now)
            last["end_time"] = now
            last["_size"] += delta
            span = (last["end_time"] - last["start_time"]).total_seconds()
            last["customer_affected_mean"] = last["_total"] / span
        elif delta >= 0:
            # case B: big increase -> open a new outage sized by the jump
            tracking.append(
                dict(base, start_time=now, end_time=now, _size=delta,
                     _total=0.0, customer_affected_mean=delta)
            )
        elif -delta < threshold * last["_size"] or abs(delta) < abs_diff:
            # case C: absorb the decrease
            _accrue(last, now)
            last["end_time"] = now
            last["_size"] += delta
            span = (last["end_time"] - last["start_time"]).total_seconds()
            last["customer_affected_mean"] = last["_total"] / span
        else:
            # case D: big decrease -> close the open outage(s) matching the drop
            drop = -delta
            last_end = last["end_time"]
            sizes = [o["_size"] for o in tracking]
            closest = min(range(len(tracking)), key=lambda i: abs(drop - sizes[i]))
            to_close: list[int] = []

            if abs(drop - sizes[closest]) >= max(10, 0.1 * drop):
                if drop <= sizes[closest]:
                    # split the closest outage in two: one part closes now
                    victim = tracking[closest]
                    span = (victim["end_time"] - victim["start_time"]).total_seconds()
                    rest = dict(victim)
                    rest["_size"] = victim["customer_affected_mean"] - drop
                    rest["customer_affected_mean"] = rest["_size"]
                    rest["_total"] = rest["_size"] * span
                    tracking.append(rest)
                    victim["_size"] = drop
                    victim["customer_affected_mean"] = drop
                    victim["_total"] = drop * span
                    to_close.append(closest)
                else:
                    # close a set of smaller outages summing up to the drop
                    tracking.sort(key=lambda o: o["_size"], reverse=True)
                    start_i = next(
                        (i for i, o in enumerate(tracking) if o["_size"] < drop),
                        None,
                    )
                    if start_i is not None:
                        acc = 0.0
                        for i in range(start_i, len(tracking)):
                            acc += tracking[i]["_size"]
                            if acc >= drop:
                                acc -= tracking[i]["_size"]
                                continue
                            to_close.append(i)
            else:
                to_close.append(closest)

            for i in to_close:
                o = tracking[i]
                o["_total"] += (now - last_end).total_seconds() * o["_size"]
                o["end_time"] = now
                span = (o["end_time"] - o["start_time"]).total_seconds()
                o["duration"] = o["end_time"] - o["start_time"]
                o["customer_affected_mean"] = o["_total"] / span if span else o["_size"]
                results.append(
                    {k: v for k, v in o.items() if not k.startswith("_")}
                )
            tracking = [o for i, o in enumerate(tracking) if i not in to_close]
            tracking.sort(key=lambda o: o["start_time"])

        prev = row

    # close whatever is still open at the end of the series
    final = pd.to_datetime(prev["RecordDateTime"])
    for o in tracking:
        o["_total"] += (final - o["end_time"]).total_seconds() * o["_size"]
        o["end_time"] = final
        o["duration"] = o["end_time"] - o["start_time"]
        span = (o["end_time"] - o["start_time"]).total_seconds()
        if span == 0:
            continue
        o["customer_affected_mean"] = o["_total"] / span
        results.append({k: v for k, v in o.items() if not k.startswith("_")})

    return results


# ---------------------------------------------------------------------------
# ganz merger: level-crossing windows

def merge_ganz_sessions(
    rows: list[dict[str, Any]], threshold: float
) -> list[dict[str, Any]]:
    """Level-crossing sessionization (step1_ganz.py:28-90): an event spans
    from the first row with CustomersOut >= t*CustomersTracked to the first
    row back under the level; customer_affected_mean is the time-weighted
    mean of CustomersOut across the window."""
    results = []
    start_i = None
    windows = []
    for i, row in enumerate(rows):
        over = row["CustomersOut"] >= threshold * row["CustomersTracked"]
        if start_i is None and over:
            start_i = i
        elif start_i is not None and not over:
            windows.append((start_i, i))
            start_i = None
    for s, e in windows:
        win = rows[s : e + 1]
        times = [pd.to_datetime(r["RecordDateTime"]) for r in win]
        start, end = min(times), max(times)
        dur = (end - start).total_seconds()
        if dur == 0:
            continue
        weighted = sum(
            (times[i + 1] - times[i]).total_seconds() * win[i]["CustomersOut"]
            for i in range(len(win) - 1)
        )
        results.append(
            {
                "UtilityName": win[0]["UtilityName"],
                "StateName": win[0]["StateName"],
                "CountyName": win[0]["CountyName"],
                "CityName": win[0]["CityName"],
                "CountyFIPS": win[0]["CountyFIPS"],
                "CustomersTracked": win[0]["CustomersTracked"],
                "start_time": start,
                "end_time": end,
                "duration": end - start,
                "customer_affected_mean": weighted / dur,
            }
        )
    return results


# ---------------------------------------------------------------------------
# Dataset-level wrappers

_EVENT_COLS = [
    "UtilityName", "StateName", "CountyName", "CityName", "CountyFIPS",
    "CustomersTracked", "start_time", "end_time", "duration",
    "customer_affected_mean",
]


def _empty_events() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series(
                dtype="datetime64[ns]" if c in ("start_time", "end_time")
                else "timedelta64[ns]" if c == "duration"
                else "int64" if c == "CustomersTracked"
                else "object" if c != "customer_affected_mean" else "float64"
            )
            for c in _EVENT_COLS
        }
    )


def sessionize(
    ds: rd.Dataset,
    *,
    method: str = "threshold",
    threshold: float = 0.1,
    abs_diff: float = 0.0,
    dedup: bool = True,
) -> rd.Dataset:
    """Full bluefire step1: optional idxmin dedup, then per-group
    sessionization; events with duration == 0 are dropped
    (step1_threshold.py:420).

    The dedup is FUSED into the per-group pass: its key
    (GROUP_KEYS + RecordDateTime) refines the sessionizer's GROUP_KEYS, so
    once a group is co-located the per-timestamp keep-min is local — one
    hash shuffle total instead of two.

    Dispatch shape (VERDICT r4 #1): the merge itself is inherently
    sequential per (utility,state,county,city) group — a 300-LoC tracking-
    list case analysis, step1_threshold.py:37-331 — but Ray must not pay a
    Python dispatch per GROUP (the degenerate map_groups shape at
    geography x utility cardinality). One hash shuffle co-locates complete
    groups per block; a single per-BLOCK callable then loops groups via
    pandas' C-indexed groupby iterator, exactly the battery trio's doctrine
    (relational.py window/minidx/metrics kernels)."""

    def _block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_events()
        if dedup:
            # step1_threshold.py:385-388 idxmin, block-wide: the dedup key
            # includes the group identity, so one stable sort +
            # drop_duplicates covers every co-located group at once
            # (mergesort keeps first-minimum tie-break)
            df = df.sort_values("CustomersOut", kind="mergesort").drop_duplicates(
                subset=GROUP_KEYS + ["RecordDateTime"], keep="first"
            )
        # ONE block-wide sort makes groups contiguous and time-ordered
        # within each group (stable, so equal-time rows keep input order —
        # identical to the former per-group RecordDateTime sort)
        df = df.sort_values(
            GROUP_KEYS + ["RecordDateTime"], kind="mergesort"
        ).reset_index(drop=True)
        # run boundaries, vectorized across the whole block: a new run
        # starts at a group change or after a zero row (is_new semantics,
        # step1_threshold.py:13-25 — same rule _split_runs applies per group)
        gk = df[GROUP_KEYS]
        new_group = gk.ne(gk.shift(1)).any(axis=1).to_numpy()
        prev_zero = df["CustomersOut"].shift(1).fillna(1).eq(0).to_numpy()
        bounds = np.flatnonzero(new_group | prev_zero).tolist() + [len(df)]
        # ONE to_dict for the block; the per-run merge itself is
        # row-sequential by semantics (open-outage tracking list) and gets
        # plain list slices — no per-group pandas object construction
        rows = df.to_dict("records")
        events: list[dict[str, Any]] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            run = rows[s:e]
            if method == "threshold":
                events.extend(merge_threshold_sessions(run, threshold, abs_diff))
            else:
                events.extend(merge_ganz_sessions(run, threshold))
        if not events:
            return _empty_events()
        out = pd.DataFrame(events)[_EVENT_COLS]
        return out[out["duration"] > pd.Timedelta(seconds=0)]

    from ..shuffle import hash_partitioned_map_batches

    return hash_partitioned_map_batches(ds, GROUP_KEYS, _block)


def split_pous(
    ds: rd.Dataset, *, utility_substring: str, start: str, end: str
) -> rd.Dataset:
    """step0_split_file.py:10-23 as a streaming filter: keep rows whose
    UtilityName contains the substring and whose RecordDateTime falls in
    [start, end] (both inclusive, as the reference's chained comparisons)."""
    s, e = pd.Timestamp(start), pd.Timestamp(end)

    def _f(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["RecordDateTime"])
        return batch[
            batch["UtilityName"].str.contains(utility_substring)
            & (ts >= s)
            & (ts <= e)
        ]

    return ds.map_batches(_f, batch_format="pandas")


def month_properties(events: rd.Dataset, year: int, month: int) -> dict[str, float]:
    """step2_grower_property.py:68-106: the per-month window variant of the
    global property block — [first-of-month, first-of-next-month] inclusive
    on start_time, then the same scalar aggregate."""
    start = pd.Timestamp(year=year, month=month, day=1)
    end = (
        pd.Timestamp(year=year + 1, month=1, day=1)
        if month == 12
        else pd.Timestamp(year=year, month=month + 1, day=1)
    )

    def _window(batch: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(batch["start_time"])
        return batch[(ts >= start) & (ts <= end)]

    return event_properties(events.map_batches(_window, batch_format="pandas"))


def event_properties(events: rd.Dataset) -> dict[str, float]:
    """step2_property.py:62-94 global scalars: one partial totals row per
    batch -> trivial driver sum (the global_props pattern — the event rows
    themselves never reach the driver)."""

    def _partial(b: pd.DataFrame) -> pd.DataFrame:
        dur_s = pd.to_timedelta(b["duration"]).dt.total_seconds()
        cam = pd.to_numeric(b["customer_affected_mean"])
        return pd.DataFrame(
            {
                "n": [len(b)],
                "dur_s": [float(dur_s.sum())],
                "cam": [float(cam.sum())],
                "cam_dur": [float((cam * dur_s).sum())],
            }
        )

    parts = events.map_batches(_partial, batch_format="pandas").to_pandas()
    freq = int(parts["n"].sum())
    if freq == 0:
        return {"frequency": 0}
    cam_dur = float(parts["cam_dur"].sum())
    return {
        "frequency": freq,
        "avg_duration_sec": float(parts["dur_s"].sum() / freq),
        "avg_customer_affected_mean": float(parts["cam"].sum() / freq),
        "total_customer_affected_mean_duration": float(cam_dur / (freq * 60)),
        "total_customer_affected_x_duration": float(cam_dur / 60),
    }


def write_events(
    events: rd.Dataset, out_dir: str, *, method: str, threshold: float,
    abs_diff: float = 0.0,
) -> str:
    """K4: parameter-keyed event sink (the reference writes one csv per
    (file, threshold, abs_diff) sweep point, step1_threshold.py:424-434);
    here one parquet directory per parameter combination."""
    import os

    name = (
        f"t{threshold}_a{abs_diff}" if method == "threshold" else f"t{threshold}"
    )
    path = os.path.join(out_dir, method, name)

    def _to_cols(g):
        g = g.copy()
        g["duration_sec"] = g["duration"].dt.total_seconds()
        return g.drop(columns=["duration"])

    events.map_batches(_to_cols, batch_format="pandas").write_parquet(path)
    return path
