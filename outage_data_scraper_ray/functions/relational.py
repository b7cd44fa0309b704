"""Relational operator battery over the driver testdata, with DuckDB oracles.

Each entry re-expresses one reference operator family (SURVEY.md section 2)
as an idiomatic Ray Data pipeline over /root/testdata parquet, paired with
the ANSI-SQL equivalent the driver runs in DuckDB. Column names match the
SQL exactly (the driver hash-compares after sorting columns by name).

Float determinism: monetary/quantity sums use the integer-cents trick
(CAST(ROUND(x*100) AS BIGINT) before SUM) so distributed partial sums equal
DuckDB's sequential sums bit-for-bit; averages divide those exact integers.
"""

from __future__ import annotations

import os
import re
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..shuffle import hash_partitioned_map_batches


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Pruned parquet read, footer metadata stripped (io.read_parquet_clean)."""
    from ..io import read_parquet_clean

    return read_parquet_clean(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footers only — no Dataset execution."""
    import glob

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


# Grouped-battery combine site: inputs bounded by this run the (identical)
# vectorized kernel once on the driver — a 32-partition hash shuffle pays
# ~seconds of aggregator-actor spin-up that dwarfs the work at test scale;
# above it, ONE hash shuffle + the same kernel per co-located block (the
# shuffle.py doctrine). 0 forces the distributed branch (tests).
_GROUP_DRIVER_THRESHOLD = 500_000


def _knuth_hash_u32(ids: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit Knuth multiplicative hash of int64 ids.

    Reduces mod 2^32 BEFORE the multiply — (a*c) mod 2^32 is unchanged and
    the product never wraps uint64, so the value matches the oracles'
    HUGEINT arithmetic for the full int64 id range. Shared by every
    hash-rank sampler/splitter so the engine and all SQL mirrors stay in
    lockstep."""
    u = ids.astype(np.uint64)
    return (
        (u % np.uint64(1 << 32)) * np.uint64(2654435761)
    ) % np.uint64(1 << 32)


def _gated_grouped(
    ds: rd.Dataset,
    keys: list[str],
    kernel,
    n_rows: int,
    driver_threshold: int,
) -> rd.Dataset:
    """Apply a per-block grouped kernel either on the driver (small input,
    whole frame = one block — the kernel is correct for any union of
    complete key groups, so one frame is trivially correct) or after one
    hash shuffle on the keys."""
    if n_rows <= driver_threshold:
        out = kernel(ds.to_pandas())
        t = pa.Table.from_pandas(
            out.reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None)
        return rd.from_arrow(t)
    # scale the partition count with the input so per-block size stays
    # bounded (~2M rows/block): a fixed cpus-sized count makes each block
    # grow linearly with the corpus — measured super-linear wall on
    # merge_join at sf30 (BASELINE.md sf10->sf30 step) before this
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    num_blocks = max(cpus, min(n_rows // 2_000_000 + 1, 2000))
    return hash_partitioned_map_batches(ds, keys, kernel, num_blocks=num_blocks)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: per-batch partial aggregation (combine before the
# shuffle, ray_guide "Aggregation at scale") then a tiny groupby of partials.

def q1_pricing(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )
    cutoff = pd.Timestamp("1998-09-01")

    def _partial(t: pa.Table) -> pa.Table:
        """Zero-copy arrow partial: filter + integer-e4 units + group_by,
        all pyarrow.compute kernels (a pandas version of this batch body
        costs ~2x the bare-read wall time at sf0.1 just in conversions).
        disc_price in integer e4 units: price_cents * (100 - disc_pct).
        Rounding price*(1-disc)*100 directly lands on .5-cent boundaries
        where half-even (numpy/arrow) and DuckDB ROUND (half-away)
        disagree; pure-integer arithmetic has no boundary at all. The
        float64 multiplies here are bit-identical to the previous pandas
        body, so the half-even rounding agrees term for term."""
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        rnd = dict(round_mode="half_to_even")
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0), **rnd), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0), **rnd), pa.int64())
        qty_c = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0), **rnd), pa.int64())
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_price_c": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct)),
            }
        )
        g = tb.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_price_c", "sum"),
             ("qty_c", "count")]
        )
        # select by the aggregate's NAME before renaming: the key-vs-aggregate
        # column order of TableGroupBy.aggregate has flipped across pyarrow
        # majors, so a positional rename would silently mislabel every column
        # on an upgrade
        return g.select(
            ["l_returnflag", "l_linestatus", "qty_c_sum", "price_c_sum",
             "disc_price_c_sum", "qty_c_count"]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "qty_c", "price_c",
             "disc_price_c", "n"]
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    # 6-group key: partials are O(n_blocks x 6) rows — combine on the driver
    # (integer sums commute, so order is irrelevant to exactness) instead of
    # paying a hash-shuffle aggregate for a handful of groups
    final = (
        partials.to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(
            qty_c=("qty_c", "sum"),
            price_c=("price_c", "sum"),
            disc_price_c=("disc_price_c", "sum"),
            count_order=("n", "sum"),
        )
    )
    out = pd.DataFrame(
        {
            "l_returnflag": final["l_returnflag"],
            "l_linestatus": final["l_linestatus"],
            "sum_qty": final["qty_c"] / 100.0,
            "sum_base_price": final["price_c"] / 100.0,
            "sum_disc_price": final["disc_price_c"] / 10000.0,
            "avg_qty": final["qty_c"] / 100.0 / final["count_order"],
            "avg_price": final["price_c"] / 100.0 / final["count_order"],
            "count_order": final["count_order"].astype("int64"),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty,
       SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# M3: nonzero filter (the reference's ubiquitous affected != 0 family)

def nonzero_filter(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events")
    return ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["value"], 0.0)), batch_format="pyarrow"
    )


NONZERO_SQL = "SELECT * FROM events WHERE value <> 0"


# ---------------------------------------------------------------------------
# A3: grouped sum

def grouped_sum(sf_dir: str) -> pd.DataFrame:
    # pre-aggregate inside each batch (pure-arrow group_by) so only one tiny
    # partial row per (flag, batch) leaves the read — a bare groupby here
    # would shuffle every lineitem row (4.3s vs 0.9s at sf0.1)

    def _partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        tt = pa.table({"l_returnflag": t["l_returnflag"], "qty_c": qty_c})
        # name-based select before rename: aggregate column order is not
        # stable across pyarrow majors (see q1_pricing)
        return tt.group_by("l_returnflag").aggregate(
            [("qty_c", "sum"), ("qty_c", "count")]
        ).select(["l_returnflag", "qty_c_sum", "qty_c_count"]).rename_columns(
            ["l_returnflag", "qty_c", "n"]
        )

    partials = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    # 3-group key -> driver combine of the tiny partials (no shuffle actors)
    out = (
        partials.to_pandas()
        .groupby("l_returnflag", as_index=False)
        .agg(qty_c=("qty_c", "sum"), n_items=("n", "sum"))
    )
    out["sum_qty"] = out.pop("qty_c") / 100.0
    out["n_items"] = out["n_items"].astype("int64")
    return out[["l_returnflag", "sum_qty", "n_items"]].sort_values(
        "l_returnflag"
    ).reset_index(drop=True)


GROUPED_SUM_SQL = """
SELECT l_returnflag,
       SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A2: grouped window max broadcast back to rows (pipeline.py:112)

def window_end_ts(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset:
    # user_id cardinality grows with the data, so groupby().map_groups would
    # pay a Python dispatch per user (shuffle.py doctrine). Instead: ONE
    # hash-shuffle co-locates each user's rows, then a single vectorized
    # transform('max') per BLOCK — co-location makes the per-block group max
    # the global window max. Small inputs run the same kernel once on the
    # driver (_gated_grouped).
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["end_ts"] = (
            df["ts"] if df.empty  # keep the dtype on empty shuffle blocks
            else df.groupby("user_id", sort=False)["ts"].transform("max")
        )
        return df

    return _gated_grouped(
        ds, ["user_id"], _per_block, _table_rows(sf_dir, "events"),
        driver_threshold,
    )


WINDOW_SQL = """
SELECT event_id, user_id, ts, MAX(ts) OVER (PARTITION BY user_id) AS end_ts
FROM events
"""


# ---------------------------------------------------------------------------
# A4: min-idx dedup (step1_threshold.py:385-388)

def minidx_dedup(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset:
    # (user_id, event_type) cardinality is ~data-proportional: hash-shuffle
    # once, then one vectorized sort + drop_duplicates per BLOCK (equivalent
    # to per-group head(1) after the (value, event_id) sort, but O(blocks)
    # Python calls instead of O(groups)). Small inputs run the same kernel
    # once on the driver (_gated_grouped).
    ds = _read(sf_dir, "events")

    def _keep_min_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["value", "event_id"], kind="mergesort"
        ).drop_duplicates(subset=["user_id", "event_type"], keep="first")

    return _gated_grouped(
        ds, ["user_id", "event_type"], _keep_min_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


MINIDX_SQL = """
SELECT * FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY value, event_id
) = 1
"""


# ---------------------------------------------------------------------------
# A1: the order-sensitive per-group metric block (pipeline.py:79-98), mapped
# onto the events table: group = user_id, timestamp = ts, affected = value.

def outage_metrics(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset:
    # user_id cardinality is data-proportional, so the per-group metric block
    # runs as ONE vectorized grouped pass per hash-shuffled BLOCK (first /
    # last / sum / max over the (ts, event_id)-sorted frame), not a Python
    # callable per group. Integer-cents + the exact same float op ORDER as
    # the scalar version keep the doubles bit-identical vs the DuckDB oracle
    # (numpy elementwise IEEE ops == the former per-group Python ops).
    # Small inputs run the same kernel once on the driver (_gated_grouped).
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _metrics_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "user_id", "duration", "duration_max", "duration_mean",
            "customer_affected_mean", "total_customer_outage_time",
            "total_customer_outage_time_max", "total_customer_outage_time_mean",
        ]
        if df.empty:
            out = pd.DataFrame({c: pd.Series(dtype="float64") for c in cols})
            return out.astype({"user_id": df["user_id"].dtype})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df = df.assign(cents=np.rint(df["value"].to_numpy() * 100).astype("int64"))
        g = df.groupby("user_id", sort=False)
        # duckdb's epoch() rounds each timestamp to double seconds BEFORE the
        # subtraction; mirror that op order for bit-identical durations
        start_us = g["ts"].first().to_numpy().astype("datetime64[ns]").astype("int64") // 1000
        end_us = g["ts"].max().to_numpy().astype("datetime64[ns]").astype("int64") // 1000
        duration = (end_us / 1e6 - start_us / 1e6) / 60.0
        sum_c = g["cents"].sum().to_numpy()
        cnt = g.size().to_numpy()
        first_c = g["cents"].first().to_numpy()
        last_c = g["cents"].last().to_numpy()
        tcot = 15.0 * ((sum_c - first_c) / 100.0)
        last_v = last_c / 100.0
        return pd.DataFrame(
            {
                "user_id": g["user_id"].first().to_numpy(),
                "duration": duration,
                "duration_max": duration + 15.0,
                "duration_mean": duration + 7.5,
                "customer_affected_mean": sum_c / 100.0 / cnt,
                "total_customer_outage_time": tcot,
                "total_customer_outage_time_max": tcot + 15.0 * last_v,
                "total_customer_outage_time_mean": tcot + 7.5 * last_v,
            }
        )

    return _gated_grouped(
        ds, ["user_id"], _metrics_block, _table_rows(sf_dir, "events"),
        driver_threshold,
    )


METRICS_SQL = """
WITH ordered AS (
    SELECT user_id, ts,
           CAST(ROUND(value*100) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS cnt
    FROM events
), agg AS (
    SELECT user_id,
           (epoch(MAX(ts)) - epoch(MIN(ts))) / 60.0 AS duration,
           SUM(cents) AS sum_c,
           COUNT(*) AS cnt,
           MAX(CASE WHEN rn = 1 THEN cents END) AS first_c,
           MAX(CASE WHEN rn = cnt THEN cents END) AS last_c
    FROM ordered GROUP BY user_id
)
SELECT user_id,
       duration,
       duration + 15.0 AS duration_max,
       duration + 7.5 AS duration_mean,
       sum_c / 100.0 / cnt AS customer_affected_mean,
       15.0 * ((sum_c - first_c) / 100.0) AS total_customer_outage_time,
       15.0 * ((sum_c - first_c) / 100.0) + 15.0 * (last_c / 100.0) AS total_customer_outage_time_max,
       15.0 * ((sum_c - first_c) / 100.0) + 7.5 * (last_c / 100.0) AS total_customer_outage_time_mean
FROM agg
"""


# ---------------------------------------------------------------------------
# J1: broadcast small-side lookup join (pipeline.py:62 + ga_mapping.json)

def broadcast_lookup(sf_dir: str) -> rd.Dataset:
    nation = (
        _read(sf_dir, "nation").to_pandas().set_index("n_nationkey")["n_name"].to_dict()
    )
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def _lookup(batch: pd.DataFrame, _map=nation) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_name"] = batch["c_nationkey"].map(_map)
        return batch[["c_custkey", "c_name", "n_name"]]

    return ds.map_batches(_lookup, batch_format="pandas")


BROADCAST_SQL = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


# ---------------------------------------------------------------------------
# sort + top-k

def sort_topk(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# union of filters (pd.concat precedent, il_scraper.py:56)

def union_filter(sf_dir: str) -> rd.Dataset:
    ev = _read(sf_dir, "events")
    a = ev.filter(expr="event_type == 'click'")
    b = ev.filter(expr="event_type == 'purchase'")
    return a.union(b)


UNION_SQL = """
SELECT * FROM events WHERE event_type = 'click'
UNION ALL
SELECT * FROM events WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# distinct (ds.unique)

def distinct_flags(sf_dir: str) -> pa.Table:
    # per-batch distinct partials (<= cardinality rows each) -> driver set
    # union; Dataset.unique would pay a shuffle for a 3-row result
    parts = (
        _read(sf_dir, "lineitem", ["l_returnflag"])
        .map_batches(
            lambda t: pa.table({"l_returnflag": pc.unique(t["l_returnflag"])}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    vals = sorted(set(parts["l_returnflag"]))
    return pa.table({"l_returnflag": pa.array(vals)})


DISTINCT_SQL = "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag"


# ---------------------------------------------------------------------------
# M8: epoch-ms -> timestamp cast

def epoch_ms_cast(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_id"])

    def _cast(t: pa.Table) -> pa.Table:
        ms = pc.add(pc.multiply(pc.cast(t["event_id"], pa.int64()), 1000), 1_600_000_000_000)
        return pa.table(
            {"event_id": t["event_id"], "event_ts": pc.cast(ms, pa.timestamp("ms"))}
        )

    return ds.map_batches(_cast, batch_format="pyarrow")


EPOCH_SQL = """
SELECT event_id, epoch_ms(event_id * 1000 + 1600000000000) AS event_ts
FROM events
"""


# ---------------------------------------------------------------------------
# A5: global scalar properties (step2_property.py:62-94)

def global_props(sf_dir: str) -> pd.DataFrame:
    # one partial totals row per batch -> trivial driver sum (global scalars
    # need no shuffle at all)
    def _partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0)), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "qty_c": pa.array([pc.sum(qty_c).as_py() or 0], pa.int64()),
                "price_c": pa.array([pc.sum(price_c).as_py() or 0], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    qty_c = int(parts["qty_c"].sum())
    price_c = int(parts["price_c"].sum())
    return pd.DataFrame(
        [
            {
                "frequency": n,
                "total_qty": qty_c / 100.0,
                "total_price": price_c / 100.0,
                "avg_qty": qty_c / 100.0 / n,
            }
        ]
    )


GLOBAL_SQL = """
SELECT COUNT(*) AS frequency,
       SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 AS total_qty,
       SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0 AS total_price,
       SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty
FROM lineitem
"""


# ---------------------------------------------------------------------------
# exact dedup over documents (md5 + keep min doc_id)

def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from .dedup import exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(docs).to_pandas()
    return (
        out[["doc_id", "text_md5", "n_copies"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


EXACT_DEDUP_SQL = """
SELECT doc_id, md5(text) AS text_md5,
       COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# token counts (text analysis with exact SQL mirror)

def token_counts_q(sf_dir: str) -> rd.Dataset:
    from .text import token_counts

    return token_counts(_read(sf_dir, "documents", ["doc_id", "text"]))


TOKEN_SQL = r"""
SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS token_count
FROM documents
"""


# GPT-2-style pre-tokenizer shape restricted to ASCII classes (Python re has
# no \p{L}); identical pattern string runs in both engines.
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """BPE-ish token counting: the leading-space word/number/punct-run
    pre-tokenizer every byte-pair tokenizer applies before merges.
    Arrow-native: count_substring_regex runs the identical RE2-compatible
    pattern over the zero-copy string column (VERDICT r4 #4)."""

    def _count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bpe_token_count": pc.count_substring_regex(
                    text, _BPE_PATTERN
                ).cast(pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _count, batch_format="pyarrow"
    )


BPE_TOKEN_SQL = r"""
SELECT doc_id,
       length(regexp_extract_all(COALESCE(text, ''), ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS bpe_token_count
FROM documents
"""


# ---------------------------------------------------------------------------
# quality counts (SQL-mirrorable slice of the feature stage)

_STOP_EN_RE = r"\b(?:the|and|of|to|in|is|it|that|for)\b"
_PUNCT_RE = r"[.,!?;:]"


def quality_counts(sf_dir: str) -> rd.Dataset:
    """Arrow-native counting kernels (VERDICT r4 #4): utf8_length +
    count_substring_regex (RE2) replace the pandas str.count round trip;
    the regexes are ASCII-only so RE2 and Python `re` agree."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _q(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "char_count": pc.utf8_length(text).cast(pa.int64()),
                "punct_count": pc.count_substring_regex(text, _PUNCT_RE).cast(
                    pa.int64()
                ),
                "stop_en_count": pc.count_substring_regex(
                    pc.utf8_lower(text), _STOP_EN_RE
                ).cast(pa.int64()),
            }
        )

    return docs.map_batches(_q, batch_format="pyarrow")


QUALITY_SQL = r"""
SELECT doc_id,
       length(text) AS char_count,
       length(regexp_extract_all(text, '[.,!?;:]')) AS punct_count,
       length(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in|is|it|that|for)\b')) AS stop_en_count
FROM documents
"""


def lang_id(sf_dir: str) -> rd.Dataset:
    """Language-ID + quality score over documents (text.TextFeatures).
    The stopword-hit argmax (first-max tie-break: en, de, fr, es; 'und' when
    no hits) mirrors exactly in SQL by construction: both sides extract
    [a-z']+ word tokens from the lowercased text and count set membership.

    quality_score ships RAW: the SQL expression mirrors the Python float
    operation order term for term, so the doubles are bit-identical
    (verified at sf0.001/0.01/0.1) — a 6dp ROUND on each side would
    INTRODUCE divergence risk, because pandas' scaled round-half-even and
    DuckDB's decimal rounding disagree at 5e-7 boundaries."""
    from .text import text_features

    return text_features(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).select_columns(["doc_id", "lang_pred", "quality_score"])


LANG_ID_SQL = r"""
-- stopword hits mirror TextFeatures EXACTLY: extract [a-z']+ word tokens
-- from the lowercased text, then count set membership with list_filter.
-- A \b-boundary regex would diverge on letter-digit-adjacent tokens
-- ('a1' has no \b between a and 1 but tokenizes to word 'a').
WITH w AS (
    SELECT doc_id,
        length(COALESCE(text,'')) AS char_count,
        length(regexp_extract_all(COALESCE(text,''), '[.,!?;:]')) AS punct_count,
        length(regexp_extract_all(COALESCE(text,''), '\S+')) AS token_count,
        regexp_extract_all(lower(COALESCE(text,'')), '[a-z'']+') AS ws
    FROM documents
), c AS (
    SELECT doc_id, char_count, punct_count, token_count,
        length(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS s_en,
        length(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','mit','auf'))) AS s_de,
        length(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','pour','dans','que'))) AS s_fr,
        length(list_filter(ws, x -> x IN ('el','la','los','y','es','un','una','por','para','que'))) AS s_es
    FROM w
)
SELECT doc_id,
    CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS lang_pred,
    (least(char_count, 2000) / 2000.0) * 0.4
        + (1.0 - least(CASE WHEN char_count > 0
                            THEN punct_count * 1.0 / char_count ELSE 0.0 END,
                       0.2) / 0.2) * 0.2
        + least(s_en * 1.0 / greatest(token_count, 1), 0.5) / 0.5 * 0.4
        AS quality_score
FROM c
"""


def quality_filter(sf_dir: str) -> rd.Dataset:
    """Training-data quality gate: keep documents that are long enough,
    carry English stopwords, and are not punctuation-heavy — the standard
    LLM-corpus heuristic filter, expressed over the same counting kernels as
    quality_counts."""

    def _keep(batch: pa.Table) -> pa.Table:
        cc = batch.column("char_count")
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(cc, 150),
                pc.greater_equal(batch.column("stop_en_count"), 1),
            ),
            pc.less_equal(pc.multiply(batch.column("punct_count"), 20), cc),
        )
        return batch.filter(mask)

    return quality_counts(sf_dir).map_batches(_keep, batch_format="pyarrow")


QUALITY_FILTER_SQL = r"""
SELECT * FROM (
    SELECT doc_id,
           length(text) AS char_count,
           length(regexp_extract_all(text, '[.,!?;:]')) AS punct_count,
           length(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in|is|it|that|for)\b')) AS stop_en_count
    FROM documents
) WHERE char_count >= 150 AND stop_en_count >= 1 AND punct_count * 20 <= char_count
"""


# ---------------------------------------------------------------------------
# corpus prep: the composed training-data pipeline (dedup -> features ->
# quality gate) as ONE streaming chain

def corpus_prep(sf_dir: str) -> rd.Dataset:
    """End-to-end LLM-corpus preparation over documents, composed from the
    individually-oracled stages and kept fully streaming: exact dedup (keep
    min doc_id per content hash) -> per-actor TextFeatures (compiled
    regexes, stopword tables) -> the standard quality gate (length, English
    stopwords, punctuation ratio). Output is one training-manifest row per
    surviving document. No stage materializes the corpus: dedup moves
    3 scalars per unique text, features/gate are per-batch maps."""
    from .dedup import exact_dedup
    from .text import text_features

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    feats = text_features(exact_dedup(docs))

    def _gate(b: pd.DataFrame) -> pd.DataFrame:
        out = b[
            (b["char_count"] >= 150)
            & (b["stop_en"] >= 1)
            & (b["punct_count"] * 20 <= b["char_count"])
        ]
        return out[
            ["doc_id", "text_md5", "n_copies", "lang_pred", "token_count",
             "quality_score"]
        ]

    return feats.map_batches(_gate, batch_format="pandas")


# the composition of EXACT_DEDUP_SQL + LANG_ID_SQL's feature CTE + the gate;
# quality_score mirrors the Python float operation order term for term
# (bit-identical doubles, same contract as LANG_ID_SQL).
CORPUS_PREP_SQL = r"""
WITH kept AS (
    SELECT doc_id, text, md5(text) AS text_md5,
           COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), w AS (
    SELECT doc_id, text_md5, n_copies,
        length(COALESCE(text,'')) AS char_count,
        length(regexp_extract_all(COALESCE(text,''), '[.,!?;:]')) AS punct_count,
        length(regexp_extract_all(COALESCE(text,''), '\S+')) AS token_count,
        regexp_extract_all(lower(COALESCE(text,'')), '[a-z'']+') AS ws
    FROM kept
), c AS (
    SELECT doc_id, text_md5, n_copies, char_count, punct_count, token_count,
        length(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS s_en,
        length(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','mit','auf'))) AS s_de,
        length(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','pour','dans','que'))) AS s_fr,
        length(list_filter(ws, x -> x IN ('el','la','los','y','es','un','una','por','para','que'))) AS s_es
    FROM w
)
SELECT doc_id, text_md5, n_copies,
    CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es' END AS lang_pred,
    token_count,
    (least(char_count, 2000) / 2000.0) * 0.4
        + (1.0 - least(CASE WHEN char_count > 0
                            THEN punct_count * 1.0 / char_count ELSE 0.0 END,
                       0.2) / 0.2) * 0.2
        + least(s_en * 1.0 / greatest(token_count, 1), 0.5) / 0.5 * 0.4
        AS quality_score
FROM c
WHERE char_count >= 150 AND s_en >= 1 AND punct_count * 20 <= char_count
"""


# ---------------------------------------------------------------------------
# brute-force cosine top-k with a deterministic query vector

def knn_topk(sf_dir: str) -> pd.DataFrame:
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # one predicate-pushdown row read on the driver — a Dataset filter
    # execution for a single query vector is pure overhead
    qrow = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    q = np.asarray(qrow["embedding"][0].as_py(), dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = mn @ qn
        part = pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "score": sims})
        # per-batch top-k partial (simsearch.brute_force_knn pattern): only
        # n_batches*k rows ever reach the driver, not all n scores
        return part.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)

    scored = emb.map_batches(_partial, batch_format="pandas").to_pandas()
    top = scored.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
    top = top.assign(score=top["score"].round(6)).reset_index(drop=True)
    return top


def cosine_pairs_exact(sf_dir: str) -> pd.DataFrame:
    """Exact all-pairs cosine >= 0.4 (the embedding near-dup family's
    verify primitive, run standalone): the normalized matrix is broadcast
    once via ray.put and each batch computes its rows x all similarities —
    O(n^2) work split across batches with no shuffle. The approximate scale
    path is dedup.embedding_dedup (sign-LSH buckets)."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # small side: one float matrix read directly on the driver (no Ray
    # execution) and broadcast once
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    mat_ref = ray.put((ids, m))

    def _pairs(batch: pd.DataFrame, _ref=mat_ref) -> pd.DataFrame:
        all_ids, mm = ray.get(_ref)
        rows = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        rows = rows / np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-300)
        sims = rows @ mm.T
        bi, aj = np.where(sims >= 0.4)
        a = batch["vec_id"].to_numpy()[bi]
        b = all_ids[aj]
        keep = a < b
        return pd.DataFrame(
            {
                "a": a[keep].astype("int64"),
                "b": b[keep].astype("int64"),
                "cosine": np.round(sims[bi, aj][keep], 6),
            }
        )

    out = emb.map_batches(_pairs, batch_format="pandas").to_pandas()
    if "a" not in out.columns:  # all-empty blocks lose their schema
        out = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


COSINE_PAIRS_SQL = """
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= 0.4
ORDER BY a, b
"""


KNN_SQL = """
-- CAST to DOUBLE[]: list_cosine_similarity on FLOAT[] computes AND returns
-- float32, so ROUND(...,6) yields a float32 that differs from the Python
-- float64 round at the 1e-8 level (0.369994 is not float32-representable)
SELECT vec_id,
       ROUND(list_cosine_similarity(
           CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
       ), 6) AS score
FROM embeddings
ORDER BY list_cosine_similarity(
    CAST(embedding AS DOUBLE[]),
    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
) DESC, vec_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# J2-style large-side hash join (Dataset.join, hash-partitioned on the key)

def hash_join(
    sf_dir: str, *, build_broadcast_threshold: int = 1_000_000
) -> rd.Dataset:
    # Small build sides broadcast (ray.put once, C-speed merge per batch —
    # no shuffle, no join-aggregator actors); a customer table that grows
    # past the threshold falls back to the distributed hash join, which
    # shuffles both sides once.
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    if _table_rows(sf_dir, "customer") <= build_broadcast_threshold:
        import ray

        cust_ref = ray.put(cust.to_pandas())

        def _merge(batch: pd.DataFrame, _r=cust_ref) -> pd.DataFrame:
            return batch.merge(
                ray.get(_r), left_on="o_custkey", right_on="c_custkey",
                how="inner",
            )[cols]

        return orders.map_batches(_merge, batch_format="pandas")
    joined = orders.join(
        cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    return joined.select_columns(cols)


HASH_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# M9: tz conversion (UTC -> US/Eastern wall time, pipeline.py:108-111)

def tz_convert(sf_dir: str) -> rd.Dataset:
    """M9 (pipeline.py:108-111) arrow-native: assume_timezone pins UTC, a
    same-unit tz cast is metadata-only, local_timestamp extracts the
    US/Eastern wall time — zero pandas round trip (VERDICT r4 #4)."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def _conv(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        unit = ts.type.unit
        utc = pc.assume_timezone(ts, "UTC")
        east = pc.local_timestamp(utc.cast(pa.timestamp(unit, tz="US/Eastern")))
        return pa.table({"event_id": batch.column("event_id"), "ts_east": east})

    return ds.map_batches(_conv, batch_format="pyarrow")


TZ_SQL = """
SELECT event_id,
       CAST(timezone('US/Eastern', ts::TIMESTAMPTZ) AS TIMESTAMP) AS ts_east
FROM events
"""


# ---------------------------------------------------------------------------
# as-of join: every event matched to the latest order (by a bucketed key)
# at or before its timestamp. Dimension-sized right sides broadcast
# (pd.merge_asof per batch, no shuffle); a right side that grows with the
# fact table would OOM the driver, so above the threshold both sides
# co-partition by the join key and merge_asof runs per partition.

def _asof_distributed(left: rd.Dataset, right: rd.Dataset) -> rd.Dataset:
    """Distributed as-of: tag both sides, ONE hash-shuffle on jk co-locates
    each key's complete left and right row sets, then the same reduce +
    merge_asof the broadcast path applies runs vectorized per partition.
    Partitioning assumption: all rows of one jk fit in one block (jk is a
    bucketed key of bounded cardinality; salt the bucketing if a single jk
    outgrows a block)."""
    from ..shuffle import hash_partitioned_map_batches

    def _tag_left(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "side": np.int8(0),
                "jk": (b["user_id"] % 100).astype("int64"),
                "event_id": b["event_id"],
                "ts": b["ts"],
                "o_orderkey": np.int64(0),
                "o_orderdate": pd.Series(
                    pd.NaT, index=b.index, dtype=b["ts"].dtype
                ),
            }
        )

    def _tag_right(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "side": np.int8(1),
                "jk": (b["o_custkey"] % 100).astype("int64"),
                "event_id": np.int64(0),
                "ts": pd.Series(
                    pd.NaT, index=b.index, dtype=b["o_orderdate"].dtype
                ),
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_orderdate": b["o_orderdate"],
            }
        )

    tagged = left.map_batches(_tag_left, batch_format="pandas").union(
        right.map_batches(_tag_right, batch_format="pandas")
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["event_id", "jk", "o_orderkey", "o_orderdate"]
        l = df[df["side"] == 0]
        if not len(l):
            return pd.DataFrame(
                {
                    "event_id": l["event_id"], "jk": l["jk"],
                    "o_orderkey": pd.Series(dtype="float64"),
                    "o_orderdate": l["o_orderdate"],
                }
            )
        r = df[df["side"] == 1][["jk", "o_orderkey", "o_orderdate"]]
        # same reduction as the broadcast path: one row per (jk, date),
        # keep max orderkey — correct per partition because the shuffle
        # co-located every row of each jk
        r = (
            r.sort_values(["jk", "o_orderdate", "o_orderkey"])
            .groupby(["jk", "o_orderdate"], as_index=False)
            .last()
            .sort_values("o_orderdate", kind="mergesort")
        )
        l = l[["event_id", "jk", "ts"]].sort_values("ts", kind="mergesort")
        out = pd.merge_asof(
            l, r, left_on="ts", right_on="o_orderdate", by="jk",
            direction="backward",
        )
        return out[out_cols]

    return hash_partitioned_map_batches(tagged, ["jk"], _merge)


def asof_join(sf_dir: str, *, right_broadcast_threshold: int = 1_000_000) -> rd.Dataset:
    right_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    if right_ds.count() > right_broadcast_threshold:
        left = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        return _asof_distributed(left, right_ds)
    right = right_ds.to_pandas()
    right["jk"] = (right["o_custkey"] % 100).astype("int64")
    # make the as-of unambiguous: one row per (jk, date), keep max orderkey
    right = (
        right.sort_values(["jk", "o_orderdate", "o_orderkey"])
        .groupby(["jk", "o_orderdate"], as_index=False)
        .last()
    )
    right = right.sort_values("o_orderdate", kind="mergesort").reset_index(drop=True)

    import ray

    right_ref = ray.put(right)
    left = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _asof(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(right_ref)
        b = batch.copy()
        b["jk"] = (b["user_id"] % 100).astype("int64")
        b = b.sort_values("ts", kind="mergesort")
        out = pd.merge_asof(
            b, r[["jk", "o_orderdate", "o_orderkey"]],
            left_on="ts", right_on="o_orderdate", by="jk", direction="backward",
        )
        return out[["event_id", "jk", "o_orderkey", "o_orderdate"]]

    return left.map_batches(_asof, batch_format="pandas")


ASOF_SQL = """
WITH r AS (
    SELECT o_custkey % 100 AS jk, o_orderdate, o_orderkey FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey % 100, o_orderdate ORDER BY o_orderkey DESC
    ) = 1
), l AS (SELECT event_id, ts, user_id % 100 AS jk FROM events)
SELECT l.event_id, l.jk, r.o_orderkey, r.o_orderdate
FROM l ASOF LEFT JOIN r ON l.jk = r.jk AND r.o_orderdate <= l.ts
"""


# ---------------------------------------------------------------------------
# tumbling-window aggregate over the events stream (5-minute windows):
# per-batch partial window sums -> tiny final groupby (stream-shaped
# workload per ray_guide "Streaming-shaped workloads")

def tumbling_window(sf_dir: str) -> pd.DataFrame:
    def _partial(t: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.floor(pc.divide(epoch_s, 300)), 300)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        tt = pa.table({"window_start_s": pc.cast(win, pa.int64()), "cents": cents})
        return (
            tt.group_by("window_start_s")
            .aggregate([("cents", "sum"), ("cents", "count")])
            # name-based select before rename (see q1_pricing)
            .select(["window_start_s", "cents_sum", "cents_count"])
            .rename_columns(["window_start_s", "cents", "n"])
        )

    partials = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    # events are time-clustered per block, so each batch emits partial rows
    # for only the handful of windows it spans — the combined partial frame
    # is O(n_windows + n_blocks), a driver-side combine, not a shuffle
    out = (
        partials.to_pandas()
        .groupby("window_start_s", as_index=False)
        .agg(cents=("cents", "sum"), n_events=("n", "sum"))
    )
    out["window_start"] = pd.to_datetime(out.pop("window_start_s"), unit="s")
    out["sum_value"] = out.pop("cents") / 100.0
    out["n_events"] = out["n_events"].astype("int64")
    return out[["window_start", "sum_value", "n_events"]].sort_values(
        "window_start"
    ).reset_index(drop=True)


TUMBLING_SQL = """
SELECT to_timestamp(FLOOR(epoch(ts) / 300) * 300)::TIMESTAMP AS window_start,
       SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 AS sum_value,
       COUNT(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# sliding-window aggregate (width 600 s, step 300 s => every row lands in
# exactly width/step = 2 windows): the same per-batch integer-cents partial
# shape as tumbling_window, with the window assignment EXPLODED inside the
# partial (tile the batch's window keys, never the rows) — the combine is
# still O(n_windows + n_blocks) driver-side partial rows, no shuffle.

def sliding_window(sf_dir: str) -> pd.DataFrame:
    width_s, step_s = 600, 300
    k = width_s // step_s  # windows per row

    def _partial(t: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        base = pc.multiply(pc.floor(pc.divide(epoch_s, step_s)), step_s)
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        base_np = pc.cast(base, pa.int64()).to_numpy()
        cents_np = cents.to_numpy()
        # k window keys per row: start offsets 0, -step, ... (row at ts is
        # inside window [start, start + width) for each)
        wins = np.concatenate([base_np - j * step_s for j in range(k)])
        tt = pa.table(
            {
                "window_start_s": pa.array(wins, pa.int64()),
                "cents": pa.array(np.tile(cents_np, k), pa.int64()),
            }
        )
        return (
            tt.group_by("window_start_s")
            .aggregate([("cents", "sum"), ("cents", "count")])
            # name-based select before rename (see q1_pricing)
            .select(["window_start_s", "cents_sum", "cents_count"])
            .rename_columns(["window_start_s", "cents", "n"])
        )

    partials = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    out = (
        partials.to_pandas()
        .groupby("window_start_s", as_index=False)
        .agg(cents=("cents", "sum"), n_events=("n", "sum"))
    )
    out["window_start"] = pd.to_datetime(out.pop("window_start_s"), unit="s")
    out["sum_value"] = out.pop("cents") / 100.0
    out["n_events"] = out["n_events"].astype("int64")
    return out[["window_start", "sum_value", "n_events"]].sort_values(
        "window_start"
    ).reset_index(drop=True)


# width = 2 x step, so each row belongs to exactly two windows (k = 0, 1)
# with no boundary condition: floor(ts/step)*step - k*step <= ts <
# floor(ts/step)*step - k*step + width holds identically for k in {0, 1}.
SLIDING_SQL = """
SELECT to_timestamp(FLOOR(epoch(ts) / 300) * 300 - k * 300)::TIMESTAMP AS window_start,
       SUM(CAST(ROUND(value*100) AS BIGINT)) / 100.0 AS sum_value,
       COUNT(*) AS n_events
FROM events, UNNEST([0, 1]) AS t(k)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# grouped top-k: top-k rows per group by a sort key (the per-group variant
# of sort_topk — a training-data staple: top documents per domain, top
# orders per customer). Group cardinality is data-proportional, so the
# shape is the battery-standard gated grouped kernel: one hash shuffle +
# one vectorized sort + groupby.head per block (groupby.head is a cython
# kernel, one call per BLOCK, not per group).

def grouped_topk(
    sf_dir: str, k: int = 3, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def _topk_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("o_custkey", sort=False).head(k)

    return _gated_grouped(
        ds, ["o_custkey"], _topk_block, _table_rows(sf_dir, "orders"),
        driver_threshold,
    )


GROUPED_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
) <= 3
"""


# ---------------------------------------------------------------------------
# sequence packing: assign every document to a fixed-token-budget shard by
# the GLOBAL exclusive prefix sum of its token count in doc_id order —
# pack_id = floor(cum_before / budget), the standard "greedy fill in corpus
# order, a doc belongs to the shard where it starts" rule for packing
# training shards. The engine primitive underneath is a DISTRIBUTED PREFIX
# SUM: range-partition (sort by doc_id) + materialize pins the block
# layout, phase 1 reduces each block to (min_doc_id, sum_tokens) — a
# frame of n_blocks rows — the driver turns those into per-block offsets,
# and phase 2 adds each block's offset to its local cumsum. Two streaming
# passes over pinned blocks; nothing row-sized ever reaches the driver.

_PACK_BUDGET = 2048


def _doc_token_counts(sf_dir: str) -> rd.Dataset:
    def _count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "token_count": pc.count_substring_regex(text, r"\S+").cast(
                    pa.int64()
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _count, batch_format="pyarrow"
    )


def pack_shards(
    sf_dir: str,
    budget: int = _PACK_BUDGET,
    driver_threshold: int = _GROUP_DRIVER_THRESHOLD,
) -> rd.Dataset:
    import ray

    counts = _doc_token_counts(sf_dir)
    n_rows = _table_rows(sf_dir, "documents")

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        cum_before = df["token_count"].cumsum().shift(1, fill_value=0)
        df["pack_id"] = (cum_before // budget).astype("int64")
        return df

    if n_rows <= driver_threshold:
        out = _assign(counts.to_pandas())
        t = pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)
        return rd.from_arrow(t)

    # distributed prefix sum over doc_id ranges. materialize() pins the
    # sorted block layout so both phases see the SAME disjoint ranges —
    # this is the one legitimate mid-pipeline materialization in the
    # engine: a scan fundamentally reads its input twice, and the pinned
    # form lives in the (spillable) object store, never on the driver.
    ranged = counts.sort("doc_id").materialize()

    def _block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"min_doc_id": pa.array([], pa.int64()),
                 "tokens": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "min_doc_id": pa.array(
                    [pc.min(t.column("doc_id")).as_py()], pa.int64()
                ),
                "tokens": pa.array(
                    [pc.sum(t.column("token_count")).as_py()], pa.int64()
                ),
            }
        )

    summaries = (
        ranged.map_batches(_block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("min_doc_id")
        .reset_index(drop=True)
    )
    offsets = {
        int(m): int(o)
        for m, o in zip(
            summaries["min_doc_id"],
            summaries["tokens"].cumsum().shift(1, fill_value=0),
        )
    }
    offsets_ref = ray.put(offsets)

    def _assign_block(t: pa.Table, _ref=offsets_ref) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("pack_id", pa.array([], pa.int64()))
        offs = ray.get(_ref)
        # blocks are disjoint doc_id ranges (range partition), but rows
        # within a block may be unsorted — order locally
        idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
        t = t.take(idx)
        tok = t.column("token_count").to_numpy()
        cum_before = np.concatenate([[0], np.cumsum(tok)[:-1]])
        base = offs[int(t.column("doc_id")[0].as_py())]
        pack = (base + cum_before) // budget
        return t.append_column("pack_id", pa.array(pack.astype(np.int64)))

    return ranged.map_batches(_assign_block, batch_format="pyarrow", batch_size=None)


PACK_SHARDS_SQL = r"""
WITH t AS (
    SELECT doc_id,
           length(regexp_extract_all(COALESCE(text, ''), '\S+')) AS token_count
    FROM documents
)
SELECT doc_id, token_count,
       CAST(COALESCE(SUM(token_count) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) // 2048 AS BIGINT) AS pack_id
FROM t
"""


# ---------------------------------------------------------------------------
# stratified deterministic sample: k documents per stratum (lang), ranked by
# a seeded affine hash of doc_id mod 2^64 — a pure function of the data, so
# the sample is identical at any parallelism (the content-keyed sampling
# doctrine, simsearch._train_centroids). Strata are few, so the shape is a
# per-batch partial top-k + a k*strata*blocks-bounded driver combine — the
# brute_force_knn pattern, no shuffle at all.

_SAMPLE_A = np.uint64(6364136223846793005)  # PCG-LCG multiplier
_SAMPLE_B = np.uint64(1442695040888963407)


def stratified_sample(sf_dir: str, k: int = 5) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].to_numpy().astype(np.uint64) * _SAMPLE_A + _SAMPLE_B
        df = df.assign(_h=h)
        df = df.sort_values(["lang", "_h", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(k)

    parts = docs.map_batches(_partial, batch_format="pandas").to_pandas()
    out = (
        parts.sort_values(["lang", "_h", "doc_id"], kind="mergesort")
        .groupby("lang", sort=False)
        .head(k)
        .drop(columns=["_h"])
        .reset_index(drop=True)
    )
    out["sample_rank"] = out.groupby("lang", sort=False).cumcount() + 1
    return out.sort_values(["lang", "sample_rank"]).reset_index(drop=True)


STRATIFIED_SQL = """
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST((CAST(doc_id AS HUGEINT) * 6364136223846793005
                              + 1442695040888963407)
                             % 18446744073709551616::HUGEINT AS UBIGINT),
                        doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# PII scrubbing: redact emails and US-style phone numbers, count redactions.
# The raw corpus contains no PII, which would make the check vacuous, so the
# gate input deterministically appends a synthetic contact line derived from
# doc_id (email + phone) that DuckDB reproduces verbatim — the redaction
# provably fires on every row. Arrow-native end to end: one element-wise
# string join + RE2 count/replace kernels over the zero-copy column.

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"


def pii_scrub(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _scrub(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        aug = pc.binary_join_element_wise(
            text,
            " contact u", pa.array(d.astype(str)),
            "@ex", pa.array((d % 7).astype(str)),
            ".com or 555-", pa.array((d % 900 + 100).astype(str)),
            "-", pa.array((d % 9000 + 1000).astype(str)),
            "",
        )
        n_pii = pc.add(
            pc.count_substring_regex(aug, _PII_EMAIL),
            pc.count_substring_regex(aug, _PII_PHONE),
        ).cast(pa.int64())
        clean = pc.replace_substring_regex(
            pc.replace_substring_regex(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>",
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"), "clean_text": clean, "n_pii": n_pii}
        )

    return ds.map_batches(_scrub, batch_format="pyarrow")


PII_SCRUB_SQL = r"""
WITH aug AS (
    SELECT doc_id,
           COALESCE(text, '') || ' contact u' || CAST(doc_id AS VARCHAR)
             || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com or 555-'
             || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'
             || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS t
    FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS clean_text,
       CAST(length(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          + length(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT)
           AS n_pii
FROM aug
"""


# ---------------------------------------------------------------------------
# document chunking: split every document into fixed-size overlapping
# character windows (chunk 500, stride 400 => 100 overlap) — the RAG/
# context-window prep op. Embarrassingly parallel; the explode is
# vectorized per CHUNK INDEX (one utf8_slice kernel over all docs that
# have a k-th chunk), never per row.

_CHUNK_SIZE = 500
_CHUNK_STRIDE = 400


def chunk_documents(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _chunks(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        # chunks per doc: ceil(len/stride), min 1 (empty doc -> one empty chunk)
        n_chunks = np.maximum(1, (n + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE)
        parts = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > k)
            sub = batch.filter(mask)
            sub_text = pc.fill_null(sub.column("text"), "")
            chunk = pc.utf8_slice_codeunits(
                sub_text, start=k * _CHUNK_STRIDE,
                stop=k * _CHUNK_STRIDE + _CHUNK_SIZE,
            )
            parts.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64)
                        ),
                        "chunk": chunk,
                    }
                )
            )
        if not parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "chunk": pa.array([], pa.string())}
            )
        return pa.concat_tables(parts)

    return ds.map_batches(_chunks, batch_format="pyarrow")


CHUNK_SQL = """
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substr(COALESCE(text, ''), CAST(i * 400 + 1 AS BIGINT), 500) AS chunk
FROM documents,
     UNNEST(generate_series(0,
         greatest(0, (length(COALESCE(text, '')) + 399) // 400 - 1))) t(i)
"""


# ---------------------------------------------------------------------------
# term document frequency: top-50 terms by the number of DISTINCT documents
# containing them — the wordcount-with-preaggregation shape. Each batch
# holds whole documents, so a per-batch distinct (term, doc) + count is a
# correct partial (no doc spans two batches); partials are vocab-sized
# (term, n) rows. The combine is gated: driver groupby under the row bound
# (vocab x blocks partial rows, tiny), one hash shuffle on term above it.

def term_doc_freq(
    sf_dir: str, k: int = 50, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = df[["doc_id"]].join(words.rename("term")).explode("term")
        e = e.dropna().drop_duplicates()
        return e.groupby("term", as_index=False).agg(n=("doc_id", "size"))

    partials = docs.map_batches(_partial, batch_format="pandas")
    n_rows = _table_rows(sf_dir, "documents")
    if n_rows <= driver_threshold:
        combined = (
            partials.to_pandas().groupby("term", as_index=False).agg(
                n_docs=("n", "sum")
            )
        )
    else:
        def _sum_block(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("term", as_index=False).agg(n_docs=("n", "sum"))

        combined = hash_partitioned_map_batches(
            partials, ["term"], _sum_block
        ).to_pandas()
    out = combined.sort_values(
        ["n_docs", "term"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.reset_index(drop=True)


TERM_DOC_FREQ_SQL = r"""
WITH w AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS term
    FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM w GROUP BY term
ORDER BY n_docs DESC, term
LIMIT 50
"""


# ---------------------------------------------------------------------------
# repetition filter: the Gopher-style within-document repetition quality
# rules (Rae et al. 2021 §A1.1) adapted to the corpus's single-line word
# streams — drop documents whose most frequent word exceeds 10% of tokens
# or whose duplicate-bigram fraction exceeds 5% (both straddle the corpus
# median, so the filter provably bites). Embarrassingly parallel, one pass;
# the per-batch kernel is flat numpy over an exploded (row, word) layout —
# no per-row Python. Fractions are single IEEE divisions in the same
# operand order as the SQL, so the doubles hash-match bit-exactly.

_REP_TOP_WORD_MAX = 0.10
_REP_DUP_BIGRAM_MAX = 0.05


def _explode_words(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(row_id, flat_word, words_per_row) for a batch, fully vectorized."""
    words = df["text"].fillna("").str.split(" ")
    lens = words.str.len().to_numpy(np.int64)
    rid = np.repeat(np.arange(len(df), dtype=np.int64), lens)
    flat = (
        np.concatenate([np.asarray(w, dtype=object) for w in words])
        if len(df) and lens.sum()
        else np.array([], dtype=object)
    )
    return rid, flat, lens


def repetition_filter(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _metrics(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "top_word_frac": pd.Series(dtype="float64"),
                 "dup_bigram_frac": pd.Series(dtype="float64")}
            )
        rid, flat, lens = _explode_words(df)
        counts = (
            pd.DataFrame({"rid": rid, "w": flat})
            .groupby(["rid", "w"], sort=False)
            .size()
        )
        top = counts.groupby(level=0).max().reindex(
            np.arange(len(df)), fill_value=0
        ).to_numpy(np.float64)
        top_word_frac = top / lens.astype(np.float64)
        # bigrams: adjacent word pairs within a row (mask out row seams)
        same = rid[:-1] == rid[1:]
        bg = flat[:-1][same] + " " + flat[1:][same]
        brid = rid[:-1][same]
        n_bg = np.maximum(lens - 1, 0).astype(np.float64)
        ndist = (
            pd.DataFrame({"rid": brid, "b": bg})
            .drop_duplicates()
            .groupby("rid")
            .size()
            .reindex(np.arange(len(df)), fill_value=0)
            .to_numpy(np.float64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_bigram_frac = np.where(n_bg > 0, 1.0 - ndist / n_bg, 0.0)
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(),
             "top_word_frac": top_word_frac,
             "dup_bigram_frac": dup_bigram_frac}
        )
        keep = (out["top_word_frac"] <= _REP_TOP_WORD_MAX) & (
            out["dup_bigram_frac"] <= _REP_DUP_BIGRAM_MAX
        )
        return out[keep]

    return docs.map_batches(_metrics, batch_format="pandas")


REPETITION_SQL = """
WITH d AS (
    SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), wc AS (
    SELECT doc_id, unnest(w) AS word FROM d
), tw AS (
    SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_frac
    FROM (SELECT doc_id, word, COUNT(*) AS c FROM wc GROUP BY doc_id, word)
    GROUP BY doc_id
), bg AS (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS b, len(w) - 1 AS nb
    FROM d, UNNEST(generate_series(1, len(w) - 1)) t(i)
), db AS (
    SELECT doc_id,
           1.0 - CAST(COUNT(DISTINCT b) AS DOUBLE) / COUNT(*) AS dup_bigram_frac
    FROM bg GROUP BY doc_id
)
SELECT d.doc_id, tw.top_word_frac,
       COALESCE(db.dup_bigram_frac, 0.0) AS dup_bigram_frac
FROM d JOIN tw USING (doc_id) LEFT JOIN db ON d.doc_id = db.doc_id
WHERE tw.top_word_frac <= 0.10
  AND COALESCE(db.dup_bigram_frac, 0.0) <= 0.05
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms: the classic two-pass corpus statistic. Pass 1 computes
# per-term document frequency as vocab-sized per-batch partials (docs never
# span batches) combined on the driver — the vocab is small by construction
# (term_doc_freq measures it), so DF is a broadcast dict, never a shuffle.
# Pass 2 scores every (doc, term) as tf * idf and keeps each doc's top-3;
# per-batch top-k is exact for the same whole-docs-per-batch reason. The
# idf is the LOG-FREE variant idf = N/df: both factors are single IEEE
# divisions and the product one multiplication, the exact operand order the
# SQL uses — no libm call whose last ulp could differ between DuckDB and
# numpy (the oracle hash-compares raw doubles).

def tfidf_topk(sf_dir: str, k: int = 3) -> pd.DataFrame:
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _table_rows(sf_dir, "documents")

    def _df_partial(df: pd.DataFrame) -> pd.DataFrame:
        rid, flat, _lens = _explode_words(df)
        e = pd.DataFrame({"rid": rid, "term": flat}).drop_duplicates()
        return e.groupby("term", as_index=False).agg(df_n=("rid", "size"))

    df_map = (
        docs.map_batches(_df_partial, batch_format="pandas")
        .to_pandas()
        .groupby("term", as_index=False)
        .agg(df_n=("df_n", "sum"))
    )
    idf = dict(
        zip(df_map["term"], float(n_docs) / df_map["df_n"].to_numpy(np.float64))
    )
    idf_ref = ray.put(idf)

    def _score(df: pd.DataFrame, _ref=idf_ref) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "term": pd.Series(dtype="object"),
                 "score": pd.Series(dtype="float64"),
                 "tfidf_rank": pd.Series(dtype="int64")}
            )
        idf_m = ray.get(_ref)
        rid, flat, lens = _explode_words(df)
        cnt = (
            pd.DataFrame({"rid": rid, "term": flat})
            .groupby(["rid", "term"], sort=False, as_index=False)
            .size()
        )
        tf = cnt["size"].to_numpy(np.float64) / lens[cnt["rid"]].astype(np.float64)
        cnt["score"] = tf * cnt["term"].map(idf_m).to_numpy(np.float64)
        cnt = cnt.sort_values(
            ["rid", "score", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        topk = cnt.groupby("rid", sort=False).head(k).copy()
        topk["tfidf_rank"] = (
            topk.groupby("rid", sort=False).cumcount() + 1
        ).astype("int64")
        topk["doc_id"] = df["doc_id"].to_numpy()[topk["rid"]]
        return topk[["doc_id", "term", "score", "tfidf_rank"]]

    # corpus-sized output (k rows per doc) — stays a Dataset; pulling it to
    # the driver for a cosmetic sort was the one super-linear term in the
    # sf10 ladder (the driver gate sort-normalizes before hashing anyway)
    return docs.map_batches(_score, batch_format="pandas")


TFIDF_SQL = """
WITH w AS (
    SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
    FROM documents
), tf AS (
    SELECT doc_id, term, COUNT(*) AS c FROM w GROUP BY doc_id, term
), nw AS (
    SELECT doc_id, COUNT(*) AS n FROM w GROUP BY doc_id
), dfq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df_n FROM w GROUP BY term
), nn AS (
    SELECT COUNT(*) AS nd FROM documents
), s AS (
    SELECT tf.doc_id, tf.term,
           (CAST(tf.c AS DOUBLE) / nw.n) * (CAST(nn.nd AS DOUBLE) / dfq.df_n)
               AS score
    FROM tf JOIN nw USING (doc_id) JOIN dfq USING (term) CROSS JOIN nn
)
SELECT doc_id, term, score, CAST(rn AS BIGINT) AS tfidf_rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
    ) AS rn FROM s
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# HyperLogLog sketch: distributed approximate distinct-count of document
# texts in ONE pass with O(m) driver state — the mergeable-sketch pattern
# (Flajolet et al. 2007). Each batch emits a 64-register partial (register
# = low 6 bits of the text's polynomial hash, rho = leading-zero rank of
# the remaining 58 bits); partials max-merge associatively, so the combine
# is m integers per block regardless of corpus size. The driver-gate query
# returns the REGISTERS (integer-exact, so the DuckDB oracle reproduces
# them bit-for-bit in HUGEINT — same base-_FNV_PRIME character polynomial
# as the simhash/shingle oracles, ASCII corpus so bytes == codepoints);
# the float estimate lives in hll_estimate() and is accuracy-tested in
# pytest against the exact distinct count, not hash-compared.

_HLL_P = 6
_HLL_M = 1 << _HLL_P  # 64 registers
_FNV_PRIME_U64 = np.uint64(1099511628211)


_HASH_CELL_BUDGET = 1 << 26  # 64M padded cells (~512 MB uint64) per slice


def _char_poly_hash(texts: pd.Series) -> np.ndarray:
    """uint64 polynomial hash over each text's utf8 bytes (base _FNV_PRIME,
    wrap mod 2^64) — vectorized by NUL-left-padding to equal width (leading
    zeros don't change a polynomial started at 0), one fused multiply-add
    per column. Same family dedup._word_poly_hashes uses per word.

    Skew guard: rows are length-sorted and processed in slices whose
    rows x slice-max-width stays under a fixed cell budget, so one huge
    document pads only its own slice — a 1 MB outlier in a 1,000-row batch
    no longer inflates the whole batch to rows x 1M cells."""
    enc = [t.encode("utf8") for t in texts.fillna("")]
    n = len(enc)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(t) for t in enc), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    lo = 0
    while lo < n:
        w = int(lens[order[lo]])
        if w == 0:
            lo += 1  # empty text hashes to 0 (the initialized value)
            continue
        hi = lo + 1
        # grow the slice while the padded matrix stays under budget
        while hi < n and (hi - lo + 1) * int(lens[order[hi]]) <= _HASH_CELL_BUDGET:
            hi += 1
        idx = order[lo:hi]
        width = int(lens[idx[-1]])
        buf = b"".join(enc[i].rjust(width, b"\0") for i in idx)
        codes = (
            np.frombuffer(buf, dtype=np.uint8)
            .reshape(len(idx), width)
            .astype(np.uint64)
        )
        h = np.zeros(len(idx), dtype=np.uint64)
        for j in range(width):
            h = h * _FNV_PRIME_U64 + codes[:, j]
        out[idx] = h
        lo = hi
    return out


_MIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — the raw polynomial has weak avalanche on
    near-identical strings (measured: +82% HLL bias on texts differing only
    in a trailing counter), so register/rank bits need a mixer. The SQL
    oracle reproduces it step-for-step in HUGEINT."""
    h = h ^ (h >> np.uint64(30))
    h = h * _MIX_C1
    h = h ^ (h >> np.uint64(27))
    h = h * _MIX_C2
    return h ^ (h >> np.uint64(31))


def _hll_partial(df: pd.DataFrame) -> pd.DataFrame:
    rows = _hll_partial_rows(df.assign(source=""))
    return rows.groupby("register", as_index=False)["rho"].max()


def hll_registers(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["text"])
    parts = docs.map_batches(_hll_partial, batch_format="pandas").to_pandas()
    merged = parts.groupby("register", as_index=False)["rho"].max()
    out = pd.DataFrame({"register": np.arange(_HLL_M, dtype=np.int64)}).merge(
        merged, on="register", how="left"
    )
    out["max_rho"] = out["rho"].fillna(0).astype("int64")
    return out[["register", "max_rho"]]


def hll_estimate(registers: pd.DataFrame) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction; relative error ~1.04/sqrt(64) = 13%."""
    rho = registers.sort_values("register")["max_rho"].to_numpy(np.float64)
    m = float(len(rho))
    alpha = 0.709  # alpha_64
    est = alpha * m * m / np.sum(np.power(2.0, -rho))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# grouped HLL: the per-SOURCE distinct-text sketch (hll_registers is
# global) — per-mixture-source cardinality is what dedup planning actually
# consumes. Identical hash/mix/rank pipeline; the partial merely carries
# the group key, so the merge is max over (source, register): sources x 64
# rows total, mergeable in any order, and the oracle is the same HUGEINT
# splitmix chain with `source` threaded through every CTE.

def _grouped_hll_partial(df: pd.DataFrame) -> pd.DataFrame:
    p = _hll_partial_rows(df)
    return p.groupby(["source", "register"], as_index=False)["rho"].max()


def _hll_partial_rows(df: pd.DataFrame) -> pd.DataFrame:
    h = _mix64(_char_poly_hash(df["text"]))
    reg = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
    r = h >> np.uint64(_HLL_P)
    bl = np.zeros(len(r), dtype=np.int64)
    v = r.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    rho = (64 - _HLL_P + 1) - bl
    return pd.DataFrame(
        {"source": df["source"].to_numpy(), "register": reg, "rho": rho}
    )


def grouped_hll(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["source", "text"])
    parts = docs.map_batches(_grouped_hll_partial, batch_format="pandas").to_pandas()
    merged = parts.groupby(["source", "register"], as_index=False)["rho"].max()
    sources = sorted(merged["source"].unique())
    grid = pd.MultiIndex.from_product(
        [sources, range(_HLL_M)], names=["source", "register"]
    ).to_frame(index=False)
    out = grid.merge(merged, on=["source", "register"], how="left")
    out["max_rho"] = out["rho"].fillna(0).astype("int64")
    out["register"] = out["register"].astype("int64")
    return out[["source", "register", "max_rho"]]


HLL_SQL = """
WITH h AS (
    SELECT CAST(list_reduce(
        list_prepend(0::HUGEINT,
            list_transform(generate_series(1, length(COALESCE(text, ''))),
                i -> CAST(unicode(substr(COALESCE(text, ''), i, 1)) AS HUGEINT))),
        (acc, c) -> (acc * 1099511628211::HUGEINT + c)
                    % 18446744073709551616::HUGEINT
    ) AS UBIGINT) AS hv
    FROM documents
), x1 AS (
    SELECT xor(hv, hv >> 30) AS v FROM h
), m1 AS (
    -- (v * C) mod 2^64 via 32-bit split: both partial products fit INT128
    SELECT CAST((CAST(v & 4294967295 AS HUGEINT) * 13787848793156543929::HUGEINT
                 % 18446744073709551616::HUGEINT
                 + (CAST(v >> 32 AS HUGEINT) * 13787848793156543929::HUGEINT
                    % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS v
    FROM x1
), x2 AS (
    SELECT xor(v, v >> 27) AS v FROM m1
), m2 AS (
    SELECT CAST((CAST(v & 4294967295 AS HUGEINT) * 10723151780598845931::HUGEINT
                 % 18446744073709551616::HUGEINT
                 + (CAST(v >> 32 AS HUGEINT) * 10723151780598845931::HUGEINT
                    % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS v
    FROM x2
), mixed AS (
    SELECT xor(v, v >> 31) AS hv FROM m2
), rr AS (
    SELECT CAST(hv & 63 AS BIGINT) AS register, hv >> 6 AS r FROM mixed
), rh AS (
    SELECT register,
           MAX(CASE WHEN r = 0 THEN 59
                    ELSE 59 - length(ltrim(bin(r), '0')) END) AS mr
    FROM rr GROUP BY register
)
SELECT g.register, CAST(COALESCE(rh.mr, 0) AS BIGINT) AS max_rho
FROM (SELECT unnest(generate_series(0, 63)) AS register) g
LEFT JOIN rh ON g.register = rh.register
"""

# ---------------------------------------------------------------------------
# exact grouped distinct count — grouped_hll's exact counterpart (same
# question, sketch vs exact): distinct texts per source by md5. Scale
# shape: per-batch (source, md5) dedup partials shrink the stream to the
# distinct set, ONE hash shuffle on the pair co-locates survivors, a
# per-block dedup+count emits (source, partial_n) — the driver combine is
# source-sized. The md5 column reuses corpus_prep's hashing doctrine (the
# exact-dedup key), so the oracle is a plain COUNT(DISTINCT md5(text)).

def grouped_distinct_exact(sf_dir: str) -> pd.DataFrame:
    from .dedup import add_md5

    docs = _read(sf_dir, "documents", ["source", "text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = add_md5(df)  # dedup's exact-key doctrine (md5 of utf8 text)
        return df.rename(columns={"text_md5": "md5"})[
            ["source", "md5"]
        ].drop_duplicates()

    parts = docs.map_batches(_partial, batch_format="pandas")

    def _count_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"source": pd.Series(dtype=object),
                 "n": pd.Series(dtype="int64")}
            )
        g = df.drop_duplicates().groupby("source", as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    counted = hash_partitioned_map_batches(
        parts, ["source", "md5"], _count_block
    ).to_pandas()
    out = counted.groupby("source", as_index=False)["n"].sum()
    out["n_distinct"] = out.pop("n").astype("int64")
    return out.sort_values("source").reset_index(drop=True)


GROUPED_DISTINCT_SQL = """
SELECT source,
       CAST(COUNT(DISTINCT md5(COALESCE(text, ''))) AS BIGINT) AS n_distinct
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# windowed distinct count: distinct users per tumbling hour — the
# streaming-analytics staple (tumbling_window counts EVENTS; unique-actor
# counting can't pre-aggregate without a dedup step). Same shape as
# grouped_distinct_exact: per-batch (window, user) dedup partials, ONE
# hash shuffle on the pair, per-block dedup + per-window partial counts,
# window-count-sized driver combine.

def windowed_distinct(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": df["ts"].dt.floor("h").to_numpy(),
                "user_id": df["user_id"].to_numpy(np.int64),
            }
        ).drop_duplicates()

    parts = ds.map_batches(_partial, batch_format="pandas")

    def _count_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"window_start": pd.Series(dtype="datetime64[us]"),
                 "n": pd.Series(dtype="int64")}
            )
        g = df.drop_duplicates().groupby("window_start", as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    counted = hash_partitioned_map_batches(
        parts, ["window_start", "user_id"], _count_block
    ).to_pandas()
    out = counted.groupby("window_start", as_index=False)["n"].sum()
    out["n_users"] = out.pop("n").astype("int64")
    return out.sort_values("window_start").reset_index(drop=True)


WINDOWED_DISTINCT_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY window_start ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# funnel analysis: furthest ORDERED stage per user through
# view -> click -> purchase (a later stage only counts if it happens
# STRICTLY AFTER the user's first occurrence of the previous stage — the
# sequence constraint is what plain conditional aggregation can't see).
# Fully vectorized per complete user group: three rounds of
# per-user-min + merge + strict-after filter — no per-row Python, no
# per-user dispatch. Gated grouped: driver under the bound, ONE hash
# shuffle on user_id above it (each round's merge is in-block).

_FUNNEL = ("view", "click", "purchase")


def _funnel_block(df: pd.DataFrame) -> pd.DataFrame:
    users = pd.DataFrame({"user_id": df["user_id"].unique()})
    stage = pd.Series(np.zeros(len(users), dtype=np.int64), index=users["user_id"])
    prev_t = None
    cur = df
    for i, ev in enumerate(_FUNNEL, start=1):
        rows = cur[cur["event_type"] == ev]
        if prev_t is not None:
            rows = rows.merge(prev_t, on="user_id")
            rows = rows[rows["ts"] > rows["prev"]]
        if not len(rows):
            break
        t = rows.groupby("user_id", as_index=False)["ts"].min()
        stage.loc[t["user_id"].to_numpy()] = i
        prev_t = t.rename(columns={"ts": "prev"})
    out = pd.DataFrame(
        {"user_id": stage.index.to_numpy(np.int64),
         "funnel_stage": stage.to_numpy(np.int64)}
    )
    return out.sort_values("user_id").reset_index(drop=True)


def funnel_stages(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    return _gated_grouped(
        ds, ["user_id"], _funnel_block, _table_rows(sf_dir, "events"),
        driver_threshold,
    )


FUNNEL_SQL = """
WITH t1 AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, MIN(e.ts) AS t FROM events e
    JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
    WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, MIN(e.ts) AS t FROM events e
    JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
), u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u
LEFT JOIN t1 ON u.user_id = t1.user_id
LEFT JOIN t2 ON u.user_id = t2.user_id
LEFT JOIN t3 ON u.user_id = t3.user_id
ORDER BY u.user_id
"""


# The grouped oracle is DERIVED from HLL_SQL so the splitmix chain can
# never drift between the two: `source` is threaded through every CTE and
# the final grid cross-joins sources x registers.
GROUPED_HLL_SQL = (
    HLL_SQL
    .replace("SELECT CAST(list_reduce(", "SELECT source, CAST(list_reduce(")
    .replace("SELECT xor(hv, hv >> 30) AS v FROM h",
             "SELECT source, xor(hv, hv >> 30) AS v FROM h")
    .replace("SELECT CAST((CAST(v & 4294967295 AS HUGEINT)",
             "SELECT source, CAST((CAST(v & 4294967295 AS HUGEINT)")
    .replace("SELECT xor(v, v >> 27) AS v FROM m1",
             "SELECT source, xor(v, v >> 27) AS v FROM m1")
    .replace("SELECT xor(v, v >> 31) AS hv FROM m2",
             "SELECT source, xor(v, v >> 31) AS hv FROM m2")
    .replace("SELECT CAST(hv & 63 AS BIGINT) AS register, hv >> 6 AS r FROM mixed",
             "SELECT source, CAST(hv & 63 AS BIGINT) AS register, hv >> 6 AS r FROM mixed")
    .replace("    SELECT register,\n           MAX(CASE",
             "    SELECT source, register,\n           MAX(CASE")
    .replace("FROM rr GROUP BY register", "FROM rr GROUP BY source, register")
    .replace(
        "SELECT g.register, CAST(COALESCE(rh.mr, 0) AS BIGINT) AS max_rho\n"
        "FROM (SELECT unnest(generate_series(0, 63)) AS register) g\n"
        "LEFT JOIN rh ON g.register = rh.register",
        "SELECT s.source, g.register, CAST(COALESCE(rh.mr, 0) AS BIGINT) AS max_rho\n"
        "FROM (SELECT DISTINCT source FROM documents) s\n"
        "CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS register) g\n"
        "LEFT JOIN rh ON rh.source = s.source AND g.register = rh.register",
    )
)


# ---------------------------------------------------------------------------
# Count-Min sketch: the second mergeable-sketch shape (Cormode &
# Muthukrishnan 2005) — approximate term frequencies in one pass with a
# fixed d x w counter matrix whose merge is an elementwise SUM, so unlike
# Misra-Gries it is batch-order independent and the partials combine
# associatively (the HLL doctrine, additive instead of max). Per depth the
# slot is the top-8 bits of (splitmix64(word_poly_hash) * C_d) mod 2^64
# with C_d a small odd constant, so every multiply fits HUGEINT and the
# DuckDB oracle reproduces the COUNTERS bit-for-bit. cms_lookup() carries
# the min-over-depths point estimate, accuracy-tested in pytest.

_CMS_D = 4
_CMS_W = 256  # slots per depth (top 8 bits)
_CMS_C = (  # small ODD constants (< 2^44 so mh * C fits HUGEINT)
    np.uint64(17545394224853),
    np.uint64(13524510171561),
    np.uint64(10872568911861),
    np.uint64(2561399133431),
)


def _cms_partial(df: pd.DataFrame) -> pd.DataFrame:
    rid, flat, _lens = _explode_words(df)
    if len(flat) == 0:
        return pd.DataFrame(
            {"depth": pd.Series(dtype="int64"),
             "slot": pd.Series(dtype="int64"),
             "n": pd.Series(dtype="int64")}
        )
    # hash each DISTINCT word once, then weight by its occurrence count
    vc = pd.Series(flat).value_counts()
    words = vc.index.to_numpy(object)
    counts = vc.to_numpy(np.int64)
    from .dedup import _word_poly_hashes

    mh = _mix64(_word_poly_hashes(list(words)))
    parts = []
    for d in range(_CMS_D):
        slot = ((mh * _CMS_C[d]) >> np.uint64(56)).astype(np.int64)
        parts.append(pd.DataFrame({"depth": d, "slot": slot, "n": counts}))
    return (
        pd.concat(parts, ignore_index=True)
        .groupby(["depth", "slot"], as_index=False)["n"]
        .sum()
    )


def cms_counts(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["text"])
    parts = docs.map_batches(_cms_partial, batch_format="pandas").to_pandas()
    if "depth" not in parts.columns:  # empty table loses the schema
        parts = pd.DataFrame(
            {"depth": pd.Series(dtype="int64"),
             "slot": pd.Series(dtype="int64"),
             "n": pd.Series(dtype="int64")}
        )
    merged = parts.groupby(["depth", "slot"], as_index=False)["n"].sum()
    grid = pd.MultiIndex.from_product(
        [range(_CMS_D), range(_CMS_W)], names=["depth", "slot"]
    ).to_frame(index=False)
    out = grid.merge(merged, on=["depth", "slot"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    out["depth"] = out["depth"].astype("int64")
    out["slot"] = out["slot"].astype("int64")
    return out


def cms_lookup(sketch: pd.DataFrame, word: str) -> int:
    """Point estimate: min over depths of the word's slot counter —
    an upper bound on the true count, within eps*N w.h.p."""
    from .dedup import _word_poly_hashes

    mh = _mix64(_word_poly_hashes([word]))[0]
    est = None
    s = sketch.set_index(["depth", "slot"])["n"]
    for d in range(_CMS_D):
        slot = int((mh * _CMS_C[d]) >> np.uint64(56))
        v = int(s.loc[(d, slot)])
        est = v if est is None else min(est, v)
    return int(est)


CMS_SQL = """
WITH w AS (
    SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS wd FROM documents
), wc AS (
    SELECT wd, COUNT(*) AS c FROM w GROUP BY wd
), wh AS (
    SELECT c, CAST(list_reduce(
        list_prepend(0::HUGEINT,
            list_transform(generate_series(1, length(wd)),
                i -> CAST(unicode(substr(wd, i, 1)) AS HUGEINT))),
        (acc, ch) -> (acc * 1099511628211::HUGEINT + ch)
                     % 18446744073709551616::HUGEINT
    ) AS UBIGINT) AS hv
    FROM wc
), x1 AS (
    SELECT c, xor(hv, hv >> 30) AS v FROM wh
), m1 AS (
    SELECT c, CAST((CAST(v & 4294967295 AS HUGEINT) * 13787848793156543929::HUGEINT
                 % 18446744073709551616::HUGEINT
                 + (CAST(v >> 32 AS HUGEINT) * 13787848793156543929::HUGEINT
                    % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS v
    FROM x1
), x2 AS (
    SELECT c, xor(v, v >> 27) AS v FROM m1
), m2 AS (
    SELECT c, CAST((CAST(v & 4294967295 AS HUGEINT) * 10723151780598845931::HUGEINT
                 % 18446744073709551616::HUGEINT
                 + (CAST(v >> 32 AS HUGEINT) * 10723151780598845931::HUGEINT
                    % 4294967296::HUGEINT) * 4294967296::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS v
    FROM x2
), mixed AS (
    SELECT c, xor(v, v >> 31) AS mh FROM m2
), consts AS (
    SELECT * FROM (VALUES (0, 17545394224853::HUGEINT),
                          (1, 13524510171561::HUGEINT),
                          (2, 10872568911861::HUGEINT),
                          (3, 2561399133431::HUGEINT)) t(depth, cc)
), slots AS (
    SELECT consts.depth,
           CAST(CAST((CAST(mh AS HUGEINT) * cc)
                     % 18446744073709551616::HUGEINT AS UBIGINT) >> 56
                AS BIGINT) AS slot,
           c
    FROM mixed CROSS JOIN consts
), agg AS (
    SELECT depth, slot, SUM(c) AS n FROM slots GROUP BY depth, slot
)
SELECT g.depth, g.slot, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n
FROM (SELECT d.depth, s.slot
      FROM (SELECT unnest(generate_series(0, 3)) AS depth) d,
           (SELECT unnest(generate_series(0, 255)) AS slot) s) g
LEFT JOIN agg ON g.depth = agg.depth AND g.slot = agg.slot
"""


# ---------------------------------------------------------------------------
# exact distributed percentiles WITHOUT a sort: per-doc word counts live in
# a bounded integer domain, so each batch emits a (value, count) histogram
# partial, the merged histogram is domain-sized (tiny) on the driver, and
# the exact p-th percentile is the value at 1-based rank ceil(p*n/100) in
# the cumulative counts — integer arithmetic end to end, no global sort, no
# shuffle, one corpus pass. (The global-sort alternative moves every row;
# this moves O(domain) scalars per block.)

def token_percentiles(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["text"])

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        n_words = df["text"].fillna("").str.split(" ").str.len().to_numpy(np.int64)
        v, c = np.unique(n_words, return_counts=True)
        return pd.DataFrame({"v": v, "c": c})

    parts = docs.map_batches(_hist, batch_format="pandas").to_pandas()
    if "v" not in parts.columns:  # empty table loses the schema (gotcha #5)
        parts = pd.DataFrame({"v": pd.Series(dtype="int64"),
                              "c": pd.Series(dtype="int64")})
    hist = parts.groupby("v", as_index=False)["c"].sum().sort_values("v")
    n = int(hist["c"].sum())
    if n == 0:
        # empty table: mirror the SQL's aggregate-over-nothing NULL row
        na = pd.array([pd.NA], dtype="Int64")
        return pd.DataFrame({"n_docs": na, "p50": na, "p90": na, "p99": na})
    cum = hist["c"].cumsum().to_numpy()
    vals = hist["v"].to_numpy()

    def _at(p: int) -> int:
        rank = (p * n + 99) // 100  # ceil(p*n/100), exact
        return int(vals[np.searchsorted(cum, rank)])

    return pd.DataFrame(
        {"n_docs": pd.array([n], dtype="int64"),
         "p50": pd.array([_at(50)], dtype="int64"),
         "p90": pd.array([_at(90)], dtype="int64"),
         "p99": pd.array([_at(99)], dtype="int64")}
    )


TOKEN_PCTL_SQL = """
WITH t AS (
    SELECT len(string_split(COALESCE(text, ''), ' ')) AS v FROM documents
), r AS (
    SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
    FROM t
)
SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN v END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS BIGINT) AS p90,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS BIGINT) AS p99
FROM r
"""


# ---------------------------------------------------------------------------
# mixture sampling: the data-mixture reweighting op — downsample each source
# to a per-source rate (here rate = (src_num % 4 + 1)/5, so the 20 sources
# get 0.2/0.4/0.6/0.8 and every branch provably fires). A doc survives iff
# its seeded affine hash (the stratified_sample family) falls under
# floor(rate * 2^64) — an EXACT integer threshold, so the sample is a pure
# function of the data: identical at any parallelism, any batch size, and
# in DuckDB (HUGEINT arithmetic). Stateless, zero-shuffle, one pass.

def mixture_sample(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    # floor(k/5 * 2^64) for k = 1..4, exact
    thresholds = np.array([(1 << 64) * k // 5 for k in range(1, 5)], dtype=np.uint64)

    def _sample(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.uint64)
        h = ids * _SAMPLE_A + _SAMPLE_B  # wrapping mod 2^64
        k = df["source"].str.slice(3).astype(np.int64).to_numpy() % 4
        return df[h < thresholds[k]]

    return docs.map_batches(_sample, batch_format="pandas")


MIXTURE_SQL = r"""
WITH t AS (
    SELECT doc_id, source,
           CAST((CAST(doc_id AS HUGEINT) * 6364136223846793005
                 + 1442695040888963407)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS h,
           CAST(regexp_extract(source, '\d+') AS BIGINT) % 4 + 1 AS k
    FROM documents
)
SELECT doc_id, source FROM t
WHERE h < CAST(18446744073709551616::HUGEINT * k // 5 AS UBIGINT)
"""


# ---------------------------------------------------------------------------
# semi / anti join: filter a fact table by key membership in a (filtered)
# dimension — the blocklist/allowlist staple of training-data pipelines
# (drop docs whose id is in a takedown list, keep orders of one segment's
# customers). Gated like hash_join: a bounded key set broadcasts once
# (ray.put + arrow-native pc.is_in, zero shuffle); past the threshold the
# distributed path runs a Bloom-bitmap pre-filter (fixed 1 MiB partials
# OR-merged on the driver — bounded by BITS, not by keys) so
# definitely-absent rows never enter the shuffle, then ONE tagged
# hash-shuffle on the key exact-verifies the Bloom positives. Bloom has no
# false negatives, so anti emits its negatives immediately and semi never
# loses a match; false positives are removed by the exact verify, so both
# paths return identical rows.

_MEMBER_BROADCAST_THRESHOLD = 1_000_000
_BLOOM_BITS = 1 << 23  # 1 MiB bitmap; ~0.4% fp at 1M keys with 2 probes
_BLOOM_SALT = np.uint64(0x9E3779B97F4A7C15)


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = _mix64(keys.astype(np.int64).view(np.uint64))
    h2 = _mix64(h1 ^ _BLOOM_SALT)
    m = np.uint64(_BLOOM_BITS)
    return (h1 % m).astype(np.int64), (h2 % m).astype(np.int64)


def _bloom_bitmap(keys_ds: rd.Dataset, key_col: str) -> np.ndarray:
    """OR-merge per-block Bloom partials into one boolean bitmap. Each
    partial is a fixed _BLOOM_BITS/8-byte row regardless of block size, so
    driver memory is O(bits), not O(keys)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(_BLOOM_BITS, dtype=bool)
        if len(df):
            p1, p2 = _bloom_positions(df[key_col].to_numpy(np.int64))
            bm[p1] = True
            bm[p2] = True
        return pd.DataFrame({"bm": [np.packbits(bm).tobytes()]})

    parts = keys_ds.map_batches(_partial, batch_format="pandas").to_pandas()
    acc = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for b in parts["bm"]:
        acc |= np.frombuffer(b, dtype=np.uint8)
    return np.unpackbits(acc).view(bool)


def _membership_join(
    sf_dir: str, *, semi: bool, broadcast_threshold: int
) -> rd.Dataset:
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    left = _read(sf_dir, "orders", cols)
    keys_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        lambda r: r["c_mktsegment"] == "BUILDING"
    )
    import ray

    if _table_rows(sf_dir, "customer") <= broadcast_threshold:
        keys = np.unique(keys_ds.to_pandas()["c_custkey"].to_numpy(np.int64))
        key_ref = ray.put(pa.array(keys, type=pa.int64()))

        def _f(t: pa.Table, _r=key_ref) -> pa.Table:
            mask = pc.is_in(t["o_custkey"], value_set=ray.get(_r))
            if not semi:
                mask = pc.invert(mask)
            return t.filter(mask).select(cols)

        return left.map_batches(_f, batch_format="pyarrow")

    # ---- distributed: Bloom pre-filter + tagged exact verify ----
    bloom_ref = ray.put(_bloom_bitmap(keys_ds, "c_custkey"))

    def _bloom_mask(df: pd.DataFrame) -> np.ndarray:
        bm = ray.get(bloom_ref)
        p1, p2 = _bloom_positions(df["o_custkey"].to_numpy(np.int64))
        return bm[p1] & bm[p2]

    candidates = left.map_batches(
        lambda df: df[_bloom_mask(df)], batch_format="pandas"
    )

    def _tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "side": np.int8(0), "k": df["o_custkey"].astype("int64"),
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_totalprice": df["o_totalprice"].astype("float64"),
            }
        )

    def _tag_right(df: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(df["c_custkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "side": np.int8(1), "k": k,
                "o_orderkey": np.int64(0), "o_totalprice": np.float64(0.0),
            }
        )

    tagged = candidates.map_batches(_tag_left, batch_format="pandas").union(
        keys_ds.map_batches(_tag_right, batch_format="pandas")
    )

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["side"] == 0]
        member = l["k"].isin(set(df.loc[df["side"] == 1, "k"]))
        keep = l[member if semi else ~member]
        return pd.DataFrame(
            {
                "o_orderkey": keep["o_orderkey"],
                "o_custkey": keep["k"],
                "o_totalprice": keep["o_totalprice"],
            }
        )

    verified = hash_partitioned_map_batches(tagged, ["k"], _verify)
    if semi:
        return verified
    negatives = left.map_batches(
        lambda df: df[~_bloom_mask(df)][cols], batch_format="pandas"
    )
    return verified.union(negatives)


def semi_join(
    sf_dir: str, *, broadcast_threshold: int = _MEMBER_BROADCAST_THRESHOLD
) -> rd.Dataset:
    return _membership_join(
        sf_dir, semi=True, broadcast_threshold=broadcast_threshold
    )


def anti_join(
    sf_dir: str, *, broadcast_threshold: int = _MEMBER_BROADCAST_THRESHOLD
) -> rd.Dataset:
    return _membership_join(
        sf_dir, semi=False, broadcast_threshold=broadcast_threshold
    )


SEMI_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

ANTI_JOIN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey NOT IN
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# ---------------------------------------------------------------------------
# range (interval) join: match each point to every interval containing it,
# within a bounded key — the operator Ray Data lacks natively (brief's
# "range join"). Both paths bucket the timeline at exactly the interval
# width W, so every interval overlaps <= 2 buckets (replicate it into
# both) and every point lives in exactly 1 bucket — a point meets a given
# interval in at most one bucket, so no pair is ever duplicated and no
# post-dedup pass is needed. Gated like asof_join: a dimension-sized
# interval table broadcasts once (ray.put; per-point-batch merge on
# (bucket, key) + band mask, ZERO shuffle — measured 15.1 -> 2.5 s at
# sf0.1); an interval side that grows with the fact table takes the
# distributed path: tagged union + ONE hash-shuffle on (bucket, key) that
# co-locates each point with every interval it could match, same
# vectorized per-block merge. Partitioning assumption (distributed path):
# one (bucket, key) cell fits in a block — salt the key if a single cell
# outgrows it.

_RANGE_WINDOW_US = 14 * 86_400 * 1_000_000  # 14 days


def _range_points(df: pd.DataFrame, W: int) -> pd.DataFrame:
    df = df[df["o_orderstatus"] == "O"]
    ts = df["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
    return pd.DataFrame(
        {
            "bucket": ts // W,
            "jk": (df["o_custkey"] % 100).astype("int64").to_numpy(),
            "point_key": df["o_orderkey"].astype("int64").to_numpy(),
            "ts": ts,
        }
    )


def _range_intervals(df: pd.DataFrame, W: int) -> pd.DataFrame:
    """Interval rows replicated into each of the <= 2 buckets they cover."""
    df = df[df["o_orderstatus"] == "F"]
    start = df["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
    jk = (df["o_custkey"] % 100).astype("int64").to_numpy()
    ik = df["o_orderkey"].astype("int64").to_numpy()
    b0 = start // W
    b1 = (start + W - 1) // W  # last instant covered (end exclusive)
    second = b1 > b0
    return pd.DataFrame(
        {
            "bucket": np.concatenate([b0, b1[second]]),
            "jk": np.concatenate([jk, jk[second]]),
            "interval_key": np.concatenate([ik, ik[second]]),
            "start": np.concatenate([start, start[second]]),
        }
    )


def range_join(
    sf_dir: str, *, interval_broadcast_threshold: int = 1_000_000
) -> pd.DataFrame:
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"],
    )
    W = _RANGE_WINDOW_US
    import ray

    if _table_rows(sf_dir, "orders") <= interval_broadcast_threshold:
        iv = (
            orders.map_batches(
                lambda df: _range_intervals(df, W), batch_format="pandas"
            )
            .to_pandas()
        )
        if "bucket" not in iv.columns:
            iv = pd.DataFrame(
                {c: pd.Series(dtype="int64")
                 for c in ("bucket", "jk", "interval_key", "start")}
            )
        iv_ref = ray.put(iv)

        def _probe(df: pd.DataFrame, _r=iv_ref) -> pd.DataFrame:
            m = _range_points(df, W).merge(ray.get(_r), on=["bucket", "jk"])
            m = m[(m["ts"] >= m["start"]) & (m["ts"] < m["start"] + W)]
            return m[["point_key", "interval_key"]]

        out = orders.map_batches(_probe, batch_format="pandas").to_pandas()
    else:
        def _tag_points(df: pd.DataFrame) -> pd.DataFrame:
            p = _range_points(df, W)
            p["side"] = np.int8(0)
            p["interval_key"] = np.int64(0)
            p["start"] = np.int64(0)
            return p

        def _tag_intervals(df: pd.DataFrame) -> pd.DataFrame:
            r = _range_intervals(df, W)
            r["side"] = np.int8(1)
            r["point_key"] = np.int64(0)
            r["ts"] = np.int64(0)
            return r[["bucket", "jk", "point_key", "ts", "side",
                      "interval_key", "start"]]

        tagged = orders.map_batches(_tag_points, batch_format="pandas").union(
            orders.map_batches(_tag_intervals, batch_format="pandas")
        )

        def _join_block(df: pd.DataFrame) -> pd.DataFrame:
            l = df[df["side"] == 0][["bucket", "jk", "point_key", "ts"]]
            r = df[df["side"] == 1][["bucket", "jk", "interval_key", "start"]]
            m = l.merge(r, on=["bucket", "jk"])
            m = m[(m["ts"] >= m["start"]) & (m["ts"] < m["start"] + W)]
            return m[["point_key", "interval_key"]]

        out = hash_partitioned_map_batches(
            tagged, ["bucket", "jk"], _join_block
        ).to_pandas()
    if "point_key" not in out.columns:  # all-empty blocks lose their schema
        out = pd.DataFrame(
            {
                "point_key": pd.Series(dtype="int64"),
                "interval_key": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(["point_key", "interval_key"]).reset_index(drop=True)


RANGE_JOIN_SQL = """
SELECT l.o_orderkey AS point_key, r.o_orderkey AS interval_key
FROM orders l JOIN orders r
  ON l.o_orderstatus = 'O' AND r.o_orderstatus = 'F'
 AND l.o_custkey % 100 = r.o_custkey % 100
 AND l.o_orderdate >= r.o_orderdate
 AND l.o_orderdate < r.o_orderdate + INTERVAL 14 DAY
ORDER BY point_key, interval_key
"""


# ---------------------------------------------------------------------------
# heavy hitters: exact top terms with frequency > N/k via two passes —
# pass 1 builds mergeable Misra-Gries summaries (Agarwal et al. 2012,
# "Mergeable summaries": per-block summaries with s counters merge by
# count-sum + (s+1)-th-largest decrement, keeping total error < N/(s+1)),
# tree-compressed via repartition so the driver only ever sees a bounded
# candidate table; pass 2 broadcasts the <= s candidates and counts them
# EXACTLY in one more streaming pass. With s = 2k, every term with true
# frequency > N/k provably survives pass 1 under ANY block split, so the
# final filtered output is exact and parallelism-independent — hence
# SQL-reproducible despite the sketch in the middle.

_HH_K = 200  # report terms with freq > N/_HH_K
_HH_SKETCH = 400  # Misra-Gries counters; error < N/401 < N/200


def _mg_compress(df: pd.DataFrame, s: int) -> pd.DataFrame:
    """Merge (word, cnt) rows into a <= s-counter Misra-Gries summary."""
    g = df.groupby("word", as_index=False)["cnt"].sum()
    if len(g) > s:
        cut = g["cnt"].nlargest(s + 1).iloc[-1]
        g = g.assign(cnt=g["cnt"] - cut)
        g = g[g["cnt"] > 0]
    return g.reset_index(drop=True)


def heavy_hitters(sf_dir: str, *, k: int = _HH_K) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["text"])
    word_re = re.compile(r"\w+")

    def _flat_words(df: pd.DataFrame) -> np.ndarray:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        lens = words.str.len().to_numpy(np.int64)
        if not len(df) or not lens.sum():
            return np.array([], dtype=object)
        return np.concatenate([np.asarray(w, dtype=object) for w in words])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = pd.Series(_flat_words(df)).value_counts()
        return _mg_compress(
            pd.DataFrame({"word": vc.index.astype(str), "cnt": vc.to_numpy()}),
            _HH_SKETCH,
        )

    partials = docs.map_batches(_partial, batch_format="pandas")
    # tree merge: each of 8 blocks compresses a disjoint subset of the
    # per-block summaries, so the driver receives <= 8 x _HH_SKETCH rows
    # no matter how many input blocks there were
    mid = partials.repartition(8).map_batches(
        lambda df: _mg_compress(df, _HH_SKETCH), batch_format="pandas"
    )
    cand = _mg_compress(mid.to_pandas(), _HH_SKETCH)["word"].to_numpy(object)

    import ray

    cand_ref = ray.put(cand)
    _TOTAL = "\x00total\x00"  # \x00 is not \w, so it cannot collide

    def _exact(df: pd.DataFrame) -> pd.DataFrame:
        flat = _flat_words(df)
        c = ray.get(cand_ref)
        vc = pd.Series(flat[np.isin(flat, c)]).value_counts()
        # keep the word column a pure object array end to end: np.append
        # would round-trip the sentinel through a fixed-width '<U' array,
        # which silently strips its trailing \x00 as padding
        words = np.empty(len(vc) + 1, dtype=object)
        words[: len(vc)] = vc.index.to_numpy(dtype=object)
        words[len(vc)] = _TOTAL
        return pd.DataFrame(
            {
                "word": words,
                "cnt": np.append(vc.to_numpy(np.int64), np.int64(len(flat))),
            }
        )

    ex = (
        docs.map_batches(_exact, batch_format="pandas")
        .to_pandas()
        .groupby("word", as_index=False)["cnt"]
        .sum()
    )
    n_total = int(ex.loc[ex["word"] == _TOTAL, "cnt"].sum())
    out = ex[(ex["word"] != _TOTAL) & (ex["cnt"] * k > n_total)]
    out = out.sort_values("word").reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out


HEAVY_HITTERS_SQL = r"""
WITH w AS (
    SELECT unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS word
    FROM documents
), tot AS (SELECT COUNT(*) AS n FROM w)
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM w, tot GROUP BY word, n HAVING COUNT(*) * 200 > n
ORDER BY word
"""


# ---------------------------------------------------------------------------
# grouped exact percentiles: the per-source length-distribution op every
# mixture pipeline needs (p50/p90/p99 token count PER SOURCE, to set
# per-source chunking and packing budgets). Same no-sort histogram doctrine
# as token_percentiles, keyed: each batch emits (source, value, count)
# partials, and the rank selection runs per complete source group — on the
# driver while sources x domain stays bounded, else after ONE hash-shuffle
# on source (the per-block kernel is identical; hash_partitioned co-locates
# every source's full histogram).

def _grouped_pctl_block(df: pd.DataFrame) -> pd.DataFrame:
    """Exact p50/p90/p99 per source from (source, v, c) histogram rows.
    Correct for any union of COMPLETE source groups."""
    if not len(df):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype="int64"),
                "p50": pd.Series(dtype="int64"),
                "p90": pd.Series(dtype="int64"),
                "p99": pd.Series(dtype="int64"),
            }
        )
    g = (
        df.groupby(["source", "v"], as_index=False)["c"]
        .sum()
        .sort_values(["source", "v"], kind="mergesort")
    )
    out = []
    # one iteration per SOURCE (bounded by the mixture's source count, not
    # by rows) over already-reduced histogram slices — the amortized shape
    for src, h in g.groupby("source", sort=True):
        cum = h["c"].cumsum().to_numpy()
        vals = h["v"].to_numpy()
        n = int(cum[-1])
        row = {"source": src, "n_docs": n}
        for p in (50, 90, 99):
            rank = (p * n + 99) // 100
            row[f"p{p}"] = int(vals[np.searchsorted(cum, rank)])
        out.append(row)
    res = pd.DataFrame(out)
    for c in ("n_docs", "p50", "p90", "p99"):
        res[c] = res[c].astype("int64")
    return res


def grouped_percentiles(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["source", "text"])

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df["text"].fillna("").str.split(" ").str.len().to_numpy(np.int64)
        g = pd.DataFrame({"source": df["source"].to_numpy(), "v": v})
        return g.groupby(["source", "v"], as_index=False).size().rename(
            columns={"size": "c"}
        )

    parts = docs.map_batches(_hist, batch_format="pandas")
    if _table_rows(sf_dir, "documents") <= driver_threshold:
        merged = parts.to_pandas()
        if "source" not in merged.columns:
            merged = pd.DataFrame(
                {"source": pd.Series(dtype=object),
                 "v": pd.Series(dtype="int64"), "c": pd.Series(dtype="int64")}
            )
        out = _grouped_pctl_block(merged)
    else:
        out = hash_partitioned_map_batches(
            parts, ["source"], _grouped_pctl_block
        ).to_pandas()
    return out.sort_values("source").reset_index(drop=True)


GROUPED_PCTL_SQL = """
WITH t AS (
    SELECT source, len(string_split(COALESCE(text, ''), ' ')) AS v
    FROM documents
), r AS (
    SELECT source, v,
           row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM t
)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN v END) AS BIGINT) AS p50,
       CAST(MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS BIGINT) AS p90,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS BIGINT) AS p99
FROM r GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# fingerprint-overlap (containment) detection: MOSS-style — two documents
# are reported when they share >= 2 of their 4 smallest distinct window
# hashes (text.fingerprints' base-257 family), which catches
# copied/contained passages that whole-document hashing misses. Scale
# shape: explode per-doc fingerprints to (fp, doc_id) postings, ONE
# hash-shuffle on fp, vectorized within-posting self-join per block, then
# a pair-count reduce (gated driver/distributed). Skew note: a boilerplate
# window shared by many docs creates a quadratic posting — at corpus scale
# drop top-frequency fingerprints first (stop-fingerprints), exactly like
# salting a hot key; the default stays exact to match the oracle.

_FP_OVERLAP_MIN = 2
_FPO_WINDOW = 8
_FPO_KEEP = 4


def _window_hash_mins(s: str) -> np.ndarray:
    """k smallest DISTINCT base-257 window hashes of the utf8 bytes (the
    text.fingerprints family; distinct so a repeated window can't count
    twice toward the pair-overlap threshold)."""
    b = s.encode("utf8", errors="ignore")
    if len(b) < _FPO_WINDOW:
        return np.array([], dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    powers = np.uint64(257) ** np.arange(_FPO_WINDOW, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(arr, _FPO_WINDOW)
    h = (windows * powers[::-1]).sum(axis=1)
    return np.unique(h)[:_FPO_KEEP]


def fingerprint_overlap(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _postings(df: pd.DataFrame) -> pd.DataFrame:
        fps = df["text"].fillna("").map(_window_hash_mins)
        lens = fps.str.len().to_numpy(np.int64)
        ids = np.repeat(df["doc_id"].to_numpy(np.int64), lens)
        flat = (
            np.concatenate(list(fps)) if lens.sum() else
            np.array([], dtype=np.uint64)
        )
        # uint64 -> int64 bit-view: hash-shuffle keys stay a native arrow type
        return pd.DataFrame({"fp": flat.view(np.int64), "doc_id": ids})

    postings = docs.map_batches(_postings, batch_format="pandas")

    def _pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        j = df.merge(df, on="fp", suffixes=("_a", "_b"))
        j = j[j["doc_id_a"] < j["doc_id_b"]]
        # one row per (fp, pair) by construction (per-doc fps are distinct),
        # so each row is one unit of shared-fingerprint evidence
        return pd.DataFrame({"a": j["doc_id_a"], "b": j["doc_id_b"]})

    pair_rows = hash_partitioned_map_batches(postings, ["fp"], _pairs_block)
    if _table_rows(sf_dir, "documents") <= driver_threshold:
        pr = pair_rows.to_pandas()
        if "a" not in pr.columns:
            pr = pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        counted = pr.groupby(["a", "b"], as_index=False).size().rename(
            columns={"size": "shared"}
        )
    else:
        def _count_block(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["a", "b"], as_index=False).size().rename(
                columns={"size": "shared"}
            )

        counted = hash_partitioned_map_batches(
            pair_rows, ["a", "b"], _count_block
        ).to_pandas()
        if "a" not in counted.columns:
            counted = pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "shared": pd.Series(dtype="int64")}
            )
    out = counted[counted["shared"] >= _FP_OVERLAP_MIN]
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    out["shared"] = out["shared"].astype("int64")
    return out


FINGERPRINT_OVERLAP_SQL = """
WITH pos AS (
    SELECT doc_id, text AS t,
           unnest(generate_series(1, length(text) - 7)) AS i
    FROM documents
), wh AS (
    SELECT doc_id,
           CAST((
               CAST(unicode(substr(t, i,     1)) AS HUGEINT) * 74051159531521793::HUGEINT
             + CAST(unicode(substr(t, i + 1, 1)) AS HUGEINT) * 288136807515649::HUGEINT
             + CAST(unicode(substr(t, i + 2, 1)) AS HUGEINT) * 1121154893057::HUGEINT
             + CAST(unicode(substr(t, i + 3, 1)) AS HUGEINT) * 4362470401::HUGEINT
             + CAST(unicode(substr(t, i + 4, 1)) AS HUGEINT) * 16974593::HUGEINT
             + CAST(unicode(substr(t, i + 5, 1)) AS HUGEINT) * 66049::HUGEINT
             + CAST(unicode(substr(t, i + 6, 1)) AS HUGEINT) * 257::HUGEINT
             + CAST(unicode(substr(t, i + 7, 1)) AS HUGEINT)
           ) % 18446744073709551616::HUGEINT AS UBIGINT) AS h
    FROM pos
), d AS (SELECT DISTINCT doc_id, h FROM wh),
small AS (
    SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
    FROM d
), fp AS (SELECT doc_id, h FROM small WHERE rn <= 4)
SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS shared
FROM fp x JOIN fp y ON x.h = y.h AND x.doc_id < y.doc_id
GROUP BY a, b HAVING COUNT(*) >= 2 ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# left outer join: completes the join family (inner=hash_join, semi/anti,
# range, asof). Orders keep their row even when the (filtered) customer
# side has no match — the shape every enrichment join needs when the
# dimension table is incomplete. Same gate as hash_join: dimension-sized
# build sides broadcast (ray.put once, C-speed left merge per batch);
# above the threshold Ray's distributed left_outer hash join shuffles both
# sides once. NULL discipline: the unmatched c_name is COALESCEd to '' on
# BOTH sides so the driver's value hash never compares NaN spellings.

def left_outer_join(
    sf_dir: str, *, build_broadcast_threshold: int = 1_000_000
) -> rd.Dataset:
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 0.0)).select(
            ["c_custkey", "c_name"]
        ),
        batch_format="pyarrow",
    )
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    if _table_rows(sf_dir, "customer") <= build_broadcast_threshold:
        import ray

        cust_ref = ray.put(cust.to_pandas())

        def _merge(batch: pd.DataFrame, _r=cust_ref) -> pd.DataFrame:
            out = batch.merge(
                ray.get(_r), left_on="o_custkey", right_on="c_custkey",
                how="left",
            )[cols]
            out["c_name"] = out["c_name"].fillna("")
            return out

        return orders.map_batches(_merge, batch_format="pandas")
    joined = orders.join(
        cust, join_type="left_outer", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(cols)

    def _coalesce(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("c_name"), "c_name",
            pc.fill_null(t["c_name"], ""),
        )

    return joined.map_batches(_coalesce, batch_format="pyarrow")


LEFT_OUTER_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, COALESCE(c_name, '') AS c_name
FROM orders LEFT JOIN (
    SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0
) c ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# full outer join: both-side row preservation (orders missing from a
# customer subset AND customers with no orders). Same family as
# hash_join/left_outer_join; there is no broadcast shortcut for a FULL
# outer join (the build side's unmatched rows need global knowledge), so
# both gates run Ray's distributed full_outer hash join — the honest
# shape at any scale. NULL discipline: unmatched keys/prices COALESCE to
# sentinels on both sides so the value hash never compares NaN spellings.

def full_outer_join(sf_dir: str) -> rd.Dataset:
    # orders restricted to big tickets, customers to high balances — both
    # sides carry unmatched rows (337 left-only / 1 right-only at sf0.001)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 5000.0)).select(
            ["c_custkey", "c_name"]
        ),
        batch_format="pyarrow",
    )
    joined = orders.join(
        cust, join_type="full_outer", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def _coalesce(t: pa.Table) -> pa.Table:
        # Ray's full_outer hash join already coalesces the key pair into
        # the LEFT key column (c_custkey is dropped; right-only rows carry
        # their key in o_custkey)
        return pa.table(
            {
                "o_orderkey": pc.fill_null(t["o_orderkey"], -1),
                "custkey": t["o_custkey"],
                "o_totalprice": pc.fill_null(t["o_totalprice"], 0.0),
                "c_name": pc.fill_null(t["c_name"], ""),
            }
        )

    return joined.map_batches(_coalesce, batch_format="pyarrow")


FULL_OUTER_SQL = """
SELECT COALESCE(o_orderkey, -1) AS o_orderkey,
       COALESCE(o_custkey, c_custkey) AS custkey,
       COALESCE(o_totalprice, 0.0) AS o_totalprice,
       COALESCE(c_name, '') AS c_name
FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 300000) o
FULL OUTER JOIN
     (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
  ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# multi-aggregate grouped stats with EXACT distributed variance: per
# event_type count / sum / min / max / variance, all derived from integer
# partials (count, sum of cents, sum of squared cents, min, max) that
# merge associatively — the textbook one-pass parallel-moments shape, but
# in int64 so the distributed merge equals DuckDB bit-for-bit (cents <=
# ~2^16, squares <= 2^32, int64 holds ~2^31 rows of them per group before
# overflow; var is computed once at the end as (n*ssq - s^2)/n^2 in
# float64 from the exact integers, then rounded 6dp).

def grouped_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(), "c": c})
        g["sq"] = g["c"] * g["c"]
        out = g.groupby("event_type").agg(
            n=("c", "size"), s=("c", "sum"), ssq=("sq", "sum"),
            mn=("c", "min"), mx=("c", "max"),
        ).reset_index()
        return out

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    # combine frame is category-sized x blocks — driver-safe always
    m = parts.groupby("event_type").agg(
        n=("n", "sum"), s=("s", "sum"), ssq=("ssq", "sum"),
        mn=("mn", "min"), mx=("mx", "max"),
    ).reset_index()
    n = m["n"].to_numpy(np.float64)
    s = m["s"].to_numpy(np.float64)
    ssq = m["ssq"].to_numpy(np.float64)
    out = pd.DataFrame(
        {
            "event_type": m["event_type"],
            "n": m["n"].astype("int64"),
            "sum_c": m["s"].astype("int64"),
            "min_c": m["mn"].astype("int64"),
            "max_c": m["mx"].astype("int64"),
            "var_c": np.round((n * ssq - s * s) / (n * n), 6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


GROUPED_STATS_SQL = """
WITH c AS (
    SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
), m AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS s,
           CAST(SUM(v * v) AS BIGINT) AS ssq,
           CAST(MIN(v) AS BIGINT) AS mn,
           CAST(MAX(v) AS BIGINT) AS mx
    FROM c GROUP BY event_type
)
SELECT event_type, n, s AS sum_c, mn AS min_c, mx AS max_c,
       ROUND((CAST(n AS DOUBLE) * ssq - CAST(s AS DOUBLE) * s)
             / (CAST(n AS DOUBLE) * n), 6) AS var_c
FROM m ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# rollup aggregate: GROUP BY ROLLUP(flag, status) in one streamed pass —
# arrow partials at the FINEST grain only (the same q1 integer-cents
# partial), then the super-aggregate levels are derived from the finest
# groups, which are category-product-sized (bounded), never row-sized.
# At 100 TB nothing changes: the rollup fan-out happens on the reduced
# table, so the wide input is scanned exactly once.

def rollup_sum(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(
            pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_to_even"),
            pa.int64(),
        )
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
            }
        )
        g = tb.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum")]
        )
        # select by NAME (key-vs-aggregate column order flips across
        # pyarrow majors; the q1 partial has the same note)
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "qty_c": g["qty_c_sum"],
            }
        )

    fine = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)["qty_c"]
        .sum()
    )
    lvl1 = fine.groupby("l_returnflag", as_index=False)["qty_c"].sum()
    lvl1["l_linestatus"] = "ALL"
    total = pd.DataFrame(
        {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
         "qty_c": [fine["qty_c"].sum()]}
    )
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out = out.rename(columns={"qty_c": "sum_qty_c"})
    out["sum_qty_c"] = out["sum_qty_c"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], kind="mergesort"
    ).reset_index(drop=True)[["l_returnflag", "l_linestatus", "sum_qty_c"]]


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# deterministic per-key uniform sample: k rows per group chosen by a
# Knuth-multiplicative hash of the row id — the reproducible replacement
# for random.sample in mixture building (re-runs and resumes pick the SAME
# rows, and the choice is independent of partitioning). Scale shape: each
# batch keeps its own k-smallest per key (partial top-k, output bounded by
# k x groups x blocks), then the identical kernel runs per complete group
# under the standard gate.

_PKS_K = 5


def _pks_block(df: pd.DataFrame, k: int = _PKS_K) -> pd.DataFrame:
    df = df.sort_values(["event_type", "h", "event_id"], kind="mergesort")
    return df.groupby("event_type", sort=False).head(k)


def per_key_sample(
    sf_dir: str, k: int = _PKS_K, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.uint64)
        # reduce mod 2^32 BEFORE the multiply: (a*c) mod 2^32 is unchanged
        # and the product then never wraps uint64, so the value matches the
        # oracle's HUGEINT arithmetic for the full int64 id range
        h = ((ids % np.uint64(1 << 32)) * np.uint64(2654435761)) % np.uint64(1 << 32)
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "event_id": ids.astype("int64"),
                "h": h.astype("int64"),
            }
        )
        return _pks_block(out, k)

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["event_type"], _pks_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


PER_KEY_SAMPLE_SQL = """
SELECT event_type, event_id,
       CAST(CAST(event_id AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT) AS h
FROM events
QUALIFY row_number() OVER (
    PARTITION BY event_type
    ORDER BY CAST(event_id AS HUGEINT) * 2654435761 % 4294967296, event_id
) <= 5
"""


# ---------------------------------------------------------------------------
# per-key cumulative window: running sum + previous-row pointer per user
# ordered by time — the classic sessionless "state so far" window (LAG +
# SUM ... ROWS UNBOUNDED PRECEDING). Values go through integer cents so
# distributed partials equal DuckDB bit-for-bit. Same gate as the battery
# trio: ONE hash shuffle on user_id co-locates each user's full history,
# then the per-block kernel sorts and cumsums vectorized (the per-key sort
# is within-block; nothing global sorts).

def _cumwin_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = df.groupby("user_id", sort=False)
    out = pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "cum_cents": g["cents"].cumsum().to_numpy(np.int64),
            "prev_event_id": g["event_id"].shift(1).fillna(-1).to_numpy(np.int64),
        }
    )
    return out


def cum_window(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.round(df.pop("value").to_numpy() * 100.0).astype(np.int64)
        return df

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _cumwin_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


CUM_WINDOW_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_cents,
       LAG(event_id, 1, -1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) AS prev_event_id
FROM events
"""


# ---------------------------------------------------------------------------
# approximate quantiles for UNBOUNDED domains: a 2-significant-decimal-digit
# ECDF sketch (token_percentiles' histogram doctrine works only when the
# value domain is small and integer; money/latency/score columns are not).
# Each value is truncated to its 2 leading decimal digits — a monotone,
# purely-integer/string bucketing with <= 10% relative error, at most 90
# buckets per decade, mergeable by count-sum, and reproducible EXACTLY in
# SQL (no log/pow float calls whose libm rounding could flip a bucket).
# The oracle checks the SKETCH, not the exact quantile — the hll/cms
# precedent: what's verified is that the distributed merge computes the
# same deterministic summary a sequential engine would.

def _sig2_bucket(cents: np.ndarray) -> np.ndarray:
    """Truncate positive int64 cents to 2 significant decimal digits via
    exact string arithmetic (vectorized; no float log)."""
    s = cents.astype("U20")
    lens = np.char.str_len(s)
    # astype("U2") truncates each decimal string to its first two chars
    lead2 = s.astype("U2").astype(np.int64)
    scale = 10 ** np.maximum(lens.astype(np.int64) - 2, 0)
    return np.where(lens >= 2, lead2 * scale, cents)


def approx_quantiles(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["value"])

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        b = _sig2_bucket(cents[cents >= 1])
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bkt": u, "c": c.astype("int64")})

    merged = ds.map_batches(_hist, batch_format="pandas").to_pandas()
    # bucket count is bounded (<= 90/decade x ~19 decades), so the combine
    # frame is sketch-sized no matter the input rows — driver-safe always
    h = merged.groupby("bkt", as_index=False)["c"].sum().sort_values("bkt")
    cum = h["c"].cumsum().to_numpy()
    vals = h["bkt"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    rows = []
    for p in (50, 90, 99):
        rank = (p * n + 99) // 100
        rows.append(
            {"p": p, "approx": int(vals[np.searchsorted(cum, rank)]) if n else 0,
             "n": n}
        )
    out = pd.DataFrame(rows)
    for c in ("p", "approx", "n"):
        out[c] = out[c].astype("int64")
    return out


APPROX_QUANTILES_SQL = """
WITH c AS (
    SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
    WHERE CAST(ROUND(value * 100) AS BIGINT) >= 1
), b AS (
    SELECT CASE WHEN length(CAST(v AS VARCHAR)) <= 2 THEN v
                ELSE CAST(substr(CAST(v AS VARCHAR), 1, 2) ||
                          repeat('0', length(CAST(v AS VARCHAR)) - 2) AS BIGINT)
           END AS bkt
    FROM c
), r AS (
    SELECT bkt, row_number() OVER (ORDER BY bkt) AS rn, COUNT(*) OVER () AS n
    FROM b
)
SELECT p, CAST(MAX(CASE WHEN rn = (p * n + 99) // 100 THEN bkt END) AS BIGINT)
          AS approx,
       CAST(MAX(n) AS BIGINT) AS n
FROM r CROSS JOIN (VALUES (CAST(50 AS BIGINT)), (90), (99)) t(p)
GROUP BY p ORDER BY p
"""


# ---------------------------------------------------------------------------
# pivot (long -> wide conditional aggregation): per-user integer-cents sum
# per event_type as COLUMNS. The category set is part of the op's contract
# (a pivot has a declared output schema — same reason SQL PIVOT wants the
# IN list); the main pass is the grouped-sum doctrine: partials at the
# (user, type) grain — the combine frame is users x types, NOT row-sized —
# then a vectorized pivot per complete user group, on the driver under the
# gate or after ONE hash shuffle on user_id above it.

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_sum(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "event_type": df["event_type"].to_numpy(),
                "cents": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        return g.groupby(["user_id", "event_type"], as_index=False)["cents"].sum()

    def _pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["cents"].sum()
        wide = g.pivot_table(
            index="user_id", columns="event_type", values="cents",
            aggfunc="sum", fill_value=0,
        )
        for t in _PIVOT_TYPES:  # fixed schema even if a type is absent
            if t not in wide.columns:
                wide[t] = 0
        wide = wide[list(_PIVOT_TYPES)].astype("int64")
        wide.columns = [f"{t}_c" for t in _PIVOT_TYPES]
        return wide.reset_index()

    parts = ds.map_batches(_partial, batch_format="pandas")
    out = _gated_grouped(
        parts, ["user_id"], _pivot_block, _table_rows(sf_dir, "events"),
        driver_threshold,
    )
    if isinstance(out, rd.Dataset):
        return out
    return out.sort_values("user_id").reset_index(drop=True)


PIVOT_SQL = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS click_c,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS error_c,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS purchase_c,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS signup_c,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN CAST(ROUND(value*100) AS BIGINT) END), 0) AS BIGINT) AS view_c
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# connected components over the similarity graph: vec_id -> min id of its
# cosine>=0.4 component. The SECOND iterative graph op (pagerank's sibling),
# built entirely from the dedup module's gated label machinery: driver
# union-find under the pair bound, ray.put-broadcast or distributed-join
# label application, and the two-shuffles-per-round min-label propagation
# loop above it — nothing new to maintain, same scale contract
# (everything is sized by the PAIR GRAPH, never the corpus). Pair
# enumeration reuses cosine_pairs_exact (the exact baseline; at corpus
# scale the LSH-bucketed embedding_dedup path generates candidates
# instead, exactly like minhash's LSH feeds _label_dataset).

def connected_components(
    sf_dir: str, pair_graph_driver_max: int | None = None
) -> rd.Dataset:
    from .dedup import _PAIR_GRAPH_DRIVER_MAX, _label_dataset

    if pair_graph_driver_max is None:
        pair_graph_driver_max = _PAIR_GRAPH_DRIVER_MAX
    pairs = cosine_pairs_exact(sf_dir)
    ids = _read(sf_dir, "embeddings", ["vec_id"])
    labeled = _label_dataset(
        ids, "vec_id",
        list(zip(pairs["a"].tolist(), pairs["b"].tolist())),
        pair_graph_driver_max=pair_graph_driver_max,
    )

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": t.column("vec_id"), "component": t.column("dup_group")}
        )

    return labeled.map_batches(_rename, batch_format="pyarrow")


CONNECTED_COMPONENTS_SQL = """
WITH RECURSIVE p AS (
    SELECT x.vec_id AS a, y.vec_id AS b
    FROM embeddings x JOIN embeddings y
      ON x.vec_id < y.vec_id
     AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                CAST(y.embedding AS DOUBLE[])) >= 0.4
), e AS (
    SELECT a AS node, b AS nbr FROM p
    UNION ALL
    SELECT b AS node, a AS nbr FROM p
), walk(node, lab) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.node, w.lab FROM walk w JOIN e ON e.nbr = w.node
)
SELECT node AS vec_id, CAST(MIN(lab) AS BIGINT) AS component
FROM walk GROUP BY node ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# unicode text normalization: the cleanup pass every web-scale corpus runs
# before tokenization/dedup (reference parse output is raw page text —
# app/pipeline/pipeline.py standardize() renames columns but never cleans
# the text itself; this is the training-data-prep extension). NFC-compose,
# lowercase, collapse whitespace runs, trim — all four as pyarrow compute
# kernels over zero-copy Arrow batches (no pandas round trip), each batch
# independent, so the stage streams at any scale.


def normalize_text(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _norm(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_normalize(txt, form="NFC")), r"\s+", " "
            )
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "norm_text": norm,
                "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
            }
        )

    return docs.map_batches(_norm, batch_format="pyarrow")


NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                           '\s+', ' ', 'g')) AS norm_text,
       CAST(length(trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                                       '\s+', ' ', 'g'))) AS BIGINT)
           AS n_chars_norm
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# inverted index: term -> ordered posting list (the retrieval-side dual of
# term_doc_freq). Tokenization matches term_doc_freq (\w+, lowercased,
# distinct per doc). Per-batch distinct (term, doc_id) partials stream into
# ONE hash shuffle on term; each block then holds every posting for its
# terms, so the sort + join-to-string is in-block and the per-term Python
# string join is amortized across the whole block (the battery doctrine).
# Top-k selection by document frequency runs distributed (Dataset
# sort+limit) above the driver bound — vocabulary is the only driver-sized
# term and only on the small-side branch.


def inverted_index(
    sf_dir: str, k: int = 50, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = df[["doc_id"]].join(words.rename("term")).explode("term")
        return e.dropna().drop_duplicates()

    pairs = docs.map_batches(_pairs, batch_format="pandas")

    def _post_block(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype=object),
                    "n_docs": pd.Series(dtype="int64"),
                    "postings": pd.Series(dtype=object),
                }
            )
        df = df.sort_values(["term", "doc_id"], kind="mergesort")
        df["doc_str"] = df["doc_id"].astype(str)
        g = df.groupby("term", as_index=False, sort=True).agg(
            n_docs=("doc_id", "size"), postings=("doc_str", ",".join)
        )
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    posted = hash_partitioned_map_batches(pairs, ["term"], _post_block)
    if _table_rows(sf_dir, "documents") <= driver_threshold:
        out = (
            posted.to_pandas()
            .sort_values(["n_docs", "term"], ascending=[False, True], kind="mergesort")
            .head(k)
        )
    else:
        out = (
            posted.sort(["n_docs", "term"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )
    return out.reset_index(drop=True)


INVERTED_INDEX_SQL = r"""
WITH w AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS term
    FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM w GROUP BY term
ORDER BY n_docs DESC, term
LIMIT 50
"""


# ---------------------------------------------------------------------------
# quality-model scoring: batched linear-classifier inference over per-doc
# character-class features — the deterministic stand-in for the quality
# classifiers (fastText / logreg) LLM corpora are filtered with. The weight
# vector is broadcast ONCE via ray.put and read inside the stage (the
# model-inference plumbing: params ship to each worker once, never per
# batch). Features are single integer divisions and the weights are exact
# powers of two, so every product is rounding-free and the fixed-order sum
# is bit-identical to the SQL's — the keep boolean therefore agrees exactly.
# Threshold 0.456 straddles the corpus median so the filter provably bites.

_QMS_WEIGHTS = np.array([0.5, -0.25, 0.25], dtype=np.float64)  # alpha, digit, ws
_QMS_THRESHOLD = 0.456


def quality_model_score(sf_dir: str) -> rd.Dataset:
    import ray

    wref = ray.put(_QMS_WEIGHTS)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _score(t: pa.Table, _wref=wref) -> pa.Table:
        import ray as _ray

        w = _ray.get(_wref)
        txt = pc.fill_null(t.column("text"), "")
        n = pc.cast(pc.utf8_length(txt), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        n_alpha = pc.count_substring_regex(txt, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_digit = pc.count_substring_regex(txt, "[0-9]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_space = pc.count_substring(txt, " ").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_frac = np.where(n > 0, n_alpha / n, 0.0)
            digit_frac = np.where(n > 0, n_digit / n, 0.0)
            ws_frac = np.where(n > 0, n_space / n, 0.0)
        # fixed evaluation order (left to right), dyadic weights: bit-exact
        # vs the SQL expression of the same shape
        score = w[0] * alpha_frac + w[1] * digit_frac + w[2] * ws_frac
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "score": pa.array(score, pa.float64()),
                "keep": pa.array(score >= _QMS_THRESHOLD),
            }
        )

    return docs.map_batches(_score, batch_format="pyarrow")


QUALITY_MODEL_SQL = r"""
WITH f AS (
    SELECT doc_id,
           CAST(length(COALESCE(text, '')) AS DOUBLE) AS n,
           CAST(length(regexp_replace(COALESCE(text, ''), '[^a-zA-Z]', '', 'g'))
                AS DOUBLE) AS n_alpha,
           CAST(length(regexp_replace(COALESCE(text, ''), '[^0-9]', '', 'g'))
                AS DOUBLE) AS n_digit,
           CAST(length(COALESCE(text, ''))
                - length(replace(COALESCE(text, ''), ' ', '')) AS DOUBLE)
               AS n_space
    FROM documents
), s AS (
    SELECT doc_id,
           0.5 * (CASE WHEN n > 0 THEN n_alpha / n ELSE 0.0 END)
           + (-0.25) * (CASE WHEN n > 0 THEN n_digit / n ELSE 0.0 END)
           + 0.25 * (CASE WHEN n > 0 THEN n_space / n ELSE 0.0 END) AS score
    FROM f
)
SELECT doc_id, score, score >= 0.456 AS keep FROM s ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# URL canonicalization: the crawler-core normalization exposed as a gate
# query — the RAY SIDE CALLS THE EXACT VECTORIZED KERNEL THE CRAWL STAMPS
# EVERY FRONTIER ROW WITH (synth.canonical_urls, the widest pass of every
# epoch), so the oracle value-checks the engine's own hot-path function,
# not a test-only reimplementation. Input URLs are derived deterministically
# from the documents table in both the Ray code and the SQL (upper-case
# scheme/host, trailing slash every 3rd doc, #fragment every 5th), so the
# kernel's three rules (lowercase scheme+host, strip fragment, rstrip /)
# all provably fire.


def url_canonicalize(sf_dir: str) -> rd.Dataset:
    from ..synth import canonical_urls

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        url = (
            "HTTP://"
            + df["source"].str.upper()
            + ".Example.COM/Page/"
            + did.astype(str)
            + np.where(did % 3 == 0, "/", "")
            + np.where(did % 5 == 0, "#frag", "")
        )
        return pd.DataFrame(
            {"doc_id": did, "url": url, "canon_url": canonical_urls(url)}
        )

    return docs.map_batches(_canon, batch_format="pandas")


URL_CANONICALIZE_SQL = r"""
WITH u AS (
    SELECT doc_id,
           'HTTP://' || upper(source) || '.Example.COM/Page/'
               || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
    FROM documents
), c AS (
    SELECT doc_id, url,
           CASE WHEN strpos(url, '#') > 0
                THEN substr(url, 1, strpos(url, '#') - 1) ELSE url END AS nofrag
    FROM u
), p AS (
    SELECT doc_id, url,
           lower(substr(nofrag, 1, strpos(nofrag, '://') - 1)) AS scheme,
           substr(nofrag, strpos(nofrag, '://') + 3) AS rest
    FROM c
), h AS (
    SELECT doc_id, url, scheme,
           CASE WHEN strpos(rest, '/') > 0
                THEN lower(substr(rest, 1, strpos(rest, '/') - 1))
                ELSE lower(rest) END AS host,
           CASE WHEN strpos(rest, '/') > 0
                THEN substr(rest, strpos(rest, '/')) ELSE '' END AS path
    FROM p
)
SELECT doc_id, url, rtrim(scheme || '://' || host || path, '/') AS canon_url
FROM h ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# skew-aware join: the "salt hot keys" doctrine as a standalone operator.
# The probe side's join key is deliberately skewed (75% of lineitem rows
# concentrate onto 40 keys — the utility-outage shape where a handful of
# giant EMCs dominate the feed). Gated like every join in the engine:
# broadcast dict under the dim bound; above it, a SALTED distributed hash
# join — per-key counts (dim-cardinality-sized) pick the hot keys, the
# probe side salts hot rows deterministically into _SKEW_SALTS sub-keys,
# the build side replicates ONLY its hot rows once per salt, and the join
# runs on (key, salt) so no single reducer sees a hot key's full row mass.
# Result is aggregated per nation, so both branches must agree bit-exactly
# on integer sums.

_SKEW_SALTS = 8
_SKEW_HOT_FACTOR = 4  # hot = count > factor * mean


def _skew_key(l_suppkey: np.ndarray) -> np.ndarray:
    """75%-of-rows-onto-40-keys deterministic skew mapping (mirrored in SQL)."""
    k = l_suppkey.astype(np.int64)
    return np.where(k % 4 != 0, (k % 40) + 1, k)


def skewed_join(
    sf_dir: str, broadcast_threshold: int = 1_000_000, salts: int = _SKEW_SALTS
) -> pd.DataFrame:
    """salts=1 degenerates to the naive (unsalted) distributed hash join —
    the ablation baseline the salted path is measured against."""
    import ray

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"])
    n_sup = _table_rows(sf_dir, "supplier")

    def _probe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jk": _skew_key(df["l_suppkey"].to_numpy()),
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "l_linenumber": df["l_linenumber"].to_numpy(np.int64),
                "l_quantity": df["l_quantity"].to_numpy(np.int64),
            }
        )

    probe = li.map_batches(_probe, batch_format="pandas")

    if n_sup <= broadcast_threshold:
        sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
        nat = dict(zip(sup["s_suppkey"].astype("int64"), sup["s_nationkey"].astype("int64")))

        def _agg(df: pd.DataFrame, _m=nat) -> pd.DataFrame:
            df = df.assign(s_nationkey=df["jk"].map(_m)).dropna(subset=["s_nationkey"])
            g = df.groupby("s_nationkey", as_index=False).agg(
                n_rows=("jk", "size"), sum_qty=("l_quantity", "sum")
            )
            return g.astype({"s_nationkey": "int64", "n_rows": "int64", "sum_qty": "int64"})

        parts = probe.map_batches(_agg, batch_format="pandas").to_pandas()
    else:
        # per-key counts: dim-cardinality-sized, combine on the driver
        def _kcount(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("jk", as_index=False).agg(n=("jk", "size"))

        kc = probe.map_batches(_kcount, batch_format="pandas").to_pandas()
        kc = kc.groupby("jk", as_index=False)["n"].sum()
        hot = set(
            kc.loc[kc["n"] > _SKEW_HOT_FACTOR * kc["n"].mean(), "jk"].astype("int64")
        )
        hot_ref = ray.put(hot)

        def _salt_probe(df: pd.DataFrame, _h=hot_ref, _s=salts) -> pd.DataFrame:
            hs = ray.get(_h)
            ish = df["jk"].isin(hs).to_numpy()
            salt = np.where(
                ish,
                (df["l_orderkey"].to_numpy(np.int64) * 131
                 + df["l_linenumber"].to_numpy(np.int64)) % _s,
                0,
            )
            return df.assign(salt=salt.astype("int64"))

        salted_probe = probe.map_batches(_salt_probe, batch_format="pandas")

        sup_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

        def _replicate(df: pd.DataFrame, _h=hot_ref, _s=salts) -> pd.DataFrame:
            hs = ray.get(_h)
            df = df.astype({"s_suppkey": "int64", "s_nationkey": "int64"})
            cold = df[~df["s_suppkey"].isin(hs)].assign(salt=np.int64(0))
            hotr = df[df["s_suppkey"].isin(hs)]
            if len(hotr):
                hotr = hotr.loc[hotr.index.repeat(_s)].reset_index(drop=True)
                hotr["salt"] = np.tile(
                    np.arange(_s, dtype=np.int64), len(hotr) // _s
                )
            else:
                hotr = cold.iloc[0:0]
            return pd.concat([cold, hotr], ignore_index=True)

        build = sup_ds.map_batches(_replicate, batch_format="pandas")
        joined = salted_probe.join(
            build, join_type="inner", num_partitions=8,
            on=("jk", "salt"), right_on=("s_suppkey", "salt"),
        )

        def _agg2(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("s_nationkey", as_index=False).agg(
                n_rows=("jk", "size"), sum_qty=("l_quantity", "sum")
            )
            return g.astype({"s_nationkey": "int64", "n_rows": "int64", "sum_qty": "int64"})

        parts = joined.map_batches(_agg2, batch_format="pandas").to_pandas()

    out = parts.groupby("s_nationkey", as_index=False)[["n_rows", "sum_qty"]].sum()
    return (
        out.astype({"s_nationkey": "int64", "n_rows": "int64", "sum_qty": "int64"})
        .sort_values("s_nationkey")
        .reset_index(drop=True)
    )


SKEWED_JOIN_SQL = """
WITH probe AS (
    SELECT CASE WHEN l_suppkey % 4 != 0 THEN (l_suppkey % 40) + 1
                ELSE l_suppkey END AS jk,
           l_quantity
    FROM lineitem
)
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM probe JOIN supplier ON jk = s_suppkey
GROUP BY s_nationkey ORDER BY s_nationkey
"""


# ---------------------------------------------------------------------------
# global NTILE: equal-depth bucket assignment over a total order, WITHOUT
# a global sort. A first cut reused pack_shards' sort+materialize rank
# primitive and measured 24.7x wall at 10x rows (15M-row all-to-all sort
# dominated) — NTILE only needs the n-1 CUT POINTS of the order, not the
# order itself, so the rewrite finds them with four streaming map_batches
# passes and ZERO shuffles: (A) content-keyed price sample -> range
# boundaries, (B) per-range histogram (driver holds <=R+1 counters) locates
# which range contains each cut rank, (C) fetch ONLY the cut ranges
# (~(n-1) x N/R rows) and resolve the exact (price, orderkey) cut
# composites by local sort, (D) assign bucket = 1 + #cuts <= row via n-1
# vectorized composite compares per batch. Assumes prices are not
# pathologically tied (a single price carrying >> N/R rows inflates the
# driver fetch — the fetch size is asserted, not silently absorbed).

_NTILE_N = 4


def _ntile_of(rank: np.ndarray, N: int, n: int) -> np.ndarray:
    """DuckDB NTILE semantics: first N%n buckets hold ceil(N/n) rows."""
    q, rem = divmod(N, n)
    boundary = (q + 1) * rem
    q_safe = max(q, 1)
    return np.where(
        rank < boundary, rank // (q + 1), rem + (rank - boundary) // q_safe
    ).astype(np.int64) + 1


def ntile_buckets(
    sf_dir: str, n: int = _NTILE_N, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame | rd.Dataset:
    import ray

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    N = _table_rows(sf_dir, "orders")

    if N <= driver_threshold:
        df = orders.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        df["bucket"] = _ntile_of(np.arange(N, dtype=np.int64), N, n)
        return (
            df[["o_orderkey", "bucket"]]
            .astype({"o_orderkey": "int64", "bucket": "int64"})
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )

    R = 512  # histogram ranges; cut-range fetch is ~(n-1) * N/R rows

    # pass A: deterministic content-keyed price sample (parallelism-
    # independent: top-64 rows per batch by affine hash of o_orderkey)
    def _sample(df: pd.DataFrame) -> pd.DataFrame:
        h = df["o_orderkey"].to_numpy().astype(np.uint64) * _SAMPLE_A + _SAMPLE_B
        idx = np.argsort(h, kind="stable")[:64]
        return df.iloc[idx][["o_totalprice"]]

    sample = np.sort(
        orders.map_batches(_sample, batch_format="pandas")
        .to_pandas()["o_totalprice"]
        .to_numpy(np.float64)
    )
    pick = np.linspace(0, len(sample) - 1, min(R - 1, len(sample))).astype(np.int64)
    bounds = np.unique(sample[pick])  # range r = prices in (bounds[r-1], bounds[r]]

    # pass B: per-range histogram; driver combine is <= len(bounds)+1 counters
    def _hist(df: pd.DataFrame, _b=bounds) -> pd.DataFrame:
        rid = np.searchsorted(_b, df["o_totalprice"].to_numpy(np.float64), side="right")
        u, c = np.unique(rid, return_counts=True)
        return pd.DataFrame({"rid": u.astype(np.int64), "cnt": c.astype(np.int64)})

    hist = (
        orders.map_batches(_hist, batch_format="pandas")
        .to_pandas()
        .groupby("rid")["cnt"]
        .sum()
        .reindex(range(len(bounds) + 1), fill_value=0)
    )
    counts = hist.to_numpy(np.int64)
    cumex = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())

    # cut rank i (0-based global rank of the FIRST row of bucket i+1)
    q, rem = divmod(total, n)
    cut_ranks = np.array(
        [(q + 1) * min(i, rem) + q * max(0, i - rem) for i in range(1, n)],
        dtype=np.int64,
    )
    cut_range_ids = np.searchsorted(cumex, cut_ranks, side="right") - 1
    need = sorted(set(int(r) for r in cut_range_ids))
    fetch_bound = 64 * (n - 1) * max(total // max(len(bounds), 1), 1)
    assert counts[need].sum() <= max(fetch_bound, 2_000_000), (
        "pathological price ties inflate the cut-range fetch; "
        "raise R or fall back to the sorted-rank path"
    )

    # pass C: fetch ONLY the cut ranges, resolve exact cut composites
    def _fetch(df: pd.DataFrame, _b=bounds, _need=frozenset(need)) -> pd.DataFrame:
        rid = np.searchsorted(_b, df["o_totalprice"].to_numpy(np.float64), side="right")
        m = np.isin(rid, list(_need))
        out = df.loc[m, ["o_totalprice", "o_orderkey"]].copy()
        out["rid"] = rid[m]
        return out

    cut_rows = orders.map_batches(_fetch, batch_format="pandas").to_pandas()
    cuts: list[tuple[float, int]] = []
    for rank, rid in zip(cut_ranks, cut_range_ids):
        grp = cut_rows[cut_rows["rid"] == rid].sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        )
        row = grp.iloc[int(rank - cumex[rid])]
        cuts.append((float(row["o_totalprice"]), int(row["o_orderkey"])))
    cuts_ref = ray.put(cuts)

    # pass D: bucket = 1 + number of cuts <= (price, orderkey), composite
    def _assign(df: pd.DataFrame, _ref=cuts_ref) -> pd.DataFrame:
        cs = ray.get(_ref)
        p = df["o_totalprice"].to_numpy(np.float64)
        k = df["o_orderkey"].to_numpy(np.int64)
        bucket = np.ones(len(df), dtype=np.int64)
        for cp, ck in cs:
            bucket += ((p > cp) | ((p == cp) & (k >= ck))).astype(np.int64)
        return pd.DataFrame({"o_orderkey": k, "bucket": bucket})

    # output is row-sized — stream it out as a Dataset, never driver-collect
    return orders.map_batches(_assign, batch_format="pandas")


NTILE_SQL = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS bucket
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# OHLC windowed resample: open/high/low/close per tumbling hour — the
# first/last-by-time aggregate family (tumbling_window counts, this one
# carries VALUES picked by a composite (ts, event_id) order, which plain
# min/max can't see). Partials are fully mergeable: each batch reduces to
# one row per window carrying (open_ts, open_eid, open, close_ts,
# close_eid, close, low, high, n); merging re-applies the same composite
# argmin/argmax — associative, so the gated combine (driver under the
# bound, ONE hash shuffle on window_start above) is order-independent.


def _ohlc_partial(df: pd.DataFrame) -> pd.DataFrame:
    cols = {
        "window_start": "datetime64[us]", "open_ts": "datetime64[us]",
        "open_eid": "int64", "open": "float64", "close_ts": "datetime64[us]",
        "close_eid": "int64", "close": "float64", "low": "float64",
        "high": "float64", "n_events": "int64",
    }
    if not len(df):
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    df = df.sort_values(["ts", "event_id"], kind="mergesort")
    w = df["ts"].dt.floor("h")
    g = df.groupby(w.rename("window_start"), sort=True)
    out = pd.DataFrame(
        {
            "open_ts": g["ts"].first(), "open_eid": g["event_id"].first(),
            "open": g["value"].first(), "close_ts": g["ts"].last(),
            "close_eid": g["event_id"].last(), "close": g["value"].last(),
            "low": g["value"].min(), "high": g["value"].max(),
            "n_events": g["value"].size(),
        }
    ).reset_index()
    return out.astype(cols)


def _ohlc_merge(df: pd.DataFrame) -> pd.DataFrame:
    if not len(df):
        return df
    a = df.sort_values(["window_start", "open_ts", "open_eid"], kind="mergesort")
    ga = a.groupby("window_start", sort=True)
    d = df.sort_values(["window_start", "close_ts", "close_eid"], kind="mergesort")
    gd = d.groupby("window_start", sort=True)
    out = pd.DataFrame(
        {
            "open_ts": ga["open_ts"].first(), "open_eid": ga["open_eid"].first(),
            "open": ga["open"].first(), "close_ts": gd["close_ts"].last(),
            "close_eid": gd["close_eid"].last(), "close": gd["close"].last(),
            "low": ga["low"].min(), "high": ga["high"].max(),
            "n_events": ga["n_events"].sum().astype("int64"),
        }
    ).reset_index()
    return out


def ohlc_window(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "ts", "value"])
    parts = ds.map_batches(_ohlc_partial, batch_format="pandas")
    if _table_rows(sf_dir, "events") <= driver_threshold:
        merged = _ohlc_merge(parts.to_pandas())
    else:
        merged = _ohlc_merge(
            hash_partitioned_map_batches(parts, ["window_start"], _ohlc_merge)
            .to_pandas()
        )
    out = merged[["window_start", "open", "high", "low", "close", "n_events"]]
    return out.sort_values("window_start").reset_index(drop=True)


OHLC_SQL = """
WITH w AS (
    SELECT date_trunc('hour', ts) AS window_start, ts, event_id, value
    FROM events
), o AS (
    SELECT window_start, value,
           row_number() OVER (PARTITION BY window_start
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY window_start
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM w
)
SELECT window_start,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM o GROUP BY window_start ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# percentile-clipped corpus filter: drop documents above the EXACT p99
# token count — the outlier-trim every corpus runs before packing (a
# 10M-token pathological doc ruins a shard). The percentile comes from the
# token_percentiles bounded-domain histogram (token counts are small ints,
# so the distributed histogram is exact, <= domain-size counters on the
# driver, no sort); the filter is then one streamed vectorized pass. Same
# ceil-rank formula as TOKEN_PCTL_SQL so Ray and DuckDB pick the identical
# cut value.


def clip_outliers(sf_dir: str, p: int = 99) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        n_words = df["text"].fillna("").str.split(" ").str.len().to_numpy(np.int64)
        v, c = np.unique(n_words, return_counts=True)
        return pd.DataFrame({"v": v, "c": c})

    parts = docs.map_batches(_hist, batch_format="pandas").to_pandas()
    if "v" not in parts.columns:
        parts = pd.DataFrame({"v": pd.Series(dtype="int64"),
                              "c": pd.Series(dtype="int64")})
    hist = parts.groupby("v", as_index=False)["c"].sum().sort_values("v")
    n = int(hist["c"].sum())
    if n == 0:
        return docs.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "token_count": pd.Series(dtype="int64")}
            ),
            batch_format="pandas",
        )
    rank = (p * n + 99) // 100  # ceil(p*n/100), exact — mirrors the SQL
    cut = int(hist["v"].to_numpy()[np.searchsorted(hist["c"].cumsum().to_numpy(), rank)])

    def _filter(df: pd.DataFrame, _cut=cut) -> pd.DataFrame:
        tc = df["text"].fillna("").str.split(" ").str.len().to_numpy(np.int64)
        keep = tc <= _cut
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64)[keep], "token_count": tc[keep]}
        )

    return docs.map_batches(_filter, batch_format="pandas")


CLIP_OUTLIERS_SQL = """
WITH t AS (
    SELECT doc_id, CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
               AS token_count
    FROM documents
), k AS (
    SELECT token_count AS v, row_number() OVER (ORDER BY token_count) AS rn,
           COUNT(*) OVER () AS n
    FROM t
), p AS (
    SELECT MIN(v) AS p99 FROM k WHERE rn >= (99 * n + 99) // 100
)
SELECT doc_id, token_count FROM t, p WHERE token_count <= p.p99
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# order-independent table checksum: one 63-bit scalar summarizing the whole
# corpus — the cheap distributed-equality probe (resume-equals-uninterrupted
# runs, replica divergence, migration smoke checks) that doesn't require
# shipping or sorting any rows. Each row hashes to the first 60 bits of
# md5(doc_id|text); the checksum is the plain SUM of those mod 2^63-1, so
# partial sums merge associatively and commutatively — block order,
# parallelism and batch boundaries can't change it. The per-row hash is
# DuckDB's md5_number_lower (= md5 digest bytes 8..16, little-endian), so
# the oracle recomputes it natively.


def table_checksum(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        keys = (
            df["doc_id"].astype("int64").astype(str)
            + "|"
            + df["text"].fillna("")
        )
        s = 0
        for k in keys:  # md5 has no vectorized kernel; bounded by batch size
            s += int.from_bytes(
                hashlib.md5(k.encode("utf8")).digest()[8:16], "little"
            )
        return pd.DataFrame({"part": [s], "cnt": [len(df)]})

    parts = docs.map_batches(_partial, batch_format="pandas").to_pandas()
    total = int(parts["part"].astype(object).sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "checksum": pd.array([total % (2**63 - 1)], dtype="int64"),
            "n_rows": pd.array([int(parts["cnt"].sum()) if len(parts) else 0],
                               dtype="int64"),
        }
    )


TABLE_CHECKSUM_SQL = """
SELECT CAST(
           sum(CAST(md5_number_lower(
               CAST(doc_id AS VARCHAR) || '|' || COALESCE(text, '')
           ) AS HUGEINT))
           % CAST(9223372036854775807 AS HUGEINT)
       AS BIGINT) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents
"""


# ---------------------------------------------------------------------------
# bounded-frame rolling window: per-user sum/avg over ROWS BETWEEN
# 3 PRECEDING AND CURRENT ROW — the bounded cousin of cum_window's
# unbounded frame (a bounded frame needs the lagged prefix subtracted, not
# just the running total). Same _gated_grouped shape: driver under the
# bound, ONE hash shuffle on user_id above it; the block kernel is
# cumsum-minus-group-shifted-cumsum, fully vectorized. Values go through
# the integer-cents trick so the rolling sums are exact and the average is
# ONE float division in the same operand order as the SQL.

_ROLL_FRAME = 4  # current row + 3 preceding


def _rollwin_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = df.groupby("user_id", sort=False)
    cs = g["cents"].cumsum()
    df = df.assign(_cs=cs)
    lag = df.groupby("user_id", sort=False)["_cs"].shift(_ROLL_FRAME)
    roll = (cs - lag.fillna(0)).to_numpy(np.int64)
    n_in_frame = np.minimum(
        g.cumcount().to_numpy(np.int64) + 1, _ROLL_FRAME
    )
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "roll_cents": roll,
            "roll_avg_cents": roll.astype(np.float64) / n_in_frame,
        }
    )


def rolling_window(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.round(df.pop("value").to_numpy() * 100.0).astype(np.int64)
        return df

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _rollwin_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


ROLLING_WINDOW_SQL = """
WITH t AS (
    SELECT event_id, user_id, ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_id, user_id,
       CAST(SUM(cents) OVER w4 AS BIGINT) AS roll_cents,
       CAST(SUM(cents) OVER w4 AS DOUBLE) / COUNT(*) OVER w4
           AS roll_avg_cents
FROM t
WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# global percent_rank: every row's exact global rank over a total order,
# WITHOUT a global sort — the row-sized sibling of ntile_buckets' cut-point
# trick. Sampled price bounds split the order into ~512 contiguous ranges;
# a histogram pass gives each range its exact global rank BASE (driver
# holds <= R counters); then ONE hash shuffle on range id co-locates each
# range and the block kernel ranks locally (composite sort + cumcount) and
# adds the base. Compare: Ray's sort() is a full range-shuffle PLUS block
# re-sort and materialize; this is one bounded shuffle and nothing else.

def percent_rank(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    N = _table_rows(sf_dir, "orders")
    denom = float(N - 1) if N > 1 else 1.0

    if N <= driver_threshold:
        df = orders.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        rank = np.arange(N, dtype=np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "pr": rank.astype(np.float64) / denom,
            }
        ).sort_values("o_orderkey").reset_index(drop=True)

    # sampled bounds -> range id per row (reuses ntile's pass A/B shapes)
    def _sample(df: pd.DataFrame) -> pd.DataFrame:
        h = df["o_orderkey"].to_numpy().astype(np.uint64) * _SAMPLE_A + _SAMPLE_B
        idx = np.argsort(h, kind="stable")[:64]
        return df.iloc[idx][["o_totalprice"]]

    sample = np.sort(
        orders.map_batches(_sample, batch_format="pandas")
        .to_pandas()["o_totalprice"]
        .to_numpy(np.float64)
    )
    pick = np.linspace(0, len(sample) - 1, min(511, len(sample))).astype(np.int64)
    bounds = np.unique(sample[pick])

    def _rid(df: pd.DataFrame, _b=bounds) -> pd.DataFrame:
        rid = np.searchsorted(_b, df["o_totalprice"].to_numpy(np.float64), side="right")
        return pd.DataFrame(
            {
                "rid": rid.astype(np.int64),
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_totalprice": df["o_totalprice"].to_numpy(np.float64),
            }
        )

    with_rid = orders.map_batches(_rid, batch_format="pandas")

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["rid"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"rid": u, "cnt": c.astype(np.int64)})

    hist = (
        with_rid.map_batches(_hist, batch_format="pandas")
        .to_pandas()
        .groupby("rid")["cnt"]
        .sum()
        .reindex(range(len(bounds) + 1), fill_value=0)
    )
    base = np.concatenate([[0], np.cumsum(hist.to_numpy(np.int64))[:-1]])

    def _rank_block(df: pd.DataFrame, _base=base, _d=denom) -> pd.DataFrame:
        df = df.sort_values(
            ["rid", "o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        local = df.groupby("rid", sort=False).cumcount().to_numpy(np.int64)
        rank = _base[df["rid"].to_numpy(np.int64)] + local
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "pr": rank.astype(np.float64) / _d,
            }
        )

    return hash_partitioned_map_batches(with_rid, ["rid"], _rank_block)


PERCENT_RANK_SQL = """
SELECT o_orderkey,
       percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# k-means clustering: Lloyd's algorithm over the embeddings table with
# FIXED iterations and deterministic init — the corpus-clustering step
# (topic bucketing, dedup-block seeding, mixture construction) expressed so
# a distributed run is BIT-EXACT against sequential SQL. The float trap is
# the centroid update: distributed f64 sums are order-dependent, so the
# whole algorithm runs on an exact integer grid — components quantize to
# floor(v * 1e6) (floor has no tie semantics, unlike round), distances are
# exact int64 sums (<= 64 * (4e6)^2 ~ 1e15, well inside int64), and the
# centroid update is an exact integer SUM + TRUNCATING division (DuckDB's
# `//` truncates toward zero; _trunc_div mirrors it). Iteration shape is
# the pagerank doctrine: iters+1 streaming passes, centroids broadcast per
# pass, driver state = k x dim ints + k counts, nothing row-sized.

_KM_K = 4
_KM_ITERS = 2
_KM_SCALE = 1_000_000


def _trunc_div(a: np.ndarray, b: int) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB // semantics;
    Python/numpy floor-divide rounds toward -inf instead)."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def _km_quant(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = df["vec_id"].to_numpy(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, np.floor(mat * _KM_SCALE).astype(np.int64)


def _km_assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # exact integer squared distances; argmin ties break to the smallest
    # centroid index (np.argmin picks the first minimum — same as the
    # SQL's ORDER BY d2, cid)
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int64)


def kmeans_clusters(
    sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS
) -> rd.Dataset:
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # deterministic init: the k smallest vec_ids (tiny sort+limit)
    seed = ds.sort("vec_id").limit(k).to_pandas()
    _, cents = _km_quant(seed)

    dim = cents.shape[1]
    for _ in range(iters):
        cref = ray.put(cents)

        def _partial(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
            c = ray.get(_c)
            ids, q = _km_quant(df)
            a = _km_assign(q, c)
            rows = []
            for cid in np.unique(a):
                m = a == cid
                rows.append(
                    {"cid": int(cid), "cnt": int(m.sum()),
                     **{f"s{j}": int(v) for j, v in enumerate(q[m].sum(axis=0))}}
                )
            return pd.DataFrame(rows)

        parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
        # driver combine: k x (dim+1) integers — constant in the corpus size
        # (int64 sums cover ~1e12 rows at this scale; beyond that the
        # per-cluster sums would shard, same as the HLL register doctrine)
        g = parts.groupby("cid").sum()
        new = cents.copy()
        for cid, row in g.iterrows():
            n = int(row["cnt"])
            if n > 0:
                s = row[[f"s{j}" for j in range(dim)]].to_numpy(np.int64)
                new[int(cid)] = _trunc_div(s, n)
        cents = new

    cref = ray.put(cents)

    def _final(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
        c = ray.get(_c)
        ids, q = _km_quant(df)
        return pd.DataFrame({"vec_id": ids, "cluster": _km_assign(q, c)})

    return ds.map_batches(_final, batch_format="pandas")


def _kmeans_sql(k: int = _KM_K, iters: int = _KM_ITERS) -> str:
    """Unrolled-CTE mirror (the pagerank doctrine): quantize, init from the
    k smallest vec_ids, then per iteration an assign CTE (exact integer
    distances, ties to smallest cid) and an update CTE (integer SUM //
    COUNT, empty clusters keep the previous centroid)."""
    sql = [f"""
WITH q AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS j,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE})
                AS BIGINT) AS v
    FROM embeddings
), seed AS (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
), cent0 AS (
    SELECT seed.cid, q.j, q.v FROM seed JOIN q USING (vec_id)
)"""]
    prev = "cent0"
    for i in range(1, iters + 1):
        sql.append(f""", a{i} AS (
    SELECT q.vec_id, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS d2
    FROM q JOIN {prev} c ON q.j = c.j GROUP BY q.vec_id, c.cid
), asg{i} AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM a{i}
    ) WHERE rn = 1
), upd{i} AS (
    SELECT a.cid, q.j, SUM(q.v) // COUNT(*) AS v
    FROM asg{i} a JOIN q USING (vec_id) GROUP BY a.cid, q.j
), cent{i} AS (
    SELECT p.cid, p.j, COALESCE(u.v, p.v) AS v
    FROM {prev} p LEFT JOIN upd{i} u ON p.cid = u.cid AND p.j = u.j
)""")
        prev = f"cent{i}"
    sql.append(f""", af AS (
    SELECT q.vec_id, c.cid, SUM((q.v - c.v) * (q.v - c.v)) AS d2
    FROM q JOIN {prev} c ON q.j = c.j GROUP BY q.vec_id, c.cid
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM af
) WHERE rn = 1 ORDER BY vec_id""")
    return "".join(sql)


KMEANS_SQL = _kmeans_sql()


# ---------------------------------------------------------------------------
# JSON metadata extraction: pull a typed field out of the events table's
# stringified-JSON props column — the M10 stringified-JSON doctrine
# (standardize.py outagePoint) applied to the corpus-metadata shape every
# training pipeline hits (payload sidecars, page metadata). One compiled
# vectorized regex per batch (C-speed str.extract), no JSON parser in the
# hot path; no-match rows map to -1 on both sides (DuckDB regexp_extract
# yields '' there, pandas yields NaN).


def json_extract_props(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_id", "props"])
    pat = re.compile(r'"k": (\d+)')

    def _extract(df: pd.DataFrame, _p=pat) -> pd.DataFrame:
        k = df["props"].fillna("").str.extract(_p)[0]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "k": k.fillna(-1).astype("int64"),
            }
        )

    return ds.map_batches(_extract, batch_format="pandas")


JSON_EXTRACT_SQL = r"""
SELECT event_id,
       CASE WHEN r = '' THEN -1 ELSE CAST(r AS BIGINT) END AS k
FROM (
    SELECT event_id,
           regexp_extract(COALESCE(props, ''), '"k": (\d+)', 1) AS r
    FROM events
) ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Q3-style multi-join analytic pipeline: customers (filtered) -> their
# orders (filtered) -> line items (filtered) -> per-order revenue -> top
# 10. The point is COMPOSITION at scale: both join fan-ins run as
# broadcast membership filters (key SETS ship once via ray.put — the
# customer and order key sets are orders of magnitude smaller than the
# row streams), revenue aggregates in exact integer e4 units per batch
# (q1_pricing's no-boundary idiom), and only (orderkey, partial) rows
# reach the combine. No row-sized shuffle anywhere.


_Q3_CUT = pd.Timestamp("1995-03-15")


def _q3_rev_cents(df: pd.DataFrame) -> pd.DataFrame:
    """shipdate filter + exact integer-e4 revenue, pre-aggregated per
    orderkey within the batch (combine-before-shuffle)."""
    df = df[df["l_shipdate"] > _Q3_CUT]
    price_c = np.round(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    disc_pct = np.round(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
    out = pd.DataFrame(
        {
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "rev": price_c * (100 - disc_pct),
        }
    )
    return out.groupby("l_orderkey", as_index=False)["rev"].sum()


def q3_revenue(
    sf_dir: str, k: int = 10, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    if _table_rows(sf_dir, "orders") <= driver_threshold:
        # broadcast composition: key SETS ship once, no shuffle anywhere
        ckeys = set(
            cust.to_pandas()
            .loc[lambda d: d["c_nationkey"] < 5, "c_custkey"]
            .astype("int64")
        )
        ckeys_ref = ray.put(ckeys)

        def _ofilter(df: pd.DataFrame, _c=ckeys_ref) -> pd.DataFrame:
            cs = ray.get(_c)
            m = (df["o_orderdate"] < _Q3_CUT) & df["o_custkey"].isin(cs)
            return df.loc[m, ["o_orderkey", "o_orderdate"]]

        od = orders.map_batches(_ofilter, batch_format="pandas").to_pandas()
        okeys_ref = ray.put(set(od["o_orderkey"].astype("int64")))
        odate = od.set_index("o_orderkey")["o_orderdate"]

        def _partial(df: pd.DataFrame, _o=okeys_ref) -> pd.DataFrame:
            df = df[df["l_orderkey"].isin(ray.get(_o))]
            return _q3_rev_cents(df)

        parts = li.map_batches(_partial, batch_format="pandas").to_pandas()
        agg = parts.groupby("l_orderkey", as_index=False)["rev"].sum()
        agg = agg.sort_values(["rev", "l_orderkey"], ascending=[False, True],
                              kind="mergesort").head(k)
        agg["o_orderdate"] = agg["l_orderkey"].map(odate)
    else:
        # distributed composition: the filtered-order set is corpus-sized,
        # so NOTHING row-sized touches the driver — two distributed hash
        # joins over pre-filtered/pre-aggregated streams, a per-orderkey
        # hash-shuffle combine, and a distributed sort+limit top-k
        cf = cust.map_batches(
            lambda df: df.loc[df["c_nationkey"] < 5, ["c_custkey"]],
            batch_format="pandas",
        )
        of = orders.map_batches(
            lambda df: df.loc[df["o_orderdate"] < _Q3_CUT,
                              ["o_orderkey", "o_custkey", "o_orderdate"]],
            batch_format="pandas",
        )
        oj = of.join(
            cf, join_type="inner", num_partitions=8,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        lp = li.map_batches(_q3_rev_cents, batch_format="pandas")
        # second hop as the engine's own tagged-union shuffle join:
        # chaining a second Dataset.join off a join output trips an
        # ArrowInvalid in Ray 2.49's aggregator (empty right partitions of
        # a join-output dataset lose their field refs), and the
        # tagged-union needs only ONE shuffle anyway

        def _tag_o(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": df["o_orderkey"].astype("int64"),
                    "side": np.int8(1),
                    "rev": np.int64(0),
                    "o_orderdate": df["o_orderdate"],
                }
            )

        def _tag_l(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": df["l_orderkey"].astype("int64"),
                    "side": np.int8(0),
                    "rev": df["rev"].astype("int64"),
                    "o_orderdate": pd.Series(
                        [pd.NaT] * len(df), dtype="datetime64[us]"
                    ),
                }
            )

        u = oj.map_batches(_tag_o, batch_format="pandas").union(
            lp.map_batches(_tag_l, batch_format="pandas")
        )

        def _merge_block(df: pd.DataFrame) -> pd.DataFrame:
            r = df.loc[df["side"] == 1, ["k", "o_orderdate"]].drop_duplicates("k")
            l = df.loc[df["side"] == 0, ["k", "rev"]]
            m = l.merge(r, on="k")
            out = m.groupby(["k", "o_orderdate"], as_index=False)["rev"].sum()
            return out.rename(columns={"k": "l_orderkey"})

        comb = hash_partitioned_map_batches(u, ["k"], _merge_block)
        agg = (
            comb.sort(["rev", "l_orderkey"], descending=[True, False])
            .limit(k)
            .to_pandas()
        )
    return pd.DataFrame(
        {
            "l_orderkey": agg["l_orderkey"].astype("int64").to_numpy(),
            "revenue_e4": agg["rev"].astype("int64").to_numpy(),
            "o_orderdate": agg["o_orderdate"].to_numpy(),
        }
    ).reset_index(drop=True)


Q3_REVENUE_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_nationkey < 5
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# triangle counting: the third graph-analytics family (pagerank = iterative
# propagation, connected_components = label closure, this = local clique
# structure). The graph projects lineitem onto a FIXED node space
# (part/supp keys mod _TRI_MOD, oriented a<b, self-loops dropped), so the
# distinct-edge set is bounded by node_space^2/2 REGARDLESS of corpus size
# — the per-batch dedup partials shrink the 60M-row stream to <= 44,850
# edge rows before anything leaves the workers, and the exact count runs
# on the driver as integer matrix arithmetic (trace(A^3)/6), node^2-bounded,
# never corpus-bounded.

_TRI_MOD = 300


def triangle_count(sf_dir: str) -> pd.DataFrame:
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def _edges(df: pd.DataFrame) -> pd.DataFrame:
        pk = df["l_partkey"].to_numpy(np.int64) % _TRI_MOD
        sk = df["l_suppkey"].to_numpy(np.int64) % _TRI_MOD
        m = pk != sk
        a = np.minimum(pk[m], sk[m])
        b = np.maximum(pk[m], sk[m])
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    edges = (
        li.map_batches(_edges, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    A = np.zeros((_TRI_MOD, _TRI_MOD), dtype=np.int64)
    A[edges["a"], edges["b"]] = 1
    A[edges["b"], edges["a"]] = 1
    tri = int(np.trace(A @ A @ A)) // 6
    return pd.DataFrame(
        {
            "n_edges": pd.array([len(edges)], dtype="int64"),
            "n_triangles": pd.array([tri], dtype="int64"),
        }
    )


TRIANGLE_SQL = f"""
WITH e AS (
    SELECT DISTINCT LEAST(pk, sk) AS a, GREATEST(pk, sk) AS b
    FROM (
        SELECT l_partkey % {_TRI_MOD} AS pk, l_suppkey % {_TRI_MOD} AS sk
        FROM lineitem
    ) WHERE pk != sk
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""


# ---------------------------------------------------------------------------
# deterministic corpus shuffle: the training-order epoch shuffle as a pure
# function of the data — each doc's position is the rank of a BIJECTIVE
# affine hash (odd multiplier mod 2^64, so distinct doc_ids can never
# collide), identical at any parallelism. Same zero-global-sort rank shape
# as percent_rank, but the hash is uniform on [0, 2^64) so the range
# boundaries are FIXED equal-width slices — no sampling pass at all:
# histogram -> per-range base -> ONE hash shuffle on range id -> local
# rank + base. numpy uint64 wraparound IS the mod-2^64 the SQL computes in
# HUGEINT.

_SHUF_RANGES = 512


def _shuffle_hash(doc_id: np.ndarray) -> np.ndarray:
    return doc_id.astype(np.uint64) * _SAMPLE_A + _SAMPLE_B  # wraps mod 2^64


def corpus_shuffle(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id"])
    N = _table_rows(sf_dir, "documents")

    if N <= driver_threshold:
        df = docs.to_pandas()
        h = _shuffle_hash(df["doc_id"].to_numpy(np.int64))
        order = np.argsort(h, kind="stable")
        pos = np.empty(N, dtype=np.int64)
        pos[order] = np.arange(N, dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "shuffle_pos": pos}
        ).sort_values("doc_id").reset_index(drop=True)

    shift = np.uint64(64 - int(np.log2(_SHUF_RANGES)))  # equal-width ranges

    def _rid(df: pd.DataFrame) -> pd.DataFrame:
        h = _shuffle_hash(df["doc_id"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "rid": (h >> shift).astype(np.int64),
                "h": h,  # uint64 column
                "doc_id": df["doc_id"].to_numpy(np.int64),
            }
        )

    with_rid = docs.map_batches(_rid, batch_format="pandas")

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["rid"].to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"rid": u, "cnt": c.astype(np.int64)})

    hist = (
        with_rid.map_batches(_hist, batch_format="pandas")
        .to_pandas()
        .groupby("rid")["cnt"]
        .sum()
        .reindex(range(_SHUF_RANGES), fill_value=0)
    )
    base = np.concatenate([[0], np.cumsum(hist.to_numpy(np.int64))[:-1]])

    def _rank_block(df: pd.DataFrame, _base=base) -> pd.DataFrame:
        df = df.sort_values(["rid", "h", "doc_id"], kind="mergesort").reset_index(drop=True)
        local = df.groupby("rid", sort=False).cumcount().to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "shuffle_pos": _base[df["rid"].to_numpy(np.int64)] + local,
            }
        )

    return hash_partitioned_map_batches(with_rid, ["rid"], _rank_block)


CORPUS_SHUFFLE_SQL = """
WITH h AS (
    SELECT doc_id,
           (CAST(doc_id AS HUGEINT) * 6364136223846793005
            + 1442695040888963407)
           % 18446744073709551616 AS hv
    FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT)
           AS shuffle_pos
FROM h ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# canonical-URL dedup: the crawler's dedup-by-canonical-form applied as a
# corpus operator — two docs are the same page if their CANONICALIZED URLs
# agree even when the raw strings differ (case, fragment, trailing slash).
# Derivation gives every 5-block of doc_ids ONE page whose raw URL is
# mangled differently per member (scheme case, host case, trailing slash,
# fragment), so the dedup provably collapses 5:1. One
# exact-dedup shape: per-batch (canon, min_doc) partials, ONE hash shuffle
# on the canonical string, per-block keep-min — the A4 min-idx doctrine on
# the crawl's own key.


def url_dedup(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame | rd.Dataset:
    from ..synth import canonical_urls

    docs = _read(sf_dir, "documents", ["doc_id"])

    def _derive(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        page = (did // 5) * 5  # every 5-block shares one page id
        raw = (
            pd.Series(np.where(did % 2 == 0, "HTTPS://", "https://"),
                      index=df.index)
            + np.where(did % 4 == 0, "WWW.Example.COM", "www.example.com")
            + "/p/"
            + page.astype(str)
            + np.where(did % 3 == 0, "/", "")
            + np.where(did % 5 == 0, "#f", "")
        )
        return pd.DataFrame(
            {"doc_id": did, "canon": canonical_urls(pd.Series(raw, dtype=object))}
        )

    derived = docs.map_batches(_derive, batch_format="pandas")

    def _keep_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("canon", as_index=False).agg(
            keeper=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        return g.astype({"keeper": "int64", "n_dups": "int64"})

    if _table_rows(sf_dir, "documents") <= driver_threshold:
        out = _keep_min(derived.to_pandas())
        return out.sort_values("canon").reset_index(drop=True)
    return hash_partitioned_map_batches(
        derived.map_batches(_keep_min, batch_format="pandas"),
        ["canon"],
        lambda df: df.groupby("canon", as_index=False).agg(
            keeper=("keeper", "min"), n_dups=("n_dups", "sum")
        ).astype({"keeper": "int64", "n_dups": "int64"}),
    )


URL_DEDUP_SQL = r"""
WITH u AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END
           || CASE WHEN doc_id % 4 = 0 THEN 'WWW.Example.COM'
                   ELSE 'www.example.com' END
           || '/p/' || CAST((doc_id // 5) * 5 AS VARCHAR)
           || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN '#f' ELSE '' END AS url
    FROM documents
), c AS (
    SELECT doc_id,
           CASE WHEN strpos(url, '#') > 0
                THEN substr(url, 1, strpos(url, '#') - 1) ELSE url END AS nofrag
    FROM u
), p AS (
    SELECT doc_id,
           lower(substr(nofrag, 1, strpos(nofrag, '://') - 1)) AS scheme,
           substr(nofrag, strpos(nofrag, '://') + 3) AS rest
    FROM c
), h AS (
    SELECT doc_id, scheme,
           CASE WHEN strpos(rest, '/') > 0
                THEN lower(substr(rest, 1, strpos(rest, '/') - 1))
                ELSE lower(rest) END AS host,
           CASE WHEN strpos(rest, '/') > 0
                THEN substr(rest, strpos(rest, '/')) ELSE '' END AS path
    FROM p
)
SELECT rtrim(scheme || '://' || host || path, '/') AS canon,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM h GROUP BY canon ORDER BY canon
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring: rank documents for a fixed query under the BM25
# saturation model (tf saturates at k1, length-normalized by b·dl/avgdl) —
# tfidf_topk's doctrine extended with document-length normalization. IDF
# stays in RATIO form (N/df, no log) so every term is rational arithmetic
# in one fixed operand order and the doubles are bit-identical to the SQL.
# Two streaming passes, zero shuffles: a stats pass reduces to (N, total
# tokens, df per query term) — query-sized driver state — then a scoring
# pass computes per-batch partial top-k; the driver combine is k x blocks.

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("join", "hash", "scan")  # high-df corpus terms so scoring bites
_BM25_K = 10


def bm25_topk(sf_dir: str, k: int = _BM25_K) -> pd.DataFrame:
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = list(_BM25_QUERY)

    def _stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        dl = toks.str.len().to_numpy(np.int64)
        row = {"n_docs": len(df), "n_tokens": int(dl.sum())}
        for t in terms:
            tf = toks.map(lambda ws, _t=t: ws.count(_t)).to_numpy(np.int64)
            row[f"df_{t}"] = int((tf > 0).sum())
        return pd.DataFrame([row])

    st = docs.map_batches(_stats, batch_format="pandas").to_pandas().sum()
    N = int(st["n_docs"])
    if N == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}
        )
    avgdl = float(st["n_tokens"]) / N  # one division, mirrored in SQL
    dfs = {t: int(st[f"df_{t}"]) for t in terms}
    params_ref = ray.put((avgdl, dfs))

    def _score(df: pd.DataFrame, _p=params_ref, _k=k) -> pd.DataFrame:
        avgdl, dfs = ray.get(_p)
        toks = df["text"].fillna("").str.split(" ")
        dl = toks.str.len().to_numpy(np.int64).astype(np.float64)
        score = np.zeros(len(df), dtype=np.float64)
        for t in terms:
            if dfs[t] == 0:
                continue
            tf = toks.map(lambda ws, _t=t: ws.count(_t)).to_numpy(np.int64).astype(np.float64)
            idf = float(N) / dfs[t]
            denom = tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (dl / avgdl))
            score = score + idf * ((tf * (_BM25_K1 + 1.0)) / denom)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "score": score})
        return out.sort_values(["score", "doc_id"], ascending=[False, True],
                               kind="mergesort").head(_k)

    parts = docs.map_batches(_score, batch_format="pandas").to_pandas()
    return (
        parts.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def _bm25_sql() -> str:
    per_term = " + ".join(
        f"""(CASE WHEN st.df_{t} = 0 THEN 0.0 ELSE
            (CAST(st.n AS DOUBLE) / st.df_{t})
            * ((d.tf_{t} * ({_BM25_K1} + 1.0))
               / (d.tf_{t} + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * (d.dl / st.avgdl))))
            END)"""
        for t in _BM25_QUERY
    )
    tf_cols = ", ".join(
        f"""CAST(len(list_filter(string_split(COALESCE(text, ''), ' '),
                   x -> x = '{t}')) AS DOUBLE) AS tf_{t}"""
        for t in _BM25_QUERY
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_QUERY
    )
    return f"""
WITH d AS (
    SELECT doc_id,
           CAST(len(string_split(COALESCE(text, ''), ' ')) AS DOUBLE) AS dl,
           {tf_cols}
    FROM documents
), st AS (
    SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
           {df_cols}
    FROM d
)
SELECT doc_id, {per_term} AS score
FROM d CROSS JOIN st
ORDER BY score DESC, doc_id LIMIT {_BM25_K}
"""


BM25_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# per-key LAG/LEAD features: for every event, the microsecond gap to the
# SAME user's previous event, the exact integer-cents value delta vs it,
# and the next event's type — the per-row order-feature primitive
# (sessionize_ganz / funnel_stages CONSUME order; this one EMITS features
# from it). Same _gated_grouped shape as rolling_window: driver under the
# bound, ONE hash shuffle on user_id above it. The block kernel is one
# stable sort plus pure int64 slice arithmetic (prev row = row above when
# the user matches) — no float round trip, so gaps/deltas hash bit-exact.
# Sentinels (-1 gap / 0 delta / '' next_type) plus is_first keep every
# output column non-null, so the driver canon never compares NaN forms.


def _lag_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    n = len(df)
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    cents = df["cents"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    gap = np.full(n, -1, dtype=np.int64)
    delta = np.zeros(n, dtype=np.int64)
    nxt = np.full(n, "", dtype=object)
    if n:
        m = uid[1:] == uid[:-1]  # row i has a previous event iff m[i-1]
        gap[1:][m] = ts[1:][m] - ts[:-1][m]
        delta[1:][m] = cents[1:][m] - cents[:-1][m]
        nxt[:-1][m] = et[1:][m]
    is_first = np.ones(n, dtype=bool)
    if n:
        is_first[1:] = ~m
    return pd.DataFrame(
        {
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "prev_gap_us": gap,
            "delta_cents": delta,
            "next_type": nxt,
            "is_first": is_first,
        }
    )


def lag_features(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.round(df.pop("value").to_numpy() * 100.0).astype(np.int64)
        # exact integer microseconds whatever unit pandas picked for ts
        df["ts_us"] = df.pop("ts").astype("datetime64[us]").astype("int64")
        return df

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _lag_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


LAG_FEATURES_SQL = """
WITH t AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_id, user_id,
       CAST(COALESCE(ts_us - LAG(ts_us) OVER w, -1) AS BIGINT) AS prev_gap_us,
       CAST(COALESCE(cents - LAG(cents) OVER w, 0) AS BIGINT) AS delta_cents,
       COALESCE(LEAD(event_type) OVER w, '') AS next_type,
       (LAG(ts_us) OVER w) IS NULL AS is_first
FROM t
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


# ---------------------------------------------------------------------------
# order-sensitive grouped string aggregate: each user's full event-type
# sequence in time order, as one comma-joined string — string_agg(... ORDER
# BY) is the one aggregate family the battery lacked (every other grouped
# agg here is order-free and combines via partials; an ordered concat
# CANNOT pre-combine, its partials aren't mergeable without carrying order
# keys, so the honest scale shape is co-location: ONE hash shuffle on
# user_id, then a per-block stable sort + one groupby-join pass).


def _concat_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    g = df.groupby("user_id", sort=False)
    out = g["event_type"].agg(",".join).rename("type_seq").reset_index()
    out["n_events"] = g.size().to_numpy(np.int64)
    out["user_id"] = out["user_id"].astype("int64")
    return out


def group_concat(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts_us"] = df.pop("ts").astype("datetime64[us]").astype("int64")
        return df

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _concat_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


GROUP_CONCAT_SQL = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# character-entropy quality gate: per-doc Shannon entropy over code points,
# keep docs >= 4.1 bits — the Gopher-style "low-entropy boilerplate" filter
# the quality family lacked (quality_counts/filter are ratio gates; this is
# the distributional one). Embarrassingly parallel per doc; the per-doc
# histogram is np.bincount over exact uint32 code points (utf-32 view), so
# it matches the SQL's per-character GROUP BY for any unicode input, not
# just ascii. Entropy is a ~30-term float sum — numpy and DuckDB may sum in
# different orders, but the driver gate rounds to 6dp and the terms carry
# ~1e-15 relative error, so the hash is stable.

_ENTROPY_MIN = 4.1


def char_entropy_filter(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _ent(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        ents = np.empty(len(df), dtype=np.float64)
        for i, s in enumerate(df["text"].fillna("")):
            a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            if not len(a):
                ents[i] = 0.0
                continue
            c = np.bincount(a - a.min())
            c = c[c > 0].astype(np.float64)
            p = c / c.sum()
            ents[i] = -(p * np.log2(p)).sum()
        out = pd.DataFrame({"doc_id": ids, "entropy": ents})
        return out[out["entropy"] >= _ENTROPY_MIN]

    return docs.map_batches(_ent, batch_format="pandas")


CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id,
           unnest(regexp_extract_all(COALESCE(text, ''), '[\\s\\S]')) AS ch
    FROM documents
), freq AS (
    SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS c
    FROM chars GROUP BY doc_id, ch
), tot AS (
    SELECT doc_id, SUM(c) AS n FROM freq GROUP BY doc_id
), ent AS (
    SELECT f.doc_id, -SUM((c / n) * log2(c / n)) AS entropy
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id
)
SELECT doc_id, entropy FROM ent WHERE entropy >= 4.1
"""


# ---------------------------------------------------------------------------
# C4-style cross-corpus segment dedup: split every doc into consecutive
# 8-word segments, drop any segment whose exact text already occurred at a
# smaller (doc_id, seg_idx), and reassemble the survivors in order — the
# sub-document dedup the corpus family lacked (exact_dedup_docs is
# whole-doc; fingerprint_overlap reports but doesn't rewrite). Scale shape:
# segment rows are built vectorized (explode + cumcount + per-batch
# groupby-join), the keep-first rule is ONE hash shuffle on the segment
# text + per-block sort/drop_duplicates (co-location makes the block-local
# first occurrence global), and reassembly is a SECOND hash shuffle on
# doc_id + per-block ordered join. Docs whose every segment was seen
# earlier drop out entirely, exactly like the SQL.

_SEG_WORDS = 8


def line_dedup(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _table_rows(sf_dir, "documents")

    def _segments(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split(" ")
        e = df[["doc_id"]].join(words.rename("word")).explode("word")
        pos = e.groupby("doc_id", sort=False).cumcount()
        e = e.assign(seg_idx=(pos // _SEG_WORDS).astype("int64"))
        seg = (
            e.groupby(["doc_id", "seg_idx"], as_index=False, sort=False)
            .agg(segment=("word", " ".join))
        )
        seg["doc_id"] = seg["doc_id"].astype("int64")
        return seg

    segments = docs.map_batches(_segments, batch_format="pandas")

    def _keep_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["segment", "doc_id", "seg_idx"], kind="mergesort"
        ).drop_duplicates("segment", keep="first")

    # the grouped rows are SEGMENTS (~words/8 per doc), not docs — gate on a
    # conservative 8-segments-per-doc estimate so a wide corpus crosses onto
    # the distributed branch well before the driver pull approaches corpus
    # size (the driver path pulls every segment row)
    n_segments_est = n_docs * _SEG_WORDS
    kept = _gated_grouped(
        segments, ["segment"], _keep_first, n_segments_est, driver_threshold
    )

    def _reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "seg_idx"], kind="mergesort")
        g = df.groupby("doc_id", sort=False)
        out = g["segment"].agg(" ".join).rename("new_text").reset_index()
        out["n_kept"] = g.size().to_numpy(np.int64)
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return _gated_grouped(
        kept, ["doc_id"], _reassemble, n_segments_est, driver_threshold
    )


LINE_DEDUP_SQL = """
WITH ws AS (
    SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), tok AS (
    SELECT doc_id, unnest(w) AS word,
           CAST(unnest(range(len(w))) AS BIGINT) AS pos
    FROM ws
), seg AS (
    SELECT doc_id, pos // 8 AS seg_idx,
           string_agg(word, ' ' ORDER BY pos) AS segment
    FROM tok GROUP BY doc_id, pos // 8
), keep AS (
    SELECT doc_id, seg_idx, segment,
           ROW_NUMBER() OVER (
               PARTITION BY segment ORDER BY doc_id, seg_idx
           ) AS rn
    FROM seg
)
SELECT doc_id,
       string_agg(segment, ' ' ORDER BY seg_idx) AS new_text,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM keep WHERE rn = 1
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# interval coalescing (merge overlapping intervals per key): each event
# opens an interval [ts, ts + value-cents seconds]; overlapping-or-touching
# intervals per user merge into islands — the EXPLICIT-interval cousin of
# sessionize_ganz's gap-based islands (there the boundary is a time gap,
# here it's interval geometry, the shape utility maintenance windows /
# outage spans need). All arithmetic is int64 microseconds, so island
# bounds hash bit-exact. Scale shape: _gated_grouped on user_id; the block
# kernel is one stable sort + per-user shifted cummax (vectorized) —
# islands never span users, so co-location is the only requirement.


def _intervals_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "s_us", "e_us"], kind="mergesort")
    g = df.groupby("user_id", sort=False)
    # running max of interval ends BEFORE this row, within the user
    prev_max = g["e_us"].cummax().groupby(df["user_id"], sort=False).shift(1)
    brk = (prev_max.isna() | (df["s_us"] > prev_max)).to_numpy()
    gid = np.cumsum(brk)  # island id, globally unique within the block
    out = (
        df.assign(gid=gid)
        .groupby(["user_id", "gid"], as_index=False, sort=False)
        .agg(
            island_start_us=("s_us", "min"),
            island_end_us=("e_us", "max"),
            n_events=("s_us", "size"),
        )
        .drop(columns="gid")
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


def merge_intervals(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].astype("datetime64[us]").astype("int64")
        dur = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "s_us": s,
                "e_us": s + dur * 1_000_000,
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _intervals_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


MERGE_INTERVALS_SQL = """
WITH iv AS (
    SELECT user_id, epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(ROUND(value * 100) AS BIGINT) * 1000000 AS e_us
    FROM events
), m AS (
    SELECT user_id, s_us, e_us,
           MAX(e_us) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_max
    FROM iv
), g AS (
    SELECT user_id, s_us, e_us,
           CASE WHEN prev_max IS NULL OR s_us > prev_max THEN 1 ELSE 0 END
               AS brk
    FROM m
), isl AS (
    SELECT user_id, s_us, e_us,
           SUM(brk) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us
               ROWS UNBOUNDED PRECEDING
           ) AS gid
    FROM g
)
SELECT user_id,
       MIN(s_us) AS island_start_us,
       MAX(e_us) AS island_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM isl GROUP BY user_id, gid
"""


# ---------------------------------------------------------------------------
# grouped mode (argmax-of-counts): each user's most frequent event type,
# ties broken lexicographically — the one grouped-aggregate SHAPE the
# battery lacked (sums/moments/sketches/top-k exist; mode needs a
# per-(key, value) count that IS pre-combinable, then an argmax over it).
# Per-batch (user, type, n) partials shrink the shuffle to the count
# grain; the gated combine sums partials and takes the (n desc, type asc)
# head per user.


def _mode_block(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["user_id", "event_type"], as_index=False, sort=False)[
        "n"
    ].sum()
    c = c.sort_values(
        ["user_id", "n", "event_type"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = c.drop_duplicates("user_id", keep="first").rename(
        columns={"event_type": "mode_type", "n": "mode_n"}
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["mode_n"] = out["mode_n"].astype("int64")
    return out[["user_id", "mode_type", "mode_n"]]


def grouped_mode(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False, sort=False).agg(
            n=("event_type", "size")
        )

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["user_id"], _mode_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


GROUPED_MODE_SQL = """
WITH c AS (
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
), r AS (
    SELECT user_id, event_type, n,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type
           ) AS rn
    FROM c
)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS mode_n
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# PMI collocations: top-30 adjacent word pairs by pointwise mutual
# information over the document corpus, min pair count 5. PMI is kept in
# RATIO form (the tfidf/bm25 doctrine — no log, so the score is rational
# arithmetic): score = c_xy * N_uni / N_bi * N_uni / c_x / c_y evaluated in
# exactly that operand order on both sides, so the doubles hash bit-exact.
# Scale shape: per-batch bigram+unigram counting is vectorized (explode +
# within-doc shift), partials are vocab-sized, the combine is gated on the
# bigram key; corpus totals are two scalar aggregates.

_PMI_MIN_COUNT = 5
_PMI_K = 30


def pmi_collocations(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.split(" ")
        e = df[["doc_id"]].join(words.rename("w")).explode("w")
        w = e["w"].to_numpy()
        did = e["doc_id"].to_numpy()
        same = np.zeros(len(e), dtype=bool)
        if len(e):
            same[1:] = did[1:] == did[:-1]  # row i-1,i are adjacent in a doc
        uni = pd.DataFrame({"w1": w, "w2": "", "kind": 0})
        bi = pd.DataFrame({"w1": w[:-1][same[1:]], "w2": w[1:][same[1:]], "kind": 1})
        both = pd.concat([uni, bi], ignore_index=True)
        return both.groupby(["kind", "w1", "w2"], as_index=False, sort=False).agg(
            n=("kind", "size")
        )

    partials = docs.map_batches(_counts, batch_format="pandas")

    def _sum_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["kind", "w1", "w2"], as_index=False, sort=False).agg(
            n=("n", "sum")
        )

    counts = _gated_grouped(
        partials, ["kind", "w1", "w2"], _sum_block,
        _table_rows(sf_dir, "documents"), driver_threshold,
    ).to_pandas()  # vocab-sized: unigram + bigram types, not corpus rows
    uni = counts[counts["kind"] == 0].set_index("w1")["n"]
    bi = counts[counts["kind"] == 1].copy()
    n_uni = int(uni.sum())
    n_bi = int(bi["n"].sum())
    bi = bi[bi["n"] >= _PMI_MIN_COUNT]
    c_xy = bi["n"].to_numpy(np.int64).astype(np.float64)
    c_x = uni.loc[bi["w1"]].to_numpy(np.int64).astype(np.float64)
    c_y = uni.loc[bi["w2"]].to_numpy(np.int64).astype(np.float64)
    # FIXED operand order — mirrored exactly in the SQL
    score = c_xy * float(n_uni) / float(n_bi) * float(n_uni) / c_x / c_y
    out = pd.DataFrame(
        {
            "w1": bi["w1"].to_numpy(),
            "w2": bi["w2"].to_numpy(),
            "pair_n": bi["n"].to_numpy(np.int64),
            "score": score,
        }
    )
    return (
        out.sort_values(
            ["score", "w1", "w2"], ascending=[False, True, True], kind="mergesort"
        )
        .head(_PMI_K)
        .reset_index(drop=True)
    )


PMI_SQL = """
WITH ws AS (
    SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS w FROM documents
), tok AS (
    SELECT doc_id, unnest(w) AS word,
           CAST(unnest(range(len(w))) AS BIGINT) AS pos
    FROM ws
), bi AS (
    SELECT word AS w1,
           LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tok
), bc AS (
    SELECT w1, w2, COUNT(*) AS c_xy FROM bi WHERE w2 IS NOT NULL
    GROUP BY w1, w2
), uc AS (
    SELECT word, COUNT(*) AS c FROM tok GROUP BY word
), tot AS (
    SELECT (SELECT COUNT(*) FROM tok) AS n_uni,
           (SELECT COUNT(*) FROM bi WHERE w2 IS NOT NULL) AS n_bi
)
SELECT b.w1, b.w2, CAST(b.c_xy AS BIGINT) AS pair_n,
       CAST(b.c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE) / CAST(n_bi AS DOUBLE)
           * CAST(n_uni AS DOUBLE) / CAST(ux.c AS DOUBLE)
           / CAST(uy.c AS DOUBLE) AS score
FROM bc b
JOIN uc ux ON ux.word = b.w1
JOIN uc uy ON uy.word = b.w2
CROSS JOIN tot
WHERE b.c_xy >= 5
ORDER BY score DESC, b.w1, b.w2
LIMIT 30
"""


# ---------------------------------------------------------------------------
# fuzzy string join (record linkage): part pairs within a (brand, type)
# block whose names are within Levenshtein distance 2 — the blocked
# edit-distance join family. The DP runs on DISTINCT name pairs per block
# (the name vocabulary is tiny next to the row count), then expands to row
# pairs via two vectorized merges; blocking keys are bounded (brands x
# types), so per-block Python dispatch is O(1) in corpus size and the
# expansion is output-sized. Matches DuckDB's levenshtein() (unit-cost
# insert/delete/substitute).

_FUZZY_MAX_DIST = 2


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    ar = np.arange(lb + 1, dtype=np.int64)
    prev = ar.copy()
    cur = np.empty(lb + 1, dtype=np.int64)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)):
        cur[0] = i + 1
        # substitution / deletion candidates, vectorized
        np.minimum(prev[:-1] + (bb != ca), prev[1:] + 1, out=cur[1:])
        # insertion sweep: cur[j] = min_{k<=j} cand[k] + (j - k)
        # = j + running-min of (cand[k] - k)
        cur -= ar
        np.minimum.accumulate(cur, out=cur)
        cur += ar
        prev, cur = cur, prev
    return int(prev[lb])


_FUZZY_EMPTY = {
    "part_a": pd.array([], dtype="int64"),
    "part_b": pd.array([], dtype="int64"),
    "name_a": pd.array([], dtype=object),
    "name_b": pd.array([], dtype=object),
    "dist": pd.array([], dtype="int64"),
}


def _fuzzy_block(df: pd.DataFrame) -> pd.DataFrame:
    # ONE DP pass over the block-wide distinct-name set (not per blocking
    # group — the first cut re-ran the same 2k name pairs per (brand, type)
    # group and paid 24 s on 20k rows; this shape pays 0.2 s). A length
    # prune skips pairs whose edit distance can't clear the bound.
    names = sorted(df["p_name"].unique())
    lens = [len(n) for n in names]
    allowed = []
    for i, a in enumerate(names):
        for j in range(i, len(names)):
            if abs(lens[i] - lens[j]) > _FUZZY_MAX_DIST:
                continue
            b = names[j]
            d = _levenshtein(a, b)
            if d <= _FUZZY_MAX_DIST:
                allowed.append((a, b, d))
                if a != b:
                    allowed.append((b, a, d))
    if not allowed:
        return pd.DataFrame(_FUZZY_EMPTY)
    al = pd.DataFrame(allowed, columns=["name_a", "name_b", "dist"])
    # expansion to row pairs: two vectorized merges keyed on the blocking
    # columns + the allowed name pair — output-sized, no per-group loop
    left = df[["p_brand", "p_type", "p_partkey", "p_name"]].rename(
        columns={"p_partkey": "part_a", "p_name": "name_a"}
    )
    right = df[["p_brand", "p_type", "p_partkey", "p_name"]].rename(
        columns={"p_partkey": "part_b", "p_name": "name_b"}
    )
    out = (
        left.merge(al, on="name_a")
        .merge(right, on=["p_brand", "p_type", "name_b"])
    )
    out = out[out["part_a"] < out["part_b"]]
    out = out[["part_a", "part_b", "name_a", "name_b", "dist"]].reset_index(
        drop=True
    )
    out["part_a"] = out["part_a"].astype("int64")
    out["part_b"] = out["part_b"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out


def fuzzy_join(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type"])
    return _gated_grouped(
        ds, ["p_brand", "p_type"], _fuzzy_block,
        _table_rows(sf_dir, "part"), driver_threshold,
    )


FUZZY_JOIN_SQL = """
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# ---------------------------------------------------------------------------
# registry

SQL_QUERIES: dict[str, tuple[Callable, str]] = {
    "q1_pricing": (q1_pricing, Q1_SQL),
    "nonzero_filter": (nonzero_filter, NONZERO_SQL),
    "grouped_sum": (grouped_sum, GROUPED_SUM_SQL),
    "window_end_ts": (window_end_ts, WINDOW_SQL),
    "minidx_dedup": (minidx_dedup, MINIDX_SQL),
    "outage_metrics": (outage_metrics, METRICS_SQL),
    "broadcast_lookup": (broadcast_lookup, BROADCAST_SQL),
    "sort_topk": (sort_topk, TOPK_SQL),
    "union_filter": (union_filter, UNION_SQL),
    "distinct_flags": (distinct_flags, DISTINCT_SQL),
    "epoch_ms_cast": (epoch_ms_cast, EPOCH_SQL),
    "global_props": (global_props, GLOBAL_SQL),
    "exact_dedup_docs": (exact_dedup_docs, EXACT_DEDUP_SQL),
    "corpus_prep": (corpus_prep, CORPUS_PREP_SQL),
    "token_counts": (token_counts_q, TOKEN_SQL),
    "bpe_token_counts": (bpe_token_counts, BPE_TOKEN_SQL),
    "quality_counts": (quality_counts, QUALITY_SQL),
    "quality_filter": (quality_filter, QUALITY_FILTER_SQL),
    "lang_id": (lang_id, LANG_ID_SQL),
    "cosine_pairs_exact": (cosine_pairs_exact, COSINE_PAIRS_SQL),
    "knn_topk": (knn_topk, KNN_SQL),
    "hash_join": (hash_join, HASH_JOIN_SQL),
    "tz_convert": (tz_convert, TZ_SQL),
    "asof_join": (asof_join, ASOF_SQL),
    "tumbling_window": (tumbling_window, TUMBLING_SQL),
    "sliding_window": (sliding_window, SLIDING_SQL),
    "grouped_topk": (grouped_topk, GROUPED_TOPK_SQL),
    "pack_shards": (pack_shards, PACK_SHARDS_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SQL),
    "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
    "chunk_documents": (chunk_documents, CHUNK_SQL),
    "term_doc_freq": (term_doc_freq, TERM_DOC_FREQ_SQL),
    "repetition_filter": (repetition_filter, REPETITION_SQL),
    "tfidf_topk": (tfidf_topk, TFIDF_SQL),
    "mixture_sample": (mixture_sample, MIXTURE_SQL),
    "token_percentiles": (token_percentiles, TOKEN_PCTL_SQL),
    "hll_registers": (hll_registers, HLL_SQL),
    "cms_counts": (cms_counts, CMS_SQL),
    "semi_join": (semi_join, SEMI_JOIN_SQL),
    "anti_join": (anti_join, ANTI_JOIN_SQL),
    "range_join": (range_join, RANGE_JOIN_SQL),
    "heavy_hitters": (heavy_hitters, HEAVY_HITTERS_SQL),
    "grouped_percentiles": (grouped_percentiles, GROUPED_PCTL_SQL),
    "fingerprint_overlap": (fingerprint_overlap, FINGERPRINT_OVERLAP_SQL),
    "left_outer_join": (left_outer_join, LEFT_OUTER_SQL),
    "rollup_sum": (rollup_sum, ROLLUP_SQL),
    "per_key_sample": (per_key_sample, PER_KEY_SAMPLE_SQL),
    "cum_window": (cum_window, CUM_WINDOW_SQL),
    "approx_quantiles": (approx_quantiles, APPROX_QUANTILES_SQL),
    "connected_components": (connected_components, CONNECTED_COMPONENTS_SQL),
    "pivot_sum": (pivot_sum, PIVOT_SQL),
    "full_outer_join": (full_outer_join, FULL_OUTER_SQL),
    "grouped_stats": (grouped_stats, GROUPED_STATS_SQL),
    "grouped_hll": (grouped_hll, GROUPED_HLL_SQL),
    "grouped_distinct_exact": (grouped_distinct_exact, GROUPED_DISTINCT_SQL),
    "windowed_distinct": (windowed_distinct, WINDOWED_DISTINCT_SQL),
    "funnel_stages": (funnel_stages, FUNNEL_SQL),
    "normalize_text": (normalize_text, NORMALIZE_TEXT_SQL),
    "inverted_index": (inverted_index, INVERTED_INDEX_SQL),
    "quality_model_score": (quality_model_score, QUALITY_MODEL_SQL),
    "url_canonicalize": (url_canonicalize, URL_CANONICALIZE_SQL),
    "skewed_join": (skewed_join, SKEWED_JOIN_SQL),
    "ntile_buckets": (ntile_buckets, NTILE_SQL),
    "ohlc_window": (ohlc_window, OHLC_SQL),
    "clip_outliers": (clip_outliers, CLIP_OUTLIERS_SQL),
    "table_checksum": (table_checksum, TABLE_CHECKSUM_SQL),
    "rolling_window": (rolling_window, ROLLING_WINDOW_SQL),
    "percent_rank": (percent_rank, PERCENT_RANK_SQL),
    "kmeans_clusters": (kmeans_clusters, KMEANS_SQL),
    "json_extract_props": (json_extract_props, JSON_EXTRACT_SQL),
    "q3_revenue": (q3_revenue, Q3_REVENUE_SQL),
    "triangle_count": (triangle_count, TRIANGLE_SQL),
    "corpus_shuffle": (corpus_shuffle, CORPUS_SHUFFLE_SQL),
    "url_dedup": (url_dedup, URL_DEDUP_SQL),
    "bm25_topk": (bm25_topk, BM25_SQL),
    "lag_features": (lag_features, LAG_FEATURES_SQL),
    "group_concat": (group_concat, GROUP_CONCAT_SQL),
    "char_entropy_filter": (char_entropy_filter, CHAR_ENTROPY_SQL),
    "line_dedup": (line_dedup, LINE_DEDUP_SQL),
    "merge_intervals": (merge_intervals, MERGE_INTERVALS_SQL),
    "grouped_mode": (grouped_mode, GROUPED_MODE_SQL),
    "pmi_collocations": (pmi_collocations, PMI_SQL),
    "fuzzy_join": (fuzzy_join, FUZZY_JOIN_SQL),
}

from .graph import pagerank, PAGERANK_SQL  # noqa: E402  (uses _read/_gated helpers)

SQL_QUERIES["pagerank"] = (pagerank, PAGERANK_SQL)


# ---------------------------------------------------------------------------
# equi-width histogram: global 20-bin histogram of lineitem price in integer
# cents. Two passes by construction (bin edges depend on the global min/max):
# pass 1 reduces each block to a (mn, mx) scalar pair, pass 2 reduces each
# block to a 20-row bincount partial — the driver only ever sums bin-grain
# partials (20 x blocks rows), never sees data rows. All arithmetic is
# integer (idx = (x-mn)*20 // (mx-mn+1)), so the distributed result is
# bit-identical to the sequential oracle at any block split.

_HIST_NBINS = 20


def histogram_bins(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def _cents(t: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0),
                     round_mode="half_to_even"),
            pa.int64(),
        )
        return pa.table({"x_c": x})

    cents = ds.map_batches(_cents, batch_format="pyarrow")
    mm = cents.map_batches(
        lambda t: pa.table(
            {
                "mn": pa.array([pc.min(t["x_c"]).as_py()], pa.int64()),
                "mx": pa.array([pc.max(t["x_c"]).as_py()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas().dropna()
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())
    den = mx - mn + 1

    def _bins(t: pa.Table) -> pa.Table:
        x = t["x_c"].to_numpy()
        idx = (x - mn) * _HIST_NBINS // den
        cnt = np.bincount(idx, minlength=_HIST_NBINS)
        return pa.table(
            {
                "bin": pa.array(np.arange(_HIST_NBINS, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = cents.map_batches(_bins, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bin", as_index=False).agg(n=("n", "sum"))
    out = out[out["n"] > 0].reset_index(drop=True)
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


HISTOGRAM_SQL = """
WITH v AS (
    SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS x_c FROM lineitem
), b AS (
    SELECT MIN(x_c) AS mn, MAX(x_c) AS mx FROM v
)
SELECT CAST((v.x_c - b.mn) * 20 // (b.mx - b.mn + 1) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM v, b
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# z-score normalization: global standardization of events.value — the
# feature-scaling stage of a training-data pipeline. Moments come from
# EXACT integer sums over cents (per-block scalar partials, driver sums
# ints), then mean/sd are derived in ONE fixed double expression mirrored
# verbatim in the SQL, so every emitted z is bit-identical. Two passes by
# construction (row output depends on global moments). Overflow envelope:
# sum(x_c^2) fits int64 up to ~3.8e3 T rows at this value range; the cents
# partials would switch to HUGEINT-style (hi, lo) pairs beyond that.

def zscore_normalize(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0), round_mode="half_to_even"),
            pa.int64(),
        )
        return pa.table({"event_id": t["event_id"], "x_c": x})

    cents = ds.map_batches(_cents, batch_format="pyarrow")

    def _mom(t: pa.Table) -> pa.Table:
        x = t["x_c"].to_numpy()
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([int(x.sum())], pa.int64()),
                "ss": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    mm = cents.map_batches(_mom, batch_format="pyarrow").to_pandas()
    n = int(mm["n"].sum())
    s = int(mm["s"].sum())
    ss = int(mm["ss"].sum())
    mean = float(s) / n
    sd = float(np.sqrt(float(ss) / n - mean * mean))

    def _z(t: pa.Table) -> pa.Table:
        x = t["x_c"].to_numpy().astype(np.float64)
        return pa.table({"event_id": t["event_id"], "z": (x - mean) / sd})

    return cents.map_batches(_z, batch_format="pyarrow")


ZSCORE_SQL = """
WITH v AS (
    SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS x_c FROM events
), agg AS (
    SELECT COUNT(*) AS n, SUM(x_c) AS s, SUM(x_c * x_c) AS ss FROM v
), m AS (
    SELECT CAST(s AS DOUBLE) / n AS mean,
           SQRT(CAST(ss AS DOUBLE) / n
                - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
    FROM agg
)
SELECT v.event_id, (CAST(v.x_c AS DOUBLE) - m.mean) / m.sd AS z
FROM v, m
"""


# ---------------------------------------------------------------------------
# snapshot diff: incremental-crawl delta between two table snapshots —
# added / removed / changed keys. The generic operator takes two tagged
# sides, unions them, and resolves per-key status inside co-located blocks
# after ONE hash shuffle on the key (gated to a driver pass below the usual
# bound); rows carry (key, side, content-hash) only, never payloads, so the
# shuffle is scalar-width. The query synthesises the two snapshots
# deterministically from documents (old = doc_id%7!=0; new = doc_id%5!=0
# with every doc_id%3==0 text edited) and must emit the exact delta.

def _diff_block(df: pd.DataFrame) -> pd.DataFrame:
    o = df[df["side"] == 0][["doc_id", "h"]]
    n = df[df["side"] == 1][["doc_id", "h"]]
    m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
    status = np.where(
        m["h_o"].isna(), "added",
        np.where(m["h_n"].isna(), "removed",
                 np.where(m["h_o"] != m["h_n"], "changed", "unchanged")),
    )
    out = pd.DataFrame({"doc_id": m["doc_id"].astype("int64"), "status": status})
    return out[out["status"] != "unchanged"]


def snapshot_diff(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _sides(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy()
        txt = df["text"].fillna("")
        h_old = txt.map(lambda t: hashlib.md5(t.encode("utf8")).hexdigest())
        txt_new = txt.where(did % 3 != 0, txt + " [v2]")
        h_new = txt_new.map(lambda t: hashlib.md5(t.encode("utf8")).hexdigest())
        old = pd.DataFrame(
            {"doc_id": did, "side": 0, "h": h_old.to_numpy()}
        )[did % 7 != 0]
        new = pd.DataFrame(
            {"doc_id": did, "side": 1, "h": h_new.to_numpy()}
        )[did % 5 != 0]
        return pd.concat([old, new], ignore_index=True)

    tagged = docs.map_batches(_sides, batch_format="pandas")
    return _gated_grouped(
        tagged, ["doc_id"], _diff_block,
        2 * _table_rows(sf_dir, "documents"), driver_threshold,
    )


SNAPSHOT_DIFF_SQL = """
WITH base AS (
    SELECT doc_id, COALESCE(text, '') AS text FROM documents
), old AS (
    SELECT doc_id, md5(text) AS h FROM base WHERE doc_id % 7 <> 0
), new AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [v2]' ELSE text END) AS h
    FROM base WHERE doc_id % 5 <> 0
), m AS (
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, o.h AS ho, n.h AS hn
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM m
WHERE ho IS NULL OR hn IS NULL OR ho <> hn
"""


# ---------------------------------------------------------------------------
# unigram LM scoring: train a unigram language model on the corpus (exact
# integer counts via per-batch partials + the gated combine), broadcast the
# vocab once, then score every document vectorized: avg log-likelihood
# (sum ln(c_w) - n_tok * ln(N)) / n_tok. This is the classic
# perplexity-style quality scorer of LLM data pipelines as a two-stage
# train -> broadcast -> score Ray pipeline. At corpus scale where the vocab
# outgrows a broadcast, the score stage becomes a hash join on the word key
# (the term_doc_freq combine already produces the distributed count table).
# Logs are libm doubles on both sides; the 6dp gate canon absorbs the
# sub-ulp summation-order noise.

def _word_count_vocab(
    sf_dir: str, driver_threshold: int
) -> pd.DataFrame:
    """Corpus unigram counts (w, n) via per-batch value_counts partials and
    the gated combine — the shared train pass of ngram_lm_score and
    tokenize_ids (one tokenization definition, one SQL mirror)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        c = words.explode().dropna().value_counts()
        return pd.DataFrame({"w": c.index.to_numpy(), "n": c.to_numpy(np.int64)})

    partials = docs.map_batches(_counts, batch_format="pandas")

    def _sum_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("w", as_index=False).agg(n=("n", "sum"))

    return _gated_grouped(
        partials, ["w"], _sum_block,
        _table_rows(sf_dir, "documents"), driver_threshold,
    ).to_pandas()  # vocab-sized, not corpus-sized


def ngram_lm_score(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")
    vocab = _word_count_vocab(sf_dir, driver_threshold)
    import ray

    total = int(vocab["n"].sum())
    cmap_ref = ray.put(dict(zip(vocab["w"], vocab["n"].astype("int64"))))
    ln_total = float(np.log(float(total)))

    def _score(df: pd.DataFrame, _c=cmap_ref) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = df[["doc_id"]].join(words.rename("w")).explode("w").dropna()
        ln = np.log(e["w"].map(ray.get(_c)).to_numpy(np.float64))
        g = pd.DataFrame(
            {"doc_id": e["doc_id"].to_numpy(np.int64), "ln": ln}
        ).groupby("doc_id", as_index=False).agg(
            n_tok=("ln", "size"), sl=("ln", "sum")
        )
        n_tok = g["n_tok"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "n_tok": n_tok,
                "avg_ll": (g["sl"].to_numpy() - n_tok * ln_total) / n_tok,
            }
        )
        return out

    return docs.map_batches(_score, batch_format="pandas")


NGRAM_LM_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS w
    FROM documents
), c AS (
    SELECT w, COUNT(*) AS cw FROM tok GROUP BY w
), tot AS (
    SELECT COUNT(*) AS nt FROM tok
), per AS (
    SELECT t.doc_id, COUNT(*) AS n_tok, SUM(LN(CAST(c.cw AS DOUBLE))) AS sl
    FROM tok t JOIN c ON t.w = c.w
    GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       (sl - n_tok * LN(CAST(tot.nt AS DOUBLE))) / n_tok AS avg_ll
FROM per, tot
"""


SQL_QUERIES["histogram_bins"] = (histogram_bins, HISTOGRAM_SQL)
SQL_QUERIES["zscore_normalize"] = (zscore_normalize, ZSCORE_SQL)
SQL_QUERIES["snapshot_diff"] = (snapshot_diff, SNAPSHOT_DIFF_SQL)
SQL_QUERIES["ngram_lm_score"] = (ngram_lm_score, NGRAM_LM_SQL)


# ---------------------------------------------------------------------------
# keyword tagging: multi-pattern document tagging (topic routing / domain
# filtering in LLM data pipelines). The keyword list is a fixed broadcast;
# each batch tokenizes ONCE, then runs one vectorized membership pass per
# keyword (K passes over the batch, never a per-row Python loop over
# keywords x rows). Tags join in the fixed keyword order, so output is
# deterministic. Embarrassingly parallel — no shuffle.

_TAG_KEYWORDS = ("spark", "join", "window", "hash", "stream", "filter")


def keyword_tag(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re).map(set)
        flags = np.stack(
            [words.map(lambda s, k=k: k in s).to_numpy() for k in _TAG_KEYWORDS],
            axis=1,
        )
        tags = np.full(len(df), "", dtype=object)
        for j, k in enumerate(_TAG_KEYWORDS):
            hit = flags[:, j]
            tags = np.where(hit, np.where(tags == "", k, tags + "," + k), tags)
        n_tags = flags.sum(axis=1).astype(np.int64)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "tags": tags,
                "n_tags": n_tags,
            }
        )
        return out[n_tags > 0]

    return docs.map_batches(_tag, batch_format="pandas")


KEYWORD_TAG_SQL = r"""
WITH kw AS (
    SELECT ['spark', 'join', 'window', 'hash', 'stream', 'filter'] AS ks
), t AS (
    SELECT doc_id,
           list_distinct(regexp_extract_all(lower(COALESCE(text, '')), '\w+'))
               AS ws
    FROM documents
), m AS (
    SELECT doc_id, list_filter(kw.ks, k -> list_contains(t.ws, k)) AS hits
    FROM t, kw
)
SELECT doc_id, array_to_string(hits, ',') AS tags,
       CAST(len(hits) AS BIGINT) AS n_tags
FROM m WHERE len(hits) > 0
"""


# ---------------------------------------------------------------------------
# priority dedup: exact content dedup that keeps the replica from the
# HIGHEST-priority source (cross-source corpus merging: curated > scraped),
# ties broken by min doc_id. Per-batch argmax partials reduce each batch to
# (hash, best_prio, best_id, n) — mergeable, so the shuffle carries one row
# per distinct text per batch, never payloads; the gated combine re-runs
# the same argmax. The query plants cross-source replicas deterministically
# (every doc_id%3==0 doc is mirrored into a rotated source at doc_id+1e6).

def _prio_pick_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(
        ["h", "prio", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    out = df.groupby("h", as_index=False).agg(
        doc_id=("doc_id", "first"), priority=("prio", "first"),
        n_copies=("n", "sum"),
    )
    return pd.DataFrame(
        {
            "doc_id": out["doc_id"].astype("int64"),
            "priority": out["priority"].astype("int64"),
            "n_copies": out["n_copies"].astype("int64"),
        }
    )


def priority_dedup(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        txt = df["text"].fillna("")
        src_num = (
            df["source"].str.extract(r"(\d+)")[0].astype(int).to_numpy(np.int64)
        )
        h = txt.map(lambda t: hashlib.md5(t.encode("utf8")).hexdigest()).to_numpy()
        base = pd.DataFrame({"doc_id": did, "h": h, "prio": src_num % 4, "n": 1})
        rep = did % 3 == 0
        mirror = pd.DataFrame(
            {
                "doc_id": did[rep] + 1_000_000,
                "h": h[rep],
                "prio": (src_num[rep] + 7) % 20 % 4,
                "n": 1,
            }
        )
        both = pd.concat([base, mirror], ignore_index=True)
        both = both.sort_values(
            ["h", "prio", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        return both.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "first"), prio=("prio", "first"), n=("n", "sum")
        )

    partials = docs.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["h"], _prio_pick_block,
        2 * _table_rows(sf_dir, "documents"), driver_threshold,
    )


PRIORITY_DEDUP_SQL = r"""
WITH aug AS (
    SELECT doc_id, COALESCE(text, '') AS text, source FROM documents
    UNION ALL
    SELECT doc_id + 1000000, COALESCE(text, ''),
           'src' || CAST((CAST(regexp_extract(source, '\d+') AS INT) + 7) % 20
                         AS VARCHAR)
    FROM documents WHERE doc_id % 3 = 0
), p AS (
    SELECT doc_id, md5(text) AS h,
           CAST(regexp_extract(source, '\d+') AS INT) % 4 AS prio
    FROM aug
), r AS (
    SELECT doc_id, prio,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY prio DESC, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY h) AS n_copies
    FROM p
)
SELECT doc_id, CAST(prio AS BIGINT) AS priority,
       CAST(n_copies AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# decayed trailing sum: per-user EWMA-style feature over the 8 most recent
# events (ordered by ts), weight 2^-j at lag j. DYADIC weights make every
# term an exact double (value-cents x 2^-j), and the 8-term sum stays under
# the 53-bit significand, so the result is bit-exact under ANY summation
# order — no float-determinism caveat at all. One hash shuffle on user_id
# (gated), block kernel = one stable sort + 7 vectorized shifted adds.

_DECAY_LAGS = 8


def _decay_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    x = df["x_c"].to_numpy(np.int64).astype(np.float64)
    d = x.copy()
    for j in range(1, _DECAY_LAGS):
        same = uid[j:] == uid[:-j]
        d[j:] += np.where(same, x[:-j] * (0.5 ** j), 0.0)
    return pd.DataFrame(
        {"event_id": df["event_id"].to_numpy(np.int64), "decayed": d}
    )


def decayed_sum(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(t: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0), round_mode="half_to_even"),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "x_c": x,
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow")
    return _gated_grouped(
        prepped, ["user_id"], _decay_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


DECAYED_SUM_SQL = """
WITH v AS (
    SELECT event_id, user_id, ts,
           CAST(ROUND(value * 100) AS BIGINT) AS x_c
    FROM events
)
SELECT event_id,
       CAST(x_c AS DOUBLE)
       + COALESCE(LAG(x_c, 1) OVER w, 0) * 0.5
       + COALESCE(LAG(x_c, 2) OVER w, 0) * 0.25
       + COALESCE(LAG(x_c, 3) OVER w, 0) * 0.125
       + COALESCE(LAG(x_c, 4) OVER w, 0) * 0.0625
       + COALESCE(LAG(x_c, 5) OVER w, 0) * 0.03125
       + COALESCE(LAG(x_c, 6) OVER w, 0) * 0.015625
       + COALESCE(LAG(x_c, 7) OVER w, 0) * 0.0078125 AS decayed
FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# grouped Pearson correlation: corr(quantity, price-in-dollars) per return
# flag — the grouped_stats doctrine extended to cross-moments. Per-batch
# partials carry exact integer (n, sx, sy, sxx, syy, sxy) per flag (flag-
# grain, tiny); the driver sums ints and evaluates ONE fixed double
# expression mirrored in the SQL, so corr is bit-identical. Integer units:
# quantity and price are truncated to whole units ((cents // 100) — no
# rounding boundary), which keeps syy inside int64 out to ~1e8 rows per
# partial and exact python-int addition beyond.

def grouped_corr(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def _mom(df: pd.DataFrame) -> pd.DataFrame:
        x = np.round(df["l_quantity"].to_numpy() * 100.0).astype(np.int64) // 100
        y = (
            np.round(df["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
            // 100
        )
        g = pd.DataFrame(
            {
                "flag": df["l_returnflag"].to_numpy(),
                "one": 1, "x": x, "y": y, "xx": x * x, "yy": y * y, "xy": x * y,
            }
        )
        return g.groupby("flag", as_index=False).agg(
            n=("one", "sum"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"),
        )

    parts = ds.map_batches(_mom, batch_format="pandas").to_pandas()
    a = parts.groupby("flag", as_index=False).sum()
    n = a["n"].to_numpy(np.int64).astype(np.float64)
    sx = a["sx"].to_numpy(np.int64).astype(np.float64)
    sy = a["sy"].to_numpy(np.int64).astype(np.float64)
    sxx = a["sxx"].to_numpy(np.int64).astype(np.float64)
    syy = a["syy"].to_numpy(np.int64).astype(np.float64)
    sxy = a["sxy"].to_numpy(np.int64).astype(np.float64)
    corr = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )
    return pd.DataFrame(
        {
            "flag": a["flag"].to_numpy(),
            "n": a["n"].astype("int64"),
            "corr": corr,
        }
    )


GROUPED_CORR_SQL = """
WITH v AS (
    SELECT l_returnflag AS flag,
           CAST(ROUND(l_quantity * 100) AS BIGINT) // 100 AS x,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 100 AS y
    FROM lineitem
), a AS (
    SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
    FROM v GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM a
"""


SQL_QUERIES["keyword_tag"] = (keyword_tag, KEYWORD_TAG_SQL)
SQL_QUERIES["priority_dedup"] = (priority_dedup, PRIORITY_DEDUP_SQL)
SQL_QUERIES["decayed_sum"] = (decayed_sum, DECAYED_SUM_SQL)
SQL_QUERIES["grouped_corr"] = (grouped_corr, GROUPED_CORR_SQL)


# ---------------------------------------------------------------------------
# CUBE aggregation: all four grouping sets of (returnflag, linestatus) in
# one pass — the OLAP companion to rollup_sum (which only walks the
# hierarchy). One arrow partial-agg shrinks every block to the finest
# grain; the three coarser sets derive from the finest on the driver
# (category-sized, never data-sized), exactly once, in integer cents.

def cube_sum(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def _partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(
            pc.round(pc.multiply(t["l_quantity"], 100.0),
                     round_mode="half_to_even"),
            pa.int64(),
        )
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
            }
        )
        g = tb.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "qty_c": g["qty_c_sum"],
            }
        )

    fine = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)["qty_c"]
        .sum()
    )
    by_flag = fine.groupby("l_returnflag", as_index=False)["qty_c"].sum()
    by_flag["l_linestatus"] = "ALL"
    by_status = fine.groupby("l_linestatus", as_index=False)["qty_c"].sum()
    by_status["l_returnflag"] = "ALL"
    total = pd.DataFrame(
        {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
         "qty_c": [fine["qty_c"].sum()]}
    )
    out = pd.concat([fine, by_flag, by_status, total], ignore_index=True)
    out = out.rename(columns={"qty_c": "sum_qty_c"})
    out["sum_qty_c"] = out["sum_qty_c"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], kind="mergesort"
    ).reset_index(drop=True)[["l_returnflag", "l_linestatus", "sum_qty_c"]]


CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# grouped outlier detection: flag events whose value sits > 3 sigma from
# their event_type's mean — grouped standardization, the anomaly-detection
# staple. Per-type moments come from exact integer partials (type-grain,
# tiny), broadcast back into a stateless filter pass; mean/sd/z use ONE
# fixed double expression mirrored in the SQL, so the kept set is
# bit-identical. Same two-pass shape as zscore_normalize, keyed.

def grouped_outliers(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0), round_mode="half_to_even"),
            pa.int64(),
        )
        return pa.table(
            {"event_id": t["event_id"], "event_type": t["event_type"], "x_c": x}
        )

    cents = ds.map_batches(_cents, batch_format="pyarrow")

    def _mom(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "one": 1,
                "x": df["x_c"].to_numpy(np.int64),
                "xx": df["x_c"].to_numpy(np.int64) ** 2,
            }
        )
        return g.groupby("event_type", as_index=False).agg(
            n=("one", "sum"), s=("x", "sum"), ss=("xx", "sum")
        )

    mm = (
        cents.map_batches(_mom, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    mean = {
        t: float(s) / n for t, n, s in zip(mm["event_type"], mm["n"], mm["s"])
    }
    sd = {
        t: float(np.sqrt(float(ss) / n - (float(s) / n) * (float(s) / n)))
        for t, n, s, ss in zip(mm["event_type"], mm["n"], mm["s"], mm["ss"])
    }

    def _flag(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x_c"].to_numpy(np.int64).astype(np.float64)
        mu = df["event_type"].map(mean).to_numpy(np.float64)
        sg = df["event_type"].map(sd).to_numpy(np.float64)
        z = (x - mu) / sg
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": df["event_type"].to_numpy(),
                "z": z,
            }
        )
        return out[np.abs(z) > 3.0]

    return cents.map_batches(_flag, batch_format="pandas")


GROUPED_OUTLIERS_SQL = """
WITH v AS (
    SELECT event_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS x_c
    FROM events
), agg AS (
    SELECT event_type, COUNT(*) AS n, SUM(x_c) AS s, SUM(x_c * x_c) AS ss
    FROM v GROUP BY event_type
), m AS (
    SELECT event_type, CAST(s AS DOUBLE) / n AS mean,
           SQRT(CAST(ss AS DOUBLE) / n
                - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
    FROM agg
)
SELECT v.event_id, v.event_type,
       (CAST(v.x_c AS DOUBLE) - m.mean) / m.sd AS z
FROM v JOIN m USING (event_type)
WHERE ABS((CAST(v.x_c AS DOUBLE) - m.mean) / m.sd) > 3.0
"""


# ---------------------------------------------------------------------------
# timeline gap-fill: densify each user's event history to one row per
# calendar day between their first and last event, zero-filled — the
# regularization step before windowed features on sparse series. Per-batch
# partials shrink the shuffle to (user, day, n) grain; the gated block
# kernel expands each user's day range vectorized (repeat + arange, no
# per-user Python loop) and left-joins the counts. Output is span-sized
# (users x days), never corpus-sized.

def _gapfill_block(df: pd.DataFrame) -> pd.DataFrame:
    agg = df.groupby(["user_id", "day"], as_index=False).agg(n=("n", "sum"))
    b = agg.groupby("user_id").agg(mn=("day", "min"), mx=("day", "max"))
    reps = (b["mx"] - b["mn"] + 1).to_numpy(np.int64)
    uid = np.repeat(b.index.to_numpy(np.int64), reps)
    starts = np.repeat(b["mn"].to_numpy(np.int64), reps)
    offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    cal = pd.DataFrame({"user_id": uid, "day": starts + offs})
    out = cal.merge(agg, on=["user_id", "day"], how="left")
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype("int64"),
            "day": out["day"].astype("int64"),
            "n_events": out["n"].fillna(0).astype("int64"),
        }
    )


def gapfill_days(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        g = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day, "n": 1}
        )
        return g.groupby(["user_id", "day"], as_index=False).agg(n=("n", "sum"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["user_id"], _gapfill_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


GAPFILL_SQL = """
WITH d AS (
    SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), c AS (
    SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1, 2
), b AS (
    SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM d GROUP BY user_id
), cal AS (
    SELECT user_id, unnest(range(mn, mx + 1)) AS day FROM b
)
SELECT cal.user_id, CAST(cal.day AS BIGINT) AS day,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM cal LEFT JOIN c USING (user_id, day)
"""


# ---------------------------------------------------------------------------
# embedding quantization: per-dimension min-max scalar quantization of the
# embedding column to uint8 levels — the storage-compression step before
# shipping vectors into an ANN index (4x smaller than f32). Pass 1 reduces
# each block to a dim-grain (mn, mx) partial; pass 2 quantizes vectorized
# against the broadcast ranges. floor((x - mn) * 255 / (mx - mn)) is one
# fixed double expression on both sides (FLOOR has no half-boundary), so
# every level is bit-identical; x == mx lands exactly on level 255.

def embedding_quantize(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _mm(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
                "mn": pa.array(m.min(axis=0)),
                "mx": pa.array(m.max(axis=0)),
            }
        )

    mm = (
        ds.map_batches(_mm, batch_format="pyarrow")
        .to_pandas()
        .groupby("dim")
        .agg(mn=("mn", "min"), mx=("mx", "max"))
        .sort_index()
    )
    mn = mm["mn"].to_numpy()
    scale = mm["mx"].to_numpy() - mn
    # degenerate (constant) dimension: every value maps to level 0 rather
    # than dividing by zero — mirrored by the CASE in the SQL
    safe_scale = np.where(scale == 0.0, 1.0, scale)

    def _q(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.floor((m - mn) * 255.0 / safe_scale).astype(np.int64)
        d = m.shape[1]
        return pa.table(
            {
                "vec_id": pa.array(
                    np.repeat(t["vec_id"].to_numpy(), d).astype(np.int64)
                ),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(m))),
                "q": pa.array(q.ravel()),
            }
        )

    return ds.map_batches(_q, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH e AS (
    SELECT vec_id, unnest(embedding) AS x,
           unnest(range(len(embedding))) AS dim
    FROM embeddings
), s AS (
    SELECT dim, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
    FROM e GROUP BY dim
)
SELECT e.vec_id, CAST(e.dim AS BIGINT) AS dim,
       CASE WHEN s.mx = s.mn THEN CAST(0 AS BIGINT)
            ELSE CAST(FLOOR((CAST(e.x AS DOUBLE) - s.mn) * 255.0
                            / (s.mx - s.mn)) AS BIGINT) END AS q
FROM e JOIN s USING (dim)
"""


SQL_QUERIES["cube_sum"] = (cube_sum, CUBE_SQL)
SQL_QUERIES["grouped_outliers"] = (grouped_outliers, GROUPED_OUTLIERS_SQL)
SQL_QUERIES["gapfill_days"] = (gapfill_days, GAPFILL_SQL)
SQL_QUERIES["embedding_quantize"] = (embedding_quantize, EMBEDDING_QUANTIZE_SQL)


# ---------------------------------------------------------------------------
# inactivity-gap sessionization over the events table: a new session starts
# when a user is idle > 30 minutes — the generic web-analytics counterpart
# to the POUS threshold sessionizer. One hash shuffle on user_id (gated);
# the block kernel is ONE stable sort + vectorized gap/break/segment-id
# arithmetic (the sessionize.py run-split doctrine — no per-user Python
# dispatch), then one groupby over segment ids. All int64 microseconds.

_SESSION_GAP_US = 30 * 60 * 1_000_000


def _event_sessions_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    brk = np.ones(len(df), dtype=bool)
    if len(df) > 1:
        brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > _SESSION_GAP_US)
    seg = np.cumsum(brk)
    g = pd.DataFrame({"user_id": uid, "ts_us": ts, "seg": seg}).groupby(
        "seg", as_index=False, sort=False
    ).agg(
        user_id=("user_id", "first"),
        session_start_us=("ts_us", "min"),
        session_end_us=("ts_us", "max"),
        n_events=("ts_us", "size"),
    )
    return pd.DataFrame(
        {
            "user_id": g["user_id"].astype("int64"),
            "session_start_us": g["session_start_us"].astype("int64"),
            "session_end_us": g["session_end_us"].astype("int64"),
            "n_events": g["n_events"].astype("int64"),
        }
    )


def event_sessions(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _event_sessions_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


EVENT_SESSIONS_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
), g AS (
    SELECT user_id, ts_us, event_id,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                     OR ts_us - LAG(ts_us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
    SELECT user_id, ts_us,
           SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS seg
    FROM g
)
SELECT user_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, seg
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split: the dataset-assembly stage every
# training pipeline needs. Assignment is a pure function of the id (Knuth
# multiplicative hash mod 100 -> 80/10/10), so it is reproducible across
# re-runs, resumes, and any partitioning — no RNG state anywhere. Stateless
# single pass, no shuffle.

def train_test_split(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id"])

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        b = (_knuth_hash_u32(ids) % np.uint64(100)).astype(np.int64)
        split = np.where(b < 80, "train", np.where(b < 90, "val", "test"))
        return pd.DataFrame(
            {"doc_id": ids.astype("int64"), "split": split}
        )

    return ds.map_batches(_assign, batch_format="pandas")


TRAIN_TEST_SPLIT_SQL = """
WITH h AS (
    SELECT doc_id,
           (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296 % 100 AS b
    FROM documents
)
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""


# ---------------------------------------------------------------------------
# brand co-occurrence: market-basket pair counts — how many orders contain
# both brands. Stage 1 shrinks each batch to distinct (order, brand) via a
# broadcast partkey->brand lookup (25-brand dimension, ray_guide broadcast
# doctrine); stage 2 needs per-order completeness, so it runs per co-located
# block after the gated shuffle on l_orderkey: a vectorized SELF-MERGE on
# the order key (b1 < b2) enumerates pairs — output bounded by
# brands-per-order^2, never corpus^2; stage 3 sums pair-grain partials on
# the driver (<= 300 pairs).

def brand_cooccurrence(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brands = np.sort(part["p_brand"].unique())
    nb = len(brands)
    code_of = {b: i for i, b in enumerate(brands)}
    import ray

    code_map_ref = ray.put(
        {k: code_of[b] for k, b in zip(part["p_partkey"], part["p_brand"])}
    )
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def _distinct(df: pd.DataFrame, _m=code_map_ref) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "code": df["l_partkey"].map(ray.get(_m)).to_numpy(np.int64),
            }
        )
        return out.drop_duplicates()

    def _pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        # exact upper-triangle expansion (repeat/arange index arithmetic:
        # k(k-1)/2 pairs per order, never the k^2 self-merge), then ONE
        # bincount over nb^2 integer pair codes — no string groupby in the
        # hot path (the first cut paid 60 s of pandas string-pair groupby
        # at sf10; this kernel took the query 83 -> 30 s, BASELINE.md)
        d = df.drop_duplicates().sort_values(
            ["l_orderkey", "code"], kind="mergesort"
        )
        ok = d["l_orderkey"].to_numpy(np.int64)
        code = d["code"].to_numpy(np.int64)
        change = np.ones(len(d), dtype=bool)
        change[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(d)))
        within = np.arange(len(d), dtype=np.int64) - np.repeat(starts, lens)
        cnt1 = np.repeat(lens, lens) - 1 - within  # partners after each row
        a_idx = np.repeat(np.arange(len(d), dtype=np.int64), cnt1)
        csum = np.cumsum(cnt1)
        total = int(csum[-1]) if len(csum) else 0
        off = np.arange(total, dtype=np.int64) - np.repeat(
            csum - cnt1, cnt1
        ) + 1
        pair = code[a_idx] * nb + code[a_idx + off]
        cnt = np.bincount(pair, minlength=nb * nb)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"pair": nz.astype(np.int64), "n": cnt[nz]})

    distinct = ds.map_batches(_distinct, batch_format="pandas")
    pair_partials = _gated_grouped(
        distinct, ["l_orderkey"], _pairs_block,
        _table_rows(sf_dir, "lineitem"), driver_threshold,
    )
    pairs = (
        pair_partials.to_pandas()  # pair-grain: <= nb^2 rows per block
        .groupby("pair", as_index=False)
        .agg(n_orders=("n", "sum"))
    )
    out = pd.DataFrame(
        {
            "brand_a": brands[pairs["pair"] // nb],
            "brand_b": brands[pairs["pair"] % nb],
            "n_orders": pairs["n_orders"].astype("int64"),
        }
    )
    return out.sort_values(
        ["brand_a", "brand_b"], kind="mergesort"
    ).reset_index(drop=True)


BRAND_COOCCURRENCE_SQL = """
WITH d AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT a.brand AS brand_a, b.brand AS brand_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# cumulative distinct users per day: growth accounting (DAU onboarding
# curve). Per-batch partials reduce to (user, min day); the gated combine
# takes the global min per user (first-seen day), then day-grain counts and
# ONE driver cumsum over the day axis (days, not rows). Integer epoch-days
# everywhere.

def cumulative_users(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        g = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        )
        return g.groupby("user_id", as_index=False).agg(day=("day", "min"))

    def _min_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(day=("day", "min"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    first_seen = _gated_grouped(
        partials, ["user_id"], _min_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )
    # shrink user-grain to DAY grain in the workers before the driver
    # pull — the driver never holds a row per user (_gated_grouped always
    # returns a Dataset, including on its driver branch)
    day_counts = (
        first_seen.map_batches(
            lambda df: df.groupby("day", as_index=False).agg(
                n=("day", "size")
            ),
            batch_format="pandas",
        )
        .to_pandas()  # day-grain
        .groupby("day", as_index=False)
        .agg(n=("n", "sum"))
    )
    per_day = day_counts.set_index("day")["n"].sort_index()
    out = pd.DataFrame(
        {
            "day": per_day.index.to_numpy(np.int64),
            "new_users": per_day.to_numpy(np.int64),
            "cum_users": per_day.cumsum().to_numpy(np.int64),
        }
    )
    return out


CUMULATIVE_USERS_SQL = """
WITH f AS (
    SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day
    FROM events GROUP BY user_id
), d AS (
    SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM d
"""


SQL_QUERIES["event_sessions"] = (event_sessions, EVENT_SESSIONS_SQL)
SQL_QUERIES["train_test_split"] = (train_test_split, TRAIN_TEST_SPLIT_SQL)
SQL_QUERIES["brand_cooccurrence"] = (brand_cooccurrence, BRAND_COOCCURRENCE_SQL)
SQL_QUERIES["cumulative_users"] = (cumulative_users, CUMULATIVE_USERS_SQL)


# ---------------------------------------------------------------------------
# T5-style span masking: deterministic denoising-objective prep — every
# (pos % 7 == 3) token becomes the sentinel "<X>" in the input and moves to
# the target sequence. Doc-local, so embarrassingly parallel: one explode +
# cumcount + two grouped joins per batch, no shuffle. Deterministic mask
# positions (no RNG) keep re-runs and resumes identical.

_SPAN_MASK_RE = re.compile(r"\w+")


def _span_mask_batch(df: pd.DataFrame) -> pd.DataFrame:
    words = df["text"].fillna("").str.lower().str.findall(_SPAN_MASK_RE)
    e = df[["doc_id"]].join(words.rename("tok")).explode("tok").dropna()
    e["pos"] = e.groupby("doc_id").cumcount()
    m = (e["pos"] % 7) == 3
    e["out_tok"] = np.where(m, "<X>", e["tok"])
    e["m"] = m.astype(np.int64)
    g = e.groupby("doc_id", sort=False)
    inp = g["out_tok"].agg(" ".join)
    # same sort=False grouping for every column — a batch whose rows are
    # not doc_id-sorted must still zip counts against the right doc
    n_masked = g["m"].sum()
    tgt = e[m].groupby("doc_id", sort=False)["tok"].agg(" ".join)
    out = pd.DataFrame(
        {
            "doc_id": inp.index.to_numpy(np.int64),
            "masked_input": inp.to_numpy(),
            "n_masked": n_masked.to_numpy(np.int64),
        }
    )
    out["target"] = pd.Series(out["doc_id"]).map(tgt).fillna("").to_numpy()
    return out


def span_mask(sf_dir: str) -> rd.Dataset:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(_span_mask_batch, batch_format="pandas")


SPAN_MASK_SQL = r"""
WITH t AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS tok,
           unnest(range(len(regexp_extract_all(lower(COALESCE(text, '')),
                                               '\w+')))) AS pos
    FROM documents
)
SELECT doc_id,
       string_agg(CASE WHEN pos % 7 = 3 THEN '<X>' ELSE tok END, ' '
                  ORDER BY pos) AS masked_input,
       CAST(COUNT(*) FILTER (WHERE pos % 7 = 3) AS BIGINT) AS n_masked,
       COALESCE(string_agg(tok, ' ' ORDER BY pos)
                    FILTER (WHERE pos % 7 = 3), '') AS target
FROM t GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# tokenization to vocab ids: build a top-100 vocabulary from corpus counts
# (gated combine, vocab-sized), broadcast it once, encode each document's
# first 32 tokens to rank ids (OOV -> 0) — the train -> broadcast -> encode
# shape of a real tokenizer stage, with the id table derived from the data
# rather than shipped per batch.

_VOCAB_K = 100
_TOK_MAXLEN = 32


def tokenize_ids(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"\w+")
    vocab = _word_count_vocab(sf_dir, driver_threshold)
    top = vocab.sort_values(
        ["n", "w"], ascending=[False, True], kind="mergesort"
    ).head(_VOCAB_K)
    import ray

    ids_ref = ray.put({w: i + 1 for i, w in enumerate(top["w"])})

    def _enc(df: pd.DataFrame, _i=ids_ref) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = df[["doc_id"]].join(words.rename("tok")).explode("tok").dropna()
        e["pos"] = e.groupby("doc_id").cumcount()
        e = e[e["pos"] < _TOK_MAXLEN]
        e["id"] = (
            e["tok"].map(ray.get(_i)).fillna(0).astype(np.int64).astype(str)
        )
        g = e.groupby("doc_id", sort=False)["id"].agg(",".join)
        return pd.DataFrame(
            {"doc_id": g.index.to_numpy(np.int64), "ids_csv": g.to_numpy()}
        )

    return docs.map_batches(_enc, batch_format="pandas")


TOKENIZE_IDS_SQL = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS tok,
           unnest(range(len(regexp_extract_all(lower(COALESCE(text, '')),
                                               '\w+')))) AS pos
    FROM documents
), c AS (
    SELECT tok AS w, COUNT(*) AS n FROM tok GROUP BY tok
), v AS (
    SELECT w, id FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS id FROM c
    ) WHERE id <= 100
), e AS (
    SELECT tok.doc_id, tok.pos, COALESCE(v.id, 0) AS id
    FROM tok LEFT JOIN v ON tok.tok = v.w
    WHERE tok.pos < 32
)
SELECT doc_id,
       string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
FROM e GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# degree histogram: distribution of per-user activity (distinct active
# days) — the degree-distribution profile of the user-day bipartite graph.
# Distinct (user, day) partials -> gated per-user degree -> driver bincount
# over degrees (degree-domain-sized, bounded by the calendar span).

def degree_histogram(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()

    def _deg_block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        return d.groupby("user_id", as_index=False).agg(degree=("day", "size"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    deg = _gated_grouped(
        partials, ["user_id"], _deg_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )
    # shrink user-grain to DEGREE grain in the workers before the driver
    # pull — the driver never holds a row per user (_gated_grouped always
    # returns a Dataset, including on its driver branch)
    dh = (
        deg.map_batches(
            lambda df: df.groupby("degree", as_index=False).agg(
                n=("degree", "size")
            ),
            batch_format="pandas",
        )
        .to_pandas()  # degree-domain grain
        .groupby("degree", as_index=False)
        .agg(n=("n", "sum"))
    )
    h = dh.set_index("degree")["n"].sort_index()
    return pd.DataFrame(
        {
            "degree": h.index.to_numpy(np.int64),
            "n_users": h.to_numpy(np.int64),
        }
    )


DEGREE_HISTOGRAM_SQL = """
WITH d AS (
    SELECT user_id,
           COUNT(DISTINCT epoch_us(ts) // 86400000000) AS degree
    FROM events GROUP BY user_id
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY degree
"""


# ---------------------------------------------------------------------------
# per-user behavioral entropy: Shannon entropy of each user's event-type
# distribution — the diversity score used to downweight monotone sources in
# data curation. (user, type, c) count partials shrink the shuffle to the
# count grain; per-user entropy is ONE fixed expression
# ln(n) - sum(c*ln(c))/n from exact integer counts, mirrored in the SQL
# (the ~5-term float sum's order noise sits at 1e-15, absorbed by the 6dp
# gate canon).

def _entropy_block(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["user_id", "event_type"], as_index=False).agg(
        c=("c", "sum")
    )
    cn = c["c"].to_numpy(np.int64).astype(np.float64)
    c["sl"] = cn * np.log(cn)
    a = c.groupby("user_id", as_index=False).agg(n=("c", "sum"), sl=("sl", "sum"))
    n = a["n"].to_numpy(np.int64).astype(np.float64)
    return pd.DataFrame(
        {
            "user_id": a["user_id"].astype("int64"),
            "n": a["n"].astype("int64"),
            "entropy": np.log(n) - a["sl"].to_numpy() / n,
        }
    )


def user_entropy(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False, sort=False)
        out = g.size().rename(columns={"size": "c"})
        return out

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["user_id"], _entropy_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


USER_ENTROPY_SQL = """
WITH c AS (
    SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
), a AS (
    SELECT user_id, SUM(c) AS n,
           SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS sl
    FROM c GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       LN(CAST(n AS DOUBLE)) - sl / CAST(n AS DOUBLE) AS entropy
FROM a
"""


SQL_QUERIES["span_mask"] = (span_mask, SPAN_MASK_SQL)
SQL_QUERIES["tokenize_ids"] = (tokenize_ids, TOKENIZE_IDS_SQL)
SQL_QUERIES["degree_histogram"] = (degree_histogram, DEGREE_HISTOGRAM_SQL)
SQL_QUERIES["user_entropy"] = (user_entropy, USER_ENTROPY_SQL)


# ---------------------------------------------------------------------------
# mixture report: per-source token counts and corpus share — the weights
# table a mixture-sampling stage consumes. Source-grain integer partials
# (sum of per-doc token counts), driver combine, share as one fixed double
# division from exact integers.

def mixture_report(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["source", "text"])
    word_re = re.compile(r"\w+")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ntok = df["text"].fillna("").str.lower().str.count(word_re).astype(
            "int64"
        )
        g = pd.DataFrame(
            {"source": df["source"].to_numpy(), "n_docs": 1, "n_tokens": ntok}
        )
        return g.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
        )

    parts = (
        docs.map_batches(_partial, batch_format="pandas")
        .to_pandas()  # source-grain
        .groupby("source", as_index=False)
        .sum()
    )
    total = int(parts["n_tokens"].sum())
    out = pd.DataFrame(
        {
            "source": parts["source"].to_numpy(),
            "n_docs": parts["n_docs"].astype("int64"),
            "n_tokens": parts["n_tokens"].astype("int64"),
            "token_share": parts["n_tokens"].to_numpy(np.int64).astype(
                np.float64
            )
            / float(total),
        }
    )
    return out.sort_values("source", kind="mergesort").reset_index(drop=True)


MIXTURE_REPORT_SQL = r"""
WITH d AS (
    SELECT source,
           len(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS ntok
    FROM documents
), a AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens
    FROM d GROUP BY source
), t AS (
    SELECT SUM(n_tokens) AS total FROM a
)
SELECT a.source, a.n_docs, a.n_tokens,
       CAST(a.n_tokens AS DOUBLE) / CAST(t.total AS DOUBLE) AS token_share
FROM a, t
ORDER BY a.source
"""


# ---------------------------------------------------------------------------
# chi-square independence test: is document language independent of source?
# The contingency table comes from (lang, source) count partials (cell-
# grain, tiny); expected counts and the statistic are ONE fixed double
# expression over exact integers, computed cell-by-cell in (lang, source)
# order on both sides (order noise absorbed by the 6dp canon). Emits the
# statistic and the table dimensions — the data-drift check a corpus
# refresh pipeline runs per epoch.

def chi_square(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", ["lang", "source"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False, sort=False)
        return g.size().rename(columns={"size": "c"})

    cells = (
        docs.map_batches(_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "source"], as_index=False)
        .agg(c=("c", "sum"))
    )
    n = int(cells["c"].sum())
    row_tot = cells.groupby("lang")["c"].sum()
    col_tot = cells.groupby("source")["c"].sum()
    o = cells["c"].to_numpy(np.int64).astype(np.float64)
    r = row_tot.loc[cells["lang"]].to_numpy(np.int64).astype(np.float64)
    cl = col_tot.loc[cells["source"]].to_numpy(np.int64).astype(np.float64)
    e = r * cl / float(n)
    chi2 = float(((o - e) * (o - e) / e).sum())
    return pd.DataFrame(
        {
            "n_langs": [int(len(row_tot))],
            "n_sources": [int(len(col_tot))],
            "n_cells": [int(len(cells))],
            "chi2": [chi2],
        }
    )


CHI_SQUARE_SQL = """
WITH c AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2
), r AS (
    SELECT lang, SUM(c) AS rt FROM c GROUP BY lang
), s AS (
    SELECT source, SUM(c) AS ct FROM c GROUP BY source
), t AS (
    SELECT SUM(c) AS n FROM c
), e AS (
    SELECT c.c,
           CAST(r.rt AS DOUBLE) * CAST(s.ct AS DOUBLE) / CAST(t.n AS DOUBLE)
               AS e
    FROM c JOIN r USING (lang) JOIN s USING (source), t
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS n_langs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       SUM((CAST(c AS DOUBLE) - e) * (CAST(c AS DOUBLE) - e) / e) AS chi2
FROM e
"""


# ---------------------------------------------------------------------------
# column profiling: the schema-health report a data engine prints before a
# run — per column: rows, nulls, exact distinct count. Per-batch partials
# carry per-column null counts (scalar) and per-column DISTINCT VALUE SETS
# (deduped per batch, stringified); the combine dedups the union per
# column. Distinct sets are value-domain-sized, not row-sized — user_id is
# the largest domain here; a column with row-sized cardinality would switch
# to the HLL sketch (grouped_hll) instead, which is why both live in the
# battery.

_PROFILE_COLS = ("user_id", "event_type", "value")


def profile_columns(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", list(_PROFILE_COLS))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in _PROFILE_COLS:
            col = df[c]
            vals = col.dropna().astype(str).unique()
            outs.append(
                pd.DataFrame(
                    {
                        "col": c,
                        "v": vals,
                        "n_rows": 0,
                        "n_null": 0,
                    }
                )
            )
            outs.append(
                pd.DataFrame(
                    {
                        "col": [c],
                        "v": [None],
                        "n_rows": [len(col)],
                        "n_null": [int(col.isna().sum())],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    def _combine_block(df: pd.DataFrame) -> pd.DataFrame:
        stats = df[df["v"].isna()].groupby("col", as_index=False).agg(
            n_rows=("n_rows", "sum"), n_null=("n_null", "sum")
        )
        dist = (
            df[df["v"].notna()][["col", "v"]]
            .drop_duplicates()
            .groupby("col", as_index=False)
            .agg(n_distinct=("v", "size"))
        )
        out = stats.merge(dist, on="col", how="left")
        out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        out["n_null"] = out["n_null"].astype("int64")
        return out[["col", "n_rows", "n_null", "n_distinct"]]

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["col"], _combine_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


PROFILE_COLUMNS_SQL = """
SELECT 'event_type' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT CAST(event_type AS VARCHAR)) AS BIGINT)
           AS n_distinct
FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
       CAST(COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS BIGINT)
FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(value) AS BIGINT),
       CAST(COUNT(DISTINCT CAST(value AS VARCHAR)) AS BIGINT)
FROM events
"""


# ---------------------------------------------------------------------------
# cohort retention: users cohorted by first-seen day; for each (cohort,
# day-offset) the fraction of the cohort active that day. ONE hash shuffle
# on user_id co-locates each user's full history; the block kernel derives
# first-seen + offsets per user vectorized and emits (cohort, offset)
# partials — matrix-grain (days x days), never user- or event-sized. Rate
# is one fixed double division from exact integers.

def _cohort_block(df: pd.DataFrame) -> pd.DataFrame:
    d = df.drop_duplicates()
    first = d.groupby("user_id")["day"].transform("min")
    out = pd.DataFrame(
        {
            "cohort_day": first.to_numpy(np.int64),
            "offset": d["day"].to_numpy(np.int64) - first.to_numpy(np.int64),
        }
    )
    return out.groupby(["cohort_day", "offset"], as_index=False).agg(
        n_active=("offset", "size")
    )


def cohort_retention(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()

    partials = ds.map_batches(_partial, batch_format="pandas")
    cells = (
        _gated_grouped(
            partials, ["user_id"], _cohort_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # matrix-grain
        .groupby(["cohort_day", "offset"], as_index=False)
        .agg(n_active=("n_active", "sum"))
    )
    size = (
        cells[cells["offset"] == 0]
        .set_index("cohort_day")["n_active"]
    )
    cs = size.loc[cells["cohort_day"]].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "cohort_day": cells["cohort_day"].astype("int64"),
            "offset": cells["offset"].astype("int64"),
            "n_active": cells["n_active"].astype("int64"),
            "retention": cells["n_active"].to_numpy(np.int64).astype(np.float64)
            / cs.astype(np.float64),
        }
    )
    return out.sort_values(
        ["cohort_day", "offset"], kind="mergesort"
    ).reset_index(drop=True)


COHORT_RETENTION_SQL = """
WITH d AS (
    SELECT DISTINCT user_id,
           epoch_us(ts) // 86400000000 AS day
    FROM events
), f AS (
    SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
), c AS (
    SELECT f.cohort_day, d.day - f.cohort_day AS "offset",
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM d JOIN f USING (user_id)
    GROUP BY 1, 2
), s AS (
    SELECT cohort_day, n_active AS cohort_size FROM c WHERE "offset" = 0
)
SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
       CAST(c."offset" AS BIGINT) AS "offset",
       c.n_active,
       CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM c JOIN s USING (cohort_day)
ORDER BY 1, 2
"""


SQL_QUERIES["mixture_report"] = (mixture_report, MIXTURE_REPORT_SQL)
SQL_QUERIES["chi_square"] = (chi_square, CHI_SQUARE_SQL)
SQL_QUERIES["profile_columns"] = (profile_columns, PROFILE_COLUMNS_SQL)
SQL_QUERIES["cohort_retention"] = (cohort_retention, COHORT_RETENTION_SQL)


# ---------------------------------------------------------------------------
# sweep-line max concurrency: per day, the maximum number of simultaneously
# open intervals (events open [ts, ts + cents-seconds]) — capacity planning
# over the crawl's own interval model. The classic sweep needs a GLOBAL
# running sum; the scale shape here avoids the global sort entirely:
# (1) day-grain delta totals (tiny partials) give each day's OPENING
# concurrency via one driver prefix over days; (2) one hash shuffle on day
# co-locates each day's boundaries, and the block kernel sweeps each day
# locally from its opening value. Ties at equal (t, d) are permutation-
# invariant for the per-day max (constant delta inside a tie group), so the
# result is deterministic at any parallelism.

def max_concurrency(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame | rd.Dataset:
    import ray

    ds = _read(sf_dir, "events", ["ts", "value"])

    def _bounds(df: pd.DataFrame) -> pd.DataFrame:
        s = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        dur = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        e = s + dur * 1_000_000
        t = np.concatenate([s, e])
        d = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]
        )
        return pd.DataFrame({"day": t // 86_400_000_000, "t": t, "d": d})

    bounds = ds.map_batches(_bounds, batch_format="pandas")

    # pass 1: day-grain delta totals -> opening concurrency per day
    def _day_sum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("day", as_index=False).agg(sd=("d", "sum"))

    days = (
        bounds.map_batches(_day_sum, batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)
        .agg(sd=("sd", "sum"))
        .sort_values("day")
    )
    opening = dict(
        zip(days["day"], days["sd"].cumsum().shift(1, fill_value=0).astype(int))
    )
    opening_ref = ray.put(opening)

    def _sweep_block(df: pd.DataFrame) -> pd.DataFrame:
        op = ray.get(opening_ref)
        df = df.sort_values(["day", "t", "d"], kind="mergesort")
        day = df["day"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        cum = np.cumsum(d)
        first_idx = np.flatnonzero(
            np.concatenate(([True], day[1:] != day[:-1]))
        )
        runs = np.diff(np.append(first_idx, len(df)))
        base = np.repeat(cum[first_idx] - d[first_idx], runs)
        conc = cum - base + pd.Series(day).map(op).to_numpy(np.int64)
        return (
            pd.DataFrame({"day": day, "conc": conc})
            .groupby("day", as_index=False)
            .agg(max_concurrent=("conc", "max"))
        )

    out = _gated_grouped(
        bounds, ["day"], _sweep_block,
        2 * _table_rows(sf_dir, "events"), driver_threshold,
    )
    res = (
        out.to_pandas()  # day-grain
        .groupby("day", as_index=False)
        .agg(max_concurrent=("max_concurrent", "max"))
    )
    res["day"] = res["day"].astype("int64")
    res["max_concurrent"] = res["max_concurrent"].astype("int64")
    return res.sort_values("day").reset_index(drop=True)


MAX_CONCURRENCY_SQL = """
WITH iv AS (
    SELECT epoch_us(ts) AS s_us,
           epoch_us(ts) + CAST(ROUND(value * 100) AS BIGINT) * 1000000 AS e_us
    FROM events
), b AS (
    SELECT s_us AS t, 1 AS d FROM iv
    UNION ALL
    SELECT e_us, -1 FROM iv
), c AS (
    SELECT t, SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS conc
    FROM b
)
SELECT CAST(t // 86400000000 AS BIGINT) AS day,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM c GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q5-style nation revenue: the 4-table star chain lineitem -> orders ->
# customer -> nation, grouped revenue in exact integer e4 units (the q1
# doctrine). Small regime: two broadcast key maps, zero shuffles. Large
# regime (orders past the bound): lineitem pre-aggregates to ORDER grain
# per batch, ONE Dataset.join ships order-grain rows (never lineitem-grain),
# a hash-shuffle combine collapses to CUSTOMER grain, the second hop gates
# broadcast-vs-join on customer size, and nation (25 rows) always
# broadcasts.

def q5_nation_revenue(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    import ray

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    nation = (
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])
        .to_pandas().set_index("n_nationkey")["n_name"].to_dict()
    )

    def _li_partial(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(
            df["l_extendedprice"].to_numpy() * 100.0
        ).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100.0).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "rev": price_c * (100 - disc),
                "n": 1,
            }
        )
        return g.groupby("l_orderkey", as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum")
        )

    lp = li.map_batches(_li_partial, batch_format="pandas")

    if _table_rows(sf_dir, "orders") <= driver_threshold:
        o2c = (
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
            .to_pandas().set_index("o_orderkey")["o_custkey"].to_dict()
        )
        c2n = (
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            .to_pandas().set_index("c_custkey")["c_nationkey"].to_dict()
        )
        o2c_ref, c2n_ref = ray.put(o2c), ray.put(c2n)

        def _to_nation(df: pd.DataFrame, _o=o2c_ref, _c=c2n_ref) -> pd.DataFrame:
            oc, cn = ray.get(_o), ray.get(_c)
            nk = df["l_orderkey"].map(oc).map(cn)
            g = pd.DataFrame(
                {"n_nationkey": nk.to_numpy(np.int64),
                 "rev": df["rev"].to_numpy(np.int64),
                 "n": df["n"].to_numpy(np.int64)}
            )
            return g.groupby("n_nationkey", as_index=False).agg(
                rev=("rev", "sum"), n=("n", "sum")
            )

        agg = (
            lp.map_batches(_to_nation, batch_format="pandas")
            .to_pandas()  # nation-grain
            .groupby("n_nationkey", as_index=False)
            .sum()
        )
    else:
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        n_parts = max(8, min(_table_rows(sf_dir, "orders") // 2_000_000 + 1, 512))
        j1 = lp.join(
            orders, join_type="inner", num_partitions=n_parts,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def _cust_grain(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("o_custkey", as_index=False).agg(
                rev=("rev", "sum"), n=("n", "sum")
            )

        cg = hash_partitioned_map_batches(j1, ["o_custkey"], _cust_grain)
        if _table_rows(sf_dir, "customer") <= driver_threshold:
            c2n = (
                _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
                .to_pandas().set_index("c_custkey")["c_nationkey"].to_dict()
            )
            c2n_ref = ray.put(c2n)

            def _nat(df: pd.DataFrame, _c=c2n_ref) -> pd.DataFrame:
                g = pd.DataFrame(
                    {
                        "n_nationkey": df["o_custkey"].map(
                            ray.get(_c)
                        ).to_numpy(np.int64),
                        "rev": df["rev"].to_numpy(np.int64),
                        "n": df["n"].to_numpy(np.int64),
                    }
                )
                return g.groupby("n_nationkey", as_index=False).agg(
                    rev=("rev", "sum"), n=("n", "sum")
                )

            ng = cg.map_batches(_nat, batch_format="pandas")
        else:
            cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
            j2 = cg.join(
                cust, join_type="inner",
                num_partitions=max(
                    8, min(_table_rows(sf_dir, "customer") // 2_000_000 + 1, 512)
                ),
                on=("o_custkey",), right_on=("c_custkey",),
            )

            def _nat2(df: pd.DataFrame) -> pd.DataFrame:
                return df.groupby("c_nationkey", as_index=False).agg(
                    rev=("rev", "sum"), n=("n", "sum")
                ).rename(columns={"c_nationkey": "n_nationkey"})

            ng = j2.map_batches(_nat2, batch_format="pandas")
        agg = (
            ng.to_pandas()  # nation-grain
            .groupby("n_nationkey", as_index=False)
            .sum()
        )
    out = pd.DataFrame(
        {
            "n_name": agg["n_nationkey"].map(nation).to_numpy(),
            "revenue_e4": agg["rev"].astype("int64"),
            "n_rows": agg["n"].astype("int64"),
        }
    )
    return out.sort_values("n_name", kind="mergesort").reset_index(drop=True)


Q5_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_e4,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# out-of-order arrival report: per user, how many events arrived (by
# event_id order — the ingest sequence) with a timestamp EARLIER than the
# running max — the watermark-health metric a streaming pipeline monitors.
# One hash shuffle on user_id; block kernel = one stable sort + vectorized
# running max (np.maximum.accumulate).

def _ooo_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    first = np.concatenate(([True], uid[1:] != uid[:-1])) if len(df) else np.zeros(0, bool)
    # segmented running max via the offset trick: normalize ts to the block
    # min (a month-scale span uses ~2^41 of the int64 range), then add
    # seg_id * (span+1) so later segments strictly dominate earlier ones —
    # one global np.maximum.accumulate then restarts per user for free.
    # Overflow guard: users-per-block x span must stay under 2^63 (holds to
    # ~3M users per block at a month span; assert rather than corrupt).
    if len(df):
        seg_id = np.cumsum(first) - 1
        tsn = ts - ts.min()
        stride = np.int64(tsn.max()) + 1
        assert int(seg_id[-1]) * int(stride) < (1 << 62), "ooo block overflow"
        adj = tsn + seg_id * stride
        prev = np.empty(len(df), dtype=np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = np.maximum.accumulate(adj)[:-1]
        late = np.zeros(len(df), dtype=bool)
        late[~first] = adj[~first] < prev[~first]
    else:
        late = np.zeros(0, dtype=bool)
    out = pd.DataFrame({"user_id": uid, "late": late.astype(np.int64), "n": 1})
    return out.groupby("user_id", as_index=False).agg(
        n_events=("n", "sum"), n_late=("late", "sum")
    )


def ooo_events(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _ooo_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


OOO_EVENTS_SQL = """
WITH v AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), m AS (
    SELECT user_id, ts_us,
           MAX(ts_us) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_max
    FROM v
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE ts_us < prev_max) AS BIGINT) AS n_late
FROM m GROUP BY user_id
"""


SQL_QUERIES["max_concurrency"] = (max_concurrency, MAX_CONCURRENCY_SQL)
SQL_QUERIES["q5_nation_revenue"] = (q5_nation_revenue, Q5_SQL)
SQL_QUERIES["ooo_events"] = (ooo_events, OOO_EVENTS_SQL)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (record linkage): candidate pairs are rows
# within rank distance <= 2 in the global (p_name, p_partkey) sort order
# that share a 6-char name prefix — the SNM alternative to fuzzy_join's
# attribute blocking. The distributed shape is the interesting part: a
# global sort's ADJACENCY crosses block boundaries, so the engine emits
# (1) local pairs inside each pinned sorted block and (2) the <= 4 EDGE
# rows per block with exact global ranks (block row-count prefix); the
# driver stitches only edge-row pairs whose members sit in DIFFERENT
# blocks — block-grain driver state, never row-grain.

_SNM_WINDOW = 2
_SNM_PREFIX = 6


def _snm_pairs_local(name: np.ndarray, pk: np.ndarray):
    pfx = pd.Series(name).str[:_SNM_PREFIX].to_numpy()
    outs = []
    for w in range(1, _SNM_WINDOW + 1):
        if len(name) <= w:
            continue
        keep = pfx[:-w] == pfx[w:]
        outs.append(
            pd.DataFrame(
                {
                    "part_a": pk[:-w][keep],
                    "part_b": pk[w:][keep],
                    "rank_dist": np.int64(w),
                }
            )
        )
    if not outs:
        return pd.DataFrame(
            {"part_a": pd.Series(dtype="int64"),
             "part_b": pd.Series(dtype="int64"),
             "rank_dist": pd.Series(dtype="int64")}
        )
    return pd.concat(outs, ignore_index=True)


def sorted_neighborhood(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])
    n_rows = _table_rows(sf_dir, "part")

    if n_rows <= driver_threshold:
        df = ds.to_pandas().sort_values(
            ["p_name", "p_partkey"], kind="mergesort"
        ).reset_index(drop=True)
        out = _snm_pairs_local(
            df["p_name"].to_numpy(), df["p_partkey"].to_numpy(np.int64)
        )
        return out.sort_values(["part_a", "part_b"], kind="mergesort").reset_index(
            drop=True
        )

    ranged = ds.sort(["p_name", "p_partkey"]).materialize()

    # pass 1: local pairs inside each sorted block
    def _local(df: pd.DataFrame) -> pd.DataFrame:
        return _snm_pairs_local(
            df["p_name"].to_numpy(), df["p_partkey"].to_numpy(np.int64)
        )

    local_pairs = ranged.map_batches(
        _local, batch_format="pandas", batch_size=None
    ).to_pandas()  # output-sized (candidate pairs), not corpus-sized

    # pass 2: block edges (first/last WINDOW rows) + row counts
    def _edges(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {"p_name": pd.Series(dtype=object),
                 "p_partkey": pd.Series(dtype="int64"),
                 "pos": pd.Series(dtype="int64"),
                 "blk_name": pd.Series(dtype=object),
                 "blk_pk": pd.Series(dtype="int64"),
                 "blk_rows": pd.Series(dtype="int64")}
            )
        idx = sorted(set(range(min(_SNM_WINDOW, n))) | {
            i for i in range(max(0, n - _SNM_WINDOW), n)
        })
        sub = df.iloc[idx]
        return pd.DataFrame(
            {
                "p_name": sub["p_name"].to_numpy(),
                "p_partkey": sub["p_partkey"].to_numpy(np.int64),
                "pos": np.array(idx, dtype=np.int64),
                "blk_name": df["p_name"].iloc[0],
                "blk_pk": np.int64(df["p_partkey"].iloc[0]),
                "blk_rows": np.int64(n),
            }
        )

    edges = ranged.map_batches(
        _edges, batch_format="pandas", batch_size=None
    ).to_pandas()  # block-grain: <= 2*WINDOW rows per block
    blocks = (
        edges[["blk_name", "blk_pk", "blk_rows"]]
        .drop_duplicates()
        .sort_values(["blk_name", "blk_pk"], kind="mergesort")
        .reset_index(drop=True)
    )
    blocks["offset"] = blocks["blk_rows"].cumsum().shift(1, fill_value=0)
    blocks["blk_id"] = np.arange(len(blocks), dtype=np.int64)
    edges = edges.merge(blocks, on=["blk_name", "blk_pk", "blk_rows"])
    edges["rank"] = edges["offset"] + edges["pos"]
    edges = edges.sort_values("rank", kind="mergesort").reset_index(drop=True)
    # cross-block pairs only: rank distance <= WINDOW, different blocks
    cross = []
    rk = edges["rank"].to_numpy(np.int64)
    bk = edges["blk_id"].to_numpy(np.int64)
    nm = edges["p_name"].to_numpy()
    pk = edges["p_partkey"].to_numpy(np.int64)
    for w in range(1, _SNM_WINDOW + 1):
        for i in range(len(edges)):
            j = i + 1
            while j < len(edges) and rk[j] - rk[i] <= w:
                if rk[j] - rk[i] == w and bk[j] != bk[i] and (
                    nm[i][:_SNM_PREFIX] == nm[j][:_SNM_PREFIX]
                ):
                    cross.append((pk[i], pk[j], w))
                j += 1
    cross_df = pd.DataFrame(
        cross, columns=["part_a", "part_b", "rank_dist"]
    ) if cross else pd.DataFrame(
        {"part_a": pd.Series(dtype="int64"),
         "part_b": pd.Series(dtype="int64"),
         "rank_dist": pd.Series(dtype="int64")}
    )
    out = pd.concat([local_pairs, cross_df], ignore_index=True)
    out["part_a"] = out["part_a"].astype("int64")
    out["part_b"] = out["part_b"].astype("int64")
    out["rank_dist"] = out["rank_dist"].astype("int64")
    return out.sort_values(
        ["part_a", "part_b", "rank_dist"], kind="mergesort"
    ).reset_index(drop=True)


SORTED_NEIGHBORHOOD_SQL = """
WITH r AS (
    SELECT p_partkey, p_name,
           ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rn
    FROM part
)
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(b.rn - a.rn AS BIGINT) AS rank_dist
FROM r a JOIN r b ON b.rn - a.rn IN (1, 2)
WHERE substr(a.p_name, 1, 6) = substr(b.p_name, 1, 6)
ORDER BY 1, 2, 3
"""


SQL_QUERIES["sorted_neighborhood"] = (sorted_neighborhood, SORTED_NEIGHBORHOOD_SQL)


# ---------------------------------------------------------------------------
# CDC merge: apply a changelog to reach final state — last op per key wins
# in (ts, event_id) order; a trailing delete removes the key (the
# upsert/delete compaction every incremental table maintains). The events
# table doubles as the changelog: event_type 'view' is a delete, everything
# else upserts the value. Per-batch argmax partials carry one (key, last_ts,
# last_id, op, value) row per key per batch — mergeable, so the shuffle is
# key-grain; the gated combine re-runs the same argmax then drops deletes.

def _cdc_pick_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(
        ["user_id", "ts_us", "event_id"], ascending=[True, False, False],
        kind="mergesort",
    )
    last = df.drop_duplicates("user_id", keep="first")
    live = last[last["op"] == 0]
    return pd.DataFrame(
        {
            "user_id": live["user_id"].astype("int64"),
            "ts_us": live["ts_us"].astype("int64"),
            "event_id": live["event_id"].astype("int64"),
            "value_c": live["value_c"].astype("int64"),
            "op": live["op"].astype("int64"),
        }
    )


def cdc_merge(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].to_numpy(np.int64),
                "value_c": np.round(
                    df["value"].to_numpy() * 100.0
                ).astype(np.int64),
                "op": (df["event_type"] == "view").to_numpy().astype(np.int64),
            }
        )
        # keep only each key's last row per batch (mergeable argmax) but
        # RETAIN deletes — a delete can win the global argmax
        out = out.sort_values(
            ["user_id", "ts_us", "event_id"], ascending=[True, False, False],
            kind="mergesort",
        )
        return out.drop_duplicates("user_id", keep="first")

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["user_id"], _cdc_pick_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


CDC_MERGE_SQL = """
WITH log AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c,
           CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS op
    FROM events
), r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
    ) AS rn
    FROM log
)
SELECT user_id, ts_us, event_id, value_c, CAST(op AS BIGINT) AS op
FROM r WHERE rn = 1 AND op = 0
"""


# ---------------------------------------------------------------------------
# stream-stream window join: pairs of events by the SAME user within 300 s
# of each other, counted per unordered type pair — the self-join-in-time
# every co-click/co-visit feature needs. One hash shuffle on user_id; the
# block kernel sweeps lags vectorized (lag j compares two shifted slices;
# the loop runs until no pair at lag j fits the window — bounded by max
# events per user per window, NOT by group size), emitting type-pair-grain
# partials.

_WINDOW_JOIN_US = 300 * 1_000_000


def _window_join_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    outs = []
    j = 1
    while j < len(df):
        same = uid[j:] == uid[:-j]
        close = (ts[j:] - ts[:-j]) <= _WINDOW_JOIN_US
        m = same & close
        if not m.any():
            break
        a, b = et[:-j][m], et[j:][m]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        outs.append(pd.DataFrame({"type_a": lo[keep], "type_b": hi[keep]}))
        j += 1
    if not outs:
        return pd.DataFrame(
            {"type_a": pd.Series(dtype=object),
             "type_b": pd.Series(dtype=object),
             "n": pd.Series(dtype="int64")}
        )
    allp = pd.concat(outs, ignore_index=True)
    return allp.groupby(["type_a", "type_b"], as_index=False).agg(
        n=("type_a", "size")
    )


def window_pair_join(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_type": df["event_type"].to_numpy(),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    parts = _gated_grouped(
        prepped, ["user_id"], _window_join_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )
    out = (
        parts.to_pandas()  # type-pair-grain
        .groupby(["type_a", "type_b"], as_index=False)
        .agg(n_pairs=("n", "sum"))
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["type_a", "type_b"], kind="mergesort").reset_index(
        drop=True
    )


WINDOW_PAIR_JOIN_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
)
SELECT LEAST(a.event_type, b.event_type) AS type_a,
       GREATEST(a.event_type, b.event_type) AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM v a JOIN v b
  ON a.user_id = b.user_id
 AND b.ts_us - a.ts_us BETWEEN 0 AND 300000000
 AND (a.ts_us < b.ts_us OR (a.ts_us = b.ts_us AND a.event_id < b.event_id))
 AND a.event_type <> b.event_type
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# sort-merge join: the second physical join plan — co-partition both sides
# with ONE tagged-union hash shuffle, then an in-block pandas merge (sorted
# probe). Same logical result as hash_join's plans; a row-count-per-order
# projection keeps the oracle small. The tagged union moves each side
# exactly once and never builds a driver-side map, so it is the preferred
# plan when BOTH sides are corpus-sized (broadcast needs a small side,
# Dataset.join spawns its aggregator fleet).

def _smj_block(df: pd.DataFrame) -> pd.DataFrame:
    o = df[df["side"] == 0]
    li = df[df["side"] == 1]
    m = o[["k", "o_totalprice_c"]].merge(
        li[["k", "n"]], on="k", how="inner"
    )
    g = m.groupby(["k", "o_totalprice_c"], as_index=False).agg(
        n_items=("n", "sum")
    )
    return pd.DataFrame(
        {
            "o_orderkey": g["k"].astype("int64"),
            "o_totalprice_c": g["o_totalprice_c"].astype("int64"),
            "n_items": g["n_items"].astype("int64"),
        }
    )


def merge_join(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def _tag_o(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["o_orderkey"].to_numpy(np.int64),
                "side": np.int8(0),
                "o_totalprice_c": np.round(
                    df["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
                "n": np.int64(0),
            }
        )

    def _tag_l(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64), "n": 1})
            .groupby("k", as_index=False)
            .agg(n=("n", "sum"))
        )
        g["side"] = np.int8(1)
        g["o_totalprice_c"] = np.int64(0)
        return g[["k", "side", "o_totalprice_c", "n"]]

    tagged = orders.map_batches(_tag_o, batch_format="pandas").union(
        li.map_batches(_tag_l, batch_format="pandas")
    )
    n = _table_rows(sf_dir, "orders") + _table_rows(sf_dir, "lineitem")
    return _gated_grouped(tagged, ["k"], _smj_block, n, driver_threshold)


MERGE_JOIN_SQL = """
SELECT o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


SQL_QUERIES["cdc_merge"] = (cdc_merge, CDC_MERGE_SQL)
SQL_QUERIES["window_pair_join"] = (window_pair_join, WINDOW_PAIR_JOIN_SQL)
SQL_QUERIES["merge_join"] = (merge_join, MERGE_JOIN_SQL)


# ---------------------------------------------------------------------------
# stratified train/val/test split: exact 80/10/10 WITHIN each source (the
# global hash split drifts per stratum; mixture curation needs the
# per-source fractions exact). Deterministic rank = Knuth hash of doc_id
# (ties by id) inside each source; one hash shuffle on source (gated), the
# block kernel ranks vectorized. floor(0.8n)/floor(0.9n) cutoffs match the
# SQL integer arithmetic exactly.

def _strat_split_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
    src = df["source"].to_numpy()
    first = np.concatenate(([True], src[1:] != src[:-1])) if len(df) else (
        np.zeros(0, bool)
    )
    seg_start = np.flatnonzero(first)
    runs = np.diff(np.append(seg_start, len(df)))
    rank = np.arange(len(df), dtype=np.int64) - np.repeat(seg_start, runs) + 1
    n = np.repeat(runs, runs).astype(np.int64)
    split = np.where(
        rank <= n * 80 // 100, "train",
        np.where(rank <= n * 90 // 100, "val", "test"),
    )
    return pd.DataFrame(
        {"doc_id": df["doc_id"].astype("int64"), "split": split}
    )


def stratified_split(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "source": df["source"].to_numpy(),
                "h": _knuth_hash_u32(ids).astype("int64"),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["source"], _strat_split_block,
        _table_rows(sf_dir, "documents"), driver_threshold,
    )


STRATIFIED_SPLIT_SQL = """
WITH h AS (
    SELECT doc_id, source,
           (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761) % 4294967296 AS h
    FROM documents
), r AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n
    FROM h
)
SELECT doc_id,
       CASE WHEN rn <= n * 80 // 100 THEN 'train'
            WHEN rn <= n * 90 // 100 THEN 'val'
            ELSE 'test' END AS split
FROM r
"""


# ---------------------------------------------------------------------------
# MAD outlier report: robust per-type outlier detection — median and median
# absolute deviation instead of mean/sd (grouped_outliers' 3-sigma rule
# breaks under heavy tails; 5*MAD doesn't). The whole computation runs on
# the (type, value) HISTOGRAM: per-batch count partials shrink the shuffle
# to the value-domain grain, the block kernel finds the rank-(50n+99)//100
# median from cumulative counts, derives the |x-med| distribution FROM THE
# SAME histogram (no second data pass), and counts outliers > 5*MAD —
# all exact integers, bit-identical at any split.

def _mad_block(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["event_type", "x"], as_index=False).agg(c=("c", "sum"))
    outs = []
    for et, grp in c.groupby("event_type", sort=False):
        grp = grp.sort_values("x", kind="mergesort")
        v = grp["x"].to_numpy(np.int64)
        cnt = grp["c"].to_numpy(np.int64)
        n = int(cnt.sum())
        rank = (50 * n + 99) // 100
        med = int(v[np.searchsorted(np.cumsum(cnt), rank)])
        ad = np.abs(v - med)
        order = np.argsort(ad, kind="mergesort")
        mad = int(ad[order][np.searchsorted(np.cumsum(cnt[order]), rank)])
        n_out = int(cnt[ad > 5 * mad].sum())
        outs.append((et, med, mad, n_out, n))
    return pd.DataFrame(
        outs, columns=["event_type", "med_c", "mad_c", "n_outliers", "n"]
    ).astype({"med_c": "int64", "mad_c": "int64",
              "n_outliers": "int64", "n": "int64"})


def mad_outliers(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "x": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
                "c": 1,
            }
        )
        return g.groupby(["event_type", "x"], as_index=False).agg(c=("c", "sum"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["event_type"], _mad_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


MAD_OUTLIERS_SQL = """
WITH v AS (
    SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x FROM events
), r AS (
    SELECT event_type, x,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM v
), m AS (
    SELECT event_type,
           MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN x END) AS med,
           MAX(n) AS n
    FROM r GROUP BY 1
), d AS (
    SELECT v.event_type, ABS(v.x - m.med) AS ad, m.med FROM v
    JOIN m USING (event_type)
), r2 AS (
    SELECT event_type, ad, med,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM d
), m2 AS (
    SELECT event_type, MAX(med) AS med,
           MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN ad END) AS mad
    FROM r2 GROUP BY 1
)
SELECT v.event_type, CAST(m2.med AS BIGINT) AS med_c,
       CAST(m2.mad AS BIGINT) AS mad_c,
       CAST(COUNT(*) FILTER (WHERE ABS(v.x - m2.med) > 5 * m2.mad)
            AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n
FROM v JOIN m2 USING (event_type)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# daily deltas: per (day, event_type) counts with day-over-day change — the
# report row a monitoring dashboard reads. Day x type grain partials (tiny),
# driver LAG over existing rows per type (gap days lag to the previous
# EXISTING day, SQL-identical).

def daily_deltas(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(), "day": day, "n": 1}
        )
        return g.groupby(["event_type", "day"], as_index=False).agg(
            n=("n", "sum")
        )

    cells = (
        ds.map_batches(_partial, batch_format="pandas")
        .to_pandas()  # day x type grain
        .groupby(["event_type", "day"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    prev = cells.groupby("event_type")["n"].shift(1)
    cells["delta"] = (cells["n"] - prev).fillna(0).astype("int64")
    cells["day"] = cells["day"].astype("int64")
    cells["n"] = cells["n"].astype("int64")
    return cells.reset_index(drop=True)


DAILY_DELTAS_SQL = """
WITH c AS (
    SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(day AS BIGINT) AS day, n,
       CAST(COALESCE(n - LAG(n) OVER (
           PARTITION BY event_type ORDER BY day
       ), 0) AS BIGINT) AS delta
FROM c
"""


SQL_QUERIES["stratified_split"] = (stratified_split, STRATIFIED_SPLIT_SQL)
SQL_QUERIES["mad_outliers"] = (mad_outliers, MAD_OUTLIERS_SQL)
SQL_QUERIES["daily_deltas"] = (daily_deltas, DAILY_DELTAS_SQL)


# ---------------------------------------------------------------------------
# daily percentiles: p50/p95 of the value distribution per calendar day —
# the SLO-dashboard time series. Same bounded-domain histogram doctrine as
# grouped_percentiles/mad_outliers: (day, value) count partials, per-day
# ceil-rank selection from cumulative counts, exact integers throughout.

def _daily_pctl_block(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["day", "x"], as_index=False).agg(c=("c", "sum"))
    outs = []
    for day, grp in c.groupby("day", sort=False):
        grp = grp.sort_values("x", kind="mergesort")
        v = grp["x"].to_numpy(np.int64)
        cnt = np.cumsum(grp["c"].to_numpy(np.int64))
        n = int(cnt[-1])
        p50 = int(v[np.searchsorted(cnt, (50 * n + 99) // 100)])
        p95 = int(v[np.searchsorted(cnt, (95 * n + 99) // 100)])
        outs.append((day, n, p50, p95))
    return pd.DataFrame(
        outs, columns=["day", "n", "p50_c", "p95_c"]
    ).astype("int64")


def daily_percentiles(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "day": df["ts"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000,
                "x": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
                "c": 1,
            }
        )
        return g.groupby(["day", "x"], as_index=False).agg(c=("c", "sum"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["day"], _daily_pctl_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


DAILY_PCTL_SQL = """
WITH v AS (
    SELECT epoch_us(ts) // 86400000000 AS day,
           CAST(ROUND(value * 100) AS BIGINT) AS x
    FROM events
), r AS (
    SELECT day, x,
           ROW_NUMBER() OVER (PARTITION BY day ORDER BY x) AS rn,
           COUNT(*) OVER (PARTITION BY day) AS n
    FROM v
)
SELECT CAST(day AS BIGINT) AS day, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN x END)
            AS BIGINT) AS p50_c,
       CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN x END)
            AS BIGINT) AS p95_c
FROM r GROUP BY day
"""


# ---------------------------------------------------------------------------
# first/last-touch attribution: per user, the event type that opened and
# the one that closed their history (by (ts, event_id) order) plus totals —
# the marketing-attribution staple. Per-batch partials reduce each batch to
# one (user, first_ts, first_id, first_type, last_..., n) row per key —
# mergeable min/max WITH payloads, so the shuffle is key-grain.

def _attribution_block(df: pd.DataFrame) -> pd.DataFrame:
    # first-touch by the FIRST-event coords, last-touch by the LAST-event
    # coords — partials from interleaving batches (out-of-order timestamps
    # are real in this data, see ooo_events) differ on the two orderings,
    # so each side needs its own sort
    asc = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    first = asc.drop_duplicates("user_id", keep="first").set_index("user_id")
    desc = df.sort_values(
        ["user_id", "last_ts_us", "last_event_id"], kind="mergesort"
    )
    last = desc.drop_duplicates("user_id", keep="last").set_index("user_id")
    n = df.groupby("user_id")["n"].sum()
    uid = first.index
    return pd.DataFrame(
        {
            "user_id": uid.to_numpy(np.int64),
            "ts_us": first["ts_us"].to_numpy(np.int64),
            "event_id": first["event_id"].to_numpy(np.int64),
            "first_type": first["first_type"].to_numpy(),
            "last_ts_us": last["last_ts_us"].loc[uid].to_numpy(np.int64),
            "last_event_id": last["last_event_id"].loc[uid].to_numpy(np.int64),
            "last_type": last["last_type"].loc[uid].to_numpy(),
            "n": n.loc[uid].to_numpy(np.int64),
        }
    )


def attribution(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].to_numpy(np.int64),
                "first_type": df["event_type"].to_numpy(),
            }
        )
        asc = b.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        first = asc.drop_duplicates("user_id", keep="first")
        last = asc.drop_duplicates("user_id", keep="last")
        out = first.copy()
        li = last.set_index("user_id")
        out["last_ts_us"] = li["ts_us"].loc[out["user_id"]].to_numpy(np.int64)
        out["last_event_id"] = li["event_id"].loc[out["user_id"]].to_numpy(
            np.int64
        )
        out["last_type"] = li["first_type"].loc[out["user_id"]].to_numpy()
        out["n"] = asc.groupby("user_id").size().loc[out["user_id"]].to_numpy(
            np.int64
        )
        return out

    partials = ds.map_batches(_partial, batch_format="pandas")
    res = _gated_grouped(
        partials, ["user_id"], _attribution_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return df[["user_id", "first_type", "last_type", "n"]].sort_values(
        "user_id"
    ).reset_index(drop=True)


ATTRIBUTION_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
), r AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS rf,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
           ) AS rl,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM v
)
SELECT user_id,
       MAX(CASE WHEN rf = 1 THEN event_type END) AS first_type,
       MAX(CASE WHEN rl = 1 THEN event_type END) AS last_type,
       CAST(MAX(n) AS BIGINT) AS n
FROM r GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# referential-integrity report: the pre-flight data-quality check — how
# many child rows point at missing parents and how many parents have no
# children, both directions. Small regime: parent/child key DOMAINS ship
# once as SORTED numpy arrays (np.isin, C-speed) — never python sets.
# Large regime (orders past the bound): per-batch partials shrink both
# sides to key-grain (k, n_li) / (k, is_order) rows, ONE tagged-union hash
# shuffle co-locates each key, and the block kernel emits 4 scalar
# partials per block — nothing key-sized ever touches the driver. (The
# first cut broadcast 15M-key python sets and measured 500 s at sf10;
# this shape runs in ~20 s, BASELINE.md batch 17.)

def _ref_block(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("k").agg(
        n_li=("n_li", "sum"), is_order=("is_order", "max")
    )
    n_orders = int(g["is_order"].sum())
    childless = int(((g["is_order"] == 1) & (g["n_li"] == 0)).sum())
    n_li = int(g["n_li"].sum())
    orphan = int(g.loc[g["is_order"] == 0, "n_li"].sum())
    return pd.DataFrame(
        {
            "n_orders": [n_orders],
            "n_childless_orders": [childless],
            "n_lineitems": [n_li],
            "n_orphan_lineitems": [orphan],
        }
    )


def referential_report(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    import ray

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    if _table_rows(sf_dir, "orders") <= driver_threshold:
        okeys = np.sort(orders.to_pandas()["o_orderkey"].to_numpy(np.int64))
        okeys_ref = ray.put(okeys)

        def _li_part(df: pd.DataFrame, _o=okeys_ref) -> pd.DataFrame:
            k = df["l_orderkey"].to_numpy(np.int64)
            ok = np.isin(k, ray.get(_o), assume_unique=False)
            u = pd.DataFrame({"k": np.unique(k)})
            return pd.DataFrame(
                {
                    "n_li": [len(k)],
                    "n_li_orphan": [int((~ok).sum())],
                    "keys": [u["k"].to_numpy().tobytes()],
                }
            )

        parts = li.map_batches(_li_part, batch_format="pandas").to_pandas()
        lkeys = np.unique(
            np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in parts["keys"]]
            )
            if len(parts)
            else np.array([], dtype=np.int64)
        )
        childless = int((~np.isin(okeys, lkeys)).sum())
        return pd.DataFrame(
            {
                "n_orders": [len(okeys)],
                "n_childless_orders": [childless],
                "n_lineitems": [int(parts["n_li"].sum())],
                "n_orphan_lineitems": [int(parts["n_li_orphan"].sum())],
            }
        )

    def _tag_o(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["o_orderkey"].to_numpy(np.int64),
                "n_li": np.int64(0),
                "is_order": np.int8(1),
            }
        )

    def _tag_l(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame({"k": df["l_orderkey"].to_numpy(np.int64), "n_li": 1})
            .groupby("k", as_index=False)
            .agg(n_li=("n_li", "sum"))
        )
        g["is_order"] = np.int8(0)
        return g

    tagged = orders.map_batches(_tag_o, batch_format="pandas").union(
        li.map_batches(_tag_l, batch_format="pandas")
    )
    blocks = hash_partitioned_map_batches(tagged, ["k"], _ref_block).to_pandas()
    return pd.DataFrame({c: [int(blocks[c].sum())] for c in blocks.columns})


REFERENTIAL_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        )) AS n_childless_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitems,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        )) AS n_orphan_lineitems
"""


SQL_QUERIES["daily_percentiles"] = (daily_percentiles, DAILY_PCTL_SQL)
SQL_QUERIES["attribution"] = (attribution, ATTRIBUTION_SQL)
SQL_QUERIES["referential_report"] = (referential_report, REFERENTIAL_SQL)


# ---------------------------------------------------------------------------
# DSIR-style importance scores: rank documents by how much more likely
# their tokens are under a TARGET unigram LM (here: the lang='en' slice)
# than under the SOURCE LM (the whole corpus) — data-selection-by-
# importance-resampling's scoring stage. Two count passes share one
# partial kernel; both vocab tables combine gated and broadcast once; the
# score is sum(ln(c_t / N_t) - ln(c_s / N_s)) / n over the doc's tokens
# that exist in BOTH vocabs (smoothing-free, mirrored in the SQL join).

def dsir_scores(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    import ray

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    word_re = re.compile(r"\w+")

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = pd.DataFrame(
            {"w": words.explode().dropna(),
             "tgt": np.repeat((df["lang"] == "en").to_numpy(),
                              words.str.len().fillna(0).astype(int))}
        )
        g = e.groupby(["w", "tgt"], as_index=False).agg(n=("tgt", "size"))
        return g

    partials = docs.map_batches(_counts, batch_format="pandas")

    def _sum_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["w", "tgt"], as_index=False).agg(n=("n", "sum"))

    vocab = _gated_grouped(
        partials, ["w", "tgt"], _sum_block,
        _table_rows(sf_dir, "documents"), driver_threshold,
    ).to_pandas()  # vocab-sized
    src_counts = vocab.groupby("w", as_index=False).agg(n=("n", "sum"))
    tgt_counts = vocab[vocab["tgt"]].groupby("w", as_index=False).agg(
        n=("n", "sum")
    )
    n_src = int(src_counts["n"].sum())
    n_tgt = int(tgt_counts["n"].sum())
    src_ref = ray.put(dict(zip(src_counts["w"], src_counts["n"].astype("int64"))))
    tgt_ref = ray.put(dict(zip(tgt_counts["w"], tgt_counts["n"].astype("int64"))))
    ln_ns, ln_nt = float(np.log(float(n_src))), float(np.log(float(n_tgt)))

    def _score(df: pd.DataFrame, _s=src_ref, _t=tgt_ref) -> pd.DataFrame:
        sm, tm = ray.get(_s), ray.get(_t)
        words = df["text"].fillna("").str.lower().str.findall(word_re)
        e = df[["doc_id"]].join(words.rename("w")).explode("w").dropna()
        ct = e["w"].map(tm)
        keep = ct.notna()
        e = e[keep]
        ct = ct[keep].to_numpy(np.float64)
        cs = e["w"].map(sm).to_numpy(np.float64)
        term = (np.log(ct) - ln_nt) - (np.log(cs) - ln_ns)
        g = pd.DataFrame(
            {"doc_id": e["doc_id"].to_numpy(np.int64), "term": term}
        ).groupby("doc_id", as_index=False).agg(
            n_scored=("term", "size"), s=("term", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "n_scored": g["n_scored"].astype("int64"),
                "dsir": g["s"].to_numpy() / g["n_scored"].to_numpy(np.float64),
            }
        )

    return docs.map_batches(_score, batch_format="pandas")


DSIR_SQL = r"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest(regexp_extract_all(lower(COALESCE(text, '')), '\w+')) AS w
    FROM documents
), src AS (
    SELECT w, COUNT(*) AS cs FROM tok GROUP BY w
), tgt AS (
    SELECT w, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY w
), ns AS (
    SELECT SUM(cs) AS n FROM src
), nt AS (
    SELECT SUM(ct) AS n FROM tgt
), per AS (
    SELECT t.doc_id, COUNT(*) AS n_scored,
           SUM((LN(CAST(tgt.ct AS DOUBLE)) - LN(CAST(nt.n AS DOUBLE)))
               - (LN(CAST(src.cs AS DOUBLE)) - LN(CAST(ns.n AS DOUBLE)))) AS s
    FROM tok t
    JOIN tgt ON t.w = tgt.w
    JOIN src ON t.w = src.w, ns, nt
    GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_scored AS BIGINT) AS n_scored,
       s / n_scored AS dsir
FROM per
"""


# ---------------------------------------------------------------------------
# dedup-rate report: the one-row corpus-health summary an exact-dedup run
# prints — documents, distinct texts, duplicate share. Per-batch (md5, n)
# partials, gated distinct combine, then three scalars; the dup_rate is
# one fixed double division from exact integers.

def dedup_rate_report(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    import hashlib

    docs = _read(sf_dir, "documents", ["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].fillna("").map(
            lambda t: hashlib.md5(t.encode("utf8")).hexdigest()
        )
        g = pd.DataFrame({"h": h.to_numpy(), "n": 1})
        return g.groupby("h", as_index=False).agg(n=("n", "sum"))

    def _sum_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False).agg(n=("n", "sum"))

    partials = docs.map_batches(_partial, batch_format="pandas")
    combined = _gated_grouped(
        partials, ["h"], _sum_block,
        _table_rows(sf_dir, "documents"), driver_threshold,
    )

    def _scalars(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n_docs": [int(df["n"].sum())], "n_unique": [len(df)]}
        )

    stats = (
        combined.map_batches(_scalars, batch_format="pandas")
        .to_pandas().sum().to_frame().T
    )  # _gated_grouped always returns a Dataset, including its driver branch
    n_docs = int(stats["n_docs"].iloc[0])
    n_unique = int(stats["n_unique"].iloc[0])
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_unique": [n_unique],
            "dup_rate": [float(n_docs - n_unique) / float(n_docs)],
        }
    )


DEDUP_RATE_SQL = """
WITH h AS (
    SELECT md5(COALESCE(text, '')) AS h FROM documents
), a AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
    FROM h
)
SELECT n_docs, n_unique,
       CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
FROM a
"""


SQL_QUERIES["dsir_scores"] = (dsir_scores, DSIR_SQL)
SQL_QUERIES["dedup_rate_report"] = (dedup_rate_report, DEDUP_RATE_SQL)


# ---------------------------------------------------------------------------
# skyline (Pareto frontier): parts not STRICTLY dominated on (size,
# retail-price) — the multi-objective shortlist query. Classic distributed
# shape: each block computes its LOCAL skyline vectorized (per-x max, then
# y > running-max-over-greater-x), the true skyline is a subset of the
# union of local skylines (a dominating point in another block can only
# REMOVE points), so the driver re-runs the identical kernel on the
# frontier-sized union. Exact integers.

def _skyline_kernel(df: pd.DataFrame) -> pd.DataFrame:
    mx = df.groupby("x", as_index=False).agg(my=("y", "max")).sort_values(
        "x", ascending=False, kind="mergesort"
    )
    better = mx["my"].cummax().shift(1)
    thresh = dict(zip(mx["x"], better))
    t = df["x"].map(thresh)
    keep = t.isna() | (df["y"] > t)
    out = df[keep]
    return pd.DataFrame(
        {
            "p_partkey": out["p_partkey"].astype("int64"),
            "x": out["x"].astype("int64"),
            "y": out["y"].astype("int64"),
        }
    )


def skyline_parts(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "p_partkey": df["p_partkey"].to_numpy(np.int64),
                "x": df["p_size"].to_numpy(np.int64),
                "y": np.round(
                    df["p_retailprice"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )
        return _skyline_kernel(b)

    local = ds.map_batches(_local, batch_format="pandas").to_pandas()
    out = _skyline_kernel(local)  # frontier-sized input
    return out.sort_values("p_partkey", kind="mergesort").reset_index(drop=True)


SKYLINE_SQL = """
WITH p AS (
    SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS y
    FROM part
), mx AS (
    SELECT x, MAX(y) AS my FROM p GROUP BY x
), r AS (
    SELECT x,
           MAX(my) OVER (
               ORDER BY x DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS better
    FROM mx
)
SELECT p.p_partkey, p.x, p.y
FROM p JOIN r USING (x)
WHERE r.better IS NULL OR p.y > r.better
ORDER BY p.p_partkey
"""


# ---------------------------------------------------------------------------
# TWAP: per-user time-weighted average value — each reading holds until
# the next one, so the weight is the gap to the next event in seconds
# (the last reading carries no weight). One hash shuffle on user_id; the
# block kernel is one stable sort + shifted int64 arithmetic; the final
# division is one fixed double expression from exact integer sums.

def _twap_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    x = df["x_c"].to_numpy(np.int64)
    n = len(df)
    dur_s = np.zeros(n, dtype=np.int64)
    if n > 1:
        same = uid[1:] == uid[:-1]
        dur_s[:-1] = np.where(same, (ts[1:] - ts[:-1]) // 1_000_000, 0)
    g = pd.DataFrame(
        {"user_id": uid, "wx": x * dur_s, "w": dur_s}
    ).groupby("user_id", as_index=False).agg(wx=("wx", "sum"), w=("w", "sum"))
    g = g[g["w"] > 0]
    return pd.DataFrame(
        {
            "user_id": g["user_id"].astype("int64"),
            "total_s": g["w"].astype("int64"),
            "twap_c": g["wx"].to_numpy(np.int64).astype(np.float64)
            / g["w"].to_numpy(np.int64).astype(np.float64),
        }
    )


def twap(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "x_c": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _twap_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


TWAP_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS x_c
    FROM events
), d AS (
    SELECT user_id, x_c,
           COALESCE(LEAD(ts_us) OVER w - ts_us, 0) // 1000000 AS dur_s
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), a AS (
    SELECT user_id, SUM(x_c * dur_s) AS wx, SUM(dur_s) AS w
    FROM d GROUP BY user_id
)
SELECT user_id, CAST(w AS BIGINT) AS total_s,
       CAST(wx AS DOUBLE) / CAST(w AS DOUBLE) AS twap_c
FROM a WHERE w > 0
"""


SQL_QUERIES["skyline_parts"] = (skyline_parts, SKYLINE_SQL)
SQL_QUERIES["twap"] = (twap, TWAP_SQL)


# ---------------------------------------------------------------------------
# lag-1 autocorrelation per user: Pearson correlation of consecutive value
# pairs — the time-series stickiness feature. One hash shuffle on user_id;
# the block kernel builds same-user (x_t, x_{t+1}) pairs by shifted slices
# and reduces them to exact integer cross-moments per user; the corr is the
# grouped_corr fixed expression. Degenerate users (zero variance on either
# side) are filtered identically on both sides.

def _autocorr_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    x = df["x_c"].to_numpy(np.int64)
    if len(df) > 1:
        same = uid[1:] == uid[:-1]
        a, b, u = x[:-1][same], x[1:][same], uid[1:][same]
    else:
        a = b = u = np.array([], dtype=np.int64)
    g = pd.DataFrame(
        {"user_id": u, "one": 1, "a": a, "b": b,
         "aa": a * a, "bb": b * b, "ab": a * b}
    ).groupby("user_id", as_index=False).agg(
        n=("one", "sum"), sa=("a", "sum"), sb=("b", "sum"),
        saa=("aa", "sum"), sbb=("bb", "sum"), sab=("ab", "sum"),
    )
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    sa = g["sa"].to_numpy(np.int64).astype(np.float64)
    sb = g["sb"].to_numpy(np.int64).astype(np.float64)
    saa = g["saa"].to_numpy(np.int64).astype(np.float64)
    sbb = g["sbb"].to_numpy(np.int64).astype(np.float64)
    sab = g["sab"].to_numpy(np.int64).astype(np.float64)
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    keep = (g["n"] > 1) & (va > 0) & (vb > 0)
    corr = (n * sab - sa * sb) / (np.sqrt(va) * np.sqrt(vb))
    out = pd.DataFrame(
        {
            "user_id": g["user_id"].astype("int64"),
            "n_pairs": g["n"].astype("int64"),
            "acf1": corr,
        }
    )
    return out[keep.to_numpy()]


def autocorr_lag1(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "x_c": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _autocorr_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


AUTOCORR_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS x_c
    FROM events
), p AS (
    SELECT user_id, x_c AS b,
           LAG(x_c) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS a
    FROM v
), g AS (
    SELECT user_id, COUNT(*) AS n, SUM(a) AS sa, SUM(b) AS sb,
           SUM(a * a) AS saa, SUM(b * b) AS sbb, SUM(a * b) AS sab
    FROM p WHERE a IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / (SQRT(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
          * SQRT(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS acf1
FROM g
WHERE n > 1
  AND CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
"""


# ---------------------------------------------------------------------------
# exact global-k deterministic sample: the k=100 documents with the
# smallest Knuth hash — reproducible at any parallelism, re-run and
# resume safe (the reservoir-sampling replacement everywhere RNG state
# would break determinism). Per-batch partial top-k bounds the combine at
# k x blocks.

_GLOBAL_SAMPLE_K = 100


def global_sample_k(sf_dir: str, k: int = _GLOBAL_SAMPLE_K) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        out = pd.DataFrame(
            {"doc_id": ids, "h": _knuth_hash_u32(ids).astype("int64")}
        )
        return out.nsmallest(k, ["h", "doc_id"])

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    return (
        parts.nsmallest(k, ["h", "doc_id"])  # k x blocks in, k out
        .sort_values(["h", "doc_id"])
        .reset_index(drop=True)
    )


GLOBAL_SAMPLE_SQL = """
WITH h AS (
    SELECT doc_id,
           CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                % 4294967296 AS BIGINT) AS h
    FROM documents
)
SELECT doc_id, h FROM h ORDER BY h, doc_id LIMIT 100
"""


SQL_QUERIES["autocorr_lag1"] = (autocorr_lag1, AUTOCORR_SQL)
SQL_QUERIES["global_sample_k"] = (global_sample_k, GLOBAL_SAMPLE_SQL)


# ---------------------------------------------------------------------------
# Markov transition matrix: P(next event type | current type) estimated
# from same-user consecutive pairs — the sequence-model prior a
# next-action predictor trains against. Shifted-slice pairs per block
# (after one user shuffle) reduce to (type_a, type_b) count partials;
# probabilities are one fixed double division from exact integers against
# the per-row-type totals.

def _markov_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    if len(df) > 1:
        same = uid[1:] == uid[:-1]
        a, b = et[:-1][same], et[1:][same]
    else:
        a = b = np.array([], dtype=object)
    return pd.DataFrame({"type_a": a, "type_b": b, "n": 1}).groupby(
        ["type_a", "type_b"], as_index=False
    ).agg(n=("n", "sum"))


def markov_transitions(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_type": df["event_type"].to_numpy(),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    cells = (
        _gated_grouped(
            prepped, ["user_id"], _markov_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # type x type grain
        .groupby(["type_a", "type_b"], as_index=False)
        .agg(n=("n", "sum"))
    )
    tot = cells.groupby("type_a")["n"].sum()
    out = pd.DataFrame(
        {
            "type_a": cells["type_a"].to_numpy(),
            "type_b": cells["type_b"].to_numpy(),
            "n": cells["n"].astype("int64"),
            "p": cells["n"].to_numpy(np.int64).astype(np.float64)
            / tot.loc[cells["type_a"]].to_numpy(np.int64).astype(np.float64),
        }
    )
    return out.sort_values(["type_a", "type_b"], kind="mergesort").reset_index(
        drop=True
    )


MARKOV_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
), p AS (
    SELECT user_id, event_type AS type_b,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) AS type_a
    FROM v
), c AS (
    SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE type_a IS NOT NULL GROUP BY 1, 2
), t AS (
    SELECT type_a, SUM(n) AS tot FROM c GROUP BY type_a
)
SELECT c.type_a, c.type_b, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
FROM c JOIN t USING (type_a)
ORDER BY 1, 2
"""


SQL_QUERIES["markov_transitions"] = (markov_transitions, MARKOV_SQL)


# ---------------------------------------------------------------------------
# label centroids: the mean embedding per label — class prototypes for
# nearest-centroid classifiers and drift monitors. Element sums use the
# scaled-integer trick (round(x * 1e6) int64), so per-batch (label, dim)
# partials combine exactly at any parallelism; the centroid is one fixed
# double expression from those integers.

_CENTROID_SCALE = 1_000_000.0


def _embedding_scaled_partials(t: pa.Table) -> pd.DataFrame:
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    s = np.round(m * _CENTROID_SCALE).astype(np.int64)
    lab = t["label"].to_numpy()
    d = m.shape[1]
    df = pd.DataFrame(
        {
            "label": np.repeat(lab, d).astype(np.int64),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(m)),
            "s": s.ravel(),
            "n": 1,
        }
    )
    return df.groupby(["label", "dim"], as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )


def _centroid_table(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    parts = (
        ds.map_batches(_embedding_scaled_partials, batch_format="pyarrow")
        .to_pandas()  # (label x dim) grain
        .groupby(["label", "dim"], as_index=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
    )
    parts["centroid"] = (
        parts["s"].to_numpy(np.int64).astype(np.float64)
        / parts["n"].to_numpy(np.int64)
    ) / _CENTROID_SCALE
    return parts


def label_centroids(sf_dir: str) -> pd.DataFrame:
    parts = _centroid_table(sf_dir)
    out = parts[["label", "dim", "centroid"]].copy()
    out["label"] = out["label"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    return out.sort_values(["label", "dim"], kind="mergesort").reset_index(
        drop=True
    )


LABEL_CENTROIDS_SQL = """
WITH e AS (
    SELECT label, unnest(embedding) AS x,
           unnest(range(len(embedding))) AS dim
    FROM embeddings
), sc AS (
    SELECT label, dim,
           SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS s,
           COUNT(*) AS n
    FROM e GROUP BY 1, 2
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(s AS DOUBLE) / n / 1000000.0 AS centroid
FROM sc ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# simplified silhouette per label: how well the label structure separates
# in embedding space — a(i) = distance to the OWN centroid, b(i) = min
# distance to any OTHER centroid, s = (b-a)/max(a,b), averaged per label.
# The centroid table (labels x dims, tiny) broadcasts; the scoring pass is
# one matmul-free vectorized distance block per batch with label-grain
# partial sums. The clustering-eval companion to kmeans_clusters.

def label_silhouette(sf_dir: str) -> pd.DataFrame:
    import ray

    cent = _centroid_table(sf_dir)
    labels = np.sort(cent["label"].unique())
    d = int(cent["dim"].max()) + 1
    C = np.zeros((len(labels), d), dtype=np.float64)
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    for _, r in cent.iterrows():
        C[lab_pos[int(r["label"])], int(r["dim"])] = r["centroid"]
    C_ref = ray.put((C, lab_pos))
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def _score(t: pa.Table, _c=C_ref) -> pd.DataFrame:
        Cm, pos = ray.get(_c)
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        lab = t["label"].to_numpy()
        li = np.array([pos[int(x)] for x in lab], dtype=np.int64)
        # squared distances to every centroid: (n, k)
        dd = ((m[:, None, :] - Cm[None, :, :]) ** 2).sum(axis=2)
        dist = np.sqrt(dd)
        a = dist[np.arange(len(m)), li]
        masked = dist.copy()
        masked[np.arange(len(m)), li] = np.inf
        b = masked.min(axis=1)
        sil = (b - a) / np.maximum(a, b)
        g = pd.DataFrame({"label": lab.astype(np.int64), "sil": sil, "n": 1})
        return g.groupby("label", as_index=False).agg(
            s=("sil", "sum"), n=("n", "sum")
        )

    parts = (
        ds.map_batches(_score, batch_format="pyarrow")
        .to_pandas()  # label-grain
        .groupby("label", as_index=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .sort_values("label")
    )
    return pd.DataFrame(
        {
            "label": parts["label"].astype("int64"),
            "n": parts["n"].astype("int64"),
            "mean_sil": parts["s"].to_numpy()
            / parts["n"].to_numpy(np.int64).astype(np.float64),
        }
    ).reset_index(drop=True)


LABEL_SILHOUETTE_SQL = """
WITH e AS (
    SELECT vec_id, label, unnest(embedding) AS x,
           unnest(range(len(embedding))) AS dim
    FROM embeddings
), sc AS (
    SELECT label, dim,
           SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS s,
           COUNT(*) AS n
    FROM e GROUP BY 1, 2
), c AS (
    SELECT label AS clabel, dim,
           CAST(s AS DOUBLE) / n / 1000000.0 AS cj
    FROM sc
), d2 AS (
    SELECT e.vec_id, e.label, c.clabel,
           SUM((CAST(e.x AS DOUBLE) - c.cj) * (CAST(e.x AS DOUBLE) - c.cj))
               AS dd
    FROM e JOIN c USING (dim)
    GROUP BY 1, 2, 3
), ab AS (
    SELECT vec_id, label,
           SQRT(MAX(CASE WHEN clabel = label THEN dd END)) AS a,
           SQRT(MIN(CASE WHEN clabel <> label THEN dd END)) AS b
    FROM d2 GROUP BY 1, 2
), s AS (
    SELECT label, (b - a) / GREATEST(a, b) AS sil FROM ab
)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       SUM(sil) / COUNT(*) AS mean_sil
FROM s GROUP BY label ORDER BY label
"""


SQL_QUERIES["label_centroids"] = (label_centroids, LABEL_CENTROIDS_SQL)
SQL_QUERIES["label_silhouette"] = (label_silhouette, LABEL_SILHOUETTE_SQL)


# ---------------------------------------------------------------------------
# max drawdown: per user, the largest drop from a running peak of the
# value series in (ts, event_id) order — the risk metric of the windowed
# family. One hash shuffle on user_id; the block kernel reuses the
# segmented running-max offset trick (ooo_events) so one global
# np.maximum.accumulate serves every user in the block. Exact integers.

def _drawdown_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    x = df["x_c"].to_numpy(np.int64)
    n = len(df)
    if n:
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg_id = np.cumsum(first) - 1
        xn = x - x.min()
        stride = np.int64(xn.max()) + 1
        assert int(seg_id[-1]) * int(stride) < (1 << 62), "drawdown overflow"
        adj = xn + seg_id * stride
        runmax = np.maximum.accumulate(adj)
        dd = runmax - adj  # peak-to-here drop, exact within each segment
    else:
        dd = np.zeros(0, dtype=np.int64)
    g = pd.DataFrame({"user_id": uid, "dd": dd, "n": 1}).groupby(
        "user_id", as_index=False
    ).agg(n=("n", "sum"), max_drawdown_c=("dd", "max"))
    g["n"] = g["n"].astype("int64")
    g["max_drawdown_c"] = g["max_drawdown_c"].astype("int64")
    return g


def max_drawdown(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "x_c": np.round(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    return _gated_grouped(
        prepped, ["user_id"], _drawdown_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


MAX_DRAWDOWN_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS x_c
    FROM events
), r AS (
    SELECT user_id,
           MAX(x_c) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING
           ) - x_c AS dd
    FROM v
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(dd) AS BIGINT) AS max_drawdown_c
FROM r GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# longest streak: each user's longest run of CONSECUTIVE active days —
# the engagement metric. Distinct (user, day) partials shrink the shuffle;
# the block kernel uses the day-minus-rank gaps-and-islands identity
# (consecutive days share day - rank), all integer.

def _streak_block(df: pd.DataFrame) -> pd.DataFrame:
    d = df.drop_duplicates().sort_values(
        ["user_id", "day"], kind="mergesort"
    )
    uid = d["user_id"].to_numpy(np.int64)
    day = d["day"].to_numpy(np.int64)
    if len(d):
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        rank = np.arange(len(d), dtype=np.int64) - np.repeat(
            np.flatnonzero(first),
            np.diff(np.append(np.flatnonzero(first), len(d))),
        )
        island = day - rank
    else:
        island = np.zeros(0, dtype=np.int64)
    g = pd.DataFrame({"user_id": uid, "island": island, "n": 1}).groupby(
        ["user_id", "island"], as_index=False
    ).agg(run=("n", "sum"))
    out = g.groupby("user_id", as_index=False).agg(
        streak_days=("run", "max")
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["streak_days"] = out["streak_days"].astype("int64")
    return out


def longest_streak(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["user_id"], _streak_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    )


LONGEST_STREAK_SQL = """
WITH d AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), r AS (
    SELECT user_id, day,
           day - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
           ) AS island
    FROM d
), runs AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run
    FROM r GROUP BY user_id, island
)
SELECT user_id, CAST(MAX(run) AS BIGINT) AS streak_days
FROM runs GROUP BY user_id
"""


SQL_QUERIES["max_drawdown"] = (max_drawdown, MAX_DRAWDOWN_SQL)
SQL_QUERIES["longest_streak"] = (longest_streak, LONGEST_STREAK_SQL)


# ---------------------------------------------------------------------------
# weighted median: per return flag, the price (whole dollars) at which
# HALF the total quantity weight is reached — the weighted counterpart to
# grouped_percentiles (quantity-weighted price midpoint). Whole computation
# on the (flag, dollar, weight) histogram: per-batch weight-sum partials,
# per-flag cumulative weights, lower-median target (W+1)//2 — all exact
# integers, bit-identical at any split.

def _wmedian_block(df: pd.DataFrame) -> pd.DataFrame:
    c = df.groupby(["flag", "v"], as_index=False).agg(w=("w", "sum"))
    outs = []
    for flag, grp in c.groupby("flag", sort=False):
        grp = grp.sort_values("v", kind="mergesort")
        cw = np.cumsum(grp["w"].to_numpy(np.int64))
        target = (int(cw[-1]) + 1) // 2
        med = int(grp["v"].to_numpy(np.int64)[np.searchsorted(cw, target)])
        outs.append((flag, int(cw[-1]), med))
    return pd.DataFrame(
        outs, columns=["flag", "total_w", "wmedian"]
    ).astype({"total_w": "int64", "wmedian": "int64"})


def weighted_median(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "flag": df["l_returnflag"].to_numpy(),
                "v": np.round(
                    df["l_extendedprice"].to_numpy() * 100.0
                ).astype(np.int64)
                // 100,
                "w": np.round(df["l_quantity"].to_numpy() * 100.0).astype(
                    np.int64
                )
                // 100,
            }
        )
        return g.groupby(["flag", "v"], as_index=False).agg(w=("w", "sum"))

    partials = ds.map_batches(_partial, batch_format="pandas")
    return _gated_grouped(
        partials, ["flag"], _wmedian_block,
        _table_rows(sf_dir, "lineitem"), driver_threshold,
    )


WEIGHTED_MEDIAN_SQL = """
WITH v AS (
    SELECT l_returnflag AS flag,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 100 AS v,
           CAST(ROUND(l_quantity * 100) AS BIGINT) // 100 AS w
    FROM lineitem
), h AS (
    SELECT flag, v, SUM(w) AS w FROM v GROUP BY 1, 2
), r AS (
    SELECT flag, v,
           SUM(w) OVER (
               PARTITION BY flag ORDER BY v ROWS UNBOUNDED PRECEDING
           ) AS cw,
           SUM(w) OVER (PARTITION BY flag) AS tw
    FROM h
)
SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_w,
       CAST(MIN(CASE WHEN cw >= (tw + 1) // 2 THEN v END) AS BIGINT)
           AS wmedian
FROM r GROUP BY flag
"""


SQL_QUERIES["weighted_median"] = (weighted_median, WEIGHTED_MEDIAN_SQL)


# ---------------------------------------------------------------------------
# time-to-convert: for every 'view', the hours until that user's NEXT
# 'purchase' (within 7 days), reported as an hour-bucket histogram — the
# conversion-latency curve. The block kernel computes next-purchase-after-
# each-row via one REVERSED segmented running-min (the ooo offset trick,
# mirrored), so it is one sort + one accumulate per block, no per-user
# loop; partials are hour-bucket-grain.

_CONVERT_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def _ttc_block(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts_us"].to_numpy(np.int64)
    is_v = (df["event_type"] == "view").to_numpy()
    is_p = (df["event_type"] == "purchase").to_numpy()
    n = len(df)
    if n:
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        seg_id = np.cumsum(first) - 1
        base = ts.min()
        tsn = ts - base
        stride = np.int64(tsn.max()) + 1
        assert int(seg_id[-1]) * int(stride) < (1 << 62), "ttc overflow"
        adj = tsn + seg_id * stride
        big = np.iinfo(np.int64).max // 2
        p_adj = np.where(is_p, adj, big)
        # reversed running min = next purchase's adj at or after each row
        nxt = np.minimum.accumulate(p_adj[::-1])[::-1]
        # rows whose next purchase falls in a LATER segment see a value
        # from a later user only if their own segment has none; later
        # segments have LARGER adj, so a cross-segment value can only
        # appear when the own-segment min is `big` — but a later segment's
        # adj is still < big, so mask by same-segment explicitly:
        nxt_seg = nxt // stride
        valid = (nxt < big) & (nxt_seg == seg_id)
        delta = np.where(valid, (nxt - adj), -1)
        m = is_v & valid & (delta >= 0) & (delta <= _CONVERT_WINDOW_US)
        hours = delta[m] // 3_600_000_000
    else:
        hours = np.zeros(0, dtype=np.int64)
    g = pd.DataFrame({"hour": hours.astype(np.int64), "n": 1}).groupby(
        "hour", as_index=False
    ).agg(n=("n", "sum"))
    return g


def time_to_convert(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_type": df["event_type"].to_numpy(),
            }
        )

    prepped = ds.map_batches(_prep, batch_format="pandas")
    cells = (
        _gated_grouped(
            prepped, ["user_id"], _ttc_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # hour-bucket grain (<= 168 buckets)
        .groupby("hour", as_index=False)
        .agg(n=("n", "sum"))
        .sort_values("hour")
    )
    cells["hour"] = cells["hour"].astype("int64")
    cells["n"] = cells["n"].astype("int64")
    return cells.reset_index(drop=True)


TIME_TO_CONVERT_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
), nx AS (
    SELECT user_id, ts_us, event_type,
           MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS next_p
    FROM v
)
SELECT CAST((next_p - ts_us) // 3600000000 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM nx
WHERE event_type = 'view' AND next_p IS NOT NULL
  AND next_p - ts_us <= 604800000000
GROUP BY 1 ORDER BY 1
"""


SQL_QUERIES["time_to_convert"] = (time_to_convert, TIME_TO_CONVERT_SQL)


# ---------------------------------------------------------------------------
# basket lift: association strength of brand pairs — lift = n_ab * N /
# (n_a * n_b) over order baskets, in RATIO form (the pmi doctrine: fixed
# operand order, no log, doubles hash bit-exact). Reuses the
# brand_cooccurrence machinery (integer pair codes, triangle expansion) and
# adds the marginal counts; the final arithmetic is driver-side over the
# pair-grain table.

_LIFT_MIN_PAIRS = 5


def basket_lift(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    pairs = brand_cooccurrence(sf_dir, driver_threshold)
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand_map_ref = ray.put(
        dict(zip(part["p_partkey"], part["p_brand"]))
    )
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    # marginals must dedup (order, brand) GLOBALLY (batch-level distinct
    # over-counts cross-batch repeats), so they ride the gated distinct
    # machinery: per-batch distinct partials, one hash shuffle on the
    # order key, per-block exact counts (each order fully co-located)
    def _distinct_ob(df: pd.DataFrame, _m=brand_map_ref) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
                "brand": df["l_partkey"].map(ray.get(_m)).to_numpy(),
            }
        ).drop_duplicates()

    def _count_block(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby("brand", as_index=False).agg(n=("brand", "size"))
        o = pd.DataFrame(
            {"brand": ["__orders__"], "n": [d["l_orderkey"].nunique()]}
        )
        return pd.concat([g, o], ignore_index=True)

    dist = ds.map_batches(_distinct_ob, batch_format="pandas")
    counts = (
        _gated_grouped(
            dist, ["l_orderkey"], _count_block,
            _table_rows(sf_dir, "lineitem"), driver_threshold,
        )
        .to_pandas()  # brand-grain (+1 order-count row per block)
        .groupby("brand", as_index=False)
        .agg(n=("n", "sum"))
    )
    n_orders = int(counts.loc[counts["brand"] == "__orders__", "n"].iloc[0])
    brand_n = counts[counts["brand"] != "__orders__"].set_index("brand")["n"]
    p = pairs[pairs["n_orders"] >= _LIFT_MIN_PAIRS].copy()
    n_ab = p["n_orders"].to_numpy(np.int64).astype(np.float64)
    n_a = brand_n.loc[p["brand_a"]].to_numpy(np.int64).astype(np.float64)
    n_b = brand_n.loc[p["brand_b"]].to_numpy(np.int64).astype(np.float64)
    # FIXED operand order, mirrored in the SQL
    lift = n_ab * float(n_orders) / n_a / n_b
    out = pd.DataFrame(
        {
            "brand_a": p["brand_a"].to_numpy(),
            "brand_b": p["brand_b"].to_numpy(),
            "n_pairs": p["n_orders"].astype("int64"),
            "lift": lift,
        }
    )
    return out.sort_values(["brand_a", "brand_b"], kind="mergesort").reset_index(
        drop=True
    )


BASKET_LIFT_SQL = """
WITH d AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), m AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY brand
), o AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
), pr AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT pr.brand_a, pr.brand_b, pr.n_pairs,
       CAST(pr.n_pairs AS DOUBLE) * CAST(o.n_orders AS DOUBLE)
       / CAST(ma.n AS DOUBLE) / CAST(mb.n AS DOUBLE) AS lift
FROM pr
JOIN m ma ON pr.brand_a = ma.brand
JOIN m mb ON pr.brand_b = mb.brand, o
WHERE pr.n_pairs >= 5
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# activity profile: event counts per (day-of-week, hour-of-day) — the
# cyclic-time feature grid. Grid-grain partials (<= 168 cells), driver
# combine; dow derives from epoch days with the same arithmetic in the SQL
# (1970-01-01 was a Thursday: dow = (day + 4) % 7, 0 = Sunday).

def activity_profile(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = us // 86_400_000_000
        g = pd.DataFrame(
            {
                "dow": (day + 4) % 7,
                "hour": us % 86_400_000_000 // 3_600_000_000,
                "n": 1,
            }
        )
        return g.groupby(["dow", "hour"], as_index=False).agg(n=("n", "sum"))

    cells = (
        ds.map_batches(_partial, batch_format="pandas")
        .to_pandas()  # <= 168 cells per block
        .groupby(["dow", "hour"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["dow", "hour"], kind="mergesort")
    )
    return cells.astype("int64").reset_index(drop=True)


ACTIVITY_PROFILE_SQL = """
WITH v AS (
    SELECT epoch_us(ts) AS us FROM events
)
SELECT CAST((us // 86400000000 + 4) % 7 AS BIGINT) AS dow,
       CAST(us % 86400000000 // 3600000000 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM v GROUP BY 1, 2 ORDER BY 1, 2
"""


SQL_QUERIES["basket_lift"] = (basket_lift, BASKET_LIFT_SQL)
SQL_QUERIES["activity_profile"] = (activity_profile, ACTIVITY_PROFILE_SQL)


# ---------------------------------------------------------------------------
# RFM segmentation grid: users quintiled on Recency (last purchase ts),
# Frequency (purchase count) and Monetary (total cents), reported as the
# 125-cell (r, f, m) population grid. Per-user aggregates come from
# mergeable partials; the quintile is the EXPLICIT rank formula
# (rank-1)*5 // n + 1 over a deterministic (metric, user_id) order on both
# sides (NTILE's uneven-split tie semantics are avoided entirely). The
# user-grain ranking runs on the driver under the standard gate; past it,
# the percent_rank/ntile_buckets range-partition machinery is the scale
# path (documented there).

def _rfm_rank(vals: np.ndarray, uids: np.ndarray) -> np.ndarray:
    order = np.lexsort((uids, vals))
    rank = np.empty(len(vals), dtype=np.int64)
    rank[order] = np.arange(len(vals), dtype=np.int64)
    return rank * 5 // len(vals) + 1


def rfm_cells(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"]
        if not len(p):
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "last_ts": pd.Series(dtype="int64"),
                 "freq": pd.Series(dtype="int64"),
                 "mon": pd.Series(dtype="int64")}
            )
        g = pd.DataFrame(
            {
                "user_id": p["user_id"].to_numpy(np.int64),
                "last_ts": p["ts"].astype("datetime64[us]").astype("int64"),
                "freq": 1,
                "mon": np.round(p["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        return g.groupby("user_id", as_index=False).agg(
            last_ts=("last_ts", "max"), freq=("freq", "sum"), mon=("mon", "sum")
        )

    def _merge_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            last_ts=("last_ts", "max"), freq=("freq", "sum"), mon=("mon", "sum")
        )

    partials = ds.map_batches(_partial, batch_format="pandas")
    users = _gated_grouped(
        partials, ["user_id"], _merge_block,
        _table_rows(sf_dir, "events"), driver_threshold,
    ).to_pandas()  # user-grain; see docstring for the beyond-gate path
    uid = users["user_id"].to_numpy(np.int64)
    r = _rfm_rank(users["last_ts"].to_numpy(np.int64), uid)
    f = _rfm_rank(users["freq"].to_numpy(np.int64), uid)
    m = _rfm_rank(users["mon"].to_numpy(np.int64), uid)
    out = pd.DataFrame({"r": r, "f": f, "m": m, "n": 1}).groupby(
        ["r", "f", "m"], as_index=False
    ).agg(n_users=("n", "sum"))
    return out.astype("int64").sort_values(["r", "f", "m"]).reset_index(
        drop=True
    )


RFM_SQL = """
WITH p AS (
    SELECT user_id, epoch_us(ts) AS ts_us,
           CAST(ROUND(value * 100) AS BIGINT) AS v_c
    FROM events WHERE event_type = 'purchase'
), u AS (
    SELECT user_id, MAX(ts_us) AS last_ts, COUNT(*) AS freq, SUM(v_c) AS mon
    FROM p GROUP BY user_id
), ranked AS (
    SELECT user_id,
           (ROW_NUMBER() OVER (ORDER BY last_ts, user_id) - 1) * 5
               // (SELECT COUNT(*) FROM u) + 1 AS r,
           (ROW_NUMBER() OVER (ORDER BY freq, user_id) - 1) * 5
               // (SELECT COUNT(*) FROM u) + 1 AS f,
           (ROW_NUMBER() OVER (ORDER BY mon, user_id) - 1) * 5
               // (SELECT COUNT(*) FROM u) + 1 AS m
    FROM u
)
SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ranked GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# new vs returning: per day, how many active users are first-timers vs
# returners. One hash shuffle on user_id co-locates each user's distinct
# day set; the block kernel marks each user's min day and emits
# (day, is_new) grain partials — day-sized, never user-sized, on the
# driver.

def _nvr_block(df: pd.DataFrame) -> pd.DataFrame:
    d = df.drop_duplicates()
    first = d.groupby("user_id")["day"].transform("min")
    out = pd.DataFrame(
        {
            "day": d["day"].to_numpy(np.int64),
            "is_new": (d["day"].to_numpy(np.int64) == first.to_numpy(np.int64))
            .astype(np.int64),
            "n": 1,
        }
    )
    return out.groupby(["day", "is_new"], as_index=False).agg(n=("n", "sum"))


def new_vs_returning(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()

    partials = ds.map_batches(_partial, batch_format="pandas")
    cells = (
        _gated_grouped(
            partials, ["user_id"], _nvr_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # (day, is_new) grain
        .groupby(["day", "is_new"], as_index=False)
        .agg(n=("n", "sum"))
    )
    piv = cells.pivot_table(
        index="day", columns="is_new", values="n", aggfunc="sum", fill_value=0
    )
    out = pd.DataFrame(
        {
            "day": piv.index.to_numpy(np.int64),
            "n_new": piv.get(1, pd.Series(0, index=piv.index)).to_numpy(
                np.int64
            ),
            "n_returning": piv.get(0, pd.Series(0, index=piv.index)).to_numpy(
                np.int64
            ),
        }
    )
    return out.sort_values("day").reset_index(drop=True)


NEW_VS_RETURNING_SQL = """
WITH d AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), f AS (
    SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id
)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(COUNT(*) FILTER (WHERE d.day = f.first_day) AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (WHERE d.day <> f.first_day) AS BIGINT)
           AS n_returning
FROM d JOIN f USING (user_id)
GROUP BY 1 ORDER BY 1
"""


SQL_QUERIES["rfm_cells"] = (rfm_cells, RFM_SQL)
SQL_QUERIES["new_vs_returning"] = (new_vs_returning, NEW_VS_RETURNING_SQL)


# ---------------------------------------------------------------------------
# session-duration percentiles: p50/p95 of inactivity-gap session lengths
# in whole minutes — the engagement-depth summary on top of
# event_sessions. The session kernel is reused verbatim per co-located
# block; durations reduce to a bounded minute-domain histogram (calendar
# span bounded), and the ceil-rank selection is exact integers.

def session_duration_pctl(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    def _dur_hist_block(df: pd.DataFrame) -> pd.DataFrame:
        s = _event_sessions_block(df)
        mins = (
            s["session_end_us"].to_numpy(np.int64)
            - s["session_start_us"].to_numpy(np.int64)
        ) // 60_000_000
        g = pd.DataFrame({"mins": mins, "c": 1})
        return g.groupby("mins", as_index=False).agg(c=("c", "sum"))

    prepped = ds.map_batches(_prep, batch_format="pandas")
    hist = (
        _gated_grouped(
            prepped, ["user_id"], _dur_hist_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # minute-domain grain
        .groupby("mins", as_index=False)
        .agg(c=("c", "sum"))
        .sort_values("mins")
    )
    cw = np.cumsum(hist["c"].to_numpy(np.int64))
    n = int(cw[-1])
    v = hist["mins"].to_numpy(np.int64)
    p50 = int(v[np.searchsorted(cw, (50 * n + 99) // 100)])
    p95 = int(v[np.searchsorted(cw, (95 * n + 99) // 100)])
    return pd.DataFrame({"n_sessions": [n], "p50_min": [p50], "p95_min": [p95]})


SESSION_DURATION_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
), g AS (
    SELECT user_id, ts_us, event_id,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                     OR ts_us - LAG(ts_us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS brk
    FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
    SELECT user_id, ts_us,
           SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS seg
    FROM g
), sess AS (
    SELECT (MAX(ts_us) - MIN(ts_us)) // 60000000 AS mins
    FROM s GROUP BY user_id, seg
), r AS (
    SELECT mins, ROW_NUMBER() OVER (ORDER BY mins) AS rn,
           COUNT(*) OVER () AS n
    FROM sess
)
SELECT CAST(MAX(n) AS BIGINT) AS n_sessions,
       CAST(MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN mins END)
            AS BIGINT) AS p50_min,
       CAST(MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN mins END)
            AS BIGINT) AS p95_min
FROM r
"""


# ---------------------------------------------------------------------------
# anomalous days: days whose event volume sits > 2 sigma from the all-days
# mean — the volume-anomaly monitor. Day-grain count partials; moments over
# the DAY series are driver arithmetic (days, not rows); one fixed double
# expression both sides.

def anomalous_days(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        )
        return pd.DataFrame({"day": day, "n": 1}).groupby(
            "day", as_index=False
        ).agg(n=("n", "sum"))

    days = (
        ds.map_batches(_partial, batch_format="pandas")
        .to_pandas()  # day-grain
        .groupby("day", as_index=False)
        .agg(n=("n", "sum"))
    )
    cnt = days["n"].to_numpy(np.int64)
    k = len(cnt)
    s = int(cnt.sum())
    ss = int((cnt * cnt).sum())
    mean = float(s) / k
    sd = float(np.sqrt(float(ss) / k - mean * mean))
    z = (cnt.astype(np.float64) - mean) / sd
    out = pd.DataFrame(
        {"day": days["day"].astype("int64"), "n": days["n"].astype("int64"),
         "z": z}
    )
    return (
        out[np.abs(z) > 2.0]
        .sort_values("day")
        .reset_index(drop=True)
    )


ANOMALOUS_DAYS_SQL = """
WITH d AS (
    SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
    FROM events GROUP BY 1
), m AS (
    SELECT COUNT(*) AS k, SUM(n) AS s, SUM(n * n) AS ss FROM d
), mm AS (
    SELECT CAST(s AS DOUBLE) / k AS mean,
           SQRT(CAST(ss AS DOUBLE) / k
                - (CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k)) AS sd
    FROM m
)
SELECT CAST(d.day AS BIGINT) AS day, CAST(d.n AS BIGINT) AS n,
       (CAST(d.n AS DOUBLE) - mm.mean) / mm.sd AS z
FROM d, mm
WHERE ABS((CAST(d.n AS DOUBLE) - mm.mean) / mm.sd) > 2.0
ORDER BY 1
"""


SQL_QUERIES["session_duration_pctl"] = (
    session_duration_pctl, SESSION_DURATION_SQL
)
SQL_QUERIES["anomalous_days"] = (anomalous_days, ANOMALOUS_DAYS_SQL)


# ---------------------------------------------------------------------------
# Pareto concentration: how many of the heaviest users cover 80% of all
# events — the 80/20 skew report that sizes per-key salting decisions.
# Per-user counts reduce to a COUNT-DOMAIN histogram (how many users have
# exactly c events), which is all the cumulative-share scan needs: iterate
# the domain descending until the event share crosses 80%. Domain-sized
# driver state, exact integers, and the minimal user rank is determined by
# counts alone (ties are interchangeable), so it equals the SQL's
# ranked-user cumsum.

def pareto_users(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64), "n": 1})
        return g.groupby("user_id", as_index=False).agg(n=("n", "sum"))

    def _count_block(df: pd.DataFrame) -> pd.DataFrame:
        u = df.groupby("user_id", as_index=False).agg(n=("n", "sum"))
        h = u.groupby("n", as_index=False).agg(n_users=("n", "size"))
        return h

    partials = ds.map_batches(_partial, batch_format="pandas")
    hist = (
        _gated_grouped(
            partials, ["user_id"], _count_block,
            _table_rows(sf_dir, "events"), driver_threshold,
        )
        .to_pandas()  # count-domain grain
        .groupby("n", as_index=False)
        .agg(n_users=("n_users", "sum"))
        .sort_values("n", ascending=False)
    )
    c = hist["n"].to_numpy(np.int64)
    nu = hist["n_users"].to_numpy(np.int64)
    total_events = int((c * nu).sum())
    total_users = int(nu.sum())
    # ceil(0.8 * total) in all-positive arithmetic: DuckDB's // truncates
    # toward zero while numpy/python floor, so the -(-x//d) ceil trick
    # DIVERGES on the two sides; (x*80 + 99)//100 is identical everywhere
    target = (total_events * 80 + 99) // 100
    cum_events = np.cumsum(c * nu)
    i = int(np.searchsorted(cum_events, target))
    # users strictly above bucket i fully counted; within bucket i only as
    # many users as needed
    users_before = int(nu[:i].sum())
    ev_before = int(cum_events[i - 1]) if i > 0 else 0
    need = target - ev_before
    extra = (need + int(c[i]) - 1) // int(c[i])  # ceil, all-positive
    n80 = users_before + int(extra)
    return pd.DataFrame(
        {
            "total_users": [total_users],
            "total_events": [total_events],
            "n_users_80": [n80],
        }
    )


PARETO_SQL = """
WITH u AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), r AS (
    SELECT n,
           SUM(n) OVER (
               ORDER BY n DESC, user_id ROWS UNBOUNDED PRECEDING
           ) AS cum,
           ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn
    FROM u
), t AS (
    SELECT SUM(n) AS total_events, COUNT(*) AS total_users FROM u
)
SELECT CAST(t.total_users AS BIGINT) AS total_users,
       CAST(t.total_events AS BIGINT) AS total_events,
       CAST(MIN(r.rn) AS BIGINT) AS n_users_80
FROM r, t
WHERE r.cum >= (t.total_events * 80 + 99) // 100
GROUP BY 1, 2
"""


SQL_QUERIES["pareto_users"] = (pareto_users, PARETO_SQL)


# ---------------------------------------------------------------------------
# normalized dedup: exact dedup AFTER canonical text normalization
# (NFC + lower + whitespace collapse + trim — the normalize_text kernel),
# catching trivially-reformatted duplicates raw exact dedup misses. The
# query plants reformatted replicas deterministically (every doc_id%4==0
# doc mirrored with scrambled case/whitespace at doc_id+2e6) and must
# collapse them; keep-min-id argmax partials ride the usual gated combine
# with (hash, id, n) scalar rows through the shuffle.

def _norm_arrow(txt: pa.Array) -> pa.Array:
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.utf8_lower(pc.utf8_normalize(txt, form="NFC")), r"\s+", " "
        )
    )


def normalized_dedup(
    sf_dir: str, driver_threshold: int = _GROUP_DRIVER_THRESHOLD
) -> rd.Dataset | pd.DataFrame:
    import hashlib

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _partial(t: pa.Table) -> pd.DataFrame:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        base = _norm_arrow(pc.fill_null(t.column("text"), "")).to_pandas()
        # planted replicas: UPPERCASED with doubled spaces and padding —
        # identical after normalization
        rep_mask = did % 4 == 0
        rep_raw = (
            "  " + base[rep_mask].str.upper().str.replace(" ", "  ") + " "
        )
        rep_norm = _norm_arrow(pa.array(rep_raw.tolist())).to_pandas()
        h = pd.concat(
            [base, rep_norm], ignore_index=True
        ).map(lambda s: hashlib.md5(s.encode("utf8")).hexdigest())
        ids = np.concatenate([did, did[rep_mask] + 2_000_000])
        g = pd.DataFrame({"h": h.to_numpy(), "doc_id": ids, "n": 1})
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        return g.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "first"), n=("n", "sum")
        )

    def _pick_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        out = df.groupby("h", as_index=False).agg(
            keep_id=("doc_id", "first"), n_copies=("n", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": out["keep_id"].astype("int64"),
                "n_copies": out["n_copies"].astype("int64"),
            }
        )

    partials = docs.map_batches(_partial, batch_format="pyarrow")
    return _gated_grouped(
        partials, ["h"], _pick_block,
        2 * _table_rows(sf_dir, "documents"), driver_threshold,
    )


NORMALIZED_DEDUP_SQL = r"""
WITH norm AS (
    SELECT doc_id,
           trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))),
                               '\s+', ' ', 'g')) AS nt
    FROM documents
), aug AS (
    SELECT doc_id, nt FROM norm
    UNION ALL
    -- the planted replica normalizes back to the SAME nt
    SELECT doc_id + 2000000, nt FROM norm WHERE doc_id % 4 = 0
), r AS (
    SELECT doc_id, md5(nt) AS h,
           ROW_NUMBER() OVER (PARTITION BY md5(nt) ORDER BY doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY md5(nt)) AS n_copies
    FROM aug
)
SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies
FROM r WHERE rn = 1
"""


SQL_QUERIES["normalized_dedup"] = (normalized_dedup, NORMALIZED_DEDUP_SQL)


# ---------------------------------------------------------------------------
# grouped skewness: the third standardized moment per event type — the
# grouped_stats doctrine extended one moment up. Integer DOLLAR units keep
# sum(x^3) comfortably inside int64 (x <= ~500 here; the envelope note on
# zscore_normalize applies one power higher); one fixed double expression
# from the exact integer moments on both sides.

def grouped_skew(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def _mom(df: pd.DataFrame) -> pd.DataFrame:
        x = np.round(df["value"].to_numpy() * 100.0).astype(np.int64) // 100
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "one": 1, "x": x, "x2": x * x, "x3": x * x * x,
            }
        )
        return g.groupby("event_type", as_index=False).agg(
            n=("one", "sum"), s1=("x", "sum"), s2=("x2", "sum"), s3=("x3", "sum")
        )

    a = (
        ds.map_batches(_mom, batch_format="pandas")
        .to_pandas()  # type-grain
        .groupby("event_type", as_index=False)
        .sum()
    )
    n = a["n"].to_numpy(np.int64).astype(np.float64)
    s1 = a["s1"].to_numpy(np.int64).astype(np.float64)
    s2 = a["s2"].to_numpy(np.int64).astype(np.float64)
    s3 = a["s3"].to_numpy(np.int64).astype(np.float64)
    mean = s1 / n
    var = s2 / n - mean * mean
    m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
    skew = m3 / (np.sqrt(var) * np.sqrt(var) * np.sqrt(var))
    return pd.DataFrame(
        {
            "event_type": a["event_type"].to_numpy(),
            "n": a["n"].astype("int64"),
            "skew": skew,
        }
    ).sort_values("event_type").reset_index(drop=True)


GROUPED_SKEW_SQL = """
WITH v AS (
    SELECT event_type,
           CAST(ROUND(value * 100) AS BIGINT) // 100 AS x
    FROM events
), a AS (
    SELECT event_type, COUNT(*) AS n, SUM(x) AS s1, SUM(x * x) AS s2,
           SUM(x * x * x) AS s3
    FROM v GROUP BY event_type
), m AS (
    SELECT event_type, n,
           CAST(s1 AS DOUBLE) / n AS mean,
           CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
               * (CAST(s1 AS DOUBLE) / n) AS var,
           CAST(s3 AS DOUBLE) / n
               - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
               + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 * (CAST(s1 AS DOUBLE) / n) AS m3
    FROM a
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       m3 / (SQRT(var) * SQRT(var) * SQRT(var)) AS skew
FROM m ORDER BY event_type
"""


SQL_QUERIES["grouped_skew"] = (grouped_skew, GROUPED_SKEW_SQL)
