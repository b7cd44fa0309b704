"""Iterative graph algorithm over Ray Data: PageRank with a fixed
iteration count and a full SQL value-oracle.

The crawl engine's frontier IS a web graph (parent_doc_id -> doc_id); the
battery variant runs the same mathematics over the testdata's
lineitem-derived bipartite graph (part --supplied-by--> supplier) so the
driver gate can value-check it against DuckDB.

Semantics (the "dangling mass dropped" PageRank variant, deterministic):

    r_0(n)     = 1 / N
    r_{k+1}(n) = 0.15 / N + 0.85 * sum_{(s -> n) in E} r_k(s) / outdeg(s)

5 iterations, damping 0.85, edges deduplicated. Supplier nodes have no
out-edges; their mass is dropped rather than redistributed, which keeps
the recurrence exactly reproducible in unrolled SQL (the oracle does 5
CTE rounds of the same formula in float64; values are compared at the
driver's 6dp rounding, far above float sum-order noise for rank values
of magnitude ~1e-4..1e-1).

Scale shape (the distributed branch, forced in tests): per iteration
  1. co-partition ranks with (deg-annotated) edges on the source node —
     ONE hash shuffle — and emit per-block partial contributions
     (dst, sum r/deg),
  2. co-partition contributions with the node table on the destination —
     ONE hash shuffle — and emit r_next for EVERY node (no-inbound nodes
     get the base term only),
with r materialized between iterations so the plan doesn't grow. Nothing
node- or edge-sized ever reaches the driver; the broadcast branch below
the gate holds the (deduplicated) edge list in numpy, bounded by the same
driver threshold every other battery op uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

_DAMPING = 0.85
_ITERS = 5
_SUPP_OFFSET = 1_000_000_000


def _edges_ds(sf_dir: str) -> rd.Dataset:
    from ..io import read_parquet_clean
    import os

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )

    def _mk(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df["l_partkey"].to_numpy(np.int64),
                "dst": df["l_suppkey"].to_numpy(np.int64) + _SUPP_OFFSET,
            }
        )
        return out.drop_duplicates()  # per-batch partial dedup

    return li.map_batches(_mk, batch_format="pandas")


def _pagerank_driver(edges: pd.DataFrame) -> pd.DataFrame:
    """Sequential numpy PageRank on the deduplicated edge list."""
    edges = edges.drop_duplicates(ignore_index=True)
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    idx = {n: i for i, n in enumerate(nodes)}
    src = edges["src"].map(idx).to_numpy(np.int64)
    dst = edges["dst"].map(idx).to_numpy(np.int64)
    n = len(nodes)
    deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(_ITERS):
        w = r[src] / deg[src]
        contrib = np.bincount(dst, weights=w, minlength=n)
        r = 0.15 / n + _DAMPING * contrib
    return pd.DataFrame(
        {"node": nodes.astype("int64"), "pr": np.round(r, 6)}
    ).sort_values("node").reset_index(drop=True)


def _pagerank_distributed(edges: rd.Dataset) -> pd.DataFrame:
    from ..shuffle import hash_partitioned_map_batches

    # dedup + out-degree in one co-partition on src (all rows of a src are
    # in one block after the shuffle, so the per-block dedup and count are
    # exact)
    def _dedup_deg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64"),
                 "deg": pd.Series(dtype="int64")}
            )
        df = df.drop_duplicates(ignore_index=True).copy()
        df["deg"] = df.groupby("src")["src"].transform("size").astype("int64")
        return df

    edges = hash_partitioned_map_batches(edges, ["src"], _dedup_deg).materialize()

    def _node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.unique(np.concatenate(
                [df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64)]
            ))}
        )

    nodes = hash_partitioned_map_batches(
        edges.map_batches(_node_rows, batch_format="pandas"),
        ["node"],
        lambda df: df.drop_duplicates(ignore_index=True),
    ).materialize()
    n = nodes.count()

    ranks = nodes.map_batches(
        lambda df, _n=n: df.assign(r=1.0 / _n), batch_format="pandas"
    ).materialize()

    for _ in range(_ITERS):
        # phase 1: ranks ∪ edges co-partitioned on the source node
        tag_r = ranks.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["node"], "dst": np.int64(0),
                 "deg": np.int64(0), "r": df["r"], "side": np.int8(0)}
            ),
            batch_format="pandas",
        )
        tag_e = edges.map_batches(
            lambda df: pd.DataFrame(
                {"key": df["src"], "dst": df["dst"], "deg": df["deg"],
                 "r": np.float64(0.0), "side": np.int8(1)}
            ),
            batch_format="pandas",
        )

        def _contrib(df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {"node": pd.Series(dtype="int64"), "w": pd.Series(dtype="float64")}
            )
            if not len(df):
                return empty
            rside = df[df["side"] == 0][["key", "r"]]
            eside = df[df["side"] == 1][["key", "dst", "deg"]]
            j = eside.merge(rside, on="key", how="inner")
            if not len(j):
                return empty
            j["w"] = j["r"] / j["deg"]
            out = j.groupby("dst", as_index=False)["w"].sum()
            return out.rename(columns={"dst": "node"}).astype(
                {"node": "int64", "w": "float64"}
            )

        contribs = hash_partitioned_map_batches(
            tag_r.union(tag_e), ["key"], _contrib
        )

        # phase 2: contributions ∪ node base co-partitioned on node
        base = nodes.map_batches(
            lambda df: df.assign(w=0.0), batch_format="pandas"
        )

        def _apply(df: pd.DataFrame, _n=n) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {"node": pd.Series(dtype="int64"),
                     "r": pd.Series(dtype="float64")}
                )
            s = df.groupby("node", as_index=False)["w"].sum()
            s["r"] = 0.15 / _n + _DAMPING * s["w"]
            return s[["node", "r"]]

        ranks = hash_partitioned_map_batches(
            contribs.union(base), ["node"], _apply
        ).materialize()

    out = ranks.to_pandas()
    out["pr"] = np.round(out.pop("r"), 6)
    return out.sort_values("node").reset_index(drop=True)


def pagerank(sf_dir: str, driver_threshold: int | None = None) -> pd.DataFrame:
    """5-iteration PageRank over the DISTINCT (l_partkey -> l_suppkey)
    edge set. Gated like every battery op: edge lists bounded by the
    driver threshold run the sequential numpy kernel; above it the
    2-shuffles-per-iteration co-partition loop runs (forced in tests)."""
    from .relational import _table_rows

    if driver_threshold is None:
        # Higher than the battery's 500k: the driver kernel holds only the
        # per-batch-DEDUPED (src, dst) int64 edge list (~16 B/edge, 32 MB
        # at 2M), while the distributed branch pays 10 hash-shuffle rounds
        # of fixed aggregator spin-up (~60-80 s at 32 CPUs) that dwarf the
        # data term until edges reach tens of millions — the sf0.1-vs-sf1
        # ladder measured the distributed wall FLAT (79 -> 56 s) at 10x
        # rows precisely because it is machinery-bound, not data-bound.
        driver_threshold = 2_000_000
    edges = _edges_ds(sf_dir)
    if _table_rows(sf_dir, "lineitem") <= driver_threshold:
        return _pagerank_driver(edges.to_pandas())
    return _pagerank_distributed(edges)


def _pr_round_sql(prev: str, new: str) -> str:
    return f"""
{new} AS (
    SELECT nn.node,
           0.15 / (SELECT n FROM cnt)
           + 0.85 * COALESCE(SUM({prev}.r / deg.d), 0) AS r
    FROM nodes nn
    LEFT JOIN edges e ON e.dst = nn.node
    LEFT JOIN {prev} ON {prev}.node = e.src
    LEFT JOIN deg ON deg.src = e.src
    GROUP BY nn.node
)"""


PAGERANK_SQL = (
    """
WITH edges AS (
    SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000000 AS dst
    FROM lineitem
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
cnt AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM cnt) AS r FROM nodes),"""
    + ",".join(_pr_round_sql(f"r{i}", f"r{i + 1}") for i in range(_ITERS))
    + """
SELECT node, ROUND(r, 6) AS pr FROM r5 ORDER BY node
"""
)
