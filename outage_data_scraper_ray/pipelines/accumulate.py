"""Span explode + per-level accumulated tables + partitioned sink.

The reference accumulates each parse result as an append to
``{state}/layout_{id}/{level}_{emc}.csv`` (save(), app/scrapers/util.py:21-60,
path scheme app/main.py:29) — a read-modify-write CSV per (state, layout,
level, EMC). This module is the Ray-Data-native replacement:

- ``explode_spans``: docs (interleaved span rows) -> one row per span,
  vectorized with pyarrow list_flatten + list_parent_indices (zero-copy
  parent-column gather, no Python row loop).
- ``level_table``: the relational view of one (layout, level): span JSON
  records parsed back into columns — the exact DataFrame a reference user
  gets from one accumulated CSV.
- ``write_accumulated``: partitioned parquet sink ``state=/layout=/kind=``
  via write_parquet(partition_cols=...): append = drop a new run's files
  into the partition (run_id column carries lineage), never
  read-modify-write; dedup is the explicit exact_dedup operator
  (the reference disabled theirs, util.py:42).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def explode_spans(docs: rd.Dataset) -> rd.Dataset:
    """One row per span with doc context: (doc_id, url, emc, state, layout,
    epoch, kind, text, media_ref, offset)."""

    def _explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        cols = {}
        for name in ("doc_id", "url", "emc", "state", "layout", "epoch"):
            if name in batch.column_names:
                cols[name] = pc.take(batch.column(name), parents)
        for field in ("kind", "text", "media_ref", "offset"):
            cols[field] = pc.struct_field(flat, field)
        return pa.table(cols)

    return docs.map_batches(_explode, batch_format="pyarrow")


def level_table(span_rows: rd.Dataset, layout: str, kind: str) -> rd.Dataset:
    """Columnar view of one (layout, level): the reference's per-level
    DataFrame (e.g. per_outage_<emc>.csv) reconstructed from span JSON."""
    filtered = span_rows.filter(
        expr=f"layout == '{layout}' and kind == '{kind}'"
    )

    def _parse(batch: pa.Table) -> pd.DataFrame:
        recs = [json.loads(t) for t in batch.column("text").to_pylist()]
        df = pd.DataFrame(recs)
        df.insert(0, "doc_id", batch.column("doc_id").to_pylist())
        return df

    return filtered.map_batches(_parse, batch_format="pyarrow")


def write_accumulated(span_rows: rd.Dataset, out_dir: str, run_id: str) -> None:
    """Partitioned append sink: out_dir/state=<s>/layout=<l>/kind=<k>/
    with a run_id lineage column; a rerun writes new files, never rewrites."""

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "run_id", pa.array([run_id] * batch.num_rows, pa.string())
        )

    span_rows.map_batches(_tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["state", "layout", "kind"]
    )
