"""Downstream readers + the failure table view.

S14: the reference re-reads its accumulated CSVs with pd.read_csv
(pipeline.py:38-47) and the POUS export as utf-16 CSV
(step1_threshold.py:380, step0_split_file.py:7). K3: failures become rows
in a scraperdowntime table (app/main.py:19,43-48); in this engine fetch
failures are already rows of the docs table (status != 200) and this module
projects them into the reference's failure schema.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data as rd

from ..kernels.common import SCRAPE_TS_FORMAT


def read_accumulated_csv(path: str, **arrow_csv_args) -> rd.Dataset:
    """Plain CSV reader for reference-style accumulated files."""
    return rd.read_csv(path, **arrow_csv_args)


def read_pous_csv(path: str) -> rd.Dataset:
    """utf-16 POUS export reader (step1_threshold.py:380 reads
    encoding="utf-16"). Ray's read_csv assumes utf-8, so decode via the
    pyarrow csv reader per file and assemble a Dataset — POUS exports are a
    handful of files, not the 100 TB path."""
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.csv"))
    )
    tables = []
    for f in files:
        with open(f, "r", encoding="utf-16") as fh:
            data = fh.read().encode("utf8")
        tables.append(pacsv.read_csv(pa.BufferReader(data)))
    return rd.from_arrow(pa.concat_tables(tables))


def failures_table(docs: rd.Dataset) -> rd.Dataset:
    """K3: project fetch failures into the reference failure schema
    (state, layout, emc, reason, timestamp — app/main.py:19)."""
    from ..stages.fetch import VIRTUAL_SCRAPE_TS

    def _project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        failed = batch.filter(pc.not_equal(batch["status"], 200))
        n = failed.num_rows
        return pa.table(
            {
                "state": failed.column("state"),
                "layout": failed.column("layout"),
                "emc": failed.column("emc"),
                "reason": failed.column("reason"),
                "timestamp": pa.array([VIRTUAL_SCRAPE_TS] * n, pa.string()),
            }
        )

    return docs.map_batches(_project, batch_format="pyarrow")
