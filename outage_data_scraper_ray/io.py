"""TableIO: thin table-storage layer.

The north_star names Lance tables; ``pylance`` is not installed in this
sandbox (verified at build time), so TableIO prefers Lance when importable
and otherwise uses an identical logical layout on partitioned Parquet:
one dataset directory, hive partition columns, plus a MANIFEST.json
(schema, partition columns, completed run_ids) giving the append/resume
semantics a Lance commit log would provide.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa

import ray.data as rd


def read_parquet_clean(
    path: str,
    *,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """read_parquet with the b'pandas' footer metadata stripped at the
    source. pandas-written parquet carries schema metadata whose dict values
    make pa.Schema unhashable, so every downstream block merge logs "Failed
    to hash the schemas" and loses unify_schemas' early exit. One driver
    footer read builds a metadata-free (projected) schema instead."""
    import glob

    import pyarrow.parquet as pq

    schema_src = path
    if os.path.isdir(path):
        # directory datasets (one file per shard/copy): schema from the
        # first footer — all shards share it by construction
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if files:
            schema_src = files[0]
    sch = pq.read_schema(schema_src).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(
        path, schema=sch, columns=columns, override_num_blocks=override_num_blocks
    )

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


class TableIO:
    backend = "lance" if HAVE_LANCE else "parquet"

    @staticmethod
    def _manifest_path(path: str) -> str:
        return os.path.join(path, "MANIFEST.json")

    @classmethod
    def manifest(cls, path: str) -> dict[str, Any]:
        mp = cls._manifest_path(path)
        if os.path.exists(mp):
            with open(mp) as f:
                return json.load(f)
        return {"backend": cls.backend, "runs": [], "partition_cols": []}

    @classmethod
    def write(
        cls,
        ds: rd.Dataset,
        path: str,
        *,
        partition_cols: list[str] | None = None,
        run_id: str = "run0",
    ) -> None:
        """Append one run. A run already recorded in the manifest is skipped
        (idempotent re-runs — the resume contract)."""
        man = cls.manifest(path)
        if run_id in man["runs"]:
            return

        def _tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "run_id", pa.array([run_id] * batch.num_rows, pa.string())
            )

        tagged = ds.map_batches(_tag, batch_format="pyarrow")
        if HAVE_LANCE:  # pragma: no cover - pylance absent in this sandbox
            # Lance is unpartitioned-by-directory; run_id lineage rides as a
            # column (same append/resume contract as the parquet layout, the
            # commit log handles physical appends). Distributed sink — no
            # driver-side materialization.
            #
            # Mode comes from PROBING the target, not from the manifest: a
            # crash after write_lance but before the manifest append leaves
            # a real Lance dataset the manifest doesn't know about — a
            # retried run must append, and first delete the partial run's
            # rows so the retry is exactly-once.
            try:
                existing = lance.dataset(path)
            except (ValueError, OSError):
                existing = None
            if existing is not None:
                existing.delete(f"run_id = '{run_id}'")
            tagged.write_lance(path, mode="append" if existing else "create")
        elif partition_cols:
            tagged.write_parquet(path, partition_cols=partition_cols)
        else:
            tagged.write_parquet(path)
        man["runs"].append(run_id)
        man["partition_cols"] = partition_cols or []
        os.makedirs(path, exist_ok=True)
        tmp = cls._manifest_path(path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, cls._manifest_path(path))

    @classmethod
    def read(cls, path: str, columns: list[str] | None = None) -> rd.Dataset:
        if HAVE_LANCE:  # pragma: no cover
            return rd.read_lance(path, columns=columns)
        import glob

        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        return rd.read_parquet(files, columns=columns)
