"""Synthesize a larger scale factor by deterministic key-shifted tiling of
/root/testdata/sf0.1 (no external data — the driver's own tables are the
only source). FACTOR copies of each table with every entity key shifted by
copy_index * stride keep keys unique and GROUP COUNTS proportional to rows,
so shapes that degrade with cardinality (per-group dispatch, skewed
shuffles) show up honestly.

    python tools/make_sfN.py [factor] [out_dir]   # default 10 /tmp/odsr_sf1

Output layout: <out_dir>/<table>.parquet/ is a DIRECTORY of one file per
copy — both pyarrow and ray.data read it transparently, and the write is
embarrassingly parallel-friendly (one footer per copy).
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# table -> columns whose keyspace must shift per copy (stride = 10^12 * copy)
SHIFT: dict[str, list[str]] = {
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],  # broadcast lookup side: single copy
    "region": [],
    "supplier": [],
    "part": [],
}
STRIDE = 10**12


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/odsr_sf1"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for table, shift_cols in SHIFT.items():
        src = os.path.join(SRC, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        t = pq.read_table(src)
        dst = os.path.join(out_dir, f"{table}.parquet")
        os.makedirs(dst)
        n_copies = 1 if not shift_cols else factor
        for k in range(n_copies):
            tk = t
            for col in shift_cols:
                idx = tk.column_names.index(col)
                shifted = pc.add(
                    tk.column(col), pa.scalar(k * STRIDE, tk.column(col).type)
                )
                tk = tk.set_column(idx, col, shifted)
            pq.write_table(tk, os.path.join(dst, f"part-{k:04d}.parquet"))
        print(table, "->", n_copies, "copies,", t.num_rows * n_copies, "rows")


if __name__ == "__main__":
    main()
