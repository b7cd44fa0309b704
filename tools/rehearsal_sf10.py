"""sf1-vs-sf10 battery ladder (VERDICT r4 #5): run a battery subset at
/tmp/odsr_sf1 and /tmp/odsr_sf10 in ONE quota window and print the ratio
per query. sf10 = tools/make_sfN.py x100 of sf0.1 (10M events / 60M
lineitem / 15M orders / 500k docs / 200k vectors; group counts scale with
rows). Watch items from VERDICT r4: the asof co-partition branch (15M
orders is far past the 1M broadcast bound) and cosine_pairs_exact (pair
output grows quadratically in clique size under the tiling — run it last,
opt-in via GRAFT_SF10_PAIRS=1).

Usage: python tools/rehearsal_sf10.py   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


QUERIES = [
    "q1_pricing", "grouped_sum", "window_end_ts", "minidx_dedup",
    "outage_metrics", "hash_join", "asof_join", "exact_dedup_docs",
    "token_counts", "bpe_token_counts", "quality_filter", "lang_id",
    "tz_convert", "tumbling_window", "sliding_window", "grouped_topk",
    "epoch_ms_cast", "knn_topk",
]


def main() -> None:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    import __ray_entry__ as E

    qs = E.queries()
    override = os.environ.get("GRAFT_SF10_QUERIES")
    names = override.split(",") if override else list(QUERIES)
    if os.environ.get("GRAFT_SF10_PAIRS") == "1":
        names.append("cosine_pairs_exact")
    res = {"num_cpus": num_cpus, "queries": {}}
    pairs_env = os.environ.get("GRAFT_SF_PAIR")  # "tagA:dirA,tagB:dirB"
    if pairs_env:
        pair = [tuple(p.split(":", 1)) for p in pairs_env.split(",")]
    else:
        pair = [("sf1", "/tmp/odsr_sf1"), ("sf10", "/tmp/odsr_sf10")]
    for name in names:
        row = {}
        for sf_tag, sf_dir in pair:
            t0 = time.perf_counter()
            out = qs[name](sf_dir)
            if isinstance(out, rd.Dataset):
                n = out.count()
            else:
                n = len(out)
            row[sf_tag] = round(time.perf_counter() - t0, 2)
            row[f"{sf_tag}_rows"] = int(n)
        tag_a, tag_b = pair[0][0], pair[1][0]
        row["ratio"] = round(row[tag_b] / max(row[tag_a], 1e-9), 1)
        res["queries"][name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
