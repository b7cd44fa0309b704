"""Large-scale rehearsal of every forced-distributed branch in one run.

The driver thresholds that pick driver-side combines are all forced to 0,
so the branches that would actually execute at the north_rule's
10^10-frontier scale are the ones measured here:

- frontier dedupe: staged parquet + hash-partitioned drop_duplicates
  (frontier_driver_threshold=0) every epoch,
- seen-mark/counter commit: the distributed commit pass
  (commit_driver_threshold=0),
- exact dedup over the crawled span texts: one hash-shuffle on text_md5 +
  vectorized per-partition keep-min (broadcast_threshold=0),
- near-dedup over a controlled-duplicate corpus derived from the crawl ids
  (GRAFT_REH_DEDUP_ROWS, default 500,000; ~10% duplicate rate):
  minhash_lsh_dedup with driver_threshold=0 (hash-shuffled LSH candidate
  generation AND hash-shuffled exact-Jaccard verify), simhash_dedup, and
  embedding_dedup (both always hash-shuffled).

Prints ONE JSON line with wall seconds per stage, throughput, and peak
driver RSS. Defaults: 1,000,000 seeds, max_rows=2 (shallow payloads — the
point is frontier/commit pressure, not parse volume).

    python tools/rehearsal_distributed.py
    GRAFT_REH_DEDUP_ROWS=0 python tools/rehearsal_distributed.py  # skip near-dedup
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    n_seeds = int(os.environ.get("GRAFT_REH_SEEDS", "1000000"))
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from outage_data_scraper_ray.functions.dedup import exact_dedup
    from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob

    workdir = "/tmp/odsr_rehearsal"
    shutil.rmtree(workdir, ignore_errors=True)
    cfg = CrawlConfig(
        n_seeds=n_seeds,
        workdir=workdir,
        max_epochs=4,
        max_rows=2,
        politeness_rate=1e9,
        politeness_burst=1e9,
        failure_rate=0.01,
        batch_size=1024,
        fetch_concurrency=max(2, num_cpus - 4),
        n_seen_shards=8,
        n_sched_shards=4,
        seen_capacity=1 << 22,
        # force every distributed branch
        commit_driver_threshold=0,
        frontier_driver_threshold=0,
        dedupe_frontier=True,
    )
    t0 = time.perf_counter()
    job = CrawlJob(cfg)
    stats = job.run()
    crawl_sec = time.perf_counter() - t0

    fetched = int(stats["counters"].get("fetched", 0))
    spans = int(stats["counters"].get("spans", 0))

    # forced-join exact dedup over the crawled span texts
    docs = job.docs_dataset().map_batches(
        lambda t: t.select(["doc_id", "url"]).rename_columns(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    t0 = time.perf_counter()
    n_kept = exact_dedup(
        docs, broadcast_threshold=0, row_hint=fetched
    ).count()
    dedup_sec = time.perf_counter() - t0

    # --- near-dedup branches over a controlled-duplicate corpus ------------
    # Derive text + embedding deterministically from the crawl doc ids: ~10%
    # of docs share a group id (exact near-dups), the rest are unique. Driver
    # state in every dedup path is sized by the duplicate rate (candidate /
    # verified pairs + non-identity labels), so this measures the honest
    # contract at scale, not a degenerate all-duplicates corpus.
    import numpy as np
    import pandas as pd

    n_dedup = int(os.environ.get("GRAFT_REH_DEDUP_ROWS", "500000"))
    near = {}
    if n_dedup > 0:
        from outage_data_scraper_ray.functions.dedup import (
            embedding_dedup, minhash_lsh_dedup, simhash_dedup,
        )

        n_groups = max(1, int(n_dedup * 0.9))

        def _mk_text(batch: pd.DataFrame, _ng=n_groups) -> pd.DataFrame:
            gid = (
                pd.util.hash_array(batch["doc_id"].to_numpy(dtype=object),
                                   categorize=False)
                % np.uint64(_ng)
            ).astype(np.int64)
            # 12 pseudo-words per doc, each a pure function of (gid, pos):
            # equal gid -> identical text; unequal gids share ~nothing, so
            # LSH candidates are real duplicates, not template overlap
            text = None
            for j in range(12):
                wj = (
                    (gid.astype(np.uint64) * np.uint64(2654435761)
                     + np.uint64(j)) * np.uint64(0x9E3779B97F4A7C15)
                ) % np.uint64(10**12)
                piece = np.char.add("w", wj.astype(str))
                text = piece if text is None else np.char.add(
                    np.char.add(text, " "), piece
                )
            return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                                 "text": text, "gid": gid})

        corpus = (
            job.docs_dataset()
            .select_columns(["doc_id"])
            .limit(n_dedup)
            .map_batches(_mk_text, batch_format="pandas")
        )
        corpus_path = os.path.join("/tmp", "odsr_rehearsal_corpus")
        shutil.rmtree(corpus_path, ignore_errors=True)
        corpus.write_parquet(corpus_path)
        import ray.data as rd

        corpus = rd.read_parquet(corpus_path, columns=["doc_id", "text"])

        # self-check: ground-truth duplicate count = rows minus distinct
        # gids (each gid's first doc is the group representative). A wrong
        # corpus (e.g. colliding doc_ids) shows up here, not as a silent
        # recall gap — the round-3 seed-URL collision hid exactly this way.
        import duckdb

        gt = duckdb.sql(
            f"SELECT COUNT(*) - COUNT(DISTINCT gid) FROM "
            f"read_parquet('{corpus_path}/*.parquet')"
        ).fetchone()[0]
        near["ground_truth_dups"] = int(gt)

        def _counts(labeled, id_col):
            # one pass: total rows + rows labeled into another doc's group
            def _cnt(b: pd.DataFrame, _c=id_col) -> pd.DataFrame:
                return pd.DataFrame({"n": [len(b)],
                                     "d": [int((b["dup_group"] != b[_c]).sum())]})

            agg = labeled.map_batches(_cnt, batch_format="pandas").to_pandas()
            return int(agg["n"].sum()), int(agg["d"].sum())

        t0 = time.perf_counter()
        n_min, d_min = _counts(
            minhash_lsh_dedup(corpus, driver_threshold=0, row_hint=n_dedup),
            "doc_id",
        )
        near["minhash_forced_sec"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        n_sim, d_sim = _counts(simhash_dedup(corpus), "doc_id")
        near["simhash_sec"] = round(time.perf_counter() - t0, 1)

        def _mk_emb(batch: pd.DataFrame, _ng=n_groups) -> pd.DataFrame:
            h = pd.util.hash_array(batch["doc_id"].to_numpy(dtype=object),
                                   categorize=False)
            gid = (h % np.uint64(_ng)).astype(np.int64)
            # 32-dim vector as a pure function of gid: equal gid -> cosine 1;
            # unequal gids give pseudo-random +-1 vectors (max |cos| << 0.95)
            bits = (
                (gid[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.arange(16, 48, dtype=np.uint64)[None, :]
            ) & np.uint64(1)
            vecs = bits.astype(np.float32) * 2.0 - 1.0
            # vec_id = full 64-bit doc hash (unique across batches w.h.p.)
            out = pd.DataFrame({"vec_id": h.view(np.int64)})
            out["embedding"] = list(vecs)
            return out

        embds = rd.read_parquet(corpus_path, columns=["doc_id"]).map_batches(
            _mk_emb, batch_format="pandas"
        )
        t0 = time.perf_counter()
        n_emb, d_emb = _counts(embedding_dedup(embds), "vec_id")
        near["embedding_sec"] = round(time.perf_counter() - t0, 1)
        near["rows"] = n_dedup
        near["labeled"] = {"minhash": n_min, "simhash": n_sim,
                           "embedding": n_emb}
        near["dups_found"] = {"minhash": d_min, "simhash": d_sim,
                              "embedding": d_emb}
        shutil.rmtree(corpus_path, ignore_errors=True)

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    shutil.rmtree(workdir, ignore_errors=True)
    ray.shutdown()

    print(json.dumps({
        "seeds": n_seeds,
        "num_cpus": num_cpus,
        "epochs": stats["epochs"],
        "urls": fetched,
        "spans": spans,
        "crawl_sec": round(crawl_sec, 1),
        "urls_per_sec": round(fetched / crawl_sec, 1),
        "exact_dedup_sec": round(dedup_sec, 1),
        "exact_dedup_kept": int(n_kept),
        "near_dedup": near,
        "peak_driver_rss_mb": round(peak_rss_mb, 1),
        "forced": ["frontier_driver_threshold=0", "commit_driver_threshold=0",
                   "exact_dedup broadcast_threshold=0",
                   "minhash driver_threshold=0 (candidates + verify shuffled)"],
    }))


if __name__ == "__main__":
    main()
