"""The crawl pipeline: epoch-driven frontier loop with checkpoint/resume.

Reference shape (app/main.py:13-64): a sequential per-EMC loop — fetch,
parse, append CSV, log failures. This engine re-expresses it as an
epoch-driven Ray Data loop designed for a 10^10-URL frontier:

    frontier(e)  [parquet]
      -> politeness admission  (groupby(host).map_groups rank < budget;
                                budgets from sharded token-bucket actors on a
                                virtual clock — deterministic)
      -> seen filter           (sharded cuckoo-filter actors, mark-on-admit)
      -> fetch + parse         (actor pool map_batches, zero-copy Arrow)
      -> docs(e)  [parquet partition per epoch]   (interleaved span rows)
      -> children(docs) ∪ deferred  ->  frontier(e+1)  [parquet]
      -> checkpoint manifest (seen dumps, bucket states, counters, lineage)

Scale notes:
- The frontier lives on disk between epochs (never materialized on the
  driver); each epoch streams it through the gate.
- Discovery (S9/S10, ga_scraper.py:405-435) feeds child URLs back through
  the same loop — driving epochs from the driver avoids the executor
  feedback deadlock called out in SURVEY.md section 7.4.
- Every epoch directory is written once and finalized by an atomic manifest
  rename, so a killed job resumes at the last complete epoch and re-runs at
  most one epoch of work (the seen-filter makes the re-run idempotent:
  already-marked URLs are dropped, which matches the reference's
  append-only-sink tolerance of re-runs, util.py:38-53).
- Skew: admission is per-host top-k inside map_groups; a pathologically hot
  host is bounded by its token budget long before group size matters, and
  hosts are spread across scheduler shards by hash (salting precedent:
  SURVEY.md section 4).
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import sys
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..schemas import FRONTIER
from ..shuffle import hash_partitioned_map_batches
from ..stages.fetch import (
    FetchParseStage,
    SeenFilterStage,
    add_hash_columns,
    children_to_frontier,
    rank_within_budget,
)
from ..state.counters import CrawlCounters
from ..state.cuckoo import SeenShard, shard_of
from ..state.politeness import HostScheduler, scheduler_shard_of
from ..synth import (
    MAX_CHILDREN_PER_DOC,
    make_seed_registry,
    robots_allows,
    robots_rules,
)


@dataclass
class CrawlConfig:
    seed: int = 42
    n_seeds: int = 285
    max_rows: int = 8
    failure_rate: float = 0.02
    politeness_rate: float = 64.0   # tokens/sec per host
    politeness_burst: float = 64.0
    politeness_dt: float = 1.0      # virtual seconds per epoch
    # state-actor shard counts: None = derive from the cluster at CrawlJob
    # construction (CPUs/8 seen shards, CPUs/16 scheduler shards, floors 4/2)
    # so the seen/scheduler RPC fan-in scales with the cluster instead of
    # funneling a 4N-node cluster into fixed constants. Resume re-routes
    # checkpointed state across a DIFFERENT shard count (see _restore_state).
    n_seen_shards: int | None = None
    n_sched_shards: int | None = None
    seen_capacity: int = 1 << 20
    exact_seen: bool = False        # exact per-shard sets for conformance tests
    # epochs whose docs row count exceeds this commit marks/counters via the
    # distributed pass instead of one driver-side pyarrow read
    commit_driver_threshold: int = 1_000_000
    # dedupe the next frontier by canonical_hash whenever discovery added
    # children: with a read-only seen filter, two parents discovering the
    # same child URL in one epoch would otherwise both fetch it. The
    # synthetic web derives children from their parent URL (no cross-parent
    # dupes), but a real web link graph has them; keep ON outside benchmarks
    # of the synthetic fast path.
    dedupe_frontier: bool = True
    # frontier-dedupe combine site: candidate frontiers bounded under this
    # dedupe on the driver (one vectorized pass, no extra shuffle); above it
    # the hash-partitioned distributed pass runs. 0 forces distributed.
    frontier_driver_threshold: int = 500_000
    max_epochs: int = 50
    batch_size: int = 256
    fetch_concurrency: int = 4
    stateless_fetch: bool = True  # synthetic web needs no session; real
                                  # fetchers set False -> actor pool
    epoch_capacity: int | None = None  # global fetches/epoch cap: hosts are
                                       # served highest-priority-first (the
                                       # north_star priority heap)
    workdir: str = "/tmp/odsr_crawl"
    scrape_ts: str = "10-05-2023 08:00:00"  # virtual scrape timestamp (M1)
    hash_salt: str = ""  # poll-round salt: each refresh round re-fetches
    seeds_table: pa.Table | None = field(default=None, repr=False)


class _EmptyBundleSchemaFilter(logging.Filter):
    """Suppress ONLY Ray's empty-new-schema divergence warning.

    A map task whose output has zero rows (e.g. a docs batch where no row
    discovered children) emits a block-less RefBundle whose schema is None;
    the streaming executor then logs "Operator produced a RefBundle with a
    different schema ... new schema: ." even though nothing diverged (with
    enforce_schemas off it keeps the old schema, so there is no behavior
    change either). Real schema divergences — where the new schema has
    fields — still log."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "different schema" in msg and "new schema: ." in msg
        )


_SCHEMA_FILTER_INSTALLED = False


def _install_schema_warning_filter() -> None:
    global _SCHEMA_FILTER_INSTALLED
    if _SCHEMA_FILTER_INSTALLED:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBundleSchemaFilter())
    _SCHEMA_FILTER_INSTALLED = True


class CrawlJob:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.workdir = cfg.workdir
        os.makedirs(self.workdir, exist_ok=True)
        _install_schema_warning_filter()
        # state actors are bookkeeping, not compute: num_cpus=0 so they never
        # compete with (or deadlock against) the Data execution pool.
        # Shard counts default from cluster size (shard routing only
        # distributes state — admission/seen semantics are count-invariant,
        # which is what makes resume-across-counts sound).
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_seen = cfg.n_seen_shards or max(4, cpus // 8)
        n_sched = cfg.n_sched_shards or max(2, cpus // 16)
        self.seen = [
            ray.remote(num_cpus=0)(SeenShard).remote(cfg.seen_capacity, cfg.exact_seen)
            for _ in range(n_seen)
        ]
        self.sched = [
            ray.remote(num_cpus=0)(HostScheduler).remote(
                cfg.politeness_rate, cfg.politeness_burst, cfg.politeness_dt, cfg.seed
            )
            for _ in range(n_sched)
        ]
        self.counters = ray.remote(num_cpus=0)(CrawlCounters).remote()

    # ---- paths -----------------------------------------------------------
    def _epoch_dir(self, e: int) -> str:
        # no '=' in the name: pyarrow would infer a hive partition column
        # from 'epoch=NNNNN' and silently widen every schema read below it
        return os.path.join(self.workdir, f"ep-{e:05d}")

    def _frontier_next_path(self, e: int) -> str:
        # frontier feeding epoch e+1, produced by (and stored with) epoch e so
        # every epoch directory is self-contained for resume
        return os.path.join(self._epoch_dir(e), "frontier_next")

    def _docs_path(self, e: int) -> str:
        return os.path.join(self._epoch_dir(e), "docs")

    def _manifest_path(self, e: int) -> str:
        return os.path.join(self._epoch_dir(e), "MANIFEST.json")

    # ---- seeding / resume ------------------------------------------------
    def _initial_frontier(self) -> pa.Table:
        seeds = self.cfg.seeds_table
        if seeds is None:
            seeds = make_seed_registry(self.cfg.n_seeds, self.cfg.seed)
        n = seeds.num_rows
        t = seeds.append_column("depth", pa.array(np.zeros(n, dtype=np.int32)))
        t = t.append_column("parent_doc_id", pa.array([""] * n, pa.string()))
        t = t.append_column(
            "crawl_key", pa.array(seeds.column("seed_index").to_numpy().astype(np.int64))
        )
        t = t.append_column("canonical_hash", pa.array(np.zeros(n, dtype=np.uint64)))
        t = t.cast(FRONTIER)
        # Frontier-uniqueness invariant, enforced at the SEED boundary: the
        # epoch machinery (read-only seen filter, politeness accounting)
        # assumes every epoch frontier is canonical-URL-unique — children and
        # deferred rows keep it inductively via _dedupe_frontier, but a
        # user-supplied seeds_table may carry duplicate URLs. Collapse them
        # to the min-(tier, deadline, crawl_key) row, exactly the rule the
        # sequential oracle applies (oracle_sim.simulate_crawl) and the one
        # _dedupe_frontier uses for discovered collisions. This stamp is
        # LOAD-BEARING: the fetch chain does NOT re-hash (every frontier
        # row must carry its real canonical_hash by induction — seeds here,
        # children at discovery, deferred rows preserved through the gated
        # file). The seeds table is driver-resident by API contract
        # (pa.Table), so a vectorized driver pass adds no distributed work.
        t = add_hash_columns(t, salt=self.cfg.hash_salt)
        df = t.to_pandas()
        df = df.sort_values(
            ["utility_tier", "refresh_deadline", "crawl_key"], kind="mergesort"
        ).drop_duplicates(subset=["canonical_hash"], keep="first")
        # schema pin: the pandas round trip must not drift timestamp[ms]->[ns]
        out = pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
        return out.select(FRONTIER.names).cast(FRONTIER)

    def last_complete_epoch(self) -> int:
        e = -1
        while os.path.exists(self._manifest_path(e + 1)):
            e += 1
        return e

    def _restore_state(self, e: int) -> None:
        import glob as _glob

        with open(self._manifest_path(e)) as f:
            manifest = json.load(f)
        state_dir = os.path.join(self._epoch_dir(e), "state")
        # Checkpoint filenames carry an unpadded shard index, so a plain
        # lexicographic sort mis-orders at >=11 shards (seen_10 before
        # seen_2) and the positional zip below would hand every actor
        # another shard's state — hash-routed lookups would miss and the
        # resumed crawl would refetch. Sort numerically by the index.
        def _shard_idx(p: str) -> int:
            return int(re.search(r"_(\d+)\.", os.path.basename(p)).group(1))

        seen_files = sorted(
            _glob.glob(os.path.join(state_dir, "seen_*.npz")), key=_shard_idx
        )
        sched_files = sorted(
            _glob.glob(os.path.join(state_dir, "sched_*.json")), key=_shard_idx
        )
        if len(seen_files) == len(self.seen):
            for shard, path in zip(self.seen, seen_files):
                z = np.load(path, allow_pickle=False)
                state = {
                    "table": z["table"],
                    "count": int(z["count"]),
                    "bucket_size": int(z["bucket_size"]),
                    "exact": bool(z["exact"]),
                    "exact_set": z["exact_set"] if z["exact"] else None,
                    "stash": z["stash"] if "stash" in z.files else None,
                    "kick_failures": int(z["kick_failures"]) if "kick_failures" in z.files else 0,
                }
                ray.get(shard.load.remote(state))
        else:
            self._reshard_seen(e, seen_files)
        if len(sched_files) == len(self.sched):
            for shard, path in zip(self.sched, sched_files):
                with open(path) as f:
                    ray.get(shard.load.remote(json.load(f)))
        else:
            self._reshard_sched(sched_files)
        ray.get(self.counters.load.remote(manifest["counters"]))

    def _reshard_sched(self, sched_files: list[str]) -> None:
        """Resume across a different scheduler shard count: merge the dumped
        (host -> tokens/robots) maps and re-route every host by hash into
        the new shard layout. Budgets are per-host pure state, so the
        admission sequence is bit-identical to an un-resharded resume."""
        per: list[dict] = [{"tokens": {}, "robots": {}} for _ in self.sched]
        n = len(self.sched)
        for path in sched_files:
            with open(path) as f:
                d = json.load(f)
            for h, t in d.get("tokens", {}).items():
                per[scheduler_shard_of(h, n)]["tokens"][h] = t
            for h, r in d.get("robots", {}).items():
                per[scheduler_shard_of(h, n)]["robots"][h] = r
        ray.get([s.load.remote(d) for s, d in zip(self.sched, per)])

    def _reshard_seen(self, e: int, seen_files: list[str]) -> None:
        """Resume across a different seen-shard count: re-route the dumped
        segments by hash.

        Exact dumps carry the raw uint64 hashes — re-route those directly.
        Filter-only dumps are not invertible (a cuckoo table stores 16-bit
        fingerprints), so the seen set is rebuilt from its system of
        record: the canonical_hash column of every finalized epoch's docs
        parquet — exactly the stream _commit_epoch marked in the first
        place (and the same idempotent mark() call). Small lineages replay
        on the driver; large ones via the distributed commit-style pass."""
        exact_sets = []
        all_exact = True
        for path in seen_files:
            z = np.load(path, allow_pickle=False)
            if bool(z["exact"]):
                exact_sets.append(z["exact_set"])
            else:
                all_exact = False
                break
        if all_exact and exact_sets:
            hashes = np.concatenate(exact_sets).astype(np.uint64)
            self._mark_hashes(hashes)
            return
        # rebuild from docs lineage (epochs 0..e)
        for ep in range(e + 1):
            docs = self._docs_path(ep)
            if not os.path.exists(docs):
                continue
            if self._parquet_num_rows(docs) <= self.cfg.commit_driver_threshold:
                t = pq.read_table(docs, columns=["canonical_hash"])
                self._mark_hashes(
                    t.column("canonical_hash").to_numpy().astype(np.uint64, copy=False)
                )
            else:
                seen_actors = self.seen
                n_sh = len(seen_actors)

                def _mark(t: pa.Table, _a=seen_actors, _n=n_sh) -> pa.Table:
                    h = t.column("canonical_hash").to_numpy().astype(np.uint64, copy=False)
                    route = shard_of(h, _n)
                    refs = [
                        _a[s].mark.remote(h[route == s])
                        for s in range(_n)
                        if (route == s).any()
                    ]
                    ray.get(refs)
                    return pa.table({"n": [t.num_rows]})

                cpus = int(ray.cluster_resources().get("CPU", 4))
                rd.read_parquet(
                    docs, columns=["canonical_hash"],
                    override_num_blocks=max(4, cpus // 4),
                ).map_batches(_mark, batch_format="pyarrow").to_pandas()

    def _mark_hashes(self, hashes: np.ndarray) -> None:
        n = len(self.seen)
        route = shard_of(hashes, n)
        refs = [
            self.seen[s].mark.remote(hashes[route == s])
            for s in range(n)
            if (route == s).any()
        ]
        if refs:
            ray.get(refs)

    def _checkpoint(self, e: int, extra: dict[str, Any]) -> None:
        state_dir = os.path.join(self._epoch_dir(e), "state")
        os.makedirs(state_dir, exist_ok=True)
        # shards write their own npz in parallel (atomic rename inside):
        # the table arrays never ship to the driver, and the epoch pays
        # max(shard write) instead of sum(transfer + serial write)
        ray.get(
            [
                s.dump_to.remote(os.path.join(state_dir, f"seen_{i}.npz"))
                for i, s in enumerate(self.seen)
            ]
        )
        for i, d in enumerate(ray.get([s.dump.remote() for s in self.sched])):
            with open(os.path.join(state_dir, f"sched_{i}.json"), "w") as f:
                json.dump(d, f)
        manifest = {"epoch": e, "counters": ray.get(self.counters.snapshot.remote()), **extra}
        tmp = self._manifest_path(e) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(e))  # atomic finalize

    def _commit_epoch(self, e: int) -> None:
        """Post-finalize commit pass over epoch e's docs parquet: mark every
        fetched URL's canonical hash seen (idempotent add-if-absent on the
        shard actors) and derive fetch counters from per-batch partials,
        added exactly once on the driver. Distributed — only tiny count rows
        and O(batch) hash arrays move; safe to re-run on resume."""
        seen_actors = self.seen
        n_sh = len(seen_actors)

        # small epochs (scalar columns of fetched rows fit trivially in the
        # driver): skip the Ray Data execution entirely — one footer-pruned
        # pyarrow read + batched shard RPCs. Large epochs run distributed.
        if self._parquet_num_rows(self._docs_path(e)) <= self.cfg.commit_driver_threshold:
            # one threaded dataset read over the whole docs dir — a per-file
            # Python loop here is serial driver time that caps scaling
            t = pq.read_table(
                self._docs_path(e), columns=["canonical_hash", "status", "n_spans"]
            )
            # docs carry the frontier's uint64 canonical_hash column — no
            # per-row doc_id hex parse on the commit path
            h = t.column("canonical_hash").to_numpy().astype(np.uint64, copy=False)
            route = shard_of(h, n_sh)
            refs = [
                seen_actors[s].mark.remote(h[route == s])
                for s in range(n_sh)
                if (route == s).any()
            ]
            ray.get(refs)
            ok = int(pc.sum(pc.cast(pc.equal(t.column("status"), 200), pa.int64())).as_py() or 0)
            ray.get(
                self.counters.add_many.remote(
                    {
                        "fetched": t.num_rows,
                        "fetch_ok": ok,
                        "fetch_failed": t.num_rows - ok,
                        "spans": int(pc.sum(t.column("n_spans")).as_py() or 0),
                    }
                )
            )
            return

        def _commit(t: pa.Table, _a=seen_actors, _n=n_sh) -> pa.Table:
            # docs carry the frontier's uint64 canonical_hash — vectorized
            # routing, no per-row hex parse
            h = t.column("canonical_hash").to_numpy().astype(np.uint64, copy=False)
            route = shard_of(h, _n)
            refs = []
            for s in range(_n):
                idx = np.flatnonzero(route == s)
                if idx.size:
                    refs.append(_a[s].mark.remote(h[idx]))
            ray.get(refs)
            ok = int(pc.sum(pc.cast(pc.equal(t.column("status"), 200), pa.int64())).as_py() or 0)
            n_spans = int(pc.sum(t.column("n_spans")).as_py() or 0)
            return pa.table({"n": [t.num_rows], "ok": [ok], "spans": [n_spans]})

        cpus = int(ray.cluster_resources().get("CPU", 4))
        parts = (
            # pruned read: three scalar columns, never the spans payload;
            # coalesced blocks — the work per row is one route + RPC
            rd.read_parquet(
                self._docs_path(e), columns=["canonical_hash", "status", "n_spans"],
                override_num_blocks=max(4, cpus // 4),
            )
            .map_batches(_commit, batch_format="pyarrow")
            .to_pandas()
        )
        n = int(parts["n"].sum())
        ok = int(parts["ok"].sum())
        ray.get(
            self.counters.add_many.remote(
                {
                    "fetched": n,
                    "fetch_ok": ok,
                    "fetch_failed": n - ok,
                    "spans": int(parts["spans"].sum()),
                }
            )
        )

    def _dedupe_frontier(
        self, nxt: "rd.Dataset", e: int, row_bound: int
    ) -> "rd.Dataset":
        """Keep the min-(tier, deadline, crawl_key) row per canonical_hash.

        row_bound is an a-priori upper bound on the candidate frontier size
        (deferred <= pending, children <= fan-out x fetched — both known
        before execution). Under frontier_driver_threshold the dedupe is a
        single to_pandas + vectorized sort/drop_duplicates on the driver (no
        extra parquet round trip — this sits on the epoch critical path);
        above it, a staged parquet write + hash-partitioned distributed
        pass (one shuffle, vectorized per block)."""
        if row_bound <= self.cfg.frontier_driver_threshold:
            df = nxt.to_pandas()
            if not len(df):
                return nxt
            df = df.sort_values(
                ["canonical_hash", "utility_tier", "refresh_deadline", "crawl_key"],
                kind="mergesort",
            ).drop_duplicates(subset=["canonical_hash"], keep="first")
            # pin the FRONTIER schema: a pandas round trip would otherwise
            # drift timestamp[ms] -> [ns] and split the docs schema later
            t = pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)
            return rd.from_arrow(t.select(FRONTIER.names).cast(FRONTIER))

        # canonical_hash is nearly unique (URLs mostly distinct), so a
        # groupby().map_groups here would pay one Python call per ROW — the
        # degenerate case at 10^10-frontier scale. Instead: ONE hash-shuffle
        # co-locates equal hashes per block, then one vectorized
        # sort+drop_duplicates per block (O(blocks) Python calls). The
        # shuffle consumes the deferred∪children lineage DIRECTLY — staging
        # it through an intermediate parquet (the first cut) cost a full
        # extra write+read of the candidate frontier per epoch, and the
        # lineage is all cheap pruned parquet reads + vectorized filters.
        def _keep_min_per_hash(df):
            out = df.sort_values(
                ["canonical_hash", "utility_tier", "refresh_deadline", "crawl_key"],
                kind="mergesort",
            ).drop_duplicates(subset=["canonical_hash"], keep="first")
            # same schema pin as the driver path: the pandas round trip must
            # not drift timestamp[ms] -> [ns]
            t = pa.Table.from_pandas(
                out.reset_index(drop=True), preserve_index=False
            )
            return t.select(FRONTIER.names).cast(FRONTIER)

        return hash_partitioned_map_batches(
            nxt, ["canonical_hash"], _keep_min_per_hash
        )

    _PRIORITY = ["utility_tier", "refresh_deadline", "crawl_key"]

    @classmethod
    def _merge_children_broadcast(
        cls,
        deferred: "rd.Dataset",
        defer_keys: "rd.Dataset",
        children: "rd.Dataset",
    ) -> "rd.Dataset":
        """Next-frontier merge for the small-discovery regime: deferred rows
        are URL-unique by induction (a subset of this epoch's frontier), so
        the ONLY possible collisions are children-vs-children and
        children-vs-deferred. When the children side is a-priori driver-
        bounded (MAX_CHILDREN_PER_DOC x fetched(e) <= frontier_driver_
        threshold), resolving those collisions needs NO all-to-all shuffle
        of the (possibly enormous) deferred mass:

        1. pull + self-dedupe the children on the driver (bounded),
        2. one pruned 4-column scan of the deferred keys collects the rows
           whose hash collides with a child (output sized by the collision
           count, not the frontier),
        3. the driver resolves each collision by the same min-(tier,
           deadline, crawl_key) rule the shuffle path's keep-first sort
           applies — ties go to the deferred row, matching the
           deferred-before-children union order there,
        4. the deferred stream passes through with only the losing hashes
           filtered (broadcast via ray.put), unioned with the surviving
           children.

        The deferred rows stream straight to the frontier write — the
        hash-shuffle fallback in _dedupe_frontier remains the path for
        epochs whose discovery is itself beyond driver bounds."""
        kids = children.to_pandas()
        if not len(kids):
            return deferred
        kids = kids.sort_values(
            ["canonical_hash", *cls._PRIORITY], kind="mergesort"
        ).drop_duplicates(subset=["canonical_hash"], keep="first")
        kid_hashes = ray.put(kids["canonical_hash"].to_numpy())

        def _collide(df, _r=kid_hashes):
            m = np.isin(df["canonical_hash"].to_numpy(), ray.get(_r))
            return df[m]

        coll = defer_keys.map_batches(_collide, batch_format="pandas").to_pandas()
        if len(coll):
            m = coll.merge(
                kids[["canonical_hash", *cls._PRIORITY]],
                on="canonical_hash",
                suffixes=("_d", "_k"),
            )
            tk, td = m["utility_tier_k"].to_numpy(), m["utility_tier_d"].to_numpy()
            dk, dd = (
                m["refresh_deadline_k"].to_numpy(),
                m["refresh_deadline_d"].to_numpy(),
            )
            kk, kd = m["crawl_key_k"].to_numpy(), m["crawl_key_d"].to_numpy()
            kid_wins = (tk < td) | (
                (tk == td) & ((dk < dd) | ((dk == dd) & (kk < kd)))
            )
            kids = kids[
                ~kids["canonical_hash"].isin(m.loc[~kid_wins, "canonical_hash"])
            ]
            def_losers = m.loc[kid_wins, "canonical_hash"].to_numpy()
            if def_losers.size:
                losers_ref = ray.put(def_losers)

                def _drop_losers(t, _r=losers_ref):
                    keep = ~np.isin(
                        t.column("canonical_hash").to_numpy(), ray.get(_r)
                    )
                    return t.filter(pa.array(keep))

                deferred = deferred.map_batches(
                    _drop_losers, batch_format="pyarrow"
                )
        if not len(kids):
            return deferred
        # same schema pin as the driver dedupe path (no [ms] -> [ns] drift)
        kt = pa.Table.from_pandas(kids.reset_index(drop=True), preserve_index=False)
        return deferred.union(
            rd.from_arrow(kt.select(FRONTIER.names).cast(FRONTIER))
        )

    @staticmethod
    def _parquet_num_rows(path: str) -> int:
        """Row count from parquet footers only — no Dataset execution."""
        import glob as _glob

        files = [path] if os.path.isfile(path) else _glob.glob(
            os.path.join(path, "*.parquet")
        )
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    # ---- the loop --------------------------------------------------------
    def run(
        self,
        resume: bool = False,
        epoch_callback: Any | None = None,
    ) -> dict[str, Any]:
        """Drive the crawl. ``epoch_callback(e)``, if given, fires after each
        epoch's checkpoint lands (endurance/instrumentation hook — it runs on
        the driver and must be cheap)."""
        cfg = self.cfg
        start_epoch = 0
        if resume:
            last = self.last_complete_epoch()
            if last >= 0:
                self._restore_state(last)
                start_epoch = last + 1
                # wipe partial work from any interrupted epoch; its inputs
                # (frontier_next of the last complete epoch) are untouched
                k = start_epoch
                while os.path.exists(self._epoch_dir(k)):
                    shutil.rmtree(self._epoch_dir(k))
                    k += 1
        if start_epoch == 0:
            if os.path.exists(self.workdir):
                shutil.rmtree(self.workdir)
            init_dir = os.path.join(self._epoch_dir(0), "frontier_init")
            os.makedirs(init_dir, exist_ok=True)
            # shard the seed frontier across files: ray's parquet read is
            # one task PER FILE (override_num_blocks only splits the blocks
            # it produced afterwards), so a single-file million-row seed
            # table would serialize epoch 0's widest read through one core
            t = self._initial_frontier()
            n_files = max(1, min(32, -(-t.num_rows // 65_536)))
            step = -(-t.num_rows // n_files)
            for i in range(n_files):
                part = t.slice(i * step, step)
                if part.num_rows:
                    pq.write_table(
                        part, os.path.join(init_dir, f"seeds-{i:04d}.parquet")
                    )

        # never let the fetch actor pool reserve every CPU: leave headroom
        # for the read/write task operators or the streaming executor starves
        # (see ray_guide "actor pools" sizing note)
        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        fetch_conc = max(1, min(cfg.fetch_concurrency, total_cpus - 2))

        import time as _time

        _dbg = os.environ.get("ODSR_CRAWL_TIMING") == "1"

        e = start_epoch
        while e < cfg.max_epochs:
            _t0 = _time.perf_counter()
            frontier_file = (
                os.path.join(self._epoch_dir(0), "frontier_init")
                if e == 0
                else self._frontier_next_path(e - 1)
            )
            if not os.path.exists(frontier_file):
                break
            # row count from parquet footers only — no Dataset execution
            total_pending = self._parquet_num_rows(frontier_file)
            if total_pending == 0:
                break
            # Fan-out at the READ: a frontier is tiny in bytes (URLs), so an
            # un-split read collapses to one block and fuses the whole fetch
            # chain into a single task. override_num_blocks splits the read
            # WITHOUT the materialization barrier a repartition() would be —
            # the epoch streams at every scale.
            n_fetch_blocks = max(total_cpus * 4, 8)
            read_blocks = max(1, min(n_fetch_blocks, -(-total_pending // max(1, cfg.batch_size))))
            frontier = rd.read_parquet(frontier_file, override_num_blocks=read_blocks)
            os.makedirs(self._epoch_dir(e), exist_ok=True)

            _seed = cfg.seed

            def _robots_mask(t, _s=_seed):
                """Vectorized robots mask: rules are computed once per UNIQUE
                host in the batch; hosts with no disallow rules (the vast
                majority) contribute no per-row work at all — only the rows
                of RULED hosts are materialized into Python for the path
                check."""
                import pandas as _pd

                hs = t.column("host").to_pandas()
                ruled = {
                    h: r for h in _pd.unique(hs) if (r := robots_rules(h, _s))
                }
                if not ruled:
                    return None  # all allowed
                mask = np.ones(len(hs), dtype=bool)
                idx = np.flatnonzero(hs.isin(ruled).to_numpy())
                sub_urls = t.column("url").take(pa.array(idx)).to_pylist()
                sub_hosts = hs.to_numpy()[idx]
                for i, h, u in zip(idx, sub_hosts, sub_urls):
                    mask[i] = robots_allows(u, ruled[h])
                return mask

            def _robots_filter(t, _s=_seed):
                mask = _robots_mask(t, _s)
                return t if mask is None else t.filter(pa.array(mask))

            # Fast path: when one tick provably refills every bucket to full
            # (rate*dt >= burst, so skipped consume() calls are irrelevant)
            # AND the full burst covers the whole epoch (burst >= total
            # pending rows) AND there is no global cap, admission is the
            # identity for every host — skip the count/budget executions and
            # the gated parquet round-trip. All three conditions are needed:
            # with rate*dt < burst, tokens carry over between epochs and the
            # sequential oracle's consume() matters, so the slow path must
            # run. Outcome-identical to the slow path under these gates.
            fast_path = (
                cfg.politeness_rate * cfg.politeness_dt >= cfg.politeness_burst
                and cfg.politeness_burst >= total_pending
                and cfg.epoch_capacity is None
            )
            robots_thread = None
            if fast_path:
                ray.get([sh.tick.remote() for sh in self.sched])
                admitted_n: dict[str, int] = {}
                over: set[str] = set()
                # robots_skipped is counted on the DRIVER from a tiny
                # per-batch partial pass — exactly once, immune to Ray Data
                # task replays (a _count side effect inside the fetch chain
                # would double-count on re-execution)

                def _robots_counts(t, _s=_seed):
                    mask = _robots_mask(t, _s)
                    allowed = t.num_rows if mask is None else int(mask.sum())
                    return pa.table({"n": [t.num_rows], "allowed": [allowed]})

                # overlap the count pass with the fetch execution: the count
                # is only a counter input (not a gate), so it runs in a
                # background thread and is joined before the checkpoint
                import threading as _threading

                _robots_cnt: dict[str, Any] = {}

                def _count_robots(_f=frontier_file, _out=_robots_cnt):
                    try:
                        rc = (
                            rd.read_parquet(
                                _f, columns=["host", "url"],
                                override_num_blocks=max(4, total_cpus // 4),
                            )
                            .map_batches(_robots_counts, batch_format="pyarrow")
                            .to_pandas()
                        )
                        _out["skipped"] = int(rc["n"].sum() - rc["allowed"].sum())
                    except BaseException as exc:  # surfaced at join — a
                        # silently-dead daemon thread would undercount
                        _out["error"] = exc

                robots_thread = _threading.Thread(target=_count_robots, daemon=True)
                robots_thread.start()
                admitted_source = frontier.map_batches(
                    _robots_filter, batch_format="pyarrow"
                )
                gated_path = None
                _t1 = _t2 = _time.perf_counter()
            else:
                # 1. politeness budgets (virtual-clock tick + per-host
                # counts). Counting hosts via map_batches partials avoids a
                # full shuffle — the combine happens on the tiny per-batch
                # count frames. Robots rules are evaluated inline (pure
                # function of (host, seed)); the shard actors' robots cache
                # is the checkpointed system of record.
                def _host_counts(t, _s=_seed):
                    mask = _robots_mask(t, _s)
                    allowed = (
                        np.ones(t.num_rows, dtype=bool) if mask is None else mask
                    )
                    df = t.select(
                        ["host", "utility_tier", "refresh_deadline", "crawl_key"]
                    ).to_pandas()
                    df["allowed"] = allowed
                    return (
                        df.sort_values(
                            ["utility_tier", "refresh_deadline", "crawl_key"],
                            kind="mergesort",
                        )
                        .groupby("host", as_index=False)
                        .agg(
                            n=("allowed", "sum"),
                            n_total=("allowed", "size"),
                            utility_tier=("utility_tier", "first"),
                            refresh_deadline=("refresh_deadline", "first"),
                            crawl_key=("crawl_key", "first"),
                        )
                    )

                _tg0 = _time.perf_counter()
                partial_counts = frontier.map_batches(
                    _host_counts, batch_format="pyarrow"
                ).to_pandas()
                if _dbg:
                    print(
                        f"[epoch {e}]   gate.counts={_time.perf_counter()-_tg0:.2f}s",
                        file=sys.stderr,
                    )
                prio = (
                    partial_counts.sort_values(
                        ["utility_tier", "refresh_deadline", "crawl_key"],
                        kind="mergesort",
                    )
                    .groupby("host", as_index=False)
                    .first()[["host", "utility_tier", "refresh_deadline", "crawl_key"]]
                )
                pending = partial_counts.groupby("host", as_index=False)[
                    ["n", "n_total"]
                ].sum()
                robots_skipped = int(pending["n_total"].sum() - pending["n"].sum())
                if robots_skipped:
                    ray.get(
                        self.counters.add_many.remote({"robots_skipped": robots_skipped})
                    )
                pending = pending[pending["n"] > 0]
                if int(pending["n"].sum()) == 0:
                    break
                _t1 = _time.perf_counter()
                hosts = pending["host"].tolist()
                by_shard: dict[int, list[str]] = {}
                for h in hosts:
                    by_shard.setdefault(
                        scheduler_shard_of(h, len(self.sched)), []
                    ).append(h)
                ray.get([sh.tick.remote() for sh in self.sched])
                budget_parts = ray.get(
                    [self.sched[i].budgets.remote(hs) for i, hs in by_shard.items()]
                )
                # populate + checkpoint the robots caches for this epoch's hosts
                ray.get([self.sched[i].robots.remote(hs) for i, hs in by_shard.items()])
                budgets: dict[str, int] = {}
                for part in budget_parts:
                    budgets.update(part)
                pending_n = dict(zip(pending["host"], pending["n"]))
                admitted_n = {
                    h: min(int(pending_n[h]), budgets.get(h, 0)) for h in hosts
                }
                if cfg.epoch_capacity is not None:
                    # the priority heap: serve hosts in (tier, deadline, key)
                    # order until the global epoch fetch budget is spent
                    order = prio[prio["host"].isin(set(hosts))].sort_values(
                        ["utility_tier", "refresh_deadline", "crawl_key"],
                        kind="mergesort",
                    )["host"].tolist()
                    remaining = cfg.epoch_capacity
                    capped = {}
                    for h in order:
                        take = min(admitted_n.get(h, 0), remaining)
                        capped[h] = take
                        remaining -= take
                    admitted_n = capped
                    budgets = admitted_n  # effective per-host budget this epoch
                consume_by_shard: dict[int, dict[str, int]] = {}
                for h, n in admitted_n.items():
                    if n:
                        consume_by_shard.setdefault(
                            scheduler_shard_of(h, len(self.sched)), {}
                        )[h] = n
                ray.get(
                    [self.sched[i].consume.remote(d) for i, d in consume_by_shard.items()]
                )

                # 2. admission (per-host top-budget by priority). Hosts whose
                # pending fits their budget are admitted wholesale with a
                # plain map (no shuffle); only over-budget hosts — the
                # skewed/hot ones — pay the groupby(host) rank.
                over = {h for h in hosts if pending_n[h] > budgets.get(h, 0)}
                gated_path = os.path.join(self._epoch_dir(e), "gated")
                contender_path = os.path.join(self._epoch_dir(e), "gated_contender")
                if not over:
                    # every pending row is admitted and nothing is deferred,
                    # so there is no gated bookkeeping to persist: stream the
                    # robots-filtered frontier straight into the fetch chain
                    # (same shape as the fast path) — the gated parquet
                    # round trip here was a full extra write+read per epoch
                    admitted_source = frontier.map_batches(
                        _robots_filter, batch_format="pyarrow"
                    )
                else:
                    budgets_ref = ray.put(budgets)
                    over_ref = ray.put(over)

                    def _tag(t, _s=_seed, _o=over_ref, _b=budgets_ref):
                        """ONE tagged pass over the frontier: robots filter +
                        admission marks in a single stream. (The previous
                        3-way under/contender/pruned union re-executed the
                        frontier read and robots filter once per branch —
                        the whole gate cost ~3 full frontier passes.)
                        - under-budget hosts: admitted outright, no shuffle;
                        - over-budget (hot) hosts: per-block partial prune
                          (skew guard) — a row locally ranked >= budget(host)
                          already has budget better rows in its OWN block, so
                          it can never be admitted globally: admitted=False,
                          skips the shuffle. Local winners are contenders;
                          only they (<= blocks x budget per hot host) reach
                          the exact per-host admission shuffle below."""
                        t = _robots_filter(t, _s)
                        ov = ray.get(_o)
                        sel = t.column("host").to_pandas().isin(ov).to_numpy()
                        contender = np.zeros(t.num_rows, dtype=bool)
                        if sel.any():
                            d = t.select(
                                ["host", "utility_tier",
                                 "refresh_deadline", "crawl_key"]
                            ).to_pandas()[sel]
                            contender[d.index[
                                rank_within_budget(d, ray.get(_b))
                            ]] = True
                        return t.append_column(
                            "admitted", pa.array(~sel)
                        ).append_column("contender", pa.array(contender))

                    _tg1 = _time.perf_counter()
                    frontier.map_batches(_tag, batch_format="pyarrow").write_parquet(
                        gated_path
                    )
                    if _dbg:
                        print(
                            f"[epoch {e}]   gate.tag_write="
                            f"{_time.perf_counter()-_tg1:.2f}s",
                            file=sys.stderr,
                        )
                    _tg2 = _time.perf_counter()
                    # a contender exists iff some over host has budget > 0
                    # (its first-ranked row in some block wins locally), so
                    # the driver can skip the whole shuffle stage without
                    # reading anything when every hot host is budget-0
                    over_budget_sum = sum(budgets.get(h, 0) for h in over)
                    if over_budget_sum > 0:
                        # a-priori bound on contender rows: a host cannot
                        # contribute more contenders than its pending count.
                        # (blocks x budget is NOT a sound bound — Ray's
                        # dynamic block splitting makes _tag run once per
                        # ~target_max_block_size block, not once per read
                        # task, so the block count is unknowable up front)
                        contender_bound = sum(pending_n[h] for h in over)
                        if contender_bound > cfg.frontier_driver_threshold:
                            # the pending bound is loose (a 10^7-pending
                            # hot host prunes to ~blocks x budget actual
                            # contenders): replace it with the EXACT count
                            # via one distributed single-column scan of
                            # the gated file, so the cheap driver admit
                            # stays reachable at scale without ever
                            # breaking its memory contract
                            contender_bound = int(
                                rd.read_parquet(
                                    gated_path, columns=["contender"]
                                )
                                .map_batches(
                                    lambda t: pa.table(
                                        {
                                            "n": [
                                                int(
                                                    pc.sum(
                                                        t.column("contender")
                                                    ).as_py()
                                                    or 0
                                                )
                                            ]
                                        }
                                    ),
                                    batch_format="pyarrow",
                                )
                                .to_pandas()["n"]
                                .sum()
                            )
                        if contender_bound <= cfg.frontier_driver_threshold:
                            # driver admit (no shuffle): pull only the
                            # contender rows (pushdown scan, sized by the
                            # bound, NOT the frontier) and run the same
                            # vectorized rank-vs-budget over all hot hosts
                            cont = (
                                rd.read_parquet(
                                    gated_path, filter=pc.field("contender")
                                )
                                .drop_columns(["contender", "admitted"])
                                .to_pandas()
                            )
                            cont["admitted"] = rank_within_budget(cont, budgets)
                            ct = pa.Table.from_pandas(
                                cont.reset_index(drop=True), preserve_index=False
                            )
                            gated_schema = pa.schema(
                                list(FRONTIER) + [pa.field("admitted", pa.bool_())]
                            )
                            os.makedirs(contender_path, exist_ok=True)
                            pq.write_table(
                                ct.select(gated_schema.names).cast(gated_schema),
                                os.path.join(contender_path, "driver-0.parquet"),
                            )
                        else:
                            # distributed admit: ONE hash-shuffle on host
                            # co-locates each host's contenders, then the
                            # same vectorized rank-vs-budget runs once per
                            # BLOCK (co-location makes the per-host
                            # cumcount global). The groupby(host).map_groups
                            # first cut paid the sort-based groupby
                            # machinery and was 5-10x slower at 2M pending.
                            def _admit_block(df, _ref=budgets_ref):
                                df = df.copy()
                                df["admitted"] = rank_within_budget(
                                    df, ray.get(_ref)
                                )
                                return df

                            (
                                hash_partitioned_map_batches(
                                    # filter pushed into the arrow fragment
                                    # scan: non-contender rows (the vast
                                    # majority) never become blocks at all
                                    rd.read_parquet(
                                        gated_path,
                                        filter=pc.field("contender"),
                                    ).drop_columns(["contender", "admitted"]),
                                    ["host"],
                                    _admit_block,
                                )
                                .map_batches(
                                    # strip the b'pandas' footer the pandas
                                    # round trip adds (unhashable schema
                                    # kills unify_schemas' early exit
                                    # downstream)
                                    lambda t: t.replace_schema_metadata(None),
                                    batch_format="pyarrow",
                                )
                                .write_parquet(contender_path)
                            )
                    if _dbg:
                        print(
                            f"[epoch {e}]   gate.contender="
                            f"{_time.perf_counter()-_tg2:.2f}s",
                            file=sys.stderr,
                        )
                    admitted_source = rd.read_parquet(
                        gated_path,
                        override_num_blocks=read_blocks,
                        filter=pc.field("admitted"),
                    ).drop_columns(["admitted", "contender"])
                    if self._parquet_num_rows(contender_path):
                        admitted_source = admitted_source.union(
                            rd.read_parquet(
                                contender_path, filter=pc.field("admitted")
                            ).drop_columns(["admitted"])
                        )
                _t2 = _time.perf_counter()

            # 3. admitted -> seen-filter -> fetch+parse -> docs(e).
            # Fan-out comes from the override_num_blocks read split above —
            # no repartition barrier anywhere in the chain. No hash stamp
            # here: EVERY frontier row already carries its real
            # canonical_hash by induction (seeds stamped at the seed
            # boundary in _initial_frontier, children stamped at discovery,
            # deferred rows pass through the gated file unchanged), so a
            # re-stamp would be a no-op Python-adjacent pass over the
            # widest stream of the epoch.
            admitted = (
                admitted_source
                # seen filter runs as stateless tasks (construction is just
                # actor handles — no per-task cost), so it never reserves
                # CPUs the way an actor pool would and cannot starve the
                # read/write stages on small clusters
                .map_batches(
                    lambda t, _a=self.seen: SeenFilterStage(_a)(t),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
                .map_batches(
                    # The synthetic web has no per-session state, so stateless
                    # tasks avoid re-spawning an actor pool every epoch; a
                    # real fetcher (webdriver/session reuse, ST1) sets
                    # stateless_fetch=False and pays the pool once per epoch.
                    **(
                        # counters stay OUT of the fetch tasks: a replayed
                        # block would double-count. The driver derives all
                        # fetch counters from the finalized docs parquet in
                        # _commit_epoch (exactly once per epoch).
                        dict(
                            fn=lambda t, _kw=dict(
                                seed=cfg.seed, max_rows=cfg.max_rows,
                                failure_rate=cfg.failure_rate,
                                scrape_ts=cfg.scrape_ts,
                            ): FetchParseStage(**_kw)(t)
                        )
                        if cfg.stateless_fetch
                        else dict(
                            fn=FetchParseStage,
                            fn_constructor_kwargs={
                                "seed": cfg.seed,
                                "max_rows": cfg.max_rows,
                                "failure_rate": cfg.failure_rate,
                                "scrape_ts": cfg.scrape_ts,
                            },
                            concurrency=fetch_conc,
                        )
                    ),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
                .map_batches(
                    lambda t, _e=e: t.append_column(
                        "epoch", pa.array(np.full(t.num_rows, _e, dtype=np.int32))
                    ),
                    batch_format="pyarrow",
                )
            )
            admitted.write_parquet(self._docs_path(e))
            # Commit seen marks + fetch counters from the FINALIZED docs.
            # SeenFilterStage is read-only inside retryable tasks; the mark
            # commit is idempotent (add-if-absent), so task replays and
            # resume re-runs of this pass are no-ops, and counters are added
            # exactly once on the driver. The commit OVERLAPS the frontier
            # build below (step 4 never reads the seen set or the fetch
            # counters); it is joined before the checkpoint — which dumps
            # the seen actors — and therefore before the next epoch's seen
            # filter can run.
            commit_thread = None
            _commit_err: dict[str, BaseException] = {}
            if os.path.exists(self._docs_path(e)):
                import threading as _threading2

                def _commit_bg(_e=e, _out=_commit_err):
                    try:
                        self._commit_epoch(_e)
                    except BaseException as exc:  # surfaced at join
                        _out["error"] = exc

                commit_thread = _threading2.Thread(target=_commit_bg, daemon=True)
                commit_thread.start()
            _t3 = _time.perf_counter()

            # 4. next frontier = deferred ∪ discovered children. The whole
            # step runs under try/finally: if the frontier build raises, the
            # background commit thread is still joined before the exception
            # propagates — the epoch never exits with a commit in flight
            # (the seen actors would otherwise be half-marked while the
            # thread races resume()'s restore).
            try:
              nxt = None
              if over:
                  # deferred = gated rows that are neither admitted nor
                  # contenders, plus contenders the exact admission rejected
                  nxt = rd.read_parquet(
                      gated_path,
                      filter=~pc.field("admitted") & ~pc.field("contender"),
                  ).drop_columns(["admitted", "contender"])
                  if self._parquet_num_rows(contender_path):
                      nxt = nxt.union(
                          rd.read_parquet(
                              contender_path, filter=~pc.field("admitted")
                          ).drop_columns(["admitted"])
                      )
              if os.path.exists(self._docs_path(e)):
                  # an epoch that admitted nothing writes no docs dir at all
                  children = rd.read_parquet(
                      self._docs_path(e),
                      columns=[
                          "doc_id", "emc", "state", "crawl_key",
                          "utility_tier", "refresh_deadline", "child_urls",
                      ],
                  ).map_batches(
                      partial(children_to_frontier, depth=1), batch_format="pyarrow"
                  )
                  children = children.map_batches(
                      partial(add_hash_columns, salt=cfg.hash_salt),
                      batch_format="pyarrow",
                  )
                  # deferred rows need no re-hash: they entered this epoch's
                  # frontier WITH a real canonical_hash (seed-boundary stamp /
                  # child-discovery stamp) and the gated round trip preserves
                  # the column — measured 24s -> 2s on the 500k-deferred
                  # hot-host rehearsal
                  if not cfg.dedupe_frontier:
                      nxt = children if nxt is None else nxt.union(children)
                  else:
                      # discovery can introduce the same URL from two parents
                      # (or collide with a deferred row); keep the row the
                      # sequential oracle would serve first. Inductively the
                      # frontier stays URL-unique, which is what lets the seen
                      # filter be read-only within an epoch.
                      # deferred <= pending; children <= fan-out x epoch docs
                      child_bound = MAX_CHILDREN_PER_DOC * self._parquet_num_rows(
                          self._docs_path(e)
                      )
                      bound = total_pending + child_bound
                      _td0 = _time.perf_counter()
                      if (
                          nxt is not None
                          and bound > cfg.frontier_driver_threshold
                          and child_bound <= cfg.frontier_driver_threshold
                      ):
                          # small-discovery regime: resolve collisions against
                          # a driver-bounded children set; the deferred mass
                          # streams to the write with NO all-to-all shuffle
                          defer_keys = rd.read_parquet(
                              gated_path,
                              columns=["canonical_hash", *self._PRIORITY],
                              filter=~pc.field("admitted") & ~pc.field("contender"),
                          )
                          if self._parquet_num_rows(contender_path):
                              defer_keys = defer_keys.union(
                                  rd.read_parquet(
                                      contender_path,
                                      columns=["canonical_hash", *self._PRIORITY],
                                      filter=~pc.field("admitted"),
                                  )
                              )
                          nxt = self._merge_children_broadcast(
                              nxt, defer_keys, children
                          )
                      elif nxt is None:
                          # children-only epoch: the bound is the child bound
                          nxt = self._dedupe_frontier(children, e, child_bound)
                      else:
                          nxt = self._dedupe_frontier(
                              nxt.union(children), e, bound
                          )
                      if _dbg:
                          print(
                              f"[epoch {e}]   dedupe={_time.perf_counter()-_td0:.2f}s",
                              file=sys.stderr,
                          )
              if nxt is not None:
                  _tw0 = _time.perf_counter()
                  nxt.write_parquet(self._frontier_next_path(e))
                  if _dbg:
                      print(
                          f"[epoch {e}]   frontier_write={_time.perf_counter()-_tw0:.2f}s",
                          file=sys.stderr,
                      )
            finally:
                # best-effort join on the error path (commit/robots errors
                # are surfaced below on the normal path; here a step-4
                # exception is already propagating and takes precedence)
                if commit_thread is not None:
                    commit_thread.join()
                if robots_thread is not None:
                    robots_thread.join()
            _t4 = _time.perf_counter()

            # 5. finalize epoch. Join the commit BEFORE the checkpoint: the
            # checkpoint dumps the seen actors, so every mark of this epoch
            # must have landed for resume to restore a complete seen set.
            if commit_thread is not None:
                if "error" in _commit_err:
                    raise _commit_err["error"]
            if robots_thread is not None:
                if "error" in _robots_cnt:
                    raise _robots_cnt["error"]
                if _robots_cnt.get("skipped"):
                    ray.get(
                        self.counters.add_many.remote(
                            {"robots_skipped": _robots_cnt["skipped"]}
                        )
                    )
            self._checkpoint(e, {"budgets": {k: int(v) for k, v in admitted_n.items()}})
            if _dbg:
                print(
                    f"[epoch {e}] gate={_t2-_t0:.1f}s "
                    f"fetch+parse+write={_t3-_t2:.1f}s frontier={_t4-_t3:.1f}s "
                    f"ckpt={_time.perf_counter()-_t4:.1f}s fast={fast_path}",
                    file=sys.stderr,
                )
            if epoch_callback is not None:
                epoch_callback(e)
            e += 1

        seen_sizes = ray.get([s.size.remote() for s in self.seen])
        return {
            "epochs": e,
            "counters": ray.get(self.counters.snapshot.remote()),
            "seen": int(sum(seen_sizes)),
            "docs_paths": [self._docs_path(i) for i in range(e) if os.path.exists(self._docs_path(i))],
        }

    def docs_dataset(self) -> "rd.Dataset":
        import glob

        files: list[str] = []
        for i in range(self.cfg.max_epochs):
            p = self._docs_path(i)
            if os.path.exists(p):
                files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        if not files:
            from ..schemas import DOCS

            return rd.from_arrow(DOCS.empty_table())
        return rd.read_parquet(files)

    def seen_hashes(self) -> set[int]:
        """Exact URL-seen set (only meaningful with exact_seen=True)."""
        dumps = ray.get([s.dump.remote() for s in self.seen])
        out: set[int] = set()
        for d in dumps:
            if d["exact_set"] is not None:
                out.update(d["exact_set"].tolist())
        return out


def run_crawl(cfg: CrawlConfig, resume: bool = False) -> tuple[CrawlJob, dict[str, Any]]:
    job = CrawlJob(cfg)
    stats = job.run(resume=resume)
    return job, stats
