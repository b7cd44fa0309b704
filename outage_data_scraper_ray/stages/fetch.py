"""Crawl stages: hashing, seen-filter, politeness admission, fetch+parse.

All stages are ``map_batches`` bodies over Arrow batches of frontier rows.
Stateful ones (SeenFilterStage, FetchParseStage) are callable classes →
actor pools; setup happens once per actor in ``__init__``.

The reference equivalent of fetch+parse is the per-EMC
``Scraper(state, layout, url, emc).parse()`` call in the sequential Lambda
loop (app/main.py:21-30); here one actor processes a whole batch of URLs
and emits one interleaved-span doc row per URL.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import KERNELS
from ..kernels.common import SCRAPE_TS_FORMAT
from ..schemas import SPAN_STRUCT
from ..state.cuckoo import shard_of
from ..synth import SyntheticWeb, canonical_urls

# virtual scrape timestamp injected for determinism (reference stamps
# wall-clock at parse time, util.py:92-93)
VIRTUAL_SCRAPE_TS = "10-05-2023 08:00:00"


_HASH_CHUNK = 1 << 17


def add_hash_columns(batch: pa.Table, salt: str = "") -> pa.Table:
    """canonical_hash = 64-bit siphash of the canonicalized URL (+ optional
    poll-round salt so each refresh round has its own seen-space).
    Vectorized end to end: regex-extract canonicalization + pandas' C hash
    (deterministic across processes) — no Python call per URL. Chunked so
    the transient string Series stay bounded even on a driver-resident
    million-row seeds table (map_batches callers pass far smaller batches
    and take the single-chunk path)."""
    n = batch.num_rows
    urls = batch.column("url")
    hashes = np.empty(n, dtype=np.uint64)
    for lo in range(0, max(n, 1), _HASH_CHUNK):
        chunk = urls.slice(lo, _HASH_CHUNK).to_pandas()
        canon = canonical_urls(chunk)
        if salt:
            canon = canon + salt
        hashes[lo : lo + len(canon)] = pd.util.hash_array(
            canon.to_numpy(dtype=object), categorize=False
        )
    out = batch
    if "canonical_hash" in batch.column_names:
        out = out.drop_columns(["canonical_hash"])
    return out.append_column("canonical_hash", pa.array(hashes, type=pa.uint64()))


class SeenFilterStage:
    """Filters frontier rows whose canonical hash is already in the sharded
    URL-seen set (the reference's visited-list semantics,
    il_scraper.py:200-212, scaled out).

    READ-ONLY against the shards: marks are committed by the crawl driver
    from each epoch's finalized docs parquet, so a retried/replayed Ray Data
    task cannot poison the seen set (its first attempt's marks would
    otherwise filter the replay's whole batch out). Intra-epoch duplicate
    URLs cannot occur by construction — children are derived from their
    parent URL (parent-unique paths) and deferred rows are single frontier
    rows — so read-only filtering is exact within an epoch too."""

    def __init__(self, seen_actors: list[Any]):
        self.shards = seen_actors
        self.n = len(seen_actors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if batch.num_rows == 0:
            return batch
        hashes = batch.column("canonical_hash").to_numpy()
        route = shard_of(hashes, self.n)
        seen = np.zeros(len(hashes), dtype=bool)
        refs, idxs = [], []
        for s in range(self.n):
            idx = np.flatnonzero(route == s)
            if idx.size:
                refs.append(self.shards[s].contains.remote(hashes[idx]))
                idxs.append(idx)
        for idx, mask in zip(idxs, ray.get(refs)):
            seen[idx] = mask
        return batch.filter(pa.array(~seen))


def rank_within_budget(df: pd.DataFrame, budgets: dict[str, int]) -> np.ndarray:
    """Boolean mask (aligned to df's row order): rows whose (utility_tier,
    refresh_deadline, crawl_key) rank WITHIN their host is < budget(host).

    The single definition of the admission priority rule — used by the
    crawl gate's per-block contender prune AND its driver contender admit
    (admit_group applies the same sort per host group), so the sites cannot
    drift from the sequential oracle's ordering."""
    # positional alignment (reset_index + scatter by the sort permutation):
    # index-label reindexing would raise or misalign on a caller frame with
    # duplicate index labels — this helper is the engine-wide single
    # definition of the admission rule, so it must not depend on the
    # caller's index hygiene
    g = df.reset_index(drop=True)
    order = g.sort_values(
        ["host", "utility_tier", "refresh_deadline", "crawl_key"],
        kind="mergesort",
    )
    rank = order.groupby("host", sort=False).cumcount()
    # Series.map(dict) is a C-speed hash join; hosts absent from the budget
    # map default to 0 admitted
    lim = order["host"].map(budgets).fillna(0).astype("int64")
    win = np.zeros(len(g), dtype=bool)
    win[order.index.to_numpy()] = (rank < lim).to_numpy()
    return win


def admit_group(group: pd.DataFrame, *, budgets: dict[str, int]) -> pd.DataFrame:
    """Politeness admission for one host group (the reference's per-scraper
    serving order, app/main.py:21): admit the first budget(host) rows by
    (utility_tier, refresh_deadline, crawl_key). A thin wrapper over
    rank_within_budget — the engine-wide single definition of that rule —
    kept as the per-group API for callers partitioning by host."""
    g = group.reset_index(drop=True)
    g["admitted"] = rank_within_budget(g, budgets)
    return g


class FetchParseStage:
    """Actor-pool fetch + parse: one SyntheticWeb 'session' per actor
    (the reference's expensive per-scraper webdriver init,
    ga_scraper.py:146-208, amortized across batches), kernels dispatched by
    layout family. Emits one doc row per URL: interleaved spans + discovered
    child URLs + fetch status."""

    def __init__(
        self,
        seed: int = 42,
        max_rows: int = 8,
        failure_rate: float = 0.02,
        counters: Any = None,
        scrape_ts: str = VIRTUAL_SCRAPE_TS,
    ):
        self.web = SyntheticWeb(seed=seed, max_rows=max_rows, failure_rate=failure_rate)
        self.kernels = KERNELS
        self.counters = counters
        self.ts = scrape_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        emcs = batch.column("emc").to_pylist()
        layouts = batch.column("layout").to_pylist()
        hashes = batch.column("canonical_hash").to_pylist()

        statuses = np.empty(len(urls), dtype=np.int32)
        reasons: list[str] = []
        all_spans: list[list[dict]] = []
        all_children: list[list[str]] = []
        n_spans = 0
        for i, (url, emc, layout) in enumerate(zip(urls, emcs, layouts)):
            try:
                bodies = self.web.fetch(url, layout)
                spans, children = self.kernels[layout](bodies, emc, self.ts, url)
                statuses[i] = 200
                reasons.append("")
                all_spans.append(spans)
                all_children.append(children)
                n_spans += len(spans)
            except Exception as e:  # failure-row semantics, app/main.py:32-41
                statuses[i] = 500
                reasons.append(str(e))
                all_spans.append([])
                all_children.append([])

        if self.counters is not None:
            ok = int((statuses == 200).sum())
            self.counters.add_many.remote(
                {"fetched": len(urls), "fetch_ok": ok,
                 "fetch_failed": len(urls) - ok, "spans": n_spans}
            )

        doc_ids = [f"d{h:016x}" for h in hashes]
        # columnar span construction: flat field arrays + offsets ->
        # ListArray.from_arrays is several times faster than letting Arrow
        # introspect a list-of-list-of-dicts
        flat_kind: list[str] = []
        flat_text: list[str] = []
        flat_media: list[str] = []
        flat_off: list[int] = []
        lengths = np.empty(len(all_spans) + 1, dtype=np.int32)
        lengths[0] = 0
        for i, spans in enumerate(all_spans):
            lengths[i + 1] = lengths[i] + len(spans)
            for sp in spans:
                flat_kind.append(sp["kind"])
                flat_text.append(sp["text"])
                flat_media.append(sp["media_ref"])
                flat_off.append(sp["offset"])
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(flat_kind, pa.string()),
                pa.array(flat_text, pa.string()),
                pa.array(flat_media, pa.string()),
                pa.array(flat_off, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        span_col = pa.ListArray.from_arrays(pa.array(lengths, pa.int32()), span_struct)

        cols: dict[str, Any] = {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            # carried through so the commit pass can route seen-marks off a
            # uint64 column instead of re-parsing the doc_id hex per row
            "canonical_hash": batch.column("canonical_hash"),
            "url": batch.column("url"),
            "emc": batch.column("emc"),
            "state": batch.column("state"),
            "layout": batch.column("layout"),
            "crawl_key": batch.column("crawl_key"),
            "utility_tier": batch.column("utility_tier"),
            "refresh_deadline": batch.column("refresh_deadline"),
            "status": pa.array(statuses, type=pa.int32()),
            "reason": pa.array(reasons, type=pa.string()),
            "spans": span_col,
            "n_spans": pa.array(np.diff(lengths), type=pa.int32()),
            "child_urls": pa.array(all_children, type=pa.list_(pa.string())),
        }
        return pa.table(cols)


def children_to_frontier(batch: pa.Table, *, depth: int) -> pa.Table:
    """Flatten discovered child URLs into new frontier rows (S9/S10 discovery
    feedback). Child priority inherits the parent EMC's tier/deadline;
    crawl_key = (1<<40) + parent_key*64 + ordinal keeps global order keys
    unique and deterministic.

    Fully vectorized (the explode_spans pattern, accumulate.py): one
    list_flatten + list_parent_indices + take — this sits on the discovery
    path of every epoch, so a per-row Python loop here would be
    O(children) driver-adjacent work per batch."""
    ch = batch.column("child_urls")
    if isinstance(ch, pa.ChunkedArray):
        ch = ch.combine_chunks()
    flat = pc.list_flatten(ch)
    parents = pc.list_parent_indices(ch)
    n = len(flat)
    # per-child ordinal within its parent list: arange - exclusive-cumsum of
    # the per-parent lengths (slice-offset-proof, unlike raw .offsets)
    # A null child_urls entry makes list_value_length yield null -> NaN ->
    # garbage int64 that silently corrupts ordinals/crawl_keys for every
    # subsequent child; treat null lists as empty (the old per-row loop's
    # behavior for falsy entries).
    lengths = (
        pc.fill_null(pc.list_value_length(ch), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if len(lengths) else np.empty(0, np.int64)
    pidx = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    ordinal = np.arange(n, dtype=np.int64) - starts[pidx]

    if n == 0:
        urls = pd.Series([], dtype=object)
        hosts = urls
    else:
        urls = flat.to_pandas()
        rest = urls.str.split("://", n=1).str[-1]
        hosts = rest.str.partition("/")[0].str.lower()

    def _take(col: str) -> pa.Array:
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.take(parents)

    pkey = _take("crawl_key").to_numpy(zero_copy_only=False).astype(np.int64)
    has_tier = "utility_tier" in batch.column_names
    has_deadline = "refresh_deadline" in batch.column_names
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "emc": _take("emc"),
            "state": _take("state"),
            "layout": pa.array(np.full(n, "kubra_report", dtype=object), pa.string()),
            "seed_index": pa.array(np.full(n, -1, dtype=np.int32)),
            "utility_tier": (
                _take("utility_tier") if has_tier
                else pa.array(np.zeros(n, dtype=np.int32))
            ),
            "refresh_deadline": (
                _take("refresh_deadline") if has_deadline
                else pa.array(np.zeros(n, dtype=np.int64), pa.timestamp("ms"))
            ),
            "depth": pa.array(np.full(n, depth, dtype=np.int32)),
            "parent_doc_id": _take("doc_id"),
            "crawl_key": pa.array((1 << 40) + pkey * 64 + ordinal, pa.int64()),
        }
    )
