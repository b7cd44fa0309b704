"""Crawl conformance: the distributed Ray Data crawl must match the
sequential oracle simulator (reference semantics, app/main.py:21) on:

- the final URL-seen set (north_rule exact-set equality),
- the set of URLs fetched per epoch (politeness-budget agreement),
- the deterministic crawl order (sort by epoch, tier, deadline, crawl_key),
- per-doc span sequences (kind, text, media_ref, order),
- failure rows (injected fetch failures recorded, not raised —
  app/main.py:32-41 semantics),

plus checkpoint/resume: a job killed mid-crawl and resumed produces an
identical final state.
"""

import shutil

import pandas as pd
import pytest

from outage_data_scraper_ray.pipelines.crawl import CrawlConfig, CrawlJob
from outage_data_scraper_ray.pipelines.oracle_sim import simulate_crawl
from outage_data_scraper_ray.synth import make_seed_registry

N_SEEDS = 48
POLITENESS = dict(politeness_rate=2.0, politeness_burst=3.0, politeness_dt=1.0)


def _cfg(workdir, **kw):
    base = dict(
        n_seeds=N_SEEDS,
        exact_seen=True,
        workdir=workdir,
        max_epochs=30,
        failure_rate=0.05,
        n_seen_shards=3,
        n_sched_shards=2,
        fetch_concurrency=2,
        **POLITENESS,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def crawl_and_oracle(ray_session):
    workdir = "/tmp/odsr_test_crawl"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir))
    stats = job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(
        make_seed_registry(N_SEEDS, 42).to_pandas(),
        failure_rate=0.05,
        **POLITENESS,
    )
    return job, stats, docs, sim


def test_seen_set_equality(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    assert job.seen_hashes() == sim.seen_hashes


def test_urls_per_epoch_equality(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want = {}
    seen = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want


def test_crawl_order(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    ordered = docs.sort_values(
        ["epoch", "utility_tier", "refresh_deadline", "crawl_key"]
    )["url"].tolist()
    assert ordered == [d.url for d in sim.docs]


def test_span_sequences(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    by_url = {d.url: d for d in sim.docs}
    assert set(docs["url"]) == set(by_url)
    for _, row in docs.iterrows():
        want = by_url[row["url"]]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        want_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want.spans]
        assert got_spans == want_spans, f"span mismatch at {row['url']}"
        assert row["status"] == want.status
        assert row["reason"] == want.reason


def test_failures_recorded_not_raised(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    assert (docs["status"] == 500).sum() == sum(1 for d in sim.docs if d.status == 500)
    assert stats["counters"]["fetch_failed"] == int((docs["status"] == 500).sum())
    assert (docs.loc[docs["status"] == 500, "reason"] != "").all()


def test_discovery_produced_children(crawl_and_oracle):
    job, stats, docs, sim = crawl_and_oracle
    assert (docs["layout"] == "kubra_report").any()
    assert docs["child_urls"].map(len).sum() > 0


def test_resume_matches_uninterrupted(ray_session):
    """Kill after a few epochs, resume from checkpoint, compare final state."""
    full_dir, part_dir = "/tmp/odsr_crawl_full", "/tmp/odsr_crawl_part"
    for d in (full_dir, part_dir):
        shutil.rmtree(d, ignore_errors=True)

    full_job = CrawlJob(_cfg(full_dir))
    full_job.run()
    full_docs = full_job.docs_dataset().to_pandas()

    # "killed" run: stop after 2 epochs
    part_job = CrawlJob(_cfg(part_dir, max_epochs=2))
    part_job.run()
    assert part_job.last_complete_epoch() == 1

    # resume in a fresh job object (fresh actors — state must come from disk)
    resumed = CrawlJob(_cfg(part_dir))
    resumed.run(resume=True)
    resumed_docs = resumed.docs_dataset().to_pandas()

    assert resumed.seen_hashes() == full_job.seen_hashes()
    key = ["epoch", "url"]
    got = resumed_docs.sort_values(key).reset_index(drop=True)
    want = full_docs.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["epoch", "url", "status", "crawl_key"]],
        want[["epoch", "url", "status", "crawl_key"]],
    )
    got_spans = got["spans"].map(
        lambda ss: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ss]
    )
    want_spans = want["spans"].map(
        lambda ss: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ss]
    )
    assert got_spans.tolist() == want_spans.tolist()


def test_children_to_frontier_null_list_rows():
    """A kernel returning a NULL child_urls list must behave like an empty
    list (the old per-row loop skipped falsy entries): before the fix,
    list_value_length's null became NaN -> garbage int64 start offsets that
    silently corrupted ordinals/crawl_keys for every LATER child (ADVICE
    r4, low)."""
    import pyarrow as pa

    from outage_data_scraper_ray.stages.fetch import children_to_frontier

    batch = pa.table(
        {
            "child_urls": pa.array(
                [["http://a.example/x", "http://a.example/y"], None,
                 ["http://b.example/z"]],
                pa.list_(pa.string()),
            ),
            "crawl_key": pa.array([10, 11, 12], pa.int64()),
            "emc": pa.array(["e0", "e1", "e2"]),
            "state": pa.array(["ga", "tx", "ca"]),
            "doc_id": pa.array(["d0", "d1", "d2"]),
            "utility_tier": pa.array([1, 2, 3], pa.int32()),
            "refresh_deadline": pa.array([100, 200, 300], pa.timestamp("ms")),
        }
    )
    out = children_to_frontier(batch, depth=1)
    assert out.num_rows == 3
    df = out.to_pandas()
    assert df["url"].tolist() == [
        "http://a.example/x", "http://a.example/y", "http://b.example/z"
    ]
    assert df["parent_doc_id"].tolist() == ["d0", "d0", "d2"]
    # ordinals restart per parent: keys = (1<<40) + parent_key*64 + ordinal
    assert df["crawl_key"].tolist() == [
        (1 << 40) + 10 * 64 + 0, (1 << 40) + 10 * 64 + 1, (1 << 40) + 12 * 64 + 0
    ]


def test_epoch_capacity_priority_heap(ray_session):
    """With a global per-epoch fetch cap, hosts are served in
    (utility_tier, refresh_deadline, crawl_key) order — distributed run and
    sequential oracle must agree on which URLs land in which epoch."""
    workdir = "/tmp/odsr_crawl_cap"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, politeness_rate=8.0, politeness_burst=8.0,
                        epoch_capacity=10))
    job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(
        make_seed_registry(N_SEEDS, 42).to_pandas(),
        failure_rate=0.05, politeness_rate=8.0, politeness_burst=8.0,
        politeness_dt=1.0, epoch_capacity=10,
    )
    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want = {}
    seen = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want
    # no epoch exceeds the cap
    assert docs.groupby("epoch").size().max() <= 10


def test_slow_refill_no_overadmission(ray_session):
    """Regression: with rate*dt < burst, tokens carry over between epochs, so
    the fast path (which never consumes) must NOT trigger even when
    burst >= pending. Engine must match the consuming sequential oracle."""
    workdir = "/tmp/odsr_crawl_slowrefill"
    shutil.rmtree(workdir, ignore_errors=True)
    pol = dict(politeness_rate=0.5, politeness_burst=4.0, politeness_dt=1.0)
    job = CrawlJob(_cfg(workdir, n_seeds=8, failure_rate=0.0, **pol))
    job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(
        make_seed_registry(8, 42).to_pandas(), failure_rate=0.0, **pol
    )
    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want = {}
    seen = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want
    assert job.seen_hashes() == sim.seen_hashes


def test_job_cli_runs_and_resumes(ray_session, capsys):
    """`python -m outage_data_scraper_ray.job` contract: one JSON line of
    counters; re-submitting with --resume continues from the checkpoint
    without re-fetching (north_star `ray job submit` loop)."""
    import json as _json

    from outage_data_scraper_ray.job import main

    workdir = "/tmp/odsr_job_cli"
    shutil.rmtree(workdir, ignore_errors=True)
    assert main(["--seeds", "24", "--workdir", workdir, "--max-epochs", "2",
                 "--failure-rate", "0.0"]) == 0
    first = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["counters"]["fetched"] > 0
    assert main(["--seeds", "24", "--workdir", workdir, "--max-epochs", "8",
                 "--failure-rate", "0.0", "--resume"]) == 0
    second = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # resumed run completes the crawl; totals are cumulative from checkpoint
    assert second["counters"]["fetched"] >= first["counters"]["fetched"]
    assert second["epochs"] >= 2


def test_distributed_commit_path_matches_oracle(ray_session):
    """Force the distributed mark/counter commit (commit_driver_threshold=0)
    and require the same seen set / per-epoch URLs as the sequential
    oracle — the large-epoch branch must be semantically identical."""
    workdir = "/tmp/odsr_crawl_distcommit"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, n_seeds=32, commit_driver_threshold=0))
    stats = job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(
        make_seed_registry(32, 42).to_pandas(), failure_rate=0.05, **POLITENESS
    )
    assert job.seen_hashes() == sim.seen_hashes
    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want = {}
    seen = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want
    assert stats["counters"]["fetched"] == len(docs)
    assert stats["counters"]["spans"] == docs["n_spans"].sum()


def test_seen_filter_never_refetches_under_cuckoo_overload(ray_session):
    """Tiny seen capacity forces the cuckoo kick loop to overflow into the
    stash; membership must never be lost — no URL is fetched twice across
    epochs (the pre-stash bug re-admitted crawled URLs near capacity)."""
    import numpy as np
    import ray as _ray

    workdir = "/tmp/odsr_crawl_overload"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(
        workdir, n_seeds=400, failure_rate=0.0, n_seen_shards=1,
        seen_capacity=64, politeness_rate=64.0, politeness_burst=64.0,
        max_epochs=20,
    ))
    job.run()
    docs = job.docs_dataset().to_pandas()
    assert docs["url"].is_unique, "a crawled URL was re-admitted"
    dumps = _ray.get([s.dump.remote() for s in job.seen])
    assert sum(d["kick_failures"] for d in dumps) > 0, (
        "overload did not exercise the stash; lower seen_capacity"
    )


def test_dedupe_frontier_keeps_min_priority_row(ray_session):
    """Unit: duplicate canonical hashes collapse to the min-(tier, deadline,
    crawl_key) row on BOTH the driver and the distributed path."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from outage_data_scraper_ray.schemas import FRONTIER

    workdir = "/tmp/odsr_dedupe_unit"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, n_seeds=4))

    def row(url, h, tier, key):
        return {
            "url": url, "host": "h.example", "emc": "E", "state": "xx",
            "layout": "wov", "seed_index": 0, "utility_tier": tier,
            "refresh_deadline": 1_700_000_000_000, "depth": 1,
            "parent_doc_id": "", "crawl_key": key, "canonical_hash": h,
        }

    rows = [
        row("https://h.example/a", 11, 2, 30),
        row("https://h.example/a", 11, 0, 10),   # winner: lowest tier
        row("https://h.example/a", 11, 0, 20),
        row("https://h.example/b", 22, 1, 40),   # unique
    ]
    t = pa.Table.from_pylist(rows).cast(FRONTIER)
    os.makedirs(os.path.join(workdir, "ep-00000"), exist_ok=True)
    for bound in (10, 10**7):  # driver path, distributed path
        out = job._dedupe_frontier(rd.from_arrow(t), 0, bound).to_pandas()
        out = out.sort_values("canonical_hash").reset_index(drop=True)
        assert len(out) == 2
        a = out[out["canonical_hash"] == 11].iloc[0]
        assert a["utility_tier"] == 0 and a["crawl_key"] == 10


def test_seed_registry_urls_distinct_at_any_scale():
    """np.char.zfill truncates above its width — the slug width must follow
    the index digit count or seeds >=100k collide (idx 100000 -> '10000')."""
    for n in (285, 99_999, 120_000):
        u = make_seed_registry(n, 42).column("url")
        assert u.to_pandas().nunique() == n, f"collided URLs at n_seeds={n}"
    # width stays 5 (byte-stable URLs) for every historical <=100k registry
    assert (
        make_seed_registry(285, 42).column("url")[0].as_py()
        == "https://outage.emc00000.ga.synthgrid.example"
    )


def test_duplicate_seed_urls_match_oracle(ray_session):
    """Frontier-uniqueness at the seed boundary: a seeds_table carrying the
    same URL under several priorities collapses to the min-(tier, deadline,
    crawl_key) row in BOTH the crawl and the sequential oracle — each URL is
    fetched exactly once, with identical winner rows, order, and seen set."""
    import pyarrow as pa

    from outage_data_scraper_ray.schemas import SEEDS

    base = make_seed_registry(12, 42).to_pandas()
    dups = base.iloc[:4].copy()
    dups["seed_index"] = dups["seed_index"] + 12
    # two dups OUTRANK their originals (tier 0 < original), two lose (tier 2
    # >= any original; equal tiers fall through to deadline then crawl_key,
    # where the original's lower seed_index wins)
    dups.loc[dups.index[:2], "utility_tier"] = 0
    dups.loc[dups.index[2:], "utility_tier"] = 2
    seeds_df = pd.concat([base, dups], ignore_index=True)
    seeds_tbl = pa.Table.from_pandas(seeds_df, preserve_index=False).cast(SEEDS)

    workdir = "/tmp/odsr_dup_seeds"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, seeds_table=seeds_tbl, max_epochs=8))
    job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(seeds_df, failure_rate=0.05, **POLITENESS)

    assert docs["url"].is_unique, "a duplicated seed URL was fetched twice"
    assert job.seen_hashes() == sim.seen_hashes
    ordered = docs.sort_values(
        ["epoch", "utility_tier", "refresh_deadline", "crawl_key"]
    )[["url", "crawl_key"]]
    assert ordered["url"].tolist() == [d.url for d in sim.docs]
    # winner identity: the surviving row per duplicated URL is the same one
    # the oracle kept (crawl_key identifies the seed row)
    sim_keys = {d.url: d.crawl_key for d in sim.docs}
    for _, r in docs[docs["url"].isin(set(dups["url"]))].iterrows():
        assert r["crawl_key"] == sim_keys[r["url"]], r["url"]


@pytest.mark.parametrize("frontier_driver_threshold", [500_000, 0])
def test_hot_host_skew_matches_oracle(ray_session, frontier_driver_threshold):
    """Skew guard: one hot host holds 40 pending URLs against a per-epoch
    budget of 5 (pending >> budget — the shape where the per-block partial
    prune decides admission for almost every row and only contenders reach
    the per-host shuffle). The engine must still match the sequential
    oracle's per-epoch admissions, order, and final seen set exactly.
    threshold=0 forces the distributed contender admission AND the
    hash-shuffled frontier dedupe (the branches that run at 10^10 scale);
    the default forces the driver-bounded paths."""
    import numpy as np
    import pyarrow as pa

    from outage_data_scraper_ray.schemas import SEEDS

    hot = pd.DataFrame(
        {
            "url": [f"https://hot.synthgrid.example/p{i:03d}" for i in range(40)],
            "host": "hot.synthgrid.example",
            "emc": "HOT EMC",
            "state": "ga",
            "layout": "wov",
            "seed_index": np.arange(40, dtype=np.int32),
            "utility_tier": (np.arange(40) % 3).astype(np.int32),
            "refresh_deadline": pd.to_datetime(1_700_000_000_000, unit="ms")
            + pd.to_timedelta((np.arange(40) * 7) % 11, unit="s"),
        }
    )
    cold = make_seed_registry(6, 7).to_pandas()
    cold["seed_index"] = (cold["seed_index"] + 40).astype("int32")
    seeds_df = pd.concat([hot, cold], ignore_index=True)
    seeds_tbl = pa.Table.from_pandas(seeds_df, preserve_index=False).cast(SEEDS)

    pol = dict(politeness_rate=5.0, politeness_burst=5.0, politeness_dt=1.0)
    workdir = "/tmp/odsr_hot_host"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, seeds_table=seeds_tbl, max_epochs=20,
                        failure_rate=0.0,
                        frontier_driver_threshold=frontier_driver_threshold,
                        **pol))
    job.run()
    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(seeds_df, failure_rate=0.0, **pol)

    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want: dict[int, set] = {}
    seen: set = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want
    assert job.seen_hashes() == sim.seen_hashes
    # hot-host admissions are budget-bounded every epoch
    hot_per_epoch = docs[
        docs["url"].str.startswith("https://hot.synthgrid.example/")
    ].groupby("epoch").size()
    assert (hot_per_epoch <= 5).all()
    assert hot_per_epoch.sum() == 40


def test_canonical_urls_matches_scalar():
    """The vectorized canonicalizer (synth.canonical_urls, used by
    add_hash_columns on the widest pass of every epoch) must agree with the
    scalar reference implementation on every URL shape the crawl can see."""
    from hypothesis import given, settings, strategies as st

    from outage_data_scraper_ray.synth import canonical_url, canonical_urls

    fixed = [
        "https://Hot.SynthGrid.example/path/A/",
        "http://a.example/p?q=1#frag",
        "no-scheme/path/",
        "HTTPS://X.Y/",
        "https://h.example",
        "",
        "://weird",
        "https://h.example/a://b/c#f#g",
        "ftp://MIXED.Case/Path/No/Slash",
        "https://h.example/line\nbreak",
        "pre\nfix://Host/p",
    ]
    got = canonical_urls(fixed).tolist()
    assert got == [canonical_url(u) for u in fixed]

    url_chars = st.text(
        alphabet="abcXYZ019/:#?.-_\n", min_size=0, max_size=40
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(url_chars, min_size=1, max_size=8))
    def inner(urls):
        assert canonical_urls(urls).tolist() == [canonical_url(u) for u in urls]

    inner()


def test_merge_children_broadcast_matches_shuffle_dedupe(ray_session):
    """The small-discovery merge (_merge_children_broadcast: driver-bounded
    children + pruned key scan, NO shuffle of the deferred mass) must
    produce exactly the rows the shuffle dedupe would: per canonical_hash
    keep the min-(tier, deadline, crawl_key) row, ties to the deferred
    side. Engineered collisions: child-beats-deferred, deferred-beats-child,
    exact tie, child-vs-child dup, plus non-colliding rows on both sides."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from outage_data_scraper_ray.pipelines.crawl import CrawlJob
    from outage_data_scraper_ray.schemas import FRONTIER

    def mk(rows):
        df = pd.DataFrame(rows)
        df["refresh_deadline"] = pd.to_datetime(df["refresh_deadline"], unit="ms")
        t = pa.Table.from_pandas(df, preserve_index=False)
        return t.select(FRONTIER.names).cast(FRONTIER)

    def row(url, h, tier, dl, key):
        return dict(
            url=url, host="h.example", emc="E", state="ga", layout="wov",
            seed_index=0, utility_tier=tier, refresh_deadline=dl,
            depth=0, parent_doc_id="", crawl_key=key,
            canonical_hash=np.uint64(h),
        )

    deferred_rows = [
        row("https://h.example/a", 1, 1, 1000, 10),   # loses to child (tier)
        row("https://h.example/b", 2, 1, 1000, 10),   # beats child (deadline)
        row("https://h.example/c", 3, 2, 2000, 30),   # exact tie -> deferred wins
        row("https://h.example/d", 4, 0, 500, 5),     # no collision
    ]
    children_rows = [
        row("https://h.example/a", 1, 0, 9000, 99),   # wins vs deferred h=1
        row("https://h.example/b", 2, 1, 2000, 1),    # loses vs deferred h=2
        row("https://h.example/c", 3, 2, 2000, 30),   # tie vs deferred h=3
        row("https://h.example/e", 5, 1, 100, 7),     # child-vs-child dup...
        row("https://h.example/e", 5, 0, 100, 8),     # ...this one wins
        row("https://h.example/f", 6, 3, 700, 2),     # no collision
    ]
    deferred_t, children_t = mk(deferred_rows), mk(children_rows)
    deferred = rd.from_arrow(deferred_t)
    defer_keys = rd.from_arrow(
        deferred_t.select(
            ["canonical_hash", "utility_tier", "refresh_deadline", "crawl_key"]
        )
    )
    children = rd.from_arrow(children_t)

    got = (
        CrawlJob._merge_children_broadcast(deferred, defer_keys, children)
        .to_pandas()
        .sort_values("canonical_hash")
        .reset_index(drop=True)
    )

    # reference: the shuffle path's rule on the deferred-first union
    want = (
        pd.concat([deferred_t.to_pandas(), children_t.to_pandas()],
                  ignore_index=True)
        .sort_values(
            ["canonical_hash", "utility_tier", "refresh_deadline", "crawl_key"],
            kind="mergesort",
        )
        .drop_duplicates(subset=["canonical_hash"], keep="first")
        .sort_values("canonical_hash")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])
    # winners are exactly: child h=1, deferred h=2, deferred h=3 (tie),
    # deferred h=4, child key=8 for h=5, child h=6
    assert got.loc[got.canonical_hash == 1, "crawl_key"].item() == 99
    assert got.loc[got.canonical_hash == 2, "crawl_key"].item() == 10
    assert got.loc[got.canonical_hash == 3, "crawl_key"].item() == 30
    assert got.loc[got.canonical_hash == 5, "crawl_key"].item() == 8


def test_broadcast_merge_branch_matches_oracle(ray_session, monkeypatch):
    """End-to-end conformance THROUGH the shuffle-free small-discovery
    frontier merge: threshold tuned so child_bound (6 x fetched) fits the
    driver bound while pending + child_bound exceeds it — the regime where
    _merge_children_broadcast (not the hash-shuffle dedupe) builds the next
    frontier. A wrapper asserts the branch actually ran; the run must still
    match the sequential oracle's admissions and seen set exactly."""
    import numpy as np
    import pyarrow as pa

    from outage_data_scraper_ray.schemas import SEEDS

    calls = {"n": 0}
    orig = CrawlJob._merge_children_broadcast.__func__

    def _wrapped(cls, deferred, defer_keys, children):
        calls["n"] += 1
        return orig(cls, deferred, defer_keys, children)

    monkeypatch.setattr(
        CrawlJob, "_merge_children_broadcast", classmethod(_wrapped)
    )

    hot = pd.DataFrame(
        {
            "url": [f"https://hot.synthgrid.example/p{i:03d}" for i in range(40)],
            "host": "hot.synthgrid.example",
            "emc": "HOT EMC",
            "state": "ga",
            "layout": "wov",
            "seed_index": np.arange(40, dtype=np.int32),
            "utility_tier": (np.arange(40) % 3).astype(np.int32),
            "refresh_deadline": pd.to_datetime(1_700_000_000_000, unit="ms")
            + pd.to_timedelta((np.arange(40) * 7) % 11, unit="s"),
        }
    )
    cold = make_seed_registry(6, 7).to_pandas()
    cold["seed_index"] = (cold["seed_index"] + 40).astype("int32")
    seeds_df = pd.concat([hot, cold], ignore_index=True)
    seeds_tbl = pa.Table.from_pandas(seeds_df, preserve_index=False).cast(SEEDS)

    pol = dict(politeness_rate=5.0, politeness_burst=5.0, politeness_dt=1.0)
    workdir = "/tmp/odsr_bcast_merge"
    shutil.rmtree(workdir, ignore_errors=True)
    job = CrawlJob(_cfg(workdir, seeds_table=seeds_tbl, max_epochs=20,
                        failure_rate=0.0, frontier_driver_threshold=80, **pol))
    job.run()
    assert calls["n"] >= 1, "broadcast merge branch never ran"

    docs = job.docs_dataset().to_pandas()
    sim = simulate_crawl(seeds_df, failure_rate=0.0, **pol)
    got = docs.groupby("epoch")["url"].apply(set).to_dict()
    want: dict[int, set] = {}
    seen: set = set()
    for e, urls in enumerate(sim.admitted_per_epoch):
        fresh = [u for u in urls if u not in seen]
        seen.update(fresh)
        if fresh:
            want[e] = set(fresh)
    assert got == want
    assert job.seen_hashes() == sim.seen_hashes


def test_resume_across_shard_counts(ray_session):
    """Reshard on resume (VERDICT r3 #7): a checkpoint written under one
    (seen, sched) shard layout restores into a job with a DIFFERENT layout
    — exact dumps re-route by hash — and the resumed crawl matches the
    uninterrupted run exactly."""
    full_dir, part_dir = "/tmp/odsr_crawl_full_rs", "/tmp/odsr_crawl_part_rs"
    for d in (full_dir, part_dir):
        shutil.rmtree(d, ignore_errors=True)

    full_job = CrawlJob(_cfg(full_dir))
    full_job.run()
    full_docs = full_job.docs_dataset().to_pandas()

    part_job = CrawlJob(_cfg(part_dir, max_epochs=2))  # 3 seen / 2 sched
    part_job.run()
    assert part_job.last_complete_epoch() == 1

    # resume with 5 seen shards / 3 scheduler shards
    resumed = CrawlJob(_cfg(part_dir, n_seen_shards=5, n_sched_shards=3))
    resumed.run(resume=True)
    resumed_docs = resumed.docs_dataset().to_pandas()

    assert resumed.seen_hashes() == full_job.seen_hashes()
    key = ["epoch", "url"]
    got = resumed_docs.sort_values(key).reset_index(drop=True)
    want = full_docs.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["epoch", "url", "status", "crawl_key"]],
        want[["epoch", "url", "status", "crawl_key"]],
    )


def test_resume_same_layout_many_shards(ray_session):
    """Resume with >=11 shards on the SAME layout (the positional-zip load
    path): checkpoint filenames carry unpadded indices, so a lexicographic
    glob sort puts seen_10.npz before seen_2.npz and every actor would
    load another shard's state — hash-routed lookups then miss and the
    resumed crawl refetches (ADVICE r4, high). Numeric-index sort must
    keep resume identical to the uninterrupted run."""
    full_dir, part_dir = "/tmp/odsr_crawl_full_11", "/tmp/odsr_crawl_part_11"
    for d in (full_dir, part_dir):
        shutil.rmtree(d, ignore_errors=True)
    shards = dict(n_seen_shards=12, n_sched_shards=12)

    full_job = CrawlJob(_cfg(full_dir, **shards))
    full_job.run()
    full_docs = full_job.docs_dataset().to_pandas()

    part_job = CrawlJob(_cfg(part_dir, max_epochs=2, **shards))
    part_job.run()
    assert part_job.last_complete_epoch() == 1

    resumed = CrawlJob(_cfg(part_dir, **shards))
    resumed.run(resume=True)
    resumed_docs = resumed.docs_dataset().to_pandas()

    assert resumed_docs["url"].is_unique  # misrouted state would refetch
    assert resumed.seen_hashes() == full_job.seen_hashes()
    key = ["epoch", "url"]
    got = resumed_docs.sort_values(key).reset_index(drop=True)
    want = full_docs.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["epoch", "url", "status", "crawl_key"]],
        want[["epoch", "url", "status", "crawl_key"]],
    )


def test_resume_reshard_filter_only_rebuilds_from_lineage(ray_session):
    """Filter-only (non-exact) checkpoints cannot be re-routed — a cuckoo
    table holds 16-bit fingerprints, not hashes — so a resharded resume
    rebuilds the seen set from the docs lineage's canonical_hash column
    (the commit pass's own system of record). The resumed crawl must not
    refetch any URL fetched before the kill."""
    part_dir = "/tmp/odsr_crawl_part_rsf"
    shutil.rmtree(part_dir, ignore_errors=True)

    part_job = CrawlJob(_cfg(part_dir, exact_seen=False, max_epochs=2))
    part_job.run()
    pre = part_job.docs_dataset().to_pandas()
    assert len(pre)

    resumed = CrawlJob(_cfg(part_dir, exact_seen=False, n_seen_shards=5))
    resumed.run(resume=True)
    docs = resumed.docs_dataset().to_pandas()
    # every URL appears exactly once across the kill/resume boundary
    assert docs["url"].is_unique
    # the pre-kill epochs' docs are still the same rows (not refetched)
    assert set(pre["url"]).issubset(set(docs["url"]))


def test_resume_reshard_lineage_rebuild_distributed_branch(ray_session):
    """commit_driver_threshold=0 forces the lineage rebuild's DISTRIBUTED
    mark pass (the branch that runs when an epoch's docs exceed driver
    bounds); the resumed crawl must still never refetch."""
    part_dir = "/tmp/odsr_crawl_part_rsd"
    shutil.rmtree(part_dir, ignore_errors=True)

    part_job = CrawlJob(_cfg(part_dir, exact_seen=False, max_epochs=2))
    part_job.run()
    pre = part_job.docs_dataset().to_pandas()
    assert len(pre)

    resumed = CrawlJob(
        _cfg(part_dir, exact_seen=False, n_seen_shards=5,
             commit_driver_threshold=0)
    )
    resumed.run(resume=True)
    docs = resumed.docs_dataset().to_pandas()
    assert docs["url"].is_unique
    assert set(pre["url"]).issubset(set(docs["url"]))


def test_auto_shard_counts_scale_with_cluster(ray_session):
    """Default shard counts derive from ray.cluster_resources() with floors
    4/2 — the fixed-constant funnel flagged in VERDICT r3 #7."""
    import ray as _ray

    job = CrawlJob(CrawlConfig(workdir="/tmp/odsr_auto_shards"))
    cpus = int(_ray.cluster_resources().get("CPU", 4))
    assert len(job.seen) == max(4, cpus // 8)
    assert len(job.sched) == max(2, cpus // 16)
