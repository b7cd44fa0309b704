"""Cuckoo-filter URL-seen set: membership, FP bounds, dump/load round-trip."""

import numpy as np

from outage_data_scraper_ray.state.cuckoo import CuckooFilter, SeenShard, shard_of


def test_insert_and_contains():
    f = CuckooFilter(capacity=1 << 12)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=2000, dtype=np.uint64)
    seen = f.check_add_batch(keys)
    assert not seen.all()
    # everything inserted must now be reported seen
    again = f.check_add_batch(keys)
    assert again.all()


def test_false_positive_rate_bounded():
    f = CuckooFilter(capacity=1 << 14)
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, size=8000, dtype=np.uint64)
    f.check_add_batch(keys)
    probe = rng.integers(0, 2**63, size=8000, dtype=np.uint64)
    fresh = np.setdiff1d(probe, keys)
    fp = sum(f.contains(int(h)) for h in fresh) / len(fresh)
    # 16-bit fingerprints, 4-way buckets: fp ~ 8/2^16 ≈ 0.00012
    assert fp < 0.01


def test_within_batch_duplicates_marked():
    f = CuckooFilter(capacity=1 << 10)
    keys = np.array([7, 7, 9, 7, 9], dtype=np.uint64)
    seen = f.check_add_batch(keys)
    assert seen.tolist() == [False, True, False, True, True]


def test_dump_load_roundtrip():
    f = CuckooFilter(capacity=1 << 12)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=3000, dtype=np.uint64)
    f.check_add_batch(keys)
    g = CuckooFilter.load(f.dump())
    assert g.count == f.count
    assert all(g.contains(int(k)) for k in keys[:500])


def test_exact_shard_tracks_set():
    s = SeenShard(capacity=1 << 10, exact=True)
    keys = np.array([1, 2, 3, 2, 1], dtype=np.uint64)
    seen = s.check_add(keys)
    assert seen.tolist() == [False, False, False, True, True]
    assert s.size() == 3
    s2 = SeenShard(capacity=1 << 10, exact=True)
    s2.load(s.dump())
    assert s2.exact_set == {1, 2, 3}


def test_shard_routing_balanced():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    route = shard_of(keys, 8)
    counts = np.bincount(route, minlength=8)
    assert counts.min() > 20000 / 8 * 0.8


def test_overload_never_loses_membership():
    """Regression: at extreme load the kick loop used to drop the displaced
    fingerprint — a previously inserted key would read as unseen and a
    crawled URL could be re-admitted. The stash must preserve membership."""
    f = CuckooFilter(capacity=1 << 8)  # 256 slots
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=600, dtype=np.uint64)  # 2.3x overload
    f.check_add_batch(keys)
    assert f.kick_failures > 0  # the overload actually exercised the stash
    missing = [int(h) for h in keys if not f.contains(int(h))]
    assert missing == []
    # stash survives a dump/load round trip
    g = CuckooFilter.load(f.dump())
    assert g.kick_failures == f.kick_failures
    assert [int(h) for h in keys if not g.contains(int(h))] == []


def test_contains_is_read_only_and_mark_idempotent():
    s = SeenShard(capacity=1 << 12, exact=True)
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    # read-only probe: repeated calls agree (a replayed Ray Data task must
    # see the same answer its first attempt saw)
    assert not s.contains(keys).any()
    assert not s.contains(keys).any()
    s.mark(keys)
    s.mark(keys)  # replayed commit: no-op
    assert s.contains(keys).all()
    assert s.size() == len(set(keys.tolist()))
