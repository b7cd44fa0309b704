"""Sharded cuckoo-filter URL-seen set.

The reference's only dedup-state precedent is a per-fetch ``visited`` URL
list (il_scraper.py:200-212, ny_scraper.py:203-212); at 10^10-frontier scale
the north_rule demands an approximate-membership URL-seen set sharded by
canonical-URL hash across actor-pool shards, checkpointable for resume.

Design:
- Each shard is a numpy-backed cuckoo filter (buckets x 4 slots of uint16
  fingerprints; ~2 bytes/key at 95% load). Shard routing:
  ``shard = hash >> 48 % n_shards`` (high bits), so the low bits stay
  independent for bucket indexing.
- ``check_add`` is the only hot call: batch of uint64 hashes in, boolean
  "was already seen" mask out, unseen keys inserted atomically. One actor
  round-trip per (batch x shard) — the fetch pipeline batches thousands of
  URLs per call, so actor overhead amortizes.
- ``exact`` mode additionally keeps a python set per shard; used by the
  small-scale conformance tests that must reproduce the reference's exact
  URL-seen set (north_rule); the filter alone can only over-report seen.
- ``dump()/load()`` snapshot the raw arrays for crash-resume checkpoints.
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0  # fingerprint 0 marks an empty slot; real fingerprints are 1..65535
_KICKS = 500


class CuckooFilter:
    """Single-shard cuckoo filter over uint64 key hashes."""

    def __init__(self, capacity: int = 1 << 20, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(0xC0FFEE)
        # overflow stash: (bucket_idx, fp) pairs parked when the kick loop
        # fails near capacity. Without it, the fingerprint still in hand
        # after _KICKS evictions — which belongs to a PREVIOUSLY inserted
        # key — would be silently dropped, re-admitting a crawled URL.
        # A growing stash is the operator signal that capacity is undersized.
        self.stash: set[tuple[int, int]] = set()
        self.kick_failures = 0

    def _fp_idx(self, h: int) -> tuple[int, int]:
        fp = (h & 0xFFFF) or 1
        i1 = (h >> 16) & (self.n_buckets - 1)
        return fp, i1

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ (fp * 0x5BD1)) & (self.n_buckets - 1)

    def contains(self, h: int) -> bool:
        fp, i1 = self._fp_idx(h)
        if fp in self.table[i1]:
            return True
        i2 = self._alt(i1, fp)
        if fp in self.table[i2]:
            return True
        return bool(self.stash) and (
            (i1, fp) in self.stash or (i2, fp) in self.stash
        )

    def add(self, h: int) -> bool:
        """Insert. Never loses membership: if the kick loop fails, the
        fingerprint left in hand (belonging to a previously inserted key) is
        parked in the stash instead of being dropped."""
        fp, i = self._fp_idx(h)
        for idx in (i, self._alt(i, fp)):
            row = self.table[idx]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # cuckoo kicks
        for _ in range(_KICKS):
            slot = int(self._rng.integers(0, self.bucket_size))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick budget exhausted: stash the displaced fingerprint (keyed by
        # the bucket it was displaced from, which is one of its two homes)
        self.stash.add((int(i), int(fp)))
        self.count += 1
        self.kick_failures += 1
        return True

    def check_add_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vector wrapper: seen-mask for a batch, inserting unseen keys.
        Within-batch duplicates are marked seen after their first occurrence."""
        seen = np.empty(len(hashes), dtype=bool)
        for j, h in enumerate(hashes.tolist()):
            if self.contains(h):
                seen[j] = True
            else:
                seen[j] = False
                self.add(h)
        return seen

    def dump(self) -> dict:
        return {
            "table": self.table.copy(),
            "count": self.count,
            "bucket_size": self.bucket_size,
            "stash": np.array(sorted(self.stash), dtype=np.int64).reshape(-1, 2),
            "kick_failures": self.kick_failures,
        }

    @classmethod
    def load(cls, state: dict) -> "CuckooFilter":
        f = cls(capacity=state["table"].shape[0] * state["bucket_size"],
                bucket_size=state["bucket_size"])
        f.table = state["table"].copy()
        f.count = int(state["count"])
        stash = state.get("stash")
        if stash is not None and len(stash):
            f.stash = {(int(a), int(b)) for a, b in stash}
        f.kick_failures = int(state.get("kick_failures", 0))
        return f


class SeenShard:
    """Actor body for one URL-seen shard (instantiate via ray.remote)."""

    def __init__(self, capacity: int = 1 << 20, exact: bool = False):
        self.filter = CuckooFilter(capacity)
        self.exact = exact
        self.exact_set: set[int] = set()

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """READ-ONLY membership mask — safe inside retryable Ray Data tasks
        (a replayed block sees the same answer, unlike check_add, whose
        first attempt's marks would filter the replay's whole batch out)."""
        if self.exact:
            return np.fromiter(
                (h in self.exact_set for h in hashes.tolist()),
                dtype=bool, count=len(hashes),
            )
        return np.fromiter(
            (self.filter.contains(h) for h in hashes.tolist()),
            dtype=bool, count=len(hashes),
        )

    def mark(self, hashes: np.ndarray) -> None:
        """Idempotent mark-seen (add-if-absent, no return). The crawl commits
        marks from each epoch's FINALIZED docs parquet, so task replays and
        resume re-runs are no-ops."""
        self.filter.check_add_batch(hashes)
        if self.exact:
            self.exact_set.update(hashes.tolist())

    def check_add(self, hashes: np.ndarray) -> np.ndarray:
        if self.exact:
            out = np.empty(len(hashes), dtype=bool)
            for j, h in enumerate(hashes.tolist()):
                out[j] = h in self.exact_set
                self.exact_set.add(h)
            # keep the filter in sync so dumps are comparable
            self.filter.check_add_batch(hashes)
            return out
        return self.filter.check_add_batch(hashes)

    def size(self) -> int:
        return len(self.exact_set) if self.exact else self.filter.count

    def dump(self) -> dict:
        d = self.filter.dump()
        d["exact"] = self.exact
        d["exact_set"] = np.fromiter(self.exact_set, dtype=np.uint64) if self.exact else None
        return d

    def dump_to(self, path: str) -> None:
        """Write this shard's checkpoint npz from INSIDE the actor: the
        table array (10s of MB at crawl capacity) never ships to the
        driver, and the n_shards writes run in parallel instead of a serial
        driver loop. Same file format as the driver-side dump path (the
        atomic tmp+rename keeps a crash mid-write from leaving a torn file
        that a later resume would np.load).

        Assumes the checkpoint dir is reachable from the actor's node —
        i.e. a shared filesystem on a multi-node cluster. That is the same
        assumption every write_parquet sink in this engine already makes
        for the epoch directories; a deployment without shared storage
        would point the workdir at an object-store mount."""
        d = self.dump()
        tmp = path + ".tmp"
        np.savez(
            tmp,
            table=d["table"],
            count=d["count"],
            bucket_size=d["bucket_size"],
            exact=d["exact"],
            exact_set=d["exact_set"]
            if d["exact_set"] is not None
            else np.array([], dtype=np.uint64),
            stash=d["stash"],
            kick_failures=d["kick_failures"],
        )
        # np.savez appends .npz to any target not already ending in it
        import os

        os.replace(tmp + ".npz", path)

    def load(self, state: dict) -> None:
        self.filter = CuckooFilter.load(state)
        self.exact = bool(state.get("exact", False))
        es = state.get("exact_set")
        self.exact_set = set(es.tolist()) if es is not None else set()


def shard_of(hashes: np.ndarray, n_shards: int) -> np.ndarray:
    """Route by high hash bits (low bits index cuckoo buckets)."""
    return ((hashes >> np.uint64(48)) % np.uint64(n_shards)).astype(np.int64)
