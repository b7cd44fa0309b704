"""Per-host politeness: deterministic token buckets on a virtual clock.

The reference has no politeness layer (its Lambda loop is sequential, one
fetch at a time per shard, app/main.py:21 — implicitly polite). A
distributed crawler must make the budget explicit. The north_rule asks for
per-host token buckets + a priority scheduler keyed on
(utility_tier, refresh_deadline).

Determinism contract (needed for the crawl-order conformance test): time is
*virtual* — one crawl epoch = one tick of ``dt`` seconds. The budget a host
gets in epoch e is a pure function of (rate, burst, number of admissions so
far), never of wall-clock, so the distributed run and the sequential oracle
compute identical admission sets.

Scale shape: hosts are sharded by hash across a small pool of scheduler
actors; the driver asks each shard once per epoch for its hosts' budgets
(dict host -> int, tiny) and broadcasts that to the gate stage via
``ray.put``. Admission itself happens inside a distributed groupby (rank
within host by priority < budget), so no per-URL actor traffic exists.
"""

from __future__ import annotations

import numpy as np


class TokenBucket:
    __slots__ = ("rate", "burst", "tokens")

    def __init__(self, rate: float, burst: float):
        self.rate = rate
        self.burst = burst
        self.tokens = burst

    def tick(self, dt: float) -> None:
        self.tokens = min(self.burst, self.tokens + self.rate * dt)

    def budget(self) -> int:
        return int(self.tokens)

    def consume(self, n: int) -> None:
        self.tokens -= n


class HostScheduler:
    """Actor body for one scheduler shard: token buckets + a robots-rule
    cache for its hosts. The robots 'fetch' happens once per host (cached,
    checkpointed with the buckets); in this engine it is the deterministic
    synthetic robots_rules()."""

    def __init__(
        self, rate: float = 2.0, burst: float = 4.0, dt: float = 1.0, seed: int = 42
    ):
        self.rate = rate
        self.burst = burst
        self.dt = dt
        self.seed = seed
        self.buckets: dict[str, TokenBucket] = {}
        self.robots_cache: dict[str, tuple[str, ...]] = {}

    def _bucket(self, host: str) -> TokenBucket:
        b = self.buckets.get(host)
        if b is None:
            b = self.buckets[host] = TokenBucket(self.rate, self.burst)
        return b

    def tick(self) -> None:
        for b in self.buckets.values():
            b.tick(self.dt)

    def budgets(self, hosts: list[str]) -> dict[str, int]:
        return {h: self._bucket(h).budget() for h in hosts}

    def consume(self, admitted: dict[str, int]) -> None:
        for h, n in admitted.items():
            self._bucket(h).consume(n)

    def robots(self, hosts: list[str]) -> dict[str, tuple[str, ...]]:
        from ..synth import robots_rules

        out = {}
        for h in hosts:
            rules = self.robots_cache.get(h)
            if rules is None:
                rules = self.robots_cache[h] = robots_rules(h, self.seed)
            out[h] = rules
        return out

    def dump(self) -> dict:
        return {
            "tokens": {h: b.tokens for h, b in self.buckets.items()},
            "robots": {h: list(r) for h, r in self.robots_cache.items()},
        }

    def load(self, state: dict) -> None:
        self.buckets = {}
        tokens = state.get("tokens", state)  # tolerate pre-robots dumps
        for h, t in tokens.items():
            b = self._bucket(h)
            b.tokens = t
        self.robots_cache = {
            h: tuple(r) for h, r in state.get("robots", {}).items()
        }


def scheduler_shard_of(host: str, n_shards: int) -> int:
    from ..synth import hash64

    return hash64("sched:" + host) % n_shards


class VirtualBudgets:
    """Driver-side deterministic politeness (used by the sequential oracle and
    by small single-process runs): same math as HostScheduler, no actors."""

    def __init__(self, rate: float = 2.0, burst: float = 4.0, dt: float = 1.0):
        self.sched = HostScheduler(rate, burst, dt)

    def epoch_budgets(self, hosts: list[str]) -> dict[str, int]:
        self.sched.tick()
        return self.sched.budgets(sorted(set(hosts)))

    def consume(self, admitted: dict[str, int]) -> None:
        self.sched.consume(admitted)
