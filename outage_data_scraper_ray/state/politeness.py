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
    """Actor body for one scheduler shard: token buckets for its hosts."""

    def __init__(self, rate: float = 2.0, burst: float = 4.0, dt: float = 1.0):
        self.rate = rate
        self.burst = burst
        self.dt = dt
        self.buckets: dict[str, TokenBucket] = {}

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

    def dump(self) -> dict:
        return {h: b.tokens for h, b in self.buckets.items()}

    def load(self, state: dict) -> None:
        self.buckets = {}
        for h, tokens in state.items():
            b = self._bucket(h)
            b.tokens = tokens


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
