"""Per-stage metrics counters.

The reference tracks success_cnt + a failures list per run
(app/main.py:18-41). Here: one counters actor, incremented per batch (not
per row) from fetch/parse stages, dumped into every checkpoint manifest for
per-partition lineage.
"""

from __future__ import annotations

from collections import defaultdict


class CrawlCounters:
    """Actor body: monotonically increasing named counters."""

    def __init__(self):
        self.counts: dict[str, int] = defaultdict(int)

    def add(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    def add_many(self, updates: dict[str, int]) -> None:
        for k, v in updates.items():
            self.counts[k] += v

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def load(self, state: dict[str, int]) -> None:
        self.counts = defaultdict(int, state)
