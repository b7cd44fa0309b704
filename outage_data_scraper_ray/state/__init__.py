from .cuckoo import CuckooFilter, SeenShard, shard_of
from .politeness import HostScheduler, TokenBucket, VirtualBudgets, scheduler_shard_of
from .counters import CrawlCounters

__all__ = [
    "CuckooFilter",
    "SeenShard",
    "shard_of",
    "HostScheduler",
    "TokenBucket",
    "VirtualBudgets",
    "scheduler_shard_of",
    "CrawlCounters",
]
