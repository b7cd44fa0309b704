"""Hash-partitioned map_batches: the scale path for key-grouped work when
key cardinality is ~row count.

`groupby(key).map_groups(fn)` pays a Python callable PER GROUP (~1-3 ms
each); on a nearly-unique key (canonical URL hashes, LSH band buckets) that
is one call per row — the degenerate case at 10^10-frontier scale. The
correct shape is: hash-shuffle once so equal keys are co-located in one
block, then run ONE vectorized callable per block (pandas groupby /
drop_duplicates inside), i.e. O(blocks) Python calls instead of O(rows).

Ray's `Dataset.repartition(num_blocks, keys=...)` provides exactly this
hash-shuffle, but only under `DataContext.shuffle_strategy=HASH_SHUFFLE`.
Each Dataset snapshots a DataContext at ROOT creation that is SHARED by all
datasets derived from that root, so we attach a private context copy (with
HASH_SHUFFLE) to the output chain's plan only — the global context, the
input dataset, and every sibling pipeline keep the sort-based default.
"""

from __future__ import annotations

import copy
from typing import Callable, Sequence

import ray
import ray.data as rd
from ray.data.context import ShuffleStrategy


def hash_partitioned_map_batches(
    ds: rd.Dataset,
    keys: Sequence[str],
    fn: Callable,
    *,
    num_blocks: int | None = None,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """Hash-shuffle `ds` on `keys`, then apply `fn` once per partition.

    Co-location contract: after the shuffle every row with equal `keys`
    values is in the same block, and `batch_size=None` hands `fn` whole
    blocks — so any per-key logic inside `fn` (drop_duplicates, groupby,
    pair enumeration) sees each key's complete row set. `fn` must be
    correct for an arbitrary UNION of complete key groups.

    DOWNSTREAM contract: the returned dataset's PLAN is pinned to
    HASH_SHUFFLE (a keyed repartition refuses to execute under the sort
    strategy, and one plan has one context), so every later wide op on the
    same plan also runs hash-shuffled. Chaining more
    hash_partitioned_map_batches / unions / map_batches is fine (the dedup
    label-propagation loop does exactly that); a later SORT-BASED
    `groupby().map_groups` on this plan is NOT — under HASH_SHUFFLE it
    spawns its aggregator fleet per groupby and stalls small sessions
    (observed: unbounded worker spawn at 4-16 CPUs). Either fuse the
    per-key work into `fn`, or break the plan first (write/materialize).
    """
    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_blocks = max(8, cpus)
    # Blocks that round-tripped through pandas (or pandas-written parquet)
    # carry b'pandas' schema metadata, which makes pa.Schema unhashable —
    # the shuffle aggregator then logs "Failed to hash the schemas" per
    # block-merge and loses unify_schemas' early exit. Strip it (zero-copy).
    stripped = ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
    out = stripped.repartition(num_blocks, keys=list(keys)).map_batches(
        fn, batch_format=batch_format, batch_size=None
    )
    # The planner validates the strategy against the PLAN's captured context
    # (snapshotted at ds's ROOT creation and SHARED by every dataset derived
    # from that root). Mutating it in place would silently flip sibling
    # pipelines on the same root to hash shuffle — e.g. a later sort-based
    # groupby on `ds` itself. Attach a private copy to this chain only.
    ctx = copy.deepcopy(out._plan._context)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # both plan layers carry a context reference: the execution plan drives
    # the streaming executor, the logical plan drives the planner's
    # strategy validation — rebind both to the private copy
    out._plan._context = ctx
    out._logical_plan._context = ctx
    return out
