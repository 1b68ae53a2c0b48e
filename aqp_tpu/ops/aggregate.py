"""Hash aggregate / group-by and radix sort operators.

The reference suite has no standalone aggregate; the north-star config adds
"hash aggregate + radix sort pipeline (group-by over join output)"
(BASELINE.json configs[3]).  TPU design: grouping is sort-based (the fast
reorder primitive), aggregation is run-boundary prefix-sum differencing —
no hash table, no scatter:

    sort rows by key → run starts = key-change points → per-run aggregates
    = inclusive-prefix differences at run ends → compact one row per run.

Aggregates supported: count, sum(payload), min, max.  Group keys in the
output are sorted ascending (deterministic across shardings).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GroupByResult(NamedTuple):
    num_groups: jax.Array  # int32 scalar
    key: jax.Array         # [capacity] sorted group keys (pad -3)
    count: jax.Array       # [capacity] rows per group
    sum: jax.Array         # [capacity] uint32 sum of payload (mod 2^32)
    min: jax.Array         # [capacity]
    max: jax.Array         # [capacity]


@functools.partial(jax.jit, static_argnames=("capacity",))
def groupby_aggregate(key, payload, capacity: int) -> GroupByResult:
    """One lexicographic sort does all the work: run starts give groups,
    payload order within a run gives min (at start) / max (at end), and a
    single prefix sum gives per-run sums by differencing.  Compaction is
    ONE position scatter (run-start index -> group rank) followed by
    capacity-sized gathers — no per-aggregate n-sized scatters."""
    n = key.shape[0]
    sk, sp = jax.lax.sort((key, payload), num_keys=2)
    prev = jnp.concatenate([jnp.full((1,), -2147483648, sk.dtype), sk[:-1]])
    run_start = sk != prev
    num_groups = jnp.sum(run_start, dtype=jnp.int32)
    rank = jnp.cumsum(run_start.astype(jnp.int32)) - 1

    # pos[g] = index of group g's first row; pos[num_groups..] stays n so
    # count/next-start arithmetic for dead slots degenerates to zero.  A
    # group `capacity` (overflow) still lands its start in pos[capacity],
    # which is exactly group capacity-1's next-start.
    slot = jnp.where(run_start, rank, capacity + 1)
    pos = jnp.full((capacity + 1,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    p, pn = pos[:capacity], pos[1:]
    pcl = jnp.clip(p, 0, n - 1)
    pe = jnp.clip(pn - 1, 0, n - 1)  # last row of the run

    csum = jnp.cumsum(sp.astype(jnp.uint32), dtype=jnp.uint32)
    live = jnp.arange(capacity, dtype=jnp.int32) < num_groups
    return GroupByResult(
        num_groups=num_groups,
        key=jnp.where(live, sk[pcl], -3),
        count=jnp.where(live, pn - p, 0),
        sum=jnp.where(
            live, csum[pe] - csum[pcl] + sp[pcl].astype(jnp.uint32), 0),
        min=jnp.where(live, sp[pcl], 0),
        max=jnp.where(live, sp[pe], 0),
    )


@jax.jit
def radix_sort_pairs(key, payload):
    """Sort (key, payload) by key ascending.

    Tier-1 delegates to lax.sort; the Pallas radix path replaces this on TPU
    (ops/pallas/).  Exposed as the public sort operator (the x86-simd-sort /
    avx512_qsort capability row — RSM's sorting engine)."""
    return jax.lax.sort((key, payload), num_keys=1)
