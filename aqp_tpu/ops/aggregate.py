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
    n = key.shape[0]
    sk, sp = jax.lax.sort((key, payload), num_keys=1)
    prev = jnp.concatenate([jnp.full((1,), -2147483648, sk.dtype), sk[:-1]])
    run_start = sk != prev
    # inclusive prefixes
    csum = jnp.cumsum(sp.astype(jnp.uint32), dtype=jnp.uint32)
    ccnt = jnp.cumsum(jnp.ones((n,), jnp.int32))
    cmin = jax.lax.cummin(sp)
    cmax = jax.lax.cummax(sp)
    # a run END is the position before the next run start (or n-1)
    next_start = jnp.concatenate([run_start[1:], jnp.ones((1,), bool)])
    run_end = next_start
    # per-run aggregate = prefix[end] - prefix[before start]; min/max need a
    # restart-scan: cummin/cummax over the whole array is wrong across runs —
    # recompute via segmented trick: subtract is invalid for min/max, so use
    # the reverse-prefix within runs: propagate run-start positions forward
    # and take extrema of the suffix slice... simplest exact approach: use
    # the difference formulation for count/sum and a second sort pass keyed
    # by (key, payload) for min/max: after sorting pairs, the run's min is at
    # its start and max at its end.
    sk2, sp2 = jax.lax.sort((key, payload), num_keys=2)
    run_min = sp2  # at run_start positions
    run_max = sp2  # at run_end positions

    num_groups = jnp.sum(run_start, dtype=jnp.int32)
    # compact run ends (carry end-prefix values) and run starts
    end_rank = jnp.cumsum(run_end.astype(jnp.int32)) - run_end.astype(jnp.int32)
    start_rank = jnp.cumsum(run_start.astype(jnp.int32)) - run_start.astype(jnp.int32)

    def compact(mask, rank, vals, fill):
        slot = jnp.where(mask, rank, capacity)
        return jnp.full((capacity,), fill, vals.dtype).at[slot].set(
            vals, unique_indices=True, mode="drop"
        )

    out_key = compact(run_start, start_rank, sk, jnp.int32(-3))
    end_csum = compact(run_end, end_rank, csum, jnp.uint32(0))
    end_ccnt = compact(run_end, end_rank, ccnt, jnp.int32(0))
    start_csum = compact(run_start, start_rank, csum - sp.astype(jnp.uint32), jnp.uint32(0))
    start_ccnt = compact(run_start, start_rank, ccnt - 1, jnp.int32(0))
    out_min = compact(run_start, start_rank, run_min, jnp.int32(0))
    out_max = compact(run_end, end_rank, run_max, jnp.int32(0))

    idx = jnp.arange(capacity, dtype=jnp.int32)
    live = idx < num_groups
    return GroupByResult(
        num_groups=num_groups,
        key=jnp.where(live, out_key, -3),
        count=jnp.where(live, end_ccnt - start_ccnt, 0),
        sum=jnp.where(live, end_csum - start_csum, 0),
        min=jnp.where(live, out_min, 0),
        max=jnp.where(live, out_max, 0),
    )


@jax.jit
def radix_sort_pairs(key, payload):
    """Sort (key, payload) by key ascending.

    Tier-1 delegates to lax.sort; the Pallas radix path replaces this on TPU
    (ops/pallas/).  Exposed as the public sort operator (the x86-simd-sort /
    avx512_qsort capability row — RSM's sorting engine)."""
    return jax.lax.sort((key, payload), num_keys=1)
