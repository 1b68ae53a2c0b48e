"""Prefix-sum / histogram / compaction helpers shared across operators.

These are the TPU equivalents of the reference's shared-memory coordination
idioms: per-thread histograms + global prefix sums for scatter offsets
(radix_join.cpp:886-931) become cumsum/bincount over device arrays; the
vcompressstoreu compaction (SIMD512.cpp) becomes cumsum + unique scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exclusive_cumsum(x: jax.Array, axis: int = -1) -> jax.Array:
    c = jnp.cumsum(x, axis=axis)
    return c - x


def histogram(bucket: jax.Array, fanout: int) -> jax.Array:
    """Per-bucket counts (partition_hist analog, radix_join.cpp:614-654)."""
    return jnp.bincount(bucket, length=fanout).astype(jnp.int32)


def compact(mask: jax.Array, values: jax.Array, capacity: int, fill=0):
    """Stable compaction of `values[mask]` into a fixed-capacity buffer.

    Returns (out[capacity], count).  Invalid tail is `fill`.
    """
    m32 = mask.astype(jnp.int32)
    pos = jnp.cumsum(m32) - m32
    count = jnp.sum(m32)
    slot = jnp.where(mask, pos, capacity)
    out = jnp.full((capacity,), fill, values.dtype).at[slot].set(
        values, unique_indices=True, mode="drop"
    )
    return out, count


def compact_many(mask: jax.Array, arrays, capacity: int, fill=0):
    """Compact several parallel arrays with one shared mask."""
    m32 = mask.astype(jnp.int32)
    pos = jnp.cumsum(m32) - m32
    count = jnp.sum(m32)
    slot = jnp.where(mask, pos, capacity)
    outs = tuple(
        jnp.full((capacity,), fill, a.dtype).at[slot].set(
            a, unique_indices=True, mode="drop"
        )
        for a in arrays
    )
    return outs, count
