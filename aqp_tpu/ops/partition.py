"""Radix partitioning primitives.

The reference's radix partition (radix_join.cpp:614-931) is: per-thread
histogram → local prefix sums → global write cursors → scatter (optionally
through software write-combining buffers, :961-1056).  The TPU-native
primitive set:

    radix_histogram   — per-bucket counts (the "hist" phase)
    partition_offsets — global exclusive prefix (the "global cursor" phase)
    radix_partition   — stable reorder by bucket (the "scatter" phase)

Tier-1 reorder is a stable XLA sort on the bucket id (measured ~3x faster
than XLA scatter on this chip); Tier-2 (ops/pallas/) replaces it with a
VMEM-buffered Pallas kernel (the SWWC-buffer analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aqp_tpu.ops.hashing import radix_bits


@functools.partial(jax.jit, static_argnames=("bits",))
def radix_histogram(bucket, bits: int):
    """Bucket counts via one-hot block sums (bincount's scatter-add is slow
    on this hardware; the one-hot reduction stays on the VPU/MXU)."""
    fanout = 1 << bits
    n = bucket.shape[0]
    pad = (-n) % 256
    if pad:
        bucket = jnp.concatenate([bucket, jnp.full((pad,), fanout, bucket.dtype)])
    blocks = bucket.reshape(-1, 256)
    oh = (blocks[:, :, None] == jnp.arange(fanout)[None, None, :]).astype(jnp.int32)
    return oh.sum((0, 1))


def partition_offsets(hist):
    """Exclusive prefix over bucket counts — global scatter cursors
    (radix_join.cpp:886-915)."""
    c = jnp.cumsum(hist)
    return c - hist


@functools.partial(jax.jit, static_argnames=("shift", "bits"))
def radix_partition(key, payload, shift: int, bits: int):
    """Stable reorder by radix bucket; returns (key, payload, hist)."""
    bucket = radix_bits(key, shift, bits)
    b, k, p = jax.lax.sort((bucket, key, payload), num_keys=1, is_stable=True)
    hist = radix_histogram(bucket, bits)
    return k, p, hist
