"""Column scan operators — the SIMD512 scan family, TPU-native.

Reference: Scan-Micro-Benchmarks/shared_libraries/SimdScan/include/SIMD512.hpp:29-141
and SIMD512.cpp — AVX-512 kernels scanning an 8-bit-packed column against a
[low, high] range predicate in five output modes:

    count            → number of qualifying rows
    sum              → sum of qualifying values
    bitvector_scan   → 1 bit per row qualifying mask
    index scans      → compacted row-id list (implicit index)
    dict scans       → qualifying rows decoded through a dictionary (8/16/32
                       bit codes → 64-bit values)
    scan             → compacted qualifying values

On TPU these are pure VPU/bandwidth ops.  All shapes static: compaction
returns a fixed-capacity buffer + valid count (the reference's
"self-allocating" index scan sizes its output by a pre-count —
SIMD512.cpp implicit_index_scan_self_alloc — the same two-phase idiom).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def range_mask(col: jax.Array, low, high) -> jax.Array:
    """predicate low <= col <= high (inclusive; SIMD512 uses cmple/cmpge)."""
    return (col >= low) & (col <= high)


@jax.jit
def scan_count(col, low, high):
    """SIMD512::count — number of qualifying rows."""
    return jnp.sum(range_mask(col, low, high).astype(jnp.int32), dtype=jnp.int64)


@jax.jit
def scan_sum(col, low, high):
    """SIMD512::sum — sum of qualifying values."""
    m = range_mask(col, low, high)
    return jnp.sum(jnp.where(m, col, 0).astype(jnp.int64))


@jax.jit
def scan_bitvector(col, low, high):
    """SIMD512::bitvector_scan — 1 bit/row mask, packed 8 rows/byte.

    Packing mirrors the AVX-512 kmask stores: bit i of byte j = row 8j+i.
    """
    m = range_mask(col, low, high)
    n = m.shape[0]
    pad = (-n) % 8
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad,), m.dtype)])
    bits = m.reshape(-1, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * weights, axis=1).astype(jnp.uint8)


def _compact_indices(mask: jax.Array, capacity: int):
    """Stable compaction of set-bit indices into a fixed-capacity buffer.

    TPU-native replacement for vcompressstoreu: positions via cumsum, write
    via unique-index scatter.  Returns (row_ids[capacity], count).
    """
    n = mask.shape[0]
    m32 = mask.astype(jnp.int32)
    pos = jnp.cumsum(m32) - m32  # exclusive prefix = output slot
    count = pos[-1] + m32[-1] if n else jnp.int32(0)
    slot = jnp.where(mask, pos, capacity)  # dropped when out of range
    ids = jnp.arange(n, dtype=jnp.int32)
    out = jnp.zeros((capacity,), jnp.int32).at[slot].set(
        ids, unique_indices=True, mode="drop"
    )
    return out, count.astype(jnp.int64)


@functools.partial(jax.jit, static_argnames=("capacity",))
def scan_index(col, low, high, capacity: int):
    """SIMD512 implicit index scan — compacted qualifying row-ids + count."""
    return _compact_indices(range_mask(col, low, high), capacity)


@functools.partial(jax.jit, static_argnames=("capacity",))
def scan_values(col, low, high, capacity: int):
    """SIMD512::scan — compacted qualifying values + count."""
    mask = range_mask(col, low, high)
    ids, count = _compact_indices(mask, capacity)
    return col[ids], count


@functools.partial(jax.jit, static_argnames=("capacity",))
def scan_dict(codes, dictionary, low_code, high_code, capacity: int):
    """SIMD512 dict scans — decode qualifying small-int codes through a
    dictionary into wide values (SIMD512.cpp:320-335 gathers through a
    256-entry dict).  Predicate applies to the code domain as in the
    reference tests (testsimdscan.cpp)."""
    mask = range_mask(codes, low_code, high_code)
    ids, count = _compact_indices(mask, capacity)
    return dictionary[codes[ids].astype(jnp.int32)], count


@jax.jit
def scan_dict_full(codes, dictionary):
    """Unconditional dictionary decode (dict_scan without predicate)."""
    return dictionary[codes.astype(jnp.int32)]


def scan_count_streamed(host_col, low, high, chunk: int = 1 << 26):
    """Count scan over a HOST-resident column, double-buffered: chunk i+1's
    host->device transfer is issued while chunk i scans (JAX async dispatch
    pipelines the copies against the jitted partial counts — nothing syncs
    until the final scalar).  The preload=false analog of the reference
    (SimdScanMulti enclave-ingress runs): the sustained rate is bounded by
    the host->HBM link, with compute fully hidden under it."""
    n = host_col.shape[0]
    total = None
    for off in range(0, n, chunk):
        part_host = host_col[off:off + chunk]
        dev = jax.device_put(part_host)
        part = scan_count(dev, low, high)
        total = part if total is None else total + part
    return total
