"""Integer hash functions for partitioning and hash tables.

The reference uses bit-slicing "hashes" (HASH_BIT_MODULO, radix_join.cpp:63)
because its generated keys are dense; that is kept for the radix family
(bucket = key bits), while open-addressing tables use a Fibonacci/murmur-style
mixer so the engine is robust to adversarial key sets (npj hash is
`k & mask`, npj_types.h — fine for dense keys only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

GOLDEN32 = np.uint32(0x9E3779B1)


def radix_bits(key, shift: int, bits: int):
    """bucket = (key >> shift) & (2^bits - 1) — HASH_BIT_MODULO analog.

    Dtype-generic: int64 keys (KEY_8B / JoinConfig.key64) shift in their
    native width — a uint32 cast would fold the high 32 bits away."""
    mask = (1 << bits) - 1
    if key.dtype in (jnp.int64, jnp.uint64):
        return ((key >> shift) & mask).astype(jnp.int32)
    return (key.astype(jnp.uint32) >> shift).astype(jnp.int32) & mask


def fib_hash32(key, table_bits: int):
    """Fibonacci multiplicative hash into [0, 2^table_bits).

    Bijective on uint32 (odd multiplier), so unique keys stay unique in the
    full 32-bit image — collisions only from truncation to table_bits.
    """
    h = key.astype(jnp.uint32) * GOLDEN32
    return (h >> (32 - table_bits)).astype(jnp.int32)


def murmur_mix32(key):
    """murmur3 finalizer — full-avalanche 32-bit mixer (bijective)."""
    k = key.astype(jnp.uint32)
    k = (k ^ (k >> 16)) * jnp.uint32(0x85EBCA6B)
    k = (k ^ (k >> 13)) * jnp.uint32(0xC2B2AE35)
    return k ^ (k >> 16)


def partition_hash(key, bits: int, salt: int = 0):
    """Hash-partition bucket in [0, 2^bits): top bits of a mixed key.

    Used by the distributed shuffle so skewed *key* values still spread when
    they differ (true heavy hitters are handled by skew splitting).
    """
    k = murmur_mix32(key if salt == 0 else key.astype(jnp.uint32) + jnp.uint32(salt))
    return (k >> (32 - bits)).astype(jnp.int32)
