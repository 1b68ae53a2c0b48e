"""Beyond-HBM streaming join: device-resident build side, host-streamed
probe side.

The reference's headline regime is data EXCEEDING fast memory (EPC/cache
-exceed workloads, Join-Benchmarks experiments); its long-axis analog here
is |S| exceeding HBM: S stays in host RAM and streams through the chip in
fixed-size chunks while R (the PK build side) is built ONCE on device.

TPU design:
  * build = one `lax.sort` of R by key (the sorted-array hash-table
    replacement: binary search beats scatter/gather tables on this
    hardware, see ops/mergejoin.py header);
  * probe = per-chunk `searchsorted` + gather + masked reduce, one fused
    jitted program per chunk — no re-sort of R ever;
  * overlap: chunk k+1's host->device `device_put` is issued BEFORE chunk
    k's probe result is consumed, so the PCIe/DMA transfer rides under the
    probe compute (the double-buffering the reference gets from SWWC
    buffers, radix_join.cpp:1010-1055, applied to the host link instead).

Exact for unique R keys (PK build sides, generator.cpp:351-376 — same
contract as the fast-path engines).  Counts accumulate in int64 host-side:
streaming totals can exceed 2^31.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.relation import Relation


@jax.jit
def build_sorted(r_key, r_payload):
    """Build phase, once: R sorted by key (the 'hash table')."""
    return jax.lax.sort((r_key, r_payload), num_keys=1)


@jax.jit
def probe_chunk(rk_sorted, rp_sorted, s_key, s_payload):
    """Count + checksum of one S chunk against the sorted R side.
    Pad rows (key < 0) never match (all R keys are >= 0 by domain)."""
    idx = jnp.searchsorted(rk_sorted, s_key, method="sort")
    idx = jnp.clip(idx, 0, rk_sorted.shape[0] - 1)
    hit = (jnp.take(rk_sorted, idx) == s_key) & (s_key >= 0)
    ck = jnp.where(
        hit,
        jnp.take(rp_sorted, idx).astype(jnp.uint32)
        + s_payload.astype(jnp.uint32),
        jnp.uint32(0),
    )
    return (jnp.sum(hit, dtype=jnp.int32),
            jnp.sum(ck, dtype=jnp.uint32))


def streaming_join_count(relR: Relation,
                         s_chunks: Iterable[Tuple[np.ndarray, np.ndarray]],
                         ) -> Tuple[int, int]:
    """Join device-resident R against host-streamed S chunks.

    s_chunks yields (key, payload) host arrays (any equal-length chunking;
    the last chunk may be short).  Returns (matches, checksum mod 2^32).

    The transfer of chunk k+1 is enqueued before chunk k's scalars are
    fetched, so host->device DMA overlaps probe compute.
    """
    rk, rp = build_sorted(relR.key, relR.payload)
    matches = 0
    checksum = 0
    pending = []  # (m, c) device scalars not yet fetched
    for key_h, pay_h in s_chunks:
        sk = jax.device_put(np.ascontiguousarray(key_h))
        sp = jax.device_put(np.ascontiguousarray(pay_h))
        pending.append(probe_chunk(rk, rp, sk, sp))
        # drain one step behind: fetch chunk k-1 while chunk k transfers
        if len(pending) > 1:
            m, c = pending.pop(0)
            matches += int(m)
            checksum = (checksum + int(c)) & 0xFFFFFFFF
    for m, c in pending:
        matches += int(m)
        checksum = (checksum + int(c)) & 0xFFFFFFFF
    return matches, checksum


def chunk_host_relation(key: np.ndarray, payload: np.ndarray,
                        chunk_rows: int):
    """Standard chunker for a host-resident relation."""
    n = key.shape[0]
    for lo in range(0, n, chunk_rows):
        hi = min(n, lo + chunk_rows)
        yield key[lo:hi], payload[lo:hi]
