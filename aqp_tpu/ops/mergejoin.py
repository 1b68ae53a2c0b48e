"""Sort-based equi-join core: union sort + prefix propagation.

TPU-native replacement for pointer-chasing build/probe loops.  Measured on
this hardware (notes/microbench_primitives.py): XLA gather/scatter run at
~100 M rows/s while `lax.sort` runs at ~300 M rows/s and scans (cumsum /
associative_scan) at multi-G rows/s.  So the portable XLA join core avoids
random access entirely:

    1. sort concat(R, S) by key, stable, R rows tagged before S rows;
    2. propagate the last-seen R (key, payload) forward with an associative
       "last-valid" scan;
    3. an S row matches iff the propagated key equals its own key.

For unique R keys (every workload in the reference: PK build sides —
generator.cpp:351-376, TPC-H build sides are key-unique) this yields the
exact join.  A duplicate-R fallback (`expand=True`) handles general inputs
by iterating over duplicate ranks.

This single core backs the Tier-1 (pure-XLA) versions of the sort-merge
family (MWAY/PSM/RSM — sortmergejoin_multiway.cpp, parallel_sortmerge_join.cpp,
radix_sortmerge_join.cpp) and the per-partition joins of the radix family.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel for "no R row seen yet" — all generated keys are >= 1
# (generator.cpp dense sets {1..N}); TPC-H keys are >= 0, so tag rows instead
# of relying on key values: validity is carried explicitly.
_NEG = np.int32(-1)


class JoinCounts(NamedTuple):
    matches: jax.Array  # int32 scalar (documented limit: < 2^31 matches)
    checksum: jax.Array  # uint32 scalar: sum(r_payload + s_payload) mod 2^32


class JoinMaterialized(NamedTuple):
    matches: jax.Array
    checksum: jax.Array
    key: jax.Array
    r_payload: jax.Array
    s_payload: jax.Array


_FF_BLOCK = 1024


def _shift_right(x, d, fill):
    return jnp.concatenate([jnp.full(x.shape[:-1] + (d,), fill, x.dtype),
                            x[..., :-d]], axis=-1)


def _ff_doubling(valid, arrays, width):
    """Hillis-Steele fill-forward along the last axis (log2(width) rounds)."""
    d = 1
    while d < width:
        sv = _shift_right(valid, d, False)
        take = (~valid) & sv
        arrays = tuple(
            jnp.where(take, _shift_right(a, d, 0), a) for a in arrays
        )
        valid = valid | sv
        d *= 2
    return valid, arrays


def _last_valid_scan(valid, a, b):
    """Forward-propagate the most recent (a, b) where valid (inclusive).

    Implemented as a blocked Hillis-Steele doubling scan (flat graph of
    shift+select stages) — `lax.associative_scan` over a tuple builds a
    recursive graph whose compile time explodes at 10M+ elements on the TPU
    toolchain; this formulation compiles in seconds at any size.
    """
    n = valid.shape[0]
    if n <= _FF_BLOCK:
        v, (ra, rb) = _ff_doubling(valid, (a, b), n)
        return v, ra, rb
    pad = (-n) % _FF_BLOCK
    if pad:
        z = jnp.zeros((pad,), a.dtype)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        a = jnp.concatenate([a, z])
        b = jnp.concatenate([b, z])
    nb = valid.shape[0] // _FF_BLOCK
    v = valid.reshape(nb, _FF_BLOCK)
    av = a.reshape(nb, _FF_BLOCK)
    bv = b.reshape(nb, _FF_BLOCK)
    v, (av, bv) = _ff_doubling(v, (av, bv), _FF_BLOCK)
    # exclusive cross-block prefix of the per-block "last valid"
    pv, pa, pb = _last_valid_scan(v[:, -1], av[:, -1], bv[:, -1])
    pv = jnp.concatenate([jnp.zeros((1,), bool), pv[:-1]])
    pa = jnp.concatenate([jnp.zeros((1,), pa.dtype), pa[:-1]])
    pb = jnp.concatenate([jnp.zeros((1,), pb.dtype), pb[:-1]])
    take = (~v) & pv[:, None]
    av = jnp.where(take, pa[:, None], av)
    bv = jnp.where(take, pb[:, None], bv)
    v = v | pv[:, None]
    out_v = v.reshape(-1)[:n]
    out_a = av.reshape(-1)[:n]
    out_b = bv.reshape(-1)[:n]
    return out_v, out_a, out_b


def join_sorted_union(r_key, r_payload, s_key, s_payload):
    """Sort concat(R,S); return (sorted arrays, match mask, propagated R
    payload) — the shared spine of count and materialize paths.

    The R/S tag is packed into bit 0 of the sort key (skey = key<<1 | tag),
    so the union sort is a single-key two-array sort — measured ~35% faster
    than the 3-array/2-key form.  Requires |key| < 2^30 (holds for every
    reference workload: dense keys ≤ 2^29 rows, TPC-H keys < 2^30; asserted
    in debug via key domain docs).  R rows sort before S rows of equal key
    because tag(R)=0 < tag(S)=1.
    """
    nr = r_key.shape[0]
    ns = s_key.shape[0]
    skey = jnp.concatenate([r_key << 1, (s_key << 1) | 1])
    pay = jnp.concatenate([r_payload, s_payload])
    pk, spay = jax.lax.sort((skey, pay), num_keys=1)
    is_r = (pk & 1) == 0
    sk = pk >> 1  # original key, sign-preserving
    _, prop_key, prop_pay = _last_valid_scan(
        is_r, jnp.where(is_r, sk, _NEG), jnp.where(is_r, spay, _NEG)
    )
    match = (~is_r) & (prop_key == sk)
    return sk, spay, match, prop_pay


@jax.jit
def merge_join_count_keys(r_key, s_key) -> JoinCounts:
    """Matches-only count join (no payload lanes move — the reference count
    branch likewise never reads payloads, radix_join.cpp:428-447).
    Checksum returns uint32(0).  Unique R keys."""
    skey = jnp.concatenate([r_key << 1, (s_key << 1) | 1])
    pk = jax.lax.sort(skey)
    is_r = (pk & 1) == 0
    sk = pk >> 1
    zero = jnp.zeros_like(sk)
    _, prop_key, _ = _last_valid_scan(is_r, jnp.where(is_r, sk, _NEG), zero)
    match = (~is_r) & (prop_key == sk)
    return JoinCounts(jnp.sum(match, dtype=jnp.int32), jnp.uint32(0))


@jax.jit
def merge_join_count_general_keys(r_key, s_key) -> JoinCounts:
    """Matches-only duplicate-tolerant count (multiplicity-exact)."""
    skey = jnp.concatenate([r_key << 1, (s_key << 1) | 1])
    pk2 = jax.lax.sort(skey)
    sk = pk2 >> 1
    is_r = (pk2 & 1) == 0
    r_ind = is_r.astype(jnp.int32)
    r_pref = jnp.cumsum(r_ind)
    prev_key = jnp.concatenate([jnp.full((1,), -1, sk.dtype), sk[:-1]])
    run_start = sk != prev_key
    base_cnt = jnp.where(run_start, r_pref - r_ind, 0)
    _, run_cnt0, _ = _last_valid_scan(
        run_start, base_cnt, jnp.zeros_like(base_cnt))
    mult = jnp.where(~is_r, r_pref - run_cnt0, 0)
    return JoinCounts(jnp.sum(mult, dtype=jnp.int32), jnp.uint32(0))


@jax.jit
def merge_join_count(r_key, r_payload, s_key, s_payload) -> JoinCounts:
    """Exact match count + mod-2^32 checksum (CHT checksum oracle analog,
    CHTJoin.hpp:154-178), unique R keys."""
    sk, spay, match, prop_pay = join_sorted_union(r_key, r_payload, s_key, s_payload)
    matches = jnp.sum(match, dtype=jnp.int32)
    ck = jnp.where(match, prop_pay.astype(jnp.uint32) + spay.astype(jnp.uint32), 0)
    checksum = jnp.sum(ck, dtype=jnp.uint32)
    return JoinCounts(matches, checksum)


@functools.partial(jax.jit, static_argnames=("capacity",))
def merge_join_materialize(
    r_key, r_payload, s_key, s_payload, capacity: int
) -> JoinMaterialized:
    """Materialized join output (key, r_payload, s_payload), compacted into a
    fixed-capacity buffer (chunked-table analog, ChunkedTable.cpp:49-171).

    Compaction is sort-based (sort by !match) — faster than scatter on this
    hardware.  Output order is arbitrary, as in the reference (per-thread
    chunk splicing).
    """
    sk, spay, match, prop_pay = join_sorted_union(r_key, r_payload, s_key, s_payload)
    matches = jnp.sum(match, dtype=jnp.int32)
    ck = jnp.where(match, prop_pay.astype(jnp.uint32) + spay.astype(jnp.uint32), 0)
    checksum = jnp.sum(ck, dtype=jnp.uint32)
    inv = (~match).astype(jnp.int32)
    _, out_k, out_rp, out_sp = jax.lax.sort(
        (inv, sk, prop_pay, spay), num_keys=1
    )
    n = out_k.shape[0]
    if capacity <= n:
        out_k, out_rp, out_sp = out_k[:capacity], out_rp[:capacity], out_sp[:capacity]
    else:
        pad = capacity - n
        z = jnp.zeros((pad,), out_k.dtype)
        out_k = jnp.concatenate([out_k, z])
        out_rp = jnp.concatenate([out_rp, z])
        out_sp = jnp.concatenate([out_sp, z])
    # sentinel the invalid tail so results are deterministic and the output
    # can feed a further join without phantom matches (key -3 never occurs)
    idx = jnp.arange(capacity, dtype=jnp.int32)
    live = idx < matches
    out_k = jnp.where(live, out_k, -3)
    out_rp = jnp.where(live, out_rp, 0)
    out_sp = jnp.where(live, out_sp, 0)
    return JoinMaterialized(matches, checksum, out_k, out_rp, out_sp)


@functools.partial(jax.jit, static_argnames=("capacity",))
def compact_matches(hit, key, r_payload, s_payload, capacity: int
                    ) -> JoinMaterialized:
    """Compact rows where `hit` into a fixed-capacity materialized result.

    Shared output-assembly for probe-style engines (RHT/PHT/CHT/INL): given
    per-S-row hit mask and the gathered R payload, produce the same
    JoinMaterialized contract as merge_join_materialize (ChunkedTable
    analog, ChunkedTable.cpp:49-171).  Sort-based compaction (sort by !hit).
    """
    matches = jnp.sum(hit, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(hit, r_payload.astype(jnp.uint32)
                  + s_payload.astype(jnp.uint32), 0),
        dtype=jnp.uint32,
    )
    inv = (~hit).astype(jnp.int32)
    _, out_k, out_rp, out_sp = jax.lax.sort(
        (inv, key, r_payload, s_payload), num_keys=1
    )
    n = out_k.shape[0]
    if capacity <= n:
        out_k, out_rp, out_sp = (
            out_k[:capacity], out_rp[:capacity], out_sp[:capacity])
    else:
        pad = capacity - n
        z = jnp.zeros((pad,), out_k.dtype)
        out_k = jnp.concatenate([out_k, z])
        out_rp = jnp.concatenate([out_rp, z])
        out_sp = jnp.concatenate([out_sp, z])
    idx = jnp.arange(capacity, dtype=jnp.int32)
    live = idx < matches
    out_k = jnp.where(live, out_k, -3)
    out_rp = jnp.where(live, out_rp, 0)
    out_sp = jnp.where(live, out_sp, 0)
    return JoinMaterialized(matches, checksum, out_k, out_rp, out_sp)


def count_general_scan(pk2, spay) -> JoinCounts:
    """The run-count scan of the duplicate-exact core, on a PRE-SORTED
    packed union (pk2 = key<<1|tag ascending, spay aligned payloads) —
    shared by merge_join_count_general and engines that sort in a
    different (e.g. hash-bucket-major) order first."""
    sk = pk2 >> 1
    is_r = (pk2 & 1) == 0
    r_ind = is_r.astype(jnp.int32)
    r_pref = jnp.cumsum(r_ind)  # inclusive #R rows up to position
    rpay_pref = jnp.cumsum(jnp.where(is_r, spay.astype(jnp.uint32), 0), dtype=jnp.uint32)
    # run start marker: key differs from predecessor
    prev_key = jnp.concatenate([jnp.full((1,), -1, sk.dtype), sk[:-1]])
    run_start = sk != prev_key
    # propagate (r_pref, rpay_pref) value *just before* the run start
    base_cnt = jnp.where(run_start, r_pref - r_ind, 0)
    base_pay = jnp.where(
        run_start, rpay_pref - jnp.where(is_r, spay.astype(jnp.uint32), 0), 0
    )
    _, run_cnt0, run_pay0 = _last_valid_scan(run_start, base_cnt, base_pay.astype(jnp.int32))
    mult = jnp.where(~is_r, r_pref - run_cnt0, 0)
    rpay_sum = jnp.where(
        ~is_r, rpay_pref - run_pay0.astype(jnp.uint32), jnp.uint32(0)
    )
    matches = jnp.sum(mult, dtype=jnp.int32)
    checksum = jnp.sum(
        rpay_sum + mult.astype(jnp.uint32) * spay.astype(jnp.uint32), dtype=jnp.uint32
    )
    return JoinCounts(matches, checksum)


@jax.jit
def merge_join_count_general(r_key, r_payload, s_key, s_payload) -> JoinCounts:
    """Duplicate-tolerant count: per-S-row match multiplicity via run-length
    ranks.  Counts (not materialization) for arbitrary R key multiplicity.

    matches = Σ_s (#R rows with that key).  Computed as: sort union; for each
    position, run-start via key-change detection; R-count per run via
    prefix sums; each S row adds the R-count of its run.  Checksum uses the
    *sum* of R payloads in the run (Σ_r (r_pay) + mult·s_pay ≡ Σ pairs).
    """
    skey = jnp.concatenate([r_key << 1, (s_key << 1) | 1])
    pay = jnp.concatenate([r_payload, s_payload])
    pk2, spay = jax.lax.sort((skey, pay), num_keys=1)
    return count_general_scan(pk2, spay)
