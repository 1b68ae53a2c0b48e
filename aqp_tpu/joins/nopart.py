"""No-partition hash join engines: PHT family, NPO_st/NPO_no, NPBC_st.

Reference: no_partitioning_hash_join.cpp:165-539 — a shared bucket-chained
hash table (2 tuples/bucket, a spinlock latch per bucket), built in parallel
by all threads, then probed (HashLinkTableCommon.cpp:110-140).  Variants:
`_no` (no overflow buckets), `_un` (goto-template unrolled build, factor 10),
`_o` (overflow chains), `_st` (single-threaded), NPBC_st (bucket-chaining
via next/bucket arrays, no_partitioning_bucket_chaining_join.cpp:51-125).

TPU design — no latches, no chains: a vectorized **open-addressing** table.
Build resolves collisions with rounds of `scatter-min` (the slot's winner is
the minimum key contending for it; losers advance — parallel linear
probing).  Slots fill monotonically (EMPTY→occupied, never back), so the
classic probe invariant holds: a key stored at displacement d implies no
empty slot before it, and probes may stop at the first EMPTY.  The probe
gathers a window of consecutive slots per key and falls back to a bounded
while-loop for the rare longer displacement.

Requires unique build keys (true for every reference workload: PK build
sides).  `run_join` falls back to the general sort-merge core for duplicate
build keys via joins/sortmerge.
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops.hashing import fib_hash32
from aqp_tpu.ops import mergejoin
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer

_MAX_BUILD_ROUNDS = 64


@functools.partial(jax.jit, static_argnames=("table_bits",))
def build_table(r_key, r_payload, table_bits: int):
    """Open-addressing build via scatter-min rounds.

    Returns (table_key[T+slack], table_payload[T+slack], max_displacement).
    The slack region absorbs linear-probe overflow past the table end (no
    wraparound — simpler vectorized probes, same expected displacement).
    """
    T = 1 << table_bits
    slack = _MAX_BUILD_ROUNDS
    # table slots carry the key dtype (int64 under key64); EMPTY = dtype max
    empty = jnp.asarray(jnp.iinfo(r_key.dtype).max, r_key.dtype)
    tkey = jnp.full((T + slack,), empty, r_key.dtype)
    slot0 = fib_hash32(r_key, table_bits)

    def cond(state):
        _, _, active, rounds = state
        # rounds bound guarantees termination even for adversarial key sets
        # (leftover rows would overflow the slack region and be dropped —
        # impossible at load <= 0.5 with < 2^26 build rows in practice).
        return jnp.any(active) & (rounds < _MAX_BUILD_ROUNDS)

    def body(state):
        tkey, slot, active, rounds = state
        target = jnp.where(active, slot, T + slack)  # drop non-active
        tkey = tkey.at[target].min(r_key, mode="drop")
        cur = tkey[slot]
        settled = cur == r_key
        # cur < key ⇒ slot owned by a smaller key: advance (also re-activates
        # previously settled rows that were evicted by a smaller key).
        slot = jnp.where(settled, slot, slot + 1)
        return tkey, slot, ~settled, rounds + 1

    tkey, slot, _, rounds = jax.lax.while_loop(
        cond, body, (tkey, slot0, jnp.ones_like(r_key, dtype=bool), jnp.int32(0))
    )
    # unique keys ⇒ unique final slots ⇒ payload scatter is conflict-free
    tpay = jnp.zeros((T + slack,), r_payload.dtype).at[slot].set(
        r_payload, unique_indices=True, mode="drop"
    )
    max_disp = jnp.max(slot - slot0)
    return tkey, tpay, max_disp


@functools.partial(jax.jit, static_argnames=("table_bits", "window"))
def probe_table(tkey, tpay, s_key, table_bits: int, window: int):
    """Windowed vectorized probe: gather `window` consecutive slots, then a
    while-loop for rows still unresolved (neither hit nor EMPTY seen)."""
    slot0 = fib_hash32(s_key, table_bits)
    empty = jnp.asarray(jnp.iinfo(tkey.dtype).max, tkey.dtype)
    found = jnp.zeros_like(s_key, dtype=bool)
    rpay = jnp.zeros_like(tpay, shape=s_key.shape)
    open_ = jnp.zeros_like(s_key, dtype=bool)  # saw EMPTY ⇒ definitive miss
    for w in range(window):
        k = tkey[slot0 + w]
        hit = (~found) & (~open_) & (k == s_key)
        rpay = jnp.where(hit, tpay[slot0 + w], rpay)
        found = found | hit
        open_ = open_ | ((~found) & (k == empty))

    def cond(state):
        w, found, open_, _ = state
        return jnp.any(~(found | open_)) & (w < jnp.int32(tkey.shape[0]))

    def body(state):
        w, found, open_, rpay = state
        k = tkey[slot0 + w]
        hit = (~found) & (~open_) & (k == s_key)
        rpay = jnp.where(hit, tpay[slot0 + w], rpay)
        found = found | hit
        open_ = open_ | ((~(found | open_)) & (k == empty))
        return w + 1, found, open_, rpay

    _, found, open_, rpay = jax.lax.while_loop(
        cond, body, (jnp.int32(window), found, open_, rpay)
    )
    return found, rpay


@functools.partial(jax.jit, static_argnames=("table_bits", "window", "capacity"))
def _probe_and_finish(tkey, tpay, s_key, s_payload, table_bits, window, capacity):
    found, rpay = probe_table(tkey, tpay, s_key, table_bits, window)
    matches = jnp.sum(found, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(found, rpay.astype(jnp.uint32) + s_payload.astype(jnp.uint32), 0),
        dtype=jnp.uint32,
    )
    if capacity == 0:
        return mergejoin.JoinCounts(matches, checksum)
    inv = (~found).astype(jnp.int32)
    _, out_k, out_rp, out_sp = jax.lax.sort(
        (inv, s_key, rpay, s_payload), num_keys=1
    )
    idx = jnp.arange(capacity, dtype=jnp.int32)
    live = idx < matches
    n = out_k.shape[0]
    take = min(capacity, n)
    pad = capacity - take
    def fit(x, fill=0):
        x = x[:take]
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return jnp.where(live, x, fill)
    return mergejoin.JoinMaterialized(
        matches, checksum, fit(out_k, -3), fit(out_rp), fit(out_sp)
    )


def table_bits_for(num_r: int, load_factor: float) -> int:
    # open addressing with a bounded build-round budget needs load <= 0.5;
    # higher requested loads (chain-style variants) are clamped — the chain
    # role is played by the probe window instead.
    load_factor = min(load_factor, 0.5)
    return max(4, math.ceil(math.log2(max(2, num_r / load_factor))))


def _nphj_available(relR, relS, cfg) -> bool:
    if not cfg.use_pallas or cfg.key64 or cfg.profile_phases:
        return False
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:
        return False
    return relR.key.dtype == jnp.int32 and relS.key.dtype == jnp.int32


def _nopart(relR: Relation, relS: Relation, cfg: JoinConfig, window: int,
            variant: str = "PHT"):
    pt = PhaseTimer()
    t0 = time.perf_counter()
    if _nphj_available(relR, relS, cfg):
        # Fused shared-table Pallas pipeline (ops/pallas/nphj.py): the
        # table build + stream probe as one program; salt-retry on
        # overflow, exact-XLA fallback after (never silently wrong).
        from aqp_tpu.ops.pallas.nphj import (
            VARIANT_PARAMS, nphj_join_count, nphj_join_materialize)
        from aqp_tpu.ops.pallas.rho3 import RETRY_SALTS

        prm = VARIANT_PARAMS[variant]
        if cfg.materialize:
            for salt in RETRY_SALTS:
                m, c, ok, orp, osp, ovf = pt.time_fn(
                    "join", nphj_join_materialize, relR.key, relR.payload,
                    relS.key, relS.payload, prm=prm, salt=salt)
                if int(ovf) == 0:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    from aqp_tpu.relation import JoinResult

                    return JoinResult(matches=m, checksum=c, key=ok,
                                      r_payload=orp, s_payload=osp), pt.t
            out = pt.time_fn(
                "join", mergejoin.merge_join_materialize,
                relR.key, relR.payload, relS.key, relS.payload,
                result_capacity(relS, cfg))
        else:
            from aqp_tpu.joins.dense import _dense_proof
            from aqp_tpu.joins.skewtier import skew_fused_count, skew_plan
            from aqp_tpu.ops.pallas.nphj import VARIANT_PIPELINES_SKEW

            call = pt.submit_fn if cfg.defer else pt.time_fn

            def plain(salt):
                return call(
                    "join", nphj_join_count, relR.key, relR.payload,
                    relS.key, relS.payload, prm=prm, salt=salt,
                    with_checksum=cfg.checksum)

            def skewed(salt, cap_rows=0):
                return call(
                    "join", skew_fused_count, relR.key, relR.payload,
                    relS.key, relS.payload, salt,
                    with_checksum=cfg.checksum,
                    pipeline=VARIANT_PIPELINES_SKEW[variant],
                    resid_cap_rows=cap_rows,
                    r_dense=(not cfg.checksum
                             and _dense_proof(relR.key)))

            # stats-driven tier pick: detected probe-side skew goes
            # straight to the heavy-split tier — with the residual
            # COMPACTED to the sampled light mass, so PHT under skew is
            # FASTER than PHT at z=0 (the reference PHT's hot-key cache
            # advantage, data/skew.csv PHT z=1.5 = 1916 vs 625)
            hinted, cap_rows = skew_plan(relS.key)
            if hinted:
                tiers = ([(lambda s: skewed(s, cap_rows), RETRY_SALTS[0])]
                         if cap_rows else [])
                tiers += [(skewed, RETRY_SALTS[0]), (plain, RETRY_SALTS[0])]
            else:
                tiers = [(plain, RETRY_SALTS[0]), (skewed, RETRY_SALTS[0])]
            tiers += [(plain, s) for s in RETRY_SALTS[1:]]
            for i, (fn, salt) in enumerate(tiers):
                m, c, ovf = fn(salt)
                from aqp_tpu.relation import JoinResult

                if cfg.defer:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    return JoinResult(matches=m, checksum=c,
                                      overflow=ovf), pt.t
                if int(ovf) == 0:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    return JoinResult(matches=m, checksum=c), pt.t
                if i == 0 and hinted and cap_rows:
                    # sampled residual cap overflowed: demote the cached
                    # plan so later calls ride the full-capacity tier
                    from aqp_tpu.joins.skewtier import demote_resid

                    demote_resid(relS.key)
            if cfg.checksum:
                out = pt.time_fn(
                    "join", mergejoin.merge_join_count,
                    relR.key, relR.payload, relS.key, relS.payload)
            else:
                out = pt.time_fn(
                    "join", mergejoin.merge_join_count_keys,
                    relR.key, relS.key)
        pt.t.phases["total"] = time.perf_counter() - t0
        return to_join_result(out), pt.t
    tb = table_bits_for(relR.num_tuples, cfg.load_factor)
    tkey, tpay, _ = pt.time_fn("build", build_table, relR.key, relR.payload, tb)
    cap = result_capacity(relS, cfg) if cfg.materialize else 0
    out = pt.time_fn(
        "probe", _probe_and_finish, tkey, tpay, relS.key, relS.payload, tb, window, cap
    )
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("PHT")
def PHT(relR, relS, cfg):
    return _nopart(relR, relS, cfg, window=cfg.probe_window, variant="PHT")


@register("PHT_no")
def PHT_no(relR, relS, cfg):
    """No-overflow variant — larger table, lower per-bucket load
    (f1=48 routing geometry on the Pallas path)."""
    return _nopart(relR, relS, cfg.replace(load_factor=cfg.load_factor / 2),
                   window=4, variant="PHT_no")


@register("PHT_un")
def PHT_un(relR, relS, cfg):
    """'Unrolled' variant — wider probe window in one vector pass (the
    reference unrolls the build/probe loops by 10, :280-345)."""
    return _nopart(relR, relS, cfg, window=max(10, cfg.probe_window),
                   variant="PHT_un")


@register("PHT_o")
def PHT_o(relR, relS, cfg):
    """Overflow-chain variant — smaller table (load 1.0), longer probes."""
    return _nopart(relR, relS, cfg.replace(load_factor=min(1.0, cfg.load_factor * 2)),
                   window=max(16, cfg.probe_window), variant="PHT_o")


@register("NPO_st")
def NPO_st(relR, relS, cfg):
    return _nopart(relR, relS, cfg, window=cfg.probe_window,
                   variant="NPO_st")


@register("NPO_no")
def NPO_no(relR, relS, cfg):
    return _nopart(relR, relS, cfg.replace(load_factor=cfg.load_factor / 2),
                   window=4, variant="NPO_no")


# ---------------------------------------------------------------------------
# NPBC_st — true bucket-chaining mechanics


@functools.partial(jax.jit, static_argnames=("nb_bits",))
def npbc_build(r_key, r_payload, nb_bits: int):
    """Bucket-chaining build (no_partitioning_bucket_chaining_join.cpp:51-85):
    the reference threads a `next` array through a `bucket` head array; the
    TPU form GROUPS rows by bucket (one stable sort) and keeps the bucket
    array as span offsets — a chain IS the contiguous span, walk order
    preserved.  Returns (grouped keys, grouped payloads, bucket_offsets,
    longest_chain)."""
    nb = 1 << nb_bits
    b = fib_hash32(r_key, nb_bits)
    b_s, rk_s, rp_s = jax.lax.sort((b, r_key, r_payload), num_keys=1,
                                   is_stable=True)
    bounds = jnp.searchsorted(
        b_s, jnp.arange(nb + 1, dtype=b_s.dtype), side="left", method="sort"
    ).astype(jnp.int32)
    longest = jnp.max(bounds[1:] - bounds[:-1])
    return rk_s, rp_s, bounds, longest


@functools.partial(jax.jit, static_argnames=("nb_bits", "chain_cap"))
def npbc_probe_count(rk_s, rp_s, bounds, s_key, s_payload, nb_bits: int,
                     chain_cap: int):
    """Chain-walk probe (…:95-125): each S row walks its bucket's span,
    counting EVERY equal key — exact under duplicate R keys too (the
    chain holds them all), unlike the open-addressing engines."""
    sb = fib_hash32(s_key, nb_bits)
    start = bounds[sb]
    end = bounds[sb + 1]
    matches = jnp.zeros_like(s_key, dtype=jnp.int32)
    ck = jnp.zeros_like(s_key, dtype=jnp.uint32)
    for j in range(chain_cap):  # static bound = longest chain (caller)
        pos = start + j
        live = pos < end
        k = jnp.take(rk_s, jnp.minimum(pos, rk_s.shape[0] - 1))
        hit = live & (k == s_key)
        matches = matches + hit.astype(jnp.int32)
        ck = ck + jnp.where(
            hit,
            jnp.take(rp_s, jnp.minimum(pos, rp_s.shape[0] - 1)
                     ).astype(jnp.uint32) + s_payload.astype(jnp.uint32),
            jnp.uint32(0))
    return (jnp.sum(matches, dtype=jnp.int32), jnp.sum(ck, dtype=jnp.uint32))


@functools.partial(jax.jit, static_argnames=("nb_bits", "checksum"))
def _npbc_fused(rk, rp, sk, sp, nb_bits: int, checksum: bool):
    """Fused bucket-chaining count join: ONE program ordering the union
    bucket-major (hash bucket = the chain head array; the chain IS the
    bucket's contiguous span) and aggregating each chain walk with the
    duplicate-exact run-count scan — every equal-key R row in the chain is
    counted, exactly as the reference's walk
    (no_partitioning_bucket_chaining_join.cpp:95-125)."""
    key = jnp.concatenate([rk, sk])
    b = fib_hash32(key, nb_bits)
    skey = jnp.concatenate([rk << 1, (sk << 1) | 1])
    if checksum:
        pay = jnp.concatenate([rp, sp])
        _, pk2, spay = jax.lax.sort((b, skey, pay), num_keys=2)
    else:
        _, pk2 = jax.lax.sort((b, skey), num_keys=2)
        spay = jnp.zeros_like(pk2)
    out = mergejoin.count_general_scan(pk2, spay)
    if not checksum:
        out = mergejoin.JoinCounts(out.matches, jnp.uint32(0))
    return out


@register("NPBC_st")
def NPBC_st(relR, relS, cfg):
    """Bucket-chaining join: grouped-span chains + walk-the-chain probes
    (next/bucket array analog, no_partitioning_bucket_chaining_join.cpp).
    Distinct mechanics from the PHT/NPO open-addressing family: counts all
    duplicates in a chain, bucket count = next_pow2(|R|) as the reference
    sizes it.  Default serving path = the fused bucket-major program
    (_npbc_fused); cfg.profile_phases keeps the staged build/probe split."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    nb_bits = max(4, math.ceil(math.log2(max(2, relR.num_tuples))))
    if not cfg.profile_phases and not cfg.materialize \
            and relR.key.dtype == jnp.int32:
        out = pt.time_fn(
            "join", _npbc_fused, relR.key, relR.payload,
            relS.key, relS.payload, min(nb_bits, 24), cfg.checksum)
        pt.t.phases["total"] = time.perf_counter() - t0
        return to_join_result(out), pt.t
    rk_s, rp_s, bounds, longest = pt.time_fn(
        "build", npbc_build, relR.key, relR.payload, nb_bits)
    # static chain budget: the device-measured longest chain, pow2-rounded
    # for compile-cache stability (Poisson tail: ~8-16 at load 1)
    cap = 1 << max(1, math.ceil(math.log2(max(1, int(longest)))))
    if cfg.materialize:
        # chains are grouped spans; the windowed-join materializer in the
        # sort-merge core covers output emission — NPBC materialize routes
        # there (same fallback the reference takes for its chain output)
        out = pt.time_fn(
            "probe", mergejoin.merge_join_materialize,
            relR.key, relR.payload, relS.key, relS.payload,
            result_capacity(relS, cfg))
    else:
        m, c = pt.time_fn(
            "probe", npbc_probe_count, rk_s, rp_s, bounds,
            relS.key, relS.payload, nb_bits, cap)
        out = mergejoin.JoinCounts(m, c)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t
