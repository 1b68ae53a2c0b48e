"""Sort-merge join engines: PSM and MWAY.

Reference: parallel_sortmerge_join.cpp:76-118 (PSM: parallel 3-way quicksort
of both inputs + scalar merge-join) and sortmergejoin_multiway.cpp:90-537
(MWAY: radix partition → per-chunk sort → multi-way merge through
cache-resident FIFOs → merge-join).

Two distinct TPU designs:

  PSM   one global `lax.sort` per side (XLA's sort is itself a parallel
        merge hierarchy — the direct analog of PSM's parallel quicksort),
        then the data-parallel propagation merge-join.
  MWAY  explicit run/merge structure like the reference: the tagged R∪S
        union is cut into PARTFANOUT cache-sized runs, each run sorted
        independently (vectorized 2D sort = the reference's sorting phase,
        sortmergejoin_multiway.cpp:340-406), then a log2(PARTFANOUT)-round
        binary merge tree of vectorized bitonic pair-merges (the FIFO
        multiway merge's TPU shape, scalar_multiwaymerge.cpp), then the
        propagation merge-join.  Phase profile: sort / merge / join —
        genuinely different from PSM's single-sort stream.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops import mergejoin
from aqp_tpu.relation import Relation, JoinResult
from aqp_tpu.utils.timing import PhaseTimer

# The reference's PARTFANOUT (mway/params.h:16-24): number of independent
# sorted runs produced by the sorting phase.
PARTFANOUT = 128

# Pad key sorts after every real packed key (real keys < 2^30 => packed
# < 2^31-1) and is tagged S with an impossible key — inert in the join.
_PAD_PACKED = 2**31 - 1


def _bitonic_clean_rows(k, p):
    """Sort each row of (m, n) given every row is a bitonic sequence.

    log2(n) compare-exchange stages, each a reshape + min/max + payload
    select — the vectorized form of a bitonic merge network."""
    m, n = k.shape
    s = n // 2
    while s >= 1:
        kv = k.reshape(m, n // (2 * s), 2, s)
        pv = p.reshape(m, n // (2 * s), 2, s)
        ak, bk = kv[:, :, 0, :], kv[:, :, 1, :]
        ap, bp = pv[:, :, 0, :], pv[:, :, 1, :]
        take = bk < ak  # ascending
        lo_k = jnp.where(take, bk, ak)
        hi_k = jnp.where(take, ak, bk)
        lo_p = jnp.where(take, bp, ap)
        hi_p = jnp.where(take, ap, bp)
        k = jnp.stack([lo_k, hi_k], axis=2).reshape(m, n)
        p = jnp.stack([lo_p, hi_p], axis=2).reshape(m, n)
        s //= 2
    return k, p


def _merge_pair_rows(ak, ap, bk, bp):
    """Merge-path pair merge: each row of a and b is sorted; produce the
    sorted 2w-wide merge via rank computation (searchsorted) + scatter —
    the parallel 'merge path' algorithm, O(n) data movement per level.

    Replaces the bitonic clean for LARGE widths: a bitonic merge of width
    2^26 unrolls 26 compare-exchange stages into the program (the full tree
    is ~160 stages at headline scale, which crashes the TPU compiler);
    merge path is 4 ops per level regardless of width.  Stability/dups:
    a-elements rank side='left' into b, b-elements side='right' into a —
    ties interleave without collisions (standard merge-path tie-break)."""
    m, w = ak.shape
    ia = jax.vmap(lambda a, b: jnp.searchsorted(
        b, a, side="left", method="sort"))(ak, bk)
    ib = jax.vmap(lambda b, a: jnp.searchsorted(
        a, b, side="right", method="sort"))(bk, ak)
    base = jnp.arange(w, dtype=ia.dtype)
    da = base[None, :] + ia
    db = base[None, :] + ib
    rows = jnp.arange(m, dtype=ia.dtype)[:, None]
    out_k = jnp.zeros((m, 2 * w), ak.dtype)
    out_p = jnp.zeros((m, 2 * w), ap.dtype)
    out_k = out_k.at[rows, da].set(ak, unique_indices=True)
    out_k = out_k.at[rows, db].set(bk, unique_indices=True)
    out_p = out_p.at[rows, da].set(ap, unique_indices=True)
    out_p = out_p.at[rows, db].set(bp, unique_indices=True)
    return out_k, out_p


# above this many total elements the unrolled bitonic tree's program size
# is compiler-hostile; the merge tree switches to merge-path levels
_BITONIC_MAX_ELEMS = 1 << 22


@jax.jit
def _mway_join(rk, rp, sk, sp):
    """MWAY core: run-sort + binary merge tree + propagation join."""
    nr, ns = rk.shape[0], sk.shape[0]
    skey = jnp.concatenate([rk << 1, (sk << 1) | 1])
    pay = jnp.concatenate([rp, sp])
    n = skey.shape[0]
    run = max(8, -(-n // PARTFANOUT))
    run = 1 << (run - 1).bit_length()  # pow2: bitonic merge precondition
    pad = PARTFANOUT * run - n
    if pad:
        # pad sorts LAST in the packed-key dtype (int64 under key64: an
        # int32 max pad would land mid-range and corrupt the merge)
        pad_val = jnp.asarray(jnp.iinfo(skey.dtype).max, skey.dtype)
        skey = jnp.concatenate([skey, jnp.full((pad,), pad_val, skey.dtype)])
        pay = jnp.concatenate([pay, jnp.zeros((pad,), pay.dtype)])

    # sorting phase: PARTFANOUT independent cache-sized runs
    kv = skey.reshape(PARTFANOUT, run)
    pv = pay.reshape(PARTFANOUT, run)
    kv, pv = jax.lax.sort((kv, pv), num_keys=1)  # sorts along last axis

    # multiway merge: log2(PARTFANOUT) binary rounds of pair-merges —
    # bitonic networks while the program stays small, merge-path levels
    # beyond (see _merge_pair_rows)
    use_bitonic = skey.shape[0] <= _BITONIC_MAX_ELEMS
    runs = PARTFANOUT
    width = run
    while runs > 1:
        a_k, b_k = kv[0::2], kv[1::2]
        a_p, b_p = pv[0::2], pv[1::2]
        if use_bitonic:
            kv = jnp.concatenate([a_k, b_k[:, ::-1]], axis=1)
            pv = jnp.concatenate([a_p, b_p[:, ::-1]], axis=1)
            kv, pv = _bitonic_clean_rows(kv, pv)
        else:
            kv, pv = _merge_pair_rows(a_k, a_p, b_k, b_p)
        runs //= 2
        width *= 2

    pk = kv.reshape(-1)
    spay = pv.reshape(-1)
    # propagation merge-join (merge_join phase of the reference,
    # joincommon.h:82-100)
    is_r = (pk & 1) == 0
    sk2 = pk >> 1
    _, prop_key, prop_pay = mergejoin._last_valid_scan(
        is_r, jnp.where(is_r, sk2, -1), jnp.where(is_r, spay, -1)
    )
    match = (~is_r) & (prop_key == sk2) & (pk != jnp.iinfo(pk.dtype).max)
    matches = jnp.sum(match, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(match, prop_pay.astype(jnp.uint32)
                  + spay.astype(jnp.uint32), 0),
        dtype=jnp.uint32,
    )
    return mergejoin.JoinCounts(matches, checksum), (sk2, spay, match, prop_pay)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _mway_materialize(rk, rp, sk, sp, capacity: int):
    _, (key, spay, match, prop_pay) = _mway_join(rk, rp, sk, sp)
    return mergejoin.compact_matches(match, key, prop_pay, spay,
                                     capacity=capacity)


def _mway_pallas_available(relR, relS, cfg) -> bool:
    if not cfg.use_pallas or cfg.key64 or cfg.profile_phases:
        return False
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:
        return False
    return relR.key.dtype == jnp.int32 and relS.key.dtype == jnp.int32


@functools.partial(jax.jit, static_argnames=("with_checksum",))
def _mway_range_count(rk, rp, sk, sp, with_checksum: bool):
    """MWAY on the fixed-slot network in RANGE-ROUTED configuration: the
    sorting phase (K1 block sorts) + the multiway merge (K2/K3 merge
    networks over MONOTONE key-range buckets — regions in bucket order ARE
    the globally key-sorted union, the FIFO multiway merge's output,
    scalar_multiwaymerge.cpp) + the final merge-join (propagation over the
    sorted union, joincommon.h:82-100).  salt=1 keeps sigma = key; scale
    maps the OBSERVED key domain onto the bucket range (the reference
    MWAY's NUMA-local range splits).  Value-skewed domains overflow a
    range bucket and are REPORTED -> caller falls back to the exact core
    (the reference's skew-handling consts, joincommon.h:25-29)."""
    from aqp_tpu.ops.pallas.rho3 import Rho3Params, rho_join_count_v3

    prm = Rho3Params()
    gmax = prm.f1 * prm.f2
    kmax = jnp.maximum(jnp.max(rk), jnp.max(sk)).astype(jnp.float32)
    scale = jnp.float32(gmax) / (kmax + 1.0) * (1.0 - 1e-6)
    return rho_join_count_v3(rk, rp, sk, sp, salt=1,
                             with_checksum=with_checksum, scale=scale)


@jax.jit
def _mway_range_materialize(rk, rp, sk, sp):
    from aqp_tpu.ops.pallas.rho3 import Rho3Params, rho_join_materialize_v3

    prm = Rho3Params()
    gmax = prm.f1 * prm.f2
    kmax = jnp.maximum(jnp.max(rk), jnp.max(sk)).astype(jnp.float32)
    scale = jnp.float32(gmax) / (kmax + 1.0) * (1.0 - 1e-6)
    return rho_join_materialize_v3(rk, rp, sk, sp, salt=1, scale=scale)


@register("MWAY")
def MWAY(relR: Relation, relS: Relation, cfg: JoinConfig):
    """m-way sort-merge join (sortmergejoin_multiway.cpp:90-537).

    TPU serving path: the range-routed fixed-slot pipeline
    (_mway_range_count) — run-sort, multiway merge to GLOBAL key order,
    merge-join; overflow (value skew) falls back to the exact XLA core.
    CPU / profile_phases: the explicit run-sort + binary merge tree
    (_mway_join)."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    if _mway_pallas_available(relR, relS, cfg):
        if cfg.materialize:
            m, c, ok, orp, osp, ovf = pt.time_fn(
                "merge", _mway_range_materialize,
                relR.key, relR.payload, relS.key, relS.payload)
            if int(ovf) == 0:
                pt.t.phases["total"] = time.perf_counter() - t0
                return JoinResult(matches=m, checksum=c, key=ok,
                                  r_payload=orp, s_payload=osp), pt.t
            out = pt.time_fn(
                "merge", mergejoin.merge_join_materialize,
                relR.key, relR.payload, relS.key, relS.payload,
                result_capacity(relS, cfg))
        else:
            m, c, ovf = pt.time_fn(
                "merge", _mway_range_count,
                relR.key, relR.payload, relS.key, relS.payload,
                cfg.checksum)
            if int(ovf) == 0:
                pt.t.phases["total"] = time.perf_counter() - t0
                return JoinResult(matches=m, checksum=c), pt.t
            if cfg.checksum:
                out = pt.time_fn(
                    "merge", mergejoin.merge_join_count,
                    relR.key, relR.payload, relS.key, relS.payload)
            else:
                out = pt.time_fn(
                    "merge", mergejoin.merge_join_count_keys,
                    relR.key, relS.key)
        pt.t.phases["total"] = time.perf_counter() - t0
        return to_join_result(out), pt.t
    if cfg.materialize:
        out = pt.time_fn(
            "merge", _mway_materialize,
            relR.key, relR.payload, relS.key, relS.payload,
            capacity=result_capacity(relS, cfg))
    else:
        out, _ = pt.time_fn(
            "merge", _mway_join,
            relR.key, relR.payload, relS.key, relS.payload)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


# module-level jit: a fresh jax.jit(lambda) per call would RECOMPILE the
# sort on every invocation (jit caches by function identity) — measured as
# 47.8 s/rep of pure compile in the round-3 overview run
_sort_pair = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))


def _sortmerge(relR: Relation, relS: Relation, cfg: JoinConfig):
    pt = PhaseTimer()
    t0 = time.perf_counter()
    if not cfg.profile_phases:
        # Fused serving path: ONE jitted program — the union sort IS the
        # parallel sort phase (XLA's sort is a parallel merge hierarchy,
        # the direct analog of PSM's parallel quicksort+merge,
        # parallel_sortmerge_join.cpp:86-100) and the propagation scan is
        # the merge-join phase.
        if cfg.materialize:
            out = pt.time_fn(
                "merge", mergejoin.merge_join_materialize,
                relR.key, relR.payload, relS.key, relS.payload,
                result_capacity(relS, cfg))
        elif cfg.checksum:
            out = pt.time_fn(
                "merge", mergejoin.merge_join_count,
                relR.key, relR.payload, relS.key, relS.payload)
        else:
            out = pt.time_fn(
                "merge", mergejoin.merge_join_count_keys,
                relR.key, relS.key)
        pt.t.phases["total"] = time.perf_counter() - t0
        return to_join_result(out), pt.t
    # Staged path: pre-sort both inputs (PSM sorts R and S in place,
    # parallel_sortmerge_join.cpp:86-100).  The union sort in the merge core
    # re-merges them; pre-sorted inputs make that a cheap merge inside XLA.
    rk, rp = pt.time_fn("sort", _sort_pair, relR.key, relR.payload)
    sk, sp = pt.time_fn("sort", _sort_pair, relS.key, relS.payload)
    if cfg.materialize:
        out = pt.time_fn(
            "merge",
            lambda: mergejoin.merge_join_materialize(
                rk, rp, sk, sp, result_capacity(relS, cfg)
            ),
        )
    else:
        out = pt.time_fn("merge", lambda: mergejoin.merge_join_count(rk, rp, sk, sp))
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("PSM")
def PSM(relR, relS, cfg):
    return _sortmerge(relR, relS, cfg)