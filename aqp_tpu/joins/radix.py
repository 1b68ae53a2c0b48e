"""Radix-partitioned join engines: RHO, RHT, RSM.

Reference: radix_join.cpp — RHO (join_init_run + prj_thread + bucket_chaining
_join, :1369-1638/:359-458), RHT (histogram_join :476-612), RSM
(radix_sortmerge_join.cpp:82-137).  The reference's frame: 1–2 pass parallel
radix partition (per-thread histograms → global prefix sums → scatter with
software write-combining), then per-partition build/probe tasks from a
work-stealing queue.

TPU designs — three genuinely distinct instruction streams:

  RHO  count path on TPU runs the Tier-2 fused Pallas pipeline
       (ops/pallas/rho3.py): fixed-slot two-level radix partition on the
       bitonic slot network + region propagate-join, with automatic
       overflow/salt-retry fallback to the exact XLA core.  Honors
       cfg.use_pallas; CPU and materialize runs use the XLA radix frame.
  RHT  histogram join: radix passes, then per-partition *counting*
       structure — R reordered by key (the reference's count→prefix→
       reorder, radix_join.cpp:476-612), probe = vectorized binary search
       returning the key's R run [lo, hi): multiplicity hi-lo, payload sum
       via prefix-sum difference.  Exact for duplicate R keys.
  RSM  per-partition sort-merge: both sides sorted (bucket bits are key
       bits, so one sort finishes all partition-local orders at once) and
       merge-joined by forward propagation (radix_sortmerge_join.cpp:82-137).
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops import mergejoin
from aqp_tpu.ops.hashing import radix_bits
from aqp_tpu.relation import Relation, JoinResult
from aqp_tpu.utils.timing import PhaseTimer


def plan_radix(num_r: int, cfg: JoinConfig):
    """(total_bits, passes): partitions sized to cfg.partition_rows
    (analog of L2/CACHE_DIVISOR sizing, radix_join.cpp:295-329)."""
    if cfg.radix_bits is not None:
        bits = cfg.radix_bits
    else:
        bits = max(1, math.ceil(math.log2(max(2, num_r / cfg.partition_rows))))
    if cfg.passes is not None:
        passes = cfg.passes
    else:
        passes = 1 if bits <= 12 else 2
    return bits, passes


def _partition_pass(key, payload, shift: int, bits: int):
    """One radix-partition pass: stable reorder by bucket + histogram.

    Returns (key, payload, histogram).  The reference's equivalent is
    parallel_radix_partition (radix_join.cpp:851-931): histogram, prefix sum,
    scatter.  Here the reorder is a stable sort on the bucket id — measured
    faster than scatter on this hardware — and the histogram is a by-product
    (partition boundaries = cumsum of histogram).
    """
    bucket = radix_bits(key, shift, bits)
    b, k, p = jax.lax.sort((bucket, key, payload), num_keys=1, is_stable=True)
    hist = jnp.zeros((1 << bits,), jnp.int32).at[b].add(1, mode="drop")
    return k, p, hist


_partition_pass_jit = jax.jit(_partition_pass, static_argnames=("shift", "bits"))


def _partition_phases(relR, relS, cfg, pt):
    """Shared 1–2 pass radix partition front end; returns reordered cols."""
    bits, passes = plan_radix(relR.num_tuples, cfg)
    per_pass = -(-bits // passes)
    rk, rp = relR.key, relR.payload
    sk, sp = relS.key, relS.payload
    shift = 0
    for pno in range(passes):
        b = min(per_pass, bits - pno * per_pass)
        phase = "partition_pass1" if pno == 0 else "partition_pass2"
        rk, rp, _ = pt.time_fn(phase, _partition_pass_jit, rk, rp, shift, b)
        sk, sp, _ = pt.time_fn(phase, _partition_pass_jit, sk, sp, shift, b)
        shift += b
    pt.t.phases["partition"] = pt.t.phases.get(
        "partition_pass1", 0.0) + pt.t.phases.get("partition_pass2", 0.0)
    return rk, rp, sk, sp


# ---------------------------------------------------------------------------
# RHO — Tier-2 Pallas fused pipeline with XLA fallback


def _rho_pallas_available(relR: Relation, relS: Relation, cfg) -> bool:
    if not cfg.use_pallas or cfg.key64:
        return False
    try:
        if jax.devices()[0].platform == "cpu":
            return False
    except Exception:
        return False
    from aqp_tpu.ops.pallas.rho3 import MAX_KEY

    # key-domain precondition of the packed-key network (rho3.py MAX_KEY);
    # generator/TPC-H keys always satisfy it, arbitrary inputs may not.
    return bool(
        (relR.key.dtype == jnp.int32)
        and (relS.key.dtype == jnp.int32)
    )


@register("RHO")
def RHO(relR: Relation, relS: Relation, cfg: JoinConfig):
    """Parallel radix join, optimized — the paper's champion
    (radix_join.cpp:1640-1643).  Both count AND materialize paths run the
    fused Pallas pipeline on TPU (the reference likewise serves every
    caller with one RHO, joins.cpp:33-78; tpch.cpp:68), with skew-tier /
    salt-retry → exact-XLA fallback on overflow."""
    from aqp_tpu.joins.dense import dense_pk_join, dense_pk_applicable

    if dense_pk_applicable(relR, relS, cfg):
        out = dense_pk_join(relR, relS, cfg)
        if out is not None:
            return out
    if _rho_pallas_available(relR, relS, cfg):
        from aqp_tpu.ops.pallas.rho3 import (
            RETRY_SALTS,
            rho_join_count_v3,
            rho_join_materialize_v3,
        )

        from aqp_tpu.joins.skewtier import (
            rho_skew_fused_count, rho_skew_split_materialize, skew_plan)

        pt = PhaseTimer()
        t0 = time.perf_counter()
        # escalation ladder: plain pipeline (salt 0) → heavy-split tier
        # (slot overflow is almost always duplicate-key mass, which no
        # re-salt can spread — same key, same bucket under any bijection)
        # → remaining salts (the rare hash-clustering/pad-alias case) →
        # exact XLA core.  Each tier's result is used only when its own
        # overflow counter is zero: never silently wrong.  The cached
        # sampled statistic (skew_plan) orders the tiers so the expected
        # case is ONE pipeline run — and under heavy skew selects the
        # compacted-residual tier, which gets FASTER as skew grows (the
        # SPMD answer to the reference's task-queue stealing +
        # hot-key cache effect, data/skew.csv).
        hinted, cap_rows = skew_plan(relS.key)

        call = pt.submit_fn if cfg.defer else pt.time_fn

        def attempt(fn, salt):
            return call("join", fn, relR.key, relR.payload,
                        relS.key, relS.payload, salt=salt)

        if cfg.materialize:
            tiers = [(rho_join_materialize_v3, RETRY_SALTS[0]),
                     (rho_skew_split_materialize, RETRY_SALTS[0])] + [
                (rho_join_materialize_v3, s) for s in RETRY_SALTS[1:]]
            if hinted:
                tiers = [tiers[1], tiers[0]] + tiers[2:]
            for fn, salt in tiers:
                m, c, ok, orp, osp, ovf = attempt(fn, salt)
                res = JoinResult(matches=m, checksum=c, key=ok,
                                 r_payload=orp, s_payload=osp,
                                 overflow=ovf)
                if cfg.defer:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    return res, pt.t
                if int(ovf) == 0:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    # region-chunked output: holes keyed -3 (chunked-table
                    # analog; see JoinResult docstring)
                    res.overflow = None
                    return res, pt.t
        else:
            def count_v3(rk, rp, sk, sp, salt):
                return rho_join_count_v3(rk, rp, sk, sp, salt=salt,
                                         with_checksum=cfg.checksum)

            def _r_dense():
                from aqp_tpu.joins.dense import _dense_proof

                return not cfg.checksum and _dense_proof(relR.key)

            def skew_v3(rk, rp, sk, sp, salt):
                return rho_skew_fused_count(rk, rp, sk, sp, salt,
                                            with_checksum=cfg.checksum,
                                            r_dense=_r_dense())

            def skew_resid(rk, rp, sk, sp, salt):
                return rho_skew_fused_count(rk, rp, sk, sp, salt,
                                            with_checksum=cfg.checksum,
                                            resid_cap_rows=cap_rows,
                                            r_dense=_r_dense())

            if hinted:
                tiers = ([(skew_resid, RETRY_SALTS[0])] if cap_rows else [])
                tiers += [(skew_v3, RETRY_SALTS[0]),
                          (count_v3, RETRY_SALTS[0])]
            else:
                tiers = [(count_v3, RETRY_SALTS[0]),
                         (skew_v3, RETRY_SALTS[0])]
            tiers += [(count_v3, s) for s in RETRY_SALTS[1:]]
            for fn, salt in tiers:
                m, c, ovf = attempt(fn, salt)
                if cfg.defer:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    return JoinResult(matches=m, checksum=c,
                                      overflow=ovf), pt.t
                if int(ovf) == 0:
                    pt.t.phases["total"] = time.perf_counter() - t0
                    return JoinResult(matches=m, checksum=c), pt.t
                if fn is skew_resid:
                    # the sampled cap will fail identically next call:
                    # demote the cached plan to the full-capacity tier
                    from aqp_tpu.joins.skewtier import demote_resid

                    demote_resid(relS.key)
        # adversarial skew beyond every tier: exact XLA core
        if cfg.materialize:
            out = pt.time_fn(
                "join", mergejoin.merge_join_materialize,
                relR.key, relR.payload, relS.key, relS.payload,
                result_capacity(relS, cfg))
        else:
            out = pt.time_fn(
                "join", mergejoin.merge_join_count,
                relR.key, relR.payload, relS.key, relS.payload)
        pt.t.phases["total"] = time.perf_counter() - t0
        return to_join_result(out), pt.t
    if not cfg.profile_phases:
        return _radix_fused(relR, relS, cfg, general=False)
    return _rho_xla(relR, relS, cfg)


def _rho_xla(relR, relS, cfg):
    """XLA radix frame (partition passes + partition-local union-sort
    join) — the exact fallback and the CPU/materialize path."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    rk, rp, sk, sp = _partition_phases(relR, relS, cfg, pt)
    if cfg.materialize:
        out = pt.time_fn(
            "join", mergejoin.merge_join_materialize,
            rk, rp, sk, sp, result_capacity(relS, cfg))
    else:
        out = pt.time_fn("join", mergejoin.merge_join_count, rk, rp, sk, sp)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("RHO_seq")
def RHO_seq(relR, relS, cfg):
    """RHO with FORCE_2_PHASES semantics (two partition passes), XLA frame.
    Fused serving path = one program in radix-rotated order (the two-pass
    layout is a refinement of the same bucket-major order)."""
    if not cfg.profile_phases:
        return _radix_fused(relR, relS, cfg, general=False)
    return _rho_xla(relR, relS, cfg.replace(passes=2))


# ---------------------------------------------------------------------------
# Fused radix-order serving paths (one jitted program per run — the analog
# of the reference serving each algorithm through one `run_join` call at
# native speed, joins.cpp:33-78; the staged paths above remain for
# cfg.profile_phases per-phase attribution).
#
# The radix frame appears as ORDER, not as separate passes: the fused sort
# key is the radix-rotated key rot(k) = (k mod 2^bits) * 2^(30-bits) +
# (k div 2^bits) — a bijection on [0, 2^30) that makes the radix bucket the
# major sort criterion, exactly the layout the staged partition passes
# produce.  Equality is preserved under the bijection, so the union-sort
# join core runs unchanged on rotated keys.


def _rot(key, bits: int):
    """Radix-rotate an int32 key (radix bucket becomes the major bits).

    Bijection on [0, 2^30); NEGATIVE keys (the chunked-output hole
    sentinel -3, relation.py) map to themselves so a hole can never alias
    a real rotated key — holes stay inert in downstream joins."""
    mask = (1 << bits) - 1
    r = ((key & mask) << (30 - bits)) | (key >> bits)
    return jnp.where(key < 0, key, r)


def _rot_inv(key, bits: int):
    return _rot(key, 30 - bits)


def _supports_rot(relR: Relation) -> bool:
    return relR.key.dtype == jnp.int32


@functools.partial(jax.jit, static_argnames=("bits", "checksum", "general"))
def _radix_fused_count(rk, rp, sk, sp, bits: int, checksum: bool,
                       general: bool):
    rr, sr = _rot(rk, bits), _rot(sk, bits)
    if general:
        if checksum:
            return mergejoin.merge_join_count_general(rr, rp, sr, sp)
        return mergejoin.merge_join_count_general_keys(rr, sr)
    if checksum:
        return mergejoin.merge_join_count(rr, rp, sr, sp)
    return mergejoin.merge_join_count_keys(rr, sr)


@functools.partial(jax.jit, static_argnames=("bits", "capacity"))
def _radix_fused_materialize(rk, rp, sk, sp, bits: int, capacity: int):
    rr, sr = _rot(rk, bits), _rot(sk, bits)
    out = mergejoin.merge_join_materialize(rr, rp, sr, sp, capacity)
    key = jnp.where(out.key >= 0, _rot_inv(out.key, bits), out.key)
    return out._replace(key=key)


def _radix_fused(relR, relS, cfg, general: bool, label="join"):
    """Shared fused serving path for the radix family (RSM/RHT/RHO_seq XLA).
    `general=True` uses the duplicate-exact run-count core (histogram join
    semantics, radix_join.cpp:476-612); False the unique-R propagate core."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    bits, _ = plan_radix(relR.num_tuples, cfg)
    bits = min(bits, 24)
    if not _supports_rot(relR):
        return _radix_staged(relR, relS, cfg, general)
    if cfg.materialize:
        out = pt.time_fn(
            label, _radix_fused_materialize, relR.key, relR.payload,
            relS.key, relS.payload, bits, result_capacity(relS, cfg))
    else:
        out = pt.time_fn(
            label, _radix_fused_count, relR.key, relR.payload,
            relS.key, relS.payload, bits, cfg.checksum, general)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


def _radix_staged(relR, relS, cfg, general: bool):
    """Staged phase-attributed path (partition passes visible to the
    timer) — cfg.profile_phases and the key64/non-int32 route."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    rk, rp, sk, sp = _partition_phases(relR, relS, cfg, pt)
    if cfg.materialize:
        out = pt.time_fn(
            "join", mergejoin.merge_join_materialize,
            rk, rp, sk, sp, result_capacity(relS, cfg))
    elif general:
        out = pt.time_fn(
            "join", mergejoin.merge_join_count_general, rk, rp, sk, sp)
    else:
        out = pt.time_fn("join", mergejoin.merge_join_count, rk, rp, sk, sp)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


# ---------------------------------------------------------------------------
# RHT — histogram (counting) join


@jax.jit
def _rht_build(rk, rp):
    """Reorder R by key + exclusive payload prefix (the count→prefix→
    reorder structure of histogram_join, radix_join.cpp:476-612)."""
    k, p = jax.lax.sort((rk, rp), num_keys=1)
    ppref = jnp.cumsum(p.astype(jnp.uint32), dtype=jnp.uint32)
    ppref = jnp.concatenate([jnp.zeros((1,), jnp.uint32), ppref])
    return k, p, ppref


@jax.jit
def _rht_probe(rk_sorted, ppref, sk, sp):
    """Range-scan probe: each S key's R run is [lo, hi); multiplicity and
    payload sum come from the prefix structure — exact under duplicate R
    keys (the histogram join's range scan, radix_join.cpp:560-612)."""
    lo = jnp.searchsorted(rk_sorted, sk, side="left", method="sort")
    hi = jnp.searchsorted(rk_sorted, sk, side="right", method="sort")
    mult = (hi - lo).astype(jnp.int32)
    rp_sum = ppref[hi] - ppref[lo]
    matches = jnp.sum(mult, dtype=jnp.int32)
    checksum = jnp.sum(
        rp_sum + mult.astype(jnp.uint32) * sp.astype(jnp.uint32),
        dtype=jnp.uint32,
    )
    return mergejoin.JoinCounts(matches, checksum)


@jax.jit
def _rht_probe_materialize_gather(rk_sorted, rp_sorted, sk, sp):
    """Unique-R materialize probe: gather the single matching R row."""
    lo = jnp.clip(jnp.searchsorted(rk_sorted, sk, method="sort"), 0,
                  rk_sorted.shape[0] - 1)
    hit = rk_sorted[lo] == sk
    return hit, jnp.where(hit, rp_sorted[lo], 0)


@register("RHT")
def RHT(relR: Relation, relS: Relation, cfg: JoinConfig):
    """Radix + per-partition histogram join (radix_join.cpp:1645-1648).

    Fused serving path: radix-rotated order + the duplicate-exact run-count
    core — count→prefix→range-scan as data-parallel prefix sums (the
    histogram join's counting structure), one jitted program.
    cfg.profile_phases runs the staged partition/build/probe path below."""
    if not cfg.profile_phases:
        return _radix_fused(relR, relS, cfg, general=True)
    pt = PhaseTimer()
    t0 = time.perf_counter()
    rk, rp, sk, sp = _partition_phases(relR, relS, cfg, pt)
    rks, rps, ppref = pt.time_fn("build", _rht_build, rk, rp)
    if cfg.materialize:
        hit, rpay = pt.time_fn(
            "probe", _rht_probe_materialize_gather, rks, rps, sk, sp)
        out = pt.time_fn(
            "materialize", mergejoin.compact_matches,
            hit, sk, rpay, sp, capacity=result_capacity(relS, cfg))
    else:
        out = pt.time_fn("probe", _rht_probe, rks, ppref, sk, sp)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


# ---------------------------------------------------------------------------
# RSM — radix + per-partition sort-merge


@register("RSM")
def RSM(relR, relS, cfg):
    """Radix + per-partition sort-merge (radix_sortmerge_join.cpp:82-137).

    Fused serving path: one jitted program sorting in radix-rotated order
    (radix bucket = major bits — partition-local sorted runs, exactly the
    staged layout) + propagation merge.  cfg.profile_phases keeps the
    staged partition/merge split."""
    if not cfg.profile_phases:
        return _radix_fused(relR, relS, cfg, general=False, label="merge")
    pt = PhaseTimer()
    t0 = time.perf_counter()
    rk, rp, sk, sp = _partition_phases(relR, relS, cfg, pt)
    if cfg.materialize:
        out = pt.time_fn(
            "merge", mergejoin.merge_join_materialize,
            rk, rp, sk, sp, result_capacity(relS, cfg))
    else:
        out = pt.time_fn("merge", mergejoin.merge_join_count, rk, rp, sk, sp)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t