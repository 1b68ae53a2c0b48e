"""Single-chip skew tier for the Pallas fast paths: heavy-hitter split.

The reference absorbs single-node skew with dynamic task-queue stealing of
oversized partitions (radix_join.cpp:1086-1335), and its no-partition join
gets FASTER under skew because hot keys stay cache-resident
(HashLinkTableCommon.cpp:110-140; data/skew.csv PHT z=1.5 = 1916 vs 625
M rows/s at z=0).  The fixed-slot pipelines instead split the problem
structurally — the TPU analog of the hot-key cache hit is a CLOSED FORM:

  1. DETECT candidate heavy S keys from a strided sample (top-k run
     lengths of the sorted sample — cheap: |S|/64 rows).  Sampling can
     miss a heavy key only to have the residual pipeline OVERFLOW, which
     is reported and escalates — never silently wrong.
  2. R-SIDE STATS: per candidate, (presence, payload) over R — unique R
     keys make the per-key contribution closed-form:
         matches_h  = present_R(h) * cnt_S(h)
         checksum_h = cnt_S(h) * r_payload(h) + sum_S_payload(h) (mod 2^32)
  3. SPLIT PASS over S (the round-5 redesign): ONE fused elementwise pass
     computing, per row, `heavy` (any candidate) for the remap and
     `heavy_present` (candidate present in R) for the count — H unrolled
     scalar-broadcast compares, NO per-candidate reductions over S (the
     round-4 per-(block,candidate) stats kernel cost ~0.65 s at headline
     scale; this pass is bandwidth-bound).  Heavy S rows remap to the
     pipeline's designated pad key (dropped at K1).
  4. RESIDUAL: run the fixed-slot pipeline on the remapped S — optionally
     COMPACTED to a smaller static capacity chosen by the sampled heavy
     mass (skew_plan), so high skew makes the join FASTER, not slower:
     at Zipf z=1.5 the top candidates carry ~87% of S, leaving a
     ~1/8-size residual.

Total = residual pipeline + closed-form heavy contributions, exact for
unique R keys (the engine's standing contract).
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# H=64: the residual pipeline's per-key overflow threshold is set by K2's
# fine-slot slack times the window count (see SKEW_PRM below); at Zipf
# z in [1, 2] the keys above that threshold are ranks <= ~45, so 64
# candidates cover every serving configuration with margin (r5 probe:
# H=32 left tail ranks 33+ overflowing the default geometry).
H = 64
SAMPLE_STRIDE = 128
# a sampled run must repeat this often to be a candidate (global mass
# ~ stride * this; far below the slot-overflow threshold => conservative)
MIN_SAMPLE_RUN = 8
# the DISPATCH hint uses a much stricter bound: only keys within ~3.5x of
# the slot-overflow mass justify paying the heavy-split tier up front
# (mild skew like Zipf z=0.5 sails through the plain pipeline).
HINT_MIN_RUN = 512


@functools.partial(jax.jit, static_argnames=("h", "stride"))
def heavy_candidates(s_key, h: int = H, stride: int = SAMPLE_STRIDE):
    """Up to h candidate heavy keys from a strided sample (ascending;
    slots without a qualifying run hold -1).  Only keys in the pipeline's
    real-key domain [0, MAX_KEY) qualify: negatives (chunked-table holes)
    and input pads are dropped by pack_keys anyway."""
    from aqp_tpu.ops.pallas.rho3 import MAX_KEY

    sample = jnp.sort(s_key[::stride])
    n = sample.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sample[1:] != sample[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(start, idx, -1))
    length_at_end = jnp.where(end, idx - run_start + 1, 0)
    cand_len, cand_pos = jax.lax.top_k(length_at_end, h)
    key_at = sample[cand_pos]
    qual = (cand_len >= MIN_SAMPLE_RUN) & (key_at >= 0) & (key_at < MAX_KEY)
    out = jnp.where(qual, key_at, -1)
    return jnp.sort(out)


# ---------------------------------------------------------------------------
# R-side candidate statistics.
#
# Default implementation is pure XLA with UNROLLED scalar-broadcast
# compares — one fused pass over R, no (n, H) compare tile (the round-3
# broadcast-scan formulation materialized that tile and cost ~0.9 s).
# A Pallas/MXU variant (ones-matmul sublane reduction) is kept for
# chip-side comparison (notes/r5 probes).


@functools.partial(jax.jit, static_argnames=("with_pay",))
def r_cand_stats(rk, rp, hk, with_pay: bool = True):
    """Per-candidate (count, payload-sum mod 2^32) over R: 2H fused global
    reductions, each a scalar-broadcast compare — XLA fuses the chain into
    one bandwidth-bound pass over R."""
    cnts = []
    pays = []
    for c in range(hk.shape[0]):
        hv = hk[c]
        eq = (rk == hv) & (hv >= 0)
        cnts.append(jnp.sum(eq, dtype=jnp.int32))
        if with_pay:
            pays.append(jnp.sum(jnp.where(eq, rp, 0), dtype=jnp.int32))
    cnt = jnp.stack(cnts)
    pay = (jnp.stack(pays).astype(jnp.uint32) if with_pay
           else jnp.zeros_like(cnt, dtype=jnp.uint32))
    return cnt, pay


def _make_rstats_kernel(h: int, with_pay: bool, sub: int, mxu: bool):
    def kernel(hk_ref, *refs):
        if with_pay:
            k_ref, p_ref, cnt_ref, ps_ref = refs
        else:
            (k_ref, cnt_ref), p_ref, ps_ref = refs[:2], None, None

        @pl.when(pl.program_id(0) == 0)
        def _():
            cnt_ref[:] = jnp.zeros((h, 128), jnp.int32)
            if ps_ref is not None:
                ps_ref[:] = jnp.zeros((h, 128), jnp.int32)

        k = k_ref[:]
        p = p_ref[:] if with_pay else None
        if mxu:
            # sublane reduction on the MXU: ones(8,sub) @ eq(sub,128) int8
            ones = jnp.ones((8, sub), jnp.int8)
            if with_pay:
                planes = [((p >> (8 * i)) & 0xFF).astype(jnp.int8)
                          for i in range(4)]
            crows = []
            prows = []
            for c in range(h):
                hv = hk_ref[c]
                eq = ((k == hv) & (hv >= 0))
                eq8 = eq.astype(jnp.int8)
                y = jax.lax.dot_general(
                    ones, eq8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                crows.append(y[0:1, :])
                if with_pay:
                    # unique R keys: at most one matching element per
                    # candidate, so per-plane int8 sums recombine exactly
                    ys = [jax.lax.dot_general(
                        ones, jnp.where(eq, pl_, 0).astype(jnp.int8),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)[0:1, :]
                        for pl_ in planes]
                    prows.append((ys[0] & 0xFF) | ((ys[1] & 0xFF) << 8)
                                 | ((ys[2] & 0xFF) << 16) | (ys[3] << 24))
            cnt_ref[:] += jnp.concatenate(crows, axis=0)
            if with_pay:
                ps_ref[:] += jnp.concatenate(prows, axis=0)
        else:
            for c in range(h):
                hv = hk_ref[c]
                eq = (k == hv) & (hv >= 0)
                cnt_ref[c, :] += jnp.sum(eq.astype(jnp.int32), axis=0)
                if with_pay:
                    ps_ref[c, :] += jnp.sum(jnp.where(eq, p, 0), axis=0,
                                            dtype=jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("with_pay", "mxu", "interpret"))
def r_cand_stats_pallas(rk, rp, hk, with_pay: bool = True, mxu: bool = True,
                        interpret: bool = False):
    """Pallas variant of r_cand_stats: one streaming pass, per-candidate
    lane partials in a resident (H, 128) accumulator; `mxu=True` reduces
    sublanes with int8 ones-matmuls instead of vector reductions."""
    h = hk.shape[0]
    sub, lanes = 1024, 128
    n = rk.shape[0]
    block = sub * lanes
    padn = (-n) % block
    if padn:
        rk = jnp.concatenate([rk, jnp.full((padn,), -7, jnp.int32)])
        if with_pay:
            rp = jnp.concatenate([rp, jnp.zeros((padn,), jnp.int32)])
    nb = rk.shape[0] // block
    ins = [rk.reshape(-1, lanes)]
    if with_pay:
        ins.append(rp.reshape(-1, lanes))
    acc_spec = pl.BlockSpec((h, lanes), lambda i, s: (0, 0))
    acc_shape = jax.ShapeDtypeStruct((h, lanes), jnp.int32)
    nout = 2 if with_pay else 1
    outs = pl.pallas_call(
        _make_rstats_kernel(h, with_pay, sub, mxu),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((sub, lanes), lambda i, s: (i, 0))
                      ] * len(ins),
            out_specs=[acc_spec] * nout,
        ),
        out_shape=[acc_shape] * nout,
        interpret=interpret,
    )(hk, *ins)
    cnt = jnp.sum(outs[0], axis=1, dtype=jnp.int32)
    pay = (jnp.sum(outs[1].astype(jnp.uint32), axis=1, dtype=jnp.uint32)
           if with_pay else jnp.zeros((h,), jnp.uint32))
    return cnt, pay


# ---------------------------------------------------------------------------
# S-side split pass: remap + heavy count/checksum, NO per-candidate
# reductions.  XLA formulation (fuses into one bandwidth-bound pass).


@functools.partial(jax.jit, static_argnames=("with_pay",))
def heavy_split_pass(sk, sp, hk, pres, rph, with_pay: bool = True):
    """One fused pass over S.  pres[c] (bool) = candidate c present in R;
    rph[c] = its unique R payload.  Returns (mh, ch, sk_res):
      mh = #rows whose key is a PRESENT candidate (= heavy matches),
      ch = sum over those rows of (rph[key] + s_payload) mod 2^32,
      sk_res = keys with EVERY candidate's rows remapped to the input pad.
    """
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

    heavy = jnp.zeros(sk.shape, bool)
    hp = jnp.zeros(sk.shape, bool)
    rpof = jnp.zeros(sk.shape, jnp.int32) if with_pay else None
    for c in range(hk.shape[0]):
        hv = hk[c]
        eq = sk == hv  # hv = -1 slots can't equal candidate-domain keys
        heavy = heavy | eq
        pq = eq & pres[c]
        hp = hp | pq
        if with_pay:
            rpof = rpof + jnp.where(pq, rph[c].astype(jnp.int32), 0)
    mh = jnp.sum(hp, dtype=jnp.int32)
    if with_pay:
        ch = jnp.sum(
            jnp.where(hp, rpof.astype(jnp.uint32) + sp.astype(jnp.uint32),
                      jnp.uint32(0)), dtype=jnp.uint32)
    else:
        ch = jnp.uint32(0)
    sk_res = jnp.where(heavy, jnp.int32(PAD_S_INPUT), sk)
    return mh, ch, sk_res


# ---------------------------------------------------------------------------
# Fused serving paths.


# Residual-pipeline geometry: kd_slot_rows=128 doubles K2's fine-slot
# slack, raising the per-key overflow threshold to ~margin*nbg (the Zipf
# TAIL left after removing H candidates must fit the slots; the default
# kd=64 margin was ~910/window and rank-33+ tail keys overflowed it —
# notes/r5_probe1.log skew section).
def _skew_prm():
    from aqp_tpu.ops.pallas.rho3 import Rho3Params

    return Rho3Params(kd_slot_rows=128)


@functools.partial(jax.jit, static_argnames=("with_checksum", "pipeline",
                                             "resid_cap_rows", "r_dense"))
def skew_fused_count(rk, rp, sk, sp, salt, with_checksum: bool = True,
                     pipeline=None, resid_cap_rows: int = 0,
                     r_dense: bool = False):
    """Fully fused heavy-split count join: candidate detection, R-side
    stats, the S split pass, and the fixed-slot residual pipeline as ONE
    jitted program (single dispatch).

    `pipeline(rk, rp, sk, sp, salt, with_checksum) -> (m, c, ovf)` is the
    residual engine — the RHO pipeline by default; the no-partition
    family passes its own build/probe pipeline so PHT keeps its identity
    under skew.

    `resid_cap_rows > 0` COMPACTS the remapped S to that static row
    capacity (128 elems/row) before the residual pipeline — the skew
    ADVANTAGE mode: high skew leaves a small residual, so the join gets
    faster as z grows (the reference PHT's hot-key cache effect,
    data/skew.csv).  Compaction overflow (heavy mass shrank below the
    sampled plan) is reported through the overflow channel — callers
    escalate to the uncompacted tier, never a silent wrong answer."""
    from aqp_tpu.ops.pallas.rho3 import Rho3Params, rho_join_count_v3

    hk = heavy_candidates(sk)
    if r_dense and not with_checksum:
        # dense-PK build side (proof cached by the dispatcher,
        # joins/dense._dense_proof): presence is closed-form — no R pass
        nr = jnp.int32(rk.shape[0])
        pres = (hk >= 1) & (hk <= nr)
        rph = jnp.zeros_like(hk).astype(jnp.uint32)
    else:
        rcnt, rph = r_cand_stats(rk, rp, hk, with_pay=with_checksum)
        pres = (hk >= 0) & (rcnt > 0)
    mh, ch, sk_res = heavy_split_pass(sk, sp, hk, pres, rph,
                                      with_pay=with_checksum)
    ovf_extra = jnp.int32(0)
    if resid_cap_rows > 0:
        from aqp_tpu.ops.pallas.lanecompact import (
            compact_k_fast, compact_kp_fast)
        from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

        # selectivity-scaled compaction windows: the plan's capacity IS
        # the keep-rate estimate (overshoot reported, caller escalates)
        kf = min(1.0, resid_cap_rows * 128 / max(1, sk.shape[0]))
        if with_checksum:
            sk_res, sp, covf = compact_kp_fast(
                sk_res, sp, resid_cap_rows, pad_key=PAD_S_INPUT,
                keep_frac=kf)
        else:
            sk_res, covf = compact_k_fast(
                sk_res, resid_cap_rows, pad_key=PAD_S_INPUT, keep_frac=kf)
            sp = jnp.zeros_like(sk_res)
        ovf_extra = covf
    if pipeline is None:
        m, c, ovf = rho_join_count_v3(rk, rp, sk_res, sp, salt=salt,
                                      with_checksum=with_checksum,
                                      prm=_skew_prm())
    else:
        m, c, ovf = pipeline(rk, rp, sk_res, sp, salt, with_checksum)
    return m + mh, c + ch, ovf + ovf_extra


def rho_skew_fused_count(rk, rp, sk, sp, salt, with_checksum: bool = True,
                         resid_cap_rows: int = 0, r_dense: bool = False):
    return skew_fused_count(rk, rp, sk, sp, salt,
                            with_checksum=with_checksum,
                            resid_cap_rows=resid_cap_rows,
                            r_dense=r_dense)


# legacy closed-form helper (tests / distributed skew engine)
@jax.jit
def heavy_contrib(rk, rp, sk, sp, hk):
    """Exact closed-form contribution of the candidate keys, and the
    residual S keys (heavy rows remapped to the pipeline pad).
    Returns (matches, checksum, sk_residual)."""
    rcnt, rph = r_cand_stats(rk, rp, hk, with_pay=True)
    pres = (hk >= 0) & (rcnt > 0)
    return heavy_split_pass(sk, sp, hk, pres, rph, with_pay=True)


def rho_skew_split_count(rk, rp, sk, sp, salt):
    """Heavy-split count join: returns (matches, checksum, overflow)."""
    from aqp_tpu.ops.pallas.rho3 import rho_join_count_v3

    hk = heavy_candidates(sk)
    mh, ch, sk_res = heavy_contrib(rk, rp, sk, sp, hk)
    m, c, ovf = rho_join_count_v3(rk, rp, sk_res, sp, salt=salt)
    return m + mh, c + ch, ovf


# ---------------------------------------------------------------------------
# Sampled skew statistics cache (base-table statistics analog): computed
# once per probe relation (weakref'd by array identity — never pins HBM).

_HINT_CACHE: dict = {}


@jax.jit
def _sample_stats(s_key):
    """(max_run, qualifying_mass, n_sample) from the strided sample:
    max_run drives the dispatch hint; qualifying_mass / n_sample estimates
    the total heavy fraction (top-H runs >= MIN_SAMPLE_RUN)."""
    sample = jnp.sort(s_key[::SAMPLE_STRIDE])
    n = sample.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sample[1:] != sample[:-1]])
    end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(start, idx, -1))
    length_at_end = jnp.where(end, idx - run_start + 1, 0)
    top, _ = jax.lax.top_k(length_at_end, H)
    mass = jnp.sum(jnp.where(top >= MIN_SAMPLE_RUN, top, 0),
                   dtype=jnp.int32)
    return jnp.max(length_at_end), mass, jnp.int32(n)


# residual-capacity ladder (fractions of |S|): few static variants keep
# the compile cache small while tracking the sampled heavy mass
_TIER_FRACS = (0.125, 0.1875, 0.25, 0.375, 0.5, 0.75)


def skew_plan(s_key):
    """(is_skewed, resid_cap_rows): cached sampled skew statistics.

    resid_cap_rows > 0 selects the compacted-residual tier: the smallest
    ladder fraction covering the sampled light mass with ~15% + sampling
    margin; 0 means run the full-capacity skew tier (mild skew — the
    compaction wouldn't pay for itself below ~25% heavy mass)."""
    key = id(s_key)
    hit = _HINT_CACHE.get(key)
    if hit is not None and hit[0]() is s_key:
        return hit[1]
    mx, mass, n = jax.device_get(_sample_stats(s_key))
    hinted = bool(mx >= HINT_MIN_RUN)
    cap_rows = 0
    if hinted:
        light = 1.0 - float(mass) / float(n)
        need = min(1.0, light * 1.15 + 0.02)
        for f in _TIER_FRACS:
            if f >= need:
                # whole output rows (128 elems) for the lane compactor
                cap_rows = -(-int(s_key.shape[0] * f) // 128)
                break
    plan = (hinted, cap_rows)
    if len(_HINT_CACHE) >= 32:  # id-reuse tombstones only; entries tiny
        _HINT_CACHE.clear()
    try:
        _HINT_CACHE[key] = (weakref.ref(s_key), plan)
    except TypeError:  # non-weakrefable array type: skip caching
        pass
    return plan


def demote_resid(s_key) -> None:
    """Record that the sampled residual cap overflowed for this probe
    relation: rewrite the cached plan to cap_rows=0 so every later
    dispatch rides the full-capacity skew tier directly instead of
    re-discovering the overflow (the deferred pipeline otherwise pays a
    failed resid attempt + synchronous escalation PER CALL)."""
    key = id(s_key)
    hit = _HINT_CACHE.get(key)
    if hit is not None and hit[0]() is s_key:
        _HINT_CACHE[key] = (hit[0], (hit[1][0], 0))


def skew_hint(s_key) -> bool:
    """Does a strided sample contain a qualifying heavy run?  (Cached —
    the dispatcher picks the heavy-split tier FIRST instead of burning a
    full pipeline run to discover skew.)"""
    return skew_plan(s_key)[0]


# ---------------------------------------------------------------------------
# Materializing skew path.


@jax.jit
def heavy_materialize(rk, rp, sk, sp, hk):
    """Materialized heavy rows, emitted IN PLACE (unique R keys make the
    heavy join a per-row map: every heavy S row with a present key joins
    its single R row).  Returns region-chunked columns of length |S| with
    sentinel holes (key -3) at non-heavy/non-present rows, plus the
    residual S keys and (matches, checksum) of the heavy part."""
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

    rcnt, rph = r_cand_stats(rk, rp, hk, with_pay=True)
    pres = (hk >= 0) & (rcnt > 0)
    heavy = jnp.zeros(sk.shape, bool)
    hit = jnp.zeros(sk.shape, bool)
    rpof = jnp.zeros(sk.shape, jnp.int32)
    for c in range(hk.shape[0]):
        eq = sk == hk[c]
        heavy = heavy | eq
        pq = eq & pres[c]
        hit = hit | pq
        rpof = rpof + jnp.where(pq, rph[c].astype(jnp.int32), 0)
    out_k = jnp.where(hit, sk, -3)
    out_rp = jnp.where(hit, rpof, 0)
    out_sp = jnp.where(hit, sp, 0)
    matches = jnp.sum(hit, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(hit, out_rp.astype(jnp.uint32) + sp.astype(jnp.uint32),
                  jnp.uint32(0)), dtype=jnp.uint32)
    sk_res = jnp.where(heavy, jnp.int32(PAD_S_INPUT), sk)
    return matches, checksum, out_k, out_rp, out_sp, sk_res


@jax.jit
def rho_skew_split_materialize(rk, rp, sk, sp, salt):
    """Heavy-split materializing join.  Output = residual pipeline's
    region-chunked columns concatenated with the in-place heavy columns
    (both carry sentinel holes -3 — the chunked-table contract).  Returns
    (matches, checksum, key, r_payload, s_payload, overflow)."""
    from aqp_tpu.ops.pallas.rho3 import rho_join_materialize_v3

    hk = heavy_candidates(sk)
    mh, ch, hk_col, hrp, hsp, sk_res = heavy_materialize(rk, rp, sk, sp, hk)
    m, c, ok, orp, osp, ovf = rho_join_materialize_v3(rk, rp, sk_res, sp,
                                                      salt=salt)
    return (m + mh, c + ch,
            jnp.concatenate([ok, hk_col]),
            jnp.concatenate([orp, hrp]),
            jnp.concatenate([osp, hsp]), ovf)
