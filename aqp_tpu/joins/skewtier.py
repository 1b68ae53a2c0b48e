"""Single-chip skew tier for the RHO fast path: heavy-hitter split.

The reference absorbs single-node skew with dynamic task-queue stealing of
oversized partitions (radix_join.cpp:1086-1335).  The fixed-slot Pallas
pipeline instead splits the problem structurally (the same philosophy as
the distributed skew engine, parallel/skew.py, applied on one chip):

  1. DETECT candidate heavy S keys from a strided sample (top-k run
     lengths of the sorted sample — cheap: |S|/64 rows).  Sampling can
     miss a heavy key only to have the residual pipeline OVERFLOW, which
     is reported and escalates to the exact XLA core — never silently
     wrong.
  2. COUNT heavy matches exactly with fused masked reductions: for each
     candidate key h, cnt_S(h), sum_S payload, R presence and R payload
     are single fused broadcast-reduces (no scatter, no sort).  Unique R
     keys make the per-key contribution closed-form:
         matches_h = present_R(h) * cnt_S(h)
         checksum_h = cnt_S(h) * r_payload(h) + sum_S_payload(h)  (mod 2^32)
  3. REMAP heavy S rows to the pipeline's designated pad key (dropped at
     K1) and run the fixed-slot pipeline on the residual; heavy R rows
     stay (unique — they match nothing once their S rows are gone).

Total = residual pipeline + closed-form heavy contributions, exact for
unique R keys (the engine's standing contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# top-k candidate capacity: a key can only overflow a fixed slot with
# ~>= 228k global copies (per-block share C/nb must exceed the ~455-elem
# slot margin); under Zipf the rank-k mass ~ k^-z, so fewer than ~25 keys
# can ever cross that bound at z <= 2 — 32 slots cover it with margin,
# and the per-candidate stats pass scales linearly in H.
H = 32
SAMPLE_STRIDE = 64
# a sampled run must repeat this often to be a candidate (global mass
# ~ stride * this; far below the slot-overflow threshold => conservative)
MIN_SAMPLE_RUN = 8
# the DISPATCH hint uses a much stricter bound: only keys within ~3.5x of
# the slot-overflow mass justify paying the heavy-split tier up front
# (mild skew like Zipf z=0.5 sails through the plain pipeline).
HINT_MIN_RUN = 1024


@functools.partial(jax.jit, static_argnames=("h", "stride"))
def heavy_candidates(s_key, h: int = H, stride: int = SAMPLE_STRIDE):
    """Up to h candidate heavy keys from a strided sample (ascending;
    slots without a qualifying run hold -1)."""
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
    out = jnp.where(cand_len >= MIN_SAMPLE_RUN, key_at, -1)
    return jnp.sort(out)


@functools.partial(jax.jit, static_argnames=())
def heavy_contrib(rk, rp, sk, sp, hk):
    """Exact closed-form contribution of the candidate keys, and the
    residual S keys (heavy rows remapped to the pipeline pad).

    Returns (matches, checksum, sk_residual)."""
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

    valid = hk >= 0  # (H,)

    def stats(key, pay, chunk=1 << 22):
        """Per-candidate (count, payload-sum mod 2^32) via fused
        broadcast-reduces, row-chunked so the (chunk, H) compare tile
        never materializes at full length."""
        n = key.shape[0]
        pad = (-n) % chunk
        if pad:
            key = jnp.concatenate([key, jnp.full((pad,), -1, key.dtype)])
            pay = jnp.concatenate([pay, jnp.zeros((pad,), pay.dtype)])
        kc = key.reshape(-1, chunk)
        pc = pay.reshape(-1, chunk)

        def body(carry, kp):
            c, s = carry
            k, p = kp
            eq = k[:, None] == hk[None, :]
            c = c + jnp.sum(eq.astype(jnp.int32), axis=0)
            s = s + jnp.sum(jnp.where(eq, p[:, None].astype(jnp.uint32), 0),
                            axis=0, dtype=jnp.uint32)
            return (c, s), None

        (cnt, psum), _ = jax.lax.scan(
            body, (jnp.zeros((hk.shape[0],), jnp.int32),
                   jnp.zeros((hk.shape[0],), jnp.uint32)), (kc, pc))
        return cnt, psum

    cnt, sps = stats(sk, sp)
    rcnt, rph = stats(rk, rp)
    pres = rcnt > 0
    use = valid & pres
    matches = jnp.sum(jnp.where(use, cnt, 0), dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(use, cnt.astype(jnp.uint32) * rph + sps, jnp.uint32(0)),
        dtype=jnp.uint32)
    # residual: drop S rows of every VALID candidate (whether or not the
    # key exists in R — a missing key matches nothing either way)
    pos = jnp.clip(jnp.searchsorted(hk, sk), 0, hk.shape[0] - 1)
    is_heavy = (hk[pos] == sk) & (sk >= 0)
    sk_res = jnp.where(is_heavy, PAD_S_INPUT, sk)
    return matches, checksum, sk_res


def rho_skew_split_count(rk, rp, sk, sp, salt):
    """Heavy-split count join: returns (matches, checksum, overflow).
    overflow > 0 (residual still overflows a slot) => caller escalates to
    the exact XLA core."""
    from aqp_tpu.ops.pallas.rho3 import rho_join_count_v3

    hk = heavy_candidates(sk)
    mh, ch, sk_res = heavy_contrib(rk, rp, sk, sp, hk)
    m, c, ovf = rho_join_count_v3(rk, rp, sk_res, sp, salt=salt)
    return m + mh, c + ch, ovf


# ---------------------------------------------------------------------------
# Round-4 serving path: ONE fused program + cached relation statistics
# (VERDICT r3 item 4: the staged ladder paid one wasted pipeline run plus
# 4-5 dispatch round-trips per skewed join — 81 M rows/s at z=1.5).


@functools.partial(jax.jit, static_argnames=("with_checksum", "pipeline"))
def skew_fused_count(rk, rp, sk, sp, salt, with_checksum: bool = True,
                     pipeline=None):
    """Fully fused heavy-split count join: candidate detection, exact
    closed-form heavy contribution, residual remap, and the fixed-slot
    residual pipeline as ONE jitted program (single dispatch).

    `pipeline(rk, rp, sk, sp, salt, with_checksum) -> (m, c, ovf)` is the
    residual engine — the RHO pipeline by default; the no-partition
    family passes its own build/probe pipeline so PHT keeps its identity
    under skew (the reference's PHT gets FASTER under skew via cache
    hits; the heavy-split closed form is the TPU analog of that hot-key
    shortcut).

    Keys-only mode (with_checksum=False) skips every payload reduction —
    the heavy statistics reduce to counts and the residual pipeline moves
    no payload lanes (reference count branch, radix_join.cpp:428-447)."""
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT, rho_join_count_v3

    hk = heavy_candidates(sk)
    valid = hk >= 0

    try:
        use_pallas_stats = jax.devices()[0].platform != "cpu"
    except Exception:
        use_pallas_stats = False
    if use_pallas_stats:
        # one streaming pass: stats + heavy remap (see heavy_stats_pallas)
        cnt, sps, sk_res = heavy_stats_pallas(
            sk, sp, hk, with_pay=with_checksum, remap=True)
        rcnt, rph, _ = heavy_stats_pallas(
            rk, rp, hk, with_pay=with_checksum, remap=False)
    else:
        def stats(key, pay, chunk=1 << 22):
            n = key.shape[0]
            pad = (-n) % chunk
            if pad:
                key = jnp.concatenate(
                    [key, jnp.full((pad,), -1, key.dtype)])
                if with_checksum:
                    pay = jnp.concatenate(
                        [pay, jnp.zeros((pad,), pay.dtype)])
            kc = key.reshape(-1, chunk)
            pc = pay.reshape(-1, chunk) if with_checksum else kc

            def body(carry, kp):
                c, s = carry
                k, p = kp
                eq = k[:, None] == hk[None, :]
                c = c + jnp.sum(eq.astype(jnp.int32), axis=0)
                if with_checksum:
                    s = s + jnp.sum(
                        jnp.where(eq, p[:, None].astype(jnp.uint32), 0),
                        axis=0, dtype=jnp.uint32)
                return (c, s), None

            (cnt, psum), _ = jax.lax.scan(
                body, (jnp.zeros((hk.shape[0],), jnp.int32),
                       jnp.zeros((hk.shape[0],), jnp.uint32)), (kc, pc))
            return cnt, psum

        cnt, sps = stats(sk, sp)
        rcnt, rph = stats(rk, rp)
        pos = jnp.clip(jnp.searchsorted(hk, sk), 0, hk.shape[0] - 1)
        is_heavy = (hk[pos] == sk) & (sk >= 0)
        sk_res = jnp.where(is_heavy, PAD_S_INPUT, sk)
    use = valid & (rcnt > 0)
    mh = jnp.sum(jnp.where(use, cnt, 0), dtype=jnp.int32)
    if with_checksum:
        ch = jnp.sum(
            jnp.where(use, cnt.astype(jnp.uint32) * rph + sps,
                      jnp.uint32(0)),
            dtype=jnp.uint32)
    else:
        ch = jnp.uint32(0)
    if pipeline is None:
        m, c, ovf = rho_join_count_v3(rk, rp, sk_res, sp, salt=salt,
                                      with_checksum=with_checksum)
    else:
        m, c, ovf = pipeline(rk, rp, sk_res, sp, salt, with_checksum)
    return m + mh, c + ch, ovf


def rho_skew_fused_count(rk, rp, sk, sp, salt, with_checksum: bool = True):
    return skew_fused_count(rk, rp, sk, sp, salt,
                            with_checksum=with_checksum)


# ---------------------------------------------------------------------------
# Streaming heavy-stats kernel: ONE pass over a relation computing, per
# candidate key, the exact (count, payload sum) AND the heavy-remapped key
# column (heavy rows -> the pipeline's input pad).  The XLA broadcast-scan
# formulation of the same statistics measured ~0.9 s at headline scale
# (bad fusion of the (chunk, H) compare tile); this kernel is one
# bandwidth-bound sweep + H scalar-broadcast compares per block.


def _make_heavy_kernel(h: int, with_pay: bool, remap: bool, sub: int):
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

    def kernel(hk_ref, *refs):
        if with_pay:
            k_ref, p_ref = refs[:2]
            rest = refs[2:]
        else:
            k_ref = refs[0]
            rest = refs[1:]
        if remap:
            ok_ref, cnt_ref = rest[:2]
            ps_ref = rest[2] if with_pay else None
        else:
            cnt_ref = rest[0]
            ps_ref = rest[1] if with_pay else None

        @pl.when(pl.program_id(0) == 0)
        def _():
            cnt_ref[:] = jnp.zeros((h, 128), jnp.int32)
            if ps_ref is not None:
                ps_ref[:] = jnp.zeros((h, 128), jnp.int32)

        k = k_ref[:]
        p = p_ref[:] if with_pay else None
        heavy = jnp.zeros(k.shape, jnp.bool_)
        # per-candidate LANE-WISE partials (sublane reduce only): a full
        # cross-lane reduce per (block, candidate) measured ~0.65 s at
        # headline scale; the (h, 128) accumulator block keeps every
        # reduction in the cheap axis, the caller sums 128 lanes once
        for c in range(h):
            hv = hk_ref[c]
            eq = (k == hv) & (hv >= 0)
            heavy = heavy | eq
            cnt_ref[c, :] += jnp.sum(eq.astype(jnp.int32), axis=0)
            if ps_ref is not None:
                ps_ref[c, :] += jnp.sum(jnp.where(eq, p, 0), axis=0,
                                        dtype=jnp.int32)
        if remap:
            ok_ref[:] = jnp.where(heavy, jnp.int32(PAD_S_INPUT), k)

    return kernel


@functools.partial(jax.jit, static_argnames=("with_pay", "remap",
                                             "interpret"))
def heavy_stats_pallas(key, pay, hk, with_pay: bool = True,
                       remap: bool = True, interpret: bool = False):
    """Per-candidate (count, payload-sum) + heavy-remapped keys in one
    streaming pass.  Returns (counts[h], psums[h] uint32, remapped|None)."""
    h = hk.shape[0]
    sub = 1024
    lanes = 128
    n = key.shape[0]
    block = sub * lanes
    padn = (-n) % block
    if padn:
        key = jnp.concatenate([key, jnp.full((padn,), -7, jnp.int32)])
        if with_pay:
            pay = jnp.concatenate([pay, jnp.zeros((padn,), jnp.int32)])
    nb = key.shape[0] // block
    ins = [key.reshape(-1, lanes)]
    if with_pay:
        ins.append(pay.reshape(-1, lanes))
    narr = len(ins)
    out_specs = []
    out_shape = []
    if remap:
        out_specs.append(pl.BlockSpec((sub, lanes), lambda i, s: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nb * sub, lanes), jnp.int32))
    # (h, 128) lane-partial accumulators (constant index map: the block
    # stays resident across grid steps)
    out_specs.append(pl.BlockSpec((h, lanes), lambda i, s: (0, 0)))
    out_shape.append(jax.ShapeDtypeStruct((h, lanes), jnp.int32))
    if with_pay:
        out_specs.append(pl.BlockSpec((h, lanes), lambda i, s: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((h, lanes), jnp.int32))
    outs = pl.pallas_call(
        _make_heavy_kernel(h, with_pay, remap, sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((sub, lanes), lambda i, s: (i, 0))
                      ] * narr,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(hk, *ins)
    i = 0
    remapped = None
    if remap:
        remapped = outs[0].reshape(-1)[:n]
        i = 1
    counts = jnp.sum(outs[i], axis=1, dtype=jnp.int32)
    psums = (jnp.sum(outs[i + 1].astype(jnp.uint32), axis=1,
                     dtype=jnp.uint32) if with_pay
             else jnp.zeros((h,), jnp.uint32))
    return counts, psums, remapped


_HINT_CACHE: dict = {}


@jax.jit
def _max_sample_run(s_key):
    sample = jnp.sort(s_key[::SAMPLE_STRIDE])
    n = sample.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sample[1:] != sample[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(start, idx, -1))
    return jnp.max(idx - run_start + 1)


def skew_hint(s_key) -> bool:
    """Cheap cached skew statistic for a probe relation: does a strided
    sample contain a qualifying heavy run?  The analog of base-table
    statistics in a database engine — computed once per relation (cached
    by array identity), so the dispatcher can pick the heavy-split tier
    FIRST instead of burning a full pipeline run to discover skew."""
    key = id(s_key)
    hit = _HINT_CACHE.get(key)
    if hit is not None and hit[0] is s_key:
        return hit[1]
    flag = bool(int(_max_sample_run(s_key)) >= HINT_MIN_RUN)
    # strong refs keep the cached relations alive; keep the cache tiny
    if len(_HINT_CACHE) >= 8:
        _HINT_CACHE.clear()
    _HINT_CACHE[key] = (s_key, flag)
    return flag


@jax.jit
def heavy_materialize(rk, rp, sk, sp, hk):
    """Materialized heavy rows, emitted IN PLACE (unique R keys make the
    heavy join a per-row map: every heavy S row with a present key joins
    its single R row).  Returns region-chunked columns of length |S| with
    sentinel holes (key -3) at non-heavy/non-present rows, plus the
    residual S keys and (matches, checksum) of the heavy part."""
    from aqp_tpu.ops.pallas.rho3 import PAD_S_INPUT

    valid = hk >= 0
    # unique-R payload lookup per candidate (same fused reduce as
    # heavy_contrib's stats, R side only)
    eq_r = rk[:, None] == hk[None, :]
    pres = (jnp.sum(eq_r.astype(jnp.int32), axis=0) > 0) & valid
    rph = jnp.sum(jnp.where(eq_r, rp[:, None], 0), axis=0)
    pos = jnp.clip(jnp.searchsorted(hk, sk), 0, hk.shape[0] - 1)
    is_heavy = (hk[pos] == sk) & (sk >= 0)
    hit = is_heavy & pres[pos]
    out_k = jnp.where(hit, sk, -3)
    out_rp = jnp.where(hit, rph[pos], 0)
    out_sp = jnp.where(hit, sp, 0)
    matches = jnp.sum(hit, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(hit, out_rp.astype(jnp.uint32) + sp.astype(jnp.uint32),
                  jnp.uint32(0)), dtype=jnp.uint32)
    sk_res = jnp.where(is_heavy, PAD_S_INPUT, sk)
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
