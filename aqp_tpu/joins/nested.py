"""Nested-loop and index-nested-loop joins (NL, INL equivalents).

Reference: nested_loop_join.cpp:54-100 (NL: partitioned outer loop, each
thread scans all of S per R chunk) and :160-217 (INL: stx::btree on S,
per-R-row range lookup).

TPU design: NL is a *blocked all-pairs compare* — R tiles × S tiles on the
VPU, the honest dense analog of the O(|R|·|S|) scan (only sensible for small
inputs, as in the reference where NL/INL are baselines).  INL's btree is
replaced by the TPU-native ordered index: a sorted key array; lookups are
vectorized binary search (searchsorted).
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
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer

# module-level jit: a per-call jax.jit(lambda) recompiles every invocation
_sort_pair = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))

_NL_TILE = 2048


@jax.jit
def _nl_count(r_key, r_payload, s_key, s_payload):
    """Blocked all-pairs equality: Σ_tiles (R_tile[:,None] == S_tile[None,:]).

    Unique-R not required — full multiplicity counted.
    """
    nr, ns = r_key.shape[0], s_key.shape[0]
    pr = (-nr) % _NL_TILE
    ps = (-ns) % _NL_TILE
    rk = jnp.concatenate([r_key, jnp.full((pr,), -1, r_key.dtype)]).reshape(-1, _NL_TILE)
    rp = jnp.concatenate([r_payload, jnp.zeros((pr,), r_payload.dtype)]).reshape(-1, _NL_TILE)
    sk = jnp.concatenate([s_key, jnp.full((ps,), -2, s_key.dtype)]).reshape(-1, _NL_TILE)
    sp = jnp.concatenate([s_payload, jnp.zeros((ps,), s_payload.dtype)]).reshape(-1, _NL_TILE)

    def s_tile(carry, si):
        skt, spt = si

        def r_tile(c, ri):
            rkt, rpt = ri
            eq = rkt[:, None] == skt[None, :]
            m = jnp.sum(eq, dtype=jnp.int32)
            ck = jnp.sum(
                jnp.where(
                    eq,
                    rpt[:, None].astype(jnp.uint32) + spt[None, :].astype(jnp.uint32),
                    0,
                ),
                dtype=jnp.uint32,
            )
            return (c[0] + m, c[1] + ck), None

        c, _ = jax.lax.scan(r_tile, carry, (rk, rp))
        return c, None

    (m, ck), _ = jax.lax.scan(s_tile, (jnp.int32(0), jnp.uint32(0)), (sk, sp))
    return mergejoin.JoinCounts(m, ck)


@jax.jit
def _nl_probe_all_pairs(r_key, r_payload, s_key):
    """Per-S-row (multiplicity, R-payload sum) via the blocked all-pairs
    scan — the materialize-side companion of _nl_count (the reference's NL
    accumulates output rows in its inner loop, nested_loop_join.cpp:54-100).
    Unique-R gives multiplicity <= 1, so rpay_sum IS the matched payload."""
    nr = r_key.shape[0]
    pr = (-nr) % _NL_TILE
    rk = jnp.concatenate(
        [r_key, jnp.full((pr,), -1, r_key.dtype)]).reshape(-1, _NL_TILE)
    rp = jnp.concatenate(
        [r_payload, jnp.zeros((pr,), r_payload.dtype)]).reshape(-1, _NL_TILE)

    def r_tile(carry, ri):
        rkt, rpt = ri
        eq = s_key[:, None] == rkt[None, :]
        mult = carry[0] + jnp.sum(eq, axis=1, dtype=jnp.int32)
        rsum = carry[1] + jnp.sum(
            jnp.where(eq, rpt[None, :], 0), axis=1, dtype=jnp.int32)
        return (mult, rsum), None

    (mult, rsum), _ = jax.lax.scan(
        r_tile,
        (jnp.zeros_like(s_key, jnp.int32), jnp.zeros_like(s_key, jnp.int32)),
        (rk, rp))
    return mult, rsum


@register("NL")
def NL(relR: Relation, relS: Relation, cfg: JoinConfig):
    pt = PhaseTimer()
    t0 = time.perf_counter()
    if cfg.materialize:
        mult, rsum = pt.time_fn(
            "join", _nl_probe_all_pairs, relR.key, relR.payload, relS.key)
        out = pt.time_fn(
            "materialize", mergejoin.compact_matches,
            mult > 0, relS.key, rsum, relS.payload,
            capacity=result_capacity(relS, cfg))
    else:
        out = pt.time_fn(
            "join", _nl_count,
            relR.key, relR.payload, relS.key, relS.payload)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@jax.jit
def _inl_probe(sorted_rk, sorted_rp, s_key, s_payload):
    # method='sort' rides lax.sort (~300 M rows/s on this chip) instead of
    # log2(|R|) serial gather rounds — the probe IS the bottleneck at scale
    pos = jnp.searchsorted(sorted_rk, s_key, method="sort")
    pos = jnp.clip(pos, 0, sorted_rk.shape[0] - 1)
    hit = sorted_rk[pos] == s_key
    rpay = jnp.where(hit, sorted_rp[pos], 0)
    matches = jnp.sum(hit, dtype=jnp.int32)
    checksum = jnp.sum(
        jnp.where(hit, rpay.astype(jnp.uint32) + s_payload.astype(jnp.uint32), 0),
        dtype=jnp.uint32,
    )
    return mergejoin.JoinCounts(matches, checksum)


@jax.jit
def _inl_probe_materialize(sorted_rk, sorted_rp, s_key):
    """Per-S-row hit mask + matched R payload (the materialize-side probe —
    the reference INL emits output rows in its probe loop,
    nested_loop_join.cpp:160-217)."""
    pos = jnp.searchsorted(sorted_rk, s_key, method="sort")
    pos = jnp.clip(pos, 0, sorted_rk.shape[0] - 1)
    hit = sorted_rk[pos] == s_key
    return hit, jnp.where(hit, sorted_rp[pos], 0)


@register("INL")
def INL(relR: Relation, relS: Relation, cfg: JoinConfig):
    """Index NL: ordered index = sorted array (btree analog), vectorized
    binary-search probes.  Unique build keys (as the reference's PK btree).

    Serving path: the index build (one sort of R — the btree-construction
    analog, nested_loop_join.cpp:160-175) stays a separate phase because
    the index is a persistent artifact; the probe is ONE fused program.  A
    batch of ordered-index lookups is served by merging the sorted probe
    batch against the index (probe-batch sort + propagation) — the batched
    form of the reference's per-row btree descent.  cfg.profile_phases
    uses the explicit binary-search probe instead."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    rk, rp = pt.time_fn("build", _sort_pair, relR.key, relR.payload)
    if cfg.materialize:
        if cfg.profile_phases:
            hit, rpay = pt.time_fn(
                "probe", _inl_probe_materialize, rk, rp, relS.key)
            out = pt.time_fn(
                "materialize", mergejoin.compact_matches,
                hit, relS.key, rpay, relS.payload,
                capacity=result_capacity(relS, cfg))
        else:
            out = pt.time_fn(
                "probe", mergejoin.merge_join_materialize,
                rk, rp, relS.key, relS.payload,
                result_capacity(relS, cfg))
    elif cfg.profile_phases:
        out = pt.time_fn("probe", _inl_probe, rk, rp, relS.key, relS.payload)
    elif cfg.checksum:
        out = pt.time_fn(
            "probe", mergejoin.merge_join_count,
            rk, rp, relS.key, relS.payload)
    else:
        out = pt.time_fn(
            "probe", mergejoin.merge_join_count_keys, rk, relS.key)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t
