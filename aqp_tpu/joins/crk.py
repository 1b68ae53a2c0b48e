"""CrkJoin equivalents (CRKJ / CRKJS / CRKJF / CrkJoin).

Reference: CrkJoin/JoinWrapper.cpp:177-522 + CrkJoin/Join.hpp — a
query-driven *cracking* join:

  * a partition TREE (PTreeNode.hpp) tracks, per node, the key range's
    current crack depth and its span of the tuple array;
  * cracking is LAZY: visiting partition p cracks one more level of the
    slice on p's path (partition_both_ends, Join.hpp:280-326); residual
    mixing in under-refined slices is absorbed by a hash filter in
    build/probe (check_add_to_ht / probe_ht `hk == partition` guards,
    Join.hpp:334-356,398-420);
  * cracking state PERSISTS: later queries on the same relation reuse the
    refinement paid by earlier ones (the paper's core property);
  * CRKJS stops the DFS `threshold` bits early (crack_dfs, Join.hpp:260-279);
  * CRKJF fuses the LAST crack level into build/probe — one scan does both
    (partition_and_build / partition_and_probe, Join.hpp:361-465).

TPU design (not a translation — the two-pointer in-place crack is a
pointer-chasing serial scan; the TPU analog keeps the SEMANTICS):

  * one crack LEVEL = a stable 1-bit partition of the whole relation
    (lax.sort by the bit; every row moves once per level, exactly the
    aggregate movement of the reference's per-node two-pointer passes at
    that tree level);
  * the partition tree is explicit: `CrackedRelation` carries the cracked
    depth and the per-partition BOUNDARY offsets (the PTreeNode spans),
    recomputed per level from the grouped bucket ids — and persists across
    queries, so a second join on the same CrackedRelation pays ZERO crack
    rounds (tested);
  * the per-partition join batches all 2^depth partitions into fixed
    [npart, cap] windows (rank-within-partition scatter off the tree
    boundaries) and vmaps a small union-sort join over them: sorting
    npart blocks of cap beats one global sort by the log factor, and is
    the static-shape analog of the reference's per-partition build/probe.
    Window overflow (cap exceeded under skew) is impossible by
    construction: cap is the device-computed max partition size (rounded
    up pow2 for compile-cache stability);
  * CRKJS: crack `threshold` fewer levels; the windows are coarser (bigger
    cap, fewer parts) and the in-window join absorbs the residual exactly
    — the vectorized form of the reference's hash-filter guards;
  * CRKJF: cracks depth-1 levels and joins 2-subpartition windows: the
    final level is subsumed by the in-window sort — the window scan does
    partition-and-join in one pass, the fusion semantics.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops import mergejoin
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer


def _crack_level(key, payload, new_depth: int, key_bits: int):
    """One tree LEVEL of cracking: stable sort by the top-`new_depth`
    bucket id.  The reference's two-pointer crack is SEGMENT-restricted
    (each node cracks its own span, partition_both_ends); sorting by the
    full bucket id with a stable sort is the flat-array equivalent — the
    high bits replay the existing segment grouping (already in order, zero
    net movement), the new low bit splits within each segment.  An
    unrestricted 1-bit sort would scramble earlier levels."""
    b = (key >> (key_bits - new_depth)).astype(jnp.int32)
    _, k, p = jax.lax.sort((b, key, payload), num_keys=1, is_stable=True)
    return k, p


_crack_level_jit = jax.jit(_crack_level,
                           static_argnames=("new_depth", "key_bits"))


@partial(jax.jit, static_argnames=("depth", "key_bits"))
def _tree_bounds(key, depth: int, key_bits: int):
    """Partition-tree spans at `depth`: offsets[2^depth + 1] such that
    partition p occupies rows [offsets[p], offsets[p+1]) — the PTreeNode
    (start, num) fields, as one array.  Valid because depth crack levels
    leave rows grouped (stably) by their top-`depth` key bits."""
    npart = 1 << depth
    bucket = (key >> (key_bits - depth)).astype(jnp.int32)
    return jnp.searchsorted(
        bucket, jnp.arange(npart + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)


@dataclass(frozen=True)
class CrackedRelation:
    """A relation plus its persistent cracking state (the partition tree).

    Reusing a CrackedRelation across joins reuses the refinement already
    paid — the defining property of cracking (JoinWrapper.cpp runs multiple
    queries against one progressively-cracked store)."""
    key: jax.Array
    payload: jax.Array
    depth: int          # crack levels applied (MSB-first)
    key_bits: int       # total bits in the key domain
    bounds: jax.Array   # [2^depth + 1] partition offsets at current depth

    @property
    def num_tuples(self) -> int:
        return self.key.shape[0]


def crack_relation(rel: Relation, key_bits: int | None = None
                   ) -> CrackedRelation:
    """Wrap a relation as an uncracked store (depth 0, one root node)."""
    n = rel.num_tuples
    if key_bits is None:
        # dense generated keys are 1..N (generator.cpp:351-376)
        key_bits = max(1, math.ceil(math.log2(max(2, n)))) + 1
    bounds = jnp.array([0, n], jnp.int32)
    return CrackedRelation(rel.key, rel.payload, 0, key_bits, bounds)


def crack_to(cr: CrackedRelation, depth: int, pt: PhaseTimer | None = None,
             per_level: bool = False) -> CrackedRelation:
    """Refine the store to `depth` crack levels.  Already-cracked levels
    are NOT repeated: the lazy-reuse contract.

    All pending levels run as ONE stable bucket sort (sorting by the
    top-`depth` bits is exactly the layout the per-level sequence
    produces, since each level is a stable refinement of the previous
    grouping) — one data pass instead of depth-minus-current passes.
    per_level=True keeps the sequential per-level form (one timed sort
    per tree level — the reference's per-level partition timers,
    JoinWrapper.cpp partition_thread)."""
    depth = min(depth, cr.key_bits)
    if depth <= cr.depth:
        return cr
    key, pay = cr.key, cr.payload
    levels = (range(cr.depth + 1, depth + 1) if per_level else (depth,))
    for d in levels:
        if pt is not None:
            key, pay = pt.time_fn("partition", _crack_level_jit, key, pay,
                                  d, cr.key_bits)
        else:
            key, pay = _crack_level_jit(key, pay, d, cr.key_bits)
    bounds = _tree_bounds(key, depth, cr.key_bits)
    return replace(cr, key=key, payload=pay, depth=depth, bounds=bounds)


@partial(jax.jit, static_argnames=("npart", "cap", "pad_key"))
def _pack_windows(key, pay, bounds, npart: int, cap: int, pad_key: int):
    """Scatter the grouped rows into [npart, cap] fixed windows using the
    tree spans: row i of partition p lands at (p, i - bounds[p]).  Static
    shapes; pad slots carry `pad_key` (never matches)."""
    n = key.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    bucket = jnp.searchsorted(bounds, pos, side="right").astype(jnp.int32) - 1
    rank = pos - bounds[bucket]
    ok = rank < cap  # impossible by cap construction; belt-and-braces drop
    flat = jnp.where(ok, bucket * cap + rank, npart * cap)
    out_k = jnp.full((npart * cap + 1,), pad_key, key.dtype)
    out_p = jnp.zeros((npart * cap + 1,), pay.dtype)
    out_k = out_k.at[flat].set(key)
    out_p = out_p.at[flat].set(pay)
    return (out_k[:-1].reshape(npart, cap), out_p[:-1].reshape(npart, cap))


@partial(jax.jit, static_argnames=("npart", "cap_r", "cap_s"))
def _windows_join_count(rk, rp, sk, sp, r_bounds, s_bounds,
                        npart: int, cap_r: int, cap_s: int):
    """Per-partition join over all windows at once: pack both sides off the
    tree spans, vmap the small union-sort join.  npart sorts of
    (cap_r + cap_s) rows — the batched analog of the reference's
    per-partition build/probe loop (Join.hpp:616-706)."""
    rw_k, rw_p = _pack_windows(rk, rp, r_bounds, npart, cap_r, -1)
    sw_k, sw_p = _pack_windows(sk, sp, s_bounds, npart, cap_s, -2)
    out = jax.vmap(mergejoin.merge_join_count)(rw_k, rw_p, sw_k, sw_p)
    return (jnp.sum(out.matches, dtype=jnp.int32),
            jnp.sum(out.checksum, dtype=jnp.uint32))


def _window_cap(bounds) -> int:
    """Largest partition span (device max, one scalar fetch), rounded up to
    a power of two so the windowed-join compile cache is stable."""
    mx = int(jnp.max(bounds[1:] - bounds[:-1]))
    return max(8, 1 << max(3, math.ceil(math.log2(max(1, mx)))))


def crk_join_cracked(crR: CrackedRelation, crS: CrackedRelation,
                     cfg: JoinConfig, depth: int,
                     pt: PhaseTimer | None = None):
    """Join two (possibly pre-cracked) stores at `depth`, refining lazily.
    Returns (result, crR', crS') — the refined stores for reuse."""
    pt = pt or PhaseTimer()
    t0 = time.perf_counter()
    assert crR.key_bits == crS.key_bits, (
        "both stores must crack the same key domain "
        f"({crR.key_bits} != {crS.key_bits})")
    depth = max(1, min(depth, crR.key_bits, crS.key_bits))
    per_level = bool(getattr(cfg, "profile_phases", False))
    crR = crack_to(crR, depth, pt, per_level=per_level)
    crS = crack_to(crS, depth, pt, per_level=per_level)
    npart = 1 << depth
    if cfg.profile_phases:
        # windowed per-partition join: explicit [npart, cap] windows off
        # the tree spans (phase-attributable, the reference's per-node
        # build/probe loop shape, Join.hpp:616-706)
        cap_r = _window_cap(crR.bounds)
        cap_s = _window_cap(crS.bounds)
        if cfg.materialize:
            out = pt.time_fn(
                "join", _windows_join_materialize,
                crR.key, crR.payload, crS.key, crS.payload,
                crR.bounds, crS.bounds, npart, cap_r, cap_s)
        else:
            m, c = pt.time_fn(
                "join", _windows_join_count,
                crR.key, crR.payload, crS.key, crS.payload,
                crR.bounds, crS.bounds, npart, cap_r, cap_s)
            out = mergejoin.JoinCounts(m, c)
        pt.t.phases["total"] = time.perf_counter() - t0
        return out, crR, crS
    # Fused serving path: the per-partition joins batch into ONE ordered
    # merge.  Crack buckets are KEY PREFIXES (HASH_BIT_MODULO analog), so
    # partition-major ∘ key order == plain key order — the cracked layout
    # feeds the merge core directly, no window packing (the round-3
    # windowed pack paid a 52M searchsorted + scatter per side).
    if cfg.materialize:
        out = pt.time_fn(
            "join", mergejoin.merge_join_materialize,
            crR.key, crR.payload, crS.key, crS.payload,
            result_capacity(Relation(crS.key, crS.payload), cfg))
    elif cfg.checksum:
        out = pt.time_fn(
            "join", mergejoin.merge_join_count,
            crR.key, crR.payload, crS.key, crS.payload)
    else:
        out = pt.time_fn(
            "join", mergejoin.merge_join_count_keys, crR.key, crS.key)
    pt.t.phases["total"] = time.perf_counter() - t0
    return out, crR, crS


@partial(jax.jit, static_argnames=("npart", "cap_r", "cap_s"))
def _windows_join_materialize(rk, rp, sk, sp, r_bounds, s_bounds,
                              npart: int, cap_r: int, cap_s: int):
    """Materializing windowed join: per-partition output columns of
    capacity cap_s with sentinel holes (key -3) — the chunked-table
    contract (one chunk per partition; the reference CRKJ likewise emits
    per-partition output lists, Join.hpp:409-417)."""
    rw_k, rw_p = _pack_windows(rk, rp, r_bounds, npart, cap_r, -1)
    sw_k, sw_p = _pack_windows(sk, sp, s_bounds, npart, cap_s, -2)
    out = jax.vmap(
        lambda a, b, c, d: mergejoin.merge_join_materialize(a, b, c, d, cap_s)
    )(rw_k, rw_p, sw_k, sw_p)
    return mergejoin.JoinMaterialized(
        jnp.sum(out.matches, dtype=jnp.int32),
        jnp.sum(out.checksum, dtype=jnp.uint32),
        out.key.reshape(-1), out.r_payload.reshape(-1),
        out.s_payload.reshape(-1))


def _query_depth(relR: Relation, cfg: JoinConfig, adjust: int) -> int:
    """Crack depth so partitions fit the fast-memory tile — the dynamic bit
    selection of the reference (getRadixBits, JoinWrapper.cpp:177-196:
    bits = ceil(log2(bytes / L2)); here the VMEM tile budget via
    cfg.partition_rows)."""
    return max(1, math.ceil(math.log2(
        max(2, relR.num_tuples / cfg.partition_rows))) + adjust)


def _crk(relR: Relation, relS: Relation, cfg: JoinConfig, adjust: int):
    pt = PhaseTimer()
    depth = _query_depth(relR, cfg, adjust)
    # one key DOMAIN for both sides: S is a foreign key into R's domain
    # (generator.cpp:351-376), so crack bits index the same positions
    kb = max(1, math.ceil(math.log2(max(2, relR.num_tuples)))) + 1
    out, _, _ = crk_join_cracked(
        crack_relation(relR, kb), crack_relation(relS, kb), cfg, depth, pt)
    return to_join_result(out), pt.t


@register("CRKJ")
def CRKJ(relR, relS, cfg):
    """Classic CrkJoin (Join::join): crack to full query depth, then the
    per-partition windowed join."""
    return _crk(relR, relS, cfg, adjust=0)


@register("CrkJoin")
def CrkJoin(relR, relS, cfg):
    return _crk(relR, relS, cfg, adjust=0)


@register("CRKJF")
def CRKJF(relR, relS, cfg):
    """Fusion variant (Join::joinFusion): the FINAL crack level never runs
    as a separate pass — windows span 2 subpartitions and the in-window
    sort performs that level and the join in one scan
    (partition_and_build/probe, Join.hpp:361-465)."""
    return _crk(relR, relS, cfg, adjust=-1)


@register("CRKJS")
def CRKJS(relR, relS, cfg):
    """Threshold variant (Join::join_simple_dfs_st + crack_dfs threshold,
    Join.hpp:260-279): stop the DFS two levels early; coarser windows, the
    residual absorbed exactly by the in-window join (the vectorized form of
    the reference's `hk == partition` probe guards)."""
    return _crk(relR, relS, cfg, adjust=-2)
