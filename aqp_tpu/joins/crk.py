"""CrkJoin equivalents (CRKJ / CRKJS / CRKJF / CrkJoin).

Reference: CrkJoin/JoinWrapper.cpp:177-522 + CrkJoin/Join.hpp — a
query-driven *cracking* join: both relations are recursively binary-radix
"cracked" in place (two-pointer partition per bit, partition_both_ends,
Join.hpp:280-326), tracked in a partition tree (PTreeNode), until partitions
fit fast memory; then per-partition build/probe.  CRKJF fuses build/probe
into the cracking scans; CRKJS stops DFS at a cracking threshold.

TPU design: cracking = one radix bit per round, as a stable 1-bit partition
over the whole relation (a bandwidth-bound reorder — the vectorized analog
of the two-pointer crack, which also moves every row once per bit).  The
partition "tree" is implicit: after d rounds the relations are grouped by
their top-d bucket bits.  The number of rounds is chosen query-driven from
the relation size exactly like the reference (bits so partitions fit fast
memory, JoinWrapper.cpp:178-196).  The fusion variant (CRKJF) skips the last
crack round and joins coarser partitions directly; the threshold variant
(CRKJS) stops cracking early at the cracking threshold.
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops import mergejoin
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer


def _crack_bit(key, payload, bit: int):
    """Stable 1-bit partition by `bit` (MSB-first cracking order)."""
    b = (key >> bit) & 1
    _, k, p = jax.lax.sort((b, key, payload), num_keys=1, is_stable=True)
    return k, p


_crack_bit_jit = jax.jit(_crack_bit, static_argnames=("bit",))


def _crk(relR: Relation, relS: Relation, cfg: JoinConfig, depth_adjust: int):
    pt = PhaseTimer()
    t0 = time.perf_counter()
    # bits so partitions fit "fast memory" (JoinWrapper.cpp:178-196 uses L2;
    # here the Tier-2 VMEM tile budget via cfg.partition_rows).
    depth = max(
        1,
        math.ceil(math.log2(max(2, relR.num_tuples / cfg.partition_rows)))
        + depth_adjust,
    )
    key_bits = max(1, math.ceil(math.log2(max(2, relR.num_tuples)))) + 1
    rk, rp = relR.key, relR.payload
    sk, sp = relS.key, relS.payload
    for d in range(min(depth, key_bits)):
        bit = key_bits - 1 - d
        rk, rp = pt.time_fn("partition", _crack_bit_jit, rk, rp, bit)
        sk, sp = pt.time_fn("partition", _crack_bit_jit, sk, sp, bit)
    if cfg.materialize:
        out = pt.time_fn(
            "join",
            mergejoin.merge_join_materialize,
            rk, rp, sk, sp, result_capacity(relS, cfg),
        )
    else:
        out = pt.time_fn("join", mergejoin.merge_join_count, rk, rp, sk, sp)
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("CRKJ")
def CRKJ(relR, relS, cfg):
    return _crk(relR, relS, cfg, depth_adjust=0)


@register("CrkJoin")
def CrkJoin(relR, relS, cfg):
    return _crk(relR, relS, cfg, depth_adjust=0)


@register("CRKJF")
def CRKJF(relR, relS, cfg):
    """Fusion variant: one less crack round, join fused over coarser parts."""
    return _crk(relR, relS, cfg, depth_adjust=-1)


@register("CRKJS")
def CRKJS(relR, relS, cfg):
    """Threshold variant: stop cracking at the cracking threshold
    (crack_dfs, Join.hpp:260-279) — two fewer rounds."""
    return _crk(relR, relS, cfg, depth_adjust=-2)
