"""Radix-partitioned join engines: RHO, RHT, RSM equivalents.

Reference: radix_join.cpp — RHO (join_init_run + prj_thread + bucket_chaining
_join, :1369-1638/:359-458), RHT (histogram_join :476-612), RSM
(radix_sortmerge_join.cpp:82-137).  The reference's frame: 1–2 pass parallel
radix partition (per-thread histograms → global prefix sums → scatter with
software write-combining), then per-partition build/probe tasks from a
work-stealing queue.

TPU design: the partition pass is a stable reorder by radix bucket; the
per-thread histogram + prefix-sum + scatter choreography collapses into one
data-parallel primitive (ops/partition.py).  Per-partition tasks are not
pulled from a queue — every partition is processed by the same SPMD program;
skew is handled by structure (sort-based kernels are insensitive to bucket
imbalance), not by stealing.  Tier-1 uses XLA sort as the reorder engine;
Tier-2 swaps in the Pallas partition/band kernels (ops/pallas/).

Radix planning mirrors calc_num_radix_bits/calc_num_passes
(radix_join.cpp:295-345) with VMEM standing in for L2: partitions are sized
so a partition of R fits the Tier-2 kernel's VMEM tile.
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
from aqp_tpu.ops.hashing import radix_bits
from aqp_tpu.relation import Relation
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


def _radix_frame(relR: Relation, relS: Relation, cfg: JoinConfig, flavor: str):
    pt = PhaseTimer()
    t0 = time.perf_counter()
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

    # Partition-local join.  RHO = bucket-chaining build/probe; RHT =
    # histogram (counting-sort) join; RSM = per-partition sort-merge.  All
    # three are order-insensitive joins of co-partitioned data; the Tier-1
    # vectorized equivalent is the union-sort propagation join, which XLA
    # runs over all partitions at once (partition boundaries need not be
    # materialized because bucket bits are key bits: sorting by key completes
    # the partition-local order).
    if cfg.materialize:
        out = pt.time_fn(
            "join",
            mergejoin.merge_join_materialize,
            rk, rp, sk, sp, result_capacity(relS, cfg),
        )
    else:
        out = pt.time_fn("join", mergejoin.merge_join_count, rk, rp, sk, sp)
    pt.t.phases["partition"] = pt.t.phases.get("partition_pass1", 0.0) + pt.t.phases.get(
        "partition_pass2", 0.0
    )
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("RHO")
def RHO(relR, relS, cfg):
    """Parallel radix join, optimized — the paper's champion
    (radix_join.cpp:1640-1643)."""
    return _radix_frame(relR, relS, cfg, "bucket_chaining")


@register("RHO_seq")
def RHO_seq(relR, relS, cfg):
    """RHO with FORCE_2_PHASES semantics (two partition passes)."""
    return _radix_frame(relR, relS, cfg.replace(passes=2), "bucket_chaining")


@register("RHT")
def RHT(relR, relS, cfg):
    """Radix + per-partition histogram join (radix_join.cpp:1645-1648)."""
    return _radix_frame(relR, relS, cfg, "histogram")


@register("RSM")
def RSM(relR, relS, cfg):
    """Radix + per-partition sort-merge (radix_sortmerge_join.cpp:82-137)."""
    return _radix_frame(relR, relS, cfg, "sortmerge")
