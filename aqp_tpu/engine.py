"""Fused fast-path entry points for benchmarking and serving.

The algorithm-dispatch layer (joins/api.py) keeps per-phase timing with jit
boundaries between phases; this module exposes the same joins as single
fused jitted programs (no host round-trips), selecting the fastest available
backend: the Tier-2 fixed-slot Pallas pipeline (ops/pallas/rho3.py) on TPU,
the XLA sort-based core otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aqp_tpu.ops import mergejoin


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@jax.jit
def rho_join_count_fused(rk, rp, sk, sp):
    """Fused RHO join (count + checksum): two-level fixed-slot Pallas
    pipeline on TPU, XLA sort-based core elsewhere.

    Returns (matches, checksum, overflow).  overflow > 0 means a slot
    overflowed under extreme duplicate-key skew and the result is invalid —
    callers fall back to the XLA core (see rho_join_count_checked).  The
    reference's analog of this capacity planning is the radix partition
    padding (radix_join.cpp:339-345) + task-queue rebalancing.
    """
    if _use_pallas():
        from aqp_tpu.ops.pallas.rho3 import rho_join_count_v3

        return rho_join_count_v3(rk, rp, sk, sp)
    out = mergejoin.merge_join_count(rk, rp, sk, sp)
    return out.matches, out.checksum, jnp.int32(0)


def rho_join_count_checked(rk, rp, sk, sp):
    """Host-side wrapper: run the fused pipeline, fall back to the exact XLA
    core when a region overflows (skew escape hatch — the SPMD replacement
    for the reference's dynamic task stealing, SURVEY.md §2c)."""
    m, c, ovf = rho_join_count_fused(rk, rp, sk, sp)
    if int(ovf) != 0:
        out = mergejoin.merge_join_count(rk, rp, sk, sp)
        return out.matches, out.checksum
    return m, c


@jax.jit
def rho_join_count(rk, rp, sk, sp):
    """Compat count join (always exact, any key distribution): XLA sort core
    as a single fused program."""
    return mergejoin.merge_join_count(rk, rp, sk, sp)


@jax.jit
def rho_join_materialize_fused(rk, rp, sk, sp):
    """Fused materializing RHO join on TPU (region-chunked output columns
    with sentinel holes — the chunked-table analog, see
    rho3.rho_join_materialize_v3).  Returns
    (matches, checksum, key, r_payload, s_payload, overflow)."""
    if _use_pallas():
        from aqp_tpu.ops.pallas.rho3 import rho_join_materialize_v3

        return rho_join_materialize_v3(rk, rp, sk, sp)
    out = mergejoin.merge_join_materialize(rk, rp, sk, sp, rk.shape[0]
                                           + sk.shape[0])
    return (out.matches, out.checksum, out.key, out.r_payload,
            out.s_payload, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("capacity",))
def rho_join_materialize(rk, rp, sk, sp, capacity: int):
    """Dense fixed-capacity materialized join (XLA core)."""
    return mergejoin.merge_join_materialize(rk, rp, sk, sp, capacity)