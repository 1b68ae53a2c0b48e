"""Fused fast-path entry points for benchmarking and serving.

The algorithm-dispatch layer (joins/api.py) keeps per-phase timing with jit
boundaries between phases; this module exposes the same joins as single
fused jitted programs (no host round-trips), selecting the fastest available
backend: the Pallas radix pipeline (ops/pallas/rho2.py) on TPU, the XLA
sort-based core otherwise.
"""

from __future__ import annotations

import functools

import jax

from aqp_tpu.ops import mergejoin


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("sub", "F1"))
def rho_join_count_fused(rk, rp, sk, sp, sub: int = 1024, F1: int = 32):
    """Fused RHO join (count + checksum): two-level Pallas radix pipeline on
    TPU, XLA sort-based core elsewhere.

    Returns (matches, checksum, overflow).  overflow > 0 means a region
    overflowed under extreme skew and the result is invalid — callers fall
    back to the XLA core (see rho_join_count_checked).  The reference's
    analog of this capacity planning is the radix partition padding
    (radix_join.cpp:339-345) + task-queue rebalancing.
    """
    if _use_pallas():
        from aqp_tpu.ops.pallas.rho2 import rho_join_count_v2

        return rho_join_count_v2(rk, rp, sk, sp, sub=sub, F1=F1)
    out = mergejoin.merge_join_count(rk, rp, sk, sp)
    import jax.numpy as jnp

    return out.matches, out.checksum, jnp.int32(0)


def rho_join_count_checked(rk, rp, sk, sp, sub: int = 1024, F1: int = 32):
    """Host-side wrapper: run the fused pipeline, fall back to the exact XLA
    core when a region overflows (skew escape hatch — the SPMD replacement
    for the reference's dynamic task stealing, SURVEY.md §2c)."""
    m, c, ovf = rho_join_count_fused(rk, rp, sk, sp, sub=sub, F1=F1)
    if int(ovf) != 0:
        out = mergejoin.merge_join_count(rk, rp, sk, sp)
        return out.matches, out.checksum
    return m, c


@jax.jit
def rho_join_count(rk, rp, sk, sp):
    """Compat count join (always exact, any key distribution): XLA sort core
    as a single fused program."""
    return mergejoin.merge_join_count(rk, rp, sk, sp)


@functools.partial(jax.jit, static_argnames=("capacity",))
def rho_join_materialize(rk, rp, sk, sp, capacity: int):
    return mergejoin.merge_join_materialize(rk, rp, sk, sp, capacity)
