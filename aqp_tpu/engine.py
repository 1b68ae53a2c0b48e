"""Fused fast-path entry points for benchmarking and serving.

The algorithm-dispatch layer (joins/api.py) keeps per-phase timing with jit
boundaries between phases; this module exposes the same joins as single
fused jitted programs (no host round-trips), selecting the fastest available
backend: Pallas kernels when on TPU, the XLA sort-based core otherwise.
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


@jax.jit
def rho_join_count(rk, rp, sk, sp):
    """Fused RHO-capability join (count + checksum): radix-partitioned
    equi-join of columnar relations.  Backend chosen at trace time."""
    if _use_pallas():
        try:
            from aqp_tpu.ops.pallas.bandjoin import band_join_count

            return band_join_count(rk, rp, sk, sp)
        except Exception:
            pass
    return mergejoin.merge_join_count(rk, rp, sk, sp)


@functools.partial(jax.jit, static_argnames=("capacity",))
def rho_join_materialize(rk, rp, sk, sp, capacity: int):
    return mergejoin.merge_join_materialize(rk, rp, sk, sp, capacity)
