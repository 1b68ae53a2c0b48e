"""Pallas in-VMEM bitonic block sort — the Tier-2 sort/partition engine.

Sorts independent blocks of `sub`x128 (key, payload) pairs fully in VMEM
with a bitonic network whose data movement is all static (XOR partners via
rolls/selects).  This is the TPU re-imagining of the reference's
partition/sort inner loops (radix scatter radix_join.cpp:656-697, AVX
sortnets in MWAY) — no scalar loops, no random access.

Element order inside a block is COLUMN-MAJOR over the (sub, 128) tile:
element e lives at (sublane = e % sub, lane = e // sub).  Strides < sub are
sublane rolls (measured ~10x cheaper than lane rolls on this chip); only
strides >= sub pay the lane-roll cost.  Measured 9.3 G rows/s at sub=512
(64K blocks) on TPU v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 512                  # default tile sublanes (64K blocks)
BLOCK = SUB * LANES
KEY_PAD_INT = 2147483647   # int32 max — pads sort last; never a data key
KEY_PAD = KEY_PAD_INT


def _partner_sub(x, j, sub):
    """Value at sublane XOR j (j < sub)."""
    r_minus = pltpu.roll(x, j, axis=0)          # [i] <- [i-j]
    r_plus = pltpu.roll(x, sub - j, axis=0)     # [i] <- [i+j] (mod sub)
    s = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    take_plus = (s & j) == 0
    return jnp.where(take_plus, r_plus, r_minus)


def _partner_lane(x, jl, use_gather=True):
    """Value at lane XOR jl (jl < LANES).

    On TPU this is a single in-vreg dynamic lane gather (tpu.dynamic_gather),
    measured ~3x cheaper than the two-roll+select formulation
    (notes/probe_rowsort.py).  Interpret mode (CPU tests) keeps the roll
    form — XLA CPU compiles per-stage gathers pathologically slowly."""
    if use_gather:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.take_along_axis(x, lane ^ jl, axis=1)
    r_minus = pltpu.roll(x, jl, axis=1)
    r_plus = pltpu.roll(x, LANES - jl, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    take_plus = (lane & jl) == 0
    return jnp.where(take_plus, r_plus, r_minus)


def _stage(k, p, j, box, sub, use_gather=True):
    """One bitonic compare-exchange at XOR-distance j; direction from `box`
    (ascending iff (e & box) == 0, element index e column-major)."""
    if j < sub:
        pk = _partner_sub(k, j, sub)
        pp = _partner_sub(p, j, sub)
        field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        upper = (field & j) != 0
    else:
        jl = j // sub
        pk = _partner_lane(k, jl, use_gather)
        pp = _partner_lane(p, jl, use_gather)
        field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        upper = (field & jl) != 0
    if box < sub:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        desc = (dfield & box) != 0
    elif box < sub * LANES:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        desc = (dfield & (box // sub)) != 0
    else:
        desc = jnp.zeros(k.shape, bool)
    want_hi = upper ^ desc
    # take = want_hi ? (pk > k) : (pk < k), as mask algebra (Mosaic cannot
    # lower a select between i1 vectors).
    lt = pk < k
    take_partner = (want_hi ^ lt) & (pk != k)
    k2 = jnp.where(take_partner, pk, k)
    p2 = jnp.where(take_partner, pp, p)
    return k2, p2


def bitonic_sort_pairs(k, p, sub, use_gather=True):
    """Full bitonic sort of one (sub, 128) column-major block in registers."""
    block = sub * LANES
    box = 2
    while box <= block:
        j = box // 2
        while j >= 1:
            k, p = _stage(k, p, j, box, sub, use_gather)
            j //= 2
        box *= 2
    return k, p


def _sort_kernel(sub, use_gather=True):
    def kernel(k_ref, p_ref, ok_ref, op_ref):
        k, p = bitonic_sort_pairs(k_ref[:], p_ref[:], sub, use_gather)
        ok_ref[:] = k
        op_ref[:] = p

    return kernel


def to_colmajor(x, nb, sub):
    """(nb*sub*128,) logical order -> (nb*sub, 128) column-major blocks."""
    return x.reshape(nb, LANES, sub).swapaxes(1, 2).reshape(nb * sub, LANES)


def from_colmajor(x, nb, sub):
    return x.reshape(nb, sub, LANES).swapaxes(1, 2).reshape(nb * sub * LANES)


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def sort_blocks(key, payload, sub: int = SUB, interpret: bool = False):
    """Sort each sub*128-element block of (key, payload) independently.

    Input length must be a block multiple (pad keys with KEY_PAD).
    """
    n = key.shape[0]
    block = sub * LANES
    assert n % block == 0, (n, block)
    nb = n // block
    k2 = to_colmajor(key, nb, sub)
    p2 = to_colmajor(payload, nb, sub)
    ok, op = pl.pallas_call(
        _sort_kernel(sub, use_gather=not interpret),
        grid=(nb,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32)] * 2,
        interpret=interpret,
    )(k2, p2)
    return from_colmajor(ok, nb, sub), from_colmajor(op, nb, sub)
