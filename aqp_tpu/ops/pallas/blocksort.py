"""Pallas in-VMEM bitonic block sort — the Tier-2 sort/partition engine.

Sorts independent blocks of B = 512x128 = 65536 (key, payload) pairs fully
in VMEM with a bitonic network whose data movement is all static (XOR
partners via rolls/selects).  This is the TPU re-imagining of the
reference's partition/sort inner loops (radix scatter radix_join.cpp:656-697,
avx sortnets in MWAY) — no scalar loops, no random access.

Element order inside a block is COLUMN-MAJOR over the (512,128) tile:
element e lives at (sublane = e % 512, lane = e // 512).  Strides < 512 are
sublane rolls (measured ~10x cheaper than lane rolls on this chip); only
strides >= 512 pay the lane-roll cost, giving ~28 expensive stages of 136
total for a full 65536 sort.

Used as: full block sort (radix partition pre-grouping + final partition
ordering), and the building block of the Tier-2 RHO pipeline
(ops/pallas/partition.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 512          # sublanes per block tile
LANES = 128
BLOCK = SUB * LANES  # 65536 elements
KEY_PAD = jnp.int32(2147483647)


def _partner_sub(x, j):
    """Value at sublane XOR j (j < SUB), column-major element = lane*SUB+sub."""
    r_minus = pltpu.roll(x, j, axis=0)          # [i] <- [i-j]
    r_plus = pltpu.roll(x, SUB - j, axis=0)     # [i] <- [i+j] (mod SUB)
    sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    take_plus = (sub & j) == 0
    return jnp.where(take_plus, r_plus, r_minus)


def _partner_lane(x, jl):
    """Value at lane XOR jl (jl < LANES)."""
    r_minus = pltpu.roll(x, jl, axis=1)
    r_plus = pltpu.roll(x, LANES - jl, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    take_plus = (lane & jl) == 0
    return jnp.where(take_plus, r_plus, r_minus)


def _stage(k, p, j, box):
    """One bitonic compare-exchange at XOR-distance j, direction from `box`
    (the bitonic box size): ascending iff (e & box) == 0."""
    if j < SUB:
        pk = _partner_sub(k, j)
        pp = _partner_sub(p, j)
        field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        upper = (field & j) != 0  # this element is the high index of the pair
    else:
        jl = j // SUB
        pk = _partner_lane(k, jl)
        pp = _partner_lane(p, jl)
        field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        upper = (field & jl) != 0
    if box < SUB:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        desc = (dfield & box) != 0
    elif box < BLOCK:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        desc = (dfield & (box // SUB)) != 0
    else:
        desc = jnp.zeros(k.shape, bool)
    # keep = min for the lower element of an ascending pair
    want_hi = upper ^ desc
    # take = want_hi ? (pk > k) : (pk < k), written as mask algebra because
    # Mosaic cannot lower a select between i1 vectors (i8->i1 truncation).
    lt = pk < k
    take_partner = (want_hi ^ lt) & (pk != k)
    k2 = jnp.where(take_partner, pk, k)
    p2 = jnp.where(take_partner, pp, p)
    return k2, p2


def _sort_kernel(k_ref, p_ref, ok_ref, op_ref):
    k = k_ref[:]
    p = p_ref[:]
    box = 2
    while box <= BLOCK:
        j = box // 2
        while j >= 1:
            k, p = _stage(k, p, j, box)
            j //= 2
        box *= 2
    ok_ref[:] = k
    op_ref[:] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_blocks(key, payload, interpret: bool = False):
    """Sort each 65536-element block of (key, payload) independently.

    Input length must be a BLOCK multiple (pad keys with KEY_PAD).  Blocks
    are column-major internally; output blocks are in ascending key order
    when read back in the same column-major convention — use
    `blockify`/`deblockify` to convert.
    """
    n = key.shape[0]
    assert n % BLOCK == 0, n
    nblocks = n // BLOCK
    # column-major within block: element e -> (e % SUB, e // SUB)
    k2 = key.reshape(nblocks, LANES, SUB).swapaxes(1, 2).reshape(nblocks * SUB, LANES)
    p2 = payload.reshape(nblocks, LANES, SUB).swapaxes(1, 2).reshape(nblocks * SUB, LANES)
    ok, op = pl.pallas_call(
        _sort_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * SUB, LANES), jnp.int32)] * 2,
        interpret=interpret,
    )(k2, p2)
    ok = ok.reshape(nblocks, SUB, LANES).swapaxes(1, 2).reshape(n)
    op = op.reshape(nblocks, SUB, LANES).swapaxes(1, 2).reshape(n)
    return ok, op
