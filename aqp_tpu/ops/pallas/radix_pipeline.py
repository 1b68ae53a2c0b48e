"""Fused Tier-2 RHO join: partition → region sort → propagate-join, counts.

Orchestrates the kernels of partition.py plus the fused region-join kernel
(K-D).  The union of R and S is processed with tags packed into key bit 0,
so a key's build row and probe rows always land in the same range-partition
region — no cross-region state is needed and the count/checksum path never
materializes an output table.

Exactness: identical matches/checksum to ops/mergejoin.py for unique build
keys and keys in [0, 2^30).  Region overflow (adversarial skew) is detected
and reported; callers fall back to the XLA core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.pallas.blocksort import KEY_PAD_INT, LANES, bitonic_sort_pairs
from aqp_tpu.ops.pallas.partition import (
    GRAN,
    _rm_to_cm,
    bucket_of_keys,
    scatter_pass,
    sort_and_hist,
)

FILL = 0.7  # target region fill factor


def _ff_shift(x, d, sub):
    """Logical shift-right by d in column-major (sub,128) layout: result[e] =
    x[e-d]; elements e < d receive garbage flagged by the caller via key
    sentinel -1 (handled because candidate keys start at -1)."""
    if d < sub:
        y = pltpu.roll(x, d, axis=0)
        yp = pltpu.roll(y, 1, axis=1)
        s = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        out = jnp.where(s >= d, y, yp)
        # lane 0, s < d would wrap to the last column: mark by caller mask
        return out
    dl = d // sub
    return pltpu.roll(x, dl, axis=1)


def _ff_boundary_invalid(shape, d, sub):
    """Mask of positions whose shifted value wrapped around the block edge."""
    s = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if d < sub:
        return (lane == 0) & (s < d)
    return lane < (d // sub)


def _make_region_join_kernel(sub: int, F: int, use_gather: bool = True):
    block = sub * LANES

    def kernel(scale_ref, k_ref, p_ref, m_ref, c_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            m_ref[0, 0] = jnp.int32(0)
            c_ref[0, 0] = jnp.int32(0)

        k = k_ref[:]
        p = p_ref[:]
        # keep only rows whose bucket is this region's id: row-granular
        # segment copies deliberately include up to one row of neighbour
        # buckets on each side, and scatter-overshoot garbage never shares
        # the region's bucket (it copies strictly-later rows of the sorted
        # source block); region padding keys (KEY_PAD) bucket to F.
        scale = scale_ref[0]
        bb = jnp.minimum(
            ((k >> 1).astype(jnp.float32) * scale).astype(jnp.int32), F - 1
        )
        bb = jnp.maximum(bb, 0)
        mine = (bb == i) & (k != KEY_PAD_INT)
        k = jnp.where(mine, k, KEY_PAD_INT)
        k = _rm_to_cm(k, sub)
        p = _rm_to_cm(p, sub)
        k, p = bitonic_sort_pairs(k, p, sub, use_gather)
        # forward max-scan of the last build row (packed keys: build rows are
        # even).  Candidate init: build rows propose themselves, others -1.
        is_r = (k & 1) == 0
        is_pad = k == KEY_PAD_INT
        ck = jnp.where(is_r & (~is_pad), k, -1)
        cp = jnp.where(is_r & (~is_pad), p, 0)
        d = 1
        while d < block:
            sck = _ff_shift(ck, d, sub)
            scp = _ff_shift(cp, d, sub)
            inv = _ff_boundary_invalid(k.shape, d, sub)
            sck = jnp.where(inv, -1, sck)
            take = sck > ck
            ck = jnp.where(take, sck, ck)
            cp = jnp.where(take, scp, cp)
            d *= 2
        # probe rows: packed key = build packed key + 1
        match = ((k & 1) == 1) & (~is_pad) & (ck == k - 1)
        m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)
        # mod-2^32 checksum in int32 (two's-complement wrap; Mosaic has no
        # unsigned reductions) — bitcast to uint32 by the caller
        contrib = jnp.where(match, cp + p, 0)
        c_ref[0, 0] += jnp.sum(contrib, dtype=jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("sub", "F", "interpret"))
def region_join(layout_k, layout_p, scale, sub: int, F: int,
                interpret: bool = False):
    block = sub * LANES
    nregions = layout_k.shape[0] // block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nregions,),
        in_specs=[
            pl.BlockSpec((sub, LANES), lambda i, t: (i, 0)),
            pl.BlockSpec((sub, LANES), lambda i, t: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    m, c = pl.pallas_call(
        _make_region_join_kernel(sub, F, use_gather=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(scale.reshape(1), layout_k.reshape(-1, LANES),
      layout_p.reshape(-1, LANES))
    return m[0, 0], c[0, 0].astype(jnp.uint32)


def _pad_to(x, mult, fill):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


@functools.partial(jax.jit, static_argnames=("sub1", "sub2", "interpret"))
def rho_join_count_tier2(rk, rp, sk, sp, sub1: int = 2048, sub2: int = 2048,
                         interpret: bool = False):
    """Fused Pallas RHO count join.  Returns (matches, checksum, overflow).

    overflow > 0 means some region exceeded capacity (skewed/adversarial
    bucket distribution) and the result is NOT valid — callers must fall
    back to the XLA core.
    """
    block1 = sub1 * LANES
    block2 = sub2 * LANES
    # pack tags; pad to K-A block multiple
    packed = jnp.concatenate([rk << 1, (sk << 1) | 1])
    pay = jnp.concatenate([rp, sp])
    packed = _pad_to(packed, block1, KEY_PAD_INT)
    pay = _pad_to(pay, block1, 0)
    n = packed.shape[0]
    nb = n // block1
    F = max(1, -(-n // int(FILL * block2)))
    # scale over the UNPACKED key domain (kernels bucket on key >> 1)
    maxk = jnp.max(
        packed >> 1, initial=jnp.int32(0), where=packed != KEY_PAD_INT
    )
    scale = (jnp.float32(F) / (maxk.astype(jnp.float32) + 1.0)) * jnp.float32(
        1.0 - 1e-6
    )

    sorted_k, sorted_p, starts = sort_and_hist(
        packed, pay, scale, F, sub1, interpret=interpret
    )
    # row-granular copied segment sizes (elements): seg rows =
    # [max(r_f - 1, 0), r_{f+1})
    r0 = jnp.maximum(starts[:, :F] - 1, 0)
    r1 = starts[:, 1:]
    seg = jnp.maximum(r1 - r0, 0) * 128  # (nb, F)
    tot = jnp.sum(seg, axis=0)  # copied elements per region
    overflow = jnp.sum(
        jnp.maximum(tot - (block2 - GRAN), 0), dtype=jnp.int32
    )
    region_base = jnp.arange(F, dtype=jnp.int32) * block2
    prior = jnp.cumsum(seg, axis=0) - seg
    dst = region_base[None, :] + prior
    out_rows = F * block2 + GRAN  # + final slack
    src_k = jnp.concatenate([sorted_k, jnp.full((GRAN,), KEY_PAD_INT, jnp.int32)])
    src_p = jnp.concatenate([sorted_p, jnp.zeros((GRAN,), jnp.int32)])
    lay_k, lay_p = scatter_pass(
        src_k, src_p, starts, dst, F, block1, out_rows, interpret=interpret
    )
    m, c = region_join(
        lay_k[: F * block2], lay_p[: F * block2], scale, sub2, F,
        interpret=interpret,
    )
    return m, c, overflow
