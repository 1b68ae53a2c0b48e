"""Bitonic network primitives in lane-major element order (round-2 engine).

Element order is plain ROW-MAJOR over a (W, 128) window: element e lives at
(row e // 128, lane e % 128).  No corner turns anywhere — sorted output is
directly row-contiguous, which is what slot extraction and DMA-free
blockspec routing need (ops/pallas/rho3.py).

Stage cost model measured on this chip (notes/r2_probe_fusion.py, 65.5M
int32 pairs):
  * stride < 128 (lane stage, take_along_axis XOR gather): ~0.2 ms, fuses
    in chains (~0.15 ms amortized);
  * stride 1..4 rows (sublane roll pair): ~0.12 ms in short chains;
  * stride >= 8 rows (STATIC slice min/max exchange, no rolls, no masks —
    direction resolved at trace time): ~0.05-0.1 ms, fuses aggressively
    (3 chained stages ran in 0.14 ms, below the 0.20 ms r/w floor).
The round-1 column-major engine (blocksort.py) paid ~0.31 ms/stage on its
125 sublane-roll stages; this formulation moves every stride >= 8 rows to
fused static slices, which is where most of a merge network lives.

Replaces the reference's AVX sorting networks / x86-simd-sort usage
(Join-Benchmarks/lib/Joins/src/radix/radix_join.cpp:614-697 scatter loops,
sortmergejoin_multiway.cpp AVX sortnets) with a TPU-native design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128
KEY_PAD_INT = 2147483647   # int32 max: pads sort last, never a packed key
KEY_PAD_LOW = -2147483648  # int32 min: leading pads sort FIRST; even (R
#                            tag) with an impossible key, inert in joins


def _iotas(shape):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return lane, row


def _lane_xor(x, j, lane, use_gather):
    """Value at lane XOR j (j < 128, any bit pattern)."""
    if use_gather:
        return jnp.take_along_axis(x, lane ^ j, axis=1)
    # interpret / CPU fallback: decompose into single-bit XOR roll pairs
    # (XLA CPU compiles per-stage gathers pathologically slowly).
    b = 1
    while b < LANES:
        if j & b:
            r_minus = pltpu.roll(x, b, axis=1)
            r_plus = pltpu.roll(x, LANES - b, axis=1)
            x = jnp.where((lane & b) == 0, r_plus, r_minus)
        b *= 2
    return x


def _row_xor(x, jr, row):
    """Value at row XOR jr (jr a single bit) via a sublane roll pair."""
    w = x.shape[0]
    r_minus = pltpu.roll(x, jr, axis=0)
    r_plus = pltpu.roll(x, w - jr, axis=0)
    return jnp.where((row & jr) == 0, r_plus, r_minus)


def _stage_lane(k, p, j, box, lane, row, use_gather):
    """Compare-exchange at element stride j < 128 (within rows)."""
    pk = _lane_xor(k, j, lane, use_gather)
    pp = _lane_xor(p, j, lane, use_gather)
    upper = (lane & j) != 0
    if box < LANES:
        desc = (lane & box) != 0
    else:
        desc = (row & (box // LANES)) != 0
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def _stage_roll(k, p, jr, box, row):
    """Compare-exchange at row stride jr in {1,2,4} via sublane rolls."""
    pk = _row_xor(k, jr, row)
    pp = _row_xor(p, jr, row)
    upper = (row & jr) != 0
    desc = (row & (box // LANES)) != 0
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def _stage_slice(k, p, jr, boxr):
    """Compare-exchange at row stride jr >= 8 via STATIC slices.

    Chunk alignment makes the direction a Python constant per chunk, so the
    stage is pure min/max + two selects — no masks, no rolls; Mosaic fuses
    chains of these into single VMEM passes."""
    w = k.shape[0]
    outs_k, outs_p = [], []
    for c0 in range(0, w, 2 * jr):
        desc = (c0 & boxr) != 0
        ak, bk = k[c0:c0 + jr], k[c0 + jr:c0 + 2 * jr]
        ap, bp = p[c0:c0 + jr], p[c0 + jr:c0 + 2 * jr]
        lo = jnp.minimum(ak, bk)
        hi = jnp.maximum(ak, bk)
        a2, b2 = (hi, lo) if desc else (lo, hi)
        outs_k.append(a2)
        outs_k.append(b2)
        outs_p.append(jnp.where(a2 != ak, bp, ap))
        outs_p.append(jnp.where(b2 != bk, ap, bp))
    return (jnp.concatenate(outs_k, axis=0), jnp.concatenate(outs_p, axis=0))


def stage(k, p, j, box, lane, row, use_gather=True):
    """One bitonic compare-exchange stage at element stride j within `box`.

    `box` capped at the window size: pass box=n for the final ascending box.
    """
    if j < LANES:
        return _stage_lane(k, p, j, box, lane, row, use_gather)
    jr = j // LANES
    if jr < 8:
        return _stage_roll(k, p, jr, box, row)
    return _stage_slice(k, p, jr, box // LANES)


def sort_pairs(k, p, lo_box=2, use_gather=True):
    """Bitonic-sort a (W, 128) pair window in row-major element order.

    lo_box > 2 resumes the network assuming runs of lo_box/2 elements are
    already sorted in ALTERNATING direction (use flip_odd_runs first when
    they are all ascending)."""
    w, lanes = k.shape
    assert lanes == LANES
    n = w * LANES
    lane, row = _iotas(k.shape)
    box = lo_box
    while box <= n:
        j = box // 2
        while j >= 1:
            k, p = stage(k, p, j, min(box, n), lane, row, use_gather)
            j //= 2
        box *= 2
    return k, p


def reverse_runs(x, run_rows, lane, row, use_gather=True):
    """Reverse element order within every run of run_rows*128 elements.

    run_rows must be a multiple of 8.  Decomposition: lane flip (XOR 127)
    + 8-row-group order reversal (static concat) + intra-group sublane
    reversal (XOR 7 = three roll-XOR steps)."""
    w = x.shape[0]
    assert run_rows % 8 == 0 and w % run_rows == 0, (w, run_rows)
    x = _lane_xor(x, LANES - 1, lane, use_gather)
    parts = []
    for r0 in range(0, w, run_rows):
        for g in range(run_rows - 8, -8, -8):
            parts.append(x[r0 + g:r0 + g + 8])
    x = jnp.concatenate(parts, axis=0)
    for jr in (1, 2, 4):
        x = _row_xor(x, jr, row)
    return x


def flip_odd_runs(k, p, run_rows, use_gather=True):
    """Reverse every ODD run of run_rows*128 elements (asc runs -> the
    alternating asc/desc pattern the network expects at box = 2*run)."""
    lane, row = _iotas(k.shape)
    fk = reverse_runs(k, run_rows, lane, row, use_gather)
    fp = reverse_runs(p, run_rows, lane, row, use_gather)
    odd = ((row // run_rows) & 1) == 1
    return jnp.where(odd, fk, k), jnp.where(odd, fp, p)


def merge_runs(k, p, run_rows, use_gather=True):
    """Merge sorted ascending runs of run_rows*128 elements into one fully
    sorted ascending window: flip odd runs, then boxes 2*run .. window."""
    w = k.shape[0]
    if run_rows >= w:
        return k, p
    k, p = flip_odd_runs(k, p, run_rows, use_gather)
    return sort_pairs(k, p, lo_box=2 * run_rows * LANES,
                      use_gather=use_gather)


def shift_fwd(x, d, fill, row):
    """Row-major element shift: out[e] = x[e-d] (out[e < d] = fill)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if d < LANES:
        xr = pltpu.roll(x, d, axis=1)
        prev = pltpu.roll(xr, 1, axis=0)
        y = jnp.where(lane >= d, xr, prev)
        return jnp.where((row == 0) & (lane < d), fill, y)
    dr = d // LANES
    y = pltpu.roll(x, dr, axis=0)
    return jnp.where(row < dr, fill, y)


def propagate_last_r(k, p):
    """Forward max-propagate of the last R row (packed keys: R rows even).

    Returns (ck, cp): for every element, the largest preceding-or-equal
    R packed key and its payload (-1/0 where none).  Requires the window
    to be fully sorted by packed key (R sorts before its S duplicates)."""
    n = k.shape[0] * LANES
    _, row = _iotas(k.shape)
    is_r = (k & 1) == 0
    valid = k != KEY_PAD_INT
    ck = jnp.where(is_r & valid, k, -1)
    cp = jnp.where(is_r & valid, p, 0)
    d = 1
    while d < n:
        sck = shift_fwd(ck, d, jnp.int32(-1), row)
        scp = shift_fwd(cp, d, jnp.int32(0), row)
        take = sck > ck
        ck = jnp.where(take, sck, ck)
        cp = jnp.where(take, scp, cp)
        d *= 2
    return ck, cp
