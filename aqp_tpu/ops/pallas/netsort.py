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
    """Compare-exchange at element stride j < 128 (within rows).

    p may be None (keys-only network: count joins move no payloads —
    the reference's count path also touches no payloads,
    radix_join.cpp:428-447 count branch)."""
    pk = _lane_xor(k, j, lane, use_gather)
    upper = (lane & j) != 0
    if box < LANES:
        desc = (lane & box) != 0
    else:
        desc = (row & (box // LANES)) != 0
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    if p is None:
        return jnp.where(take, pk, k), None
    pp = _lane_xor(p, j, lane, use_gather)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def _stage_roll(k, p, jr, box, row):
    """Compare-exchange at row stride jr in {1,2,4} via sublane rolls."""
    pk = _row_xor(k, jr, row)
    upper = (row & jr) != 0
    desc = (row & (box // LANES)) != 0
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    if p is None:
        return jnp.where(take, pk, k), None
    pp = _row_xor(p, jr, row)
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
        lo = jnp.minimum(ak, bk)
        hi = jnp.maximum(ak, bk)
        a2, b2 = (hi, lo) if desc else (lo, hi)
        outs_k.append(a2)
        outs_k.append(b2)
        if p is not None:
            ap, bp = p[c0:c0 + jr], p[c0 + jr:c0 + 2 * jr]
            outs_p.append(jnp.where(a2 != ak, bp, ap))
            outs_p.append(jnp.where(b2 != bk, ap, bp))
    return (jnp.concatenate(outs_k, axis=0),
            jnp.concatenate(outs_p, axis=0) if p is not None else None)


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
    odd = ((row // run_rows) & 1) == 1
    if p is None:
        return jnp.where(odd, fk, k), None
    fp = reverse_runs(p, run_rows, lane, row, use_gather)
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


# ---------------------------------------------------------------------------
# Hybrid-layout network (round-2 engine v2)
#
# Two physical layouts of the same (W, 128) element window:
#   N (row-major):  element e at (e // 128, e % 128)
#   T (tile-transposed): element e at (128*(e >> 14) + (e & 127),
#                                      (e >> 7) & 127)
# nt_transpose converts between them (it is an involution).  Stage strides
# map to vector ops as:
#   stride class     N layout              T layout
#   1,2,4            lane gather           sublane roll      <- T
#   8..64            lane gather           static row slice  <- T
#   128..512         sublane roll          lane gather       <- N
#   1024..8192       static row slice      lane gather       <- N
#   >=16384          static row slice      static row slice  <- either
# so a full network never needs a lane gather: every stage is a roll or a
# static slice in its preferred layout, with tile transposes (XU-cheap) at
# the switch points.  This is the TPU-native analog of the reference's
# switch from scalar loops to AVX shuffles (radix_join.cpp:614-697): pick
# the data layout that makes the hardware's cheap permutation primitive
# (static slices here, in-register shuffles there) cover the hot strides.


def nt_transpose(x):
    """Convert a (W, 128) window between N and T layouts (involution)."""
    w = x.shape[0]
    return jnp.swapaxes(x.reshape(w // LANES, LANES, LANES), 1, 2).reshape(
        w, LANES)


def _bitmask_T(e_bit, row, lane):
    """(e & (1<<e_bit)) != 0 evaluated in T layout coordinates."""
    if e_bit < 7:
        return (row & (1 << e_bit)) != 0
    if e_bit < 14:
        return (lane & (1 << (e_bit - 7))) != 0
    return (row & (1 << (e_bit - 7))) != 0


def _stage_slice_masked(k, p, jr, want_hi_of):
    """Compare-exchange at row stride jr >= 8 via static slices, with a
    per-element direction mask (for T-layout stages whose box direction
    depends on lane bits).  want_hi_of(c0, rows, lanes per chunk slice) ->
    bool mask for the chunk's LOWER half rows."""
    w = k.shape[0]
    outs_k, outs_p = [], []
    for c0 in range(0, w, 2 * jr):
        ak, bk = k[c0:c0 + jr], k[c0 + jr:c0 + 2 * jr]
        want_hi_low = want_hi_of(c0, jr)
        # lower half wants hi => take partner if partner > self
        take_a = (want_hi_low ^ (bk < ak)) & (ak != bk)
        a2k = jnp.where(take_a, bk, ak)
        b2k = jnp.where(take_a, ak, bk)
        outs_k += [a2k, b2k]
        if p is not None:
            ap, bp = p[c0:c0 + jr], p[c0 + jr:c0 + 2 * jr]
            outs_p += [jnp.where(take_a, bp, ap), jnp.where(take_a, ap, bp)]
    return (jnp.concatenate(outs_k, axis=0),
            jnp.concatenate(outs_p, axis=0) if p is not None else None)


def _stage_T(k, p, j, box, n, row, lane):
    """One compare-exchange stage at element stride j in T layout.

    Preferred for j <= 64 (rolls / within-tile slices) and j >= 16384
    (cross-tile slices).  j in 128..8192 would need a lane gather — the
    scheduler never routes those here."""
    jb = j.bit_length() - 1
    bb = min(box, n).bit_length() - 1
    w = k.shape[0]
    if j < 8:
        # sublane roll pair; upper = row bit, desc = box bit (any class)
        pk = _row_xor(k, j, row)
        upper = _bitmask_T(jb, row, lane)
        if box >= n:
            want_hi = upper
        else:
            want_hi = upper ^ _bitmask_T(bb, row, lane)
        take = (want_hi ^ (pk < k)) & (pk != k)
        if p is None:
            return jnp.where(take, pk, k), None
        pp = _row_xor(p, j, row)
        return jnp.where(take, pk, k), jnp.where(take, pp, p)
    jr = j if j < 128 else j >> 7  # row stride
    if box >= n:
        def want_hi_of(c0, jr_):
            return jnp.zeros((jr_, LANES), bool)
        return _stage_slice_masked(k, p, jr, want_hi_of)
    if (bb < 7) or (bb >= 14):
        # box direction is a row-bit: constant per chunk
        boxr = (1 << bb) if bb < 7 else (1 << (bb - 7))
        def want_hi_of(c0, jr_, boxr=boxr):
            desc = (c0 & boxr) != 0
            return jnp.full((jr_, LANES), desc, bool)
        return _stage_slice_masked(k, p, jr, want_hi_of)
    # box direction is a lane-bit: mask per lane
    lbit = 1 << (bb - 7)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (jr, LANES), 1)
    desc = (lane_row & lbit) != 0
    def want_hi_of(c0, jr_, desc=desc):
        return desc
    return _stage_slice_masked(k, p, jr, want_hi_of)


def _pref_layout(j):
    """Preferred layout for stride j; None = either."""
    if j <= 64:
        return "T"
    if j <= 8192:
        return "N"
    return None


def _net_schedule(n, lo_box):
    """Yield (box, j) for the bitonic network boxes lo_box..n."""
    box = lo_box
    while box <= n:
        j = box // 2
        while j >= 1:
            yield box, j
            j //= 2
        box *= 2


def run_network_hybrid(k, p, stages, start_layout, end_layout="N"):
    """Run bitonic stages choosing per-stage layout; insert transposes at
    switches.  `stages` = iterable of (box, j).  Returns (k, p)."""
    w, lanes = k.shape
    assert lanes == LANES and w % LANES == 0
    n = w * LANES
    lane, row = _iotas(k.shape)
    layout = start_layout

    def _nt(a, b):
        return nt_transpose(a), (nt_transpose(b) if b is not None else None)

    for box, j in stages:
        pref = _pref_layout(j) or layout
        if pref != layout:
            k, p = _nt(k, p)
            layout = pref
        if layout == "T":
            k, p = _stage_T(k, p, j, box, n, row, lane)
        else:
            k, p = stage(k, p, j, min(box, n), lane, row, True)
    if layout != end_layout:
        k, p = _nt(k, p)
    return k, p


def sort_pairs_hybrid(k, p, lo_box=2, start_layout="T", end_layout="N"):
    """Full bitonic sort in the hybrid layout scheme.

    With lo_box == 2 and start_layout == 'T' the input window is read in T
    element order — callers sorting from scratch don't care about input
    order, and this saves the entry transpose.  Output is in `end_layout`
    element order (N for slot extraction)."""
    n = k.shape[0] * LANES
    return run_network_hybrid(
        k, p, _net_schedule(n, lo_box), start_layout, end_layout)


def merge_runs_hybrid(k, p, run_rows, use_gather=True):
    """merge_runs with the hybrid-layout network (input/output N layout)."""
    w = k.shape[0]
    if run_rows >= w:
        return k, p
    k, p = flip_odd_runs(k, p, run_rows, use_gather=use_gather)
    n = w * LANES
    return run_network_hybrid(
        k, p, _net_schedule(n, 2 * run_rows * LANES), "N", "N")


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


def propagate_last_r_split(k, p):
    """propagate_last_r in two tiers: 7 full-size within-row shifts + a
    near-free (W,1) cross-row max-scan + one combine pass — replaces the 17
    full-size doubling stages (log2(W*128)) with log2(128) full passes.

    Identical result to propagate_last_r for any fully sorted window."""
    w = k.shape[0]
    lane, row = _iotas(k.shape)
    is_r = (k & 1) == 0
    valid = k != KEY_PAD_INT
    ck = jnp.where(is_r & valid, k, -1)
    cp = jnp.where(is_r & valid, p, 0)
    # within-row inclusive max-propagate (lanes only, no row carry)
    d = 1
    while d < LANES:
        sck = jnp.where(lane >= d, pltpu.roll(ck, d, axis=1), -1)
        scp = jnp.where(lane >= d, pltpu.roll(cp, d, axis=1), 0)
        take = sck > ck
        ck = jnp.where(take, sck, ck)
        cp = jnp.where(take, scp, cp)
        d *= 2
    # per-row summary = last lane (inclusive within-row running last-R)
    row_ck = ck[:, LANES - 1:LANES]
    row_cp = cp[:, LANES - 1:LANES]
    rrow = row[:, :1]

    def shift_rows(x, dd, fill):
        return jnp.where(rrow >= dd, pltpu.roll(x, dd, axis=0), fill)

    # exclusive cross-row max-scan on the (W,1) summaries (near-free)
    car_ck = shift_rows(row_ck, 1, jnp.int32(-1))
    car_cp = shift_rows(row_cp, 1, jnp.int32(0))
    d = 1
    while d < w:
        sck = shift_rows(car_ck, d, jnp.int32(-1))
        scp = shift_rows(car_cp, d, jnp.int32(0))
        take = sck > car_ck
        car_ck = jnp.where(take, sck, car_ck)
        car_cp = jnp.where(take, scp, car_cp)
        d *= 2
    take = car_ck > ck
    return jnp.where(take, car_ck, ck), jnp.where(take, car_cp, cp)


def propagate_last_r_key(k):
    """Keys-only propagate_last_r_split: the largest preceding-or-equal R
    packed key per element (-1 where none).  The count join needs only this
    — matches = #(S elements whose ck == k-1) — so no payload lanes move
    (reference count path likewise accumulates matches only,
    radix_join.cpp:428-447)."""
    w = k.shape[0]
    lane, row = _iotas(k.shape)
    is_r = (k & 1) == 0
    valid = k != KEY_PAD_INT
    ck = jnp.where(is_r & valid, k, -1)
    d = 1
    while d < LANES:
        sck = jnp.where(lane >= d, pltpu.roll(ck, d, axis=1), -1)
        ck = jnp.maximum(sck, ck)
        d *= 2
    row_ck = ck[:, LANES - 1:LANES]
    rrow = row[:, :1]

    def shift_rows(x, dd, fill):
        return jnp.where(rrow >= dd, pltpu.roll(x, dd, axis=0), fill)

    car_ck = shift_rows(row_ck, 1, jnp.int32(-1))
    d = 1
    while d < w:
        car_ck = jnp.maximum(shift_rows(car_ck, d, jnp.int32(-1)), car_ck)
        d *= 2
    return jnp.maximum(car_ck, ck)


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
