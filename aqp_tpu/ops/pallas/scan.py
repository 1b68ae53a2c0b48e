"""Pallas column-scan kernels — bandwidth-bound analogs of the SIMD512
AVX-512 scan family (SIMD512.cpp:7-675).

The XLA versions in ops/scan.py are correct everywhere; these kernels are
the TPU speed-of-light path for the hot modes (count / sum / bitvector) on
8-bit packed columns: one streaming pass over HBM, per-block partials
reduced outside (overflow-safe), scalars prefetched to SMEM.  uint8 native
tiling is (32, 128); blocks of (sub, 128) uint8 rows move 128·sub bytes per
grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB = 4096  # 512 KiB uint8 per block


def _mask(x_ref, lo_hi_ref):
    x = x_ref[:].astype(jnp.int32)
    return x, (x >= lo_hi_ref[0]) & (x <= lo_hi_ref[1])


def _count_kernel(lo_hi_ref, x_ref, part_ref):
    # NOTE: a byte-native variant (int8 bias-bijection compares + one-hot
    # MXU mask reduction) was probed and CRASHES this toolchain's Mosaic
    # backend at (8, sub) int8 matmul shapes; the int32-widened form is the
    # proven path (~140 GB/s at 2^30 rows — above the 113.7 GB/s
    # reference), so the byte path was removed (ADVICE r4).
    _, m = _mask(x_ref, lo_hi_ref)
    s = jnp.sum(m.astype(jnp.int32), dtype=jnp.int32)
    part_ref[:] = jnp.full((8, LANES), s, jnp.int32)


def _sum_kernel(lo_hi_ref, x_ref, part_ref):
    x, m = _mask(x_ref, lo_hi_ref)
    s = jnp.sum(jnp.where(m, x, 0), dtype=jnp.int32)
    part_ref[:] = jnp.full((8, LANES), s, jnp.int32)


def _bitvector_kernel(lo_hi_ref, x_ref, bv_ref):
    """Byte j of the output covers flat rows 8j..8j+7 (bit i = row 8j+i),
    matching the sequential kmask-store layout of SIMD512::bitvector_scan.
    Flat order of a (sub, 128) tile is row-major, so the 8-bit groups are
    lane groups: packed via an MXU matmul with a constant (128, 16) weight
    matrix W[l, g] = (l//8 == g) << (l % 8)."""
    _, m = _mask(x_ref, lo_hi_ref)
    li = jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (LANES, 16), 1)
    w = jnp.where(li // 8 == gi, 1 << (li % 8), 0).astype(jnp.float32)
    packed = jax.lax.dot(m.astype(jnp.float32), w)  # (sub, 16), exact < 256
    bv_ref[:] = packed.astype(jnp.int32).astype(jnp.uint8)


def _grid(n, sub):
    assert n % (sub * LANES) == 0, (n, sub * LANES)
    return n // (sub * LANES)


def _run_partials(kernel, col, low, high, sub, interpret):
    nb = _grid(col.shape[0], sub)
    lo_hi = jnp.stack(
        [jnp.asarray(low, jnp.int32), jnp.asarray(high, jnp.int32)]
    )
    parts = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((sub, LANES), lambda i, s: (i, 0))],
            out_specs=[pl.BlockSpec((8, LANES), lambda i, s: (i, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((nb * 8, LANES), jnp.int32)],
        interpret=interpret,
    )(lo_hi, col.reshape(-1, LANES))
    return parts[0].reshape(nb, 8, LANES)[:, 0, 0]


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def scan_count_pallas(col, low, high, sub: int = SUB, interpret: bool = False):
    """SIMD512::count — number of rows with low <= col <= high."""
    parts = _run_partials(_count_kernel, col, low, high, sub, interpret)
    return jnp.sum(parts.astype(jnp.int64))


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def scan_sum_pallas(col, low, high, sub: int = SUB, interpret: bool = False):
    """SIMD512::sum — sum of qualifying values (exact in int64)."""
    parts = _run_partials(_sum_kernel, col, low, high, sub, interpret)
    return jnp.sum(parts.astype(jnp.int64))


# ---------------------------------------------------------------------------
# Write-producing scan modes (the reference's hard rows): implicit index
# scan (row-id output, SIMD512.cpp implicit_index_scan_self_alloc), value
# scan (decompress + compressstore, SIMD512::scan), and dict scans (8-bit
# codes gathered through a dictionary, SIMD512.cpp:320-335).  All three ride
# the row-granular Pallas compactor (compact.compact_kp: block sort with pads
# last + row-DMA scatter — measured ~9x the XLA sort-based compaction),
# against the reference's ~26.5 GB/s index-scan write rate
# (SimdScanMulti/results/data/write-rate.csv).
#
# Output contract = chunked-table style fixed capacity: arrays of
# cap_rows*128 elements, valid entries first (block-granular), empty slots
# carry the sentinel; `count` gives the exact number of qualifying rows and
# `overflow` reports a too-small capacity (count first or retry bigger —
# the reference's self-alloc mode sizes from a count pass too).


def _mask_to_kp(col, low, high, payload):
    n = col.shape[0]
    x = col.astype(jnp.int32)
    m = (x >= jnp.asarray(low, jnp.int32)) & (x <= jnp.asarray(high, jnp.int32))
    rowid = jnp.arange(n, dtype=jnp.int32)
    from aqp_tpu.ops.pallas.compact import PAD_S_INPUT

    key = jnp.where(m, rowid, PAD_S_INPUT)
    cnt = jnp.sum(m, dtype=jnp.int32)
    return key, payload, cnt


@functools.partial(jax.jit, static_argnames=("cap_rows", "sel_hint",
                                             "interpret"))
def scan_index_pallas(col, low, high, cap_rows: int,
                      sel_hint: float | None = None,
                      interpret: bool = False):
    """Implicit index scan: compacted row-ids of qualifying rows.

    Returns (rowids[cap_rows*128], count, overflow); empty slots carry
    PAD_S_INPUT (>= 2^30-1, never a row id).  Rides the lane-compaction
    kernel (ops/pallas/lanecompact.py — no sort, ~12 vector passes +
    MXU row scatter) instead of the block-sort compactor."""
    from aqp_tpu.ops.pallas.lanecompact import hint_ladder, scan_index_fast

    return scan_index_fast(col, low, high, cap_rows,
                           sel_hint=hint_ladder(sel_hint),
                           interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cap_rows", "sel_hint",
                                             "interpret"))
def scan_values_pallas(col, low, high, cap_rows: int,
                       sel_hint: float | None = None,
                       interpret: bool = False):
    """Value scan (SIMD512::scan): qualifying values, decompressed to int32
    and compacted.  Returns (rowids, values, count, overflow).

    Compaction is block-granular: pad slots (rowid >= 2^30-1) may appear at
    block-boundary rows, so consumers mask by rowid — value filler (0) is
    NOT distinguishable on its own (0 is a legal column value)."""
    from aqp_tpu.ops.pallas.lanecompact import hint_ladder, scan_values_fast

    out_k, out_v, cnt, ovf = scan_values_fast(
        col, low, high, cap_rows, sel_hint=hint_ladder(sel_hint),
        interpret=interpret)
    return out_k, out_v, cnt, ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "sel_hint",
                                             "interpret"))
def scan_dict_pallas(col, dict_lo, dict_hi, low, high, cap_rows: int,
                     sel_hint: float | None = None,
                     interpret: bool = False):
    """Dict scan: qualifying 8-bit codes gathered through a 256-entry
    dictionary of 64-bit values stored as two int32 planes (the columnar
    split of the reference's `_mm512_i64gather_epi64` through the dict,
    SIMD512.cpp:320-335 — pure-int planes are the TPU-native layout, cf.
    TpcHTypes.hpp's date→int conversion).

    Returns (rowids, lo, hi, count, overflow): slots with rowid >= 2^30-1
    are block-boundary filler (count gives the exact total).  The dict
    gather rides the compacted CODES decoded IN-KERNEL (two lane gathers
    through the (2,128)-plane dictionary), so the write volume matches the
    reference's dict mode: one 64-bit value per qualifying row — and no
    serialized HBM gather pass."""
    from aqp_tpu.ops.pallas.lanecompact import hint_ladder, scan_dict_fast

    return scan_dict_fast(col, dict_lo, dict_hi, low, high, cap_rows,
                          sel_hint=hint_ladder(sel_hint),
                          interpret=interpret)


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def scan_bitvector_pallas(col, low, high, sub: int = SUB,
                          interpret: bool = False):
    """SIMD512::bitvector_scan — packed 1 bit/row mask (flat byte order)."""
    nb = _grid(col.shape[0], sub)
    lo_hi = jnp.stack(
        [jnp.asarray(low, jnp.int32), jnp.asarray(high, jnp.int32)]
    )
    bv = pl.pallas_call(
        _bitvector_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((sub, LANES), lambda i, s: (i, 0))],
            out_specs=[pl.BlockSpec((sub, 16), lambda i, s: (i, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((nb * sub, 16), jnp.uint8)],
        interpret=interpret,
    )(lo_hi, col.reshape(-1, LANES))
    return bv[0].reshape(-1)
