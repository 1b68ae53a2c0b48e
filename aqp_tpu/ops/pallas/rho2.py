"""Tier-2 v2 fused RHO join: two-level DMA radix pipeline.

TPU re-design of the reference RHO (radix partition + per-partition join,
radix_join.cpp:1369-1638) built around three measured facts of this chip
(notes/probe_dyndma2.py, probe_vmem_dyndma.py):

  * in-VMEM bitonic block sort is the fastest grouping primitive
    (no vectorizable random scatter exists on the VPU);
  * HBM->HBM DMAs on (rows, 128) int32 refs support dynamic offsets AND
    dynamic sizes at row granularity (~390 ns/DMA incl. bandwidth at 64 KiB
    segments) — one DMA per partition segment.  Dynamic-size slices only
    lower on single-lane-tile (128-wide) refs, so keys and payloads travel
    as two parallel arrays;
  * DMA issue cost is ~hundreds of ns, so segment count per pass must stay
    ~O(10k): two partition levels with fan-outs F1,F2 (~16..32 each) beat
    one level with F1*F2 regions.

Pipeline (count+checksum path; all shapes static):

  pack      XLA: skey = key<<1 | tag (R=0,S=1), pad to block multiple.
  K-A p1    `sort_hist`: per (sub x 128)-row block: corner-turn to
            column-major, bitonic sort in registers, corner-turn back,
            write the row-major sorted block + vectorized per-block bucket
            starts (row granularity, padded to an (8,128) tile).
  glue      per-(block,bucket) row segments [max(s_f-1,0), s_{f+1}) with
            one-row overlap (exactness via bucket masking in K-D — the
            static-shape analog of radix partition padding prj_params.h:94);
            destination cursors by cumulative sums; overflow detection.
  K-B       `scatter_segments`: one dynamic-size DMA pair per segment
            (HBM->HBM), ring-pipelined, Q outstanding.
  K-A p2    re-sort the level-1 regions' blocks; starts on the LOCAL
            level-2 bucket (global bucket minus region base, clamped).
  K-B p2    scatter into final regions of exactly one K-D block.
  K-D       `region_join`: per final region: mask rows whose global bucket
            != region id (overlap strays + padding), bitonic sort, forward
            max-propagate the last build row (packed tag bit), count probe
            matches + mod-2^32 checksum.  No join output materialized.

Exact for unique R keys (reference PK workloads: generator.cpp:351-376).
Zipf/adversarial skew can overflow a region: detected and reported; callers
fall back to the XLA core (ops/mergejoin.py).

NOTE kernels with sub=2048 need LIBTPU_INIT_ARGS=
--xla_tpu_scoped_vmem_limit_kib=100000 (bitonic stage temporaries exceed
the default 16 MiB scoped-VMEM budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.pallas.blocksort import (
    KEY_PAD_INT,
    LANES,
    bitonic_sort_pairs,
)

_Q = 8  # DMA ring depth

# Pre-pack pad keys for caller-padded inputs (bounded-capacity filter
# outputs, queries/fused.py).  Distinct per side so the XLA union-sort core
# can consume the same buffers (equal R/S pad keys would join each other):
#   R pad 2^30-2 packs to 2^31-4 (tag 0), S pad 2^30-1 packs to 2^31-1;
# everything >= PACKED_PAD_MIN sorts last and is dropped by every kernel.
# Real keys must stay < PAD_R_INPUT (< 2^30 - 2).
PAD_R_INPUT = (1 << 30) - 2
PAD_S_INPUT = (1 << 30) - 1
PACKED_PAD_MIN = 2147483644  # == PAD_R_INPUT << 1


# ---------------------------------------------------------------------------
# corner turns (VMEM, static transposes)

def _rm_to_cm(x, sub):
    """Row-major logical (sub,128) -> column-major sort layout."""
    ratio = sub // LANES
    v = x.reshape(LANES, ratio, LANES)
    return jnp.concatenate(
        [jnp.transpose(v[:, a, :], (1, 0)) for a in range(ratio)], axis=0
    )


def _cm_to_rm(x, sub):
    ratio = sub // LANES
    parts = [
        jnp.transpose(x[a * LANES:(a + 1) * LANES, :], (1, 0))
        for a in range(ratio)
    ]
    return jnp.stack(parts, axis=1).reshape(sub, LANES)


# ---------------------------------------------------------------------------
# K-A: block sort + vectorized bucket starts

def _make_sort_hist_kernel(sub: int, F: int, c1_blocks: int, f2: int,
                           use_gather: bool = True):
    """c1_blocks == 0: pass-1 (bucket = key-range bucket, fanout F).
    c1_blocks > 0: pass-2 (local bucket = global bucket - region base,
    clamped to [0, f2-1]); region index r1 = block_index // c1_blocks."""

    def kernel(scale_ref, k_ref, p_ref, ok_ref, op_ref, starts_ref):
        k = _rm_to_cm(k_ref[:], sub)
        p = _rm_to_cm(p_ref[:], sub)
        k, p = bitonic_sort_pairs(k, p, sub, use_gather)
        k = _cm_to_rm(k, sub)
        p = _cm_to_rm(p, sub)
        ok_ref[:] = k
        op_ref[:] = p

        scale = scale_ref[0]
        lead = k[:, :1]  # (sub, 1) row-leading keys (rows are sorted)
        gmax = F if c1_blocks == 0 else F * f2
        g = jnp.minimum(
            ((lead >> 1).astype(jnp.float32) * scale).astype(jnp.int32),
            gmax - 1,
        )
        g = jnp.maximum(g, 0)
        nb_f = F if not c1_blocks else f2
        if c1_blocks:
            # Local bucket within this level-1 region.  Rows whose global
            # bucket falls outside the region are STRAYS: duplicated copies
            # from the 1-row overlap of level-1 segments (every element's
            # home segment also covers it), so they are dropped, not
            # clamped — clamping was measured to overload the edge fine
            # buckets by ~250 rows (notes/probe_rho2_loads.py).  Low strays
            # map to bucket -1 (they sort FIRST by key, keeping the
            # bucket sequence monotone for the starts computation); high
            # strays map to nb_f alongside the padding.
            r1 = pl.program_id(0) // c1_blocks
            gl = g - r1 * f2
            g = jnp.where(gl < 0, -1, jnp.where(gl >= f2, nb_f, gl))
        b = jnp.where(lead >= PACKED_PAD_MIN, nb_f, g)  # (sub,1)
        # starts[f] = first row with bucket >= f, vectorized; padded to an
        # (8, 128) tile (lanes > nb_f are garbage, sliced off by the glue)
        fio = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        starts = jnp.sum((b < fio).astype(jnp.int32), axis=0, keepdims=True)
        starts_ref[:] = jnp.broadcast_to(starts, (8, LANES))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sub", "F", "c1_blocks", "f2", "interpret")
)
def sort_hist(key, payload, scale, sub: int, F: int, c1_blocks: int = 0,
              f2: int = 0, interpret: bool = False):
    """Block-sort flat (row-major) key/payload; return (ks, ps, starts).

    ks/ps: (rows, 128) sorted blocks, rows = n // 128.
    starts: (nb, F+1) (pass-1) or (nb, f2+1) (pass-2) row indices.
    """
    n = key.shape[0]
    block = sub * LANES
    assert n % block == 0, (n, block)
    nb = n // block
    nb_f = F if not c1_blocks else f2
    assert nb_f + 1 <= LANES, nb_f
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec((sub, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec((sub, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec((8, LANES), lambda i, s: (i, 0)),
        ],
    )
    ks, ps, starts = pl.pallas_call(
        _make_sort_hist_kernel(sub, F, c1_blocks, f2, use_gather=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(scale.reshape(1), key.reshape(-1, LANES), payload.reshape(-1, LANES))
    starts = starts.reshape(nb, 8, LANES)[:, 0, :nb_f + 1]
    return ks, ps, starts


# ---------------------------------------------------------------------------
# K-B: one dynamic-size DMA pair per (block, bucket) segment

_CHUNK = 2048  # segment descriptors per SMEM-resident grid step


def _make_scatter_kernel(chunk: int):
    """Grid over descriptor chunks.  Descriptors live in HBM (the full list
    does not fit SMEM at headline sizes — ~100k segments); each grid step
    DMAs its (4, chunk) descriptor slab into SMEM scratch, then issues
    `chunk` DMA pairs with a Q-deep ring, draining the ring at the chunk
    boundary (so waits only ever reference the resident slab)."""

    def kernel(desc_hbm, sk, sp, _ok0, _op0, ok, op, slab, dsem, sem):
        i = pl.program_id(0)
        pltpu.make_async_copy(desc_hbm.at[i], slab, dsem).start()
        pltpu.make_async_copy(desc_hbm.at[i], slab, dsem).wait()
        def issue(g, slot):
            pltpu.make_async_copy(
                sk.at[pl.ds(slab[0, g], slab[2, g])],
                ok.at[pl.ds(slab[1, g], slab[2, g])],
                sem.at[0, slot],
            ).start()
            pltpu.make_async_copy(
                sp.at[pl.ds(slab[0, g], slab[2, g])],
                op.at[pl.ds(slab[1, g], slab[2, g])],
                sem.at[1, slot],
            ).start()

        def wait(g, slot):
            pltpu.make_async_copy(
                sk.at[pl.ds(slab[0, g], slab[2, g])],
                ok.at[pl.ds(slab[1, g], slab[2, g])],
                sem.at[0, slot],
            ).wait()
            pltpu.make_async_copy(
                sp.at[pl.ds(slab[0, g], slab[2, g])],
                op.at[pl.ds(slab[1, g], slab[2, g])],
                sem.at[1, slot],
            ).wait()

        def body(g, _):
            slot = g % _Q

            @pl.when(g >= _Q)
            def _():
                wait(g - _Q, slot)

            issue(g, slot)
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        def drain(q, _):
            g = chunk - _Q + q

            @pl.when(g >= 0)
            def _():
                wait(g, g % _Q)

            return 0

        jax.lax.fori_loop(0, _Q, drain, 0, unroll=False)

    return kernel


def _scatter_reference(ks, ps, soff, doff, sz, out_rows: int,
                       fill_key: int = KEY_PAD_INT):
    """Pure-XLA equivalent of `scatter_segments` (interpret mode — Pallas
    interpret cannot trace dynamic-size DMAs — and correctness oracle).
    Gather formulation: output row j covered by segment i
    (doff_i <= j < doff_i + sz_i) reads src row soff_i + (j - doff_i)."""
    from aqp_tpu.ops.mergejoin import _last_valid_scan

    live = sz > 0
    dpos = jnp.where(live, doff, out_rows)  # dropped
    marks = jnp.zeros((out_rows,), bool).at[dpos].set(True, mode="drop")
    msoff = jnp.zeros((out_rows,), jnp.int32).at[dpos].set(soff, mode="drop")
    mdoff = jnp.zeros((out_rows,), jnp.int32).at[dpos].set(doff, mode="drop")
    msz = jnp.zeros((out_rows,), jnp.int32).at[dpos].set(sz, mode="drop")
    _, f_soff, f_doff = _last_valid_scan(marks, msoff, mdoff)
    _, f_sz, _ = _last_valid_scan(marks, msz, msz)
    j = jnp.arange(out_rows, dtype=jnp.int32)
    inside = (marks | ((j - f_doff) < f_sz)) & (f_sz > 0)
    src = jnp.clip(f_soff + (j - f_doff), 0, ks.shape[0] - 1)
    ok = jnp.where(inside[:, None], ks[src], fill_key)
    op = jnp.where(inside[:, None], ps[src], 0)
    return ok, op


@functools.partial(jax.jit, static_argnames=("nseg", "out_rows", "fill_key",
                                              "interpret"))
def scatter_segments(ks, ps, soff, doff, sz, nseg: int, out_rows: int,
                     fill_key: int = KEY_PAD_INT, interpret: bool = False):
    """Copy `nseg` row segments of (ks, ps) to destination cursors.

    The last output row is a trash row: empty segments become 1-row
    self-copies aimed at it so every ring slot's semaphore is armed (a
    wait on a never-started DMA would hang).  Callers slice off the last
    row.  Unwritten key rows stay KEY_PAD.
    """
    if interpret:
        return _scatter_reference(ks, ps, soff, doff, sz, out_rows, fill_key)
    trash = jnp.int32(out_rows - 1)
    empty = sz == 0
    soff = jnp.where(empty, 0, soff)
    doff = jnp.where(empty, trash, doff)
    sz = jnp.where(empty, 1, sz)
    # pad the descriptor list to a chunk multiple with trash self-copies,
    # shaped (nchunks, _CHUNK) so each grid step prefetches one chunk into
    # SMEM (the full list does not fit SMEM at headline sizes)
    nchunks = -(-nseg // _CHUNK)
    padn = nchunks * _CHUNK - nseg
    if padn:
        soff = jnp.concatenate([soff, jnp.zeros((padn,), jnp.int32)])
        doff = jnp.concatenate([doff, jnp.full((padn,), trash, jnp.int32)])
        sz = jnp.concatenate([sz, jnp.ones((padn,), jnp.int32)])
    desc = jnp.stack(
        [soff.reshape(nchunks, _CHUNK), doff.reshape(nchunks, _CHUNK),
         sz.reshape(nchunks, _CHUNK), jnp.zeros((nchunks, _CHUNK), jnp.int32)],
        axis=1,
    )  # (nchunks, 4, _CHUNK): 4th row pads to the (4,*) int32 slice tiling
    ok0 = jnp.full((out_rows, LANES), fill_key, jnp.int32)
    op0 = jnp.zeros((out_rows, LANES), jnp.int32)
    # dynamic-size memref slices only lower on untiled (HBM) refs — pin
    # explicitly so small arrays are not promoted into VMEM
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    return pl.pallas_call(
        _make_scatter_kernel(_CHUNK),
        grid=(nchunks,),
        in_specs=[hbm] * 5,
        out_specs=[hbm, hbm],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.MemorySpace.SMEM((4, _CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, _Q)),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(desc, ks, ps, ok0, op0)


# ---------------------------------------------------------------------------
# K-D: per-region mask + sort + propagate-join

def _ff_shift(x, d, sub):
    """Column-major logical shift-right by d (element order)."""
    if d < sub:
        y = pltpu.roll(x, d, axis=0)
        yp = pltpu.roll(y, 1, axis=1)
        s = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.where(s >= d, y, yp)
    return pltpu.roll(x, d // sub, axis=1)


def _ff_invalid(shape, d, sub):
    s = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if d < sub:
        return (lane == 0) & (s < d)
    return lane < (d // sub)


def _make_region_join_kernel(sub: int, gmax: int, use_gather: bool = True):
    block = sub * LANES

    def kernel(scale_ref, k_ref, p_ref, m_ref, c_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            m_ref[0, 0] = jnp.int32(0)
            c_ref[0, 0] = jnp.int32(0)

        k = k_ref[:]
        p = p_ref[:]
        scale = scale_ref[0]
        g = jnp.minimum(
            ((k >> 1).astype(jnp.float32) * scale).astype(jnp.int32), gmax - 1
        )
        g = jnp.maximum(g, 0)
        mine = (g == j) & (k < PACKED_PAD_MIN)
        k = jnp.where(mine, k, KEY_PAD_INT)
        k = _rm_to_cm(k, sub)
        p = _rm_to_cm(p, sub)
        k, p = bitonic_sort_pairs(k, p, sub, use_gather)
        # forward max-scan of the last build row (packed keys: R rows even)
        is_r = (k & 1) == 0
        is_pad = k >= PACKED_PAD_MIN
        ck = jnp.where(is_r & (~is_pad), k, -1)
        cp = jnp.where(is_r & (~is_pad), p, 0)
        d = 1
        while d < block:
            sck = _ff_shift(ck, d, sub)
            scp = _ff_shift(cp, d, sub)
            inv = _ff_invalid(k.shape, d, sub)
            sck = jnp.where(inv, -1, sck)
            take = sck > ck
            ck = jnp.where(take, sck, ck)
            cp = jnp.where(take, scp, cp)
            d *= 2
        match = ((k & 1) == 1) & (~is_pad) & (ck == k - 1)
        m_ref[0, 0] += jnp.sum(match, dtype=jnp.int32)
        # mod-2^32 checksum in int32 two's-complement (no unsigned
        # reductions in Mosaic); bitcast to uint32 by the caller
        c_ref[0, 0] += jnp.sum(jnp.where(match, cp + p, 0), dtype=jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("sub", "gmax", "interpret"))
def region_join(lay_k, lay_p, scale, sub: int, gmax: int,
                interpret: bool = False):
    nregions = lay_k.shape[0] // sub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nregions,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    m, c = pl.pallas_call(
        _make_region_join_kernel(sub, gmax, use_gather=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(scale.reshape(1), lay_k, lay_p)
    return m[0, 0], c[0, 0].astype(jnp.uint32)


# ---------------------------------------------------------------------------
# glue: segments + cursors + overflow

def _plan(nb, sub, starts, nb_f, cap_rows):
    """Pass-1 destination cursors (region r = bucket f)."""
    r0 = jnp.maximum(starts[:, :nb_f] - 1, 0)
    r1 = starts[:, 1:nb_f + 1]
    sz = jnp.maximum(r1 - r0, 0)  # (nb, nb_f) rows
    prior = jnp.cumsum(sz, axis=0) - sz
    tot = jnp.sum(sz, axis=0)
    overflow = jnp.sum(jnp.maximum(tot - cap_rows, 0), dtype=jnp.int32)
    base = jnp.arange(nb_f, dtype=jnp.int32) * cap_rows
    doff = base[None, :] + prior
    soff = jnp.arange(nb, dtype=jnp.int32)[:, None] * sub + r0
    return (
        soff.reshape(-1).astype(jnp.int32),
        doff.reshape(-1).astype(jnp.int32),
        sz.reshape(-1).astype(jnp.int32),
        overflow,
    )


def _plan2(starts, c1_blocks, f2, cap_rows):
    """Pass-2 cursors: block b -> region r1 = b // c1_blocks; final region
    j = r1*f2 + f."""
    nb = starts.shape[0]
    nr1 = nb // c1_blocks
    s = starts.reshape(nr1, c1_blocks, f2 + 1)
    r0 = jnp.maximum(s[:, :, :f2] - 1, 0)
    r1b = s[:, :, 1:f2 + 1]
    sz = jnp.maximum(r1b - r0, 0)  # (nr1, c1b, f2)
    prior = jnp.cumsum(sz, axis=1) - sz
    tot = jnp.sum(sz, axis=1)  # (nr1, f2)
    overflow = jnp.sum(jnp.maximum(tot - cap_rows, 0), dtype=jnp.int32)
    j = (
        jnp.arange(nr1, dtype=jnp.int32)[:, None] * f2
        + jnp.arange(f2, dtype=jnp.int32)[None, :]
    )
    doff = j[:, None, :] * cap_rows + prior
    babs = jnp.arange(nb, dtype=jnp.int32).reshape(nr1, c1_blocks, 1)
    return babs, r0, doff, sz, overflow


@functools.partial(
    jax.jit, static_argnames=("cap_rows", "sub", "pad_key", "interpret")
)
def compact_kp(key, payload, cap_rows: int, sub: int = 1024,
               pad_key: int = PAD_S_INPUT, interpret: bool = False):
    """Row-granular Pallas compaction of a masked (key, payload) column pair.

    Input: full-size columns where invalid rows carry key >= PAD_R_INPUT
    (callers remap their predicate mask to PAD_R_INPUT/PAD_S_INPUT).  Output:
    (key[cap_rows*128], payload, overflow) with all valid elements present,
    pad elements only at block-boundary rows, empty slots keyed `pad_key`.

    This replaces the XLA sort-based filter compaction (filters.hpp:29-44
    analog) on TPU: one Pallas block sort (pads sort last per block) + one
    row-granular DMA per block — measured ~9x the XLA 3-array sort at 60M
    rows.  overflow > 0 means cap_rows was too small (count the mask first
    or fall back).
    """
    block = sub * LANES
    packed = _pad_to((key << 1) | 1, block, KEY_PAD_INT)
    pay = _pad_to(payload, block, 0)
    nb = packed.shape[0] // block
    # F=1: every non-pad row buckets to 0 (g is clamped to gmax-1 == 0)
    zero = jnp.zeros((), jnp.float32)
    ks, ps, starts = sort_hist(packed, pay, zero, sub, 1, interpret=interpret)
    soff, doff, sz, ovf = _plan(nb, sub, starts, 1, cap_rows)
    fill = (pad_key << 1) | 1
    ok, op = scatter_segments(ks, ps, soff, doff, sz, nb, cap_rows + 1,
                              fill_key=fill, interpret=interpret)
    out_k = (ok[:cap_rows].reshape(-1) >> 1).astype(jnp.int32)
    out_p = op[:cap_rows].reshape(-1)
    return out_k, out_p, ovf


def _pad_to(x, mult, fill):
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


@functools.partial(
    jax.jit,
    static_argnames=("sub", "F1", "F2", "fill1", "fill2", "max_elems",
                     "interpret"),
)
def rho_join_count_v2(rk, rp, sk, sp, sub: int = 1024, F1: int = 32,
                      F2: int = 0, fill1: float = 0.92, fill2: float = 0.88,
                      max_elems: int = 0, interpret: bool = False):
    """Fused two-level Pallas RHO count join.

    Returns (matches, checksum, overflow).  overflow > 0 => result invalid
    (region overflow under skew); callers fall back to the XLA core.

    max_elems: upper bound on NON-PAD input elements (keys < PAD_INPUT_KEY).
    Callers feeding pre-padded bounded buffers (queries/fused.py) pass their
    capacity sum so levels 1/2 are sized for the real data, not the buffer —
    pads are dropped after the pass-1 sort.  A wrong bound is caught by the
    overflow counter (never a silent wrong answer).
    """
    block = sub * LANES
    packed = jnp.concatenate([rk << 1, (sk << 1) | 1])
    pay = jnp.concatenate([rp, sp])
    packed = _pad_to(packed, block, KEY_PAD_INT)
    pay = _pad_to(pay, block, 0)
    n = packed.shape[0]
    nb = n // block
    rows_total = n // LANES
    # data rows for capacity planning: pads sort last per block and are
    # dropped by the glue, so only real elements land in level 1 — but each
    # (block, bucket) segment still pays its <=2 boundary overlap rows.
    if max_elems:
        data_rows = min(rows_total, -(-max_elems // LANES) + 2 * nb)
    else:
        data_rows = rows_total
    # level-1 capacity (rows, multiple of sub): exact + one overlap row per
    # contributing block per bucket, slack via fill1
    c1_rows_est = -(-int(data_rows / F1 / fill1) // sub) * sub
    c1_blocks_est = c1_rows_est // sub
    if F2 == 0:
        # final region = one K-D block of `sub` rows; a segment's row span
        # exceeds its exact element span by up to TWO rows (mid-row start
        # backoff + shared mid-row end), per contributing block — budget
        # 2*c1_blocks overlap rows, then a fill2 slack factor against the
        # data-dependent variance of fine-bucket loads (range partition of
        # non-uniform keys): mean_load/fill2 + overlap must fit in sub.
        avail = int((sub - 2 * c1_blocks_est) * fill2)
        if avail < 8:
            raise ValueError(f"sub={sub} too small for F1={F1} at n={n}")
        F2 = max(1, -(-int(data_rows / F1) // avail))
    if F2 + 1 > LANES:
        raise ValueError(f"F2={F2} exceeds starts-lane limit; raise sub or F1")
    gmax = F1 * F2
    maxk = jnp.max(packed >> 1, initial=jnp.int32(0),
                   where=packed < PACKED_PAD_MIN)
    scale1 = (jnp.float32(F1) / (maxk.astype(jnp.float32) + 1.0)) * (
        jnp.float32(1.0 - 1e-6))
    scaleg = (jnp.float32(gmax) / (maxk.astype(jnp.float32) + 1.0)) * (
        jnp.float32(1.0 - 1e-6))

    # ---- pass 1
    ks1, ps1, starts1 = sort_hist(packed, pay, scale1, sub, F1,
                                  interpret=interpret)
    c1_rows = c1_rows_est
    c1_blocks = c1_blocks_est
    soff1, doff1, sz1, ovf1 = _plan(nb, sub, starts1, F1, c1_rows)
    out1_rows = F1 * c1_rows + 1  # +1: trash row (see scatter_segments)
    k1, p1 = scatter_segments(ks1, ps1, soff1, doff1, sz1, nb * F1,
                              out1_rows, interpret=interpret)
    k1 = k1[:F1 * c1_rows]
    p1 = p1[:F1 * c1_rows]

    # ---- pass 2 (re-sort level-1 regions' blocks, local bucket starts)
    ks2, ps2, starts2 = sort_hist(
        k1.reshape(-1), p1.reshape(-1), scaleg, sub, F1,
        c1_blocks=c1_blocks, f2=F2, interpret=interpret,
    )
    nb2 = F1 * c1_blocks
    babs, r0, doff2, sz2, ovf2 = _plan2(starts2, c1_blocks, F2, sub)
    soff2 = (babs * sub + r0).reshape(-1).astype(jnp.int32)
    out2_rows = gmax * sub + 1
    k2, p2 = scatter_segments(
        ks2, ps2, soff2, doff2.reshape(-1).astype(jnp.int32),
        sz2.reshape(-1).astype(jnp.int32), nb2 * F2, out2_rows,
        interpret=interpret,
    )
    k2 = k2[:gmax * sub]
    p2 = p2[:gmax * sub]

    # ---- region join
    m, c = region_join(k2, p2, scaleg, sub, gmax, interpret=interpret)
    return m, c, ovf1 + ovf2
