"""Row-granular Pallas compaction + segment scatter (DMA pipeline).

Extracted from the retired v2 join pipeline (rho2) — these pieces remain
the product's bounded-buffer compaction path: the TPC-H fused plans
(queries/fused.py) and the write-producing scan modes (ops/pallas/scan.py)
ride `compact_kp`, and the radix-partition microbenchmark
(experiments/partition_bench.py) drives `sort_hist`/`scatter_segments`
directly.

Design facts measured on this chip (notes/probe_dyndma2.py,
probe_vmem_dyndma.py):

  * in-VMEM bitonic block sort is the fastest grouping primitive
    (no vectorizable random scatter exists on the VPU);
  * HBM->HBM DMAs on (rows, 128) int32 refs support dynamic offsets AND
    dynamic sizes at row granularity (~390 ns/DMA incl. bandwidth at 64 KiB
    segments) — one DMA per partition segment;
  * DMA issue cost is ~hundreds of ns, so segment count per pass must stay
    ~O(10k).

This is the TPU answer to the reference's software write-combining scatter
(radix_join.cpp:1010-1055) and to its AVX-512 `compressstoreu` filter
compaction (Scan-Micro-Benchmarks SIMD512.cpp scan/index modes,
lib/TPCH-Queries/src/filters.hpp:29-44): group rows with an in-VMEM sort,
then move whole row segments with dynamic-size DMAs.

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
# Real keys must stay < PAD_R_INPUT (< 2^30 - 2).  These match the rho3
# pipeline's input-pad window [MAX_KEY, 2^30) (ops/pallas/rho3.py) so one
# masked buffer feeds either engine.
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
# block sort + vectorized bucket starts

def _make_sort_hist_kernel(sub: int, F: int, use_gather: bool = True):
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
        g = jnp.minimum(
            ((lead >> 1).astype(jnp.float32) * scale).astype(jnp.int32),
            F - 1,
        )
        g = jnp.maximum(g, 0)
        b = jnp.where(lead >= PACKED_PAD_MIN, F, g)  # (sub,1)
        # starts[f] = first row with bucket >= f, vectorized; padded to an
        # (8, 128) tile (lanes > F are garbage, sliced off by the glue)
        fio = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        starts = jnp.sum((b < fio).astype(jnp.int32), axis=0, keepdims=True)
        starts_ref[:] = jnp.broadcast_to(starts, (8, LANES))

    return kernel


@functools.partial(jax.jit, static_argnames=("sub", "F", "interpret"))
def sort_hist(key, payload, scale, sub: int, F: int, interpret: bool = False):
    """Block-sort flat (row-major) key/payload; return (ks, ps, starts).

    ks/ps: (rows, 128) sorted blocks, rows = n // 128.
    starts: (nb, F+1) row indices of bucket boundaries per block — the
    per-block histogram of the reference's partition pass
    (radix_join.cpp:614-654), expressed as sorted-run boundaries.
    """
    n = key.shape[0]
    block = sub * LANES
    assert n % block == 0, (n, block)
    nb = n // block
    assert F + 1 <= LANES, F
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
        _make_sort_hist_kernel(sub, F, use_gather=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(scale.reshape(1), key.reshape(-1, LANES), payload.reshape(-1, LANES))
    starts = starts.reshape(nb, 8, LANES)[:, 0, :F + 1]
    return ks, ps, starts


# ---------------------------------------------------------------------------
# one dynamic-size DMA pair per (block, bucket) segment

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


def _make_scatter_kernel_one(chunk: int):
    """Single-stream variant of _make_scatter_kernel (half the DMA issue
    and write traffic for keys-only / odd-array callers)."""

    def kernel(desc_hbm, sk, _ok0, ok, slab, dsem, sem):
        i = pl.program_id(0)
        pltpu.make_async_copy(desc_hbm.at[i], slab, dsem).start()
        pltpu.make_async_copy(desc_hbm.at[i], slab, dsem).wait()

        def copy(g, slot):
            return pltpu.make_async_copy(
                sk.at[pl.ds(slab[0, g], slab[2, g])],
                ok.at[pl.ds(slab[1, g], slab[2, g])],
                sem.at[slot],
            )

        def body(g, _):
            slot = g % _Q

            @pl.when(g >= _Q)
            def _():
                copy(g - _Q, slot).wait()

            copy(g, slot).start()
            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        def drain(q, _):
            g = chunk - _Q + q

            @pl.when(g >= 0)
            def _():
                copy(g, g % _Q).wait()

            return 0

        jax.lax.fori_loop(0, _Q, drain, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("nseg", "out_rows", "fill_key",
                                             "interpret"))
def scatter_segments_one(ks, soff, doff, sz, nseg: int, out_rows: int,
                         fill_key: int = KEY_PAD_INT,
                         interpret: bool = False):
    """Single-array scatter_segments (same contract, one stream)."""
    if interpret:
        ok, _ = _scatter_reference(ks, ks, soff, doff, sz, out_rows,
                                   fill_key)
        return ok
    trash = jnp.int32(out_rows - 1)
    empty = sz == 0
    soff = jnp.where(empty, 0, soff)
    doff = jnp.where(empty, trash, doff)
    sz = jnp.where(empty, 1, sz)
    nchunks = -(-nseg // _CHUNK)
    padn = nchunks * _CHUNK - nseg
    if padn:
        soff = jnp.concatenate([soff, jnp.zeros((padn,), jnp.int32)])
        doff = jnp.concatenate([doff, jnp.full((padn,), trash, jnp.int32)])
        sz = jnp.concatenate([sz, jnp.ones((padn,), jnp.int32)])
    desc = jnp.stack(
        [soff.reshape(nchunks, _CHUNK), doff.reshape(nchunks, _CHUNK),
         sz.reshape(nchunks, _CHUNK),
         jnp.zeros((nchunks, _CHUNK), jnp.int32)], axis=1)
    ok0 = jnp.full((out_rows, LANES), fill_key, jnp.int32)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    return pl.pallas_call(
        _make_scatter_kernel_one(_CHUNK),
        grid=(nchunks,),
        in_specs=[hbm] * 3,
        out_specs=hbm,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.MemorySpace.SMEM((4, _CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_Q,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(desc, ks, ok0)


# ---------------------------------------------------------------------------
# glue: segments + cursors + overflow

def _plan(nb, sub, starts, nb_f, cap_rows):
    """Destination cursors (region r = bucket f): the global prefix-sum
    exchange of the reference's partition pass (radix_join.cpp:886-915)."""
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


def _pad_to(x, mult, fill):
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


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
