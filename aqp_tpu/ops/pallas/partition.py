"""Pallas MSB radix partition + fused region join — the Tier-2 RHO engine.

Pipeline over packed (key<<1|tag, payload) columns of the R∪S union
(tag 0 = build side, 1 = probe side):

  K-A `sort_and_hist` — per (sub x 128)-row block: full bitonic sort in VMEM
      (blocksort network, column-major strides), corner-turn to row-major
      logical order, write block, then binary-search the F range-partition
      boundaries on the written block → starts (F+1,) per block.

  XLA glue (radix_pipeline.py) — per-block histograms = diff(starts),
      fixed-capacity region offsets (one region per bucket, capacity = one
      pass-2 block), overflow detection.

  K-B `scatter_pass` — per block: copy each bucket's contiguous sorted
      segment to its region cursor with GRAN-row granule DMAs (HBM→HBM,
      dynamic offsets, static sizes, ring-pipelined).  Copies overshoot by
      < GRAN rows into space the next writer of the region overwrites (or
      region slack) — the static-size-DMA analog of the reference's
      partition padding (prj_params.h:94).

  K-D `region_join` (radix_pipeline.py) — per region: load, sort in VMEM,
      forward-propagate the last build row, count matches + checksum.
      Cross-region propagation is carried in SMEM across the sequential
      grid.  No join output arrays are materialized for the count path.

The bucket function is a monotone range partition
    bucket(k) = min(F-1, floor(float32(k) * scale)),  scale ≈ F / (max_key+1)
(monotone in k because f32 rounding is monotone), so the concatenation of
regions in bucket order is globally key-sorted.
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
    to_colmajor,
)

GRAN_ROWS = 4          # copy granule: 4 rows of 128 = 512 elements (2 KiB)
GRAN = GRAN_ROWS * 128  # granule/slack in elements
_Q = 8      # DMA pipeline depth


def bucket_of_keys(keys, scale, F: int):
    """Monotone range-partition bucket; KEY_PAD rows → bucket F (dropped)."""
    b = jnp.minimum(
        (keys.astype(jnp.float32) * scale).astype(jnp.int32), F - 1
    )
    b = jnp.maximum(b, 0)
    return jnp.where(keys == KEY_PAD_INT, F, b)


def _cm_to_rm(x, sub):
    """Column-major sorted block (sub,128) → row-major logical (sub,128):
    out[a*128:(a+1)*128, :] = transpose(x[a::ratio, :]) would be the
    (128-tile) corner turn; done with `ratio` static 2D transposes."""
    ratio = sub // LANES
    parts = []
    for a in range(ratio):
        # cm rows a::ratio? derive: rm[l*ratio + a, b] = logical[(l*ratio+a)*128 + b]
        # logical e at cm (e % sub, e // sub):
        #   e = (l*ratio + a)*128 + b → cm_sub = e % sub, cm_lane = e // sub
        # For fixed a, varying l (0..127), b (0..127):
        #   e = l*ratio*128 + a*128 + b = l*sub + (a*128 + b)
        #   cm_sub = a*128 + b, cm_lane = l
        # ⇒ rm rows with (row % ratio == a)  =  transpose(cm[a*128:(a+1)*128, :])
        parts.append(jnp.transpose(x[a * 128:(a + 1) * 128, :], (1, 0)))
    # interleave parts: rm row r = parts[r % ratio][r // ratio]
    stacked = jnp.stack(parts, axis=1)  # (128, ratio, 128): [l, a, b]
    return stacked.reshape(sub, LANES)


def _rm_to_cm(x, sub):
    """Inverse corner turn: row-major logical block → column-major."""
    ratio = sub // LANES
    v = x.reshape(LANES, ratio, LANES)  # [l, a, b]
    parts = []
    for a in range(ratio):
        parts.append(jnp.transpose(v[:, a, :], (1, 0)))  # (128,128): cm rows a*128..
    return jnp.concatenate(parts, axis=0)


def _make_sort_hist_kernel(F: int, sub: int, use_gather: bool = True):
    block = sub * LANES

    def kernel(scale_ref, k_ref, p_ref, ok_ref, op_ref, starts_ref):
        k, p = bitonic_sort_pairs(k_ref[:], p_ref[:], sub, use_gather)
        ok_ref[:] = _cm_to_rm(k, sub)
        op_ref[:] = _cm_to_rm(p, sub)
        scale = scale_ref[0]
        srow = pl.program_id(0) % 8

        def bucket_of_row(r):
            # first element of row-major row r (lane 0: Mosaic allows scalar
            # VMEM reads only at statically lane-aligned indices).  Bucket on
            # the UNPACKED key (bit 0 is the R/S tag) so a key's build and
            # probe rows co-locate.
            kv = ok_ref[r, 0]
            bb = jnp.minimum(
                ((kv >> 1).astype(jnp.float32) * scale).astype(jnp.int32),
                F - 1,
            )
            bb = jnp.maximum(bb, 0)
            return jax.lax.select(kv == KEY_PAD_INT, jnp.int32(F), bb)

        def find(f, _):
            # first ROW whose leading element has bucket >= f; bucket f data
            # may begin mid-row (handled by the glue's one-row back-off and
            # K-D's bucket masking).
            def cond(state):
                lo, hi = state
                return lo < hi

            def body(state):
                lo, hi = state
                mid = (lo + hi) // 2
                return jax.lax.cond(
                    bucket_of_row(mid) < f,
                    lambda: (mid + 1, hi),
                    lambda: (lo, mid),
                )

            lo, _hi = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(sub))
            )
            starts_ref[srow, f] = lo
            return _

        jax.lax.fori_loop(0, F + 1, find, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("F", "sub", "interpret"))
def sort_and_hist(key, payload, scale, F: int, sub: int, interpret: bool = False):
    """Block-sort (row-major logical output) + per-block bucket starts."""
    n = key.shape[0]
    block = sub * LANES
    assert n % block == 0
    nb = n // block
    k2 = to_colmajor(key, nb, sub)
    p2 = to_colmajor(payload, nb, sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec((sub, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec((sub, LANES), lambda i, s: (i, 0)),
            pl.BlockSpec((8, F + 1), lambda i, s: (i // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    nb8 = -(-nb // 8) * 8
    ok, op, starts = pl.pallas_call(
        _make_sort_hist_kernel(F, sub, use_gather=not interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb8, F + 1), jnp.int32),
        ],
        interpret=interpret,
    )(scale.reshape(1), k2, p2)
    # outputs are row-major logical: flat view is the logical order
    return ok.reshape(-1), op.reshape(-1), starts[:nb]


def _make_scatter_kernel(F: int, block: int):
    def kernel(starts_ref, dst_ref, src_k, src_p, _ik, _ip, out_k, out_p, sem):
        b = pl.program_id(0)
        base = b * block
        srow = b % 8

        def mk(slot, soff, doff):
            # offsets in ELEMENTS (always 128-row aligned by construction)
            ck = pltpu.make_async_copy(
                src_k.at[pl.ds(soff, GRAN)], out_k.at[pl.ds(doff, GRAN)],
                sem.at[0, slot],
            )
            cp = pltpu.make_async_copy(
                src_p.at[pl.ds(soff, GRAN)], out_p.at[pl.ds(doff, GRAN)],
                sem.at[1, slot],
            )
            return ck, cp

        init = (jnp.int32(0),) + tuple(jnp.int32(0) for _ in range(2 * _Q))

        def do_bucket(f, carry):
            # row-granular segment [max(r0-1,0), r1) in elements
            r0 = jnp.maximum(starts_ref[srow, f] - 1, 0)
            r1 = starts_ref[srow, f + 1]
            s0 = r0 * 128
            cnt = jnp.maximum(r1 - r0, 0) * 128
            dstf = dst_ref[srow, f]
            ngr = (cnt + GRAN - 1) // GRAN

            def gran(g, carry):
                n_issued = carry[0]
                ring = list(carry[1:])
                slot = n_issued % _Q

                def wait_slot(q):
                    def w():
                        ck, cp = mk(q, ring[2 * q], ring[2 * q + 1])
                        ck.wait()
                        cp.wait()
                    return w

                jax.lax.cond(
                    n_issued >= _Q,
                    lambda: jax.lax.switch(
                        slot, [wait_slot(q) for q in range(_Q)]
                    ),
                    lambda: None,
                )
                soff = base + s0 + g * GRAN
                doff = dstf + g * GRAN
                ck, cp = mk(slot, soff, doff)
                ck.start()
                cp.start()
                new_ring = []
                for q in range(_Q):
                    take = slot == q
                    new_ring.append(jnp.where(take, soff, ring[2 * q]))
                    new_ring.append(jnp.where(take, doff, ring[2 * q + 1]))
                return (n_issued + 1,) + tuple(new_ring)

            return jax.lax.fori_loop(0, ngr, gran, carry, unroll=False)

        carry = jax.lax.fori_loop(0, F, do_bucket, init, unroll=False)
        n_issued = carry[0]
        ring = list(carry[1:])
        for q in range(_Q):
            def w(q=q):
                ck, cp = mk(q, ring[2 * q], ring[2 * q + 1])
                ck.wait()
                cp.wait()
            jax.lax.cond(n_issued > q, w, lambda: None)

    return kernel


@functools.partial(jax.jit, static_argnames=("F", "block", "out_rows", "interpret"))
def scatter_pass(sorted_k, sorted_p, starts, dst, F: int, block: int,
                 out_rows: int, interpret: bool = False):
    """Copy bucket segments of row-major sorted blocks to region offsets.

    sorted_k/p: flat (nb*block + GRAN,) — GRAN rows of read slack appended.
    starts: (nb, F+1) block-local bounds; dst: (nb, F) global offsets.
    Output (out_rows,) arrays pre-filled with KEY_PAD / 0.
    """
    nb = (sorted_k.shape[0] - GRAN) // block
    out_k0 = jnp.full((out_rows,), KEY_PAD_INT, jnp.int32)
    out_p0 = jnp.zeros((out_rows,), jnp.int32)
    out_k, out_p = pl.pallas_call(
        _make_scatter_kernel(F, block),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, F + 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, F), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows,), jnp.int32),
            jax.ShapeDtypeStruct((out_rows,), jnp.int32),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2, _Q))],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, dst, sorted_k, sorted_p, out_k0, out_p0)
    return out_k, out_p
