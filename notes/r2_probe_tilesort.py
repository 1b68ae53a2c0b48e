"""Probe: per-tile monolithic sort of boxes 2..16384 vs hybrid schedule.

In T layout a (128,128) tile holds 16384 consecutive elements, so every
box <= 2^14 is tile-local.  Variant B sorts each tile with a single
per-tile chain (slices/rolls for row strides, take_along_axis for lane
strides) hoping Mosaic keeps the tile resident; variant A is the current
hybrid schedule (full-window stages + transposes at switches).
"""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.ops.pallas.netsort import (
    LANES, run_network_hybrid, _net_schedule, nt_transpose)
from aqp_tpu.utils.timing import hard_sync

W, NB = 1024, 512
key = jax.random.PRNGKey(0)
kw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32)
pw = jax.random.randint(jax.random.PRNGKey(1), (NB * W, LANES), 0, 1 << 30,
                        jnp.int32)
jax.block_until_ready((kw, pw))
REP = 4


def bench(name, call, *args):
    out = call(*args)
    hard_sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REP):
            out = call(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REP*1e3:.2f} ms/call", flush=True)
    return out


def run2(kern):
    return jax.jit(lambda a, b: pl.pallas_call(
        kern, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((W, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((NB * W, LANES), jnp.int32)] * 2,
    )(a, b))


# A) hybrid schedule boxes 2..16384 (sort to tile runs), end in T
def kA(k_ref, p_ref, ok, op):
    k, p = run_network_hybrid(k_ref[:], p_ref[:],
                              _net_schedule(16384, 2), "T", "T")
    ok[:] = k
    op[:] = p


outA = bench("A hybrid boxes 2..2^14", run2(kA), kw, pw)


# B) per-tile monolithic chain (T layout, all stages tile-local)
def _tile_sort(k, p):
    """Sort one (128,128) tile in T element order (e = row + 128*lane)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    n = 128 * 128
    box = 2
    while box <= n:
        j = box // 2
        while j >= 1:
            # element bit b: b<7 -> row bit b; b>=7 -> lane bit b-7
            jb = j.bit_length() - 1
            bb = min(box, n).bit_length() - 1
            if j < 8:
                pk = jnp.where((row & j) == 0,
                               pltpu.roll(k, 128 - j, axis=0),
                               pltpu.roll(k, j, axis=0))
                pk = jnp.where(row < 128, pk, pk)
                pkk = pltpu.roll(k, j, axis=0)
                pkm = pltpu.roll(k, 128 - j, axis=0)
                pk = jnp.where((row & j) == 0, pkm, pkk)
                ppk = pltpu.roll(p, j, axis=0)
                ppm = pltpu.roll(p, 128 - j, axis=0)
                pp = jnp.where((row & j) == 0, ppm, ppk)
                upper = (row & j) != 0
            elif j < 128:
                # static row slices
                outs_k, outs_p = [], []
                for c0 in range(0, 128, 2 * j):
                    ak, bk = k[c0:c0 + j], k[c0 + j:c0 + 2 * j]
                    ap, bp = p[c0:c0 + j], p[c0 + j:c0 + 2 * j]
                    outs_k += [bk, ak]
                    outs_p += [bp, ap]
                pk = jnp.concatenate(outs_k, axis=0)
                pp = jnp.concatenate(outs_p, axis=0)
                upper = (row & j) != 0
            else:
                jl = j >> 7
                pk = jnp.take_along_axis(k, lane ^ jl, axis=1)
                pp = jnp.take_along_axis(p, lane ^ jl, axis=1)
                upper = (lane & jl) != 0
            if box >= n:
                desc = False
                want_hi = upper
            else:
                if bb < 7:
                    desc = (row & (1 << bb)) != 0
                else:
                    desc = (lane & (1 << (bb - 7))) != 0
                want_hi = upper ^ desc
            take = (want_hi ^ (pk < k)) & (pk != k)
            k = jnp.where(take, pk, k)
            p = jnp.where(take, pp, p)
            j //= 2
        box *= 2
    return k, p


def kB(k_ref, p_ref, ok, op):
    for t in range(W // 128):
        kt, pt = _tile_sort(k_ref[t * 128:(t + 1) * 128, :],
                            p_ref[t * 128:(t + 1) * 128, :])
        ok[t * 128:(t + 1) * 128, :] = kt
        op[t * 128:(t + 1) * 128, :] = pt


outB = bench("B per-tile monolithic 2..2^14", run2(kB), kw, pw)
print("equal:", bool(jnp.array_equal(outA[0], outB[0])), flush=True)
