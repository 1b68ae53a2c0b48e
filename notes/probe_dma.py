import sys; sys.path.insert(0, "/root/repo")
"""Probe: HBM->HBM sliced DMA rules on this chip.

Q1: do (g,128) row-sliced DMAs at ARBITRARY row offsets compile when the
refs are pinned to HBM (memory_space=pltpu.ANY on big arrays)?
Q2: what bandwidth do ~2-16 KiB granule HBM->HBM copies achieve?
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GR = int(os.environ.get("GR", "4"))     # granule rows
Q = 8

def make_kernel(ngr: int, gr: int):
    def kernel(soff_ref, doff_ref, src, _outin, out, sem):
        def body(g, _):
            slot = g % Q
            @pl.when(g >= Q)
            def _():
                # wait for the copy Q iterations ago on this slot: we must
                # reconstruct it; DMAs are matched by (src,dst,sem) so keep
                # offsets in SMEM scratch? simplest: wait via same handle
                # recreated from offsets stored in the offset arrays
                gg = g - Q
                c = pltpu.make_async_copy(
                    src.at[pl.ds(soff_ref[gg], gr), :],
                    out.at[pl.ds(doff_ref[gg], gr), :],
                    sem.at[slot],
                )
                c.wait()
            c = pltpu.make_async_copy(
                src.at[pl.ds(soff_ref[g], gr), :],
                out.at[pl.ds(doff_ref[g], gr), :],
                sem.at[slot],
            )
            c.start()
            return 0
        jax.lax.fori_loop(0, ngr, body, 0, unroll=False)
        def drain(q, _):
            g = ngr - Q + q
            @pl.when(g >= 0)
            def _():
                c = pltpu.make_async_copy(
                    src.at[pl.ds(soff_ref[g], gr), :],
                    out.at[pl.ds(doff_ref[g], gr), :],
                    sem.at[g % Q],
                )
                c.wait()
            return 0
        jax.lax.fori_loop(0, Q, drain, 0, unroll=False)
    return kernel


@functools.partial(jax.jit, static_argnames=("ngr", "gr", "rows"))
def scatter(src, soff, doff, ngr: int, gr: int, rows: int):
    out0 = jnp.zeros((rows, 128), jnp.int32)
    return pl.pallas_call(
        make_kernel(ngr, gr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((Q,))],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(soff, doff, src, out0)


def measure_overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    f(tiny).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        f(tiny).block_until_ready()
    return (time.perf_counter() - t0) / 5


def main():
    rows = 1 << int(os.environ.get("LOGROWS", "17"))
    n = rows * 128
    src = jnp.arange(n, dtype=jnp.int32).reshape(rows, 128)
    ngr = rows // GR
    # permuted, deliberately non-8-aligned offsets
    key = jax.random.PRNGKey(0)
    perm = jax.random.permutation(key, ngr).astype(jnp.int32)
    soff = (jnp.arange(ngr, dtype=jnp.int32)) * GR
    doff = perm * GR
    jax.block_until_ready((src, soff, doff))
    t0 = time.perf_counter()
    out = scatter(src, soff, doff, ngr, GR, rows)
    out.block_until_ready()
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    # validate
    import numpy as np
    o = np.asarray(out).reshape(rows // GR, GR * 128)
    s = np.asarray(src).reshape(rows // GR, GR * 128)
    p = np.asarray(perm)
    ok = (o[p] == s).all()
    print("correct:", ok, flush=True)
    oh = measure_overhead()
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = scatter(src, soff, doff, ngr, GR, rows)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    t = max(best - oh, 1e-6)
    bw = 2 * n * 4 / t / 1e9
    print(f"granule {GR*128*4} B x {ngr}: {t*1e3:.2f} ms (oh {oh*1e3:.1f})  "
          f"{bw:.0f} GB/s (r+w)  {t/ngr*1e9:.0f} ns/DMA",
          flush=True)


if __name__ == "__main__":
    main()
