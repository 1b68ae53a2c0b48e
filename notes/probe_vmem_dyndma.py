import sys; sys.path.insert(0, "/root/repo")
"""Probe: (1) scoped-vmem limit raise for sub=2048 block sort;
(2) dynamic-size DMA support; (3) block sort throughput vs sub."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.pallas.blocksort import sort_blocks

N = 1 << 24  # 16.8M rows

def bench_sort(sub):
    k = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, jnp.int32)
    p = jnp.arange(N, dtype=jnp.int32)
    jax.block_until_ready((k, p))
    try:
        ok, op = sort_blocks(k, p, sub=sub)
        ok.block_until_ready()
    except Exception as e:
        print(f"sub={sub}: FAIL {str(e)[:200]}", flush=True)
        return
    # validate one block
    block = sub * 128
    a = np.asarray(ok[:block])
    assert (np.diff(a) >= 0).all(), f"sub={sub} not sorted"
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        ok, op = sort_blocks(k, p, sub=sub)
        ok.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"sub={sub}: {best*1e3:.2f} ms  {N/best/1e9:.2f} G rows/s", flush=True)


for sub in (512, 1024, 2048):
    bench_sort(sub)

# dynamic-size DMA probe
def dyn_kernel(sz_ref, src, out, sem):
    c = pltpu.make_async_copy(
        src.at[pl.ds(0, sz_ref[0])], out.at[pl.ds(0, sz_ref[0])], sem
    )
    c.start()
    c.wait()

try:
    rows = 1024
    src = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    sz = jnp.array([13], jnp.int32)
    out = pl.pallas_call(
        dyn_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(sz, src)
    out.block_until_ready()
    v = np.asarray(out[:14, 0])
    print("dyn-size DMA: OK rows0-13 first-lane:", v[:3], v[12:14], flush=True)
except Exception as e:
    print(f"dyn-size DMA: FAIL {str(e)[:300]}", flush=True)
