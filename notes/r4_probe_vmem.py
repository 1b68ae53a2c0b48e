"""Probe the practical VMEM window ceiling for a one-level pipeline.

Q: how large can a single pallas_call input window + live network state be
on this chip?  Tries merge-style windows of growing row counts.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from aqp_tpu.ops.pallas.netsort import LANES, merge_runs_hybrid  # noqa: E402


def try_window(rows, run_rows=32):
    k = jnp.arange(rows * LANES, dtype=jnp.int32).reshape(rows, LANES)

    def kernel(k_ref, m_ref):
        kk, _ = merge_runs_hybrid(k_ref[:], None, run_rows)
        m_ref[0, 0] = jnp.sum(kk[:1, :1], dtype=jnp.int32)

    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (0, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(k))
    t1 = time.perf_counter()
    # timed second call
    t0 = time.perf_counter()
    jax.block_until_ready(f(k))
    t1 = time.perf_counter()
    return t1 - t0


for rows in (2048, 4096, 8192, 16384, 24576, 32768):
    mb = rows * LANES * 4 / 1e6
    try:
        dt = try_window(rows)
        print(f"rows={rows:6d} ({mb:6.1f} MB window): OK {dt*1e3:.1f} ms",
              flush=True)
    except Exception as e:
        print(f"rows={rows:6d} ({mb:6.1f} MB window): FAIL {str(e)[:200]}",
              flush=True)
        break
