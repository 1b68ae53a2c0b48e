import sys; sys.path.insert(0, "/root/repo")
"""Isolate pallas IO paths: read-only, write-only, r+w, vs XLA."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

N = 1024 * 512 * 128  # 67M i32 = 268MB
BR = 1024
tiles = N // (BR * 128)
shape = (tiles * BR, 128)
x = jnp.arange(N, dtype=jnp.int32).reshape(shape)
y = x + 1


def timeit(label, f, *args, bytes_moved=0):
    int(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        int(f(*args))
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:28s} {dt*1e3:8.2f} ms  {bytes_moved/dt/1e9:6.1f} GB/s", flush=True)


# read-only: reduce each block to a scalar accumulated in SMEM
def k_read(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = jnp.int32(0)

    o_ref[0, 0] += jnp.sum(x_ref[:], dtype=jnp.int32)


pc_read = pl.pallas_call(
    k_read,
    grid=(tiles,),
    in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))],
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
)
timeit("pallas read-only", jax.jit(lambda a: pc_read(a)[0, 0]), x, bytes_moved=N * 4)

# write-only
def k_write(o_ref):
    o_ref[:] = jnp.full((BR, 128), pl.program_id(0), jnp.int32)


pc_write = pl.pallas_call(
    k_write,
    grid=(tiles,),
    out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
)
timeit("pallas write-only", jax.jit(lambda: jnp.sum(pc_write()[::65536], dtype=jnp.int32)), bytes_moved=N * 4)

# read+write copy
def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:]


pc_copy = pl.pallas_call(
    k_copy,
    grid=(tiles,),
    in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
)
timeit("pallas copy", jax.jit(lambda a: jnp.sum(pc_copy(a)[::65536], dtype=jnp.int32)), x, bytes_moved=N * 8)

# XLA copy-equivalent
timeit("xla add", jax.jit(lambda a, b: jnp.sum((a + b)[::65536], dtype=jnp.int32)), x, y, bytes_moved=N * 12)
timeit("xla reduce", jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32)), x, bytes_moved=N * 4)
print("done", flush=True)
