import sys; sys.path.insert(0, "/root/repo")
"""Is the 27ms pallas floor per-grid-step overhead or an IO bandwidth cap?"""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

N = 1024 * 512 * 128  # 67M elements, 268MB per i32 array


def run(block_rows, label):
    tiles = N // (block_rows * 128)
    shape = (tiles * block_rows, 128)
    x = jnp.arange(N, dtype=jnp.int32).reshape(shape)
    y = x + 1

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] + y_ref[:]

    pc = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i: (i, 0))] * 2,
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )
    f = jax.jit(lambda a, b: jnp.sum(pc(a, b)[::65536], dtype=jnp.int32))
    int(f(x, y))
    t0 = time.perf_counter()
    for _ in range(3):
        int(f(x, y))
    dt = (time.perf_counter() - t0) / 3
    gbs = N * 4 * 3 / dt / 1e9
    print(f"{label:22s} tiles={tiles:5d} {dt*1e3:8.2f} ms  {gbs:6.1f} GB/s  {dt/tiles*1e6:7.2f} us/step", flush=True)


run(256, "block 128KB")
run(512, "block 256KB")
run(2048, "block 1MB")
run(8192, "block 4MB")

# XLA reference
x = jnp.arange(N, dtype=jnp.int32)
y = x + 1
g = jax.jit(lambda a, b: jnp.sum((a + b)[::65536], dtype=jnp.int32))
int(g(x, y))
t0 = time.perf_counter()
for _ in range(3):
    int(g(x, y))
dt = (time.perf_counter() - t0) / 3
print(f"XLA add same workload   {dt*1e3:8.2f} ms  {N*4*3/dt/1e9:6.1f} GB/s", flush=True)
print("done", flush=True)
