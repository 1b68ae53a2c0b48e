import sys; sys.path.insert(0, "/root/repo")
"""Probe Pallas/Mosaic capabilities on this chip: VMEM dynamic gather,
one-hot throughput, roll, etc."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np


def try_kernel(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


# 1. take_along_axis along lanes in VMEM
def k_gather_lanes():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32), (8, 128)), 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 2. take_along_axis along sublanes (axis 0)
def k_gather_sublanes():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    x = jnp.arange(512 * 128, dtype=jnp.int32).reshape(512, 128)
    idx = (x * 7 + 3) % 512
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 3. full 2D "flat" gather: x flat (N,) gathered by arbitrary idx — as (S,128)
def k_gather_flat():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = x_ref[i_ref[:]]
    x = jnp.arange(65536, dtype=jnp.int32)
    idx = (x * 131 + 7) % 65536
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((65536,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 4. scatter in VMEM
def k_scatter_flat():
    def kernel(x_ref, i_ref, o_ref):
        o_ref[i_ref[:]] = x_ref[:]
    x = jnp.arange(65536, dtype=jnp.int32)
    idx = (x * 131 + 7) % 65536
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((65536,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# 5. pltpu.roll
def k_roll():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=5, axis=1)
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# 6. cumsum inside kernel
def k_cumsum():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=0)
    x = jnp.ones((1024, 128), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# 7. sort inside kernel
def k_sort():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.sort(x_ref[:], axis=1)
    x = jnp.flip(jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128), 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


try_kernel("gather_lanes(take_along 1)", k_gather_lanes)
try_kernel("gather_sublanes(take_along 0)", k_gather_sublanes)
try_kernel("gather_flat", k_gather_flat)
try_kernel("scatter_flat", k_scatter_flat)
try_kernel("roll", k_roll)
try_kernel("cumsum", k_cumsum)
try_kernel("sort", k_sort)
print("done", flush=True)
