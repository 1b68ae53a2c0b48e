import sys; sys.path.insert(0, "/root/repo")
"""Measure VPU throughput for bitonic-style compare-exchange stages, lane
gather, one-hot construction, and small matmuls inside Pallas kernels."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

R, C = 512, 128  # tile: 64K elements


def bench_kernel(name, kernel, n_inputs=2, iters=20, tiles=1024, dtype=jnp.int32):
    """Run kernel over `tiles` grid steps, `iters` timed reps; report
    ns/element and effective ops/cycle assuming 940MHz."""
    shape = (tiles * R, C)
    xs = [jnp.arange(np.prod(shape), dtype=dtype).reshape(shape) % 65521 for _ in range(n_inputs)]
    pc = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0)) for _ in range(n_inputs)],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )
    f = jax.jit(lambda *a: jnp.sum(pc(*a), dtype=jnp.int32))
    try:
        int(f(*xs))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(3):
            s = int(f(*xs))
        dt = (time.perf_counter() - t0) / 3
        ne = np.prod(shape)
        print(f"{name:28s} {dt*1e3:8.2f} ms  {dt/ne*1e9:6.2f} ns/elem  {ne/ (dt*0.94e9):6.2f} elem/cycle", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e).split(chr(10))[0][:120]}", flush=True)


def k_copy(x_ref, y_ref, o_ref):
    o_ref[:] = x_ref[:] + y_ref[:]


def make_stages(n_stages):
    def kernel(x_ref, y_ref, o_ref):
        k = x_ref[:]
        p = y_ref[:]
        for s in range(n_stages):
            d = 1 << (s % 7)  # lane-stride partner via roll
            pk = pltpu.roll(k, shift=d, axis=1)
            pp = pltpu.roll(p, shift=d, axis=1)
            cond = k < pk
            k = jnp.where(cond, k, pk)
            p = jnp.where(cond, p, pp)
        o_ref[:] = k + p
    return kernel


def k_sublane_stage(x_ref, y_ref, o_ref):
    k = x_ref[:]
    p = y_ref[:]
    for s in range(16):
        d = 8 << (s % 4)
        pk = pltpu.roll(k, shift=d, axis=0)
        pp = pltpu.roll(p, shift=d, axis=0)
        cond = k < pk
        k = jnp.where(cond, k, pk)
        p = jnp.where(cond, p, pp)
    o_ref[:] = k + p


def k_lane_gather16(x_ref, y_ref, o_ref):
    k = x_ref[:]
    idx = y_ref[:] & 127
    for s in range(16):
        k = jnp.take_along_axis(k, idx, axis=1)
    o_ref[:] = k


def k_onehot_hist(x_ref, y_ref, o_ref):
    # one-hot (R,C) keys vs 128 buckets accumulated: emulate histogram cost
    k = x_ref[:] & 127
    acc = jnp.zeros((R, C), jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    for s in range(8):
        acc = acc + (((k + s) & 127) == iota).astype(jnp.int32)
    o_ref[:] = acc


def k_matmul(x_ref, y_ref, o_ref):
    a = (x_ref[:] & 1).astype(jnp.bfloat16)  # (512,128)
    b = (y_ref[:128, :] & 255).astype(jnp.bfloat16)  # (128,128)
    o_ref[:] = jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.int32)


bench_kernel("copy+add", k_copy)
bench_kernel("cmpex_lane x8", make_stages(8))
bench_kernel("cmpex_lane x32", make_stages(32))
bench_kernel("cmpex_lane x128", make_stages(128))
bench_kernel("cmpex_sublane x16", k_sublane_stage)
bench_kernel("lane_gather x16", k_lane_gather16)
bench_kernel("onehot x8 (128w)", k_onehot_hist)
bench_kernel("matmul 512x128x128", k_matmul)
print("done", flush=True)
