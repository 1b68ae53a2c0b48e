import sys; sys.path.insert(0, "/root/repo")
"""Probe 2: lane-gather width limits + throughput on TPU.

If gather works at wide lane dims (indices spanning > 128), a dense-LUT
probe join becomes possible and S-side sorting collapses.
"""
import os
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return jax.tree_util.tree_leaves(x)[0].ravel()[0].item()


def rt():
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.zeros((8,), jnp.int32)); fetch(y)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); y = f(y); fetch(y)
        best = min(best, time.perf_counter() - t0)
    return best


RT = rt()
print(f"rt {RT*1e3:.1f} ms", flush=True)

# --- correctness at increasing widths
for W in (128, 256, 512, 2048, 8192):
    S = max(8, 2048 // W * 8)
    key = jax.random.PRNGKey(W)
    x = jax.random.randint(key, (S, W), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(W + 1), (S, W), 0, W, jnp.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    try:
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((S, W), jnp.int32))(x, idx)
        want = jnp.take_along_axis(x, idx, axis=1)
        print(f"W={W:6d} LOWERED correct={bool(jnp.all(out == want))}", flush=True)
    except Exception as e:
        print(f"W={W:6d} FAIL: {str(e).splitlines()[0][:100]}", flush=True)

# --- throughput at W=128: big grid, gather-heavy kernel (16 gathers/elem)
SUB, L, NB = 512, 128, 256  # 16.7M elements
x = jax.random.randint(jax.random.PRNGKey(0), (SUB * NB, L), 0, 1 << 20, jnp.int32)
idx = jax.random.randint(jax.random.PRNGKey(1), (SUB * NB, L), 0, L, jnp.int32)
fetch((x, idx))
G = 16

def kg(x_ref, i_ref, o_ref):
    v = x_ref[:]
    i = i_ref[:]
    acc = jnp.zeros_like(v)
    for t in range(G):
        v2 = jnp.take_along_axis(v, (i + t) & (L - 1), axis=1)
        acc = acc + v2
    o_ref[:] = acc

f = jax.jit(lambda a, b: pl.pallas_call(
    kg,
    grid=(NB,),
    in_specs=[pl.BlockSpec((SUB, L), lambda i: (i, 0))] * 2,
    out_specs=pl.BlockSpec((SUB, L), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((SUB * NB, L), jnp.int32),
)(a, b))
out = f(x, idx); fetch(out)
reps = 6
t0 = time.perf_counter()
for _ in range(reps):
    out = f(x, idx)
fetch(out)
t = (time.perf_counter() - t0 - RT) / reps
n = SUB * NB * L
print(f"gather x{G} on {n/1e6:.0f}M elems: {t*1e3:.2f} ms -> "
      f"{n*G/t/1e9:.1f} G gathers/s ({t/ (n/1e9)/G*1e3:.3f} ns/gather/elem)", flush=True)

# --- compare: same shape, 16 adds (VPU baseline)
def ka(x_ref, i_ref, o_ref):
    v = x_ref[:]
    i = i_ref[:]
    acc = jnp.zeros_like(v)
    for t in range(G):
        acc = acc + (v ^ i) + t
    o_ref[:] = acc

fa = jax.jit(lambda a, b: pl.pallas_call(
    ka,
    grid=(NB,),
    in_specs=[pl.BlockSpec((SUB, L), lambda i: (i, 0))] * 2,
    out_specs=pl.BlockSpec((SUB, L), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((SUB * NB, L), jnp.int32),
)(a, b))
out = fa(x, idx); fetch(out)
t0 = time.perf_counter()
for _ in range(reps):
    out = fa(x, idx)
fetch(out)
t = (time.perf_counter() - t0 - RT) / reps
print(f"2-op VPU x{G} same shape: {t*1e3:.2f} ms -> {n*G*2/t/1e12:.2f} T ops/s",
      flush=True)
print("done", flush=True)
