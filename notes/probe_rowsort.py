import sys; sys.path.insert(0, "/root/repo")
"""Probe: XLA jnp.sort over independent rows vs Pallas bitonic; and a
gather-partner bitonic stage variant."""
import os
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import time

import jax
import jax.numpy as jnp
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


def timeit(name, f, *args, reps=4, rows=None):
    out = f(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(out)
    t = (time.perf_counter() - t0 - RT) / reps
    extra = f"  {rows/t/1e9:.2f} G rows/s" if rows else ""
    print(f"{name:44s} {t*1e3:8.2f} ms{extra}", flush=True)
    return t


N = 1 << 26
key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, jnp.int32)
pay = jnp.arange(N, dtype=jnp.int32)
fetch((key, pay))

# 1. XLA sort of (nb, 65536) rows, keys only
k2 = key.reshape(-1, 65536)
timeit("XLA jnp.sort rows 64K keys-only", jax.jit(lambda k: jnp.sort(k, axis=-1)), k2, reps=2, rows=N)

# 2. XLA lax.sort rows 64K (k,p)
p2 = pay.reshape(-1, 65536)
timeit("XLA lax.sort rows 64K (k,p)",
       jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=1, num_keys=1)),
       k2, p2, reps=2, rows=N)

# 3. Pallas bitonic, gather-based partner (single array, keys only)
LANES = 128

def _stage_g(k, j, box, sub):
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    if j < sub:
        srow = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        pk = pltpu.roll(k, j, axis=0)
        pk2 = pltpu.roll(k, sub - j, axis=0)
        take_plus = (srow & j) == 0
        pk = jnp.where(take_plus, pk2, pk)
        upper = (srow & j) != 0
    else:
        jl = j // sub
        pk = jnp.take_along_axis(k, lane ^ jl, axis=1)
        upper = (lane & jl) != 0
    if box < sub:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        desc = (dfield & box) != 0
    elif box < sub * LANES:
        desc = (lane & (box // sub)) != 0
    else:
        desc = jnp.zeros(k.shape, bool)
    want_hi = upper ^ desc
    lt = pk < k
    take = (want_hi ^ lt) & (pk != k)
    return jnp.where(take, pk, k)


def sort_kernel_g(sub):
    def kernel(k_ref, o_ref):
        k = k_ref[:]
        box = 2
        while box <= sub * LANES:
            j = box // 2
            while j >= 1:
                k = _stage_g(k, j, box, sub)
                j //= 2
            box *= 2
        o_ref[:] = k
    return kernel


from aqp_tpu.ops.pallas.blocksort import to_colmajor
SUB = 512
k_cm = to_colmajor(key, N // (SUB * LANES), SUB)
fetch(k_cm)

fg = jax.jit(lambda k: pl.pallas_call(
    sort_kernel_g(SUB),
    grid=(k.shape[0] // SUB,),
    in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((SUB, LANES), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct(k.shape, jnp.int32),
)(k))
out = fg(k_cm)
# correctness on first block
blk = out[:SUB].T.reshape(-1)  # column-major order
import numpy as np
b0 = np.asarray(k_cm[:SUB]).T.reshape(-1)
ok = bool(jnp.all(jnp.sort(jnp.asarray(b0)) == blk))
print("gather-partner keys-only sort correct:", ok, flush=True)
timeit("Pallas bitonic keys-only gather-partner", fg, k_cm, rows=N)

# 4. Pallas bitonic (k,p) with gather partner for lane strides
def _stage_g2(k, p, j, box, sub):
    lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
    if j < sub:
        srow = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        pk_m = pltpu.roll(k, j, axis=0); pk_p = pltpu.roll(k, sub - j, axis=0)
        pp_m = pltpu.roll(p, j, axis=0); pp_p = pltpu.roll(p, sub - j, axis=0)
        tp = (srow & j) == 0
        pk = jnp.where(tp, pk_p, pk_m); pp = jnp.where(tp, pp_p, pp_m)
        upper = (srow & j) != 0
    else:
        jl = j // sub
        idx = lane ^ jl
        pk = jnp.take_along_axis(k, idx, axis=1)
        pp = jnp.take_along_axis(p, idx, axis=1)
        upper = (lane & jl) != 0
    if box < sub:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        desc = (dfield & box) != 0
    elif box < sub * LANES:
        desc = (lane & (box // sub)) != 0
    else:
        desc = jnp.zeros(k.shape, bool)
    want_hi = upper ^ desc
    lt = pk < k
    take = (want_hi ^ lt) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def sort_kernel_g2(sub):
    def kernel(k_ref, p_ref, ok_ref, op_ref):
        k = k_ref[:]; p = p_ref[:]
        box = 2
        while box <= sub * LANES:
            j = box // 2
            while j >= 1:
                k, p = _stage_g2(k, p, j, box, sub)
                j //= 2
            box *= 2
        ok_ref[:] = k; op_ref[:] = p
    return kernel


p_cm = to_colmajor(pay, N // (SUB * LANES), SUB)
fetch(p_cm)
fg2 = jax.jit(lambda k, p: pl.pallas_call(
    sort_kernel_g2(SUB),
    grid=(k.shape[0] // SUB,),
    in_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * 2,
    out_specs=[pl.BlockSpec((SUB, LANES), lambda i: (i, 0))] * 2,
    out_shape=[jax.ShapeDtypeStruct(k.shape, jnp.int32)] * 2,
)(k, p))
out = fg2(k_cm, p_cm); fetch(out)
timeit("Pallas bitonic (k,p) gather-partner", fg2, k_cm, p_cm, rows=N)
print("done", flush=True)
