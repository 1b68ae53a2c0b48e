import sys; sys.path.insert(0, "/root/repo")
"""Batched TPU measurements: XLA sort scaling, join phase breakdown,
pallas IO floor (amortized, overhead-corrected)."""
import time
import jax, jax.numpy as jnp
import numpy as np

def ping():
    t0 = time.perf_counter()
    v = int(jnp.sum(jnp.arange(16)))
    print(f"ping ok ({time.perf_counter()-t0:.1f}s)", flush=True)

ping()

def overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    int(f(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        int(f(tiny))
    return (time.perf_counter() - t0) / 5

OH = overhead()
print(f"overhead {OH*1e3:.1f} ms", flush=True)

def timed(label, f, *args, work_rows=None, K=1):
    int(f(*args))
    t0 = time.perf_counter(); int(f(*args)); t1 = time.perf_counter()
    dt = max((t1 - t0 - OH) / K, 1e-9)
    r = f"{label:34s} {dt*1e3:9.2f} ms"
    if work_rows:
        r += f"  {work_rows/dt/1e6:9.1f} M rows/s"
    print(r, flush=True)
    return dt

# 1. XLA sort scaling (single-key 2-array, the join's core op), K=2 in-jit
for logn in (23, 24, 25, 26):
    N = 1 << logn
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.randint(k1, (N,), 0, 1 << 30, dtype=jnp.int32)
    b = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32)
    jax.block_until_ready((a, b))

    @jax.jit
    def f2(a, b):
        s1, p1 = jax.lax.sort((a, b), num_keys=1)
        s2, p2 = jax.lax.sort((a ^ 1, b), num_keys=1)
        return s1[0] + s2[0] + p1[0] + p2[0]

    timed(f"sort pair 2^{logn}", f2, a, b, work_rows=N, K=2)

# 2. join phase breakdown at headline size
from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops import mergejoin

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=11111)
relS = create_relation_fk(NS, NR, seed=22222)
jax.block_until_ready((relR.key, relS.key))
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload

@jax.jit
def phase_sort(rk, rp, sk, sp):
    skey = jnp.concatenate([rk << 1, (sk << 1) | 1])
    pay = jnp.concatenate([rp, sp])
    a, b = jax.lax.sort((skey, pay), num_keys=1)
    return a[0] + b[0]

timed("join: union sort only", phase_sort, rk, rp, sk, sp, work_rows=NR + NS)

@jax.jit
def phase_full(rk, rp, sk, sp):
    out = mergejoin.merge_join_count(rk, rp, sk, sp)
    return out.matches + out.checksum.astype(jnp.int32)

timed("join: full count", phase_full, rk, rp, sk, sp, work_rows=NR + NS)

@jax.jit
def phase_scan_only(rk, rp, sk, sp):
    # fill-forward + match/checksum on PRE-SORTED data (sort cost excluded)
    sk2, spay, match, prop = mergejoin.join_sorted_union(rk, rp, sk, sp)
    m = jnp.sum(match, dtype=jnp.int32)
    return m

# pre-sort inputs so union sort inside is cheap(er)? XLA can't exploit; skip.

# 3. pallas IO floor, amortized via in-jit loop over pallas_call
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 26
BR = 1024
tiles = N // (BR * 128)
shape = (tiles * BR, 128)
x = jnp.arange(N, dtype=jnp.int32).reshape(shape)
jax.block_until_ready(x)

def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1

pc = pl.pallas_call(
    k_copy,
    grid=(tiles,),
    in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
)

@jax.jit
def floop(x):
    def it(i, acc):
        y = pc(x + i)
        return acc + y[0, 0]
    return jax.lax.fori_loop(0, 8, it, jnp.int32(0))

dt = timed("pallas copy 256MB io x8", floop, x, K=8)
print(f"  -> pallas io rate {(N*4*3)/dt/1e9:.0f} GB/s (r+w+extra r)", flush=True)
print("done", flush=True)
