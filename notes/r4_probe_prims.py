"""Round-4 primitive cost probes on the real chip.

Grounds the engine-overhaul design (VERDICT r3 task 1): measures the XLA
primitives the staged engines lean on (gather, searchsorted, sort) vs the
fused cores, plus the VMEM scratch ceiling for the one-level pipeline idea.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.ops import mergejoin

NR, NS = 13107200, 52428800


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


key = jax.random.PRNGKey(0)
rk = jax.random.permutation(key, jnp.arange(1, NR + 1, dtype=jnp.int32))
rp = rk
sk = jnp.tile(jnp.arange(1, NR + 1, dtype=jnp.int32), NS // NR)
sk = jax.random.permutation(jax.random.PRNGKey(1), sk)
sp = sk
jax.block_until_ready((rk, sk))

srt = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
print("sort 13M pairs      ", timeit(srt, rk, rp))
print("sort 52M pairs      ", timeit(srt, sk, sp))
srt1 = jax.jit(lambda k: jax.lax.sort(k))
print("sort 52M keys-only  ", timeit(srt1, sk))

tbl = jnp.arange(1 << 25, dtype=jnp.int32)
ridx = jax.random.randint(jax.random.PRNGKey(2), (NS,), 0, 1 << 25)
midx = jnp.sort(ridx)
g = jax.jit(lambda t, i: t[i])
print("gather 52M random   ", timeit(g, tbl, ridx))
print("gather 52M monotone ", timeit(g, tbl, midx))

rks = jnp.sort(rk)
ss_sort = jax.jit(lambda a, v: jnp.searchsorted(a, v, method="sort"))
ss_scan = jax.jit(lambda a, v: jnp.searchsorted(a, v, method="scan_unrolled"))
print("searchsorted 52M->13M method=sort ", timeit(ss_sort, rks, sk))
try:
    print("searchsorted 52M->13M scan_unroll ", timeit(ss_scan, rks, sk))
except Exception as e:
    print("scan_unrolled failed:", e)

sc = jax.jit(lambda i: jnp.zeros((1 << 25,), jnp.int32).at[i].add(1))
print("scatter-add 52M     ", timeit(sc, ridx))

print("merge_join_count        ", timeit(
    mergejoin.merge_join_count, rk, rp, sk, sp))
print("merge_join_count_general", timeit(
    mergejoin.merge_join_count_general, rk, rp, sk, sp))

# 2-key sort (bucket, key) for the RSM shape
srt2 = jax.jit(lambda b, k, p: jax.lax.sort((b, k, p), num_keys=2))
bk = sk & 255
print("sort 52M 2-key      ", timeit(srt2, bk, sk, sp))
