"""Microbenchmark core primitives on the real TPU chip to ground kernel design.

Measures: sort, argsort-by-key, gather, unique scatter, scatter-min,
bincount/segment_sum, one-hot matmul, cumsum. Results inform which join
strategy (sort-based, hash-scatter-based, or partition+dense-compare) is
fastest on this hardware.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

dev = jax.devices()[0]
print("device:", dev, flush=True)


def bench(fn, *args, iters=5, warmup=2):
    fn = jax.jit(fn)
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
for N in [1 << 24, 1 << 27]:
    Nm = N / 1e6
    print(f"\n=== N = {N} ({Nm:.0f}M) ===", flush=True)
    k1, k2, k3 = jax.random.split(key, 3)
    keys32 = jax.random.randint(k1, (N,), 0, 1 << 30, dtype=jnp.int32)
    vals32 = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32)
    perm = jax.random.permutation(k3, N)  # unique indices
    ridx = jax.random.randint(k1, (N,), 0, N, dtype=jnp.int32)  # random w/ dup

    t = bench(lambda x: x + 1, keys32)
    print(f"elementwise add:        {t*1e3:8.2f} ms  {N*8/t/1e9:8.1f} GB/s (r+w)")

    t = bench(lambda x: jnp.cumsum(x), keys32)
    print(f"cumsum:                 {t*1e3:8.2f} ms  {N*8/t/1e9:8.1f} GB/s")

    t = bench(lambda x: jax.lax.sort(x), keys32)
    print(f"sort 1xi32:             {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(lambda x, y: jax.lax.sort((x, y)), keys32, vals32)
    print(f"sort pair i32:          {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    # sort by 8-bit key only (radix partition analog)
    t = bench(lambda x, y: jax.lax.sort((x & 255, y)), keys32, vals32)
    print(f"sort by 8-bit key:      {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(lambda x, i: x[i], vals32, perm)
    print(f"gather perm:            {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(lambda x, i: x[i], vals32, ridx)
    print(f"gather random:          {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(
        lambda x, i: jnp.zeros(N, jnp.int32).at[i].set(x, unique_indices=True, mode="drop"),
        vals32, perm)
    print(f"scatter unique(perm):   {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(lambda x, i: jnp.zeros(N, jnp.int32).at[i].min(x, mode="drop"), vals32, ridx)
    print(f"scatter-min random:     {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    t = bench(lambda x: jnp.bincount(x & 255, length=256), keys32)
    print(f"bincount 256:           {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    # one-hot histogram via matmul (MXU): blocks of (B,256) one-hot summed
    def hist_matmul(x):
        b = (x & 255).reshape(-1, 256)
        oh = (b[:, :, None] == jnp.arange(256)[None, None, :]).astype(jnp.bfloat16)
        return oh.sum((0, 1))
    t = bench(hist_matmul, keys32)
    print(f"hist via one-hot sum:   {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

    # searchsorted (binary search): S into sorted R
    sortedk = jnp.sort(keys32)
    t = bench(lambda s, r: jnp.searchsorted(r, s), vals32, sortedk)
    print(f"searchsorted:           {t*1e3:8.2f} ms  {N/t/1e6:8.1f} Mrows/s")

print("\ndone", flush=True)
