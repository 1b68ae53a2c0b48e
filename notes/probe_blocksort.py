import sys; sys.path.insert(0, "/root/repo")
"""Measure Pallas block bitonic sort on TPU (amortized)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from aqp_tpu.ops.pallas.blocksort import sort_blocks, BLOCK

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

N = BLOCK * 512  # 33.5M
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
key = jax.random.randint(k1, (N,), 0, 1 << 30, dtype=jnp.int32)
pay = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32)
jax.block_until_ready((key, pay))

@jax.jit
def f(key, pay):
    ok1, op1 = sort_blocks(key, pay)
    ok2, op2 = sort_blocks(key ^ 1, pay)
    return ok1[0] + op1[0] + ok2[0] + op2[0]

print("compiling...", flush=True)
t0 = time.perf_counter()
int(f(key, pay))
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
int(f(key, pay))
dt = max((time.perf_counter() - t0 - OH) / 2, 1e-9)
print(f"block-sort 33.5M pairs: {dt*1e3:.2f} ms  {N/dt/1e6:.0f} M rows/s", flush=True)

# correctness spot check on TPU
ok, op = sort_blocks(key[:BLOCK], pay[:BLOCK])
oknp = np.asarray(ok)
assert np.all(np.diff(oknp) >= 0), "block not sorted!"
knp = np.asarray(key[:BLOCK])
pnp = np.asarray(pay[:BLOCK])
got = sorted(zip(oknp.tolist(), np.asarray(op).tolist()))
exp = sorted(zip(knp.tolist(), pnp.tolist()))
assert got == exp, "pair integrity"
print("correct on TPU", flush=True)
print("done", flush=True)
