import sys; sys.path.insert(0, "/root/repo")
"""Why is scan_count 8.9 GB/s? Measure variants."""
import time
import jax, jax.numpy as jnp
import numpy as np

N = 1 << 28  # 268M bytes
col8 = (jnp.arange(N, dtype=jnp.int32) & 255).astype(jnp.uint8)
col8_2d = col8.reshape(-1, 1024)
col32 = jax.lax.bitcast_convert_type(col8.reshape(-1, 4), jnp.int32).reshape(-1)
jax.block_until_ready((col8, col8_2d, col32))


def timeit(label, f, *args, bytes_moved=N):
    r = int(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        r = int(f(*args))
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:30s} {dt*1e3:8.2f} ms  {bytes_moved/dt/1e9:6.1f} GB/s  result={r}", flush=True)


lo, hi = jnp.uint8(32), jnp.uint8(96)

timeit("mask->i32 sum (current)",
       jax.jit(lambda c: jnp.sum(((c >= lo) & (c <= hi)).astype(jnp.int32), dtype=jnp.int32)), col8)

timeit("mask->u8 sum 2d two-stage",
       jax.jit(lambda c: jnp.sum(jnp.sum(((c >= lo) & (c <= hi)).astype(jnp.int32), axis=1), dtype=jnp.int32)), col8_2d)

timeit("i32 view -> 4x byte extract",
       jax.jit(lambda c: sum(jnp.sum((((c >> (8 * k)) & 255 >= 32) & ((c >> (8 * k)) & 255 <= 96)).astype(jnp.int32), dtype=jnp.int32) for k in range(4))), col32)


def swar_count(c):
    # SWAR range check on 4 packed bytes per i32 lane
    total = jnp.int32(0)
    x = c
    m = jnp.int32(0)
    for k in range(4):
        b = (x >> (8 * k)) & 255
        m = m + (((b >= 32) & (b <= 96)).astype(jnp.int32))
    return jnp.sum(m, dtype=jnp.int32)


timeit("i32 swar", jax.jit(swar_count), col32)

# pure bandwidth reference on same data
timeit("sum u8 only", jax.jit(lambda c: jnp.sum(c, dtype=jnp.int32)), col8)
timeit("sum i32 view", jax.jit(lambda c: jnp.sum(c, dtype=jnp.int32)), col32)
print("done", flush=True)
