import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp

N = 1 << 28
col8 = (jnp.arange(N, dtype=jnp.int32) & 255).astype(jnp.uint8)
col32 = jax.lax.bitcast_convert_type(col8.reshape(-1, 4), jnp.int32).reshape(-1)
jax.block_until_ready((col8, col32))
K = 32

def amortized(label, body, *args, bytes_per=N):
    @jax.jit
    def f(*a):
        def it(i, acc):
            return acc + body(i, *a)
        return jax.lax.fori_loop(0, K, it, jnp.int32(0))
    int(f(*args))
    t0 = time.perf_counter(); int(f(*args)); t1 = time.perf_counter()
    dt = (t1 - t0) / K
    print(f"{label:30s} {dt*1e3:8.3f} ms/iter  {bytes_per/dt/1e9:7.1f} GB/s", flush=True)

amortized("scan_count u8",
          lambda i, c: jnp.sum(((c >= (32 + i).astype(jnp.uint8)) & (c <= jnp.uint8(96))).astype(jnp.int32), dtype=jnp.int32), col8)
amortized("scan_count i32-swar",
          lambda i, c: jnp.sum(sum((((c >> (8 * k)) & 255 >= 32 + i) & ((c >> (8 * k)) & 255 <= 96)).astype(jnp.int32) for k in range(4)), dtype=jnp.int32), col32)
amortized("sum i32", lambda i, c: jnp.sum(c + i, dtype=jnp.int32), col32)
print("done", flush=True)
