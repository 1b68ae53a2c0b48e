import sys; sys.path.insert(0, "/root/repo")
import sys, time, jax, jax.numpy as jnp
from aqp_tpu.ops import mergejoin

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
a = jax.random.randint(k1, (N,), 0, 1 << 30, dtype=jnp.int32)
b = jax.random.randint(k2, (N,), 0, 1 << 30, dtype=jnp.int32)

def timed(name, f, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    t1 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    t2 = time.perf_counter()
    print(f"{name}: compile+run {t1-t0:.2f}s, run {t2-t1:.3f}s", flush=True)

timed("sortpair", jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=1)), a, b)
timed("cummax", jax.jit(lambda x: jax.lax.cummax(x)), a)
timed("assoc_scan3", jax.jit(lambda x, y: mergejoin._last_valid_scan(x > 0, x, y)), a, b)
timed("mergejoin", mergejoin.merge_join_count, a[:N//2], b[:N//2], a, b)
