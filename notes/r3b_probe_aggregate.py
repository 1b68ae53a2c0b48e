"""Probe: aggregate/group-by strategies on the chip at bench shape.

Current groupby_aggregate = one lax.sort(67M pairs) + prefix diff
(~52 M rows/s in bench.py).  Each candidate returns its FULL outputs so
XLA cannot DCE the work (v1 of this probe returned x[0] and measured
a rewritten reduce-min at "555 G rows/s").

Workload: keys = join-output S keys (FK into 13.1M dense R keys), n = 64M.
"""
import os, sys, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 26
K = 13_107_200
REPS = 4

key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, K, jnp.int32)
pay = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 1 << 30, jnp.int32)
jax.block_until_ready((key, pay))


def timeit(name, f):
    r = f(); jax.block_until_ready(r)
    t0 = time.monotonic()
    for _ in range(REPS):
        r = f()
    jax.block_until_ready(r)
    dt = (time.monotonic() - t0) / REPS
    print(f"{name:30s} {dt*1e3:9.2f} ms   {N/dt/1e6:8.1f} M rows/s")
    return r


timeit("A pair lax.sort",
       jax.jit(lambda: jax.lax.sort((key, pay), num_keys=2)))
timeit("A' key-only lax.sort",
       jax.jit(lambda: jax.lax.sort((key,))[0]))
timeit("B scatter count+sum", jax.jit(lambda: (
    jnp.zeros((K,), jnp.int32).at[key].add(1, mode="drop"),
    jnp.zeros((K,), jnp.uint32).at[key].add(pay.astype(jnp.uint32),
                                            mode="drop"))))
timeit("B scatter min+max", jax.jit(lambda: (
    jnp.full((K,), 2**31 - 1, jnp.int32).at[key].min(pay, mode="drop"),
    jnp.zeros((K,), jnp.int32).at[key].max(pay, mode="drop"))))
timeit("B' scatter count only",
       jax.jit(lambda: jnp.zeros((K,), jnp.int32).at[key].add(1, mode="drop")))
timeit("B'' all four in one jit", jax.jit(lambda: (
    jnp.zeros((K,), jnp.int32).at[key].add(1, mode="drop"),
    jnp.zeros((K,), jnp.uint32).at[key].add(pay.astype(jnp.uint32), mode="drop"),
    jnp.full((K,), 2**31 - 1, jnp.int32).at[key].min(pay, mode="drop"),
    jnp.zeros((K,), jnp.int32).at[key].max(pay, mode="drop"))))

from aqp_tpu.ops.aggregate import groupby_aggregate
timeit("E groupby_aggregate (cur)",
       lambda: groupby_aggregate(key, pay, 1 << 24))
