"""Probe: where do the pack step's ~25 ms go? Variants:
  A concat-only     B concat+hash+tag arithmetic (current front end)
  C hash per-array then concat (no zeros/ones concat)
  D reshape-only sum floor
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas.rho3 import HASH_C, HASH_MASK

NR, NS = 13_107_200, 52_428_800
relR = create_relation_pk(NR, seed=11111)
relS = create_relation_fk(NS, NR, seed=22222)
rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
jax.block_until_ready((rk, sk))

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 5
print(f"overhead {OH*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=6):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.asarray(r).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {max(best - OH, 0)*1e3:.1f} ms", flush=True)


@jax.jit
def A(rk, sk):
    x = jnp.concatenate([rk, sk])
    return jnp.sum(x[::65536], dtype=jnp.int32)


@jax.jit
def B(rk, rp, sk, sp):
    cmul = jnp.int32(HASH_C)
    sig = jnp.concatenate([rk * cmul, sk * cmul]) & HASH_MASK
    tag = jnp.concatenate([jnp.zeros_like(rk), jnp.ones_like(sk)])
    packed = (sig << 1) | tag
    pay = jnp.concatenate([rp, sp])
    return jnp.sum(packed[::65536], dtype=jnp.int32) + pay[0]


@jax.jit
def C(rk, rp, sk, sp):
    cmul = jnp.int32(HASH_C)
    pr = (((rk * cmul) & HASH_MASK) << 1)
    ps = (((sk * cmul) & HASH_MASK) << 1) | 1
    packed = jnp.concatenate([pr, ps])
    pay = jnp.concatenate([rp, sp])
    return jnp.sum(packed[::65536], dtype=jnp.int32) + pay[0]


@jax.jit
def C2(rk, sk):
    cmul = jnp.int32(HASH_C)
    pr = (((rk * cmul) & HASH_MASK) << 1)
    ps = (((sk * cmul) & HASH_MASK) << 1) | 1
    packed = jnp.concatenate([pr, ps])
    return jnp.sum(packed[::65536], dtype=jnp.int32)


@jax.jit
def D(rk, sk):
    a = jnp.sum(rk.reshape(-1, 128)[:, :1], dtype=jnp.int32)
    b = jnp.sum(sk.reshape(-1, 128)[:, :1], dtype=jnp.int32)
    return a + b


@jax.jit
def E(rk, sk):
    """full-reduction floor: read everything once"""
    return jnp.sum(rk, dtype=jnp.int32) + jnp.sum(sk, dtype=jnp.int32)


timeit("E  full-read sum floor", E, rk, sk)
timeit("D  strided sum floor", D, rk, sk)
timeit("A  concat only", A, rk, sk)
timeit("C2 hash+concat keys-only", C2, rk, sk)
timeit("C  hash+concat k&p", C, rk, rp, sk, sp)
timeit("B  current front end", B, rk, rp, sk, sp)
