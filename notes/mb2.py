import sys; sys.path.insert(0, "/root/repo")
"""Rigorous TPU primitive timings.

Methodology: launch K reps back-to-back (device executes launches in
order), then force ONE host round-trip by fetching a scalar derived from
the last rep's output.  per-rep = (elapsed - roundtrip) / K.  Also checks
whether block_until_ready actually blocks on this platform.
"""
import os
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import time

import jax
import jax.numpy as jnp

REPS = int(os.environ.get("REPS", "8"))


def fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return leaf.ravel()[0].item() if leaf.size else 0


def roundtrip():
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.zeros((8,), jnp.int32)); fetch(y)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); y = f(y); fetch(y)
        best = min(best, time.perf_counter() - t0)
    return best


RT = roundtrip()
print(f"roundtrip {RT*1e3:.1f} ms", flush=True)


def timeit(name, f, *args, reps=REPS, rows=None):
    out = f(*args); fetch(out)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fetch(out)
    t = (time.perf_counter() - t0 - RT) / reps
    extra = f"  {rows/t/1e9:.2f} G rows/s" if rows else ""
    print(f"{name:40s} {t*1e3:8.2f} ms{extra}", flush=True)
    return t


N = 1 << 26  # 67M elements (~ headline 65.5M)
key = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1 << 30, jnp.int32)
pay = jnp.arange(N, dtype=jnp.int32)
fetch((key, pay))

# 0. does block_until_ready block?
big = jax.jit(lambda k: jnp.cumsum(k))
y = big(key); fetch(y)
t0 = time.perf_counter(); y = big(key); jax.block_until_ready(y)
t_bur = time.perf_counter() - t0
t0 = time.perf_counter(); fetch(y)
t_fetch = time.perf_counter() - t0
print(f"block_until_ready {t_bur*1e3:.1f} ms then fetch {t_fetch*1e3:.1f} ms "
      f"(if fetch >> 0, BUR does not block)", flush=True)

# 1. HBM bandwidth sanity: elementwise copy-add of 256MB in, 256MB out
timeit("x+1 (67M i32)", jax.jit(lambda k: k + 1), key, rows=N)

# 2. XLA full sort (1 key, 1 payload)
timeit("lax.sort 67M (k+p)", jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), key, pay, reps=3, rows=N)

# 3. pure Pallas block sort (sub=512), corner turns outside
from aqp_tpu.ops.pallas.blocksort import sort_blocks, to_colmajor, LANES
timeit("sort_blocks sub=512 (w/ layout xform)",
       lambda k, p: sort_blocks(k, p, 512), key, pay, rows=N)

# 3b. kernel only: pre-corner-turned input
import functools
from aqp_tpu.ops.pallas import blocksort as B
import jax.numpy as jnp
k_cm = to_colmajor(key, N // (512 * 128), 512)
p_cm = to_colmajor(pay, N // (512 * 128), 512)
fetch((k_cm, p_cm))

@functools.partial(jax.jit, static_argnames=("sub",))
def sort_cm(k2, p2, sub=512):
    from jax.experimental import pallas as pl
    nb = k2.shape[0] // sub
    return pl.pallas_call(
        B._sort_kernel(sub),
        grid=(nb,),
        in_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32)] * 2,
    )(k2, p2)

timeit("sort_blocks kernel-only sub=512", sort_cm, k_cm, p_cm, rows=N)

# 4. sort_hist (kernel-A as committed)
from aqp_tpu.ops.pallas.rho2 import sort_hist
scale = jnp.float32(16) / jnp.float32(1 << 30)
timeit("sort_hist sub=512 F1=16", lambda k, p: sort_hist(k, p, scale, 512, 16),
       key, pay, rows=N)

# 5. scatter_segments: realistic pass-1 shape (nb*F1 segments)
from aqp_tpu.ops.pallas.rho2 import scatter_segments, _plan
nb = N // (512 * 128)
ks1, ps1, starts1 = sort_hist(key, pay, scale, 512, 16)
c1_rows = -(-int((N // 128) / 16 / 0.85) // 512) * 512
soff1, doff1, sz1, ovf1 = _plan(nb, 512, starts1, 16, c1_rows)
fetch((ks1, soff1))
print(f"pass1 segments: {nb*16}  ovf={int(ovf1)}", flush=True)
timeit(f"scatter {nb*16} segs (~{N//128//(nb*16)} rows avg)",
       lambda a, b: scatter_segments(a, b, soff1, doff1, sz1, nb * 16,
                                     16 * c1_rows + 1),
       ks1, ps1, rows=N)

# 6. region_join on pass-1-shaped data (grouping approximate; timing only)
from aqp_tpu.ops.pallas.rho2 import region_join
lay_k = ks1[: (ks1.shape[0] // 512) * 512]
lay_p = ps1[: lay_k.shape[0]]
nregions = lay_k.shape[0] // 512
scale_g = jnp.float32(nregions) / jnp.float32(1 << 30)
timeit("region_join sub=512 (timing only)",
       lambda a, b: region_join(a, b, scale_g, 512, nregions)[0],
       lay_k, lay_p, reps=3, rows=N)
print("done", flush=True)
