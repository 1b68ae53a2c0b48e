"""Probe 2: bitonic sort cost vs sub (block size), and a leaner min/max
stage formulation vs the round-1 stage."""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

LANES = 128
N = 500 * 1024 * LANES  # 65.5M

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 5
print(f"overhead {OH*1e3:.1f} ms", flush=True)

key = jax.random.randint(jax.random.PRNGKey(0), (N // LANES, LANES), 0,
                         1 << 30, jnp.int32)
pay = jax.random.randint(jax.random.PRNGKey(1), (N // LANES, LANES), 0,
                         1 << 30, jnp.int32)
jax.block_until_ready((key, pay))


def bench(kernel, sub, name, reps=3):
    nb = N // (sub * LANES)
    try:
        fn = jax.jit(lambda k, p: pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
            out_specs=[pl.BlockSpec((sub, LANES), lambda i: (i, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((nb * sub, LANES), jnp.int32)] * 2,
        )(k, p))
        o = fn(key, pay)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(key, pay)
            _ = o[0][0, 0].item()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:44s} {best*1e3 - OH*1e3:8.1f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:150]}", flush=True)


# ---- round-1 stage at various sub
def make_old(sub):
    from aqp_tpu.ops.pallas.blocksort import bitonic_sort_pairs
    def kernel(k_ref, p_ref, ok, op):
        k, p = bitonic_sort_pairs(k_ref[:], p_ref[:], sub, True)
        ok[:] = k
        op[:] = p
    return kernel

for sub in (256, 512, 1024, 2048):
    bench(make_old(sub), sub, f"r1 stage, sub={sub}")


# ---- lean min/max stage
def lean_stage(k, p, j, box, sub):
    if j < sub:
        r1k = pltpu.roll(k, j, axis=0)        # [i] <- [i-j]
        r2k = pltpu.roll(k, sub - j, axis=0)  # [i] <- [i+j]
        r1p = pltpu.roll(p, j, axis=0)
        r2p = pltpu.roll(p, sub - j, axis=0)
        field = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        upper = (field & j) != 0
    else:
        jl = j // sub
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        idx = lane ^ jl
        r1k = r2k = jnp.take_along_axis(k, idx, axis=1)
        r1p = r2p = jnp.take_along_axis(p, idx, axis=1)
        upper = (lane & jl) != 0
    if box < sub:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        desc = (dfield & box) != 0
    elif box < sub * LANES:
        dfield = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        desc = (dfield & (box // sub)) != 0
    else:
        desc = None
    want_hi = upper if desc is None else (upper ^ desc)
    # lower element wants min(self, [i+j]); upper wants max(self, [i-j])
    lo = jnp.minimum(k, r2k)
    hi = jnp.maximum(k, r1k)
    k2 = jnp.where(want_hi, hi, lo)
    take = k2 != k
    pp = jnp.where(want_hi, r1p, r2p)
    p2 = jnp.where(take, pp, p)
    return k2, p2


def make_lean(sub):
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        box = 2
        while box <= sub * LANES:
            j = box // 2
            while j >= 1:
                k, p = lean_stage(k, p, j, box, sub)
                j //= 2
            box *= 2
        ok[:] = k
        op[:] = p
    return kernel

for sub in (512, 1024):
    bench(make_lean(sub), sub, f"lean minmax stage, sub={sub}")


# ---- merge-only network (runs of 4096 = 32 rows pre-sorted): boxes 8192..end
def make_merge(sub, run):
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        box = 2 * run
        while box <= sub * LANES:
            j = box // 2
            while j >= 1:
                k, p = lean_stage(k, p, j, box, sub)
                j //= 2
            box *= 2
        ok[:] = k
        op[:] = p
    return kernel

bench(make_merge(1024, 4096), 1024, "merge-only from 4096-runs, sub=1024")
bench(make_merge(1024, 8192), 1024, "merge-only from 8192-runs, sub=1024")
