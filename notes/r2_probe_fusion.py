"""Probe 4: does Mosaic fuse CHAINS of bitonic stages into few VMEM passes?

Measure k-stage chains of each stage flavor at full data (65.5M pairs):
  - lane-gather stages (take_along_axis, static idx)
  - sublane-roll stages (pltpu.roll pairs)
  - cross-tile static-slice stages (already known to fuse)
If cost(chain of k) << k * cost(1), fusion works.
"""
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
ROWS = 512 * 1024
WIN = 2048

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 5
print(f"overhead {OH*1e3:.1f} ms", flush=True)

key = jax.random.randint(jax.random.PRNGKey(0), (ROWS, LANES), 0, 1 << 30,
                         jnp.int32)
pay = jax.random.randint(jax.random.PRNGKey(1), (ROWS, LANES), 0, 1 << 30,
                         jnp.int32)
jax.block_until_ready((key, pay))


def bench(kernel, name, reps=3):
    try:
        fn = jax.jit(lambda k, p: pl.pallas_call(
            kernel,
            grid=(ROWS // WIN,),
            in_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
            out_specs=[pl.BlockSpec((WIN, LANES), lambda i: (i, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
        )(k, p))
        o = fn(key, pay)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(key, pay)
            _ = o[0][0, 0].item()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:52s} {best*1e3 - OH*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:140]}", flush=True)


def lane_stage(k, p, j, box, lane):
    idx = lane ^ j
    pk = jnp.take_along_axis(k, idx, axis=1)
    pp = jnp.take_along_axis(p, idx, axis=1)
    upper = (lane & j) != 0
    desc = (lane & box) != 0 if box <= 64 else jnp.zeros(k.shape, bool)
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def make_lane_chain(n):
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        js = [64, 32, 16, 8, 4, 2, 1][:n] if n <= 7 else (
            [64, 32, 16, 8, 4, 2, 1] * 3)[:n]
        for j in js:
            k, p = lane_stage(k, p, j, 128, lane)
        ok[:] = k
        op[:] = p
    return kernel

bench(make_lane_chain(1), "lane-gather stage x1")
bench(make_lane_chain(7), "lane-gather stage x7")
bench(make_lane_chain(14), "lane-gather stage x14")


def subl_stage(k, p, j, box, subl):
    r1k = pltpu.roll(k, j, axis=0)
    r2k = pltpu.roll(k, WIN - j, axis=0)
    r1p = pltpu.roll(p, j, axis=0)
    r2p = pltpu.roll(p, WIN - j, axis=0)
    take_plus = (subl & j) == 0
    pk = jnp.where(take_plus, r2k, r1k)
    pp = jnp.where(take_plus, r2p, r1p)
    upper = (subl & j) != 0
    desc = (subl & box) != 0
    want_hi = upper ^ desc
    take = (want_hi ^ (pk < k)) & (pk != k)
    return jnp.where(take, pk, k), jnp.where(take, pp, p)


def make_subl_chain(js):
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        subl = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        for j in js:
            k, p = subl_stage(k, p, j, 8, subl)
        ok[:] = k
        op[:] = p
    return kernel

bench(make_subl_chain([1]), "sublane-roll stage x1 (j=1)")
bench(make_subl_chain([4, 2, 1]), "sublane-roll stage x3 (j=4,2,1)")
bench(make_subl_chain([4, 2, 1] * 3), "sublane-roll stage x9")


# mixed in-tile 10-stage pass (j=512..1 rows-major fine part):
# j expressed in elements: lane strides 64..1 (7 lane stages) +
# element-strides 128,256,512 = sublane strides 1,2,4
def make_intile10():
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        for j in (4, 2, 1):
            k, p = subl_stage(k, p, j, 8, subl)
        for j in (64, 32, 16, 8, 4, 2, 1):
            k, p = lane_stage(k, p, j, 128, lane)
        ok[:] = k
        op[:] = p
    return kernel

bench(make_intile10(), "in-tile 10-stage pass (3 subl + 7 lane)")


# full 55-stage tile sort as full-array ops (boxes 2..1024, lane-major)
def make_tilesort55():
    def kernel(k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        box = 2
        while box <= 1024:
            j = box // 2
            while j >= 1:
                if j < 128:
                    idx = lane ^ j
                    pk = jnp.take_along_axis(k, idx, axis=1)
                    pp = jnp.take_along_axis(p, idx, axis=1)
                    upper = (lane & j) != 0
                else:
                    js = j // 128
                    r1k = pltpu.roll(k, js, axis=0)
                    r2k = pltpu.roll(k, WIN - js, axis=0)
                    r1p = pltpu.roll(p, js, axis=0)
                    r2p = pltpu.roll(p, WIN - js, axis=0)
                    tp = (subl & js) == 0
                    pk = jnp.where(tp, r2k, r1k)
                    pp = jnp.where(tp, r2p, r1p)
                    upper = (subl & js) != 0
                if box < 128:
                    desc = (lane & box) != 0
                elif box <= 512:
                    desc = (subl & (box // 128)) != 0
                else:
                    desc = (subl & 8) != 0  # alternate 8-row tiles
                want_hi = upper ^ desc
                take = (want_hi ^ (pk < k)) & (pk != k)
                k = jnp.where(take, pk, k)
                p = jnp.where(take, pp, p)
                j //= 2
            box *= 2
        ok[:] = k
        op[:] = p
    return kernel

bench(make_tilesort55(), "full 55-stage tile sort (full-array ops)")
