"""Split K1 cost: sort vs slot-extraction, with amortized multi-call timing."""
import os, time
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.ops.pallas import rho3
from aqp_tpu.ops.pallas.rho3 import Rho3Params, _extract_slots, _fine_bucket
from aqp_tpu.ops.pallas.netsort import LANES, sort_pairs

prm = Rho3Params()
W = prm.block_rows
NB = 512
gmax = prm.f1 * prm.f2

key = jax.random.PRNGKey(0)
kw = jax.random.randint(key, (NB * W, LANES), 0, 1 << 30, jnp.int32) << 1
pw = jax.random.randint(jax.random.PRNGKey(1), (NB * W, LANES), 0, 1 << 30,
                        jnp.int32)
scale = jnp.float32(gmax / (1 << 30) * (1.0 - 1e-6)).reshape(1)
jax.block_until_ready((kw, pw))

REP = 4

from aqp_tpu.utils.timing import hard_sync

def bench(name, make_call):
    call = make_call()
    out = call(scale, kw, pw)
    hard_sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REP):
            out = call(scale, kw, pw)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/REP*1e3:.2f} ms/call", flush=True)


# A) sort-only: full block sort, write block back
def make_sort_only():
    def kern(s_ref, k_ref, p_ref, ok, op):
        k, p = sort_pairs(k_ref[:], p_ref[:], use_gather=True)
        ok[:] = k
        op[:] = p
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kern, grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((NB * W, LANES), jnp.int32)] * 2)(s_, a, b))
bench("A sort-only", make_sort_only)


# B) extract-only: no sort (data pretend-sorted), slots out
def make_extract_only():
    def kern(s_ref, k_ref, p_ref, ok, op, ovf_ref, k_scr, p_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            ovf_ref[0, 0] = jnp.int32(0)
        scale_v = s_ref[0]
        k, p = k_ref[:], p_ref[:]
        def loc_of(x):
            return _fine_bucket(x, scale_v, gmax) // prm.f2
        _extract_slots(k, p, k_scr, p_scr, loc_of, prm.f1, prm.slot_rows,
                       ok, op, ovf_ref, prm.block_rows, (0,))
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((W, LANES), jnp.int32)] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kern, grid_spec=grid1,
        out_shape=[
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ])(s_, a, b))
bench("B extract-only", make_extract_only)


# C) full K1 (sort + extract) as in rho3
def make_full():
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES),
                         lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((W, LANES), jnp.int32)] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        rho3._make_k1(prm, gmax, True), grid_spec=grid1,
        out_shape=[
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((NB, prm.f1, prm.slot_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ])(s_, a, b))
bench("C full K1", make_full)


# D) sort-only but WITHOUT the final 7 lane stages... instead: sort cost by
#    box range: boxes 2..1024 only (small boxes)
def make_sort_small():
    def kern(s_ref, k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        from aqp_tpu.ops.pallas.netsort import _iotas, stage
        lane, row = _iotas(k.shape)
        n = W * LANES
        box = 2
        while box <= 1024:
            j = box // 2
            while j >= 1:
                k, p = stage(k, p, j, min(box, n), lane, row, True)
                j //= 2
            box *= 2
        ok[:] = k
        op[:] = p
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kern, grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((NB * W, LANES), jnp.int32)] * 2)(s_, a, b))
bench("D sort boxes 2..1024 (55 stages)", make_sort_small)


# E) boxes 2048..131072 merge only (from pretend-sorted runs)
def make_sort_big():
    def kern(s_ref, k_ref, p_ref, ok, op):
        k, p = k_ref[:], p_ref[:]
        from aqp_tpu.ops.pallas.netsort import _iotas, stage
        lane, row = _iotas(k.shape)
        n = W * LANES
        box = 2048
        while box <= n:
            j = box // 2
            while j >= 1:
                k, p = stage(k, p, j, min(box, n), lane, row, True)
                j //= 2
            box *= 2
        ok[:] = k
        op[:] = p
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
        out_specs=[pl.BlockSpec((W, LANES), lambda i, s: (i, 0))] * 2,
    )
    return jax.jit(lambda s_, a, b: pl.pallas_call(
        kern, grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((NB * W, LANES), jnp.int32)] * 2)(s_, a, b))
bench("E merge boxes 2048..131072 (98 stages)", make_sort_big)
