"""Per-kernel profile of rho3 at headline scale: where do the 78ms go?"""
import os, time, functools
os.environ.setdefault("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas import rho3
from aqp_tpu.ops.pallas.rho3 import Rho3Params, HASH_C, HASH_MASK, KEY_PAD_INT
from aqp_tpu.ops.pallas.netsort import LANES

prm = Rho3Params()
NR, NS = 13_107_200, 52_428_800
r = create_relation_pk(NR, seed=11111)
s = create_relation_fk(NS, NR, seed=22222)
jax.block_until_ready((r.key, s.key, r.payload, s.payload))

f = jax.jit(lambda x: jnp.sum(x))
int(f(jnp.zeros((8,), jnp.int32)))
t0 = time.perf_counter()
for _ in range(10):
    int(f(jnp.zeros((8,), jnp.int32)))
OH = (time.perf_counter() - t0) / 10
print(f"overhead {OH*1e3:.2f} ms", flush=True)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best - OH, out


# ---- replicate the packing prologue
@jax.jit
def prologue(rk, rp, sk, sp):
    cmul = jnp.int32(HASH_C)
    sig = jnp.concatenate([rk * cmul, sk * cmul]) & HASH_MASK
    tag = jnp.concatenate([jnp.zeros_like(rk), jnp.ones_like(sk)])
    packed = (sig << 1) | tag
    pay = jnp.concatenate([rp, sp])
    return packed, pay

t, (packed, pay) = timeit(prologue, r.key, r.payload, s.key, s.payload)
print(f"prologue: {t*1e3:.1f} ms", flush=True)

block = prm.block_rows * LANES
n = packed.shape[0]
nb = rho3._next_pow2(max(-(-n // block), prm.group))
padn = nb * block - n
@jax.jit
def padit(packed, pay):
    p2 = jnp.concatenate([packed, jnp.full((padn,), KEY_PAD_INT, jnp.int32)])
    y2 = jnp.concatenate([pay, jnp.zeros((padn,), jnp.int32)])
    return (p2.reshape(nb * prm.block_rows, LANES),
            y2.reshape(nb * prm.block_rows, LANES))
t, (kw, pw) = timeit(padit, packed, pay)
print(f"pad+reshape: {t*1e3:.1f} ms  nb={nb}", flush=True)

gmax = prm.f1 * prm.f2
scale = jnp.float32(gmax / (1 << 30) * (1.0 - 1e-6)).reshape(1)

# ---- K1 alone
grid1 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(nb,),
    in_specs=[pl.BlockSpec((prm.block_rows, LANES), lambda i, s: (i, 0))] * 2,
    out_specs=[
        pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES), lambda i, s: (i, 0, 0, 0)),
        pl.BlockSpec((1, prm.f1, prm.slot_rows, LANES), lambda i, s: (i, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ],
    scratch_shapes=[pltpu.VMEM((prm.block_rows, LANES), jnp.int32)] * 2,
)
k1_call = jax.jit(lambda s_, a, b: pl.pallas_call(
    rho3._make_k1(prm, gmax, True), grid_spec=grid1,
    out_shape=[
        jax.ShapeDtypeStruct((nb, prm.f1, prm.slot_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nb, prm.f1, prm.slot_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ])(s_, a, b))
t, (k1, p1, ovf1) = timeit(k1_call, scale, kw, pw)
print(f"K1: {t*1e3:.1f} ms  ovf={int(ovf1[0,0])}", flush=True)

# ---- K2
nbg = nb // prm.group
grid2 = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(prm.f1, nbg),
    in_specs=[pl.BlockSpec((prm.group, 1, prm.slot_rows, LANES),
                           lambda f, g, s: (g, f, 0, 0))] * 2,
    out_specs=[
        pl.BlockSpec((1, 1, prm.f2, prm.kd_slot_rows, LANES),
                     lambda f, g, s: (f, g, 0, 0, 0)),
        pl.BlockSpec((1, 1, prm.f2, prm.kd_slot_rows, LANES),
                     lambda f, g, s: (f, g, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ],
    scratch_shapes=[pltpu.VMEM((prm.block_rows, LANES), jnp.int32)] * 2,
)
k2_call = jax.jit(lambda s_, a, b: pl.pallas_call(
    rho3._make_k2(prm, gmax, True), grid_spec=grid2,
    out_shape=[
        jax.ShapeDtypeStruct((prm.f1, nbg, prm.f2, prm.kd_slot_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((prm.f1, nbg, prm.f2, prm.kd_slot_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ])(s_, a, b))
t, (k2, p2, ovf2) = timeit(k2_call, scale, k1, p1)
print(f"K2: {t*1e3:.1f} ms  ovf={int(ovf2[0,0])}", flush=True)

# ---- K3
k3_call = jax.jit(lambda a, b: pl.pallas_call(
    rho3._make_k3(prm, nbg, True), grid=(prm.f1, prm.f2),
    in_specs=[pl.BlockSpec((1, nbg, 1, prm.kd_slot_rows, LANES),
                           lambda x, y: (x, 0, y, 0, 0))] * 2,
    out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
    out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.int32)] * 2)(a, b))
t, (m, c) = timeit(k3_call, k2, p2)
print(f"K3: {t*1e3:.1f} ms  matches={int(m[0,0])} (expect {NS})", flush=True)

# ---- full pipeline for reference
t, out = timeit(functools.partial(rho3.rho_join_count_v3, prm=prm),
                r.key, r.payload, s.key, s.payload)
print(f"full: {t*1e3:.1f} ms  {(NR+NS)/t/1e6:.0f} M rows/s  "
      f"m={int(out[0])} ovf={int(out[2])}", flush=True)
